"""SparkSession factory tuned for the changeset/spatial engine.

Local defaults target ``local[N]`` smoke runs; on a real cluster the same
confs apply (AQE, Arrow, skew-join) and ``spark.sql.shuffle.partitions``
should be ~2-3x total cores. Iceberg is the production table format; in
this sandbox (no Iceberg jars) the snapshot store falls back to parquet
with hash-bucketed layout (see geodiff_spark.sources.snapshots).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs every engine session needs, local or cluster.
ENGINE_CONFS = {
    # AQE: runtime coalesce + skew-join splitting. The north rule mandates
    # explicit skew handling; AQE is the baseline layer, salting (operators
    # that need it expose a `salt` knob) is the explicit layer.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamps vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Storage-partitioned-join friendly when bucketed tables are used.
    "spark.sql.sources.v2.bucketing.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "geodiff_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a session.

    ``cores`` is the local parallelism (int or "*"); honored only when no
    master is configured externally (spark-submit on a cluster wins).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores in ("*",) else int(cores)
        shuffle_partitions = max(int(n), 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
