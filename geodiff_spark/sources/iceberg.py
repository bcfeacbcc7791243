"""Iceberg snapshot store — the production table layer.

This sandbox ships no Iceberg runtime jars, so everything here is
capability-gated: ``iceberg_available(spark)`` probes the classpath, and
``IcebergSnapshotStore`` raises a clear error when the extension is
absent (the parquet-bucketed ``SnapshotStore`` is the local fallback
with the same join behavior).

Jar acquisition attempt (re-run and re-dated round 4, 2026-08-18:
DNS for repo1.maven.org still fails, ``pip download pyiceberg`` still
finds no distribution, a fresh full-filesystem scan still finds zero
iceberg jars/wheels; first recorded round 2): the sandbox has no
network (DNS resolution fails for repo1.maven.org; ``pip download
pyiceberg`` fails the same way),
pyspark's bundled jars include no iceberg/delta/hudi artifacts, a full
filesystem scan finds no iceberg jar anywhere, and the runtime jars
ship no writable DataSourceV2 catalog either (InMemoryTableCatalog
lives in catalyst's *test* artifacts only), so the MERGE cannot be
executed against any stand-in v2 catalog. DuckDB 1.0 (bundled) predates
MERGE INTO support, ruling out a cross-engine executed twin. What IS
verified offline: the guarded MERGE INTO text and the bucket-transform
CREATE TABLE DDL parse through Spark's own SQL parser
(tests/test_snapshots.py), the value-guard/conflict semantics are the
same code paths exercised by apply_table's oracle-checked tests, and
the zero-Exchange storage-partitioned diff plan is asserted on the
bucketed-parquet twin (the physical join layout Iceberg's bucket
transform produces).

Production deployment (what the DDL below buys at 10^12 rows):
  * `PARTITIONED BY (bucket(N, url))` → createChangeset's full-outer
    diff plans as a storage-partitioned join: no shuffle of either
    snapshot (`spark.sql.sources.v2.bucketing.enabled=true`, set by
    geodiff_spark.session).
  * snapshots/branches replace file copies (GEODIFF_makeCopySqlite) —
    `make_branch` is a metadata operation.
  * incremental reads (`option("start-snapshot-id", ...)`) stream a
    committed changeset as CDC — the input to streaming.cdc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..changeset import ChangesetTable, TableInfo
from ..operators.diff import diff_table

ICEBERG_CONFS = {
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergSnapshotStore:
    """Same surface as sources.snapshots.SnapshotStore over Iceberg."""

    def __init__(self, spark: SparkSession, catalog: str = "local", n_buckets: int = 64):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jars not on the classpath — use "
                "sources.snapshots.SnapshotStore (bucketed parquet) locally, "
                "or add iceberg-spark-runtime and the ICEBERG_CONFS to the "
                "session builder"
            )
        self.spark = spark
        self.catalog = catalog
        self.n_buckets = n_buckets

    def create(self, name: str, schema_ddl: str, pk: str) -> None:
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.catalog}.{name} ({schema_ddl})
            USING iceberg PARTITIONED BY (bucket({self.n_buckets}, {pk}))"""
        )

    def write(self, df: DataFrame, name: str, mode: str = "append") -> None:
        df.writeTo(f"{self.catalog}.{name}").append() if mode == "append" else (
            df.writeTo(f"{self.catalog}.{name}").overwritePartitions()
        )

    def read(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        r = self.spark.read
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.table(f"{self.catalog}.{name}")

    def make_branch(self, name: str, branch: str) -> None:
        """Zero-copy snapshot copy (GEODIFF_makeCopySqlite analogue)."""
        self.spark.sql(f"ALTER TABLE {self.catalog}.{name} CREATE BRANCH {branch}")

    def diff_snapshots(
        self, name: str, info: TableInfo, from_snapshot: int, to_snapshot: int
    ) -> ChangesetTable:
        """Changeset between two snapshot ids of ONE table — the time-
        travel diff the reference can't express."""
        return diff_table(
            self.read(name, from_snapshot), self.read(name, to_snapshot), info
        )

    def merge_apply(
        self, name: str, cs: ChangesetTable, *, check_conflicts: bool = True
    ) -> None:
        """applyChangeset as a native MERGE INTO (set semantics, one
        atomic snapshot commit), with the reference's optimistic-
        concurrency semantics:

        * the MATCHED update/delete arms carry the VALUE GUARD — every
          old-defined column must match the current row (sqlForUpdate /
          sqlForDelete, sqlitedriver.cpp:653-729) — so a concurrently
          modified row is never clobbered;
        * ``check_conflicts=True`` (default) first runs the same
          conflict scan apply_or_raise uses (insert_exists /
          update_nothing / delete_nothing) against the current snapshot
          and raises ConflictsError BEFORE merging — nothing is applied
          on conflict, matching the reference's savepoint rollback.
          ``False`` documents the weaker contract: guarded entries that
          don't match silently no-op (set semantics).
        """
        if check_conflicts:
            from ..changeset import ConflictsError
            from ..operators.apply import apply_table

            _, conflicts = apply_table(self.read(name), cs, persist_join=False)
            n = conflicts.count()
            if n:
                raise ConflictsError(
                    f"Conflicts encountered while applying changes! Total {n}",
                    conflicts=conflicts,
                )
        cs.df.createOrReplaceTempView("_cs_apply")
        self.spark.sql(merge_apply_sql(f"{self.catalog}.{name}", "_cs_apply", cs.info))


def merge_apply_sql(target: str, source: str, info: TableInfo) -> str:
    """The guarded MERGE INTO statement (separate function so its text is
    parser-testable without Iceberg jars on the classpath)."""
    pk = info.pk[0]
    set_clauses = ", ".join(
        f"t.{c} = CASE WHEN (s.new_bits >> {i}) & 1 = 1 THEN s.new_{c} ELSE t.{c} END"
        for i, c in enumerate(info.columns)
    )
    # optimistic-concurrency guard: all old-defined columns match the
    # current row, timestamps at ms precision (sqlitedriver.cpp:690-695)
    def eq(c: str) -> str:
        if c in info.timestamp_cols:
            fmt = "'yyyy-MM-dd HH:mm:ss.SSS'"
            return (
                f"date_format(t.{c}, {fmt}) <=> date_format(s.old_{c}, {fmt})"
            )
        return f"t.{c} <=> s.old_{c}"

    guard = " AND ".join(
        f"((s.old_bits >> {i}) & 1 = 0 OR {eq(c)})"
        for i, c in enumerate(info.columns)
    )
    insert_cols = ", ".join(info.columns)
    insert_vals = ", ".join(f"s.new_{c}" for c in info.columns)
    return f"""MERGE INTO {target} t
    USING {source} s
    ON t.{pk} = coalesce(s.old_{pk}, s.new_{pk})
    WHEN MATCHED AND s.op = 'delete' AND {guard} THEN DELETE
    WHEN MATCHED AND s.op = 'update' AND {guard} THEN UPDATE SET {set_clauses}
    WHEN NOT MATCHED AND s.op = 'insert' THEN
      INSERT ({insert_cols}) VALUES ({insert_vals})"""
