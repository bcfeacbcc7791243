"""Snapshot store — the table layer the changeset algebra runs over.

Production target: Iceberg tables `PARTITIONED BY (bucket(N, url))` (or
by spatial cell), giving createChangeset's full-outer join a
storage-partitioned plan with NO shuffle (SURVEY.md §4). This sandbox
has no Iceberg jars, so the store falls back to Spark managed bucketed
tables (``bucketBy(...).saveAsTable``) in a local warehouse — the same
co-partitioned join shape, just via the session catalog.

``diff_snapshots`` on two same-bucketed snapshots produces a SortMergeJoin
with **zero Exchange** on either side (verified in
tests/test_snapshots.py by asserting the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..changeset import ChangesetTable, TableInfo
from ..operators.diff import diff_table


class SnapshotStore:
    def __init__(self, spark: SparkSession, n_buckets: int = 32):
        self.spark = spark
        self.n_buckets = n_buckets

    def write(self, df: DataFrame, name: str, info: TableInfo, mode: str = "overwrite") -> None:
        """Persist a snapshot bucketed + sorted by the PK. Equivalent
        Iceberg DDL: CREATE TABLE ... PARTITIONED BY (bucket(N, pk))."""
        (
            df.write.mode(mode)
            .bucketBy(self.n_buckets, *info.pk)
            .sortBy(*info.pk)
            .format("parquet")
            .saveAsTable(name)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def drop(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")

    def diff_snapshots(self, base_name: str, mod_name: str, info: TableInfo) -> ChangesetTable:
        """Co-partitioned diff: both sides share bucketing on the PK, so
        the full-outer join needs no Exchange (bucketed scan feeds SMJ
        directly)."""
        return diff_table(self.read(base_name), self.read(mod_name), info)
