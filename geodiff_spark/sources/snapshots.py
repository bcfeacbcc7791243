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


class VersionedSnapshotStore(SnapshotStore):
    """Time-travel + branches over bucketed parquet tables — the
    EXECUTED stand-in for Iceberg snapshots (sources.iceberg documents
    the production path; its jars are unobtainable in this sandbox, so
    this class makes the same surface actually run here):

      * ``commit(df, table)``      -> new immutable version (Iceberg:
        table commit / snapshot)
      * ``read(table, version=)``  -> time travel (VERSION AS OF)
      * ``read(table, branch=)``   -> branch head
      * ``make_branch``            -> zero-copy branch (metadata only,
        like ALTER TABLE ... CREATE BRANCH)
      * ``diff_versions``          -> changeset between two versions of
        ONE table — the time-travel diff the reference cannot express;
        both versions share the PK bucketing, so the join plan has zero
        Exchange.

    Commit protocol: the version's bucketed table is written first, the
    JSON snapshot log is published LAST via atomic rename — a crash
    leaves the previous log intact (same write-then-publish as
    plans/checkpoints.py and streaming.cdc).
    """

    def __init__(self, spark: SparkSession, n_buckets: int = 32):
        super().__init__(spark, n_buckets)

    # -- snapshot log -------------------------------------------------
    def _log_path(self, table: str) -> str:
        import os

        wh = self.spark.conf.get("spark.sql.warehouse.dir").removeprefix(
            "file:"
        )
        os.makedirs(wh, exist_ok=True)
        return os.path.join(wh, f"_snapshots_{table}.json")

    def _log(self, table: str) -> dict:
        import json
        import os

        p = self._log_path(table)
        if not os.path.exists(p):
            return {"head": 0, "versions": {}, "branches": {}}
        with open(p) as f:
            return json.load(f)

    def _publish(self, table: str, log: dict) -> None:
        import json
        import os

        p = self._log_path(table)
        with open(p + ".tmp", "w") as f:
            json.dump(log, f)
        os.replace(p + ".tmp", p)

    # -- public surface -----------------------------------------------
    def commit(
        self,
        df: DataFrame,
        table: str,
        info: TableInfo,
        *,
        branch: str = "main",
    ) -> int:
        """Write an immutable version and advance ``branch`` to it."""
        log = self._log(table)
        v = int(log["head"]) + 1
        self.write(df, f"{table}__v{v}", info)
        log["head"] = v
        log["versions"][str(v)] = {"table": f"{table}__v{v}"}
        log["branches"][branch] = v
        self._publish(table, log)
        return v

    def read(
        self,
        table: str,
        *,
        version: int | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        log = self._log(table)
        if version is None:
            v = log["branches"][branch or "main"]
        else:
            v = version
        meta = log["versions"].get(str(v))
        if meta is None:
            raise KeyError(f"{table}: no version {v}")
        return self.spark.table(meta["table"])

    def make_branch(
        self, table: str, new_branch: str, *, at_version: int | None = None
    ) -> int:
        """Zero-copy branch: a pointer into the version log."""
        log = self._log(table)
        v = at_version if at_version is not None else log["branches"]["main"]
        if str(v) not in log["versions"]:
            raise KeyError(f"{table}: no version {v}")
        log["branches"][new_branch] = v
        self._publish(table, log)
        return v

    def diff_versions(
        self, table: str, info: TableInfo, v_from: int, v_to: int
    ) -> ChangesetTable:
        """Changeset between two versions (zero-Exchange bucketed join)."""
        return diff_table(
            self.read(table, version=v_from),
            self.read(table, version=v_to),
            info,
        )

    def compact(self, table: str, info: TableInfo) -> int:
        """Small-file compaction: rewrite the head version so every
        bucket is exactly ONE file (repartition to bucket count on the
        PK before the bucketed write — without it each writer task
        emits a file per bucket it touches, the classic small-file
        accretion of frequent commits). Data is byte-identical; the
        result is committed as a NEW version (time travel to the
        uncompacted one still works), like Iceberg's rewrite_data_files
        action. Returns the new version."""
        from pyspark.sql import functions as F

        head = self.read(table)
        # repartition on the EXPLICIT bucket-id expression, not the PK:
        # a bucketed-table scan already advertises HashPartitioning(pk,
        # n) so `repartition(n, pk)` is optimized away and the write
        # re-emits one file per (input file, bucket). pmod(murmur3, n)
        # IS Spark's bucket id, so each shuffle partition holds exactly
        # one whole bucket -> exactly n_buckets files.
        compacted = head.repartition(
            self.n_buckets, F.pmod(F.hash(*info.pk), F.lit(self.n_buckets))
        )
        return self.commit(compacted, table, info)

    def rollback(self, table: str, to_version: int, *, branch: str = "main") -> int:
        """Move a branch pointer back to an earlier version (metadata
        only — the bad version stays readable for forensics until
        expired)."""
        return self.make_branch(table, branch, at_version=to_version)

    def expire_versions(self, table: str, *, keep_last: int = 1) -> list[int]:
        """Retention GC: drop version tables that are (a) older than the
        newest ``keep_last`` and (b) not pinned by any branch. Publishes
        the pruned log BEFORE dropping storage, so a crash mid-expire
        never leaves a log entry pointing at dropped data. Returns the
        expired version numbers."""
        log = self._log(table)
        pinned = set(log["branches"].values())
        versions = sorted(int(v) for v in log["versions"])
        keep = set(versions[-keep_last:]) | pinned
        expired = [v for v in versions if v not in keep]
        if not expired:
            return []
        dropped_names = [log["versions"][str(v)]["table"] for v in expired]
        for v in expired:
            del log["versions"][str(v)]
        self._publish(table, log)
        for name in dropped_names:
            self.drop(name)
        return expired
