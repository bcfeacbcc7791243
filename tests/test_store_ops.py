"""Versioned-store maintenance (compact / rollback / expire) and the
tiled spatial layout's partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodiff_spark.changeset import TableInfo
from geodiff_spark.sources.snapshots import VersionedSnapshotStore
from geodiff_spark.sources.tiled import read_tiled, tile_of_cell, write_tiled
from geodiff_spark.spatial.cells import cell_expr, parent_np

import numpy as np

SF = "/root/testdata/sf0.001"

INFO = TableInfo(name="sops", columns=("k", "v"), pk=("k",))


@pytest.fixture()
def store(spark):
    return VersionedSnapshotStore(spark, n_buckets=4)


def _data(spark, n=200, seed=0):
    return spark.range(n).select(
        (F.col("id") + seed).alias("k"), (F.col("id") * 7 + seed).alias("v")
    )


def test_compact_one_file_per_bucket_same_data(spark, store):
    # fragmented commit: 8 writer tasks x 4 buckets -> up to 32 files
    frag = _data(spark).repartition(8)
    v1 = store.commit(frag, "sops_c", INFO)
    files_before = len(store.read("sops_c").inputFiles())
    v2 = store.compact("sops_c", INFO)
    files_after = len(store.read("sops_c").inputFiles())
    assert files_after == 4  # exactly one file per bucket
    assert files_after < files_before
    # byte-identical data, and the uncompacted version still time-travels
    cs = store.diff_versions("sops_c", INFO, v1, v2)
    assert cs.df.count() == 0
    assert store.read("sops_c", version=v1).count() == 200
    for v in (f"sops_c__v{v1}", f"sops_c__v{v2}"):
        store.drop(v)


def test_rollback_and_expire_respect_pins(spark, store):
    v1 = store.commit(_data(spark, seed=0), "sops_e", INFO)
    v2 = store.commit(_data(spark, seed=1), "sops_e", INFO)
    v3 = store.commit(_data(spark, seed=2), "sops_e", INFO)
    store.make_branch("sops_e", "audit", at_version=v1)
    store.rollback("sops_e", v2)  # main now at v2
    assert store.read("sops_e").collect() == store.read(
        "sops_e", version=v2
    ).collect()
    # keep_last=1 would expire v1+v2, but v1 is branch-pinned and v2 is
    # main's head -> only nothing or nothing; move main to v3 first
    store.rollback("sops_e", v3)
    expired = store.expire_versions("sops_e", keep_last=1)
    assert expired == [v2]  # v1 pinned by 'audit', v3 is newest
    with pytest.raises(KeyError):
        store.read("sops_e", version=v2)
    assert store.read("sops_e", version=v1).count() == 200
    for v in (f"sops_e__v{v1}", f"sops_e__v{v3}"):
        store.drop(v)


def test_tile_of_cell_matches_parent_np(spark):
    df = spark.range(500).select(
        ((F.col("id") % 160).cast("double") - 80.0 + 0.13).alias("lat"),
        ((F.col("id") % 350).cast("double") - 175.0 + 0.37).alias("lon"),
    )
    got = df.select(
        cell_expr(F.col("lat"), F.col("lon"), 9).alias("cell")
    ).select(
        "cell", tile_of_cell(F.col("cell"), 9, 4).alias("tile")
    ).collect()
    cells = np.array([r.cell for r in got], dtype=np.int64)
    exp = parent_np(cells, 4)
    assert [r.tile for r in got] == exp.tolist()


def test_tiled_layout_prunes_partitions(spark, tmp_path):
    pts = spark.range(2000).select(
        ((F.col("id") % 160).cast("double") - 80.0 + 0.13).alias("lat"),
        ((F.col("id") % 350).cast("double") - 175.0 + 0.37).alias("lon"),
    )
    path = str(tmp_path / "tiled")
    write_tiled(pts, path, F.col("lat"), F.col("lon"), fine_res=9, tile_res=3)
    all_tiles = {r.tile for r in read_tiled(spark, path).select("tile").distinct().collect()}
    assert len(all_tiles) > 4
    some = sorted(all_tiles)[:2]
    q = read_tiled(spark, path, tiles=some)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "tile" in plan.split(
        "PartitionFilters"
    )[1][:120]
    # directory pruning: the executed scan reads only the 2 requested
    # tile dirs (one file each) — inputFiles() ignores filters, so read
    # the FileSourceScan's own numFiles metric
    q.collect()
    leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
    n_files = int(leaves.apply(0).metrics().apply("numFiles").value())
    assert n_files == 2
    # and the data inside is Z-ordered (cell ascending within each file)
    one = q.inputFiles()[0]
    cells = [r.cell for r in spark.read.parquet(one).select("cell").collect()]
    assert cells == sorted(cells)
