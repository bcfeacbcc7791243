"""global_cumsum (two-phase, no single-partition window) and
pack_sequences (contiguous token packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geodiff_spark.operators.corpus import global_cumsum, pack_sequences


def test_global_cumsum_matches_sequential(spark):
    # values chosen so ties in value don't exist in the order key
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
    got = {r.k: r.cum for r in global_cumsum(df, ["k"], "v").collect()}
    run = 0
    for k, v in rows:
        run += v
        assert got[k] == run


def test_global_cumsum_no_single_partition_window(spark):
    df = spark.createDataFrame([(i, 1) for i in range(10)], ["k", "v"])
    plan = global_cumsum(df, ["k"], "v")._jdf.queryExecution().executedPlan().toString()
    # the data-bearing window runs partitioned by _pid (behind the r06
    # lazy checkpoint it surfaces as Scan ExistingRDD); the only
    # permitted unpartitioned exchange is the one feeding the
    # #partitions-row offsets fold — assert every SinglePartition
    # exchange sits directly over the _pid-keyed offsets aggregate
    segs = plan.split("Exchange SinglePartition")
    assert len(segs) >= 2, "offsets fold missing from plan"
    for seg in segs[1:]:
        assert "HashAggregate(keys=[_pid" in seg[:600], seg[:600]


def test_pack_sequences_layout(spark):
    # budget 10; sizes 4,4,4 -> doc3 starts at 8 (bin 0, offset 8);
    # a 25-token doc spans bins but is ASSIGNED where it starts
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 25), (5, 2)], ["doc_id", "n"]
    )
    got = {r.doc_id: (r.bin, r.bin_offset) for r in
           pack_sequences(df, "doc_id", "n", 10).collect()}
    assert got == {
        1: (0, 0),   # start 0
        2: (0, 4),   # start 4
        3: (0, 8),   # start 8
        4: (1, 2),   # start 12
        5: (3, 7),   # start 37
    }
