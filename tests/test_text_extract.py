"""The byte-identical extracted-text-per-url invariant
(BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geodiff_spark.functions.text_extract import extract_text_expr, extract_text_udf
from geodiff_spark.sources.pages import pages_snapshot


def test_extraction_recovers_generator_text(spark):
    """Generated html wraps the text column; extraction must recover it
    byte-for-byte for every url."""
    pages = pages_snapshot(spark, 500, version=1)
    bad = (
        pages.withColumn("ex", extract_text_expr(F.col("html")))
        .filter(
            F.encode(F.col("ex"), "UTF-8") != F.encode(
                F.concat(F.lit("p"), F.regexp_extract("url", r"/p/(\d+)$", 1),
                         F.lit(" "), F.col("text")), "UTF-8")
        )
    )
    # title text ("p<i>") joins the body after tag-stripping; if that
    # composition ever differs byte-wise from text, the invariant broke
    assert bad.count() == 0


def test_extraction_deterministic_across_partitionings(spark):
    """Same url -> same text BYTES regardless of parallelism/run."""
    a = pages_snapshot(spark, 400, version=1, partitions=2)
    b = pages_snapshot(spark, 400, version=1, partitions=16)
    ea = a.select("url", extract_text_expr(F.col("html")).alias("t"))
    eb = b.select("url", extract_text_expr(F.col("html")).alias("t"))
    diff = ea.alias("a").join(eb.alias("b"), "url").filter(
        F.encode(F.col("a.t"), "UTF-8") != F.encode(F.col("b.t"), "UTF-8")
    )
    assert diff.count() == 0
    assert ea.count() == 400


def test_jvm_and_pandas_kernels_agree(spark):
    """Two independent implementations, byte-identical output — incl.
    script/style stripping and unicode."""
    rows = [
        (1, "<html><body>héllo <b>wörld</b></body></html>".encode()),
        (2, b"<html><script>var x = '<p>no</p>';</script><p>keep  this</p></html>"),
        (3, b"<style>p{color:red}</style>plain \xc3\x9f text"),
        (4, b"  no tags at   all  "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, html binary")
    out = df.select(
        "i",
        extract_text_expr(F.col("html")).alias("jvm"),
        extract_text_udf(F.col("html")).alias("py"),
    ).collect()
    for r in out:
        assert r["jvm"] == r["py"], r["i"]
    got = {r["i"]: r["jvm"] for r in out}
    assert got[2] == "keep this"
    assert got[3] == "plain ß text"
    assert got[1] == "héllo wörld"
    assert got[5] is None
