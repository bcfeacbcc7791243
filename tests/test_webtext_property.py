"""Property tests: webtext kernels' Spark and DuckDB faces must agree
byte-for-byte on adversarial random inputs (odd unicode, regex
metacharacters, messy URLs) — the same cross-engine discipline as
tests/test_hash_sql.py, driven by hypothesis."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from geodiff_spark.functions import text as TX
from geodiff_spark.functions import webtext as W

# text alphabet: whitespace, punctuation the kernels key on, letters,
# digits, a few multibyte codepoints
TEXT_ALPHA = st.sampled_from(
    list("abc XY9 .,;:!?@-_+%\t\n") + ["é", "ß", "中", "🙂"]
)
TEXTS = st.lists(TEXT_ALPHA, max_size=60).map("".join)

# URL building blocks — includes broken/hostless cases; the kernels must
# still agree (garbage in, same garbage out both sides)
URLS = st.builds(
    lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}{path}{q}{frag}",
    st.sampled_from(["http", "HTTPS", "https", "ftp"]),
    st.sampled_from(["Ex.COM", "www.A-b.org", "X.Y.Z.co", "localhost"]),
    st.sampled_from(["", ":443", ":80", ":8080"]),
    st.sampled_from(["", "/", "/a/b", "/a//", "/p%20q", "///"]),
    st.sampled_from(["", "?", "?a=1", "?utm_source=x&b=2", "?b=2&a=1&ref=h", "?a=1&a=0"]),
    st.sampled_from(["", "#f", "#a#b"]),
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_one(spark, expr_fn, value):
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(expr_fn(F.col("x")).alias("r")).collect()[0].r


def _duck_one(duck, sql_fn, value):
    return duck.execute(f"SELECT {sql_fn('x')} AS r FROM (SELECT ? AS x)", [value]).fetchone()[0]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(url=URLS)
def test_canonical_url_cross_engine(spark, duck, url):
    got_s = _spark_one(spark, W.canonical_url_expr, url)
    got_d = _duck_one(duck, W.canonical_url_sql, url)
    assert got_s == got_d, url


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(text=TEXTS)
def test_redact_and_counts_cross_engine(spark, duck, text):
    assert _spark_one(spark, W.redact_expr, text) == _duck_one(duck, W.redact_sql, text)
    s_counts = _spark_one(
        spark, lambda c: F.struct(*[v.alias(k) for k, v in W.pii_counts_exprs(c).items()]), text
    ).asDict()
    d = duck.execute(
        "SELECT "
        + ", ".join(f"{v} AS {k}" for k, v in W.pii_counts_sql("x").items())
        + " FROM (SELECT ? AS x)",
        [text],
    ).fetchone()
    assert tuple(s_counts.values()) == d, text


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(text=TEXTS)
def test_repetition_kernels_cross_engine(spark, duck, text):
    toks_s = TX.tokens_expr
    toks_d = TX.tokens_sql
    for expr_fn, sql_fn in [
        (lambda c: W.max_run_frac_expr(toks_s(c)), lambda x: W.max_run_frac_sql(toks_d(x))),
        (
            lambda c: W.max_run_frac_expr(W.bigrams_expr(toks_s(c))),
            lambda x: W.max_run_frac_sql(W.bigrams_sql(toks_d(x))),
        ),
        (lambda c: W.unique_frac_expr(toks_s(c)), lambda x: W.unique_frac_sql(toks_d(x))),
    ]:
        got_s = _spark_one(spark, expr_fn, text)
        got_d = _duck_one(duck, sql_fn, text)
        assert got_s == got_d, (text, got_s, got_d)
