"""Retrieval block: inverted index, BM25, heavy hitters, exact quantiles.

Oracle parity for the graded flavors is covered by test_entry_oracle;
here we test the engine-only surfaces (log-idf BM25 vs an independent
Python reference, blocked postings, vocabulary cuts) and the physical
plan shapes (broadcast query dimension, WindowGroupLimit top-k, no
cartesian anywhere)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geodiff_spark.operators import retrieval as R

SF = "/root/testdata/sf0.001"

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "a dog and a cat and a rat"),
    (4, "rats and mats are not cats"),
    (5, "the the the the dog"),
]
QTERMS = [(1, "cat"), (1, "dog"), (2, "rat")]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(k1=1.2, b=0.75, log_idf=True):
    """Independent reference: pure-Python BM25 over DOCS/QTERMS."""
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid in {q for q, _ in QTERMS}:
        terms = sorted(t for q, t in QTERMS if q == qid)
        for doc, tk in toks.items():
            s = 0.0
            for t in terms:
                tf = tk.count(t)
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if t in v)
                idf = (n - df + 0.5) / (df + 0.5) + 1.0
                if log_idf:
                    idf = math.log(idf)
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(tk) / avgdl))
                )
            if s > 0.0:
                out[(qid, doc)] = s
    return out


@pytest.mark.parametrize("log_idf", [False, True])
def test_bm25_matches_python_reference(spark, docs, log_idf):
    qdf = spark.createDataFrame(QTERMS, "query_id long, term string")
    got = {
        (r.query_id, r.doc_id): r.score
        for r in R.bm25_search(
            docs, qdf, "doc_id", "text", k=10, log_idf=log_idf
        ).collect()
    }
    exp = _py_bm25(log_idf=log_idf)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == pytest.approx(exp[key], rel=1e-12), key


def test_bm25_rank_and_k(spark, docs):
    qdf = spark.createDataFrame(QTERMS, "query_id long, term string")
    res = R.bm25_search(docs, qdf, "doc_id", "text", k=2).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert len(rows) <= 2
        rows.sort(key=lambda r: r.rank)
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_inverted_index_postings_ordered(spark, docs):
    idx = {r.term: r for r in R.inverted_index(docs, "doc_id", "text").collect()}
    assert idx["cat"].df_count == 3
    assert idx["cat"].postings == "1:1,2:1,3:1"
    assert idx["the"].postings == "1:2,2:2,5:4"
    # vocabulary cut
    cut = R.inverted_index(docs, "doc_id", "text", min_df=2, max_df=2)
    assert all(2 <= r.df_count <= 2 for r in cut.collect())


def test_inverted_index_blocked_reassembles(spark, docs):
    flat = {
        r.term: r.postings
        for r in R.inverted_index(docs, "doc_id", "text").collect()
    }
    blocked = R.inverted_index(docs, "doc_id", "text", block_size=2).collect()
    joined = {}
    for r in sorted(blocked, key=lambda r: (r.term, r.block)):
        joined[r.term] = (
            joined.get(r.term, "") + ("," if r.term in joined else "") + r.postings
        )
        assert r.df_count <= 2  # no block exceeds block_size
    assert joined == flat


def test_top_terms_exact(spark, docs):
    one = docs.withColumn("g", F.lit("all"))
    rows = R.top_terms(one, "g", "text", k=3).collect()
    rows.sort(key=lambda r: r.rank)
    assert [(r.term, r.n) for r in rows] == [("the", 8), ("a", 3), ("and", 3)]


def test_exact_quantiles_definition(spark):
    # 1..10 in one group: p50 = ceil(.5*10)=5th value = 5, p90 = 9, p99 = 10
    df = spark.range(1, 11).withColumn("g", F.lit("x"))
    row = R.exact_quantiles(df, "g", F.col("id")).collect()[0]
    assert (row.n_rows, row.p50, row.p90, row.p99) == (10, 5, 9, 10)


# --- plan shapes -----------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_broadcasts_dims_no_cartesian(spark):
    import __spark_entry__ as E

    plan = _plan(E.queries()["bm25_search"](spark, SF))
    assert "CartesianProduct" not in plan
    # query terms, df stats and the 1-row corpus stats all broadcast
    assert plan.count("BroadcastExchange") >= 2
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan  # top-k partial pushdown


def test_top_terms_plan_partial_agg_and_group_limit(spark):
    import __spark_entry__ as E

    plan = _plan(E.queries()["top_terms"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan or "partial count" in plan.lower()
