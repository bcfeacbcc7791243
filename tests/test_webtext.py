"""Web-corpus operators: URL canonicalization, PII redaction, repetition
signals, domain caps, span dedup, decontamination, stratified sampling.

Semantics-level unit tests (small literal inputs with hand-computed
expected outputs) — the sf0.01 DuckDB oracle parity lives in
test_entry_oracle.py. Plan shapes asserted where they carry the
100 TB story (WindowGroupLimit for domain_cap, broadcast for
decontaminate, no shuffle for the scalar kernels)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from geodiff_spark.functions import webtext as W
from geodiff_spark.functions.text import quality_expr, tokens_expr
from geodiff_spark.operators.corpus import (
    decontaminate,
    domain_cap,
    span_dedup,
    stratified_sample,
)


# --- canonical URL ----------------------------------------------------------

CANON_CASES = [
    # fragment stripped, scheme+host lowercased, :443 dropped on https
    ("HTTPS://WWW.Ex.COM:443/a/b#frag", "https://www.ex.com/a/b"),
    # :80 dropped only for http
    ("http://ex.com:80/x", "http://ex.com/x"),
    ("https://ex.com:80/x", "https://ex.com:80/x"),
    # tracking params dropped, survivors sorted
    ("https://ex.com/p?utm_source=a&b=2&a=1&fbclid=z", "https://ex.com/p?a=1&b=2"),
    # all params dropped -> no '?'
    ("https://ex.com/p?utm_campaign=x", "https://ex.com/p"),
    # trailing slashes collapse; bare host becomes '/'
    ("https://ex.com/a///", "https://ex.com/a"),
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com/?ref=home", "https://ex.com/"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], ["url"])
    got = [
        r.c for r in df.select(W.canonical_url_expr(F.col("url")).alias("c"))
        .collect()
    ]
    assert got == [want for _, want in CANON_CASES]


def test_domain_extraction(spark):
    df = spark.createDataFrame(
        [("https://www.news.site-a.com/x",), ("https://b.co/y",)], ["u"]
    )
    got = [r.d for r in df.select(W.domain_expr(F.col("u")).alias("d")).collect()]
    assert got == ["site-a.com", "b.co"]


# --- PII --------------------------------------------------------------------

def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame(
        [("mail a.b@c.org and x@y.io, call 555-123-4567, ip 10.0.0.1 end",)],
        ["t"],
    )
    row = df.select(
        W.redact_expr(F.col("t")).alias("red"),
        *[v.alias(k) for k, v in W.pii_counts_exprs(F.col("t")).items()],
    ).collect()[0]
    assert row.red == "mail <EMAIL> and <EMAIL>, call <PHONE>, ip <IP> end"
    assert (row.n_emails, row.n_phones, row.n_ips) == (2, 1, 1)


# --- repetition signals ------------------------------------------------------

def test_repetition_signals_hand_computed(spark):
    # "a a a b" -> top unigram 3/4, bigrams [a a, a a, a b] -> 2/3,
    # unique 2/4
    df = spark.createDataFrame([("a a a b",), ("",)], ["t"])
    toks = tokens_expr(F.col("t"))
    rows = df.select(
        W.max_run_frac_expr(toks).alias("u"),
        W.max_run_frac_expr(W.bigrams_expr(toks)).alias("b"),
        W.unique_frac_expr(toks).alias("q"),
    ).collect()
    assert rows[0].u == pytest.approx(0.75)
    assert rows[0].b == pytest.approx(2 / 3)
    assert rows[0].q == pytest.approx(0.5)
    # empty text -> all zeros, no NaN/NULL
    assert (rows[1].u, rows[1].b, rows[1].q) == (0.0, 0.0, 0.0)


def test_repetition_signals_zero_shuffle_plan(spark):
    df = spark.range(10).select(
        F.concat_ws(" ", F.lit("x"), F.col("id").cast("string")).alias("t")
    )
    toks = tokens_expr(F.col("t"))
    plan = df.select(W.max_run_frac_expr(toks).alias("u"))
    formatted = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in formatted  # narrow projection, no shuffle


# --- domain cap ---------------------------------------------------------------

def test_domain_cap_keeps_best_k(spark):
    rows = [
        Row(doc_id=i, domain="d1" if i < 6 else "d2", q=float(i)) for i in range(9)
    ]
    df = spark.createDataFrame(rows)
    got = domain_cap(df, "domain", [F.desc("q"), F.asc("doc_id")], 2)
    kept = sorted((r.domain, r.doc_id, r.rk) for r in got.collect())
    # d1 has ids 0-5 (best q = 5,4), d2 has 6-8 (best 8,7)
    assert kept == [("d1", 4, 2), ("d1", 5, 1), ("d2", 7, 2), ("d2", 8, 1)]


def test_domain_cap_window_group_limit_plan(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, domain=f"d{i % 3}", q=float(i)) for i in range(30)]
    )
    got = domain_cap(df, "domain", [F.desc("q"), F.asc("doc_id")], 5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # rank filter must push into WindowGroupLimit (partial top-k before
    # the shuffle) — the property that makes a mega-domain safe at scale
    assert "WindowGroupLimit" in plan


# --- span dedup ---------------------------------------------------------------

def test_span_dedup_first_occurrence_wins(spark):
    # span=2; doc 1 = "a b c d", doc 2 = "a b x y", doc 3 = "a b"
    # chunk "a b" survives only in doc 1 (lowest doc_id, pos 0)
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "a b")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in span_dedup(df, "doc_id", "text", 2).collect()}
    assert got[1].kept_text == "a b c d" and got[1].n_kept == 2
    assert got[2].kept_text == "x y" and got[2].n_kept == 1
    assert got[3].kept_text == "" and got[3].n_kept == 0
    assert got[3].n_spans == 1


def test_span_dedup_within_doc_repeat(spark):
    # the SAME chunk repeated inside one doc: only the first position kept
    df = spark.createDataFrame([(7, "a b a b a b")], ["doc_id", "text"])
    got = span_dedup(df, "doc_id", "text", 2).collect()[0]
    assert got.kept_text == "a b" and got.n_spans == 3 and got.n_kept == 1


def test_span_dedup_empty_doc(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    got = span_dedup(df, "doc_id", "text", 2).collect()[0]
    assert (got.kept_text, got.n_spans, got.n_kept) == ("", 0, 0)


# --- decontamination -----------------------------------------------------------

def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame([(100, "the quick brown fox jumps")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "a the quick brown fox jumps b"),  # shares 5-grams
            (2, "totally clean document text here now"),
        ],
        ["doc_id", "text"],
    )
    got = decontaminate(corpus, bench, "doc_id", "text", 5).collect()
    assert len(got) == 1 and got[0].doc_id == 1 and got[0].n_hits == 1


def test_decontaminate_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame([(2, "a b c d e f")], ["doc_id", "text"])
    plan = (
        decontaminate(corpus, bench, "doc_id", "text", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan  # benchmark grams are the small side


# --- stratified sampling --------------------------------------------------------

def test_stratified_sample_deterministic_and_rate_shaped(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i} body", "en" if i % 2 == 0 else "zh") for i in range(400)],
        ["doc_id", "text", "lang"],
    )
    kept1 = sorted(r.doc_id for r in stratified_sample(df, "text", "lang", {"en": 0.9}, 0.1).collect())
    kept2 = sorted(r.doc_id for r in stratified_sample(df, "text", "lang", {"en": 0.9}, 0.1).collect())
    assert kept1 == kept2  # pure function of content — retry-idempotent
    en = sum(1 for i in kept1 if i % 2 == 0) / 200
    zh = sum(1 for i in kept1 if i % 2 == 1) / 200
    assert en > 0.75 and zh < 0.25  # rates steer the strata


def test_stratified_sample_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x", "en")], ["doc_id", "text", "lang"])
    plan = (
        stratified_sample(df, "text", "lang", {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow deterministic filter


# --- repeated spans -----------------------------------------------------------

def test_repeated_spans_merge_and_boundaries(spark):
    from geodiff_spark.operators.corpus import repeated_spans

    # w=3: docs 1,2 share "p q r s" -> windows "p q r"(pos1/0) and
    # "q r s"(pos2/1) overlap -> ONE merged span per doc
    df = spark.createDataFrame(
        [
            (1, "z p q r s a b c d e"),
            (2, "p q r s x y z1 z2"),
            (3, "totally unique words only here now ok"),
        ],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.start_tok): (r.end_tok, r.n_windows)
           for r in repeated_spans(df, "doc_id", "text", 3).collect()}
    assert got == {
        (1, 1): (5, 2),   # tokens 1..5 = "p q r s", 2 windows merged
        (2, 0): (4, 2),
    }


def test_repeated_spans_within_doc_repeat_counts(spark):
    from geodiff_spark.operators.corpus import repeated_spans

    # the same window twice INSIDE one doc is a corpus-frequency-2 dup;
    # gap > w keeps the two spans separate
    df = spark.createDataFrame(
        [(9, "a b c x1 x2 x3 x4 x5 a b c")], ["doc_id", "text"]
    )
    got = sorted(
        (r.start_tok, r.end_tok, r.n_windows)
        for r in repeated_spans(df, "doc_id", "text", 3).collect()
    )
    assert got == [(0, 3, 1), (8, 11, 1)]
