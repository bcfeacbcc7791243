"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against oracle_sql() via DuckDB — row count + column names +
order-insensitive exact values (the same gate CORRECTNESS_r{N}.json
applies)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    recs = pdf[cols].itertuples(index=False, name=None)
    return sorted((tuple(map(_canon, r)) for r in recs), key=repr), cols


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    got_df = QUERIES[name](spark, SF_DIR)
    got = got_df.toPandas()
    exp = con.sql(ORACLES[name]).df()
    g_rows, g_cols = _rows(got)
    e_rows, e_cols = _rows(exp)
    assert g_cols == e_cols, f"{name}: column mismatch {g_cols} vs {e_cols}"
    # The driver's value hash is dtype-sensitive: an int64 column on the
    # Spark side vs a float64 on the DuckDB side (e.g. HUGEINT SUM
    # reaching pandas as float) hashes differently even when numerically
    # equal. Guard dtype *kind* parity (datetime unit ns-vs-us is
    # tolerated by the driver, and 'O' object columns compare by value).
    def _kind(k):
        return "i" if k in "iu" else k

    for c in g_cols:
        gk, ek = _kind(got[c].dtype.kind), _kind(exp[c].dtype.kind)
        assert gk == ek, (
            f"{name}: column {c!r} dtype-kind mismatch "
            f"{got[c].dtype} vs {exp[c].dtype} — driver hash would differ"
        )
    assert len(g_rows) == len(e_rows), (
        f"{name}: row count {len(g_rows)} vs {len(e_rows)}"
    )
    assert len(g_rows) > 0, f"{name}: oracle-checked query returned 0 rows"
    if g_rows != e_rows:
        diffs = [
            (a, b) for a, b in zip(g_rows, e_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"cell", "op", "n_changes"}
