"""Cross-engine parity of the hash kernels behind the LSH oracles
(functions/hash_sql.py): FNV-1a 64 and splitmix64 must be bit-identical
between the numpy engine kernels and the DuckDB HUGEINT SQL — including
non-ASCII input (the SQL path parses UTF-8 bytes from hex pairs)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from geodiff_spark.functions.hash_sql import _sm_stages, fnv1a_sql
from geodiff_spark.operators.dedup import _fnv1a_batch, _splitmix64


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.parametrize(
    "s",
    ["", "a", "hello world", "ß日本語🎉", "mixed ascii + ünïcödé", "\t tab"],
)
def test_fnv1a_parity(con, s):
    got = con.sql(
        "SELECT " + fnv1a_sql("?::VARCHAR").replace("?", f"'{s}'")
    ).fetchone()[0]
    want = int(_fnv1a_batch(np.array([s], dtype=object))[0])
    assert int(got) == want


@pytest.mark.parametrize(
    "x", [0, 1, 42, 2**31, 2**63 - 1, 2**63, 2**64 - 1, 0xDEADBEEFCAFEBABE]
)
def test_splitmix64_parity(con, x):
    sql = _sm_stages(f"SELECT {x}::HUGEINT AS x", "x", "smv", [])
    got = con.sql(sql).fetchone()[0]
    want = int(_splitmix64(np.array([x], dtype=np.uint64))[0])
    assert int(got) == want
