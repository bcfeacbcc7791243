"""TRUE wire-format parity against SQLite's session extension (the
format geodiff borrows, docs/changeset-format.md:4-6), driven through
libsqlite3 via ctypes:

  1. a REAL sqlite3session changeset decodes correctly with our reader;
  2. OUR writer's bytes apply cleanly with sqlite3changeset_apply and
     reproduce the target table state — i.e. geodiff/sqlite can consume
     changesets this engine produces.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import pytest

from geodiff_spark import TableInfo, diff_table
from geodiff_spark.sources.changeset_io import (
    read_changeset_file,
    write_changeset_file,
)

LIB = ctypes.util.find_library("sqlite3")
lib = ctypes.CDLL(LIB) if LIB else None
HAS_SESSION = bool(lib) and hasattr(lib, "sqlite3session_create")

pytestmark = pytest.mark.skipif(
    not HAS_SESSION, reason="libsqlite3 session API unavailable"
)

SQLITE_OK = 0
CONFLICT_CB = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p
)


class Db:
    def __init__(self, path=b":memory:"):
        self.p = ctypes.c_void_p()
        assert lib.sqlite3_open(path, ctypes.byref(self.p)) == SQLITE_OK

    def exec(self, sql: str):
        err = ctypes.c_char_p()
        rc = lib.sqlite3_exec(
            self.p, sql.encode(), None, None, ctypes.byref(err)
        )
        assert rc == SQLITE_OK, (rc, err.value)

    def query(self, sql: str):
        # tiny row fetcher via exec callback
        rows = []

        @ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        )
        def cb(_, n, vals, names):
            rows.append(tuple(vals[i].decode() if vals[i] is not None else None
                              for i in range(n)))
            return 0

        assert lib.sqlite3_exec(self.p, sql.encode(), cb, None, None) == SQLITE_OK
        return rows


DDL = "CREATE TABLE t (fid INTEGER PRIMARY KEY, name TEXT, x REAL, b BLOB)"
T = TableInfo("t", ("fid", "name", "x", "b"), pk=("fid",))
SCHEMA = "fid long, name string, x double, b binary"


def _session_changeset(db: Db, mutate_sql: list[str]) -> bytes:
    sess = ctypes.c_void_p()
    assert lib.sqlite3session_create(db.p, b"main", ctypes.byref(sess)) == SQLITE_OK
    assert lib.sqlite3session_attach(sess, None) == SQLITE_OK
    for sql in mutate_sql:
        db.exec(sql)
    n = ctypes.c_int()
    buf = ctypes.c_void_p()
    assert lib.sqlite3session_changeset(sess, ctypes.byref(n), ctypes.byref(buf)) == SQLITE_OK
    data = ctypes.string_at(buf, n.value)
    lib.sqlite3_free(buf)
    lib.sqlite3session_delete(sess)
    return data


def test_our_reader_parses_real_sqlite_changeset(spark, tmp_path):
    db = Db()
    db.exec(DDL)
    db.exec("INSERT INTO t VALUES (1, 'keep', 1.5, x'0102')")
    db.exec("INSERT INTO t VALUES (2, 'gone', 2.5, NULL)")
    db.exec("INSERT INTO t VALUES (3, 'edit', 3.5, x'ff')")
    raw = _session_changeset(db, [
        "INSERT INTO t VALUES (4, 'new', 4.5, x'00')",
        "UPDATE t SET name = 'edited' WHERE fid = 3",
        "DELETE FROM t WHERE fid = 2",
    ])
    path = tmp_path / "real_sqlite.diff"
    path.write_bytes(raw)

    schemas = {"t": [f.dataType for f in spark.createDataFrame([], SCHEMA).schema.fields]}
    cs = read_changeset_file(spark, str(path), {"t": T}, schemas)["t"]
    rows = {(r["op"], r["old_fid"] if r["op"] != "insert" else r["new_fid"]): r
            for r in cs.df.collect()}
    assert set(rows) == {("insert", 4), ("update", 3), ("delete", 2)}

    ins = rows[("insert", 4)]
    assert (ins["new_name"], ins["new_x"], ins["new_b"]) == ("new", 4.5, b"\x00")
    assert ins["new_bits"] == T.full_mask() and ins["old_bits"] == 0

    upd = rows[("update", 3)]
    assert upd["old_name"] == "edit" and upd["new_name"] == "edited"
    # unchanged non-PK columns are Undefined on both sides
    assert not (upd["old_bits"] >> T.bit("x")) & 1
    assert not (upd["new_bits"] >> T.bit("x")) & 1

    dele = rows[("delete", 2)]
    assert (dele["old_name"], dele["old_x"], dele["old_b"]) == ("gone", 2.5, None)
    assert dele["old_bits"] == T.full_mask()


def test_sqlite_applies_our_changeset(spark, tmp_path):
    """sqlite3changeset_apply consumes OUR bytes and lands on the target
    state — full producer-side interop."""
    a = spark.createDataFrame(
        [(1, "keep", 1.5, b"\x01"), (2, "gone", 2.5, None), (3, "edit", 3.5, b"\xff")],
        SCHEMA,
    )
    b = spark.createDataFrame(
        [(1, "keep", 1.5, b"\x01"), (3, "edited", 3.5, b"\xff"), (4, "new", 4.5, b"\x00")],
        SCHEMA,
    )
    cs = diff_table(a, b, T)
    path = tmp_path / "ours.diff"
    write_changeset_file({"t": cs}, str(path))
    raw = path.read_bytes()

    db = Db()
    db.exec(DDL)
    db.exec("INSERT INTO t VALUES (1, 'keep', 1.5, x'01')")
    db.exec("INSERT INTO t VALUES (2, 'gone', 2.5, NULL)")
    db.exec("INSERT INTO t VALUES (3, 'edit', 3.5, x'ff')")

    @CONFLICT_CB
    def on_conflict(_ctx, _reason, _iter):
        return 1  # SQLITE_CHANGESET_ABORT: any conflict fails the test

    buf = ctypes.create_string_buffer(raw, len(raw))
    rc = lib.sqlite3changeset_apply(
        db.p, len(raw), buf, None, on_conflict, None
    )
    assert rc == SQLITE_OK, f"sqlite3changeset_apply rc={rc}"

    got = db.query("SELECT fid, name, x FROM t ORDER BY fid")
    assert got == [
        ("1", "keep", "1.5"),
        ("3", "edited", "3.5"),
        ("4", "new", "4.5"),
    ]


def test_our_diff_equals_sqlite_session_changeset(spark, tmp_path):
    """For identical logical edits, diff(base, mod) produces the same
    entry set (ops, values, definedness masks) that SQLite's session
    extension records — compared through one decoder."""
    db = Db()
    db.exec(DDL)
    seed = [
        "INSERT INTO t VALUES (1, 'a', 1.0, x'aa')",
        "INSERT INTO t VALUES (2, 'b', 2.0, NULL)",
        "INSERT INTO t VALUES (3, 'c', NULL, x'cc')",
    ]
    for sql in seed:
        db.exec(sql)
    raw = _session_changeset(db, [
        "UPDATE t SET x = 9.5 WHERE fid = 1",          # single-col update
        "UPDATE t SET name = 'b2', b = x'bb' WHERE fid = 2",  # multi-col
        "DELETE FROM t WHERE fid = 3",
        "INSERT INTO t VALUES (5, NULL, 5.0, NULL)",   # insert with NULLs
    ])
    path = tmp_path / "sess.diff"
    path.write_bytes(raw)
    schemas = {"t": [f.dataType for f in spark.createDataFrame([], SCHEMA).schema.fields]}
    theirs = read_changeset_file(spark, str(path), {"t": T}, schemas)["t"]

    base = spark.createDataFrame(
        [(1, "a", 1.0, b"\xaa"), (2, "b", 2.0, None), (3, "c", None, b"\xcc")],
        SCHEMA,
    )
    mod = spark.createDataFrame(
        [(1, "a", 9.5, b"\xaa"), (2, "b2", 2.0, b"\xbb"), (5, None, 5.0, None)],
        SCHEMA,
    )
    ours = diff_table(base, mod, T)

    def canon(df):
        return sorted(map(repr, df.select(sorted(df.columns)).collect()))

    assert canon(ours.df) == canon(theirs.df)


def test_sqlite_applies_our_sharded_changeset(spark, tmp_path):
    """The DISTRIBUTED sink: a multi-partition sharded changeset (one
    repeated 'T' header per shard — legal per changesetreader.cpp:80-103)
    concatenates into bytes that sqlite3changeset_apply consumes, landing
    on the same target state as the single-file writer."""
    from geodiff_spark.sources.changeset_io import (
        read_changeset_dir_bytes,
        write_changeset_dir,
    )

    n = 64
    base_rows = [(i, f"name{i}", float(i), None) for i in range(1, n + 1)]
    mod_rows = (
        [(i, f"name{i}", float(i), None) for i in range(1, n + 1, 2)]  # keep odd
        + [(i, f"edited{i}", float(i) + 0.5, b"\x01") for i in range(2, n + 1, 4)]
        + [(i, f"new{i}", -1.0, b"\x02") for i in range(n + 1, n + 9)]
    )
    a = spark.createDataFrame(base_rows, SCHEMA)
    b = spark.createDataFrame(mod_rows, SCHEMA)
    cs = diff_table(a, b, T)

    out_dir = str(tmp_path / "sharded")
    shards = write_changeset_dir({"t": cs}, out_dir, shards_per_table=4)
    assert len(shards) > 1, "expected a genuinely multi-shard changeset"
    raw = read_changeset_dir_bytes(out_dir)
    assert raw.count(b"\x54\x04") >= len(shards)  # one 'T' header per shard

    db = Db()
    db.exec(DDL)
    for i, name, x, _ in base_rows:
        db.exec(f"INSERT INTO t VALUES ({i}, '{name}', {x}, NULL)")

    @CONFLICT_CB
    def on_conflict(_ctx, _reason, _iter):
        return 1  # abort on any conflict

    buf = ctypes.create_string_buffer(raw, len(raw))
    rc = lib.sqlite3changeset_apply(db.p, len(raw), buf, None, on_conflict, None)
    assert rc == SQLITE_OK, f"sqlite3changeset_apply rc={rc}"

    got = {r[0]: r for r in db.query("SELECT fid, name, x FROM t ORDER BY fid")}
    want = {str(i): (str(i), nm, repr(x) if x == int(x) else str(x))
            for i, nm, x, _ in mod_rows}
    assert set(got) == set(want)
    for k, r in got.items():
        i, nm, x, _ = next(row for row in mod_rows if str(row[0]) == k)
        assert r[1] == nm and float(r[2]) == x

    # and our own reader round-trips the concatenated shard stream
    p = tmp_path / "cat.diff"
    p.write_bytes(raw)
    schemas = {"t": [f.dataType for f in spark.createDataFrame([], SCHEMA).schema.fields]}
    back = read_changeset_file(spark, str(p), {"t": T}, schemas)["t"]
    def canon(df):
        return sorted(map(repr, df.select(sorted(df.columns)).collect()))
    assert canon(back.df) == canon(cs.df)
