"""Edge-value scenarios from the reference corpus: utf_test_ščé,
quoting, large blobs (multi-byte varints on the wire), empty datasets."""

from __future__ import annotations

import json

import pytest

from geodiff_spark import TableInfo, apply_or_raise, diff_table, has_changes
from geodiff_spark.functions.json_export import changeset_json
from geodiff_spark.sources.changeset_io import read_changeset_file, write_changeset_file

T = TableInfo("utf_ščé", ("fid", "name", "blob"), pk=("fid",))
SCHEMA = "fid long, name string, blob binary"


def test_unicode_and_quoting_roundtrip(spark, tmp_path):
    """Unicode values + table name, quotes/backslashes/newlines in text —
    through diff → wire file → decode → apply."""
    a = spark.createDataFrame(
        [
            (1, "plain", b"x"),
            (2, 'quo"te \'s\' \\back\\', None),
            (3, "ščé 日本語 🚀", b"\x00\xff"),
            (4, "line\nbreak\ttab", b""),
        ],
        SCHEMA,
    )
    b = spark.createDataFrame(
        [
            (1, "plain", b"x"),
            (2, 'quo"te CHANGED \\', None),
            (3, "ščé 日本語 🚀", b"\x00\xff"),
            (5, "nová řádka", "🚀🚀".encode()),
        ],
        SCHEMA,
    )
    cs = diff_table(a, b, T)
    path = str(tmp_path / "utf.diff")
    write_changeset_file({T.name: cs}, path)
    decoded = read_changeset_file(
        spark, path, {T.name: T}, {T.name: [f.dataType for f in a.schema.fields]}
    )
    patched = apply_or_raise(a, decoded[T.name])
    assert not has_changes({"t": diff_table(patched, b, T)})

    # JSON export survives the same values and is valid JSON
    doc = json.loads(changeset_json({T.name: cs}))
    texts = json.dumps(doc, ensure_ascii=False)
    assert "ščé" in texts or "nová" in texts


def test_large_blob_varint(spark, tmp_path):
    """Blob > 16383 bytes forces a 3+-byte varint length on the wire."""
    big = bytes(range(256)) * 100  # 25600 bytes
    a = spark.createDataFrame([(1, "x", None)], SCHEMA)
    b = spark.createDataFrame([(1, "x", big)], SCHEMA)
    cs = diff_table(a, b, T)
    path = str(tmp_path / "big.diff")
    write_changeset_file({T.name: cs}, path)
    decoded = read_changeset_file(
        spark, path, {T.name: T}, {T.name: [f.dataType for f in a.schema.fields]}
    )
    row = decoded[T.name].df.collect()[0]
    assert row["new_blob"] == big
    patched = apply_or_raise(a, decoded[T.name])
    assert patched.collect()[0]["blob"] == big


def test_empty_dataset_diffs(spark):
    """Empty↔empty and empty↔full snapshots."""
    empty = spark.createDataFrame([], SCHEMA)
    full = spark.createDataFrame([(1, "a", b"z")], SCHEMA)
    assert not has_changes({"t": diff_table(empty, empty, T)})
    cs = diff_table(empty, full, T)
    assert [r["op"] for r in cs.df.collect()] == ["insert"]
    cs2 = diff_table(full, empty, T)
    assert [r["op"] for r in cs2.df.collect()] == ["delete"]
    assert apply_or_raise(empty, cs).count() == 1
    assert apply_or_raise(full, cs2).count() == 0
