"""JSON export parity checks (shape per changesetutils.cpp:79-302)."""

from __future__ import annotations

import json

from geodiff_spark import TableInfo, diff_table
from geodiff_spark.api import Dataset, rebase
from geodiff_spark.functions.json_export import (
    changeset_json,
    changeset_json_df,
    conflicts_json,
    summary_json,
)

T = TableInfo(name="simple", columns=("fid", "name", "rating"), pk=("fid",))


def snap(spark, rows):
    return spark.createDataFrame(rows, "fid long, name string, rating long")


def test_changeset_json_shape(spark):
    a = snap(spark, [(1, "a", 10), (2, None, 20)])
    b = snap(spark, [(1, "a2", 10), (3, "c", 30)])
    cs = {"simple": diff_table(a, b, T)}
    doc = json.loads(changeset_json(cs))
    assert set(doc) == {"geodiff"}
    by_type = {e["type"]: e for e in doc["geodiff"]}
    assert set(by_type) == {"insert", "update", "delete"}

    ins = by_type["insert"]
    assert ins["table"] == "simple"
    assert ins["changes"] == [
        {"column": 0, "new": 3},
        {"column": 1, "new": "c"},
        {"column": 2, "new": 30},
    ]
    upd = by_type["update"]
    assert upd["changes"] == [
        {"column": 0, "old": 1},
        {"column": 1, "old": "a", "new": "a2"},
    ]
    dele = by_type["delete"]
    # defined NULL encodes as JSON null, present key
    assert dele["changes"] == [
        {"column": 0, "old": 2},
        {"column": 1, "old": None},
        {"column": 2, "old": 20},
    ]


def test_summary_json(spark):
    a = snap(spark, [(1, "a", 10), (2, "b", 20)])
    b = snap(spark, [(1, "a2", 10), (3, "c", 30)])
    doc = json.loads(summary_json({"simple": diff_table(a, b, T)}))
    assert doc == {
        "geodiff_summary": [
            {"table": "simple", "insert": 1, "update": 1, "delete": 1}
        ]
    }


def test_conflicts_json(spark):
    base = Dataset(tables={"simple": snap(spark, [(1, "a", 10)])}, infos={"simple": T})
    theirs = Dataset(tables={"simple": snap(spark, [(1, "a-t", 10)])}, infos={"simple": T})
    ours = Dataset(tables={"simple": snap(spark, [(1, "a-o", 10)])}, infos={"simple": T})
    _, conflicts = rebase(base, theirs, ours)
    doc = json.loads(conflicts_json(conflicts, {"simple": T}))
    assert doc == {
        "geodiff": [
            {
                "table": "simple",
                "type": "conflict",
                "fid": "1",
                "changes": [
                    {"column": 1, "base": "a", "old": "a-t", "new": "a-o"}
                ],
            }
        ]
    }


def test_distributed_json_df(spark):
    a = snap(spark, [(1, "a", 10)])
    b = snap(spark, [(1, "a2", 10)])
    cs = diff_table(a, b, T)
    rows = changeset_json_df(cs).collect()
    assert len(rows) == 1
    e = json.loads(rows[0]["entry_json"])
    assert e["table"] == "simple" and e["type"] == "update"
    assert {"column": 1, "old": "a", "new": "a2"} in e["changes"]


def test_json_export_size_guard(spark):
    """Driver-side pretty-JSON exporters refuse unbounded collects."""
    import pytest

    from geodiff_spark.functions.json_export import changeset_json

    a = snap(spark, [(1, "a", 10)])
    b = snap(spark, [(1, "a2", 10)])
    cs = {"simple": diff_table(a, b, T)}
    with pytest.raises(ValueError, match="changeset_json_df"):
        changeset_json(cs, max_rows=0)
