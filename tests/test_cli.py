"""CLI surface test — mirrors pygeodiff/tests/test_cli.py:18's shape but
in-process (spark-submit startup is too slow per subcommand here; the
argument surface and dispatch are what's under test)."""

from __future__ import annotations

import json

import pytest

from geodiff_spark import cli


@pytest.fixture(scope="module")
def data(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "fid long, name string, x double"
    )
    mod = spark.createDataFrame(
        [(1, "a2", 1.0), (3, "c", 3.0), (4, "d", 4.0)], "fid long, name string, x double"
    )
    base.write.parquet(str(d / "base"))
    mod.write.parquet(str(d / "mod"))
    return d


def test_cli_diff_apply_roundtrip(spark, data, capsys):
    rc = cli._dispatch(
        spark,
        cli_args("diff", str(data / "base"), str(data / "mod"), str(data / "cs"),
                 "--summary"),
    )
    assert rc == 0
    out = capsys.readouterr().out
    doc = json.loads(out)
    assert doc["geodiff_summary"][0] == {
        "table": "table", "insert": 1, "update": 1, "delete": 1
    }
    rc = cli._dispatch(
        spark, cli_args("apply", str(data / "base"), str(data / "cs"), str(data / "patched"))
    )
    assert rc == 0
    got = sorted(tuple(r) for r in spark.read.parquet(str(data / "patched")).collect())
    exp = sorted(tuple(r) for r in spark.read.parquet(str(data / "mod")).collect())
    assert got == exp


def test_cli_invert_asjson_schema(spark, data, capsys):
    rc = cli._dispatch(spark, cli_args("invert", str(data / "cs"), str(data / "inv")))
    assert rc == 0
    rc = cli._dispatch(spark, cli_args("as-json", str(data / "inv")))
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert set(doc) == {"geodiff"}
    rc = cli._dispatch(spark, cli_args("schema", str(data / "base")))
    assert rc == 0
    sch = json.loads(capsys.readouterr().out)
    assert sch["geodiff_schema"][0]["columns"][0] == {
        "name": "fid", "type": "bigint", "primary_key": True
    }


def cli_args(*argv):
    return cli.build_parser().parse_args(list(argv))


def test_cli_rebase_diff(spark, data, capsys, tmp_path):
    """rebase-diff: changeset-file -> changeset-file, no db
    (GEODIFF_createRebasedChangesetEx, geodiff-cli.cpp:417-450)."""
    # theirs: edit fid 1; ours: edit fid 1 differently (conflict) + fid 3
    base = spark.read.parquet(str(data / "base"))
    theirs = spark.createDataFrame(
        [(1, "a-theirs", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "fid long, name string, x double",
    )
    ours = spark.createDataFrame(
        [(1, "a-ours", 1.0), (2, "b", 2.0), (3, "c-ours", 3.0)],
        "fid long, name string, x double",
    )
    from geodiff_spark import TableInfo, diff_table

    T = TableInfo(name="table", columns=("fid", "name", "x"), pk=("fid",))
    diff_table(base, theirs, T).df.write.parquet(str(tmp_path / "b2t"))
    diff_table(base, ours, T).df.write.parquet(str(tmp_path / "b2o"))

    conf_path = str(tmp_path / "conflicts.json")
    rc = cli._dispatch(
        spark,
        cli_args(
            "rebase-diff", str(tmp_path / "b2t"), str(tmp_path / "b2o"),
            str(tmp_path / "rebased"), "--conflicts", conf_path,
        ),
    )
    assert rc == 0
    reb = spark.read.parquet(str(tmp_path / "rebased"))
    rows = {r["op"]: r for r in reb.collect()}
    # ours wins on fid 1 (old patched to theirs' value) + clean edit fid 3
    upds = sorted((r["old_fid"], r["new_name"]) for r in reb.collect())
    assert upds == [(1, "a-ours"), (3, "c-ours")]
    doc = json.loads(open(conf_path).read())
    assert doc["geodiff"][0]["table"] == "table"
    assert doc["geodiff"][0]["fid"] == "1"
    # reference conflict JSON keys: column index, base/old(theirs)/new(ours)
    vals = {c["column"]: c for c in doc["geodiff"][0]["changes"]}
    assert vals[1]["old"] == "a-theirs" and vals[1]["new"] == "a-ours"
    assert vals[1]["base"] == "a"


def test_cli_cross_driver_diff_csv(spark, data, tmp_path, capsys):
    """diff --cross-driver with a CSV modified side (normalize-then-diff
    through the createChangesetDr surface)."""
    mod = spark.createDataFrame(
        [(1, "a2", 1.0), (3, "c", 3.0), (4, "d", 4.0)],
        "fid int, name string, x double",  # int32 on purpose
    )
    csv_path = str(tmp_path / "mod_csv.csv")
    mod.coalesce(1).write.option("header", "true").csv(csv_path)
    rc = cli._dispatch(
        spark,
        cli_args("diff", str(data / "base"), csv_path, str(tmp_path / "cs"),
                 "--cross-driver", "--summary"),
    )
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["geodiff_summary"][0] == {
        "table": "table", "insert": 1, "update": 1, "delete": 1
    }
