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
