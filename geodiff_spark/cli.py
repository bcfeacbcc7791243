"""CLI — mirrors geodiff-cli's command surface (geodiff-cli.cpp:1094-1150)
over parquet/snapshot directories. Launch locally or via
``spark-submit --py-files geodiff_spark.zip geodiff_spark/cli.py <cmd>``.

Commands (reference twins in parens):
  diff BASE MODIFIED OUT     (diff)         — changeset parquet + optional
                                              --binary wire file, --json,
                                              --summary
  apply TARGET CS OUT        (apply)
  invert CS OUT              (invert)
  concat CS1 CS2 [...] OUT   (concat)
  rebase BASE THEIRS OURS OUT [--conflicts PATH]   (rebase-db)
  as-json CS                 (as-json)
  as-summary CS              (as-summary)
  schema TABLE_DIR           (schema)       — JSON schema dump
  dump TABLE_DIR OUT         (dump)
  copy SRC OUT               (copy)
  drivers / version / help

Tables are parquet dirs; --key NAME (default: first column) declares the
PK, --table NAME the logical table name. Changesets are stored as
parquet in the IR layout unless --binary.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from . import __name__ as _pkg
from .changeset import ChangesetTable, TableInfo
from .functions.json_export import changeset_json, summary_json
from .operators.apply import apply_or_raise
from .operators.concat import concat_tables
from .operators.diff import diff_table, dump_table
from .operators.invert import invert_table
from .session import get_spark

VERSION = "0.1.0"


def _info(df, args) -> TableInfo:
    cols = tuple(df.columns)
    key = args.key or cols[0]
    ts = tuple(c for c, t in df.dtypes if t.startswith("timestamp"))
    return TableInfo(name=args.table, columns=cols, pk=(key,), timestamp_cols=ts)


def _load_cs(spark, path, args) -> ChangesetTable:
    df = spark.read.parquet(path)
    cols = tuple(
        c[4:] for c in df.columns if c.startswith("old_") and c != "old_bits"
    )
    key = args.key or cols[0]
    info = TableInfo(name=args.table, columns=cols, pk=(key,))
    return ChangesetTable(info=info, df=df)


def _write_cs(cs: ChangesetTable, out: str, args) -> None:
    if getattr(args, "binary", False):
        from .sources.changeset_io import write_changeset_file

        write_changeset_file({cs.info.name: cs}, out)
    else:
        cs.df.write.mode("overwrite").parquet(out)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="geodiff-spark")
    p.add_argument("--key", default=None, help="primary key column")
    p.add_argument("--table", default="table", help="logical table name")
    p.add_argument("--cores", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("diff")
    d.add_argument("base"); d.add_argument("modified"); d.add_argument("out")
    d.add_argument("--json", action="store_true")
    d.add_argument("--summary", action="store_true")
    d.add_argument("--binary", action="store_true")
    # normalize-then-diff across drivers (createChangesetDr): inputs may
    # be parquet dirs, .csv/.json/.orc files, or jdbc: URLs
    d.add_argument("--cross-driver", action="store_true", dest="cross_driver")

    a = sub.add_parser("apply")
    a.add_argument("target"); a.add_argument("cs"); a.add_argument("out")

    i = sub.add_parser("invert")
    i.add_argument("cs"); i.add_argument("out"); i.add_argument("--binary", action="store_true")

    c = sub.add_parser("concat")
    c.add_argument("paths", nargs="+")

    r = sub.add_parser("rebase")
    r.add_argument("base"); r.add_argument("theirs"); r.add_argument("ours")
    r.add_argument("out"); r.add_argument("--conflicts", default=None)

    # changeset-file flavor: rebase OUR changeset over THEIRS without any
    # snapshot/db (GEODIFF_createRebasedChangesetEx, geodiff-cli.cpp:417-450)
    rd = sub.add_parser("rebase-diff")
    rd.add_argument("theirs_cs"); rd.add_argument("ours_cs"); rd.add_argument("out")
    rd.add_argument("--conflicts", default=None)
    rd.add_argument("--binary", action="store_true")

    for name in ("as-json", "as-summary"):
        x = sub.add_parser(name)
        x.add_argument("cs")

    s = sub.add_parser("schema"); s.add_argument("table_dir")
    du = sub.add_parser("dump"); du.add_argument("table_dir"); du.add_argument("out")
    cp = sub.add_parser("copy"); cp.add_argument("src"); cp.add_argument("out")
    sub.add_parser("drivers")
    sub.add_parser("version")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cmd == "version":
        print(f"geodiff-spark {VERSION} (pyspark)")
        return 0
    if args.cmd == "drivers":
        print("parquet\niceberg (requires runtime jars)")
        return 0

    spark = get_spark("geodiff_spark_cli", cores=args.cores or "*")
    try:
        return _dispatch(spark, args)
    finally:
        spark.stop()


def _load_any(spark, url: str):
    """Any driver URL (parquet dir, .csv/.json/.orc, jdbc:) — the
    cross-driver surface of sources.drivers (createChangesetDr)."""
    from .sources.drivers import load_table

    return load_table(spark, url)


def _dispatch(spark: SparkSession, args) -> int:
    if args.cmd == "diff":
        base = _load_any(spark, args.base)
        mod = _load_any(spark, args.modified)
        if args.cross_driver:
            from .sources.drivers import diff_cross_driver

            cs = diff_cross_driver(base, mod, _info(base, args))
        else:
            cs = diff_table(base, mod, _info(base, args))
        _write_cs(cs, args.out, args)
        if args.json:
            print(changeset_json({cs.info.name: cs}))
        if args.summary:
            print(summary_json({cs.info.name: cs}))
        return 0
    if args.cmd == "apply":
        target = spark.read.parquet(args.target)
        cs = _load_cs(spark, args.cs, args)
        apply_or_raise(target, cs).write.mode("overwrite").parquet(args.out)
        return 0
    if args.cmd == "invert":
        cs = _load_cs(spark, args.cs, args)
        _write_cs(invert_table(cs), args.out, args)
        return 0
    if args.cmd == "concat":
        *ins, out = args.paths
        folded = concat_tables([_load_cs(spark, x, args) for x in ins])
        folded.df.write.mode("overwrite").parquet(out)
        return 0
    if args.cmd == "rebase":
        from .api import Dataset, rebase

        base = spark.read.parquet(args.base)
        info = _info(base, args)
        mk = lambda df: Dataset(tables={info.name: df}, infos={info.name: info})
        final, conflicts = rebase(
            mk(base),
            mk(spark.read.parquet(args.theirs)),
            mk(spark.read.parquet(args.ours)),
        )
        final.tables[info.name].write.mode("overwrite").parquet(args.out)
        n = sum(df.count() for df in conflicts.values())
        if n and args.conflicts:
            from .functions.json_export import conflicts_json

            with open(args.conflicts, "w") as f:
                f.write(conflicts_json(conflicts, {info.name: info}))
        print(f"rebase done, conflicts: {n}", file=sys.stderr)
        return 0
    if args.cmd == "rebase-diff":
        from .functions.json_export import conflicts_json
        from .operators.rebase import rebase_table

        theirs = _load_cs(spark, args.theirs_cs, args)
        ours = _load_cs(spark, args.ours_cs, args)
        rebased, conflicts = rebase_table(ours, theirs)
        _write_cs(rebased, args.out, args)
        n = conflicts.count()
        if args.conflicts:
            with open(args.conflicts, "w") as f:
                f.write(conflicts_json(
                    {rebased.info.name: conflicts},
                    {rebased.info.name: rebased.info},
                ))
        print(f"rebase-diff done, conflicts: {n}", file=sys.stderr)
        return 0
    if args.cmd == "as-json":
        cs = _load_cs(spark, args.cs, args)
        print(changeset_json({cs.info.name: cs}))
        return 0
    if args.cmd == "as-summary":
        cs = _load_cs(spark, args.cs, args)
        print(summary_json({cs.info.name: cs}))
        return 0
    if args.cmd == "schema":
        df = spark.read.parquet(args.table_dir)
        out = {
            "geodiff_schema": [
                {
                    "table": args.table,
                    "columns": [
                        {"name": f.name, "type": f.dataType.simpleString(),
                         "primary_key": f.name == (args.key or df.columns[0])}
                        for f in df.schema.fields
                    ],
                }
            ]
        }
        print(json.dumps(out, indent=2, sort_keys=True))
        return 0
    if args.cmd == "dump":
        df = spark.read.parquet(args.table_dir)
        dump_table(df, _info(df, args)).df.write.mode("overwrite").parquet(args.out)
        return 0
    if args.cmd == "copy":
        spark.read.parquet(args.src).write.mode("overwrite").parquet(args.out)
        return 0
    raise SystemExit(2)


if __name__ == "__main__":
    raise SystemExit(main())
