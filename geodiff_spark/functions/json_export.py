"""JSON export with geodiff format parity (changesetutils.cpp:79-302).

Shapes:
  changeset:  {"geodiff": [{"table", "type", "changes":
               [{"column": i, "old": v?, "new": v?}]}]}
  summary:    {"geodiff_summary": [{"table", "insert", "update",
               "delete"}]}
  conflicts:  {"geodiff": [{"table", "type": "conflict", "fid": "<int>",
               "changes": [{"column": i, "base": v?, "old": v?(theirs),
               "new": v?(ours)}]}]}

Value encoding (valueToJSON, changesetutils.cpp:79-112): ints/doubles as
JSON numbers, text as strings, blobs base64, SQL NULL as JSON null,
Undefined omitted entirely. Keys are emitted sorted (nlohmann::json is
an ordered map over sorted keys), 2-space indent (geodiff.cpp:681-685).

Two paths:
  * ``*_json`` — exact-parity artifact: collects to the driver and
    formats with Python (export files are human-facing); guarded by a
    row ceiling (``MAX_JSON_EXPORT_ROWS``) so an at-scale changeset
    fails fast instead of OOMing the driver;
  * ``changeset_json_df`` — the scale path: per-entry JSON built
    distributedly with to_json, one string row per entry.
"""

from __future__ import annotations

import base64
import datetime as _dt
import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..changeset import ChangesetTable, OP_INSERT

_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def _value_to_json(v: Any) -> Any:
    """valueToJSON semantics on a collected Python value."""
    if v is None:
        return None  # JSON null (defined NULL; Undefined handled by caller)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, _dt.datetime):
        return v.strftime(_TS_FMT)[:-3]  # millisecond precision
    return v


def _dump(obj: Any) -> str:
    return json.dumps(obj, indent=2, sort_keys=True, ensure_ascii=False)


def _entry_changes(row, info) -> list[dict]:
    changes = []
    for i, c in enumerate(info.columns):
        old_def = (row["old_bits"] >> i) & 1
        new_def = (row["new_bits"] >> i) & 1
        if not old_def and not new_def:
            continue
        change: dict[str, Any] = {"column": i}
        if old_def:
            change["old"] = _value_to_json(row[f"old_{c}"])
        if new_def:
            change["new"] = _value_to_json(row[f"new_{c}"])
        changes.append(change)
    return changes


def _entry_sort_key(row, info):
    pk = info.pk[0]
    v = row[f"new_{pk}"] if row["op"] == OP_INSERT else row[f"old_{pk}"]
    return (row["op"], str(v))


#: Row ceiling for the driver-side pretty-JSON exporters. The document
#: itself is a single in-memory string, so collecting more than this is
#: a driver OOM, not a formatting choice — callers past the cap must use
#: the distributed ``changeset_json_df`` path.
MAX_JSON_EXPORT_ROWS = 1_000_000


def _guard_export_size(df: DataFrame, what: str, max_rows: int) -> None:
    """Refuse unbounded driver-side collect: probe with limit(n+1) so a
    10 TB changeset fails fast instead of OOMing the driver."""
    if df.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"{what} export exceeds {max_rows} rows — the pretty-JSON "
            "exporter is a driver-side artifact; use changeset_json_df "
            "(distributed per-entry JSON) for changesets at scale, or "
            "raise max_rows explicitly"
        )


def changeset_json(
    changeset: dict[str, ChangesetTable],
    max_rows: int = MAX_JSON_EXPORT_ROWS,
) -> str:
    """GEODIFF_listChanges equivalent. Entries grouped per table (name
    order, like the writer's per-table grouping), deterministic entry
    order within a table (op, pk)."""
    entries = []
    for name in sorted(changeset):
        t = changeset[name]
        _guard_export_size(t.df, f"changeset table {name!r}", max_rows)
        rows = sorted(t.df.collect(), key=lambda r: _entry_sort_key(r, t.info))
        for r in rows:
            entries.append(
                {"table": name, "type": r["op"], "changes": _entry_changes(r, t.info)}
            )
    return _dump({"geodiff": entries})


def summary_json(changeset: dict[str, ChangesetTable]) -> str:
    """GEODIFF_listChangesSummary (changesetutils.cpp:196-238)."""
    out = []
    for name in sorted(changeset):
        counts = {"insert": 0, "update": 0, "delete": 0}
        for r in changeset[name].df.groupBy("op").count().collect():
            counts[r["op"]] = r["count"]
        out.append({"table": name, **counts})
    return _dump({"geodiff_summary": out})


def conflicts_json(
    conflicts: dict[str, DataFrame],
    infos: dict,
    max_rows: int = MAX_JSON_EXPORT_ROWS,
) -> str:
    """Conflict export (conflictToJSON, changesetutils.cpp:240-302):
    per conflicting row: fid as *string*, items with base/old(theirs)/
    new(ours), undefined sides omitted."""
    entries = []
    for name in sorted(conflicts):
        info = infos[name]
        _guard_export_size(conflicts[name], f"conflicts table {name!r}", max_rows)
        for r in sorted(conflicts[name].collect(), key=lambda r: r["fid"]):
            changes = []
            for i, c in enumerate(info.columns):
                if not (r["item_bits"] >> i) & 1:
                    continue
                change: dict[str, Any] = {"column": i}
                if (r["base_def_bits"] >> i) & 1:
                    change["base"] = _value_to_json(r[f"base_{c}"])
                if (r["theirs_def_bits"] >> i) & 1:
                    change["old"] = _value_to_json(r[f"theirs_{c}"])
                if (r["ours_def_bits"] >> i) & 1:
                    change["new"] = _value_to_json(r[f"ours_{c}"])
                changes.append(change)
            entries.append(
                {
                    "table": name,
                    "type": "conflict",
                    "fid": str(r["fid"]),
                    "changes": changes,
                }
            )
    return _dump({"geodiff": entries})


def changeset_json_df(cs: ChangesetTable) -> DataFrame:
    """Distributed per-entry JSON (the 100 TB path): one JSON string per
    entry via JVM-side to_json — no driver collect, no Python in the
    row loop. Binary columns are base64'd, timestamps ms-formatted."""
    info = cs.info

    def kv_fragment(key: str, value, defined):
        # '"key":<json-encoded value>' including defined NULLs ("key":null),
        # omitted (null fragment) when undefined. Encoding goes through
        # to_json(map(...)) so each column keeps its own type, then the
        # outer braces are stripped.
        js = F.to_json(F.create_map(F.lit(key), value))
        inner = js.substr(F.lit(2), F.length(js) - F.lit(2))
        return F.when(defined, F.coalesce(inner, F.lit(f'"{key}":null')))

    change_frags = []
    for i, c in enumerate(info.columns):
        dt = cs.df.schema[f"old_{c}"].dataType
        o, n = F.col(f"old_{c}"), F.col(f"new_{c}")
        if dt.typeName() == "binary":
            o, n = F.base64(o), F.base64(n)
        elif dt.typeName() == "timestamp":
            o = F.date_format(o, "yyyy-MM-dd HH:mm:ss.SSS")
            n = F.date_format(n, "yyyy-MM-dd HH:mm:ss.SSS")
        old_def = F.shiftright("old_bits", i).bitwiseAND(F.lit(1)) == 1
        new_def = F.shiftright("new_bits", i).bitwiseAND(F.lit(1)) == 1
        frag = F.concat(
            F.lit("{"),
            F.concat_ws(
                ",",
                F.lit(f'"column":{i}'),
                kv_fragment("old", o, old_def),
                kv_fragment("new", n, new_def),
            ),
            F.lit("}"),
        )
        change_frags.append(F.when(old_def | new_def, frag))

    changes = F.concat(
        F.lit("["),
        F.array_join(
            F.filter(F.array(*change_frags), lambda x: x.isNotNull()), ","
        ),
        F.lit("]"),
    )
    # assemble: {"table":"<name>","type":"<op>","changes":[...]}
    name_json = json.dumps(info.name, ensure_ascii=False)
    entry = F.concat(
        F.lit('{"table":' + name_json + ',"type":"'),
        F.col("op"),
        F.lit('","changes":'),
        changes,
        F.lit("}"),
    )
    return cs.df.select(entry.alias("entry_json"))
