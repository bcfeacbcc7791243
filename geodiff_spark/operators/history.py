"""SCD2 history materialization from changesets — turn a base snapshot
plus a sequence of geodiff changesets into a slowly-changing-dimension
history table:

    (pk..., attrs..., valid_from, valid_to)

one row per attribute-state interval, ``valid_to`` NULL while current,
deletions closing intervals without opening new ones.

This is the temporal-warehouse face of the changeset algebra: the
reference reconstructs past states by applying/inverting changesets one
at a time (GEODIFF_applyChangeset, geodiff.cpp); at analytics scale you
want the whole history as ONE table you can time-slice with a BETWEEN
predicate. Cost is |base| + sum |changeset_i| — never versions x corpus.

Distributed shape: union the base rows (version v0) with each
changeset's insert/update/delete entries (version v_i), then ONE shuffle
on the PK and two window passes:

  1. per-attribute ``last_value(ignoreNulls)`` ordered by version
     reconstructs full rows from the wire-faithful sparse updates
     (UPDATE entries carry NULL for untouched columns — the IR's
     Undefined — so the fold is exactly "carry the previous value");
  2. ``lead(version)`` closes each interval at the next change of the
     same PK (insert/update/delete alike); delete markers then drop out
     of the output, having done their closing job.

Reference semantics: docs/changeset-format.md (old/new sides, Undefined
omission); apply-order equivalence with operators/apply.py is asserted
in tests (materializing the history and slicing it at v_i equals
applying changesets 1..i).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geodiff_spark.changeset import ChangesetTable, TableInfo


def scd2_from_changesets(
    base: DataFrame,
    changesets: list[tuple[int, ChangesetTable]],
    info: TableInfo,
    *,
    base_version: int = 0,
) -> DataFrame:
    """Build the SCD2 history of ``info``'s table from ``base`` (state
    at ``base_version``) plus ``(version, changeset)`` pairs with
    strictly increasing versions > base_version."""
    versions = [v for v, _ in changesets]
    if sorted(set(versions)) != versions or any(v <= base_version for v in versions):
        raise ValueError("changeset versions must be strictly increasing and "
                         f"> base_version={base_version}")
    pk = list(info.pk)
    attrs = [c for c in info.columns if c not in pk]

    ev = base.select(
        F.lit(base_version).cast("long").alias("_v"),
        F.lit(False).alias("_del"),
        *[F.col(c) for c in pk],
        *[F.col(c) for c in attrs],
    )
    for v, cs in changesets:
        df = cs.df
        ins_upd = df.filter(F.col("op").isin("insert", "update")).select(
            F.lit(v).cast("long").alias("_v"),
            F.lit(False).alias("_del"),
            *[
                F.coalesce(F.col(f"new_{c}"), F.col(f"old_{c}")).alias(c)
                for c in pk
            ],
            # wire-faithful: update rows leave untouched attrs NULL —
            # the window fold below carries the prior value forward
            *[F.col(f"new_{c}").alias(c) for c in attrs],
        )
        dels = df.filter(F.col("op") == "delete").select(
            F.lit(v).cast("long").alias("_v"),
            F.lit(True).alias("_del"),
            *[F.col(f"old_{c}").alias(c) for c in pk],
            *[F.lit(None).cast(dict(base.dtypes)[c]).alias(c) for c in attrs],
        )
        ev = ev.unionByName(ins_upd).unionByName(dels)

    w_fill = (
        Window.partitionBy(*pk)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = Window.partitionBy(*pk).orderBy("_v")
    filled = ev.select(
        *pk,
        "_v",
        "_del",
        *[
            F.last(F.col(c), ignorenulls=True).over(w_fill).alias(c)
            for c in attrs
        ],
    )
    # NOTE on NULL attributes: the IR cannot distinguish "unchanged"
    # from "set to NULL" inside this fold (both are NULL in new_*) —
    # same trade the reference's Undefined makes on the wire for
    # UPDATE entries whose bitmask is not consulted here. Callers with
    # nullable attrs should diff with explicit sentinel handling.
    out = filled.withColumn("valid_from", F.col("_v")).withColumn(
        "valid_to", F.lead("_v").over(w_next)
    )
    return out.filter(~F.col("_del")).select(
        *pk, *attrs, "valid_from", "valid_to"
    )


def snapshot_at(history: DataFrame, version: int, info: TableInfo) -> DataFrame:
    """Time-slice the history: the table state at ``version`` is one
    BETWEEN predicate — no changeset replay."""
    return history.filter(
        (F.col("valid_from") <= F.lit(version))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(version)))
    ).select(*info.columns)


def history_apply(
    history: DataFrame,
    cs: ChangesetTable,
    version: int,
    info: TableInfo,
) -> DataFrame:
    """Fold ONE changeset into an existing SCD2 history at |changeset|
    cost — the incremental twin of :func:`scd2_from_changesets`
    (asserted property-equal in tests), and the foreachBatch body for a
    streaming CDC source (streaming/cdc.py): each epoch closes the
    changed PKs' open intervals and appends the new states.

    Scale shape: one semi/left join of the history's OPEN rows against
    the (small) changeset PK set + one union — with the history stored
    bucketed by pk the probe is co-located; closed rows are untouched
    (append-friendly for an Iceberg MERGE)."""
    pk = list(info.pk)
    attrs = [c for c in info.columns if c not in pk]
    df = cs.df
    changed = df.select(
        *[
            F.coalesce(F.col(f"old_{c}"), F.col(f"new_{c}")).alias(c)
            for c in pk
        ]
    ).distinct()

    open_rows = history.filter(F.col("valid_to").isNull())
    closing = open_rows.join(changed, pk, "left_semi").withColumn(
        "valid_to", F.lit(version).cast("long")
    )
    untouched = history.filter(F.col("valid_to").isNotNull()).unionByName(
        open_rows.join(changed, pk, "left_anti")
    )

    ins_upd = df.filter(F.col("op").isin("insert", "update")).select(
        *[F.coalesce(F.col(f"new_{c}"), F.col(f"old_{c}")).alias(c) for c in pk],
        *[F.col(f"new_{c}").alias(c) for c in attrs],
    )
    # sparse updates: pull unchanged attrs from the interval being closed
    prev = closing.select(
        *pk, *[F.col(c).alias(f"_prev_{c}") for c in attrs]
    )
    opened = (
        ins_upd.join(prev, pk, "left")
        .select(
            *pk,
            *[
                F.coalesce(F.col(c), F.col(f"_prev_{c}")).alias(c)
                for c in attrs
            ],
            F.lit(version).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
    )
    cols = [*pk, *attrs, "valid_from", "valid_to"]
    return (
        untouched.select(*cols)
        .unionByName(closing.select(*cols))
        .unionByName(opened.select(*cols))
    )
