"""createChangeset as ONE co-partitioned full-outer join.

The reference runs three generated SQL queries per table — anti-join for
inserts, reversed anti-join for deletes, PK-equi-join + change predicate
for updates (sqlitedriver.cpp:393-450, :590-624). On Spark that would be
three shuffles over the same two snapshots. We instead classify every row
from a single full-outer join on the PK:

    only modified            -> insert
    only base                -> delete
    both + any non-PK differs-> update      (null-safe inequality,
                                             postgresdriver.cpp:444-451)
    both + identical         -> dropped

One shuffle per side; with both snapshots bucketed/partitioned on the PK
(or on the spatial cell) the join runs as a storage-partitioned /
co-partitioned sort-merge join with no shuffle at all. At 100 TB this is
the difference between 2 scans + 1 shuffle and 6 scans + 3 shuffles.

Timestamp columns are compared at millisecond precision to avoid
false-positive diffs from equivalent representations — the reference's
STRFTIME('%Y-%m-%d %H:%M:%f') guard (sqlitedriver.cpp:542-561).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..changeset import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ChangesetTable,
    SchemaMismatchError,
    TableInfo,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSS"


def _cmp_expr(info: TableInfo, col: str, a: str, b: str) -> Column:
    """Null-safe equality between two sides, timestamp-normalized."""
    ca, cb = F.col(f"{a}.{col}"), F.col(f"{b}.{col}")
    if col in info.timestamp_cols:
        ca = F.date_format(ca, _TS_FMT)
        cb = F.date_format(cb, _TS_FMT)
    return ca.eqNullSafe(cb)


def check_compatible_schema(base: DataFrame, modified: DataFrame, info: TableInfo) -> None:
    """Fail cleanly on schema drift — never a partial changeset
    (sqlitedriver.cpp:595-612; tests/test_modified_scheme.cpp:11-76)."""
    for name, df in (("base", base), ("modified", modified)):
        have = {f.name: f.dataType for f in df.schema.fields}
        missing = [c for c in info.columns if c not in have]
        if missing:
            raise SchemaMismatchError(f"{name} snapshot missing columns {missing}")
    bt = {f.name: f.dataType for f in base.schema.fields if f.name in info.columns}
    mt = {f.name: f.dataType for f in modified.schema.fields if f.name in info.columns}
    drift = {c: (bt[c], mt[c]) for c in info.columns if bt[c] != mt[c]}
    if drift:
        raise SchemaMismatchError(f"column type drift between snapshots: {drift}")


def _guard_null_pk(info: TableInfo) -> Column:
    """Row-level NULL-PK guard as a presence-flag expression (TRUE, or
    raise). Evaluated inside the scan projection — no extra Spark
    action, and crucially the JOIN KEYS stay raw columns so the bucketed
    zero-Exchange plan is untouched. The join uses plain `==` on PKs,
    which would otherwise silently turn a NULL-PK row into a spurious
    delete+insert pair; the reference fails loudly instead
    (get_primary_key throws, geodiffutils.cpp:386-387)."""
    cond = reduce(
        lambda x, y: x & y, [F.col(k).isNotNull() for k in info.pk]
    )
    # assert_true returns NULL (and raises on violation), so the whole
    # expression is the constant TRUE presence flag
    return F.when(
        F.assert_true(
            cond,
            F.lit(
                f"NULL primary key in table {info.name!r} "
                f"(pk={info.pk}) — invalid diff input"
            ),
        ).isNull(),
        F.lit(True),
    )


def diff_table(
    base: DataFrame,
    modified: DataFrame,
    info: TableInfo,
    *,
    copartition: bool = False,
    num_partitions: int | None = None,
) -> ChangesetTable:
    """Diff two snapshots of one table -> changeset IR.

    ``copartition=True`` repartitions both sides on the PK first — useful
    when the downstream plan reuses that partitioning (e.g. a following
    apply/merge on the same key); otherwise let AQE pick.
    """
    check_compatible_schema(base, modified, info)
    cols = list(info.columns)
    b = base.select(*cols, _guard_null_pk(info).alias("_b_present"))
    m = modified.select(*cols, _guard_null_pk(info).alias("_m_present"))
    if copartition:
        np = num_partitions or b.sparkSession.conf.get("spark.sql.shuffle.partitions")
        b = b.repartition(int(np), *info.pk)
        m = m.repartition(int(np), *info.pk)
    bb, mm = b.alias("b"), m.alias("m")
    # plain equality, NOT eqNullSafe: null PKs are invalid in the reference
    # (get_primary_key throws, geodiffutils.cpp:386-387) and null-safe keys
    # compile to coalesce(k,0)/isnull(k) which disables bucketed/storage-
    # partitioned scans — the co-partitioned join would always reshuffle
    pk_cond = reduce(
        lambda x, y: x & y,
        [F.col(f"b.{k}") == F.col(f"m.{k}") for k in info.pk],
    )
    j = mm.join(bb, pk_cond, "full_outer")

    in_base = F.col("b._b_present").isNotNull()
    in_mod = F.col("m._m_present").isNotNull()
    changed_in = {c: ~_cmp_expr(info, c, "b", "m") for c in info.non_pk}
    any_changed = (
        reduce(lambda x, y: x | y, changed_in.values())
        if changed_in else F.lit(False)
    )

    op_in = (
        F.when(in_mod & ~in_base, F.lit(OP_INSERT))
        .when(in_base & ~in_mod, F.lit(OP_DELETE))
        .when(any_changed, F.lit(OP_UPDATE))
    )

    # Materialize `op` and the per-column change flags ONCE before the
    # mask projection. Inlined, every column's old/new/defined exprs
    # re-embed the full `op` CASE (which itself embeds every column's
    # comparison) — an O(n_cols^2) tree that blows Janino's 64 KB
    # method limit on wide tables and knocks the whole join stage off
    # codegen. As separate non-cheap aliases referenced repeatedly,
    # CollapseProject keeps the two projections apart and the mask
    # stage stays linear in n_cols.
    j = j.select(
        *[F.col(f"b.{c}").alias(f"_b_{c}") for c in cols],
        *[F.col(f"m.{c}").alias(f"_m_{c}") for c in cols],
        op_in.alias("op"),
        *[changed_in[c].alias(f"_chg_{c}") for c in info.non_pk],
    ).filter(F.col("op").isNotNull())

    op = F.col("op")
    changed = {c: F.col(f"_chg_{c}") for c in info.non_pk}

    full = info.full_mask()
    pk_mask = info.pk_mask()

    old_cols, new_cols = [], []
    old_bits: Column = F.lit(0).cast("long")
    new_bits: Column = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        bcol, mcol = F.col(f"_b_{c}"), F.col(f"_m_{c}")
        if info.is_pk(c):
            # update: PK defined in old only (new PK undefined — a PK-equi
            # diff can never observe a PK change; docs/changeset-format.md:38)
            old_c = F.when(op != OP_INSERT, bcol)
            new_c = F.when(op == OP_INSERT, mcol)
            old_def = op != OP_INSERT
            new_def = op == OP_INSERT
        else:
            is_chg = changed[c]
            old_c = F.when(op == OP_DELETE, bcol).when(
                (op == OP_UPDATE) & is_chg, bcol
            )
            new_c = F.when(op == OP_INSERT, mcol).when(
                (op == OP_UPDATE) & is_chg, mcol
            )
            old_def = (op == OP_DELETE) | ((op == OP_UPDATE) & is_chg)
            new_def = (op == OP_INSERT) | ((op == OP_UPDATE) & is_chg)
        old_cols.append(old_c.alias(f"old_{c}"))
        new_cols.append(new_c.alias(f"new_{c}"))
        w = F.lit(1 << i).cast("long")
        old_bits = old_bits + F.when(old_def, w).otherwise(F.lit(0).cast("long"))
        new_bits = new_bits + F.when(new_def, w).otherwise(F.lit(0).cast("long"))

    out = j.select(
        "op",
        *old_cols,
        *new_cols,
        old_bits.alias("old_bits"),
        new_bits.alias("new_bits"),
    )
    # silence unused-var warnings for documented masks
    _ = full, pk_mask
    return ChangesetTable(info=info, df=out)


def dump_table(df: DataFrame, info: TableInfo) -> ChangesetTable:
    """Emit every row as an INSERT entry — dumpData
    (sqlitedriver.cpp:1133-1170, GEODIFF_dumpData geodiff.cpp:1098-1139)."""
    cols = list(info.columns)
    sel = [F.lit(OP_INSERT).alias("op")]
    sel += [F.lit(None).cast(df.schema[c].dataType).alias(f"old_{c}") for c in cols]
    sel += [F.col(c).alias(f"new_{c}") for c in cols]
    sel += [
        F.lit(0).cast("long").alias("old_bits"),
        F.lit(info.full_mask()).cast("long").alias("new_bits"),
    ]
    return ChangesetTable(info=info, df=df.select(*sel))
