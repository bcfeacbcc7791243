"""invertChangeset — a narrow select, no shuffle.

Semantics (changesetutils.cpp:24-77):
  INSERT -> DELETE with old <- new
  DELETE -> INSERT with new <- old
  UPDATE -> UPDATE with old/new swapped, then PK fixup: an unchanged PK
            sits in `old` with `new` undefined; after the swap it would
            land in `new`, so move it back (changesetutils.cpp:58-69).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..changeset import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ChangesetTable,
    bit_defined,
)


def invert_table(cs: ChangesetTable) -> ChangesetTable:
    info = cs.info
    op = F.col("op")
    new_op = (
        F.when(op == OP_INSERT, F.lit(OP_DELETE))
        .when(op == OP_DELETE, F.lit(OP_INSERT))
        .otherwise(F.lit(OP_UPDATE))
    )

    old_cols, new_cols = [], []
    old_bits = F.lit(0).cast("long")
    new_bits = F.lit(0).cast("long")
    for i, c in enumerate(info.columns):
        # plain swap ...
        o, n = F.col(f"new_{c}"), F.col(f"old_{c}")
        o_def = bit_defined(F.col("new_bits"), i)
        n_def = bit_defined(F.col("old_bits"), i)
        if info.is_pk(c):
            # ... with PK fixup on updates: if swapped-old is undefined,
            # pull the value from swapped-new and undefine swapped-new.
            fix = (op == OP_UPDATE) & ~o_def
            o = F.when(fix, n).otherwise(o)
            new_n_def = F.when(fix, F.lit(False)).otherwise(n_def)
            n = F.when(fix, F.lit(None).cast(cs.df.schema[f"old_{c}"].dataType)).otherwise(n)
            o_def = F.when(fix, n_def).otherwise(o_def)  # defined iff source was
            n_def = new_n_def
        old_cols.append(o.alias(f"old_{c}"))
        new_cols.append(n.alias(f"new_{c}"))
        w = F.lit(1 << i).cast("long")
        old_bits = old_bits + F.when(o_def, w).otherwise(F.lit(0).cast("long"))
        new_bits = new_bits + F.when(n_def, w).otherwise(F.lit(0).cast("long"))

    out = cs.df.select(
        new_op.alias("op"),
        *old_cols,
        *new_cols,
        old_bits.alias("old_bits"),
        new_bits.alias("new_bits"),
    )
    return ChangesetTable(info=info, df=out)


def invert_changeset(changeset: dict[str, ChangesetTable]) -> dict[str, ChangesetTable]:
    return {name: invert_table(t) for name, t in changeset.items()}
