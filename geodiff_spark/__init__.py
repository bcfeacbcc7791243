"""geodiff_spark — a from-scratch PySpark-native changeset + spatial engine.

Re-expresses MerginMaps/geodiff's semantics (diff/apply/invert/concat/
rebase over keyed table snapshots, reference at /root/reference) as
partition-parallel DataFrame programs, plus the north-rule spatial layer
(hierarchical cells, PIP, kNN, tiles) and web-scale pipeline operators
(dedup, similarity, text analysis).
"""

from .changeset import (
    ChangesetTable,
    ConflictsError,
    SchemaMismatchError,
    TableInfo,
    changeset_count,
    has_changes,
    summary_df,
)
from .operators.apply import apply_changeset, apply_or_raise, apply_table
from .operators.concat import concat_changesets, concat_tables, merge_pair
from .operators.diff import diff_table, dump_table
from .operators.rebase import rebase_changesets, rebase_table
from .operators.skew import salted_agg, salted_join
from .operators.invert import invert_changeset, invert_table
from .session import get_spark

__all__ = [
    "ChangesetTable",
    "ConflictsError",
    "SchemaMismatchError",
    "TableInfo",
    "apply_changeset",
    "apply_or_raise",
    "apply_table",
    "changeset_count",
    "concat_changesets",
    "concat_tables",
    "diff_table",
    "dump_table",
    "get_spark",
    "has_changes",
    "invert_changeset",
    "invert_table",
    "merge_pair",
    "rebase_changesets",
    "rebase_table",
    "salted_agg",
    "salted_join",
    "summary_df",
]
