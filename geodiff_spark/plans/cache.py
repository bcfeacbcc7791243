"""Scoped persist tracking — unpersist discipline for multi-step ops.

Operators that reuse an intermediate relation across consumers
(rebase joins, apply full-outer join, the two diffs inside api.rebase,
dedup shingles) call :func:`persist_tracked` instead of ``df.persist()``.
Outside a scope the behavior is identical to ``persist()``; inside a
``cache_scope()`` the relation is registered and released on scope exit,
so a long driver session looping over many tables/datasets does not
accrete executor storage memory (the reference engine has no analogous
leak because its savepoints die with each statement batch —
sqlitedriver.cpp applyChangeset's savepoint lifetime).

Usage::

    with cache_scope():
        final, conflicts = rebase(base, theirs, ours)
        final.tables["t"].collect()          # uses the caches
    # scope exit -> every persist taken inside rebase() is released

Nesting is supported; each scope releases only its own registrations.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def _stack() -> list[list[DataFrame]]:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers with the innermost cache_scope
    (no-op registration when no scope is active)."""
    df = df.persist()
    stack = _stack()
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Release every persist_tracked() relation taken inside the block."""
    frame: list[DataFrame] = []
    _stack().append(frame)
    try:
        yield frame
    finally:
        _stack().pop()
        for df in frame:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
