"""Streaming deduplication — the unbounded twin of operators.dedup.

A web-scale ingest pipeline dedups *as documents arrive*; the batch
dedup family (dedup_exact, minhash) then runs over the settled corpus.
Two state regimes:

  * dedup_stream(..., watermark=...) — bounded state: a duplicate is
    dropped if it re-arrives within the watermark of the first copy
    (``dropDuplicatesWithinWatermark``); state for keys older than the
    watermark is evicted, so executor state stays O(arrival rate ×
    watermark), not O(corpus). The 100 TB regime.
  * dedup_stream(..., watermark=None) — exact-forever dedup
    (``dropDuplicates``): state grows with distinct keys; only for
    bounded key domains.

Key choice mirrors dedup_exact: dedup on content columns (e.g. a text
hash), not the document id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """First-seen-wins streaming dedup on ``key_cols``."""
    if watermark is None:
        return docs.dropDuplicates(key_cols)
    d = docs
    if dict(d.dtypes).get(ts_col) == "timestamp_ntz":
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def content_key(text_col: str = "text") -> F.Column:
    """64-bit content key for dedup state (hash the text, don't keep it
    in state)."""
    return F.xxhash64(F.col(text_col)).alias("content_key")
