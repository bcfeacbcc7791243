"""Deduplication family for web-scale corpora (task-brief mandated):

  exact            — hash groupBy, one shuffle, map-side partial agg
  ngram-jaccard    — shingle explode + self equi-join on shingle +
                     |∩|/|∪| filter (SQL-expressible; the oracle twin)
  minhash + LSH    — numpy signatures, banded bucket join (the 100 TB
                     path: candidates ∝ colliding bands, never O(n²))
  simhash          — 64-bit weighted sign hash, chunk-banded candidates,
                     hamming filter
  embedding cosine — see operators.similarity (shares the kernel)

Hash parity matters only inside one engine run (signatures join against
themselves), so minhash/simhash use splitmix64 freely; the jaccard
verifier is the cross-engine-checkable layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens_expr, tokens_sql
from ..plans.cache import persist_tracked


def _spread_input(df: DataFrame, key: str) -> DataFrame:
    """Repartition a (possibly single-file) source to cluster parallelism
    before a heavy per-row UDF stage. Unconditional — probing
    ``df.rdd.getNumPartitions()`` would force an RDD conversion/analysis
    hop just to read a number, and AQE coalesces the result anyway."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, key)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def dedup_exact(df: DataFrame, id_col: str, key_cols: list[str]) -> DataFrame:
    """-> (id, canon_id, group_size) for every member of a duplicate
    group (size > 1), canon = min id. One hash-shuffle on the key."""
    w_keys = [F.col(c) for c in key_cols]
    grouped = df.groupBy(*w_keys).agg(
        F.min(id_col).alias("canon_id"),
        F.count(F.lit(1)).alias("group_size"),
        F.collect_list(F.col(id_col)).alias("_ids"),
    )
    return (
        grouped.filter(F.col("group_size") > 1)
        .select(F.explode("_ids").alias(id_col), "canon_id", "group_size")
    )


def dedup_exact_sql(table: str, id_col: str, key_cols: list[str]) -> str:
    keys = ", ".join(key_cols)
    return f"""
    WITH g AS (
      SELECT {keys}, MIN({id_col}) AS canon_id, COUNT(*) AS group_size
      FROM {table} GROUP BY {keys} HAVING COUNT(*) > 1
    )
    SELECT t.{id_col} AS {id_col}, g.canon_id AS canon_id,
           g.group_size AS group_size
    FROM {table} t JOIN g USING ({keys})
    """


# --------------------------------------------------------------------------
# word n-gram shingles
# --------------------------------------------------------------------------

def shingles_expr(text, n: int):
    """Distinct word n-gram strings (space-joined)."""
    toks = tokens_expr(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    gram = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(gram)


def shingles_sql(text: str, n: int) -> str:
    toks = tokens_sql(text)
    return f"""list_distinct(list_transform(
        range(1, GREATEST(len({toks}) - {n - 1}, 0) + 1),
        i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"""


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """-> (id_a, id_b, common, size_a, size_b) pairs with
    jaccard = common / (size_a + size_b - common) >= threshold, id_a < id_b.

    Plan: explode distinct shingles, self-join on shingle (the classic
    similarity-join prefilter: only docs sharing >=1 shingle ever meet),
    aggregate common counts, join doc sizes, filter. jaccard itself is
    re-derivable from the integer outputs — keeping the comparison gate
    integer-exact across engines.

    ``max_shingle_df`` is the corpus-scale guard: a stop-shingle present
    in 10^6 docs makes the self-join partition for that shingle 10^12
    rows. With a cap τ, shingles whose document frequency exceeds τ are
    excluded from CANDIDATE GENERATION (bounding each shingle's join
    contribution to ≤ τ² pairs), and every surviving candidate pair is
    re-verified EXACTLY via array_intersect over the full shingle sets —
    emitted rows are always a subset of the exact output with exact
    counts. Recall trade (documented contract): a pair whose shared
    shingles are ALL hotter than τ is missed; for near-duplicate
    detection at threshold≥0.5 such pairs are overwhelmingly boilerplate
    — route them to minhash_lsh_pairs if needed. ``None`` = exact
    (the DuckDB-oracle path)."""
    df = _spread_input(df, id_col)
    # shingle arrays feed four consumers (self-join both sides + two size
    # joins) — persist the one expensive projection
    sh = persist_tracked(
        df.select(F.col(id_col), shingles_expr(F.col(text_col), n).alias("sh"))
        .withColumn("sz", F.size("sh").cast("long"))
    )
    sizes = sh.select(id_col, "sz")
    ex = sh.select(id_col, F.explode("sh").alias("shingle"))

    if max_shingle_df is None:
        a, b = ex.alias("a"), ex.alias("b")
        pairs = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        # candidate generation over cold shingles only (df <= τ) ...
        cold = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        exc = ex.join(cold, "shingle", "left_semi")
        a, b = exc.alias("a"), exc.alias("b")
        cand = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
        # ... then EXACT intersection over the full (uncapped) shingle sets
        sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("_sh_a"))
        sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("_sh_b"))
        pairs = (
            cand.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("_sh_a", "_sh_b"))
                .cast("long")
                .alias("common"),
            )
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("size_b"))
    out = pairs.join(sa, "id_a").join(sb, "id_b")
    jac = F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common"))
    return out.filter(jac >= threshold).select(
        "id_a", "id_b", "common", "size_a", "size_b"
    )


def ngram_jaccard_sql(
    table: str, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.5
) -> str:
    sh = shingles_sql(text_col, n)
    return f"""
    WITH s AS (
      SELECT {id_col} AS id, {sh} AS sh FROM {table}
    ), sz AS (
      SELECT id, len(sh) AS sz FROM s
    ), ex AS (
      SELECT id, UNNEST(sh) AS shingle FROM s
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT p.id_a AS id_a, p.id_b AS id_b, p.common AS common,
           sa.sz AS size_a, sb.sz AS size_b
    FROM pairs p
    JOIN sz sa ON sa.id = p.id_a
    JOIN sz sb ON sb.id = p.id_b
    WHERE CAST(p.common AS DOUBLE)
          / CAST(sa.sz + sb.sz - p.common AS DOUBLE) >= {threshold}
    """


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _fnv1a_batch(strings: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over a batch of strings: pad UTF-8 bytes to
    the batch max length, fold over byte POSITIONS (not rows)."""
    enc = pd.Series(strings).astype(str).str.encode("utf-8")
    lens = enc.str.len().to_numpy()
    m = len(enc)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    maxlen = int(lens.max()) if m else 0
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    offs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    h = np.full(m, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            idx = offs[:-1][active] + j
            hv = h[active]
            h[active] = (hv ^ buf[idx].astype(np.uint64)) * prime
    return h


def hash_str_u64(s: str) -> np.uint64:
    """Scalar FNV-1a 64 (tests/oracles); the batch twin is _fnv1a_batch."""
    return _fnv1a_batch(np.array([s], dtype=object))[0]


def _token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All token hashes of a batch, flattened: returns (hashes uint64,
    doc_offsets int64 of len n_docs+1). Hashing is vectorized over the
    UNIQUE tokens, then gathered."""
    tok_lists = [(t or "").lower().split() for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    offs = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    flat = np.array([w for ts in tok_lists for w in ts], dtype=object)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), offs
    uniq, inv = np.unique(flat, return_inverse=True)
    return _fnv1a_batch(uniq)[inv], offs


def _shingle_hash_stream(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Order-sensitive n-gram hashes per doc WITHOUT materializing
    shingle strings: combine consecutive token hashes with a vectorized
    positional mix. Duplicates are kept (min/XOR-style consumers are
    insensitive). Returns (shingle hashes, doc_offsets)."""
    th, offs = _token_hashes(texts)
    n_docs = len(offs) - 1
    counts = np.diff(offs)
    if len(th) == 0:
        return th, offs
    with np.errstate(over="ignore"):
        comb = th.copy()
        for j in range(1, n):
            shifted = np.empty_like(th)
            shifted[:-j] = th[j:]
            shifted[-j:] = 0
            comb = comb * np.uint64(0x9E3779B97F4A7C15) + shifted
        comb = _splitmix64(comb)
    # valid shingle starts: i .. i+n-1 inside one doc; docs shorter than n
    # fall back to their single-token hashes (matches the string version)
    out_parts = []
    new_offs = np.zeros(n_docs + 1, dtype=np.int64)
    for d in range(n_docs):
        lo, hi = offs[d], offs[d + 1]
        if hi - lo >= n:
            part = comb[lo : hi - n + 1]
        else:
            part = _splitmix64(th[lo:hi])  # degenerate: token-level
        out_parts.append(part)
        new_offs[d + 1] = new_offs[d] + len(part)
    return (np.concatenate(out_parts) if out_parts else comb[:0]), new_offs


def minhash_signature_udf(num_perm: int, n: int):
    """pandas UDF: text -> array<long> minhash signature. One splitmix64
    stream per permutation (seeded by index) — vectorized min over the
    (shingles × perms) matrix per Arrow batch."""
    seeds = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E37))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        hs, offs = _shingle_hash_stream(texts, n)
        n_docs = len(offs) - 1
        empty = np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        if len(hs) == 0:
            return pd.Series([empty] * n_docs)
        with np.errstate(over="ignore"):
            m = (_splitmix64(hs[:, None] ^ seeds[None, :]) >> np.uint64(1)).astype(
                np.int64
            )
        counts = np.diff(offs)
        nonempty = counts > 0
        starts = offs[:-1][nonempty]
        mins = np.minimum.reduceat(m, starts, axis=0)
        res = np.full((n_docs, num_perm), np.iinfo(np.int64).max, dtype=np.int64)
        res[nonempty] = mins
        return pd.Series(list(res))

    return _sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """-> candidate (id_a, id_b, est_jaccard) pairs whose signatures
    collide in >=1 LSH band; ``verify`` filters on the signature-
    estimated jaccard >= threshold.

    Scale shape: docs never self-join; only (band_idx, band_hash)
    buckets meet — the shuffle key is the bucket, and hot buckets are
    bounded by band width. est_jaccard = matching permutations /
    num_perm (unbiased minhash estimator)."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    df = _spread_input(df, id_col)
    sig = df.select(
        F.col(id_col),
        minhash_signature_udf(num_perm, shingle_n)(F.col(text_col)).alias("sig"),
    )
    return minhash_sig_pairs(
        sig, id_col, num_perm=num_perm, bands=bands,
        threshold=threshold, verify=verify,
    )


def minhash_sig_pairs(
    sig: DataFrame,
    id_col: str,
    *,
    num_perm: int,
    bands: int,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Banded-bucket pair join over precomputed minhash signatures
    (column ``sig``: array<long> of length num_perm) — the shared tail
    of doc-level and group-level LSH. Same shuffle shape as
    minhash_lsh_pairs (bucket keys, never all-pairs)."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    rows_per_band = num_perm // bands
    # the banded relation self-joins below: without a lineage cut both
    # join sides recompute the signature pipeline (pandas-UDF minhash or
    # the group-minhash aggregation) — checkpoint so it runs ONCE and
    # each side reads the persisted blocks (guide §4: pay the Python
    # boundary once, not per consumer)
    sig = sig.localCheckpoint(eager=False)
    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice("sig", b * rows_per_band + 1, rows_per_band).alias(
                        "sl"
                    ),
                ),
            )
        ).alias("bb"),
    ).select(
        id_col,
        "sig",
        "bb.band",
        # murmur bucket = compact shuffle key; the slice equality below
        # removes its collision false-positives, making the output the
        # EXACT "some band slice equal" set (DuckDB-oracle reproducible)
        F.hash("bb.sl").alias("bucket"),
        F.col("bb.sl").alias("sl"),
    )

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.sl") == F.col("b.sl"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        ).cast("double")
        / F.lit(float(num_perm))
    )
    out = cand.withColumn("est_jaccard", est).select("id_a", "id_b", "est_jaccard")
    if verify:
        out = out.filter(F.col("est_jaccard") >= threshold)
    return out


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash_udf():
    """pandas UDF: text -> 64-bit simhash (sign of per-bit vote over
    token FNV hashes)."""

    @F.pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        th, offs = _token_hashes(texts)
        n_docs = len(offs) - 1
        out = np.zeros(n_docs, dtype=np.int64)
        if len(th) == 0:
            return pd.Series(out)
        bitw = np.uint64(1) << np.arange(64, dtype=np.uint64)
        bits = ((th[:, None] & bitw[None, :]) != 0).astype(np.int32)
        counts = np.diff(offs)
        nonempty = counts > 0
        starts = offs[:-1][nonempty]
        sums = np.add.reduceat(bits, starts, axis=0)  # (docs, 64) bit votes
        votes = sums * 2 - counts[nonempty, None]
        vals = (
            ((votes > 0).astype(np.uint64) * bitw[None, :]).sum(axis=1)
        ).astype(np.int64)
        out[nonempty] = vals
        return pd.Series(out)

    return _sh


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """-> (id_a, id_b, hamming) with hamming <= max_hamming.

    Candidate generation: split the 64-bit hash into ``chunks`` equal
    slices; by pigeonhole any pair within hamming <= chunks-1 matches on
    >=1 slice — so the join key is (chunk_idx, chunk_value), never a
    cross join."""
    width = 64 // chunks
    df = _spread_input(df, id_col)
    # checkpoint before the banded self-join so the simhash pandas UDF
    # runs once per doc, not once per join side
    sh = df.select(
        F.col(id_col), simhash_udf()(F.col(text_col)).alias("sh")
    ).localCheckpoint(eager=False)
    banded = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("sh", c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "sh", "cc.chunk", "cc.val")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# incremental maintenance of the exact-dedup index (changeset-driven IVM)
# --------------------------------------------------------------------------

def dedup_index_update(
    index: DataFrame,
    changes: "ChangesetTable",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Maintain a fingerprint dedup index from a geodiff changeset at
    |changeset| cost — the dedup-side analogue of the tile-pyramid IVM
    (spatial/cells.py pyramid_delta): never rescan the corpus.

    ``index`` is (fp, <id>) for the CURRENT corpus; ``changes`` is the
    ChangesetTable produced by diff_table over the documents table
    (op + old_*/new_* columns, reference IR semantics
    docs/changeset-format.md). Returns ``(new_index, new_pairs)``:

      * new_index: index minus deleted/pre-update rows, plus rows for
        inserted/post-update texts — equals building the index on the
        modified corpus from scratch (asserted in tests).
      * new_pairs: exact-duplicate pairs (doc_a < doc_b, fp) that exist
        in the modified corpus and touch at least one changed document —
        precisely the pairs a from-scratch re-dedup would add.

    Scale shape: one |changeset|-sized fingerprint projection, one
    anti-join and one equi-join against the index on (id) and (fp).
    With the index stored bucketed by fp (sources/snapshots.py
    bucketing), the probe join is co-located — no index reshuffle; the
    1000-executor cost is proportional to the day's changes, not the
    10^12-row corpus.
    """
    from geodiff_spark.functions.text import fingerprint_expr

    df = changes.df
    # wire-faithful IR: UPDATE rows keep the PK on the old side and mark
    # changed columns in the new_bits definedness mask (exact, unlike a
    # NULL test, which would mistake "updated to NULL" for "unchanged")
    # — an update that does not touch the text leaves the index untouched
    from geodiff_spark.changeset import bit_defined

    text_def = bit_defined(F.col("new_bits"), changes.info.bit(text_col))
    text_touched = (F.col("op") == "update") & text_def
    removed_ids = df.filter((F.col("op") == "delete") | text_touched).select(
        F.col(f"old_{id_col}").alias(id_col)
    )
    added = df.filter((F.col("op") == "insert") | text_touched).select(
        F.coalesce(F.col(f"new_{id_col}"), F.col(f"old_{id_col}")).alias(id_col),
        fingerprint_expr(F.col(f"new_{text_col}")).alias("fp"),
    )
    # reselect: a USING-column anti-join moves the key to column 0
    kept = index.join(removed_ids, id_col, "left_anti").select(*index.columns)
    new_index = kept.unionByName(added.select(*index.columns))

    a, i = added.alias("a"), new_index.alias("i")
    pairs = (
        a.join(i, (F.col("a.fp") == F.col("i.fp"))
               & (F.col(f"a.{id_col}") != F.col(f"i.{id_col}")), "inner")
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"i.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"i.{id_col}")).alias("doc_b"),
            F.col("a.fp").alias("fp"),
        )
        .distinct()
    )
    return new_index, pairs


def dedup_index_build(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(fp, <id>) index over a corpus — the from-scratch twin."""
    from geodiff_spark.functions.text import fingerprint_expr

    return docs.select(
        fingerprint_expr(F.col(text_col)).alias("fp"), F.col(id_col)
    )


# --------------------------------------------------------------------------
# group-level (domain) MinHash similarity
# --------------------------------------------------------------------------

def group_minhash_sim(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Corpus-level near-duplication between GROUPS (typically domains):
    mirror sites, boilerplate farms, scraped clones.

    The group signature is the element-wise MIN over its documents'
    minhash signatures, which IS the minhash of the union of their
    shingle sets — so signature agreement between two groups estimates
    the Jaccard similarity of their combined shingle vocabularies.

    Scale shape (10^12 docs): one narrow Arrow-batched pass computes
    per-doc signatures; ONE groupBy(group) with num_perm map-side-
    combining MIN aggregates collapses the corpus to |groups| signature
    rows (text never shuffles); the pair join is the same banded-bucket
    join as doc-level LSH (minhash_sig_pairs) over the small signature
    table — never all-pairs at any level.
    """
    sig = df.select(
        F.col(group_col),
        minhash_signature_udf(num_perm, shingle_n)(F.col(text_col)).alias(
            "sig"
        ),
    )
    gsig = sig.groupBy(group_col).agg(
        F.array(
            *[F.min(F.col("sig")[i]) for i in range(num_perm)]
        ).alias("sig")
    )
    return minhash_sig_pairs(
        gsig, group_col, num_perm=num_perm, bands=bands,
        threshold=threshold, verify=True,
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    prefix_len: int = 8,
    cmp_len: int = 32,
    max_dist: int = 14,
) -> DataFrame:
    """Blocked fuzzy-duplicate pairs by EDIT DISTANCE — the record-
    linkage classic for near-identical titles/urls/headlines that token
    methods miss (single-char typos shift every shingle, but cost 1
    edit). Returns (id_a, id_b, dist) with id_a < id_b and
    ``levenshtein(prefix_a, prefix_b) <= max_dist`` over the first
    ``cmp_len`` chars.

    Blocking (the thing that makes it not O(n^2)): candidates must
    agree on their first ``prefix_len`` chars, so the self-join is an
    equi-join on a narrow block key — one key shuffle, block-local
    pairs only — with a cheap length-band prefilter (|len_a - len_b| <=
    max_dist is a lower bound on edit distance) ahead of the O(cmp_len^2)
    DP refine. Levenshtein runs JVM-side (codegen built-in) on both
    engines, so the DuckDB oracle replays the identical DP.

    Scale shape (10^12 docs): block sizes are bounded by prefix
    cardinality the same way shingle-join candidates are; a pathological
    hot block (one shared boilerplate prefix) is the documented
    ``max_shingle_df``-style caveat — raise ``prefix_len`` to split it.
    Reference parity: geodiff's closest analog is full-row equality in
    changeset diff (changesetutils.cpp); fuzzy matching is a corpus-
    curation extension.
    """
    t = df.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, cmp_len).alias("_s"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_blk"),
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, F.col("a._blk") == F.col("b._blk"))
        .filter(F.col("a._id") < F.col("b._id"))
        .filter(
            F.abs(F.length("a._s") - F.length("b._s")) <= F.lit(max_dist)
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.levenshtein(F.col("a._s"), F.col("b._s")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= F.lit(max_dist))
    )


def edit_distance_pairs_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    prefix_len: int = 8,
    cmp_len: int = 32,
    max_dist: int = 14,
) -> str:
    """DuckDB twin of :func:`edit_distance_pairs` (same blocking, same
    band prefilter, same DP)."""
    return f"""
    WITH t AS (
      SELECT {id_col} AS _id,
             substr({text_col}, 1, {cmp_len}) AS _s,
             substr({text_col}, 1, {prefix_len}) AS _blk
      FROM ({docs_sql})
    )
    SELECT a._id AS id_a, b._id AS id_b,
           CAST(levenshtein(a._s, b._s) AS BIGINT) AS dist
    FROM t a JOIN t b ON a._blk = b._blk AND a._id < b._id
    WHERE abs(length(a._s) - length(b._s)) <= {max_dist}
      AND levenshtein(a._s, b._s) <= {max_dist}
    """


def record_linkage(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    len_col: str | None = "n_chars",
    len_bucket: int = 64,
    tau_pct: int = 35,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Blocked record linkage: candidate pairs share a blocking key
    (``block_cols`` + a length bucket), then are scored by EXACT token
    Jaccard (distinct whitespace tokens of lowercased text — the repo's
    shared tokenizer) and kept when ``jaccard >= tau_pct/100``, decided
    integer-only: ``100*|a∩b| >= tau_pct*|a∪b|``.

    The standard Fellegi-Sunter-style blocking trade: recall is bounded
    by the blocking key (same-language, similar-length records only —
    near-dups across length buckets need the minhash/simhash operators,
    which exist as siblings in this module). The quadratic term is per
    block: blocks larger than ``max_block_size`` are dropped entirely
    (loud in the `n_blocked_out` companion — callers tighten the key),
    so worst-case work is #blocks * cap^2, never corpus^2.

    Scale shape: ONE shuffle on the blocking key for the self-join;
    token arrays travel once per side; the Jaccard is a codegen
    array_intersect on distinct-token arrays — no UDF, no explode.
    """
    toks = F.array_distinct(tokens_expr(F.col(text_col)))
    keyed = docs.select(
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        *(
            [F.expr(f"{len_col} div {int(len_bucket)}").alias("_b_len")]
            if len_col
            else []
        ),
        toks.alias("_toks"),
    )
    bcols = [f"_b_{c}" for c in block_cols] + (["_b_len"] if len_col else [])
    sizes = keyed.groupBy(*bcols).agg(F.count(F.lit(1)).alias("_bn"))
    keyed = keyed.join(
        sizes.filter(F.col("_bn") <= int(max_block_size)).drop("_bn"), bcols
    )
    a = keyed.select(
        *bcols,
        F.col("_id").alias("id_a"),
        F.col("_toks").alias("_ta"),
    )
    b = keyed.select(
        *bcols,
        F.col("_id").alias("id_b"),
        F.col("_toks").alias("_tb"),
    )
    pairs = (
        a.join(b, bcols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("n_inter", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn(
            "n_union",
            F.size("_ta") + F.size("_tb") - F.col("n_inter"),
        )
        .filter(F.lit(100) * F.col("n_inter") >= F.lit(int(tau_pct)) * F.col("n_union"))
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.col("n_inter").cast("long"),
            F.col("n_union").cast("long"),
        )
    )
    return pairs


def record_linkage_sql(
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    len_col: str | None = "n_chars",
    len_bucket: int = 64,
    tau_pct: int = 35,
    max_block_size: int = 10_000,
) -> str:
    """DuckDB twin of :func:`record_linkage` (list_distinct /
    list_intersect set semantics match array_distinct/array_intersect
    on counts)."""
    bexprs = [f"{c} AS b_{c}" for c in block_cols]
    bnames = [f"b_{c}" for c in block_cols]
    if len_col:
        bexprs.append(f"{len_col} // {int(len_bucket)} AS b_len")
        bnames.append("b_len")
    bl = ", ".join(bnames)
    return f"""
    WITH keyed AS (
      SELECT {id_col} AS id, {", ".join(bexprs)},
             list_distinct({tokens_sql(text_col)}) AS toks
      FROM ({docs_sql})
    ),
    ok AS (
      SELECT {bl} FROM keyed GROUP BY {bl}
      HAVING count(*) <= {int(max_block_size)}
    ),
    k2 AS (SELECT keyed.* FROM keyed JOIN ok USING ({bl})),
    pairs AS (
      SELECT x.id AS id_a, y.id AS id_b,
             len(list_intersect(x.toks, y.toks)) AS n_inter,
             len(x.toks) + len(y.toks)
               - len(list_intersect(x.toks, y.toks)) AS n_union
      FROM k2 x JOIN k2 y USING ({bl})
      WHERE x.id < y.id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_union AS BIGINT) AS n_union
    FROM pairs
    WHERE 100 * n_inter >= {int(tau_pct)} * n_union
    """
