"""Corpus bigram language-model fluency scoring.

A classic LLM-pipeline quality signal (KenLM-style filtering, e.g.
CCNet): score each document by how predictable its token bigrams are
under a model counted from the corpus itself. To stay bit-exact across
engines (the repo's oracle discipline), the per-bigram conditional
probability P(w2|w1) = c(w1,w2)/c(w1) is kept as the integer
``(c12 * scale) div c1`` and summed as BIGINT — integer addition
commutes exactly, so the score is partitioning- and order-invariant,
unlike a float log-prob sum. The ln()/perplexity transform is a
driver-side presentation step (same split as the HLL estimate).

Scale shape (10^12 docs):
  * bigram extraction is a narrow per-row array op (zip of two token
    slices) — no shuffle, whole-stage codegen;
  * c(w1,w2) is ONE map-side-combining groupBy of the exploded bigrams;
    c(w1) folds from the c12 table (|vocab^2| rows, not the corpus);
  * the probe join keys on (w1, w2) — hot bigrams ("of the") are a
    classic skew key, left to AQE skew-join (enabled by session.py);
    the per-doc sum is a second map-side-combining groupBy on doc id.
  * ``scale`` defaults to 10^6: c12 <= 10^12 bigrams keeps
    c12 * scale < 2^63 with an order of magnitude to spare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr, tokens_sql

DEFAULT_SCALE = 1_000_000


def bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per token-bigram occurrence: (id, w1, w2). Narrow."""
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    return df.select(
        F.col(id_col), F.explode(pairs).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def bigram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """-> (id, n_bigrams, score_scaled): score_scaled = sum over the
    doc's bigram occurrences of (c(w1,w2) * scale) div c(w1), counted
    over the WHOLE input corpus. Higher = more predictable text;
    score_scaled / (n_bigrams * scale) is the avg conditional
    probability (driver-side presentation). Docs with < 2 tokens emit
    no row (they have no bigrams to score)."""
    bg = bigram_rows(df, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = c12.join(c1, "w1").select(
        "w1", "w2", F.expr(f"CAST((c12 * {scale}) DIV c1 AS BIGINT)").alias("_p")
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_p").alias("score_scaled"),
        )
    )


def bigram_lm_scores_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` (bit-exact: same integer
    floor-div and BIGINT sums; `//` and Spark's DIV agree on
    positives)."""
    t = tokens_sql(text_col)
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc_id, {t} AS t FROM ({docs_sql})
    ), bg AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
    ), model AS (
      SELECT c12.w1, c12.w2, CAST((c12.c12 * {scale}) // c1.c1 AS BIGINT) AS p
      FROM c12 JOIN c1 ON c12.w1 = c1.w1
    )
    SELECT bg.doc_id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(m.p) AS BIGINT) AS score_scaled
    FROM bg JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
    GROUP BY bg.doc_id
    """


def fluency_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """CCNet-style corpus partition by LM fluency: rank documents by
    average bigram conditional probability (descending) and split them
    into ``n_buckets`` NTILE-equivalent buckets (1 = most fluent
    "head", ..., n = "tail") — the quality-tiered sampling primitive of
    web-corpus pipelines.

    Scale shape: a bare ``NTILE() OVER (ORDER BY ...)`` funnels the
    corpus through ONE task, so the rank comes from the two-phase
    range-partitioned cumsum (:func:`corpus.global_cumsum`) instead,
    and the bucket is the closed-form NTILE formula over (rank, total):
    with base = T div n and rem = T mod n, the first ``rem`` buckets
    hold base+1 rows — bit-identical to the SQL-standard NTILE both
    engines implement. Costs one extra scalar count job (the T
    literal); docs with no bigrams (< 2 tokens) are excluded, as CCNet
    drops unscorable docs. -> (id, avg_prob_scaled, bucket int)."""
    from .corpus import global_cumsum

    s = (
        bigram_lm_scores(df, id_col, text_col, scale=scale)
        .filter(F.col("n_bigrams") > 0)
        .withColumn(
            "avg_prob_scaled",
            F.expr("CAST(score_scaled DIV n_bigrams AS BIGINT)"),
        )
        .withColumn("_neg", -F.col("avg_prob_scaled"))
        .withColumn("_one", F.lit(1).cast("bigint"))
    )
    s = s.cache()
    try:
        total = s.count()
    finally:
        s.unpersist()  # lazy handle stays valid for the plan below
    base, rem = total // n_buckets, total % n_buckets
    cut = rem * (base + 1)
    r = global_cumsum(s, ["_neg", id_col], "_one", out="_rank")
    # exact integer DIV (double division would round at 10^12 ranks)
    bucket = F.expr(
        f"CASE WHEN _rank <= {cut} THEN (_rank - 1) DIV {base + 1} + 1 "
        f"ELSE {rem} + (_rank - {cut} - 1) DIV {max(base, 1)} + 1 END"
    )
    return r.select(
        F.col(id_col),
        "avg_prob_scaled",
        bucket.cast("int").alias("bucket"),
    )


def fluency_buckets_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 3,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin of :func:`fluency_buckets` — states the semantics as
    the plain NTILE the distributed closed form replicates."""
    scores = bigram_lm_scores_sql(docs_sql, id_col, text_col, scale=scale)
    return f"""
    WITH scores AS ({scores}),
    f AS (
      SELECT {id_col},
             CAST(score_scaled // n_bigrams AS BIGINT) AS avg_prob_scaled
      FROM scores WHERE n_bigrams > 0
    )
    SELECT {id_col}, avg_prob_scaled,
           CAST(NTILE({n_buckets}) OVER (
             ORDER BY avg_prob_scaled DESC, {id_col}
           ) AS INT) AS bucket
    FROM f
    """


def dsir_weights(
    source: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public method): score every SOURCE document by how much more likely
    its bigrams are under the TARGET corpus' bigram LM than under the
    source's own. High-weight docs look like the target distribution
    (the published recipe for selecting e.g. Wikipedia-like text out of
    Common Crawl).

    Integer-exact transcription of the likelihood ratio (the repo's
    oracle discipline, same pattern as :func:`bigram_lm_scores`):

      p̂(w2|w1)    = ((c12 + 1) * scale) div (c1 + V)   (Laplace, per LM)
      ratio        = (p̂_target * scale) div max(p̂_source, 1)
      weight_sum   = Σ ratio over the doc's bigram occurrences

    so the graded output is pure BIGINT (order/partitioning-invariant);
    the DSIR log-product form ln Π ratio ≈ Σ ln(ratio/scale) is a
    driver-side presentation step, exactly like the HLL ln()
    correction. V = |distinct w2 across both corpora| (the shared
    smoothing support). ``scale`` bounds relative floor error at
    1/scale per bigram; (c12+1)*scale must stay < 2^63 (10^12 bigrams
    at the default 10^6 leaves 10x headroom).

    -> (id, n_bigrams, weight_sum_scaled)

    Scale shape (10^12 source docs, small target — the DSIR setting):
    both LMs are one map-side-combining groupBy each (model size is
    |vocab²|, NOT corpus-sized; the target model is typically tiny);
    the probe is the source bigram stream joined to the two models on
    (w1, w2) / (w1) — hot function-word bigrams are the classic skew
    keys, handled by AQE skew-join; V is a 1-row broadcast. No step
    touches corpus × corpus.
    """
    bg_s = bigram_rows(source, id_col, text_col)
    bg_t = bigram_rows(target, id_col, text_col)

    def model(bg):
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
        return c12, c1

    c12_s, c1_s = model(bg_s)
    c12_t, c1_t = model(bg_t)
    vocab = (
        c12_s.select("w2")
        .unionByName(c12_t.select("w2"))
        .agg(F.count_distinct("w2").alias("V"))
    )
    probe = (
        bg_s.join(c12_s, ["w1", "w2"])
        .join(c1_s, "w1")
        .join(c12_t.withColumnRenamed("c12", "c12t"), ["w1", "w2"], "left")
        .join(c1_t.withColumnRenamed("c1", "c1t"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.expr(
                f"CAST((coalesce(c12t, 0) + 1) * {scale} DIV (coalesce(c1t, 0) + V) AS BIGINT)"
            ).alias("_pt"),
            F.expr(
                f"GREATEST(CAST((c12 + 1) * {scale} DIV (c1 + V) AS BIGINT), CAST(1 AS BIGINT))"
            ).alias("_ps"),
        )
    )
    return probe.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.expr(f"CAST(_pt * {scale} DIV _ps AS BIGINT)")).alias(
            "weight_sum_scaled"
        ),
    )


def dsir_weights_sql(
    source_sql: str,
    target_sql: str,
    id_col: str,
    text_col: str,
    *,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin of :func:`dsir_weights` (same double floor-div)."""
    t = tokens_sql(text_col)

    def bg(src, name):
        return f"""{name} AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT {id_col} AS doc_id, {t} AS t, unnest(generate_series(1, len({t}) - 1)) AS i
            FROM ({src}) WHERE len({t}) >= 2)
    )"""

    return f"""
    WITH {bg(source_sql, 'bgs')}, {bg(target_sql, 'bgt')},
    c12s AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bgs GROUP BY w1, w2),
    c1s AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12s GROUP BY w1),
    c12t AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12t FROM bgt GROUP BY w1, w2),
    c1t AS (SELECT w1, CAST(SUM(c12t) AS BIGINT) AS c1t FROM c12t GROUP BY w1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS V
      FROM (SELECT w2 FROM c12s UNION ALL SELECT w2 FROM c12t)
    ),
    probe AS (
      SELECT bgs.doc_id,
             CAST((coalesce(c12t.c12t, 0) + 1) * {scale} // (coalesce(c1t.c1t, 0) + vocab.V) AS BIGINT) AS pt,
             GREATEST(CAST((c12s.c12 + 1) * {scale} // (c1s.c1 + vocab.V) AS BIGINT), CAST(1 AS BIGINT)) AS ps
      FROM bgs
      JOIN c12s ON bgs.w1 = c12s.w1 AND bgs.w2 = c12s.w2
      JOIN c1s ON bgs.w1 = c1s.w1
      LEFT JOIN c12t ON bgs.w1 = c12t.w1 AND bgs.w2 = c12t.w2
      LEFT JOIN c1t ON bgs.w1 = c1t.w1
      CROSS JOIN vocab
    )
    SELECT doc_id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(pt * {scale} // ps AS BIGINT)) AS BIGINT) AS weight_sum_scaled
    FROM probe GROUP BY doc_id
    """


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_tokens_per_doc: int = 20,
    min_count: int = 2,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Corpus collocation mining by pointwise mutual information over
    document co-occurrence: token pairs that appear in the same
    document far more often than their independent document
    frequencies predict (the classic phrase/entity-association signal;
    Church & Hanks 1990 — public method).

    Integer-exact transcription of the PMI ratio
    c12·N / (c1·c2) (the exp of PMI; monotone in it, so ranking and
    thresholds agree with the log form, which stays driver-side like
    every ln() in this repo):

        t1         = (c12 * scale) DIV c1          (≤ scale, since c12 ≤ c1)
        pmi_scaled = (t1 * N) DIV c2

    The two-step division bounds every intermediate by scale·N — at
    N = 10^12 docs and the default 10^6 scale that is 10^18 < 2^63,
    where the naive c12·N·scale would overflow at corpus scale.

    Each document contributes its DISTINCT token set, capped
    deterministically to the ``max_tokens_per_doc`` lexicographically
    smallest tokens — the cap bounds the per-doc pair fan-out at
    m(m−1)/2 (the hot-doc quadratic trap, same role as ngram-jaccard's
    max_shingle_df), and the deterministic rule keeps both engines and
    every retry identical.

    -> (w1, w2, c12, c1, c2, pmi_scaled) for pairs with c12 >= min_count.

    Scale shape: the pair explode is a zero-shuffle array transform
    (sorted-distinct slice, nested lambda — pure codegen); c12 and c1
    are map-side-combining groupBys over vocab-sized relations; the
    probe joins key on single tokens (w1 / w2 — AQE handles the
    function-word skew). Nothing is ever corpus × corpus.
    """
    toks = tokens_expr(F.col(text_col))
    arr = F.slice(F.array_sort(F.array_distinct(toks)), 1, max_tokens_per_doc)
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        )
    )
    base = df.select(F.col(id_col), arr.alias("_arr"), pairs.alias("_pairs"))
    n_docs = base.count()
    c12 = (
        base.select(F.explode("_pairs").alias("p"))
        .select(F.col("p.w1"), F.col("p.w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    c1 = (
        base.select(F.explode("_arr").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        c12.join(c1.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
    )
    return out.select(
        "w1",
        "w2",
        "c12",
        "c1",
        "c2",
        F.expr(
            f"CAST(((c12 * {scale}) DIV c1) * {n_docs} DIV c2 AS BIGINT)"
        ).alias("pmi_scaled"),
    )


def pmi_collocations_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    max_tokens_per_doc: int = 20,
    min_count: int = 2,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin of :func:`pmi_collocations` (same two-step DIV)."""
    t = tokens_sql(text_col)
    m = max_tokens_per_doc
    return f"""
    WITH capped AS MATERIALIZED (
      SELECT {id_col} AS doc_id,
             list_slice(list_sort(list_distinct({t})), 1, {m}) AS a
      FROM ({docs_sql})
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM capped),
    pairs AS (
      SELECT doc_id, a[i] AS w1, a[j] AS w2 FROM (
        SELECT doc_id, a, i, unnest(range(i + 1, len(a) + 1)) AS j
        FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i FROM capped)
      )
    ),
    c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs
      GROUP BY w1, w2 HAVING count(*) >= {min_count}
    ),
    c1 AS (
      SELECT w AS tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(a) AS w, doc_id FROM capped) GROUP BY w
    )
    SELECT c12.w1, c12.w2, c12.c12, a.c AS c1, b.c AS c2,
           CAST(((c12.c12 * {scale}) // a.c) * (SELECT n_docs FROM n) // b.c
                AS BIGINT) AS pmi_scaled
    FROM c12 JOIN c1 a ON c12.w1 = a.tok JOIN c1 b ON c12.w2 = b.tok
    """
