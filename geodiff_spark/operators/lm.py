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
    # bg feeds the model and the probe join, c12 feeds c1 and the model
    # projection — lazy checkpoints: tokenize+explode and the (w1, w2)
    # count shuffle each run once, not once per consumer
    bg = bigram_rows(df, id_col, text_col).localCheckpoint(eager=False)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint(
        eager=False
    )
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
    # lazy checkpoint materialized by the count: the scoring pipeline
    # (bigram explode + model joins) runs ONCE; the cumsum below walks
    # the scored relation three times (range sampling, partition
    # offsets, main branch) and reads persisted blocks each time. (A
    # cache()/count()/unpersist() sequence here recomputed the scores
    # per walk — the unpersist dropped the blocks before the plan ran.)
    s = s.localCheckpoint(eager=False)
    total = s.count()
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
    # the source bigram stream feeds its own LM *and* the probe join,
    # and each c12 model feeds (c1, vocab, probe) — lazy checkpoints so
    # the tokenize+explode and the model groupBys run ONCE per corpus
    # instead of once per consumer (Catalyst does not dedupe subtrees)
    bg_s = bigram_rows(source, id_col, text_col).localCheckpoint(eager=False)
    bg_t = bigram_rows(target, id_col, text_col)

    def model(bg):
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint(
            eager=False
        )
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


# --- BPE tokenizer training -------------------------------------------------

US = "\x1f"  # token delimiter inside a word's seq; never occurs in tokens


def _bpe_word_freqs(
    docs: DataFrame, text_col: str, max_word_len: int
) -> DataFrame:
    """(word, freq) table — the classical BPE training state (Sennrich et
    al. 2016: merges never cross word boundaries, so training folds over
    the VOCABULARY weighted by frequency, not over raw documents). Text
    is sanitized to printable ASCII so the delimiter can never collide
    and cross-engine collation is binary-identical."""
    w = F.explode(
        F.split(F.regexp_replace(F.col(text_col), "[^ -~]", ""), r"\s+")
    ).alias("w")
    return (
        docs.select(w)
        .select(F.substring("w", 1, max_word_len).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pairs_expr(seq):
    """Adjacent token pairs of a seq string (pair = left||US||right).
    split('_t1_..._tn_') -> ['', t1..tn, ''] so tokens sit at 0-based
    1..size-2; guard size>=4 because Spark's sequence(1, 0) DESCENDS."""
    a = F.split(seq, US)
    return F.when(
        F.size(a) >= 4,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - 3),
            lambda i: F.concat(
                F.element_at(a, i + 1), F.lit(US), F.element_at(a, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _merge_fold(seq, lt, rt):
    """Exact greedy left-to-right merge of pair (lt, rt) in a seq string:
    fold over the split tokens carrying the joined prefix; a merged token
    is closed (trailing US) so it never re-merges as a left side within
    the same round — precisely Sennrich's non-overlapping scan."""
    m = F.aggregate(
        F.split(seq, US),
        F.lit(""),
        lambda acc, x: (
            F.when(x == "", acc)  # split sentinels
            .when(acc == "", F.concat(F.lit(US), x))
            .when(
                ~acc.endswith(F.lit(US))
                & acc.endswith(F.concat(F.lit(US), lt))
                & (x == rt),
                F.concat(acc, x, F.lit(US)),
            )
            .when(acc.endswith(F.lit(US)), F.concat(acc, x))
            .otherwise(F.concat(acc, F.lit(US), x))
        ),
    )
    return F.when(m.endswith(F.lit(US)), m).otherwise(F.concat(m, F.lit(US)))


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 5,
    max_word_len: int = 16,
) -> DataFrame:
    """Byte-pair-encoding tokenizer training: the first ``n_merges``
    merge rules learned from the corpus. Returns (merge_rank, left_tok,
    right_tok, cnt) — the merge table, in learned order; cnt is the
    frequency-weighted pair count that won the round (ties broken by
    pair string ascending — deterministic cross-engine on the
    ASCII-sanitized corpus).

    Scale shape: state is the WORD-FREQUENCY table (|vocab| rows), never
    the corpus — one explode+groupBy builds it; each round is one
    pair-count groupBy over <= |vocab|*(max_word_len-1) short rows with
    map-side partials, a 1-row TakeOrdered winner, and a broadcast
    crossJoin + per-word fold rewrite (narrow, codegen). No collects —
    the winner stays a DataFrame; k rounds = k tiny jobs in one lazy
    plan. At 10^12 docs the vocab is tens of millions of rows: every
    shuffle is vocab-sized, the corpus is read once.
    """
    state = _bpe_word_freqs(docs, text_col, max_word_len).select(
        "freq",
        F.concat(
            F.lit(US), F.array_join(F.split(F.col("w"), ""), US), F.lit(US)
        ).alias("seq"),
    )
    # per-round lineage truncation: each round's winner is an ACTION
    # (TakeOrdered), so without checkpoints round r would lazily replay
    # every earlier fold — O(rounds^2) work and a codegen tower. With
    # them each round runs exactly once (same discipline as the
    # iterative graph operators). LAZY since r06: the winner's
    # TakeOrderedAndProject reads every partition, materializing the
    # round's state blocks in the same job — an eager checkpoint spent
    # one extra job per round walking identical data.
    state = state.localCheckpoint(eager=False)
    winners = []
    for r in range(1, n_merges + 1):
        counts = (
            state.select("freq", F.explode(_pairs_expr(F.col("seq"))).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("freq").alias("cnt"))
        )
        win = (
            counts.orderBy(F.desc("cnt"), F.asc("pr"))
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("merge_rank"),
                F.element_at(F.split(F.col("pr"), US), 1).alias("left_tok"),
                F.element_at(F.split(F.col("pr"), US), 2).alias("right_tok"),
                F.col("cnt"),
            )
            # lazy: the next round's broadcast build (or the final
            # union) is the materializing action for this 1-row winner
            .localCheckpoint(eager=False)
        )
        winners.append(win)
        if r < n_merges:
            state = state.crossJoin(
                F.broadcast(
                    win.select(
                        F.col("left_tok").alias("_lt"), F.col("right_tok").alias("_rt")
                    )
                )
            ).select(
                "freq",
                _merge_fold(F.col("seq"), F.col("_lt"), F.col("_rt")).alias("seq"),
            ).localCheckpoint(eager=False)
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out


def bpe_train_sql(
    docs_sql: str,
    text_col: str,
    n_merges: int = 5,
    max_word_len: int = 16,
) -> str:
    """DuckDB twin of :func:`bpe_train` — rounds unrolled as CTE stages;
    the fold is list_reduce with the acc seeded by list_prepend('')."""
    d = "chr(31)"
    fold = f"""
      CASE WHEN NOT ends_with(_m, {d}) THEN _m || {d} ELSE _m END
    """
    parts = [
        f"""wf AS (
      SELECT w, count(*) AS freq FROM (
        SELECT substr(x, 1, {max_word_len}) AS w FROM (
          SELECT unnest(regexp_split_to_array(
                   regexp_replace({text_col}, '[^ -~]', '', 'g'), '\\s+')) AS x
          FROM ({docs_sql})
        )
      ) WHERE w <> '' GROUP BY w
    )""",
        f"""s0 AS (
      SELECT freq,
             {d} || array_to_string(str_split(w, ''), {d}) || {d} AS seq
      FROM wf
    )""",
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""c{r} AS (
      SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(range(2, len(a) - 1),
                                     i -> a[i] || {d} || a[i + 1])) AS pr
        FROM (SELECT freq, str_split(seq, {d}) AS a FROM s{r - 1})
      ) GROUP BY pr
    )""")
        parts.append(f"""w{r} AS (
      SELECT {r}::BIGINT AS merge_rank,
             str_split(pr, {d})[1] AS left_tok,
             str_split(pr, {d})[2] AS right_tok, cnt
      FROM c{r} ORDER BY cnt DESC, pr ASC LIMIT 1
    )""")
        if r < n_merges:
            parts.append(f"""s{r} AS (
      SELECT freq, {fold.replace("_m", f'''list_reduce(
        list_prepend('', str_split(seq, {d})),
        (acc, x) -> CASE
          WHEN x = '' THEN acc
          WHEN acc = '' THEN {d} || x
          WHEN NOT ends_with(acc, {d})
               AND ends_with(acc, {d} || w{r}.left_tok) AND x = w{r}.right_tok
            THEN acc || x || {d}
          WHEN ends_with(acc, {d}) THEN acc || x
          ELSE acc || {d} || x END)''')} AS seq
      FROM s{r - 1}, w{r}
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM w{r}" for r in range(1, n_merges + 1))
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({union})"


def bpe_encode_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 5,
    max_word_len: int = 16,
) -> DataFrame:
    """ENCODE with the trained tokenizer — the other half of the BPE
    arc: train on the corpus (:func:`bpe_train`), then apply the merge
    table to every document and report exact token statistics:
    (id, n_tokens, n_words) — the real token count a budget/packing
    pipeline needs, vs the whitespace/regex approximations in
    functions/text.py.

    Scale shape: training cost is vocab-sized (see bpe_train); encoding
    is the corpus-sized part and it is a chain of ``n_merges`` narrow
    fold rewrites per WORD with the merge pair broadcast-joined in —
    zero shuffles besides the final per-doc sum groupBy; the same
    greedy fold as training, so train/encode tokenizations agree
    exactly (and with the DuckDB oracle, byte-for-byte).
    """
    merges = bpe_train(docs, text_col, n_merges, max_word_len)
    words = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(F.regexp_replace(F.col(text_col), "[^ -~]", ""), r"\s+")
        ).alias("w"),
    ).select(
        "_id", F.substring("w", 1, max_word_len).alias("w")
    ).filter(F.length("w") > 0)
    seqs = words.select(
        "_id",
        F.concat(
            F.lit(US), F.array_join(F.split(F.col("w"), ""), US), F.lit(US)
        ).alias("seq"),
    )
    for r in range(1, n_merges + 1):
        mr = merges.filter(F.col("merge_rank") == r).select(
            F.col("left_tok").alias("_lt"), F.col("right_tok").alias("_rt")
        )
        seqs = seqs.crossJoin(F.broadcast(mr)).select(
            "_id", _merge_fold(F.col("seq"), F.col("_lt"), F.col("_rt")).alias("seq")
        )
    toks = seqs.select(
        "_id", (F.size(F.split(F.col("seq"), US)) - 2).cast("long").alias("nt")
    )
    return toks.groupBy("_id").agg(
        F.sum("nt").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    ).select(F.col("_id").alias(id_col), "n_tokens", "n_words")


def bpe_encode_counts_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    n_merges: int = 5,
    max_word_len: int = 16,
) -> str:
    """DuckDB twin of :func:`bpe_encode_counts`: the training CTE chain
    from bpe_train_sql, then the same fold chain applied to the
    per-document word list."""
    d = "chr(31)"
    train = bpe_train_sql(docs_sql, text_col, n_merges, max_word_len)
    # reuse the training CTE chain: strip the final SELECT, keep WITH body
    with_body = train[: train.rindex("\nSELECT")]
    parts = [
        f"""e0 AS (
      SELECT _id, {d} || array_to_string(str_split(w, ''), {d}) || {d} AS seq
      FROM (
        SELECT _id, substr(x, 1, {max_word_len}) AS w FROM (
          SELECT {id_col} AS _id, unnest(regexp_split_to_array(
                   regexp_replace({text_col}, '[^ -~]', '', 'g'), '\\s+')) AS x
          FROM ({docs_sql})
        )
      ) WHERE w <> ''
    )"""
    ]
    for r in range(1, n_merges + 1):
        fold = f"""list_reduce(
        list_prepend('', str_split(seq, {d})),
        (acc, x) -> CASE
          WHEN x = '' THEN acc
          WHEN acc = '' THEN {d} || x
          WHEN NOT ends_with(acc, {d})
               AND ends_with(acc, {d} || w{r}.left_tok) AND x = w{r}.right_tok
            THEN acc || x || {d}
          WHEN ends_with(acc, {d}) THEN acc || x
          ELSE acc || {d} || x END)"""
        parts.append(f"""e{r} AS (
      SELECT _id,
             CASE WHEN NOT ends_with({fold}, {d}) THEN {fold} || {d}
                  ELSE {fold} END AS seq
      FROM e{r - 1}, w{r}
    )""")
    return (
        with_body + ",\n" + ",\n".join(parts)
        + f"""
    SELECT _id AS {id_col},
           CAST(SUM(len(str_split(seq, {d})) - 2) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_words
    FROM e{n_merges} GROUP BY _id
    """
    )
