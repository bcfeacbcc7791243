"""DuckDB SQL twins of the engine's hashing kernels — the oracles for
the three LSH queries (minhash_lsh, simhash, cosine_dups_lsh).

The engine's LSH internals (operators/dedup.py, operators/similarity.py)
are built from three deterministic primitives:

  * FNV-1a 64 over UTF-8 token bytes   (_fnv1a_batch)
  * splitmix64                          (_splitmix64)
  * sequential left-fold dot products   (similarity.dot_expr)

All three are exactly reproducible in DuckDB: uint64 arithmetic rides in
HUGEINT (INT128) with explicit `% 2^64`, the 64x64-bit multiplications
split into 32-bit halves to stay under INT128, and the float folds use
the list_reduce pattern already proven bit-identical for the cosine
oracles. That turns the round-1 "no_oracle" rows-only checks into full
rows+schema+hash gates: the oracle recomputes signatures/simhashes/
hyperplane buckets from scratch and replays the band-collision logic
over an all-pairs-safe small-scale join.

The mirrored reference contract: every geodiff output is golden-checked
(pygeodiff/tests/test_single_commit.py:20-68); these oracles do the same
for the LSH family.
"""

from __future__ import annotations

M64 = "18446744073709551616::HUGEINT"  # 2^64
M32 = "4294967296::HUGEINT"  # 2^32
GOLD = 0x9E3779B97F4A7C15  # splitmix64 increment / comb multiplier
SM_C1 = 0xBF58476D1CE4E5B9
SM_C2 = 0x94D049BB133111EB
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
I64_MAX = (1 << 63) - 1
TWO_POW_NEG52 = "2.220446049250313e-16"  # == 2.0**-52 exactly (round-trip)


def _mulmod(z: str, c: int) -> str:
    """(z * c) % 2^64 for z < 2^64 without overflowing signed INT128:
    split z into 32-bit halves (each half * c < 2^96)."""
    return (
        f"((({z}) % {M32}) * {c}::HUGEINT "
        f"+ (((({z}) >> 32) * {c}::HUGEINT) % {M32}) * {M32}) % {M64}"
    )


def _sm_stages(src_sql: str, x_col: str, out_col: str, carry: list[str]) -> str:
    """splitmix64 as a chain of nested SELECT stages (each intermediate
    is a named column, computed once per row — no expression blowup).
    ``src_sql`` must yield ``carry`` columns plus ``x_col`` (HUGEINT in
    [0, 2^64))."""
    c = ", ".join(carry) + (", " if carry else "")
    s = f"SELECT {c}({x_col} + {GOLD}::HUGEINT) % {M64} AS _s1 FROM ({src_sql})"
    s = f"SELECT {c}xor(_s1, _s1 >> 30) AS _z1 FROM ({s})"
    s = f"SELECT {c}{_mulmod('_z1', SM_C1)} AS _s2 FROM ({s})"
    s = f"SELECT {c}xor(_s2, _s2 >> 27) AS _z2 FROM ({s})"
    s = f"SELECT {c}{_mulmod('_z2', SM_C2)} AS _s3 FROM ({s})"
    return f"SELECT {c}xor(_s3, _s3 >> 31) AS {out_col} FROM ({s})"


def _bytes_sql(t: str) -> str:
    """UTF-8 byte values of a string expression (hex-pair parse — exact
    for any input, not just ASCII)."""
    return (
        f"list_transform(generate_series(1, octet_length(encode({t}))), i -> "
        f"strpos('0123456789ABCDEF', substring(hex(encode({t})), 2*i-1, 1))*16 + "
        f"strpos('0123456789ABCDEF', substring(hex(encode({t})), 2*i, 1)) - 17)"
    )


def fnv1a_sql(t: str) -> str:
    """FNV-1a 64 of a string expression -> HUGEINT in [0, 2^64).
    FNV's prime is < 2^41, so h*prime < 2^105 fits INT128 directly."""
    return (
        f"list_reduce(list_prepend({FNV_OFFSET}::HUGEINT, {_bytes_sql(t)}), "
        f"(h, b) -> (xor(h, b::HUGEINT) * {FNV_PRIME}::HUGEINT) % {M64})"
    )


def _token_hash_rows(docs_sql: str, id_col: str, text_col: str) -> str:
    """CTE body: (doc_id, pos, h) — FNV-1a of each whitespace token of
    lowercased text, order preserved. Tokenizer matches functions.text
    .tokens_expr / the pandas _token_hashes (.lower().split())."""
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '\\s+'), "
        f"t -> t <> '')"
    )
    tk = (
        f"SELECT {id_col} AS doc_id, "
        f"unnest({toks}) AS tok, "
        f"unnest(generate_series(1, len({toks}))) AS pos "
        f"FROM ({docs_sql})"
    )
    return f"SELECT doc_id, pos, {fnv1a_sql('tok')} AS h FROM ({tk})"


def _shingle_hash_rows(docs_sql: str, id_col: str, text_col: str, n: int) -> str:
    """CTE body: (doc_id, smv) — one row per n-gram shingle hash
    (duplicates kept), mirroring dedup._shingle_hash_stream: combine n
    consecutive token hashes with comb = comb*GOLD + next (mod 2^64),
    splitmix64 the result; docs with < n tokens fall back to
    splitmix64(token hash)."""
    h_rows = _token_hash_rows(docs_sql, id_col, text_col)
    thl = f"SELECT doc_id, list(h ORDER BY pos) AS th FROM ({h_rows}) GROUP BY doc_id"
    # full shingles: positions 1 .. len-n+1
    full = (
        f"SELECT doc_id, th, unnest(generate_series(1, len(th) - {n - 1})) AS i "
        f"FROM ({thl}) WHERE len(th) >= {n}"
    )
    comb = "th[i]"
    for j in range(1, n):
        comb = f"(({_mulmod(comb, GOLD)}) + th[i + {j}]) % {M64}"
    full_x = f"SELECT doc_id, {comb} AS x FROM ({full})"
    degen = (
        f"SELECT doc_id, unnest(th) AS x FROM ({thl}) "
        f"WHERE len(th) < {n} AND len(th) > 0"
    )
    return _sm_stages(f"{full_x} UNION ALL {degen}", "x", "smv", ["doc_id"])


def minhash_lsh_oracle_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> str:
    """Full oracle for dedup.minhash_lsh_pairs: recompute signatures
    (min over splitmix64(shingle ^ seed_p) >> 1), replay the band-slice
    collision join, emit (id_a, id_b, est_jaccard) with est >= threshold.
    Exact because the engine's band join matches on the signature SLICE
    (the murmur bucket is only a shuffle compactor)."""
    rpb = num_perm // bands
    sh = _shingle_hash_rows(docs_sql, id_col, text_col, shingle_n)
    seeds_src = (
        f"SELECT p, CAST(p * {0x9E37} AS HUGEINT) AS x "
        f"FROM generate_series(1, {num_perm}) AS g(p)"
    )
    seeds = _sm_stages(seeds_src, "x", "seed", ["p"])
    xs = (
        f"SELECT s.doc_id AS doc_id, sd.p AS p, xor(s.smv, sd.seed) AS x "
        f"FROM ({sh}) s CROSS JOIN ({seeds}) sd"
    )
    sm2 = _sm_stages(xs, "x", "smv", ["doc_id", "p"])
    return f"""
    WITH mh AS (
      SELECT doc_id, p, MIN(CAST(smv >> 1 AS BIGINT)) AS mn
      FROM ({sm2}) GROUP BY doc_id, p
    ), sig AS (
      SELECT d.{id_col} AS doc_id,
             COALESCE(s.sig, [{", ".join([str(I64_MAX)] * num_perm)}]) AS sig
      FROM ({docs_sql}) d
      LEFT JOIN (SELECT doc_id, list(mn ORDER BY p) AS sig
                 FROM mh GROUP BY doc_id) s ON s.doc_id = d.{id_col}
    ), banded AS (
      SELECT doc_id, sig, band,
             list_slice(sig, band*{rpb}+1, band*{rpb}+{rpb}) AS sl
      FROM (SELECT doc_id, sig,
                   unnest(generate_series(0, {bands - 1})) AS band FROM sig)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.sig AS sa, b.sig AS sb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, est_jaccard FROM (
      SELECT id_a, id_b,
             CAST(len(list_filter(generate_series(1, {num_perm}),
                                  i -> sa[i] = sb[i])) AS DOUBLE)
             / CAST({float(num_perm)} AS DOUBLE) AS est_jaccard
      FROM cand
    ) WHERE est_jaccard >= CAST({threshold} AS DOUBLE)
    """


def group_minhash_oracle_sql(
    docs_sql: str,
    id_col: str,
    group_col: str,
    text_col: str,
    *,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> str:
    """Oracle for dedup.group_minhash_sim: per-doc shingle hashes are
    recomputed exactly as in minhash_lsh_oracle_sql, the signature MIN
    is taken per (group, permutation) — the minhash of the union of the
    group's shingle sets — and the banded pair join is replayed over
    the group signatures. Groups whose docs are all token-less fall back
    to the all-I64_MAX signature (same as the engine's empty-doc
    fallback folded through MIN)."""
    rpb = num_perm // bands
    sh = _shingle_hash_rows(docs_sql, id_col, text_col, shingle_n)
    seeds_src = (
        f"SELECT p, CAST(p * {0x9E37} AS HUGEINT) AS x "
        f"FROM generate_series(1, {num_perm}) AS g(p)"
    )
    seeds = _sm_stages(seeds_src, "x", "seed", ["p"])
    xs = (
        f"SELECT s.doc_id AS doc_id, sd.p AS p, xor(s.smv, sd.seed) AS x "
        f"FROM ({sh}) s CROSS JOIN ({seeds}) sd"
    )
    sm2 = _sm_stages(xs, "x", "smv", ["doc_id", "p"])
    grp_map = f"SELECT {id_col} AS doc_id, {group_col} AS grp FROM ({docs_sql})"
    return f"""
    WITH mh AS (
      SELECT g.grp AS grp, m.p AS p, MIN(CAST(m.smv >> 1 AS BIGINT)) AS mn
      FROM ({sm2}) m JOIN ({grp_map}) g ON m.doc_id = g.doc_id
      GROUP BY g.grp, m.p
    ), sig AS (
      SELECT d.grp AS grp,
             COALESCE(s.sig, [{", ".join([str(I64_MAX)] * num_perm)}]) AS sig
      FROM (SELECT DISTINCT grp FROM ({grp_map})) d
      LEFT JOIN (SELECT grp, list(mn ORDER BY p) AS sig
                 FROM mh GROUP BY grp) s ON s.grp = d.grp
    ), banded AS (
      SELECT grp, sig, band,
             list_slice(sig, band*{rpb}+1, band*{rpb}+{rpb}) AS sl
      FROM (SELECT grp, sig,
                   unnest(generate_series(0, {bands - 1})) AS band FROM sig)
    ), cand AS (
      SELECT DISTINCT a.grp AS id_a, b.grp AS id_b, a.sig AS sa, b.sig AS sb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sl = b.sl AND a.grp < b.grp
    )
    SELECT id_a, id_b, est_jaccard FROM (
      SELECT id_a, id_b,
             CAST(len(list_filter(generate_series(1, {num_perm}),
                                  i -> sa[i] = sb[i])) AS DOUBLE)
             / CAST({float(num_perm)} AS DOUBLE) AS est_jaccard
      FROM cand
    ) WHERE est_jaccard >= CAST({threshold} AS DOUBLE)
    """


def simhash_oracle_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
) -> str:
    """Full oracle for dedup.simhash_pairs: recompute the 64-bit simhash
    (per-bit majority vote over token FNV hashes) and take ALL pairs
    with hamming <= max_hamming. Valid because the engine's chunked
    pigeonhole candidates are COMPLETE for max_hamming <= chunks-1."""
    h_rows = _token_hash_rows(docs_sql, id_col, text_col)
    return f"""
    WITH votes AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE 0 END) AS cnt,
             COUNT(*) AS m
      FROM ({h_rows}) CROSS JOIN (
        SELECT unnest(generate_series(0, 63)) AS b) bits
      GROUP BY doc_id, b
    ), val AS (
      SELECT doc_id,
             SUM(CASE WHEN 2*cnt > m THEN (1::HUGEINT << b)
                 ELSE 0::HUGEINT END) AS v
      FROM votes GROUP BY doc_id
    ), sh AS (
      SELECT d.{id_col} AS doc_id,
             CAST(CASE WHEN COALESCE(v.v, 0::HUGEINT)
                            >= 9223372036854775808::HUGEINT
                  THEN COALESCE(v.v, 0::HUGEINT) - {M64}
                  ELSE COALESCE(v.v, 0::HUGEINT) END AS BIGINT) AS sh
      FROM ({docs_sql}) d LEFT JOIN val v ON v.doc_id = d.{id_col}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


def cosine_lsh_oracle_sql(
    emb_sql: str,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    threshold: float,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 13,
) -> str:
    """Full oracle for similarity.cosine_dup_pairs(exact=False):
    regenerate the splitmix64-derived hyperplanes, recompute sign
    buckets with the same sequential left-fold projection, replay the
    (band, bucket) join, and score candidates with the engine's
    reciprocal-norm cosine — all folds bit-identical."""
    width = n_planes // bands
    base = (seed * GOLD) % (1 << 64)
    planes_src = (
        f"SELECT i, (CAST({base} AS HUGEINT) + i) % {M64} AS x "
        f"FROM (SELECT unnest(generate_series(0, {n_planes * dim - 1})) AS i)"
    )
    planes_sm = _sm_stages(planes_src, "x", "smv", ["i"])
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip({a}, {b}), pr -> pr[1] * pr[2])), "
        "(acc, t) -> acc + t)"
    )
    return f"""
    WITH e AS (
      SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM ({emb_sql})
    ), pl AS (
      SELECT i // {dim} AS p, list(
               CAST(smv >> 11 AS DOUBLE) * CAST({TWO_POW_NEG52} AS DOUBLE)
               - CAST(1.0 AS DOUBLE) ORDER BY i % {dim}) AS pw
      FROM ({planes_sm}) GROUP BY i // {dim}
    ), proj AS (
      SELECT vec_id, p,
             {dot.format(a="v", b="pw")} AS pj
      FROM e CROSS JOIN pl
    ), buck AS (
      SELECT vec_id, p // {width} AS band,
             SUM(CASE WHEN pj > CAST(0.0 AS DOUBLE)
                 THEN (1::BIGINT << (p % {width})) ELSE 0::BIGINT END) AS bucket
      FROM proj GROUP BY vec_id, p // {width}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buck a JOIN buck b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), scored AS (
      SELECT id_a, id_b,
             {dot.format(a="ea.v", b="eb.v")}
             * (CAST(1.0 AS DOUBLE) / sqrt({dot.format(a="ea.v", b="ea.v")}))
             * (CAST(1.0 AS DOUBLE) / sqrt({dot.format(a="eb.v", b="eb.v")}))
             AS cos_sim
      FROM cand
      JOIN e ea ON ea.vec_id = cand.id_a
      JOIN e eb ON eb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, cos_sim FROM scored
    WHERE cos_sim >= CAST({threshold} AS DOUBLE)
    """
