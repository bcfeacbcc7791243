"""Text analysis for web-scale corpora: language-ID, quality scoring,
token counting, document fingerprinting.

Every function here has two faces with bit-identical results:
  * a Spark Column expression (JVM built-ins, whole-stage codegen), and
  * a DuckDB SQL string (the correctness oracle).
Arithmetic sticks to int64 folds below 2^62 and identical f64 operation
order so the driver's value-hash comparison holds exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fingerprint modulus: poly-31 fold stays < 2^62 (no wrap on either side)
FP_MOD = 1 << 57

#: tiny stopword lexicons for the n-gram/stopword language heuristic
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "pour", "que", "dans"),
    "es": ("el", "la", "los", "que", "de", "una", "por", "con", "para", "es"),
}


# --- tokenization ---------------------------------------------------------

def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empty strings removed."""
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def tokens_sql(text: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({text}), '\\s+'), t -> t <> '')"
    )


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text)).cast("long")


def token_count_sql(text: str) -> str:
    return f"CAST(len({tokens_sql(text)}) AS BIGINT)"


def bpe_ish_token_count_expr(text: Column) -> Column:
    """Sub-word-ish count: runs of letters, runs of digits, single
    punctuation — a BPE-flavored regex segmentation."""
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")


def bpe_ish_token_count_sql(text: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({text}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
        " AS BIGINT)"
    )


# --- quality scoring ------------------------------------------------------

def quality_expr(text: Column) -> Column:
    """Deterministic quality score in [0,1]:
    0.4·len_score + 0.3·(1 − punct_ratio) + 0.3·stopword_ratio,
    with len_score = least(n_chars, 2000)/2000. Pure f64 arithmetic in a
    fixed order — bit-reproducible vs the SQL twin."""
    n_chars = F.length(text).cast("double")
    len_score = F.least(n_chars, F.lit(2000.0)) / F.lit(2000.0)
    n_punct = F.size(F.regexp_extract_all(text, F.lit("[.,;:!?]"), F.lit(0))).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    toks = tokens_expr(text)
    n_tok = F.size(toks).cast("double")
    sw = F.lit(list(LANG_LEXICONS["en"]))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )


def quality_sql(text: str) -> str:
    sw = ", ".join(f"'{w}'" for w in LANG_LEXICONS["en"])
    toks = tokens_sql(text)
    return f"""(
      0.4 * (LEAST(CAST(length({text}) AS DOUBLE), 2000.0) / 2000.0)
      + 0.3 * (1.0 - (CASE WHEN length({text}) > 0
          THEN CAST(len(regexp_extract_all({text}, '[.,;:!?]')) AS DOUBLE)
               / CAST(length({text}) AS DOUBLE) ELSE 0.0 END))
      + 0.3 * (CASE WHEN len({toks}) > 0
          THEN CAST(len(list_filter({toks}, t -> t IN ({sw}))) AS DOUBLE)
               / CAST(len({toks}) AS DOUBLE) ELSE 0.0 END)
    )"""


# --- language id ----------------------------------------------------------

def lang_id_expr(text: Column) -> Column:
    """argmax of stopword hits across LANG_LEXICONS; ties broken by
    language code ascending; zero hits -> 'und'."""
    toks = tokens_expr(text)
    best = F.lit(None).cast("string")
    best_n = F.lit(-1).cast("long")

    def contains(lex):
        return lambda t: F.array_contains(lex, t)

    for code in sorted(LANG_LEXICONS):
        lex = F.lit(list(LANG_LEXICONS[code]))
        n = F.size(F.filter(toks, contains(lex))).cast("long")
        better = n > best_n
        best = F.when(better, F.lit(code)).otherwise(best)
        best_n = F.when(better, n).otherwise(best_n)
    return F.when(best_n > 0, best).otherwise(F.lit("und"))


def lang_id_sql(text: str) -> str:
    toks = tokens_sql(text)
    hit_cols = []
    for code in sorted(LANG_LEXICONS):
        sw = ", ".join(f"'{w}'" for w in LANG_LEXICONS[code])
        hit_cols.append(
            f"len(list_filter({toks}, t -> t IN ({sw})))"
        )
    # same ascending scan with strict > keeps the first max (tie -> lower code)
    codes = sorted(LANG_LEXICONS)
    expr = "-1"
    best = "NULL"
    for code, hits in zip(codes, hit_cols):
        best = f"(CASE WHEN {hits} > {expr} THEN '{code}' ELSE {best} END)"
        expr = f"GREATEST({hits}, {expr})"
    return f"(CASE WHEN {expr} > 0 THEN {best} ELSE 'und' END)"


# --- fingerprinting -------------------------------------------------------

def fingerprint_expr(text: Column) -> Column:
    """Rolling poly-31 hash over character codes, mod 2^57 — a stable
    document fingerprint. Left fold via F.aggregate (sequential, JVM)."""
    chars = F.split(text, "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(31) + c) % F.lit(FP_MOD),
    )


def fingerprint_sql(text: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({text}, ''), c -> CAST(ord(c) AS BIGINT))), "
        f"(h, c) -> (h * 31 + c) % {FP_MOD})"
    )
