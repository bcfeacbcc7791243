"""Web-corpus kernels: URL canonicalization, domain extraction, PII
redaction, repetition (Gopher-style) signals — the per-document scalar
layer of a training-data pipeline.

Like functions/text.py, every kernel has two bit-identical faces:
  * a Spark Column expression (JVM built-ins, whole-stage codegen), and
  * a DuckDB SQL string (the correctness oracle).
The regex subset used works identically in Java regex and RE2 (no
backrefs, no lookaround). Reference analogy: geodiff normalizes values
before comparison (datetime ms guard, sqlitedriver.cpp); here the
normalization target is the URL/PII surface of web text.

Scale notes (100 TB): everything in this module is a narrow, per-row
projection — no shuffle, no UDF, stays inside whole-stage codegen. The
corpus-level consumers (per-domain caps, span dedup, decontamination)
live in operators/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking query parameters dropped by canonicalization (C4/CommonCrawl
# cleaning convention).
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|ref)="

# PII regexes — same semantics under Java regex and RE2.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PHONE_RE = "\\+?[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
IPV4_RE = (
    "[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\."
    "[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?"
)


# --- deterministic synthetic URL / PII columns (test-input generators) ----

def synth_url_expr(doc_id: Column, source: Column) -> Column:
    """Deterministic messy URL for a document — mixed-case scheme/host,
    default port, tracking params, fragments, trailing slashes — so the
    canonicalizer has real work to do. Pure function of (doc_id, source);
    the SQL twin produces byte-identical strings."""
    d = doc_id.cast("long")
    base = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(source),
        F.lit("-Example.COM:443/articles/"),
        (d % 7).cast("string"),
        F.lit("/item-"),
        d.cast("string"),
    )
    base = F.when(d % 5 == 0, F.concat(base, F.lit("/"))).otherwise(base)
    q = F.when(
        d % 3 == 0,
        F.concat(F.lit("?utm_source=feed&id="), d.cast("string"), F.lit("&utm_campaign=x")),
    ).when(d % 3 == 1, F.concat(F.lit("?id="), d.cast("string"), F.lit("&b=2&a=1"))).otherwise(F.lit(""))
    frag = F.when(d % 4 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(base, q, frag)


def synth_url_sql(doc_id: str, source: str) -> str:
    return f"""(
      'HTTPS://WWW.' || upper({source}) || '-Example.COM:443/articles/'
      || CAST({doc_id} % 7 AS VARCHAR) || '/item-' || CAST({doc_id} AS VARCHAR)
      || (CASE WHEN {doc_id} % 5 = 0 THEN '/' ELSE '' END)
      || (CASE WHEN {doc_id} % 3 = 0
            THEN '?utm_source=feed&id=' || CAST({doc_id} AS VARCHAR) || '&utm_campaign=x'
          WHEN {doc_id} % 3 = 1
            THEN '?id=' || CAST({doc_id} AS VARCHAR) || '&b=2&a=1'
          ELSE '' END)
      || (CASE WHEN {doc_id} % 4 = 0 THEN '#section-2' ELSE '' END)
    )"""


def synth_pii_expr(text: Column, doc_id: Column) -> Column:
    """Deterministically inject PII into a slice of documents (emails on
    id%5==0, phones on id%7==0, IPs on id%11==0) so the redactor has
    ground truth to find."""
    d = doc_id.cast("long")
    out = text
    out = F.when(
        d % 5 == 0,
        F.concat(out, F.lit(" contact user"), d.cast("string"), F.lit("@mail-host.org now")),
    ).otherwise(out)
    out = F.when(
        d % 7 == 0,
        F.concat(out, F.lit(" call +555-01"), F.lpad((d % 10).cast("string"), 1, "0"), F.lit("-4242 today")),
    ).otherwise(out)
    out = F.when(
        d % 11 == 0,
        F.concat(out, F.lit(" from 10.0."), (d % 255).cast("string"), F.lit(".17 logged")),
    ).otherwise(out)
    return out


def synth_pii_sql(text: str, doc_id: str) -> str:
    return f"""(
      {text}
      || (CASE WHEN {doc_id} % 5 = 0
            THEN ' contact user' || CAST({doc_id} AS VARCHAR) || '@mail-host.org now'
          ELSE '' END)
      || (CASE WHEN {doc_id} % 7 = 0
            THEN ' call +555-01' || CAST({doc_id} % 10 AS VARCHAR) || '-4242 today'
          ELSE '' END)
      || (CASE WHEN {doc_id} % 11 = 0
            THEN ' from 10.0.' || CAST({doc_id} % 255 AS VARCHAR) || '.17 logged'
          ELSE '' END)
    )"""


# --- URL canonicalization ---------------------------------------------------

def canonical_url_expr(url: Column) -> Column:
    """Canonical URL: strip fragment; lowercase scheme+host; drop default
    ports (:80 http, :443 https); drop tracking query params
    (utm_*/fbclid/gclid/ref); sort remaining params; collapse trailing
    slashes in the path (root stays '/'). Mirrors the normalize-then-diff
    discipline of cross-driver copy (tableschema.cpp:93-160) applied to
    the URL column."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(nofrag, "^[^:]+://([^/?#]*)", 1))
    host = F.when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, F.lit(1), F.length(host) - 4),
    ).when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, F.lit(1), F.length(host) - 3),
    ).otherwise(host)
    path = F.regexp_extract(nofrag, "^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(nofrag, "\\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qcanon = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.concat_ws("&", kept))).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qcanon)


def canonical_url_sql(url: str) -> str:
    nofrag = f"regexp_replace({url}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rawhost = f"lower(regexp_extract({nofrag}, '^[^:]+://([^/?#]*)', 1))"
    host = f"""(
      CASE WHEN {scheme} = 'https' AND {rawhost} LIKE '%:443'
             THEN substring({rawhost}, 1, length({rawhost}) - 4)
           WHEN {scheme} = 'http' AND {rawhost} LIKE '%:80'
             THEN substring({rawhost}, 1, length({rawhost}) - 3)
           ELSE {rawhost} END)"""
    rawpath = f"regexp_extract({nofrag}, '^[^:]+://[^/?#]*([^?#]*)', 1)"
    path = f"""(
      CASE WHEN regexp_replace({rawpath}, '/+$', '') = '' THEN '/'
           ELSE regexp_replace({rawpath}, '/+$', '') END)"""
    query = f"regexp_extract({nofrag}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    return f"""(
      {scheme} || '://' || {host} || {path} ||
      (CASE WHEN len({kept}) > 0 THEN '?' || array_to_string({kept}, '&') ELSE '' END)
    )"""


def domain_expr(url_canon: Column) -> Column:
    """Registrable domain (last two host labels) of a canonical URL."""
    host = F.regexp_extract(url_canon, "^[^:]+://([^/?#]*)", 1)
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)


def domain_sql(url_canon: str) -> str:
    return (
        f"regexp_extract(regexp_extract({url_canon}, '^[^:]+://([^/?#]*)', 1),"
        " '([^.]+\\.[^.]+)$', 1)"
    )


# --- PII detection / redaction ---------------------------------------------

def pii_counts_exprs(text: Column) -> dict[str, Column]:
    """Match counts per PII class."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))).cast("long"),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))).cast("long"),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), F.lit(0))).cast("long"),
    }


def pii_counts_sql(text: str) -> dict[str, str]:
    return {
        "n_emails": f"CAST(len(regexp_extract_all({text}, '{EMAIL_RE}')) AS BIGINT)",
        "n_phones": f"CAST(len(regexp_extract_all({text}, '{PHONE_RE}')) AS BIGINT)",
        "n_ips": f"CAST(len(regexp_extract_all({text}, '{IPV4_RE}')) AS BIGINT)",
    }


def redact_expr(text: Column) -> Column:
    """Replace PII spans with typed placeholders — emails first (an email
    may contain digits that would otherwise partially match), then
    phones, then IPs. Order fixed so the SQL twin is byte-identical."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return out


def redact_sql(text: str) -> str:
    out = f"regexp_replace({text}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    out = f"regexp_replace({out}, '{PHONE_RE}', '<PHONE>', 'g')"
    out = f"regexp_replace({out}, '{IPV4_RE}', '<IP>', 'g')"
    return out


# --- repetition signals (Gopher-style) --------------------------------------

def bigrams_expr(toks: Column) -> Column:
    """Adjacent-token bigrams 'a b' of a token array (empty if < 2)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigrams_sql(toks: str) -> str:
    return f"""(
      CASE WHEN len({toks}) >= 2 THEN
        list_transform(range(1, len({toks})),
          i -> {toks}[i] || ' ' || {toks}[i + 1])
      ELSE [] END
    )"""


def max_run_frac_expr(terms: Column) -> Column:
    """Fraction of terms taken by the single most frequent term — computed
    as the longest run in the SORTED term array via a sequential
    F.aggregate fold (struct accumulator). Zero-shuffle: the whole signal
    is a narrow projection, the honest 100 TB shape for per-doc stats."""
    sorted_terms = F.array_sort(terms)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    folded = F.aggregate(
        sorted_terms,
        zero,
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc.best,
                F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    n = F.size(terms)
    return F.when(n > 0, folded.best.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def max_run_frac_sql(terms: str) -> str:
    # Oracle face: classic unnest+count, wrapped as a scalar subquery.
    return f"""(
      CASE WHEN len({terms}) > 0 THEN (
        SELECT CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) FROM (
          SELECT count(*) AS c FROM unnest({terms}) AS u(t) GROUP BY t
        )
      ) ELSE 0.0 END
    )"""


def unique_frac_expr(terms: Column) -> Column:
    n = F.size(terms)
    return F.when(
        n > 0, F.size(F.array_distinct(terms)).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def unique_frac_sql(terms: str) -> str:
    return f"""(
      CASE WHEN len({terms}) > 0
        THEN CAST(len(list_distinct({terms})) AS DOUBLE) / CAST(len({terms}) AS DOUBLE)
      ELSE 0.0 END
    )"""
