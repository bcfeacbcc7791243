"""HTML → text extraction with the BYTE-IDENTICAL per-url invariant
(BASELINE.json input_hint: "byte-identical extracted text per url").

Deterministic by construction: pure function of the html bytes — no
locale, no dictionaries, no ambient state — so any executor, any
partitioning, any rerun produces the same bytes. The kernel is
JVM-side column expressions (regexp over UTF-8), with a pandas twin
used by the invariant test as an independent implementation.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPTS = "(?s)<(script|style)[^>]*>.*?</\\1>"
_TAGS = "<[^>]*>"
_WS = "\\s+"


def extract_text_expr(html: Column) -> Column:
    """binary html -> extracted text: drop script/style blocks, strip
    tags, collapse whitespace, trim. Stable across Spark versions (Java
    regex only, no ICU-dependent classes)."""
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _SCRIPTS, " ")
    s = F.regexp_replace(s, _TAGS, " ")
    s = F.regexp_replace(s, _WS, " ")
    return F.trim(s)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Independent pandas twin (Python re) — used to cross-check the
    JVM kernel byte-for-byte."""
    scripts = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.S)
    tags = re.compile(r"<[^>]*>")
    ws = re.compile(r"\s+")

    def one(b):
        if b is None:
            return None
        s = bytes(b).decode("utf-8")
        s = scripts.sub(" ", s)
        s = tags.sub(" ", s)
        s = ws.sub(" ", s)
        return s.strip()

    return html.map(one)
