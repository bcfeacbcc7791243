"""Cross-driver sources — the createChangesetDr analogue.

The reference diffs two databases of DIFFERENT drivers (sqlite vs
postgres) by normalizing both to a canonical base-type schema and then
running the same diff (geodiff.cpp:363-426; coercion table
tableschema.cpp:93-160 — integer family -> INTEGER, double precision /
real / numeric / decimal -> DOUBLE, boolean -> BOOLEAN(int), text family
-> TEXT, bytea/blob -> BLOB, timestamps -> DATETIME).

Spark-first equivalent: a "driver" is any DataFrameReader format
(parquet, csv, json, orc, jdbc). ``load_table`` reads a URL,
``normalize_to_base`` applies the same base-type coercions to a
canonical Spark schema, and ``diff_cross_driver`` feeds both normalized
sides to the ordinary ``diff_table`` — normalize-then-diff, exactly the
reference's shape (SURVEY.md §2: "drivers are just readers").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..changeset import TableInfo
from ..operators.diff import diff_table

#: Spark type -> canonical base type (tableschema.cpp:93-160 analogue).
_BASE_OF = {
    T.ByteType: T.LongType,
    T.ShortType: T.LongType,
    T.IntegerType: T.LongType,
    T.LongType: T.LongType,
    T.FloatType: T.DoubleType,
    T.DoubleType: T.DoubleType,
    T.BooleanType: T.LongType,  # boolean -> int (reference BOOLEAN base)
    T.StringType: T.StringType,
    T.BinaryType: T.BinaryType,
    T.TimestampType: T.TimestampType,
    T.TimestampNTZType: T.TimestampType,
    T.DateType: T.DateType,
}


def base_type(dt: T.DataType) -> T.DataType:
    """Canonical base type of a Spark type; DECIMAL -> DOUBLE like the
    reference's numeric/decimal rule; unknown types -> TEXT (the
    reference warns and falls back to text)."""
    if isinstance(dt, T.DecimalType):
        return T.DoubleType()
    for k, v in _BASE_OF.items():
        if isinstance(dt, k):
            return v()
    return T.StringType()


def load_table(
    spark: SparkSession,
    url: str,
    *,
    fmt: str | None = None,
    schema: str | T.StructType | None = None,
    **options,
) -> DataFrame:
    """Read a table from any driver URL. Format inferred from the
    extension (.parquet/.csv/.json/.orc) or a ``jdbc:`` prefix; csv
    defaults to header+inferSchema so typed columns come back typed."""
    if fmt is None:
        if url.startswith("jdbc:"):
            fmt = "jdbc"
        elif url.endswith(".csv"):
            fmt = "csv"
        elif url.endswith(".json"):
            fmt = "json"
        elif url.endswith(".orc"):
            fmt = "orc"
        else:
            fmt = "parquet"
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
        return reader.options(**options).csv(url)
    if fmt == "jdbc":
        return reader.format("jdbc").option("url", url).options(**options).load()
    return reader.options(**options).format(fmt).load(url)


def normalize_to_base(df: DataFrame, info: TableInfo) -> DataFrame:
    """Project ``info.columns`` in order, each cast to its base type —
    the normalization half of createChangesetDr. Missing columns raise
    (the reference requires matching table schemas post-normalize)."""
    missing = [c for c in info.columns if c not in df.columns]
    if missing:
        raise ValueError(f"table {info.name!r} missing columns {missing}")
    return df.select(
        *[F.col(c).cast(base_type(df.schema[c].dataType)) for c in info.columns]
    )


def diff_cross_driver(
    base: DataFrame, modified: DataFrame, info: TableInfo
):
    """Normalize both sides to base types, then ordinary diff_table —
    the two sides may come from different drivers with different
    physical types (int32 csv vs int64 parquet, decimal vs double)."""
    b = normalize_to_base(base, info)
    m = normalize_to_base(modified, info)
    # post-normalize the two sides must agree exactly; disagreement means
    # the base types themselves differ (e.g. text vs int) — a real schema
    # error the reference also rejects
    bt = {f.name: f.dataType for f in b.schema.fields}
    mt = {f.name: f.dataType for f in m.schema.fields}
    if bt != mt:
        drift = {c: (bt[c], mt[c]) for c in bt if bt[c] != mt[c]}
        raise ValueError(f"irreconcilable base types after normalize: {drift}")
    return diff_table(b, m, info)
