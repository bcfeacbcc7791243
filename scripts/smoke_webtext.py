"""Smoke parity check for functions/webtext.py kernels vs DuckDB."""
import duckdb
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from geodiff_spark.functions import webtext as W
from geodiff_spark.functions import text as TX

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
d = docs.select(
    "doc_id",
    W.synth_url_expr(F.col("doc_id"), F.col("source")).alias("url"),
    W.synth_pii_expr(F.col("text"), F.col("doc_id")).alias("ptext"),
    TX.tokens_expr(F.col("text")).alias("toks"),
)
d = d.select(
    "doc_id", "url", "ptext",
    W.canonical_url_expr(F.col("url")).alias("canon"),
    W.redact_expr(F.col("ptext")).alias("red"),
    *[v.alias(k) for k, v in W.pii_counts_exprs(F.col("ptext")).items()],
    W.max_run_frac_expr(F.col("toks")).alias("mrf_uni"),
    W.max_run_frac_expr(W.bigrams_expr(F.col("toks"))).alias("mrf_bi"),
    W.unique_frac_expr(F.col("toks")).alias("uf"),
).withColumn("domain", W.domain_expr(F.col("canon")))
sp = d.orderBy("doc_id").toPandas()

con = duckdb.connect()
con.execute("create view documents as select * from '/root/testdata/sf0.001/documents.parquet'")
url = W.synth_url_sql("doc_id", "source")
ptext = W.synth_pii_sql("text", "doc_id")
toks = TX.tokens_sql("text")
pii = W.pii_counts_sql(ptext)
q = f"""
SELECT doc_id,
  {url} AS url,
  {ptext} AS ptext,
  {W.canonical_url_sql(url)} AS canon,
  {W.redact_sql(ptext)} AS red,
  {pii['n_emails']} AS n_emails, {pii['n_phones']} AS n_phones, {pii['n_ips']} AS n_ips,
  {W.max_run_frac_sql(toks)} AS mrf_uni,
  {W.max_run_frac_sql(W.bigrams_sql(toks))} AS mrf_bi,
  {W.unique_frac_sql(toks)} AS uf,
  {W.domain_sql(W.canonical_url_sql(url))} AS domain
FROM documents ORDER BY doc_id
"""
du = con.execute(q).df()

bad = 0
for col in ["url", "ptext", "canon", "red", "n_emails", "n_phones", "n_ips", "mrf_uni", "mrf_bi", "uf", "domain"]:
    a, b = sp[col], du[col]
    if a.dtype == float:
        ok = (a - b).abs().max() == 0.0
    else:
        ok = (a.astype(str) == b.astype(str)).all()
    if not ok:
        bad += 1
        mism = sp[a.astype(str) != b.astype(str)].head(3) if a.dtype != float else None
        print("MISMATCH", col)
        for i in range(len(a)):
            if str(a[i]) != str(b[i]):
                print("  spark:", repr(a[i]))
                print("  duck :", repr(b[i]))
                break
print("checked", len(sp), "rows;", "OK" if bad == 0 else f"{bad} mismatching cols")
spark.stop()
