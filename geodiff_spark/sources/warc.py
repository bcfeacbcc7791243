"""WARC container source/sink for Common-Crawl-style page corpora.

The reference ships file-format sources/sinks for its own container
format (geodiff changeset files, sqlitedriver.cpp / changesetreader.cpp);
the web-corpus equivalent is the ISO-28500 WARC container Common Crawl
publishes. This module writes page rows (url, warc_ts, html, lang) as
standard ``WARC/1.0`` response records and reads them back distributed,
byte-identically.

Scale shape (100 TB): Common Crawl ships a crawl as ~64k WARC files of
~1 GB each — the unit of parallelism is the FILE, not the record (gzip
members make byte-range splits useless there too). The reader is
``spark.read.format("binaryFile")`` over the shard directory — one task
per file, 64k-way parallel on a real crawl — followed by a
``mapInPandas`` record parser. The parser is offset-driven (jump by
``Content-Length``, never delimiter-scan), so payloads containing
``WARC/1.0`` or bare CRLFCRLF parse correctly; per-record work is
C-speed ``bytes.find``/slicing, the same loop structure every WARC
reader (e.g. the public warcio library) uses, because the format is
sequential by design. The writer emits one ``.warc`` shard per input
partition on the executors (task-deterministic filenames, overwrite =
retry-idempotent) plus a warcinfo header record per shard, and returns a
small manifest DataFrame — no driver-side data movement in either
direction.

Hard verification: ``__spark_entry__.q_warc_roundtrip`` writes the
documents table through this sink, reads it back, re-extracts the body,
and DuckDB recomputes every column (urls, byte lengths, timestamps,
text) directly from the table — a full bytes-level roundtrip oracle.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_WARC_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

RECORD_SCHEMA = (
    "url string, warc_date string, lang string, n_http bigint, html binary"
)
MANIFEST_SCHEMA = "shard string, n_records bigint, n_bytes bigint"


def _http_payload(html: bytes) -> bytes:
    head = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + _HDR_END
    )
    return head + html


def _record_bytes(url: str, warc_date: str, lang: str, html: bytes) -> bytes:
    payload = _http_payload(html)
    # Record-ID must be unique per record; derive it from the url so the
    # bytes are a pure function of the row (retry-deterministic).
    rid = "urn:geodiff-spark:" + url
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <" + rid.encode() + b">\r\n"
        b"WARC-Date: " + warc_date.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Identified-Content-Language: " + lang.encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode() + _HDR_END
    )
    return hdr + payload + _CRLF + _CRLF


def _warcinfo(shard: str) -> bytes:
    body = b"software: geodiff-spark warc sink\r\n"
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:geodiff-spark:warcinfo:" + shard.encode() + b">\r\n"
        b"WARC-Filename: " + shard.encode() + b"\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(body)).encode() + _HDR_END
        + body + _CRLF + _CRLF
    )


def write_warc(pages: DataFrame, path: str) -> pd.DataFrame:
    """Write (url, warc_ts timestamp, html binary, lang) rows as WARC
    shards under ``path`` — one ``part-NNNNN.warc`` per partition,
    written on the executors. Within a shard, records are written in
    url order (shuffle row order is nondeterministic; the sort makes
    shard bytes a pure function of the partition's row SET, so task
    retries rewrite identical bytes). Returns the collected manifest
    (tiny: one row per shard)."""
    os.makedirs(path, exist_ok=True)
    df = pages.select(
        "url",
        F.date_format(F.col("warc_ts"), _WARC_DATE_FMT).alias("warc_date"),
        "lang",
        "html",
    )

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = f"part-{pid:05d}.warc"
        chunks = [c for c in it if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("url")
        buf = [_warcinfo(shard)]
        for url, wdate, lang, html in pdf.itertuples(index=False, name=None):
            buf.append(_record_bytes(url, wdate, lang, bytes(html)))
        blob = b"".join(buf)
        tmp = os.path.join(path, f".{shard}.tmp-{pid}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(path, shard))  # atomic publish
        yield pd.DataFrame(
            {"shard": [shard], "n_records": [len(pdf)], "n_bytes": [len(blob)]}
        )

    return df.mapInPandas(write_part, schema=MANIFEST_SCHEMA).toPandas()


_CL_RE = re.compile(rb"\r\nContent-Length: (\d+)\r\n")
_HDR_RE = {
    "url": re.compile(rb"\r\nWARC-Target-URI: ([^\r]*)\r\n"),
    "date": re.compile(rb"\r\nWARC-Date: ([^\r]*)\r\n"),
    "lang": re.compile(
        rb"\r\nWARC-Identified-Content-Language: ([^\r]*)\r\n"
    ),
    "type": re.compile(rb"\r\nWARC-Type: ([^\r]*)\r\n"),
}


def _scan_records(content: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Offset-driven record scan over one shard's bytes: yields
    (header, body) per record. Content-Length drives every jump —
    payload bytes are never delimiter-scanned."""
    pos, n = 0, len(content)
    while pos < n:
        if content.startswith(_CRLF, pos):  # inter-record blank lines
            pos += 2
            continue
        if not content.startswith(b"WARC/1.0\r\n", pos):
            raise ValueError(f"bad WARC record start at byte {pos}")
        hdr_end = content.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header")
        header = content[pos : hdr_end + 2]  # keep trailing CRLF for regexes
        m = _CL_RE.search(header)
        if not m:
            raise ValueError("WARC record missing Content-Length")
        clen = int(m.group(1))
        body = content[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        yield header, body


def parse_warc_bytes(content: bytes) -> Iterator[tuple]:
    """Yield (url, warc_date, lang, n_http, html) for response records;
    skip warcinfo/other types."""
    for header, body in _scan_records(content):
        rtype = _HDR_RE["type"].search(header)
        if rtype and rtype.group(1) == b"response":
            # split the HTTP payload: headers end at the first CRLFCRLF
            http_end = body.find(_HDR_END)
            if http_end < 0:
                raise ValueError("response payload missing HTTP header end")
            html = body[http_end + 4 :]
            yield (
                _HDR_RE["url"].search(header).group(1).decode(),
                _HDR_RE["date"].search(header).group(1).decode(),
                _HDR_RE["lang"].search(header).group(1).decode(),
                len(body),
                html,
            )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one task per shard file (binaryFile
    source — the Common-Crawl parallelism unit), mapInPandas parse.
    Columns: url, warc_ts timestamp, lang, n_http (HTTP payload bytes),
    html binary."""
    files = spark.read.format("binaryFile").load(f"{path}/*.warc")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                rows = list(parse_warc_bytes(bytes(content)))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["url", "warc_date", "lang", "n_http", "html"],
                    )

    rec = files.select("content").mapInPandas(parse, schema=RECORD_SCHEMA)
    return rec.select(
        "url",
        F.to_timestamp("warc_date", _WARC_DATE_FMT).alias("warc_ts"),
        "lang",
        "n_http",
        "html",
    )


# ---------------------------------------------------------------------------
# WET — the extracted-text sibling container (Common Crawl "conversion"
# records: text/plain payload, WARC-Refers-To links back to the response
# record). Same shard-per-partition sink and file-per-task source.
# ---------------------------------------------------------------------------

WET_RECORD_SCHEMA = "url string, warc_date string, n_text bigint, text binary"


def _wet_record_bytes(url: str, warc_date: str, text: bytes) -> bytes:
    rid = "urn:geodiff-spark:wet:" + url
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: <" + rid.encode() + b">\r\n"
        b"WARC-Refers-To: <urn:geodiff-spark:" + url.encode() + b">\r\n"
        b"WARC-Date: " + warc_date.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(text)).encode() + _HDR_END
    )
    return hdr + text + _CRLF + _CRLF


def write_wet(pages: DataFrame, path: str) -> pd.DataFrame:
    """Write (url, warc_ts timestamp, text string) rows as WET shards
    under ``path`` — same executor-side, retry-idempotent,
    url-sorted-within-shard contract as :func:`write_warc`."""
    os.makedirs(path, exist_ok=True)
    df = pages.select(
        "url",
        F.date_format(F.col("warc_ts"), _WARC_DATE_FMT).alias("warc_date"),
        F.encode(F.col("text"), "UTF-8").alias("text"),
    )

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = f"part-{pid:05d}.warc.wet"
        chunks = [c for c in it if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("url")
        buf = [_warcinfo(shard)]
        for url, wdate, text in pdf.itertuples(index=False, name=None):
            buf.append(_wet_record_bytes(url, wdate, bytes(text)))
        blob = b"".join(buf)
        tmp = os.path.join(path, f".{shard}.tmp-{pid}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(path, shard))
        yield pd.DataFrame(
            {"shard": [shard], "n_records": [len(pdf)], "n_bytes": [len(blob)]}
        )

    return df.mapInPandas(write_part, schema=MANIFEST_SCHEMA).toPandas()


def parse_wet_bytes(content: bytes) -> Iterator[tuple]:
    """Yield (url, warc_date, n_text, text) for conversion records."""
    for header, body in _scan_records(content):
        rtype = _HDR_RE["type"].search(header)
        if rtype and rtype.group(1) == b"conversion":
            yield (
                _HDR_RE["url"].search(header).group(1).decode(),
                _HDR_RE["date"].search(header).group(1).decode(),
                len(body),
                body,
            )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET reader (one task per shard file). Columns: url,
    warc_ts timestamp, n_text (payload bytes), text string (UTF-8)."""
    files = spark.read.format("binaryFile").load(f"{path}/*.warc.wet")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                rows = list(parse_wet_bytes(bytes(content)))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_date", "n_text", "text"]
                    )

    rec = files.select("content").mapInPandas(parse, schema=WET_RECORD_SCHEMA)
    return rec.select(
        "url",
        F.to_timestamp("warc_date", _WARC_DATE_FMT).alias("warc_ts"),
        "n_text",
        F.decode(F.col("text"), "UTF-8").alias("text"),
    )
