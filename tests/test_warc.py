"""WARC container sink/source roundtrip (sources/warc.py).

The parser must be offset-driven (Content-Length jumps), so payloads
containing record-start magic or bare CRLFCRLF are the interesting
inputs.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from geodiff_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

TS = dt.datetime(2025, 3, 1, 12, 0, 0)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, TS, h, lang) for u, h, lang in rows],
        "url string, warc_ts timestamp, html binary, lang string",
    )


def test_roundtrip_bytes_identical(spark, tmp_path):
    rows = [
        ("https://a.example/1", b"<html>plain</html>", "en"),
        # payload containing the record-start magic: a delimiter-scanning
        # parser would split this record in half
        ("https://a.example/2", b"x WARC/1.0\r\n y", "de"),
        # payload containing a bare header terminator
        ("https://a.example/3", b"a\r\n\r\nb\r\n\r\n", "fr"),
        # empty payload, non-ascii bytes
        ("https://a.example/4", "émoji ☃".encode(), "es"),
        ("https://a.example/5", b"", "en"),
    ]
    path = str(tmp_path / "warc")
    manifest = write_warc(_pages(spark, rows).repartition(2, "url"), path)
    assert manifest["n_records"].sum() == 5
    got = {
        r["url"]: r
        for r in read_warc(spark, path).collect()
    }
    assert set(got) == {u for u, _, _ in rows}
    for u, h, lang in rows:
        assert bytes(got[u]["html"]) == h, u
        assert got[u]["lang"] == lang
        assert got[u]["warc_ts"] == TS


def test_warcinfo_skipped_and_http_envelope_counted(spark, tmp_path):
    path = str(tmp_path / "warc")
    write_warc(
        _pages(spark, [("https://b.example/1", b"12345", "en")]).coalesce(1),
        path,
    )
    rec = read_warc(spark, path).collect()
    assert len(rec) == 1  # warcinfo record not surfaced
    # HTTP envelope: 77 fixed bytes + len(str(n_html)) + n_html
    assert rec[0]["n_http"] == 77 + 1 + 5


def test_shard_bytes_deterministic(spark, tmp_path):
    """Shard content is a pure function of the partition row SET — the
    writer sorts by url, so shuffle row-order nondeterminism (or a task
    retry) cannot change the published bytes."""
    rows = [
        (f"https://c.example/{i}", f"body-{i}".encode(), "en")
        for i in range(20)
    ]
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_warc(_pages(spark, rows).repartition(3, "url"), p1)
    write_warc(
        _pages(spark, list(reversed(rows))).repartition(3, "url"), p2
    )
    import os

    for shard in sorted(os.listdir(p1)):
        with open(os.path.join(p1, shard), "rb") as a, open(
            os.path.join(p2, shard), "rb"
        ) as b:
            assert a.read() == b.read(), shard


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="bad WARC record start"):
        list(parse_warc_bytes(b"NOT-A-WARC"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))


def test_wet_roundtrip_and_adversarial_payload(spark, tmp_path):
    # WET conversion records: text containing CRLFCRLF and the record
    # magic must survive (offset-driven parse), byte counts must match
    from geodiff_spark.sources.warc import read_wet, write_wet

    rows = [
        ("http://a.example/1", "plain text"),
        ("http://a.example/2", "tricky\r\n\r\nWARC/1.0\r\nnot a record"),
        ("http://b.example/3", "unicode é中文"),
    ]
    df = spark.createDataFrame(
        [(u, TS, t) for u, t in rows],
        "url string, warc_ts timestamp, text string",
    )
    man = write_wet(df.repartition(2, "url"), str(tmp_path / "wet"))
    assert man["n_records"].sum() == 3
    back = read_wet(spark, str(tmp_path / "wet"))
    got = {r["url"]: r for r in back.collect()}
    for u, t in rows:
        assert got[u]["text"] == t
        assert got[u]["n_text"] == len(t.encode("utf-8"))
        assert got[u]["warc_ts"] == TS


def test_wet_records_carry_refers_to(spark, tmp_path):
    # the conversion record must link back to its response record and
    # parse_warc_bytes must NOT see conversion records as responses
    from geodiff_spark.sources.warc import parse_wet_bytes, write_wet

    df = spark.createDataFrame(
        [("http://x.example/1", TS, "body text")],
        "url string, warc_ts timestamp, text string",
    )
    write_wet(df.coalesce(1), str(tmp_path / "wet"))
    shard = next((tmp_path / "wet").glob("*.warc.wet"))
    raw = shard.read_bytes()
    assert b"WARC-Refers-To: <urn:geodiff-spark:http://x.example/1>" in raw
    assert b"WARC-Type: conversion" in raw
    assert list(parse_warc_bytes(raw)) == []  # responses only
    assert len(list(parse_wet_bytes(raw))) == 1
