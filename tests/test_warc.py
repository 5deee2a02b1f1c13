"""WARC source contract: the streamed record walk must honor the
length-prefixed format exactly — Content-Length drives the payload read
(even when the payload contains newline bytes), separators are tolerated,
and malformed streams fail loudly instead of yielding garbage."""

from __future__ import annotations

import os
import tempfile

import pytest


def _register(spark):
    from url_counter_mapreduce_spark.sources.warc import _warc_classes

    try:
        spark.dataSource.register(_warc_classes())
    except Exception:
        pass  # already registered in this session


def _record(doc_id: int, payload: bytes) -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:doc:%d>\r\n"
        b"WARC-Target-URI: https://example.org/doc/%d\r\n"
        b"Content-Length: %d\r\n"
        b"\r\n" % (doc_id, doc_id, len(payload))
        + payload
        + b"\r\n\r\n"
    )


def _scan(spark, d):
    return spark.read.format("warcsource").option("path", d).load().collect()


def test_warc_reader_handles_binary_payloads_and_separators(spark):
    _register(spark)
    d = tempfile.mkdtemp(prefix="warc_unit_")
    # payload with embedded newlines and CRLFs — only Content-Length may
    # delimit it; plus an empty payload record
    p1 = b"line one\nline two\r\nWARC/1.0 fake header inside payload\r\n"
    with open(os.path.join(d, "data0.warc"), "wb") as f:
        f.write(_record(7, p1))
        f.write(b"\r\n")  # extra inter-record padding
        f.write(_record(8, b""))
    rows = {r.record_id: r for r in _scan(spark, d)}
    import hashlib

    assert rows["<urn:doc:7>"].content_length == len(p1)
    assert rows["<urn:doc:7>"].digest == hashlib.md5(p1).hexdigest()
    assert rows["<urn:doc:8>"].content_length == 0
    assert rows["<urn:doc:8>"].target_uri == "https://example.org/doc/8"


def test_warc_reader_rejects_malformed_stream(spark):
    _register(spark)
    d = tempfile.mkdtemp(prefix="warc_bad_")
    with open(os.path.join(d, "data0.warc"), "wb") as f:
        f.write(b"NOT-A-WARC\r\nContent-Length: 3\r\n\r\nabc")
    with pytest.raises(Exception, match="malformed WARC|PythonException"):
        _scan(spark, d)
    d2 = tempfile.mkdtemp(prefix="warc_trunc_")
    with open(os.path.join(d2, "data0.warc"), "wb") as f:
        f.write(_record(1, b"abcdef")[:-10])  # cut inside the payload
    with pytest.raises(Exception, match="truncated WARC|PythonException"):
        _scan(spark, d2)


def test_warc_roundtrip_query_matches_documents(spark, sf_dir):
    from pyspark.sql import functions as F

    from url_counter_mapreduce_spark.sources.warc import source_warc_scan
    from url_counter_mapreduce_spark.tables import load_table

    got = {r.doc_id: (r.content_length, r.digest) for r in source_warc_scan(spark, sf_dir).collect()}
    exp = {
        r.doc_id: (r.n, r.d)
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr("CAST(octet_length(coalesce(text, '')) AS BIGINT)").alias("n"),
            F.md5(F.encode(F.coalesce("text", F.lit("")), "utf-8")).alias("d"),
        )
        .collect()
    }
    assert got == exp
