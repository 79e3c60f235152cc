"""WARC ingestion (scale/warc.py): synthesized plain and
member-per-record gzip WARC files round-trip through the pure-bytes
parser and the distributed binaryFile + mapInPandas path, HTTP
envelopes strip correctly, and the output composes with
html_to_text."""

import gzip

import pytest

from datar_polars_spark.scale import parse_warc_records, read_warc, warc_records
from datar_polars_spark.tibble import ensure_tibble


def _record(warc_type, uri, body: bytes, http: bool = False):
    if http:
        env = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Server: test\r\n\r\n"
        )
        body = env + body
        ctype = "application/http; msgtype=response"
    else:
        ctype = "text/plain"
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


HTML1 = b"<html><body><p>Alpha page.</p></body></html>"
HTML2 = b"<html><body><p>Beta page.</p></body></html>"


def _warc_bytes():
    return (
        _record("warcinfo", "urn:info", b"software: test\r\n")
        + _record("request", "https://a.com/x", b"GET /x HTTP/1.1\r\n")
        + _record("response", "https://a.com/x", HTML1, http=True)
        + _record("response", "https://b.co.uk/y", HTML2, http=True)
    )


def test_parse_plain_and_gzip_members():
    plain = _warc_bytes()
    recs = parse_warc_records(plain)
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    resp = recs[2]
    assert resp["target_uri"] == "https://a.com/x"
    assert resp["payload"] == HTML1  # HTTP envelope stripped
    assert resp["content_type"] == "text/html; charset=utf-8"
    assert recs[0]["payload"] == b"software: test\r\n"  # non-http untouched

    # member-per-record gzip (the CommonCrawl .warc.gz layout)
    gz = b"".join(
        gzip.compress(m)
        for m in (
            _record("warcinfo", "urn:info", b"software: test\r\n"),
            _record("response", "https://a.com/x", HTML1, http=True),
            _record("response", "https://b.co.uk/y", HTML2, http=True),
        )
    )
    grecs = parse_warc_records(gz)
    assert [r["target_uri"] for r in grecs] == [
        "urn:info", "https://a.com/x", "https://b.co.uk/y",
    ]
    assert grecs[1]["payload"] == HTML1


def test_http_envelope_kept_when_disabled():
    recs = parse_warc_records(
        _record("response", "https://a.com/x", HTML1, http=True),
        http_body=False,
    )
    assert recs[0]["payload"].startswith(b"HTTP/1.1 200 OK")
    assert recs[0]["content_type"].startswith("application/http")


def test_truncated_and_junk_input_degrade_silently():
    full = _warc_bytes()
    assert parse_warc_records(b"") == []
    assert parse_warc_records(b"not a warc at all") == []
    got = parse_warc_records(full[: len(full) - 60])  # cut mid-record
    assert 0 < len(got) < 4  # parsed prefix survives, no raise


def test_distributed_read_and_html_composition(spark, tmp_path):
    import pathlib

    from datar_polars_spark.scale import html_to_text

    d = tmp_path / "segment"
    d.mkdir()
    (d / "part-000.warc").write_bytes(_warc_bytes())
    (d / "part-001.warc.gz").write_bytes(
        gzip.compress(_record("response", "https://c.org/z", HTML1, http=True))
    )
    out = read_warc(spark, str(d))
    rows = {r["target_uri"]: r for r in out.df.collect()}
    # default types=("response",): warcinfo/request filtered out
    assert set(rows) == {"https://a.com/x", "https://b.co.uk/y", "https://c.org/z"}
    assert all(r["payload_len"] > 0 for r in rows.values())

    texts = html_to_text(
        out.with_df(
            out.df.withColumn("html", out.df.payload.cast("string"))
        ),
        html="html",
        out_col="text",
    )
    tmap = {r["target_uri"]: r["text"] for r in texts.df.collect()}
    assert tmap["https://a.com/x"] == "Alpha page."
    assert tmap["https://b.co.uk/y"] == "Beta page."

    # plan: per-file parallel scan + one Arrow pass, no shuffle
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_types_filter_and_payload_cap(spark, tmp_path):
    p = tmp_path / "a.warc"
    p.write_bytes(_warc_bytes())
    all_recs = read_warc(spark, str(p), types=None).df.count()
    assert all_recs == 4
    capped = read_warc(spark, str(p), max_payload=5).df.collect()
    assert all(len(r["payload"]) <= 5 for r in capped)
    assert all(r["payload_len"] > 5 for r in capped)  # true length reported
    # documented contract: payload_len is the ORIGINAL (pre-cap) size,
    # so payload_len > len(payload) is the truncation signal
    uncapped = {
        r["target_uri"]: r["payload_len"]
        for r in read_warc(spark, str(p)).df.collect()
    }
    for r in capped:
        assert r["payload_len"] == uncapped[r["target_uri"]]
        assert r["payload"] == bytes(r["payload"])[: 5]


def test_stream_read_warc_matches_batch(spark, tmp_path):
    """Live ingestion parity: streaming the same segment directory
    yields exactly the batch records (stateless mapInPandas — no
    state store, no watermark)."""
    import gzip as _gzip

    from datar_polars_spark.scale import stream_read_warc
    from datar_polars_spark.streaming import run_to_memory

    d = tmp_path / "live_segment"
    d.mkdir()
    (d / "a.warc").write_bytes(_warc_bytes())
    (d / "b.warc.gz").write_bytes(
        _gzip.compress(_record("response", "https://c.org/z", HTML2, http=True))
    )
    sdf = stream_read_warc(spark, str(d))
    assert sdf.isStreaming
    got = run_to_memory(sdf.select("target_uri", "payload_len"), mode="append")
    batch = (
        read_warc(spark, str(d))
        .df.select("target_uri", "payload_len")
        .collect()
    )
    assert sorted(zip(got["target_uri"], got["payload_len"])) == sorted(
        (r["target_uri"], r["payload_len"]) for r in batch
    )


def test_wet_conversion_records(spark, tmp_path):
    """CommonCrawl WET files are WARC files whose 'conversion' records
    carry extracted plain text — types=('conversion',) reads them
    directly."""
    wet = _record("warcinfo", "urn:info", b"x\r\n") + _record(
        "conversion", "https://a.com/x", b"Already extracted text."
    )
    p = tmp_path / "seg.warc.wet"
    p.write_bytes(wet)
    out = read_warc(spark, str(p), types=("conversion",)).df.collect()
    assert len(out) == 1
    assert bytes(out[0]["payload"]) == b"Already extracted text."
    assert out[0]["content_type"] == "text/plain"
