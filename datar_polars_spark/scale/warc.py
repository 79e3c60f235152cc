"""WARC (Web ARChive, ISO 28500) record extraction — the ingestion
step between a raw crawl (CommonCrawl's native format) and
``html_to_text``/curation.

``warc_records`` explodes a binary column of WARC files into one row
per record (type, target URI, date, content type, payload) inside one
Arrow ``mapInPandas`` pass — ingestion parallelism is per FILE (the
CommonCrawl layout: ~1 GB files, thousands per crawl), so a directory
read distributes with no shuffle at all. ``read_warc`` composes
``binaryFile`` + ``warc_records``.

Both plain WARC and the standard member-per-record gzip layout
(``.warc.gz`` — each record its own gzip member, the format the spec
recommends precisely so readers can split on member boundaries) are
handled; a decompress loop walks the members. HTTP response records
optionally strip the HTTP envelope so the payload is the body bytes
that feed ``html_to_text``.

Pure ``bytes`` parsing (no external warc library); malformed trailing
data ends the walk silently — the caller sees the records that parsed,
the standard posture for crawl-scale dirty input.
"""

from __future__ import annotations

import zlib
from typing import Any, Iterator

from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from ..tibble import Tibble, ensure_tibble

__all__ = ["parse_warc_records", "warc_records", "read_warc", "stream_read_warc"]

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all gzip members (the member-per-record .warc.gz
    layout). Returns data unchanged when it isn't gzip."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = []
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error:
            break
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return b"".join(out)


def parse_warc_records(data: bytes, http_body: bool = True) -> list:
    """Parse one WARC file's bytes into record dicts: ``warc_type``,
    ``target_uri``, ``date``, ``content_type``, ``payload`` (bytes),
    ``payload_len``. With ``http_body=True`` (default), records whose
    WARC content type is ``application/http`` have the HTTP envelope
    stripped so ``payload`` is the response/request BODY, and the
    envelope's Content-Type (e.g. ``text/html; charset=utf-8``)
    replaces the envelope type in ``content_type``."""
    data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding/blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:
            break  # truncated final record
        pos = body_start + length
        ctype = headers.get("content-type", "")
        if http_body and ctype.startswith("application/http"):
            env_end = payload.find(_CRLF + _CRLF)
            if env_end >= 0:
                for line in payload[:env_end].split(_CRLF)[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("latin-1", "replace")
                payload = payload[env_end + 4 :]
        records.append(
            {
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "content_type": ctype or None,
                "payload": payload,
                "payload_len": len(payload),
            }
        )
    return records


def warc_records(
    td: Any,
    content: Any = "content",
    types: tuple | None = ("response",),
    http_body: bool = True,
    max_payload: int | None = None,
) -> Tibble:
    """Explode a binary column of WARC files into one row per record.
    ``types`` keeps only the listed WARC-Types (default: responses —
    the records that carry page content; pass None for all).
    ``max_payload`` truncates huge payloads at ingestion (bytes), the
    crawl-side guard against pathological single documents; for capped
    records ``payload_len`` reports the ORIGINAL (pre-truncation) size
    — ``payload_len > len(payload)`` is the truncation signal, and
    slicing must use ``len(payload)``, not ``payload_len``. One narrow
    Arrow pass per file; no shuffle."""
    td = ensure_tibble(td)
    cname = content if isinstance(content, str) else content._name
    keep = tuple(types) if types is not None else None
    cap = int(max_payload) if max_payload is not None else None
    schema = (
        "warc_type string, target_uri string, date string, "
        "content_type string, payload binary, payload_len long"
    )

    def gen(batches) -> Iterator["object"]:
        import pandas as pd

        cols = [
            "warc_type", "target_uri", "date",
            "content_type", "payload", "payload_len",
        ]
        for pdf in batches:
            rows = []
            for blob in pdf[cname]:
                if blob is None:
                    continue
                for r in parse_warc_records(bytes(blob), http_body=http_body):
                    if keep is not None and r["warc_type"] not in keep:
                        continue
                    if cap is not None and len(r["payload"]) > cap:
                        # payload_len stays the ORIGINAL size (see
                        # docstring) — it is the truncation signal.
                        r["payload"] = r["payload"][:cap]
                    rows.append([r[c] for c in cols])
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return Tibble(td.df.select(cname).mapInPandas(gen, schema=schema))


def read_warc(spark, path: str, **kwargs) -> Tibble:
    """Read a WARC file/directory (plain or member-per-record .warc.gz)
    into one row per record: ``binaryFile`` source + :func:`warc_records`
    (kwargs pass through). Parallelism is per file — point it at a
    crawl segment directory and each of the thousands of files parses
    independently inside its scan task."""
    df = spark.read.format("binaryFile").load(path)
    return warc_records(Tibble(df), content="content", **kwargs)


def stream_read_warc(spark, path: str, **kwargs):
    """STREAMING WARC ingestion: watch a directory for new .warc /
    .warc.gz files and emit one row per record as they land — the live
    side of :func:`read_warc` (same record schema, same kwargs). The
    record walk is a stateless ``mapInPandas``, so the query needs no
    state store or watermark; each arriving file parses inside its own
    scan task. Returns a streaming DataFrame (not a Tibble): wire it
    to ``writeStream`` or the downstream stream_* curation ops."""
    sdf = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
    )
    return warc_records(Tibble(sdf), content="content", **kwargs).df
