"""WARC (ISO 28500) reader/writer — Common Crawl's native format.

The north-rule input is "Common-Crawl-style web pages"; on disk
those are WARC files: concatenated records, each a version line +
named headers + a content block, the whole file conventionally
stored as CONCATENATED PER-RECORD GZIP MEMBERS (so a reader can
seek to any record boundary). Both layouts are handled here from
scratch — stdlib zlib decodes member-at-a-time via ``unused_data``.

``response`` records carry a full HTTP response as their block
(status line + headers + body, per the application/http content
type); ``extract_http_payload`` strips the HTTP envelope and, when
present, applies the only transfer-encoding Common Crawl emits
(chunked is refused loudly rather than mis-parsed — CC stores
identity bodies).

Spark face: ``read_warc`` turns a DataFrame of WARC file bytes into
page rows ``(url, warc_ts, html)`` — the exact input_hint shape —
via one Arrow pass; ``write_warc`` is the paired synthesizer, so the
roundtrip (and the gate) pins framing, gzip member handling, and
HTTP envelope stripping byte-for-byte.

Scale shape: one WARC file is one row in, N page rows out — a
narrow ``mapInPandas`` fan-out with no shuffle; files are the
parallelism unit exactly as on a real Common Crawl bucket.
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd  # noqa: F401  (module-level: Arrow typehints)

from pyspark.sql import DataFrame

__all__ = ["write_warc", "iter_warc_records", "extract_http_payload",
           "read_warc", "WARC_PAGE_SCHEMA"]

_CRLF = b"\r\n"


def write_warc(records, per_record_gzip: bool = True) -> bytes:
    """records: iterable of (url, warc_date, payload_bytes, headers)
    where ``headers`` is an optional dict of extra HTTP headers.
    Each record is a WARC/1.0 ``response`` whose block is a full
    HTTP/1.1 200 response carrying ``payload``; with
    ``per_record_gzip`` each record becomes its own gzip member
    (the Common Crawl layout)."""
    out = bytearray()
    for rec in records:
        url, date, payload = rec[0], rec[1], bytes(rec[2])
        extra = rec[3] if len(rec) > 3 and rec[3] else {}
        http_headers = [b"HTTP/1.1 200 OK",
                        b"Content-Type: text/html; charset=UTF-8",
                        b"Content-Length: %d" % len(payload)]
        for k, v in extra.items():
            http_headers.append(f"{k}: {v}".encode())
        http = _CRLF.join(http_headers) + _CRLF * 2 + payload
        warc_headers = _CRLF.join([
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + url.encode(),
            b"WARC-Date: " + date.encode(),
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: %d" % len(http),
        ])
        record = warc_headers + _CRLF * 2 + http + _CRLF * 2
        if per_record_gzip:
            out += gzip.compress(record, 6)
        else:
            out += record
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress CONCATENATED gzip members (the WARC convention —
    ``gzip.decompress`` alone stops at the first member on some
    malformed tails; member-at-a-time via unused_data is exact)."""
    out = bytearray()
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    return bytes(out)


def iter_warc_records(data: bytes):
    """Yield (headers: dict[str, str], block: bytes) per record.
    Accepts per-record-gzip, whole-file-gzip, or plain streams."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("WARC record without header terminator")
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record at offset {pos}: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        block_start = head_end + 4
        block = data[block_start:block_start + length]
        if len(block) != length:
            raise ValueError("WARC block truncated")
        yield headers, block
        pos = block_start + length


def extract_http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record
    block (status line + headers + CRLFCRLF + body). Non-HTTP blocks
    pass through; chunked transfer-encoding refuses loudly."""
    if not block.startswith(b"HTTP/"):
        return block
    head_end = block.find(_CRLF * 2)
    if head_end < 0:
        raise ValueError("HTTP response without header terminator")
    head = block[:head_end].decode("latin-1").lower()
    if "transfer-encoding: chunked" in head:
        raise NotImplementedError(
            "chunked transfer-encoding in WARC HTTP block "
            "(Common Crawl stores identity bodies)")
    return block[head_end + 4:]


WARC_PAGE_SCHEMA = "url string, warc_ts string, html binary"


def read_warc(files: DataFrame, content_col: str = "content") -> DataFrame:
    """DataFrame of WARC file bytes -> page rows (url, warc_ts,
    html) — the input_hint table shape. Only ``response`` records
    become pages (request/metadata/warcinfo records are skipped);
    one Arrow pass, no shuffle."""

    def gen(batches):
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for blob in pdf[content_col]:
                for headers, block in iter_warc_records(bytes(blob)):
                    if headers.get("warc-type") != "response":
                        continue
                    urls.append(headers.get("warc-target-uri", ""))
                    tss.append(headers.get("warc-date", ""))
                    htmls.append(extract_http_payload(block))
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls})

    return files.select(content_col).mapInPandas(gen, WARC_PAGE_SCHEMA)
