"""WARC (ISO 28500) reader/writer — Common Crawl's native format.

The north-rule input is "Common-Crawl-style web pages"; on disk
those are WARC files: concatenated records, each a version line +
named headers + a content block, the whole file conventionally
stored as CONCATENATED PER-RECORD GZIP MEMBERS (so a reader can
seek to any record boundary). Both layouts are handled here from
scratch — stdlib zlib decodes member-at-a-time via ``unused_data``.

``response`` records carry a full HTTP response as their block
(status line + headers + body, per the application/http content
type); ``extract_http_payload`` strips the HTTP envelope and
decodes chunked transfer-encoding (RFC 9112 §7.1) when the headers
declare it — wild WARCs (Common-Crawl-era captures) contain chunked
responses, so identity AND chunked bodies both ingest; only invalid
chunk framing refuses.

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

import re
import zlib

import pandas as pd  # noqa: F401  (module-level: Arrow typehints)

from pyspark.sql import DataFrame

__all__ = ["write_warc", "encode_chunked", "dechunk",
           "iter_warc_records", "extract_http_payload",
           "read_warc", "WARC_PAGE_SCHEMA",
           "write_wet", "read_wet", "wet_files_from_pages",
           "WET_PAGE_SCHEMA",
           "write_wat", "read_wat", "wat_files_from_pages",
           "WAT_PAGE_SCHEMA"]

_CRLF = b"\r\n"


def encode_chunked(payload: bytes, chunk_size: int) -> bytes:
    """RFC 9112 §7.1 chunked framing: hex size line, data, CRLF per
    chunk, then the 0-size last chunk. The paired encoder for the
    reader's de-chunking path (deterministic — fixed chunk size)."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    out = bytearray()
    for i in range(0, len(payload), chunk_size):
        part = payload[i:i + chunk_size]
        out += b"%x" % len(part) + _CRLF + part + _CRLF
    out += b"0" + _CRLF * 2
    return bytes(out)


def write_warc(records, per_record_gzip: bool = True,
               chunk: int | None = None) -> bytes:
    """records: iterable of (url, warc_date, payload_bytes, headers)
    where ``headers`` is an optional dict of extra HTTP headers.
    Each record is a WARC/1.0 ``response`` whose block is a full
    HTTP/1.1 200 response carrying ``payload``; with
    ``per_record_gzip`` each record becomes its own gzip member
    (the Common Crawl layout). ``chunk`` switches the HTTP body to
    chunked transfer-encoding in ``chunk``-byte chunks (what wild
    captures contain) — the WARC Content-Length still covers the
    framed block, per ISO 28500."""
    out = bytearray()
    for rec in records:
        url, date, payload = rec[0], rec[1], bytes(rec[2])
        extra = rec[3] if len(rec) > 3 and rec[3] else {}
        if chunk is not None:
            body = encode_chunked(payload, chunk)
            http_headers = [b"HTTP/1.1 200 OK",
                            b"Content-Type: text/html; charset=UTF-8",
                            b"Transfer-Encoding: chunked"]
        else:
            body = payload
            http_headers = [b"HTTP/1.1 200 OK",
                            b"Content-Type: text/html; charset=UTF-8",
                            b"Content-Length: %d" % len(payload)]
        for k, v in extra.items():
            http_headers.append(f"{k}: {v}".encode())
        http = _CRLF.join(http_headers) + _CRLF * 2 + body
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
            # zlib's gzip framing (wbits=31) writes mtime=0, unlike
            # gzip.compress which stamps wall-clock time into the
            # member header — identical inputs must produce identical
            # bytes so a Spark task retry regenerates the same file
            # (repo byte-determinism contract; advisor round-6)
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(record) + co.flush()
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


def dechunk(body: bytes) -> bytes:
    """Decode an RFC 9112 §7.1 chunked body: hex-size line (chunk
    extensions after ``;`` ignored), data, CRLF, ... , 0-size last
    chunk (trailer section ignored). Invalid framing — bad size
    line, truncated data, missing chunk CRLF — refuses loudly; a
    silently mis-framed body would corrupt every downstream byte
    invariant."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body: missing chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"chunked body: bad chunk size {size_tok!r}")
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) carry no body bytes
        part = body[pos:pos + size]
        if len(part) != size:
            raise ValueError("chunked body: chunk data truncated")
        out += part
        if body[pos + size:pos + size + 2] != _CRLF:
            raise ValueError("chunked body: missing CRLF after chunk")
        pos += size + 2


# header-block test, not substring: 'Transfer-Encoding:chunked' (no
# space) and odd casing are all valid HTTP (advisor round-6)
_CHUNKED_RE = re.compile(r"transfer-encoding\s*:\s*chunked", re.I)


def extract_http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record
    block (status line + headers + CRLFCRLF + body). Non-HTTP blocks
    pass through; chunked transfer-encoding is decoded (wild WARCs
    contain chunked captures); only invalid chunk framing refuses."""
    if not block.startswith(b"HTTP/"):
        return block
    head_end = block.find(_CRLF * 2)
    if head_end < 0:
        raise ValueError("HTTP response without header terminator")
    head = block[:head_end].decode("latin-1")
    body = block[head_end + 4:]
    if _CHUNKED_RE.search(head):
        return dechunk(body)
    return body


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


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — the Common-Crawl derived
# format: one WARC/1.0 ``conversion`` record per page, text/plain
# block, WARC-Refers-To naming the source capture. Reference layout:
# commoncrawl.org WET files; framing is plain ISO 28500 again, so
# the reader reuses iter_warc_records.
# ---------------------------------------------------------------------------

WET_PAGE_SCHEMA = "url string, warc_ts string, text string"


def _wet_record_id(url: str, date: str) -> str:
    """Deterministic record id (urn:uuid shaped from md5) — real WET
    writers mint random uuids; byte-determinism (task retries must
    regenerate identical files) forces a content-derived id."""
    import hashlib

    h = hashlib.md5(f"{url}\n{date}".encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-"
            f"{h[16:20]}-{h[20:32]}>")


def write_wet(records, per_record_gzip: bool = True) -> bytes:
    """records: iterable of (url, warc_date, text) -> WET bytes:
    WARC/1.0 ``conversion`` records with text/plain blocks, one gzip
    member per record when ``per_record_gzip`` (mtime=0 via zlib —
    identical inputs give identical bytes, the repo contract)."""
    out = bytearray()
    for url, date, text in records:
        block = text.encode("utf-8")
        headers = _CRLF.join([
            b"WARC/1.0",
            b"WARC-Type: conversion",
            b"WARC-Target-URI: " + url.encode(),
            b"WARC-Date: " + date.encode(),
            b"WARC-Record-ID: " + _wet_record_id(url, date).encode(),
            b"WARC-Refers-To: "
            + _wet_record_id(url, date + "#response").encode(),
            b"Content-Type: text/plain",
            b"Content-Length: %d" % len(block),
        ])
        record = headers + _CRLF * 2 + block + _CRLF * 2
        if per_record_gzip:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(record) + co.flush()
        else:
            out += record
    return bytes(out)


def read_wet(files: DataFrame, content_col: str = "content") -> DataFrame:
    """WET file bytes -> (url, warc_ts, text); only ``conversion``
    records yield rows. One Arrow pass, no shuffle."""

    def gen(batches):
        for pdf in batches:
            urls, tss, texts = [], [], []
            for blob in pdf[content_col]:
                for headers, block in iter_warc_records(bytes(blob)):
                    if headers.get("warc-type") != "conversion":
                        continue
                    urls.append(headers.get("warc-target-uri", ""))
                    tss.append(headers.get("warc-date", ""))
                    texts.append(block.decode("utf-8"))
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "text": texts})

    return files.select(content_col).mapInPandas(gen, WET_PAGE_SCHEMA)


def wet_files_from_pages(pages_text: DataFrame,
                         group_col: str = "wet_group") -> DataFrame:
    """(url, warc_ts, text [, group]) -> one WET file blob per
    group — the WARC→WET derivation's pack stage, executor-side
    (applyInPandas per group, rows ordered by url within a file so
    retries are byte-identical). Typical composition:

        pages = read_warc(files)
        text  = pages_extract_text(pages.select("url", "html"))
        wet   = wet_files_from_pages(
            pages.select("url", "warc_ts").join(text, "url")
                 .withColumn("wet_group", F.pmod(F.xxhash64("url"), N)))
    """
    from pyspark.sql import functions as F  # noqa: F401 (doc parity)

    def pack(pdf):
        pdf = pdf.sort_values("url")
        recs = list(zip(pdf["url"], pdf["warc_ts"], pdf["text"]))
        return pd.DataFrame({"content": [write_wet(recs)]})

    return (pages_text.groupBy(group_col)
            .applyInPandas(pack, "content binary"))


# ---------------------------------------------------------------------------
# WAT (metadata records) — the third member of the Common-Crawl
# triple: one WARC/1.0 ``metadata`` record per page whose block is a
# JSON document of envelope + extracted-link metadata. JSON is
# serialized canonically (sorted keys, compact separators) so
# identical inputs give identical bytes — the repo determinism
# contract extends to derived formats.
# ---------------------------------------------------------------------------

WAT_PAGE_SCHEMA = ("url string, warc_ts string, title string, "
                   "n_links long, links_csv string")


def write_wat(records, per_record_gzip: bool = True) -> bytes:
    """records: iterable of (url, warc_date, meta_dict) -> WAT
    bytes: ``metadata`` records with application/json blocks."""
    import json as _json

    out = bytearray()
    for url, date, meta in records:
        block = _json.dumps(meta, sort_keys=True,
                            separators=(",", ":")).encode("utf-8")
        headers = _CRLF.join([
            b"WARC/1.0",
            b"WARC-Type: metadata",
            b"WARC-Target-URI: " + url.encode(),
            b"WARC-Date: " + date.encode(),
            b"WARC-Record-ID: "
            + _wet_record_id(url, date + "#meta").encode(),
            b"Content-Type: application/json",
            b"Content-Length: %d" % len(block),
        ])
        record = headers + _CRLF * 2 + block + _CRLF * 2
        if per_record_gzip:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(record) + co.flush()
        else:
            out += record
    return bytes(out)


def wat_files_from_pages(meta: DataFrame,
                         group_col: str = "wat_group") -> DataFrame:
    """(url, warc_ts, title, links array<string> [, group]) -> one
    WAT file blob per group, executor-side; rows url-sorted within a
    file and JSON canonical, so task retries are byte-identical."""

    def pack(pdf):
        pdf = pdf.sort_values("url")
        recs = [(u, ts, {"url": u,
                         # pd.isna guards the pandas null spellings
                         # (None AND float NaN — NaN would serialize
                         # as invalid bare JSON NaN)
                         "title": "" if pd.isna(t) else t,
                         "links": [{"href": h} for h in list(ls)]})
                for u, ts, t, ls in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["title"], pdf["links"])]
        return pd.DataFrame({"content": [write_wat(recs)]})

    return (meta.groupBy(group_col)
            .applyInPandas(pack, "content binary"))


def read_wat(files: DataFrame, content_col: str = "content") -> DataFrame:
    """WAT file bytes -> (url, warc_ts, title, n_links, links_csv);
    only ``metadata`` records yield rows. links_csv is the hrefs
    joined with ',' in record order — a join-friendly projection of
    the link list. One Arrow pass, no shuffle."""
    import json as _json

    def gen(batches):
        for pdf in batches:
            urls, tss, titles, nl, csv = [], [], [], [], []
            for blob in pdf[content_col]:
                for headers, block in iter_warc_records(bytes(blob)):
                    if headers.get("warc-type") != "metadata":
                        continue
                    meta = _json.loads(block.decode("utf-8"))
                    links = [d.get("href", "")
                             for d in meta.get("links", [])]
                    urls.append(headers.get("warc-target-uri", ""))
                    tss.append(headers.get("warc-date", ""))
                    titles.append(meta.get("title", ""))
                    nl.append(len(links))
                    csv.append(",".join(links))
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "title": titles,
                 "n_links": pd.Series(nl, dtype="int64"),
                 "links_csv": csv})

    return files.select(content_col).mapInPandas(gen, WAT_PAGE_SCHEMA)
