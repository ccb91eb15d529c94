"""WET (WARC extracted-text) source — Common Crawl's native text format.

Common Crawl distributes extracted page text as WET files: concatenated
WARC/1.0 ``conversion`` records, one per page, each carrying the target
URI, the crawl date, and the UTF-8 plain text as the record block; the
shipped files are per-record gzip members concatenated into one ``.gz``
(the public WARC-1.0 / ISO 28500 layout). The reference engine never
reads WET — its ingest is JSON activities over HTTP
(miru-writer-deployable/.../base/MiruActivityIngress.java:39-60) — but a
Common-Crawl-shaped engine should eat the corpus's native format
directly, so this module maps WET → the pages schema
(url, warc_ts, text, lang) that ``build_index`` consumes.

Ray shape: ``read_binary_files`` (one block per WET file — CC sizes them
~100-400 MB so a file is a natural work unit) → ``map_batches`` parser
task per file. Parsing walks records via their ``Content-Length`` headers
(never by scanning for magic strings inside payloads). The per-record
Python loop is the parser itself — header-bounded byte slicing, the same
class of work as the HTML extract stage, not a per-row transform that
Arrow kernels could replace.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

__all__ = ["read_wet", "write_wet", "parse_wet_bytes", "pages_to_wet_bytes",
           "read_warc", "write_warc", "parse_warc_bytes",
           "pages_to_warc_bytes"]

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> bytes:
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _parse_warc_date(raw: bytes) -> int:
    dt = datetime.strptime(raw.decode().strip(), "%Y-%m-%dT%H:%M:%SZ")
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def pages_to_wet_bytes(table: pa.Table, gz: bool = True) -> bytes:
    """Serialize pages rows into WET bytes — one ``conversion`` record per
    row, per-record gzip members when ``gz`` (the Common Crawl layout;
    stdlib gzip transparently reads concatenated members). Sub-second
    timestamp precision is floored to whole seconds: WARC-Date in the wild
    carries second resolution, so a WET round-trip is lossy below 1 s —
    tests use second-aligned fixtures."""
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    texts = table["text"].to_pylist()
    langs = (table["lang"].to_pylist() if "lang" in table.column_names
             else [""] * len(urls))
    out = []
    for url, t_us, text, lang in zip(urls, ts, texts, langs):
        body = (text or "").encode("utf-8")
        # deterministic record id (CC uses random uuids; determinism keeps
        # fixture bytes stable across runs)
        rid = hashlib.md5(url.encode() + str(int(t_us)).encode()).hexdigest()
        hdr = [b"WARC/1.0",
               b"WARC-Type: conversion",
               b"WARC-Target-URI: " + url.encode(),
               b"WARC-Date: " + _warc_date((int(t_us) // 1_000_000) * 1_000_000),
               b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">"]
        if lang:
            hdr.append(b"WARC-Identified-Content-Language: " + lang.encode())
        hdr += [b"Content-Type: text/plain",
                b"Content-Length: " + str(len(body)).encode()]
        rec = _CRLF.join(hdr) + _CRLF + _CRLF + body + _CRLF + _CRLF
        out.append(gzip.compress(rec, mtime=0) if gz else rec)
    return b"".join(out)


def write_wet(table: pa.Table, path: str, gz: bool | None = None) -> str:
    """Write pages rows as one WET file (``.warc.wet`` / ``.warc.wet.gz``)."""
    if gz is None:
        gz = path.endswith(".gz")
    data = pages_to_wet_bytes(table, gz=gz)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".tmp", "wb") as f:
        f.write(data)
    os.replace(path + ".tmp", path)
    return path


def _iter_records(data: bytes):
    """Yield (headers, body) per WARC record — gzip (multi-member) or
    plain streams; records walked by Content-Length."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:   # inter-record CRLFs
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[bytes, bytes] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:   # [0] = WARC/1.0
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        yield headers, data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length


def parse_wet_bytes(data: bytes) -> pa.Table:
    """Parse WET bytes → pages rows. Handles gzip (multi-member) and plain
    streams; skips non-``conversion`` records (CC WET files open with a
    ``warcinfo`` record). Records are walked by Content-Length — payload
    bytes are never scanned for delimiters."""
    urls, tss, texts, langs = [], [], [], []
    for headers, body in _iter_records(data):
        if headers.get(b"warc-type") != b"conversion":
            continue
        urls.append(headers.get(b"warc-target-uri", b"").decode())
        tss.append(_parse_warc_date(headers.get(b"warc-date", b"1970-01-01T00:00:00Z")))
        texts.append(body.decode("utf-8", errors="replace"))
        langs.append(headers.get(b"warc-identified-content-language",
                                 b"").decode())
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def pages_to_warc_bytes(table: pa.Table, gz: bool = True) -> bytes:
    """Serialize pages rows as WARC ``response`` records (the raw-capture
    sibling of WET): each record's block is an HTTP/1.1 response whose
    payload is the page html — the Common Crawl WARC layout."""
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    htmls = table["html"].to_pylist()
    out = []
    for url, t_us, html in zip(urls, ts, htmls):
        payload = html if isinstance(html, bytes) else (html or "").encode()
        http = (b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html; charset=UTF-8" + _CRLF
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF + payload)
        rid = hashlib.md5(url.encode() + str(int(t_us)).encode()).hexdigest()
        hdr = [b"WARC/1.0",
               b"WARC-Type: response",
               b"WARC-Target-URI: " + url.encode(),
               b"WARC-Date: " + _warc_date((int(t_us) // 1_000_000) * 1_000_000),
               b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
               b"Content-Type: application/http; msgtype=response",
               b"Content-Length: " + str(len(http)).encode()]
        rec = _CRLF.join(hdr) + _CRLF + _CRLF + http + _CRLF + _CRLF
        out.append(gzip.compress(rec, mtime=0) if gz else rec)
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> pa.Table:
    """Parse WARC bytes → pages rows with the raw ``html`` payload (the
    HTTP response head is stripped at its header/body boundary — the
    outer record is still walked by Content-Length alone). Non-``response``
    records (warcinfo, request, metadata) are skipped."""
    urls, tss, htmls = [], [], []
    for headers, body in _iter_records(data):
        if headers.get(b"warc-type") != b"response":
            continue
        http_end = body.find(_CRLF + _CRLF)
        payload = body[http_end + 4:] if http_end >= 0 else body
        urls.append(headers.get(b"warc-target-uri", b"").decode())
        tss.append(_parse_warc_date(headers.get(b"warc-date", b"1970-01-01T00:00:00Z")))
        htmls.append(payload)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })


def write_warc(table: pa.Table, path: str, gz: bool | None = None) -> str:
    """Write pages rows as one WARC file (``.warc`` / ``.warc.gz``)."""
    if gz is None:
        gz = path.endswith(".gz")
    data = pages_to_warc_bytes(table, gz=gz)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".tmp", "wb") as f:
        f.write(data)
    os.replace(path + ".tmp", path)
    return path


def read_warc(paths: str | list[str]):
    """``ray.data.Dataset`` of pages rows (html payloads) from WARC
    file(s)/dir — html-mode input: ``build_index`` runs its extract stage,
    so the indexed text is byte-identical to the parquet-html path."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        pieces = [parse_warc_bytes(b.as_py()) for b in batch["bytes"]]
        return (pa.concat_tables(pieces) if pieces
                else parse_warc_bytes(b""))

    files = rd.read_binary_files(paths, file_extensions=None)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def read_wet(paths: str | list[str]):
    """``ray.data.Dataset`` of pages rows from WET file(s)/dir — feed it
    straight to ``build_index`` (text-mode input: no html column, so the
    extract stage is skipped and sip digests fold the content hash)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        pieces = [parse_wet_bytes(b.as_py()) for b in batch["bytes"]]
        return (pa.concat_tables(pieces) if pieces
                else parse_wet_bytes(b""))

    files = rd.read_binary_files(paths, file_extensions=None)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)
