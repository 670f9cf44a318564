"""Minimal WARC/1.0 reader + writer (stdlib only) — Common Crawl's
container format (ISO 28500). The engine's parquet pages tables stand in
for a crawl dump in-sandbox; this module closes the loop to the REAL
ingestion surface: ``.warc`` / ``.warc.gz`` shards → page rows.

Format notes (what the reader honors):
- A record = ``WARC/1.0\\r\\n`` + header lines (``Name: value``) + blank
  line + ``Content-Length`` bytes of block + ``\\r\\n\\r\\n`` separator.
- ``WARC-Type: response`` records carry an HTTP response as the block:
  status line + HTTP headers + blank line + body. The page payload is the
  body; the capture url/time come from ``WARC-Target-URI`` /
  ``WARC-Date`` (ISO-8601).
- ``.warc.gz`` shards are per-record gzip MEMBERS concatenated (the CC
  layout, enabling record-level range reads); ``gzip.decompress`` of the
  whole shard yields the plain concatenation, which is how the
  shard-at-a-time reader consumes it.
- Non-response records (warcinfo, request, metadata) are skipped.

Scale contract: the unit of parallelism is the SHARD FILE (CC ships ~1 GB
shards; one read task per shard), so ``read_warc`` distributes a path
list and each task parses its shard sequentially — no cross-shard state.
"""

from __future__ import annotations

import datetime as _dt
import gzip as _gzip
import re


def _warc_date(ts: _dt.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> _dt.datetime:
    return _dt.datetime.strptime(s.strip(), "%Y-%m-%dT%H:%M:%SZ")


def _chunk_body(body: bytes, *, chunk: int = 997) -> bytes:
    """RFC 9112 §7.1 chunked framing (odd chunk size so boundaries never
    align with content structure)."""
    out = bytearray()
    for i in range(0, len(body), chunk):
        part = body[i:i + chunk]
        out += b"%x\r\n" % len(part) + part + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def build_record(url: str, ts: _dt.datetime, body: bytes, *,
                 content_type: str = "text/html",
                 http_encoding: str = "identity") -> bytes:
    """One WARC response record (uncompressed bytes).

    ``http_encoding`` emits the capture-time wire form real crawls
    contain: "identity", "chunked" (Transfer-Encoding), "gzip"
    (Content-Encoding), or "gzip+chunked" (gzip then chunk — the order
    on a real wire)."""
    extra = b""
    if http_encoding in ("gzip", "gzip+chunked"):
        body = _gzip.compress(body, 6)
        extra += b"Content-Encoding: gzip\r\n"
    if http_encoding in ("chunked", "gzip+chunked"):
        body = _chunk_body(body)
        extra += b"Transfer-Encoding: chunked\r\n"
        length_line = b""
    else:
        length_line = f"Content-Length: {len(body)}\r\n".encode()
    http = (b"HTTP/1.1 200 OK\r\n"
            + f"Content-Type: {content_type}\r\n".encode()
            + extra + length_line + b"\r\n"
            + body)
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def write_warc(path: str, records, *, compress: bool | None = None) -> int:
    """Write ``(url, ts, body)`` records as a WARC shard; ``.gz`` paths
    (or ``compress=True``) gzip each record as its OWN member (the CC
    layout). Returns the record count."""
    if compress is None:
        compress = path.endswith(".gz")
    n = 0
    with open(path, "wb") as f:
        for url, ts, body in records:
            raw = build_record(url, ts, body)
            f.write(_gzip.compress(raw) if compress else raw)
            n += 1
    return n


def _iter_warc_full(blob: bytes):
    """Yield ``(url, ts, body_bytes, http_charset)`` for every response
    record in one shard's bytes (transparently gunzips multi-member
    ``.gz`` blobs and undoes HTTP wire encodings)."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gzip.decompress(blob)  # concatenated members decompress whole
    pos = 0
    n = len(blob)
    while pos < n:
        if blob.startswith(b"\r\n", pos):  # inter-record separators
            pos += 2
            continue
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0 or not blob.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        lines = blob[pos:head_end].split(b"\r\n")[1:]
        for ln in lines:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("ascii", "ignore")] = (
                v.strip().decode("utf-8", "replace"))
        length = int(headers.get("content-length", "0"))
        block = blob[head_end + 4: head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z"))
        # strip the HTTP envelope: body starts after its own blank line
        http_end = block.find(b"\r\n\r\n")
        if http_end >= 0:
            head = block[:http_end]
            body = _decode_http_body(head, block[http_end + 4:])
            charset = _http_charset(head)
        else:
            body = block
            charset = ""
        yield url, ts, body, charset


def _http_charset(head: bytes) -> str:
    """``Content-Type: …; charset=X`` from the capture's HTTP headers —
    the transport-layer encoding label (outranks content sniffing in
    the WHATWG order)."""
    m = re.search(rb"content-type\s*:[^\r\n]*;\s*charset=\"?([\w.-]+)",
                  head.lower())
    return m.group(1).decode("ascii", "ignore") if m else ""


def iter_warc(blob: bytes):
    """Yield ``(url, ts, body)`` — the classic 3-tuple API."""
    for url, ts, body, _cs in _iter_warc_full(blob):
        yield url, ts, body


def _dechunk(body: bytes) -> bytes:
    """Reverse RFC 9112 chunked framing; returns input unchanged if the
    framing is malformed (degrade, don't drop the capture)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return bytes(body)
        size_tok = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break
        start = eol + 2
        if start + size > n:
            return bytes(body)
        out += body[start:start + size]
        pos = start + size + 2  # skip trailing CRLF
    return bytes(out)


def _decode_http_body(head: bytes, body: bytes) -> bytes:
    """Undo capture-time wire encodings (what warcio's recompression does
    for real CC records): de-chunk Transfer-Encoding, then decompress
    Content-Encoding gzip/x-gzip/deflate. Tolerant — a malformed layer
    yields the bytes as captured rather than losing the record.
    ``br``/``zstd`` bodies pass through as captured (no brotli/zstd
    decoder exists in this environment; the extract stage then records
    an error row for the undecodable payload rather than mojibake —
    honest-gap contract, same as the codec raise family)."""
    hl = head.lower()
    if re.search(rb"transfer-encoding\s*:\s*chunked", hl):
        body = _dechunk(body)
    m = re.search(rb"content-encoding\s*:\s*([a-z0-9-]+)", hl)
    if m:
        enc = m.group(1)
        if enc in (b"gzip", b"x-gzip"):
            try:
                body = _gzip.decompress(body)
            except (OSError, EOFError):
                pass
        elif enc == b"deflate":
            import zlib as _zlib

            try:
                body = _zlib.decompress(body)
            except _zlib.error:
                try:  # raw-deflate servers (the classic interop wart)
                    body = _zlib.decompress(body, -15)
                except _zlib.error:
                    pass
    return body


def read_warc(paths: list[str], *, num_cpus: float = 0.5,
              with_charset: bool = False):
    """Distributed WARC ingestion: one parse task per SHARD file (the CC
    parallelism unit) → Dataset of ``(url, warc_ts, html)`` rows
    (+ ``http_charset`` from the capture's Content-Type header when
    ``with_charset`` — extract_batch honors it ahead of content
    sniffing). The shard list itself is tiny; payload bytes are read
    inside the tasks, never on the driver."""
    import pyarrow as pa
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[_dt.datetime] = []
        bodies: list[bytes] = []
        charsets: list[str] = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                blob = f.read()
            for url, ts, body, cs in _iter_warc_full(blob):
                urls.append(url)
                tss.append(ts)
                bodies.append(body)
                charsets.append(cs)
        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(bodies, pa.large_binary()),
        }
        if with_charset:
            cols["http_charset"] = pa.array(charsets, pa.string())
        return pa.table(cols)

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — the format CC ships extraction in
# ---------------------------------------------------------------------------

def build_conversion_record(url: str, ts: _dt.datetime, text: str) -> bytes:
    """One WET ``conversion`` record: the extracted plain text of a page
    (UTF-8 body, no HTTP envelope) — the layout of CC's ``.warc.wet.gz``
    shards."""
    body = text.encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def iter_wet(blob: bytes):
    """Yield ``(url, ts, text)`` from a WET shard (conversion records)."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gzip.decompress(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        if blob.startswith(b"\r\n", pos):
            pos += 2
            continue
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0 or not blob.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        for ln in blob[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("ascii", "ignore")] = (
                v.strip().decode("utf-8", "replace"))
        length = int(headers.get("content-length", "0"))
        block = blob[head_end + 4: head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "conversion":
            continue
        yield (headers.get("warc-target-uri", ""),
               _parse_warc_date(headers.get("warc-date",
                                            "1970-01-01T00:00:00Z")),
               block.decode("utf-8", "replace"))


def write_wet_shards(ds, out_dir: str, *, num_shards: int = 8,
                     url_col: str = "url", ts_col: str = "warc_ts",
                     text_col: str = "text"):
    """Distributed WET sink: rows hash-bucket by url into ``num_shards``
    per-record-gzipped ``.warc.wet.gz`` shards, one write task per shard
    (resume unit = shard file, same contract as the parquet writers).
    Returns the shard paths."""
    import os
    import zlib as _zlib

    import pyarrow as pa

    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)
    proj = ds.select_columns([url_col, ts_col, text_col])

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        path = os.path.join(out_dir, f"shard-{b:02d}.warc.wet.gz")
        tmp = path + ".tmp"
        g = g.sort_values(url_col, kind="mergesort")
        with open(tmp, "wb") as f:
            for u, ts, t in zip(g[url_col], g[ts_col], g[text_col]):
                rec = build_conversion_record(u, ts.to_pydatetime(), t or "")
                f.write(_gzip.compress(rec))
        os.replace(tmp, path)  # atomic publish per shard
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(g)], pa.int64())})

    return (_add_pkey(proj, url_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))


def read_wet(paths: list[str], *, num_cpus: float = 0.5):
    """Distributed WET ingestion (mirror of ``read_warc``): one parse
    task per shard → Dataset of ``(url, warc_ts, text)`` rows."""
    import pyarrow as pa
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[_dt.datetime] = []
        texts: list[str] = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                blob = f.read()
            for url, ts, text in iter_wet(blob):
                urls.append(url)
                tss.append(ts)
                texts.append(text)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "text": pa.array(texts, pa.string()),
        })

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)


# ---------------------------------------------------------------------------
# CDX-style record index (record-level random access into .warc.gz shards)
# ---------------------------------------------------------------------------

def write_warc_indexed(path: str, records) -> list[dict]:
    """Write a ``.warc.gz`` shard AND return its CDX-style index:
    one ``{url, offset, length}`` per record, where ``offset/length``
    frame the record's own gzip member — the reason CC compresses
    per-record: a fetcher range-reads exactly one member and gunzips it
    without touching the rest of the shard."""
    index: list[dict] = []
    pos = 0
    with open(path, "wb") as f:
        for url, ts, body in records:
            member = _gzip.compress(build_record(url, ts, body))
            f.write(member)
            index.append({"url": url, "offset": pos, "length": len(member)})
            pos += len(member)
    return index


def fetch_record(path: str, offset: int, length: int):
    """Random-access fetch of ONE record by its CDX entry: range-read the
    gzip member, gunzip, parse. Returns ``(url, ts, body)``."""
    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    recs = list(iter_warc(_gzip.decompress(member)))
    if len(recs) != 1:
        raise ValueError(f"index entry framed {len(recs)} records, want 1")
    return recs[0]


def write_warc_shards_indexed(ds, out_dir: str, *, num_shards: int = 8,
                              url_col: str = "url", ts_col: str = "warc_ts",
                              body_col: str = "html"):
    """Distributed indexed-WARC sink: url-hash bucketed ``.warc.gz``
    shards (one write task per shard, atomic publish) that ALSO emit
    their CDX index as the returned Dataset — ``(url, path, offset,
    length)`` rows framing each record's own gzip member. The index is
    the product: downstream consumers range-read single records without
    scanning shards (the access pattern the CC per-record-gzip layout
    exists for)."""
    import os

    import pyarrow as pa

    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)
    proj = ds.select_columns([url_col, ts_col, body_col])

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        path = os.path.join(out_dir, f"shard-{b:02d}.warc.gz")
        tmp = path + ".tmp"
        g = g.sort_values(url_col, kind="mergesort")
        recs = ((u, ts.to_pydatetime(), body) for u, ts, body in
                zip(g[url_col], g[ts_col], g[body_col]))
        index = write_warc_indexed(tmp, recs)
        os.replace(tmp, path)  # atomic publish per shard
        return pa.table({
            "url": pa.array([e["url"] for e in index], pa.string()),
            "path": pa.array([path] * len(index), pa.string()),
            "offset": pa.array([e["offset"] for e in index], pa.int64()),
            "length": pa.array([e["length"] for e in index], pa.int64()),
        })

    return (_add_pkey(proj, url_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))
