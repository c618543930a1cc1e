"""WARC source — reads Common-Crawl-style WARC files (plain or .gz) into
the T0 ``pages`` schema, so a user can point the KG pipeline at raw crawl
archives instead of pre-converted Parquet.

Scale shape: a ``FileBasedDatasource`` subclass — Ray Data parallelizes at
file granularity (one read task per file / file group), and ``_read_stream``
parses records INCREMENTALLY from the open stream, yielding fixed-size
Arrow batches; a 1 GB archive never materializes in worker memory. Gzip
members decompress transparently (Python's gzip handles the per-record
member concatenation CC uses).

Semantics: only ``WARC-Type: response`` records become rows (request /
metadata / warcinfo records are protocol framing, not pages); the HTTP
response headers are stripped so ``html`` is the raw body bytes. ``text``
and ``lang`` are emitted empty — the engine recomputes text via the frozen
stripper and lang via the lang-id operator, so WARC input feeds
``extract_batch(langs=None)`` directly.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

from pie_ray import schemas

WARC_BATCH_ROWS = 256


def _parse_warc_date(raw: bytes):
    """WARC-Date (ISO-8601, usually trailing Z) -> naive-UTC microsecond
    timestamp (the T0 convention). None for absent/garbled dates."""
    try:
        dt = datetime.fromisoformat(raw.decode("ascii").strip())
    except (ValueError, UnicodeDecodeError):
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _http_body(payload: bytes) -> bytes:
    """Strip HTTP response headers from a response-record payload (the body
    starts after the first blank line). Payloads without an HTTP preamble
    pass through whole."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def iter_warc_records(stream):
    """Yield (headers: dict[bytes, bytes], payload: bytes) per WARC record,
    reading incrementally. ``stream`` needs .readline() and .read(n)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"malformed WARC: expected version line, got {line[:40]!r}")
        headers: dict[bytes, bytes] = {}
        while True:
            hl = stream.readline()
            if hl in (b"\r\n", b"\n", b""):
                break
            k, _, v = hl.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        payload = stream.read(length)
        if len(payload) < length:
            # a crashed crawler leaves truncated archives; fail loudly
            # rather than emit a half page and then misparse the tail
            raise ValueError(
                f"truncated WARC record: expected {length} payload bytes, "
                f"got {len(payload)}"
            )
        yield headers, payload


def _records_to_table(rows: list[tuple]) -> pa.Table:
    urls, tss, htmls = zip(*rows)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array([""] * len(rows), pa.string()),
        },
        schema=schemas.PAGES,
    )


class WarcDatasource:
    """Constructed lazily in read_warc (FileBasedDatasource import is
    deferred so this module imports without a Ray session)."""

    def __new__(cls, paths, **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _Warc(FileBasedDatasource):
            def _read_stream(self, f, path):
                # .gz arrives ALREADY decompressed: FileBasedDatasource
                # infers the codec from the extension and opens an Arrow
                # CompressedInputStream (multi-member members included)
                stream = io.BufferedReader(f)
                rows: list[tuple] = []
                for headers, payload in iter_warc_records(stream):
                    if headers.get(b"warc-type") != b"response":
                        continue
                    url = headers.get(b"warc-target-uri", b"").decode(
                        "utf-8", "replace"
                    )
                    ts = _parse_warc_date(headers.get(b"warc-date", b""))
                    rows.append((url, ts, _http_body(payload)))
                    if len(rows) >= WARC_BATCH_ROWS:
                        yield _records_to_table(rows)
                        rows = []
                if rows:
                    yield _records_to_table(rows)

        return _Warc(paths, **kwargs)


def read_warc(paths, **kwargs):
    """``ray.data`` Dataset of T0 pages from WARC file(s). kwargs pass
    through to FileBasedDatasource (filesystem, shuffle, ...)."""
    import ray.data

    return ray.data.read_datasource(WarcDatasource(paths, **kwargs))


def read_wet(paths, **kwargs):
    """WET archives (Common Crawl's pre-extracted text: same WARC framing,
    ``WARC-Type: conversion``, payload = UTF-8 plain text) -> Dataset of
    (url, warc_ts, text, lang=''). Feeds text-stage pipelines (documents
    operators, NER-on-preextracted) without the HTML stripper; note the T0
    byte-identity invariant does NOT hold for WET text (the extraction was
    Common Crawl's, not the frozen spec v1 stripper)."""
    import ray.data
    from ray.data.datasource import FileBasedDatasource

    def _wet_table(rows: list[tuple]) -> pa.Table:
        urls, tss, texts = zip(*rows)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([""] * len(rows), pa.string()),
            }
        )

    class _Wet(FileBasedDatasource):
        def _read_stream(self, f, path):
            stream = io.BufferedReader(f)
            rows: list[tuple] = []
            for headers, payload in iter_warc_records(stream):
                if headers.get(b"warc-type") != b"conversion":
                    continue
                url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
                ts = _parse_warc_date(headers.get(b"warc-date", b""))
                rows.append((url, ts, payload.decode("utf-8", "replace")))
                if len(rows) >= WARC_BATCH_ROWS:
                    yield _wet_table(rows)
                    rows = []
            if rows:
                yield _wet_table(rows)

    return ray.data.read_datasource(_Wet(paths, **kwargs))


def build_warc_bytes(records: list[dict], compress: bool = False) -> bytes:
    """Synthesis/test helper: serialize records (keys: warc_type, url, date,
    payload, http: bool) into WARC bytes (one gzip member per record when
    ``compress``, mirroring Common Crawl's layout)."""
    out = []
    for r in records:
        payload = r["payload"]
        if r.get("http", False):
            payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        head = [
            b"WARC/1.0\r\n",
            b"WARC-Type: " + r["warc_type"].encode() + b"\r\n",
        ]
        if "url" in r:
            head.append(b"WARC-Target-URI: " + r["url"].encode() + b"\r\n")
        if "date" in r:
            head.append(b"WARC-Date: " + r["date"].encode() + b"\r\n")
        head.append(b"Content-Length: " + str(len(payload)).encode() + b"\r\n")
        head.append(b"\r\n")
        rec = b"".join(head) + payload + b"\r\n\r\n"
        out.append(gzip.compress(rec) if compress else rec)
    return b"".join(out)
