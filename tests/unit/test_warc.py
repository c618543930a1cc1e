"""WARC source: plain + per-record-gzip archives -> T0 pages schema,
response-record filtering, HTTP header stripping, date parsing, streaming
parse, and composition with the frozen extract stage."""

from __future__ import annotations

import datetime
import io
import os

import pyarrow as pa
import pytest

from pie_ray import schemas
from pie_ray.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    read_warc,
)

RECORDS = [
    {"warc_type": "warcinfo", "payload": b"software: test\r\n"},
    {
        "warc_type": "response",
        "url": "http://a.example/page1",
        "date": "2026-08-17T12:00:00Z",
        "payload": b"<html><body>Hello <b>one</b></body></html>",
        "http": True,
    },
    {
        "warc_type": "request",
        "url": "http://a.example/page1",
        "date": "2026-08-17T12:00:00Z",
        "payload": b"GET /page1 HTTP/1.1\r\n",
    },
    {
        "warc_type": "response",
        "url": "http://b.example/page2",
        "date": "2026-08-17T13:30:05+02:00",
        "payload": b"<html>raw body, no http preamble</html>",
        "http": False,
    },
]

EXPECT_URLS = ["http://a.example/page1", "http://b.example/page2"]
EXPECT_HTML = [
    b"<html><body>Hello <b>one</b></body></html>",
    b"<html>raw body, no http preamble</html>",
]
EXPECT_TS = [
    datetime.datetime(2026, 8, 17, 12, 0, 0),
    datetime.datetime(2026, 8, 17, 11, 30, 5),  # +02:00 normalized to UTC
]


def _write(tmp_path, name: str, compress: bool) -> str:
    p = os.path.join(str(tmp_path), name)
    with open(p, "wb") as f:
        f.write(build_warc_bytes(RECORDS, compress=compress))
    return p


@pytest.mark.parametrize("compress", [False, True])
def test_read_warc(ray_session, tmp_path, compress):
    path = _write(tmp_path, "t.warc.gz" if compress else "t.warc", compress)
    ds = read_warc(path)
    t = pa.Table.from_pandas(
        ds.to_pandas().sort_values("url").reset_index(drop=True),
        preserve_index=False,
    )
    assert [f.name for f in schemas.PAGES] == t.column_names
    assert t.column("url").to_pylist() == EXPECT_URLS
    assert t.column("html").to_pylist() == EXPECT_HTML
    assert t.column("warc_ts").to_pylist() == EXPECT_TS
    assert t.column("text").to_pylist() == ["", ""]
    assert t.column("lang").to_pylist() == ["", ""]


def test_multi_file_read(ray_session, tmp_path):
    p1 = _write(tmp_path, "a.warc", False)
    p2 = _write(tmp_path, "b.warc.gz", True)
    ds = read_warc([p1, p2])
    urls = sorted(ds.to_pandas()["url"])
    assert urls == sorted(EXPECT_URLS * 2)


def test_feeds_extract_stage(ray_session, tmp_path):
    from pie_ray.stages.extract import extract_batch

    path = _write(tmp_path, "t.warc", False)
    out = (
        read_warc(path)
        .map_batches(lambda t: extract_batch(t, langs=None), batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out["url"]) == EXPECT_URLS
    assert out.loc[0, "text"] == "Hello one"
    assert (out["text_sha256"].str.len() == 64).all()


def test_iter_records_streaming_and_malformed():
    raw = build_warc_bytes(RECORDS, compress=False)
    recs = list(iter_warc_records(io.BufferedReader(io.BytesIO(raw))))
    assert len(recs) == 4
    assert [h[b"warc-type"] for h, _ in recs] == [
        b"warcinfo",
        b"response",
        b"request",
        b"response",
    ]
    with pytest.raises(ValueError, match="malformed WARC"):
        list(iter_warc_records(io.BytesIO(b"NOT A WARC\r\n")))


def test_truncated_archive_fails_loudly():
    raw = build_warc_bytes(RECORDS, compress=False)
    with pytest.raises(ValueError, match="truncated WARC"):
        list(iter_warc_records(io.BytesIO(raw[: len(raw) - 30])))


def test_read_wet(ray_session, tmp_path):
    from pie_ray.sources.warc import read_wet

    wet_records = [
        {"warc_type": "warcinfo", "payload": b"software: test\r\n"},
        {
            "warc_type": "conversion",
            "url": "http://a.example/page1",
            "date": "2026-08-17T12:00:00Z",
            "payload": "Hello one — déjà extracted.".encode(),
        },
        {
            "warc_type": "conversion",
            "url": "http://b.example/page2",
            "date": "2026-08-17T13:30:05+02:00",
            "payload": b"Second text body.",
        },
    ]
    p = os.path.join(str(tmp_path), "t.wet.gz")
    with open(p, "wb") as f:
        f.write(build_warc_bytes(wet_records, compress=True))
    df = read_wet(p).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df.columns) == ["url", "warc_ts", "text", "lang"]
    assert list(df["url"]) == EXPECT_URLS
    assert df.loc[0, "text"] == "Hello one — déjà extracted."
    assert list(df["warc_ts"]) == EXPECT_TS
