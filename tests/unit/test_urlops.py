"""URL canonicalization spec v1 + canonical-url dedup: rule-by-rule spec
cases, idempotence, planted crawl-variant collapse, deterministic winner,
and partition/bucket independence."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pie_ray.functions.urlops import (
    canonical_url,
    canonicalize_batch,
    dedup_by_canonical_url,
)


def test_canonical_url_spec_cases():
    # case folding: scheme + host only, never path/query values
    assert canonical_url("HTTP://WWW.Ex.COM/Path") == "http://www.ex.com/Path"
    # default ports stripped, non-default kept
    assert canonical_url("https://a.com:443/x") == "https://a.com/x"
    assert canonical_url("http://a.com:80/x") == "http://a.com/x"
    assert canonical_url("http://a.com:8080/x") == "http://a.com:8080/x"
    assert canonical_url("https://a.com:80/x") == "https://a.com:80/x"
    # fragment dropped
    assert canonical_url("https://a.com/x#frag") == "https://a.com/x"
    # tracking params dropped (utm_* prefix + exact set), others sorted
    assert (
        canonical_url("https://a.com/x?utm_source=s&b=2&a=1&gclid=g&ref=r")
        == "https://a.com/x?a=1&b=2"
    )
    # emptied query dropped entirely
    assert canonical_url("https://a.com/x?utm_medium=m") == "https://a.com/x"
    # blank param values survive the sort
    assert canonical_url("https://a.com/x?b=&a=1") == "https://a.com/x?a=1&b="
    # trailing slash stripped on non-root paths, root kept
    assert canonical_url("https://a.com/x/") == "https://a.com/x"
    assert canonical_url("https://a.com/") == "https://a.com/"
    assert canonical_url("https://a.com") == "https://a.com"
    # www is identity, not noise — kept
    assert canonical_url("https://www.a.com/x") == "https://www.a.com/x"
    # non-absolute inputs pass through stripped
    assert canonical_url("  /rel/path ") == "/rel/path"
    assert canonical_url("") == ""
    # parser-rejected inputs come back unchanged instead of raising
    assert canonical_url("https://example.com:99999/x") == "https://example.com:99999/x"
    assert canonical_url("http://example.com:abc/x") == "http://example.com:abc/x"
    assert canonical_url("http://[::1/x") == "http://[::1/x"


def test_canonical_url_idempotent():
    urls = [
        "HTTPS://A.COM:443/x/?b=2&a=1&utm_x=1#f",
        "http://b.org/p?gclid=1",
        "https://c.net/",
    ]
    for u in urls:
        c = canonical_url(u)
        assert canonical_url(c) == c


def test_canonicalize_batch_appends_column():
    t = pa.table({"url": pa.array(["HTTPS://A.com/x/", None], pa.string())})
    out = canonicalize_batch(t)
    assert out.column("canon_url").to_pylist() == ["https://a.com/x", ""]


def _variants() -> pa.Table:
    # three logical pages, each crawled under several variant urls
    rows = [
        ("https://p.com/a?utm_source=x", 30),
        ("HTTPS://P.COM:443/a/", 20),
        ("https://p.com/a", 10),
        ("http://q.com/b#top", 2),
        ("http://q.com/b?fbclid=z", 1),
        ("https://r.com/c?z=1&a=2", 5),
        ("https://r.com/c?a=2&z=1", 6),
    ]
    return pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "ts": pa.array([t for _, t in rows], pa.int64()),
        }
    )


def test_dedup_by_canonical_url_keeps_min_and_is_partition_independent(
    ray_session,
):
    results = []
    for parts, nb in ((1, 4), (4, 16)):
        ds = ray.data.from_arrow(_variants()).repartition(parts)
        out = pa.Table.from_pylist(
            dedup_by_canonical_url(ds, order_col="ts", num_buckets=nb).take_all()
        )
        results.append(
            sorted(zip(out.column("url").to_pylist(), out.column("ts").to_pylist()))
        )
    # one survivor per canonical url, smallest ts wins
    assert results[0] == [
        ("http://q.com/b?fbclid=z", 1),
        ("https://p.com/a", 10),
        ("https://r.com/c?z=1&a=2", 5),
    ]
    assert results[0] == results[1]
