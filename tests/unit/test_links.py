"""Host link-graph extraction: reference parity on a planted HTML corpus,
href-resolution edge cases, partition independence, and composition with
the generic graph operators (components over string host ids)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.stages.links import (
    extract_links_batch,
    host_edges,
    host_of,
    resolve_link_host,
)


def _page(url: str, hrefs: list[str]) -> tuple[str, bytes]:
    body = " ".join(f'<a class="x" href="{h}">t</a>' for h in hrefs)
    return url, f"<html><body>{body}</body></html>".encode()


PAGES = [
    _page("https://a.com/p1", ["https://b.com/x", "/local", "//c.com/y", "mailto:z@q.com"]),
    _page("https://a.com/p2", ["https://b.com/x", "HTTPS://B.COM/other"]),
    _page("https://b.com/p1", ["relative/path", "javascript:void(0)", "https://a.com/"]),
    _page("http://c.com:8080/p", ["https://a.com/1", "https://a.com/2"]),
    _page("https://d.com/empty", []),
]
# expected host edges (count per (src, dst))
WANT = {
    ("a.com", "b.com"): 3,  # two from p1/p2 + case-folded B.COM
    ("a.com", "a.com"): 1,  # /local
    ("a.com", "c.com"): 1,  # scheme-relative
    ("b.com", "b.com"): 1,  # relative path
    ("b.com", "a.com"): 1,
    ("c.com", "a.com"): 2,
}


def _pages_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([p[0] for p in PAGES], pa.string()),
            "html": pa.array([p[1] for p in PAGES], pa.binary()),
        }
    )


def test_resolve_link_host_cases():
    assert resolve_link_host("https://x.com/a?b#c", "s") == "x.com"
    assert resolve_link_host("//x.com:443/a", "s") == "x.com"
    assert resolve_link_host("/rooted", "s") == "s"
    assert resolve_link_host("rel/path", "s") == "s"
    assert resolve_link_host("mailto:a@b.c", "s") is None
    assert resolve_link_host("tel:+123", "s") is None
    assert resolve_link_host("/rooted", "") is None  # unknown source host
    assert host_of("http://H.Com:9/x") == "h.com"
    assert host_of("not a url") == ""


def test_extract_links_batch_parity():
    links = extract_links_batch(_pages_table())
    got: dict[tuple[str, str], int] = {}
    for s, d in zip(links.column("src_host").to_pylist(), links.column("dst_host").to_pylist()):
        got[(s, d)] = got.get((s, d), 0) + 1
    assert got == WANT


def test_host_edges_counts_and_partition_independence(ray_session):
    results = []
    for parts, nb in ((1, 4), (5, 32)):
        ds = ray.data.from_arrow(_pages_table()).repartition(parts)
        tbl = host_edges(ds, num_buckets=nb).to_pandas()
        results.append(
            {
                (r["src_host"], r["dst_host"]): r["n_links"]
                for _, r in tbl.iterrows()
            }
        )
    assert results[0] == WANT
    assert results[0] == results[1]


def test_host_graph_feeds_components(ray_session):
    # two link clusters (a,b,c | x,y) -> components over string host ids
    pages = [
        _page("https://a.com/", ["https://b.com/"]),
        _page("https://b.com/", ["https://c.com/"]),
        _page("https://x.com/", ["https://y.com/"]),
    ]
    t = pa.table(
        {
            "url": pa.array([p[0] for p in pages], pa.string()),
            "html": pa.array([p[1] for p in pages], pa.binary()),
        }
    )
    from pie_ray.functions.graphops import connected_components

    edges = host_edges(ray.data.from_arrow(t), num_buckets=4).materialize()
    pairs = edges.map_batches(
        lambda b: pa.table({"a": b.column("src_host"), "b": b.column("dst_host")}),
        batch_format="pyarrow",
    )
    comp = connected_components(pairs, "a", "b").to_pandas()
    labels = dict(zip(comp["node"], comp["component"]))
    assert labels["a.com"] == labels["b.com"] == labels["c.com"]
    assert labels["x.com"] == labels["y.com"]
    assert labels["a.com"] != labels["x.com"]
