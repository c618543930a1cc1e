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


# ---------------------------------------------------------------------------
# host PageRank (directed weighted integer-exact)
# ---------------------------------------------------------------------------


def _pr_reference(edges, iters, scale):
    """Pure-python directed weighted integer PageRank with dangling
    self-loops (floor arithmetic, same update rule)."""
    nodes = sorted({n for e in edges for n in e[:2]})
    outw = {n: 0 for n in nodes}
    for s, d, w in edges:
        outw[s] += w
    full = list(edges) + [(n, n, 1) for n in nodes if outw[n] == 0]
    for n in nodes:
        outw[n] = max(outw[n], 1)
    r = {n: scale for n in nodes}
    base = scale * 15 // 100
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for s, d, w in full:
            acc[d] += w * (r[s] // outw[s])
        r = {n: base + 85 * acc[n] // 100 for n in nodes}
    return r


def test_directed_driver_pagerank_vs_reference():
    from pie_ray.functions.graphops import pagerank_integer_directed_driver

    rng = np.random.default_rng(5)
    edges = [
        (int(s), int(d), int(w))
        for s, d, w in zip(
            rng.integers(0, 12, 40), rng.integers(0, 14, 40), rng.integers(1, 5, 40)
        )
        if s != d
    ]
    got = pagerank_integer_directed_driver(
        np.array([e[0] for e in edges]),
        np.array([e[1] for e in edges]),
        np.array([e[2] for e in edges]),
        iters=6,
        scale=10**9,
    )
    want = _pr_reference(edges, 6, 10**9)
    got_map = dict(
        zip(got.column("node").to_pylist(), got.column("rank_scaled").to_pylist())
    )
    assert got_map == want


def _link_corpus():
    # hub.com is linked by everyone; leaf.com links out only (dangling dst)
    pages = [
        _page("https://s1.com/", ["https://hub.com/", "https://s2.com/"]),
        _page("https://s2.com/", ["https://hub.com/", "https://hub.com/x"]),
        _page("https://s3.com/", ["https://hub.com/", "https://leaf.com/"]),
        _page("https://hub.com/", ["https://s1.com/"]),
    ]
    return pa.table(
        {
            "url": pa.array([p[0] for p in pages], pa.string()),
            "html": pa.array([p[1] for p in pages], pa.binary()),
        }
    )


def test_host_pagerank_driver_vs_join_path_bit_equal(ray_session):
    from pie_ray.stages.links import host_pagerank

    edges = host_edges(ray.data.from_arrow(_link_corpus()), num_buckets=4)
    drv = host_pagerank(edges, iters=5, id_path="driver")
    jn = host_pagerank(edges, iters=5, id_path="join")
    as_map = lambda t: dict(
        zip(t.column("host").to_pylist(), t.column("rank_scaled").to_pylist())
    )
    m1, m2 = as_map(drv), as_map(jn)
    assert m1 == m2 and len(m1) > 0
    # the universally-linked hub outranks the hosts that only RECEIVE one
    # inbound source link (s1 inherits ALL of hub's mass — hub's single
    # outlink — and the dangling leaf retains mass via its self-loop, so
    # neither is comparable to hub on this topology)
    hub = m1["hub.com"]
    assert hub > m1["s2.com"] and hub > m1["s3.com"]
    assert "leaf.com" in m1  # dangling host still present (self-loop)


def test_write_linkgraph_cli_helper(ray_session, tmp_path):
    """CLI --linkgraph helper: writes linkgraph/ + hostrank/ parquet and
    reports counts; ranks agree with host_pagerank on the same edges."""
    import pyarrow.parquet as pq

    from pie_ray.run import _write_linkgraph
    from pie_ray.stages.links import host_pagerank

    pages = ray.data.from_arrow(_link_corpus())
    report = _write_linkgraph(pages, str(tmp_path))
    assert report["n_host_edges"] > 0 and report["n_hosts"] > 0
    edges = pq.read_table(report["linkgraph_path"])
    assert set(edges.column_names) == {"src_host", "dst_host", "n_links"}
    assert edges.num_rows == report["n_host_edges"]
    ranks = pq.read_table(report["hostrank_path"])
    want = host_pagerank(host_edges(pages))
    got = dict(zip(ranks.column("host").to_pylist(),
                   ranks.column("rank_scaled").to_pylist()))
    exp = dict(zip(want.column("host").to_pylist(),
                   want.column("rank_scaled").to_pylist()))
    assert got == exp and len(got) == report["n_hosts"]
    anchors = pq.read_table(report["anchors_path"])
    assert set(anchors.column_names) == {"host", "term", "n_links"}
    assert anchors.num_rows == report["n_anchor_terms"]


def test_host_crawl_radius_planted(ray_session):
    from pie_ray.stages.links import host_crawl_radius

    edges = host_edges(ray.data.from_arrow(_pages_table()))
    # seed a.com: a.com->{a,b,c}; b.com->{b,a}; c.com->a — all depth <= 1
    res = host_crawl_radius(edges, ["a.com"]).to_pandas()
    got = dict(zip(res["host"], res["depth"].astype(int)))
    assert got == {"a.com": 0, "b.com": 1, "c.com": 1}
    # d.com links to nobody and nobody links to d.com: seeding it reaches
    # only itself (depth 0), even though it has pages in the corpus
    res2 = host_crawl_radius(edges, ["d.com"]).to_pandas()
    assert dict(zip(res2["host"], res2["depth"].astype(int))) == {"d.com": 0}


def test_host_crawl_radius_empty_seeds_keeps_schema(ray_session):
    from pie_ray.stages.links import host_crawl_radius

    edges = host_edges(ray.data.from_arrow(_pages_table()))
    out = host_crawl_radius(edges, [])
    sch = out.schema()
    # regression: the rename map is skipped on 0-row blocks, leaking a
    # (node, depth) shape — or no schema at all — to downstream writers
    assert out.count() == 0
    assert sch.names == ["host", "depth"]
    assert sch.types == [pa.string(), pa.int64()]


def test_host_crawl_radius_string_driver_equals_distributed(ray_session):
    from pie_ray.functions.graphops import bfs_depths

    rng = np.random.RandomState(41)
    hosts = [f"h{i}.example" for i in range(25)]
    pairs = sorted(
        {
            (hosts[a], hosts[b])
            for a, b in rng.randint(0, len(hosts), (70, 2))
            if a != b
        }
    )
    t = pa.table(
        {
            "src": pa.array([p[0] for p in pairs], pa.string()),
            "dst": pa.array([p[1] for p in pairs], pa.string()),
        }
    )
    seeds = [hosts[0], hosts[13], "zz.not-in-graph"]
    drv = bfs_depths(ray.data.from_arrow(t), seeds).to_pandas()
    dist = bfs_depths(
        ray.data.from_arrow(t).repartition(5), seeds, force_distributed=True
    ).to_pandas()
    dmap = dict(zip(drv["node"], drv["depth"].astype(int)))
    xmap = dict(zip(dist["node"], dist["depth"].astype(int)))
    assert dmap == xmap
    assert dmap["zz.not-in-graph"] == 0  # isolated seed at depth 0

    # networkx parity over the string graph
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from(pairs)
    want = {"zz.not-in-graph": 0}
    for s in (hosts[0], hosts[13]):
        for n, d in nx.single_source_shortest_path_length(g, s, cutoff=16).items():
            if n not in want or d < want[n]:
                want[n] = int(d)
    assert dmap == want
