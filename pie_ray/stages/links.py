"""Web link-graph extraction: T0 pages -> host-level link graph.

The Common-Crawl-shaped counterpart to the KG edge aggregation: every page
contributes (src_host -> dst_host) edges for each ``<a href=...>`` it
carries, aggregated to a weighted host graph. The host graph is the
standard substrate for domain-level curation signals (host PageRank as a
quality prior, spam-cluster detection via connected components /
communities — both already available in pie_ray.functions.graphops, which
accepts string node ids for components and hashed ids for PageRank).

Design:
- link extraction is a stateless ``map_batches`` body over T0 (url, html)
  — a compiled bytes-level regex per document (doc-granular Python, same
  cost shape as the frozen stripper; the html column never leaves the map);
- href resolution is deliberately minimal and DETERMINISTIC: absolute
  ``scheme://host/...`` and scheme-relative ``//host/...`` links take
  their own host, rooted/relative paths resolve to the source host, and
  non-navigational schemes (mailto:, javascript:, data:, tel:) are
  dropped. No query/fragment parsing — the host is all the graph keeps;
- per-batch Arrow ``group_by`` partials collapse duplicate (src, dst)
  pairs BEFORE the shuffle, then ONE bucketed exchange (vectorized FNV on
  the pair key) produces exact edge weights. Hosts, not pages, bound the
  exchange: the edge universe is |hosts|^2 in the worst case but sparse in
  practice, and per-bucket state is edges/num_buckets.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped

# href value up to a quote/space/fragment; bytes-level so the html binary
# column is scanned without a decode pass
_HREF_RE = re.compile(rb"<a\s[^>]*?href\s*=\s*[\"']([^\"'#\s>]+)", re.IGNORECASE)
# href + the anchor's inner markup up to the closing </a> (anchor TEXT —
# how the web names the destination; feeds entity-name candidates).
# The inner body is BOUNDED ({0,4096}): real crawl pages carry unclosed
# <a> tags, and an unbounded lazy (.*?) would scan to end-of-document for
# each one — O(anchors x html_bytes) on broken markup. Anchors longer
# than 4 KiB of markup are navigation chrome, not names; they are simply
# not captured (deterministic spec).
_ANCHOR_RE = re.compile(
    rb"<a\s[^>]*?href\s*=\s*[\"']([^\"'#\s>]+)[^>]*>(.{0,4096}?)</a\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WORD_RE = re.compile(r"[a-z0-9]+")
_HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]+)")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")
PAIR_SEP = "\x1f"


def host_of(url: str) -> str:
    """Host of an absolute URL ('' when the URL has no parseable host)."""
    m = _HOST_RE.match(url)
    return m.group(1).lower() if m else ""


def resolve_link_host(href: str, src_host: str) -> str | None:
    """Destination host of one href, or None for non-navigational links."""
    if href.startswith("//"):
        rest = href[2:]
        host = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
        host = host.split(":", 1)[0]
        return host.lower() or None
    m = _HOST_RE.match(href)
    if m:
        return m.group(1).lower()
    if _SCHEME_RE.match(href):  # mailto:, javascript:, data:, tel:, ...
        return None
    return src_host or None  # rooted or relative path -> same host


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """T0 (url, html) -> one row per extracted link: (src_host, dst_host)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    src_out: list[str] = []
    dst_out: list[str] = []
    for url, html in zip(urls, htmls):
        if html is None:
            continue
        src = host_of(url or "")
        for raw in _HREF_RE.findall(html):
            href = raw.decode("utf-8", errors="replace").strip()
            dst = resolve_link_host(href, src)
            if dst:
                src_out.append(src)
                dst_out.append(dst)
    return pa.table(
        {
            "src_host": pa.array(src_out, pa.string()),
            "dst_host": pa.array(dst_out, pa.string()),
        }
    )


def extract_anchors_batch(batch: pa.Table) -> pa.Table:
    """T0 (url, html) -> one row per link WITH visible anchor text:
    (dst_host, anchor). Inner markup is stripped (tags removed, whitespace
    collapsed, lowercased — deterministic spec, same philosophy as the
    frozen stripper); links whose anchor collapses to nothing and
    non-navigational hrefs are dropped."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    dst_out: list[str] = []
    anchor_out: list[str] = []
    for url, html in zip(urls, htmls):
        if html is None:
            continue
        src = host_of(url or "")
        for raw_href, raw_inner in _ANCHOR_RE.findall(html):
            href = raw_href.decode("utf-8", errors="replace").strip()
            dst = resolve_link_host(href, src)
            if not dst:
                continue
            text = _TAG_RE.sub(b" ", raw_inner).decode("utf-8", errors="replace")
            text = " ".join(text.lower().split())
            if text:
                dst_out.append(dst)
                anchor_out.append(text)
    return pa.table(
        {
            "dst_host": pa.array(dst_out, pa.string()),
            "anchor": pa.array(anchor_out, pa.string()),
        }
    )


def host_anchor_terms(pages_ds, k: int = 3, num_buckets: int | None = None):
    """Top-``k`` anchor-text TERMS per destination host — how the rest of
    the corpus names each site (the classic web-graph entity-naming
    signal: anchor words pointing AT a page describe it better than the
    page itself; Brin & Page 1998 §2.2). Terms are ``[a-z0-9]+`` tokens of
    the stripped anchor text; ranking is by count desc, term asc — fully
    deterministic, independent of partitioning.

    One host-bucketed exchange: per-batch (host, term) count partials,
    per-bucket exact sums + vectorized per-host top-k (sort by host/count
    desc/term, boundary arange — no Python loop over rows). Per-bucket
    state is term-pairs/num_buckets. Returns (host, term, n_links) rows."""
    nb = num_buckets or bucket_count(pages_ds.size_bytes(), floor=32)
    _OUT = pa.schema(
        [("host", pa.string()), ("term", pa.string()), ("n_links", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        anchors = extract_anchors_batch(t)
        hosts_out: list[str] = []
        terms_out: list[str] = []
        for h, a in zip(
            anchors.column("dst_host").to_pylist(),
            anchors.column("anchor").to_pylist(),
        ):
            for w in _WORD_RE.findall(a):
                hosts_out.append(h)
                terms_out.append(w)
        if not hosts_out:
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "n_links": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        pairs = pa.table(
            {
                "host": pa.array(hosts_out, pa.string()),
                "term": pa.array(terms_out, pa.string()),
                "n_links": pa.array(np.ones(len(hosts_out), np.int64)),
            }
        )
        gb = pairs.group_by(["host", "term"]).aggregate([("n_links", "sum")])
        gb = rename_grouped(gb, ["host", "term"], ["host", "term", "n_links"])
        b = (bucket_hash_strings(gb.column("host"), salt=0x5A0C) % nb).astype(
            "int32"
        )
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["host", "term"])
            .aggregate([("n_links", "sum")])
        )
        gb = rename_grouped(gb, ["host", "term"], ["host", "term", "n_links"])
        gb = gb.sort_by(
            [("host", "ascending"), ("n_links", "descending"), ("term", "ascending")]
        )
        hosts = np.asarray(gb.column("host").to_pylist())
        # rank within host = position - start of the host's run
        _, starts, counts = np.unique(hosts, return_index=True, return_counts=True)
        rank = np.arange(len(hosts)) - np.repeat(starts, counts)
        return gb.filter(pa.array(rank < k, pa.bool_()))

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def host_edges(pages_ds, num_buckets: int | None = None):
    """Weighted host-level link graph from a T0 pages Dataset: one row per
    distinct (src_host, dst_host) with the total link count ``n_links``.
    Exact counts via per-batch partials + ONE pair-bucketed exchange."""
    nb = num_buckets or bucket_count(pages_ds.size_bytes(), floor=32)

    def partial(t: pa.Table) -> pa.Table:
        links = extract_links_batch(t)
        if links.num_rows == 0:
            return pa.table(
                {
                    "src_host": pa.array([], pa.string()),
                    "dst_host": pa.array([], pa.string()),
                    "n_links": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        links = links.append_column(
            "n_links", pa.array(np.ones(links.num_rows, np.int64))
        )
        gb = links.group_by(["src_host", "dst_host"]).aggregate([("n_links", "sum")])
        gb = rename_grouped(
            gb, ["src_host", "dst_host"], ["src_host", "dst_host", "n_links"]
        )
        key = pc.binary_join_element_wise(
            gb.column("src_host"), gb.column("dst_host"), PAIR_SEP
        )
        b = (bucket_hash_strings(key, salt=0x71A3) % nb).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "src_host": pa.array([], pa.string()),
                    "dst_host": pa.array([], pa.string()),
                    "n_links": pa.array([], pa.int64()),
                }
            )
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["src_host", "dst_host"])
            .aggregate([("n_links", "sum")])
        )
        return rename_grouped(
            gb, ["src_host", "dst_host"], ["src_host", "dst_host", "n_links"]
        )

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


HOST_ID_DRIVER_LIMIT = 2_000_000


def host_trustrank(edges_ds, seed_hosts, iters: int | None = None,
                   scale: int | None = None, id_path: str = "auto",
                   num_buckets: int | None = None):
    """Host-level TrustRank: integer-exact seeded PageRank over the host
    link graph, teleport mass landing only on ``seed_hosts`` (a curated
    trusted list — small by TrustRank's premise). An interlinked LINK FARM
    clears any inbound-mass PageRank gate (spam links to spam) but has no
    in-path from a trusted host, so its TrustRank is exactly 0 — feed the
    result to ``curate_pages(ranks=..., min_rank_scaled=1)`` to cut it.
    Same size-adaptive id paths as ``host_pagerank`` (bit-equal,
    equivalence-tested); on the join path only the |seeds| ids are ever
    pulled to the driver."""
    return host_pagerank(edges_ds, iters=iters, scale=scale, id_path=id_path,
                         num_buckets=num_buckets, seed_hosts=seed_hosts)


def host_pagerank(edges_ds, iters: int | None = None, scale: int | None = None,
                  id_path: str = "auto", num_buckets: int | None = None,
                  seed_hosts=None):
    """Integer-exact weighted directed PageRank over the host link graph
    (the domain-quality prior: CCNet/RefinedWeb-style pipelines gate or
    weight documents by the standing of their host). Input is
    ``host_edges`` output (src_host, dst_host, n_links); link counts are
    the edge weights; dangling hosts retain their mass via a weight-1
    self-loop. Returns (host, rank_scaled) — int64 fixed-point, so the
    result is bit-identical across partitionings AND across the two id
    paths (equivalence-tested).

    Size-adaptive (``id_path``: auto | driver | join): under
    ``HOST_ID_DRIVER_LIMIT`` edges the edge table is bounded, so hosts map
    to dense ids with one driver searchsorted and the vectorized driver
    iteration runs; above it, hosts get ids from ``global_rank`` (the
    distributed total-order primitive — no driver pull), edges pick them
    up via two hash joins, the joins-based distributed iteration runs, and
    ranks join back to host strings.

    ``seed_hosts`` (used via the ``host_trustrank`` wrapper) switches the
    teleport to TrustRank semantics: mass lands only on the listed hosts;
    on the join path only the |seeds| ids are ever pulled to the driver."""
    from pie_ray.functions.graphops import (
        PR_ITERS,
        PR_SCALE,
        pagerank_directed_distributed,
        pagerank_integer_directed_driver,
        trustrank_integer_directed_driver,
    )
    from pie_ray.util import drop_empty_blocks, gather_table, join_num_partitions

    iters = PR_ITERS if iters is None else iters
    scale = PR_SCALE if scale is None else scale
    seed_sorted = (
        None if seed_hosts is None else sorted(set(seed_hosts))
    )
    edges_ds = edges_ds.materialize()
    use_driver = id_path == "driver" or (
        id_path == "auto" and edges_ds.count() <= HOST_ID_DRIVER_LIMIT
    )

    if use_driver:
        tbl = gather_table(
            edges_ds,
            schema=pa.schema(
                [
                    ("src_host", pa.string()),
                    ("dst_host", pa.string()),
                    ("n_links", pa.int64()),
                ]
            ),
        )
        if tbl.num_rows == 0:
            # empty link graph (e.g. every page gated out upstream):
            # np.unique of empty object arrays degrades to float64 and
            # would crash the string cast below
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "rank_scaled": pa.array([], pa.int64()),
                }
            )
        src = np.asarray(tbl.column("src_host").to_pylist())
        dst = np.asarray(tbl.column("dst_host").to_pylist())
        w = tbl.column("n_links").to_numpy(zero_copy_only=False)
        hosts = np.unique(np.concatenate([src, dst]))
        if seed_sorted is not None:
            # no dtype= here: casting to hosts.dtype would TRUNCATE any
            # seed longer than the longest graph host, and a truncated
            # seed can spuriously equal a real host (granting it trust);
            # np.isin promotes mixed string widths correctly on its own,
            # matching the join path's exact pc.is_in semantics
            seed_mask = np.isin(hosts, np.asarray(seed_sorted))
            ranks = trustrank_integer_directed_driver(
                np.searchsorted(hosts, src),
                np.searchsorted(hosts, dst),
                lambda ids: seed_mask[ids],
                w=w,
                iters=iters,
                scale=scale,
            )
        else:
            ranks = pagerank_integer_directed_driver(
                np.searchsorted(hosts, src),
                np.searchsorted(hosts, dst),
                w,
                iters=iters,
                scale=scale,
            )
        nid = ranks.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": pa.array(hosts[nid], pa.string()),
                "rank_scaled": ranks.column("rank_scaled"),
            }
        )

    # join path: distinct hosts -> dense ids without any driver pull
    from pie_ray.functions.relational import global_rank

    nb = num_buckets or bucket_count(edges_ds.size_bytes(), floor=32)

    def host_partial(t: pa.Table) -> pa.Table:
        hs = np.unique(
            np.concatenate(
                [
                    np.asarray(t.column("src_host").to_pylist()),
                    np.asarray(t.column("dst_host").to_pylist()),
                ]
            )
        )
        ha = pa.array(hs, pa.string())
        b = (bucket_hash_strings(ha, salt=0x40B1) % nb).astype("int32")
        return pa.table({"host": ha, "bucket": pa.array(b, pa.int32())})

    def host_unique(g: pa.Table) -> pa.Table:
        gb = g.drop_columns(["bucket"]).group_by(["host"]).aggregate([])
        return rename_grouped(gb, ["host"], ["host"])

    hosts_ds = drop_empty_blocks(
        edges_ds.map_batches(host_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(host_unique, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema([("host", pa.string())]),
    )
    ids = global_rank(hosts_ds, "host", "host", rank_name="nid").materialize()
    jp = join_num_partitions(edges_ds.size_bytes())
    j1 = drop_empty_blocks(
        edges_ds.join(
            ids, join_type="inner", num_partitions=jp,
            on=("src_host",), right_on=("host",),
        ).materialize()
    )
    j1 = j1.map_batches(
        lambda t: pa.table(
            {
                "dst_host": t.column("dst_host"),
                "src": pc.cast(t.column("nid"), pa.int64()),
                "w": t.column("n_links"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j2 = drop_empty_blocks(
        j1.join(
            ids, join_type="inner", num_partitions=jp,
            on=("dst_host",), right_on=("host",),
        ).materialize()
    )
    directed = j2.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": pc.cast(t.column("nid"), pa.int64()),
                "w": t.column("w"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    seed_pred = None
    if seed_sorted is not None:
        # only the |seeds| ids ever reach the driver (TrustRank's premise:
        # the curated trusted list is small)
        seed_set = pa.array(seed_sorted, pa.string())
        seed_ids_tbl = gather_table(
            ids.map_batches(
                lambda t: pa.table(
                    {
                        "nid": pc.cast(
                            t.filter(
                                pc.is_in(t.column("host"), value_set=seed_set)
                            ).column("nid"),
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            ),
            schema=pa.schema([("nid", pa.int64())]),
        )
        seed_nids = np.sort(
            seed_ids_tbl.column("nid").to_numpy(zero_copy_only=False)
        )
        seed_pred = lambda a: np.isin(a, seed_nids)  # noqa: E731
    ranks = drop_empty_blocks(
        pagerank_directed_distributed(
            directed, iters=iters, scale=scale, add_dangling_self_loops=True,
            seed_pred=seed_pred,
        ).materialize(),
        schema=pa.schema([("node", pa.int64()), ("rank_scaled", pa.int64())]),
    )
    back = drop_empty_blocks(
        ranks.join(
            ids.map_batches(
                lambda t: pa.table(
                    {"host": t.column("host"), "nid2": pc.cast(t.column("nid"), pa.int64())}
                ),
                batch_format="pyarrow",
            ).materialize(),
            join_type="inner",
            num_partitions=join_num_partitions(ranks.size_bytes()),
            on=("node",),
            right_on=("nid2",),
        ).materialize()
    )
    return gather_table(
        back.map_batches(
            lambda t: pa.table(
                {"host": t.column("host"), "rank_scaled": t.column("rank_scaled")}
            ),
            batch_format="pyarrow",
        ),
        schema=pa.schema([("host", pa.string()), ("rank_scaled", pa.int64())]),
    )


def host_crawl_radius(edges_ds, seed_hosts, max_depth: int | None = None):
    """Crawl radius: fewest link hops from a trusted seed-host set to every
    reachable host over the host link graph (the companion signal to
    TrustRank — a frontier-scheduling / crawl-budget prior rather than a
    mass-propagation one; Cho et al. 1998's ordered-crawl framing).
    Returns Dataset ``(host, depth)``; hosts with no in-path from a seed
    are absent (exactly the hosts whose TrustRank is 0). Thin composition
    over the generic size-adaptive ``graphops.bfs_depths`` — directed
    edges, string ids, Pregel rounds past the driver budget."""
    import ray

    from pie_ray.functions.graphops import BFS_MAX_DEPTH, bfs_depths

    seed_hosts = list(seed_hosts)
    if not seed_hosts:
        # typed empty with the DOCUMENTED (host, depth) shape: the rename
        # map below is skipped on 0-row blocks (empty blocks skip map fns),
        # which would leak bfs_depths' (node, depth) — or no schema at all
        return ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "depth": pa.array([], pa.int64()),
                }
            )
        )
    out = bfs_depths(
        edges_ds,
        seed_hosts,
        src="src_host",
        dst="dst_host",
        max_depth=max_depth if max_depth is not None else BFS_MAX_DEPTH,
    )
    return out.map_batches(
        lambda t: pa.table({"host": t.column("node"), "depth": t.column("depth")}),
        batch_format="pyarrow",
    )
