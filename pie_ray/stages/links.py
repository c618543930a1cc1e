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
