"""Deterministic cross-host linked-page corpus for the link-graph stack.

The frozen KG corpus (sources/synth.py) only carries relative nav links —
every host self-loops, which exercises extraction but not ranking. This
generator plants a Common-Crawl-shaped host topology instead, as a pure
function of the row index (partition-independent, house invariant):

- ``n_hosts = max(8, n // pages_per_host)`` hosts, ``h{j}.example``;
- the first ``auth_frac`` of hosts are AUTHORITIES: every page links to
  three of them (index-hashed picks), so they accumulate inbound mass;
- the last ``spam_frac`` of hosts are SOURCE-ONLY: pages on them link out
  but no page ever links TO them — their host PageRank stays exactly at
  the teleport base ``scale * 15 // 100`` (no inbound mass), which is the
  signal the domain-prior gate (pipelines/curation.curate_pages) cuts on;
- middle hosts receive one deterministic mid-tier link per 3rd page.

Only (url, html) matter to the link stack; text/lang ride along with the
T0 schema so the table is a valid pages input anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pie_ray.util import hash64_ints

AUTH_FRAC = 0.1
SPAM_FRAC = 0.2
PAGES_PER_HOST = 20


def link_plan(
    i: int, n_hosts: int, spam_interlink: bool = False
) -> tuple[str, list[str]]:
    """(src_host, [dst_host, ...]) for page ``i`` — pure function of i.

    ``spam_interlink`` plants a LINK FARM instead of source-only spam:
    every spam page links to two other spam hosts, so the cluster has
    inbound links (it clears any inbound-mass PageRank gate) yet has no
    in-path from the trusted side — the exact topology TrustRank exists
    to demote (its rank there is exactly 0)."""
    n_auth = max(2, int(n_hosts * AUTH_FRAC))
    n_spam = max(2, int(n_hosts * SPAM_FRAC))
    j = i % n_hosts
    host = f"h{j}.example"
    if spam_interlink and j >= n_hosts - n_spam:
        spam_lo = n_hosts - n_spam
        picks = hash64_ints(np.array([2 * i, 2 * i + 1], np.int64), salt=0x2F7)
        # int(p) BEFORE %: numpy uint64 % python-int promotes to float64,
        # which rounds huge hashes to multiples of powers of two and
        # biases residues (only even picks for even moduli)
        dsts = [
            f"h{spam_lo + (int(p) % (n_spam - 1) + j - spam_lo + 1) % n_spam}.example"
            for p in picks
        ]
        return host, dsts
    picks = hash64_ints(np.array([3 * i, 3 * i + 1, 3 * i + 2], np.int64), salt=0x11D)
    dsts = [f"h{int(p) % n_auth}.example" for p in picks]
    if i % 3 == 0:
        # one mid-tier link so middle hosts sit between base and authority
        mid_lo, mid_hi = n_auth, n_hosts - n_spam
        if mid_hi > mid_lo:
            m = int(hash64_ints(np.array([i], np.int64), salt=0x9B)[0])
            dsts.append(f"h{mid_lo + m % (mid_hi - mid_lo)}.example")
    return host, dsts


def link_pages_table(indices, n_hosts: int, spam_interlink: bool = False) -> pa.Table:
    """T0-shaped Arrow table for the given row indices."""
    urls, htmls = [], []
    for i in indices:
        i = int(i)
        host, dsts = link_plan(i, n_hosts, spam_interlink=spam_interlink)
        # anchor text names the destination (label + common words) so the
        # anchor-term aggregate has signal: per dst host the label ties
        # with "official"/"site" on count and wins the term-asc tie-break
        links = " ".join(
            f'<a href="https://{d}/x{k}">{d.split(".")[0]} official site</a>'
            for k, d in enumerate(dsts)
        )
        # enough body copy that a real page clears structural gates
        # (anchor chars stay a minority of text chars)
        prose = (
            f"page {i} carries a deterministic paragraph of body copy "
            f"describing host {host} in plain prose with enough words "
            f"that link text stays a minority of the visible characters"
        )
        urls.append(f"https://{host}/p{i}")
        htmls.append(f"<html><body>{links}<p>{prose}</p></body></html>".encode())
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def n_hosts_for(n: int, pages_per_host: int = PAGES_PER_HOST) -> int:
    return max(8, n // pages_per_host)


def synth_link_pages(
    n: int,
    *,
    override_num_blocks: int | None = None,
    spam_interlink: bool = False,
):
    """Linked T0 corpus as a Ray Dataset: range(n) -> map_batches(gen)."""
    import ray.data

    n_hosts = n_hosts_for(n)

    def gen_batch(batch: dict[str, np.ndarray]) -> pa.Table:
        return link_pages_table(batch["id"], n_hosts, spam_interlink=spam_interlink)

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen_batch, batch_format="numpy", batch_size=256)


def golden_host_edges(n: int, spam_interlink: bool = False) -> set[tuple[str, str]]:
    """The corpus's TRUE distinct host edge set, straight from the
    generator's link plan (ground truth — no HTML parsing, no engine code
    in the loop). The literal-VALUES oracle for the link stack's graph
    entries builds on this, the same pattern as pie_ray.golden."""
    edges: set[tuple[str, str]] = set()
    n_hosts = n_hosts_for(n)
    for i in range(n):
        src, dsts = link_plan(i, n_hosts, spam_interlink=spam_interlink)
        edges.update((src, d) for d in dsts)
    return edges


def crawl_radius_oracle_sql(n: int, seeds: list[str], max_depth: int = 16) -> str:
    """DuckDB oracle for host_crawl_radius over the synthetic linked
    corpus: the generator-ground-truth edge set as a literal VALUES table,
    then the depth-capped recursive BFS (UNION dedups (node, d) pairs, so
    rows are bounded by n_hosts * (max_depth+1) — the same small-oracle
    argument as graph_bfs). Verifies HTML link extraction + host rollup +
    the BFS itself end to end."""
    edge_rows = ",\n                ".join(
        f"('{s}', '{d}')" for s, d in sorted(golden_host_edges(n))
    )
    seed_rows = ", ".join(f"('{s}')" for s in sorted(set(seeds)))
    return f"""
            -- crawl radius over the deterministic linked corpus: edges are
            -- the GENERATOR's link plan stated literally (ground truth),
            -- not anything the engine computed
            WITH RECURSIVE e(src, dst) AS (
              VALUES {edge_rows}
            ), seeds(v) AS (
              VALUES {seed_rows}
            ), bfs(node, d) AS (
              SELECT v, 0 FROM seeds
              UNION
              SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON e.src = bfs.node
              WHERE bfs.d < {max_depth}
            )
            SELECT node AS host, CAST(MIN(d) AS BIGINT) AS depth
            FROM bfs GROUP BY node
        """
