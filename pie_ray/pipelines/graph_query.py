"""Read-side API over the partitioned graph sink (A17 output).

The graph is written as ``{out}/graph/part={hash(src) % P}/...`` — so a
point lookup of one entity's adjacency needs exactly ONE partition
directory, not a scan of the graph. ``neighbors`` reads that partition with
a parquet filter on src (row-group pruning applies); ``degree_topk`` is the
analytic path (full scan, but only of the tiny (src, degree) columns).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from pie_ray.stages.graph import DEFAULT_NUM_PARTS
from pie_ray.util import part_of


def _num_parts(graph_dir: str) -> int:
    meta = os.path.join(graph_dir, "_GRAPH_META.json")
    if os.path.exists(meta):
        import json

        with open(meta) as f:
            return int(json.load(f)["num_parts"])
    return DEFAULT_NUM_PARTS


def neighbors(graph_dir: str, src: str, num_parts: int | None = None) -> list[dict]:
    """Adjacency entries of one canonical entity — one-partition read."""
    if num_parts is None:
        num_parts = _num_parts(graph_dir)
    part = part_of(src, num_parts)
    pdir = os.path.join(graph_dir, f"part={part}")
    if not os.path.isdir(pdir):
        return []
    t = pq.read_table(pdir, columns=["src", "adj"])
    t = t.filter(pc.equal(t.column("src"), src))
    if t.num_rows == 0:
        return []
    # concatenate all matching rows — a writer that emitted a split src
    # must not silently lose edges here
    out: list[dict] = []
    for row in t.column("adj"):
        out.extend(row.as_py())
    return out


def neighbors_khop(
    graph_dir: str, src: str, k: int = 2, num_parts: int | None = None
) -> dict[str, int]:
    """BFS over the partitioned sink: {entity: hop distance} for all
    entities within k hops of ``src`` (src itself at distance 0).

    Each frontier entity costs exactly ONE partition-directory read (the
    hash-routed point lookup `neighbors` uses) — no graph scan; the touched
    partition count is bounded by the frontier size, which is how a 10^9-
    node graph serves interactive k-hop queries from cold storage."""
    if num_parts is None:
        num_parts = _num_parts(graph_dir)
    dist = {src: 0}
    frontier = [src]
    for hop in range(1, k + 1):
        adj = _adjacency_of(graph_dir, frontier, num_parts)
        nxt: list[str] = []
        for node in frontier:
            for entry in adj.get(node, ()):
                dst = entry["dst"]
                if dst not in dist:
                    dist[dst] = hop
                    nxt.append(dst)
        if not nxt:
            break
        frontier = nxt
    return dist


def _adjacency_of(
    graph_dir: str, nodes: list[str], num_parts: int
) -> dict[str, list[dict]]:
    """Batched point lookup: adjacency for a whole frontier at once. Nodes
    are grouped by their hash partition so N frontier nodes cost
    min(N, touched-partitions) directory reads — strictly fewer than the
    per-node loop when a frontier clusters (it always does on small P)."""
    by_part: dict[int, list[str]] = {}
    for n in nodes:
        by_part.setdefault(part_of(n, num_parts), []).append(n)
    out: dict[str, list[dict]] = {}
    for part, members in by_part.items():
        pdir = os.path.join(graph_dir, f"part={part}")
        if not os.path.isdir(pdir):
            continue
        import pyarrow as pa

        t = pq.read_table(pdir, columns=["src", "adj"])
        t = t.filter(pc.is_in(t.column("src"), value_set=pa.array(members)))
        for s, row in zip(t.column("src").to_pylist(), t.column("adj")):
            out.setdefault(s, []).extend(row.as_py())
    return out


def shortest_path(
    graph_dir: str,
    src: str,
    dst: str,
    max_hops: int = 6,
    num_parts: int | None = None,
) -> list[str] | None:
    """Unweighted shortest path src -> dst over the partitioned sink (BFS
    with parent tracking, partition-batched frontier reads, early exit).
    Returns the node list including both endpoints, or None if dst is not
    reachable within ``max_hops``. Deterministic: the frontier expands in
    sorted order, so equal-length paths tie-break identically every run."""
    if num_parts is None:
        num_parts = _num_parts(graph_dir)
    if src == dst:
        return [src]
    parent: dict[str, str] = {src: src}
    frontier = [src]
    for _ in range(max_hops):
        adj = _adjacency_of(graph_dir, sorted(frontier), num_parts)
        nxt: list[str] = []
        for node in sorted(frontier):
            for entry in sorted(e["dst"] for e in adj.get(node, ())):
                if entry in parent:
                    continue
                parent[entry] = node
                if entry == dst:
                    path = [dst]
                    while path[-1] != src:
                        path.append(parent[path[-1]])
                    return path[::-1]
                nxt.append(entry)
        if not nxt:
            return None
        frontier = nxt
    return None


def degree_topk(graph_dir: str, k: int = 10) -> list[tuple[str, int]]:
    """Top-k entities by degree — scans only the (src, degree) columns."""
    t = pq.read_table(graph_dir, columns=["src", "degree"])
    idx = pc.select_k_unstable(
        t, k, sort_keys=[("degree", "descending"), ("src", "ascending")]
    )
    top = t.take(idx)
    return list(zip(top.column("src").to_pylist(), top.column("degree").to_pylist()))
