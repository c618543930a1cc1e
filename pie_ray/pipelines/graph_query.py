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
        nxt: list[str] = []
        for node in frontier:
            for entry in neighbors(graph_dir, node, num_parts):
                dst = entry["dst"]
                if dst not in dist:
                    dist[dst] = hop
                    nxt.append(dst)
        if not nxt:
            break
        frontier = nxt
    return dist


def degree_topk(graph_dir: str, k: int = 10) -> list[tuple[str, int]]:
    """Top-k entities by degree — scans only the (src, degree) columns."""
    t = pq.read_table(graph_dir, columns=["src", "degree"])
    idx = pc.select_k_unstable(
        t, k, sort_keys=[("degree", "descending"), ("src", "ascending")]
    )
    top = t.take(idx)
    return list(zip(top.column("src").to_pylist(), top.column("degree").to_pylist()))
