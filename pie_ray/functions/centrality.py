"""Betweenness centrality over an undirected packed-edge graph — the
entity-importance signal shortest-path counts give that degree/PageRank
don't (brokers between communities score high even at low degree).

Algorithms (public): exact = Brandes 2001 (per-source BFS + dependency
back-propagation); approximate = Brandes & Pich 2007 pivot sampling — run
the per-source pass from k deterministic pivots and scale by n/k (unbiased;
with k = n it IS the exact algorithm, which the tests exploit).

Scale shape — betweenness differs from this module's neighbours
(triangles / k-core / PageRank in graphops.py): each source's pass needs
the WHOLE graph, so the distributed axis is the PIVOTS, not the edges.
The edge arrays broadcast once via ``ray.put`` (a co-occurrence/entity
graph is orders of magnitude smaller than the corpus that produced it —
1e8 edges ≈ 1.6 GB, inside a worker heap), and pivot chunks fan out as a
task map over a Dataset of pivot ids; each task returns one dense float
partial per node chunk, summed on the driver (n floats per task, never
edges). Past the broadcast budget the default is a declared seam — the
same stance as graphops.NODE_BROADCAST_LIMIT — never a SILENT fallback;
callers can opt into on_over_budget="sample", which estimates on a
deterministic smallest-hash edge sample sized to the budget and logs the
kept fraction (scores bias low for paths crossing dropped edges).

Per-source work is fully vectorized: BFS levels, sigma path counts and the
delta back-propagation are all full-edge-array masked ``np.add.at`` passes
(O(depth × m) numpy per source, no Python queue)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from pie_ray.functions.graphops import PACK
from pie_ray.util import hash64_ints

# edge count beyond which the (src, dst, sigma buffers) broadcast stops
# being safe on a 64-GiB worker; above it the seam either raises (default)
# or, with on_over_budget="sample", estimates on a deterministic
# smallest-hash edge sample trimmed to fit the budget (logged)
EDGE_BROADCAST_LIMIT = 100_000_000
PIVOT_CHUNK = 64
EDGE_SAMPLE_SALT = 0xED6E


def sample_packed_edges(
    edges_packed: np.ndarray, max_edges: int, salt: int = EDGE_SAMPLE_SALT
) -> tuple[np.ndarray, float]:
    """Deterministic edge sample: keep the ``max_edges`` edges with the
    smallest splitmix64 hash (partitioning-free — membership depends only
    on edge identity, so any pre-filter that kept a superset composes to
    the same final set). Returns (sampled edges sorted by value, kept
    fraction)."""
    m = len(edges_packed)
    if m <= max_edges:
        return edges_packed, 1.0
    h = hash64_ints(np.asarray(edges_packed).astype(np.uint64), salt=salt)
    sel = np.argpartition(h, max_edges - 1)[:max_edges]
    return np.sort(np.asarray(edges_packed)[sel]), max_edges / m


def _csr_arrays(edges_packed: np.ndarray):
    """(nodes, src, dst) with both directions, dense int32 indices sorted
    by (src, dst) — deterministic input order for the float accumulations."""
    a = (edges_packed // PACK).astype(np.int64)
    b = (edges_packed % PACK).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    src = np.concatenate([ai, bi]).astype(np.int32)
    dst = np.concatenate([bi, ai]).astype(np.int32)
    order = np.lexsort((dst, src))
    return nodes, src[order], dst[order]


def _brandes_from_sources(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    sources: np.ndarray,
    harm_out: np.ndarray | None = None,
) -> np.ndarray:
    """Sum of Brandes dependencies over ``sources`` (unnormalized; each
    unordered pair counted twice across a full source sweep — the caller
    halves). Vectorized per source: every level is a masked pass over the
    full directed edge arrays. When ``harm_out`` is given, the harmonic
    contributions (Σ 1/d) accumulate into it from the SAME BFS distances —
    computing both centralities costs one extra masked add, not a second
    BFS sweep."""
    bc = np.zeros(n, np.float64)
    for s in sources:
        dist = np.full(n, -1, np.int32)
        sigma = np.zeros(n, np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        d = 0
        while True:
            m_e = (dist[src] == d) & (dist[dst] == -1)
            if not m_e.any():
                break
            dist[dst[m_e]] = d + 1
            d += 1
        depth = d
        if harm_out is not None:
            reach = dist > 0
            harm_out[reach] += 1.0 / dist[reach]
        # sigma forward by level: edges u->v with dist[v] == dist[u]+1
        du, dv = dist[src], dist[dst]
        dag = (du >= 0) & (dv == du + 1)
        dag_src, dag_dst, dag_du = src[dag], dst[dag], du[dag]
        for d in range(depth):
            lvl = dag_du == d
            np.add.at(sigma, dag_dst[lvl], sigma[dag_src[lvl]])
        # dependency backward by level
        delta = np.zeros(n, np.float64)
        for d in range(depth - 1, -1, -1):
            lvl = dag_du == d
            u, v = dag_src[lvl], dag_dst[lvl]
            np.add.at(delta, u, sigma[u] / sigma[v] * (1.0 + delta[v]))
        delta[s] = 0.0
        bc += delta
    return bc


def _harmonic_from_sources(
    n: int, src: np.ndarray, dst: np.ndarray, sources: np.ndarray
) -> np.ndarray:
    """Σ 1/d(u, v) contributions from the given sources u to every node v
    (undirected symmetry: a BFS from u contributes to all v at once)."""
    harm = np.zeros(n, np.float64)
    for s in sources:
        dist = np.full(n, -1, np.int32)
        dist[s] = 0
        d = 0
        while True:
            m_e = (dist[src] == d) & (dist[dst] == -1)
            if not m_e.any():
                break
            dist[dst[m_e]] = d + 1
            d += 1
        reach = dist > 0
        harm[reach] += 1.0 / dist[reach]
    return harm


# per-kernel final scale on the pivot-scaled sums (betweenness counts each
# unordered pair twice across a full source sweep)
_KERNEL_NORM = {"betweenness": 0.5, "harmonic": 1.0}


def harmonic_driver(edges_packed: np.ndarray, k_pivots: int | None = None) -> pa.Table:
    """(s_suppkey, harmonic) — harmonic centrality (Boldi & Vigna 2014,
    the closeness variant robust to disconnected graphs): exact when
    ``k_pivots`` covers all nodes, else the n/k pivot estimate."""
    nodes, src, dst = _csr_arrays(edges_packed)
    n = len(nodes)
    if n == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "harmonic": pa.array([], pa.float64())}
        )
    sources, scale = _pick_pivots(nodes, n, k_pivots)
    h = _harmonic_from_sources(n, src, dst, sources) * scale
    return pa.table(
        {
            "s_suppkey": pa.array(nodes, pa.int64()),
            "harmonic": pa.array(h, pa.float64()),
        }
    )


def betweenness_driver(
    edges_packed: np.ndarray, k_pivots: int | None = None
) -> pa.Table:
    """(s_suppkey, betweenness) — exact when ``k_pivots`` is None/>=n,
    else the Brandes-Pich n/k-scaled pivot estimate from the k nodes with
    the smallest splitmix64 hash (deterministic, partitioning-free)."""
    nodes, src, dst = _csr_arrays(edges_packed)
    n = len(nodes)
    if n == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "betweenness": pa.array([], pa.float64())}
        )
    sources, scale = _pick_pivots(nodes, n, k_pivots)
    bc = _brandes_from_sources(n, src, dst, sources) * (scale / 2.0)
    return pa.table(
        {
            "s_suppkey": pa.array(nodes, pa.int64()),
            "betweenness": pa.array(bc, pa.float64()),
        }
    )


def _pick_pivots(nodes: np.ndarray, n: int, k_pivots: int | None):
    if k_pivots is None or k_pivots >= n:
        return np.arange(n, dtype=np.int64), 1.0
    h = hash64_ints(nodes, salt=0xBC7)
    pivots = np.sort(np.argsort(h)[:k_pivots]).astype(np.int64)
    return pivots, n / k_pivots


def _centrality_distributed(
    edges_packed: np.ndarray,
    kernels: list[str],
    k_pivots: int | None,
    on_over_budget: str = "raise",
) -> pa.Table:
    """Pivot fan-out shared by the centrality kernels: edge arrays
    broadcast once via ``ray.put``, pivot chunks run as a task map, each
    task returns one dense n-float partial per chunk PER KERNEL (asking
    for both costs one extra masked add per BFS, not a second sweep),
    summed on the driver in chunk order — deterministic, equal to the
    driver path up to float regrouping (tested to 1e-9 relative). Driver
    traffic is n × ceil(k/PIVOT_CHUNK) rows, never edges; the combine is
    one vectorized lexsort + reshape-sum, no per-row Python."""
    import ray

    from pie_ray.util import gather_table

    full_nodes: np.ndarray | None = None
    if 2 * len(edges_packed) > EDGE_BROADCAST_LIMIT:
        if on_over_budget == "sample":
            import logging

            # row-universe contract: every node of the FULL graph gets a
            # row (nodes whose incident edges were all dropped score 0.0 —
            # never silently vanish from a downstream join). Memory-lean:
            # no astype copy (packed edges are int64 by convention) and
            # unique each endpoint half BEFORE the union — peak ~2x the
            # over-budget array instead of ~5x
            ep = np.asarray(edges_packed, dtype=np.int64)
            full_nodes = np.union1d(np.unique(ep // PACK), np.unique(ep % PACK))
            edges_packed, frac = sample_packed_edges(
                edges_packed, EDGE_BROADCAST_LIMIT // 2
            )
            logging.getLogger(__name__).warning(
                "%s: edge set exceeds the broadcast budget; estimating on "
                "a deterministic %.1f%% edge sample — scores are biased "
                "low for paths crossing dropped edges, and nodes that lost "
                "every incident edge score 0.0 (degraded mode).",
                "/".join(kernels),
                100.0 * frac,
            )
        else:
            raise NotImplementedError(
                f"{'/'.join(kernels)} beyond the edge-broadcast budget needs "
                "a partitioned multi-source BFS (not implemented) — pass "
                "on_over_budget='sample' to estimate on a deterministic "
                "edge sample instead (logged accuracy note)"
            )
    nodes, src, dst = _csr_arrays(edges_packed)
    n = len(nodes)
    if n == 0:
        empty = pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                **{k: pa.array([], pa.float64()) for k in kernels},
            }
        )
        return (
            _zero_fill(empty, full_nodes, kernels)
            if full_nodes is not None
            else empty
        )
    sources, scale = _pick_pivots(nodes, n, k_pivots)
    graph_ref = ray.put((n, src, dst))

    chunks = [
        sources[i : i + PIVOT_CHUNK] for i in range(0, len(sources), PIVOT_CHUNK)
    ]
    pivot_ds = ray.data.from_items(
        [{"chunk_id": i, "pivots": c.tolist()} for i, c in enumerate(chunks)]
    )

    def run_chunk(t: pa.Table, gref=None, knames=tuple(kernels)) -> pa.Table:
        n_, src_, dst_ = ray.get(gref)
        out: dict[str, list] = {"chunk_id": [], "node": []}
        for k in knames:
            out[k] = []
        for cid, piv in zip(
            t.column("chunk_id").to_pylist(), t.column("pivots").to_pylist()
        ):
            piv = np.asarray(piv, np.int64)
            vals: dict[str, np.ndarray] = {}
            if "betweenness" in knames:
                harm = np.zeros(n_, np.float64) if "harmonic" in knames else None
                vals["betweenness"] = _brandes_from_sources(
                    n_, src_, dst_, piv, harm_out=harm
                )
                if harm is not None:
                    vals["harmonic"] = harm
            else:
                vals["harmonic"] = _harmonic_from_sources(n_, src_, dst_, piv)
            out["chunk_id"].append(np.full(n_, cid, np.int64))
            out["node"].append(np.arange(n_, dtype=np.int64))
            for k in knames:
                out[k].append(vals[k])
        return pa.table(
            {
                "chunk_id": pa.array(np.concatenate(out["chunk_id"]), pa.int64()),
                "node": pa.array(np.concatenate(out["node"]), pa.int64()),
                **{
                    k: pa.array(np.concatenate(out[k]), pa.float64())
                    for k in knames
                },
            }
        )

    parts = gather_table(
        pivot_ds.map_batches(
            run_chunk, fn_kwargs={"gref": graph_ref}, batch_format="pyarrow"
        ).materialize()
    )
    # deterministic vectorized combine: rows sort by (chunk_id, node), so
    # each kernel column reshapes to (n_chunks, n) and sums in chunk order
    cid = parts.column("chunk_id").to_numpy(zero_copy_only=False)
    node = parts.column("node").to_numpy(zero_copy_only=False)
    order = np.lexsort((node, cid))
    n_chunks = len(chunks)
    cols: dict[str, pa.Array] = {}
    for k in kernels:
        v = parts.column(k).to_numpy(zero_copy_only=False)[order]
        total = v.reshape(n_chunks, n).sum(axis=0) * (scale * _KERNEL_NORM[k])
        cols[k] = pa.array(total, pa.float64())
    out = pa.table({"s_suppkey": pa.array(nodes, pa.int64()), **cols})
    return _zero_fill(out, full_nodes, kernels) if full_nodes is not None else out


def _zero_fill(tbl: pa.Table, full_nodes: np.ndarray, kernels: list[str]) -> pa.Table:
    """Reindex a centrality table onto the FULL node universe: nodes with
    no row (every incident edge sampled out) get 0.0 for each kernel.
    Both node arrays come from np.unique, so they are sorted."""
    have = tbl.column("s_suppkey").to_numpy(zero_copy_only=False)
    pos = np.searchsorted(have, full_nodes)
    safe = np.minimum(pos, max(len(have) - 1, 0))
    present = (
        (pos < len(have)) & (have[safe] == full_nodes)
        if len(have)
        else np.zeros(len(full_nodes), bool)
    )
    cols = {}
    for k in kernels:
        v = tbl.column(k).to_numpy(zero_copy_only=False)
        out = np.zeros(len(full_nodes), np.float64)
        out[present] = v[pos[present]]
        cols[k] = pa.array(out, pa.float64())
    return pa.table({"s_suppkey": pa.array(full_nodes, pa.int64()), **cols})


def betweenness_distributed(
    edges_packed: np.ndarray,
    k_pivots: int | None = None,
    on_over_budget: str = "raise",
) -> pa.Table:
    return _centrality_distributed(
        edges_packed, ["betweenness"], k_pivots, on_over_budget=on_over_budget
    )


def harmonic_distributed(
    edges_packed: np.ndarray,
    k_pivots: int | None = None,
    on_over_budget: str = "raise",
) -> pa.Table:
    return _centrality_distributed(
        edges_packed, ["harmonic"], k_pivots, on_over_budget=on_over_budget
    )


def q_graph_centrality(
    sf_dir: str, k_pivots: int | None = None, on_over_budget: str = "raise"
):
    """Driver entry: betweenness + harmonic centrality over the
    co-supplier graph in one row per node (rows-only — shortest-path
    dependency sums are floats and not SQL-hash-matchable; gated by
    networkx-parity, pivot-consistency and driver==distributed pytests).
    ONE pivot fan-out computes both kernels against one broadcast of the
    edge arrays (harmonic rides the Brandes BFS distances). The broadcast
    budget is gated BEFORE the driver pull — gather_table's contract says
    the caller owns the size gate. With ``on_over_budget="sample"`` an
    over-budget edge set is hash-THRESHOLD-filtered inside the scan tasks
    (the driver pull itself stays bounded — a slightly generous cutoff
    keeps a superset of the final sample w.o.p.) and then trimmed to
    exactly the budget by ``sample_packed_edges``; smallest-hash
    membership composes, so the two steps equal a pure driver-side sample
    of the full edge set. The row universe stays the FULL graph's nodes
    (one distinct exchange + an output-sized pull); nodes that lost every
    incident edge score 0.0."""
    from pie_ray.functions.graphops import EDGE_SCHEMA, cooccurrence_edges
    from pie_ray.util import gather_table

    edges = cooccurrence_edges(sf_dir).materialize()
    m = edges.count()
    full_nodes = None
    if 2 * m > EDGE_BROADCAST_LIMIT:
        if on_over_budget != "sample":
            raise NotImplementedError(
                "centrality beyond the edge-broadcast budget needs a "
                "partitioned multi-source BFS (declared seam) — pass "
                "on_over_budget='sample' for a deterministic edge-sample "
                "estimate (logged accuracy note)"
            )
        import logging

        # full node universe before sampling (the result is node-sized
        # anyway, so this pull is output-sized; per-batch unique first)
        def node_ids(t: pa.Table) -> pa.Table:
            e = t.column("e").to_numpy(zero_copy_only=False).astype(np.int64)
            u = np.unique(np.concatenate([e // PACK, e % PACK]))
            return pa.table({"node": pa.array(u, pa.int64())})

        full_nodes = np.unique(
            np.asarray(
                edges.map_batches(node_ids, batch_format="pyarrow").unique("node"),
                dtype=np.int64,
            )
        )
        target = EDGE_BROADCAST_LIMIT // 2
        logging.getLogger(__name__).warning(
            "betweenness/harmonic: %d edges exceed the broadcast budget; "
            "estimating on a deterministic %.1f%% edge sample (%d of %d "
            "edges) — scores bias low for paths crossing dropped edges; "
            "nodes that lost every incident edge score 0.0 (degraded "
            "mode).",
            m,
            100.0 * target / m,
            target,
            m,
        )
        # generous cutoff: P(kept < target) < 1e-8 at 6-sigma + 16 slack,
        # so the driver-side exact trim sees a superset of the final set
        frac = min(1.0, (target + 6.0 * np.sqrt(target) + 16.0) / m)
        cutoff = np.uint64(min(int(frac * 2.0**64), 2**64 - 1))

        def presample(t: pa.Table) -> pa.Table:
            e = t.column("e").to_numpy(zero_copy_only=False)
            keep = hash64_ints(e.astype(np.uint64), salt=EDGE_SAMPLE_SALT) < cutoff
            return t.filter(pa.array(keep))

        edges = edges.map_batches(presample, batch_format="pyarrow").materialize()
    tbl = gather_table(edges, schema=EDGE_SCHEMA)
    packed = tbl.column("e").to_numpy(zero_copy_only=False)
    if full_nodes is not None:
        # trim to exactly the budget ON the driver (true fraction already
        # logged above; the under-budget array keeps the inner gate quiet)
        packed, _ = sample_packed_edges(packed, EDGE_BROADCAST_LIMIT // 2)
    out = _centrality_distributed(
        packed, ["betweenness", "harmonic"], k_pivots, on_over_budget=on_over_budget
    )
    if full_nodes is not None:
        out = _zero_fill(out, full_nodes, ["betweenness", "harmonic"])
    return ray.data.from_arrow(out)
