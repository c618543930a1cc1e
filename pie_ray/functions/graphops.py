"""Generic graph analytics over a relationally-derived co-occurrence graph
(SURVEY.md §2 depth beyond the KG-specific edge aggregation in
pie_ray/stages/graph.py): triangle counting and k-core decomposition.

Graph definition (deterministic, derived from the TPC-H-ish testdata — no
external data): nodes are suppliers; an undirected edge (a, b) exists when
suppliers a and b both ship a high-quantity lineitem (l_quantity >
``TRI_QTY_THRESHOLD``) inside the same order. The same shape arises in
training-data pipelines as document co-citation / co-click / shared-host
graphs, so the operators are written against a generic edge Dataset.

Scale design:
- pair generation needs all rows of one order co-located: ONE bounded
  bucketed shuffle on hash(orderkey) % 64 (the repo's standard alternative
  to a high-cardinality Ray groupby), then fully vectorized per-bucket
  numpy pair expansion grouped by order size (sizes are tiny and few, so
  the loop is over DISTINCT sizes, never rows);
- edge distinct = local unique per batch (combiner) + one bounded bucketed
  shuffle on hash(packed edge) % 64;
- triangle counting is size-adaptive like connected components
  (pie_ray/stages/linking.py): below ``DRIVER_EDGE_LIMIT`` packed edges
  (int64, i.e. <=16 MB at the limit) the exact vectorized wedge-check runs
  on the driver; above it, the degree-oriented two-hash-join path runs
  distributed (wedge join + closing-edge join, each a bounded Dataset.join
  keyed by node / packed edge). Degree orientation (each edge directed
  low-(deg,id) -> high-(deg,id)) bounds per-node wedge fan-out by
  O(sqrt(m)) regardless of skew — the standard mitigation for hub nodes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pie_ray.util import bucket_count, gather_table, hash64_ints, join_num_partitions

TRI_QTY_THRESHOLD = 46.0
N_BUCKETS = 64
DRIVER_EDGE_LIMIT = 2_000_000
PACK = np.int64(1) << np.int64(32)
EDGE_SCHEMA = pa.schema([("e", pa.int64())])


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a.astype(np.int64) * PACK + b.astype(np.int64)


def _split_directed(t: pa.Table) -> pa.Table:
    """Unpack packed edges (column ``e`` = src * 2^32 + dst) into one
    (src, dst) row each — the shared edge adapter for directed entries."""
    e = t.column("e").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "src": pa.array((e // PACK).astype(np.int64), pa.int64()),
            "dst": pa.array((e % PACK).astype(np.int64), pa.int64()),
        }
    )

def _split_undirected(t: pa.Table) -> pa.Table:
    """Unpack packed {a < b} edges (column ``e``) into BOTH directions
    (src, dst) — the shared edge adapter for entries that treat the
    co-supplier graph as undirected."""
    e = t.column("e").to_numpy(zero_copy_only=False)
    a = (e // PACK).astype(np.int64)
    b = (e % PACK).astype(np.int64)
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        }
    )



def _pairs_by_size(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All unordered within-group value pairs of a (group-sorted) key/value
    pair of arrays, vectorized by grouping the groups by SIZE: one fancy-
    indexed triu expansion per distinct group size (sizes here are members
    per order, single digits — the loop runs a handful of times total)."""
    _, a, b = _keyed_pairs_by_size(keys, vals)
    return a, b


def _cosupply_edge_pipeline(
    sf_dir: str,
    threshold: float,
    pair_fn,
    override_num_blocks: int | None = None,
    edge_salt: int = 0x51C7,
) -> "ray.data.Dataset":
    """Shared two-exchange scaffold for packed-edge construction from
    high-quantity lineitems: order-bucketed pair generation (``pair_fn``
    turns one group's sorted (order, supplier) arrays into packed edges)
    with a per-group combiner, then one edge-bucketed distinct exchange,
    empty-block-normalized at the source."""
    raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"],
        override_num_blocks=override_num_blocks,
    )
    # size-derived bucket count (read metadata, O(1) — BEFORE the filter,
    # whose plan would execute on size_bytes); floor = the measured-good
    # sandbox constant
    nb = bucket_count(raw.size_bytes(), floor=N_BUCKETS)
    li = raw.filter(expr=f"l_quantity > {threshold}")

    def order_bucket(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        b = (hash64_ints(ok, salt=0x7219) % nb).astype(np.int32)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # distinct (order, supplier), group-sorted, then size-vectorized pairs
        su = g.group_by(["l_orderkey", "l_suppkey"]).aggregate([])
        su = su.sort_by([("l_orderkey", "ascending"), ("l_suppkey", "ascending")])
        ok = su.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = su.column("l_suppkey").to_numpy(zero_copy_only=False)
        e = np.unique(pair_fn(ok, sk))  # local combiner before the shuffle
        return pa.table({"e": pa.array(e, pa.int64())})

    pairs = (
        li.map_batches(order_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    def edge_bucket(t: pa.Table) -> pa.Table:
        e = np.unique(t.column("e").to_numpy(zero_copy_only=False))
        b = (hash64_ints(e, salt=edge_salt) % nb).astype(np.int32)
        return pa.table({"e": pa.array(e, pa.int64()), "bucket": pa.array(b, pa.int32())})

    def edge_unique(g: pa.Table) -> pa.Table:
        e = np.unique(g.column("e").to_numpy(zero_copy_only=False))
        return pa.table({"e": pa.array(e, pa.int64())})

    out = (
        pairs.map_batches(edge_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(edge_unique, batch_format="pyarrow")
    )
    # normalize at the SOURCE: the groupby emits zero-row empty-schema
    # blocks under some layouts; every consumer (driver gather, joins in
    # the distributed triangle/k-core paths) must never see them
    from pie_ray.util import drop_empty_blocks

    return drop_empty_blocks(out.materialize(), schema=EDGE_SCHEMA)


def _undirected_pair_edges(ok: np.ndarray, sk: np.ndarray) -> np.ndarray:
    a, b = _pairs_by_size(ok, sk)
    return _pack(a, b)


def cooccurrence_edges(
    sf_dir: str, override_num_blocks: int | None = None
) -> "ray.data.Dataset":
    """Distinct undirected co-supplier edges {a < b} (packed in column
    ``e`` = a * 2^32 + b) from high-quantity lineitems.
    ``override_num_blocks`` exists for the partitioning-independence test
    only — the result is a pure function of the data."""
    return _cosupply_edge_pipeline(
        sf_dir,
        TRI_QTY_THRESHOLD,
        _undirected_pair_edges,
        override_num_blocks=override_num_blocks,
    )


def _oriented_csr(edges_packed: np.ndarray):
    """Renumber nodes and orient each edge from the lower-(degree, id)
    endpoint to the higher one; returns (node ids, oriented u, oriented v)
    with u/v as dense indices sorted by (u, rank_v)."""
    a = (edges_packed // PACK).astype(np.int64)
    b = (edges_packed % PACK).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    deg = np.bincount(ai, minlength=len(nodes)) + np.bincount(bi, minlength=len(nodes))
    # total order: (degree, dense id) — unique per node, skew-safe
    rank = deg.astype(np.int64) * np.int64(len(nodes)) + np.arange(len(nodes))
    swap = rank[ai] > rank[bi]
    u = np.where(swap, bi, ai)
    v = np.where(swap, ai, bi)
    order = np.lexsort((rank[v], u))
    return nodes, u[order], v[order]


def triangles_per_node_driver(edges_packed: np.ndarray) -> pa.Table:
    """Exact per-node triangle counts, fully vectorized: degree-oriented
    wedges (same size-grouped triu expansion as pair generation, keyed by
    out-degree) checked against the oriented edge set with one sorted
    membership probe. Nodes in zero triangles are omitted (matches the
    oracle's GROUP BY over enumerated triangles)."""
    nodes, u, v = _oriented_csr(edges_packed)
    n = len(nodes)
    # wedges: per apex u, all pairs (x, y) of out-neighbours (rank-sorted,
    # so x precedes y in orientation order)
    apex, x, y = _wedge_pairs(u, v)
    probe = x.astype(np.int64) * np.int64(n) + y.astype(np.int64)
    eset = np.sort(u.astype(np.int64) * np.int64(n) + v.astype(np.int64))
    if len(eset) == 0 or len(probe) == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())}
        )
    pos = np.minimum(np.searchsorted(eset, probe), len(eset) - 1)
    hits = eset[pos] == probe
    tri_nodes = np.concatenate([apex[hits], x[hits], y[hits]])
    cnt = np.bincount(tri_nodes, minlength=n)
    keep = cnt > 0
    return pa.table(
        {
            "s_suppkey": pa.array(nodes[keep], pa.int64()),
            "n_triangles": pa.array(cnt[keep].astype(np.int64), pa.int64()),
        }
    )


def _wedge_pairs(u: np.ndarray, v: np.ndarray):
    """Out-neighbour pairs per apex: returns (apex, first, second) arrays
    via the size-grouped triu expansion. Wedge order (first, second)
    follows the rank order v was sorted in, which is exactly the edge
    orientation order."""
    _, starts, counts = np.unique(u, return_index=True, return_counts=True)
    apexes: list[np.ndarray] = []
    firsts: list[np.ndarray] = []
    seconds: list[np.ndarray] = []
    apex_vals = u[starts]
    for k in np.unique(counts):
        if k < 2:
            continue
        sel = counts == k
        st = starts[sel]
        mat = v[st[:, None] + np.arange(k)[None, :]]  # rank-ordered already
        iu, ju = np.triu_indices(int(k), 1)
        m = len(st)
        apexes.append(np.repeat(apex_vals[sel], len(iu)))
        firsts.append(mat[:, iu].ravel())
        seconds.append(mat[:, ju].ravel())
    if not apexes:
        z = np.empty(0, np.int64)
        return z, z, z
    return np.concatenate(apexes), np.concatenate(firsts), np.concatenate(seconds)


# Past this many nodes the (nodes, ranks) ray.put broadcast (~16 B/node)
# stops being safe; the rank attach switches to two hash joins against the
# degree Dataset with the enumeration-free order rank = deg * 2^32 + node.
NODE_BROADCAST_LIMIT = 20_000_000


def triangles_per_node_distributed(
    edges: "ray.data.Dataset", rank_attach: str = "auto"
) -> "ray.data.Dataset":
    """Distributed per-node triangle counts: degree table (bucketed count)
    -> rank attach -> oriented edges -> wedge self-join on the apex ->
    closing-edge hash join on the packed (v, w) key -> bucketed per-node
    count. Each exchange is a bounded Dataset.join / bucketed groupby;
    .materialize() barriers keep the two joins out of one streaming plan
    (the repo-wide one-exchange-per-plan rule — concurrent all-to-alls
    deadlock-starve each other's aggregator actors on few CPUs; see
    docs/SCALE.md).

    Rank attach is size-adaptive (``rank_attach``: auto | broadcast |
    join): under NODE_BROADCAST_LIMIT nodes the sorted (nodes, ranks)
    arrays ride one ray.put; above it the degrees stay a DATASET and each
    edge picks up (deg_a, deg_b) via two hash joins, orienting by the
    enumeration-free total order rank = deg * 2^32 + node_id (unique
    because node ids are; triangle counts are orientation-invariant, so
    both orders give identical results — equivalence-tested)."""
    import ray

    def split(t: pa.Table) -> pa.Table:
        e = t.column("e").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array((e // PACK).astype(np.int64), pa.int64()),
                "b": pa.array((e % PACK).astype(np.int64), pa.int64()),
            }
        )

    ab = edges.map_batches(split, batch_format="pyarrow").materialize()
    nb = bucket_count(ab.size_bytes(), floor=N_BUCKETS)

    def node_partial(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        ids, cnts = np.unique(ids, return_counts=True)
        b = (hash64_ints(ids, salt=0x0DE6) % nb).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "deg": pa.array(cnts.astype(np.int64), pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def node_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("deg", "sum")])
        return rename_grouped(gb, ["node"], ["node", "deg"])

    from pie_ray.util import drop_empty_blocks

    deg_ds = drop_empty_blocks(
        ab.map_batches(node_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(node_combine, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
    ).materialize()
    n_nodes = deg_ds.count()
    use_join = rank_attach == "join" or (
        rank_attach == "auto" and n_nodes > NODE_BROADCAST_LIMIT
    )

    if not use_join:
        deg_tbl = gather_table(
            deg_ds, schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())])
        )
        nodes = deg_tbl.column("node").to_numpy(zero_copy_only=False)
        deg = deg_tbl.column("deg").to_numpy(zero_copy_only=False)
        order = np.argsort(nodes)
        nodes_sorted = nodes[order]
        rank = deg[order].astype(np.int64) * np.int64(len(nodes)) + np.arange(len(nodes))
        rank_ref = ray.put((nodes_sorted, rank))

        def orient(t: pa.Table, ref=rank_ref) -> pa.Table:
            ns, rk = ray.get(ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            ra = rk[np.searchsorted(ns, a)]
            rb = rk[np.searchsorted(ns, b)]
            swap = ra > rb
            u = np.where(swap, b, a)
            w = np.where(swap, a, b)
            ru = np.where(swap, rb, ra)
            rw = np.where(swap, ra, rb)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(w, pa.int64()),
                    "ru": pa.array(ru, pa.int64()),
                    "rv": pa.array(rw, pa.int64()),
                }
            )

        oriented = ab.map_batches(orient, batch_format="pyarrow").materialize()
    else:
        # join path: edges pick up both endpoint degrees via two hash
        # joins (barriered), then orient by rank = deg * 2^32 + node
        jp = join_num_partitions(ab.size_bytes())
        j1 = ab.join(
            deg_ds,
            join_type="inner",
            num_partitions=jp,
            on=("a",),
            right_on=("node",),
        )
        j1 = j1.map_batches(
            lambda t: pa.table(
                {"a": t.column("a"), "b": t.column("b"), "deg_a": t.column("deg")}
            ),
            batch_format="pyarrow",
        ).materialize()
        j2 = j1.join(
            deg_ds,
            join_type="inner",
            num_partitions=jp,
            on=("b",),
            right_on=("node",),
        )

        def orient_join(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            ra = t.column("deg_a").to_numpy(zero_copy_only=False) * PACK + a
            rb = t.column("deg").to_numpy(zero_copy_only=False) * PACK + b
            swap = ra > rb
            u = np.where(swap, b, a)
            w = np.where(swap, a, b)
            ru = np.where(swap, rb, ra)
            rw = np.where(swap, ra, rb)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(w, pa.int64()),
                    "ru": pa.array(ru, pa.int64()),
                    "rv": pa.array(rw, pa.int64()),
                }
            )

        oriented = j2.map_batches(orient_join, batch_format="pyarrow").materialize()
    n_parts = join_num_partitions(oriented.size_bytes())
    # wedge join: out-edges paired on the shared apex
    wedges = oriented.join(
        oriented.map_batches(
            lambda t: t.rename_columns(["u2", "w", "ru2", "rw"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=n_parts,
        on=("u",),
        right_on=("u2",),
    )

    def wedge_filter(t: pa.Table) -> pa.Table:
        # keep each out-neighbour pair once, orientation-ordered: rv < rw
        keep = pc.less(t.column("rv"), t.column("rw"))
        t = t.filter(keep)
        v = t.column("v").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "apex": t.column("u"),
                "v": t.column("v"),
                "w": t.column("w"),
                "vw": pa.array(_pack(v, w), pa.int64()),
            }
        )

    wedges = wedges.map_batches(wedge_filter, batch_format="pyarrow").materialize()

    def closing_key(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"uv": pa.array(_pack(u, v), pa.int64())})

    closing = oriented.map_batches(closing_key, batch_format="pyarrow")
    tri = wedges.join(
        closing,
        join_type="inner",
        num_partitions=join_num_partitions(wedges.size_bytes()),
        on=("vw",),
        right_on=("uv",),
    ).materialize()

    def tri_nodes(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                t.column("apex").to_numpy(zero_copy_only=False),
                t.column("v").to_numpy(zero_copy_only=False),
                t.column("w").to_numpy(zero_copy_only=False),
            ]
        )
        ids, cnts = np.unique(ids, return_counts=True)
        b = (hash64_ints(ids, salt=0x791) % nb).astype(np.int32)
        return pa.table(
            {
                "s_suppkey": pa.array(ids, pa.int64()),
                "n_triangles": pa.array(cnts.astype(np.int64), pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def tri_combine(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["s_suppkey"])
            .aggregate([("n_triangles", "sum")])
        )
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, ["s_suppkey"], ["s_suppkey", "n_triangles"])

    return (
        tri.map_batches(tri_nodes, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(tri_combine, batch_format="pyarrow")
    )


def q_graph_triangles(sf_dir: str):
    """Per-node triangle counts on the co-supplier graph (size-adaptive:
    driver wedge-check under DRIVER_EDGE_LIMIT edges, degree-oriented
    double hash join above — equivalence-tested). The driver pull goes
    through ``gather_table`` — Ray emits zero-row empty-schema blocks under
    some layouts and a bare ``pa.concat_tables`` crashes on the mix (the
    round-3 driver red row at sf0.01/32 cpus)."""
    edges = cooccurrence_edges(sf_dir).materialize()
    if edges.count() <= DRIVER_EDGE_LIMIT:
        tbl = gather_table(edges, schema=EDGE_SCHEMA)
        packed = tbl.column("e").to_numpy(zero_copy_only=False)
        return triangles_per_node_driver(packed)
    return triangles_per_node_distributed(edges)


# ---------------------------------------------------------------------------
# k-core decomposition
# ---------------------------------------------------------------------------


def core_numbers(edges_packed: np.ndarray) -> pa.Table:
    """Exact core number per node (the largest k such that the node
    survives in the k-core) by iterative peeling: repeatedly remove all
    nodes of minimum remaining degree. Runs on a bounded driver pull like
    the small side of connected components; the distributed variant is the
    same peel as rounds of degree-filtered edge subsets (one bucketed
    degree count + filter per round) — the per-round primitive is exactly
    ``node_partial``/``node_combine`` above."""
    a = (edges_packed // PACK).astype(np.int64)
    b = (edges_packed % PACK).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    n = len(nodes)
    deg = (np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)).astype(np.int64)
    core = np.zeros(n, np.int64)
    alive_edge = np.ones(len(ai), bool)
    alive_node = np.ones(n, bool)
    k = 0
    while alive_node.any():
        k = max(k, int(deg[alive_node].min()))
        while True:
            peel = alive_node & (deg <= k)
            if not peel.any():
                break
            core[peel] = k
            alive_node &= ~peel
            dead = alive_edge & (peel[ai] | peel[bi])
            deg -= np.bincount(ai[dead], minlength=n)
            deg -= np.bincount(bi[dead], minlength=n)
            alive_edge &= ~dead
    return pa.table(
        {
            "s_suppkey": pa.array(nodes, pa.int64()),
            "core": pa.array(core, pa.int64()),
        }
    )


def core_numbers_distributed(edges: "ray.data.Dataset", max_rounds: int = 200):
    """Distributed core numbers via the locality / H-index algorithm
    (Montresor, De Pellegrini & Miorandi, "Distributed k-Core
    Decomposition", IEEE TPDS 2013 — public): initialize est(v) = deg(v),
    then repeat est(v) = min(est(v), H({est(u) : u ∈ N(v)})) where H is the
    h-index (the largest h with at least h neighbour estimates ≥ h). The
    sequence is monotone non-increasing and converges exactly to the core
    numbers. Each round is ONE hash join (attach neighbour estimates to
    directed edges) + one bounded bucketed groupby (per-node H-index,
    vectorized: within a (node, est-desc)-sorted bucket the h-index is the
    per-group count of positions with value ≥ position+1) + one join back
    onto the estimate table for the min; ``.materialize()`` barriers keep
    the exchanges out of one streaming plan (repo rule). Returns a Dataset
    ``(s_suppkey, core)``; equivalence vs the driver peel is pytest-gated."""

    directed = edges.map_batches(_split_undirected, batch_format="pyarrow").materialize()
    n_parts = join_num_partitions(directed.size_bytes())
    nb = bucket_count(directed.size_bytes(), floor=N_BUCKETS)

    def deg_partial(t: pa.Table) -> pa.Table:
        ids, cnts = np.unique(
            t.column("src").to_numpy(zero_copy_only=False), return_counts=True
        )
        b = (hash64_ints(ids, salt=0xC03E) % nb).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "est": pa.array(cnts.astype(np.int64), pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def deg_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("est", "sum")])
        return rename_grouped(gb, ["node"], ["node", "est"])

    from pie_ray.util import drop_empty_blocks

    _EST_SCHEMA = pa.schema([("node", pa.int64()), ("est", pa.int64())])
    est = drop_empty_blocks(
        directed.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(deg_combine, batch_format="pyarrow")
        .materialize(),
        schema=_EST_SCHEMA,
    ).materialize()

    def hindex_partial(t: pa.Table) -> pa.Table:
        # bucket by src so each node's neighbour-estimate multiset co-locates
        src = t.column("src").to_numpy(zero_copy_only=False)
        b = (hash64_ints(src, salt=0x4C0) % nb).astype(np.int32)
        return pa.table(
            {
                "src": t.column("src"),
                "nbr_est": t.column("est"),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def hindex_bucket(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        val = g.column("nbr_est").to_numpy(zero_copy_only=False)
        # sort by (src asc, est desc); within a group the h-index is the
        # count of positions i (0-based) with value >= i+1 (prefix property:
        # values decrease while i+1 increases)
        order = np.lexsort((-val, src))
        src, val = src[order], val[order]
        nodes, starts = np.unique(src, return_index=True)
        pos = np.arange(len(src)) - np.repeat(starts, np.diff(np.append(starts, len(src))))
        ok = val >= (pos + 1)
        grp = np.repeat(np.arange(len(nodes)), np.diff(np.append(starts, len(src))))
        h = np.bincount(grp[ok], minlength=len(nodes)).astype(np.int64)
        return pa.table(
            {"node": pa.array(nodes, pa.int64()), "h": pa.array(h, pa.int64())}
        )

    for _ in range(max_rounds):
        nbr = directed.join(
            est,
            join_type="inner",
            num_partitions=n_parts,
            on=("dst",),
            right_on=("node",),
        ).materialize()
        h_tbl = drop_empty_blocks(
            nbr.map_batches(hindex_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(hindex_bucket, batch_format="pyarrow")
            .materialize(),
            schema=pa.schema([("node", pa.int64()), ("h", pa.int64())]),
        ).materialize()
        new_est = (
            est.join(
                h_tbl,
                join_type="inner",  # every node has >=1 neighbour, so H covers all
                num_partitions=join_num_partitions(est.size_bytes()),
                on=("node",),
                right_on=("node",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "est": pc.min_element_wise(t.column("est"), t.column("h")),
                        "old_est": t.column("est"),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        changed = new_est.filter(expr="est < old_est").count()
        est = drop_empty_blocks(
            new_est.drop_columns(["old_est"]).materialize(), schema=_EST_SCHEMA
        ).materialize()
        if changed == 0:
            break

    return est.map_batches(
        lambda t: pa.table({"s_suppkey": t.column("node"), "core": t.column("est")}),
        batch_format="pyarrow",
    )


def q_kcore(sf_dir: str):
    """Core numbers over the co-supplier graph (library surface; gated by
    a brute-force-equivalence pytest, not a SQL oracle — peeling is
    iterative and not SQL-expressible). Size-adaptive like triangles: the
    exact driver peel under DRIVER_EDGE_LIMIT edges (empty-block-safe
    gather), the distributed H-index algorithm above it."""
    edges = cooccurrence_edges(sf_dir).materialize()
    if edges.count() <= DRIVER_EDGE_LIMIT:
        tbl = gather_table(edges, schema=EDGE_SCHEMA)
        return core_numbers(tbl.column("e").to_numpy(zero_copy_only=False))
    return core_numbers_distributed(edges)


# ------------------------------------------------------ integer-exact PageRank

PR_SCALE = 1_000_000_000  # rank fixed-point scale (int64-safe: see docstring)
PR_ITERS = 10
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def pagerank_integer_driver(
    edges_packed: np.ndarray,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> pa.Table:
    """Integer-exact PageRank: ranks are int64 fixed-point (``scale`` = one
    unit of mass), the update is r'(v) = floor(scale*15/100) +
    floor(85 * sum_{u in N(v)} floor(r(u)/deg(u)) / 100) for a fixed number
    of synchronous iterations. Every operation is integer, so the result is
    bit-identical regardless of summation order — which makes PageRank
    SQL-ORACLE-ABLE (float power iteration never hash-matches across
    engines because float sums reorder). Overflow bound: a node's rank is
    at most 0.15*scale + 0.85*indeg*scale; with scale=1e9 that stays well
    inside int64 up to ~1e8-degree hubs.

    Undirected input (packed ``e`` = a*2^32+b): each edge contributes in
    both directions. Driver path, fully vectorized (np.add.at accumulate —
    NOT bincount-with-weights, which casts to float64 and loses exactness
    past 2^53)."""
    a = (edges_packed // PACK).astype(np.int64)
    b = (edges_packed % PACK).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    n = len(nodes)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    deg = np.bincount(src, minlength=n).astype(np.int64)
    r = np.full(n, scale, np.int64)
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    for _ in range(iters):
        contrib = r // deg
        acc = np.zeros(n, np.int64)
        np.add.at(acc, dst, contrib[src])
        r = base + PR_DAMP_NUM * acc // PR_DAMP_DEN
    return pa.table(
        {
            "s_suppkey": pa.array(nodes, pa.int64()),
            "rank_scaled": pa.array(r, pa.int64()),
        }
    )


def pagerank_integer_distributed(
    edges: "ray.data.Dataset",
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
):
    """Distributed twin of ``pagerank_integer_driver`` — integer math makes
    the two paths AGREE BIT-FOR-BIT (equivalence-tested), unlike float
    PageRank where partial-sum order would differ. Symmetrizes the packed
    undirected edges, then runs the generic directed-weighted core (every
    weight 1 — the weighted update w*(r//W) with W = degree-count reduces
    to the original r//deg exactly)."""

    def split_both(t: pa.Table) -> pa.Table:
        e = t.column("e").to_numpy(zero_copy_only=False)
        a = (e // PACK).astype(np.int64)
        b = (e % PACK).astype(np.int64)
        n2 = 2 * len(e)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "w": pa.array(np.ones(n2, np.int64), pa.int64()),
            }
        )

    directed = edges.map_batches(split_both, batch_format="pyarrow").materialize()
    out = pagerank_directed_distributed(
        directed, iters=iters, scale=scale, add_dangling_self_loops=False
    )
    return out.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("node"), "rank_scaled": t.column("rank_scaled")}
        ),
        batch_format="pyarrow",
    )


def pagerank_integer_directed_driver(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray | None = None,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> pa.Table:
    """Directed weighted integer-exact PageRank on the driver. The update
    is r'(v) = base + floor(85 * sum_{(u,v,w)} w * floor(r(u) / W(u)) /
    100) with W(u) = total out-WEIGHT of u. Dangling nodes (out-weight 0)
    get a weight-1 self-loop — deterministic mass retention, identical in
    the distributed twin. Returns (node, rank_scaled); node ids are the
    caller's int64 ids (NOT packed — no 2^32 bound)."""
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    w = np.ones(len(src), np.int64) if w is None else w.astype(np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src) :]
    n = len(nodes)
    outw = np.zeros(n, np.int64)
    np.add.at(outw, si, w)
    dangling = np.flatnonzero(outw == 0)
    if len(dangling):
        si = np.concatenate([si, dangling])
        di = np.concatenate([di, dangling])
        w = np.concatenate([w, np.ones(len(dangling), np.int64)])
        outw[dangling] = 1
    r = np.full(n, scale, np.int64)
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    for _ in range(iters):
        contrib = w * (r // outw)[si]
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        r = base + PR_DAMP_NUM * acc // PR_DAMP_DEN
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank_scaled": pa.array(r, pa.int64()),
        }
    )


def pagerank_directed_distributed(
    directed: "ray.data.Dataset",
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    add_dangling_self_loops: bool = True,
    seed_pred=None,
):
    """Generic distributed integer PageRank core over a directed weighted
    edge Dataset (columns src, dst, w — int64). Per iteration: one hash
    join (edge picks up the source's (rank, out-weight)) + one bounded
    bucketed groupby (sum of contributions per destination) + one LEFT
    join back onto the node table (a node with no in-edges still exists:
    its acc coalesces to 0 — for symmetrized input every node has
    in-edges, so this is bit-identical to the historical inner join);
    ``.materialize()`` barriers between exchanges (repo rule).

    ``add_dangling_self_loops``: append a weight-1 self-loop for every
    node with zero out-weight (general directed graphs — matches the
    driver twin bit-for-bit). Symmetrized callers skip the extra pass.

    ``seed_pred`` turns the uniform teleport into a SEEDED one (TrustRank,
    Gyongyi et al. 2004): a vectorized numpy predicate (int64 ids -> bool
    mask) marking trusted nodes. Seeds start at and keep the teleport base;
    every other node starts at 0 and only earns rank through in-links from
    seed-reachable mass — link farms with no trusted in-path stay at
    exactly 0. A PREDICATE (not a node list) keeps the distributed path
    stateless: seed membership is recomputed per batch, no driver-held or
    broadcast seed set, so rule-defined seeds cost nothing at any scale
    (curated seed LISTS are small by TrustRank's premise — wrap them in
    ``np.isin`` to use here). Returns a Dataset (node, rank_scaled)."""
    from pie_ray.util import drop_empty_blocks

    directed = directed.materialize()
    n_parts = join_num_partitions(directed.size_bytes())
    nb = bucket_count(directed.size_bytes(), floor=N_BUCKETS)

    def deg_partial(t: pa.Table) -> pa.Table:
        # out-WEIGHT per node over the FULL universe: dst-side nodes ride
        # along with weight 0, so pure sinks appear with deg 0 (dangling)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        wv = t.column("w").to_numpy(zero_copy_only=False)
        ids_all = np.concatenate([s, d])
        wts = np.concatenate([wv, np.zeros(len(d), np.int64)])
        ids, idx = np.unique(ids_all, return_inverse=True)
        acc = np.zeros(len(ids), np.int64)
        np.add.at(acc, idx, wts)
        b = (hash64_ints(ids, salt=0x9A6E) % nb).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "deg": pa.array(acc, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def deg_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("deg", "sum")])
        return rename_grouped(gb, ["node"], ["node", "deg"])

    _DEG_SCHEMA = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    deg_ds = drop_empty_blocks(
        directed.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(deg_combine, batch_format="pyarrow")
        .materialize(),
        schema=_DEG_SCHEMA,
    ).materialize()

    if add_dangling_self_loops:
        loops = deg_ds.filter(expr="deg == 0").map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("node"),
                    "dst": t.column("node"),
                    "w": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        if loops.count() > 0:
            directed = directed.union(loops).materialize()
        deg_ds = deg_ds.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "deg": pc.max_element_wise(
                        t.column("deg"), pa.scalar(1, pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN

    def init_r(t: pa.Table) -> pa.Table:
        if seed_pred is None:
            r0 = np.full(t.num_rows, scale, np.int64)
        else:
            ids = t.column("node").to_numpy(zero_copy_only=False)
            r0 = np.where(seed_pred(ids), base, 0).astype(np.int64)
        return pa.table(
            {
                "node": t.column("node"),
                "r": pa.array(r0, pa.int64()),
                "deg": t.column("deg"),
            }
        )

    # state carried per node: (node, r, deg) — avoids a deg re-join on the
    # contribution side; only the new-rank side joins deg each round
    state = deg_ds.map_batches(init_r, batch_format="pyarrow").materialize()
    _ACC_SCHEMA = pa.schema([("node", pa.int64()), ("acc", pa.int64())])

    def contrib_tag(t: pa.Table) -> pa.Table:
        dstv = t.column("dst").to_numpy(zero_copy_only=False)
        r = t.column("r").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False)
        wv = t.column("w").to_numpy(zero_copy_only=False)
        # per-batch partial: sum contributions per destination locally
        c = wv * (r // d)
        ids, idx = np.unique(dstv, return_inverse=True)
        acc = np.zeros(len(ids), np.int64)
        np.add.at(acc, idx, c)
        b = (hash64_ints(ids, salt=0x2B5) % nb).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "acc": pa.array(acc, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def acc_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("acc", "sum")])
        return rename_grouped(gb, ["node"], ["node", "acc"])

    def rank_update(t: pa.Table) -> pa.Table:
        # int64-only arithmetic end to end (truncating int64 division =
        # floor on non-negatives) — a float path would drift past 2^53 and
        # break the bit-exact driver==distributed==oracle contract
        acc = pc.fill_null(
            pc.cast(t.column("acc"), pa.int64()), pa.scalar(0, pa.int64())
        )
        if seed_pred is None:
            r = pc.add(
                pa.scalar(base, pa.int64()),
                pc.divide(
                    pc.multiply(acc, pa.scalar(PR_DAMP_NUM, pa.int64())),
                    pa.scalar(PR_DAMP_DEN, pa.int64()),
                ),
            )
        else:
            ids = t.column("node").to_numpy(zero_copy_only=False)
            b = np.where(seed_pred(ids), base, 0).astype(np.int64)
            accn = acc.to_numpy(zero_copy_only=False)
            r = pa.array(b + PR_DAMP_NUM * accn // PR_DAMP_DEN, pa.int64())
        return pa.table(
            {"node": t.column("node"), "r": r, "deg": t.column("deg")}
        )

    for _ in range(iters):
        j = directed.join(
            state,
            join_type="inner",
            num_partitions=n_parts,
            on=("src",),
            right_on=("node",),
        ).materialize()
        acc_ds = drop_empty_blocks(
            j.map_batches(contrib_tag, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(acc_combine, batch_format="pyarrow")
            .materialize(),
            schema=_ACC_SCHEMA,
        ).materialize()
        # LEFT join from the node table: a node with no in-edges coalesces
        # its acc to 0 (for symmetrized input every node HAS in-edges, so
        # this is bit-identical to the historical inner join)
        state = (
            deg_ds.join(
                acc_ds.map_batches(
                    lambda t: pa.table(
                        {"node2": t.column("node"), "acc": t.column("acc")}
                    ),
                    batch_format="pyarrow",
                ).materialize(),
                join_type="left_outer",
                num_partitions=join_num_partitions(deg_ds.size_bytes()),
                on=("node",),
                right_on=("node2",),
            )
            .map_batches(rank_update, batch_format="pyarrow")
            .materialize()
        )

    return state.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "rank_scaled": t.column("r")}
        ),
        batch_format="pyarrow",
    )


def q_graph_pagerank(sf_dir: str):
    """Integer-exact PageRank over the co-supplier graph, SQL-oracled: all
    arithmetic is int64 fixed-point so the DuckDB nested-CTE power
    iteration reproduces the ranks BIT-FOR-BIT (a float PageRank can never
    pass a value-hash oracle — partial sums reorder). Size-adaptive like
    triangles/k-core: vectorized driver iteration under DRIVER_EDGE_LIMIT
    edges, the joins-based distributed iteration above (bit-equal,
    equivalence-tested)."""
    edges = cooccurrence_edges(sf_dir).materialize()
    if edges.count() <= DRIVER_EDGE_LIMIT:
        tbl = gather_table(edges, schema=EDGE_SCHEMA)
        return pagerank_integer_driver(tbl.column("e").to_numpy(zero_copy_only=False))
    return pagerank_integer_distributed(edges)


def pagerank_oracle_sql(iters: int = PR_ITERS, scale: int = PR_SCALE) -> str:
    """The DuckDB oracle for ``q_graph_pagerank``: the same integer update
    unrolled as ``iters`` nested CTEs (standard SQL forbids aggregation in
    a recursive CTE term, so a fixed-iteration unroll is the portable
    form). ``//`` is DuckDB integer (floor) division — identical to
    numpy's on non-negative int64."""
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    parts = [
        f"""
        WITH su AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_quantity > {TRI_QTY_THRESHOLD}
        ), e AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM su a JOIN su b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        ), deg AS (
          SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src
        ), it0 AS (
          SELECT node, CAST({scale} AS BIGINT) AS r FROM deg
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", it{i} AS (
          SELECT deg.node,
                 {base} + {PR_DAMP_NUM} * s.acc // {PR_DAMP_DEN} AS r
          FROM deg JOIN (
            SELECT e.dst AS node, SUM(p.r // deg2.d) AS acc
            FROM it{i - 1} p
            JOIN deg deg2 ON deg2.node = p.node
            JOIN e ON e.src = p.node
            GROUP BY e.dst
          ) s ON s.node = deg.node
        )"""
        )
    parts.append(
        f"\n        SELECT node AS s_suppkey, r AS rank_scaled FROM it{iters}"
    )
    return "".join(parts)


# ------------------------------------------- TrustRank (seeded teleport)

TRUST_SEED_MOD = 5  # oracle seed rule: node % TRUST_SEED_MOD == 0


def trustrank_integer_directed_driver(
    src: np.ndarray,
    dst: np.ndarray,
    seed_pred,
    w: np.ndarray | None = None,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> pa.Table:
    """Driver twin of the seeded distributed core (TrustRank, Gyongyi et
    al. 2004): integer-exact personalized PageRank where the teleport mass
    lands ONLY on trusted seeds. Update: r'(v) = (v seed ? base : 0) +
    floor(85 * sum w*floor(r(u)/W(u)) / 100), init r = base on seeds / 0
    elsewhere — so rank measures proximity to trust, and nodes with no
    in-path from a seed sit at exactly 0 (the spam-demotion signal the
    uniform prior can't give: a link farm inflates PageRank by linking to
    itself, but cannot manufacture trust in-links). ``seed_pred`` is a
    vectorized numpy predicate over int64 node ids, same contract as the
    distributed path. All-integer → bit-identical across summation order,
    SQL-oracle-able like the uniform core."""
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    w = np.ones(len(src), np.int64) if w is None else w.astype(np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src) :]
    n = len(nodes)
    outw = np.zeros(n, np.int64)
    np.add.at(outw, si, w)
    dangling = np.flatnonzero(outw == 0)
    if len(dangling):
        si = np.concatenate([si, dangling])
        di = np.concatenate([di, dangling])
        w = np.concatenate([w, np.ones(len(dangling), np.int64)])
        outw[dangling] = 1
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    seed_base = np.where(seed_pred(nodes), base, 0).astype(np.int64)
    r = seed_base.copy()
    for _ in range(iters):
        contrib = w * (r // outw)[si]
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        r = seed_base + PR_DAMP_NUM * acc // PR_DAMP_DEN
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank_scaled": pa.array(r, pa.int64()),
        }
    )


def trustrank_integer_distributed(
    edges: "ray.data.Dataset",
    seed_pred,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
):
    """Distributed TrustRank over packed undirected edges (column ``e``):
    symmetrize, then the seeded generic directed core — bit-equal to the
    driver twin (equivalence-tested)."""

    def split_both(t: pa.Table) -> pa.Table:
        e = t.column("e").to_numpy(zero_copy_only=False)
        a = (e // PACK).astype(np.int64)
        b = (e % PACK).astype(np.int64)
        n2 = 2 * len(e)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "w": pa.array(np.ones(n2, np.int64), pa.int64()),
            }
        )

    directed = edges.map_batches(split_both, batch_format="pyarrow").materialize()
    out = pagerank_directed_distributed(
        directed,
        iters=iters,
        scale=scale,
        add_dangling_self_loops=False,
        seed_pred=seed_pred,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("node"), "rank_scaled": t.column("rank_scaled")}
        ),
        batch_format="pyarrow",
    )


def _trust_seed_pred(ids: np.ndarray) -> np.ndarray:
    return ids % TRUST_SEED_MOD == 0


def q_graph_trustrank(sf_dir: str):
    """TrustRank over the co-supplier graph, seeds = suppkeys divisible by
    TRUST_SEED_MOD (a rule, so the seed set is SQL-expressible and costs
    the distributed path nothing). SQL-oracled bit-for-bit like
    ``q_graph_pagerank`` — same size-adaptive driver/distributed split."""
    edges = cooccurrence_edges(sf_dir).materialize()
    if edges.count() <= DRIVER_EDGE_LIMIT:
        tbl = gather_table(edges, schema=EDGE_SCHEMA)
        e = tbl.column("e").to_numpy(zero_copy_only=False)
        a = (e // PACK).astype(np.int64)
        b = (e % PACK).astype(np.int64)
        out = trustrank_integer_directed_driver(
            np.concatenate([a, b]), np.concatenate([b, a]), _trust_seed_pred
        )
        return pa.table(
            {
                "s_suppkey": out.column("node"),
                "rank_scaled": out.column("rank_scaled"),
            }
        )
    return trustrank_integer_distributed(edges, _trust_seed_pred)


def trustrank_oracle_sql(iters: int = PR_ITERS, scale: int = PR_SCALE) -> str:
    """DuckDB oracle for ``q_graph_trustrank``: the pagerank unroll with
    the teleport term gated on the seed rule (CASE WHEN node % mod = 0)."""
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    seed = f"CASE WHEN {{n}} % {TRUST_SEED_MOD} = 0 THEN {base} ELSE 0 END"
    parts = [
        f"""
        WITH su AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_quantity > {TRI_QTY_THRESHOLD}
        ), e AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM su a JOIN su b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        ), deg AS (
          SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src
        ), it0 AS (
          SELECT node, CAST({seed.format(n="node")} AS BIGINT) AS r FROM deg
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", it{i} AS (
          SELECT deg.node,
                 {seed.format(n="deg.node")}
                   + {PR_DAMP_NUM} * s.acc // {PR_DAMP_DEN} AS r
          FROM deg JOIN (
            SELECT e.dst AS node, SUM(p.r // deg2.d) AS acc
            FROM it{i - 1} p
            JOIN deg deg2 ON deg2.node = p.node
            JOIN e ON e.src = p.node
            GROUP BY e.dst
          ) s ON s.node = deg.node
        )"""
        )
    parts.append(
        f"\n        SELECT node AS s_suppkey, r AS rank_scaled FROM it{iters}"
    )
    return "".join(parts)


# ------------------------------------------------- HITS hubs & authorities

HITS_ITERS = 5
HITS_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def hits_edges(sf_dir: str, override_num_blocks: int | None = None):
    """Directed bipartite order→supplier edges for HITS: node ids are
    l_orderkey*2 (hub side) and l_suppkey*2+1 (authority side) — no packed
    2^32 bound, order keys stay full int64. Distinct via map-side collapse
    + ONE bucketed exchange (house rule: never a Ray groupby on the raw
    pair key)."""
    raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"],
        override_num_blocks=override_num_blocks,
    )
    nb = bucket_count(raw.size_bytes(), floor=N_BUCKETS)
    li = raw.filter(expr=f"l_quantity > {TRI_QTY_THRESHOLD}")

    def pair_tag(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([])
        src = 2 * g.column("l_orderkey").to_numpy(zero_copy_only=False)
        dst = 2 * g.column("l_suppkey").to_numpy(zero_copy_only=False) + 1
        b = (hash64_ints(src * 31 + dst, salt=0x417) % nb).astype(np.int32)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def pair_unique(g: pa.Table) -> pa.Table:
        gb = g.drop_columns(["bucket"]).group_by(["src", "dst"]).aggregate([])
        return gb.select(["src", "dst"])

    from pie_ray.util import drop_empty_blocks

    return drop_empty_blocks(
        li.map_batches(pair_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair_unique, batch_format="pyarrow")
        .materialize(),
        schema=HITS_SCHEMA,
    )


def hits_integer_directed_driver(
    src: np.ndarray,
    dst: np.ndarray,
    iters: int = HITS_ITERS,
    scale: int = PR_SCALE,
) -> pa.Table:
    """Integer-exact HITS (Kleinberg 1999): per iteration the authority
    update a'(v) = sum_{(u,v)} h(u) then the hub update h'(u) =
    sum_{(u,v)} a(v), each L∞-normalized by INTEGER DIVISOR
    d = max(1, max(raw) // scale) so every value stays ~scale and every
    op is int64 (order-independent sums + floor division → bit-identical
    across partitioning and engines, hence SQL-oracle-able — the same
    trick as the integer PageRank). Overflow bound: raw ≤ deg_max ·
    2·scale, safe to deg_max ~ 4.6e9 at scale 1e9. Returns (node,
    hub_scaled, auth_scaled) over the full node universe (no-in-edge
    nodes hold authority 0, no-out-edge nodes hub 0)."""
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src) :]
    n = len(nodes)
    h = np.full(n, scale, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        a_raw = np.zeros(n, np.int64)
        np.add.at(a_raw, di, h[si])
        a = a_raw // max(1, int(a_raw.max(initial=0)) // scale)
        h_raw = np.zeros(n, np.int64)
        np.add.at(h_raw, si, a[di])
        h = h_raw // max(1, int(h_raw.max(initial=0)) // scale)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "hub_scaled": pa.array(h, pa.int64()),
            "auth_scaled": pa.array(a, pa.int64()),
        }
    )


def hits_integer_distributed(
    edges: "ray.data.Dataset",
    iters: int = HITS_ITERS,
    scale: int = PR_SCALE,
):
    """Distributed twin of ``hits_integer_driver`` — bit-equal by the same
    integer-math argument (equivalence-tested). Per half-step: one hash
    join (edge picks up the source side's score), per-batch partial sums
    + ONE bucketed combine, a driver MAX (single scalar — the L∞ norm is
    the only global in HITS), then a LEFT join back onto the node
    universe (missing side coalesces to 0). ``.materialize()`` barriers
    between exchanges (repo rule: two all-to-alls never share a plan)."""
    from pie_ray.util import drop_empty_blocks

    edges = edges.materialize()
    if edges.count() == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "hub_scaled": pa.array([], pa.int64()),
                "auth_scaled": pa.array([], pa.int64()),
            }
        )
    n_parts = join_num_partitions(edges.size_bytes())
    nb = bucket_count(edges.size_bytes(), floor=N_BUCKETS)
    _NODE_SCHEMA = pa.schema([("node", pa.int64())])
    _RAW_SCHEMA = pa.schema([("node", pa.int64()), ("r", pa.int64())])

    def node_tag(t: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    t.column("src").to_numpy(zero_copy_only=False),
                    t.column("dst").to_numpy(zero_copy_only=False),
                ]
            )
        )
        b = (hash64_ints(ids, salt=0x71F) % nb).astype(np.int32)
        return pa.table(
            {"node": pa.array(ids, pa.int64()), "bucket": pa.array(b, pa.int32())}
        )

    def node_unique(g: pa.Table) -> pa.Table:
        return g.drop_columns(["bucket"]).group_by(["node"]).aggregate([])

    nodes_ds = drop_empty_blocks(
        edges.map_batches(node_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(node_unique, batch_format="pyarrow")
        .materialize(),
        schema=_NODE_SCHEMA,
    ).materialize()

    def half_step(score_ds, join_on: str, emit: str, col: str):
        """score flows across edges: join scores onto ``join_on``, partial-
        sum per ``emit`` node, bucketed combine, divisor-normalize against
        the node universe. Returns the new (node, <col>) Dataset."""
        j = edges.join(
            score_ds,
            join_type="inner",
            num_partitions=n_parts,
            on=(join_on,),
            right_on=("node",),
        ).materialize()

        def partial(t: pa.Table) -> pa.Table:
            out = t.column(emit).to_numpy(zero_copy_only=False)
            sc = t.column(col).to_numpy(zero_copy_only=False)
            ids, idx = np.unique(out, return_inverse=True)
            acc = np.zeros(len(ids), np.int64)
            np.add.at(acc, idx, sc)
            b = (hash64_ints(ids, salt=0x9D3) % nb).astype(np.int32)
            return pa.table(
                {
                    "node": pa.array(ids, pa.int64()),
                    "r": pa.array(acc, pa.int64()),
                    "bucket": pa.array(b, pa.int32()),
                }
            )

        def combine(g: pa.Table) -> pa.Table:
            from pie_ray.util import rename_grouped

            gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("r", "sum")])
            return rename_grouped(gb, ["node"], ["node", "r"])

        raw = drop_empty_blocks(
            j.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(combine, batch_format="pyarrow")
            .materialize(),
            schema=_RAW_SCHEMA,
        ).materialize()
        rmax = raw.max("r") if raw.count() > 0 else 0
        d = max(1, int(rmax or 0) // scale)

        def norm(t: pa.Table) -> pa.Table:
            r = pc.fill_null(pc.cast(t.column("r"), pa.int64()), pa.scalar(0, pa.int64()))
            return pa.table(
                {
                    "node": t.column("node"),
                    col: pc.divide(r, pa.scalar(d, pa.int64())),
                }
            )

        raw2 = raw.map_batches(
            lambda t: pa.table({"node2": t.column("node"), "r": t.column("r")}),
            batch_format="pyarrow",
        ).materialize()
        if raw2.count() == 0:
            return nodes_ds.map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        col: pa.array(np.zeros(t.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
        return (
            nodes_ds.join(
                raw2,
                join_type="left_outer",
                num_partitions=join_num_partitions(nodes_ds.size_bytes()),
                on=("node",),
                right_on=("node2",),
            )
            .map_batches(norm, batch_format="pyarrow")
            .materialize()
        )

    h_ds = nodes_ds.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "h": pa.array(np.full(t.num_rows, scale, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    a_ds = None
    for _ in range(iters):
        a_ds = half_step(h_ds, "src", "dst", "h").map_batches(
            lambda t: pa.table({"node": t.column("node"), "a": t.column("h")}),
            batch_format="pyarrow",
        ).materialize()
        h_ds = half_step(a_ds, "dst", "src", "a").map_batches(
            lambda t: pa.table({"node": t.column("node"), "h": t.column("a")}),
            batch_format="pyarrow",
        ).materialize()

    joined = h_ds.join(
        a_ds.map_batches(
            lambda t: pa.table({"node2": t.column("node"), "a": t.column("a")}),
            batch_format="pyarrow",
        ).materialize(),
        join_type="inner",
        num_partitions=join_num_partitions(h_ds.size_bytes()),
        on=("node",),
        right_on=("node2",),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "hub_scaled": t.column("h"),
                "auth_scaled": t.column("a"),
            }
        ),
        batch_format="pyarrow",
    )


def q_graph_hits(sf_dir: str):
    """HITS over the order→supplier bipartite graph, SQL-oracled
    bit-for-bit (integer updates + divisor normalization unroll into
    nested CTEs with scalar MAX subqueries). Size-adaptive like the other
    rank entries: vectorized driver iteration under DRIVER_EDGE_LIMIT,
    the joins-based distributed twin above (bit-equal,
    equivalence-tested)."""
    edges = hits_edges(sf_dir).materialize()
    if edges.count() <= DRIVER_EDGE_LIMIT:
        tbl = gather_table(edges, schema=HITS_SCHEMA)
        return hits_integer_directed_driver(
            tbl.column("src").to_numpy(zero_copy_only=False),
            tbl.column("dst").to_numpy(zero_copy_only=False),
        )
    return hits_integer_distributed(edges)


def hits_oracle_sql(iters: int = HITS_ITERS, scale: int = PR_SCALE) -> str:
    """DuckDB oracle for ``q_graph_hits``: the same integer half-steps
    unrolled (aggregation is illegal in a recursive CTE term, so fixed
    iterations unroll like the pagerank oracle); ``//`` is floor division
    on BIGINT, GREATEST(1, MAX(raw) // scale) is the divisor norm."""
    parts = [
        f"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem WHERE l_quantity > {TRI_QTY_THRESHOLD}
        ), nodes AS MATERIALIZED (
          SELECT src AS node FROM e UNION SELECT dst FROM e
        ), h0 AS (
          SELECT node, CAST({scale} AS BIGINT) AS h FROM nodes
        )"""
    ]
    for i in range(1, iters + 1):
        # AS MATERIALIZED is load-bearing: ar{i}/hr{i} are each referenced
        # twice (join + MAX-norm subquery), and DuckDB's default CTE
        # inlining would re-expand the whole chain per reference —
        # exponential in iters (measured: 14 s at 3 iters, hours at 5)
        parts.append(
            f""", ar{i} AS MATERIALIZED (
          SELECT e.dst AS node, SUM(p.h) AS r
          FROM e JOIN h{i - 1} p ON p.node = e.src GROUP BY e.dst
        ), a{i} AS MATERIALIZED (
          SELECT n.node,
                 COALESCE(x.r, 0)
                   // GREATEST(1, (SELECT MAX(r) FROM ar{i}) // {scale}) AS a
          FROM nodes n LEFT JOIN ar{i} x ON x.node = n.node
        ), hr{i} AS MATERIALIZED (
          SELECT e.src AS node, SUM(p.a) AS r
          FROM e JOIN a{i} p ON p.node = e.dst GROUP BY e.src
        ), h{i} AS MATERIALIZED (
          SELECT n.node,
                 COALESCE(x.r, 0)
                   // GREATEST(1, (SELECT MAX(r) FROM hr{i}) // {scale}) AS h
          FROM nodes n LEFT JOIN hr{i} x ON x.node = n.node
        )"""
        )
    parts.append(
        f"""
        SELECT h.node, h.h AS hub_scaled, a.a AS auth_scaled
        FROM h{iters} h JOIN a{iters} a ON a.node = h.node"""
    )
    return "".join(parts)


# ----------------------------------------------- label propagation communities


def label_propagation(edges: "ray.data.Dataset", max_rounds: int = 20):
    """Community detection by synchronous deterministic label propagation
    (Raghavan et al. 2007, made deterministic): every node starts labelled
    with its own id; each round every node adopts the most frequent label
    among its neighbours plus itself, ties broken by the SMALLEST label.
    Synchronous updates + deterministic tie-break make the result a pure
    function of the edge set — independent of partitioning/parallelism
    (tested), unlike the classic async/randomized LPA.

    Input: packed-edge Dataset (column ``e`` = a * 2^32 + b, a < b — the
    ``cooccurrence_edges`` convention; node ids must fit in uint32 like the
    rest of this module). Output: Dataset ``(node, community)``.

    Scale shape: per round ONE hash join (attach neighbour labels to
    directed edges) + one bounded bucketed groupby computing the grouped
    MODE fully vectorized (pack (node, label) -> unique counts -> lexsort
    (node asc, count desc, label asc) -> first per node), + a label-table-
    sized join to count changes. ``.materialize()`` barriers keep each
    exchange in its own streaming plan (repo rule). Rounds are capped:
    synchronous LPA can oscillate on bipartite-ish structures, and the cap
    bounds the cost while keeping determinism."""
    from pie_ray.util import drop_empty_blocks

    directed = edges.map_batches(_split_undirected, batch_format="pyarrow").materialize()
    n_parts = join_num_partitions(directed.size_bytes())
    nb = bucket_count(directed.size_bytes(), floor=N_BUCKETS)
    _LAB_SCHEMA = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

    def init_labels(t: pa.Table) -> pa.Table:
        ids = np.unique(t.column("src").to_numpy(zero_copy_only=False))
        b = (hash64_ints(ids, salt=0x1A8) % nb).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "lab": pa.array(ids, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    labels = drop_empty_blocks(
        directed.map_batches(init_labels, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: pa.table(
                {
                    "node": pc.unique(g.column("node").combine_chunks()),
                    "lab": pc.unique(g.column("node").combine_chunks()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize(),
        schema=_LAB_SCHEMA,
    ).materialize()

    def vote_bucket_tag(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        b = (hash64_ints(src, salt=0x10DE) % nb).astype(np.int32)
        return pa.table(
            {
                "src": t.column("src"),
                "vlab": t.column("lab"),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def mode_bucket(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        lab = g.column("vlab").to_numpy(zero_copy_only=False)
        key = src * PACK + lab  # both < 2^32 by module convention
        uk, cnt = np.unique(key, return_counts=True)
        s = (uk // PACK).astype(np.int64)
        l = (uk % PACK).astype(np.int64)
        order = np.lexsort((l, -cnt, s))  # node asc, count desc, label asc
        s, l = s[order], l[order]
        _, first = np.unique(s, return_index=True)
        return pa.table(
            {"node": pa.array(s[first], pa.int64()), "lab": pa.array(l[first], pa.int64())}
        )

    for _ in range(max_rounds):
        nbr = directed.join(
            labels,
            join_type="inner",
            num_partitions=n_parts,
            on=("dst",),
            right_on=("node",),
        ).materialize()
        # self-vote: the node's own current label counts once
        self_votes = labels.map_batches(
            lambda t: pa.table({"src": t.column("node"), "lab": t.column("lab")}),
            batch_format="pyarrow",
        )
        votes = nbr.map_batches(
            lambda t: pa.table({"src": t.column("src"), "lab": t.column("lab")}),
            batch_format="pyarrow",
        ).union(self_votes)
        new_labels = drop_empty_blocks(
            votes.map_batches(vote_bucket_tag, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(mode_bucket, batch_format="pyarrow")
            .materialize(),
            schema=_LAB_SCHEMA,
        ).materialize()
        changed = (
            new_labels.join(
                labels.map_batches(
                    lambda t: pa.table(
                        {"node2": t.column("node"), "old_lab": t.column("lab")}
                    ),
                    batch_format="pyarrow",
                ).materialize(),
                join_type="inner",
                num_partitions=join_num_partitions(new_labels.size_bytes()),
                on=("node",),
                right_on=("node2",),
            )
            .filter(expr="lab != old_lab")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "community": t.column("lab")}
        ),
        batch_format="pyarrow",
    )


def q_graph_communities(sf_dir: str):
    """Deterministic label-propagation communities over the co-supplier
    graph (rows-only surface — iterative mode-vote fixpoints are not
    SQL-expressible; gated by planted-community, local-reference-parity and
    partition-independence pytests)."""
    labels = label_propagation(cooccurrence_edges(sf_dir))
    return labels.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("node"), "community": t.column("community")}
        ),
        batch_format="pyarrow",
    )


def q_graph_components(sf_dir: str):
    """Connected components of the co-supplier graph as a driver-oracled
    entry (DuckDB side: WITH RECURSIVE min-label reachability — feasible
    because the oracle graph is small; the engine path is the same
    size-adaptive ``connected_components`` the KG linking stage uses).
    Component label = smallest member id on both sides."""

    edges = cooccurrence_edges(sf_dir).map_batches(
        _split_directed, batch_format="pyarrow"
    )
    comp = connected_components(edges)
    return comp.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("node"), "component": t.column("component")}
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- connected components


def connected_components(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    nodes_ds=None,
    node_col: str | None = None,
    force_distributed: bool = False,
):
    """Public connected components over ANY edge Dataset (string or int64
    node ids) -> Dataset ``(node, component)``; component = min member id.

    Size-adaptive exactly like the linking stage it generalizes
    (pie_ray/stages/linking.py): below CC_DRIVER_THRESHOLD edges a driver
    union-find labels everything (edge pull bounded by the threshold, never
    the node count); above it, the alternating hash-min label-propagation
    rounds run distributed and nodes get labels via one hash join. Both
    paths agree because Arrow's ``min`` and Python's ``min`` order int64 and
    utf8 identically (tested driver == distributed).

    ``nodes_ds``/``node_col`` optionally supply the node universe (isolated
    nodes come out as singleton components); default is the set of edge
    endpoints. The node universe is never pulled to the driver — labels are
    applied as a broadcast task map (small path) or hash join (scale path).
    """
    import ray

    from pie_ray.stages.linking import CC_DRIVER_THRESHOLD, cc_distributed
    from pie_ray.state.dsu import DSU
    from pie_ray.util import bucket_hash_strings

    pairs = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(src), "b": t.column(dst)}),
        batch_format="pyarrow",
    ).materialize()
    nb = bucket_count(pairs.size_bytes(), floor=N_BUCKETS)

    if nodes_ds is None:
        nodes_ds, node_col = pairs, None

    def node_batch(t: pa.Table) -> pa.Table:
        if node_col is not None:
            arr = pc.unique(t.column(node_col).combine_chunks())
        else:
            arr = pc.unique(
                pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                )
            )
        # vectorized bucket hash: ints via splitmix64, strings via the
        # batched FNV (no per-element Python loop in either branch)
        if pa.types.is_integer(arr.type):
            h = hash64_ints(arr.to_numpy(zero_copy_only=False).astype("int64"), salt=0xCC7)
        else:
            h = bucket_hash_strings(arr, salt=0xCC7)
        return pa.table(
            {"node": arr, "bucket": pa.array((h % nb).astype("int32"), pa.int32())}
        )

    nodes = (
        nodes_ds.map_batches(node_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: pa.table({"node": pc.unique(g.column("node").combine_chunks())}),
            batch_format="pyarrow",
        )
    )

    n_edges = pairs.count()
    if n_edges <= CC_DRIVER_THRESHOLD and not force_distributed:
        dsu = DSU()
        for batch in pairs.iter_batches(batch_format="pyarrow"):
            for x, y in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
                dsu.union(x, y)
        cmap = dsu.canon_map()
        ks = sorted(cmap)
        # type comes from the NODE universe's schema, not the (possibly
        # empty) label map — an all-isolated string-node graph has zero
        # edges, and an int64 default would crash index_in against the
        # string node column
        sch = nodes_ds.schema()
        ncol = node_col if node_col is not None else "a"
        ntype = (
            sch.types[sch.names.index(ncol)]
            if sch is not None and ncol in sch.names
            else None
        )
        ktype = (
            pa.string()
            if (ntype is not None and pa.types.is_string(ntype))
            or (ks and isinstance(ks[0], str))
            else pa.int64()
        )
        cref = ray.put((pa.array(ks, ktype), pa.array([cmap[k] for k in ks], ktype)))

        def assign(t: pa.Table, lookup_ref=None) -> pa.Table:
            keys_, vals_ = ray.get(lookup_ref)
            idx = pc.index_in(t.column("node").combine_chunks(), value_set=keys_)
            return pa.table(
                {
                    "node": t.column("node"),
                    "component": pc.coalesce(vals_.take(idx), t.column("node")),
                }
            )

        return nodes.map_batches(
            assign, fn_kwargs={"lookup_ref": cref}, batch_format="pyarrow"
        )

    labels = cc_distributed(pairs)
    # barrier: the nodes exchange is node-list-sized (small) — never let
    # it share a streaming plan with the label join's exchange; strip the
    # groupby's empty-schema blocks before the join (join crashes on them)
    from pie_ray.util import drop_empty_blocks

    nodes = drop_empty_blocks(nodes.materialize()).materialize()
    joined = nodes.join(
        labels,
        join_type="left_outer",
        num_partitions=join_num_partitions(pairs.size_bytes()),
        on=("node",),
        right_on=("node",),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "component": pc.coalesce(t.column("label"), t.column("node")),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# KG build diff — what changed between two triple sets
# ---------------------------------------------------------------------------


def triples_diff(old_ds, new_ds, num_buckets: int = 64):
    """Set difference of two (subj, pred, obj) triple tables in BOTH
    directions: rows tagged change='added' exist only in ``new_ds``,
    'removed' only in ``old_ds``. The ops tool for incremental builds —
    after an ``--ingest`` update, exactly which facts appeared/vanished.

    One bucketed exchange: each side tags itself, both union, and the
    per-bucket pass keeps triples whose (side-distinct) presence count is
    1 — duplicates WITHIN a side collapse first, so multiplicity changes
    are not diffs (triple tables are canonically deduped anyway)."""
    import ray

    from pie_ray.util import bucket_hash_strings

    COLS = ["subj", "pred", "obj"]

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            keys = pc.binary_join_element_wise(
                *[t.column(c) for c in COLS], "\x1f"
            )
            h = bucket_hash_strings(keys, salt=0x7D1F)
            out = t.select(COLS)
            out = out.append_column(
                "bucket", pa.array((h % num_buckets).astype(np.int32), pa.int32())
            )
            return out.append_column(
                "side", pa.array([side] * t.num_rows, pa.string())
            )

        return fn

    tagged = old_ds.map_batches(tag("old"), batch_format="pyarrow").union(
        new_ds.map_batches(tag("new"), batch_format="pyarrow")
    )

    def diff_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        # side-distinct first (multiplicity within one side is not a diff)
        d = g.group_by(COLS + ["side"]).aggregate([])
        gb = d.group_by(COLS).aggregate([("side", "count"), ("side", "min")])
        from pie_ray.util import rename_grouped

        gb = rename_grouped(gb, COLS, COLS + ["n_sides", "one_side"])
        only = gb.filter(pc.equal(gb.column("n_sides"), 1))
        change = pc.if_else(
            pc.equal(only.column("one_side"), "old"),
            pa.scalar("removed"),
            pa.scalar("added"),
        )
        return only.select(COLS).append_column("change", change)

    return tagged.groupby("bucket").map_groups(diff_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# link prediction: common-neighbors + Jaccard scores for non-adjacent pairs
# ---------------------------------------------------------------------------


def link_predict_driver(edges_packed: np.ndarray) -> pa.Table:
    """Exact common-neighbor / Jaccard link-prediction scores for every
    NON-adjacent node pair with >= 1 common neighbor, vectorized on the
    driver (the under-DRIVER_EDGE_LIMIT path; int64-packed edge array)."""
    a = (edges_packed // PACK).astype(np.int64)
    b = (edges_packed % PACK).astype(np.int64)
    mid = np.concatenate([a, b])
    leaf = np.concatenate([b, a])
    order = np.argsort(mid, kind="stable")
    x, y = _pairs_by_size(mid[order], leaf[order])  # a<b per pair by sort
    pk = _pack(x, y)
    upk, cnt = np.unique(pk, return_counts=True)
    keep = ~np.isin(upk, edges_packed)  # predicted = NOT already an edge
    upk, cnt = upk[keep], cnt[keep]
    nodes, deg = np.unique(np.concatenate([a, b]), return_counts=True)
    dx = deg[np.searchsorted(nodes, (upk // PACK))]
    dy = deg[np.searchsorted(nodes, (upk % PACK))]
    union = (dx + dy - cnt).astype(np.int64)
    jac = cnt.astype(np.float64) / union.astype(np.float64)
    return pa.table(
        {
            "suppkey_a": pa.array((upk // PACK).astype(np.int64), pa.int64()),
            "suppkey_b": pa.array((upk % PACK).astype(np.int64), pa.int64()),
            "common_neighbors": pa.array(cnt.astype(np.int64), pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


def link_predict_distributed(edges: "ray.data.Dataset") -> pa.Table:
    """Distributed link prediction over a packed edge Dataset.

    Wedges enumerate per-MID (each mid's rows co-locate in ONE bucketed
    exchange — per-mid fan-out is deg(mid)^2/2, the algorithm's intrinsic
    cost); pair counts combine in a second bucketed exchange; adjacency is
    removed with a LEFT_ANTI hash join against the edge set and endpoint
    degrees attach via two inner joins with the bucketed degree table. All
    exchanges are barriered (materialize) per the one-exchange-per-plan
    rule, and every materialized groupby/join output is empty-block-
    normalized before feeding the next join. Returns the gathered result
    table (bounded: callers at this size want the full score set; a top-k
    pushdown would go here if result grain ever exceeded driver memory)."""
    from pie_ray.util import drop_empty_blocks

    nb = bucket_count(edges.size_bytes(), floor=N_BUCKETS)

    def mid_bucket(t: pa.Table) -> pa.Table:
        e = t.column("e").to_numpy(zero_copy_only=False)
        a = (e // PACK).astype(np.int64)
        b = (e % PACK).astype(np.int64)
        mid = np.concatenate([a, b])
        leaf = np.concatenate([b, a])
        bkt = (hash64_ints(mid, salt=0x11D4) % nb).astype(np.int32)
        return pa.table(
            {
                "mid": pa.array(mid, pa.int64()),
                "leaf": pa.array(leaf, pa.int64()),
                "bucket": pa.array(bkt, pa.int32()),
            }
        )

    def bucket_wedges(g: pa.Table) -> pa.Table:
        mid = g.column("mid").to_numpy(zero_copy_only=False)
        leaf = g.column("leaf").to_numpy(zero_copy_only=False)
        order = np.argsort(mid, kind="stable")
        x, y = _pairs_by_size(mid[order], leaf[order])
        upk, c = np.unique(_pack(x, y), return_counts=True)
        b2 = (hash64_ints(upk, salt=0x2B71) % nb).astype(np.int32)
        return pa.table(
            {
                "pk": pa.array(upk, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
                "bucket": pa.array(b2, pa.int32()),
            }
        )

    wedge_schema = pa.schema(
        [("pk", pa.int64()), ("c", pa.int64()), ("bucket", pa.int32())]
    )
    partials = drop_empty_blocks(
        edges.map_batches(mid_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_wedges, batch_format="pyarrow")
        .materialize(),
        schema=wedge_schema,
    )

    def pair_sum(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["pk"]).aggregate([("c", "sum")])
        return rename_grouped(gb, ["pk"], ["pk", "common_neighbors"])

    counts = drop_empty_blocks(
        partials.groupby("bucket")
        .map_groups(pair_sum, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema([("pk", pa.int64()), ("common_neighbors", pa.int64())]),
    )

    # adjacency removal: LEFT_ANTI against the edge set on the packed key
    jp = join_num_partitions(counts.size_bytes())
    nonadj = drop_empty_blocks(
        counts.join(
            edges, join_type="left_anti", num_partitions=jp, on=("pk",), right_on=("e",)
        ).materialize(),
        schema=pa.schema([("pk", pa.int64()), ("common_neighbors", pa.int64())]),
    )

    # degree table (same bucketed partial-count pattern as triangles)
    def deg_partial(t: pa.Table) -> pa.Table:
        e = t.column("e").to_numpy(zero_copy_only=False)
        ids = np.concatenate([(e // PACK), (e % PACK)]).astype(np.int64)
        ids, cnts = np.unique(ids, return_counts=True)
        bkt = (hash64_ints(ids, salt=0x0DE6) % nb).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "deg": pa.array(cnts.astype(np.int64), pa.int64()),
                "bucket": pa.array(bkt, pa.int32()),
            }
        )

    def deg_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("deg", "sum")])
        return rename_grouped(gb, ["node"], ["node", "deg"])

    deg_ds = drop_empty_blocks(
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(deg_combine, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
    )

    def split_pair(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "suppkey_a": pa.array((pk // PACK).astype(np.int64), pa.int64()),
                "suppkey_b": pa.array((pk % PACK).astype(np.int64), pa.int64()),
                "common_neighbors": t.column("common_neighbors"),
            }
        )

    pairs = nonadj.map_batches(split_pair, batch_format="pyarrow")
    j1 = drop_empty_blocks(
        pairs.join(
            deg_ds, join_type="inner", num_partitions=jp, on=("suppkey_a",), right_on=("node",)
        ).materialize()
    )

    def keep_da(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "suppkey_a": t.column("suppkey_a"),
                "suppkey_b": t.column("suppkey_b"),
                "common_neighbors": t.column("common_neighbors"),
                "deg_a": t.column("deg"),
            }
        )

    j2 = drop_empty_blocks(
        j1.map_batches(keep_da, batch_format="pyarrow")
        .join(
            deg_ds, join_type="inner", num_partitions=jp, on=("suppkey_b",), right_on=("node",)
        )
        .materialize()
    )

    def score(t: pa.Table) -> pa.Table:
        cn = t.column("common_neighbors").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg").to_numpy(zero_copy_only=False)
        jac = cn.astype(np.float64) / (da + db - cn).astype(np.float64)
        return pa.table(
            {
                "suppkey_a": t.column("suppkey_a"),
                "suppkey_b": t.column("suppkey_b"),
                "common_neighbors": t.column("common_neighbors"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    out = j2.map_batches(score, batch_format="pyarrow")
    return gather_table(
        out,
        schema=pa.schema(
            [
                ("suppkey_a", pa.int64()),
                ("suppkey_b", pa.int64()),
                ("common_neighbors", pa.int64()),
                ("jaccard", pa.float64()),
            ]
        ),
    )


def q_graph_link_predict(sf_dir: str):
    """Driver entry: link prediction on the co-supplier graph — for every
    non-adjacent supplier pair with >=1 common neighbor, the common-
    neighbor count and Jaccard coefficient |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
    (the classic entity-linking candidate-generation scores). Size-
    adaptive like q_graph_triangles; both paths equivalence-tested."""
    edges = cooccurrence_edges(sf_dir)
    if edges.count() <= DRIVER_EDGE_LIMIT:
        tbl = gather_table(edges, schema=EDGE_SCHEMA)
        return link_predict_driver(tbl.column("e").to_numpy(zero_copy_only=False))
    return link_predict_distributed(edges)


# ----------------------------------------------- strongly connected components


SCC_DRIVER_EDGE_LIMIT = 5_000_000
# sparser than TRI_QTY_THRESHOLD on purpose: at 46.0 the parity-oriented
# graph collapses into ONE giant SCC at every sf (no discrimination);
# 48.0 yields a mix of non-trivial SCCs and singletons at both test scales
SCC_QTY_THRESHOLD = 48.0


def _parity_directed_pair_edges(ok: np.ndarray, sk: np.ndarray) -> np.ndarray:
    o, a, b = _keyed_pairs_by_size(ok, sk)
    even = o % 2 == 0
    src = np.where(even, a, b)
    dst = np.where(even, b, a)
    return src * PACK + dst


def cosupply_directed_edges(
    sf_dir: str, override_num_blocks: int | None = None
) -> "ray.data.Dataset":
    """Distinct DIRECTED co-supplier edges (column ``e`` = src * 2^32 +
    dst) from high-quantity lineitems: for each co-supply pair (a < b) on
    an order, the edge points a -> b on even orders and b -> a on odd ones
    — the same pair can occur on orders of both parities, which is what
    puts CYCLES (and so non-trivial SCCs) into the graph. Shares the
    two-exchange scaffold with ``cooccurrence_edges``."""
    return _cosupply_edge_pipeline(
        sf_dir,
        SCC_QTY_THRESHOLD,
        _parity_directed_pair_edges,
        override_num_blocks=override_num_blocks,
        edge_salt=0x5CC,
    )


def _keyed_pairs_by_size(
    keys: np.ndarray, vals: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Like ``_pairs_by_size`` but also returns each pair's GROUP KEY —
    needed when the key participates in the edge definition (the SCC
    direction rule)."""
    uk, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    outs_k: list[np.ndarray] = []
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    for k in np.unique(counts):
        if k < 2:
            continue
        sel = counts == k
        st = starts[sel]
        mat = vals[st[:, None] + np.arange(k)[None, :]]
        mat = np.sort(mat, axis=1)
        iu, ju = np.triu_indices(int(k), 1)
        outs_a.append(mat[:, iu].ravel())
        outs_b.append(mat[:, ju].ravel())
        outs_k.append(np.repeat(uk[sel], len(iu)))
    if not outs_a:
        z = np.empty(0, np.int64)
        return z, z, z
    return (
        np.concatenate(outs_k),
        np.concatenate(outs_a),
        np.concatenate(outs_b),
    )


def scc_driver(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    """(node, scc) for a directed int64 edge list — iterative Tarjan
    (single O(V+E) pass, recursion-free so deep chains can't blow the
    interpreter stack); scc label = smallest member id, so the result is
    partitioning-free and comparable with the SQL oracle."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    if n == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "scc": pa.array([], pa.int64())}
        )
    s = inv[: len(src)].astype(np.int64)
    d = inv[len(src) :].astype(np.int64)
    packed = np.unique(s * n + d)
    s, d = packed // n, packed % n  # sorted by (s, d)
    head = np.searchsorted(s, np.arange(n))
    tail = np.searchsorted(s, np.arange(n), side="right")

    NIL = -1
    index = np.full(n, NIL, np.int64)
    low = np.zeros(n, np.int64)
    onstk = np.zeros(n, bool)
    labels = np.full(n, NIL, np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != NIL:
            continue
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        onstk[root] = True
        call: list[list[int]] = [[root, int(head[root])]]
        while call:
            v, ptr = call[-1]
            if ptr < tail[v]:
                call[-1][1] = ptr + 1
                w = int(d[ptr])
                if index[w] == NIL:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    onstk[w] = True
                    call.append([w, int(head[w])])
                elif onstk[w]:
                    if index[w] < low[v]:
                        low[v] = index[w]
            else:
                call.pop()
                if call and low[v] < low[call[-1][0]]:
                    low[call[-1][0]] = low[v]
                if low[v] == index[v]:
                    comp: list[int] = []
                    while True:
                        w = stack.pop()
                        onstk[w] = False
                        comp.append(w)
                        if w == v:
                            break
                    lab = int(nodes[comp].min())
                    labels[comp] = lab
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "scc": pa.array(labels, pa.int64())}
    )


def _string_index_map(arrays):
    """Sorted-dictionary index map shared by the string SCC/BFS driver
    paths: distinct ids across ``arrays`` sorted ascending, plus each
    array's int64 index vector. Indices preserve name (lexicographic)
    order — the invariant the CSR kernels' searchsorted seed guards and
    min-label take-backs rely on. All arrays must share one string
    flavor (string vs large_string); callers cast seeds to the edge
    column type first."""
    chunks = []
    for a in arrays:
        chunks.extend(a.chunks if isinstance(a, pa.ChunkedArray) else [a])
    all_ids = pc.unique(pa.chunked_array(chunks))
    names = all_ids.take(pc.sort_indices(all_ids))
    idxs = []
    for a in arrays:
        ii = pc.index_in(a, value_set=names)
        if isinstance(ii, pa.ChunkedArray):
            ii = ii.combine_chunks()
        idxs.append(ii.to_numpy(zero_copy_only=False).astype(np.int64))
    return names, idxs


def _scc_on_table(tbl: pa.Table, src: str, dst: str) -> pa.Table:
    """Driver SCC over a gathered edge table (int64 or string ids):
    string ids run through the sorted-dictionary index map, then the
    iterative Tarjan kernel. Returns ``(node, scc)``."""
    sa, da = tbl.column(src), tbl.column(dst)
    if pa.types.is_string(sa.type) or pa.types.is_large_string(sa.type):
        names, (s_idx, d_idx) = _string_index_map([sa, da])
        out = scc_driver(s_idx, d_idx)
        return pa.table(
            {
                "node": names.take(out.column("node")),
                "scc": names.take(out.column("scc")),
            }
        )
    return scc_driver(
        sa.to_numpy(zero_copy_only=False).astype(np.int64),
        da.to_numpy(zero_copy_only=False).astype(np.int64),
    )


def scc(edges_ds, src: str = "src", dst: str = "dst",
        force_distributed: bool = False):
    """Strongly connected components over ANY directed edge Dataset
    (int64 or string node ids) -> Dataset ``(node, scc)``; scc = smallest
    member id (lexicographically smallest for strings).

    Size-adaptive: below ``SCC_DRIVER_EDGE_LIMIT`` edges the recursion-free
    iterative Tarjan runs on the driver over a bounded pull; above it (or
    forced), ``scc_distributed`` runs the trim + FW-BW pivot-carving scale
    path (Fleischer et al. 2000) built on the repo's distributed BFS, and
    only the post-carving remainder — not the input — must fit the driver
    budget. Both paths agree (equivalence-tested)."""
    import ray

    from pie_ray.util import gather_table

    edges = edges_ds.materialize()
    m = edges.count()
    if m == 0:
        # typed empty result FIRST — before any routing, so forced and
        # unforced paths agree (gather_table on an all-empty mapped output
        # can lose the schema entirely — don't let tbl.column() KeyError).
        # Integer ids normalize to int64, matching both non-empty paths.
        sch = edges.schema()
        id_t = (
            sch.types[sch.names.index(src)]
            if sch is not None and src in sch.names
            else pa.int64()
        )
        if pa.types.is_integer(id_t):
            id_t = pa.int64()
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], id_t), "scc": pa.array([], id_t)})
        )
    if m > SCC_DRIVER_EDGE_LIMIT or force_distributed:
        # pass the LIVE global: the scale path's default must track any
        # tuned/patched budget, not the def-time binding
        return scc_distributed(
            edges, src=src, dst=dst, driver_edge_limit=SCC_DRIVER_EDGE_LIMIT
        )
    return ray.data.from_arrow(_scc_on_table(gather_table(edges), src, dst))


SCC_TRIM_ROUNDS = 3
SCC_FWBW_MAX_PIVOTS = 8


def _min_of(ds, col: str):
    """Smallest value of ``col`` (int64 or string): per-batch min partials
    (one row each) -> bounded gather -> driver min. Type-agnostic — Ray's
    Min aggregate is numeric-only."""
    from pie_ray.util import gather_table

    def part(t: pa.Table, _c=col) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({_c: t.column(_c)})
        mn = pc.min_max(t.column(_c))["min"].as_py()
        return pa.table({_c: pa.array([mn], t.column(_c).type)})

    partial = ds.map_batches(part, batch_format="pyarrow")
    vals = gather_table(partial.materialize()).column(col).to_pylist()
    vals = [v for v in vals if v is not None]
    return min(vals) if vals else None


def scc_distributed(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    trim_rounds: int = SCC_TRIM_ROUNDS,
    max_pivots: int = SCC_FWBW_MAX_PIVOTS,
    driver_edge_limit: int | None = None,
):
    """SCC scale path: TRIM + FW-BW pivot carving (Fleischer et al. 2000;
    trim per McLendon/Slota practice) -> Dataset ``(node, scc)``,
    scc = smallest member id — identical labels to the driver Tarjan.

    Shape, per the web-graph structure argument (one giant SCC + a huge
    acyclic fringe): (1) bounded TRIM rounds peel nodes with in- or
    out-degree 0 — singleton SCCs by definition — using distinct + anti
    joins only; (2) each FW-BW pivot round runs the repo's distributed BFS
    forward and backward from the minimum remaining source and carves
    F ∩ B as one SCC (the giant SCC goes in round one); (3) the shrunken
    remainder falls back to the driver Tarjan once under
    ``driver_edge_limit``. Every SCC lies entirely inside F∩B, F∖S, B∖S,
    or the unreached rest, so carving is exact and the remainder needs no
    partition bookkeeping. Nodes that lose every edge along the way are
    singletons (own id) by the same definition. The final labels are a
    pure function of the graph — pivot order only changes which SCC is
    carved when. All exchanges are materialized apart (repo barrier rule).
    If ``max_pivots`` rounds still leave more than the driver budget the
    function raises — a graph whose SCC structure resists both trim and
    that many carves is out of contract."""
    import ray

    from pie_ray.util import drop_empty_blocks, gather_table

    if driver_edge_limit is None:
        driver_edge_limit = SCC_DRIVER_EDGE_LIMIT  # live global, not def-time

    def _norm(t: pa.Table) -> pa.Table:
        # integer ids normalize to int64 up front: the remainder Tarjan
        # and the pivot seeds emit int64, and mixed-width join keys crash
        # Ray's hash shuffle (string flavors stay as-is — everything
        # downstream derives from this one table, so they stay consistent)
        s_, d_ = t.column(src), t.column(dst)
        if pa.types.is_integer(s_.type):
            s_ = pc.cast(s_, pa.int64())
        if pa.types.is_integer(d_.type):
            d_ = pc.cast(d_, pa.int64())
        return pa.table({"s": s_, "d": d_})

    edges = edges_ds.map_batches(_norm, batch_format="pyarrow").materialize()
    sch = edges.schema()
    id_t = sch.types[sch.names.index("s")] if sch and "s" in sch.names else pa.int64()
    node_schema = pa.schema([("node", id_t)])
    edge_schema = pa.schema([("s", id_t), ("d", id_t)])
    out_schema = pa.schema([("node", id_t), ("scc", id_t)])
    nb = bucket_count(edges.size_bytes(), floor=N_BUCKETS)
    n_parts = join_num_partitions(edges.size_bytes())

    def _col_distinct(e_ds, cols):
        one = e_ds.map_batches(
            lambda t, _cs=cols: pa.table(
                {
                    "node": pa.concat_arrays(
                        [t.column(c).combine_chunks() for c in _cs]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        return drop_empty_blocks(
            _bucketed_distinct(one, "node", nb).materialize(), schema=node_schema
        )

    def _anti(left, right):
        # Dataset.join CRASHES on a 0-row input (its hash shuffle builds
        # empty-SCHEMA partitions; ArrowInvalid "No match ... FieldRef"),
        # so short-circuit both degenerate sides
        if left.count() == 0 or right.count() == 0:
            return left
        return drop_empty_blocks(
            left.join(
                right,
                join_type="left_anti",
                num_partitions=n_parts,
                on=("node",),
                right_on=("node",),
            ).materialize(),
            schema=node_schema,
        )

    def _drop_edges_touching(e_ds, nodes_ds):
        for col in ("s", "d"):
            if e_ds.count() == 0:  # 0-row join input crashes (see _anti)
                break
            e_ds = drop_empty_blocks(
                e_ds.join(
                    nodes_ds,
                    join_type="left_anti",
                    num_partitions=n_parts,
                    on=(col,),
                    right_on=("node",),
                ).materialize(),
                schema=edge_schema,
            )
        return e_ds

    def _self_labels(nodes_ds):
        return nodes_ds.map_batches(
            lambda t: pa.table({"node": t.column("node"), "scc": t.column("node")}),
            batch_format="pyarrow",
        ).materialize()

    universe = _col_distinct(edges, ("s", "d"))
    pieces = []  # finalized (node, scc) Datasets
    carved = []  # finalized node sets, for the closing singleton sweep

    # ---- TRIM: in-degree-0 or out-degree-0 nodes are singleton SCCs
    for _ in range(trim_rounds):
        if edges.count() == 0:
            break
        srcs = _col_distinct(edges, ("s",))
        dsts = _col_distinct(edges, ("d",))
        no_in = _anti(srcs, dsts)   # sources nobody points at
        no_out = _anti(dsts, srcs)  # sinks pointing at nobody
        trimmed = drop_empty_blocks(
            _bucketed_distinct(no_in.union(no_out), "node", nb).materialize(),
            schema=node_schema,
        )
        if trimmed.count() == 0:
            break
        pieces.append(_self_labels(trimmed))
        carved.append(trimmed)
        edges = _drop_edges_touching(edges, trimmed)

    # ---- FW-BW pivot carving until the remainder fits the driver
    for _ in range(max_pivots):
        m = edges.count()
        if m == 0 or m <= driver_edge_limit:
            break
        pivot = _min_of(edges, "s")
        fwd = bfs_depths(
            edges, [pivot], src="s", dst="d",
            max_depth=1 << 30, force_distributed=True,
        ).materialize()
        rev = edges.map_batches(
            lambda t: pa.table({"s": t.column("d"), "d": t.column("s")}),
            batch_format="pyarrow",
        ).materialize()
        bwd = bfs_depths(
            rev, [pivot], src="s", dst="d",
            max_depth=1 << 30, force_distributed=True,
        ).materialize()
        member = drop_empty_blocks(
            fwd.select_columns(["node"]).join(
                bwd.select_columns(["node"]),
                join_type="left_semi",
                num_partitions=n_parts,
                on=("node",),
                right_on=("node",),
            ).materialize(),
            schema=node_schema,
        )
        label = _min_of(member, "node")
        pieces.append(
            member.map_batches(
                lambda t, _l=label: pa.table(
                    {
                        "node": t.column("node"),
                        "scc": pa.array([_l] * t.num_rows, id_t),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
        )
        carved.append(member)
        edges = _drop_edges_touching(edges, member)

    # ---- remainder: driver Tarjan under the budget, refuse above it
    m = edges.count()
    if m > driver_edge_limit:
        raise NotImplementedError(
            f"scc_distributed: remainder still over the driver budget "
            f"after {max_pivots} FW-BW pivots (raise max_pivots or the "
            f"budget; see docstring contract)"
        )
    if m > 0:
        part = _scc_on_table(gather_table(edges), "s", "d")
        pieces.append(ray.data.from_arrow(part).materialize())
        carved.append(
            ray.data.from_arrow(pa.table({"node": part.column("node")})).materialize()
        )

    # ---- nodes that lost every edge without being carved are singletons.
    # The carved sets are disjoint and already distinct, so union them
    # (metadata-only) and run ONE left_anti against the universe instead
    # of a per-set chain of full-universe exchanges.
    settled = universe
    if carved:
        allc = carved[0]
        for c in carved[1:]:
            allc = allc.union(c)
        settled = _anti(universe, allc.materialize())
    if settled.count() > 0:
        pieces.append(_self_labels(settled))

    if not pieces:
        return ray.data.from_arrow(out_schema.empty_table())
    out = pieces[0]
    for p_ in pieces[1:]:
        out = out.union(p_)
    return drop_empty_blocks(out.materialize(), schema=out_schema)


def q_graph_scc(sf_dir: str):
    """Driver entry: strongly connected components of the DIRECTED
    co-supplier graph (parity-oriented co-supply edges — see
    ``cosupply_directed_edges``), scc = smallest member id. Oracled via a
    recursive-CTE transitive closure: u and v share an SCC iff reach(u,v)
    AND reach(v,u) (feasible because the oracle graph is small, the same
    argument as graph_components)."""

    edges = cosupply_directed_edges(sf_dir).map_batches(
        _split_directed, batch_format="pyarrow"
    )
    comp = scc(edges)
    return comp.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("node"), "scc": t.column("scc")}
        ),
        batch_format="pyarrow",
    )

# ---------------------------------------------------------------------------
# Multi-source BFS depths + deterministic random walks
# ---------------------------------------------------------------------------
# Frontier BFS (Pregel-style) and node2vec-style walk sampling are the two
# iterative primitives a KG/link-graph stack still lacked next to
# pagerank/cc/scc: BFS powers crawl-radius and entity-neighborhood cuts,
# walks power graph-embedding samplers. Both are size-adaptive like
# connected_components: a driver CSR kernel under BFS_DRIVER_EDGE_LIMIT,
# and a per-round join path above it (equivalence-tested; rounds =
# O(depth) sequential exchanges with .materialize() barriers so two
# all-to-alls never share a streaming plan).

BFS_DRIVER_EDGE_LIMIT = 5_000_000
BFS_MAX_DEPTH = 16
WALK_A, WALK_B, WALK_C = 7919, 104729, 31  # next-step mix constants
# ids fold to 31 bits BEFORE the mix so the products can never exceed
# ~2^48 — int64-exact for ANY id (hash64-derived entity/host ids wrap
# numpy int64 otherwise, silently diverging from the exact SQL/Python
# arithmetic; & is two's-complement on both numpy and DuckDB BIGINT,
# so negative ids fold identically on both sides)
WALK_FOLD = 0x7FFFFFFF



def _sorted_csr(src: np.ndarray, dst: np.ndarray):
    """Renumber int64 endpoints and return (nodes, dst_sorted, head, tail)
    with each node's out-neighbors ASCENDING (the walk contract: rank in
    the sorted neighbor list is the SQL ROW_NUMBER() ... ORDER BY b)."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    if n == 0:
        z = np.empty(0, np.int64)
        return nodes, z, z, z
    s = inv[: len(src)].astype(np.int64)
    d = inv[len(src) :].astype(np.int64)
    packed = np.unique(s * np.int64(n) + d)  # sorted by (s, d) => d asc per s
    s, d = packed // n, packed % n
    head = np.searchsorted(s, np.arange(n))
    tail = np.searchsorted(s, np.arange(n), side="right")
    return nodes, d, head, tail


def bfs_driver(
    src: np.ndarray, dst: np.ndarray, seeds: np.ndarray, max_depth: int
) -> pa.Table:
    """(node, depth) = shortest hop count from the seed SET over a directed
    int64 edge list, vectorized frontier expansion on a sorted CSR. Seeds
    absent from the graph still come out at depth 0 (isolated sources —
    matches the SQL oracle's seed-anchored recursion)."""
    nodes, d, head, tail = _sorted_csr(src, dst)
    n = len(nodes)
    seed_arr = np.unique(np.asarray(seeds, dtype=np.int64))
    out_nodes = [seed_arr]
    out_depth = [np.zeros(len(seed_arr), np.int64)]
    if n == 0:
        return pa.table(
            {
                "node": pa.array(np.concatenate(out_nodes), pa.int64()),
                "depth": pa.array(np.concatenate(out_depth), pa.int64()),
            }
        )
    pos = np.searchsorted(nodes, seed_arr)
    in_graph = (pos < n) & (nodes[np.minimum(pos, n - 1)] == seed_arr)
    dist = np.full(n, -1, np.int64)
    frontier = pos[in_graph]
    dist[frontier] = 0
    for depth in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        counts = (tail[frontier] - head[frontier]).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            break
        starts = np.repeat(head[frontier], counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        nbrs = np.unique(d[starts + offs])
        new = nbrs[dist[nbrs] < 0]
        if len(new) == 0:
            break
        dist[new] = depth
        out_nodes.append(nodes[new])
        out_depth.append(np.full(len(new), depth, np.int64))
        frontier = new
    return pa.table(
        {
            "node": pa.array(np.concatenate(out_nodes), pa.int64()),
            "depth": pa.array(np.concatenate(out_depth), pa.int64()),
        }
    )


def _bucketed_distinct(ds, col: str, nb: int):
    """One bounded bucketed exchange -> distinct values of ``col`` (the
    repo-standard alternative to a high-cardinality Ray groupby)."""
    def tag(t: pa.Table) -> pa.Table:
        arr = pc.unique(t.column(col).combine_chunks())
        if pa.types.is_integer(arr.type):
            h = hash64_ints(arr.to_numpy(zero_copy_only=False).astype("int64"), salt=0xBF5)
        else:
            from pie_ray.util import bucket_hash_strings

            h = bucket_hash_strings(arr, salt=0xBF5)
        return pa.table(
            {col: arr, "bucket": pa.array((h % nb).astype("int32"), pa.int32())}
        )

    def uniq(g: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(g.column(col).combine_chunks())})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def bfs_depths(
    edges_ds,
    seeds,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = BFS_MAX_DEPTH,
    force_distributed: bool = False,
):
    """Multi-source BFS over ANY directed edge Dataset (int64 OR string
    node ids — host graphs are strings) -> Dataset ``(node, depth)``,
    depth = fewest hops from the seed set (capped at ``max_depth``;
    unreached nodes are absent). ``seeds`` is a small explicit id list
    (crawl seeds / trusted hosts / entity anchors — the caller owns its
    size).

    Size-adaptive: below ``BFS_DRIVER_EDGE_LIMIT`` edges the vectorized CSR
    frontier kernel runs on the driver (string ids run through the same
    sorted-dictionary index mapping as ``scc``); above it (or forced),
    Pregel-style frontier rounds run distributed on the raw ids — each
    round is one inner join (edges x frontier), one bucketed distinct, and
    one left_anti join against the settled set, materialized between
    rounds so exchanges never overlap in one streaming plan. Rounds =
    reached depth <= max_depth. Both paths agree by construction
    (equivalence-tested for both id types)."""
    import ray

    from pie_ray.util import drop_empty_blocks

    edges = edges_ds.materialize()
    m = edges.count()
    seed_list = list(seeds)
    if not seed_list:
        # typed empty result (an empty seed array would infer type null,
        # and the distributed loop's joins CRASH on 0-row inputs)
        sch = edges.schema()
        id_t = (
            sch.types[sch.names.index(src)]
            if sch is not None and src in sch.names
            else pa.int64()
        )
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], id_t), "depth": pa.array([], pa.int64())}
            )
        )
    seed_pa = pc.unique(pa.array(seed_list))
    seed_pa = seed_pa.take(pc.sort_indices(seed_pa))
    # cast seeds to the EDGE id type (int width / string flavor): the
    # distributed joins crash on mismatched key types, and the driver
    # string path's chunked_array refuses mixed string/large_string —
    # casts within a type class preserve the sort order above
    sch = edges.schema()
    if sch is not None and src in sch.names:
        edge_t = sch.types[sch.names.index(src)]
        numeric_pair = pa.types.is_integer(edge_t) and (
            pa.types.is_integer(seed_pa.type)
            or pa.types.is_floating(seed_pa.type)
        )
        string_pair = (
            pa.types.is_string(edge_t) or pa.types.is_large_string(edge_t)
        ) and (
            pa.types.is_string(seed_pa.type)
            or pa.types.is_large_string(seed_pa.type)
        )
        if not seed_pa.type.equals(edge_t) and (numeric_pair or string_pair):
            seed_pa = pc.cast(seed_pa, edge_t)  # safe cast: raises on loss
    is_str = pa.types.is_string(seed_pa.type) or pa.types.is_large_string(seed_pa.type)
    zero_depth = pa.array(np.zeros(len(seed_pa), np.int64), pa.int64())
    if m == 0:
        # seeds at depth 0 on any empty graph — on BOTH paths (the
        # distributed rounds would otherwise join 0-row edges, a crash)
        return ray.data.from_arrow(
            pa.table({"node": seed_pa, "depth": zero_depth})
        )
    if m <= BFS_DRIVER_EDGE_LIMIT and not force_distributed:
        tbl = gather_table(edges)
        sa, da = tbl.column(src), tbl.column(dst)
        if is_str:
            # shared sorted-dictionary mapping (same helper as scc):
            # indices preserve name order, so bfs_driver's searchsorted
            # seed guard and the take-back both stay exact
            names, (s_idx, d_idx, seed_idx) = _string_index_map(
                [sa, da, seed_pa]
            )
            out = bfs_driver(s_idx, d_idx, seed_idx, max_depth)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": names.take(out.column("node")),
                        "depth": out.column("depth"),
                    }
                )
            )
        return ray.data.from_arrow(
            bfs_driver(
                sa.to_numpy(zero_copy_only=False).astype(np.int64),
                da.to_numpy(zero_copy_only=False).astype(np.int64),
                seed_pa.to_numpy(zero_copy_only=False).astype(np.int64),
                max_depth,
            )
        )

    nb = bucket_count(edges.size_bytes(), floor=N_BUCKETS)
    n_parts = join_num_partitions(edges.size_bytes())
    settled = ray.data.from_arrow(
        pa.table({"node": seed_pa, "depth": zero_depth})
    ).materialize()
    frontier = settled
    for depth in range(1, max_depth + 1):
        # barrier + empty-block normalization between the join and the
        # bucketed-distinct groupby: two all-to-alls must never share one
        # streaming plan (CLAUDE.md invariant — hangs at num_cpus=4), and
        # the join's zero-row empty-schema blocks would bypass the rename
        # map and crash the exchange
        hop = drop_empty_blocks(
            edges.join(
                frontier.select_columns(["node"]),
                join_type="inner",
                num_partitions=n_parts,
                on=(src,),
                right_on=("node",),
            ).materialize()
        )
        cand = drop_empty_blocks(
            _bucketed_distinct(
                hop.map_batches(
                    lambda t: pa.table({"node": t.column(dst)}),
                    batch_format="pyarrow",
                ),
                "node",
                nb,
            ).materialize()
        )
        if cand.count() == 0:
            break
        new = drop_empty_blocks(
            cand.join(
                settled.select_columns(["node"]),
                join_type="left_anti",
                num_partitions=n_parts,
                on=("node",),
                right_on=("node",),
            ).materialize()
        )
        if new.count() == 0:
            break
        tagged = new.map_batches(
            lambda t, _d=depth: pa.table(
                {
                    "node": t.column("node"),
                    "depth": pa.array(
                        np.full(t.num_rows, _d, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        settled = settled.union(tagged).materialize()
        frontier = tagged
    return settled


def q_graph_bfs(sf_dir: str):
    """Driver entry: BFS depth from the seed set {s_suppkey % 7 == 0} over
    the UNDIRECTED co-supplier graph (both directions of
    ``cooccurrence_edges``). Oracled via a depth-capped recursive CTE
    (feasible because (node, d) pairs are bounded by n * (max_depth+1) —
    same small-oracle-graph argument as graph_components)."""
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
    )
    sk = gather_table(supp).column("s_suppkey").to_numpy(zero_copy_only=False)
    seeds = np.asarray(sk, dtype=np.int64)
    seeds = seeds[seeds % 7 == 0]

    edges = cooccurrence_edges(sf_dir).map_batches(
        _split_undirected, batch_format="pyarrow"
    )
    res = bfs_depths(edges, seeds)
    return res.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("node"), "depth": t.column("depth")}
        ),
        batch_format="pyarrow",
    )


def walks_driver(
    src: np.ndarray,
    dst: np.ndarray,
    seeds: np.ndarray,
    num_steps: int,
) -> pa.Table:
    """(seed, step, node) deterministic walks over a directed int64 edge
    list, vectorized across ALL walkers per step on a sorted CSR. The next
    hop from ``node`` at ``step`` is the neighbor at rank
    ``((node & WALK_FOLD)*WALK_A + step*WALK_B + (seed & WALK_FOLD)*WALK_C)
    % degree`` in the
    ASCENDING neighbor list — a pure function of (seed, step, node), so
    the walk set is partitioning-free and SQL-expressible (ROW_NUMBER
    rank + the same mix, see the oracle). Walkers at out-degree-0 nodes
    stop (their remaining steps are absent)."""
    nodes, d, head, tail = _sorted_csr(src, dst)
    n = len(nodes)
    seed_arr = np.unique(np.asarray(seeds, dtype=np.int64))
    out_seed = [seed_arr]
    out_step = [np.zeros(len(seed_arr), np.int64)]
    out_node = [seed_arr]
    if n == 0 or len(seed_arr) == 0:
        return pa.table(
            {
                "seed": pa.array(np.concatenate(out_seed), pa.int64()),
                "step": pa.array(np.concatenate(out_step), pa.int64()),
                "node": pa.array(np.concatenate(out_node), pa.int64()),
            }
        )
    pos = np.searchsorted(nodes, seed_arr)
    in_graph = (pos < n) & (nodes[np.minimum(pos, n - 1)] == seed_arr)
    w_seed = seed_arr[in_graph]
    w_idx = pos[in_graph]
    for step in range(1, num_steps + 1):
        if len(w_idx) == 0:
            break
        deg = (tail[w_idx] - head[w_idx]).astype(np.int64)
        alive = deg > 0
        if not alive.any():
            break
        w_seed, w_idx, deg = w_seed[alive], w_idx[alive], deg[alive]
        cur_id = nodes[w_idx]
        rank = (
            (cur_id & WALK_FOLD) * WALK_A
            + step * WALK_B
            + (w_seed & WALK_FOLD) * WALK_C
        ) % deg
        w_idx = d[head[w_idx] + rank]
        out_seed.append(w_seed)
        out_step.append(np.full(len(w_seed), step, np.int64))
        out_node.append(nodes[w_idx])
    return pa.table(
        {
            "seed": pa.array(np.concatenate(out_seed), pa.int64()),
            "step": pa.array(np.concatenate(out_step), pa.int64()),
            "node": pa.array(np.concatenate(out_node), pa.int64()),
        }
    )


def ranked_adjacency(edges_ds, src: str = "src", dst: str = "dst", nb: int | None = None):
    """Distributed ranked adjacency (a, b, rn, deg) with rn = 0-based rank
    of b in a's ASCENDING neighbor list: ONE bucketed exchange on hash(a),
    then a vectorized per-bucket sort + run-length rank (no per-node
    Python). The walk scale path joins the frontier against this."""
    edges = edges_ds.materialize()
    if nb is None:
        nb = bucket_count(edges.size_bytes(), floor=N_BUCKETS)

    def tag(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash64_ints(a, salt=0xADA) % nb
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": t.column(dst),
                "bucket": pa.array(h.astype(np.int32), pa.int32()),
            }
        )

    def rank_bucket(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = g.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        # distinct (a, b): duplicate edges would corrupt ranks
        if len(a):
            keep = np.ones(len(a), bool)
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        starts = np.ones(len(a), bool)
        if len(a):
            starts[1:] = a[1:] != a[:-1]
        grp = np.cumsum(starts) - 1
        first = np.flatnonzero(starts)
        rn = np.arange(len(a), dtype=np.int64) - first[grp]
        counts = np.diff(np.append(first, len(a)))
        deg = counts[grp].astype(np.int64)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    from pie_ray.util import drop_empty_blocks

    out = (
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )
    return drop_empty_blocks(
        out.materialize(),
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("rn", pa.int64()), ("deg", pa.int64())]
        ),
    )


def random_walks(
    edges_ds,
    seeds,
    num_steps: int = 8,
    src: str = "src",
    dst: str = "dst",
    force_distributed: bool = False,
):
    """Deterministic rank-based walks (node2vec-style sampler shape) over
    ANY directed int64 edge Dataset -> Dataset ``(seed, step, node)``:
    one row per walker per step 0..num_steps, next hop = neighbor at rank
    ``((node & WALK_FOLD)*WALK_A + step*WALK_B + (seed & WALK_FOLD)*WALK_C)
    % degree`` in the sorted
    neighbor list. The mix makes every walk a pure function of the graph
    and the seed id — independent of partitioning, batch size, and
    parallelism, and exactly reproducible by the SQL oracle.

    Size-adaptive: below ``BFS_DRIVER_EDGE_LIMIT`` edges a vectorized CSR
    kernel steps ALL walkers at once on the driver; above it (or forced),
    each step is one inner join of the walker frontier against the ranked
    adjacency plus a vectorized rank filter, materialized per step. At
    scale, walkers per step is the seed count — the frontier never grows,
    so the join cost is num_steps bounded exchanges."""
    import ray

    from pie_ray.util import drop_empty_blocks

    edges = edges_ds.materialize()
    m = edges.count()
    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if m == 0 or len(seed_arr) == 0:
        # degenerate on BOTH paths: the forced-distributed per-step joins
        # CRASH on 0-row inputs, and the driver kernel already answers
        # (seed step-0 rows only / empty)
        return ray.data.from_arrow(
            walks_driver(
                np.empty(0, np.int64), np.empty(0, np.int64), seed_arr, num_steps
            )
        )
    if m <= BFS_DRIVER_EDGE_LIMIT and not force_distributed:
        tbl = gather_table(edges)
        return ray.data.from_arrow(
            walks_driver(
                tbl.column(src).to_numpy(zero_copy_only=False).astype(np.int64),
                tbl.column(dst).to_numpy(zero_copy_only=False).astype(np.int64),
                seed_arr,
                num_steps,
            )
        )

    adj = ranked_adjacency(edges, src=src, dst=dst).materialize()
    n_parts = join_num_partitions(edges.size_bytes())
    frontier = ray.data.from_arrow(
        pa.table(
            {
                "seed": pa.array(seed_arr, pa.int64()),
                "node": pa.array(seed_arr, pa.int64()),
            }
        )
    ).materialize()
    acc = frontier.map_batches(
        lambda t: pa.table(
            {
                "seed": t.column("seed"),
                "step": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "node": t.column("node"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    out_parts = [acc]
    for step in range(1, num_steps + 1):
        hop = frontier.join(
            adj,
            join_type="inner",
            num_partitions=n_parts,
            on=("node",),
            right_on=("a",),
        )

        def pick(t: pa.Table, _s=step) -> pa.Table:
            sd = t.column("seed").to_numpy(zero_copy_only=False).astype(np.int64)
            node = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
            rn = t.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
            deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
            want = (
                (node & WALK_FOLD) * WALK_A
                + _s * WALK_B
                + (sd & WALK_FOLD) * WALK_C
            ) % deg
            keep = rn == want
            return pa.table(
                {
                    "seed": pa.array(sd[keep], pa.int64()),
                    "node": pa.array(b[keep], pa.int64()),
                }
            )

        nxt = drop_empty_blocks(
            hop.map_batches(pick, batch_format="pyarrow").materialize(),
            schema=pa.schema([("seed", pa.int64()), ("node", pa.int64())]),
        )
        if nxt.count() == 0:
            break
        tagged = nxt.map_batches(
            lambda t, _s=step: pa.table(
                {
                    "seed": t.column("seed"),
                    "step": pa.array(np.full(t.num_rows, _s, np.int64), pa.int64()),
                    "node": t.column("node"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        out_parts.append(tagged)
        frontier = nxt
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out.materialize()


def q_graph_walks(sf_dir: str):
    """Driver entry: deterministic 8-step walks from the seed set
    {graph nodes with suppkey % 3 == 0} ∪ {min graph node} over the
    UNDIRECTED co-supplier graph. Oracled via a recursive CTE over a
    ROW_NUMBER-ranked adjacency applying the identical rank mix — every
    engine row must reproduce exactly (the walk is a pure function of the
    graph and the seed). The seed pull is bounded by the supplier node
    universe (a dimension, never the fact table)."""

    edges = cooccurrence_edges(sf_dir).map_batches(
        _split_undirected, batch_format="pyarrow"
    )
    edges = edges.materialize()
    # seed derivation is size-gated like the walk itself: under the driver
    # budget the node set comes from the SAME bounded pull random_walks is
    # about to take (block refs are reused — no recompute, no exchange);
    # only past the budget does the bucketed-distinct exchange pay for
    # itself
    if edges.count() <= BFS_DRIVER_EDGE_LIMIT:
        nodes = np.unique(
            gather_table(edges).column("src").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
    else:
        nodes = gather_table(
            _bucketed_distinct(
                edges.select_columns(["src"]),
                "src",
                bucket_count(edges.size_bytes(), floor=N_BUCKETS),
            ).materialize()
        ).column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    seeds = nodes[nodes % 3 == 0]
    if len(nodes):
        seeds = np.union1d(seeds, nodes.min())
    return random_walks(edges, seeds, num_steps=8)
