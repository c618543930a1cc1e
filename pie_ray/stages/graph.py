"""A14–A17 — edge aggregation (skew-safe), adjacency build, partitioned sink.

A15 edge aggregation runs in two phases (the salted/combiner pattern,
SURVEY.md A14): phase 1 collapses duplicates inside every Arrow batch with a
vectorized ``Table.group_by`` — each batch acts as an implicit random salt
partition, so hot (src,dst,pred) keys ship at most one row per block into
the shuffle; phase 2 is the small global groupby. This is what makes the
canonicalization->edge shuffle safe under Zipf-skewed hot entities (the
corpus's domain distribution is Zipf(1.2) by construction).

A16 groups edges by src into list<struct> adjacency rows and assigns
``part = hash(src) % P``; A17 writes Parquet partitioned by ``part`` so a
resumable run addresses partitions independently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray import schemas
from pie_ray.util import hash64_array

DEFAULT_NUM_PARTS = 64


def _edges_from_triples(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "src": batch.column("subj"),
            "dst": batch.column("obj"),
            "pred": batch.column("pred"),
            "warc_ts": batch.column("warc_ts"),
        }
    )


def _partial_edge_agg(batch: pa.Table) -> pa.Table:
    from pie_ray.util import rename_grouped

    gb = batch.group_by(["src", "dst", "pred"]).aggregate(
        [("warc_ts", "count"), ("warc_ts", "min"), ("warc_ts", "max")]
    )
    return rename_grouped(
        gb, ["src", "dst", "pred"], ["src", "dst", "pred", "weight", "first_ts", "last_ts"]
    )


EDGE_BUCKETS = 64


def aggregate_edges(triples_ds, num_buckets: int = EDGE_BUCKETS):
    """A15 — T3 triples -> aggregated weighted edges (EDGES schema).

    Same bucketed-shuffle pattern as A9 dedup: shuffle on
    ``hash(src) % num_buckets`` (src alone — so the SAME shuffle also
    co-locates everything A16 adjacency needs, letting the planner fuse the
    two stages into one exchange), then vectorized Arrow ``group_by`` per
    bucket. High-cardinality Ray groupbys walk groups in Python — avoided."""
    from pie_ray.util import bucket_hash_strings

    def add_bucket(t: pa.Table) -> pa.Table:
        t = _partial_edge_agg(_edges_from_triples(t))
        # vectorized FNV bucket hash (shuffle-spreading only; the RESULT-
        # visible part assignment below stays blake2b — recorded contract)
        buckets = (bucket_hash_strings(t.column("src"), salt=0x6BA7) % num_buckets).astype(
            "int32"
        )
        return t.append_column("bucket", pa.array(buckets, pa.int32()))

    def agg_bucket(group: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = rename_grouped(
            group.group_by(["src", "dst", "pred"]).aggregate(
                [("weight", "sum"), ("first_ts", "min"), ("last_ts", "max")]
            ),
            ["src", "dst", "pred"],
            ["src", "dst", "pred", "weight", "first_ts", "last_ts"],
        )
        return pa.table(
            {
                "src": gb.column("src"),
                "dst": gb.column("dst"),
                "pred": gb.column("pred"),
                "weight": pc.cast(gb.column("weight"), pa.int64()),
                "first_ts": gb.column("first_ts").cast(pa.timestamp("us")),
                "last_ts": gb.column("last_ts").cast(pa.timestamp("us")),
            },
            schema=schemas.EDGES,
        )

    bucketed = triples_ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(agg_bucket, batch_format="pyarrow")


def aggregate_edges_to_adjacency(
    triples_ds, num_parts: int = DEFAULT_NUM_PARTS, num_buckets: int = EDGE_BUCKETS
):
    """A15+A16 fused: triples -> adjacency on ONE src-bucketed exchange.

    The adjacency build requires every src's edges in one batch. Running it
    inside the same ``map_groups`` body as the edge aggregate makes that a
    structural guarantee (one function call sees the whole bucket) instead
    of an assumption about Ray's block slicing — a bucket whose aggregated
    edge table exceeds target_max_block_size would otherwise be split
    mid-src downstream and emit duplicate src rows with partial adjacency."""
    from pie_ray.util import bucket_hash_strings as _h

    def add_bucket(t: pa.Table) -> pa.Table:
        t = _partial_edge_agg(_edges_from_triples(t))
        # vectorized FNV bucket hash (same note as aggregate_edges)
        buckets = (_h(t.column("src"), salt=0x6BA7) % num_buckets).astype("int32")
        return t.append_column("bucket", pa.array(buckets, pa.int32()))

    def agg_and_adj(group: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = rename_grouped(
            group.drop_columns(["bucket"])
            .group_by(["src", "dst", "pred"])
            .aggregate([("weight", "sum"), ("first_ts", "min"), ("last_ts", "max")]),
            ["src", "dst", "pred"],
            ["src", "dst", "pred", "weight", "first_ts", "last_ts"],
        )
        edges = pa.table(
            {
                "src": gb.column("src"),
                "dst": gb.column("dst"),
                "pred": gb.column("pred"),
                "weight": pc.cast(gb.column("weight"), pa.int64()),
                "first_ts": gb.column("first_ts").cast(pa.timestamp("us")),
                "last_ts": gb.column("last_ts").cast(pa.timestamp("us")),
            },
            schema=schemas.EDGES,
        )
        return adjacency_batch(edges, num_parts)

    bucketed = triples_ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(agg_and_adj, batch_format="pyarrow")


def adjacency_batch(t: pa.Table, num_parts: int = DEFAULT_NUM_PARTS) -> pa.Table:
    """Vectorized A16 body: a src-complete edge batch -> adjacency rows.

    Requires every src's edges to be entirely within the batch (true for
    blocks produced by ``aggregate_edges`` — its shuffle key is src alone).
    One Arrow sort + run-length detection; no per-group Python loop."""
    if t.num_rows == 0:
        return schemas.GRAPH.empty_table()
    order = pc.sort_indices(
        t, sort_keys=[("src", "ascending"), ("pred", "ascending"), ("dst", "ascending")]
    )
    t = t.take(order)
    entries = pa.StructArray.from_arrays(
        [
            t.column("dst").combine_chunks(),
            t.column("pred").combine_chunks(),
            t.column("weight").combine_chunks(),
            t.column("first_ts").combine_chunks(),
            t.column("last_ts").combine_chunks(),
        ],
        fields=list(schemas.ADJ_ENTRY),
    )
    src = np.asarray(t.column("src").to_pylist(), dtype=object)
    change = np.empty(len(src), bool)
    change[0] = True
    change[1:] = src[1:] != src[:-1]
    starts = np.flatnonzero(change)
    offsets = np.append(starts, len(src)).astype("int32")
    adj = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), entries)
    srcs = src[starts]
    degree = np.diff(offsets).astype("int64")
    part = (hash64_array(list(srcs), salt=b"part") % np.uint64(num_parts)).astype("int32")
    return pa.table(
        {
            "src": pa.array(list(srcs), pa.string()),
            "adj": adj,
            "degree": pa.array(degree),
            "part": pa.array(part),
        },
        schema=schemas.GRAPH,
    )


def build_adjacency(edges_ds, num_parts: int = DEFAULT_NUM_PARTS, assume_partitioned: bool = False):
    """A16 — edges -> adjacency-list rows with partition assignment.

    Default re-buckets by src (correct for arbitrary edge input). The
    pipeline path uses ``aggregate_edges_to_adjacency`` instead, which fuses
    the build into the edge-aggregate exchange; ``assume_partitioned=True``
    remains for callers that GUARANTEE src-complete input batches (it is an
    assumption Ray's block slicing does not protect at large block sizes)."""
    if not assume_partitioned:
        from pie_ray.util import hash64_array as _h

        def add_bucket(t: pa.Table) -> pa.Table:
            b = (_h(t.column("src").to_pylist(), salt=b"gpart") % EDGE_BUCKETS).astype("int32")
            return t.append_column("bucket", pa.array(b, pa.int32()))

        return (
            edges_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(
                lambda g: adjacency_batch(g.drop_columns(["bucket"]), num_parts),
                batch_format="pyarrow",
            )
        )
    return edges_ds.map_batches(
        lambda t: adjacency_batch(t, num_parts), batch_format="pyarrow"
    )


PAGERANK_MAX_NODES = 50_000_000  # rank vector must fit the object store
PAGERANK_DRIVER_EDGES = 5_000_000  # aggregated edges pulled for local iteration


def pagerank(edges_ds, damping: float = 0.85, iters: int = 8):
    """Weighted PageRank over an EDGES-schema Dataset.

    The edge list is AGGREGATED (distinct (src,dst,pred) with weights —
    orders of magnitude smaller than the corpus that produced it) and is
    materialized ONCE; below PAGERANK_DRIVER_EDGES the iteration runs
    driver-local over numpy index arrays in a FIXED sorted edge order, so
    ranks are bit-deterministic regardless of upstream partitioning (the
    repo invariant). Above the threshold, broadcast-rank distributed rounds
    take over (ranks via ray.put, per-batch Arrow combine of contributions;
    float summation order there varies in the last ulps with batching —
    documented trade-off at graph scales where the driver path can't hold
    the edge list). Dangling mass redistributes uniformly. Returns a
    pa.Table (node, rank) with rank rounded to 10dp."""
    import ray as _ray

    # one materialization: every path below re-reads edges at least twice,
    # and without this the ENTIRE upstream plan (possibly a full corpus
    # pipeline) would re-execute once per consumer pass
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges <= PAGERANK_DRIVER_EDGES:
        return _pagerank_local(edges_ds, damping, iters)
    if n_edges > PAGERANK_MAX_NODES:
        # nodes <= 2*edges, so past this edge count the (node, rank)
        # broadcast arrays can no longer ride ray.put — ranks stay a
        # DATASET and each round is joins (returns a Dataset, the only
        # driver-safe shape at that scale)
        return _pagerank_join(edges_ds, damping, iters)

    # node set + out-weight per src: ONE distributed pass of per-batch
    # partials, node-bounded driver combine (no exchange)
    def node_partials(t: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = t.group_by(["src"]).aggregate([("weight", "sum")])
        gb = rename_grouped(gb, ["src"], ["node", "out_w"])
        dst = pa.table(
            {
                "node": pc.unique(t.column("dst")),
            }
        )
        dst = dst.append_column("out_w", pa.array([0] * dst.num_rows, pa.int64()))
        return pa.concat_tables([gb.cast(dst.schema), dst])

    parts = edges_ds.map_batches(node_partials, batch_format="pyarrow").take_all()
    out_w: dict[str, int] = {}
    for r in parts:
        out_w[r["node"]] = out_w.get(r["node"], 0) + int(r["out_w"])
    nodes = sorted(out_w)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
    keys_arr = pa.array(nodes, pa.string())
    outw_arr = np.array([max(out_w[v], 0) for v in nodes], dtype=np.float64)
    ranks = np.full(n, 1.0 / n)

    def contrib(t: pa.Table, rank_ref=None) -> pa.Table:
        from pie_ray.util import rename_grouped

        keys_, ranks_, outw_ = _ray.get(rank_ref)
        si = pc.index_in(t.column("src").combine_chunks(), value_set=keys_)
        si_np = si.to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        send = ranks_[si_np] * w / outw_[si_np]
        part = pa.table({"dst": t.column("dst"), "c": pa.array(send)})
        gb = part.group_by(["dst"]).aggregate([("c", "sum")])
        return rename_grouped(gb, ["dst"], ["dst", "c"])

    for _ in range(iters):
        ref = _ray.put((keys_arr, ranks, outw_arr))
        sums = np.zeros(n)
        for batch in (
            edges_ds.map_batches(contrib, fn_kwargs={"rank_ref": ref}, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            # vectorized node-id resolve (every dst is a known node; a
            # per-row Python dict lookup here dominated the merge)
            di = pc.index_in(
                batch.column("dst").combine_chunks(), value_set=keys_arr
            ).to_numpy(zero_copy_only=False)
            np.add.at(sums, di, batch.column("c").to_numpy(zero_copy_only=False))
        dangling = ranks[outw_arr == 0].sum()
        ranks = (1.0 - damping) / n + damping * (sums + dangling / n)

    return pa.table(
        {
            "node": keys_arr,
            "rank": pa.array(np.round(ranks, 10)),
        }
    )


def _pagerank_join(edges_ds, damping: float, iters: int):
    """PageRank past broadcast range: the rank vector never visits the
    driver or a ray.put — it is a Dataset (node, out_w, rank) and every
    iteration is (1) edges ⋈ ranks on src -> per-dst contribution partials
    summed in ONE bucketed exchange, (2) a small dangling-mass aggregate,
    (3) ranks ⋈ contributions (left outer) -> new ranks. Materialize
    barriers keep the exchanges sequential (repo rule). Returns a DATASET
    (node, rank) — a driver Table is exactly what this path exists to
    avoid. Float summation order varies in the last ulps with batching
    (same documented trade-off as the broadcast-rank path; ranks round to
    10dp). Equivalence vs the local path is pytest-gated at small n."""
    import ray.data as _rd

    from pie_ray.util import bucket_count, bucket_hash_strings, join_num_partitions

    nb = bucket_count(edges_ds.size_bytes(), floor=64)
    n_parts = join_num_partitions(edges_ds.size_bytes())

    def node_partial(t: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = t.group_by(["src"]).aggregate([("weight", "sum")])
        gb = rename_grouped(gb, ["src"], ["node", "out_w"])
        dst = pa.table({"node": pc.unique(t.column("dst"))})
        dst = dst.append_column("out_w", pa.array([0] * dst.num_rows, pa.int64()))
        out = pa.concat_tables([gb.cast(dst.schema), dst])
        b = (bucket_hash_strings(out.column("node"), salt=0x9A6E) % nb).astype("int32")
        return out.append_column("bucket", pa.array(b, pa.int32()))

    def node_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("out_w", "sum")])
        return rename_grouped(gb, ["node"], ["node", "out_w"])

    from pie_ray.util import drop_empty_blocks

    state = drop_empty_blocks(
        edges_ds.map_batches(node_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(node_combine, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema([("node", pa.string()), ("out_w", pa.int64())]),
    ).materialize()
    n = state.count()
    if n == 0:
        return _rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )

    state = state.map_batches(
        lambda t, n=n: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    def contrib_partial(t: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        ow = t.column("out_w").to_numpy(zero_copy_only=False).astype(np.float64)
        part = pa.table({"dst": t.column("dst"), "c": pa.array(r * w / ow)})
        gb = rename_grouped(
            part.group_by(["dst"]).aggregate([("c", "sum")]), ["dst"], ["node", "s"]
        )
        b = (bucket_hash_strings(gb.column("node"), salt=0x9A6F) % nb).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def contrib_combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["node"]).aggregate([("s", "sum")])
        return rename_grouped(gb, ["node"], ["node", "s"])

    for _ in range(iters):
        joined = edges_ds.join(
            state,
            join_type="inner",
            num_partitions=n_parts,
            on=("src",),
            right_on=("node",),
        ).materialize()
        contrib = drop_empty_blocks(
            joined.map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(contrib_combine, batch_format="pyarrow")
            .materialize(),
            schema=pa.schema([("node", pa.string()), ("s", pa.float64())]),
        ).materialize()
        dangling = (
            state.filter(expr="out_w == 0").sum("rank") or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        state = (
            state.join(
                contrib,
                join_type="left_outer",
                num_partitions=n_parts,
                on=("node",),
                right_on=("node",),
            )
            .map_batches(
                lambda t, base=base: pa.table(
                    {
                        "node": t.column("node"),
                        "out_w": t.column("out_w"),
                        "rank": pc.add(
                            pa.scalar(base),
                            pc.multiply(
                                pa.scalar(damping),
                                pc.coalesce(t.column("s"), pa.scalar(0.0)),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # the JOIN operator also emits zero-row empty-schema blocks for
        # empty hash partitions — strip them or the next round's join dies
        state = drop_empty_blocks(
            state,
            schema=pa.schema(
                [("node", pa.string()), ("out_w", pa.int64()), ("rank", pa.float64())]
            ),
        ).materialize()

    return state.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array(
                    np.round(t.column("rank").to_numpy(zero_copy_only=False), 10)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _pagerank_local(edges_ds, damping: float, iters: int) -> pa.Table:
    """Driver-local iteration over the (small, aggregated) edge list in one
    deterministic sorted order — bit-stable across partitioning."""
    rows = edges_ds.take_all()
    triples = sorted((r["src"], r["dst"], int(r["weight"])) for r in rows)
    nodes = sorted({t[0] for t in triples} | {t[1] for t in triples})
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.array([idx[s] for s, _, _ in triples], np.int64)
    di = np.array([idx[d] for _, d, _ in triples], np.int64)
    w = np.array([wt for _, _, wt in triples], np.float64)
    outw = np.zeros(n)
    np.add.at(outw, si, w)
    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        send = ranks[si] * w / outw[si]
        sums = np.zeros(n)
        np.add.at(sums, di, send)  # fixed edge order -> deterministic floats
        dangling = ranks[outw == 0].sum()
        ranks = (1.0 - damping) / n + damping * (sums + dangling / n)
    return pa.table(
        {"node": pa.array(nodes, pa.string()), "rank": pa.array(np.round(ranks, 10))}
    )


def write_graph(adj_ds, out_dir: str, num_parts: int = DEFAULT_NUM_PARTS) -> None:
    """A17 — partitioned Parquet sink (one directory per part). Records the
    partition-count in a sidecar so point lookups can recompute
    ``hash(src) % P`` without scanning (pipelines/graph_query.py)."""
    import json
    import os

    adj_ds.write_parquet(out_dir, partition_cols=["part"])
    with open(os.path.join(out_dir, "_GRAPH_META.json"), "w") as f:
        json.dump({"num_parts": num_parts, "partition_rule": "blake2b64(src, salt=b'part') % num_parts"}, f)
