"""A10–A13 — entity linking: MinHash signatures, LSH banding, candidate-pair
verification, connected components, canonicalization.

Linking rule (frozen, shared with the golden oracle): two entity keys link
iff exact char-3-gram Jaccard(norm_a, norm_b) >= TAU. MinHash-LSH is the
*blocking* approximation: banding proposes candidate pairs, every candidate
is verified with the TRUE Jaccard, so precision is exact and only recall
depends on (bands, rows). Defaults (128 perms, 64 bands x 2 rows) give
P(candidate | J=0.35) > 0.999.

Scale notes (SURVEY.md §4): the band explode is a stateless map_batches; the
band groupby is the linking shuffle (hash(band_key)); hot bands are capped at
MAX_BAND_SIZE members — beyond the cap a sorted chain (n-1 edges) replaces
the full clique, which preserves within-band connectivity for CC at
O(n) instead of O(n^2) edges. Connected components: driver union-find below
CC_DRIVER_THRESHOLD edges, alternating groupby hash-min label propagation
above it (BTS, ICDE'24 is the scale anchor — PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pie_ray.normalize import char_shingles, jaccard
from pie_ray.state.dsu import DSU
from pie_ray.util import stable_hash64

NUM_PERMS = 128
BANDS = 64
ROWS = 2
TAU = 0.35
MAX_BAND_SIZE = 100
CC_DRIVER_THRESHOLD = 2_000_000

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perms: int = NUM_PERMS) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-add permutation params (odd a, uint64)."""
    rng = np.random.default_rng(20240817)
    a = rng.integers(1, 1 << 62, size=num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 62, size=num_perms, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def minhash_signature(norm: str, num_perms: int = NUM_PERMS) -> np.ndarray:
    """(num_perms,) uint64 MinHash signature over char-3-gram shingles."""
    sh = char_shingles(norm)
    if not sh:
        return np.zeros(num_perms, dtype=np.uint64)
    x = np.array([stable_hash64(s) for s in sorted(sh)], dtype=np.uint64)
    # (P, S) universal-ish hashing with uint64 wraparound; min over shingles
    vals = _PERM_A[:num_perms, None] * x[None, :] + _PERM_B[:num_perms, None]
    return vals.min(axis=1)


def band_rows_batch(batch: pa.Table, bands: int = BANDS, rows: int = ROWS) -> pa.Table:
    """A10 — explode each distinct entity_key into `bands` (band_key, key) rows."""
    keys = batch.column("entity_key").to_pylist()
    out_band: list[str] = []
    out_key: list[str] = []
    for k in keys:
        norm = k.split(":", 1)[1]
        sig = minhash_signature(norm, bands * rows)
        for b in range(bands):
            chunk = sig[b * rows : (b + 1) * rows]
            bk = f"{b}:" + "".join(f"{int(v):016x}" for v in chunk)
            out_band.append(bk)
            out_key.append(k)
    return pa.table({"band_key": pa.array(out_band, pa.string()),
                     "entity_key": pa.array(out_key, pa.string())})


def verify_pairs_batch(batch: pa.Table, tau: float = TAU) -> pa.Table:
    """A11 verify — keep candidate pairs with TRUE Jaccard >= tau."""
    a = batch.column("a").to_pylist()
    b = batch.column("b").to_pylist()
    keep = [
        jaccard(char_shingles(x.split(":", 1)[1]), char_shingles(y.split(":", 1)[1]))
        >= tau
        for x, y in zip(a, b)
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


LINK_BUCKETS = 128


def band_bucket_pairs(group: pa.Table) -> pa.Table:
    """All candidate pairs of one hash-BUCKET of bands (each bucket holds
    complete band groups — shuffle key is hash(band_key)). Bands are walked
    with a plain dict here instead of one Ray group per band_key: Ray's
    per-group dispatch is Python-level and band_key cardinality ~= corpus
    keys × bands."""
    bks = group.column("band_key").to_pylist()
    eks = group.column("entity_key").to_pylist()
    by_band: dict[str, set[str]] = {}
    for bk, ek in zip(bks, eks):
        by_band.setdefault(bk, set()).add(ek)
    out_a: list[str] = []
    out_b: list[str] = []
    seen: set[tuple[str, str]] = set()
    for ks in by_band.values():
        if len(ks) < 2:
            continue
        keys = sorted(ks)
        if len(keys) <= MAX_BAND_SIZE:
            pairs = (
                (keys[i], keys[j])
                for i in range(len(keys))
                for j in range(i + 1, len(keys))
            )
        else:  # hot band: sorted chain preserves connectivity at O(n) edges
            pairs = zip(keys, keys[1:])
        for p in pairs:
            if p not in seen:
                seen.add(p)
                out_a.append(p[0])
                out_b.append(p[1])
    return pa.table({"a": pa.array(out_a, pa.string()), "b": pa.array(out_b, pa.string())})


def candidate_pairs(
    keys_ds,
    bands: int = BANDS,
    rows: int = ROWS,
    tau: float = TAU,
    num_buckets: int = LINK_BUCKETS,
):
    """Entity_key Dataset (need not be distinct) -> verified similar pair
    Dataset (a, b). Shuffle key = hash(band_key) % num_buckets (low
    cardinality; bands of one key spread across buckets uniformly; callers
    with a metadata-sized input derive num_buckets via util.bucket_count)."""
    from pie_ray.util import bucket_hash_strings

    def explode_and_bucket(t: pa.Table) -> pa.Table:
        banded = band_rows_batch(t, bands, rows)
        b = (
            bucket_hash_strings(banded.column("band_key"), salt=0x15B) % num_buckets
        ).astype("int32")
        return banded.append_column("bucket", pa.array(b, pa.int32()))

    banded = keys_ds.map_batches(explode_and_bucket, batch_format="pyarrow")
    pairs = banded.groupby("bucket").map_groups(
        lambda g: band_bucket_pairs(g.drop_columns(["bucket"])), batch_format="pyarrow"
    )
    return pairs.map_batches(
        lambda t: verify_pairs_batch(t, tau), batch_format="pyarrow"
    )


# ---- A12: connected components -----------------------------------------


def cc_driver(pairs_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Driver union-find path: edge list -> {key: canon_id (min member)}.
    Only for candidate-edge sets below CC_DRIVER_THRESHOLD."""
    dsu = DSU()
    for a, b in pairs_rows:
        dsu.union(a, b)
    return dsu.canon_map()


CC_BUCKETS = 64


def _min_label_by_node(ds, src_col: str, lab_col: str, num_buckets: int = CC_BUCKETS):
    """(src_col, lab_col) rows -> (node, label=min) via the bucketed-shuffle
    pattern: hash(node) % num_buckets shuffle, vectorized Arrow group_by min
    inside each bucket (node cardinality is the graph's node count — Ray's
    per-group Python dispatch is avoided)."""
    from pie_ray.util import bucket_hash_strings, hash64_ints

    def add_bucket(t: pa.Table) -> pa.Table:
        # per-batch combine first: shrink shuffle rows to distinct nodes/batch
        gb = t.group_by([src_col]).aggregate([(lab_col, "min")])
        gb = gb.rename_columns([src_col, lab_col])
        col = gb.column(src_col)
        # int node ids (graphops.connected_components over arbitrary edge
        # tables) hash via vectorized splitmix64; strings keep blake2b.
        # Bucket choice only spreads the shuffle — results never depend on it.
        if pa.types.is_integer(col.type):
            h = hash64_ints(col.to_numpy(zero_copy_only=False).astype("int64"), salt=0xCC)
        else:
            h = bucket_hash_strings(col, salt=0xCC)
        b = (h % num_buckets).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def min_bucket(g: pa.Table) -> pa.Table:
        gb = g.group_by([src_col]).aggregate([(lab_col, "min")])
        return gb.rename_columns(["node", "label"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: min_bucket(g.drop_columns(["bucket"])), batch_format="pyarrow")
    )


def cc_distributed(pairs_ds, max_rounds: int = 20):
    """Alternating-shuffle hash-min label propagation (scale path).

    labels(node) starts as min(node, neighbors); each round every node takes
    the min label over itself and its neighbors; converges in O(component
    diameter) rounds (alias clusters: <= 3). All aggregates use the bucketed
    shuffle + vectorized Arrow group_by (no per-node Python dispatch); the
    per-round edge⋈label propagation is Ray's hash join. Returns Dataset
    (node, label). BTS (ICDE'24) is the load-balancing anchor (PAPERS.md)."""
    edges = pairs_ds.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays([t.column("a").combine_chunks(), t.column("b").combine_chunks()]),
                "dst": pa.concat_arrays([t.column("b").combine_chunks(), t.column("a").combine_chunks()]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    from pie_ray.util import bucket_count, drop_empty_blocks, join_num_partitions

    # edges is materialized above -> size_bytes is metadata-cheap
    n_parts = join_num_partitions(edges.size_bytes())
    nb = bucket_count(edges.size_bytes(), floor=CC_BUCKETS)

    labels = _min_label_by_node(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "src": pa.concat_arrays(
                        [t.column("src").combine_chunks(), t.column("src").combine_chunks()]
                    ),
                    "lab": pa.concat_arrays(
                        [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        "src",
        "lab",
        num_buckets=nb,
    ).materialize()
    # the bucketed groupby emits zero-row empty-schema blocks under some
    # layouts and the per-round label JOIN crashes on them — strip by
    # metadata (zero-copy) each time a labels table is (re)built
    labels = drop_empty_blocks(labels).materialize()

    # carry the previous round's fingerprint instead of recomputing it —
    # each _labels_fingerprint is a full label-table pass, so fingerprinting
    # old AND new every round doubled the convergence-check cost
    old_fp = _labels_fingerprint(labels)
    for _ in range(max_rounds):
        # propagate: each edge ships src's current label to dst
        lab_edges = edges.join(
            labels, join_type="inner", num_partitions=n_parts,
            on=("src",), right_on=("node",),
        )
        msgs = lab_edges.map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = drop_empty_blocks(
            _min_label_by_node(
                msgs.union(labels), "node", "label", num_buckets=nb
            ).materialize()
        ).materialize()
        # convergence check: fingerprint of (node, label) assignments
        new_fp = _labels_fingerprint(new_labels)
        labels = new_labels
        if old_fp == new_fp:
            break
        old_fp = new_fp
    return labels


def _labels_fingerprint(labels_ds) -> int:
    def fp_batch(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_pylist()
        labs = t.column("label").to_pylist()
        # per-element 40-bit values: the cross-batch int64 Sum cannot overflow
        s = sum(stable_hash64(f"{n}\x00{l}") & ((1 << 40) - 1) for n, l in zip(nodes, labs))
        return pa.table({"fp": pa.array([s], pa.int64())})

    parts = labels_ds.map_batches(fp_batch, batch_format="pyarrow")
    return int(parts.sum("fp"))


# Bounds the driver-side pull in the local-link path. Counted over the
# per-batch-distinct key STREAM (an upper bound on distinct keys): 2M short
# entity keys ≈ 200 MB on the driver — safe; beyond it the distributed
# banding path engages.
LOCAL_LINK_THRESHOLD = 2_000_000


def local_canon_map(
    keys: list[str], bands: int = BANDS, rows: int = ROWS, tau: float = TAU
) -> dict[str, str]:
    """Driver-local MinHash-LSH + DSU: IDENTICAL banding / verify rule (and
    therefore identical output) as the distributed path, minus the shuffle
    rounds. Used when the distinct linked-entity count is small enough to
    hold on the driver — entities are orders of magnitude fewer than corpus
    rows, so this covers most runs; the distributed path is the escape
    hatch above LOCAL_LINK_THRESHOLD."""
    buckets: dict[bytes, list[str]] = {}
    shing: dict[str, frozenset] = {}
    for k in keys:
        norm = k.split(":", 1)[1]
        shing[k] = char_shingles(norm)
        sig = minhash_signature(norm, bands * rows)
        for b in range(bands):
            bk = bytes([b]) + sig[b * rows : (b + 1) * rows].tobytes()
            buckets.setdefault(bk, []).append(k)
    dsu = DSU()
    seen: set[tuple[str, str]] = set()
    for ks in buckets.values():
        ks = sorted(set(ks))
        if len(ks) < 2:
            continue
        if len(ks) <= MAX_BAND_SIZE:
            pairs = [(ks[i], ks[j]) for i in range(len(ks)) for j in range(i + 1, len(ks))]
        else:  # hot band: chain preserves connectivity at O(n)
            pairs = list(zip(ks, ks[1:]))
        for a, b in pairs:
            if (a, b) in seen:
                continue
            seen.add((a, b))
            if jaccard(shing[a], shing[b]) >= tau:
                dsu.union(a, b)
    return dsu.canon_map()


def build_canon_map(
    keys_ds,
    bands: int = BANDS,
    rows: int = ROWS,
    tau: float = TAU,
    force_distributed: bool = False,
) -> dict[str, str]:
    """A10–A12 end to end: distinct keys -> {entity_key: canon_id}.

    Keys in no component are omitted (identity mapping is the default at
    lookup time). Size-adaptive: below LOCAL_LINK_THRESHOLD distinct keys
    the whole link runs driver-local (same algorithm, no shuffles); above,
    distributed LSH banding + driver union-find below CC_DRIVER_THRESHOLD
    verified edges, distributed hash-min rounds beyond that."""
    if not force_distributed:
        # stream the key batches to the driver, dedup on the fly, abort to
        # the distributed path only if DISTINCT keys exceed the threshold
        # (single pass, no materialize barrier)
        keys_set: set[str] = set()
        over = False
        for batch in keys_ds.iter_batches(batch_format="pyarrow", batch_size=None):
            keys_set.update(batch.column("entity_key").to_pylist())
            if len(keys_set) > LOCAL_LINK_THRESHOLD:
                over = True
                break
        if not over:
            return local_canon_map(sorted(keys_set), bands, rows, tau)
    pairs = candidate_pairs(keys_ds, bands, rows, tau).materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return {}
    if n_edges <= CC_DRIVER_THRESHOLD and not force_distributed:
        rows_ = pairs.take_all()
        return cc_driver([(r["a"], r["b"]) for r in rows_])
    labels = cc_distributed(pairs)
    return {r["node"]: r["label"] for r in labels.take_all()}


# Past this many linked keys a driver dict + ray.put broadcast stops being
# safe (~100 B/key -> 2 GB at the limit); canonicalization then switches to
# the JOIN path (SURVEY §2 A13's else-branch): labels stay a Dataset and
# subj/obj are rewritten via two hash joins. The limit is generous because
# LABELS cover only keys in some component — orders of magnitude fewer than
# corpus rows (docs/SCALE.md).
CANON_BROADCAST_LIMIT = 20_000_000


def build_canon_labels(
    keys_ds,
    bands: int = BANDS,
    rows: int = ROWS,
    tau: float = TAU,
    force_distributed: bool = False,
    force_join_path: bool = False,
):
    """Size-adaptive canon labels: ``("map", dict)`` under
    CANON_BROADCAST_LIMIT linked keys (broadcastable — the common case),
    ``("ds", labels_dataset)`` above it (or when forced, for tests). The
    Dataset form has columns (node, label) and is already materialized."""
    if not force_join_path:
        canon = build_canon_map(keys_ds, bands, rows, tau, force_distributed)
        if len(canon) <= CANON_BROADCAST_LIMIT:
            return ("map", canon)
        import ray.data

        keys_sorted = sorted(canon)
        return (
            "ds",
            ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(keys_sorted, pa.string()),
                        "label": pa.array([canon[k] for k in keys_sorted], pa.string()),
                    }
                )
            ).materialize(),
        )
    pairs = candidate_pairs(keys_ds, bands, rows, tau).materialize()
    if pairs.count() == 0:
        import ray.data

        return (
            "ds",
            ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.string()),
                        "label": pa.array([], pa.string()),
                    }
                )
            ).materialize(),
        )
    return ("ds", cc_distributed(pairs))


def canonicalize_join(triples_ds, labels_ds):
    """A13 join path: rewrite subj (and co-mention obj) through a LABELS
    DATASET via two left-outer hash joins — the escape hatch when the canon
    map exceeds CANON_BROADCAST_LIMIT and a ray.put broadcast would not fit.
    Produces the identical triple set as the broadcast rewrite
    (equivalence-tested); ``.materialize()`` barriers keep the two join
    exchanges out of one streaming plan (repo rule)."""
    import pyarrow.compute as pc

    from pie_ray.util import join_num_partitions

    n_parts = join_num_partitions(labels_ds.size_bytes())

    j1 = triples_ds.join(
        labels_ds,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("subj",),
        right_on=("node",),
    )

    def apply_subj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": pc.coalesce(
                    t.column("label").combine_chunks(),
                    t.column("subj").combine_chunks(),
                ),
                "pred": t.column("pred"),
                "obj": t.column("obj"),
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
                "score": t.column("score"),
            }
        )

    from pie_ray.util import drop_empty_blocks

    # join outputs carry zero-row empty-schema blocks for empty hash
    # partitions; strip before the second join
    half = drop_empty_blocks(
        j1.map_batches(apply_subj, batch_format="pyarrow").materialize()
    ).materialize()

    j2 = half.join(
        labels_ds,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("obj",),
        right_on=("node",),
    )

    def apply_obj(t: pa.Table) -> pa.Table:
        subj = t.column("subj").combine_chunks()
        obj_raw = t.column("obj").combine_chunks()
        is_co = pc.equal(t.column("pred"), pa.scalar("co_mentioned_with"))
        mapped = pc.coalesce(t.column("label").combine_chunks(), obj_raw)
        # only co-mention objects are entity keys — other predicates keep
        # their object verbatim even if it happens to collide with a key
        obj = pc.if_else(is_co, mapped, obj_raw)
        lt = pc.less(subj, obj)
        new_subj = pc.if_else(pc.and_(is_co, pc.invert(lt)), obj, subj)
        new_obj = pc.if_else(pc.and_(is_co, pc.invert(lt)), subj, obj)
        keep = pc.or_(pc.invert(is_co), pc.not_equal(subj, obj))
        out = pa.table(
            {
                "subj": new_subj,
                "pred": t.column("pred"),
                "obj": new_obj,
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
                "score": t.column("score"),
            }
        )
        return out.filter(keep)

    return j2.map_batches(apply_obj, batch_format="pyarrow")


# ---- A13: canonicalize --------------------------------------------------


def _canon_rewrite(batch: pa.Table, keys: pa.Array, vals: pa.Array) -> pa.Table:
    """Vectorized canonicalization body (shared by the task map and the
    actor-pool form): remap subj (and co-mention obj) through the broadcast
    (keys, vals) arrays, re-order co-mention pairs, drop self-loops."""
    import pyarrow.compute as pc

    def remap(col):
        idx = pc.index_in(col, value_set=keys)
        return pc.coalesce(pc.take(vals, idx), col)

    subj = remap(batch.column("subj").combine_chunks())
    obj_raw = batch.column("obj").combine_chunks()
    is_co = pc.equal(batch.column("pred"), pa.scalar("co_mentioned_with"))
    obj = pc.if_else(is_co, remap(obj_raw), obj_raw)
    lt = pc.less(subj, obj)
    new_subj = pc.if_else(pc.and_(is_co, pc.invert(lt)), obj, subj)
    new_obj = pc.if_else(pc.and_(is_co, pc.invert(lt)), subj, obj)
    keep = pc.or_(pc.invert(is_co), pc.not_equal(subj, obj))
    out = pa.table(
        {
            "subj": new_subj,
            "pred": batch.column("pred"),
            "obj": new_obj,
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "score": batch.column("score"),
        }
    )
    return out.filter(keep)


# one live canon map per worker process: the task-pool canonicalize resolves
# the broadcast ObjectRef once per worker (plasma get is zero-copy local
# after the first fetch) and memoizes the derived Arrow arrays here
_CANON_CACHE: dict[bytes, tuple[pa.Array, pa.Array]] = {}

_EMPTY_STR = pa.array([], pa.string())


def _canon_arrays(canon_ref) -> tuple[pa.Array, pa.Array]:
    if canon_ref is None:
        return _EMPTY_STR, _EMPTY_STR
    key = canon_ref.binary()
    hit = _CANON_CACHE.get(key)
    if hit is None:
        import ray

        canon: dict[str, str] = ray.get(canon_ref)
        ks = sorted(canon)
        hit = (pa.array(ks, pa.string()), pa.array([canon[k] for k in ks], pa.string()))
        _CANON_CACHE.clear()
        _CANON_CACHE[key] = hit
    return hit


def canonicalize_batch(batch: pa.Table, canon_ref=None) -> pa.Table:
    """Task-pool A13: plain-function map (runs on existing Ray workers, no
    actor-pool spin-up — the rewrite is pure vectorized Arrow, so there is
    no per-actor state worth paying a pool for)."""
    keys, vals = _canon_arrays(canon_ref)
    return _canon_rewrite(batch, keys, vals)


class CanonMapper:
    """Broadcast map-side canonicalization: the canon map is ray.put() once
    and each actor resolves the ObjectRef in __init__ (never per batch).

    Rewrites `subj` always and `obj` only for co_mentioned_with rows (the
    only predicate whose object is an entity key). Unmapped keys are their
    own canon. After rewriting, subj/obj of co-mention rows are re-ordered
    (subj = min) so the dedup key stays canonical."""

    def __init__(self, canon_ref) -> None:
        import ray

        canon: dict[str, str] = ray.get(canon_ref) if canon_ref is not None else {}
        # dict -> parallel Arrow arrays once per actor; per-batch lookups are
        # then vectorized index_in + take (no Python row loop in the hot path)
        ks = sorted(canon)
        self.keys = pa.array(ks, pa.string())
        self.vals = pa.array([canon[k] for k in ks], pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _canon_rewrite(batch, self.keys, self.vals)


def distinct_person_keys(raw_triples_ds):
    """Per-batch-distinct pre-canon person entity keys from raw triples
    (subjects are always person keys; co_mentioned objects too).

    NOT globally distinct by design — both consumers dedup internally
    (local_canon_map via set, band_bucket_pairs via sorted(set)), so the
    global distinct shuffle is skipped entirely."""
    def keys_batch(t: pa.Table) -> pa.Table:
        # fully vectorized (was a per-row Python set walk — measured on the
        # r4 32-cpu tail: this pass is the whole link-phase cost at 1M
        # pages): unique subjects + unique co-mention objects, one more
        # unique over the concat. Order is irrelevant — both consumers
        # re-dedup and sort internally.
        import pyarrow.compute as pc

        subj = pc.unique(t.column("subj").combine_chunks())
        co = t.filter(pc.equal(t.column("pred"), "co_mentioned_with"))
        obj = pc.unique(co.column("obj").combine_chunks())
        ks = pc.unique(pa.concat_arrays([subj, obj]))
        return pa.table({"entity_key": ks})

    # fan-in WITHOUT an exchange: a second map with a large batch_size
    # coalesces many small per-batch distinct sets into few blocks and
    # re-dedups (pure pipelining — no repartition; an exchange's aggregator
    # spin-up dominated the serial tail of every run, measured round 2).
    # Both consumers still re-dedup internally, so this is purely a size
    # optimization for the driver-side pull.
    def redistinct(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"entity_key": pc.unique(t.column("entity_key"))})

    per_batch = raw_triples_ds.map_batches(keys_batch, batch_format="pyarrow")
    return per_batch.map_batches(redistinct, batch_format="pyarrow", batch_size=262_144)
