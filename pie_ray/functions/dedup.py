"""Deduplication operators for training-data pipelines (exact + near-dup).

Five families, all over the ``documents`` table:

- exact        : md5(text) hash → groupby(hash) keep min(doc_id).
                 Shuffle key = content hash; no skew (hashes uniform).
- minhash-LSH  : word-5-gram shingles → 128-perm MinHash → 16 bands × 8 rows
                 → band groupby (the blocking shuffle) → candidate pairs
                 verified with true Jaccard → connected components →
                 (doc_id, cluster_id) assignment.
- simhash      : 64-bit SimHash over word-ngram features; near-dups share
                 the same value / low Hamming distance. Emitted per doc.
- ngram-jaccard: direct pairwise verify path, reused by minhash-LSH verify.
- embedding    : cosine near-dup over the ``embeddings`` table — normalized
                 vectors, random-hyperplane LSH bucket groupby, within-bucket
                 exact cosine ≥ τ pairs → components.

Scale notes: every pairwise comparison happens only WITHIN an LSH band /
bucket group (capped), never globally; components use the shared driver-DSU /
distributed hash-min path from pie_ray.stages.linking.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from pie_ray.state.dsu import DSU
from pie_ray.util import list_to_matrix, stable_hash64

# ---------------------------------------------------------------------------
# exact dedup — content-hash groupby
# ---------------------------------------------------------------------------


def md5_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    h = [hashlib.md5((s or "").encode("utf-8", "replace")).hexdigest() for s in texts]
    return pa.table(
        {"doc_id": t.column("doc_id"), "text_md5": pa.array(h, pa.string())}
    )


def q_dedup_exact(sf_dir: str):
    """(text_md5, keeper doc_id, n_copies) — survivor = min doc_id.

    Content hashes are the canonical high-cardinality key, so this follows
    the repo rule: per-batch Arrow partials (min doc, count per md5), ONE
    bucketed shuffle on hash(md5) % 64, vectorized Arrow combine per bucket
    — never a Ray groupby keyed on the hash itself (per-group Python
    dispatch at corpus cardinality)."""
    from pie_ray.util import bucket_count, bucket_hash_strings

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    nb = bucket_count(ds.size_bytes(), floor=64)

    def partial(t: pa.Table) -> pa.Table:
        h = md5_batch(t)
        gb = (
            pa.table({"text_md5": h.column("text_md5"), "doc_id": h.column("doc_id")})
            .append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["text_md5"])
            .aggregate([("doc_id", "min"), ("__one", "sum")])
        )
        from pie_ray.util import rename_grouped

        gb = rename_grouped(gb, ["text_md5"], ["text_md5", "keep_doc_id", "n_copies"])
        b = (bucket_hash_strings(gb.column("text_md5"), salt=0xD0) % nb).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def combine(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["text_md5"])
            .aggregate([("keep_doc_id", "min"), ("n_copies", "sum")])
        )
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, ["text_md5"], ["text_md5", "keep_doc_id", "n_copies"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup over documents (word shingles)
# ---------------------------------------------------------------------------

DOC_NUM_PERMS = 128
DOC_BANDS = 16
DOC_ROWS = 8
DOC_SHINGLE_W = 5
DOC_TAU = 0.7
MAX_BUCKET = 200

def _doc_perms(num: int = DOC_NUM_PERMS) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(7177)
    a = rng.integers(1, 1 << 62, size=num, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 62, size=num, dtype=np.uint64)
    return a, b


_DOC_A, _DOC_B = _doc_perms()


def word_shingles(text: str, w: int = DOC_SHINGLE_W) -> set[str]:
    toks = (text or "").lower().split()
    if len(toks) < w:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def doc_minhash(text: str) -> np.ndarray:
    sh = word_shingles(text)
    if not sh:
        return np.zeros(DOC_NUM_PERMS, dtype=np.uint64)
    x = np.fromiter((stable_hash64(s) for s in sh), dtype=np.uint64, count=len(sh))
    return (_DOC_A[:, None] * x[None, :] + _DOC_B[:, None]).min(axis=1)


def doc_band_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out_band: list[str] = []
    out_id: list[int] = []
    for did, s in zip(ids, texts):
        sig = doc_minhash(s)
        for b in range(DOC_BANDS):
            chunk = sig[b * DOC_ROWS : (b + 1) * DOC_ROWS]
            digest = stable_hash64(chunk.tobytes())
            out_band.append(f"{b}:{digest:016x}")
            out_id.append(did)
    return pa.table(
        {"band_key": pa.array(out_band, pa.string()), "doc_id": pa.array(out_id, pa.int64())}
    )


DEDUP_LSH_BUCKETS = 128


def _band_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs for one hash-BUCKET of bands (complete band groups per
    bucket; bands walked with a dict — Ray per-group dispatch is Python-level
    and band_key cardinality is ~docs × bands)."""
    by_band: dict[str, set[int]] = {}
    for bk, did in zip(group.column("band_key").to_pylist(), group.column("doc_id").to_pylist()):
        by_band.setdefault(bk, set()).add(did)
    a: list[int] = []
    b: list[int] = []
    seen: set[tuple[int, int]] = set()
    for ids_set in by_band.values():
        if len(ids_set) < 2:
            continue
        ids = sorted(ids_set)
        if len(ids) <= MAX_BUCKET:
            pairs = ((ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids)))
        else:  # hot bucket: chain keeps connectivity at O(n) edges
            pairs = zip(ids, ids[1:])
        for p in pairs:
            if p not in seen:
                seen.add(p)
                a.append(p[0])
                b.append(p[1])
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def _banded_candidates_raw(docs, num_buckets: int = DEDUP_LSH_BUCKETS):
    """documents Dataset -> candidate pair Dataset (a, b); pairs proposed by
    several bands may repeat across buckets (callers dedup)."""

    def band_and_bucket(t: pa.Table) -> pa.Table:
        from pie_ray.util import bucket_hash_strings

        banded = doc_band_batch(t)
        b = (
            bucket_hash_strings(banded.column("band_key"), salt=0xBAD) % num_buckets
        ).astype("int32")
        return banded.append_column("bucket", pa.array(b, pa.int32()))

    banded = docs.map_batches(band_and_bucket, batch_format="pyarrow")
    return banded.groupby("bucket").map_groups(
        lambda g: _band_pairs(g.drop_columns(["bucket"])), batch_format="pyarrow"
    )


def _distinct_pairs(cand, num_buckets: int = 64):
    """Small bucketed shuffle on hash(a,b) -> globally distinct (a, b)."""

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        h = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64)) % num_buckets
        return t.append_column("pbucket", pa.array(h.astype(np.int32), pa.int32()))

    def uniq_pairs(g: pa.Table) -> pa.Table:
        return g.drop_columns(["pbucket"]).group_by(["a", "b"]).aggregate([])

    return (
        cand.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(uniq_pairs, batch_format="pyarrow")
    )


def _shingle_table(docs):
    """Map stage: (doc_id, sh=list<uint64>) — each doc's distinct word-shingle
    hashes. Hashed-shingle Jaccard equals string-shingle Jaccard up to 2^-64
    collisions; the u64 lists stream through joins without re-reading text."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        blobs = []
        for s in texts:
            sh = word_shingles(s)
            if sh:
                u = np.unique(np.fromiter((stable_hash64(x) for x in sh), np.uint64, len(sh)))
                blobs.append(u.tobytes())  # binary blob: list types can't ride a join
            else:
                blobs.append(b"")
        return pa.table(
            {"doc_id": t.column("doc_id"), "sh": pa.array(blobs, pa.binary())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# Below this many candidate pairs the verify runs driver-side over a
# DISTRIBUTED, candidate-filtered shingle scan (bounded pull: only candidate
# docs' shingle blobs reach the driver, never the corpus). Above it, the
# join-based fully distributed verify engages. Mirrors linking.py's
# LOCAL_LINK_THRESHOLD size-adaptive design; each hash-join exchange costs
# seconds of aggregator spin-up, which dominates when pairs are few.
VERIFY_DRIVER_PAIRS = 200_000


def _candidate_shingles(docs, cand_ids: np.ndarray):
    """Distributed map: (doc_id, shingle blob) for candidate docs ONLY —
    non-candidates are filtered inside the scan tasks."""
    ids_arr = pa.array(np.sort(cand_ids).astype(np.int64))

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("doc_id"), value_set=ids_arr)
        t = t.filter(keep)
        texts = t.column("text").to_pylist()
        blobs = []
        for s in texts:
            sh = word_shingles(s)
            if sh:
                u = np.unique(np.fromiter((stable_hash64(x) for x in sh), np.uint64, len(sh)))
                blobs.append(u.tobytes())
            else:
                blobs.append(b"")
        return pa.table({"doc_id": t.column("doc_id"), "sh": pa.array(blobs, pa.binary())})

    return docs.map_batches(fn, batch_format="pyarrow")


def _verified_pairs(
    docs,
    emit_jaccard: bool = False,
    force_distributed: bool = False,
    num_buckets: int = DEDUP_LSH_BUCKETS,
):
    """Size-adaptive verify of LSH candidate pairs by true Jaccard.

    Small pair sets (the common case — near-dup candidates are a tiny
    fraction of the corpus): verify on the driver against a distributed
    candidate-filtered shingle scan (both pulls bounded by the candidate
    count, never a full-corpus driver scan). Large pair sets: fully
    distributed via two hash joins against the shingle table."""
    cand = _banded_candidates_raw(docs, num_buckets=num_buckets).materialize()
    if not force_distributed and cand.count() <= VERIFY_DRIVER_PAIRS:
        pairs = sorted({(r["a"], r["b"]) for r in cand.take_all()})
        if not pairs:
            cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            if emit_jaccard:
                cols["jaccard"] = pa.array([], pa.float64())
            return ray.data.from_arrow(pa.table(cols))
        ids = np.unique(np.array([p[0] for p in pairs] + [p[1] for p in pairs]))
        sh_map = {
            r["doc_id"]: np.frombuffer(r["sh"], np.uint64)
            for r in _candidate_shingles(docs, ids).take_all()
        }
        empty = np.empty(0, np.uint64)
        jac = [_jac_sorted(sh_map.get(a, empty), sh_map.get(b, empty)) for a, b in pairs]
        a_arr = pa.array([p[0] for p in pairs], pa.int64())
        b_arr = pa.array([p[1] for p in pairs], pa.int64())
        if emit_jaccard:
            tbl = pa.table(
                {
                    "a": a_arr,
                    "b": b_arr,
                    "jaccard": pa.array([round(j, 6) for j in jac], pa.float64()),
                }
            )
        else:
            keep = pa.array([j >= DOC_TAU for j in jac], pa.bool_())
            tbl = pa.table({"a": a_arr, "b": b_arr}).filter(keep)
        return ray.data.from_arrow(tbl)

    # ---- scale path: join-based verify ----------------------------------
    # materialize barriers between the all-to-all exchanges: each exchange
    # holds its own hash-shuffle aggregator actors for its whole lifetime,
    # and running groupby + two joins concurrently deadlocks a small CPU
    # budget. The materialized sets are candidate-pair-sized (tiny vs
    # corpus); the big shingle table itself is never materialized.
    from pie_ray.util import bucket_count, drop_empty_blocks, join_num_partitions

    cand = drop_empty_blocks(
        _distinct_pairs(
            cand, num_buckets=bucket_count(cand.size_bytes(), floor=64)
        ).materialize(),
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    ).materialize()
    sh = _shingle_table(docs)
    # cand is materialized -> size_bytes is metadata-cheap; the CPU floor in
    # join_num_partitions covers the (larger per-row) shingle side
    n_parts = join_num_partitions(cand.size_bytes())

    def _rename_sh_a(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["sh_a" if c == "sh" else c for c in t.column_names])
        if "doc_id" in t.column_names:
            t = t.drop_columns(["doc_id"])
        return t

    j1 = cand.join(sh, join_type="inner", num_partitions=n_parts, on=("a",), right_on=("doc_id",))
    j1 = j1.map_batches(_rename_sh_a, batch_format="pyarrow").materialize()
    j2 = j1.join(sh, join_type="inner", num_partitions=n_parts, on=("b",), right_on=("doc_id",))

    def verify(t: pa.Table) -> pa.Table:
        a_sh = t.column("sh_a").to_pylist()
        b_sh = t.column("sh").to_pylist()
        jac = [
            _jac_sorted(np.frombuffer(x, np.uint64), np.frombuffer(y, np.uint64))
            for x, y in zip(a_sh, b_sh)
        ]
        cols = {"a": t.column("a"), "b": t.column("b")}
        if emit_jaccard:
            cols["jaccard"] = pa.array([round(j, 6) for j in jac], pa.float64())
            return pa.table(cols)
        keep = pa.array([j >= DOC_TAU for j in jac], pa.bool_())
        return pa.table(cols).filter(keep)

    return j2.map_batches(verify, batch_format="pyarrow")


def _assign_components(ids_ds, pairs_ds, id_col: str):
    """(id) Dataset + verified pair Dataset -> (id, cluster_id) for EVERY id
    (cluster = min member id; singletons map to themselves). Size-adaptive
    like linking.build_canon_map: driver union-find below the edge
    threshold, distributed hash-min label propagation above it."""
    import ray

    from pie_ray.stages.linking import CC_DRIVER_THRESHOLD, cc_distributed

    pairs_ds = pairs_ds.materialize()
    n_edges = pairs_ds.count()
    if n_edges <= CC_DRIVER_THRESHOLD:
        dsu = DSU()
        for batch in pairs_ds.iter_batches(batch_format="pyarrow"):
            for x, y in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
                dsu.union(f"{x:020d}", f"{y:020d}")
        cmap = {int(k): int(v) for k, v in dsu.canon_map().items()}
        keys = pa.array(sorted(cmap), pa.int64())
        vals = pa.array([cmap[k] for k in sorted(cmap)], pa.int64())
        cref = ray.put((keys, vals))

        def assign(t: pa.Table, lookup_ref=None) -> pa.Table:
            # task map (warm workers, no actor-pool spin-up); vectorized
            # broadcast lookup: index_in + take, null -> own id. ray.get of
            # an already-local plasma object is ~free per batch.
            keys_, vals_ = ray.get(lookup_ref)
            idx = pc.index_in(t.column(id_col), value_set=keys_)
            mapped = pc.coalesce(vals_.take(idx), t.column(id_col))
            return pa.table({id_col: t.column(id_col), "cluster_id": mapped})

        return ids_ds.map_batches(
            assign, fn_kwargs={"lookup_ref": cref}, batch_format="pyarrow"
        )

    # scale path: labels from distributed CC, assignment via left join
    from pie_ray.util import join_num_partitions

    labels = cc_distributed(pairs_ds)
    joined = ids_ds.join(
        labels,
        join_type="left_outer",
        num_partitions=join_num_partitions(pairs_ds.size_bytes()),
        on=(id_col,),
        right_on=("node",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster_id": pc.coalesce(t.column("label"), t.column(id_col)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_dedup_minhash(sf_dir: str):
    """(doc_id, cluster_id) for every document; cluster = min doc_id of its
    near-dup component (singletons map to themselves). Every stage is
    distributed: banding shuffle -> pair dedup -> shingle joins -> verify ->
    size-adaptive components -> broadcast/join assignment."""
    from pie_ray.util import bucket_count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    verified = _verified_pairs(
        docs, num_buckets=bucket_count(docs.size_bytes(), floor=DEDUP_LSH_BUCKETS)
    )
    return _assign_components(docs.select_columns(["doc_id"]), verified, "doc_id")


def q_corpus_curation(sf_dir: str):
    """The composite training-data curation pipeline — the end-to-end shape
    this engine exists for, as ONE streaming Dataset chain:

        quality filter (exact integer-ratio score >= 0.6, >= 10 ws tokens)
        -> exact near-dup removal (md5 groupby, keep min doc_id)
        -> deterministic 50% holdout (md5(doc_id) first hex in 0..7)

    Emits (doc_id, n_tokens_ws). Every step is exact and SQL-expressible,
    so the whole composite is driver-oracled."""
    import hashlib

    from pie_ray.functions.textops import quality_batch, token_count_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def curate(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        tc = token_count_batch(t)
        keep = pc.and_(
            pc.greater_equal(q.column("quality_score"), pa.scalar(0.6)),
            pc.greater_equal(tc.column("n_tokens_ws"), pa.scalar(10, pa.int64())),
        )
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_md5": md5_batch(t).column("text_md5"),
                "n_tokens_ws": tc.column("n_tokens_ws"),
            }
        )
        return out.filter(keep)

    curated = docs.map_batches(curate, batch_format="pyarrow")
    # exact dedup: keep the min doc_id per content hash (bucketed shuffle)
    from pie_ray.util import bucket_count, bucket_hash_strings

    nb = bucket_count(docs.size_bytes(), floor=64)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (bucket_hash_strings(t.column("text_md5"), salt=0xC1) % nb).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def keep_min(g: pa.Table) -> pa.Table:
        gb = g.drop_columns(["bucket"]).group_by(["text_md5"]).aggregate(
            [("doc_id", "min"), ("n_tokens_ws", "min")]
        )
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, ["text_md5"], ["text_md5", "doc_id", "n_tokens_ws"])

    deduped = (
        curated.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_min, batch_format="pyarrow")
    )

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        keep = [
            hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567" for i in ids
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_tokens_ws": t.column("n_tokens_ws")}
        ).filter(pa.array(keep, pa.bool_()))

    return deduped.map_batches(sample, batch_format="pyarrow")


def _jac(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _jac_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 arrays (vectorized intersect)."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (len(a) + len(b) - inter)


def q_ngram_jaccard(sf_dir: str):
    """Direct n-gram Jaccard similarity over the LSH candidate space:
    (a, b, jaccard) for every banded candidate pair — the verify channel of
    the MinHash path exposed as its own operator (rows-only oracle).
    Fully distributed (shingle-set joins), same as q_dedup_minhash."""
    from pie_ray.util import bucket_count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return _verified_pairs(
        docs,
        emit_jaccard=True,
        num_buckets=bucket_count(docs.size_bytes(), floor=DEDUP_LSH_BUCKETS),
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) over word unigram+bigram features
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = (text or "").lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return 0
    hs = np.fromiter((stable_hash64(f) for f in feats), dtype=np.uint64, count=len(feats))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "simhash": pa.array([f"{simhash64(s):016x}" for s in texts], pa.string()),
        }
    )


def q_simhash(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup — random-hyperplane LSH buckets
# ---------------------------------------------------------------------------

EMB_TAU = 0.95
EMB_PLANES = 16


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(4242)
    return rng.standard_normal((EMB_PLANES, dim))


def q_dedup_embedding(sf_dir: str):
    """(vec_id, cluster_id): cosine ≥ τ pairs found via hyperplane-LSH
    bucket groupby, exact verify within bucket, DSU components."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    planes_holder: dict[str, np.ndarray] = {}

    def bucket_batch(t: pa.Table) -> pa.Table:
        mat = list_to_matrix(t.column("embedding"))
        if "p" not in planes_holder:
            planes_holder["p"] = _planes(mat.shape[1])
        signs = (mat @ planes_holder["p"].T) > 0
        keys = (signs.astype(np.uint32) << np.arange(EMB_PLANES, dtype=np.uint32)).sum(axis=1)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        # list column from the flat values buffer — no per-element Python
        # objects on the write side either (offsets + one float buffer)
        n, d = unit.shape
        unit_col = pa.ListArray.from_arrays(
            pa.array((np.arange(n + 1) * d).astype(np.int32)),
            pa.array(unit.ravel(), pa.float64()),
        )
        return pa.table(
            {
                "bucket": pa.array(keys.astype(np.int64)),
                "vec_id": t.column("vec_id"),
                "unit": unit_col,
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one shuffle group = many LSH signatures (shuffle key is sig % 256
        # — Ray group dispatch is Python-level, keep its cardinality low);
        # exact cosine within each signature's members
        sigs = group.column("bucket").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        mat = list_to_matrix(group.column("unit"))
        a: list[int] = []
        b: list[int] = []
        for sig in np.unique(sigs):
            sel = np.flatnonzero(sigs == sig)
            if len(sel) < 2:
                continue
            sub = mat[sel]
            sims = sub @ sub.T
            ii, jj = np.where(np.triu(sims >= EMB_TAU, k=1))
            for i, j in zip(ii, jj):
                x, y = int(ids[sel[i]]), int(ids[sel[j]])
                a.append(min(x, y))
                b.append(max(x, y))
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    buckets = ds.map_batches(bucket_batch, batch_format="pyarrow")

    # size-derived shuffle-key count (power of two so the key stays a cheap
    # bitmask of the LSH signature), floor 256
    from pie_ray.util import bucket_count

    _nsk = bucket_count(ds.size_bytes(), floor=256)
    skey_mask = (1 << int(np.ceil(np.log2(_nsk)))) - 1

    def add_shuffle_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.append_column(
            "skey", _pc.cast(_pc.bit_wise_and(t.column("bucket"), skey_mask), pa.int32())
        )

    keyed = buckets.map_batches(add_shuffle_key, batch_format="pyarrow")
    pairs = keyed.groupby("skey").map_groups(
        lambda g: bucket_pairs(g.drop_columns(["skey"])), batch_format="pyarrow"
    )
    # size-adaptive components + vectorized assignment (shared with the
    # document near-dup path): driver DSU below the edge threshold,
    # distributed hash-min + join above it
    return _assign_components(ds.select_columns(["vec_id"]), pairs, "vec_id")


# ---------------------------------------------------------------------------
# line-level exact dedup (C4 / RefinedWeb boilerplate removal)
# ---------------------------------------------------------------------------

# Duplicated lines are boilerplate (nav bars, cookie banners, footers) —
# a tiny distinct set even at web scale, so the dup-line hash set travels
# through the driver like decontaminate's benchmark grams. Abort rather
# than silently pull an unbounded set.
LINE_DUP_MAX = 50_000_000
LINE_COUNT_BUCKETS = 64
_LINE_WS = " \t\r"


def _explode_lines(t: pa.Table):
    """Vectorized split of a (doc_id, text) batch into per-line arrays:
    (doc_idx, line_strings, lens) where lens[i] = #lines of doc i and
    doc_idx repeats each row index lens[i] times. Blank lines (empty after
    trimming spaces/tabs/CR) are INCLUDED — callers mask them."""
    txt = pc.fill_null(t.column("text"), "")
    lst = pc.split_pattern(txt, "\n")
    lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    lines = pc.list_flatten(lst)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    return doc_idx, lines, lens


def _line_hashes(lines) -> np.ndarray:
    from pie_ray.util import hash64_array

    return hash64_array(lines.to_pylist(), salt=b"line")


def dup_line_hashes(
    docs_ds, min_count: int = 2, num_buckets: int = LINE_COUNT_BUCKETS
) -> np.ndarray:
    """Sorted uint64 hashes of every NON-BLANK line occurring >= min_count
    times corpus-wide. Per-batch partial counts -> ONE bucketed exchange on
    hash(line) % num_buckets -> vectorized combine -> bounded driver pull."""

    def partial(t: pa.Table) -> pa.Table:
        _, lines, _ = _explode_lines(t)
        blank = pc.equal(pc.utf8_trim(lines, _LINE_WS), "")
        h = _line_hashes(lines)[~blank.to_numpy(zero_copy_only=False)]
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq, pa.uint64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "bucket": pa.array(
                    (uniq % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.group_by(["h"]).aggregate([("c", "sum")])
        gb = rename_grouped(gb, ["h"], ["h", "c"])
        return gb.filter(pc.greater_equal(gb.column("c"), min_count)).select(["h"])

    dups = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: combine(g.drop_columns(["bucket"])), batch_format="pyarrow")
    )
    parts: list[np.ndarray] = []
    total = 0
    for b in dups.iter_batches(batch_format="pyarrow"):
        arr = b.column("h").to_numpy(zero_copy_only=False)
        total += len(arr)
        if total > LINE_DUP_MAX:
            raise ValueError(
                f"duplicated-line set exceeds {LINE_DUP_MAX} hashes; raise "
                "LINE_DUP_MAX or dedup in key ranges"
            )
        parts.append(arr)
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


def dedup_lines(docs_ds, min_count: int = 2):
    """Remove every non-blank line occurring >= min_count times corpus-wide
    from EVERY document (C4-style boilerplate removal; blank lines pass
    through untouched). Output (doc_id, text, n_dropped) for all input
    docs — a fully-boilerplate doc comes back with text '' and its count.

    Two passes over the corpus, one bucketed exchange, then a stateless
    task map with the broadcast sorted dup-hash array (ray.put once)."""
    import ray as _ray

    dup_ref = _ray.put(dup_line_hashes(docs_ds, min_count))

    def strip_dups(t: pa.Table, ref=None) -> pa.Table:
        dup_sorted = _ray.get(ref)
        doc_idx, lines, lens = _explode_lines(t)
        blank = pc.equal(pc.utf8_trim(lines, _LINE_WS), "").to_numpy(
            zero_copy_only=False
        )
        h = _line_hashes(lines)
        if len(dup_sorted):
            pos = np.searchsorted(dup_sorted, h)
            ok = pos < len(dup_sorted)
            is_dup = np.zeros(len(h), bool)
            is_dup[ok] = dup_sorted[pos[ok]] == h[ok]
        else:
            is_dup = np.zeros(len(h), bool)
        keep = blank | ~is_dup
        kept_per_doc = np.bincount(doc_idx[keep], minlength=len(lens)).astype(np.int64)
        kept_lines = lines.filter(pa.array(keep))
        offsets = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(kept_per_doc, out=offsets[1:])
        # int32 offsets: a single batch never holds 2^31 lines
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32)), kept_lines.combine_chunks()
            ),
            "\n",
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": joined,
                "n_dropped": pa.array(lens - kept_per_doc, pa.int64()),
            }
        )

    return docs_ds.map_batches(
        strip_dups, fn_kwargs={"ref": dup_ref}, batch_format="pyarrow"
    )


def q_dedup_lines(sf_dir: str, min_count: int = 2):
    """Library/query surface over the documents table. The synthetic driver
    table has single-line docs with no exact dup lines, so this is an
    identity map there; the conformance test gates it against a planted
    multi-line corpus with a DuckDB explode/anti-join/re-agg oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_lines(ds, min_count)
