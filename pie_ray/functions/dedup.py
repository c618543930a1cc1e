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
from pie_ray.util import stable_hash64

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
    """(text_md5, keeper doc_id, n_copies) — survivor = min doc_id."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hashed = ds.map_batches(md5_batch, batch_format="pyarrow")
    from ray.data.aggregate import Count

    return hashed.groupby("text_md5").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies")
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


def q_dedup_minhash(sf_dir: str):
    """(doc_id, cluster_id) for every document; cluster = min doc_id of its
    near-dup component (singletons map to themselves)."""
    import ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def band_and_bucket(t: pa.Table) -> pa.Table:
        banded = doc_band_batch(t)
        b = (
            np.fromiter(
                (stable_hash64(k) for k in banded.column("band_key").to_pylist()),
                dtype=np.uint64,
                count=banded.num_rows,
            )
            % DEDUP_LSH_BUCKETS
        ).astype("int32")
        return banded.append_column("bucket", pa.array(b, pa.int32()))

    banded = docs.map_batches(band_and_bucket, batch_format="pyarrow")
    cand = banded.groupby("bucket").map_groups(
        lambda g: _band_pairs(g.drop_columns(["bucket"])), batch_format="pyarrow"
    )
    cand = cand.materialize()

    # broadcast shingle sets for candidate docs only
    cand_rows = cand.take_all()
    cand_ids = sorted({r["a"] for r in cand_rows} | {r["b"] for r in cand_rows})
    id_set = set(cand_ids)
    shingle_map: dict[int, set[str]] = {}
    for batch in docs.iter_batches(batch_format="pyarrow"):
        for did, s in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did in id_set:
                shingle_map[did] = word_shingles(s)
    verified = [
        (r["a"], r["b"])
        for r in cand_rows
        if _jac(shingle_map.get(r["a"], set()), shingle_map.get(r["b"], set())) >= DOC_TAU
    ]
    dsu = DSU()
    for x, y in verified:
        dsu.union(f"{x:020d}", f"{y:020d}")
    cmap = {int(k): int(v) for k, v in dsu.canon_map().items()}
    cref = ray.put(cmap)

    class Assign:
        def __init__(self):
            self.cmap = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "cluster_id": pa.array(
                        [self.cmap.get(i, i) for i in ids], pa.int64()
                    ),
                }
            )

    return docs.select_columns(["doc_id"]).map_batches(
        Assign, batch_format="pyarrow", concurrency=(1, 4)
    )


def _jac(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def q_ngram_jaccard(sf_dir: str):
    """Direct n-gram Jaccard similarity over the LSH candidate space:
    (a, b, jaccard) for every banded candidate pair — the verify channel of
    the MinHash path exposed as its own operator (rows-only oracle)."""
    import ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def band_and_bucket(t: pa.Table) -> pa.Table:
        banded = doc_band_batch(t)
        b = (
            np.fromiter(
                (stable_hash64(k) for k in banded.column("band_key").to_pylist()),
                dtype=np.uint64,
                count=banded.num_rows,
            )
            % DEDUP_LSH_BUCKETS
        ).astype("int32")
        return banded.append_column("bucket", pa.array(b, pa.int32()))

    banded = docs.map_batches(band_and_bucket, batch_format="pyarrow")
    cand = banded.groupby("bucket").map_groups(
        lambda g: _band_pairs(g.drop_columns(["bucket"])), batch_format="pyarrow"
    )
    cand_rows = cand.take_all()
    ids = sorted({r["a"] for r in cand_rows} | {r["b"] for r in cand_rows})
    id_set = set(ids)
    shingle_map: dict[int, set[str]] = {}
    for batch in docs.iter_batches(batch_format="pyarrow"):
        for did, s in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did in id_set:
                shingle_map[did] = word_shingles(s)
    seen: set[tuple[int, int]] = set()
    a_out: list[int] = []
    b_out: list[int] = []
    j_out: list[float] = []
    for r in cand_rows:
        p = (r["a"], r["b"])
        if p in seen:
            continue
        seen.add(p)
        a_out.append(p[0])
        b_out.append(p[1])
        j_out.append(round(_jac(shingle_map.get(p[0], set()), shingle_map.get(p[1], set())), 6))
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
            "jaccard": pa.array(j_out, pa.float64()),
        }
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
        mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        if "p" not in planes_holder:
            planes_holder["p"] = _planes(mat.shape[1])
        signs = (mat @ planes_holder["p"].T) > 0
        keys = (signs.astype(np.uint32) << np.arange(EMB_PLANES, dtype=np.uint32)).sum(axis=1)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        return pa.table(
            {
                "bucket": pa.array(keys.astype(np.int64)),
                "vec_id": t.column("vec_id"),
                "unit": pa.array(list(unit), pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one shuffle group = many LSH signatures (shuffle key is sig % 256
        # — Ray group dispatch is Python-level, keep its cardinality low);
        # exact cosine within each signature's members
        sigs = np.asarray(group.column("bucket").to_pylist())
        ids = np.asarray(group.column("vec_id").to_pylist())
        mat = np.asarray(group.column("unit").to_pylist(), dtype=np.float64)
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

    def add_shuffle_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.append_column(
            "skey", _pc.cast(_pc.bit_wise_and(t.column("bucket"), 255), pa.int32())
        )

    keyed = buckets.map_batches(add_shuffle_key, batch_format="pyarrow")
    pairs = keyed.groupby("skey").map_groups(
        lambda g: bucket_pairs(g.drop_columns(["skey"])), batch_format="pyarrow"
    )
    pair_rows = pairs.take_all()
    dsu = DSU()
    for r in pair_rows:
        dsu.union(f'{r["a"]:020d}', f'{r["b"]:020d}')
    cmap = {int(k): int(v) for k, v in dsu.canon_map().items()}
    cref = ray.put(cmap)

    class Assign:
        def __init__(self):
            self.cmap = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_pylist()
            return pa.table(
                {
                    "vec_id": t.column("vec_id"),
                    "cluster_id": pa.array([self.cmap.get(i, i) for i in ids], pa.int64()),
                }
            )

    return ds.select_columns(["vec_id"]).map_batches(
        Assign, batch_format="pyarrow", concurrency=(1, 4)
    )
