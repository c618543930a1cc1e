"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — one numpy matmul per Arrow batch
against a broadcast query matrix (ray.put once, resolved per actor), then a
global top-k merge. Scale path: the same matmul behind hyperplane-LSH
bucketing (probe only buckets near the query's signature), trading recall
for a ~2^planes candidate reduction; IVF-style coarse quantization would
slot into the same two-stage shape.

All batch math is float64 numpy; per-batch partial top-k keeps the merge
tiny (k rows per block, not the whole corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


class _TopKScorer:
    """Actor-pool stage: query matrix broadcast once; per batch emits only
    that batch's local top-k rows (partial top-k pushdown)."""

    def __init__(self, query_ref, k: int):
        import ray

        q = ray.get(query_ref)  # (dim,) float64, already unit-normalized
        self.q = q
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ self.q) / norms
        k = min(self.k, len(sims))
        idx = np.argpartition(-sims, k - 1)[:k]
        return pa.table(
            {
                "vec_id": t.column("vec_id").take(pa.array(idx)),
                "sim": pa.array(np.round(sims[idx], 6)),
            }
        )


def knn_brute_force(ds, query_vec: np.ndarray, k: int = 10):
    """Dataset(vec_id, embedding) -> top-k (vec_id, sim) by cosine."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    qref = ray.put(q)
    partial = ds.map_batches(
        _TopKScorer,
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return partial.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def q_knn(sf_dir: str):
    """Top-10 cosine neighbours of vec_id=0's embedding (sim rounded to 6dp
    to pin float compare vs the DuckDB list_cosine_similarity oracle)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = ds.filter(expr="vec_id == 0").take(1)
    query = np.asarray(first[0]["embedding"], dtype=np.float64)
    return knn_brute_force(ds, query, k=10)


def q_knn_lsh(sf_dir: str):
    """Scale-path ANN: hyperplane-LSH bucketed top-k (multi-probe radius 1).

    Groups the corpus by 12-bit hyperplane signature, probes only the
    query's bucket plus Hamming-1 neighbours, exact cosine inside. Returns
    (vec_id, sim) — approximate: recall < 1 by construction (rows-only
    oracle)."""
    import ray

    N_PLANES = 12
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = ds.filter(expr="vec_id == 0").take(1)
    q = np.asarray(first[0]["embedding"], dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn

    rng = np.random.default_rng(9090)
    dim = q.shape[0]
    planes = rng.standard_normal((N_PLANES, dim))
    qsig = int(((q @ planes.T) > 0).astype(np.uint32) @ (1 << np.arange(N_PLANES)))
    probe = {qsig} | {qsig ^ (1 << i) for i in range(N_PLANES)}
    probe_list = sorted(probe)

    planes_ref = ray.put(planes)
    qref = ray.put(q)

    class BucketScore:
        def __init__(self):
            self.planes = ray.get(planes_ref)
            self.q = ray.get(qref)
            self.probe = frozenset(probe_list)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
            sigs = ((mat @ self.planes.T) > 0).astype(np.uint32) @ (
                1 << np.arange(N_PLANES, dtype=np.uint32)
            )
            mask = np.fromiter((int(s) in self.probe for s in sigs), bool, len(sigs))
            if not mask.any():
                return pa.table({"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
            sub = mat[mask]
            norms = np.linalg.norm(sub, axis=1)
            norms[norms == 0] = 1.0
            sims = (sub @ self.q) / norms
            return pa.table(
                {
                    "vec_id": t.column("vec_id").filter(pa.array(mask)),
                    "sim": pa.array(np.round(sims, 6)),
                }
            )

    scored = ds.map_batches(BucketScore, batch_format="pyarrow", concurrency=(1, 4))
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(10)
