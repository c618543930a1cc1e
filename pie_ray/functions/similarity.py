"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — one numpy matmul per Arrow batch
against a broadcast query matrix (ray.put once; scorers are plain TASK maps
— a local plasma get per batch is ~free and a task map pays no actor-pool
spin-up or CPU reservation), then a global top-k merge. Scale path: the same matmul behind hyperplane-LSH
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

from pie_ray.util import list_to_matrix


def _topk_score_batch(t: pa.Table, query_ref=None, k: int = 10) -> pa.Table:
    """Task-map scorer (no actor pool): the query vector is ray.put once;
    ray.get of an already-local plasma object is ~free per batch, and a
    plain task map runs on warm workers with no pool spin-up or CPU
    reservation (measured repo rule — broadcast lookups are task maps).
    Emits only the batch-local top-k rows (partial top-k pushdown)."""
    import ray

    q = ray.get(query_ref)  # (dim,) float64, already unit-normalized
    if t.num_rows == 0:  # argpartition(kth=-1) raises on an empty batch
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    mat = list_to_matrix(t.column("embedding"))
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = (mat @ q) / norms
    kk = min(k, len(sims))
    idx = np.argpartition(-sims, kk - 1)[:kk]
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
    partial = ds.map_batches(
        _topk_score_batch,
        fn_kwargs={"query_ref": ray.put(q), "k": k},
        batch_format="pyarrow",
    )
    return partial.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def q_knn(sf_dir: str):
    """Top-10 cosine neighbours of vec_id=0's embedding (sim rounded to 6dp
    to pin float compare vs the DuckDB list_cosine_similarity oracle)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = ds.filter(expr="vec_id == 0").take(1)
    query = np.asarray(first[0]["embedding"], dtype=np.float64)
    return knn_brute_force(ds, query, k=10)


def _probe_sigs(qsig: int, n_planes: int, radius: int) -> np.ndarray:
    """Query signature plus all signatures within Hamming distance ``radius``."""
    from itertools import combinations

    sigs = {qsig}
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            s = qsig
            for b in bits:
                s ^= 1 << b
            sigs.add(s)
    return np.asarray(sorted(sigs), dtype=np.uint64)


def lsh_plan(n_rows: int, dim: int, n_tables: int = 8, radius: int = 2, seed: int = 9090):
    """Multi-table hyperplane-LSH parameters sized to bucket occupancy.

    Planes per table grow as log2(n/256) so expected bucket occupancy stays
    ~256 regardless of corpus size: at 500 test vectors that is 8 planes and
    the Hamming-2 probe still scans a large corpus fraction (recall 1.0,
    measured), while at 10^9 vectors P≈22 and the probe touches ~1e-4 of
    the corpus. Candidates are unioned across ``n_tables`` independent
    tables (the standard E2LSH recall lever: union recall → 1 - miss^L)."""
    n_planes = int(np.clip(np.ceil(np.log2(max(2, n_rows) / 256.0)), 8, 24))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    return planes, n_planes, radius


def _lsh_score_batch(t: pa.Table, plan_ref=None, k: int = 10) -> pa.Table:
    """Task-map LSH scorer: per batch, compute all tables' signatures in one
    matmul, keep rows whose signature lands in ANY table's probe set, exact
    cosine on survivors, emit the batch-local top-k. Broadcast state
    (planes, probes, query) rides one ray.put ref — local plasma get per
    batch, no actor pool."""
    import ray

    planes, probes, q = ray.get(plan_ref)  # (L, P, dim), L sorted u64 arrays
    mat = list_to_matrix(t.column("embedding"))
    L, P, dim = planes.shape
    pow2 = 1 << np.arange(P, dtype=np.uint64)
    proj = mat @ planes.reshape(L * P, dim).T > 0
    sigs = proj.reshape(-1, L, P).astype(np.uint64) @ pow2  # (rows, L)
    mask = np.zeros(len(mat), bool)
    for l in range(L):
        mask |= np.isin(sigs[:, l], probes[l], assume_unique=False)
    if not mask.any():
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    sub = mat[mask]
    norms = np.linalg.norm(sub, axis=1)
    norms[norms == 0] = 1.0
    sims = (sub @ q) / norms
    kk = min(k, len(sims))
    idx = np.argpartition(-sims, kk - 1)[:kk]
    return pa.table(
        {
            "vec_id": t.column("vec_id").filter(pa.array(mask)).take(pa.array(idx)),
            "sim": pa.array(np.round(sims[idx], 6)),
        }
    )


def knn_lsh(ds, query_vec: np.ndarray, n_rows: int, k: int = 10, n_tables: int = 8):
    """Approximate top-k by multi-table hyperplane LSH + exact re-rank of
    candidates. Recall ≥ 0.9 vs knn_brute_force asserted in tests."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    planes, n_planes, radius = lsh_plan(n_rows, q.shape[0], n_tables=n_tables)
    pow2 = 1 << np.arange(n_planes, dtype=np.uint64)
    probes = []
    for l in range(n_tables):
        qsig = int(((planes[l] @ q) > 0).astype(np.uint64) @ pow2)
        probes.append(_probe_sigs(qsig, n_planes, radius))
    scored = ds.map_batches(
        _lsh_score_batch,
        fn_kwargs={"plan_ref": ray.put((planes, probes, q)), "k": k},
        batch_format="pyarrow",
    )
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 8, seed: int = 6060) -> np.ndarray:
    """Deterministic k-means-lite on a (unit-normalized) sample: seeded
    init, fixed iteration count, empty clusters re-seeded from the farthest
    points. Driver-side on a SAMPLE only (the index build of IVF)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(k, n)
    cents = sample[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        sims = sample @ cents.T  # cosine on unit vectors
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cents)
        for c in range(k):
            members = sample[assign == c]
            if len(members) == 0:
                far = sims.max(axis=1).argmin()
                new[c] = sample[far]
            else:
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                new[c] = m / nm if nm > 0 else sample[0]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def _ivf_score_batch(t: pa.Table, plan_ref=None, k: int = 10) -> pa.Table:
    """Task-map IVF scorer: per batch, assign rows to their nearest
    centroid, keep rows whose centroid is in the query's probe list, exact
    cosine + batch-local top-k on survivors. Broadcast state rides one
    ray.put ref — no actor pool."""
    import ray

    cents, probe, q = ray.get(plan_ref)  # centroids, sorted probe ids, query
    mat = list_to_matrix(t.column("embedding"))
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    assign = (unit @ cents.T).argmax(axis=1)
    mask = np.isin(assign, probe)
    if not mask.any():
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    sims = unit[mask] @ q
    kk = min(k, len(sims))
    idx = np.argpartition(-sims, kk - 1)[:kk]
    return pa.table(
        {
            "vec_id": t.column("vec_id").filter(pa.array(mask)).take(pa.array(idx)),
            "sim": pa.array(np.round(sims[idx], 6)),
        }
    )


def knn_ivf(ds, query_vec: np.ndarray, n_rows: int, k: int = 10, nprobe_frac: float = 0.75):
    """IVF-style ANN: coarse k-means centroids from a deterministic sample,
    probe the nprobe centroids nearest the query, exact re-rank inside.
    The inverted-list partitioning is implicit (assignment recomputed per
    batch — at 10^9 rows the assignment would be precomputed once into a
    `centroid_id` column and pushed into the parquet partitioning).

    nprobe_frac defaults high (0.75): the synthetic near-random embeddings
    are the worst case for coarse quantization (recall 1.0 measured at
    0.75, 0.2-0.7 at 0.5); real clustered corpora probe far fewer lists."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    n_cent = int(np.clip(int(np.sqrt(max(4, n_rows))), 4, 4096))
    stride = max(1, n_rows // 4096)  # ≤4096-vector sample for the index build

    def stride_sample(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % stride) == 0))

    sample_ds = ds.map_batches(stride_sample, batch_format="pyarrow")
    sample = np.concatenate(
        [
            list_to_matrix(b.column("embedding"))
            for b in sample_ds.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        or [np.empty((0, q.shape[0]))]
    )
    sn = np.linalg.norm(sample, axis=1)
    sn[sn == 0] = 1.0
    sample = sample / sn[:, None]
    cents = kmeans_centroids(sample, n_cent)
    nprobe = max(1, int(len(cents) * nprobe_frac))
    probe = np.sort(np.argsort(-(cents @ q))[:nprobe])

    scored = ds.map_batches(
        _ivf_score_batch,
        fn_kwargs={"plan_ref": ray.put((cents, probe, q)), "k": k},
        batch_format="pyarrow",
    )
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def q_knn_ivf(sf_dir: str):
    """IVF coarse-quantization ANN (rows-only oracle; recall vs knn_cosine
    gated >= 0.9 in tests)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = ds.count()
    first = ds.filter(expr="vec_id == 0").take(1)
    q = np.asarray(first[0]["embedding"], dtype=np.float64)
    return knn_ivf(ds, q, n_rows=n_rows, k=10)


def q_knn_lsh(sf_dir: str):
    """Scale-path ANN: occupancy-sized multi-table hyperplane LSH with
    Hamming-2 multi-probe, exact cosine re-rank of the candidate union.
    Approximate by construction (rows-only oracle); recall vs knn_cosine
    gated ≥ 0.9 in tests/unit/test_similarity.py."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = ds.count()
    first = ds.filter(expr="vec_id == 0").take(1)
    q = np.asarray(first[0]["embedding"], dtype=np.float64)
    return knn_lsh(ds, q, n_rows=n_rows, k=10)


# ---------------------------------------------------------------------------
# Product quantization (PQ): vector compression + ADC retrieve-then-rerank
# ---------------------------------------------------------------------------

PQ_M = 16  # subspaces
PQ_NBITS = 6  # 64 centroids per subspace -> 16 bytes/vector (16x on d=64 f32)
PQ_CAND = 50  # ADC candidate pool handed to the exact rerank


def pq_train(sample: np.ndarray, m: int = PQ_M, nbits: int = PQ_NBITS) -> np.ndarray:
    """Per-subspace codebooks (m, 2^nbits, d/m) from a driver-side sample
    — one seeded k-means-lite per subspace (raw, NOT unit-normalized:
    subvector geometry is Euclidean). Requires d % m == 0."""
    n, d = sample.shape
    dsub = d // m
    assert dsub * m == d, f"dim {d} not divisible by m={m}"
    k = 1 << nbits
    books = []
    for j in range(m):
        sub = np.ascontiguousarray(sample[:, j * dsub : (j + 1) * dsub])
        rng = np.random.default_rng(4242 + j)
        kk = min(k, n)
        cents = sub[rng.choice(n, size=kk, replace=False)]
        for _ in range(8):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            new = cents.copy()
            for c in range(kk):
                members = sub[assign == c]
                if len(members):
                    new[c] = members.mean(0)
            if np.allclose(new, cents):
                break
            cents = new
        books.append(cents)
    return np.stack(books)


def pq_encode_batch(t: pa.Table, books_ref=None) -> pa.Table:
    """Task-map encoder: each vector -> m uint8 codes (nearest centroid
    per subspace). This IS the compression operator — the output dataset
    (vec_id + fixed_size_list<uint8>[m]) is what a 100 TB deployment
    persists and scans; originals are only touched again for the bounded
    rerank."""
    import ray

    books = ray.get(books_ref)  # (m, K, dsub)
    mat = list_to_matrix(t.column("embedding"))
    m, _, dsub = books.shape
    codes = np.empty((len(mat), m), np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d2.argmin(1)
    return pa.table(
        {
            "vec_id": t.column("vec_id"),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m
            ),
        }
    )


def _pq_adc_batch(t: pa.Table, plan_ref=None, cand: int = PQ_CAND) -> pa.Table:
    """ADC scan over CODES only: approx cosine from two (m, K) lookup
    tables — per-subspace dot(q_sub, centroid) and centroid squared norm
    (subspaces are disjoint, so the reconstruction's norm is exactly the
    sum). Partial top-cand per batch."""
    import ray

    tbl_dot, tbl_sqn = ray.get(plan_ref)  # (m, K) each
    m = tbl_dot.shape[0]
    codes = (
        t.column("codes").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, m)
    dot = np.zeros(len(codes))
    sqn = np.zeros(len(codes))
    for j in range(m):
        dot += tbl_dot[j][codes[:, j]]
        sqn += tbl_sqn[j][codes[:, j]]
    approx = dot / np.sqrt(np.maximum(sqn, 1e-12))
    kk = min(cand, len(approx))
    idx = np.argpartition(-approx, kk - 1)[:kk]
    return pa.table(
        {
            "vec_id": t.column("vec_id").take(pa.array(idx)),
            "approx_sim": pa.array(approx[idx]),
        }
    )


def knn_pq(ds, query_vec: np.ndarray, n_rows: int, k: int = 10, cand: int = PQ_CAND):
    """PQ ANN: train codebooks on a stride sample, encode the corpus to
    16-byte codes (the scan-side dataset), ADC-score the codes, then
    exact-rerank the bounded candidate pool against the original vectors
    (broadcast id-set filter — a semi-join touching only cand rows).
    Candidate recall 1.0 measured at cand=50 on the synthetic (worst-case
    near-random) embeddings; compression and determinism gated in tests."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    stride = max(1, n_rows // 4096)

    def stride_sample(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % stride) == 0))

    sample = np.concatenate(
        [
            list_to_matrix(b.column("embedding"))
            for b in ds.map_batches(stride_sample, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
            if b.num_rows
        ]
    )
    books = pq_train(sample)
    m, K, dsub = books.shape
    codes_ds = ds.map_batches(
        pq_encode_batch, fn_kwargs={"books_ref": ray.put(books)}, batch_format="pyarrow"
    )
    tbl_dot = np.stack(
        [books[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )
    tbl_sqn = np.stack([(books[j] ** 2).sum(1) for j in range(m)])
    scored = codes_ds.map_batches(
        _pq_adc_batch,
        fn_kwargs={"plan_ref": ray.put((tbl_dot, tbl_sqn)), "cand": cand},
        batch_format="pyarrow",
    )
    top = scored.sort(["approx_sim", "vec_id"], descending=[True, False]).limit(cand)
    cand_ids = pa.array(sorted(r["vec_id"] for r in top.take_all()), pa.int64())

    def rerank(t: pa.Table, ids_ref=None, qv=None) -> pa.Table:
        import ray as _ray

        ids = _ray.get(ids_ref)
        mask = pa.compute.is_in(t.column("vec_id"), value_set=ids)
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        mat = list_to_matrix(t.column("embedding"))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qv) / norms
        return pa.table(
            {"vec_id": t.column("vec_id"), "sim": pa.array(np.round(sims, 6))}
        )

    reranked = ds.map_batches(
        rerank,
        fn_kwargs={"ids_ref": ray.put(cand_ids), "qv": q},
        batch_format="pyarrow",
    )
    return reranked.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def q_knn_pq(sf_dir: str):
    """PQ compressed-domain ANN (recall-vs-brute-force, compression-ratio
    and determinism gates in tests; driver coverage via the merged
    q_knn_ann entry)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = ds.count()
    first = ds.filter(expr="vec_id == 0").take(1)
    q = np.asarray(first[0]["embedding"], dtype=np.float64)
    return knn_pq(ds, q, n_rows=n_rows, k=10)


def q_knn_ann(sf_dir: str):
    """Merged driver entry for the three APPROXIMATE ANN variants (each
    keeps its own library function + recall gate): op='lsh' multi-probe
    hyperplane LSH, op='ivf' coarse-quantization probe, op='pq' product-
    quantization ADC retrieve-then-rerank. All approximate by construction
    (rows-only oracle); recall ≥ 0.9 vs knn_brute_force gated in
    tests/unit/test_similarity.py."""
    import pyarrow as pa

    def tag(op: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("op", pa.array([op] * len(t), pa.string()))

        return fn

    out = None
    for op, q in (("lsh", q_knn_lsh), ("ivf", q_knn_ivf), ("pq", q_knn_pq)):
        part = q(sf_dir).map_batches(tag(op), batch_format="pyarrow")
        out = part if out is None else out.union(part)
    return out


# ---------------------------------------------------------------------------
# Exact cosine similarity self-join (thresholded all-pairs)
# ---------------------------------------------------------------------------

SIM_JOIN_BROADCAST_MAX = 2_000_000  # vectors broadcastable (~1 GB at dim 64)
SIM_JOIN_THRESHOLD = 0.3


def cosine_sim_join(
    ds,
    threshold: float = SIM_JOIN_THRESHOLD,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    on_over_budget: str = "raise",
):
    """EXACT thresholded all-pairs cosine self-join -> (id_a < id_b, sim
    rounded to 6 dp): the oracled twin of the approximate LSH near-dup
    path in dedup.embedding_near_dups. One broadcast of the normalized
    matrix (``ray.put`` once), then each batch matmuls its rows against
    the full matrix — O(n·dim) flops per row, vectorized, no shuffle; the
    id_a < id_b constraint halves emission. Past
    ``SIM_JOIN_BROADCAST_MAX`` vectors the exact quadratic join is the
    wrong tool by construction; ``on_over_budget`` picks the behavior
    there: ``"raise"`` (default — exactness is this entry's contract) or
    ``"lsh"`` to auto-degrade to the banded hyperplane-LSH candidate path
    (``cosine_sim_join_lsh``): emitted sims stay EXACT (precision 1.0)
    but pairs an LSH band never co-buckets are missed — the estimated
    recall AT the threshold boundary is logged per call (recall rises
    steeply above the boundary; the fallback is built for the high-
    threshold near-dup regime).

    Rounding to 6 dp on BOTH the emitted value and the threshold compare
    mirrors the knn_cosine oracle contract (DuckDB's
    list_cosine_similarity agrees with numpy float64 to well under 1e-6)."""
    import ray

    # ONE execution of the input plan: the count gate, the broadcast pull
    # and the scoring pass all reuse the materialized blocks (a mapped/
    # filtered input would otherwise execute up to three times)
    ds = ds.materialize()
    n = ds.count()
    if n > SIM_JOIN_BROADCAST_MAX:
        if on_over_budget == "lsh":
            import logging

            rb = _sim_lsh_boundary_recall(threshold)
            logging.getLogger(__name__).warning(
                "cosine_sim_join: %d vectors exceed the exact broadcast "
                "budget (%d); degrading to banded hyperplane LSH (%d bands "
                "x %d planes). Emitted sims stay exact; estimated recall "
                "at sim == %.3f is %.3f (higher above the boundary; the "
                "estimate covers band co-bucketing only — signatures "
                "holding > SIM_LSH_MAX_BUCKET members chain instead of "
                "emitting all pairs, so heavily skewed corpora can sit "
                "below it).",
                n,
                SIM_JOIN_BROADCAST_MAX,
                SIM_JOIN_LSH_BANDS,
                SIM_JOIN_LSH_PLANES,
                threshold,
                rb,
            )
            return cosine_sim_join_lsh(ds, threshold, id_col, emb_col)
        raise NotImplementedError(
            "exact all-pairs similarity beyond the broadcast budget is "
            "quadratic by definition — pass on_over_budget='lsh' to "
            "degrade to the banded-LSH candidate path (exact sims, "
            "logged recall note), or use dedup.embedding_near_dups / "
            "semdedup.semantic_dedup at that scale"
        )
    ids_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    for t in ds.iter_batches(batch_format="pyarrow"):
        ids_parts.append(
            t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        mat_parts.append(list_to_matrix(t.column(emb_col)))
    ids = np.concatenate(ids_parts)
    mat = np.vstack(mat_parts)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ref = ray.put((ids, mat))

    def pairs(t: pa.Table, bref=None) -> pa.Table:
        all_ids, all_mat = ray.get(bref)
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        my_ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        my_mat = list_to_matrix(t.column(emb_col))
        my_norms = np.linalg.norm(my_mat, axis=1)
        my_norms[my_norms == 0] = 1.0
        my_mat = my_mat / my_norms[:, None]
        sims = np.round(my_mat @ all_mat.T, 6)  # (b, n)
        keep = (sims >= threshold) & (my_ids[:, None] < all_ids[None, :])
        ri, ci = np.nonzero(keep)
        return pa.table(
            {
                "id_a": pa.array(my_ids[ri], pa.int64()),
                "id_b": pa.array(all_ids[ci], pa.int64()),
                "sim": pa.array(sims[ri, ci], pa.float64()),
            }
        )

    return ds.map_batches(pairs, fn_kwargs={"bref": ref}, batch_format="pyarrow")


def q_sim_join(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return cosine_sim_join(ds)


# ---------------------------------------------------------------------------
# LSH-degraded cosine self-join (the beyond-broadcast sibling)
# ---------------------------------------------------------------------------

SIM_JOIN_LSH_BANDS = 64
SIM_JOIN_LSH_PLANES = 10  # per band: random data co-buckets ~n/2^10 per sig
SIM_LSH_MAX_BUCKET = 512  # hot band-sig cap: chain instead of all-pairs


def _sim_lsh_boundary_recall(
    threshold: float,
    bands: int = SIM_JOIN_LSH_BANDS,
    planes: int = SIM_JOIN_LSH_PLANES,
) -> float:
    """P(candidate) for a pair at EXACTLY the threshold similarity under
    banded hyperplane LSH: per-plane agreement p = 1 - theta/pi (Charikar
    2002), a band fires iff all its planes agree, any of ``bands`` bands
    suffices. Recall is monotone in sim, so this is the result set's
    worst-case per-pair recall."""
    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    p = 1.0 - theta / np.pi
    return float(1.0 - (1.0 - p**planes) ** bands)


def _sim_lsh_planes(dim: int, bands: int, planes: int) -> np.ndarray:
    rng = np.random.default_rng(90210)
    return rng.standard_normal((bands * planes, dim))


def cosine_sim_join_lsh(
    ds,
    threshold: float = SIM_JOIN_THRESHOLD,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bands: int = SIM_JOIN_LSH_BANDS,
    planes: int = SIM_JOIN_LSH_PLANES,
):
    """Thresholded cosine self-join past the exact-broadcast budget:
    banded hyperplane-LSH candidates, globally deduped, then EXACT cosine
    verify via two hash joins against a unit-vector table — same output
    schema and exact sims as ``cosine_sim_join`` (precision 1.0), recall
    = the LSH candidate probability (see ``_sim_lsh_boundary_recall``;
    the caller logs it). Scale shape: band rows are (bucket, band_key,
    id) — 3 ints per band per row, never the vector; pair-gen is a
    bucketed groupby with the same hot-bucket chain cap as the MinHash
    path (a band-sig holding > SIM_LSH_MAX_BUCKET members chains instead
    of exploding quadratically — those pairs are the recall cost of a
    degraded mode, by declaration); the vectors travel only through the
    candidate-filtered verify joins. Exchanges are barriered with
    ``materialize()`` + empty-block normalization per the repo's
    concurrent-exchange rule."""
    import ray

    from pie_ray.functions.dedup import _distinct_pairs
    from pie_ray.util import (
        bucket_count,
        drop_empty_blocks,
        hash64_ints,
        join_num_partitions,
    )

    ds = ds.materialize()

    planes_holder: dict[str, np.ndarray] = {}
    num_buckets = bucket_count(ds.size_bytes(), floor=128)

    def band_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64()),
                }
            )
        mat = list_to_matrix(t.column(emb_col))
        if "p" not in planes_holder:
            planes_holder["p"] = _sim_lsh_planes(mat.shape[1], bands, planes)
        signs = (mat @ planes_holder["p"].T) > 0  # (n, bands*planes)
        bits = signs.reshape(len(mat), bands, planes).astype(np.int64)
        sigs = (bits << np.arange(planes, dtype=np.int64)).sum(axis=2)
        band_key = (
            np.arange(bands, dtype=np.int64)[None, :] * (1 << planes) + sigs
        ).ravel()
        ids = np.repeat(
            t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64), bands
        )
        bucket = (hash64_ints(band_key, salt=0x51B) % num_buckets).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int32()),
                "band_key": pa.array(band_key, pa.int64()),
                "id": pa.array(ids, pa.int64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        keys = g.column("band_key").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        a: list[int] = []
        b: list[int] = []
        seen: set[tuple[int, int]] = set()
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            members = np.unique(ids[lo:hi])
            if len(members) < 2:
                continue
            if len(members) <= SIM_LSH_MAX_BUCKET:
                pairs = (
                    (int(members[i]), int(members[j]))
                    for i in range(len(members))
                    for j in range(i + 1, len(members))
                )
            else:  # hot sig: chain keeps O(n) emission (recall cost, declared)
                pairs = zip(members[:-1].tolist(), members[1:].tolist())
            for p in pairs:
                if p not in seen:
                    seen.add(p)
                    a.append(p[0])
                    b.append(p[1])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    cand = (
        ds.map_batches(band_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: bucket_pairs(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
        .materialize()
    )
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    pairs = drop_empty_blocks(
        _distinct_pairs(
            cand, num_buckets=bucket_count(cand.size_bytes(), floor=64)
        ).materialize(),
        schema=pair_schema,
    ).materialize()

    # exact verify: unit vectors ride the joins as fixed-width blobs (list
    # columns can't ride a Dataset.join; same trick as dedup's shingles)
    def unit_blobs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"uid": pa.array([], pa.int64()), "uv": pa.array([], pa.binary())}
            )
        mat = list_to_matrix(t.column(emb_col))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        return pa.table(
            {
                "uid": t.column(id_col).cast(pa.int64()),
                "uv": pa.array([r.tobytes() for r in unit], pa.binary()),
            }
        )

    units = ds.map_batches(unit_blobs, batch_format="pyarrow")
    n_parts = join_num_partitions(pairs.size_bytes())
    j1 = pairs.join(
        units, join_type="inner", num_partitions=n_parts, on=("a",), right_on=("uid",)
    )

    def _rename_uv_a(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["uv_a" if c == "uv" else c for c in t.column_names])
        return t.drop_columns(["uid"]) if "uid" in t.column_names else t

    j1 = drop_empty_blocks(
        j1.map_batches(_rename_uv_a, batch_format="pyarrow").materialize(),
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("uv_a", pa.binary())]
        ),
    ).materialize()
    j2 = j1.join(
        units, join_type="inner", num_partitions=n_parts, on=("b",), right_on=("uid",)
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ua = np.stack([np.frombuffer(x, np.float64) for x in t.column("uv_a").to_pylist()])
        ub = np.stack([np.frombuffer(x, np.float64) for x in t.column("uv").to_pylist()])
        sims = np.round(np.einsum("ij,ij->i", ua, ub), 6)
        keep = sims >= threshold
        return pa.table(
            {
                "id_a": t.column("a").filter(pa.array(keep)),
                "id_b": t.column("b").filter(pa.array(keep)),
                "sim": pa.array(sims[keep], pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")
