"""Distributed k-means over an embedding column — the clustering step a
training-data pipeline uses for corpus stratification, domain balancing
and semantic-dedup blocking.

Scale shape: Lloyd's algorithm where EVERY iteration is one streaming pass
with a broadcast centroid matrix (``ray.put`` once per iteration) and
per-batch partial (k x dim float64 sums, k counts) — the only thing that
ever reaches the driver is k x dim per batch-combine, so there is no
shuffle and no materialization of the corpus at any scale. Seeding is
deterministic (the k vectors with the smallest splitmix64(vec_id) — a pure
function of ids, independent of partitioning), so a fit is reproducible
across runs, partitionings and parallelism up to float summation order
(partial sums are float64; assignment ties break toward the lower cluster
id). At 10^12 rows run the fit on a hash-sampled subset (any rate via
``sample_hash``-style id filtering) and only the final assign pass over
the full corpus — assignment is a stateless map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pie_ray.util import hash64_ints, list_to_matrix

KMEANS_SEED_SALT = 29


def _batch_stats(t: pa.Table, cents_ref, vec_col: str) -> pa.Table:
    """Per-batch partial: (cluster, count, sum_vec list<double>) — k rows max."""
    cents = ray.get(cents_ref)  # (k, dim) float64
    mat = list_to_matrix(t.column(vec_col), dtype=np.float64)
    # ||x-c||^2 = x^2 - 2 x.c + c^2; x^2 constant per row — drop it
    d = -2.0 * (mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    assign = np.argmin(d, axis=1)
    k, dim = cents.shape
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    sums = np.zeros((k, dim), np.float64)
    np.add.at(sums, assign, mat)
    nz = np.flatnonzero(counts)
    return pa.table(
        {
            "cluster": pa.array(nz.astype(np.int64), pa.int64()),
            "count": pa.array(counts[nz], pa.int64()),
            "sum_vec": pa.array(list(sums[nz]), pa.list_(pa.float64())),
        }
    )


def _seed_centroids(emb_ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    """k vectors with the globally smallest hash64(vec_id) — deterministic
    for any partitioning; gathered via per-batch top-k, driver merge."""

    def best(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = hash64_ints(ids, salt=KMEANS_SEED_SALT)
        top = np.argsort(h, kind="stable")[:k]
        mat = list_to_matrix(t.column(vec_col), dtype=np.float64)[top]
        return pa.table(
            {
                "h": pa.array(h[top], pa.uint64()),
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    hs: list[np.ndarray] = []
    vs: list[np.ndarray] = []
    for b in emb_ds.map_batches(best, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b.column("h").to_numpy(zero_copy_only=False))
        vs.append(list_to_matrix(b.column("vec"), dtype=np.float64))
    h = np.concatenate(hs)
    v = np.vstack(vs)
    top = np.argsort(h, kind="stable")[:k]
    if len(top) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(top)}")
    return v[top]


def kmeans_fit(
    emb_ds,
    k: int,
    iters: int = 25,
    tol: float = 1e-6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, int]:
    """Fit k-means; returns (centroids (k, dim) float64, iterations run).
    Empty clusters keep their previous centroid. Converges when the max
    centroid shift (L2) drops below ``tol``."""
    cents = _seed_centroids(emb_ds, k, vec_col, id_col)
    it = 0
    for it in range(1, iters + 1):
        ref = ray.put(cents)
        sums = np.zeros_like(cents)
        counts = np.zeros(k, np.int64)
        stats = emb_ds.map_batches(
            _batch_stats, fn_kwargs={"cents_ref": ref, "vec_col": vec_col},
            batch_format="pyarrow",
        )
        for b in stats.iter_batches(batch_format="pyarrow"):
            # one iter_batches batch can concatenate several per-task
            # partials, so cluster ids repeat — scatter-add, never +=
            cid = b.column("cluster").to_numpy(zero_copy_only=False)
            np.add.at(counts, cid, b.column("count").to_numpy(zero_copy_only=False))
            np.add.at(sums, cid, list_to_matrix(b.column("sum_vec"), dtype=np.float64))
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if shift < tol:
            break
    return cents, it


def kmeans_assign(emb_ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Stateless map adding ``cluster`` (int64, argmin L2, ties to the
    lower id) to every row; centroids broadcast once via ray.put."""
    ref = ray.put(np.asarray(centroids, np.float64))

    def tag(t: pa.Table, cents_ref=None) -> pa.Table:
        cents = ray.get(cents_ref)
        mat = list_to_matrix(t.column(vec_col), dtype=np.float64)
        d = -2.0 * (mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        return t.append_column(
            "cluster", pa.array(np.argmin(d, axis=1).astype(np.int64), pa.int64())
        )

    return emb_ds.map_batches(tag, fn_kwargs={"cents_ref": ref}, batch_format="pyarrow")


def kmeans_local(mat: np.ndarray, seeds: np.ndarray, iters: int = 25, tol: float = 1e-6):
    """Single-process reference Lloyd's with the same update rule — the
    equivalence gate for the distributed fit (tests/unit/test_clustering)."""
    cents = seeds.astype(np.float64).copy()
    k = len(cents)
    it = 0
    for it in range(1, iters + 1):
        d = -2.0 * (mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        new = cents.copy()
        for c in range(k):
            sel = assign == c
            if sel.any():
                new[c] = mat[sel].mean(axis=0)
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if shift < tol:
            break
    return cents, it


def q_kmeans(sf_dir: str, k: int = 10):
    """Library/query surface: fit over the embeddings table and return the
    per-row (vec_id, label, cluster) assignment. Gated on the k-means
    objective in tests (the synthetic labels are nearly inseparable in
    these vectors, so label purity is not a meaningful target)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    cents, _ = kmeans_fit(ds, k)
    return kmeans_assign(ds, cents).select_columns(["vec_id", "label", "cluster"])


def kmeans_fit_sample(
    emb_ds,
    k: int,
    max_sample: int = 65536,
    iters: int = 25,
    tol: float = 1e-6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, int]:
    """The docstring's scale path made concrete: fit on a DETERMINISTIC
    hash-sampled subset (<= ~max_sample rows pulled once to the driver, a
    pure function of ids — partition-independent), run Lloyd locally in
    numpy (no per-iteration Dataset pass), return centroids for a single
    distributed assign. This is both the 10^12-row recipe AND much faster
    on small inputs, where 25 streaming passes are pure task overhead.
    Same update rules as kmeans_fit: ties to the lower cluster id, empty
    clusters keep their centroid, converge on max shift < tol."""
    n = emb_ds.count()
    denom = max(1, -(-n // max_sample))  # ceil: expected sample <= max_sample

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = hash64_ints(ids, salt=KMEANS_SEED_SALT + 1) % denom == 0
        t = t.filter(pa.array(keep))
        h = hash64_ints(
            t.column(id_col).to_numpy(zero_copy_only=False), salt=KMEANS_SEED_SALT
        )
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "vec": pa.array(
                    list(list_to_matrix(t.column(vec_col), dtype=np.float64)),
                    pa.list_(pa.float64()),
                ),
            }
        )

    hs, vs = [], []
    for b in (
        emb_ds.map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows == 0:
            continue  # a fully-filtered block yields a (0, 0) matrix —
            # vstack with real (m, dim) blocks would raise
        hs.append(b.column("h").to_numpy(zero_copy_only=False))
        vs.append(list_to_matrix(b.column("vec"), dtype=np.float64))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    if len(h) == 0:
        raise ValueError("cannot fit k-means on an empty dataset")
    # k > n is degenerate (every point its own centroid) — clamp rather
    # than raise so pipeline callers survive small filtered inputs
    k = min(k, len(h))
    mat = np.vstack(vs)
    order = np.argsort(h, kind="stable")
    cents = mat[order[:k]].copy()

    it = 0
    for it in range(1, iters + 1):
        d = -2.0 * (mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        new = cents.copy()
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, mat)
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        shift = np.linalg.norm(new - cents, axis=1).max()
        cents = new
        if shift < tol:
            break
    return cents, it


def standardize_embeddings(emb_ds, vec_col: str = "embedding"):
    """Feature-scale a vector column to zero mean / unit variance per
    dimension (the standard pre-clustering / pre-ANN normalization): pass 1
    streams per-batch (count, sum, sumsq) partials — dim-sized, no shuffle —
    pass 2 rewrites vectors against the broadcast (mean, inv_std) pair.
    Zero-variance dimensions pass through centered but unscaled (inv_std=1),
    never a divide-by-zero. Output column replaces ``vec_col`` as
    list<double>; all other columns ride along unchanged."""

    empty_partial = pa.table(
        {
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.list_(pa.float64())),
            "ss": pa.array([], pa.list_(pa.float64())),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_partial  # (0, 0) matrix would emit dim-0 sums
        mat = list_to_matrix(t.column(vec_col), dtype=np.float64)
        return pa.table(
            {
                "n": pa.array([mat.shape[0]], pa.int64()),
                "s": pa.array([mat.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "ss": pa.array(
                    [(mat * mat).sum(axis=0).tolist()], pa.list_(pa.float64())
                ),
            }
        )

    n = 0
    s = ss = None
    for row in emb_ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += row["n"]
        rs = np.asarray(row["s"])
        rss = np.asarray(row["ss"])
        s = rs if s is None else s + rs
        ss = rss if ss is None else ss + rss
    if n == 0:
        return emb_ds
    mean = s / n
    var = np.maximum(ss / n - mean * mean, 0.0)
    inv_std = np.where(var > 0, 1.0 / np.sqrt(var), 1.0)
    mref = ray.put((mean, inv_std))

    def rewrite(t: pa.Table) -> pa.Table:
        mu, inv = ray.get(mref)
        mat = list_to_matrix(t.column(vec_col), dtype=np.float64)
        z = (mat - mu) * inv
        idx = t.schema.get_field_index(vec_col)
        return t.set_column(
            idx, vec_col, pa.array(list(z), pa.list_(pa.float64()))
        )

    return emb_ds.map_batches(rewrite, batch_format="pyarrow")
