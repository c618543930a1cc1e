"""SemDeDup-style semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" — public recipe; no reference-file citation possible,
/root/reference is empty, see SURVEY.md §0).

Pipeline shape (all stages bounded — nothing materializes the corpus):

1. ``kmeans_fit_sample`` (pie_ray.functions.clustering): deterministic
   hash-sampled local fit (the at-scale recipe), distributed assign only —
   NO shuffle; pass ``centroids`` to use a full-corpus ``kmeans_fit``.
2. ``kmeans_assign``: stateless task map tagging every row with its cluster.
3. ONE bounded shuffle on ``cluster`` (k ≤ a few hundred — within the house
   rule that Ray groupby keys stay low-cardinality), then a fully vectorized
   per-cluster pass: blockwise cosine matmul → near-dup pairs (cos ≥ tau) →
   local index DSU → per-component keep rule.

Keep rule (the paper's): within a duplicate component keep the member with
the LOWEST cosine similarity to its cluster centroid (the least prototypical
example carries the most information), ties broken by min id. Everything is
deterministic given (k, tau, seed-fixed k-means) and independent of
partitioning: group rows are sorted by id before any pairwise work.

Scale notes (100 TB): cluster sizes average n/k; a hot cluster is bounded by
``max_cluster_rows`` — oversized clusters are split deterministically by
hash(id) into sub-buckets and dedup runs within a sub-bucket only (documented
approximation, same spirit as the paper's within-cluster restriction; raise
k to shrink clusters instead of relying on the cap). The pairwise matmul is
blockwise (block × cluster, never cluster × cluster at once), so per-task
memory is O(block · max_cluster_rows); with the defaults that is ~32 MB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.functions.clustering import kmeans_assign, kmeans_fit_sample
from pie_ray.util import hash64_ints, list_to_matrix

SEM_TAU = 0.95
SEM_MAX_CLUSTER_ROWS = 4096
_PAIR_BLOCK = 1024


def _dup_components(mat: np.ndarray, tau: float) -> np.ndarray:
    """Index-level connected components of the cos ≥ tau graph over the
    (already L2-normalized) rows of ``mat``: blockwise matmul collects the
    upper-triangle edge list, then fully vectorized hash-min label
    propagation with pointer jumping (O(log n) rounds, no Python loop over
    pairs — a cluster of identical vectors yields O(m²/2) edges, which a
    per-pair union loop would crawl through). Returns the min row index of
    each row's component (the same canonical label a min-root DSU gives)."""
    m = mat.shape[0]
    edges_a, edges_b = [], []
    for lo in range(0, m, _PAIR_BLOCK):
        hi = min(lo + _PAIR_BLOCK, m)
        sims = mat[lo:hi] @ mat.T  # (block, m)
        rows, cols = np.nonzero(sims >= tau)
        rows = rows + lo
        over = rows < cols  # upper triangle only
        edges_a.append(rows[over])
        edges_b.append(cols[over])
    a = np.concatenate(edges_a) if edges_a else np.empty(0, np.int64)
    b = np.concatenate(edges_b) if edges_b else np.empty(0, np.int64)
    lab = np.arange(m, dtype=np.int64)
    while True:
        prev = lab
        lab = lab.copy()
        if len(a):
            mn = np.minimum(prev[a], prev[b])
            np.minimum.at(lab, a, mn)
            np.minimum.at(lab, b, mn)
        lab = lab[lab]  # pointer jump
        if np.array_equal(lab, prev):
            return lab


def semantic_dedup(
    emb_ds,
    k: int = 64,
    tau: float = SEM_TAU,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_rows: int = SEM_MAX_CLUSTER_ROWS,
    centroids: np.ndarray | None = None,
):
    """Returns (id_col, cluster:int64, rep:int64, keep:bool) for EVERY input
    row: ``rep`` is the kept representative of the row's duplicate component
    (rows with keep=False are semantic near-dups of their rep). Pass
    ``centroids`` to reuse a fitted model (e.g. from a sample)."""
    import ray  # noqa: F401  (Dataset ops below)

    if centroids is None:
        # sample-fit + distributed assign (the 100 TB recipe — and on small
        # inputs it avoids paying 25 streaming passes of task overhead)
        centroids, _ = kmeans_fit_sample(emb_ds, k, vec_col=vec_col, id_col=id_col)
    cents = np.asarray(centroids, np.float64)
    tagged = kmeans_assign(emb_ds, cents, vec_col=vec_col)

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids_all = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids_all, kind="stable")
        g = g.take(pa.array(order))
        ids = ids_all[order]
        cluster = int(g.column("cluster")[0].as_py())
        mat = list_to_matrix(g.column(vec_col), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        cvec = cents[cluster]
        cnorm = np.linalg.norm(cvec) or 1.0
        cent_sim = unit @ (cvec / cnorm)

        n = len(ids)
        sub = (
            np.zeros(n, np.int64)
            if n <= max_cluster_rows
            else (hash64_ints(ids, salt=17) % -(-n // max_cluster_rows)).astype(np.int64)
        )
        rep = np.empty(n, np.int64)
        keep = np.zeros(n, bool)
        for s in np.unique(sub):
            sel = np.nonzero(sub == s)[0]
            roots = _dup_components(unit[sel], tau)
            for r in np.unique(roots):
                comp = sel[roots == r]
                # keep the least prototypical member (min centroid cosine),
                # ties to the smallest id (comp is id-sorted already)
                kept = comp[int(np.argmin(cent_sim[comp]))]
                keep[kept] = True
                rep[comp] = ids[kept]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(np.full(n, cluster), pa.int64()),
                "rep": pa.array(rep, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return tagged.groupby("cluster").map_groups(dedup_cluster, batch_format="pyarrow")


def q_semdedup(sf_dir: str, k: int = 16, tau: float = SEM_TAU):
    """Driver-shaped entry over the embeddings table: one row per vector
    with its semantic-dup verdict. Library-registered (entry cap is full)."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup(ds, k=k, tau=tau)
