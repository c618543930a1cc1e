"""Graph node embeddings — DeepWalk-shaped skip-gram with negative
sampling (Perozzi et al. 2014; SGNS from Mikolov et al. 2013) over the
engine's deterministic rank-mix random walks (functions/graphops.py).

Distribution shape: WALK GENERATION is the distributed part (size-adaptive
driver-CSR / per-step-join paths, already scale-audited); SGNS training
runs on the driver over the pulled walk corpus — walks are
O(nodes × walk_len) rows, a function of the NODE universe (a dimension),
never the edge/fact volume. ``EMBED_WALK_LIMIT`` guards the pull; past it,
raise with guidance to shard the node universe and train per shard (the
parameter-server path is out of scope for a sandbox with one node).

Everything is seeded and iteration-ordered: the walks are pure functions
of (graph, seed id), pair order and negative draws come from one seeded
PCG stream, so embeddings are bit-reproducible across runs and
partitioning (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMBED_WALK_LIMIT = 5_000_000  # walk rows pulled to the driver
NEG_TABLE_SIZE = 1 << 17


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -10, 10)))


def sgns_train(
    sequences: list[np.ndarray],
    dim: int = 32,
    window: int = 4,
    negatives: int = 5,
    epochs: int = 10,
    lr: float = 0.15,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Skip-gram negative sampling over dense-id sequences. Vectorized
    minibatch SGD: per batch, gather center/context/negative rows, one
    sigmoid each, then MEAN-normalized scatter updates (see the in-loop
    comment — plain summed scatter diverges when vocab << batch).
    Returns (node_ids_sorted, vectors)."""
    ids = np.unique(np.concatenate(sequences)) if sequences else np.array([], np.int64)
    n = len(ids)
    if n == 0:
        return ids, np.zeros((0, dim), np.float32)
    dense = {v: i for i, v in enumerate(ids)}
    seqs = [np.array([dense[v] for v in s], np.int64) for s in sequences]

    # skip-gram pairs once (window is small; pairs ~ len * 2w)
    cs, os_ = [], []
    for s in seqs:
        ln = len(s)
        for off in range(1, window + 1):
            if ln <= off:
                continue
            cs.append(s[:-off])
            os_.append(s[off:])
            cs.append(s[off:])
            os_.append(s[:-off])
    if not cs:
        centers = np.zeros(0, np.int64)
        contexts = np.zeros(0, np.int64)
    else:
        centers = np.concatenate(cs)
        contexts = np.concatenate(os_)

    # unigram^(3/4) negative table (the word2vec recipe)
    freq = np.bincount(np.concatenate(seqs), minlength=n).astype(np.float64)
    p = freq**0.75
    p /= p.sum()
    neg_table = np.searchsorted(np.cumsum(p), (np.arange(NEG_TABLE_SIZE) + 0.5) / NEG_TABLE_SIZE)

    rng = np.random.default_rng(seed)
    U = (rng.random((n, dim), np.float32) - 0.5) / dim
    V = np.zeros((n, dim), np.float32)
    m = len(centers)
    # batch sized so each epoch takes ~64 steps even on tiny corpora —
    # with mean-normalized scatter the step count, not the pair count,
    # is what drives convergence
    batch = int(np.clip(m // 64, 64, 8192))
    total_steps = max(1, epochs * ((m + batch - 1) // batch))
    step = 0
    for _ in range(epochs):
        order = rng.permutation(m)
        for lo in range(0, m, batch):
            sel = order[lo : lo + batch]
            c = centers[sel]
            o = contexts[sel]
            neg = neg_table[rng.integers(0, NEG_TABLE_SIZE, (len(sel), negatives))]
            eta = lr * (1.0 - step / total_steps) + 1e-4
            step += 1
            uc = U[c]  # (b, d)
            vo = V[o]
            vn = V[neg]  # (b, k, d)
            g_pos = _sigmoid((uc * vo).sum(1)) - 1.0  # (b,)
            g_neg = _sigmoid(np.einsum("bd,bkd->bk", uc, vn))  # (b, k)
            grad_u = g_pos[:, None] * vo + np.einsum("bk,bkd->bd", g_neg, vn)
            grad_vo = g_pos[:, None] * uc
            grad_vn = g_neg[..., None] * uc[:, None, :]
            # MEAN-accumulate per row: a batch holds many pairs touching
            # the same row (always, when vocab << batch); summing their
            # gradients multiplies the effective step by the duplicate
            # count and diverges (measured: float32 overflow by epoch 30
            # on a 16-node graph). Dividing the accumulated gradient by
            # each row's occurrence count bounds every step by eta.
            dim_ = U.shape[1]

            def scat(M, idx, grad):
                buf = np.zeros_like(M)
                np.add.at(buf, idx, grad.astype(np.float32))
                cnt = np.bincount(idx, minlength=M.shape[0]).astype(np.float32)
                M -= eta * buf / np.maximum(cnt, 1.0)[:, None]

            scat(U, c, grad_u)
            vidx = np.concatenate([o, neg.reshape(-1)])
            vgrad = np.concatenate([grad_vo, grad_vn.reshape(-1, dim_)])
            scat(V, vidx, vgrad)
    norms = np.linalg.norm(U, axis=1, keepdims=True)
    U = (U / np.maximum(norms, 1e-12)).astype(np.float32)
    return ids, U


def node_embeddings(
    edges_ds,
    dim: int = 32,
    walk_len: int = 20,
    window: int = 4,
    negatives: int = 5,
    epochs: int = 10,
    seed: int = 7,
    src: str = "src",
    dst: str = "dst",
) -> pa.Table:
    """DeepWalk over a directed int64 edge Dataset: one deterministic
    rank-mix walk per node (vary ``seed`` for ensembles), SGNS on the walk
    corpus, L2-normalized vectors out — ready for the knn/ANN/kmeans
    stack. Returns (node, embedding list<float32>)."""
    from pie_ray.functions.graphops import random_walks
    from pie_ray.util import gather_table

    edges = edges_ds.materialize()
    nodes = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=65536):
        nodes.update(b.column(src).to_pylist())
        nodes.update(b.column(dst).to_pylist())
    n_rows = len(nodes) * (walk_len + 1)
    if n_rows > EMBED_WALK_LIMIT:
        raise ValueError(
            f"{len(nodes)} nodes x {walk_len + 1} walk rows exceed "
            f"EMBED_WALK_LIMIT ({EMBED_WALK_LIMIT}) — shard the node "
            "universe and train per shard"
        )
    walks = random_walks(edges, sorted(nodes), num_steps=walk_len, src=src, dst=dst)
    tbl = gather_table(
        walks,
        schema=pa.schema(
            [("seed", pa.int64()), ("step", pa.int64()), ("node", pa.int64())]
        ),
    )
    sd = tbl.column("seed").to_numpy(zero_copy_only=False)
    st = tbl.column("step").to_numpy(zero_copy_only=False)
    nd = tbl.column("node").to_numpy(zero_copy_only=False)
    order = np.lexsort((st, sd))  # deterministic corpus order
    sd, nd = sd[order], nd[order]
    bounds = np.flatnonzero(np.concatenate([[True], sd[1:] != sd[:-1]]))
    seqs = [nd[a:b] for a, b in zip(bounds, np.append(bounds[1:], len(nd)))]
    ids, vecs = sgns_train(
        seqs, dim=dim, window=window, negatives=negatives, epochs=epochs, seed=seed
    )
    return pa.table(
        {
            "node": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )


def q_node_embeddings(sf_dir: str):
    """Driver entry (rows-only; learned floats aren't hash-oracle
    material): DeepWalk embeddings of the co-supplier graph. Gated by the
    community-separation quality tests rather than an oracle."""
    from pie_ray.functions.graphops import _split_undirected, cooccurrence_edges

    edges = cooccurrence_edges(sf_dir).map_batches(
        _split_undirected, batch_format="pyarrow"
    )
    return node_embeddings(edges, dim=16, walk_len=16, epochs=4)
