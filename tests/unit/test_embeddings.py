"""DeepWalk node embeddings: determinism, community separation on a
two-clique graph, and downstream clustering recovery."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from pie_ray.functions.embeddings import node_embeddings, sgns_train


def _two_cliques(k=8, bridges=1):
    """Cliques {0..k-1} and {k..2k-1} joined by `bridges` edges."""
    edges = []
    for base in (0, k):
        for a in range(base, base + k):
            for b in range(base, base + k):
                if a != b:
                    edges.append((a, b))
    for i in range(bridges):
        edges.append((i, k + i))
        edges.append((k + i, i))
    return edges


def _edges_ds(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def test_embeddings_deterministic(ray_session):
    pairs = _two_cliques()
    a = node_embeddings(_edges_ds(pairs), dim=8, walk_len=10, epochs=1).to_pylist()
    b = node_embeddings(
        _edges_ds(pairs).repartition(5), dim=8, walk_len=10, epochs=1
    ).to_pylist()
    assert a == b and len(a) == 16


def test_communities_separate(ray_session):
    k = 8
    out = node_embeddings(_edges_ds(_two_cliques(k)), dim=16, walk_len=20)
    vecs = {r["node"]: np.array(r["embedding"]) for r in out.to_pylist()}
    intra, inter = [], []
    for a in range(2 * k):
        for b in range(a + 1, 2 * k):
            cos = float(vecs[a] @ vecs[b])
            (intra if (a < k) == (b < k) else inter).append(cos)
    assert np.mean(intra) > np.mean(inter) + 0.2
    # downstream: 2-means on the embeddings recovers the two cliques
    pts = np.stack([vecs[i] for i in range(2 * k)])
    c0 = pts[:k].mean(0)
    c1 = pts[k:].mean(0)
    assign = (pts @ c1 > pts @ c0).astype(int)
    assert assign[:k].sum() == 0 and assign[k:].sum() == k


def test_sgns_empty_and_degenerate():
    ids, vecs = sgns_train([])
    assert len(ids) == 0 and vecs.shape == (0, 32)
    # single-node sequence: no pairs, vectors still come back normalized-ish
    ids, vecs = sgns_train([np.array([5, 5, 5], np.int64)], dim=4, epochs=1)
    assert list(ids) == [5] and vecs.shape == (1, 4)
