"""Exact cosine similarity self-join: partition independence, symmetry
constraint (id_a < id_b), threshold boundary, and the quadratic-scale seam."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pie_ray.functions.similarity import cosine_sim_join


def _ds(vecs, ids=None, blocks=1):
    n = len(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(ids or list(range(n)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_sim_join_brute_parity_and_order(ray_session):
    vecs = [[1, 0], [0.9, 0.1], [0, 1], [-1, 0], [0.5, 0.5]]
    got = sorted(
        (r["id_a"], r["id_b"], r["sim"])
        for r in cosine_sim_join(_ds(vecs), threshold=0.5).take_all()
    )
    m = np.array(vecs, float)
    m = m / np.linalg.norm(m, axis=1)[:, None]
    want = []
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            s = round(float(m[i] @ m[j]), 6)
            if s >= 0.5:
                want.append((i, j, s))
    assert got == sorted(want)
    assert all(a < b for a, b, _ in got)


def test_sim_join_partition_independent(ray_session):
    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 8).tolist()
    base = None
    for blocks in (1, 3, 7):
        got = sorted(
            (r["id_a"], r["id_b"], r["sim"])
            for r in cosine_sim_join(_ds(vecs, blocks=blocks), threshold=0.2).take_all()
        )
        if base is None:
            base = got
        assert got == base and len(got) > 0


def test_sim_join_budget_seam(ray_session):
    import pie_ray.functions.similarity as s

    old = s.SIM_JOIN_BROADCAST_MAX
    s.SIM_JOIN_BROADCAST_MAX = 2
    try:
        with pytest.raises(NotImplementedError):
            cosine_sim_join(_ds([[1, 0], [0, 1], [1, 1]]))
    finally:
        s.SIM_JOIN_BROADCAST_MAX = old


def _planted_corpus():
    """40 random dim-16 vectors + 15 near-dups of the first 15 — the
    sim >= 0.9 pair set is dominated by the planted pairs (all ~0.99)."""
    rng = np.random.RandomState(11)
    base = rng.randn(40, 16)
    dups = base[:15] + 0.05 * rng.randn(15, 16)
    vecs = np.vstack([base, dups])
    m = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = np.round(m @ m.T, 6)
    want = {
        (i, j, float(sims[i, j]))
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if sims[i, j] >= 0.9
    }
    return vecs.tolist(), want


def test_sim_join_lsh_degrade_quality(ray_session):
    """Over-budget + on_over_budget='lsh': precision 1.0 with EXACT sims
    (fallback output ⊆ exact output), recall >= 0.9 at the high-threshold
    regime the degrade is built for; the default still raises."""
    import pie_ray.functions.similarity as s

    vecs, want = _planted_corpus()
    old = s.SIM_JOIN_BROADCAST_MAX
    s.SIM_JOIN_BROADCAST_MAX = 10
    try:
        with pytest.raises(NotImplementedError):
            cosine_sim_join(_ds(vecs), threshold=0.9)
        got = {
            (r["id_a"], r["id_b"], r["sim"])
            for r in cosine_sim_join(
                _ds(vecs, blocks=3), threshold=0.9, on_over_budget="lsh"
            ).take_all()
        }
    finally:
        s.SIM_JOIN_BROADCAST_MAX = old
    assert got <= want, "fallback emitted a pair the exact join would not"
    assert len(want) >= 15  # the planted pairs are really in range
    assert len(got) >= 0.9 * len(want), (len(got), len(want))


def test_sim_join_lsh_partition_independent(ray_session):
    from pie_ray.functions.similarity import cosine_sim_join_lsh

    vecs, _ = _planted_corpus()
    base = None
    for blocks in (1, 3, 7):
        got = sorted(
            (r["id_a"], r["id_b"], r["sim"])
            for r in cosine_sim_join_lsh(_ds(vecs, blocks=blocks), threshold=0.9).take_all()
        )
        if base is None:
            base = got
        assert got == base and len(got) > 0


def test_sim_lsh_boundary_recall_shape():
    from pie_ray.functions.similarity import _sim_lsh_boundary_recall

    r95 = _sim_lsh_boundary_recall(0.95)
    r70 = _sim_lsh_boundary_recall(0.70)
    r30 = _sim_lsh_boundary_recall(0.30)
    assert 0.0 <= r30 <= r70 <= r95 <= 1.0
    assert r95 > 0.99  # the near-dup regime the degrade targets
