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
