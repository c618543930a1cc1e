"""global_rank: exact dense ranks, tie-heavy keys in one range,
partition independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pie_ray.functions.relational import global_rank


def _run(t, blocks):
    return (
        global_rank(ray.data.from_arrow(t).repartition(blocks), "k", "id")
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )


def test_exact_ranks_vs_numpy(ray_session):
    rng = np.random.default_rng(2)
    n = 5000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "k": pa.array(rng.normal(size=n)),
        }
    )
    got = _run(t, 8)
    order = np.lexsort((np.arange(n), t.column("k").to_numpy()))
    assert got.id.tolist() == order.tolist()
    assert got.rn.tolist() == list(range(1, n + 1))


def test_heavy_ties_single_range(ray_session):
    # a near-constant key: 90% of rows share one value — all its ties must
    # land in one range and still rank 1..n densely by the tie column
    n = 3000
    k = np.where(np.arange(n) % 10 == 0, np.arange(n, dtype=np.float64), 7.0)
    t = pa.table(
        {"id": pa.array(np.arange(n), pa.int64()), "k": pa.array(k)}
    )
    got = _run(t, 6)
    order = np.lexsort((np.arange(n), k))
    assert got.id.tolist() == order.tolist()
    assert got.rn.tolist() == list(range(1, n + 1))


def test_partition_independence(ray_session):
    rng = np.random.default_rng(9)
    n = 2000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "k": pa.array(rng.integers(0, 50, n), pa.int64()),
        }
    )
    a, b = _run(t, 1), _run(t, 11)
    pd.testing.assert_frame_equal(a, b)
