"""histogram: under/overflow bins, nulls skipped, partition independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.functions.relational import histogram


def test_histogram_edges_nulls_partitions(ray_session):
    t = pa.table(
        {
            "v": pa.array(
                [-5.0, 0.0, 4.99, 5.0, 9.99, 10.0, 25.0, None, 100.0],
                pa.float64(),
            )
        }
    )
    for blocks in (1, 4):
        got = histogram(
            ray.data.from_arrow(t).repartition(blocks), "v", 0.0, 10.0, 2
        ).to_pandas()
        by_bin = dict(zip(got.bin, got.n))
        assert by_bin == {-1: 1, 0: 2, 1: 2, 2: 3}  # null dropped; 10/25/100 overflow
        lo = dict(zip(got.bin, got.lo))
        hi = dict(zip(got.bin, got.hi))
        assert lo[-1] == -np.inf and hi[2] == np.inf
        assert lo[0] == 0.0 and hi[0] == 5.0 and lo[1] == 5.0 and hi[1] == 10.0
        assert got.n.sum() == 8


def test_histogram_nan_skipped(ray_session):
    from pie_ray.functions.relational import grouped_histogram

    t = pa.table(
        {
            "g": pa.array(["x", "x", "y"]),
            "v": pa.array([float("nan"), 1.0, 11.0], pa.float64()),
        }
    )
    got = histogram(ray.data.from_arrow(t), "v", 0.0, 10.0, 2).to_pandas()
    assert got.n.sum() == 2  # NaN dropped like null
    gh = grouped_histogram(ray.data.from_arrow(t), "v", ["g"], 0.0, 10.0, 2).to_pandas()
    assert gh.n.sum() == 2 and (gh.bin >= -1).all()
