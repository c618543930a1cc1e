"""semantic_dedup: planted near-dup groups, keep rule (least prototypical),
brute-force parity, partition independence, real-table smoke."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pie_ray.functions.semdedup import q_semdedup, semantic_dedup

DIM = 16
SF = "/root/testdata/sf0.001"


def _planted():
    """4 well-separated axis clusters; cluster c has one base vector and
    near-duplicate copies at slightly different distances from the centroid
    (so the keep rule has a unique argmin), plus one far-but-same-cluster
    outlier that must NOT join the dup component."""
    rng = np.random.default_rng(7)
    rows = []
    centroids = np.zeros((4, DIM))
    for c in range(4):
        base = np.zeros(DIM)
        base[c] = 1.0
        centroids[c] = base
        perp = np.zeros(DIM)
        perp[c + 4] = 1.0
        # dup group: angles 2°, 4°, 6° off the centroid axis
        for j, deg in enumerate((2.0, 4.0, 6.0)):
            th = np.deg2rad(deg)
            v = np.cos(th) * base + np.sin(th) * perp
            rows.append((c * 10 + j, v * (1.0 + 0.1 * j)))
        # outlier: 40° off — same cluster, cosine vs dups ≈ cos(34°) < 0.95
        th = np.deg2rad(40.0)
        rows.append((c * 10 + 9, np.cos(th) * base + np.sin(th) * perp))
    rng.shuffle(rows)
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1].astype(np.float32).tolist() for r in rows],
                pa.list_(pa.float32()),
            ),
        }
    )
    return t, centroids


def _run(t, centroids, blocks=2):
    ds = ray.data.from_arrow(t).repartition(blocks)
    return (
        semantic_dedup(ds, tau=0.95, centroids=centroids)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_keep_rule_and_components(ray_session):
    t, cents = _planted()
    got = _run(t, cents)
    assert len(got) == 16
    for c in range(4):
        grp = got[got.cluster == c]
        assert set(grp.vec_id) == {c * 10, c * 10 + 1, c * 10 + 2, c * 10 + 9}
        dups = grp[grp.vec_id < c * 10 + 9]
        # dup component: one keeper, and it is the farthest-from-centroid
        # member (6° off = id c*10+2); all three share that rep
        assert set(dups.rep) == {c * 10 + 2}
        assert dups[dups.keep].vec_id.tolist() == [c * 10 + 2]
        # the 40° outlier is its own singleton component
        out = grp[grp.vec_id == c * 10 + 9].iloc[0]
        assert out.keep and out.rep == c * 10 + 9


def test_partition_independence(ray_session):
    t, cents = _planted()
    a, b = _run(t, cents, blocks=1), _run(t, cents, blocks=5)
    pd.testing.assert_frame_equal(a, b)


def test_real_table_smoke_and_invariants(ray_session):
    got = q_semdedup(SF).to_pandas()
    assert len(got) == 500 and got.vec_id.nunique() == 500
    # every rep is a kept row of the same cluster, and exactly the reps
    # have keep=True
    kept = got[got.keep]
    by_id = got.set_index("vec_id")
    assert set(got.rep) == set(kept.vec_id)
    assert (by_id.loc[got.rep].cluster.values == got.cluster.values).all()
    assert (by_id.loc[got.rep].keep.values).all()
