"""merge_upsert (CDC latest-version-wins) and melt (wide->long) semantics:
multi/string keys, insert-only keys, partition independence; ntile edge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pie_ray.functions.relational import melt, merge_upsert, q_window_ntile_events


def _merged(base_t, upd_t, keys, blocks=3):
    base = ray.data.from_arrow(base_t).repartition(blocks)
    upd = ray.data.from_arrow(upd_t).repartition(2)
    return (
        merge_upsert(base, upd, keys, "version")
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )


def test_merge_upsert_string_multikey_and_inserts(ray_session):
    base = pa.table(
        {
            "k1": pa.array(["a", "a", "b", "c"]),
            "k2": pa.array([1, 2, 1, 1], pa.int64()),
            "val": pa.array([10, 20, 30, 40], pa.int64()),
            "version": pa.array([0, 0, 0, 0], pa.int64()),
        }
    )
    upd = pa.table(
        {
            # update (a,2); insert brand-new (d,9)
            "k1": pa.array(["a", "d"]),
            "k2": pa.array([2, 9], pa.int64()),
            "val": pa.array([99, 77], pa.int64()),
            "version": pa.array([1, 1], pa.int64()),
        }
    )
    got = _merged(base, upd, ["k1", "k2"])
    want = pd.DataFrame(
        {
            "k1": ["a", "a", "b", "c", "d"],
            "k2": [1, 2, 1, 1, 9],
            "val": [10, 99, 30, 40, 77],
            "version": [0, 1, 0, 0, 1],
        }
    )
    pd.testing.assert_frame_equal(got[list(want.columns)], want)


def test_merge_upsert_partition_independence(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    keys = rng.integers(0, 500, n)
    base = pa.table(
        {
            "k1": pa.array([f"k{v}" for v in keys]),
            "k2": pa.array(keys % 7, pa.int64()),
            "val": pa.array(np.arange(n), pa.int64()),
            "version": pa.array(rng.integers(0, 5, n), pa.int64()),
        }
    )
    upd = base.slice(0, 0)
    a = _merged(base, upd, ["k1", "k2"], blocks=1)
    b = _merged(base, upd, ["k1", "k2"], blocks=7)
    # one row per key either way; same surviving versions
    assert a[["k1", "k2"]].drop_duplicates().shape[0] == len(a)
    pd.testing.assert_frame_equal(
        a[["k1", "k2", "version"]], b[["k1", "k2", "version"]]
    )


def test_melt_shape_and_values(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "x": pa.array([10, 20], pa.int64()),
            "y": pa.array([30, 40], pa.int64()),
        }
    )
    got = (
        melt(ray.data.from_arrow(t), ["id"], ["x", "y"])
        .to_pandas()
        .sort_values(["id", "measure"])
        .reset_index(drop=True)
    )
    assert len(got) == 4
    assert got.loc[(got.id == 1) & (got.measure == "x"), "value"].item() == 10
    assert got.loc[(got.id == 2) & (got.measure == "y"), "value"].item() == 40


def test_ntile_small_partition_edge(ray_session):
    # a user with fewer rows than the tile count gets one bucket per row
    got = q_window_ntile_events("/root/testdata/sf0.001").to_pandas()
    sizes = got.groupby("user_id").size()
    small = sizes[sizes < 4]
    if len(small):
        u = small.index[0]
        grp = got[got.user_id == u].sort_values("nt")
        assert grp.nt.tolist() == list(range(1, len(grp) + 1))
    # global sanity: every tile number within 1..4 and rank <= dense-rank gap
    assert got.nt.between(1, 4).all()
    assert (got.drnk <= got.rnk).all()


def test_merge_upsert_version_tie_partition_independent(ray_session):
    # replayed delta: identical (key, version) rows with different payloads
    # must yield the same survivor under any partitioning
    base = pa.table(
        {
            "k1": pa.array(["a", "a", "b"]),
            "k2": pa.array([1, 1, 2], pa.int64()),
            "val": pa.array([30, 10, 5], pa.int64()),
            "version": pa.array([1, 1, 0], pa.int64()),
        }
    )
    upd = base.slice(0, 0)
    a = _merged(base, upd, ["k1", "k2"], blocks=1)
    b = _merged(base, upd, ["k1", "k2"], blocks=6)
    pd.testing.assert_frame_equal(a, b)
    assert a[(a.k1 == "a")].val.item() == 10  # smallest payload wins ties


def test_explode_list_empty_batch(ray_session):
    from pie_ray.functions.relational import explode_list

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "xs": pa.array([[7], [8]], pa.list_(pa.int64())),
        }
    )
    ds = ray.data.from_arrow(t).filter(expr="id > 99")  # all blocks empty
    assert explode_list(ds, ["id"], "xs").count() == 0


def test_merge_upsert_nested_payload_column(ray_session):
    # nested payloads must not break the sort (tie-break skips them)
    base = pa.table(
        {
            "k1": pa.array(["a", "b"]),
            "k2": pa.array([1, 2], pa.int64()),
            "emb": pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64())),
            "version": pa.array([0, 0], pa.int64()),
        }
    )
    upd = pa.table(
        {
            "k1": pa.array(["a"]),
            "k2": pa.array([1], pa.int64()),
            "emb": pa.array([[9.0, 9.0]], pa.list_(pa.float64())),
            "version": pa.array([1], pa.int64()),
        }
    )
    got = _merged(base, upd, ["k1", "k2"])
    assert len(got) == 2
    assert got[got.k1 == "a"].version.item() == 1
