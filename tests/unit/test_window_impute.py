"""frame_value_windows and impute_nulls: brute-force parity and partition
independence (results must not depend on block layout)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

import pie_ray.functions.relational as rel


def _make_events(rng, n, n_keys, null_every=None):
    keys = rng.integers(0, n_keys, size=n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)  # unique total order per key
    vals = np.round(rng.uniform(0.01, 300.0, size=n) * 100) / 100.0
    valid = np.ones(n, bool)
    if null_every is not None:
        valid = order % null_every != 0
    return keys, order, vals, valid


def _fvw_brute(keys, order, vals):
    out = {}
    for k in np.unique(keys):
        m = keys == k
        o = np.argsort(order[m], kind="stable")
        v = vals[m][o]
        ids = order[m][o]
        for i, oid in enumerate(ids):
            out[int(oid)] = (
                float(v[0]),
                float(v[-1]),
                float(v[1]) if len(v) > 1 else -1.0,
            )
    return out


def test_frame_value_windows_brute_parity_and_partition_independence(ray_session):
    rng = np.random.default_rng(19)
    n = 6000
    keys, order, vals, _ = _make_events(rng, n, 37)
    # some singleton partitions so the second_val sentinel fires
    keys[:3] = np.array([1000, 1001, 1002])
    t = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "o": pa.array(order, pa.int64()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    want = _fvw_brute(keys, order, vals)
    results = []
    for parts, nb in ((1, 4), (11, 32)):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = (
            rel.frame_value_windows(ds, "k", ["o"], "v", num_buckets=nb)
            .to_pandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
        assert len(got) == n
        for _, r in got.iterrows():
            wf, wl, ws = want[int(r["o"])]
            # value copies: bit-exact
            assert (r["first_val"], r["last_val"], r["second_val"]) == (wf, wl, ws)
        results.append(got)
    assert results[0].equals(results[1])


def _impute_brute(keys, order, vals, valid):
    out = {}
    for k in np.unique(keys):
        m = keys == k
        o = np.argsort(order[m], kind="stable")
        v, ok, ids = vals[m][o], valid[m][o], order[m][o]
        cents = np.rint(v[ok] * 100.0).astype(np.int64)
        mean = (float(cents.sum()) / int(ok.sum())) / 100.0 if ok.any() else -1.0
        last = -1.0
        for i, oid in enumerate(ids):
            if ok[i]:
                last = float(v[i])
                out[int(oid)] = (float(v[i]), float(v[i]), float(v[i]))
            else:
                out[int(oid)] = (0.0, last, mean)
    return out


def test_impute_nulls_brute_parity_and_partition_independence(ray_session):
    rng = np.random.default_rng(23)
    n = 6000
    keys, order, vals, valid = _make_events(rng, n, 37, null_every=5)
    # one all-null key so the mean/LOCF sentinels fire
    keys[order % 5 == 0] = np.where(
        rng.random((order % 5 == 0).sum()) < 0.05, 2000, keys[order % 5 == 0]
    )
    keys[keys == 2000] = 2000
    t = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "o": pa.array(order, pa.int64()),
            "v": pa.array(
                [float(v) if ok else None for v, ok in zip(vals, valid)],
                pa.float64(),
            ),
        }
    )
    want = _impute_brute(keys, order, vals, valid)
    results = []
    for parts, nb in ((1, 4), (11, 32)):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = (
            rel.impute_nulls(ds, "k", ["o"], "v", num_buckets=nb)
            .to_pandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
        assert len(got) == n
        for _, r in got.iterrows():
            wc, wl, wm = want[int(r["o"])]
            assert (r["v_const"], r["v_locf"], r["v_mean"]) == (wc, wl, wm)
        results.append(got)
    assert results[0].equals(results[1])


def test_impute_nulls_all_null_key_sentinels(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2], pa.int64()),
            "o": pa.array([0, 1, 2, 3], pa.int64()),
            "v": pa.array([None, None, 5.0, None], pa.float64()),
        }
    )
    got = (
        rel.impute_nulls(ray.data.from_arrow(t), "k", ["o"], "v", num_buckets=2)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    # key 1 is all-null: const fill, no LOCF carry, no mean
    assert got["v_const"].tolist() == [0.0, 0.0, 5.0, 0.0]
    assert got["v_locf"].tolist() == [-1.0, -1.0, 5.0, 5.0]
    assert got["v_mean"].tolist() == [-1.0, -1.0, 5.0, 5.0]
