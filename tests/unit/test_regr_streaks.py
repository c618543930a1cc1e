"""grouped_regression and activity_streaks: brute-force parity and
partition independence (results must not depend on block layout)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

import pie_ray.functions.relational as rel


def _regr_brute(keys, x, y):
    out = {}
    for k in sorted(set(keys)):
        m = np.asarray(keys) == k
        xi = x[m].astype(object)  # python ints -> exact moments
        yi = y[m].astype(object)
        n = int(m.sum())
        sx, sy = sum(xi), sum(yi)
        sx2 = sum(v * v for v in xi)
        sy2 = sum(v * v for v in yi)
        sxy = sum(a * b for a, b in zip(xi, yi))
        num = n * sxy - sx * sy
        dx = n * sx2 - sx * sx
        dy = n * sy2 - sy * sy
        slope = float(num) / float(dx) if dx else 0.0
        out[k] = (
            n,
            slope,
            (float(sy) - slope * float(sx)) / n,
            float(num) / float(n) / float(n - 1) if n > 1 else 0.0,
            (float(num) * float(num)) / (float(dx) * float(dy)) if dx and dy else 0.0,
        )
    return out


def test_grouped_regression_brute_parity(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.choice(["A", "B", "C"], size=n)
    x = rng.integers(1, 50, size=n)
    y = (x * 317 + rng.integers(-200, 200, size=n)).astype(np.int64)
    t = pa.table(
        {
            "k": pa.array(keys.tolist(), pa.string()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    want = _regr_brute(keys, x, y)
    for parts in (1, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = rel.grouped_regression(ds, "k", "x", "y")
        assert got.column("k").to_pylist() == sorted(want)
        for i, k in enumerate(sorted(want)):
            wn, wslope, wint, wcov, wr2 = want[k]
            assert got.column("n")[i].as_py() == wn
            # bit-exact: the engine evaluates the identical float exprs
            assert got.column("slope")[i].as_py() == wslope
            assert got.column("intercept")[i].as_py() == wint
            assert got.column("covar_samp")[i].as_py() == wcov
            assert got.column("r2")[i].as_py() == wr2


def _streaks_brute(users, days):
    per_user = {}
    for u in sorted(set(users)):
        d = np.unique(days[users == u])
        breaks = np.flatnonzero(np.diff(d) != 1)
        lens = np.diff(np.concatenate([[0], breaks + 1, [len(d)]]))
        lens = lens[lens > 0]
        per_user[int(u)] = (len(d), len(lens), int(lens.max()))
    return per_user


def test_activity_streaks_brute_parity_and_partition_independence(ray_session):
    rng = np.random.default_rng(11)
    n = 8000
    users = rng.integers(0, 40, size=n).astype(np.int64)
    # clustered days so real multi-day streaks AND gaps appear
    days = (rng.integers(0, 30, size=n) + rng.integers(0, 4, size=n) * 100).astype(
        np.int64
    )
    ts = pa.array(days * 86_400_000_000 + 123, pa.timestamp("us"))
    t = pa.table({"user_id": pa.array(users, pa.int64()), "ts": ts})
    want = _streaks_brute(users, days)
    results = []
    for parts, nb in ((1, 4), (13, 32)):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = (
            rel.activity_streaks(ds, num_buckets=nb)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == sorted(want)
        for _, r in got.iterrows():
            wa, wn, wl = want[int(r["user_id"])]
            assert (r["n_active_days"], r["n_streaks"], r["longest_streak"]) == (
                wa,
                wn,
                wl,
            )
        results.append(got)
    # identical output across block layouts and bucket counts
    assert results[0].equals(results[1])


def test_activity_streaks_single_events_and_empty_blocks(ray_session):
    # one event per user -> 1-day streaks; an all-filtered block layout
    t = pa.table(
        {
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 86_400_000_000, 5 * 86_400_000_000], pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)  # forces empty blocks
    got = rel.activity_streaks(ds, num_buckets=8).to_pandas().sort_values("user_id")
    assert got["longest_streak"].tolist() == [1, 1, 1]
    assert got["n_streaks"].tolist() == [1, 1, 1]
