"""exact_quantile_disc: brute-force parity under forced multi-round
refinement, duplicate-heavy distributions, and nulls/NaN exclusion."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

import pie_ray.functions.relational as rel


def _disc(vals: np.ndarray, q: float) -> float:
    # DuckDB quantile_disc: the max(1, ceil(n*q))-th smallest (verified
    # empirically against DuckDB 1.0.0 incl. float edges)
    import math

    k = max(1, math.ceil(len(vals) * q))
    return float(np.sort(vals)[k - 1])


def test_refinement_parity_random(ray_session, monkeypatch):
    # tiny pull limit forces several narrowing rounds
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 64)
    rng = np.random.default_rng(12)
    vals = rng.lognormal(mean=8, sigma=2, size=20_000)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.float64())})
    ).repartition(7)
    for q in (0.0, 0.25, 0.5, 0.9, 0.99, 1.0):
        got = rel.exact_quantile_disc(ds, "x", q)
        assert got == _disc(vals, q), q


def test_duplicate_heavy_and_nulls(ray_session, monkeypatch):
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 32)
    # 90% of the mass is one repeated value; nulls and NaN must be excluded
    vals = np.concatenate([np.full(5000, 42.5), np.linspace(0, 100, 500)])
    col = pa.array(
        list(vals) + [None] * 50 + [float("nan")] * 50, pa.float64()
    )
    ds = ray.data.from_arrow(pa.table({"x": col})).repartition(5)
    for q in (0.1, 0.5, 0.95):
        got = rel.exact_quantile_disc(ds, "x", q)
        assert got == _disc(vals, q), q


def test_grouped_refinement_parity(ray_session, monkeypatch):
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 64)
    rng = np.random.default_rng(5)
    gs = np.repeat(np.array(["a", "b", "c"]), [7000, 300, 4000])
    vals = np.concatenate(
        [
            rng.lognormal(8, 2, 7000),
            np.full(300, 13.25),  # duplicate-only group
            rng.normal(50, 20, 4000),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(gs), "x": pa.array(vals, pa.float64())})
    ).repartition(6)
    got = rel.exact_quantile_disc_grouped(ds, "x", 0.5, "g").to_pandas()
    want = {
        "a": _disc(vals[:7000], 0.5),
        "b": 13.25,
        "c": _disc(vals[7300:], 0.5),
    }
    for _, row in got.iterrows():
        assert row.value == want[row.g], row.g


def test_duckdb_parity_awkward_sizes(ray_session):
    # n and q chosen so ceil(n*q) != floor((n-1)*q)+1 — the rank-rule
    # regression class; compare directly against DuckDB
    import duckdb

    rng = np.random.default_rng(3)
    for n, q in [(10, 0.95), (12, 0.9), (7, 0.34), (101, 0.33)]:
        vals = rng.normal(size=n)
        ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
        got = rel.exact_quantile_disc(ds, "x", q)
        con = duckdb.connect()
        con.execute("CREATE TABLE t (v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
        want = con.execute("SELECT quantile_disc(v, ?) FROM t", [q]).fetchone()[0]
        assert got == want, (n, q)


def test_grouped_int_key(ray_session):
    # non-string group keys must round-trip (regression: hardcoded string)
    rng = np.random.default_rng(8)
    gs = np.repeat(np.array([3, 7], np.int64), [500, 800])
    vals = np.concatenate([rng.normal(0, 1, 500), rng.normal(10, 2, 800)])
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(gs, pa.int64()), "x": pa.array(vals, pa.float64())})
    ).repartition(4)
    got = rel.exact_quantile_disc_grouped(ds, "x", 0.5, "g").to_pandas()
    assert set(got.g) == {3, 7}
    assert got[got.g == 3].value.item() == _disc(vals[:500], 0.5)
    assert got[got.g == 7].value.item() == _disc(vals[500:], 0.5)


def test_top_edge_bin_with_duplicate_max(ray_session, monkeypatch):
    # regression: the column max raw-floors to bin EQ_BINS and only clip
    # folds it into the last bin — a selector recorded in plain-floor form
    # dropped those rows in later rounds (IndexError / silently low value)
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 64)
    vals = np.concatenate([np.linspace(0, 100, 400), np.full(500, 103.7)])
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.float64())})
    ).repartition(4)
    for q in (1.0, 0.99, 0.6):
        assert rel.exact_quantile_disc(ds, "x", q) == _disc(vals, q), q
    # grouped flavor of the same edge
    t = pa.table(
        {
            "g": pa.array(["a"] * len(vals)),
            "x": pa.array(vals, pa.float64()),
        }
    )
    got = rel.exact_quantile_disc_grouped(
        ray.data.from_arrow(t).repartition(3), "x", 1.0, "g"
    ).to_pandas()
    assert got.value.item() == 103.7


def test_bin_boundary_ulp_values(ray_session, monkeypatch):
    """ADVICE r3 regression: values within 1 ulp of derived bin boundaries
    must neither shift the selected rank nor raise (the old code applied a
    derived-range refilter that was not ulp-nested in the parent bin's clip
    test). Construct a cloud of values AT and 1-ulp-around the round-1 bin
    edges, forced through several refinement rounds."""
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 16)
    lo, hi = 0.1, 7777.7
    width = (hi - lo) / rel.EQ_BINS
    edges = lo + np.arange(1, rel.EQ_BINS) * width
    vals = np.concatenate(
        [
            edges,
            np.nextafter(edges, -np.inf),
            np.nextafter(edges, np.inf),
            np.linspace(lo, hi, 3000),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.float64())})
    ).repartition(5)
    for q in (0.01, 0.25, 0.5, 0.75, 0.999):
        assert rel.exact_quantile_disc(ds, "x", q) == _disc(vals, q), q


def test_grouped_bin_boundary_ulp_values(ray_session, monkeypatch):
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 16)
    lo, hi = -5.0, 5.0
    width = (hi - lo) / rel.EQ_BINS
    edges = lo + np.arange(1, rel.EQ_BINS) * width
    vals = np.concatenate([edges, np.nextafter(edges, np.inf)])
    keys = np.where(np.arange(len(vals)) % 2 == 0, "a", "b")
    # pin each group's min/max so lo/hi are the intended boundaries
    vals = np.concatenate([vals, [lo, hi, lo, hi]])
    keys = np.concatenate([keys, ["a", "a", "b", "b"]])
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(keys), "x": pa.array(vals, pa.float64())})
    ).repartition(4)
    t = rel.exact_quantile_disc_grouped(ds, "x", 0.5, "g")
    got = dict(zip(t.column("g").to_pylist(), t.column("value").to_pylist()))
    for g in ("a", "b"):
        expect = _disc(vals[keys == g], 0.5)
        assert got[g] == expect, g


def test_explicit_rank_override_and_interp_median(ray_session, monkeypatch):
    monkeypatch.setattr(rel, "EQ_PULL_LIMIT", 64)
    rng = np.random.default_rng(77)
    for n in (4_001, 4_000):  # odd AND even counts
        vals = rng.normal(500, 200, size=n)
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(vals, pa.float64())})
        ).repartition(5)
        s = np.sort(vals)
        stats = rel._eq_stats(ds, "x")
        # explicit k selects the exact order statistic
        for k in (1, n // 2, n):
            assert rel.exact_quantile_disc(ds, "x", 0.5, stats=stats, k=k) == s[k - 1]
        # interpolated median = (both middle ranks) / 2, one float expr
        a = rel.exact_quantile_disc(ds, "x", 0.5, stats=stats, k=(n + 1) // 2)
        b = rel.exact_quantile_disc(ds, "x", 0.5, stats=stats, k=n // 2 + 1)
        want = (s[(n + 1) // 2 - 1] + s[n // 2]) / 2.0
        assert (a + b) / 2.0 == want
