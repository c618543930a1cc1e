"""k-anonymity / l-diversity: brute parity, both release paths, edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pie_ray.functions.privacy import (
    enforce_k_anonymity,
    generalize_to_k,
    qi_group_stats,
)


def _people(n=200, seed=11):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "pid": pa.array(np.arange(n, dtype=np.int64)),
            "zip3": pa.array(rng.randint(100, 112, n).astype(np.int64)),
            "age_band": pa.array(
                [f"b{v}" for v in rng.randint(0, 4, n)], pa.string()
            ),
            "diagnosis": pa.array(
                [f"d{v}" for v in rng.randint(0, 6, n)], pa.string()
            ),
        }
    )


def _brute_stats(t, quasi, sensitive):
    rows = list(zip(*[t.column(c).to_pylist() for c in quasi + [sensitive]]))
    groups: dict[tuple, list] = {}
    for r in rows:
        groups.setdefault(r[:-1], []).append(r[-1])
    return {
        qi: (len(vs), len(set(vs))) for qi, vs in groups.items()
    }


def _stats_map(ds_out, quasi):
    df = ds_out.to_pandas()
    return {
        tuple(row[c] for c in quasi): (int(row["group_size"]), int(row["l_distinct"]))
        for _, row in df.iterrows()
    }


class TestQiGroupStats:
    def test_brute_parity_multi_qi(self, ray_session):
        t = _people()
        want = _brute_stats(t, ["zip3", "age_band"], "diagnosis")
        got = _stats_map(
            qi_group_stats(
                ray.data.from_arrow(t).repartition(5),
                ["zip3", "age_band"],
                sensitive_col="diagnosis",
            ),
            ["zip3", "age_band"],
        )
        assert got == want

    def test_no_sensitive_column_l_is_one(self, ray_session):
        t = _people()
        got = _stats_map(
            qi_group_stats(ray.data.from_arrow(t), ["zip3"]), ["zip3"]
        )
        brute = _brute_stats(t, ["zip3"], "diagnosis")
        assert {k: v[0] for k, v in got.items()} == {
            k: v[0] for k, v in brute.items()
        }
        assert all(l == 1 for _, l in got.values())

    def test_null_sensitive_values_dont_count_toward_l(self, ray_session):
        # SQL COUNT(DISTINCT) ignores NULLs: {d0, null} is l=1, {null} is 0
        t = pa.table(
            {
                "zip3": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "diagnosis": pa.array(["d0", None, "d0", None, None], pa.string()),
            }
        )
        got = _stats_map(
            qi_group_stats(ray.data.from_arrow(t), ["zip3"], "diagnosis"),
            ["zip3"],
        )
        assert got == {(1,): (3, 1), (2,): (2, 0)}

    def test_partition_and_bucket_independence(self, ray_session):
        t = _people(seed=23)
        a = _stats_map(
            qi_group_stats(
                ray.data.from_arrow(t).repartition(1), ["zip3"], "diagnosis",
                num_buckets=4,
            ),
            ["zip3"],
        )
        b = _stats_map(
            qi_group_stats(
                ray.data.from_arrow(t).repartition(9), ["zip3"], "diagnosis",
                num_buckets=17,
            ),
            ["zip3"],
        )
        assert a == b


class TestEnforceKAnonymity:
    def _release_ids(self, ds_out):
        return sorted(ds_out.to_pandas()["pid"].astype(int).tolist())

    def _brute_release(self, t, quasi, k, sensitive, l):
        stats = _brute_stats(t, quasi, sensitive)
        qi_rows = list(zip(*[t.column(c).to_pylist() for c in quasi]))
        pids = t.column("pid").to_pylist()
        return sorted(
            p
            for p, qi in zip(pids, qi_rows)
            if stats[qi][0] >= k and stats[qi][1] >= l
        )

    def test_broadcast_equals_join_equals_brute(self, ray_session):
        t = _people(seed=31)
        want = self._brute_release(t, ["zip3"], 17, "diagnosis", 5)
        ds = ray.data.from_arrow(t).repartition(4)
        bc = enforce_k_anonymity(ds, ["zip3"], k=17, sensitive_col="diagnosis", l=5)
        jn = enforce_k_anonymity(
            ds, ["zip3"], k=17, sensitive_col="diagnosis", l=5, broadcast_limit=0
        )
        assert self._release_ids(bc) == self._release_ids(jn) == want
        assert 0 < len(want) < t.num_rows  # the gate genuinely suppresses

    def test_null_qi_values_group_separately_both_paths(self, ray_session):
        # (null,"a") passes k, (null,"b") must NOT ride along on the null
        # key (the old string key collapsed every null-bearing tuple onto
        # one key and leaked the failing group) — and broadcast == join
        zips = [None] * 6 + [None] + [7] * 6
        bands = ["a"] * 6 + ["b"] + ["c"] * 6
        t = pa.table(
            {
                "pid": pa.array(np.arange(13, dtype=np.int64)),
                "zip3": pa.array(zips, pa.int64()),
                "age_band": pa.array(bands, pa.string()),
            }
        )
        want = list(range(6)) + list(range(7, 13))  # pid 6 suppressed
        for blimit in (None, 0):
            got = self._release_ids(
                enforce_k_anonymity(
                    ray.data.from_arrow(t).repartition(3),
                    ["zip3", "age_band"],
                    k=5,
                    broadcast_limit=blimit,
                )
            )
            assert got == want, blimit

    def test_separator_bytes_in_qi_values_never_collide(self, ray_session):
        # ('a\x1fb','c') x6 passes k; ('a','b\x1fc') x1 must stay
        # suppressed even though the naive joined strings are identical
        t = pa.table(
            {
                "pid": pa.array(np.arange(7, dtype=np.int64)),
                "zip3": pa.array(["a\x1fb"] * 6 + ["a"], pa.string()),
                "age_band": pa.array(["c"] * 6 + ["b\x1fc"], pa.string()),
            }
        )
        for blimit in (None, 0):
            got = self._release_ids(
                enforce_k_anonymity(
                    ray.data.from_arrow(t),
                    ["zip3", "age_band"],
                    k=5,
                    broadcast_limit=blimit,
                )
            )
            assert got == list(range(6)), blimit

    def test_l_without_sensitive_col_raises(self, ray_session):
        t = _people(seed=2)
        with pytest.raises(ValueError):
            enforce_k_anonymity(ray.data.from_arrow(t), ["zip3"], k=2, l=2)

    def test_every_group_suppressed_typed_empty(self, ray_session):
        t = _people(seed=7)
        out = enforce_k_anonymity(ray.data.from_arrow(t), ["pid"], k=2)
        sch = out.schema()
        assert out.count() == 0
        assert sch.names == ["pid", "zip3", "age_band", "diagnosis"]

    def test_k_only_gate(self, ray_session):
        t = _people(seed=3)
        want = self._brute_release(t, ["age_band"], 40, "diagnosis", 1)
        got = self._release_ids(
            enforce_k_anonymity(ray.data.from_arrow(t), ["age_band"], k=40)
        )
        assert got == want

    def test_generalize_brute_parity_all_levels(self, ray_session):
        # planted ladder zip3 -> age_band -> ALL, k=20: one big zip group
        # releases at level 0, most leftovers share an age band (level 1),
        # five odd rows coarsen to ALL
        k = 20
        zips = [500] * 60 + list(range(1, 31)) + [600] * 5
        bands = ["z"] * 60 + ["x"] * 25 + [f"y{i}" for i in range(5)] + ["x"] * 5
        n = len(zips)
        t = pa.table(
            {
                "pid": pa.array(np.arange(n, dtype=np.int64)),
                "zip3": pa.array(np.asarray(zips, np.int64)),
                "age_band": pa.array(bands, pa.string()),
                "diagnosis": pa.array(["d"] * n, pa.string()),
            }
        )

        def brute():
            rows = list(
                zip(
                    t.column("pid").to_pylist(),
                    t.column("zip3").to_pylist(),
                    t.column("age_band").to_pylist(),
                )
            )
            out = {}
            remaining = rows
            for lvl, key in enumerate([1, 2]):
                sizes = {}
                for r in remaining:
                    sizes[r[key]] = sizes.get(r[key], 0) + 1
                passed = [r for r in remaining if sizes[r[key]] >= k]
                remaining = [r for r in remaining if sizes[r[key]] < k]
                for r in passed:
                    out[r[0]] = (lvl, str(r[key]))
            for r in remaining:
                out[r[0]] = (2, "ALL")
            return out

        want = brute()
        levels_hit = {lvl for lvl, _ in want.values()}
        assert levels_hit == {0, 1, 2}  # the fixture must exercise all three
        for blimit in (None, 0):  # broadcast split AND join split
            res = generalize_to_k(
                ray.data.from_arrow(t).repartition(4),
                ["zip3", "age_band"],
                k=k,
                broadcast_limit=blimit,
            ).to_pandas()
            got = {
                int(r["pid"]): (int(r["qi_level"]), r["qi_value"])
                for _, r in res.iterrows()
            }
            assert got == want

    def test_generalize_pass_through_and_empty(self, ray_session):
        t = _people(seed=17)
        # k=1: everything releases at level 0 with its own zip3
        res = generalize_to_k(ray.data.from_arrow(t), ["zip3"], k=1).to_pandas()
        assert set(res["qi_level"]) == {0}
        assert len(res) == t.num_rows
        # empty input: typed empty with the qi columns appended
        empty = ray.data.from_arrow(t.slice(0, 0))
        out = generalize_to_k(empty, ["zip3"], k=5)
        assert out.count() == 0
        assert out.schema().names == [
            "pid", "zip3", "age_band", "diagnosis", "qi_level", "qi_value",
        ]

    def test_string_qi_column(self, ray_session):
        t = _people(seed=5)
        want = self._brute_release(t, ["age_band"], 30, "diagnosis", 5)
        got = self._release_ids(
            enforce_k_anonymity(
                ray.data.from_arrow(t).repartition(3),
                ["age_band"],
                k=30,
                sensitive_col="diagnosis",
                l=5,
            )
        )
        assert got == want


class TestDifferentialPrivacy:
    def test_noise_zero_mean_and_geometric_variance(self):
        """Two-sided geometric: Var = 2*alpha/(1-alpha)^2 with
        alpha = exp(-eps/sens). 20k independent cells give a tight
        empirical check on both moments."""
        import math

        from pie_ray.functions.privacy import dp_noise

        eps, sens = 1.0, 1.0
        draws = np.array(
            [dp_noise(f"cell{i}", eps, sens, seed=3) for i in range(20000)], np.float64
        )
        alpha = math.exp(-eps / sens)
        var = 2 * alpha / (1 - alpha) ** 2
        assert abs(draws.mean()) < 4 * math.sqrt(var / len(draws))
        assert abs(draws.var() / var - 1.0) < 0.1

    def test_noise_deterministic_and_key_dependent(self):
        from pie_ray.functions.privacy import dp_noise

        assert dp_noise("k1", 1.0, 1.0, 7) == dp_noise("k1", 1.0, 1.0, 7)
        many = {dp_noise(f"k{i}", 0.1, 1.0, 7) for i in range(50)}
        assert len(many) > 5  # different cells draw different noise
        assert dp_noise("k1", 1.0, 1.0, 7) != dp_noise("k1", 1.0, 1.0, 8) or (
            dp_noise("k2", 1.0, 1.0, 7) != dp_noise("k2", 1.0, 1.0, 8)
        )

    def test_release_partition_independent_and_clipped(self, ray_session):
        """Same noisy release at any partitioning; clipping bounds one
        row's influence on the sum to exactly clip dollars."""
        from pie_ray.functions.privacy import dp_group_release

        rng = np.random.RandomState(5)
        vals = rng.uniform(0, 300.0, 400).round(2)
        t = pa.table(
            {
                "g": pa.array([f"s{v}" for v in rng.randint(0, 4, 400)], pa.string()),
                "v": pa.array(vals, pa.float64()),
            }
        )
        rels = [
            dp_group_release(
                ray.data.from_arrow(t).repartition(p), "g", "v", clip=100.0, seed=3
            ).to_pylist()
            for p in (1, 7)
        ]
        assert rels[0] == rels[1]
        # clip: inflating one already-above-clip value must not move the sum
        v2 = vals.copy()
        big = int(np.argmax(v2))
        assert v2[big] > 100.0
        v2[big] = 1e9
        t2 = t.set_column(1, "v", pa.array(v2, pa.float64()))
        rel2 = dp_group_release(
            ray.data.from_arrow(t2), "g", "v", clip=100.0, seed=3
        ).to_pylist()
        assert rel2 == rels[0]

    def test_neighbor_sensitivity_is_bounded(self, ray_session):
        """Removing one row moves noisy_count by exactly 1 and noisy_sum by
        at most clip (noise is a function of the group key alone, so the
        deltas are the TRUE deltas — the sensitivity the epsilon prices)."""
        from pie_ray.functions.privacy import dp_group_release

        t = pa.table(
            {
                "g": pa.array(["a"] * 30 + ["b"] * 20, pa.string()),
                "v": pa.array(np.linspace(0, 250, 50), pa.float64()),
            }
        )
        full = dp_group_release(ray.data.from_arrow(t), "g", "v", clip=100.0).to_pylist()
        drop = dp_group_release(
            ray.data.from_arrow(t.slice(1)), "g", "v", clip=100.0
        ).to_pylist()
        fa = next(r for r in full if r["g"] == "a")
        da = next(r for r in drop if r["g"] == "a")
        assert fa["noisy_count"] - da["noisy_count"] == 1
        assert 0.0 <= fa["noisy_sum"] - da["noisy_sum"] <= 100.0
        fb = next(r for r in full if r["g"] == "b")
        db = next(r for r in drop if r["g"] == "b")
        assert fb == db  # untouched group releases identically

    def test_oracle_parity_sf0001(self, ray_session):
        import duckdb

        from pie_ray.functions.privacy import DP_RELEASE_ORACLE_SQL, q_dp_release

        d = "/root/testdata/sf0.001"
        eng = q_dp_release(d).sort_by("o_orderstatus").to_pylist()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')"
        )
        ora = [
            dict(zip(["o_orderstatus", "noisy_count", "noisy_sum", "epsilon_total"], r))
            for r in con.execute(DP_RELEASE_ORACLE_SQL + " ORDER BY 1").fetchall()
        ]
        assert eng == ora
