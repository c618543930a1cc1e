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
