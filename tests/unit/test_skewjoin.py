"""skew_join gates: exact equivalence with a plain inner join on uniform
AND 90%-hot inputs (multi-row build side, unmatched hot keys), plus the
disjoint-column contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pie_ray.functions.skewjoin import skew_join


def _rows(ds):
    df = pd.DataFrame(ds.take_all())
    return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))


def _brute(lt: pa.Table, rt: pa.Table, on, right_on):
    df = lt.to_pandas().merge(rt.to_pandas(), left_on=on, right_on=right_on)
    df = df[[c for c in df.columns if c != right_on or right_on == on]]
    cols = sorted(c for c in df.columns if c != right_on)
    return sorted(map(tuple, df[cols].itertuples(index=False)))


def test_skew_join_zipf_hot_key(ray_session):
    rng = np.random.default_rng(11)
    n = 20_000
    # 90% of left rows share key 7; the rest spread over 200 keys
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 200, n)).astype(np.int64)
    lt = pa.table({"k": pa.array(k), "lval": pa.array(np.arange(n, dtype=np.int64))})
    # right: keys 0..149, 1-3 rows each (hot key 7 has 3 build rows);
    # keys 150..199 unmatched on the right
    rk, rv = [], []
    for key in range(150):
        for j in range(1 + key % 3):
            rk.append(key)
            rv.append(key * 10 + j)
    rt = pa.table({"rk": pa.array(rk, pa.int64()), "rval": pa.array(rv, pa.int64())})

    got = _rows(
        skew_join(
            ray.data.from_arrow(lt).repartition(6),
            ray.data.from_arrow(rt).repartition(3),
            on="k",
            right_on="rk",
        )
    )
    assert got == _brute(lt, rt, "k", "rk")
    assert len(got) > n  # hot key expanded against 3 build rows


def test_skew_join_uniform_and_unmatched_hot(ray_session):
    # uniform keys -> probe finds nothing hot -> plain join path
    lt = pa.table(
        {
            "k": pa.array(np.arange(1000, dtype=np.int64) % 97),
            "lval": pa.array(np.arange(1000, dtype=np.int64)),
        }
    )
    rt = pa.table(
        {
            "rk": pa.array(np.arange(97, dtype=np.int64)),
            "rval": pa.array(np.arange(97, dtype=np.int64) * 2),
        }
    )
    got = _rows(
        skew_join(
            ray.data.from_arrow(lt).repartition(4),
            ray.data.from_arrow(rt),
            on="k",
            right_on="rk",
        )
    )
    assert got == _brute(lt, rt, "k", "rk") and len(got) == 1000

    # hot key with NO right rows at all: inner join must drop its rows
    hot_k = np.zeros(5000, np.int64)  # key 0 is hot
    hot_k[:100] = np.arange(100) + 1
    lt2 = pa.table({"k": pa.array(hot_k), "lval": pa.array(np.arange(5000, dtype=np.int64))})
    rt2 = pa.table(
        {"rk": pa.array(np.arange(1, 101, dtype=np.int64)), "rval": pa.array(np.arange(100, dtype=np.int64))}
    )
    got2 = _rows(
        skew_join(
            ray.data.from_arrow(lt2).repartition(4),
            ray.data.from_arrow(rt2),
            on="k",
            right_on="rk",
        )
    )
    assert got2 == _brute(lt2, rt2, "k", "rk") and len(got2) == 100


def test_skew_join_testdata_and_overlap_contract(ray_session):
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    got = _rows(skew_join(orders, cust, on="o_custkey", right_on="c_custkey"))
    lt = pq.read_table(f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    rt = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey", "c_name"])
    assert got == _brute(lt, rt, "o_custkey", "c_custkey")

    with pytest.raises(ValueError, match="overlapping"):
        skew_join(orders, orders, on="o_custkey", right_on="o_custkey")


def test_hot_key_partially_unmatched(ray_session):
    # two hot keys, right rows exist for only one of them: the unmatched
    # hot key must emit nothing (regression: null index_in positions went
    # float64/NaN and crashed integer indexing)
    import numpy as np

    left = pa.table(
        {
            "k": pa.array(["A"] * 400 + ["B"] * 400 + [f"c{i}" for i in range(40)]),
            "lv": pa.array(np.arange(840), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["A"] * 3 + [f"c{i}" for i in range(40)]),
            "rv": pa.array(np.arange(43), pa.int64()),
        }
    )
    got = (
        skew_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right),
            on="k",
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert (got[got.k == "A"].shape[0]) == 400 * 3
    assert "B" not in set(got.k)  # unmatched hot key emits nothing
    assert got[got.k == "c7"].shape[0] == 1
