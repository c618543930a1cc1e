"""profile_table gates: exact counts/min/max/mean vs pandas over mixed
column types (int, float, string, timestamp, nulls), HLL distinct within
3 standard errors, and partition independence of the exact fields."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pie_ray.functions.profile import profile_table


def _by_col(report: pa.Table) -> dict:
    return {r["column"]: r for r in report.to_pylist()}


def test_profile_lineitem(ray_session):
    sf = "/root/testdata/sf0.01"
    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    ds = ray.data.read_parquet(f"{sf}/lineitem.parquet", columns=cols)
    rep = _by_col(profile_table(ds))
    df = pq.read_table(f"{sf}/lineitem.parquet", columns=cols).to_pandas()

    assert set(rep) == set(cols)
    for c in cols:
        assert rep[c]["n_rows"] == len(df)
        assert rep[c]["null_count"] == int(df[c].isna().sum())
        exact_distinct = df[c].nunique()
        se = 1.04 / np.sqrt(2**14)
        assert abs(rep[c]["n_distinct_approx"] - exact_distinct) <= 3 * se * exact_distinct + 2

    assert rep["l_orderkey"]["min"] == str(int(df["l_orderkey"].min()))
    assert rep["l_orderkey"]["max"] == str(int(df["l_orderkey"].max()))
    assert abs(rep["l_orderkey"]["mean"] - df["l_orderkey"].mean()) < 1e-6
    assert rep["l_quantity"]["min"] == repr(float(df["l_quantity"].min()))
    assert abs(rep["l_quantity"]["mean"] - df["l_quantity"].mean()) < 1e-9
    assert rep["l_returnflag"]["min"] == df["l_returnflag"].min()
    assert rep["l_returnflag"]["max"] == df["l_returnflag"].max()
    assert rep["l_returnflag"]["mean"] is None
    assert rep["l_shipdate"]["min"] == str(np.datetime64(df["l_shipdate"].min(), "us"))
    assert rep["l_shipdate"]["max"] == str(np.datetime64(df["l_shipdate"].max(), "us"))


def test_profile_nulls_and_partition_independence(ray_session):
    t = pa.table(
        {
            "x": pa.array([1, None, 3, None, 5], pa.int64()),
            "s": pa.array(["b", "a", None, "c", "a"]),
            "all_null": pa.array([None] * 5, pa.float64()),
        }
    )
    reps = []
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        reps.append(_by_col(profile_table(ds)))
    assert reps[0] == reps[1]
    r = reps[0]
    assert r["x"]["null_count"] == 2 and r["x"]["min"] == "1" and r["x"]["max"] == "5"
    assert r["x"]["mean"] == 3.0 and r["x"]["n_distinct_approx"] == 3
    assert r["s"]["min"] == "a" and r["s"]["max"] == "c" and r["s"]["n_distinct_approx"] == 3
    assert (
        r["all_null"]["null_count"] == 5
        and r["all_null"]["min"] is None
        and r["all_null"]["mean"] is None
        and r["all_null"]["n_distinct_approx"] == 0
    )
