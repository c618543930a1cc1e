"""A14 salted aggregation == plain aggregation (SURVEY.md §5 layer 1)."""

from __future__ import annotations

import pyarrow as pa


def test_salted_equals_unsalted(ray_session):
    import ray.data

    from pie_ray.stages.salt import salted_aggregate

    # Zipf-ish skew: key "hot" holds 90% of rows
    n = 5000
    keys = ["hot"] * 4500 + [f"k{i%37}" for i in range(500)]
    vals = list(range(n))
    ds = ray.data.from_arrow(
        pa.table({"key": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    ).repartition(8)

    out = salted_aggregate(ds, ["key"], ["v"], count_alias="n", num_salts=16)
    got = {r["key"]: (r["v"], r["n"]) for r in out.take_all()}

    expect: dict[str, list[int]] = {}
    for k, v in zip(keys, vals):
        e = expect.setdefault(k, [0, 0])
        e[0] += v
        e[1] += 1
    assert got == {k: (s, c) for k, (s, c) in expect.items()}


def test_salted_counts_null_rows(ray_session):
    """Rows with a null summed value still count toward count_alias (the
    phase-1 count must not use pyarrow's only_valid default on sum_cols)."""
    import ray.data

    from pie_ray.stages.salt import salted_aggregate

    vals = [1, None, 3, None, None, 6]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
                "v": pa.array(vals, pa.int64()),
            }
        )
    ).repartition(3)
    out = salted_aggregate(ds, ["key"], ["v"], count_alias="n", num_salts=4)
    got = {r["key"]: (r["v"], r["n"]) for r in out.take_all()}
    assert got == {"a": (4, 3), "b": (6, 3)}


def test_detect_hot_keys(ray_session):
    import ray.data

    from pie_ray.stages.salt import detect_hot_keys

    keys = ["hot"] * 900 + ["warm"] * 60 + [f"k{i}" for i in range(40)]
    ds = ray.data.from_arrow(pa.table({"key": pa.array(keys, pa.string())})).repartition(4)
    hot = detect_hot_keys(ds, "key", top_k=5, min_share=0.05)
    assert hot == ["hot", "warm"]


def test_adaptive_aggregate_both_branches(ray_session):
    """adaptive_aggregate equals the plain expectation whether or not the
    probe detects skew (hot -> salted path, uniform -> single groupby)."""
    import ray.data

    from pie_ray.stages.salt import adaptive_aggregate

    def expect(keys, vals):
        e = {}
        for k, v in zip(keys, vals):
            s = e.setdefault(k, [0, 0])
            s[0] += v
            s[1] += 1
        return {k: (s, c) for k, (s, c) in e.items()}

    # skewed: probe fires -> salted path
    keys = ["hot"] * 1800 + [f"k{i % 23}" for i in range(200)]
    vals = list(range(len(keys)))
    ds = ray.data.from_arrow(
        pa.table({"key": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    ).repartition(6)
    got = {
        r["key"]: (r["v"], r["n"])
        for r in adaptive_aggregate(ds, ["key"], ["v"], count_alias="n").take_all()
    }
    assert got == expect(keys, vals)

    # uniform: probe stays silent -> plain path
    keys2 = [f"k{i % 50}" for i in range(2000)]
    vals2 = list(range(2000))
    ds2 = ray.data.from_arrow(
        pa.table({"key": pa.array(keys2, pa.string()), "v": pa.array(vals2, pa.int64())})
    ).repartition(6)
    got2 = {
        r["key"]: (r["v"], r["n"])
        for r in adaptive_aggregate(ds2, ["key"], ["v"], count_alias="n").take_all()
    }
    assert got2 == expect(keys2, vals2)
