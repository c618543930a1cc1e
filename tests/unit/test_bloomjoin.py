"""Bloom semi-join reduction: result bit-identical to the plain hash join
(no false negatives by construction), actual shuffle-volume reduction on a
selective join, full-content string hashing (no prefix-collision blowup),
and null-key drop semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.functions.bloomjoin import (
    _bloom_mask,
    bloom_semi_join,
    build_key_bloom,
)

SF = "/root/testdata/sf0.001"


def _rows(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def test_equals_plain_join_int_keys(ray_session):
    """Selective join: lineitem ⋈ high-value orders (most lineitems drop)."""
    from pie_ray.util import join_num_partitions

    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    orders = (
        ray.data.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        .filter(expr="o_totalprice > 400000.0")
        .materialize()
    )
    got = bloom_semi_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    want = li.materialize().join(
        orders,
        join_type="inner",
        num_partitions=join_num_partitions(None),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    cols = ["l_orderkey", "l_quantity", "o_totalprice"]
    assert _rows(got, cols) == _rows(want, cols)
    assert len(_rows(got, cols)) > 0


def test_prefilter_actually_reduces(ray_session):
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    orders = (
        ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
        .limit(20)
        .materialize()
    )
    import ray as _ray

    bits_b, m, h = build_key_bloom(orders, "o_orderkey", capacity=20, salt=0xB100)
    bits = np.frombuffer(bits_b, dtype=np.uint8)
    total = survived = 0
    for t in li.iter_batches(batch_format="pyarrow"):
        mask = _bloom_mask(t.column("l_orderkey"), bits, m, h, 0xB100)
        total += len(mask)
        survived += int(mask.sum())
    assert survived < total * 0.2, (survived, total)  # 20 of ~1500 orders


def test_string_keys_and_long_shared_prefix(ray_session):
    """Two 64-char keys sharing a 60-char prefix must NOT collide (the
    full-content hash path; the 48-byte bucket prefix would alias them)."""
    prefix = "x" * 60
    small = ray.data.from_arrow(
        pa.table({"k": pa.array([prefix + "AAAA"], pa.string()),
                  "v": pa.array([1], pa.int64())})
    ).materialize()
    big = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(
                    [prefix + "AAAA", prefix + "BBBB", None, "other"], pa.string()
                ),
                "w": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )
    got = _rows(bloom_semi_join(big, small, on="k"), ["k", "w", "v"])
    assert got == [(prefix + "AAAA", 10, 1)]
    # direct probe: the prefix twin is filtered out BEFORE the join
    bits_b, m, h = build_key_bloom(small, "k", capacity=1, salt=0xB100)
    bits = np.frombuffer(bits_b, dtype=np.uint8)
    mask = _bloom_mask(
        pa.array([prefix + "AAAA", prefix + "BBBB"], pa.string()), bits, m, h, 0xB100
    )
    assert mask.tolist() == [True, False]


def test_partition_independence(ray_session):
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    orders = (
        ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
        .limit(50)
        .materialize()
    )
    base = None
    for blocks in (1, 4):
        lib = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey"],
            override_num_blocks=blocks,
        )
        got = _rows(bloom_semi_join(lib, orders, on="l_orderkey", right_on="o_orderkey"),
                    ["l_orderkey"])
        if base is None:
            base = got
        assert got == base
