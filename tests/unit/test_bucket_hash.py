"""util.bucket_hash_strings — the vectorized FNV-1a bucket-assignment hash
(round 4): determinism, slice/chunk safety, null handling, spread, and the
no-per-element-Python contract's correctness side (bucket choice must never
change operator results — covered by the partitioning-independence tests;
here we pin the hash function itself)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pie_ray.util import bucket_hash_strings


WORDS = ["the", "quick", "brown", "fox", "", "a", "the", "Ünïcödé-ish", "x" * 200]


def test_deterministic_and_salted():
    a1 = bucket_hash_strings(pa.array(WORDS), salt=1)
    a2 = bucket_hash_strings(pa.array(WORDS), salt=1)
    b = bucket_hash_strings(pa.array(WORDS), salt=2)
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, b)
    # equal strings hash equal, regardless of position
    assert a1[0] == a1[6]


def test_accepts_python_list_and_chunked():
    base = bucket_hash_strings(pa.array(WORDS))
    as_list = bucket_hash_strings(list(WORDS))
    chunked = bucket_hash_strings(
        pa.chunked_array([pa.array(WORDS[:4]), pa.array(WORDS[4:])])
    )
    assert np.array_equal(base, as_list)
    assert np.array_equal(base, chunked)


def test_sliced_array_matches_full():
    arr = pa.array(WORDS)
    full = bucket_hash_strings(arr)
    sl = bucket_hash_strings(arr.slice(3, 4))
    assert np.array_equal(full[3:7], sl)


def test_nulls_hash_to_zero_like_hash64_array():
    arr = pa.array(["a", None, "b"])
    h = bucket_hash_strings(arr)
    assert h[1] == 0 and h[0] != 0 and h[2] != 0


def test_prefix_cap_still_distinguishes_lengths():
    # strings sharing a 48-byte prefix but different lengths must differ
    # (the length is folded in after the prefix loop)
    a = "p" * 100
    b = "p" * 101
    h = bucket_hash_strings(pa.array([a, b]))
    assert h[0] != h[1]


def test_bucket_spread_is_reasonable():
    rng = np.random.default_rng(3)
    strs = [f"word_{i}_{rng.integers(0, 10**9)}" for i in range(20_000)]
    h = bucket_hash_strings(pa.array(strs), salt=7)
    counts = np.bincount((h % 64).astype(np.int64), minlength=64)
    # uniform would be 312.5/bucket; require no bucket 2x over / under
    assert counts.max() < 625 and counts.min() > 156


def test_empty_array():
    assert len(bucket_hash_strings(pa.array([], pa.string()))) == 0


# ---------------------------------------------------------------------------
# drop_empty_blocks — the groupby/join empty-schema-block normalizer (r4)
# ---------------------------------------------------------------------------


def test_drop_empty_blocks_groupby_join(ray_session):
    """Repro of the systemic hazard: groupby().map_groups() emits zero-row
    EMPTY-SCHEMA blocks (one per input block without groups) and a
    downstream Dataset.join crashes on them. drop_empty_blocks must strip
    them by metadata and make the join succeed."""
    import ray
    import ray.data

    from pie_ray.util import drop_empty_blocks

    t = pa.table(
        {
            "node": pa.array(["a", "b"]),
            "s": pa.array([1.0, 2.0]),
            "bucket": pa.array([3, 9], pa.int32()),
        }
    )
    gb = (
        ray.data.from_arrow(t)
        .repartition(6)  # more blocks than groups -> empty buckets
        .groupby("bucket")
        .map_groups(lambda g: g.drop_columns(["bucket"]), batch_format="pyarrow")
        .materialize()
    )
    blocks = ray.get(gb.to_arrow_refs())
    assert any(b.num_rows == 0 and b.num_columns == 0 for b in blocks), (
        "precondition: the repro must actually produce empty-schema blocks"
    )
    clean = drop_empty_blocks(gb).materialize()
    assert all(b.num_rows > 0 for b in ray.get(clean.to_arrow_refs()))
    state = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(["a", "b"]),
                "out_w": pa.array([1, 0], pa.int64()),
            }
        )
    ).materialize()
    j = state.join(
        clean, join_type="left_outer", num_partitions=8, on=("node",), right_on=("node",)
    )
    assert j.count() == 2


def test_drop_empty_blocks_all_empty_keeps_schema(ray_session):
    import ray.data

    from pie_ray.util import drop_empty_blocks

    sch = pa.schema([("x", pa.int64())])
    ds = (
        ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
        .repartition(2)
        .filter(expr="x > 10")
        .materialize()
    )
    out = drop_empty_blocks(ds, schema=sch)
    assert out.count() == 0
    assert out.schema().names == ["x"]
