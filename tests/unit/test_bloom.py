"""Bloom-filter membership gates: the miss-side guarantee (no false
negatives — every seen key hits), a realized false-positive rate near the
requested fpp, and partition-independent filter bytes (the bucketed OR
merge cannot depend on how the corpus was blocked)."""

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.functions.bloom import bloom_build, bloom_screen


def _keys_ds(keys, blocks=4):
    return ray.data.from_arrow(pa.table({"url": pa.array(keys)})).repartition(blocks)


def test_bloom_no_false_negatives_and_fpp(ray_session):
    seen = [f"https://seen.example/{i}" for i in range(5000)]
    unseen = [f"https://new.example/{i}" for i in range(5000)]

    bf = bloom_build(_keys_ds(seen), "url", capacity=5000, fpp=0.01)

    # Hard guarantee: every ingested key tests positive.
    assert bf.contains(seen).all()

    # Realized FP rate tracks the requested 1% (allow generous slack —
    # the gate is "order of magnitude honest", not a statistical test).
    fp = bf.contains(unseen).mean()
    assert fp <= 0.03, fp

    # bloom_screen plumbing: keep='new' drops every seen row and passes
    # (1 - fp) of the unseen ones; keep='seen' is the exact complement.
    mixed = _keys_ds(seen[:1000] + unseen[:1000])
    new_rows = bloom_screen(mixed, bf, "url", keep="new").take_all()
    assert all(r["url"].startswith("https://new.") for r in new_rows)
    assert len(new_rows) >= 1000 * 0.9
    seen_rows = bloom_screen(mixed, bf, "url", keep="seen").count()
    assert new_rows and seen_rows + len(new_rows) == 2000


def test_bloom_partition_independent(ray_session):
    keys = [f"k{i}" for i in range(2000)]
    a = bloom_build(_keys_ds(keys, blocks=1), "url", capacity=2000)
    b = bloom_build(_keys_ds(keys, blocks=8), "url", capacity=2000)
    assert a.m == b.m and a.h == b.h
    assert np.array_equal(a.bits, b.bits)
    # Null keys hash as "" rather than erroring (ingest-tolerant).
    c = bloom_build(
        ray.data.from_arrow(pa.table({"url": pa.array(["x", None, "y"])})),
        "url",
        capacity=16,
    )
    assert c.contains(["x", "", "y"]).all()
