"""Count-min sketch: one-sided error guarantee vs exact counts, epsilon
bound, bit-exact partition independence, merge-by-addition."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.functions.cmsketch import cms_build, cms_merge, cms_query


def _corpus(n=20000, seed=11):
    rng = np.random.default_rng(seed)
    # zipf-ish: heavy head + long tail, plus some nulls
    vals = [f"w{int(v)}" for v in rng.zipf(1.3, n) % 3000]
    vals[::97] = [None] * len(vals[::97])
    return pa.table({"word": pa.array(vals, pa.string())})


def _truth(t):
    return Counter(v for v in t.column("word").to_pylist() if v is not None)


def test_overestimate_only_and_epsilon_bound(ray_session):
    t = _corpus()
    truth = _truth(t)
    ds = ray.data.from_arrow(t).repartition(6)
    sk, total = cms_build(ds, "word", width=2048, depth=4)
    assert total == sum(truth.values())
    words = list(truth)
    est = cms_query(sk, words)
    true = np.array([truth[w] for w in words])
    assert (est >= true).all()  # CMS never under-counts
    # classic bound: err <= e/width * N with prob 1 - e^-depth per query;
    # assert the *median* error is far inside it and the max within 3x
    bound = np.e / 2048 * total
    err = est - true
    assert np.median(err) <= bound / 4
    assert err.max() <= 3 * bound
    # absent value estimates are small too
    ghost = cms_query(sk, ["never-seen-1", "never-seen-2"])
    assert (ghost <= 3 * bound).all()


def test_partition_independence_bit_exact(ray_session):
    t = _corpus(5000, seed=3)
    a, _ = cms_build(ray.data.from_arrow(t).repartition(1), "word")
    b, _ = cms_build(ray.data.from_arrow(t).repartition(9), "word")
    assert (a == b).all()


def test_merge_is_addition(ray_session):
    t = _corpus(4000, seed=5)
    half = t.num_rows // 2
    whole, n_w = cms_build(ray.data.from_arrow(t), "word", width=512, depth=3)
    s1, n1 = cms_build(ray.data.from_arrow(t.slice(0, half)), "word", width=512, depth=3)
    s2, n2 = cms_build(ray.data.from_arrow(t.slice(half)), "word", width=512, depth=3)
    assert n1 + n2 == n_w
    assert (cms_merge(s1, s2) == whole).all()
