"""lev1_self_join: brute-force O(n^2) Levenshtein parity (completeness of
the deletion-neighborhood candidate generator), edge shapes, partition
independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pie_ray.functions.fuzzyjoin import _verify_lev1, lev1_self_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(names):
    uniq = sorted(set(names))
    return {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) == 1
    }


def _engine_pairs(names, parts=4, **kw):
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array(names, pa.string())})
    ).repartition(parts)
    got = lev1_self_join(ds, "s", **kw).to_pandas()
    return set(zip(got["name_a"], got["name_b"]))


WORDS = [
    "entity", "entty", "entity", "entitys", "xentity",
    "graph", "grape", "grapes", "graphs", "gryph",
    "node", "mode", "code", "coda", "nodes",
    "a", "b", "ab", "ba", "",
    "same", "same",  # duplicate values never pair with themselves
]


def test_brute_parity_wordlist(ray_session):
    assert _engine_pairs(WORDS) == _brute_pairs(WORDS)


def test_brute_parity_random_strings(ray_session):
    rng = np.random.default_rng(3)
    alpha = list("abcd")  # tiny alphabet -> dense lev-1 neighborhoods
    names = [
        "".join(rng.choice(alpha, size=rng.integers(1, 7)))
        for _ in range(400)
    ]
    assert _engine_pairs(names) == _brute_pairs(names)


def test_partition_and_bucket_independence(ray_session):
    got = [
        _engine_pairs(WORDS, parts=p, num_buckets=nb)
        for p, nb in ((1, 4), (7, 32))
    ]
    assert got[0] == got[1]


def test_verify_lev1_vectorized_matches_dp():
    cases = [
        ("abc", "abc"), ("abc", "abd"), ("abc", "ab"), ("abc", "abcd"),
        ("abc", "xbc"), ("abc", "axc"), ("", "a"), ("", ""), ("a", "b"),
        ("abcdef", "abdcef"), ("aaaa", "aaa"), ("aaaa", "aaab"),
        ("xabc", "abc"), ("abc", "abx"), ("ab", "ba"),
    ]
    a = np.asarray([c[0] for c in cases], dtype="U9")
    b = np.asarray([c[1] for c in cases], dtype="U9")
    got = _verify_lev1(a, b, 9)
    want = np.array([_lev(x, y) == 1 for x, y in cases])
    assert (got == want).all()


def test_max_len_guard(ray_session):
    ds = ray.data.from_arrow(pa.table({"s": pa.array(["x" * 60], pa.string())}))
    with pytest.raises(Exception, match="max_len"):
        lev1_self_join(ds, "s", max_len=48).materialize()
