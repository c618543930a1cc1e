"""Betweenness centrality: exact path vs networkx on planted and random
graphs, pivot estimator consistency (k = n pivots IS exact), the
driver==distributed equivalence, determinism, and the declared
broadcast-budget seam."""

from __future__ import annotations

import numpy as np
import pytest

from pie_ray.functions.centrality import (
    betweenness_distributed,
    betweenness_driver,
    harmonic_distributed,
    harmonic_driver,
    q_graph_centrality,
)
from pie_ray.functions.graphops import PACK


def _pack(pairs):
    return np.array([a * int(PACK) + b for a, b in pairs], np.int64)


def _bc_map(tbl):
    return dict(
        zip(tbl.column("s_suppkey").to_pylist(), tbl.column("betweenness").to_pylist())
    )


def _nx_bc(pairs):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(pairs)
    return nx.betweenness_centrality(g, normalized=False)


PATH = [(1, 2), (2, 3), (3, 4)]           # path graph: inner nodes broker
STAR = [(0, i) for i in range(1, 6)]       # star: hub brokers everything
BRIDGE = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]


@pytest.mark.parametrize("pairs", [PATH, STAR, BRIDGE])
def test_exact_matches_networkx(pairs):
    got = _bc_map(betweenness_driver(_pack(pairs)))
    want = _nx_bc(pairs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_exact_matches_networkx_random():
    rng = np.random.RandomState(7)
    for _ in range(5):
        n = 25
        m = 60
        pairs = set()
        while len(pairs) < m:
            a, b = rng.randint(0, n, 2)
            if a != b:
                pairs.add((min(a, b) + 1, max(a, b) + 1))
        pairs = sorted(pairs)
        got = _bc_map(betweenness_driver(_pack(pairs)))
        want = _nx_bc(pairs)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-9), k


def test_pivot_estimator_full_k_is_exact_and_partial_is_sane():
    packed = _pack(BRIDGE)
    exact = _bc_map(betweenness_driver(packed))
    full = _bc_map(betweenness_driver(packed, k_pivots=100))
    assert full == exact
    part = _bc_map(betweenness_driver(packed, k_pivots=3))
    # unbiased estimator, same support; top broker must stay detectable
    assert set(part) == set(exact)
    assert max(part, key=part.get) in {3, 4}  # the bridge endpoints


def test_distributed_equals_driver(ray_session):
    packed = _pack(BRIDGE)
    a = _bc_map(betweenness_driver(packed))
    b = _bc_map(betweenness_distributed(packed))
    assert set(a) == set(b)
    for k in a:
        assert b[k] == pytest.approx(a[k], rel=1e-9)
    # and twice distributed -> identical floats (deterministic combine)
    c = _bc_map(betweenness_distributed(packed))
    assert b == c


def test_entry_runs_on_testdata(ray_session):
    out = q_graph_centrality("/root/testdata/sf0.001").take_all()
    assert len(out) > 0
    assert all(r["betweenness"] >= 0.0 for r in out)
    assert all(r["harmonic"] > 0.0 for r in out)


def test_harmonic_matches_networkx(ray_session):
    import networkx as nx

    for pairs in (PATH, STAR, BRIDGE):
        got = dict(
            zip(
                harmonic_driver(_pack(pairs)).column("s_suppkey").to_pylist(),
                harmonic_driver(_pack(pairs)).column("harmonic").to_pylist(),
            )
        )
        g = nx.Graph(); g.add_edges_from(pairs)
        want = nx.harmonic_centrality(g)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), k
    # distributed == driver for harmonic too
    a = harmonic_driver(_pack(BRIDGE)).column("harmonic").to_pylist()
    b = harmonic_distributed(_pack(BRIDGE)).column("harmonic").to_pylist()
    assert a == pytest.approx(b, rel=1e-9)


def test_broadcast_budget_seam():
    import pie_ray.functions.centrality as c

    old = c.EDGE_BROADCAST_LIMIT
    c.EDGE_BROADCAST_LIMIT = 2
    try:
        with pytest.raises(NotImplementedError):
            betweenness_distributed(_pack(BRIDGE))
    finally:
        c.EDGE_BROADCAST_LIMIT = old


def test_over_budget_sampling_degrade(ray_session):
    """on_over_budget='sample': the estimate equals exact centrality on
    the deterministic smallest-hash edge sample (mechanism equivalence),
    and at ~92% retention the sole broker of a two-clique bridge graph
    stays top-1 (quality)."""
    import pie_ray.functions.centrality as c

    cliq1 = [(i, j) for i in range(1, 9) for j in range(i + 1, 9)]
    cliq2 = [(i, j) for i in range(21, 29) for j in range(i + 1, 29)]
    bridge = [(i, 100) for i in (1, 2, 3, 4, 21, 22, 23, 24)]
    packed = _pack(cliq1 + cliq2 + bridge)
    m = len(packed)
    old = c.EDGE_BROADCAST_LIMIT
    c.EDGE_BROADCAST_LIMIT = 2 * m - 10  # over budget; sample keeps m - 5
    try:
        with pytest.raises(NotImplementedError):
            betweenness_distributed(packed)
        got = _bc_map(
            c.betweenness_distributed(packed, on_over_budget="sample")
        )
        sampled, frac = c.sample_packed_edges(packed, c.EDGE_BROADCAST_LIMIT // 2)
        assert 0.0 < frac < 1.0 and len(sampled) == c.EDGE_BROADCAST_LIMIT // 2
        want = _bc_map(betweenness_driver(sampled))
        # row universe = the FULL graph's nodes; sampled-out nodes get 0.0
        full = {int(e) // int(PACK) for e in packed} | {
            int(e) % int(PACK) for e in packed
        }
        assert set(got) == full
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-9), k
        for k in set(got) - set(want):
            assert got[k] == 0.0
        assert max(got, key=got.get) == 100  # bridge node survives sampling
    finally:
        c.EDGE_BROADCAST_LIMIT = old


def test_sampled_out_pendant_node_keeps_a_zero_row(ray_session):
    """A node whose ONLY edge is dropped by the sample must still appear
    in the result with score 0.0 — never silently vanish from a join."""
    import pie_ray.functions.centrality as c
    from pie_ray.util import hash64_ints

    base = [(i, j) for i in range(1, 7) for j in range(i + 1, 7)]  # K6
    base_packed = _pack(base)
    base_max = hash64_ints(
        base_packed.astype(np.uint64), salt=c.EDGE_SAMPLE_SALT
    ).max()
    # pick a pendant whose edge hashes ABOVE every base edge, so trimming
    # by exactly one edge deterministically drops the pendant's edge
    for p in range(200, 400):
        e = np.array([1 * int(PACK) + p], np.int64)
        if hash64_ints(e.astype(np.uint64), salt=c.EDGE_SAMPLE_SALT)[0] > base_max:
            pendant = p
            break
    else:
        pytest.fail("no pendant candidate hashed above the base edges")
    packed = np.sort(np.concatenate([base_packed, _pack([(1, pendant)])]))
    m = len(packed)
    old = c.EDGE_BROADCAST_LIMIT
    c.EDGE_BROADCAST_LIMIT = 2 * (m - 1)  # target = m - 1: drop exactly one
    try:
        tbl = c._centrality_distributed(
            packed, ["betweenness", "harmonic"], None, on_over_budget="sample"
        )
        rows = dict(
            zip(
                tbl.column("s_suppkey").to_pylist(),
                zip(
                    tbl.column("betweenness").to_pylist(),
                    tbl.column("harmonic").to_pylist(),
                ),
            )
        )
        assert pendant in rows, "sampled-out node vanished from the result"
        assert rows[pendant] == (0.0, 0.0)
        assert set(rows) == set(range(1, 7)) | {pendant}
    finally:
        c.EDGE_BROADCAST_LIMIT = old


def test_sample_packed_edges_deterministic_and_composable():
    from pie_ray.functions.centrality import EDGE_SAMPLE_SALT, sample_packed_edges
    from pie_ray.util import hash64_ints

    rng = np.random.RandomState(3)
    edges = np.unique(rng.randint(1, 10_000, 500).astype(np.int64))
    s1, f1 = sample_packed_edges(edges, 100)
    s2, _ = sample_packed_edges(np.random.RandomState(9).permutation(edges), 100)
    assert np.array_equal(s1, s2)  # order-independent membership
    assert f1 == 100 / len(edges)
    # composition: pre-filtering to any hash-cutoff SUPERSET then trimming
    # equals trimming the full set (the q_graph_centrality presample shape)
    h = hash64_ints(edges.astype(np.uint64), salt=EDGE_SAMPLE_SALT)
    cutoff = np.sort(h)[200]  # superset of the smallest-100 set
    pre = edges[h < cutoff]
    s3, _ = sample_packed_edges(pre, 100)
    assert np.array_equal(s1, s3)


def test_entry_over_budget_sample_matches_driver_sample(ray_session):
    """q_graph_centrality's distributed presample + driver trim equals a
    pure driver-side sample of the full edge set (bit-identical floats —
    same edge set, same deterministic chunk combine)."""
    import pie_ray.functions.centrality as c
    from pie_ray.functions.graphops import EDGE_SCHEMA, cooccurrence_edges
    from pie_ray.util import gather_table

    sf = "/root/testdata/sf0.001"
    packed = (
        gather_table(cooccurrence_edges(sf).materialize(), schema=EDGE_SCHEMA)
        .column("e")
        .to_numpy(zero_copy_only=False)
    )
    m = len(packed)
    assert m > 8
    old = c.EDGE_BROADCAST_LIMIT
    c.EDGE_BROADCAST_LIMIT = m  # 2m > m -> over budget; sample keeps m//2
    try:
        with pytest.raises(NotImplementedError):
            q_graph_centrality(sf)
        got = sorted(
            (r["s_suppkey"], r["betweenness"], r["harmonic"])
            for r in q_graph_centrality(sf, on_over_budget="sample").take_all()
        )
        sampled, _ = c.sample_packed_edges(packed, c.EDGE_BROADCAST_LIMIT // 2)
        want_tbl = c._centrality_distributed(
            sampled, ["betweenness", "harmonic"], None
        )
        want = sorted(
            zip(
                want_tbl.column("s_suppkey").to_pylist(),
                want_tbl.column("betweenness").to_pylist(),
                want_tbl.column("harmonic").to_pylist(),
            )
        )
        assert got == want
    finally:
        c.EDGE_BROADCAST_LIMIT = old
