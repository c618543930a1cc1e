"""Graph analytics (pie_ray/functions/graphops.py): triangle counting and
k-core — known-graph gates, brute-force equivalence, and the
driver-path ≡ distributed-path contract."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest

from pie_ray.functions import graphops as G

SF = "/root/testdata/sf0.001"


def pack_edges(pairs):
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return np.unique(lo * np.int64(1 << 32) + hi)


def brute_triangles(pairs):
    eset = {tuple(sorted(p)) for p in pairs}
    nodes = sorted({n for p in eset for n in p})
    cnt = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if ((x, y) in eset) and ((x, z) in eset) and ((y, z) in eset):
            cnt[x] += 1
            cnt[y] += 1
            cnt[z] += 1
    return {n: c for n, c in cnt.items() if c > 0}


def brute_core_numbers(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref = {}
    for k in range(0, len(adj) + 2):
        live = set(adj)
        changed = True
        while changed:
            changed = False
            for n in list(live):
                if sum(1 for m in adj[n] if m in live) < k:
                    live.discard(n)
                    changed = True
        for n in live:
            ref[n] = k
        if not live:
            break
    return ref


def table_to_dict(t: pa.Table, key: str, val: str) -> dict[int, int]:
    return dict(zip(t.column(key).to_pylist(), t.column(val).to_pylist()))


def test_triangles_k4():
    # K4: every node sits in C(3,2) = 3 triangles
    pairs = list(itertools.combinations([10, 20, 30, 40], 2))
    out = table_to_dict(
        G.triangles_per_node_driver(pack_edges(pairs)), "s_suppkey", "n_triangles"
    )
    assert out == {10: 3, 20: 3, 30: 3, 40: 3}


def test_triangles_triangle_free():
    # 4-cycle has no triangles -> empty result
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    t = G.triangles_per_node_driver(pack_edges(pairs))
    assert t.num_rows == 0


def test_triangles_random_vs_bruteforce():
    rng = np.random.default_rng(7)
    nodes = np.arange(30)
    pairs = [
        (int(a), int(b))
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.25
    ]
    out = table_to_dict(
        G.triangles_per_node_driver(pack_edges(pairs)), "s_suppkey", "n_triangles"
    )
    assert out == brute_triangles(pairs)


def test_kcore_known_graph():
    # K4 (core 3) with a pendant path hanging off it (core 1)
    pairs = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5), (5, 6)]
    out = table_to_dict(G.core_numbers(pack_edges(pairs)), "s_suppkey", "core")
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1}


def test_kcore_random_vs_bruteforce():
    rng = np.random.default_rng(11)
    pairs = [
        (int(a), int(b))
        for a, b in itertools.combinations(np.arange(25), 2)
        if rng.random() < 0.2
    ]
    out = table_to_dict(G.core_numbers(pack_edges(pairs)), "s_suppkey", "core")
    assert out == brute_core_numbers(pairs)


def test_pairs_by_size_matches_itertools():
    keys = np.array([1, 1, 1, 2, 2, 3, 4, 4, 4, 4], np.int64)
    vals = np.array([5, 9, 7, 2, 8, 1, 6, 3, 0, 4], np.int64)
    a, b = G._pairs_by_size(keys, vals)
    got = set(zip(a.tolist(), b.tolist()))
    want = set()
    for k in np.unique(keys):
        group = sorted(vals[keys == k].tolist())
        want |= {tuple(sorted(p)) for p in itertools.combinations(group, 2)}
    assert got == want


def test_driver_vs_distributed_equivalence(ray_session):
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    tbl = gather_table(edges, schema=G.EDGE_SCHEMA)
    packed = tbl.column("e").to_numpy(zero_copy_only=False)
    drv = table_to_dict(G.triangles_per_node_driver(packed), "s_suppkey", "n_triangles")
    dist_tbl = pa.Table.from_pylist(
        G.triangles_per_node_distributed(edges).take_all()
    )
    dist = table_to_dict(dist_tbl, "s_suppkey", "n_triangles")
    assert drv == dist and len(drv) > 0


def test_triangles_rank_join_path_equivalence(ray_session):
    """The past-broadcast-range rank attach (degree Dataset + two hash
    joins, enumeration-free rank = deg * 2^32 + node) must count the same
    triangles as the broadcast orientation."""
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    drv = table_to_dict(
        G.triangles_per_node_driver(
            gather_table(edges, schema=G.EDGE_SCHEMA)
            .column("e")
            .to_numpy(zero_copy_only=False)
        ),
        "s_suppkey",
        "n_triangles",
    )
    joined = table_to_dict(
        pa.Table.from_pylist(
            G.triangles_per_node_distributed(edges, rank_attach="join").take_all()
        ),
        "s_suppkey",
        "n_triangles",
    )
    assert joined == drv and len(drv) > 0


def test_kcore_driver_vs_distributed_equivalence(ray_session):
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    tbl = gather_table(edges, schema=G.EDGE_SCHEMA)
    drv = table_to_dict(
        G.core_numbers(tbl.column("e").to_numpy(zero_copy_only=False)),
        "s_suppkey",
        "core",
    )
    dist_tbl = pa.Table.from_pylist(G.core_numbers_distributed(edges).take_all())
    dist = table_to_dict(dist_tbl, "s_suppkey", "core")
    assert drv == dist and len(drv) > 0


def test_edges_independent_of_partitioning(ray_session):
    """The edge set is a pure function of the data — identical whatever
    block layout the read produces."""
    from pie_ray.util import gather_table

    def edge_array(nblocks):
        ds = G.cooccurrence_edges(SF, override_num_blocks=nblocks).materialize()
        tbl = gather_table(ds, schema=G.EDGE_SCHEMA)
        return np.sort(tbl.column("e").to_numpy(zero_copy_only=False))

    assert np.array_equal(edge_array(1), edge_array(5))


@pytest.mark.parametrize("nblocks", [1, 7, 40])
def test_triangles_block_layout_sweep(ray_session, nblocks):
    """Round-3 driver regression: with many read blocks (more blocks than
    matching rows in some), Ray emits zero-row EMPTY-SCHEMA blocks and a
    bare pa.concat_tables crashes (ArrowInvalid: schema mix) — observed at
    sf0.01/32 cpus while sf0.001/pytest passed. gather_table must survive
    every layout and yield identical triangle counts."""
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF, override_num_blocks=nblocks).materialize()
    tbl = gather_table(edges, schema=G.EDGE_SCHEMA)
    out = table_to_dict(
        G.triangles_per_node_driver(
            tbl.column("e").to_numpy(zero_copy_only=False)
        ),
        "s_suppkey",
        "n_triangles",
    )
    base = table_to_dict(
        G.triangles_per_node_driver(
            gather_table(
                G.cooccurrence_edges(SF).materialize(), schema=G.EDGE_SCHEMA
            )
            .column("e")
            .to_numpy(zero_copy_only=False)
        ),
        "s_suppkey",
        "n_triangles",
    )
    assert out == base


def test_gather_table_empty_and_mixed_blocks(ray_session):
    """gather_table drops zero-row/empty-schema blocks and falls back to
    the declared schema when everything is empty."""
    import ray.data

    from pie_ray.util import gather_table

    # all-empty: a filter that matches nothing, split across blocks
    ds = (
        ray.data.from_arrow(pa.table({"e": pa.array([1, 2, 3], pa.int64())}))
        .repartition(3)
        .filter(expr="e > 100")
        .materialize()
    )
    tbl = gather_table(ds, schema=G.EDGE_SCHEMA)
    assert tbl.num_rows == 0 and tbl.schema.equals(G.EDGE_SCHEMA)

    # mixed: some empty blocks among real ones
    ds2 = (
        ray.data.from_arrow(pa.table({"e": pa.array([1, 2, 300], pa.int64())}))
        .repartition(3)
        .filter(expr="e >= 300")
        .materialize()
    )
    tbl2 = gather_table(ds2, schema=G.EDGE_SCHEMA)
    assert tbl2.column("e").to_pylist() == [300]


# ---------------------------------------------------- connected components


def _brute_cc(pairs, extra_nodes=()):
    from pie_ray.state.dsu import DSU

    dsu = DSU()
    for a, b in pairs:
        dsu.union(a, b)
    out = dict(dsu.canon_map())
    for n in extra_nodes:
        out.setdefault(n, n)
    for a, b in pairs:
        out.setdefault(a, a), out.setdefault(b, b)
    return out


def _cc_dict(ds):
    return {r["node"]: r["component"] for r in ds.take_all()}


def test_connected_components_random_int_graph(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    a = rng.integers(0, 300, 500).astype(np.int64)
    b = rng.integers(0, 300, 500).astype(np.int64)
    keep = a != b
    pairs = list(zip(a[keep].tolist(), b[keep].tolist()))
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(a[keep]), "dst": pa.array(b[keep])})
    ).repartition(4)

    expect = _brute_cc(pairs)
    got = _cc_dict(G.connected_components(edges))
    assert got == expect
    # the scale path must agree exactly with the driver union-find
    got_dist = _cc_dict(G.connected_components(edges, force_distributed=True))
    assert got_dist == expect


def test_connected_components_strings_and_isolated_nodes(ray_session):
    import ray.data

    edges = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(["bob", "carol", "dave", "erin"]),
                "v": pa.array(["alice", "bob", "erin", "dave"]),
            }
        )
    )
    nodes = ray.data.from_arrow(
        pa.table({"id": pa.array(["alice", "bob", "carol", "dave", "erin", "zed"])})
    )
    got = _cc_dict(
        G.connected_components(edges, src="u", dst="v", nodes_ds=nodes, node_col="id")
    )
    assert got == {
        "alice": "alice",
        "bob": "alice",
        "carol": "alice",
        "dave": "dave",
        "erin": "dave",
        "zed": "zed",  # isolated node -> singleton component
    }


def test_connected_components_string_nodes_no_edges(ray_session):
    # all-isolated string-node graph: zero edges, node universe supplied
    import pyarrow as pa
    import ray.data

    from pie_ray.functions.graphops import connected_components

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    nodes = ray.data.from_arrow(pa.table({"id": pa.array(["x", "y", "z"])}))
    got = (
        connected_components(edges, src="src", dst="dst", nodes_ds=nodes, node_col="id")
        .to_pandas()
        .sort_values("node")
    )
    assert got.node.tolist() == ["x", "y", "z"]
    assert got.component.tolist() == ["x", "y", "z"]


# --------------------------------------------- label propagation communities


def _lpa_reference(pairs, max_rounds=20):
    """Pure-python replica of the synchronous deterministic LPA contract:
    vote = neighbour labels + own label once; winner = max count, ties ->
    smallest label; synchronous rounds; stop on no change or the cap."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(max_rounds):
        new = {}
        for n in adj:
            votes: dict[int, int] = {}
            for m in adj[n]:
                votes[lab[m]] = votes.get(lab[m], 0) + 1
            votes[lab[n]] = votes.get(lab[n], 0) + 1
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        if new == lab:
            break
        lab = new
    return lab


def _lpa_dict(ds):
    t = pa.Table.from_pylist(ds.take_all())
    return dict(zip(t.column("node").to_pylist(), t.column("community").to_pylist()))


def test_label_propagation_two_cliques(ray_session):
    """Two 5-cliques joined by one bridge edge: each clique converges to
    one community and the two communities differ."""
    import ray.data

    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs = c1 + c2 + [(4, 10)]
    edges = ray.data.from_arrow(pa.table({"e": pa.array(pack_edges(pairs), pa.int64())}))
    got = _lpa_dict(G.label_propagation(edges))
    assert set(got) == set(range(5)) | set(range(10, 15))
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1
    assert got[0] != got[10]
    assert got == _lpa_reference(pairs)


def test_label_propagation_matches_reference_random(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 150).astype(np.int64)
    b = rng.integers(0, 60, 150).astype(np.int64)
    keep = a != b
    pairs = list(zip(a[keep].tolist(), b[keep].tolist()))
    edges = ray.data.from_arrow(
        pa.table({"e": pa.array(pack_edges(pairs), pa.int64())})
    ).repartition(5)
    assert _lpa_dict(G.label_propagation(edges)) == _lpa_reference(pairs)


@pytest.mark.parametrize("nblocks", [1, 7])
def test_label_propagation_partition_independent(ray_session, nblocks):
    import ray.data

    rng = np.random.default_rng(3)
    a = rng.integers(0, 40, 80).astype(np.int64)
    b = rng.integers(0, 40, 80).astype(np.int64)
    keep = a != b
    packed = pack_edges(list(zip(a[keep].tolist(), b[keep].tolist())))
    edges = ray.data.from_arrow(
        pa.table({"e": pa.array(packed, pa.int64())})
    ).repartition(nblocks)
    base = ray.data.from_arrow(pa.table({"e": pa.array(packed, pa.int64())}))
    assert _lpa_dict(G.label_propagation(edges)) == _lpa_dict(
        G.label_propagation(base)
    )


def test_graph_components_entry_matches_brute(ray_session):
    """q_graph_components (the SQL-oracled CC entry) vs brute DSU over the
    same derived co-supplier graph."""
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    packed = (
        gather_table(edges, schema=G.EDGE_SCHEMA)
        .column("e")
        .to_numpy(zero_copy_only=False)
    )
    pairs = [(int(e >> 32), int(e & 0xFFFFFFFF)) for e in packed]
    expect = _brute_cc(pairs)
    t = pa.Table.from_pylist(G.q_graph_components(SF).take_all())
    got = dict(zip(t.column("s_suppkey").to_pylist(), t.column("component").to_pylist()))
    assert got == expect and len(got) > 0


# ------------------------------------------------------ integer-exact PageRank


def _pr_reference(pairs, iters=G.PR_ITERS, scale=G.PR_SCALE):
    """Pure-python replica of the integer PageRank contract."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(ms) for n, ms in adj.items()}
    r = {n: scale for n in adj}
    base = scale * (G.PR_DAMP_DEN - G.PR_DAMP_NUM) // G.PR_DAMP_DEN
    for _ in range(iters):
        new = {}
        for v in adj:
            acc = sum(r[u] // deg[u] for u in adj[v])
            new[v] = base + G.PR_DAMP_NUM * acc // G.PR_DAMP_DEN
        r = new
    return r


def test_pagerank_integer_matches_reference():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 80, 200).astype(np.int64)
    b = rng.integers(0, 80, 200).astype(np.int64)
    keep = a != b
    pairs = list(zip(a[keep].tolist(), b[keep].tolist()))
    got = table_to_dict(
        G.pagerank_integer_driver(pack_edges(pairs)), "s_suppkey", "rank_scaled"
    )
    assert got == _pr_reference(pairs) and len(got) > 0


def test_pagerank_driver_vs_distributed_bit_equal(ray_session):
    """Integer arithmetic makes the two paths agree BIT-FOR-BIT — the
    whole point of the fixed-point design."""
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    packed = (
        gather_table(edges, schema=G.EDGE_SCHEMA)
        .column("e")
        .to_numpy(zero_copy_only=False)
    )
    drv = table_to_dict(
        G.pagerank_integer_driver(packed), "s_suppkey", "rank_scaled"
    )
    dist = table_to_dict(
        pa.Table.from_pylist(G.pagerank_integer_distributed(edges).take_all()),
        "s_suppkey",
        "rank_scaled",
    )
    assert drv == dist and len(drv) > 0


def test_pagerank_partition_independent(ray_session):
    a = table_to_dict(
        pa.Table.from_pylist(
            G.pagerank_integer_distributed(
                G.cooccurrence_edges(SF, override_num_blocks=1).materialize()
            ).take_all()
        ),
        "s_suppkey",
        "rank_scaled",
    )
    b = table_to_dict(
        pa.Table.from_pylist(
            G.pagerank_integer_distributed(
                G.cooccurrence_edges(SF, override_num_blocks=7).materialize()
            ).take_all()
        ),
        "s_suppkey",
        "rank_scaled",
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# link prediction (common neighbors + Jaccard)
# ---------------------------------------------------------------------------


def _link_brute(pairs):
    """Reference scores from an explicit neighbor-set scan."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if y in adj[x]:
                continue
            cn = len(adj[x] & adj[y])
            if cn:
                out[(x, y)] = (cn, cn / len(adj[x] | adj[y]))
    return out


def _packed(pairs):
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    return G._pack(np.minimum(a, b), np.maximum(a, b))


def test_link_predict_driver_vs_bruteforce():
    rng = np.random.default_rng(17)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 30, size=(120, 2)) if p[0] != p[1]}
    pairs = sorted(pairs)
    got = G.link_predict_driver(np.unique(_packed(pairs)))
    want = _link_brute(pairs)
    got_map = {
        (r["suppkey_a"], r["suppkey_b"]): (r["common_neighbors"], r["jaccard"])
        for r in got.to_pylist()
    }
    assert set(got_map) == set(want)
    for k, (cn, jac) in want.items():
        assert got_map[k][0] == cn
        assert got_map[k][1] == jac  # same single float division


def test_link_predict_driver_vs_distributed(ray_session):
    import ray.data
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    tbl = gather_table(edges, schema=G.EDGE_SCHEMA)
    packed = tbl.column("e").to_numpy(zero_copy_only=False)
    drv = G.link_predict_driver(packed)
    dist = G.link_predict_distributed(edges)
    key = lambda t: sorted(
        (r["suppkey_a"], r["suppkey_b"], r["common_neighbors"], r["jaccard"])
        for r in t.to_pylist()
    )
    assert key(drv) == key(dist) and drv.num_rows > 0


# ---------------------------------------------- TrustRank (seeded teleport)


def _trust_reference(pairs, seed_pred, iters=G.PR_ITERS, scale=G.PR_SCALE):
    """Pure-python replica of the seeded integer update (undirected input)."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(ms) for n, ms in adj.items()}
    base = scale * (G.PR_DAMP_DEN - G.PR_DAMP_NUM) // G.PR_DAMP_DEN
    sb = {n: (base if seed_pred(np.array([n], np.int64))[0] else 0) for n in adj}
    r = dict(sb)
    for _ in range(iters):
        new = {}
        for v in adj:
            acc = sum(r[u] // deg[u] for u in adj[v])
            new[v] = sb[v] + G.PR_DAMP_NUM * acc // G.PR_DAMP_DEN
        r = new
    return r


def test_trustrank_matches_reference():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 150).astype(np.int64)
    b = rng.integers(0, 60, 150).astype(np.int64)
    keep = a != b
    # distinct undirected edges — the driver treats duplicates as weights,
    # the dict reference as sets, so feed it the deduped pair list
    packed = np.unique(G._pack(np.minimum(a, b)[keep], np.maximum(a, b)[keep]))
    ua = (packed // G.PACK).astype(np.int64)
    ub = (packed % G.PACK).astype(np.int64)
    pairs = list(zip(ua.tolist(), ub.tolist()))
    src = np.concatenate([ua, ub])
    dst = np.concatenate([ub, ua])
    out = G.trustrank_integer_directed_driver(src, dst, G._trust_seed_pred)
    got = dict(
        zip(out.column("node").to_pylist(), out.column("rank_scaled").to_pylist())
    )
    assert got == _trust_reference(pairs, G._trust_seed_pred) and len(got) > 0


def test_trustrank_driver_vs_distributed_bit_equal(ray_session):
    from pie_ray.util import gather_table

    edges = G.cooccurrence_edges(SF).materialize()
    packed = (
        gather_table(edges, schema=G.EDGE_SCHEMA)
        .column("e")
        .to_numpy(zero_copy_only=False)
    )
    aa = (packed // G.PACK).astype(np.int64)
    bb = (packed % G.PACK).astype(np.int64)
    drv = G.trustrank_integer_directed_driver(
        np.concatenate([aa, bb]), np.concatenate([bb, aa]), G._trust_seed_pred
    )
    drv_map = table_to_dict(
        pa.table(
            {"s_suppkey": drv.column("node"), "rank_scaled": drv.column("rank_scaled")}
        ),
        "s_suppkey",
        "rank_scaled",
    )
    dist = table_to_dict(
        pa.Table.from_pylist(
            G.trustrank_integer_distributed(edges, G._trust_seed_pred).take_all()
        ),
        "s_suppkey",
        "rank_scaled",
    )
    assert drv_map == dist and len(drv_map) > 0


def test_trustrank_partition_independent(ray_session):
    runs = []
    for blocks in (1, 5):
        runs.append(
            table_to_dict(
                pa.Table.from_pylist(
                    G.trustrank_integer_distributed(
                        G.cooccurrence_edges(
                            SF, override_num_blocks=blocks
                        ).materialize(),
                        G._trust_seed_pred,
                    ).take_all()
                ),
                "s_suppkey",
                "rank_scaled",
            )
        )
    assert runs[0] == runs[1] and len(runs[0]) > 0


def test_trustrank_seedless_component_ranks_zero():
    # component {1,2,3} holds no seed (nothing % 5 == 0); {5,6,7} holds 5
    pairs = [(1, 2), (2, 3), (5, 6), (6, 7)]
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    out = G.trustrank_integer_directed_driver(src, dst, G._trust_seed_pred)
    got = dict(
        zip(out.column("node").to_pylist(), out.column("rank_scaled").to_pylist())
    )
    assert got[1] == got[2] == got[3] == 0  # no in-path from any seed
    assert got[5] > 0 and got[6] > 0 and got[7] > 0  # trust propagates
    assert got[5] > got[7]  # and decays with distance from the seed


# ----------------------------------------------- strongly connected components


class TestScc:
    def _nx_scc(self, pairs):
        import networkx as nx

        g = nx.DiGraph()
        g.add_edges_from(pairs)
        return {
            n: min(comp)
            for comp in nx.strongly_connected_components(g)
            for n in comp
        }

    def _driver_map(self, pairs):
        import numpy as np

        from pie_ray.functions.graphops import scc_driver

        src = np.array([a for a, _ in pairs], np.int64)
        dst = np.array([b for _, b in pairs], np.int64)
        t = scc_driver(src, dst)
        return dict(zip(t.column("node").to_pylist(), t.column("scc").to_pylist()))

    def test_scc_matches_networkx_planted(self):
        # two 3-cycles joined by one-way edges + a dangling DAG tail
        pairs = [
            (1, 2), (2, 3), (3, 1),          # cycle A
            (4, 5), (5, 6), (6, 4),          # cycle B
            (3, 4),                          # A -> B one-way
            (6, 7), (7, 8),                  # DAG tail (singletons)
        ]
        got = self._driver_map(pairs)
        assert got == self._nx_scc(pairs)
        assert got[1] == got[2] == got[3] == 1
        assert got[4] == got[5] == got[6] == 4
        assert got[7] == 7 and got[8] == 8

    def test_scc_matches_networkx_random(self):
        import numpy as np

        rng = np.random.RandomState(11)
        for _ in range(6):
            n, m = 30, 70
            pairs = set()
            while len(pairs) < m:
                a, b = rng.randint(1, n + 1, 2)
                if a != b:
                    pairs.add((int(a), int(b)))
            pairs = sorted(pairs)
            assert self._driver_map(pairs) == self._nx_scc(pairs)

    def test_scc_deep_chain_no_recursion_blowup(self):
        # a 5k-node cycle would overflow a recursive Tarjan's stack
        n = 5000
        pairs = [(i, i + 1) for i in range(1, n)] + [(n, 1)]
        got = self._driver_map(pairs)
        assert set(got.values()) == {1} and len(got) == n

    def test_scc_dataset_string_ids(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pie_ray.functions.graphops import scc

        t = pa.table(
            {
                "src": pa.array(["a.com", "b.com", "c.com", "d.com"]),
                "dst": pa.array(["b.com", "a.com", "d.com", "c.com"]),
            }
        )
        out = {
            r["node"]: r["scc"]
            for r in scc(ray.data.from_arrow(t).repartition(2)).take_all()
        }
        assert out == {
            "a.com": "a.com",
            "b.com": "a.com",
            "c.com": "c.com",
            "d.com": "c.com",
        }

    def test_scc_over_budget_auto_switches_to_scale_path(self, ray_session):
        import pyarrow as pa
        import ray.data

        import pie_ray.functions.graphops as g

        # the tuned LIVE global must reach the scale path's own budget:
        # the driver Tarjan may never see more edges than the limit
        # (regression: a def-time default ignored the patched value and
        # pulled the FULL graph onto the driver)
        seen = []
        real = g._scc_on_table

        def spy(tbl, src, dst):
            seen.append(tbl.num_rows)
            return real(tbl, src, dst)

        old = g.SCC_DRIVER_EDGE_LIMIT
        g.SCC_DRIVER_EDGE_LIMIT = 1
        g._scc_on_table = spy
        try:
            t = pa.table({"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 1], pa.int64())})
            res = g.scc(ray.data.from_arrow(t)).to_pandas()
            assert dict(zip(res["node"].astype(int), res["scc"].astype(int))) == {1: 1, 2: 1}
            assert all(n <= 1 for n in seen)
        finally:
            g.SCC_DRIVER_EDGE_LIMIT = old
            g._scc_on_table = real

    def test_scc_int32_ids_both_paths_agree(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pie_ray.functions.graphops import scc

        # non-int64 integer ids must normalize: the forced path used to
        # crash in the hash-shuffle join (int32 universe vs int64 Tarjan
        # remainder), diverging from the driver path
        pairs = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)]
        t = pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int32()),
                "dst": pa.array([b for _, b in pairs], pa.int32()),
            }
        )
        want = {1: 1, 2: 1, 3: 3, 4: 3}
        for force in (False, True):
            res = scc(
                ray.data.from_arrow(t).repartition(2), force_distributed=force
            ).to_pandas()
            assert dict(zip(res["node"].astype(int), res["scc"].astype(int))) == want

    def test_scc_forced_empty_keeps_string_type(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pie_ray.functions.graphops import scc

        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        )
        for force in (False, True):
            out = scc(empty, force_distributed=force)
            sch = out.schema()
            assert out.count() == 0
            assert sch.names == ["node", "scc"]
            assert sch.types == [pa.string(), pa.string()]

    def _ds(self, pairs, blocks=None):
        import pyarrow as pa
        import ray.data

        t = pa.table(
            {
                "src": pa.array([a for a, _ in pairs]),
                "dst": pa.array([b for _, b in pairs]),
            }
        )
        ds = ray.data.from_arrow(t)
        return ds.repartition(blocks) if blocks else ds

    def test_scc_distributed_matches_driver_random(self, ray_session):
        import numpy as np

        from pie_ray.functions.graphops import scc

        rng = np.random.RandomState(47)
        pairs = sorted(
            {
                (int(a), int(b))
                for a, b in rng.randint(1, 18, (45, 2))
                if a != b
            }
        )
        dist = scc(self._ds(pairs, blocks=4), force_distributed=True).to_pandas()
        got = dict(zip(dist["node"].astype(int), dist["scc"].astype(int)))
        assert got == self._nx_scc(pairs)

    def test_scc_distributed_string_ids(self, ray_session):
        from pie_ray.functions.graphops import scc

        # two 2-cycles bridged one-way + a dangling tail (exercises trim)
        pairs = [
            ("a.com", "b.com"), ("b.com", "a.com"),
            ("b.com", "c.com"),
            ("c.com", "d.com"), ("d.com", "c.com"),
            ("d.com", "e.com"), ("e.com", "f.com"),
        ]
        dist = scc(self._ds(pairs, blocks=3), force_distributed=True).to_pandas()
        got = dict(zip(dist["node"], dist["scc"]))
        assert got == {
            "a.com": "a.com", "b.com": "a.com",
            "c.com": "c.com", "d.com": "c.com",
            "e.com": "e.com", "f.com": "f.com",
        }

    def test_scc_distributed_pivot_carving_zero_budget(self, ray_session):
        from pie_ray.functions.graphops import scc_distributed

        # three disjoint cycles + a DAG bridge: driver_edge_limit=0 forces
        # every SCC through trim or an FW-BW carve (no driver fallback)
        pairs = (
            [(1, 2), (2, 3), (3, 1)]
            + [(10, 11), (11, 10)]
            + [(20, 21), (21, 22), (22, 20)]
            + [(3, 10), (11, 20), (22, 30)]  # bridges + tail
        )
        res = scc_distributed(
            self._ds(pairs, blocks=3), driver_edge_limit=0, max_pivots=10
        ).to_pandas()
        got = dict(zip(res["node"].astype(int), res["scc"].astype(int)))
        assert got == self._nx_scc(pairs)

    def test_scc_distributed_raises_when_pivots_exhausted(self, ray_session):
        import pytest

        from pie_ray.functions.graphops import scc_distributed

        pairs = [(1, 2), (2, 1)]
        with pytest.raises(NotImplementedError):
            scc_distributed(self._ds(pairs), driver_edge_limit=0, max_pivots=0)

    def test_directed_edges_partition_independent(self, ray_session):
        from pie_ray.functions.graphops import cosupply_directed_edges

        base = None
        for blocks in (None, 3, 11):
            e = sorted(
                r["e"]
                for r in cosupply_directed_edges(
                    "/root/testdata/sf0.001", override_num_blocks=blocks
                ).take_all()
            )
            if base is None:
                base = e
            assert e == base and len(e) > 0

    def test_entry_has_structure_and_both_parities(self, ray_session):
        """The parity orientation must create cycles (non-trivial SCCs)
        AND leave singletons — otherwise the entry can't discriminate."""
        from collections import Counter

        from pie_ray.functions.graphops import q_graph_scc

        rows = q_graph_scc("/root/testdata/sf0.001").take_all()
        sizes = Counter(r["scc"] for r in rows)
        assert len(rows) > 0
        assert any(c > 1 for c in sizes.values()), "no non-trivial SCC"
        assert any(c == 1 for c in sizes.values()), "no singleton SCC"


class TestBfsWalks:
    def _edges_ds(self, pairs, num_blocks=None):
        import ray.data

        t = pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        return ds.repartition(num_blocks) if num_blocks else ds

    def _nx_depths(self, pairs, seeds, cap=16):
        import networkx as nx

        g = nx.DiGraph()
        g.add_edges_from(pairs)
        want = {int(s): 0 for s in seeds}  # isolated seeds at depth 0
        for s in seeds:
            if s not in g:
                continue
            for n, d in nx.single_source_shortest_path_length(g, s, cutoff=cap).items():
                if n not in want or d < want[n]:
                    want[int(n)] = int(d)
        return want

    def _bfs_map(self, ds):
        df = ds.to_pandas()
        return dict(zip(df["node"].astype(int), df["depth"].astype(int)))

    def test_bfs_matches_networkx_random(self, ray_session):
        rng = np.random.RandomState(7)
        for trial in range(4):
            n, m = 40, 90
            pairs = set()
            while len(pairs) < m:
                a, b = rng.randint(1, n + 1, 2)
                if a != b:
                    pairs.add((int(a), int(b)))
            pairs = sorted(pairs)
            seeds = [1, 5, 999]  # 999 is isolated (not in the graph)
            got = self._bfs_map(G.bfs_depths(self._edges_ds(pairs), seeds))
            assert got == self._nx_depths(pairs, seeds)

    def test_bfs_driver_equals_distributed(self, ray_session):
        rng = np.random.RandomState(13)
        pairs = sorted(
            {
                (int(a), int(b))
                for a, b in rng.randint(1, 25, (60, 2))
                if a != b
            }
        )
        seeds = [2, 3]
        drv = self._bfs_map(G.bfs_depths(self._edges_ds(pairs), seeds))
        dist = self._bfs_map(
            G.bfs_depths(self._edges_ds(pairs, num_blocks=5), seeds, force_distributed=True)
        )
        assert drv == dist

    def test_bfs_max_depth_cap(self, ray_session):
        # a directed 10-chain from 1: cap 3 keeps only depths 0..3
        pairs = [(i, i + 1) for i in range(1, 11)]
        got = self._bfs_map(G.bfs_depths(self._edges_ds(pairs), [1], max_depth=3))
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}
        dist = self._bfs_map(
            G.bfs_depths(
                self._edges_ds(pairs, num_blocks=3), [1], max_depth=3,
                force_distributed=True,
            )
        )
        assert dist == got

    def _brute_walks(self, pairs, seeds, steps):
        adj = {}
        for a, b in set(pairs):
            adj.setdefault(a, set()).add(b)
        adj = {a: sorted(bs) for a, bs in adj.items()}
        rows = set()
        for s in sorted(set(seeds)):
            rows.add((s, 0, s))
            cur = s
            for st in range(1, steps + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[
                    (
                        (cur & G.WALK_FOLD) * G.WALK_A
                        + st * G.WALK_B
                        + (s & G.WALK_FOLD) * G.WALK_C
                    ) % len(nbrs)
                ]
                rows.add((s, st, cur))
        return rows

    def _walk_rows(self, ds):
        df = ds.to_pandas()
        return set(
            zip(df["seed"].astype(int), df["step"].astype(int), df["node"].astype(int))
        )

    def test_walks_match_brute_random(self, ray_session):
        rng = np.random.RandomState(17)
        for trial in range(4):
            pairs = sorted(
                {
                    (int(a), int(b))
                    for a, b in rng.randint(1, 30, (80, 2))
                    if a != b
                }
            )
            seeds = [1, 4, 9]
            got = self._walk_rows(G.random_walks(self._edges_ds(pairs), seeds, num_steps=6))
            assert got == self._brute_walks(pairs, seeds, 6)

    def test_walks_driver_equals_distributed(self, ray_session):
        rng = np.random.RandomState(23)
        pairs = sorted(
            {
                (int(a), int(b))
                for a, b in rng.randint(1, 20, (50, 2))
                if a != b
            }
        )
        seeds = [1, 6]
        drv = self._walk_rows(G.random_walks(self._edges_ds(pairs), seeds, num_steps=5))
        dist = self._walk_rows(
            G.random_walks(
                self._edges_ds(pairs, num_blocks=4), seeds, num_steps=5,
                force_distributed=True,
            )
        )
        assert drv == dist == self._brute_walks(pairs, seeds, 5)

    def test_walks_dead_end_stops(self, ray_session):
        # 1 -> 2 -> 3 (3 has no out-edges): the walk stops at step 2
        pairs = [(1, 2), (2, 3)]
        got = self._walk_rows(G.random_walks(self._edges_ds(pairs), [1], num_steps=8))
        assert got == {(1, 0, 1), (1, 1, 2), (1, 2, 3)}
        dist = self._walk_rows(
            G.random_walks(
                self._edges_ds(pairs, num_blocks=2), [1], num_steps=8,
                force_distributed=True,
            )
        )
        assert dist == got

    def test_walks_partition_independence(self, ray_session):
        rng = np.random.RandomState(29)
        pairs = sorted(
            {
                (int(a), int(b))
                for a, b in rng.randint(1, 40, (120, 2))
                if a != b
            }
        )
        a = self._walk_rows(G.random_walks(self._edges_ds(pairs, num_blocks=1), [3, 12], num_steps=7))
        b = self._walk_rows(G.random_walks(self._edges_ds(pairs, num_blocks=9), [3, 12], num_steps=7))
        assert a == b

    def test_walks_large_ids_int64_exact(self, ray_session):
        # hash64-derived ids live near 2^62: the 31-bit fold keeps the
        # rank mix int64-exact (an unfolded node*WALK_A wraps numpy int64
        # and silently diverges from exact Python/SQL arithmetic)
        base = (1 << 62) + 12345
        rng = np.random.RandomState(31)
        ids = base + rng.choice(10_000, size=30, replace=False).astype(np.int64)
        pairs = sorted(
            {
                (int(ids[a]), int(ids[b]))
                for a, b in rng.randint(0, len(ids), (80, 2))
                if a != b
            }
        )
        seeds = [int(ids[0]), int(ids[7])]
        got = self._walk_rows(G.random_walks(self._edges_ds(pairs), seeds, num_steps=6))
        assert got == self._brute_walks(pairs, seeds, 6)
        dist = self._walk_rows(
            G.random_walks(
                self._edges_ds(pairs, num_blocks=4), seeds, num_steps=6,
                force_distributed=True,
            )
        )
        assert dist == got

    def test_bfs_non_int64_seeds_match_driver(self, ray_session):
        # int32/float seeds against int64 edges: the distributed join used
        # to crash on the mismatched key type while the driver path coerced
        # — a partitioning-independence break
        pairs = [(1, 2), (2, 3), (3, 4)]
        want = {1: 0, 2: 1, 3: 2, 4: 3}
        for seeds in (np.array([1], np.int32), np.array([1.0])):
            drv = self._bfs_map(G.bfs_depths(self._edges_ds(pairs), seeds))
            dist = self._bfs_map(
                G.bfs_depths(
                    self._edges_ds(pairs, num_blocks=2), seeds,
                    force_distributed=True,
                )
            )
            assert drv == dist == want

    def test_bfs_large_string_ids_both_paths(self, ray_session):
        import ray.data

        # large_string edge columns: the driver path's chunked_array used
        # to refuse the (string-inferred) seed array, and the distributed
        # join key mismatched the same way
        t = pa.table(
            {
                "src": pa.array(["a", "b", "c"], pa.large_string()),
                "dst": pa.array(["b", "c", "d"], pa.large_string()),
            }
        )
        want = {"a": 0, "b": 1, "c": 2, "d": 3}
        for force in (False, True):
            out = G.bfs_depths(
                ray.data.from_arrow(t).repartition(2), ["a"],
                force_distributed=force,
            ).to_pandas()
            assert dict(zip(out["node"], out["depth"].astype(int))) == want

    def test_degenerate_empty_inputs(self, ray_session):
        # 0-row joins crash Ray's hash shuffle, so the degenerate cases
        # must short-circuit on BOTH paths
        import ray.data

        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        pairs = [(1, 2), (2, 3)]
        for force in (False, True):
            got = self._bfs_map(G.bfs_depths(empty, [5, 9], force_distributed=force))
            assert got == {5: 0, 9: 0}
            w = self._walk_rows(G.random_walks(empty, [5], num_steps=4, force_distributed=force))
            assert w == {(5, 0, 5)}
            assert (
                G.bfs_depths(self._edges_ds(pairs), [], force_distributed=force).count() == 0
            )
            assert (
                G.random_walks(self._edges_ds(pairs), [], force_distributed=force).count() == 0
            )


class TestHits:
    @staticmethod
    def _ref_hits(pairs, iters=G.HITS_ITERS, scale=G.PR_SCALE):
        """Independent per-edge-loop reference with the same integer rule."""
        nodes = sorted({x for p in pairs for x in p})
        h = {v: scale for v in nodes}
        a = {v: 0 for v in nodes}
        for _ in range(iters):
            raw = {v: 0 for v in nodes}
            for s, d in pairs:
                raw[d] += h[s]
            m = max(1, max(raw.values(), default=0) // scale)
            a = {v: raw[v] // m for v in nodes}
            raw = {v: 0 for v in nodes}
            for s, d in pairs:
                raw[s] += a[d]
            m = max(1, max(raw.values(), default=0) // scale)
            h = {v: raw[v] // m for v in nodes}
        return {v: (h[v], a[v]) for v in nodes}

    def test_driver_matches_reference_random_bipartite(self):
        rng = np.random.default_rng(9)
        src = (2 * rng.integers(0, 60, 300)).astype(np.int64)
        dst = (2 * rng.integers(0, 12, 300) + 1).astype(np.int64)
        pairs = sorted(set(zip(src.tolist(), dst.tolist())))
        out = G.hits_integer_directed_driver(
            np.array([p[0] for p in pairs], np.int64),
            np.array([p[1] for p in pairs], np.int64),
        )
        got = {
            r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in out.to_pylist()
        }
        assert got == self._ref_hits(pairs) and len(got) > 0
        # bipartite structure: hub side carries no authority and vice versa
        assert all(got[n][1] == 0 for n in got if n % 2 == 0)
        assert all(got[n][0] == 0 for n in got if n % 2 == 1)

    def test_star_graph_authority_concentrates(self):
        # 10 hubs all pointing at auth 1; one pointing also at auth 3
        pairs = [(2 * i, 1) for i in range(10)] + [(0, 3)]
        out = G.hits_integer_directed_driver(
            np.array([p[0] for p in pairs], np.int64),
            np.array([p[1] for p in pairs], np.int64),
        )
        got = {r["node"]: r for r in out.to_pylist()}
        assert got[1]["auth_scaled"] > got[3]["auth_scaled"] > 0
        # the hub that also reaches the minor authority scores highest
        assert got[0]["hub_scaled"] == max(
            r["hub_scaled"] for r in out.to_pylist()
        )

    def test_driver_vs_distributed_bit_equal(self, ray_session):
        edges = G.hits_edges(SF).materialize()
        from pie_ray.util import gather_table

        tbl = gather_table(edges, schema=G.HITS_SCHEMA)
        drv = G.hits_integer_directed_driver(
            tbl.column("src").to_numpy(zero_copy_only=False),
            tbl.column("dst").to_numpy(zero_copy_only=False),
        ).to_pylist()
        dist = pa.Table.from_pylist(
            G.hits_integer_distributed(edges).take_all()
        ).to_pylist()
        key = lambda r: r["node"]  # noqa: E731
        assert sorted(drv, key=key) == sorted(dist, key=key) and len(drv) > 0

    def test_edges_partition_independent(self, ray_session):
        a = pa.Table.from_pylist(
            G.hits_edges(SF, override_num_blocks=2).take_all()
        ).to_pylist()
        b = pa.Table.from_pylist(
            G.hits_edges(SF, override_num_blocks=13).take_all()
        ).to_pylist()
        key = lambda r: (r["src"], r["dst"])  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key) and len(a) > 0

    def test_empty_graph(self, ray_session):
        import ray.data

        empty = ray.data.from_arrow(
            pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        )
        assert G.hits_integer_distributed(empty).num_rows == 0
