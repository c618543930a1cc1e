"""MinHash estimator tolerance, DSU vs networkx, triple-emission rules."""

import random

import numpy as np

from pie_ray.normalize import char_shingles, jaccard
from pie_ray.stages.linking import minhash_signature
from pie_ray.stages.triples import triples_for_doc
from pie_ray.state.dsu import DSU


def _est_jaccard(a: str, b: str, k: int = 128) -> float:
    sa, sb = minhash_signature(a, k), minhash_signature(b, k)
    return float(np.mean(sa == sb))


def test_minhash_estimates_jaccard():
    pairs = [
        ("john smith", "john smith"),
        ("john smith", "j. smith"),
        ("john smith", "smith, john"),
        ("john smith", "completely different"),
    ]
    for a, b in pairs:
        true_j = jaccard(char_shingles(a), char_shingles(b))
        est = _est_jaccard(a, b)
        assert abs(est - true_j) < 0.15, (a, b, true_j, est)


def test_minhash_deterministic():
    assert np.array_equal(minhash_signature("abc def"), minhash_signature("abc def"))


def test_dsu_matches_networkx():
    import networkx as nx

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(200)]
    edges = [
        (nodes[rng.randrange(200)], nodes[rng.randrange(200)]) for _ in range(150)
    ]
    dsu = DSU()
    g = nx.Graph()
    for a, b in edges:
        dsu.union(a, b)
        g.add_edge(a, b)
    nx_canon = {}
    for comp in nx.connected_components(g):
        c = min(comp)
        for m in comp:
            nx_canon[m] = c
    assert dsu.canon_map() == nx_canon


def test_dsu_hot_node():
    dsu = DSU()
    for i in range(10000):
        dsu.union("hub", f"leaf{i}")
    cm = dsu.canon_map()
    assert len(set(cm.values())) == 1
    assert cm["leaf500"] == min(cm)


def test_triples_for_doc_rules():
    mentions = [
        {"ent_type": "PER", "norm": "john smith", "sent_id": 0, "score": 1.0},
        {"ent_type": "EMAIL", "norm": "j@x.io", "sent_id": 0, "score": 1.0},
        {"ent_type": "PER", "norm": "ann quimby", "sent_id": 1, "score": 1.0},
        {"ent_type": "PER", "norm": "john smith", "sent_id": 1, "score": 1.0},
        {"ent_type": "PHONE", "norm": "4165550000", "sent_id": 2, "score": 1.0},
    ]
    got = {(s, p, o) for s, p, o, _ in triples_for_doc("acme.com", mentions)}
    assert got == {
        ("per:john smith", "has_email", "j@x.io"),
        ("per:ann quimby", "co_mentioned_with", "per:john smith"),
        ("per:john smith", "appears_on", "acme.com"),
        ("per:ann quimby", "appears_on", "acme.com"),
    }
    # phone in sentence 2 has no person -> no triple; co-mention ordered
