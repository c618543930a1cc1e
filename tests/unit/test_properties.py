"""Property-based tests (hypothesis) for the pure-function core."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=60
    )
)
def test_dsu_components_match_networkx(edges):
    import networkx as nx

    from pie_ray.state.dsu import DSU

    dsu = DSU()
    g = nx.Graph()
    for a, b in edges:
        dsu.union(f"{a:03d}", f"{b:03d}")
        g.add_edge(f"{a:03d}", f"{b:03d}")
    cm = dsu.canon_map()
    for comp in nx.connected_components(g):
        canon = min(comp)
        for node in comp:
            assert cm[node] == canon


@settings(max_examples=50, deadline=None)
@given(text=st.text(max_size=400))
def test_stripper_deterministic_and_idempotent_on_plain_text(text):
    from pie_ray.stages.extract import html_to_text

    b = text.encode("utf-8")
    out1 = html_to_text(b)
    out2 = html_to_text(b)
    assert out1 == out2
    # output contains no tag remnants or CRs and is whitespace-canonical
    assert "\r" not in out1
    assert "  " not in out1


@settings(max_examples=30, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from(["alice", "bob", "data", "ray", "the", "x1", "z9"]),
        min_size=0,
        max_size=50,
    )
)
def test_minhash_symmetric_and_bounded(tokens):
    from pie_ray.functions.dedup import doc_minhash, word_shingles, _jac

    text = " ".join(tokens)
    sig = doc_minhash(text)
    assert sig.shape == (128,)
    # identical text -> identical signature; jaccard(self) is 1 when non-empty
    assert (doc_minhash(text) == sig).all()
    sh = word_shingles(text)
    if sh:
        assert _jac(sh, sh) == 1.0


@settings(max_examples=50, deadline=None)
@given(text=st.text(max_size=300))
def test_tokenizer_offsets_roundtrip(text):
    from pie_ray.stages.tokenize import doc_tokens

    for sent in doc_tokens(text):
        for tok, b, e in sent:
            assert 0 <= b < e <= len(text)
            assert text[b:e] == tok
