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


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(2, 60),
    dim=st.integers(2, 6),
    tau=st.floats(0.5, 0.99),
    seed=st.integers(0, 10_000),
)
def test_semdedup_components_match_networkx(n, dim, tau, seed):
    import networkx as nx
    import numpy as np

    from pie_ray.functions.semdedup import _dup_components

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    roots = _dup_components(mat, tau)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    sims = mat @ mat.T
    r, c = np.nonzero(np.triu(sims >= tau, 1))
    g.add_edges_from(zip(r.tolist(), c.tolist()))
    for comp in nx.connected_components(g):
        mn = min(comp)
        for v in comp:
            assert roots[v] == mn


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(st.integers(-50, 50), min_size=1, max_size=200),
    nb=st.integers(1, 10),
    seed=st.integers(0, 10_000),
)
def test_range_partition_preserves_total_order(keys, nb, seed):
    """The global_rank / sorted-sink invariant: searchsorted(b, k,
    side='right') range assignment + per-range sort, concatenated in range
    order, IS the global sort — for ANY boundary choice (boundaries only
    balance load)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    k = np.asarray(keys, np.float64)
    boundaries = np.unique(rng.choice(k, size=min(nb, len(k)), replace=True))
    ranges = np.searchsorted(boundaries, k, side="right")
    tie = np.arange(len(k))  # unique tie-break = row index
    out = []
    for r in range(len(boundaries) + 1):
        sel = np.flatnonzero(ranges == r)
        order = np.lexsort((tie[sel], k[sel]))
        out.append(sel[order])
    got = np.concatenate(out)
    want = np.lexsort((tie, k))
    assert got.tolist() == want.tolist()


@settings(max_examples=50, deadline=None)
@given(
    strs=st.lists(st.text(max_size=80), min_size=1, max_size=40),
    k=st.integers(0, 5),
)
def test_bucket_hash_slice_and_type_invariance(strs, k):
    """The buffer-offset handling: hashing a SLICED Arrow array must equal
    the corresponding tail of the full hash (regression for the
    arr.offset math), and large_string must agree with string."""
    import pyarrow as pa

    from pie_ray.util import bucket_hash_strings

    arr = pa.array(strs, pa.string())
    h_full = bucket_hash_strings(arr, salt=7, prefix=None)
    k = min(k, len(strs) - 1)
    h_slice = bucket_hash_strings(arr.slice(k), salt=7, prefix=None)
    assert (h_slice == h_full[k:]).all()
    large = pa.array(strs, pa.large_string())
    assert (bucket_hash_strings(large, salt=7, prefix=None) == h_full).all()


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(
        st.text(min_size=1, max_size=30), min_size=1, max_size=50, unique=True
    )
)
def test_bloom_join_mask_has_no_false_negatives(keys):
    """The bloom_semi_join exactness guarantee rests on this: every
    inserted key must probe True (false positives are allowed, false
    negatives never)."""
    import numpy as np
    import pyarrow as pa

    from pie_ray.functions.bloomjoin import _bloom_mask, _bloom_params, _key_hash_pair

    m, h = _bloom_params(len(keys), 0.01)
    h1, h2 = _key_hash_pair(pa.array(keys, pa.string()), 0xB100)
    i = np.arange(h, dtype=np.uint64)
    pos = ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).ravel().astype(
        np.int64
    )
    bits = np.zeros(m // 8, np.uint8)
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    mask = _bloom_mask(pa.array(keys, pa.string()), bits, m, h, 0xB100)
    assert mask.all()


@settings(max_examples=50, deadline=None)
@given(groups=st.lists(st.tuples(st.text(max_size=6), st.integers(1, 4)), min_size=0, max_size=20))
def test_group_starts_matches_itertools_groupby(groups):
    import itertools

    import pyarrow as pa

    from pie_ray.stages.entity_profile import _group_starts

    vals = sorted(v for v, n in groups for _ in range(n))
    starts = _group_starts(pa.array(vals, pa.string())).tolist()
    want, pos = [], 0
    for _, grp in itertools.groupby(vals):
        want.append(pos)
        pos += len(list(grp))
    assert starts == want


@settings(max_examples=300, deadline=None)
@given(u=st.text(max_size=80))
def test_canonical_url_total_and_idempotent(u):
    """canonical_url is TOTAL (never raises on arbitrary input) and
    idempotent — a canonical form re-canonicalizes to itself."""
    from pie_ray.functions.urlops import canonical_url

    c = canonical_url(u)
    assert isinstance(c, str)
    assert canonical_url(c) == c


@settings(max_examples=100, deadline=None)
@given(
    host=st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,6}){1,2}", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}", fullmatch=True),
    params=st.lists(
        st.tuples(
            st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True),
            st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True),
        ),
        max_size=4,
    ),
)
def test_canonical_url_param_order_invariant(host, path, params):
    """Canonicalization is invariant to query-param ORDER (the property
    that makes it a dedup key for crawl variants)."""
    from pie_ray.functions.urlops import canonical_url

    qs1 = "&".join(f"{k}={v}" for k, v in params)
    qs2 = "&".join(f"{k}={v}" for k, v in reversed(params))
    u1 = f"https://{host}{path}" + (f"?{qs1}" if qs1 else "")
    u2 = f"https://{host}{path}" + (f"?{qs2}" if qs2 else "")
    assert canonical_url(u1) == canonical_url(u2)
