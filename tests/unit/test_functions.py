"""Unit tests for pie_ray.functions (textops, dedup, similarity, multimodal)
— pure-function parts that need no Ray session."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pie_ray.functions import dedup, textops
from pie_ray.functions.multimodal import DecodeBackend, MediaFeaturizer


def _doc_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


# ---- textops -------------------------------------------------------------


def test_token_count_matches_split():
    t = _doc_table(["one two three", "a  b", "", "  padded  out  "])
    out = textops.token_count_batch(t)
    assert out.column("n_tokens_ws").to_pylist() == [3, 2, 0, 2]


def test_quality_scores_bounded():
    t = _doc_table(["The quick brown fox jumps over the lazy dog." * 10, "!!!???"])
    out = textops.quality_batch(t)
    q = out.column("quality_score").to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    assert q[0] > q[1]  # prose beats punctuation soup


def test_lang_id_english():
    t = _doc_table(["the cat sat on the mat and then the dog and the bird went in"])
    out = textops.lang_id_batch(t)
    assert out.column("lang_pred").to_pylist() == ["en"]


def test_fingerprint_deterministic_and_shift_stable():
    a = "some rolling hash content that is long enough to window over"
    t1 = textops.fingerprint_batch(_doc_table([a]))
    t2 = textops.fingerprint_batch(_doc_table([a]))
    assert t1.column("fingerprint").to_pylist() == t2.column("fingerprint").to_pylist()


# ---- dedup ---------------------------------------------------------------


def test_simhash_near_dup_closer_than_unrelated():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a + " extra"
    c = "completely different words about ray data shuffles and parquet files"
    ha, hb, hc = (dedup.simhash64(x) for x in (a, b, c))
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(ha, hb) < ham(ha, hc)


def test_word_shingles_and_minhash_similarity():
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 wX"
    sa, sb = dedup.word_shingles(a), dedup.word_shingles(b)
    inter = len(sa & sb) / len(sa | sb)
    siga, sigb = dedup.doc_minhash(a), dedup.doc_minhash(b)
    est = (siga == sigb).mean()
    assert abs(est - inter) < 0.25


def test_doc_band_batch_identical_docs_collide():
    t = _doc_table(["same text " * 20, "same text " * 20], ids=[1, 2])
    bands = dedup.doc_band_batch(t)
    by_key: dict[str, set] = {}
    for bk, did in zip(bands.column("band_key").to_pylist(), bands.column("doc_id").to_pylist()):
        by_key.setdefault(bk, set()).add(did)
    assert any(v == {1, 2} for v in by_key.values())


# ---- multimodal ----------------------------------------------------------


def test_fake_decode_deterministic():
    be = DecodeBackend("fake")
    img1 = be.decode_image(b"payload", 8, 8)
    img2 = be.decode_image(b"payload", 8, 8)
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (8, 8, 3)


def test_real_decode_raises_without_codecs():
    from pie_ray.functions import multimodal as mm

    be = DecodeBackend("real")
    if mm._probe_pil() is None:  # the sandbox case
        with pytest.raises(NotImplementedError):
            be.decode_image(b"x", 4, 4)
    if mm._probe_soundfile() is None:
        with pytest.raises(NotImplementedError):
            be.decode_audio(b"x", 100)


def test_auto_mode_falls_back_to_fake_in_sandbox():
    from pie_ray.functions import multimodal as mm

    be = DecodeBackend("auto")
    if mm._probe_pil() is None:
        # auto must degrade to the deterministic fake, never raise
        img = be.decode_image(b"payload", 8, 8)
        np.testing.assert_array_equal(img, DecodeBackend("fake").decode_image(b"payload", 8, 8))


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="PIL not on this image — the real branch self-activates where it is",
)
def test_real_decode_with_pil_roundtrip():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((4, 6, 3), 200, np.uint8)).save(buf, format="PNG")
    be = DecodeBackend("real")
    out = be.decode_image(buf.getvalue(), 6, 4)
    assert out.shape == (4, 6, 3) and int(out[0, 0, 0]) == 200


def test_featurizer_batch_shape():
    from pie_ray.functions.multimodal import MEDIA_SCHEMA

    t = pa.table(
        {
            "media_id": pa.array(["a", "b"], pa.string()),
            "kind": pa.array(["image", "audio"], pa.string()),
            "payload": pa.array([b"x" * 64, b"y" * 64], pa.binary()),
            "mime": pa.array(["image/jpeg", "audio/wav"], pa.string()),
            "width": pa.array([8, -1], pa.int32()),
            "height": pa.array([8, -1], pa.int32()),
            "duration_ms": pa.array([-1, 500], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = MediaFeaturizer("fake")(t)
    assert out.num_rows == 2
    assert len(out.column("features")[0].as_py()) == 64
    assert "payload" not in out.column_names  # binary dropped post-featurize


# ---------------------------------------------------------------------------
# similarity: LSH ANN recall gate vs brute force (VERDICT r1 item 2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_knn_lsh_recall_vs_brute_force(ray_session, sf_dir):
    import ray.data

    from pie_ray.functions.similarity import knn_brute_force, knn_lsh

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = ds.count()
    q = np.asarray(ds.filter(expr="vec_id == 0").take(1)[0]["embedding"], dtype=np.float64)
    exact = {r["vec_id"] for r in knn_brute_force(ds, q, k=10).take_all()}
    approx_rows = knn_lsh(ds, q, n_rows=n_rows, k=10).take_all()
    approx = {r["vec_id"] for r in approx_rows}
    assert len(approx_rows) == 10, "LSH must return a full top-k, not a starved probe set"
    recall = len(exact & approx) / 10
    assert recall >= 0.9, f"LSH recall {recall} < 0.9 at {sf_dir}"


def test_dedup_verify_paths_equivalent(ray_session):
    """The driver-side (small) and join-based (scale) verify paths produce
    identical (a, b, jaccard) sets — the size-adaptive switch cannot change
    results."""
    import ray.data

    from pie_ray.functions.dedup import _verified_pairs

    def load():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )

    small = sorted(
        (r["a"], r["b"], r["jaccard"])
        for r in _verified_pairs(load(), emit_jaccard=True).take_all()
    )
    dist = sorted(
        (r["a"], r["b"], r["jaccard"])
        for r in _verified_pairs(load(), emit_jaccard=True, force_distributed=True).take_all()
    )
    assert small == dist
    assert len(small) > 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_knn_ivf_recall_vs_brute_force(ray_session, sf_dir):
    import ray.data

    from pie_ray.functions.similarity import knn_brute_force, knn_ivf

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = ds.count()
    q = np.asarray(ds.filter(expr="vec_id == 0").take(1)[0]["embedding"], dtype=np.float64)
    exact = {r["vec_id"] for r in knn_brute_force(ds, q, k=10).take_all()}
    rows = knn_ivf(ds, q, n_rows=n_rows, k=10).take_all()
    assert len(rows) == 10
    recall = len({r["vec_id"] for r in rows} & exact) / 10
    assert recall >= 0.9, f"IVF recall {recall} < 0.9 at {sf_dir}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_knn_pq_recall_vs_brute_force(ray_session, sf_dir):
    import ray.data

    from pie_ray.functions.similarity import knn_brute_force, knn_pq

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = ds.count()
    q = np.asarray(ds.filter(expr="vec_id == 0").take(1)[0]["embedding"], dtype=np.float64)
    exact = {r["vec_id"] for r in knn_brute_force(ds, q, k=10).take_all()}
    rows = knn_pq(ds, q, n_rows=n_rows, k=10).take_all()
    assert len(rows) == 10
    recall = len({r["vec_id"] for r in rows} & exact) / 10
    assert recall >= 0.9, f"PQ recall {recall} < 0.9 at {sf_dir}"


def test_pq_codes_compression_and_determinism(ray_session):
    """The PQ code table is the persisted scan-side artifact: 16 uint8
    codes per 64-float vector (16x), byte-identical whatever the block
    layout of the encode."""
    import ray
    import ray.data

    from pie_ray.functions.similarity import pq_encode_batch, pq_train
    from pie_ray.util import list_to_matrix

    def codes_with_blocks(nblocks):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
            override_num_blocks=nblocks,
        )
        sample = np.concatenate(
            [
                list_to_matrix(b.column("embedding"))
                for b in ds.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        )
        books = pq_train(sample)
        out = (
            ds.map_batches(
                pq_encode_batch,
                fn_kwargs={"books_ref": ray.put(books)},
                batch_format="pyarrow",
            )
            .take_all()
        )
        return {r["vec_id"]: bytes(r["codes"]) for r in out}, books

    c1, books = codes_with_blocks(1)
    c2, _ = codes_with_blocks(4)
    assert c1 == c2
    assert all(len(v) == 16 for v in c1.values())  # 16 bytes vs 256-byte f32 vector
    m, K, dsub = books.shape
    assert (m, dsub) == (16, 4) and K <= 64


def test_media_resize_shape_and_math(ray_session):
    from pie_ray.functions.multimodal import DecodeBackend, q_media_resize, resize_nearest

    rows = q_media_resize("unused").take_all()
    assert rows, "image/video rows expected"
    for r in rows[:5]:
        assert r["width"] == 32 and r["height"] == 32
        assert len(r["rgb"]) == 32 * 32 * 3
    # resize math: exact nearest-neighbor gather vs manual loop
    img = DecodeBackend("fake").decode_image(b"x", 7, 5)
    out = resize_nearest(img, 4, 3)
    for y in range(3):
        for x in range(4):
            assert (out[y, x] == img[min(int(y * 5 / 3), 4), min(int(x * 7 / 4), 6)]).all()


def test_media_frames_expand_and_deterministic(ray_session):
    from pie_ray.functions.multimodal import q_media_frames

    rows = q_media_frames("unused").take_all()
    by_media: dict[str, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert by_media, "video rows expected"
    for mid, frames in by_media.items():
        assert len(frames) == 4, mid
        assert sorted(f["frame_idx"] for f in frames) == [0, 1, 2, 3]
        rgbs = {f["frame_idx"]: f["rgb"] for f in frames}
        assert len({bytes(v) for v in rgbs.values()}) == 4, "frames must differ"
    rows2 = q_media_frames("unused").take_all()
    key = lambda r: (r["media_id"], r["frame_idx"])
    assert sorted(map(key, rows)) == sorted(map(key, rows2))
    m1 = {key(r): bytes(r["rgb"]) for r in rows}
    m2 = {key(r): bytes(r["rgb"]) for r in rows2}
    assert m1 == m2, "frame bytes must be deterministic"


def test_pagerank_matches_reference(ray_session):
    """Distributed PageRank equals a dense numpy power iteration on a small
    weighted digraph (1e-9 tolerance: summation order differs)."""
    import pyarrow as pa
    import ray.data

    from pie_ray import schemas
    from pie_ray.stages.graph import pagerank

    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("d", "a", 5), ("d", "c", 5),  # e: dangling (dst only)
        ("b", "e", 1),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
            "pred": pa.array(["x"] * len(edges), pa.string()),
            "weight": pa.array([e[2] for e in edges], pa.int64()),
            "first_ts": pa.array([0] * len(edges), pa.timestamp("us")),
            "last_ts": pa.array([0] * len(edges), pa.timestamp("us")),
        },
        schema=schemas.EDGES,
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(ray.data.from_arrow(t).repartition(3), iters=12).to_pylist()
    }

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    outw = np.zeros(n)
    for s, d, w in edges:
        outw[idx[s]] += w
    for s, d, w in edges:
        M[idx[d], idx[s]] += w / outw[idx[s]]
    r = np.full(n, 1 / n)
    for _ in range(12):
        dangling = r[outw == 0].sum()
        r = 0.15 / n + 0.85 * (M @ r + dangling / n)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v


def test_quantile_sketch_accuracy(ray_session):
    """Histogram sketch within (max-min)/n_bins of exact quantiles."""
    import pyarrow.parquet as pq
    import ray.data

    from pie_ray.functions.relational import quantile_sketch

    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/lineitem.parquet", columns=["l_quantity"])
    est = quantile_sketch(ds, "l_quantity", [0.5, 0.9], n_bins=8192)
    v = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_quantity"]).column(
        "l_quantity"
    ).to_numpy()
    tol = (v.max() - v.min()) / 8192 + 1e-9
    assert abs(est[0.5] - np.percentile(v, 50)) <= tol
    assert abs(est[0.9] - np.percentile(v, 90)) <= tol


def test_grouped_quantile_sketch_accuracy(ray_session):
    """Per-group histogram sketch: every group's estimate within
    (max-min)/n_bins of that group's exact quantile (continuous values),
    and every group present exactly once."""
    import pyarrow.parquet as pq
    import ray.data

    from pie_ray.functions.relational import grouped_quantile_sketch

    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    got = {
        r["event_type"]: (r["q50"], r["q90"])
        for r in grouped_quantile_sketch(
            ds, "event_type", "value", [0.5, 0.9], n_bins=2048
        ).take_all()
    }
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"])
    import pandas as pd

    df = t.to_pandas()
    tol = (df["value"].max() - df["value"].min()) / 2048 + 1e-9
    assert set(got) == set(df["event_type"].unique())
    for et, grp in df.groupby("event_type"):
        v = grp["value"].to_numpy()
        assert abs(got[et][0] - np.percentile(v, 50)) <= tol, et
        assert abs(got[et][1] - np.percentile(v, 90)) <= tol, et


def test_hll_count_distinct_accuracy(ray_session):
    """HLL estimate within 3 standard errors (1.04/sqrt(m)) of the exact
    distinct count, global and per-group; merge is partition-independent."""
    import pyarrow.parquet as pq
    import ray.data

    from pie_ray.functions.relational import (
        approx_count_distinct,
        grouped_approx_count_distinct,
    )

    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/orders.parquet", columns=["o_orderpriority", "o_custkey"])
    t = pq.read_table(f"{sf}/orders.parquet", columns=["o_orderpriority", "o_custkey"])

    exact = len(set(t.column("o_custkey").to_pylist()))
    est = approx_count_distinct(ds, "o_custkey", p=14)
    assert abs(est - exact) <= 3 * 1.04 / (2**7) * exact + 2, (est, exact)

    df = t.to_pandas()
    exact_g = df.groupby("o_orderpriority")["o_custkey"].nunique().to_dict()
    got = {
        r["o_orderpriority"]: r["n_distinct_approx"]
        for r in grouped_approx_count_distinct(ds, "o_orderpriority", "o_custkey", p=12).take_all()
    }
    assert set(got) == set(exact_g)
    for k, ex in exact_g.items():
        assert abs(got[k] - ex) <= 3 * 1.04 / (2**6) * ex + 2, (k, got[k], ex)


def test_heavy_hitters_guarantee(ray_session):
    """Every word with exact count >= 2*total/k is in the output with its
    exact count (no false negatives from the approximate MG pass)."""
    import pyarrow.parquet as pq
    from collections import Counter

    from pie_ray.functions.textops import MG_SUMMARY_SIZE, q_heavy_hitters

    sf = "/root/testdata/sf0.01"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text").to_pylist()
    c = Counter()
    for s in texts:
        c.update((s or "").lower().split())
    total = sum(c.values())
    threshold = max(1, (2 * total) // MG_SUMMARY_SIZE)
    expect = {w: n for w, n in c.items() if n >= threshold}
    got_tbl = q_heavy_hitters(sf)
    got = dict(zip(got_tbl.column("word").to_pylist(), got_tbl.column("n").to_pylist()))
    assert got == expect and got


def test_tfidf_join_path_equivalent(ray_session):
    """Broadcast-idf and join-based TF-IDF scoring produce identical output."""
    from pie_ray.functions.textops import q_tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    key = lambda r: (r["doc_id"], r["rnk"])
    a = {key(r): (r["word"], r["tf"], r["df"]) for r in q_tfidf_top_terms(sf).take_all()}
    b = {
        key(r): (r["word"], r["tf"], r["df"])
        for r in q_tfidf_top_terms(sf, force_join=True).take_all()
    }
    assert a == b and a


def test_new_ops_handle_null_and_empty_text(ray_session):
    """Null / empty / whitespace-only text rows flow through the text and
    curation operators without errors and with sane values."""
    import pyarrow as pa
    import ray.data

    from pie_ray.functions.textops import quality_batch, token_count_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([None, "", "   ", "the quick brown fox"], pa.string()),
        }
    )
    q = quality_batch(t)
    assert q.column("quality_score").to_pylist()[0] is not None
    tc = token_count_batch(t)
    assert tc.column("n_tokens_ws").to_pylist() == [0, 0, 0, 4]

    from pie_ray.functions.dedup import _verified_pairs

    ds = ray.data.from_arrow(t)
    pairs = _verified_pairs(ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "text": b.column("text")}), batch_format="pyarrow"))
    assert pairs.count() >= 0  # runs clean on degenerate input


def test_cumsum_handles_negative_values(ray_session, tmp_path):
    """Running totals stay per-user correct when values are negative (the
    base propagation must use run indices, not maximum.accumulate over a
    cumsum that is no longer monotone)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pie_ray.functions.relational import q_cumsum_user_value

    t = pa.table(
        {
            "event_id": pa.array(list(range(6)), pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array(list(range(6)), pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([-5.0, 1.0, 10.0, -20.0, 3.0, 4.0], pa.float64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")
    got = {
        r["event_id"]: r["cum_value"] for r in q_cumsum_user_value(sf).take_all()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    expect = dict(
        con.execute(
            """SELECT event_id, SUM(CAST(round(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) / 100.0 FROM events"""
        ).fetchall()
    )
    assert got == expect


def test_pagerank_local_vs_distributed_and_deterministic(ray_session, monkeypatch):
    """The driver-local (deterministic) and distributed broadcast-rank paths
    agree within float tolerance, and the local path is bit-identical
    across different input partitionings."""
    import pyarrow as pa
    import ray.data

    from pie_ray import schemas
    from pie_ray.stages import graph as graph_mod

    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("d", "a", 5), ("d", "c", 5), ("b", "e", 1),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
            "pred": pa.array(["x"] * len(edges), pa.string()),
            "weight": pa.array([e[2] for e in edges], pa.int64()),
            "first_ts": pa.array([0] * len(edges), pa.timestamp("us")),
            "last_ts": pa.array([0] * len(edges), pa.timestamp("us")),
        },
        schema=schemas.EDGES,
    )

    def run(nparts):
        return {
            r["node"]: r["rank"]
            for r in graph_mod.pagerank(
                ray.data.from_arrow(t).repartition(nparts), iters=10
            ).to_pylist()
        }

    local_a, local_b = run(2), run(5)
    assert local_a == local_b, "local path must be partition-independent"

    monkeypatch.setattr(graph_mod, "PAGERANK_DRIVER_EDGES", 0)
    dist = run(3)
    assert set(dist) == set(local_a)
    for k in dist:
        assert abs(dist[k] - local_a[k]) < 1e-9

    # past-broadcast-range JOIN path (rank vector never leaves the object
    # store): same ranks, returned as a Dataset
    monkeypatch.setattr(graph_mod, "PAGERANK_MAX_NODES", 0)
    res = graph_mod.pagerank(ray.data.from_arrow(t).repartition(3), iters=10)
    joined = {r["node"]: r["rank"] for r in res.take_all()}
    assert set(joined) == set(local_a)
    for k in joined:
        assert abs(joined[k] - local_a[k]) < 1e-9


def test_text_ops_oracle_parity_on_non_ascii(ray_session, tmp_path):
    """text_stats (fused token_count + text_quality) matches its DuckDB
    oracle bit-exactly
    on adversarial text: accents (multi-byte chars), non-breaking spaces,
    tabs/newlines at the edges — the cases where byte-based ratios or
    Python's Unicode split() would silently diverge."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    texts = [
        "café naïve résumé visit",          # accents
        "a b c",                                          # NBSP is NOT a separator
        "\tleading tab and trailing newline\n",
        "  spaced   out  words  ",
        "punct!!! heavy??? ;;; :::",
        "你好 world",                                  # CJK
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    for name in ("text_stats",):
        eng = entrymod.queries()[name](sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        ora = con.execute(entrymod.oracle_sql()[name]).fetchdf().sort_values("doc_id").reset_index(drop=True)
        for c in sorted(eng.columns):
            a = eng[c].to_numpy()
            b = ora[c].to_numpy()
            assert (a == b).all(), f"{name}.{c}: {a} != {b}"


def test_repetition_stats_oracle_parity_multiline(ray_session, tmp_path):
    """repetition_stats matches its DuckDB oracle bit-exactly on crafted
    multi-line documents — the sf testdata is single-line, so duplicate-line
    channels (dup_line_frac / dup_line_char_frac) are only exercised here.
    Covers: trailing newline (trailing '' line), all-duplicate doc, empty
    text, null text, whitespace-only, single-word, and a dominant 2-gram."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    texts = [
        "spam line\nspam line\nspam line\nspam line",       # all-dup lines
        "a b\nc d\na b\n",                                   # trailing newline -> '' line
        "",                                                   # one '' line
        None,                                                 # null text
        "   \t  ",                                            # ws-only: lines yes, words no
        "word",                                               # single word: no 2-grams
        "go go go go stop",                                  # dominant 2-gram 'go go'
        "x\n\n\nx\ny",                                       # dup empty lines (0 chars)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")

    eng = (
        entrymod.queries()["repetition_stats"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = (
        con.execute(entrymod.oracle_sql()["repetition_stats"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(eng.columns) == sorted(ora.columns)
    assert len(eng) == len(ora) == len(texts)
    for c in sorted(eng.columns):
        a = eng[c].to_numpy(dtype="float64")
        b = ora[c].to_numpy(dtype="float64")
        assert (a == b).all(), f"{c}: {a} != {b}"
    # spot-check the crafted semantics
    by_id = eng.set_index("doc_id")
    assert by_id.loc[0, "dup_line_frac"] == 0.75          # 4 lines, 1 distinct
    assert by_id.loc[1, "n_lines"] == 4                    # trailing '' line counts
    assert by_id.loc[6, "top_2gram_frac"] == 0.75          # 'go go' 3 of 4 grams
    assert by_id.loc[7, "dup_line_char_frac"] == 1 / 3     # dup 'x' line: 1 of 3 chars


def test_decontaminate_matches_oracle_and_bruteforce(ray_session, tmp_path):
    """decontaminate flags exactly the docs sharing a word-8-gram with the
    benchmark set (doc_id % 13 == 0), counting DISTINCT contaminated grams,
    and agrees with both the SQL oracle and a Python brute force."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from pie_ray.functions.textops import DECON_BENCH_MOD, DECON_NGRAM, ws_tokens

    bench_a = "alpha bravo charlie delta echo foxtrot golf hotel"       # 8 words
    bench_b = "one two three four five six seven eight nine"            # 9 words
    texts = {
        0: bench_a + " extra tail words here",                          # benchmark
        13: bench_b,                                                     # benchmark
        1: "prefix " + bench_a,                                          # 1 gram from 0
        2: bench_a + " " + bench_b,                                      # grams from both
        3: "Alpha BRAVO charlie delta echo foxtrot golf hotel",          # case-folded hit
        4: "alpha bravo charlie delta echo foxtrot golf",                # 7 words: miss
        5: "totally unrelated text with no overlap at all whatsoever",
        6: "",                                                            # empty
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids], pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")

    eng = (
        entrymod.queries()["decontaminate"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = (
        con.execute(entrymod.oracle_sql()["decontaminate"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(eng["doc_id"], eng["n_overlap"]))
    want = dict(zip(ora["doc_id"], ora["n_overlap"]))
    assert got == want

    # brute force in Python
    def grams(s):
        w = ws_tokens(s.lower())
        return {
            " ".join(w[i : i + DECON_NGRAM])
            for i in range(max(len(w) - DECON_NGRAM + 1, 0))
        }

    bench = set().union(*(grams(texts[i]) for i in ids if i % DECON_BENCH_MOD == 0))
    brute = {
        i: len(grams(texts[i]) & bench)
        for i in ids
        if i % DECON_BENCH_MOD != 0 and grams(texts[i]) & bench
    }
    assert got == brute
    assert set(got) == {1, 2, 3}
    assert got[2] >= 2  # hits grams from BOTH benchmark docs


def test_knn_ann_merged_entry_covers_all_variants(ray_session):
    """The merged knn_ann driver entry unions the lsh/ivf/pq variants with
    an op tag; each contributes exactly k rows of (vec_id, sim, op)."""
    from pie_ray.functions.similarity import q_knn_ann

    df = q_knn_ann("/root/testdata/sf0.001").to_pandas()
    assert sorted(df.columns) == ["op", "sim", "vec_id"]
    counts = df.groupby("op").size().to_dict()
    assert set(counts) == {"lsh", "ivf", "pq"}
    assert all(v == 10 for v in counts.values()), counts
