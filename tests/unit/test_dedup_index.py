"""Persisted MinHash-LSH dedup index (functions/dedup_index.py):
brute-planted screen parity, recrawl idempotence, append, crash safety,
param drift, partition independence, driver==distributed verify."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pie_ray.functions import dedup_index as dx
from pie_ray.util import stable_hash64

VOCAB = [f"w{i:03d}" for i in range(220)]


def _text(seed: str, n: int = 60) -> str:
    """Deterministic n-word text; distinct seeds share ~no 5-shingles."""
    words = [VOCAB[stable_hash64(f"{seed}:{i}") % len(VOCAB)] for i in range(n)]
    return " ".join(words)


def _near(text: str) -> str:
    """One appended word: Jaccard ≈ (n-4)/(n-3) on 5-shingles — far above
    DOC_TAU and band-certain for 60-word texts (deterministic hashes)."""
    return text + " zz999"


def _ds(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([k for k, _ in rows], pa.string()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


@pytest.fixture()
def corpus_rows():
    return [(f"a{i}", _text(f"corpus{i}")) for i in range(10)]


@pytest.fixture()
def crawl_rows(corpus_rows):
    u = _text("intra-shared")
    return [
        ("b_dup0", corpus_rows[0][1]),        # exact dup of index doc a0
        ("b_near3", _near(corpus_rows[3][1])),  # near-dup of a3
        ("b_fresh1", _text("fresh1")),
        ("b_fresh2", _text("fresh2")),
        ("b_intra1", u),                      # intra pair: keep min key
        ("b_intra2", u),
        ("b_drag", _near(corpus_rows[0][1])),  # near b_dup0 -> cluster
        # touches the index via b_dup0 -> whole cluster drops
    ]


def _build(tmp_path, corpus_rows):
    root = str(tmp_path / "ix")
    rep = dx.lsh_index_build(_ds(corpus_rows), root)
    assert rep == {"delta": 0, "n_docs": len(corpus_rows)}
    return root


def test_screen_planted_parity(ray_session, tmp_path, corpus_rows, crawl_rows):
    root = _build(tmp_path, corpus_rows)
    kept, rep = dx.lsh_index_screen(root, _ds(crawl_rows))
    kept_keys = sorted(r["key"] for r in kept.take_all())
    assert kept_keys == ["b_fresh1", "b_fresh2", "b_intra1"]
    assert rep["n_new"] == 7
    # b_dup0 + b_near3, and b_drag is ALSO a direct near-dup of a0 (one
    # word off T0) — the cluster-drag rule is exercised separately below
    assert rep["n_dup_vs_index"] == 3
    assert rep["n_dup_intra"] == 1     # b_intra2 (non-min member)
    assert rep["n_kept"] == 3
    assert rep["n_index_docs"] == 10


def test_cluster_drag_drops_via_crawl_only_link(ray_session, tmp_path):
    """q is NOT a near-dup of any index doc (Jaccard 46/66 ≈ 0.697 < tau)
    but near-dups crawl doc p (51/61 ≈ 0.836), which near-dups index doc I
    — union clustering drops the whole {p, q} cluster."""
    # seed verified offline: p-I and q-p band collisions BOTH occur under
    # the engine's fixed hashes (deterministic, not probabilistic)
    w = [VOCAB[stable_hash64(f"drag2:{i}") % len(VOCAB)] for i in range(60)]
    n = [f"nn{i}" for i in range(5)]
    m = [f"mm{i}" for i in range(5)]
    I = " ".join(w)
    p = " ".join(w[:55] + n)
    q = " ".join(w[:50] + n + m)
    root = str(tmp_path / "ix")
    dx.lsh_index_build(_ds([("I", I)]), root)
    kept, rep = dx.lsh_index_screen(root, _ds([("p", p), ("q", q)]))
    assert kept.take_all() == []
    assert rep["n_dup_vs_index"] == 1  # p directly
    assert rep["n_dup_intra"] == 1     # q only through the p link
    assert rep["n_kept"] == 0


def test_screen_recrawl_drops_everything(ray_session, tmp_path, corpus_rows):
    root = _build(tmp_path, corpus_rows)
    kept, rep = dx.lsh_index_screen(root, _ds(corpus_rows))
    assert kept.take_all() == []
    assert rep["n_dup_vs_index"] == len(corpus_rows)
    assert rep["n_kept"] == 0


def test_screen_all_fresh_no_collisions(ray_session, tmp_path, corpus_rows):
    """Zero band collisions exercise the 0-row-join guard."""
    root = _build(tmp_path, corpus_rows)
    fresh = [(f"f{i}", _text(f"totally-new{i}")) for i in range(5)]
    kept, rep = dx.lsh_index_screen(root, _ds(fresh))
    assert sorted(r["key"] for r in kept.take_all()) == sorted(k for k, _ in fresh)
    assert rep["n_dup_vs_index"] == 0 and rep["n_kept"] == 5


def test_append_then_rescreen_idempotent(ray_session, tmp_path, corpus_rows, crawl_rows):
    root = _build(tmp_path, corpus_rows)
    kept, _ = dx.lsh_index_screen(root, _ds(crawl_rows))
    kept_rows = [(r["key"], r["text"]) for r in kept.take_all()]
    rep = dx.lsh_index_append(root, _ds(kept_rows))
    assert rep == {"delta": 1, "n_docs": 3}
    # the same crawl screens to nothing now: dups of index (old + newly
    # appended) cover every doc
    kept2, rep2 = dx.lsh_index_screen(root, _ds(crawl_rows))
    assert kept2.take_all() == []
    assert rep2["n_kept"] == 0
    assert rep2["n_index_docs"] == 13


def test_uncommitted_delta_is_invisible_and_replay_heals(
    ray_session, tmp_path, corpus_rows
):
    """A delta dir without the meta bump (crash between write and commit)
    is ignored by screens; the next append clears and reuses the slot."""
    root = _build(tmp_path, corpus_rows)
    orphan_doc = [("ghost", _text("ghost-doc"))]
    tbl = pa.table(
        {
            "key": pa.array(["ghost"], pa.string()),
            "text": pa.array([orphan_doc[0][1]], pa.string()),
        }
    )
    for sub, fn in (("bands", dx.bands_batch), ("shingles", dx.shingles_batch)):
        d = os.path.join(root, sub, "delta_000001")
        os.makedirs(d)
        pq.write_table(fn(tbl), os.path.join(d, "orphan.parquet"))
    # the ghost doc must NOT screen out an identical new doc
    kept, rep = dx.lsh_index_screen(root, _ds(orphan_doc))
    assert [r["key"] for r in kept.take_all()] == ["ghost"]
    assert rep["n_index_docs"] == 10
    # replayed append lands in slot 1, clearing the orphan files
    rep2 = dx.lsh_index_append(root, _ds([("real", _text("real-doc"))]))
    assert rep2 == {"delta": 1, "n_docs": 1}
    files = os.listdir(os.path.join(root, "bands", "delta_000001"))
    assert "orphan.parquet" not in files
    kept3, _ = dx.lsh_index_screen(root, _ds([("real2", _text("real-doc"))]))
    assert kept3.take_all() == []  # now visible


def test_param_drift_raises(ray_session, tmp_path, corpus_rows):
    root = _build(tmp_path, corpus_rows)
    meta_p = os.path.join(root, dx.META_NAME)
    meta = json.load(open(meta_p))
    meta["bands"] = 99
    json.dump(meta, open(meta_p, "w"))
    with pytest.raises(ValueError, match="rebuild"):
        dx.lsh_index_screen(root, _ds(corpus_rows))
    with pytest.raises(ValueError, match="rebuild"):
        dx.lsh_index_append(root, _ds(corpus_rows))
    with pytest.raises(ValueError, match="already holds"):
        dx.lsh_index_build(_ds(corpus_rows), root)


def test_partition_independence(ray_session, tmp_path, corpus_rows, crawl_rows):
    root = _build(tmp_path, corpus_rows)
    one = dx.lsh_index_screen(root, _ds(crawl_rows).repartition(1))
    many = dx.lsh_index_screen(root, _ds(crawl_rows).repartition(5))
    assert sorted(r["key"] for r in one[0].take_all()) == sorted(
        r["key"] for r in many[0].take_all()
    )
    assert one[1] == many[1]


def test_distributed_verify_matches_driver(
    ray_session, tmp_path, corpus_rows, crawl_rows
):
    root = _build(tmp_path, corpus_rows)
    drv = dx.lsh_index_screen(root, _ds(crawl_rows))
    dist = dx.lsh_index_screen(root, _ds(crawl_rows), force_distributed=True)
    assert sorted(r["key"] for r in drv[0].take_all()) == sorted(
        r["key"] for r in dist[0].take_all()
    )
    assert drv[1] == dist[1]


def test_kept_ds_preserves_all_columns(ray_session, tmp_path, corpus_rows):
    import ray

    root = _build(tmp_path, corpus_rows)
    crawl = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(["x1", "a0_re"], pa.string()),
                "text": pa.array([_text("colkeep"), corpus_rows[0][1]], pa.string()),
                "extra": pa.array([7, 8], pa.int64()),
            }
        )
    )
    kept, _ = dx.lsh_index_screen(root, crawl)
    rows = kept.take_all()
    assert [r["key"] for r in rows] == ["x1"] and rows[0]["extra"] == 7


def test_entry_smoke_sf0001(ray_session):
    out = dx.q_dedup_incremental("/root/testdata/sf0.001")
    rows = {r["key"]: r["kept"] for r in out.take_all()}
    assert len(rows) == 153  # 150 crawl docs + 3 exact recrawls
    for k in ("0", "1", "2"):  # recrawled corpus docs always drop
        assert rows[k] is False
    assert sum(rows.values()) >= 1  # and fresh docs survive
    again = {
        r["key"]: r["kept"]
        for r in dx.q_dedup_incremental("/root/testdata/sf0.001").take_all()
    }
    assert rows == again
