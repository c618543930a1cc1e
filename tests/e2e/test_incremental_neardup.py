"""Incremental ingest with the persisted near-dup content index
(near_dup=True): content that near-dups the corpus — or a kept same-crawl
twin — drops BEFORE NER, the index maintains itself per increment with the
link-delta recovery discipline, and GDPR erasure scrubs the fingerprints."""

import os

import pyarrow as pa
import pytest

from pie_ray.schemas import PAGES
from pie_ray.util import stable_hash64

VOCAB = [f"word{i:03d}" for i in range(200)]


def _text(seed: str, n: int = 60) -> str:
    from pie_ray.sources import gazetteers as gz

    # a real gazetteer person + their email so pages emit triples through
    # the actual NER + pattern channels (word soup alone emits nothing)
    p = gz.person_pool()[stable_hash64(f"ndp:{seed}") % 500]
    words = [VOCAB[stable_hash64(f"nd:{seed}:{i}") % len(VOCAB)] for i in range(n)]
    return f"{p['aliases'][0]} wrote " + " ".join(words) + f" contact {p['email']} now"


def _near(text: str) -> str:
    return text + " extraword"


def _pages(rows):
    """rows: [(url, text)] -> T0 pages Dataset (html wraps the text; the
    frozen stripper recovers it, so screen similarity == text similarity)."""
    import ray

    urls = [u for u, _ in rows]
    texts = [t for _, t in rows]
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(
                    [1_700_000_000_000_000 + stable_hash64(u) % 1000 for u in urls],
                    pa.timestamp("us"),
                ),
                "html": pa.array(
                    [f"<html><body><p>{t}</p></body></html>".encode() for t in texts],
                    pa.binary(),
                ),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            },
            schema=PAGES,
        )
    )


CORPUS = [(f"https://c{i}.test/p", _text(f"corpus{i}")) for i in range(8)]
FRESH = [(f"https://n{i}.test/p", _text(f"fresh{i}")) for i in range(3)]
SHARED = _text("shared-twin")
CRAWL = FRESH + [
    ("https://dup.test/of-c2", _near(CORPUS[2][1])),  # near-dups the corpus
    ("https://twin-b.test/p", SHARED),                # intra pair: min url
    ("https://twin-a.test/p", SHARED),                #   twin-a.test kept
]
KEPT_CRAWL = FRESH + [("https://twin-a.test/p", SHARED)]


def _triples(path):
    import ray.data

    return {
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in ray.data.read_parquet(path).take_all()
    }


@pytest.fixture(scope="module")
def nd_store(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import incremental_build, incremental_update

    root = str(tmp_path_factory.mktemp("kg_nd"))
    built = incremental_build(_pages(CORPUS), root, near_dup=True)
    upd = incremental_update(root, _pages(CRAWL))
    return root, built, upd


def test_screen_drops_neardups_before_ner(nd_store, tmp_path_factory):
    from pie_ray.pipelines.kg import run_pipeline

    root, built, upd = nd_store
    assert built["n_new_pages"] == len(CORPUS)
    assert upd["n_new_pages"] == len(KEPT_CRAWL)
    assert upd["n_neardup_dropped"] == 2
    assert upd["n_neardup_vs_corpus"] == 1   # dup.test/of-c2
    assert upd["n_neardup_intra"] == 1       # twin-b.test loses to twin-a
    assert upd["nd_indexed_docs"] == len(KEPT_CRAWL)
    # the store equals a fresh build over corpus + kept crawl only
    fresh = str(tmp_path_factory.mktemp("kg_nd_fresh"))
    run_pipeline(_pages(CORPUS + KEPT_CRAWL), fresh)
    assert _triples(f"{root}/triples") == _triples(f"{fresh}/triples")


def test_dropped_pages_rescreen_not_reenter(nd_store):
    from pie_ray.pipelines.incremental import incremental_update

    root, _, _ = nd_store
    # dropped urls never ledgered -> the same crawl re-screens and
    # re-drops them; nothing new lands and the caches stay put
    res = incremental_update(root, _pages(CRAWL))
    assert res["n_new_pages"] == 0 and res["rebuilt"] is False
    assert res["n_neardup_dropped"] == 2


def test_crash_window_slot_recovery(ray_session, tmp_path_factory):
    """Reproduce the real crash window — update killed AFTER its ledger
    write, BEFORE its index append (exactly the durable state that ordering
    allows) — then replay the same crawl: the slot's index delta rewrites
    from ledger ∩ crawl and later screens see the recovered content."""
    from pie_ray.functions.dedup_index import _read_meta as ix_meta
    from pie_ray.pipelines import incremental as inc
    from pie_ray.pipelines.kg import KgConfig

    cfg = KgConfig()
    root = str(tmp_path_factory.mktemp("kg_nd_crash"))
    inc.incremental_build(_pages(CORPUS), root, near_dup=True)
    meta = inc._read_meta(root)
    kept, _ = inc._screen_neardup(
        root, inc._truly_new(_pages(CRAWL), root, meta, 1e-3), cfg
    )
    inc._write_increment(root, 1, kept, cfg)  # ...and "crash" right here
    assert ix_meta(os.path.join(root, "lshix"))["n_deltas"] == 1  # no delta 1
    res = inc.incremental_update(root, _pages(CRAWL))
    assert res["n_new_pages"] == 0 and res["rebuilt"] is True
    assert res["nd_indexed_docs"] == len(KEPT_CRAWL)
    assert res["nd_ledgered_urls"] == res["nd_found_urls"] == len(KEPT_CRAWL)
    m2 = ix_meta(os.path.join(root, "lshix"))
    assert m2["n_docs"] == len(CORPUS) + len(KEPT_CRAWL)
    # recovered index suppresses near-dups of the recovered window
    res2 = inc.incremental_update(
        root, _pages([("https://later.test/p", _near(SHARED))])
    )
    assert res2["n_new_pages"] == 0 and res2["n_neardup_dropped"] == 1


def test_forget_scrubs_index_and_unsuppresses(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import (
        forget_urls,
        incremental_build,
        incremental_update,
    )

    root = str(tmp_path_factory.mktemp("kg_nd_forget"))
    incremental_build(_pages(CORPUS), root, near_dup=True)
    target_url, target_text = CORPUS[4]
    rep = forget_urls(root, [target_url])
    # bands (16/doc) + shingles (1/doc)
    assert rep["neardup_index_rows_dropped"] == 17
    # a near-dup of the erased content is no longer suppressed
    res = incremental_update(
        root, _pages([("https://re.test/p", _near(target_text))])
    )
    assert res["n_new_pages"] == 1 and res["n_neardup_dropped"] == 0
    # but near-dups of surviving corpus content still drop
    res2 = incremental_update(
        root, _pages([("https://re2.test/p", _near(CORPUS[5][1]))])
    )
    assert res2["n_new_pages"] == 0 and res2["n_neardup_dropped"] == 1


def test_compaction_preserves_screen_and_sparse_slots(ray_session, tmp_path_factory):
    """compact_deltas collapses the index into slot 0; later ingests append
    SPARSE slots (slot = n_updates keeps growing) and the screen still sees
    every fingerprint — pre-compaction content keeps suppressing dups."""
    from pie_ray.functions.dedup_index import _read_meta as ix_meta
    from pie_ray.pipelines.incremental import (
        compact_deltas,
        incremental_build,
        incremental_update,
    )

    root = str(tmp_path_factory.mktemp("kg_nd_compact"))
    incremental_build(_pages(CORPUS), root, near_dup=True)
    incremental_update(root, _pages(CRAWL))
    stats = compact_deltas(root)
    assert stats["lshix_bands_deltas_before"] == 2
    m = ix_meta(os.path.join(root, "lshix"))
    assert m["n_deltas"] == 1 and m["n_docs"] == len(CORPUS) + len(KEPT_CRAWL)
    # near-dups of BOTH pre-compaction windows still drop
    res = incremental_update(
        root,
        _pages(
            [
                ("https://post1.test/p", _near(CORPUS[3][1])),
                ("https://post2.test/p", _near(SHARED)),
                ("https://post3.test/p", _text("post-compact-fresh")),
            ]
        ),
    )
    assert res["n_new_pages"] == 1 and res["n_neardup_dropped"] == 2
    # the fresh page landed in a sparse slot beyond the compacted history
    m2 = ix_meta(os.path.join(root, "lshix"))
    assert m2["n_deltas"] > 1 and m2["n_docs"] == len(CORPUS) + len(KEPT_CRAWL) + 1
    # and is itself screened on the next pass
    res2 = incremental_update(
        root, _pages([("https://post4.test/p", _near(_text("post-compact-fresh")))])
    )
    assert res2["n_new_pages"] == 0 and res2["n_neardup_dropped"] == 1


def test_plain_store_unaffected(ray_session, tmp_path_factory):
    """near_dup defaults off: no index dir, update reports unchanged."""
    from pie_ray.pipelines.incremental import incremental_build, incremental_update

    root = str(tmp_path_factory.mktemp("kg_plain"))
    incremental_build(_pages(CORPUS), root)
    assert not os.path.isdir(os.path.join(root, "lshix"))
    res = incremental_update(root, _pages(CORPUS))
    assert res == {"n_new_pages": 0, "rebuilt": False}
