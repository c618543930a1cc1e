"""Curation pipeline v2: stage accounting, each operator's visible effect
on a planted corpus, partition independence, and a real-table run."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pie_ray.pipelines.curation import curate_corpus, q_curate_corpus

BOILER = "subscribe to our newsletter today"                  # own line, 8x
PASSAGE = "one two three four five six seven eight nine ten"  # 10 words, 8x

# Normal docs: line 1 mixes corpus-common words with per-doc unique tokens
# every 3 words (so no cross-doc 8-gram forms there), line 2 is the exact
# duplicated boilerplate line, line 3 embeds the shared passage between
# per-doc tokens (line differs -> survives line dedup; the inner 8-grams
# are shared -> span dedup cuts exactly the passage).
_W = "data systems pipeline news crawl tokens quality filters".split()
NORMAL = [
    " ".join(
        [_W[0], _W[1], f"u{i}a", _W[2], _W[3], f"u{i}b",
         _W[4], _W[5], f"u{i}c", _W[6], _W[7], f"u{i}d"]
    )
    + f"\n{BOILER}\npre{i} {PASSAGE} post{i}"
    for i in range(8)
]
PLANTED = NORMAL + [
    None,                                   # quarantined: null
    "   ",                                  # quarantined: blank
    "zq wv xj qk zz vv jj kk zq wv xj qk",  # gibberish: high bits tail
]


def _write(tmp_path, texts) -> str:
    p = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    return p


def _run(path, blocks):
    ds = ray.data.read_parquet(path, override_num_blocks=blocks)
    curated, report = curate_corpus(
        ds, bits_lo_q=0.02, bits_hi_q=0.85, min_tokens=5, lm_min_count=2
    )
    df = curated.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df, report


def test_stage_accounting_and_effects(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    df, report = _run(path, blocks=3)
    assert report["rows_in"] == len(PLANTED)
    assert report["rows_quarantined"] == 2          # null + blank
    assert report["rows_after_band"] < report["rows_in"] - 2  # a tail fell
    assert report["chars_dropped_lines"] > 0        # BOILER line removed
    assert report["chars_dropped_spans"] > 0        # PASSAGE removed
    assert report["rows_out"] == len(df)
    # the surviving docs: no boilerplate line, no duplicated passage,
    # own content intact
    assert len(df) == 8
    for _, row in df.iterrows():
        assert BOILER not in row["text"]
        assert PASSAGE not in row["text"]
        assert f"u{row['doc_id']}a" in row["text"]   # own words kept verbatim
        assert f"pre{row['doc_id']}" in row["text"]  # passage context kept
        assert row["n_tokens"] >= 5
    # the gibberish doc (id 10) fell to the band cut
    assert 10 not in set(df["doc_id"])


def test_partition_independence(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    a, ra = _run(path, blocks=1)
    b, rb = _run(path, blocks=4)
    pd.testing.assert_frame_equal(a, b)
    assert ra == rb


def test_driver_table_run(ray_session):
    df = q_curate_corpus("/root/testdata/sf0.001").to_pandas()
    assert 0 < len(df) <= 500
    assert set(df.columns) == {"doc_id", "text", "n_tokens"}
    assert (df["n_tokens"] >= 10).all()


def _emb_table(doc_ids, dup_groups):
    """Deterministic embeddings: each doc gets a distinct axis vector;
    docs listed together in a dup_group share a near-identical vector."""
    import numpy as np

    dim = 24
    vecs = {}
    for j, i in enumerate(doc_ids):
        v = np.zeros(dim)
        v[j % (dim - 1)] = 1.0
        vecs[i] = v
    for group in dup_groups:
        base = np.zeros(dim)
        base[dim - 1] = 1.0
        for off, i in enumerate(group):
            v = base.copy()
            v[0] = 0.02 * off  # tiny angle: cosine >> 0.92
            vecs[i] = v / np.linalg.norm(v)
    return pa.table(
        {
            "vec_id": pa.array(list(vecs), pa.int64()),
            "embedding": pa.array(
                [vecs[i].astype("float32").tolist() for i in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )


def test_v3_semdedup_and_chunking(ray_session, tmp_path):
    from pie_ray.pipelines.curation import curate_corpus_v3

    path = _write(tmp_path, PLANTED)
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    # docs 0..7 survive v2; plant 2,5 as semantic near-dups of each other
    emb = ray.data.from_arrow(_emb_table(range(8), [[2, 5]]))
    chunks, report = curate_corpus_v3(
        docs, emb, chunk_chars=60, chunk_stride=50,
        bits_lo_q=0.02, bits_hi_q=0.85, min_tokens=5, lm_min_count=2,
    )
    got = chunks.to_pandas()
    surviving = set(got.doc_id)
    # exactly one of {2, 5} survives the semantic layer
    assert len({2, 5} & surviving) == 1
    assert report["rows_semdedup_dropped"] == 1
    assert report["rows_after_semdedup"] == report["rows_out"] - 1
    assert report["chunks_out"] == len(got)
    # chunk offsets tile each doc at the stride
    for _, grp in got.groupby("doc_id"):
        offs = sorted(grp.off)
        assert offs[0] == 0
        assert all(b - a == 50 for a, b in zip(offs, offs[1:]))


def test_v3_docs_without_embeddings_pass_through(ray_session, tmp_path):
    from pie_ray.pipelines.curation import curate_corpus_v3

    path = _write(tmp_path, PLANTED)
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    emb = ray.data.from_arrow(_emb_table([0, 1], []))  # only two docs covered
    chunks, report = curate_corpus_v3(
        docs, emb, bits_lo_q=0.02, bits_hi_q=0.85, min_tokens=5, lm_min_count=2
    )
    assert report["rows_semdedup_dropped"] == 0
    # every v2 survivor chunks through, embedded or not
    assert set(chunks.to_pandas().doc_id) == set(range(8))


def test_v3_duplicate_embedding_rows_keep_doc(ray_session, tmp_path):
    from pie_ray.pipelines.curation import curate_corpus_v3

    path = _write(tmp_path, PLANTED)
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    base = _emb_table(range(8), [])
    dup = base.take(pa.array([3]))  # a second identical row for one vec_id
    emb = ray.data.from_arrow(pa.concat_tables([base, dup]))
    dup_id = int(dup.column("vec_id")[0].as_py())
    chunks, report = curate_corpus_v3(
        docs, emb, bits_lo_q=0.02, bits_hi_q=0.85, min_tokens=5, lm_min_count=2
    )
    # the duplicated-embedding doc keeps its kept copy and must survive
    assert dup_id in set(chunks.to_pandas().doc_id)
    assert report["rows_semdedup_dropped"] == 0


def test_curate_web_blocklist_stage(ray_session):
    """Stage 3b: pages whose extracted text carries a planted banned word
    are cut with exact accounting; with no blocklist the report omits the
    stage entirely."""
    import pyarrow as pa

    from pie_ray.pipelines.curation import curate_web_v1
    from pie_ray.sources.linksynth import synth_link_pages

    def plant(t: pa.Table) -> pa.Table:
        # deterministic by PAGE INDEX (not batch position): every 5th
        # page gains a paragraph with the banned token
        htmls = []
        for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            i = int(u.rsplit("/p", 1)[1])
            if i % 5 == 0:
                h = h.replace(b"</body>", b"<p>Naughtyword appears.</p></body>")
            htmls.append(h)
        idx = t.schema.get_field_index("html")
        return t.set_column(idx, "html", pa.array(htmls, pa.binary()))

    pages = synth_link_pages(300).map_batches(plant, batch_format="pyarrow")
    _docs_all, rep_all = curate_web_v1(pages)
    assert "blocklist" not in rep_all

    docs_b, rep_b = curate_web_v1(pages, blocklist=["naughtyword"])
    rb = rep_b["blocklist"]
    assert rb["n_pages"] - rb["n_kept"] == (300 + 4) // 5  # pages 0,5,...,295
    assert rb["n_words"] == 1
    assert all("naughtyword" not in r["text"].lower() for r in docs_b.take_all())
