"""NB-style quality classifier: exact integer brute-force parity, planted
separable corpus direction, broadcast == join path, OOV-drop semantics and
partition independence (the engine contract: results are a pure function of
the data)."""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pie_ray.functions.quality_clf import (
    WEIGHT_SCALE,
    q_quality_classifier,
    score_quality,
    train_quality_classifier,
)
from pie_ray.functions.textops import ws_tokens

# even source suffix = positive label proxy; "good*" words dominate the
# positive docs and "bad*" the negative ones, with shared filler
PLANTED = [
    (0, "good clean prose with good structure", "src0"),
    (1, "good good text shared filler", "src2"),
    (2, "bad spam spam shared filler", "src1"),
    (3, "bad bad bad junk", "src3"),
    (4, "good text bad text shared", "src4"),
    (5, "", "src1"),          # no tokens -> omitted
    (6, None, "src0"),        # null -> omitted
    (7, "   ", "src3"),       # whitespace-only -> omitted
]


def _write(tmp_path, rows) -> str:
    p = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        p,
    )
    return str(tmp_path)


def brute(rows):
    """Pure-python integer reference of train+score (same tokenization)."""
    toks = {
        r[0]: ws_tokens((r[1] or "").lower())
        for r in rows
        if ws_tokens((r[1] or "").lower())
    }
    pos_label = {r[0]: int(r[2][3:]) % 2 == 0 for r in rows}
    c_pos: Counter = Counter()
    c_tot: Counter = Counter()
    for did, ws in toks.items():
        for w in ws:
            c_tot[w] += 1
            if pos_label[did]:
                c_pos[w] += 1
    wt = {w: (c_pos[w] + 1) * WEIGHT_SCALE // (c_tot[w] + 2) for w in c_tot}
    out = {}
    for did, ws in toks.items():
        score = sum(wt[w] for w in ws)
        n = len(ws)
        out[did] = (score, n, "pos" if 2 * score > n * WEIGHT_SCALE else "neg")
    return out


def _rows(ds) -> dict:
    return {
        r["doc_id"]: (r["score_scaled"], r["n_tokens"], r["predicted"])
        for r in ds.take_all()
    }


def test_matches_brute_reference(ray_session, tmp_path):
    sf = _write(tmp_path, PLANTED)
    got = _rows(q_quality_classifier(sf))
    assert got == brute(PLANTED)


def test_direction_on_planted_corpus(ray_session, tmp_path):
    sf = _write(tmp_path, PLANTED)
    got = _rows(q_quality_classifier(sf))
    assert got[1][2] == "pos"   # good-heavy doc
    assert got[3][2] == "neg"   # bad-heavy doc
    assert 5 not in got and 6 not in got and 7 not in got  # token-less omitted


def test_join_equals_broadcast(ray_session, tmp_path):
    sf = _write(tmp_path, PLANTED)
    assert _rows(q_quality_classifier(sf, weights_as="join")) == _rows(
        q_quality_classifier(sf, weights_as="broadcast")
    )


def test_partition_independence(ray_session, tmp_path):
    sf = _write(tmp_path, PLANTED)
    base = None
    for blocks in (1, 3, 7):
        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet",
            columns=["doc_id", "text", "source"],
            override_num_blocks=blocks,
        )
        w = train_quality_classifier(docs)
        got = _rows(score_quality(docs, w))
        if base is None:
            base = got
        assert got == base


def test_oov_tokens_drop_on_both_paths(ray_session, tmp_path):
    sf = _write(tmp_path, PLANTED)
    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    weights = train_quality_classifier(docs)
    unseen = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": pa.array(
                    ["zzz qqq never seen words", "good shared zzz"], pa.string()
                ),
                "source": pa.array(["src0", "src1"], pa.string()),
            }
        )
    )
    for mode in ("broadcast", "join"):
        got = _rows(score_quality(unseen, weights, weights_as=mode))
        # doc 100: only OOV except none -> 0 in-vocab tokens -> omitted...
        # "never" / "seen" / "words" are OOV; every token of doc 100 is OOV
        assert 100 not in got
        assert got[101][1] == 2  # 'good' and 'shared' are in-vocab, zzz drops
