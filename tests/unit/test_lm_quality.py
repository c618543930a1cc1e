"""Corpus self-perplexity LM filter: brute-force reference parity (same
tokenization class and float op order), OOV smoothing, empty/null docs,
partition independence, and the quality-signal direction (template docs
score below gibberish)."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pie_ray.functions.lm_quality import (
    OOV_ALPHA,
    score_perplexity,
    unigram_model,
)
from pie_ray.functions.textops import ws_tokens

PLANTED = [
    "the cat sat on the mat",
    "the dog sat on the mat",
    "the bird sat on the mat",
    "zxqv jkwp mmtr qqzz unique gibberish tokens",   # mostly OOV at min_count=2
    "",                                              # empty
    None,                                            # null
    "THE CAT SAT ON THE MAT",                        # lowercased -> template
    "the the the the",                               # max-frequency words
]


def brute_scores(texts, min_count):
    from collections import Counter

    toks = [ws_tokens((s or "").lower()) for s in texts]
    counts = Counter(w for t in toks for w in t)
    total = sum(counts.values())
    vocab = {w: c for w, c in counts.items() if c >= min_count}
    out = []
    for t in toks:
        if not t:
            out.append((0, 0.0))
            continue
        s = 0.0
        for w in t:  # token order, like the engine's reduceat
            c = vocab.get(w)
            # same float formulation as the engine: log(c) - log(total)
            num = np.log(np.float64(c)) if c is not None else np.log(np.float64(OOV_ALPHA))
            s += num - np.log(np.float64(total))
        out.append((len(t), -s / len(t) / np.log(2.0)))
    return out


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


def _run(path, blocks, min_count=2) -> pd.DataFrame:
    ds = ray.data.read_parquet(path, override_num_blocks=blocks)
    return (
        score_perplexity(ds, min_count=min_count)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_matches_brute_force(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    got = _run(path, blocks=3)
    ref = brute_scores(PLANTED, min_count=2)
    assert list(got["n_tokens"]) == [r[0] for r in ref]
    np.testing.assert_array_equal(
        got["bits_per_word"].to_numpy(), np.array([r[1] for r in ref])
    )
    # direction: template sentences score LOW, gibberish HIGH
    bits = dict(zip(got["doc_id"], got["bits_per_word"]))
    assert bits[3] > bits[0] > 0
    assert bits[7] < bits[0]  # all-max-frequency doc is the most "expected"
    # empty and null docs: zero tokens, zero bits, still present
    assert bits[4] == 0.0 and bits[5] == 0.0
    assert got.loc[4, "n_tokens"] == 0 and got.loc[5, "n_tokens"] == 0


def test_partition_independence(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    a = _run(path, blocks=1)
    b = _run(path, blocks=4)
    pd.testing.assert_frame_equal(a, b)  # bit-identical, not approx


def test_unigram_model_totals(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    ds = ray.data.read_parquet(path)
    vh, vlp, total, oov = unigram_model(ds, min_count=2)
    toks = [w for s in PLANTED for w in ws_tokens((s or "").lower())]
    assert total == len(toks)  # rare words still count toward the total
    assert len(vh) == len(set(w for w in toks if toks.count(w) >= 2))
    assert np.all(np.diff(vh.astype(np.uint64)) > 0)  # sorted unique
    assert math.isclose(oov, np.log(OOV_ALPHA) - np.log(total))


def test_driver_table_runs(ray_session):
    from pie_ray.functions.lm_quality import q_lm_perplexity

    df = q_lm_perplexity("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert (df["bits_per_word"] > 0).all()  # synthetic docs are non-empty
