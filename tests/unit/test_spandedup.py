"""Exact duplicate-span removal: brute-force reference parity on a planted
corpus (cross-doc shared passages, within-doc repetition, short docs,
blanks), partition independence, and the semantics the docstring promises
(raw-word hashing — case matters; text outside removed runs verbatim)."""

from __future__ import annotations

import os
import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pie_ray.functions.spandedup import dedup_spans, dup_span_hashes, q_dedup_spans

WORD_RE = re.compile(r"\S+")


def brute_dedup(texts: list[str], n: int, min_count: int) -> list[tuple[str, int, int]]:
    """Independent reference: count positional word-n-grams corpus-wide,
    then cut maximal covered word runs out of each text."""
    from collections import Counter

    def grams_of(s):
        spans = [(m.start(), m.end()) for m in WORD_RE.finditer(s)]
        words = [s[a:b] for a, b in spans]
        return [" ".join(words[i : i + n]) for i in range(max(0, len(words) - n + 1))], spans

    counts = Counter()
    for s in texts:
        g, _ = grams_of(s)
        counts.update(g)
    dup = {g for g, c in counts.items() if c >= min_count}

    out = []
    for s in texts:
        g, spans = grams_of(s)
        covered = [False] * len(spans)
        for i, gram in enumerate(g):
            if gram in dup:
                for j in range(i, i + n):
                    covered[j] = True
        pieces, cursor, n_spans = [], 0, 0
        k = 0
        while k < len(spans):
            if covered[k]:
                start = k
                while k < len(spans) and covered[k]:
                    k += 1
                pieces.append(s[cursor : spans[start][0]])
                cursor = spans[k - 1][1]
                n_spans += 1
            else:
                k += 1
        pieces.append(s[cursor:])
        t = "".join(pieces)
        out.append((t, n_spans, len(s) - len(t)))
    return out


SHARED = "the quick brown fox jumps over the lazy dog today"  # 10 words > n=8
PLANTED = [
    f"intro one {SHARED} outro alpha",
    f"intro two {SHARED} outro beta",                  # cross-doc duplicate passage
    "self rep a b c d e f g h self rep a b c d e f g h",  # within-doc repeat
    "too short",                                        # < n words
    "",                                                 # blank
    f"THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG TODAY case differs",  # case-sensitive: no hit
    "unique text with absolutely no duplicated passages at all here",
]


def _write(tmpdir, texts) -> str:
    path = os.path.join(str(tmpdir), "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )
    return path


def _run(path, blocks, n=8, min_count=2) -> pd.DataFrame:
    ds = ray.data.read_parquet(path, override_num_blocks=blocks)
    df = dedup_spans(ds, n=n, min_count=min_count).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_matches_brute_force(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    got = _run(path, blocks=3)
    ref = brute_dedup(PLANTED, n=8, min_count=2)
    assert list(got["text"]) == [r[0] for r in ref]
    assert list(got["n_spans"]) == [r[1] for r in ref]
    assert list(got["n_chars_dropped"]) == [r[2] for r in ref]
    # the planted expectations themselves: shared passage cut from both
    # carriers, within-doc repeat cut (both occurrences — count is
    # positional), case-variant and short/blank/unique docs untouched
    assert got.loc[0, "n_spans"] == 1 and SHARED not in got.loc[0, "text"]
    assert got.loc[1, "n_spans"] == 1 and SHARED not in got.loc[1, "text"]
    assert got.loc[2, "n_spans"] >= 1 and got.loc[2, "n_chars_dropped"] > 0
    for i in (3, 4, 5, 6):
        assert got.loc[i, "text"] == PLANTED[i]
        assert got.loc[i, "n_chars_dropped"] == 0
    # outside-run text is verbatim; note "outro" is itself covered (both
    # docs share the 8-gram "...dog today outro"), so only the differing
    # final word survives the cut
    assert got.loc[0, "text"] == "intro one  alpha"
    assert got.loc[1, "text"] == "intro two  beta"


def test_partition_independence(ray_session, tmp_path):
    path = _write(tmp_path, PLANTED)
    a = _run(path, blocks=1)
    b = _run(path, blocks=4)
    pd.testing.assert_frame_equal(a, b)


def test_dup_hash_set_counts_occurrences_not_docs(ray_session, tmp_path):
    # a gram repeated twice WITHIN one doc is a duplicate even if no other
    # doc carries it
    texts = ["x1 x2 x3 x4 x5 x6 x7 x8 then x1 x2 x3 x4 x5 x6 x7 x8", "other words"]
    path = _write(tmp_path, texts)
    ds = ray.data.read_parquet(path)
    dups = dup_span_hashes(ds, n=8, min_count=2)
    assert len(dups) == 1


def test_q_dedup_spans_runs_on_driver_table(ray_session):
    df = q_dedup_spans("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500  # every doc comes back
    assert (df["n_chars_dropped"] >= 0).all()
