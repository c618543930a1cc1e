"""Exact duplicate-SPAN removal — substring-level dedup in the style of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"): any word-n-gram occurring >= min_count times corpus-wide
(counting every occurrence, including repeats inside one document) marks
its covered words as duplicated; maximal covered runs are cut out of the
text, keeping everything outside them verbatim. Line-level dedup
(dedup.dedup_lines) removes boilerplate lines; this removes duplicated
PASSAGES that cross line boundaries — the two compose.

Scale shape (same as dedup_lines / decontaminate): per-batch partial gram
counts -> ONE bucketed exchange on hash(gram) % 64 -> vectorized combine
-> bounded driver pull of the dup-hash set (duplicated passages are a tiny
distinct set even at web scale; abort over SPAN_DUP_MAX rather than pull
unbounded state) -> broadcast sorted array via ray.put -> stateless task
map rewrites the corpus. Two passes, no per-doc state on the driver.

Grams hash the RAW words (no case folding): removal must be byte-exact
against the original text, so near-matches differing only in case are NOT
duplicates here. Whitespace outside a removed run is kept verbatim (a cut
can leave adjacent spaces — deterministic, and downstream ws-tokenizers
are insensitive to it).
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_NGRAM = 8
SPAN_DUP_MAX = 50_000_000
SPAN_COUNT_BUCKETS = 64
_WORD_RE = _re.compile(r"\S+")


def _doc_grams(text: str, n: int):
    """Positional word-n-gram hashes of one document plus the word char
    spans: (hashes[i] covers words [i, i+n), spans[j] = (start, end) of
    word j). Positional — repeats inside the doc each count."""
    from pie_ray.util import hash64_array

    spans = [(m.start(), m.end()) for m in _WORD_RE.finditer(text)]
    if len(spans) < n:
        return np.empty(0, np.uint64), spans
    words = [text[s:e] for s, e in spans]
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return hash64_array(grams, salt=b"span"), spans


def dup_span_hashes(
    docs_ds,
    n: int = SPAN_NGRAM,
    min_count: int = 2,
    num_buckets: int = SPAN_COUNT_BUCKETS,
) -> np.ndarray:
    """Sorted uint64 hashes of every word-n-gram with corpus-wide occurrence
    count >= min_count (occurrences, not distinct docs)."""

    def partial(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t.column("text"), "").to_pylist()
        per_doc = []
        for s in texts:
            h, _ = _doc_grams(s, n)
            if len(h):
                per_doc.append(h)
        merged = np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
        uniq, cnt = np.unique(merged, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq, pa.uint64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "bucket": pa.array(
                    (uniq % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.group_by(["h"]).aggregate([("c", "sum")])
        gb = rename_grouped(gb, ["h"], ["h", "c"])
        return gb.filter(pc.greater_equal(gb.column("c"), min_count)).select(["h"])

    dups = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: combine(g.drop_columns(["bucket"])), batch_format="pyarrow")
    )
    parts: list[np.ndarray] = []
    total = 0
    for b in dups.iter_batches(batch_format="pyarrow"):
        arr = b.column("h").to_numpy(zero_copy_only=False)
        total += len(arr)
        if total > SPAN_DUP_MAX:
            raise ValueError(
                f"duplicated-span set exceeds {SPAN_DUP_MAX} hashes; raise "
                "SPAN_DUP_MAX or dedup in key ranges"
            )
        parts.append(arr)
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


def _strip_doc(text: str, dup_sorted: np.ndarray, n: int):
    """(new_text, n_spans, n_chars_dropped) for one document."""
    h, spans = _doc_grams(text, n)
    if len(h) == 0 or len(dup_sorted) == 0:
        return text, 0, 0
    pos = np.searchsorted(dup_sorted, h)
    ok = pos < len(dup_sorted)
    hit = np.zeros(len(h), bool)
    hit[ok] = dup_sorted[pos[ok]] == h[ok]
    idx = np.flatnonzero(hit)
    if len(idx) == 0:
        return text, 0, 0
    # word j is covered iff some hit gram i satisfies i <= j < i+n:
    # run-length diff trick, then merge covered word runs into char spans
    nw = len(spans)
    diff = np.zeros(nw + 1, np.int64)
    np.add.at(diff, idx, 1)
    np.add.at(diff, np.minimum(idx + n, nw), -1)
    covered = np.cumsum(diff[:-1]) > 0
    # boundaries of maximal covered runs
    edges = np.flatnonzero(np.diff(np.concatenate(([0], covered.view(np.int8), [0]))))
    starts, ends = edges[0::2], edges[1::2]  # word-index runs [start, end)
    pieces = []
    cursor = 0
    for ws, we in zip(starts, ends):
        cut_from = spans[ws][0]
        cut_to = spans[we - 1][1]
        pieces.append(text[cursor:cut_from])
        cursor = cut_to
    pieces.append(text[cursor:])
    new_text = "".join(pieces)
    return new_text, len(starts), len(text) - len(new_text)


def dedup_spans(docs_ds, n: int = SPAN_NGRAM, min_count: int = 2):
    """Cut every corpus-duplicated word-n-gram span out of every document.
    Output (doc_id, text, n_spans, n_chars_dropped) for ALL input docs —
    nothing is dropped silently; untouched docs come back with 0 counts."""
    import ray as _ray

    dup_ref = _ray.put(dup_span_hashes(docs_ds, n, min_count))

    def strip(t: pa.Table, ref=None) -> pa.Table:
        dup_sorted = _ray.get(ref)
        texts = pc.fill_null(t.column("text"), "").to_pylist()
        out = [_strip_doc(s, dup_sorted, n) for s in texts]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": pa.array([o[0] for o in out], pa.string()),
                "n_spans": pa.array([o[1] for o in out], pa.int64()),
                "n_chars_dropped": pa.array([o[2] for o in out], pa.int64()),
            }
        )

    return docs_ds.map_batches(strip, fn_kwargs={"ref": dup_ref}, batch_format="pyarrow")


def q_dedup_spans(sf_dir: str, n: int = SPAN_NGRAM, min_count: int = 2):
    """Library/query surface over the documents table. The synthetic driver
    docs share template phrases, so real spans ARE removed there; the unit
    gate is brute-force reference parity on a planted corpus plus partition
    independence."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_spans(ds, n, min_count)
