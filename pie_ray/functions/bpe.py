"""BPE tokenizer training + encoding over a document corpus.

The scale shape is the canonical one (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the GPT-2/RoBERTa training
recipe): merges are a function of the WORD-FREQUENCY table, not the corpus,
so the distributed part is exactly one word-count exchange (per-batch Arrow
explode + group_by partials, bucketed shuffle — the same kernels as
textops.word_counts) and the merge loop runs driver-local over the bounded
vocabulary with an inverted pair->words index (only words containing the
just-merged pair are touched per iteration). Driver memory is the distinct
vocab, never the corpus; ``min_freq``/``max_words`` bound it explicitly and
the train result REPORTS what was dropped (no silent caps).

Encoding broadcasts the merge ranks once (``ray.put``) and runs as a
stateless task map with a per-worker-process memo (hot words encode once
per worker, not once per row).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

WORD_BUCKETS = 64
EOW = "▁"  # end-of-word sentinel symbol (never produced by ws split)


# ---------------------------------------------------------------- training


def _pair_stats(words: list[tuple[str, ...]], freqs: list[int]):
    """Initial pair counts + inverted index pair -> {word_idx}."""
    stats: Counter = Counter()
    index: dict[tuple[str, str], set[int]] = {}
    for i, (w, f) in enumerate(zip(words, freqs)):
        for a, b in zip(w, w[1:]):
            stats[(a, b)] += f
            index.setdefault((a, b), set()).add(i)
    return stats, index


def _merge_word(w: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    a, b = pair
    out = []
    i = 0
    while i < len(w):
        if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def bpe_train_from_word_freqs(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-local BPE merge loop over a word-frequency table. Deterministic:
    ties on count break to the lexicographically smallest pair. Stops early
    when no pair occurs twice."""
    items = sorted(word_freqs.items())
    words = [tuple(w) + (EOW,) for w, _ in items]
    freqs = [f for _, f in items]
    stats, index = _pair_stats(words, freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair = min(
            (p for p, c in stats.items() if c > 1),
            key=lambda p: (-stats[p], p),
            default=None,
        )
        if pair is None:
            break
        merges.append(pair)
        # rewrite only the words that contain the pair; update stats in place
        for i in sorted(index.get(pair, ())):
            old = words[i]
            new = _merge_word(old, pair)
            if new == old:
                continue
            f = freqs[i]
            for a, b in zip(old, old[1:]):
                stats[(a, b)] -= f
                if stats[(a, b)] <= 0:
                    del stats[(a, b)]
                s = index.get((a, b))
                if s is not None:
                    s.discard(i)
            for a, b in zip(new, new[1:]):
                stats[(a, b)] += f
                index.setdefault((a, b), set()).add(i)
            words[i] = new
        index.pop(pair, None)
        stats.pop(pair, None)
    return merges


def corpus_word_freqs(
    ds,
    col: str = "text",
    min_freq: int = 1,
    max_words: int | None = None,
    num_buckets: int = WORD_BUCKETS,
) -> tuple[dict[str, int], dict]:
    """ONE distributed word-count exchange -> driver word-frequency table.

    Per-batch Arrow explode + group_by partials (hot words ship one row per
    block), bucketed shuffle on hash(word) % 64, exact per-bucket counts.
    ``min_freq`` filters inside the buckets (before any driver pull);
    ``max_words`` keeps the top-N by (count desc, word asc). Returns the
    table plus a report of what the bounds dropped."""
    from pie_ray.functions.textops import explode_ws_lower
    from pie_ray.util import bucket_hash_strings, rename_grouped

    def partial(t: pa.Table) -> pa.Table:
        if col != "text":
            t = t.rename_columns(
                [("text" if c == col else c) for c in t.column_names]
            )
        words, _ = explode_ws_lower(t)
        if len(words) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        g = rename_grouped(
            pa.table({"word": words}).group_by(["word"]).aggregate([("word", "count")]),
            ["word"],
            ["word", "n"],
        )
        buckets = (
            bucket_hash_strings(g.column("word"), salt=0xB9E) % num_buckets
        ).astype("int32")
        return pa.table(
            {
                "word": g.column("word"),
                "n": pc.cast(g.column("n"), pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        gb = rename_grouped(
            g.group_by(["word"]).aggregate([("n", "sum")]), ["word"], ["word", "n"]
        )
        return gb.filter(pc.greater_equal(gb.column("n"), min_freq))

    counted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )
    rows = counted.take_all()
    freqs = {r["word"]: int(r["n"]) for r in rows}
    report = {"distinct_words": len(freqs), "dropped_by_max_words": 0}
    if max_words is not None and len(freqs) > max_words:
        keep = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
        report["dropped_by_max_words"] = len(freqs) - max_words
        freqs = dict(keep)
    return freqs, report


def bpe_train(
    ds,
    col: str = "text",
    num_merges: int = 200,
    min_freq: int = 1,
    max_words: int | None = None,
) -> dict:
    """Corpus -> BPE merge list. Returns {merges, vocab, report}."""
    freqs, report = corpus_word_freqs(ds, col, min_freq=min_freq, max_words=max_words)
    merges = bpe_train_from_word_freqs(freqs, num_merges)
    vocab = sorted({ch for w in freqs for ch in w} | {EOW} | {a + b for a, b in merges})
    return {"merges": merges, "vocab": vocab, "report": report}


# ---------------------------------------------------------------- encoding

_ENCODE_CACHE_MAX = 65536


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy lowest-rank-first merge application (the standard decoder of a
    merge list — identical order to how training built it)."""
    w = tuple(word) + (EOW,)
    while len(w) > 1:
        best_rank, best_i = None, -1
        for i in range(len(w) - 1):
            r = ranks.get((w[i], w[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        w = w[:best_i] + (w[best_i] + w[best_i + 1],) + (w[best_i + 2 :])
    return w


def _encode_batch(t: pa.Table, ranks_ref=None, col: str = "text") -> pa.Table:
    import ray

    from pie_ray.functions.textops import ws_tokens

    ranks = ray.get(ranks_ref)
    # memo is per MERGE TABLE (keyed by the broadcast ref): Ray reuses
    # worker processes across datasets, so a word-only cache would serve a
    # previous tokenizer's encodings to a new one
    caches = _encode_batch.__dict__.setdefault("caches", {})
    me = ranks_ref.hex()
    while len(caches) >= 8 and me not in caches:  # cap BEFORE inserting
        # evict an arbitrary OTHER tokenizer's cache — clearing all would
        # wipe the active warm cache mid-stream
        victim = next(k for k in caches if k != me)
        caches.pop(victim)
    cache = caches.setdefault(me, {})
    toks_col, counts = [], []
    for s in pc.fill_null(t.column(col), "").to_pylist():
        toks: list[str] = []
        for word in ws_tokens(s.lower()):
            enc = cache.get(word)
            if enc is None:
                if len(cache) >= _ENCODE_CACHE_MAX:
                    cache.clear()
                enc = encode_word(word, ranks)
                cache[word] = enc
            toks.extend(enc)
        toks_col.append(toks)
        counts.append(len(toks))
    return t.append_column(
        "bpe_tokens", pa.array(toks_col, pa.list_(pa.string()))
    ).append_column("n_bpe_tokens", pa.array(counts, pa.int64()))


def bpe_encode(ds, merges: list[tuple[str, str]], col: str = "text"):
    """Broadcast the merge ranks once; add ``bpe_tokens`` (list<string>) and
    ``n_bpe_tokens`` columns. Stateless task map — the per-worker word memo
    makes hot (Zipf-head) words encode once per worker process."""
    import ray

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ref = ray.put(ranks)
    return ds.map_batches(
        _encode_batch, fn_kwargs={"ranks_ref": ref, "col": col}, batch_format="pyarrow"
    )
