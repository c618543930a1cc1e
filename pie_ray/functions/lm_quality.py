"""Corpus self-perplexity quality scoring — the CCNet/Gopher-style LM
filter without an external model: train a unigram LM on the corpus's own
word counts, then score every document by bits-per-word under that LM.
Boilerplate/templated docs score LOW (their words are corpus-frequent);
gibberish and OOV-dense docs score HIGH — the standard two-sided quality
cut (keep the middle of the distribution).

Scale shape: pass 1 is the corpus word-count exchange (per-batch Arrow
explode + partial counts -> ONE bucketed shuffle -> vocab filtered to
count >= min_count, Zipf-bounded; LM_VOCAB_MAX aborts loudly); pass 2 is a
stateless task map against the broadcast (sorted-hash, log-prob) arrays —
vectorized searchsorted lookup + segment sums, no Python token loop.

Determinism: a document's log-probs are summed in token order inside its
own row (np.add.reduceat), so scores are independent of batching and
partitioning; counts are exact ints, log() applied identically everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LM_VOCAB_MAX = 50_000_000
LM_COUNT_BUCKETS = 64
# mass reserved for out-of-vocab tokens: p_oov = OOV_ALPHA / total_tokens
OOV_ALPHA = 0.5


def unigram_model(docs_ds, min_count: int = 5, num_buckets: int = LM_COUNT_BUCKETS):
    """(sorted word-hashes, aligned ln-probs, total_tokens, oov_logp) from
    one bucketed count exchange. Words under min_count fold into the OOV
    mass (their counts still feed total_tokens)."""
    from pie_ray.util import hash64_array, rename_grouped

    def partial(t: pa.Table) -> pa.Table:
        from pie_ray.functions.textops import explode_ws_lower

        words, _ = explode_ws_lower(t)
        h = hash64_array(words.to_pylist(), salt=b"lm")
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq, pa.uint64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "bucket": pa.array(
                    (uniq % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

    def combine(g: pa.Table) -> pa.Table:
        gb = g.group_by(["h"]).aggregate([("c", "sum")])
        gb = rename_grouped(gb, ["h"], ["h", "c"])
        # bucket total INCLUDING rare words rides a sentinel row, so the
        # driver learns total_tokens without a second corpus pass
        total = int(pc.sum(gb.column("c")).as_py() or 0)
        kept = gb.filter(pc.greater_equal(gb.column("c"), min_count))
        return pa.table(
            {
                "h": pa.concat_arrays(
                    [kept.column("h").combine_chunks(), pa.array([SENTINEL], pa.uint64())]
                ),
                "c": pa.concat_arrays(
                    [kept.column("c").combine_chunks(), pa.array([total], pa.int64())]
                ),
            }
        )

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: combine(g.drop_columns(["bucket"])), batch_format="pyarrow")
    )
    hs: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    total_tokens = 0
    n = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        h = b.column("h").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        sent = h == SENTINEL
        total_tokens += int(c[sent].sum())
        n += int((~sent).sum())
        if n > LM_VOCAB_MAX:
            raise ValueError(
                f"unigram vocab exceeds {LM_VOCAB_MAX}; raise LM_VOCAB_MAX "
                "or raise min_count"
            )
        hs.append(h[~sent])
        cs.append(c[~sent])
    if total_tokens == 0:
        return np.empty(0, np.uint64), np.empty(0, np.float64), 0, 0.0
    h_all = np.concatenate(hs)
    c_all = np.concatenate(cs)
    order = np.argsort(h_all)
    logp = np.log(c_all[order].astype(np.float64)) - np.log(float(total_tokens))
    oov_logp = float(np.log(OOV_ALPHA) - np.log(float(total_tokens)))
    return h_all[order], logp, total_tokens, oov_logp


def score_perplexity(docs_ds, min_count: int = 5, keep_cols: tuple = (), model=None):
    """(doc_id, n_tokens, bits_per_word[, *keep_cols]) for every input doc;
    empty docs come back with n_tokens=0, bits_per_word=0.0 (nothing
    dropped). Pass a prebuilt ``model`` (the unigram_model tuple) to score
    several streams — or the same stream twice, e.g. once for band edges
    and once carrying ``text`` — without re-paying the count exchange."""
    import ray as _ray

    vocab_h, vocab_logp, _total, oov_logp = model or unigram_model(docs_ds, min_count)
    model_ref = _ray.put((vocab_h, vocab_logp, oov_logp))

    def score(t: pa.Table, ref=None) -> pa.Table:
        from pie_ray.functions.textops import WS_CHARS, explode_ws_lower
        from pie_ray.util import hash64_array

        vh, vlp, oov = _ray.get(ref)
        n_rows = t.num_rows
        # per-doc token counts over ALL rows (explode drops empty docs, so
        # recount lengths from the same trim/split class)
        text = pc.fill_null(t.column("text").combine_chunks(), "")
        trimmed = pc.utf8_trim(pc.utf8_lower(text), characters=WS_CHARS)
        lists = pc.split_pattern_regex(trimmed, r"[ \t\n\f\r]+")
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        lens[empty] = 0

        words, _ = explode_ws_lower(t)
        h = hash64_array(words.to_pylist(), salt=b"lm")
        if len(vh):
            pos = np.searchsorted(vh, h)
            ok = pos < len(vh)
            lp = np.full(len(h), oov, np.float64)
            hit = np.zeros(len(h), bool)
            hit[ok] = vh[pos[ok]] == h[ok]
            lp[hit] = vlp[pos[hit]]
        else:
            lp = np.full(len(h), oov, np.float64)
        offsets = np.zeros(n_rows + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        if len(lp):
            # reduceat rejects an index == len(lp) (trailing empty docs):
            # a 0.0 sentinel makes that index valid and only ever adds 0.0
            # to the final segment; zero-length segments return the element
            # at their start index, masked by the lens>0 guard below
            lp_ext = np.append(lp, 0.0)
            sums = np.add.reduceat(lp_ext, offsets[:-1])
        else:
            sums = np.zeros(n_rows)
        sums = np.where(lens > 0, sums, 0.0)
        bits = np.where(lens > 0, -sums / np.maximum(lens, 1) / np.log(2.0), 0.0)
        cols = {
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(lens, pa.int64()),
            "bits_per_word": pa.array(bits, pa.float64()),
        }
        for c in keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return docs_ds.map_batches(score, fn_kwargs={"ref": model_ref}, batch_format="pyarrow")


def q_lm_perplexity(sf_dir: str, min_count: int = 5):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return score_perplexity(ds, min_count)
