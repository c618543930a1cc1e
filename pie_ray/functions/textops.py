"""Text-analysis operators for large-scale training-data pipelines.

Language ID (char-n-gram heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling hash). All stateless ``map_batches`` stages over the
``documents`` table; regexes are compiled at module import (once per worker
process) so the per-batch path is match-only.

At 100 TB these run as plain task-parallel map stages — no shuffle, no
state; throughput scales linearly with cores.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import regex as re

import ray.data

from pie_ray.util import stable_hash64

# ---------------------------------------------------------------------------
# token counting — whitespace tokens via vectorized kernels, plus a BPE-ish
# word/number/punct split (compiled once)
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
# punct runs, whitespace runs (public pattern family; simplified, ASCII-safe)
_BPE_RX = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")

# Whitespace tokenization contract shared with the DuckDB oracles: the
# whitespace class is EXACTLY RE2's \s ([\t\n\f\r ]), ends trimmed on the
# same class. Python's str.split() splits on ALL Unicode whitespace and
# silently diverges from the SQL side on e.g. non-breaking spaces — every
# oracled word operator goes through this helper instead.
WS_CHARS = " \t\n\f\r"
_WS_RX = re.compile(r"[ \t\n\f\r]+")


def ws_tokens(s: str | None) -> list[str]:
    s = (s or "").strip(WS_CHARS)
    return _WS_RX.split(s) if s else []



def explode_ws_lower(t: pa.Table, with_doc_ids: bool = False, extra_cols=None):
    """Arrow-kernel word explode: lower -> trim -> regex split -> flatten —
    the vectorized form of ``[ws_tokens(s.lower()) for s in texts]`` (the
    per-token Python Counter loops this replaces dominated every corpus
    word statistic). Same [ \\t\\n\\f\\r] class and lower(trim()) order as
    the SQL oracles; empty/null docs contribute no tokens (split of "" would
    otherwise emit one "" token). Returns (words, doc_ids-per-word|None).

    ``extra_cols`` is the generic row-companion form (used by the quality
    classifier, which needs per-token labels): returns ``(words,
    parent_row_indices, [filtered companion arrays])`` so callers can
    ``take`` any per-row value onto the tokens — ONE implementation of the
    frozen tokenization contract, not a copy per consumer."""
    text = pc.fill_null(t.column("text").combine_chunks(), "")
    trimmed = pc.utf8_trim(pc.utf8_lower(text), characters=WS_CHARS)
    keep = pc.not_equal(trimmed, "")
    trimmed = trimmed.filter(keep)
    lists = pc.split_pattern_regex(trimmed, r"[ \t\n\f\r]+")
    words = pc.list_flatten(lists)
    if extra_cols is not None:
        comps = [t.column(c).combine_chunks().filter(keep) for c in extra_cols]
        return words, pc.list_parent_indices(lists), comps
    if not with_doc_ids:
        return words, None
    ids = t.column("doc_id").combine_chunks().filter(keep)
    return words, pc.take(ids, pc.list_parent_indices(lists))


def token_count_batch(t: pa.Table) -> pa.Table:
    # nulls count as empty documents (None would otherwise propagate
    # through the kernel chain and emit null counts)
    text = pc.fill_null(t.column("text"), "")
    # whitespace token count, fully vectorized; trim + split use the SAME
    # explicit [ \t\n\f\r] class as the SQL oracle (see ws_tokens)
    trimmed = pc.utf8_trim(text, characters=WS_CHARS)
    ws_counts = pc.if_else(
        pc.equal(trimmed, ""),
        pa.scalar(0, pa.int64()),
        pc.cast(
            pc.list_value_length(pc.split_pattern_regex(trimmed, r"[ \t\n\f\r]+")),
            pa.int64(),
        ),
    )
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens_ws": ws_counts,
        }
    )


def bpe_count_batch(t: pa.Table) -> pa.Table:
    """BPE-ish pre-tokenizer counts — its lookahead pattern is not
    RE2-expressible, so this channel is rows-only (no SQL oracle)."""
    texts = pc.fill_null(t.column("text"), "").to_pylist()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens_bpe": pa.array(
                [len(_BPE_RX.findall(s)) if s else 0 for s in texts], pa.int64()
            ),
        }
    )


def q_token_count(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


def q_token_count_bpe(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(bpe_count_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)


def quality_batch(t: pa.Table) -> pa.Table:
    doc_ids = t.column("doc_id")
    texts = t.column("text").to_pylist()
    n_chars = np.empty(len(texts), np.int64)
    alpha_ratio = np.empty(len(texts), np.float64)
    punct_ratio = np.empty(len(texts), np.float64)
    stop_ratio = np.empty(len(texts), np.float64)
    n_words = np.empty(len(texts), np.int64)
    n_stop = np.empty(len(texts), np.int64)
    for i, s in enumerate(texts):
        s = s or ""
        n = len(s)
        n_chars[i] = n
        if n == 0:
            alpha_ratio[i] = punct_ratio[i] = stop_ratio[i] = 0.0
            n_words[i] = n_stop[i] = 0
            continue
        # per-CHARACTER ratios (utf-32 codes), matching SQL length()/regex
        # semantics — byte-level ratios diverge on any non-ASCII character
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        is_alpha = ((codes >= 65) & (codes <= 90)) | ((codes >= 97) & (codes <= 122))
        is_punct = np.isin(codes, _PUNCT_CODES)
        alpha_ratio[i] = is_alpha.mean()
        punct_ratio[i] = is_punct.mean()
        words = ws_tokens(s.lower())
        n_words[i] = len(words)
        n_stop[i] = sum(1 for w in words if w in _STOPWORDS)
        stop_ratio[i] = n_stop[i] / n_words[i] if words else 0.0
    # score = 0.4*[alpha>0.6] + 0.2*[punct<0.1] + 0.2*min(stop/0.4, 1)
    #       + 0.2*[100<chars<100k], computed as ONE exact integer ratio
    #       (2w(2*b1+b2+b3) + min(5k, 2w)) / 10w so the value is a single
    #       correctly-rounded division — bit-identical to the SQL oracle
    #       (a float sum of the four terms drifts in the last ulp)
    base = (
        2 * (alpha_ratio > 0.6).astype(np.int64)
        + (punct_ratio < 0.1).astype(np.int64)
        + ((n_chars > 100) & (n_chars < 100_000)).astype(np.int64)
    )
    num = 2 * n_words * base + np.minimum(5 * n_stop, 2 * n_words)
    den = 10 * n_words
    score = np.where(n_words > 0, num / np.maximum(den, 1), base / 5.0)
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_chars": pa.array(n_chars),
            "alpha_ratio": pa.array(alpha_ratio),
            "punct_ratio": pa.array(punct_ratio),
            "stopword_ratio": pa.array(stop_ratio),
            "quality_score": pa.array(score),
        }
    )


_PUNCT_CODES = np.frombuffer(
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".encode("utf-32-le"), dtype=np.uint32
)


def q_quality(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


def text_stats_batch(t: pa.Table) -> pa.Table:
    """Fused per-doc text statistics: ONE scan of documents produces the
    ws token count AND the five quality columns (the former token_count +
    text_quality driver entries, merged to free driver-cap slots — the
    individual batch fns / query fns remain the library surface)."""
    out = quality_batch(t)
    return out.append_column(
        "n_tokens_ws", token_count_batch(t).column("n_tokens_ws")
    )


def q_text_stats(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(text_stats_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language ID — char-trigram overlap heuristic (no external model; the
# sandbox documents table is synthetic English, but the operator is generic)
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    "en": " th the he  an and  of of  to in  is ion at  en nd ",
    "de": " de der er  un und  di die ein ch  sch en  ge  be ",
    "fr": " de le  les la  et  des ent  la ion que  qu  pa ",
    "es": " de la  el  en  los que  y  con el  est ado  se ",
}
_PROFILE_SETS = {
    lang: {prof[i : i + 3] for i in range(len(prof) - 2)} for lang, prof in _LANG_PROFILES.items()
}


def lang_id_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    preds = []
    for s in texts:
        s = f" {(s or '').lower()[:2000]} "
        grams = {s[i : i + 3] for i in range(len(s) - 2)}
        best, best_n = "und", 0
        for lang, prof in _PROFILE_SETS.items():
            n = len(grams & prof)
            if n > best_n:
                best, best_n = lang, n
        preds.append(best if best_n >= 2 else "und")
    return pa.table({"doc_id": t.column("doc_id"), "lang_pred": pa.array(preds, pa.string())})


def q_lang_id(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# document fingerprinting — 64-bit rolling-hash content fingerprint
# (winnowing-style min over rolling window hashes; deterministic)
# ---------------------------------------------------------------------------

_FP_WINDOW = 8


def fingerprint_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    fps = np.empty(len(texts), np.uint64)
    for i, s in enumerate(texts):
        b = (s or "").encode("utf-8", "replace")
        if len(b) < _FP_WINDOW:
            fps[i] = stable_hash64(s or "")
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash over all windows of size W, vectorized:
        # h[j] = sum_k arr[j+k] * P^(W-1-k)  (mod 2^64)
        P = np.uint64(1099511628211)
        pows = P ** np.arange(_FP_WINDOW - 1, -1, -1, dtype=np.uint64)
        n_win = len(arr) - _FP_WINDOW + 1
        winh = np.zeros(n_win, np.uint64)
        for k in range(_FP_WINDOW):
            winh += arr[k : k + n_win] * pows[k]
        # fingerprint = min window hash (stable under content shifts)
        fps[i] = winh.min()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "fingerprint": pa.array([f"{int(v):016x}" for v in fps], pa.string()),
        }
    )


def q_fingerprint(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def text_meta_batch(t: pa.Table) -> pa.Table:
    """All per-document map-only channels with no SQL-expressible oracle,
    fused into one batch fn: lang-id, rolling-hash fingerprint, BPE-ish
    token count, 64-bit SimHash. One pass over the text column instead of
    four driver entries × four scans."""
    from pie_ray.functions.dedup import simhash_batch

    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_pred": lang_id_batch(t).column("lang_pred"),
            "fingerprint": fingerprint_batch(t).column("fingerprint"),
            "n_tokens_bpe": bpe_count_batch(t).column("n_tokens_bpe"),
            "simhash": simhash_batch(t).column("simhash"),
        }
    )


def q_text_meta(sf_dir: str):
    """Merged rows-only driver entry for the per-doc metadata channels
    (each channel keeps its own library function + unit gate; the driver
    row checks the fused stage runs with sane counts)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(text_meta_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-wide word counts — the explode/flat_map shape of LM-data prep
# (vocabulary building, heavy-hitter filtering). Per-batch partial counts
# BEFORE the shuffle (each batch ships its distinct words once, not every
# token), then the usual hash-bucket shuffle + vectorized Arrow sum.
# ---------------------------------------------------------------------------

WORD_COUNT_MIN = 10
WC_BUCKETS = 64
TFIDF_TOP_K = 3
TFIDF_DF_BROADCAST_MAX = 2_000_000  # vocab entries broadcastable to workers


def q_word_counts(sf_dir: str):
    """(word, n) for every whitespace-token word appearing >= WORD_COUNT_MIN
    times corpus-wide. Vocabulary is high-cardinality: counts combine
    per-batch first, shuffle on hash(word) % 64 buckets."""
    from pie_ray.util import bucket_count, bucket_hash_strings, hash64_array

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    nb = bucket_count(ds.size_bytes(), floor=WC_BUCKETS)

    def explode_partial(t: pa.Table) -> pa.Table:
        words, _ = explode_ws_lower(t)
        gb = pa.table({"word": words}).group_by(["word"]).aggregate([([], "count_all")])
        tb = pa.table(
            {
                "word": gb.column("word"),
                "n": pc.cast(gb.column("count_all"), pa.int64()),
            }
        )
        b = (bucket_hash_strings(tb.column("word"), salt=0x77C) % nb).astype("int32")
        return tb.append_column("bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pa.Table) -> pa.Table:
        gb = g.drop_columns(["bucket"]).group_by(["word"]).aggregate([("n", "sum")])
        gb = gb.rename_columns(["word", "n"])
        return gb.filter(pc.greater_equal(gb.column("n"), pa.scalar(WORD_COUNT_MIN, pa.int64())))

    return (
        ds.map_batches(explode_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Heavy hitters — the bounded-memory scale path for corpus word statistics.
# Per-batch Misra-Gries summaries (size k, mergeable, NO false negatives for
# any word with frequency > total/k) merge on the driver; a second exact
# counting pass over the candidate set yields exact counts, so the final
# output is deterministic and SQL-oracle-able despite the approximate
# first pass.
# ---------------------------------------------------------------------------

MG_SUMMARY_SIZE = 256


def _mg_update(counters: dict, items, k: int) -> None:
    for w in items:
        if w in counters:
            counters[w] += 1
        elif len(counters) < k - 1:
            counters[w] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in dead:
                del counters[key]
            for key in counters:
                counters[key] -= 1


def q_heavy_hitters(sf_dir: str):
    """(word, n) for every word with exact count >= 2*total_tokens / k
    (k = MG_SUMMARY_SIZE). Pass 1: per-batch Misra-Gries summaries (bounded
    memory regardless of vocabulary size) merged by addition on the driver —
    the merged summary undercounts any word by at most total/k, so with the
    output threshold at 2*total/k the candidate set provably contains every
    true heavy hitter. Pass 2: exact counts for the candidate set only
    (broadcast membership filter + per-batch partial counts)."""
    import ray as _ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def mg_batch(t: pa.Table) -> pa.Table:
        # tokenize via the Arrow explode (same strings as the exact pass);
        # the Misra-Gries sweep itself is legitimately sequential Python
        toks_arr, _ = explode_ws_lower(t)
        counters: dict[str, int] = {}
        total = len(toks_arr)
        _mg_update(counters, toks_arr.to_pylist(), MG_SUMMARY_SIZE)
        words = list(counters)
        return pa.table(
            {
                "word": pa.array(words + ["\x00total"], pa.string()),
                "c": pa.array([counters[w] for w in words] + [total], pa.int64()),
            }
        )

    merged: dict[str, int] = {}
    total_tokens = 0
    for batch in docs.map_batches(mg_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for w, c in zip(batch.column("word").to_pylist(), batch.column("c").to_pylist()):
            if w == "\x00total":
                total_tokens += c
            else:
                # merging MG summaries by plain addition keeps the
                # no-false-negative guarantee (counts only underestimate)
                merged[w] = merged.get(w, 0) + c
    threshold = max(1, (2 * total_tokens) // MG_SUMMARY_SIZE)
    candidates = sorted(merged)
    cand_ref = _ray.put(pa.array(candidates, pa.string()))

    def exact_counts(t: pa.Table, ref=None) -> pa.Table:
        cand = _ray.get(ref)
        words, _ = explode_ws_lower(t)
        # candidate filter BEFORE the group_by: non-candidates (almost the
        # whole vocabulary) never enter the hash table
        words = words.filter(pc.is_in(words, value_set=cand))
        gb = pa.table({"word": words}).group_by(["word"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "word": gb.column("word"),
                "n": pc.cast(gb.column("count_all"), pa.int64()),
            }
        )

    exact: dict[str, int] = {}
    for batch in docs.map_batches(
        exact_counts, fn_kwargs={"ref": cand_ref}, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for w, n in zip(batch.column("word").to_pylist(), batch.column("n").to_pylist()):
            exact[w] = exact.get(w, 0) + n
    keep = sorted(w for w, n in exact.items() if n >= threshold)
    return pa.table(
        {
            "word": pa.array(keep, pa.string()),
            "n": pa.array([exact[w] for w in keep], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the canonical two-pass text-analytics
# pipeline: per-doc term counts, corpus document frequencies, broadcast
# idf, per-doc rank. Output columns are ALL integers/strings (rank computed
# from the float score internally) so the driver's exact value-hash never
# sees a float.
# ---------------------------------------------------------------------------


def _term_counts(docs):
    """(doc_id, word, tf) — one row per distinct word per doc (vectorized:
    Arrow explode + (doc, word) group_by, no per-token Python)."""

    def fn(t: pa.Table) -> pa.Table:
        words, doc_ids = explode_ws_lower(t, with_doc_ids=True)
        gb = (
            pa.table({"doc_id": doc_ids, "word": words})
            .group_by(["doc_id", "word"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "doc_id": pc.cast(gb.column("doc_id"), pa.int64()),
                "word": gb.column("word"),
                "tf": pc.cast(gb.column("count_all"), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def q_tfidf_top_terms(sf_dir: str, force_join: bool = False):
    """Top-3 terms per doc by tf-idf (score = tf * ln(N/df)); emits
    (doc_id, word, tf, df, rnk). Two passes over documents: pass 1 builds
    the document-frequency table (word-bucket shuffle); pass 2 scores and
    ranks per doc-bucket. The df table BROADCASTS when the vocabulary fits
    (common case) and joins terms⋈df by hash shuffle above the threshold
    (or with ``force_join`` — equivalence locked in tests). Ties broken by
    word so the ranking is deterministic; idf uses math.log (libm),
    matching the SQL ln()."""
    import math

    import ray as _ray

    from pie_ray.util import bucket_hash_strings, hash64_array

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from pie_ray.util import bucket_count

    nb = bucket_count(docs.size_bytes(), floor=WC_BUCKETS)
    n_docs = docs.count()
    # tokenize ONCE: both the df pass and the scoring pass consume this
    # materialized terms table (re-deriving it would re-run the most
    # expensive step; the table spills to the object store at scale)
    terms = _term_counts(docs).materialize()

    # pass 1: document frequencies (df = #docs containing word)
    def add_word_bucket(t: pa.Table) -> pa.Table:
        b = (bucket_hash_strings(t.column("word"), salt=0xD5) % nb).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def df_bucket(g: pa.Table) -> pa.Table:
        gb = g.drop_columns(["bucket"]).group_by(["word"]).aggregate([("doc_id", "count")])
        return gb.rename_columns(["word", "df"])

    df_ds = (
        terms
        .map_batches(add_word_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(df_bucket, batch_format="pyarrow")
        .materialize()
    )
    def add_doc_bucket(out: pa.Table) -> pa.Table:
        b = (
            np.asarray(out.column("doc_id").to_pylist(), dtype=np.uint64) % nb
        ).astype("int32")
        return out.append_column("bucket", pa.array(b, pa.int32()))

    use_join = force_join or df_ds.count() > TFIDF_DF_BROADCAST_MAX
    if use_join:
        # scale path: terms ⋈ df hash join (vocab too large to broadcast);
        # idf computed per batch with math.log memoized per distinct df
        from pie_ray.util import join_num_partitions

        joined = terms.join(
            df_ds,
            join_type="inner",
            num_partitions=join_num_partitions(terms.size_bytes()),
            on=("word",),
        )

        def score_join(t: pa.Table) -> pa.Table:
            dfv = t.column("df").to_numpy(zero_copy_only=False)
            idf_by_df = {int(d): math.log(n_docs / int(d)) for d in np.unique(dfv)}
            scores = t.column("tf").to_numpy(zero_copy_only=False).astype(
                np.float64
            ) * np.array([idf_by_df[int(d)] for d in dfv])
            out = pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "word": t.column("word"),
                    "tf": t.column("tf"),
                    "df": t.column("df"),
                    "score": pa.array(scores),
                }
            )
            return add_doc_bucket(out)

        scored_ds = joined.map_batches(score_join, batch_format="pyarrow")
        return scored_ds.groupby("bucket").map_groups(
            _tfidf_rank_bucket, batch_format="pyarrow"
        )

    df_rows = df_ds.take_all()
    words_sorted = sorted(r["word"] for r in df_rows)
    df_by_word = {r["word"]: r["df"] for r in df_rows}
    keys = pa.array(words_sorted, pa.string())
    dfs = pa.array([df_by_word[w] for w in words_sorted], pa.int64())
    idfs = pa.array(
        [math.log(n_docs / df_by_word[w]) for w in words_sorted], pa.float64()
    )
    lookup_ref = _ray.put((keys, dfs, idfs))

    # pass 2: score per (doc, word), rank per doc inside doc-hash buckets
    def score(t: pa.Table, ref=None) -> pa.Table:
        keys_, dfs_, idfs_ = _ray.get(ref)
        idx = pc.index_in(t.column("word").combine_chunks(), value_set=keys_)
        df_col = dfs_.take(idx)
        idf_col = idfs_.take(idx)
        scores = pc.multiply(pc.cast(t.column("tf"), pa.float64()), idf_col)
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "word": t.column("word"),
                "tf": t.column("tf"),
                "df": df_col,
                "score": scores,
            }
        )
        return add_doc_bucket(out)

    return (
        terms
        .map_batches(score, fn_kwargs={"ref": lookup_ref}, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_tfidf_rank_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition statistics — per-document duplicate-line and
# repeated-n-gram fractions (the standard LM-data quality signals for
# boilerplate / spam detection). Map-only: one stateless pass over
# documents, no shuffle; scales linearly with cores at 100 TB.
# ---------------------------------------------------------------------------


def repetition_batch(t: pa.Table) -> pa.Table:
    """Per doc: line count, duplicate-line fraction (occurrences beyond the
    first / total lines), duplicate-line CHARACTER fraction, and the
    fraction of word-2-grams taken by the most frequent 2-gram. Lines are
    raw ``text.split('\\n')`` (DuckDB ``string_split(text, chr(10))`` has
    byte-identical edge semantics — trailing newline yields a trailing ''
    line, '' yields one '' line); words use the shared ws_tokens contract.
    Every fraction is ONE exact int/int double division, so values are
    bit-identical to the SQL oracle."""
    from collections import Counter

    texts = pc.fill_null(t.column("text"), "").to_pylist()
    n = len(texts)
    n_lines = np.empty(n, np.int64)
    dup_line_frac = np.empty(n, np.float64)
    dup_char_frac = np.empty(n, np.float64)
    top2_frac = np.empty(n, np.float64)
    for i, s in enumerate(texts):
        lines = s.split("\n")
        lc = Counter(lines)
        nl = len(lines)
        n_lines[i] = nl
        dup_line_frac[i] = (nl - len(lc)) / nl
        total_chars = sum(len(ln) for ln in lines)
        dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items() if c > 1)
        dup_char_frac[i] = dup_chars / total_chars if total_chars else 0.0
        words = ws_tokens(s.lower())
        if len(words) >= 2:
            gc = Counter(map(" ".join, zip(words, words[1:])))
            top2_frac[i] = max(gc.values()) / (len(words) - 1)
        else:
            top2_frac[i] = 0.0
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_lines": pa.array(n_lines),
            "dup_line_frac": pa.array(dup_line_frac),
            "dup_line_char_frac": pa.array(dup_char_frac),
            "top_2gram_frac": pa.array(top2_frac),
        }
    )


def q_repetition_stats(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination — flag training documents sharing any word
# 8-gram with an eval-benchmark document set (the standard train/test
# contamination check). The benchmark side is SMALL by construction (a
# fixed eval suite, not a second corpus): its distinct gram hashes are
# collected once on the driver (bounded, guarded) and broadcast via
# ray.put; the corpus side is a pure task-parallel map against the sorted
# hash array — no shuffle at any corpus scale. The driver testdata has one
# documents table, so docs with doc_id % DECON_BENCH_MOD == 0 stand in as
# the benchmark set (deterministic; at 100 TB this is a separate table).
# ---------------------------------------------------------------------------

DECON_NGRAM = 8
DECON_BENCH_MOD = 13
# benchmark gram sets are eval suites (≤ millions of grams); abort rather
# than silently pull an unbounded set through the driver
DECON_BENCH_GRAMS_MAX = 50_000_000


def _gram_hashes(words: list[str], n: int = DECON_NGRAM) -> np.ndarray:
    """Distinct word-n-gram 64-bit hashes of one document. Membership tests
    run on blake2b-64 hashes of the ' '-joined gram (collision probability
    ~|grams|^2/2^64 — exact in practice; the SQL oracle compares the gram
    strings themselves)."""
    from pie_ray.util import hash64_array

    if len(words) < n:
        return np.empty(0, np.uint64)
    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    return hash64_array(list(grams), salt=b"decon")


def q_decontaminate(sf_dir: str):
    """(doc_id, n_overlap) for every NON-benchmark document sharing ≥ 1
    word-8-gram with the benchmark set; n_overlap counts the doc's distinct
    contaminated grams."""
    import ray as _ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # pass 1: distinct benchmark gram hashes (per-batch unique, driver union)
    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t.column("text"), "").to_pylist()
        per_doc = [
            _gram_hashes(ws_tokens(s.lower()))
            for did, s in zip(ids, texts)
            if did % DECON_BENCH_MOD == 0
        ]
        merged = (
            np.unique(np.concatenate(per_doc)) if per_doc else np.empty(0, np.uint64)
        )
        return pa.table({"h": pa.array(merged, pa.uint64())})

    parts: list[np.ndarray] = []
    total = 0
    for b in docs.map_batches(bench_grams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        arr = b.column("h").to_numpy(zero_copy_only=False)
        total += len(arr)
        if total > DECON_BENCH_GRAMS_MAX:
            raise ValueError(
                f"benchmark gram set exceeds {DECON_BENCH_GRAMS_MAX} hashes; "
                "decontamination expects a small eval-benchmark side"
            )
        parts.append(arr)
    bench = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    )
    bench_ref = _ray.put(bench)

    # pass 2: task map over the corpus, searchsorted membership per doc
    def flag_overlap(t: pa.Table, ref=None) -> pa.Table:
        bench_sorted = _ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t.column("text"), "").to_pylist()
        out_ids: list[int] = []
        out_n: list[int] = []
        for did, s in zip(ids, texts):
            if did % DECON_BENCH_MOD == 0:
                continue
            g = _gram_hashes(ws_tokens(s.lower()))
            if len(g) == 0 or len(bench_sorted) == 0:
                continue
            pos = np.searchsorted(bench_sorted, g)
            ok = pos < len(bench_sorted)
            n_hit = int((bench_sorted[pos[ok]] == g[ok]).sum())
            if n_hit:
                out_ids.append(int(did))
                out_n.append(n_hit)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_overlap": pa.array(out_n, pa.int64()),
            }
        )

    return docs.map_batches(
        flag_overlap, fn_kwargs={"ref": bench_ref}, batch_format="pyarrow"
    )


def q_corpus_words(sf_dir: str):
    """Merged driver entry for the two corpus-wide word statistics (each
    keeps its own library function): op='count' rows are the full
    word-frequency table (>= WORD_COUNT_MIN), op='heavy' rows are the
    Misra-Gries + exact-second-pass heavy hitters."""
    wc = q_word_counts(sf_dir)
    hh = q_heavy_hitters(sf_dir)

    def tag_count(t: pa.Table) -> pa.Table:
        return t.append_column("op", pa.array(["count"] * len(t), pa.string()))

    hh_tagged = hh.append_column("op", pa.array(["heavy"] * len(hh), pa.string()))
    return ray.data.from_arrow(hh_tagged).union(
        wc.map_batches(tag_count, batch_format="pyarrow")
    )


def _tfidf_rank_bucket(g):
    g = g.drop_columns(["bucket"])
    order = pc.sort_indices(
        g,
        sort_keys=[
            ("doc_id", "ascending"),
            ("score", "descending"),
            ("word", "ascending"),
        ],
    )
    g = g.take(order)
    ids = g.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "word": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = ids[1:] != ids[:-1]
    starts = np.flatnonzero(new)
    base = np.zeros(n, np.int64)
    base[starts] = starts
    np.maximum.accumulate(base, out=base)
    rank = np.arange(n) - base + 1
    keep = rank <= TFIDF_TOP_K
    g = g.filter(pa.array(keep))
    return pa.table(
        {
            "doc_id": g.column("doc_id"),
            "word": g.column("word"),
            "tf": g.column("tf"),
            "df": g.column("df"),
            "rnk": pa.array(rank[keep], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Document chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------


def chunk_documents(ds, chunk_chars: int = 400, stride: int = 300,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split each document into overlapping character chunks (start offsets
    0, stride, 2*stride, ...; chunk length <= chunk_chars; every doc emits
    at least one chunk, empty text included). Offsets are code-point
    positions (Python slicing == SQL substr semantics). Stateless map-only
    explode, fuse-friendly, no shuffle; per-chunk substring extraction is
    a C-level str slice (the same per-doc Python cost every text op here
    pays to leave Arrow)."""
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_ids, out_off, out_chunk = [], [], []
        for i, txt in zip(ids, texts):
            txt = txt or ""
            for off in range(0, max(len(txt), 1), stride):
                out_ids.append(i)
                out_off.append(off)
                out_chunk.append(txt[off : off + chunk_chars])
        return pa.table(
            {
                id_col: pa.array(out_ids, t.column(id_col).type),
                "off": pa.array(out_off, pa.int64()),
                "chunk": pa.array(out_chunk, pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def q_chunk_documents(sf_dir: str):
    """Driver entry: 400-char chunks at stride 300 over the documents
    table — one row per (doc, offset)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_documents(ds)


# ---------------------------------------------------------------------------
# Per-source corpus report (the curation dashboard table)
# ---------------------------------------------------------------------------


def q_corpus_report(sf_dir: str):
    """One row per source: doc count, exact total whitespace tokens, exact
    distinct-text count and the duplicate fraction — the at-a-glance table
    a curation run starts from. Composition of existing pieces: map-side
    lowcard partials for counts/tokens (driver state = sources), ONE
    md5-bucketed exchange for the exact distinct count (the same two-phase
    shape as dedup_exact / count_distinct)."""
    import hashlib

    from pie_ray.util import bucket_count, bucket_hash_strings, hash64_array

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    nb = bucket_count(ds.size_bytes(), floor=64)

    def partial(t: pa.Table) -> pa.Table:
        tc = token_count_batch(t)
        part = pa.table(
            {
                "source": t.column("source"),
                "n_tok": tc.column("n_tokens_ws"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        gb = part.group_by(["source"]).aggregate([("n_tok", "sum"), ("one", "sum")])
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, ["source"], ["source", "tokens", "docs"])

    counts: dict[str, list[int]] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        c = counts.setdefault(row["source"], [0, 0])
        c[0] += row["docs"]
        c[1] += row["tokens"]

    def hashes(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        h = [hashlib.md5((s or "").encode("utf-8", "replace")).hexdigest() for s in texts]
        b = (bucket_hash_strings(h, salt=0x4E9) % nb).astype("int32")
        return pa.table(
            {
                "source": t.column("source"),
                "h": pa.array(h, pa.string()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def distinct_in_bucket(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        d = g.select(["source", "h"]).group_by(["source", "h"]).aggregate([])
        part = pa.table(
            {
                "source": d.column("source"),
                "one": pa.array(np.ones(d.num_rows, np.int64)),
            }
        )
        gb = part.group_by(["source"]).aggregate([("one", "sum")])
        return rename_grouped(gb, ["source"], ["source", "n_distinct"])

    distinct: dict[str, int] = {}
    for row in (
        ds.map_batches(hashes, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pyarrow")
        .take_all()
    ):
        distinct[row["source"]] = distinct.get(row["source"], 0) + row["n_distinct"]

    sources = sorted(counts)
    n_docs = np.array([counts[s][0] for s in sources], np.int64)
    n_dist = np.array([distinct.get(s, 0) for s in sources], np.int64)
    return pa.table(
        {
            "source": pa.array(sources, pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "total_tokens": pa.array([counts[s][1] for s in sources], pa.int64()),
            "n_distinct_texts": pa.array(n_dist, pa.int64()),
            "dup_frac": pa.array((n_docs - n_dist) * 1.0 / n_docs, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# blocklist screen — the C4-style banned-words gate (Raffel et al. 2020
# dropped any page containing a listed word; this emits the per-doc count
# and verdict so callers choose drop vs. downweight)
# ---------------------------------------------------------------------------

BLOCKLIST_WORDS = ("slow", "crash", "panic", "leak")


def blocklist_pattern(words=BLOCKLIST_WORDS) -> str:
    """Word-boundary RE2 alternation over lowercase text. RE2 is the
    point: pyarrow's count_substring_regex and DuckDB's regexp functions
    are BOTH RE2, so engine and oracle share one regex engine and the
    match count is exact by construction (no dialect drift)."""
    import re as _re

    return r"\b(" + "|".join(_re.escape(w) for w in sorted(words)) + r")\b"


def blocklist_screen_batch(t: pa.Table, pattern: str) -> pa.Table:
    """Vectorized: ONE Arrow RE2 kernel over the batch — no Python loop."""
    n = pc.count_substring_regex(
        pc.utf8_lower(t.column("text")), pattern=pattern
    )
    n = pc.cast(n, pa.int64())
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_blocked": n,
            "blocked": pc.greater(n, pa.scalar(0, pa.int64())),
        }
    )


def q_blocklist_screen(sf_dir: str):
    """Driver entry (SQL-oracled): per-document banned-word counts +
    verdict over the documents table. Stateless task map, column-pruned
    scan — the compiled RE2 automaton scans each batch once regardless of
    list size (the alternation compiles to one DFA), which is what makes
    a 10k-term blocklist affordable at corpus scale."""
    pattern = blocklist_pattern()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        blocklist_screen_batch,
        fn_kwargs={"pattern": pattern},
        batch_format="pyarrow",
    )


BLOCKLIST_ORACLE_SQL = f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{blocklist_pattern()}'))
             AS n_blocked,
           len(regexp_extract_all(lower(text), '{blocklist_pattern()}')) > 0
             AS blocked
    FROM documents
"""


# ---------------------------------------------------------------------------
# text embeddings — feature-hashed char-n-gram vectors (Weinberger et al.
# 2009 hashing trick with sign hashing = an implicit sparse random
# projection, the public recipe behind fast near-dup embeddings). The
# native feeder for the similarity/ANN/SemDeDup stack when no model
# embedding column exists.
# ---------------------------------------------------------------------------

EMBED_DIM = 64
EMBED_NGRAM = 3
EMBED_SALT = 0xE3BD


def embed_text_array(texts: list[str | None], dim: int = EMBED_DIM) -> np.ndarray:
    """(n_docs, dim) float32, L2-normalized. Per doc: sliding char
    3-gram codes over the lowercased UTF-8 bytes (one vectorized window
    view), each gram ADDS ±1 at h(gram) % dim — sign hashing keeps the
    expectation of unrelated-text dot products at 0, so cosine tracks
    n-gram overlap (Jaccard-ish) rather than length. Deterministic, one
    pass, no corpus state: the same text embeds identically at any
    partitioning, scale, or session. Empty/short texts embed to the zero
    vector (cosine 0 to everything — never a false near-dup)."""
    from pie_ray.util import hash64_ints

    out = np.zeros((len(texts), dim), np.float32)
    for i, s in enumerate(texts):
        b = np.frombuffer((s or "").lower().encode("utf-8"), np.uint8)
        if len(b) < EMBED_NGRAM:
            continue
        codes = (
            b[:-2].astype(np.int64) * 65536
            + b[1:-1].astype(np.int64) * 256
            + b[2:].astype(np.int64)
        )
        h = hash64_ints(codes, salt=EMBED_SALT)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sgn = ((h >> np.uint64(32)) & np.uint64(1)).astype(np.float32) * 2.0 - 1.0
        np.add.at(out[i], idx, sgn)
        n = float(np.linalg.norm(out[i]))
        if n > 0:
            out[i] /= n
    return out


def embed_text_batch(t: pa.Table, dim: int = EMBED_DIM) -> pa.Table:
    vecs = embed_text_array(t.column("text").to_pylist(), dim)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )


def q_embed_text(sf_dir: str):
    """Driver entry (rows-only; float vectors aren't hash-oracle
    material): hashed-n-gram embeddings for every document — the text
    side's entry into knn/ANN/SemDeDup. Stateless task map, pruned scan."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(embed_text_batch, batch_format="pyarrow")
