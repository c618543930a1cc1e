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



def token_count_batch(t: pa.Table) -> pa.Table:
    text = t.column("text")
    # whitespace token count, fully vectorized: split trimmed text on \s+ runs
    trimmed = pc.utf8_trim_whitespace(text)
    ws_counts = pc.if_else(
        pc.equal(trimmed, ""),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")), pa.int64()),
    )
    bpe_counts = pa.array(
        [len(_BPE_RX.findall(s)) if s else 0 for s in text.to_pylist()], pa.int64()
    )
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens_ws": ws_counts,
            "n_tokens_bpe": bpe_counts,
        }
    )


def q_token_count(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


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
        arr = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
        is_alpha = ((arr >= 65) & (arr <= 90)) | ((arr >= 97) & (arr <= 122))
        is_punct = np.isin(arr, _PUNCT_BYTES)
        alpha_ratio[i] = is_alpha.mean()
        punct_ratio[i] = is_punct.mean()
        words = s.lower().split()
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


_PUNCT_BYTES = np.frombuffer(b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~", dtype=np.uint8)


def q_quality(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


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


# ---------------------------------------------------------------------------
# corpus-wide word counts — the explode/flat_map shape of LM-data prep
# (vocabulary building, heavy-hitter filtering). Per-batch partial counts
# BEFORE the shuffle (each batch ships its distinct words once, not every
# token), then the usual hash-bucket shuffle + vectorized Arrow sum.
# ---------------------------------------------------------------------------

WORD_COUNT_MIN = 10
WC_BUCKETS = 64


def q_word_counts(sf_dir: str):
    """(word, n) for every whitespace-token word appearing >= WORD_COUNT_MIN
    times corpus-wide. Vocabulary is high-cardinality: counts combine
    per-batch first, shuffle on hash(word) % 64 buckets."""
    from collections import Counter

    from pie_ray.util import hash64_array

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update((s or "").lower().split())
        words = list(c.keys())
        tb = pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], pa.int64()),
            }
        )
        b = (hash64_array(words, salt=b"wc") % WC_BUCKETS).astype("int32")
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
