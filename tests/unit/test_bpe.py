"""BPE training/encoding gates: the distributed train equals a brute-force
single-process reference on the same corpus, is partition-independent, and
encode round-trips (tokens re-concatenate to the word sequence)."""

from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from pie_ray.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_train_from_word_freqs,
    encode_word,
)


def _brute_train(word_freqs: dict[str, int], num_merges: int):
    """Textbook BPE (full pair recount every iteration, no index)."""
    words = {w: tuple(w) + (EOW,) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for w, sym in words.items():
            f = word_freqs[w]
            for p in zip(sym, sym[1:]):
                stats[p] += f
        cands = [p for p, c in stats.items() if c > 1]
        if not cands:
            break
        pair = min(cands, key=lambda p: (-stats[p], p))
        merges.append(pair)
        a, b = pair
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = tuple(out)
    return merges


TOY = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_merge_loop_matches_brute_reference():
    assert bpe_train_from_word_freqs(TOY, 10) == _brute_train(TOY, 10)
    # the classic Sennrich example: 'est' forms first (freq 9)
    first = bpe_train_from_word_freqs(TOY, 3)
    assert first[0] == ("e", "s") and first[1] == ("es", "t")
    # deterministic tie-breaks: repeated runs identical
    assert bpe_train_from_word_freqs(TOY, 10) == bpe_train_from_word_freqs(TOY, 10)


def _docs_ds(texts, blocks=4):
    return ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(blocks)


@pytest.fixture(scope="module")
def corpus():
    import pyarrow.parquet as pq

    texts = (
        pq.read_table("/root/testdata/sf0.01/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    return texts


def test_distributed_train_matches_reference(ray_session, corpus):
    freqs = Counter()
    for s in corpus:
        freqs.update((s or "").lower().split())
    expect = _brute_train(dict(freqs), 60)

    got = bpe_train(_docs_ds(corpus, blocks=5), num_merges=60)
    assert got["merges"] == expect
    assert got["report"]["distinct_words"] == len(freqs)
    # partition independence
    got2 = bpe_train(_docs_ds(corpus, blocks=1), num_merges=60)
    assert got2["merges"] == got["merges"]


def test_train_bounds(ray_session, corpus):
    full = bpe_train(_docs_ds(corpus), num_merges=10, min_freq=5)
    capped = bpe_train(_docs_ds(corpus), num_merges=10, max_words=10)
    assert capped["report"]["dropped_by_max_words"] > 0
    # bounds are reported, and the capped run trains on the top-N table only
    freqs = Counter()
    for s in corpus:
        freqs.update((s or "").lower().split())
    top = dict(
        sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    assert capped["merges"] == bpe_train_from_word_freqs(top, 10)
    assert full["report"]["dropped_by_max_words"] == 0


def test_encode_roundtrip_and_parity(ray_session, corpus):
    trained = bpe_train(_docs_ds(corpus), num_merges=80)
    ranks = {tuple(p): i for i, p in enumerate(trained["merges"])}
    enc = bpe_encode(_docs_ds(corpus[:100], blocks=3), trained["merges"])
    for r in enc.take_all():
        words = (r["text"] or "").lower().split()
        # round-trip: tokens re-concatenate to the exact word sequence
        assert "".join(r["bpe_tokens"]) == "".join(w + EOW for w in words)
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
        # parity with the reference greedy encoder, word by word
        toks = []
        for w in words:
            toks.extend(encode_word(w, ranks))
        assert list(r["bpe_tokens"]) == toks


def test_encode_cache_is_per_merge_table(ray_session):
    # two different tokenizers in one Ray session must not share encodings
    import pyarrow as pa
    import ray.data

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["abab"])})
    )
    merges = bpe_train(docs, num_merges=4)["merges"]
    assert merges
    out1 = bpe_encode(docs, merges).to_pandas().bpe_tokens[0]
    out0 = bpe_encode(docs, []).to_pandas().bpe_tokens[0]  # NO merges
    assert len(out0) > len(out1)  # unmerged encoding is strictly longer
