"""Sequence packing + mixture-budget sampling (pie_ray.functions.packing).

Packing has no single-query SQL oracle (the global order key is a library
hash), so the gate is a Python brute-force reference doing the identical
concat-and-chunk layout, plus the structural tiling invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pie_ray.functions.packing import (
    _order_hash,
    pack_sequences,
    sample_to_token_budget,
)


def _brute_force_chunks(doc_tokens: dict[int, int], seq_len: int):
    """Reference concat-and-chunk in the library's global order."""
    ids = np.array(sorted(doc_tokens), dtype=np.int64)
    order = np.lexsort((ids, _order_hash(ids)))
    rows = []
    pos = 0
    for i in order:
        did = int(ids[i])
        n = doc_tokens[did]
        if n == 0:
            continue
        off = 0
        while off < n:
            seq = (pos + off) // seq_len
            take = min(n - off, (seq + 1) * seq_len - (pos + off))
            rows.append(
                (seq, did, off, take, (pos + off) - seq * seq_len)
            )
            off += take
        pos += n
    return sorted(rows)


def _chunk_rows(res) -> list[tuple]:
    df = res.to_pandas()
    return sorted(
        zip(df.seq_id, df.doc_id, df.tok_off, df.n_tok, df.seq_off)
    )


@pytest.mark.parametrize("seq_len", [16, 50])
def test_pack_matches_brute_force_and_tiles(ray_session, seq_len):
    import ray.data

    rng = np.random.default_rng(7)
    doc_tokens = {int(i): int(rng.integers(0, 120)) for i in range(300)}
    doc_tokens[3] = 0          # zero-token doc contributes nothing
    doc_tokens[5] = 500        # one doc spanning many sequences
    t = pa.table(
        {
            "doc_id": pa.array(sorted(doc_tokens), pa.int64()),
            "n_tokens": pa.array(
                [doc_tokens[i] for i in sorted(doc_tokens)], pa.int64()
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    got = _chunk_rows(pack_sequences(ds, seq_len=seq_len))
    want = _brute_force_chunks(doc_tokens, seq_len)
    assert got == want

    # tiling invariants
    total = sum(doc_tokens.values())
    per_seq: dict[int, list] = {}
    per_doc: dict[int, int] = {}
    for seq, did, tok_off, n_tok, seq_off in got:
        assert n_tok > 0
        per_seq.setdefault(seq, []).append((seq_off, n_tok))
        per_doc[did] = per_doc.get(did, 0) + n_tok
    assert per_doc == {d: n for d, n in doc_tokens.items() if n > 0}
    n_seqs = -(-total // seq_len)
    assert set(per_seq) == set(range(n_seqs))
    for seq, chunks in per_seq.items():
        chunks.sort()
        expect_len = seq_len if seq < n_seqs - 1 else total - seq_len * (n_seqs - 1)
        pos = 0
        for off, n in chunks:
            assert off == pos  # chunks tile the sequence with no gaps
            pos += n
        assert pos == expect_len


def test_pack_independent_of_partitioning_and_buckets(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(list(range(500)), pa.int64()),
            "n_tokens": pa.array([(i * 37) % 90 for i in range(500)], pa.int64()),
        }
    )
    base = _chunk_rows(
        pack_sequences(ray.data.from_arrow(t), seq_len=64, num_buckets=64)
    )
    for blocks, buckets in ((1, 8), (17, 64), (5, 32)):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = _chunk_rows(pack_sequences(ds, seq_len=64, num_buckets=buckets))
        assert got == base, (blocks, buckets)


def test_pack_documents_table_end_to_end(ray_session):
    from pie_ray.functions.packing import q_pack_sequences

    df = q_pack_sequences("/root/testdata/sf0.001", seq_len=256).to_pandas()
    assert len(df) > 0
    # full sequences carry exactly 256 tokens
    sums = df.groupby("seq_id").n_tok.sum()
    assert (sums.iloc[:-1] == 256).all() if len(sums) > 1 else True
    assert sums.max() <= 256


def test_sample_to_token_budget_rates_and_determinism(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    n = 4000
    srcs = [("web", "books", "code")[i % 3] for i in range(n)]
    toks = rng.integers(10, 200, n)
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "source": pa.array(srcs, pa.string()),
            "n_tokens": pa.array(toks, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    budget = 60_000
    weights = {"web": 2.0, "books": 1.0, "code": 1.0}
    kept, report = sample_to_token_budget(ds, budget, weights)
    kdf = kept.to_pandas()
    rep = {r["source"]: r for r in report.to_pylist()}

    # targets: normalized weights x budget; rates capped at 1
    for s in weights:
        target = budget * weights[s] / 4.0
        assert rep[s]["target_tokens"] == int(target)
        assert 0.0 <= rep[s]["keep_rate"] <= 1.0
    # achieved tokens per source near target (hash-uniform: 3 sigma on docs)
    g = kdf.groupby("source").n_tokens.sum()
    for s in weights:
        if rep[s]["keep_rate"] < 1.0:
            avail = rep[s]["available_tokens"]
            sd = 3 * np.sqrt(rep[s]["keep_rate"] * avail * 200)
            assert abs(g[s] - rep[s]["target_tokens"]) < sd, (s, g[s], rep[s])

    # determinism across partitioning
    kept2, _ = sample_to_token_budget(ds.repartition(13), budget, weights)
    assert sorted(kdf.doc_id) == sorted(kept2.to_pandas().doc_id)

    # a tiny source keeps everything (rate 1.0) rather than upsampling
    small = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "source": pa.array(["rare", "rare"], pa.string()),
            "n_tokens": pa.array([5, 5], pa.int64()),
        }
    )
    kept3, rep3 = sample_to_token_budget(
        ray.data.from_arrow(small), 1_000_000, {"rare": 1.0}
    )
    assert kept3.count() == 2
    assert rep3.to_pylist()[0]["keep_rate"] == 1.0
