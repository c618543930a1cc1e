"""Training-sequence packing and mixture sampling — the two layout steps
between a curated corpus and an LM pretraining run.

``pack_sequences`` implements concat-and-chunk packing: documents are laid
out in ONE deterministic global order (splitmix64 of doc_id — partitioning
and parallelism never change it), their whitespace-token streams are
conceptually concatenated, and the stream is cut into fixed ``seq_len``
sequences. The output is the (seq_id, doc_id) chunk table a loader needs:
which token span of which document lands where in which sequence. A doc
crossing a boundary yields one row per sequence it touches (fan-out is
bounded by n_tokens/seq_len + 1).

Scale shape: ONE bucketed exchange. Pass 1 computes per-bucket token totals
(NUM_PACK_BUCKETS partials — tiny) so the driver can prefix-sum bucket base
offsets; pass 2 shuffles docs by the TOP bits of the order hash (so buckets
are contiguous hash ranges = contiguous global ranges), sorts within the
bucket, and emits chunks vectorized. Per-bucket rows must fit a worker
(#docs/NUM_PACK_BUCKETS); raise NUM_PACK_BUCKETS with corpus size.

``sample_to_token_budget`` downsamples per source to hit target mixture
weights under a global token budget: per-source token totals (small — one
row per source) set deterministic hash-threshold keep rates, then one
stateless filter map does the sampling. Sources whose target exceeds their
inventory keep everything (rate capped at 1.0 — no upsampling here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pie_ray.functions.relational import lowcard_group_agg
from pie_ray.util import hash64_ints

TOKENS_PER_SEQ = 2048
NUM_PACK_BUCKETS = 64
PACK_ORDER_SALT = 17


def _order_hash(doc_ids: np.ndarray) -> np.ndarray:
    """The global packing order key (uint64). Pure function of doc_id."""
    return hash64_ints(doc_ids, salt=PACK_ORDER_SALT)


def _pack_bucket(h: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket = TOP bits of the order hash, so bucket k holds a contiguous
    hash range and global order == (bucket, hash, doc_id) order."""
    return (h // (2**64 // num_buckets)).astype(np.int64)


def pack_sequences(
    docs_ds,
    seq_len: int = TOKENS_PER_SEQ,
    num_buckets: int = NUM_PACK_BUCKETS,
):
    """(doc_id, n_tokens) Dataset -> chunk Dataset with columns

      seq_id    : which fixed-length training sequence
      doc_id    : source document
      tok_off   : chunk start INSIDE the document's token stream
      n_tok     : chunk length
      seq_off   : chunk start INSIDE the sequence

    Zero-token docs contribute nothing. Every (seq_id, seq_off..+n_tok)
    tiles [0, seq_len) per sequence (the last sequence may be short);
    every doc's chunks tile [0, n_tokens). Deterministic for any
    partitioning / num_buckets.
    """

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = _order_hash(ids)
        t = t.append_column("hkey", pa.array(h, pa.uint64()))
        return t.append_column(
            "bucket", pa.array(_pack_bucket(h, num_buckets), pa.int64())
        )

    # barrier over a SMALL intermediate (4 int columns per doc — no text):
    # both passes consume it, and without this the upstream corpus scan +
    # tokenize would execute twice
    keyed = docs_ds.map_batches(add_key, batch_format="pyarrow").materialize()

    # pass 1: per-bucket token totals -> driver prefix sum = base offsets
    totals = lowcard_group_agg(keyed, keys=["bucket"], sum_cols=["n_tokens"])
    bucket_ids = totals.column("bucket").to_numpy(zero_copy_only=False)
    bucket_tok = totals.column("n_tokens__sum").to_numpy(zero_copy_only=False)
    base = np.zeros(num_buckets + 1, np.int64)
    np.add.at(base, bucket_ids + 1, bucket_tok)
    base = np.cumsum(base)
    import ray as _ray

    bases = _ray.put(base)

    # pass 2: ONE exchange on bucket; sort inside, cumsum + base, emit chunks
    def emit_chunks(g: pa.Table, bases_ref=None) -> pa.Table:
        base_arr = _ray.get(bases_ref)
        bucket = int(g.column("bucket")[0].as_py())
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("hkey", "ascending"), ("doc_id", "ascending")]
            )
        )
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        ntok = g.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ntok > 0
        ids, ntok = ids[keep], ntok[keep]
        if len(ids) == 0:
            return pa.table(
                {
                    "seq_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "tok_off": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "seq_off": pa.array([], pa.int64()),
                }
            )
        end = base_arr[bucket] + np.cumsum(ntok)
        start = end - ntok
        s0 = start // seq_len
        s1 = (end - 1) // seq_len
        reps = (s1 - s0 + 1).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(ids)), reps)
        # sequence index per chunk: s0[doc] + position within the doc's run
        run_start = np.cumsum(reps) - reps
        within = np.arange(len(doc_idx)) - run_start[doc_idx]
        seq = s0[doc_idx] + within
        cs = np.maximum(start[doc_idx], seq * seq_len)
        ce = np.minimum(end[doc_idx], (seq + 1) * seq_len)
        return pa.table(
            {
                "seq_id": pa.array(seq, pa.int64()),
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "tok_off": pa.array(cs - start[doc_idx], pa.int64()),
                "n_tok": pa.array(ce - cs, pa.int64()),
                "seq_off": pa.array(cs - seq * seq_len, pa.int64()),
            }
        )

    return keyed.groupby("bucket").map_groups(
        emit_chunks, batch_format="pyarrow", fn_kwargs={"bases_ref": bases}
    )


def q_pack_sequences(sf_dir: str, seq_len: int = TOKENS_PER_SEQ):
    """Library/query surface: pack the documents table by whitespace token
    counts (the token_count contract). Not SQL-oracle-able in one query
    (the order key is a library hash); brute-force parity + tiling
    invariants gated in tests/unit/test_packing.py."""
    from pie_ray.functions.textops import token_count_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_counts(t: pa.Table) -> pa.Table:
        tc = token_count_batch(t)
        return pa.table(
            {
                "doc_id": tc.column("doc_id"),
                "n_tokens": tc.column("n_tokens_ws"),
            }
        )

    return pack_sequences(
        ds.map_batches(to_counts, batch_format="pyarrow"), seq_len=seq_len
    )


# ---------------------------------------------------------------------------
# Mixture sampling to a token budget
# ---------------------------------------------------------------------------

MIX_SAMPLE_SALT = 23


def sample_to_token_budget(
    docs_ds,
    budget_tokens: int,
    weights: dict[str, float] | None = None,
):
    """Keep a deterministic per-source subsample of (doc_id, source,
    n_tokens) rows so each source contributes ~``budget_tokens * w_source``
    tokens (weights are normalized; rates cap at 1.0 — a source smaller
    than its target keeps everything and the shortfall is reported, not
    silently reassigned).

    Returns (kept Dataset, report Table). The report has one row per
    source: available/target/expected tokens and the keep rate.
    """
    totals = lowcard_group_agg(docs_ds, keys=["source"], sum_cols=["n_tokens"])
    avail = dict(
        zip(
            totals.column("source").to_pylist(),
            totals.column("n_tokens__sum").to_pylist(),
        )
    )
    if weights is None:  # equal mixture across observed sources
        weights = {s: 1.0 for s in avail}
    wsum = sum(weights.values())
    norm = {s: w / wsum for s, w in weights.items()}
    rates: dict[str, float] = {}
    rows = []
    for s, a in sorted(avail.items()):
        target = budget_tokens * norm.get(s, 0.0)
        rate = min(1.0, target / a) if a > 0 else 0.0
        rates[s] = rate
        rows.append(
            {
                "source": s,
                "available_tokens": int(a),
                "target_tokens": int(target),
                "keep_rate": rate,
                "expected_tokens": int(a * rate),
            }
        )
    report = pa.Table.from_pylist(rows)

    import ray as _ray

    rates_ref = _ray.put(rates)

    def keep(t: pa.Table, ref=None) -> pa.Table:
        r = _ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        srcs = t.column("source").to_pylist()
        # uniform in [0,1) as a pure function of doc_id — rerunnable,
        # partition-independent
        u = hash64_ints(ids, salt=MIX_SAMPLE_SALT).astype(np.float64) / 2.0**64
        thresh = np.array([r.get(s, 0.0) for s in srcs])
        return t.filter(pa.array(u < thresh))

    kept = docs_ds.map_batches(keep, fn_kwargs={"ref": rates_ref}, batch_format="pyarrow")
    return kept, report


def q_sample_to_token_budget(
    sf_dir: str, budget_tokens: int = 50_000, weights: dict[str, float] | None = None
):
    """Library surface over the documents table (whitespace token counts;
    equal source weights by default). Deterministic; per-source budget
    adherence and determinism gated in tests/unit/test_packing.py."""
    from pie_ray.functions.textops import token_count_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def to_counts(t: pa.Table) -> pa.Table:
        tc = token_count_batch(t)
        return pa.table(
            {
                "doc_id": tc.column("doc_id"),
                "source": t.column("source"),
                "n_tokens": tc.column("n_tokens_ws"),
            }
        )

    counted = ds.map_batches(to_counts, batch_format="pyarrow")
    return sample_to_token_budget(counted, budget_tokens, weights)
