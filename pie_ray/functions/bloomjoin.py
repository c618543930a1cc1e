"""Bloom semi-join reduction — cut a hash join's shuffle volume by
prefiltering the BIG side against a Bloom filter of the SMALL side's keys
(the classic runtime-filter / sideways-information-passing technique in
distributed SQL engines, public recipe).

Why it matters at 100 TB: `Dataset.join` shuffles BOTH inputs end to end.
When the join is selective (most big-side rows have no partner — dimension
filters, incremental deltas, decontamination-style lookups), almost all of
that movement is waste. A Bloom filter over the small side's keys is a few
MB; broadcast once via ``ray.put``, it lets every big-side read task drop
non-matching rows BEFORE the exchange. Correctness is unconditional: Bloom
has NO false negatives, so every matching row survives; false positives
only let a few extra rows into the exact join, which drops them — the
result is bit-identical to the plain join (equivalence-tested).

All hashing is vectorized: splitmix64 for integer keys, full-content FNV-1a
over the Arrow buffers for strings (``prefix=None`` — a membership filter
cannot afford systematic prefix collisions, unlike bucket spreading).
The filter build is the repo's bucketed-OR exchange shape: per-batch
distinct-key bit positions ship (never rows), per-bucket dense sub-bitmaps
OR vectorized, the driver concatenates filter-sized byte slices.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.util import bucket_hash_strings, hash64_ints, join_num_partitions

BJ_BUCKETS = 64


def _key_hash_pair(col, salt: int) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2|1) uint64 pairs for double hashing; int64-vectorized for
    integer keys, full-content FNV for strings."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        k = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = hash64_ints(k, salt=salt)
        h2 = hash64_ints(k, salt=salt + 0x5D17)
    else:
        h1 = bucket_hash_strings(arr, salt=salt, prefix=None)
        h2 = bucket_hash_strings(arr, salt=salt + 0x5D17, prefix=None)
    return h1, h2 | np.uint64(1)


def _bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    m = int(math.ceil(-max(capacity, 1) * math.log(fpp) / (math.log(2) ** 2)))
    step = BJ_BUCKETS * 8
    m = ((m + step - 1) // step) * step
    h = max(1, round(m / max(capacity, 1) * math.log(2)))
    return m, h


def build_key_bloom(
    ds, col: str, capacity: int, fpp: float = 0.005, salt: int = 0xB100
) -> tuple[bytes, int, int]:
    """-> (packed bitmap bytes, m bits, h hashes) over ``ds[col]``'s keys
    (nulls never match a join, so they are skipped). One bucketed exchange;
    driver traffic = filter bytes."""
    m, h = _bloom_params(capacity, fpp)
    bucket_bits = m // BJ_BUCKETS
    bucket_bytes = bucket_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).combine_chunks().drop_null()
        keys = pc.unique(keys)
        if len(keys) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int32()), "pos": pa.array([], pa.int64())}
            )
        h1, h2 = _key_hash_pair(keys, salt)
        i = np.arange(h, dtype=np.uint64)
        pos = ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).ravel()
        pos = np.unique(pos).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((pos // bucket_bits).astype(np.int32), pa.int32()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def or_bucket(g: pa.Table) -> pa.Table:
        b = int(g.column("bucket")[0].as_py())
        rel = g.column("pos").to_numpy(zero_copy_only=False) - b * bucket_bits
        bits = np.zeros(bucket_bytes, np.uint8)
        np.bitwise_or.at(bits, rel >> 3, (1 << (rel & 7)).astype(np.uint8))
        return pa.table(
            {
                "bucket": pa.array([b], pa.int32()),
                "bits": pa.array([bits.tobytes()], pa.binary()),
            }
        )

    chunks = {
        r["bucket"]: r["bits"]
        for r in ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(or_bucket, batch_format="pyarrow")
        .take_all()
    }
    out = bytearray(m // 8)
    for b, bits in chunks.items():
        out[b * bucket_bytes : (b + 1) * bucket_bytes] = bits
    return bytes(out), m, h


def _bloom_mask(col, bits: np.ndarray, m: int, h: int, salt: int) -> np.ndarray:
    """bool array: key MAY be in the filter (nulls -> False)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros(0, bool)
    h1, h2 = _key_hash_pair(arr, salt)
    i = np.arange(h, dtype=np.uint64)
    pos = ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)
    got = (bits[pos >> 3] >> (pos & 7)) & 1
    mask = got.all(axis=1)
    if arr.null_count:
        mask &= arr.is_valid().to_numpy(zero_copy_only=False)
    return mask


def bloom_semi_join(
    big,
    small,
    on: str,
    right_on: str | None = None,
    fpp: float = 0.005,
    num_partitions: int | None = None,
):
    """INNER hash join with a Bloom runtime filter: ``big`` rows whose key
    cannot exist in ``small`` never enter the exchange. Result is
    bit-identical to ``big.join(small, "inner", ...)``; only the shuffle
    volume changes. ``small`` must be materialized (its count sizes the
    filter; it is consumed twice).

    Use when the join is SELECTIVE (filtered dimensions, delta lookups).
    When most big rows match, the filter passes everything and the extra
    map pass is overhead — this is an explicit tool, not a default."""
    import ray

    right_key = right_on or on
    cap = small.count()
    salt = 0xB100
    bits_b, m, h = build_key_bloom(small, right_key, capacity=cap, fpp=fpp, salt=salt)
    bits_ref = ray.put(np.frombuffer(bits_b, dtype=np.uint8))

    def prefilter(t: pa.Table, bref=None) -> pa.Table:
        mask = _bloom_mask(t.column(on), ray.get(bref), m, h, salt)
        return t.filter(pa.array(mask))

    filtered = big.map_batches(
        prefilter, fn_kwargs={"bref": bits_ref}, batch_format="pyarrow"
    ).materialize()
    np_parts = num_partitions or join_num_partitions(filtered.size_bytes())
    return filtered.join(
        small,
        join_type="inner",
        num_partitions=np_parts,
        on=(on,),
        right_on=(right_key,) if right_key != on else None,
    )
