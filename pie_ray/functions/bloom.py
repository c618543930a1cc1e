"""Bloom-filter membership — the incremental-ingestion primitive: build a
compact filter over the keys already in the corpus (urls, content hashes),
then screen a new batch of data against it with a stateless map. A hit
means "probably seen" (tunable false-positive rate), a miss is a hard
guarantee of "new" — so the filter can gate exact re-checks to a tiny
candidate set instead of a corpus-wide join.

Scale shape: the corpus pass emits per-batch (bucket, set-bit positions)
partials; ONE bucketed exchange ORs each bucket's dense sub-bitmap
vectorized, and the driver concatenates ``num_buckets`` byte slices into
the final filter — driver traffic is the FILTER size (m bits), never the
corpus. Membership testing broadcasts the packed filter once (``ray.put``)
and tests h positions per key with numpy bit ops.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pie_ray.util import hash64_array

BLOOM_BUCKETS = 64


class BloomFilter:
    """Packed little-endian bitmap + the (m, h, salt) recipe. Pure data —
    picklable, broadcastable."""

    def __init__(self, bits: np.ndarray, m: int, h: int, salt: bytes):
        self.bits = bits  # uint8, length m // 8
        self.m = m
        self.h = h
        self.salt = salt

    def positions(self, keys: list[str]) -> np.ndarray:
        """(len(keys), h) bit positions via double hashing."""
        h1 = hash64_array(keys, salt=self.salt + b"1")
        h2 = hash64_array(keys, salt=self.salt + b"2") | np.uint64(1)
        i = np.arange(self.h, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)).astype(
            np.int64
        )

    def contains(self, keys: list[str]) -> np.ndarray:
        if not keys:
            return np.zeros(0, bool)
        pos = self.positions(keys)
        got = (self.bits[pos >> 3] >> (pos & 7)) & 1
        return got.all(axis=1)


def _bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """Optimal (m bits, h hashes); m rounded up so every bucket is a whole
    number of bytes."""
    m = int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    step = BLOOM_BUCKETS * 8
    m = ((m + step - 1) // step) * step
    h = max(1, round(m / capacity * math.log(2)))
    return m, h


def bloom_build(
    ds,
    col: str,
    capacity: int,
    fpp: float = 0.01,
    salt: bytes = b"bloom",
) -> BloomFilter:
    """Build a Bloom filter over a string key column. ``capacity`` sizes
    the filter (expected distinct keys); the realized false-positive rate
    tracks ``fpp`` when capacity is honest."""
    m, h = _bloom_params(capacity, fpp)
    bucket_bits = m // BLOOM_BUCKETS
    bucket_bytes = bucket_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.fill_null(t.column(col), "").to_pylist()
        if not keys:
            return pa.table(
                {"bucket": pa.array([], pa.int32()), "pos": pa.array([], pa.int64())}
            )
        h1 = hash64_array(keys, salt=salt + b"1")
        h2 = hash64_array(keys, salt=salt + b"2") | np.uint64(1)
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

    out = np.zeros(m // 8, np.uint8)
    built = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(or_bucket, batch_format="pyarrow")
    )
    for bt in built.iter_batches(batch_format="pyarrow"):
        for b, raw in zip(bt.column("bucket").to_pylist(), bt.column("bits").to_pylist()):
            out[b * bucket_bytes : (b + 1) * bucket_bytes] = np.frombuffer(
                raw, np.uint8
            )
    return BloomFilter(out, m, h, salt)


def bloom_screen(ds, bloom: BloomFilter, col: str, keep: str = "new"):
    """Screen a dataset against a filter: ``keep='new'`` passes rows whose
    key is DEFINITELY unseen (the incremental-ingest fast path);
    ``keep='seen'`` passes the probable-duplicate candidates for an exact
    re-check. Stateless broadcast map, no shuffle."""
    if keep not in ("new", "seen"):
        raise ValueError(keep)
    ref = ray.put(bloom)

    def screen(t: pa.Table, bref=None) -> pa.Table:
        import pyarrow.compute as pc

        bf = ray.get(bref)
        keys = pc.fill_null(t.column(col), "").to_pylist()
        hit = bf.contains(keys)
        mask = ~hit if keep == "new" else hit
        return t.filter(pa.array(mask))

    return ds.map_batches(screen, fn_kwargs={"bref": ref}, batch_format="pyarrow")
