"""Deterministic hashing / seeding helpers.

All randomness in the engine (synthetic corpus, MinHash permutations,
partition assignment) derives from these so results are independent of
partitioning, parallelism level, and Python's per-process hash seed.
No third-party hash libs (xxhash/mmh3 unavailable in the sandbox) —
blake2b from hashlib is fast enough and stable everywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64


def stable_hash64(data: bytes | str, salt: bytes = b"") -> int:
    """Stable 64-bit hash (blake2b, 8-byte digest). Not Python's hash()."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8, key=salt[:64]).digest(), "little"
    )


def stable_hash32(data: bytes | str, salt: bytes = b"") -> int:
    return stable_hash64(data, salt) & 0xFFFFFFFF


def row_seed(base_seed: int, table: str, row_index: int) -> int:
    """Per-row RNG seed: hash(seed, table, row_index) — FIXTURES.md rule."""
    return stable_hash64(f"{base_seed}|{table}|{row_index}")


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def hash64_array(strs, salt: bytes = b"") -> np.ndarray:
    """Vectorized-ish stable 64-bit hash of an iterable of strings -> uint64."""
    out = np.empty(len(strs), dtype=_U64)
    h = hashlib.blake2b
    for i, s in enumerate(strs):
        if s is None:
            out[i] = 0
            continue
        if isinstance(s, str):
            s = s.encode("utf-8")
        out[i] = int.from_bytes(h(s, digest_size=8, key=salt[:64]).digest(), "little")
    return out


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
# bucket hashing folds at most this many leading bytes per string (plus the
# length) — longer strings share a bucket with their 48-byte-prefix+length
# twins, which only co-locates a few extra rows, never changes results
BUCKET_HASH_PREFIX = 48


def bucket_hash_strings(col, salt: int = 0, prefix: int | None = BUCKET_HASH_PREFIX) -> np.ndarray:
    """Vectorized 64-bit FNV-1a of an Arrow string/binary array (or a list
    of Python strings) -> uint64, for BUCKET ASSIGNMENT ONLY.

    ``hash64_array`` (blake2b) is a per-element Python loop — fine where
    hash values feed results, dominant cost where they only spread a
    shuffle. This walks the raw offsets/data buffers with a byte-POSITION
    loop (iterations = min(max length, BUCKET_HASH_PREFIX), each a numpy op
    over all rows), folds the true length, and finishes with a splitmix
    avalanche. Deterministic across processes/partitioning (pure function
    of bytes+salt); nulls hash to 0 like hash64_array.

    ``prefix`` caps the folded bytes (default BUCKET_HASH_PREFIX — plenty
    to SPREAD a shuffle). Pass ``prefix=None`` to fold the FULL content:
    needed when the hash feeds a membership structure (Bloom prefilters)
    where systematic prefix collisions would inflate false positives —
    iteration count becomes the batch's max length, still one numpy op
    per byte position, not per row."""
    import pyarrow as pa

    if isinstance(col, (list, tuple)):
        col = pa.array(col, pa.string())
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=_U64)
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    # slice-safe buffer views: honor arr.offset
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)

    h = np.full(n, _FNV_OFFSET ^ np.uint64((0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF))
    maxlen = int(lengths.max()) if n else 0
    for j in range(maxlen if prefix is None else min(maxlen, prefix)):
        mask = lengths > j
        hj = h[mask]
        hj = (hj ^ data[starts[mask] + j].astype(_U64)) * _FNV_PRIME
        h[mask] = hj
    h = (h ^ lengths.astype(_U64)) * _FNV_PRIME
    # splitmix finish so low bits are well-mixed for % num_buckets
    h = h ^ (h >> np.uint64(30))
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h = h ^ (h >> np.uint64(27))
    h = h * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    if arr.null_count:
        h[~arr.is_valid().to_numpy(zero_copy_only=False)] = 0
    return h


def hash64_ints(arr: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized splitmix64 of an integer array -> uint64 (C-speed bucket
    assignment for integer keys; the string paths keep blake2b). Purely a
    shuffle-spreading hash: results of bucketed operators never depend on
    WHICH bucket a key lands in, only that all rows of a key co-locate."""
    # salt mix wraps mod 2^64 in Python int space (a numpy scalar multiply
    # would emit a RuntimeWarning on the intended overflow)
    x = arr.astype(np.uint64) + np.uint64(
        (0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF
    )
    x = x ^ (x >> np.uint64(30))
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> np.uint64(27))
    x = x * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def part_of(key: str, num_parts: int) -> int:
    """Deterministic partition assignment hash(key) % P."""
    return stable_hash64(key, salt=b"part") % num_parts


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) numpy matrix from a list<float>/fixed_size_list Arrow column
    WITHOUT a Python-object round-trip (``to_pylist`` decodes every element
    into a PyObject — 10-50x slower than this flatten path at vector scale).

    ``flatten()`` honors list offsets (sliced/chunk-carved arrays included)
    and the values ``to_numpy`` is zero-copy for null-free float storage;
    the only copy is the optional dtype cast. Lists must be fixed-length
    (embedding columns are)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    if len(vals) % n != 0:
        raise ValueError(f"ragged list column: {len(vals)} values / {n} rows")
    return vals.reshape(n, len(vals) // n).astype(dtype, copy=False)


def rename_grouped(gb, keys: list[str], new_names: list[str]):
    """Positional rename of a pyarrow ``group_by().aggregate()`` output with
    a guard that the key columns come first. The ordering is undocumented
    and has differed across pyarrow versions — fail loudly on an upgrade
    instead of silently relabeling aggregate columns as keys."""
    if list(gb.column_names[: len(keys)]) != list(keys):
        raise RuntimeError(
            f"pyarrow group_by output order changed: {gb.column_names} "
            f"does not start with keys {keys}"
        )
    return gb.rename_columns(new_names)


def join_num_partitions(est_bytes: int | None = None, target_bytes: int = 64 << 20) -> int:
    """Scale-aware hash-join partition count (every ``Dataset.join`` call
    site routes through this instead of a hardcoded constant).

    BYTES-driven: ceil(est_bytes / 64 MB), clamped to [8, 4096]. Measured
    A/B at sf0.1 / 32 cpus: a cores-based floor (p=32) cost +2-3 s per join
    vs p=8 on MB-sized inputs — partition count must track data, not cores;
    on multi-GB joins the byte rule exceeds core count on its own. Without
    an estimate, fall back to cluster CPUs (capped) so a big unsized join
    still spreads. Pass ``est_bytes`` only from a metadata-backed source
    (``size_bytes()`` straight off ``read_parquet`` or a materialized
    dataset is O(1); on a mapped/filtered plan it would EXECUTE the plan —
    never do that here)."""
    if est_bytes:
        return int(min(max(8, -(-int(est_bytes) // target_bytes)), 4096))
    import ray

    try:
        ncpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        ncpus = 0
    return min(max(8, ncpus), 4096)


def gather_table(ds, schema=None):
    """Pull a BOUNDED Dataset to one driver-side pyarrow Table.

    Ray emits zero-row blocks with EMPTY schemas under some block layouts
    (observed at sf0.01/32 cpus, round-3 driver crash: ``pa.concat_tables``
    raises ArrowInvalid on the schema mix). Filter those out; when every
    block is empty, return ``schema.empty_table()`` so callers keep typed
    columns. Only ever call this on size-gated datasets (the caller owns
    the gate — e.g. DRIVER_EDGE_LIMIT in functions/graphops.py)."""
    import pyarrow as pa
    import ray

    tbls = [
        t
        for t in ray.get(ds.to_arrow_refs())
        if t.num_rows > 0 and t.num_columns > 0
    ]
    if not tbls:
        if schema is None:
            schema = ds.schema()
            schema = pa.schema(zip(schema.names, schema.types)) if schema else pa.schema([])
        return schema.empty_table()
    return pa.concat_tables(tbls, promote_options="none")


def drop_empty_blocks(ds, schema=None):
    """Strip Ray's zero-row EMPTY-SCHEMA blocks from a MATERIALIZED Dataset
    — ``groupby().map_groups()`` emits one per input block that received no
    groups, and a downstream ``Dataset.join`` crashes on them (ArrowInvalid:
    "No match ... for key field reference ... on right side"; reproduced
    round 4 — the same block family behind the round-3 concat crash).
    ``map_batches`` can NOT fix them (empty blocks bypass map functions),
    so filter by block METADATA only: zero data moves, refs are reused.
    When every block is empty, returns an empty Dataset with ``schema`` so
    callers keep typed columns. Call on the materialized output of any
    bucketed groupby that feeds a join."""
    import pyarrow as pa
    import ray.data

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, md in bundle.blocks:
            if (md.num_rows or 0) > 0:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow((schema or pa.schema([])).empty_table())
    return ray.data.from_arrow_refs(refs)


def bucket_count(
    est_bytes: int | None = None, floor: int = 64, target_bytes: int = 128 << 20
) -> int:
    """Scale-aware bucket count for the engine's bucketed groupbys (the
    ``hash(key) % N`` exchanges that replace high-cardinality Ray groupbys).

    One map_groups task must hold ~est_bytes / N in memory, so N must track
    data size, not stay a constant: ceil(est_bytes / 128 MB), clamped to
    [floor, 65536] (the SCALE.md rule of thumb: ~65k buckets at 10^12-doc
    corpora). ``floor`` is each call site's measured-good small-scale
    constant (32/64/128 today) so sandbox-scale perf is unchanged. Pass
    ``est_bytes`` only from a metadata-backed source (``size_bytes()`` off
    ``read_parquet`` or a materialized dataset — O(1); on a mapped plan it
    would EXECUTE the plan). Results of bucketed operators are invariant to
    N by contract (partitioning-independence tests); N only sizes tasks."""
    if not est_bytes:
        return floor
    return int(min(max(floor, -(-int(est_bytes) // target_bytes)), 65536))


def tune_data_context() -> None:
    """Right-size Ray Data's shuffle knobs to the actual cluster.

    The 2.49 defaults (200 shuffle partitions, up to 64 aggregator actors)
    are sized for large multi-node clusters; on a small cluster they spend
    seconds spinning up aggregator actors per shuffle. Scale them to the
    available CPUs instead — on a 256-node cluster this is a no-op (the
    computed values meet or exceed the defaults). Idempotent; called by
    pipeline/query entry points, never at import."""
    import ray

    try:
        ncpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        ncpus = 0
    if ncpus <= 0:
        return
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.default_hash_shuffle_parallelism = min(
        ctx.default_hash_shuffle_parallelism, max(8, 2 * ncpus)
    )
    # aggregator ACTORS spin up per exchange and dominate small-cluster
    # shuffle latency; few are plenty for the bounded-bucket shuffles this
    # engine emits (every groupby keys on <=256 buckets). The cap SCALES
    # with cluster size — ncpus//4 above 16 cpus (measured best: 8 actors
    # at 32 cpus), ncpus//2 below (4 at 8 cpus) — reaching the 2.49
    # default (64) at 256 cpus instead of throttling big clusters at 8.
    cap = max(2, ncpus // 4) if ncpus >= 16 else max(2, ncpus // 2)
    ctx.max_hash_shuffle_aggregators = min(ctx.max_hash_shuffle_aggregators, cap)
    ctx.min_parallelism = min(ctx.min_parallelism, max(8, 2 * ncpus))
