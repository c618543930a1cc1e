"""Persisted MinHash-LSH near-dup index — screen NEW crawls against an
EXISTING corpus at delta cost (the content-level twin of incremental.py's
exact-url ledger).

Problem shape at 100 TB: the corpus is already near-dup-deduplicated and
indexed; every day a crawl arrives that is small relative to the corpus.
Running the one-shot ``q_dedup_minhash`` over (corpus ∪ crawl) re-bands and
re-shuffles the WHOLE corpus per crawl — corpus cost. This module persists
the banding work once — per-doc LSH band keys and shingle-hash blobs as
append-only parquet deltas — so a screen touches only:

- ONE streaming scan of the band index with a Bloom prefilter of the new
  crawl's band keys applied INSIDE the scan tasks (``bloomjoin``; false
  positives are harmless because every candidate is verified by exact
  Jaccard, so the filter can be small) — only colliding rows leave the scan,
- one hash join of those (collision-sized) rows against the new bands,
- a candidate-filtered fetch of the matching docs' stored shingle blobs,
- exact-Jaccard verify, size-adaptive exactly like ``dedup._verified_pairs``
  (driver combine below ``VERIFY_DRIVER_PAIRS`` candidate pairs, two hash
  joins above).

Semantics = union clustering: the screen's kept set equals what one-shot
near-dup dedup over (index docs ∪ new docs) would keep from the NEW side,
at the same LSH recall — a new doc is dropped iff its near-dup cluster
(within the crawl, at ``tau``) touches the index, or it is a non-minimal
member of a crawl-only cluster. A new doc whose KEY already exists in the
index pairs with its stored twin like any other candidate: an unchanged
recrawl verifies at Jaccard 1.0 and is dropped; a heavily edited recrawl
survives.

Crash safety: an append writes its delta dirs first and commits by bumping
``meta.json`` (atomic tmp+rename, the same discipline as incremental's
ledger) — readers glob only committed slots, and a replayed append clears
and rewrites the uncommitted slot before committing.

Scale posture per stage (10^12-doc index, 10^7-doc crawl):
- band/shingle computation: stateless task maps over the crawl only;
- index scan: embarrassingly parallel, Bloom-pruned at the source, output
  is collision-sized (≈ true candidates + fpp · index rows);
- verify: candidate-pair-sized either path;
- drop-set application: broadcast ``pc.is_in`` task map while the dropped
  minority fits ``DROP_BROADCAST_LIMIT``, ``left_anti`` hash join above
  (an all-dup recrawl is the worst case, and it degrades to one join).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from pie_ray.functions.dedup import (
    DOC_BANDS,
    DOC_NUM_PERMS,
    DOC_ROWS,
    DOC_SHINGLE_W,
    DOC_TAU,
    VERIFY_DRIVER_PAIRS,
    _jac_sorted,
    doc_minhash,
    word_shingles,
)
from pie_ray.state.dsu import DSU
from pie_ray.util import (
    bucket_count,
    bucket_hash_strings,
    drop_empty_blocks,
    join_num_partitions,
    stable_hash64,
)

META_NAME = "meta.json"
# dropped keys broadcast as an anti-membership filter below this count;
# above it the kept set comes from a left_anti hash join (same rule as
# pagequality's drop-set application)
DROP_BROADCAST_LIMIT = 2_000_000
# candidate OLD keys broadcast into the shingle-store scan below this
# count; candidate sets are collision-sized, so this bounds driver memory
# at ~100 MB of key strings before the seam raises toward a join fetch
CAND_KEY_BROADCAST_LIMIT = 2_000_000

_PAIR_SCHEMA = pa.schema([("key", pa.string()), ("new_key", pa.string())])


# ---------------------------------------------------------------------------
# per-batch kernels (string-keyed twins of dedup.py's doc_id-keyed ones)
# ---------------------------------------------------------------------------


def bands_batch(t: pa.Table, key_col: str = "key", text_col: str = "text") -> pa.Table:
    """(band_key, key) rows — DOC_BANDS rows per input doc."""
    keys = t.column(key_col).to_pylist()
    texts = t.column(text_col).to_pylist()
    out_band: list[str] = []
    out_key: list[str] = []
    for k, s in zip(keys, texts):
        sig = doc_minhash(s)
        for b in range(DOC_BANDS):
            chunk = sig[b * DOC_ROWS : (b + 1) * DOC_ROWS]
            out_band.append(f"{b}:{stable_hash64(chunk.tobytes()):016x}")
            out_key.append(k)
    return pa.table(
        {
            "band_key": pa.array(out_band, pa.string()),
            "key": pa.array(out_key, pa.string()),
        }
    )


def shingles_batch(
    t: pa.Table, key_col: str = "key", text_col: str = "text"
) -> pa.Table:
    """(key, sh) rows — sh is the sorted distinct shingle-hash u64 blob
    (binary, not list: blobs ride joins unchanged)."""
    texts = t.column(text_col).to_pylist()
    blobs = []
    for s in texts:
        sh = word_shingles(s)
        if sh:
            u = np.unique(
                np.fromiter((stable_hash64(x) for x in sh), np.uint64, len(sh))
            )
            blobs.append(u.tobytes())
        else:
            blobs.append(b"")
    return pa.table(
        {
            "key": pc.cast(t.column(key_col), pa.string()),
            "sh": pa.array(blobs, pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# store layout / meta commit
# ---------------------------------------------------------------------------


def _read_meta(root: str) -> dict | None:
    p = os.path.join(root, META_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_meta(root: str, meta: dict) -> None:
    """Atomic commit point: tmp + fsync + rename (a torn meta.json would
    orphan the whole index)."""
    p = os.path.join(root, META_NAME)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def _params() -> dict:
    return {
        "num_perms": DOC_NUM_PERMS,
        "bands": DOC_BANDS,
        "rows": DOC_ROWS,
        "shingle_w": DOC_SHINGLE_W,
    }


def _committed_files(root: str, sub: str, n_deltas: int) -> list[str]:
    files: list[str] = []
    for k in range(n_deltas):
        files.extend(
            sorted(glob.glob(os.path.join(root, sub, f"delta_{k:06d}", "*.parquet")))
        )
    return files


def lsh_index_append(
    root: str,
    docs_ds,
    key_col: str = "key",
    text_col: str = "text",
    slot: int | None = None,
) -> dict:
    """Append one committed delta of band keys + shingle blobs for
    ``docs_ds``. Crash-safe: the slot's dirs are cleared and rewritten on
    replay (an uncommitted slot is invisible to readers), then ``meta.json``
    commits. Callers screen BEFORE appending — the index does not dedup what
    it is given.

    ``slot`` pins the delta number for callers whose slots are aligned with
    external durable state (incremental.py's increment numbers): a replayed
    or enlarged slot REWRITES in place and the per-delta doc counts in the
    meta are corrected, so replays converge instead of duplicating. Slots
    may be SPARSE (missing slot dirs read as empty — incremental's
    compaction collapses history into slot 0 while increment numbers keep
    growing); ``delta_docs`` zero-pads the gap."""
    import pyarrow.parquet as pq

    meta = _read_meta(root)
    if meta is None:
        os.makedirs(root, exist_ok=True)
        meta = {"n_deltas": 0, "delta_docs": [], **_params()}
    else:
        for k, v in _params().items():
            if meta.get(k) != v:
                raise ValueError(
                    f"index at {root} was built with {k}={meta.get(k)}, "
                    f"engine now uses {v} — rebuild the index"
                )
    k = meta["n_deltas"] if slot is None else slot
    bands_dir = os.path.join(root, "bands", f"delta_{k:06d}")
    sh_dir = os.path.join(root, "shingles", f"delta_{k:06d}")
    for d in (bands_dir, sh_dir):
        shutil.rmtree(d, ignore_errors=True)  # crashed-replay slot hygiene
        os.makedirs(d, exist_ok=True)
    # ONE execution of the (possibly expensive) upstream plan feeds both
    # writes; the projection is narrow (key + text)
    docs = docs_ds.map_batches(
        lambda t, kc=key_col, tc=text_col: pa.table(
            {"key": pc.cast(t.column(kc), pa.string()), "text": t.column(tc)}
        ),
        batch_format="pyarrow",
    ).materialize()
    if docs.count() > 0:
        docs.map_batches(bands_batch, batch_format="pyarrow").write_parquet(bands_dir)
        docs.map_batches(shingles_batch, batch_format="pyarrow").write_parquet(sh_dir)
    n_docs = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(sh_dir, "*.parquet"))
    )
    dd = list(meta.get("delta_docs", []))
    while len(dd) <= k:
        dd.append(0)
    dd[k] = n_docs
    meta["delta_docs"] = dd
    meta["n_deltas"] = max(meta["n_deltas"], k + 1)
    meta["n_docs"] = int(sum(dd))
    _write_meta(root, meta)
    return {"delta": k, "n_docs": n_docs}


def refresh_meta_counts(root: str) -> dict:
    """Recount per-delta docs from the shingle parquet metadata and rewrite
    the meta (for callers that rewrite delta files in place — e.g.
    GDPR-erasure filtering rows out of committed deltas)."""
    import pyarrow.parquet as pq

    meta = _read_meta(root)
    if meta is None:
        raise ValueError(f"no index at {root}")
    dd = []
    for k in range(meta["n_deltas"]):
        dd.append(
            sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(
                    os.path.join(root, "shingles", f"delta_{k:06d}", "*.parquet")
                )
            )
        )
    meta["delta_docs"] = dd
    meta["n_docs"] = int(sum(dd))
    _write_meta(root, meta)
    return meta


def lsh_index_build(
    docs_ds, root: str, key_col: str = "key", text_col: str = "text"
) -> dict:
    """Initialize ``root`` (must not already hold an index) with delta 0."""
    if _read_meta(root) is not None:
        raise ValueError(f"{root} already holds an index — use lsh_index_append")
    return lsh_index_append(root, docs_ds, key_col=key_col, text_col=text_col)


# ---------------------------------------------------------------------------
# screen
# ---------------------------------------------------------------------------


def _distinct_str_pairs(cand, a_col: str, b_col: str, nb: int | None = None):
    """Bucketed global distinct over string pairs (hash(a)^rot(hash(b))
    buckets, vectorized Arrow group_by inside — never a raw groupby on the
    pair key). Pass ``nb`` when ``cand`` is lazy (size_bytes would execute
    the plan twice)."""
    if nb is None:
        nb = bucket_count(cand.size_bytes(), floor=64)

    def add_bucket(t: pa.Table) -> pa.Table:
        ha = bucket_hash_strings(t.column(a_col), salt=0xD1)
        hb = bucket_hash_strings(t.column(b_col), salt=0xD2)
        h = (ha ^ ((hb << np.uint64(1)) | (hb >> np.uint64(63)))) % nb
        return pa.table(
            {
                a_col: t.column(a_col),
                b_col: t.column(b_col),
                "bucket": pa.array(h.astype(np.int32), pa.int32()),
            }
        )

    def uniq(g: pa.Table) -> pa.Table:
        return g.drop_columns(["bucket"]).group_by([a_col, b_col]).aggregate([])

    return (
        cand.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def _intra_pairs(new_bands, num_buckets: int):
    """Candidate (a < b) pairs among the NEW docs themselves — the same
    bucketed band walk as dedup._band_pairs, string-keyed."""

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (bucket_hash_strings(t.column("band_key"), salt=0xBAD) % num_buckets).astype(
            "int32"
        )
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def pairs(group: pa.Table) -> pa.Table:
        by_band: dict[str, set[str]] = {}
        for bk, k in zip(
            group.column("band_key").to_pylist(), group.column("key").to_pylist()
        ):
            by_band.setdefault(bk, set()).add(k)
        a: list[str] = []
        b: list[str] = []
        seen: set[tuple[str, str]] = set()
        from pie_ray.functions.dedup import MAX_BUCKET

        for ids_set in by_band.values():
            if len(ids_set) < 2:
                continue
            ids = sorted(ids_set)
            if len(ids) <= MAX_BUCKET:
                it = (
                    (ids[i], ids[j])
                    for i in range(len(ids))
                    for j in range(i + 1, len(ids))
                )
            else:  # hot band: chain keeps connectivity at O(n) edges
                it = zip(ids, ids[1:])
            for p in it:
                if p not in seen:
                    seen.add(p)
                    a.append(p[0])
                    b.append(p[1])
        return pa.table({"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})

    return (
        new_bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: pairs(g.drop_columns(["bucket"])), batch_format="pyarrow")
    )


def _fetch_shingles_map(sh_ds, keys: list[str]) -> dict[str, np.ndarray]:
    """Driver pull of shingle blobs for EXACTLY ``keys`` (candidate-filtered
    inside the scan tasks; the pull is candidate-sized, never store-sized)."""
    if not keys:
        return {}
    if len(keys) > CAND_KEY_BROADCAST_LIMIT:
        raise NotImplementedError(
            f"{len(keys)} candidate keys exceed the shingle-fetch broadcast "
            "budget — at this collision volume use the distributed verify "
            "path (force_distributed=True)"
        )
    ks = pa.array(sorted(keys), pa.string())
    kref = ray.put(ks)

    def keep(t: pa.Table, keys_ref=None) -> pa.Table:
        return t.filter(pc.is_in(t.column("key"), value_set=ray.get(keys_ref)))

    out: dict[str, np.ndarray] = {}
    got = sh_ds.map_batches(
        keep, fn_kwargs={"keys_ref": kref}, batch_format="pyarrow"
    )
    for b in got.iter_batches(batch_format="pyarrow", batch_size=65536):
        for k, blob in zip(b.column("key").to_pylist(), b.column("sh").to_pylist()):
            out[k] = np.frombuffer(blob, np.uint64)
    return out


def _verify_pairs_driver(
    pairs: list[tuple[str, str]],
    sh_a: dict[str, np.ndarray],
    sh_b: dict[str, np.ndarray],
    tau: float,
) -> set[tuple[str, str]]:
    empty = np.empty(0, np.uint64)
    return {
        (a, b)
        for a, b in pairs
        if _jac_sorted(sh_a.get(a, empty), sh_b.get(b, empty)) >= tau
    }


def _verify_pairs_joined(pairs_ds, sh_a_ds, sh_b_ds, a_col, b_col, tau):
    """Distributed verify: two hash joins against the shingle sides, exact
    Jaccard per batch. materialize() barriers between the exchanges (two
    concurrent all-to-alls deadlock small CPU budgets)."""
    pairs_ds = drop_empty_blocks(
        pairs_ds.materialize(),
        schema=pa.schema([(a_col, pa.string()), (b_col, pa.string())]),
    ).materialize()
    n_parts = join_num_partitions(pairs_ds.size_bytes())

    def _ren_a(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["sh_a" if c == "sh" else c for c in t.column_names])
        extra = [c for c in t.column_names if c.endswith("__r")]
        return t.drop_columns(extra) if extra else t

    # join inputs must carry NO empty-schema blocks (read_parquet oversplit
    # and groupby layouts both produce them; Ray's hash join crashes on
    # them and map fns can't normalize them because empty blocks skip maps)
    sh_a_ds = drop_empty_blocks(
        sh_a_ds.map_batches(
            lambda t, ac=a_col: pa.table(
                {ac + "__r": t.column("key"), "sh": t.column("sh")}
            ),
            batch_format="pyarrow",
        ).materialize(),
        schema=pa.schema([(a_col + "__r", pa.string()), ("sh", pa.binary())]),
    ).materialize()
    j1 = pairs_ds.join(
        sh_a_ds,
        join_type="inner",
        num_partitions=n_parts,
        on=(a_col,),
        right_on=(a_col + "__r",),
    )
    j1 = j1.map_batches(_ren_a, batch_format="pyarrow").materialize()
    j1 = drop_empty_blocks(
        j1,
        schema=pa.schema(
            [(a_col, pa.string()), (b_col, pa.string()), ("sh_a", pa.binary())]
        ),
    ).materialize()
    if j1.count() == 0:  # 0-row join inputs crash Ray's hash shuffle
        return ray.data.from_arrow(
            pa.table({a_col: pa.array([], pa.string()), b_col: pa.array([], pa.string())})
        )
    sh_b_ds = drop_empty_blocks(
        sh_b_ds.map_batches(
            lambda t, bc=b_col: pa.table(
                {bc + "__r": t.column("key"), "sh": t.column("sh")}
            ),
            batch_format="pyarrow",
        ).materialize(),
        schema=pa.schema([(b_col + "__r", pa.string()), ("sh", pa.binary())]),
    ).materialize()
    j2 = j1.join(
        sh_b_ds,
        join_type="inner",
        num_partitions=n_parts,
        on=(b_col,),
        right_on=(b_col + "__r",),
    )

    def verify(t: pa.Table) -> pa.Table:
        keep = [
            _jac_sorted(np.frombuffer(x, np.uint64), np.frombuffer(y, np.uint64)) >= tau
            for x, y in zip(t.column("sh_a").to_pylist(), t.column("sh").to_pylist())
        ]
        return t.select([a_col, b_col]).filter(pa.array(keep, pa.bool_()))

    return j2.map_batches(verify, batch_format="pyarrow").materialize()


def lsh_index_screen(
    root: str,
    new_docs_ds,
    key_col: str = "key",
    text_col: str = "text",
    tau: float = DOC_TAU,
    force_distributed: bool = False,
    return_drop_keys: bool = False,
):
    """-> (kept_ds, report). ``kept_ds`` filters ``new_docs_ds`` (all its
    columns) to the docs that survive BOTH screens: near-dup-of-index and
    intra-crawl near-dup (keep = lexicographic min key per crawl-only
    cluster; a cluster touching the index keeps nothing — its
    representative already lives in the corpus).

    ``return_drop_keys=True`` adds the sorted dropped-key list to the
    report (``drop_keys``) for callers that must filter a SIBLING dataset
    by the verdict (e.g. pages by url); the drop set is minority-sized by
    construction — an all-dup recrawl is the bounded worst case.

    The caller appends the survivors: ``lsh_index_append(root, kept_ds)``."""
    meta = _read_meta(root)
    if meta is None or meta["n_deltas"] == 0:
        raise ValueError(f"no committed index at {root}")
    for k, v in _params().items():
        if meta.get(k) != v:
            raise ValueError(
                f"index at {root} was built with {k}={meta.get(k)}, engine "
                f"now uses {v} — rebuild the index"
            )

    new = new_docs_ds.map_batches(
        lambda t, kc=key_col, tc=text_col: pa.table(
            {"key": pc.cast(t.column(kc), pa.string()), "text": t.column(tc)}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_new = new.count()
    report = {"n_new": n_new, "n_index_docs": int(meta.get("n_docs", 0))}
    if n_new == 0:
        report.update(n_dup_vs_index=0, n_dup_intra=0, n_kept=0)
        if return_drop_keys:
            report["drop_keys"] = []
        return new_docs_ds.limit(0), report

    new_bands = new.map_batches(bands_batch, batch_format="pyarrow").materialize()
    new_sh = new.map_batches(shingles_batch, batch_format="pyarrow").materialize()

    # ---- candidates vs the index: Bloom-pruned scan + one hash join ------
    # (bloom_semi_join's shape, inlined to add the 0-collision guard —
    # Ray's hash join crashes outright on a 0-row input side, and a fully
    # fresh crawl legitimately produces zero band collisions)
    from pie_ray.functions.bloomjoin import _bloom_mask, build_key_bloom

    idx_band_files = _committed_files(root, "bands", meta["n_deltas"])
    nb_rename = new_bands.map_batches(
        lambda t: pa.table(
            {"band_key_n": t.column("band_key"), "new_key": t.column("key")}
        ),
        batch_format="pyarrow",
    ).materialize()
    if idx_band_files:  # an all-empty-delta index has no candidates to offer
        idx_bands = ray.data.read_parquet(idx_band_files)
        salt = 0xB100
        bits_b, m, h = build_key_bloom(
            nb_rename, "band_key_n", capacity=nb_rename.count(), salt=salt
        )
        bits_ref = ray.put(np.frombuffer(bits_b, dtype=np.uint8))

        def prefilter(t: pa.Table, bref=None) -> pa.Table:
            mask = _bloom_mask(t.column("band_key"), ray.get(bref), m, h, salt)
            return t.filter(pa.array(mask))

        hits = drop_empty_blocks(
            idx_bands.map_batches(
                prefilter, fn_kwargs={"bref": bits_ref}, batch_format="pyarrow"
            ).materialize(),
            schema=pa.schema([("band_key", pa.string()), ("key", pa.string())]),
        ).materialize()
    else:
        hits = ray.data.from_arrow(
            pa.table(
                {"band_key": pa.array([], pa.string()), "key": pa.array([], pa.string())}
            )
        ).materialize()
    if hits.count() > 0:
        collided = hits.join(
            drop_empty_blocks(
                nb_rename,
                schema=pa.schema(
                    [("band_key_n", pa.string()), ("new_key", pa.string())]
                ),
            ).materialize(),
            join_type="inner",
            num_partitions=join_num_partitions(hits.size_bytes()),
            on=("band_key",),
            right_on=("band_key_n",),
        ).materialize()
        ix_pairs = drop_empty_blocks(
            _distinct_str_pairs(
                collided.map_batches(
                    lambda t: t.select(["key", "new_key"]), batch_format="pyarrow"
                ),
                "key",
                "new_key",
                nb=bucket_count(collided.size_bytes(), floor=64),
            ).materialize(),
            schema=_PAIR_SCHEMA,
        ).materialize()
    else:
        ix_pairs = ray.data.from_arrow(
            pa.table({"key": pa.array([], pa.string()), "new_key": pa.array([], pa.string())})
        ).materialize()

    # ---- intra-crawl candidates ------------------------------------------
    intra = _intra_pairs(
        new_bands, num_buckets=bucket_count(new_bands.size_bytes(), floor=64)
    ).materialize()

    # ---- verify (size-adaptive) ------------------------------------------
    idx_sh_files = _committed_files(root, "shingles", meta["n_deltas"])
    # files can only be absent when the band side was absent too -> n_ix==0
    idx_sh = ray.data.read_parquet(idx_sh_files) if idx_sh_files else None
    n_ix, n_in = ix_pairs.count(), intra.count()
    dup_vs_index: set[str] = set()
    intra_edges: list[tuple[str, str]] = []
    if not force_distributed and n_ix + n_in <= VERIFY_DRIVER_PAIRS:
        ixp = sorted(
            {(r["key"], r["new_key"]) for r in ix_pairs.take_all()}
        )
        inp = sorted({(r["a"], r["b"]) for r in intra.take_all()})
        new_keys_needed = sorted(
            {b for _, b in ixp} | {x for p in inp for x in p}
        )
        sh_new = _fetch_shingles_map(new_sh, new_keys_needed)
        old_keys = sorted({a for a, _ in ixp})
        sh_old = _fetch_shingles_map(idx_sh, old_keys) if idx_sh is not None else {}
        dup_vs_index = {b for a, b in _verify_pairs_driver(ixp, sh_old, sh_new, tau)}
        intra_edges = sorted(_verify_pairs_driver(inp, sh_new, sh_new, tau))
    else:
        if n_ix:
            v_ix = _verify_pairs_joined(
                ix_pairs, idx_sh, new_sh, "key", "new_key", tau
            )
            dup_vs_index = {r["new_key"] for r in v_ix.take_all()}
        if n_in:
            v_in = _verify_pairs_joined(
                intra.map_batches(
                    lambda t: pa.table(
                        {"key": t.column("a"), "new_key": t.column("b")}
                    ),
                    batch_format="pyarrow",
                ),
                new_sh,
                new_sh,
                "key",
                "new_key",
                tau,
            )
            intra_edges = sorted((r["key"], r["new_key"]) for r in v_in.take_all())
        # the verified sets are near-dup-sized (a small fraction of the
        # crawl), so the driver union-find below stays bounded even on the
        # distributed verify path

    # ---- union clustering over the crawl ---------------------------------
    # drop rule: every member of a cluster that touches the index drops
    # (its representative is already in the corpus); a crawl-only cluster
    # keeps its lexicographic-min member.
    dsu = DSU()
    for a, b in intra_edges:
        dsu.union(a, b)
    drop: set[str] = set()
    root_dup: set[str] = set()  # cluster roots contaminated by the index
    for k in dup_vs_index:
        root_dup.add(dsu.find(k))
    members: dict[str, list[str]] = {}
    for k in set(dsu.parent):
        members.setdefault(dsu.find(k), []).append(k)
    for r, ms in members.items():
        if r in root_dup:
            drop.update(ms)
        else:
            ms.sort()
            drop.update(ms[1:])  # keep the min member only
    drop.update(dup_vs_index)  # singletons dup-vs-index

    report["n_dup_vs_index"] = len(dup_vs_index)
    report["n_dup_intra"] = len(drop - dup_vs_index)
    report["n_kept"] = n_new - len(drop)
    if return_drop_keys:
        report["drop_keys"] = sorted(drop)

    if not drop:
        return new_docs_ds, report
    if len(drop) <= DROP_BROADCAST_LIMIT:
        dref = ray.put(pa.array(sorted(drop), pa.string()))

        def keep_rows(t: pa.Table, drop_ref=None, kc=key_col) -> pa.Table:
            bad = pc.is_in(
                pc.cast(t.column(kc), pa.string()), value_set=ray.get(drop_ref)
            )
            return t.filter(pc.invert(bad))

        kept = new_docs_ds.map_batches(
            keep_rows, fn_kwargs={"drop_ref": dref}, batch_format="pyarrow"
        )
    else:  # all-dup-recrawl scale: one anti join on the key
        drop_ds = ray.data.from_arrow(
            pa.table({"__drop_key": pa.array(sorted(drop), pa.string())})
        )
        tagged = drop_empty_blocks(
            new_docs_ds.map_batches(
                lambda t, kc=key_col: t.append_column(
                    "__key", pc.cast(t.column(kc), pa.string())
                ),
                batch_format="pyarrow",
            ).materialize()
        ).materialize()
        kept = tagged.join(
            drop_ds,
            join_type="left_anti",
            num_partitions=join_num_partitions(),
            on=("__key",),
            right_on=("__drop_key",),
        ).map_batches(lambda t: t.drop_columns(["__key"]), batch_format="pyarrow")
    return kept, report


# ---------------------------------------------------------------------------
# driver entry (rows-only: LSH banding + filesystem state are not
# SQL-expressible; the brute-parity + crash + idempotence gates live in
# tests/unit/test_dedup_index.py)
# ---------------------------------------------------------------------------


def q_dedup_incremental(sf_dir: str):
    """Split the documents table into corpus (doc_id < 350) and crawl
    (doc_id >= 350, plus exact recrawls of three corpus docs), index the
    corpus under /tmp, screen the crawl, and return one row per crawl doc
    with its kept/dropped verdict — deterministic across runs."""
    import tempfile

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    corpus = base.filter(expr="doc_id < 350").map_batches(
        lambda t: pa.table(
            {"key": pc.cast(t.column("doc_id"), pa.string()), "text": t.column("text")}
        ),
        batch_format="pyarrow",
    )
    recrawl = base.filter(expr="doc_id < 3").map_batches(
        lambda t: pa.table(
            {"key": pc.cast(t.column("doc_id"), pa.string()), "text": t.column("text")}
        ),
        batch_format="pyarrow",
    )
    crawl = base.filter(expr="doc_id >= 350").map_batches(
        lambda t: pa.table(
            {"key": pc.cast(t.column("doc_id"), pa.string()), "text": t.column("text")}
        ),
        batch_format="pyarrow",
    ).union(recrawl).materialize()
    with tempfile.TemporaryDirectory(prefix="pie_lshix_") as root:
        ix = os.path.join(root, "ix")
        lsh_index_build(corpus, ix)
        kept, _rep = lsh_index_screen(ix, crawl)
        kept_keys = pa.array(
            sorted(b for batch in kept.iter_batches(batch_format="pyarrow")
                   for b in batch.column("key").to_pylist()),
            pa.string(),
        )
    all_keys = sorted(
        b for batch in crawl.iter_batches(batch_format="pyarrow")
        for b in batch.column("key").to_pylist()
    )
    kept_set = set(kept_keys.to_pylist())
    out = pa.table(
        {
            "key": pa.array(all_keys, pa.string()),
            "kept": pa.array([k in kept_set for k in all_keys], pa.bool_()),
        }
    )
    return ray.data.from_arrow(out)
