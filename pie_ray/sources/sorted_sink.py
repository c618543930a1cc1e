"""Range-partitioned SORTED parquet layout — the "optimize table layout"
operator: write a dataset clustered on a sort key so later reads can prune
whole key ranges at the directory level (the same pruning contract as
pages.py's hash layout, but for RANGE predicates).

Write shape (TeraSort partitioning, shared with relational.global_rank):
sampled boundaries -> ONE range exchange -> each range sorts locally by
(key, tie) and lands as its own hive ``range=k/`` directory, internally
sorted. A JSON sidecar records the boundaries + columns; ``read_sorted``
trusts directory pruning ONLY when the sidecar matches (a layout written
under different boundaries would silently drop rows otherwise — same
safety rule as pages._hive_sidecar_valid).

Scale: boundaries/counts are metadata-sized; the one exchange moves each
row once. At 100 TB this is the standard "compact + cluster" maintenance
pass; re-cluster periodically rather than per ingest.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SORTED_META = "_SORTED_META.json"
INSERT_JOURNAL = "_INSERT_JOURNAL.json"
INSERT_TOKENS = "_INSERT_TOKENS.json"


def _fsync_path(p: str) -> None:
    """fsync a file's content or a directory's entry table."""
    fd = os.open(p, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _write_json_atomic(path: str, obj) -> None:
    """Durable atomic JSON write: content fsynced BEFORE the rename and the
    directory entry fsynced after — so the file is either absent or a
    complete document even across power loss (a rename that lands without
    its content would otherwise leave a torn journal)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    _fsync_path(os.path.dirname(path))


def _committed_range_files(path: str) -> list[str]:
    """Parquet files of COMMITTED range dirs only. The ``range=*`` glob
    also matches ``range=N.tmp``/``.old`` staging dirs — and a SIGKILLed
    insert's orphaned merge worker can recreate a staging dir even after
    ``recover_sorted`` cleared it, so every existence/schema-of-record
    scan must exclude them (data reads are already safe: they glob exact
    ``range={r}`` dirs, which never match the staged names)."""
    import glob as _glob

    return sorted(
        f
        for f in _glob.glob(os.path.join(path, "range=*", "*.parquet"))
        if not os.path.basename(os.path.dirname(f)).endswith((".tmp", ".old"))
    )


def _applied_tokens(path: str) -> list[str]:
    p = os.path.join(path, INSERT_TOKENS)
    if not os.path.isfile(p):
        return []
    with open(p) as f:
        return json.load(f)


def _commit_insert(path: str, journal: dict) -> None:
    """Idempotent commit / roll-forward of a prepared insert: finish the
    per-range swaps from whatever state each range is in (not started /
    old-renamed / tmp-moved / done), record the journal's token, then
    delete the journal LAST — the journal's presence is the single bit
    that distinguishes "commit in progress" from "layout consistent", so
    re-running this after any crash converges to the same final layout."""
    import shutil

    for r in journal["ranges"]:
        rdir = os.path.join(path, f"range={r}")
        tmp, old = rdir + ".tmp", rdir + ".old"
        if os.path.isdir(tmp):
            if os.path.isdir(rdir):
                shutil.rmtree(old, ignore_errors=True)
                os.rename(rdir, old)
            os.rename(tmp, rdir)
        shutil.rmtree(old, ignore_errors=True)
    token = journal.get("token")
    if token is not None:
        toks = _applied_tokens(path)
        if token not in toks:
            _write_json_atomic(os.path.join(path, INSERT_TOKENS), toks + [token])
    jp = os.path.join(path, INSERT_JOURNAL)
    if os.path.isfile(jp):
        os.remove(jp)


def recover_sorted(path: str) -> dict:
    """Recover a layout from a crashed ``insert_sorted``: a journal on
    disk means every range's merged output was durable before the crash,
    so the commit ROLLS FORWARD (the insert lands exactly once — its
    token, if any, is recorded). No journal means any ``.tmp``/``.old``
    directories are pre-commit garbage from a killed prepare phase and
    are cleared (that insert never happened; re-run it). Single-writer
    layout — never call concurrently with a live insert."""
    import glob as _glob
    import shutil

    jp = os.path.join(path, INSERT_JOURNAL)
    journal = None
    if os.path.isfile(jp):
        try:
            with open(jp) as f:
                journal = json.load(f)
        except ValueError:
            # ValueError covers both corruption shapes: invalid JSON
            # (JSONDecodeError) and invalid UTF-8 (UnicodeDecodeError).
            # With the fsync-then-rename writer a torn journal cannot
            # happen, so any unreadable journal is exotic corruption —
            # discard it ONLY when nothing is pending (no range=*.old
            # from a started swap, no range=*.tmp awaiting one); with
            # either kind of evidence present, auto-action could freeze
            # a half-applied commit, so refuse with guidance. Read
            # errors (OSError) propagate — never discard on a flaky read.
            if _glob.glob(os.path.join(path, "range=*.old")) or _glob.glob(
                os.path.join(path, "range=*.tmp")
            ):
                raise RuntimeError(
                    f"{path}: unreadable {INSERT_JOURNAL} next to "
                    "range=*.old/.tmp dirs — a commit may be half-applied "
                    "or pending; refusing automatic recovery (inspect the "
                    ".old/.tmp dirs by hand)"
                )
            os.remove(jp)
            journal = None
    if journal is not None:
        _commit_insert(path, journal)
        return {
            "recovered": True,
            "ranges": journal["ranges"],
            "rows_inserted": journal["rows_inserted"],
        }
    cleared = sorted(
        _glob.glob(os.path.join(path, "range=*.tmp"))
        + _glob.glob(os.path.join(path, "range=*.old"))
    )
    for d in cleared:
        shutil.rmtree(d, ignore_errors=True)
    return {"recovered": False, "cleared": cleared}


def write_sorted_parquet(ds, path: str, key_col: str, tie_col: str,
                         num_ranges: int = 64) -> dict:
    """Cluster ``ds`` on (key_col, tie_col) into hive ``range=k/`` dirs,
    each internally sorted, plus a boundary sidecar. Returns the meta."""
    from pie_ray.functions.relational import (
        make_range_tagger,
        sample_range_boundaries,
    )

    key_type = ds.schema().types[ds.schema().names.index(key_col)]
    is_int = pa.types.is_integer(key_type)
    if not (is_int or pa.types.is_floating(key_type)):
        # a non-numeric key would not JSON-round-trip in the sidecar and
        # could silently mis-prune reads
        raise TypeError(f"sorted layout requires a numeric key, got {key_type}")
    boundaries = sample_range_boundaries(ds, key_col, num_ranges)
    if boundaries is None:
        boundaries = np.empty(0, np.int64 if is_int else np.float64)

    def sort_range(g: pa.Table) -> pa.Table:
        rng = g.column("__range")  # constant within the group (groupby key)
        g = g.drop_columns(["__range"])
        order = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (tie_col, "ascending")]
        )
        return g.take(order).append_column("range", pc.cast(rng, pa.int32()))

    tagged = ds.map_batches(
        make_range_tagger(key_col, boundaries), batch_format="pyarrow"
    )
    tagged.groupby("__range").map_groups(
        sort_range, batch_format="pyarrow"
    ).write_parquet(path, partition_cols=["range"])
    import glob as _glob

    import pyarrow.parquet as _pq

    if not _committed_range_files(path):
        # an empty dataset writes no data files; persist one empty file so
        # read_sorted still finds the layout's schema
        sch = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
        os.makedirs(os.path.join(path, "range=0"), exist_ok=True)
        _pq.write_table(
            sch.empty_table(), os.path.join(path, "range=0", "empty.parquet")
        )
    meta = {
        "key_col": key_col,
        "tie_col": tie_col,
        # ints stay ints (JSON ints are exact at any magnitude — a float
        # round-trip would corrupt int64 boundaries past 2^53 and silently
        # mis-prune reads)
        "boundaries": [int(b) if is_int else float(b) for b in boundaries],
    }
    with open(os.path.join(path, SORTED_META), "w") as f:
        json.dump(meta, f)
    return meta


def read_sorted(path: str, lo: float | None = None, hi: float | None = None,
                columns: list[str] | None = None):
    """Range-pruned scan of a write_sorted_parquet layout: only the hive
    directories whose key range intersects [lo, hi] are read (None = open
    end). Requires the sidecar; refuses to guess on a foreign layout. A
    residual vectorized filter inside the read tasks makes the bound exact
    (directory granularity is coarser than the predicate)."""
    import ray

    meta_path = os.path.join(path, SORTED_META)
    if not os.path.isfile(meta_path):
        raise FileNotFoundError(
            f"{SORTED_META} missing under {path} — not a sorted layout"
        )
    if os.path.isfile(os.path.join(path, INSERT_JOURNAL)):
        # a crashed insert left the ranges half old / half new — serving
        # that mix would be silently inconsistent; recovery is one call
        raise RuntimeError(
            f"{path} has an unfinished insert (found {INSERT_JOURNAL}) — "
            "run recover_sorted(path) to roll it forward before reading"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    b = np.asarray(meta["boundaries"])  # int64 or float64 as written
    key = meta["key_col"]
    n_ranges = len(b) + 1
    import glob as _glob

    all_files = _committed_range_files(path)
    if not all_files:
        raise FileNotFoundError(f"no range=*/ parquet files under {path}")
    # range r holds keys in [b[r-1], b[r]) (searchsorted side='right':
    # a key equal to boundary j lands in range j+1)
    first = 0 if lo is None else int(np.searchsorted(b, lo, side="right"))
    last = n_ranges - 1 if hi is None else int(np.searchsorted(b, hi, side="right"))

    # a LIST of paths to read_parquet must be files, not directories
    files = [
        f
        for r in range(first, min(last, n_ranges - 1) + 1)
        for f in sorted(
            _glob.glob(os.path.join(path, f"range={r}", "*.parquet"))
        )
    ]
    # always project explicitly: Ray's hive inference would otherwise
    # append a surprise 'range' column from the directory names. The
    # residual filter needs the key even when the caller's projection
    # drops it; strip it back off after filtering.
    import pyarrow.parquet as pq

    eff_cols = list(columns) if columns else pq.read_schema(all_files[0]).names
    need_filter = lo is not None or hi is not None
    drop_key = key not in eff_cols and need_filter
    read_cols = eff_cols + [key] if drop_key else eff_cols
    if not files:
        # fully pruned: an empty table WITH the projected schema — zero
        # I/O beyond the footer (Dataset.schema() is preserved; to_pandas
        # on any 0-row Dataset loses columns either way — Ray limitation)
        sch = pq.read_schema(all_files[0])
        return ray.data.from_arrow(
            pa.schema([sch.field(n) for n in eff_cols]).empty_table()
        )
    ds = ray.data.read_parquet(files, columns=read_cols)

    def residual(t: pa.Table) -> pa.Table:
        v = t.column(key)
        mask = pa.array(np.ones(t.num_rows, bool))
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(v, lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(v, hi))
        t = t.filter(mask)
        return t.drop_columns([key]) if drop_key else t

    if not need_filter:
        return ds
    return ds.map_batches(residual, batch_format="pyarrow")


def insert_sorted(path: str, delta_ds, token: str | None = None) -> dict:
    """Merge new rows into an existing sorted layout while preserving the
    clustering contract: delta rows are tagged with the layout's RECORDED
    boundaries, and ONLY the range directories that actually receive rows
    are rewritten (old rows + delta re-sorted, one Ray task per affected
    range — worker memory bounds a range exactly as the original write's
    map_groups did); untouched directories are never read. Driver traffic
    is DELTA-bounded (the delta splits to per-range Arrow tables on the
    driver; the old data never leaves the workers). Multiset append
    semantics — key-level upserts compose as ``merge_upsert`` BEFORE the
    insert.

    Crash-atomic across ranges (manifest-gated two-phase commit, the same
    discipline as incremental's ``_swap_in``/``_DONE``): all merged range
    outputs land in ``range=<r>.tmp`` first, then a journal records the
    pending swap, then the renames run, then the journal is deleted. A
    kill before the journal discards the whole insert (stale ``.tmp``
    dirs are cleared on the next call); a kill after it rolls FORWARD on
    the next ``insert_sorted``/``recover_sorted`` — either way the delta
    lands exactly 0 or exactly 1 times, never partially.
    ``read_sorted`` refuses a journaled (half-swapped) layout. Pass
    ``token`` (e.g. an ingest id) to make blind re-runs idempotent: an
    already-recorded token returns ``{"skipped": True}`` without touching
    the layout.

    Returns {"ranges_rewritten": [...], "rows_inserted": n}. Boundaries
    stay fixed, so a long run of skewed deltas can bloat single ranges —
    re-cluster with write_sorted_parquet when a directory outgrows its
    neighbors (the standard LSM-ish guidance)."""
    import glob as _glob

    import ray

    from pie_ray.functions.relational import make_range_tagger

    recover_sorted(path)  # roll forward / clear any crashed predecessor
    if token is not None and token in _applied_tokens(path):
        return {"skipped": True, "token": token}

    with open(os.path.join(path, SORTED_META)) as f:
        meta = json.load(f)
    b = np.asarray(meta["boundaries"])
    key_col, tie_col = meta["key_col"], meta["tie_col"]

    # validate the delta against the STORED layout up front: a delta with
    # missing or extra columns would otherwise be silently null-filled /
    # schema-widened by the merge concat (ADVICE r3) — corrupting the
    # layout instead of erroring. The first parquet footer is the layout's
    # schema of record (all ranges share it by construction).
    import pyarrow.parquet as _pq

    layout_files = _committed_range_files(path)
    if layout_files:
        layout_schema = _pq.read_schema(layout_files[0])
        dsch = delta_ds.schema()
        delta_names = list(dsch.names)
        if sorted(delta_names) != sorted(layout_schema.names):
            raise ValueError(
                f"insert_sorted: delta schema {sorted(delta_names)} does not "
                f"match the stored layout {sorted(layout_schema.names)}"
            )
        for name, typ in zip(dsch.names, dsch.types):
            stored = layout_schema.field(name).type
            if typ != stored:
                raise ValueError(
                    f"insert_sorted: delta column {name!r} has type {typ}, "
                    f"stored layout has {stored}"
                )

    tagged = delta_ds.map_batches(
        make_range_tagger(key_col, b), batch_format="pyarrow"
    )
    delta_parts: dict[int, list[pa.Table]] = {}
    rows_inserted = 0
    for bt in tagged.iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        rows_inserted += bt.num_rows
        rids = bt.column("__range").to_numpy(zero_copy_only=False)
        for r in np.unique(rids):
            delta_parts.setdefault(int(r), []).append(
                bt.filter(pa.array(rids == r)).drop_columns(["__range"])
            )

    @ray.remote
    def _merge_range(old_files, delta_table, key_col, tie_col, tmp_file):
        import os as _os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        pieces = [pq.read_table(f) for f in old_files]
        pieces.append(delta_table)
        t = pa.concat_tables(pieces, promote_options="default")
        order = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), (tie_col, "ascending")]
        )
        pq.write_table(t.take(order), tmp_file)
        # the journal's roll-forward contract assumes this file is durable
        # once the journal exists — fsync content + directory entry
        _fsync_path(tmp_file)
        _fsync_path(_os.path.dirname(tmp_file))
        return t.num_rows

    futures = {}
    for r, tables in sorted(delta_parts.items()):
        rdir = os.path.join(path, f"range={r}")
        old_files = sorted(_glob.glob(os.path.join(rdir, "*.parquet")))
        tmp = rdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        futures[r] = _merge_range.remote(
            old_files,
            pa.concat_tables(tables),
            key_col,
            tie_col,
            os.path.join(tmp, "part-0.parquet"),
        )
    ray.get(list(futures.values()))

    # phase 2: every merged output is durable under range=<r>.tmp — journal
    # the pending swap (atomic write), then commit. The journal is the
    # commit point: present = roll forward, absent = the insert never was.
    journal = {
        "ranges": sorted(delta_parts),
        "rows_inserted": rows_inserted,
        "token": token,
    }
    _write_json_atomic(os.path.join(path, INSERT_JOURNAL), journal)
    _commit_insert(path, journal)
    return {
        "ranges_rewritten": sorted(delta_parts),
        "rows_inserted": rows_inserted,
    }
