"""Incremental KG ingestion — process only never-seen pages, rebuild the
derived tables from append-only increments.

The cost profile of the flagship pipeline is NER-dominated (the actor-pool
decode is >70% of wall time at 1M pages — BASELINE.md), so the incremental
contract is: a page whose url is already in the ledger NEVER re-enters
extract/NER. New pages are found with the Bloom screen
(pie_ray.functions.bloom): a filter miss is a hard "new" guarantee (those
pages skip every join — their html bytes never enter a shuffle), and the
filter hits are exact-checked against the url ledger so only Bloom false
positives (~fpp x new pages, small by construction) survive as extra work.

Durable state under ``root`` is APPEND-ONLY pre-canonicalization triples:

    root/raw/delta_000000/    raw (pre-canon) triples per increment
    root/urls/delta_000000/   processed-url ledger per increment
    root/triples/  root/graph/   DERIVED caches, rebuilt per update
    root/_INC_META.json       {n_updates, n_urls}

Why raw triples and not the canonical outputs: entity linking is not
monotone under key-set growth — the LSH hot-band cap bounds candidate
pairs per band, so adding keys to a hot band can change WHICH old pairs
are emitted and split a previously-merged component. Rewriting old canon
ids through a delta map is therefore not exact; re-linking over the raw
key universe is, and it is cheap relative to NER (distinct person keys,
not the corpus). Link/canonicalize/dedup/graph re-run over the raw union
each update — the same exchanges a fresh build pays, minus all NER for
already-seen pages. The rebuild is a pure function of the raw deltas, so
a crashed update re-runs idempotently; triples/ and graph/ swap in via
atomic renames and are never observed half-written.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

# exact-check path cutover: below this many Bloom-hit candidate pages the
# confirm runs as a candidate-filtered ledger scan (driver holds candidate
# urls only); above, a key-only left_outer anti-join (urls shuffle, html
# never moves) whose driver pull is bounded by the FALSE-POSITIVE count
INC_DRIVER_CANDIDATES = 200_000

META_NAME = "_INC_META.json"


def _read_meta(root: str) -> dict:
    with open(os.path.join(root, META_NAME)) as f:
        return json.load(f)


def _write_meta(root: str, meta: dict) -> None:
    tmp = os.path.join(root, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, META_NAME))


def _swap_in(build_dir: str, final_dir: str) -> None:
    """Atomically replace ``final_dir`` with ``build_dir`` (derived caches
    are never observed half-written; a crash leaves the old version)."""
    old = final_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(final_dir):
        os.rename(final_dir, old)
    os.rename(build_dir, final_dir)
    shutil.rmtree(old, ignore_errors=True)


def _delta_files(root: str, table: str) -> list[str]:
    """Parquet files across all increments (an increment of pages with zero
    emitted triples writes no files — nothing to skip; explicit file lists
    are what ``read_parquet`` wants, and they dodge directory re-listing)."""
    return sorted(glob.glob(os.path.join(root, table, "delta_*", "*.parquet")))


def _raw_triples(pages_ds, cfg):
    from pie_ray.pipelines.kg import extract_stage, raw_triples_stage

    return raw_triples_stage(extract_stage(pages_ds, cfg), cfg)


def _ledger_rows(root: str) -> int:
    """Exact processed-url count from the ledger's parquet metadata (O(1)
    per file). Used as the Bloom capacity — crash re-appends can duplicate
    urls and overcount, which only oversizes the filter (the safe side)."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows for f in _delta_files(root, "urls")
    )


def _delta_fingerprint(root: str) -> str:
    """Identity of the on-disk raw-delta set (names + sizes). Recorded in
    the meta after every rebuild, so an update can tell whether the derived
    caches incorporate everything that is durable — the crash case this
    closes: a run killed after its increment landed but before the rebuild
    leaves urls in the ledger, so a later all-seen recrawl would otherwise
    no-op forever while triples/graph silently miss the increment."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for f in _delta_files(root, "raw"):
        h.update(f"{os.path.relpath(f, root)}:{os.path.getsize(f)};".encode())
    return h.hexdigest()


def _write_increment(root: str, k: int, pages_ds, cfg) -> int:
    """Append one increment: raw triples + processed-url ledger rows. The
    ledger records EVERY input url (a lang-filtered or PII-free page is
    still processed — a recrawl of it must not re-enter NER). Both writes
    STREAM (the page delta is never materialized — its html can be TBs);
    the page count comes back from the written ledger's parquet metadata."""
    import pyarrow.parquet as pq

    raw_dir = os.path.join(root, "raw", f"delta_{k:06d}")
    urls_dir = os.path.join(root, "urls", f"delta_{k:06d}")
    os.makedirs(raw_dir, exist_ok=True)
    os.makedirs(urls_dir, exist_ok=True)
    # a crashed update leaves files in this slot and is replayed into it —
    # count only THIS run's files (pre-existing urls are already screened
    # out upstream, so they must not inflate this run's new-page count)
    before = set(glob.glob(os.path.join(urls_dir, "*.parquet")))
    _raw_triples(pages_ds, cfg).write_parquet(raw_dir)
    pages_ds.map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow"
    ).write_parquet(urls_dir)
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(urls_dir, "*.parquet"))
        if f not in before
    )


def part_fingerprints(triples_ds, num_parts: int) -> dict[int, tuple[int, int]]:
    """128-bit content fingerprint per GRAPH PARTITION of a triple set:
    rows route by the graph's recorded rule (blake2b64(subj, salt=b'part')
    % P), each row hashes over its FULL content (provenance included — a
    min-warc_ts change with an unchanged (s,p,o) key still changes the
    graph's first_ts, so key-level diffs are not enough), and a partition's
    fingerprint is the order-independent XOR of its row hashes under two
    salts. Driver state: P × 2 ints; per-batch partials ship ≤ P rows."""
    import numpy as np

    from pie_ray.util import hash64_array

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "f1": pa.array([], pa.int64()),
                    "f2": pa.array([], pa.int64()),
                }
            )
        subj = t.column("subj").to_pylist()
        # part rule must match stages/graph.adjacency_batch exactly
        part = (hash64_array(subj, salt=b"part") % np.uint64(num_parts)).astype(
            np.int64
        )
        key = pc.binary_join_element_wise(
            t.column("subj"),
            t.column("pred"),
            t.column("obj"),
            t.column("url"),
            pc.cast(pc.cast(t.column("warc_ts"), pa.int64()), pa.string()),
            "\x1f",
        ).to_pylist()
        h1 = hash64_array(key, salt=b"gfp1").astype(np.uint64)
        h2 = hash64_array(key, salt=b"gfp2").astype(np.uint64)
        out_p, out_1, out_2 = [], [], []
        for p in np.unique(part):
            m = part == p
            out_p.append(int(p))
            out_1.append(int(np.bitwise_xor.reduce(h1[m])))
            out_2.append(int(np.bitwise_xor.reduce(h2[m])))
        return pa.table(
            {
                "part": pa.array(out_p, pa.int32()),
                "f1": pa.array(np.array(out_1, np.uint64).astype(np.int64), pa.int64()),
                "f2": pa.array(np.array(out_2, np.uint64).astype(np.int64), pa.int64()),
            }
        )

    acc: dict[int, tuple[int, int]] = {}
    for r in triples_ds.map_batches(partial, batch_format="pyarrow").take_all():
        a, b = acc.get(r["part"], (0, 0))
        acc[r["part"]] = (a ^ (r["f1"] & 0xFFFFFFFFFFFFFFFF), b ^ (r["f2"] & 0xFFFFFFFFFFFFFFFF))
    return acc


def _refresh_graph_parts(root: str, triples, affected: set[int], cfg) -> None:
    """Rebuild ONLY the affected graph partitions: filter the new triple
    set to subjects routing into them (edges are subj -> obj, so a triple
    can only contribute to part(subj)), run the standard fused
    edge-agg/adjacency exchange over that subset, and swap per-part dirs.
    A part with rows before and none after is deleted."""
    import numpy as np

    from pie_ray.stages.graph import aggregate_edges_to_adjacency
    from pie_ray.util import hash64_array

    want = np.array(sorted(affected), dtype=np.int64)

    def keep_parts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        subj = t.column("subj").combine_chunks()
        uniq = pc.unique(subj)
        up = (
            hash64_array(uniq.to_pylist(), salt=b"part")
            % np.uint64(cfg.num_graph_parts)
        ).astype(np.int64)
        keep_subj = uniq.filter(pa.array(np.isin(up, want)))
        return t.filter(pc.is_in(subj, value_set=keep_subj))

    sub = triples.map_batches(keep_parts, batch_format="pyarrow").materialize()
    adj = aggregate_edges_to_adjacency(sub, cfg.num_graph_parts)
    refresh = os.path.join(root, "graph.refresh")
    shutil.rmtree(refresh, ignore_errors=True)
    adj.write_parquet(refresh, partition_cols=["part"])
    gdir = os.path.join(root, "graph")
    for p in sorted(affected):
        new_dir = os.path.join(refresh, f"part={p}")
        old_dir = os.path.join(gdir, f"part={p}")
        shutil.rmtree(old_dir, ignore_errors=True)
        if os.path.exists(new_dir):
            os.replace(new_dir, old_dir)
    shutil.rmtree(refresh, ignore_errors=True)


GRAPH_FP_NAME = "graph_fp.json"


def _read_graph_fp(root: str, num_parts: int) -> dict[int, tuple[int, int]] | None:
    path = os.path.join(root, GRAPH_FP_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    if d.get("num_parts") != num_parts:
        return None
    return {int(k): (v[0], v[1]) for k, v in d["fp"].items()}


def _write_graph_fp(root: str, num_parts: int, fp: dict[int, tuple[int, int]]) -> None:
    path = os.path.join(root, GRAPH_FP_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_parts": num_parts, "fp": {str(k): list(v) for k, v in fp.items()}}, f)
    os.replace(tmp, path)


def _rebuild(root: str, cfg) -> dict:
    """Raw-delta union -> link -> canonicalize -> dedup -> graph. Same code
    path as the fresh pipeline (pipelines.kg), so incremental output is
    equal BY CONSTRUCTION to a fresh build over the union of all inputs.

    The GRAPH step is delta-aware: the new triple set's per-partition
    content fingerprints are diffed against the fingerprints STORED when
    the graph was last known consistent (graph_fp.json — written LAST,
    atomically), and only mismatching partitions rebuild. Diffing against
    the stored-with-the-graph state (not against the old triples) is what
    makes a crash mid-refresh safe: the sidecar still describes the
    pre-update graph, so the re-run recomputes the SAME affected set and
    converges — and it also saves a full scan of the old triples."""
    import ray.data

    from pie_ray.pipelines.kg import canonicalize_stage, graph_stage, link_stage
    from pie_ray.stages.graph import write_graph

    raw_files = _delta_files(root, "raw")
    if raw_files:
        raw = ray.data.read_parquet(raw_files).materialize()
    else:
        # a corpus with zero PII emits zero raw triples — a VALID store
        # (e.g. every page lang-filtered or clean); derived caches are
        # typed-empty, not a crash
        from pie_ray import schemas

        raw = ray.data.from_arrow(schemas.TRIPLES.empty_table()).materialize()
    canon = link_stage(raw, cfg)
    triples = canonicalize_stage(raw, canon, cfg).materialize()

    old_fp = _read_graph_fp(root, cfg.num_graph_parts)
    if not os.path.exists(os.path.join(root, "graph", "_GRAPH_META.json")):
        old_fp = None  # no graph on disk -> full build regardless of sidecar

    tri_build = os.path.join(root, "triples.building")
    shutil.rmtree(tri_build, ignore_errors=True)
    os.makedirs(tri_build)
    triples.write_parquet(tri_build)
    _swap_in(tri_build, os.path.join(root, "triples"))

    stats: dict = {}
    new_fp = part_fingerprints(triples, cfg.num_graph_parts)
    if old_fp is not None:
        affected = {
            p
            for p in set(old_fp) | set(new_fp)
            if old_fp.get(p) != new_fp.get(p)
        }
        stats["graph_parts_rebuilt"] = len(affected)
        stats["graph_parts_total"] = cfg.num_graph_parts
        if affected:
            _refresh_graph_parts(root, triples, affected, cfg)
    else:
        g_build = os.path.join(root, "graph.building")
        shutil.rmtree(g_build, ignore_errors=True)
        write_graph(graph_stage(triples, cfg), g_build, num_parts=cfg.num_graph_parts)
        _swap_in(g_build, os.path.join(root, "graph"))
    # stamp LAST: anything that dies before this line leaves the old
    # sidecar in place, and the next rebuild redoes the same partitions
    _write_graph_fp(root, cfg.num_graph_parts, new_fp)
    return {
        "triples_path": os.path.join(root, "triples"),
        "graph_path": os.path.join(root, "graph"),
        "n_triples": triples.count(),
        **stats,
    }


def _write_link_delta(
    root: str, k: int, pages_ds, n_ledgered: int | None = None
) -> dict:
    """Host link-edge partials for increment ``k`` (the link-graph twin of
    the raw-triple deltas). The slot is a PURE FUNCTION of the pages it is
    given: it clears, rewrites, and finishes with a ``_DONE`` sentinel —
    edge WEIGHTS are counts, so a replay must rewrite, never append
    (appending would double-count; the distinct-semantics url ledger
    tolerates replays, counted aggregates do not). Callers derive the
    page set from the slot's DURABLE url ledger (``_slot_pages``), which
    is what makes the rewrite idempotent across every crash window —
    PROVIDED the replayed crawl still carries the ledgered pages. A
    DIFFERENT crawl replayed into a crashed window would silently hole
    the graph (the urls stay ledgered, so no later replay restores their
    edges), so when ``n_ledgered`` is given the slot counts the distinct
    ledgered urls it actually received and surfaces a coverage warning
    (durably, in the slot's ``_COVERAGE`` file, and in the returned
    report) when the crawl is missing some."""
    import logging
    import shutil

    from pie_ray.stages.links import host_edges

    d = os.path.join(root, "linkedges", f"delta_{k:06d}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    cov: dict = {}
    if n_ledgered is not None:
        # one filter pass total: materialize the slot (bounded by the
        # increment, not the corpus; blocks spill if large), count the
        # distinct urls that actually arrived, then feed the same blocks
        # to host_edges
        pages_ds = pages_ds.materialize()
        found: set[str] = set()
        for b in pages_ds.select_columns(["url"]).iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            found.update(b.column("url").to_pylist())
        cov = {"ledgered_urls": n_ledgered, "found_urls": len(found)}
        if len(found) < n_ledgered:
            logging.getLogger(__name__).warning(
                "link delta %d: crawl covers only %d of %d ledgered urls — "
                "this looks like a DIFFERENT crawl replayed into a crashed "
                "ingest window; the missing pages' edges cannot be "
                "recovered from this input (their urls are already "
                "ledgered). Re-run with the original crawl.",
                k,
                len(found),
                n_ledgered,
            )
        with open(os.path.join(d, "_COVERAGE"), "w") as f:
            f.write(f"{len(found)}/{n_ledgered}\n")
    host_edges(pages_ds).write_parquet(d)
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("")
    return cov


def _link_delta_done(root: str, k: int) -> bool:
    return os.path.exists(
        os.path.join(root, "linkedges", f"delta_{k:06d}", "_DONE")
    )


def _link_deltas_enabled(root: str, meta: dict) -> bool:
    """Resolved link-delta flag. Roots written before the flag existed
    (meta lacks the key) fall back to the on-disk probe — a pre-upgrade
    root that WAS maintaining linkedges must keep doing so (defaulting to
    False would silently stop writing deltas and hole the graph)."""
    v = meta.get("link_deltas")
    if v is None:
        return os.path.isdir(os.path.join(root, "linkedges"))
    return bool(v)


ND_DIR = "lshix"


def _nd_root(root: str) -> str:
    return os.path.join(root, ND_DIR)


def _nd_enabled(root: str, meta: dict) -> bool:
    """Resolved near-dup-screen flag; pre-flag roots probe the dir like
    ``_link_deltas_enabled`` (an index that exists must keep being
    maintained — a gap means later screens silently miss that window)."""
    v = meta.get("near_dup")
    if v is None:
        return os.path.isdir(_nd_root(root))
    return bool(v)


def _nd_delta_done(root: str, k: int) -> bool:
    from pie_ray.functions.dedup_index import _read_meta as _ix_meta

    m = _ix_meta(_nd_root(root))
    return bool(m) and m.get("n_deltas", 0) > k


def _nd_kv(pages_ds, cfg):
    """(key=url, text) over the pages' EXTRACTED text — the same frozen
    stripper the NER stage consumes, so the index screens exactly the
    content the pipeline would otherwise spend NER on. Lang-filtered pages
    yield no kv row (they ledger but never enter NER, so screening them
    buys nothing). Extraction runs a second time for pages that also pass
    to NER — ~1/7 of the NER cost per doc (BASELINE.md per-doc split),
    which the screen's NER savings dominate whenever dups exist."""
    from pie_ray.pipelines.kg import extract_stage

    return extract_stage(pages_ds, cfg).map_batches(
        lambda t: pa.table({"key": t.column("url"), "text": t.column("text")}),
        batch_format="pyarrow",
    )


def _write_nd_delta(
    root: str, k: int, slot_pages_ds, cfg, n_ledgered: int | None = None
) -> dict:
    """Band/shingle index delta for increment ``k`` — the near-dup twin of
    ``_write_link_delta`` with the SAME recovery story: the page set
    derives from the durable url ledger (``_slot_pages``), the slot
    rewrites idempotently (``lsh_index_append(slot=k)`` clears, rewrites
    and recommits its meta), and a coverage shortfall against the ledger
    is surfaced when a DIFFERENT crawl replays into a crashed window (the
    missing pages' fingerprints cannot be rebuilt from that input)."""
    import logging

    from pie_ray.functions.dedup_index import lsh_index_append

    cov: dict = {}
    if n_ledgered is not None:
        slot_pages_ds = slot_pages_ds.materialize()
        seen: set[str] = set()
        for b in slot_pages_ds.select_columns(["url"]).iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            seen.update(b.column("url").to_pylist())
        cov = {"nd_ledgered_urls": n_ledgered, "nd_found_urls": len(seen)}
        if len(seen) < n_ledgered:
            logging.getLogger(__name__).warning(
                "near-dup index delta %d: crawl covers only %d of %d "
                "ledgered urls — a DIFFERENT crawl replayed into a crashed "
                "ingest window; the missing pages' fingerprints cannot be "
                "recovered from this input. Re-run with the original crawl.",
                k,
                len(seen),
                n_ledgered,
            )
    rep = lsh_index_append(_nd_root(root), _nd_kv(slot_pages_ds, cfg), slot=k)
    return {**cov, "nd_indexed_docs": rep["n_docs"]}


def _screen_neardup(root: str, new_pages_ds, cfg) -> tuple:
    """Content near-dup screen of url-new pages against the corpus index:
    a page whose extracted text near-dups the corpus (or loses to a kept
    same-crawl twin) drops BEFORE NER and never ledgers — a recrawl of it
    re-screens at banding cost, never NER cost. Returns (kept_pages_ds,
    report). The dropped-url set is minority-sized by construction and
    applies as a broadcast anti-membership filter (the html of dropped
    pages never enters an exchange)."""
    import ray

    from pie_ray.functions.dedup_index import lsh_index_screen

    kv = _nd_kv(new_pages_ds, cfg).materialize()
    if kv.count() == 0:
        return new_pages_ds, {"n_neardup_dropped": 0}
    _kept_kv, rep = lsh_index_screen(_nd_root(root), kv, return_drop_keys=True)
    drop = rep.pop("drop_keys")
    nd_rep = {
        "n_neardup_dropped": len(drop),
        "n_neardup_vs_corpus": rep["n_dup_vs_index"],
        "n_neardup_intra": rep["n_dup_intra"],
    }
    if not drop:
        return new_pages_ds, nd_rep
    dref = ray.put(pa.array(drop, pa.string()))

    def keep(t: pa.Table, urls_ref=None) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t.column("url"), value_set=ray.get(urls_ref)))
        )

    kept = new_pages_ds.map_batches(
        keep, fn_kwargs={"urls_ref": dref}, batch_format="pyarrow"
    )
    return kept, nd_rep


def _slot_pages(root: str, k: int, pages_ds):
    """The crawl pages belonging to increment ``k``: the input filtered to
    the slot's DURABLE url ledger (broadcast — bounded by the increment,
    not the corpus), plus the ledgered-url count so the writer can verify
    coverage. This is the recovery-safe page set for the link delta: after
    ANY crash, the replayed crawl still contains these pages even though
    the ledger already screens them out of ``_truly_new`` (a DIFFERENT
    crawl may not — ``_write_link_delta`` warns on the shortfall)."""
    import glob as _glob

    import pyarrow.parquet as pq

    import ray

    files = sorted(
        _glob.glob(os.path.join(root, "urls", f"delta_{k:06d}", "*.parquet"))
    )
    urls: set[str] = set()
    for f in files:
        urls.update(pq.read_table(f, columns=["url"]).column("url").to_pylist())
    if not urls:
        import ray.data

        return (
            ray.data.from_arrow(
                pa.table(
                    {"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())}
                )
            ),
            0,
        )
    ref = ray.put(frozenset(urls))

    def keep(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        mask = [u in want for u in t.column("url").to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return pages_ds.map_batches(keep, batch_format="pyarrow"), len(urls)


def linkgraph_from_deltas(root: str):
    """Current host link graph = ONE pair-bucketed re-aggregation of every
    increment's edge partials — a pure function of the delta set, same
    contract as the triple rebuild. Cost tracks edge-partial bytes (hosts²
    worst case, sparse in practice), never pages: a daily delta updates
    the web graph without touching the historical corpus. Returns a
    Dataset (src_host, dst_host, n_links), or None when no link deltas
    exist. (``compact_deltas`` leaves linkedges dirs as-is — they are
    already tiny aggregates; correctness only needs the union.)"""
    import numpy as np

    import ray.data

    from pie_ray.stages.links import PAIR_SEP
    from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped

    meta_path = os.path.join(root, META_NAME)
    if os.path.exists(meta_path) and not _link_deltas_enabled(root, _read_meta(root)):
        raise ValueError(
            "this root was built without link_deltas — the stored "
            "linkedges (if any) cannot cover every increment; rebuild "
            "with link_deltas=True for a complete graph"
        )
    # only COMPLETED slots count: a dir without _DONE is a partial write
    # whose increment never ledgered (its pages will re-land on replay)
    files = [
        f
        for f in _delta_files(root, "linkedges")
        if os.path.exists(os.path.join(os.path.dirname(f), "_DONE"))
    ]
    if not files:
        return None
    ds = ray.data.read_parquet(files)
    nb = bucket_count(ds.size_bytes(), floor=32)

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            t.column("src_host"), t.column("dst_host"), PAIR_SEP
        )
        b = (bucket_hash_strings(key, salt=0x71A3) % nb).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "src_host": pa.array([], pa.string()),
                    "dst_host": pa.array([], pa.string()),
                    "n_links": pa.array([], pa.int64()),
                }
            )
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["src_host", "dst_host"])
            .aggregate([("n_links", "sum")])
        )
        return rename_grouped(
            gb, ["src_host", "dst_host"], ["src_host", "dst_host", "n_links"]
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def incremental_build(
    pages_ds,
    root: str,
    cfg=None,
    link_deltas: bool = False,
    near_dup: bool = False,
) -> dict:
    """Fresh build that leaves incremental state behind (increment 0).
    ``link_deltas`` also records host link-edge partials per increment so
    the web link graph stays maintainable by delta (CLI --ingest
    --linkgraph). ``near_dup`` additionally maintains a persisted
    MinHash-LSH content index (functions/dedup_index.py) so every later
    ``incremental_update`` drops pages whose TEXT near-dups the corpus —
    or a kept same-crawl twin — before NER; the build corpus itself is
    indexed as given, not deduplicated (content curation of the base
    corpus is a pipeline choice, e.g. pipelines/curation.py). Both flags
    are STICKY: updates consult the store meta, not a per-call flag."""
    from pie_ray.pipelines.kg import KgConfig

    cfg = cfg or KgConfig()
    os.makedirs(root, exist_ok=True)
    n_urls = _write_increment(root, 0, pages_ds, cfg)
    if link_deltas:
        # a build crash replays the WHOLE build (meta never landed), so
        # slot 0 simply rewrites; no ledger-derived recovery needed here
        _write_link_delta(root, 0, pages_ds)
    if near_dup:
        _write_nd_delta(root, 0, pages_ds, cfg)
    res = _rebuild(root, cfg)
    _write_meta(
        root,
        {
            "n_updates": 1,
            "n_urls": _ledger_rows(root),
            "built_fp": _delta_fingerprint(root),
            "link_deltas": bool(link_deltas),
            "near_dup": bool(near_dup),
        },
    )
    return {**res, "n_new_pages": n_urls}


def _keep_urls(t: pa.Table, urls_ref=None) -> pa.Table:
    import ray

    return t.filter(pc.is_in(t.column("url"), value_set=ray.get(urls_ref)))


def _truly_new(pages_ds, root: str, meta: dict, fpp: float):
    """Split a (possibly heavily re-crawled) page set into the provably-new
    rows plus the exact-checked Bloom false positives. Returns a Dataset."""
    import ray
    import ray.data

    from pie_ray.functions.bloom import bloom_build, bloom_screen
    from pie_ray.util import join_num_partitions

    urls_ds = ray.data.read_parquet(_delta_files(root, "urls"))
    bf = bloom_build(urls_ds, "url", capacity=max(1024, meta["n_urls"]), fpp=fpp)
    definitely_new = bloom_screen(pages_ds, bf, "url", keep="new")
    cand_urls_ds = bloom_screen(
        pages_ds.map_batches(lambda t: t.select(["url"]), batch_format="pyarrow"),
        bf,
        "url",
        keep="seen",
    )
    n_cand = cand_urls_ds.count()
    if n_cand == 0:
        return definitely_new

    if n_cand <= INC_DRIVER_CANDIDATES:
        # candidate-filtered ledger scan: driver memory = candidate urls
        cand = pa.array(
            sorted({r["url"] for r in cand_urls_ds.take_all()}), pa.string()
        )
        cref = ray.put(cand)
        confirmed = {
            r["url"]
            for r in urls_ds.map_batches(
                _keep_urls, fn_kwargs={"urls_ref": cref}, batch_format="pyarrow"
            ).take_all()
        }
        fp_urls = sorted(set(cand.to_pylist()) - confirmed)
    else:
        # key-only anti-join: urls (strings) shuffle, output = FPs only
        marker = urls_ds.map_batches(
            lambda t: pa.table(
                {
                    "r_url": t.column("url"),
                    "__seen": pa.array([1] * t.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        joined = cand_urls_ds.join(
            marker,
            join_type="left_outer",
            num_partitions=join_num_partitions(urls_ds.size_bytes()),
            on=("url",),
            right_on=("r_url",),
        )
        fp_urls = sorted(
            {
                r["url"]
                for r in joined.map_batches(
                    lambda t: t.filter(pc.is_null(t.column("__seen"))).select(["url"]),
                    batch_format="pyarrow",
                ).take_all()
            }
        )
    if not fp_urls:
        return definitely_new
    fref = ray.put(pa.array(fp_urls, pa.string()))
    fp_pages = pages_ds.map_batches(
        _keep_urls, fn_kwargs={"urls_ref": fref}, batch_format="pyarrow"
    )
    return definitely_new.union(fp_pages)


def incremental_update(root: str, pages_ds, cfg=None, fpp: float = 1e-3,
                       link_deltas: bool = False) -> dict:
    """Ingest a new crawl: screen out every already-processed url, run
    extract/NER on the remainder only, append the increment, rebuild the
    derived triples + graph. No new pages -> no-op (caches untouched).
    Stores built with ``near_dup=True`` additionally drop url-new pages
    whose extracted text near-dups the corpus (or a kept same-crawl twin)
    BEFORE NER — dropped pages never ledger, so a recrawl re-pays the
    banding screen, never NER — and maintain the content index per
    increment with the link-delta recovery discipline.

    ``fpp`` bounds the exact-recheck overhead (FP pages re-screened ~ fpp x
    new pages) AND the anti-join path's driver pull — at 10^12-page scale
    pick fpp so fpp x crawl size fits the driver (1e-3 default).
    ``link_deltas``: also record the new pages' host link edges (see
    ``incremental_build``)."""
    from pie_ray.pipelines.kg import KgConfig

    cfg = cfg or KgConfig()
    meta = _read_meta(root)
    ld_enabled = _link_deltas_enabled(root, meta)
    if link_deltas and not ld_enabled:
        raise ValueError(
            "link deltas were not enabled at build time — earlier "
            "increments' pages are gone, so their edges cannot be "
            "backfilled; rebuild with link_deltas=True"
        )
    nd_enabled = _nd_enabled(root, meta)
    nd_rep: dict = {}
    if nd_enabled and not _nd_delta_done(root, meta["n_updates"]) and glob.glob(
        os.path.join(root, "urls", f"delta_{meta['n_updates']:06d}", "*.parquet")
    ):
        # a prior update crashed AFTER its ledger write but BEFORE its
        # index append (the only window the write ordering allows): heal
        # the slot from ledger ∩ crawl BEFORE screening, or a near-dup of
        # the crashed window's kept pages slips through the replay
        nd_slot, nd_ledgered = _slot_pages(root, meta["n_updates"], pages_ds)
        nd_rep.update(
            _write_nd_delta(
                root, meta["n_updates"], nd_slot, cfg, n_ledgered=nd_ledgered
            )
        )
    new_pages = _truly_new(pages_ds, root, meta, fpp)
    if nd_enabled:
        # content screen BEFORE the ledger write: dropped pages never
        # ledger, so the screen is what a recrawl of them re-pays — and a
        # page can never screen against its OWN index entry (the slot's
        # index delta lands strictly AFTER its ledger below)
        new_pages, screen_rep = _screen_neardup(root, new_pages, cfg)
        nd_rep.update(screen_rep)
    n_new = _write_increment(root, meta["n_updates"], new_pages, cfg)
    if nd_enabled and n_new:
        # same recovery contract as the link-delta slot below: rebuild
        # from ledger ∩ crawl (kept pages only — dropped never ledger),
        # rewrite idempotently, warn on coverage gaps
        nd_slot, nd_ledgered = _slot_pages(root, meta["n_updates"], pages_ds)
        nd_rep.update(
            _write_nd_delta(
                root, meta["n_updates"], nd_slot, cfg, n_ledgered=nd_ledgered
            )
        )
    link_cov: dict = {}
    if ld_enabled and (n_new or not _link_delta_done(root, meta["n_updates"])):
        # STICKY once enabled (a forgotten flag must not hole the graph).
        # The slot rebuilds from its DURABLE url ledger ∩ the crawl, so
        # every crash window replays to the same edges: crash before the
        # ledger -> the replay re-screens the pages as new and re-lands
        # both; crash after the ledger (n_new==0 on replay) -> the slot
        # lacks _DONE and rebuilds from the ledgered urls, which the
        # replayed crawl still carries; a later update reusing a stale
        # slot number (crash before the meta write) -> n_new>0 forces a
        # rewrite over the slot's ENLARGED ledger, old + new urls both
        # covered. Cost: one bounded ledger read + one filtered pass.
        slot_ds, n_ledgered = _slot_pages(root, meta["n_updates"], pages_ds)
        link_cov = _write_link_delta(
            root, meta["n_updates"], slot_ds, n_ledgered=n_ledgered
        )
    if n_new == 0 and _delta_fingerprint(root) == meta.get("built_fp"):
        # nothing genuinely new AND the caches incorporate every durable
        # delta: true no-op (empty delta dirs are skipped on read, meta
        # stays put — the slot is reused)
        return {"n_new_pages": 0, "rebuilt": False, **link_cov, **nd_rep}
    # n_new == 0 with a fingerprint mismatch means a previous update
    # crashed between its increment landing and its rebuild — rebuild now
    res = _rebuild(root, cfg)
    _write_meta(
        root,
        {
            "n_updates": meta["n_updates"] + (1 if n_new else 0),
            "n_urls": _ledger_rows(root),
            "built_fp": _delta_fingerprint(root),
            "link_deltas": ld_enabled,
            "near_dup": nd_enabled,
        },
    )
    return {**res, "n_new_pages": n_new, "rebuilt": True, **link_cov, **nd_rep}


def compact_deltas(root: str) -> dict:
    """Rewrite the accumulated per-increment delta dirs (raw triples + url
    ledger) into ONE delta each. After many ``--ingest`` rounds the root
    holds one small-file directory per update; every rebuild and Bloom
    refresh then pays per-file open costs, and object stores throttle on
    file count long before bytes. Compaction is a pure rewrite — row
    content is unchanged, so the derived caches stay valid: the recorded
    ``built_fp`` is re-stamped to the post-compaction fingerprint IF the
    caches were current (a crash between the swap and the meta write, or
    compacting a root with a pending unbuilt increment, leaves a
    fingerprint mismatch and the next update rebuilds — wasteful but
    correct, the same recovery path as a killed update).

    Crash-safe by the same discipline as the rebuild: each table writes to
    ``<table>.compacting`` then swaps in atomically; stale ``.compacting``
    garbage from a killed run is cleared on the next attempt."""
    import ray.data

    meta = _read_meta(root)
    caches_current = meta.get("built_fp") == _delta_fingerprint(root)
    stats: dict = {}
    tables = ["raw", "urls"]
    nd = _nd_enabled(root, meta)
    if nd:
        # the near-dup index accumulates the same per-increment small-dir
        # growth; its deltas are distinct-row sets (a recrawled url's twin
        # entries are harmless), so compaction is the same pure rewrite.
        # Slot alignment survives: later increments append SPARSE slots
        # (slot = n_updates, which keeps growing) — _committed_files globs
        # by slot number, so missing dirs between 0 and the next slot are
        # simply empty, and the index meta recounts after the swap.
        tables += [f"{ND_DIR}/bands", f"{ND_DIR}/shingles"]
    for table in tables:
        deltas = sorted(glob.glob(os.path.join(root, table, "delta_*")))
        key = table.replace("/", "_")
        stats[f"{key}_deltas_before"] = len(deltas)
        stats[f"{key}_files_before"] = len(_delta_files(root, table))
        if len(deltas) <= 1:
            continue
        files = _delta_files(root, table)
        build = os.path.join(root, f"{table}.compacting")
        shutil.rmtree(build, ignore_errors=True)
        os.makedirs(os.path.join(build, "delta_000000"))
        if files:
            # coalesce toward ~128 MB output files (the point of compacting
            # is FEWER files; write_parquet otherwise emits one per block)
            total_bytes = sum(os.path.getsize(f) for f in files)
            n_out = max(1, -(-total_bytes // (128 << 20)))
            ds = ray.data.read_parquet(files)
            if n_out < len(files):
                ds = ds.repartition(n_out)
            ds.write_parquet(os.path.join(build, "delta_000000"))
        _swap_in(build, os.path.join(root, table))
    stats["raw_files_after"] = len(_delta_files(root, "raw"))
    stats["urls_files_after"] = len(_delta_files(root, "urls"))
    if nd:
        # all band/shingle rows now live in slot 0; commit the recount
        # (crash between the swaps and this write is benign — the old
        # n_deltas still covers delta_000000 via its range glob)
        from pie_ray.functions.dedup_index import _read_meta as ix_read
        from pie_ray.functions.dedup_index import _write_meta as ix_write
        from pie_ray.functions.dedup_index import refresh_meta_counts

        ixr = _nd_root(root)
        ixm = ix_read(ixr)
        if ixm is not None:
            ixm["n_deltas"] = 1
            ix_write(ixr, ixm)
            refresh_meta_counts(ixr)
        stats["lshix_files_after"] = len(_delta_files(root, f"{ND_DIR}/bands")) + len(
            _delta_files(root, f"{ND_DIR}/shingles")
        )
    if caches_current:
        meta["built_fp"] = _delta_fingerprint(root)
        _write_meta(root, meta)
    stats["caches_current"] = caches_current
    return stats


# ---------------------------------------------------------------------------
# time travel — read the KG as of an earlier increment, and change feeds
# ---------------------------------------------------------------------------


def list_increments(root: str) -> list[int]:
    """Increment ids still individually readable (compaction collapses
    history into delta_000000 — the standard LSM trade: fewer files, less
    time-travel granularity; run it when history is no longer needed)."""
    import glob as _glob

    ks = set()
    for d in _glob.glob(os.path.join(root, "raw", "delta_*")):
        ks.add(int(os.path.basename(d).split("_")[1]))
    return sorted(ks)


def triples_asof(root: str, upto: int, cfg=None):
    """Canonical triples AS OF increment ``upto`` (inclusive) — link,
    canonicalize and dedup re-run over the raw-delta PREFIX, so the result
    is bit-equal to what the store served after that ingest (the same
    purity argument as _rebuild: output is a pure function of the raw
    deltas; determinism across parallelism is the tested invariant).
    Returns a materialized Dataset; the live store is never touched."""
    from pie_ray.pipelines.kg import KgConfig, canonicalize_stage, link_stage

    cfg = cfg or KgConfig()
    files = [
        f
        for f in _delta_files(root, "raw")
        if int(os.path.basename(os.path.dirname(f)).split("_")[1]) <= upto
    ]
    if not files:
        raise ValueError(
            f"no raw deltas <= increment {upto} under {root} "
            f"(available: {list_increments(root)}; compaction may have "
            "collapsed history)"
        )
    import ray.data

    raw = ray.data.read_parquet(files).materialize()
    canon = link_stage(raw, cfg)
    return canonicalize_stage(raw, canon, cfg).materialize()


def kg_changes(root: str, k_from: int, k_to: int, cfg=None):
    """Change feed between two increments: (subj, pred, obj, change) rows
    with change in {'added', 'removed'} — triples_diff over two as-of
    reads. Both sides materialize BEFORE the diff's exchange (repo rule:
    one all-to-all per streaming plan)."""
    from pie_ray.functions.graphops import triples_diff

    old = triples_asof(root, k_from, cfg)
    new = triples_asof(root, k_to, cfg)
    return triples_diff(old, new)


# ---------------------------------------------------------------------------
# erasure — GDPR/right-to-be-forgotten over the incremental store
# ---------------------------------------------------------------------------

# erasure requests are small by nature (a url list / one entity); the
# drop set broadcasts via ray.put — bounded well below this
FORGET_BROADCAST_LIMIT = 5_000_000


def _affected_deltas(root: str, table: str, match_mask_fn) -> dict[str, int]:
    """ONE column-pruned streaming pass over every delta of ``table``:
    per-delta-dir match counts (O(dirs) driver rows). Dirs with zero
    matches are later hardlinked, not rewritten — untouched increments
    stay byte-stable (same property the graph refresh keeps)."""
    import ray.data

    files = _delta_files(root, table)
    if not files:
        return {}

    def count(t: pa.Table) -> pa.Table:
        mask = match_mask_fn(t)
        dirs = [os.path.dirname(p) for p in t.column("path").to_pylist()]
        agg: dict[str, int] = {}
        for d, m in zip(dirs, mask.to_pylist()):
            agg[d] = agg.get(d, 0) + (1 if m else 0)
        return pa.table(
            {
                "dir": pa.array(list(agg), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    out: dict[str, int] = {}
    counts = ray.data.read_parquet(files, include_paths=True).map_batches(
        count, batch_format="pyarrow"
    )
    for r in counts.take_all():
        out[r["dir"]] = out.get(r["dir"], 0) + r["n"]
    return {d: n for d, n in out.items() if n > 0}


def _erase_rows(root: str, table: str, match_mask_fn) -> dict:
    """Rewrite ``root/<table>`` with every row matching ``match_mask_fn``
    removed. Crash-safe by the compaction discipline: the full table tree
    is staged under ``<table>.forgetting`` (affected delta dirs rewritten
    through a streaming filter, untouched dirs HARDLINKED — zero copy)
    and swapped in atomically; stale staging from a killed run is cleared
    on the next attempt, and a re-run of the same request converges
    (idempotent — already-erased rows simply match nothing)."""
    import ray.data

    build = os.path.join(root, f"{table}.forgetting")
    shutil.rmtree(build, ignore_errors=True)  # stale staging from a kill
    affected = _affected_deltas(root, table, match_mask_fn)
    rows_dropped = sum(affected.values())
    if not affected:
        return {"rows_dropped": 0, "deltas_rewritten": 0}
    os.makedirs(build)
    for d in sorted(glob.glob(os.path.join(root, table, "delta_*"))):
        dst = os.path.join(build, os.path.basename(d))
        os.makedirs(dst)
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if d in affected:
            if files:
                ray.data.read_parquet(files).map_batches(
                    lambda t: t.filter(pc.invert(match_mask_fn(t))),
                    batch_format="pyarrow",
                ).write_parquet(dst)
        else:
            for f in files:
                os.link(f, os.path.join(dst, os.path.basename(f)))
            for s in ("_DONE", "_COVERAGE"):
                if os.path.exists(os.path.join(d, s)):
                    os.link(os.path.join(d, s), os.path.join(dst, s))
    _swap_in(build, os.path.join(root, table))
    return {"rows_dropped": rows_dropped, "deltas_rewritten": len(affected)}


def forget_urls(root: str, urls, cfg=None, pages_ds=None) -> dict:
    """Erase every trace of ``urls`` from the store: their raw triples
    (provenance column), their url-ledger rows, their link-edge
    contributions (link-delta roots), then rebuild the derived caches.
    The result equals a fresh build over the corpus MINUS those pages —
    including time-travel reads, which replay the REWRITTEN deltas
    (erasure rewrites history; that is the point).

    Ledger semantics: the erased urls come OUT of the ledger, so a later
    recrawl of one re-ingests it — erasure means erase, not suppress.
    Callers who must also block re-ingestion keep a denylist at the
    frontier (stages/frontier.py), which is a crawl policy, not store
    state.

    Link-delta roots need the affected increments' PAGES back (edge
    weights are counted aggregates — a forgotten page's contribution
    cannot be subtracted from a count without the original html), so
    ``pages_ds`` (any superset crawl containing the surviving pages of
    affected increments) is REQUIRED there; the slot rewrite reuses the
    crash-recovery path including its durable coverage check."""
    import ray

    from pie_ray.pipelines.kg import KgConfig

    cfg = cfg or KgConfig()
    meta = _read_meta(root)
    want = sorted(set(urls))
    if len(want) > FORGET_BROADCAST_LIMIT:
        raise ValueError(
            f"{len(want)} urls exceeds FORGET_BROADCAST_LIMIT — split the "
            "erasure request into batches"
        )
    ref = ray.put(pa.array(want, pa.string()))

    def url_match(t: pa.Table) -> pa.ChunkedArray:
        return pc.is_in(t.column("url"), value_set=ray.get(ref))

    # linkedges first: find affected slots from the PRE-rewrite ledger
    # (after the ledger swap the matches are gone); rewrite the slots
    # AFTER the ledger swap so _slot_pages sees the post-erasure ledger
    ld_enabled = _link_deltas_enabled(root, meta)
    affected_slots: list[int] = []
    if ld_enabled:
        affected_slots = sorted(
            int(os.path.basename(d).split("_")[1])
            for d in _affected_deltas(root, "urls", url_match)
        )
        if affected_slots and pages_ds is None:
            raise ValueError(
                "this root maintains link deltas; erasing pages from "
                f"increments {affected_slots} changes counted host-edge "
                "aggregates, which cannot be recomputed without the pages "
                "— pass pages_ds (the surviving pages of those increments)"
            )

    report = {"urls_requested": len(want)}
    r = _erase_rows(root, "raw", url_match)
    report["raw_rows_dropped"] = r["rows_dropped"]
    report["raw_deltas_rewritten"] = r["deltas_rewritten"]
    r = _erase_rows(root, "urls", url_match)
    report["ledger_rows_dropped"] = r["rows_dropped"]
    report["ledger_deltas_rewritten"] = r["deltas_rewritten"]

    if _nd_enabled(root, meta):
        # the near-dup index holds content-derived fingerprints (band keys
        # + shingle hashes) of the erased pages — GDPR semantics require
        # them gone too, and a stale entry would wrongly SUPPRESS a future
        # re-ingest of similar content. Same staged-rewrite discipline;
        # the index meta recounts from the rewritten files afterwards.
        from pie_ray.functions.dedup_index import refresh_meta_counts

        def key_match(t: pa.Table) -> pa.ChunkedArray:
            return pc.is_in(t.column("key"), value_set=ray.get(ref))

        nd_dropped = 0
        for sub in ("bands", "shingles"):
            rr = _erase_rows(root, f"{ND_DIR}/{sub}", key_match)
            nd_dropped += rr["rows_dropped"]
        if nd_dropped:
            refresh_meta_counts(_nd_root(root))
        report["neardup_index_rows_dropped"] = nd_dropped

    for k in affected_slots:
        slot_pages, n_ledgered = _slot_pages(root, k, pages_ds)
        cov = _write_link_delta(root, k, slot_pages, n_ledgered=n_ledgered)
        report.setdefault("link_slots_rewritten", []).append({"k": k, **cov})

    stats = _rebuild(root, cfg)
    meta["n_urls"] = _ledger_rows(root)
    meta["built_fp"] = _delta_fingerprint(root)
    _write_meta(root, meta)
    return {**report, **stats}


def forget_person(root: str, person_key: str, cfg=None) -> dict:
    """Erase one PERSON entity from the knowledge graph: every raw triple
    whose subject links into the person's canonical component, and every
    co-mention edge pointing AT the person, then rebuild. The url ledger
    is untouched — the pages were still processed and their OTHER facts
    survive (erasing a person is not erasing the page).

    The component is resolved over the CURRENT raw union with the same
    linking configuration as the serving pipeline, so the erased key set
    is exactly what canonicalization would have folded into the entity.
    Erasure is by raw subject key, so the rebuild (which re-links from
    scratch — linking is not monotone under key-set shrinkage, see the
    module docstring) cannot resurrect any part of the entity."""
    import ray
    import ray.data

    from pie_ray.pipelines.kg import KgConfig, link_stage

    cfg = cfg or KgConfig()
    meta = _read_meta(root)
    files = _delta_files(root, "raw")
    if not files:
        return {"person": person_key, "keys_erased": 0, "raw_rows_dropped": 0}
    raw = ray.data.read_parquet(files).materialize()
    kind, canon = link_stage(raw, cfg)
    if kind == "map":
        target = canon.get(person_key, person_key)
        keys = sorted(
            {k for k, v in canon.items() if v == target} | {person_key}
        )
    else:  # ("ds", labels) — past the broadcast limit; component-bounded pulls
        def _eq(col: str, val: str):
            def fn(t: pa.Table) -> pa.Table:
                return t.filter(pc.equal(t.column(col), val))

            return fn

        hit = canon.map_batches(_eq("entity_key", person_key),
                                batch_format="pyarrow").take(1)
        target = hit[0]["canon_id"] if hit else person_key
        member_rows = canon.map_batches(_eq("canon_id", target),
                                        batch_format="pyarrow").take_all()
        keys = sorted({r["entity_key"] for r in member_rows} | {person_key})
    ref = ray.put(pa.array(keys, pa.string()))

    def person_match(t: pa.Table) -> pa.ChunkedArray:
        vs = ray.get(ref)
        m = pc.is_in(t.column("subj"), value_set=vs)
        co = pc.and_(
            pc.equal(t.column("pred"), "co_mentioned_with"),
            pc.is_in(t.column("obj"), value_set=vs),
        )
        return pc.or_(m, co)

    r = _erase_rows(root, "raw", person_match)
    stats = _rebuild(root, cfg)
    meta["built_fp"] = _delta_fingerprint(root)
    _write_meta(root, meta)
    return {
        "person": person_key,
        "canon_id": target,
        "keys_erased": len(keys),
        "raw_rows_dropped": r["rows_dropped"],
        "raw_deltas_rewritten": r["deltas_rewritten"],
        **stats,
    }
