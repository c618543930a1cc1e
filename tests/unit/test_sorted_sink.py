"""write_sorted_parquet / read_sorted: round-trip completeness, per-file
sort order, directory range disjointness, and pruned range reads."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pie_ray.sources.sorted_sink import read_sorted, write_sorted_parquet


def _make(n=4000, seed=4):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "k": pa.array(rng.normal(scale=10, size=n)),
            "payload": pa.array([f"p{i}" for i in range(n)]),
        }
    )


def test_sorted_layout_roundtrip_and_pruning(ray_session):
    t = _make()
    out = tempfile.mkdtemp(prefix="sorted_")
    try:
        meta = write_sorted_parquet(
            ray.data.from_arrow(t).repartition(6), out, "k", "id", num_ranges=8
        )
        b = np.asarray(meta["boundaries"])
        assert len(b) >= 1 and (np.diff(b) > 0).all()

        # each range dir: internally sorted files, keys within the dir bound
        seen = 0
        for d in sorted(glob.glob(os.path.join(out, "range=*"))):
            r = int(d.rsplit("=", 1)[1])
            tab = pa.concat_tables(
                pq.read_table(f)
                for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            )
            keys = tab.column("k").to_numpy()
            ids = tab.column("id").to_numpy()
            order = np.lexsort((ids, keys))
            assert (order == np.arange(len(keys))).all(), f"{d} not sorted"
            if r > 0:
                assert keys.min() >= b[r - 1]
            if r < len(b):
                assert keys.max() < b[r]
            seen += len(keys)
        assert seen == t.num_rows

        # full read-back is the same multiset of rows
        got = read_sorted(out).to_pandas().sort_values("id").reset_index(drop=True)
        assert got.id.tolist() == list(range(t.num_rows))

        # bounded read: exact rows, and only intersecting dirs touched
        lo, hi = -5.0, 5.0
        want = np.flatnonzero(
            (t.column("k").to_numpy() >= lo) & (t.column("k").to_numpy() <= hi)
        )
        got2 = read_sorted(out, lo=lo, hi=hi).to_pandas()
        assert sorted(got2.id.tolist()) == sorted(want.tolist())

        # an out-of-domain range prunes everything
        assert read_sorted(out, lo=1e9, hi=2e9).count() == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_read_sorted_refuses_foreign_layout(ray_session):
    out = tempfile.mkdtemp(prefix="plain_")
    try:
        pq.write_table(_make(100), os.path.join(out, "x.parquet"))
        try:
            read_sorted(out)
            raise AssertionError("expected FileNotFoundError")
        except FileNotFoundError:
            pass
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_read_sorted_projection_and_empty_prune_schema(ray_session):
    t = _make(500)
    out = tempfile.mkdtemp(prefix="sorted_")
    try:
        write_sorted_parquet(
            ray.data.from_arrow(t).repartition(3), out, "k", "id", num_ranges=4
        )
        # projection that drops the key still filters on it, then strips it
        got = read_sorted(out, lo=-5.0, hi=5.0, columns=["payload"]).to_pandas()
        assert list(got.columns) == ["payload"]
        keys = t.column("k").to_numpy()
        assert len(got) == int(((keys >= -5.0) & (keys <= 5.0)).sum())
        # fully-pruned read keeps the Dataset-level schema (to_pandas on
        # ANY 0-row Ray Dataset loses columns — a Ray limitation, so the
        # schema contract is asserted at the Dataset level)
        empty = read_sorted(out, lo=1e9, hi=2e9)
        assert empty.count() == 0
        assert set(empty.schema().names) == {"id", "k", "payload"}
        empty2 = read_sorted(out, lo=1e9, hi=2e9, columns=["payload"])
        assert empty2.schema().names == ["payload"]
        # and a plain full read never leaks the hive 'range' column
        assert set(read_sorted(out).schema().names) == {"id", "k", "payload"}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_sorted_layout_int64_keys_exact(ray_session):
    # int keys beyond 2^53 must round-trip exactly through the sidecar
    base = 2**60
    ids = np.arange(2000)
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "k": pa.array(base + ids * 12_345, pa.int64()),
        }
    )
    out = tempfile.mkdtemp(prefix="sortedint_")
    try:
        meta = write_sorted_parquet(
            ray.data.from_arrow(t).repartition(4), out, "k", "id", num_ranges=8
        )
        assert all(isinstance(b, int) for b in meta["boundaries"])
        lo = base + 500 * 12_345
        hi = base + 700 * 12_345
        got = read_sorted(out, lo=lo, hi=hi).to_pandas()
        assert sorted(got.id.tolist()) == list(range(500, 701))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_sorted_layout_empty_dataset_roundtrip(ray_session):
    t = _make(10).slice(0, 0)
    out = tempfile.mkdtemp(prefix="sortedempty_")
    try:
        write_sorted_parquet(ray.data.from_arrow(t), out, "k", "id")
        e = read_sorted(out)
        assert e.count() == 0
        assert set(e.schema().names) == {"id", "k", "payload"}
        e2 = read_sorted(out, lo=0.0, hi=1.0)
        assert e2.count() == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_insert_sorted_localized_merge(ray_session):
    from pie_ray.sources.sorted_sink import insert_sorted

    t = _make(3000)
    out = tempfile.mkdtemp(prefix="sortedins_")
    try:
        write_sorted_parquet(
            ray.data.from_arrow(t).repartition(4), out, "k", "id", num_ranges=8
        )
        mtimes_before = {
            d: os.path.getmtime(d) for d in glob.glob(os.path.join(out, "range=*"))
        }
        # a narrow delta: keys in a small band hit only 1-2 ranges
        delta = pa.table(
            {
                "id": pa.array(np.arange(10_000, 10_050), pa.int64()),
                "k": pa.array(np.linspace(-0.5, 0.5, 50)),
                "payload": pa.array([f"d{i}" for i in range(50)]),
            }
        )
        rep = insert_sorted(out, ray.data.from_arrow(delta).repartition(2))
        assert rep["rows_inserted"] == 50
        assert 1 <= len(rep["ranges_rewritten"]) < 8  # localized, not global
        # untouched range dirs were not rewritten
        untouched = [
            d
            for d in mtimes_before
            if int(d.rsplit("=", 1)[1]) not in rep["ranges_rewritten"]
        ]
        assert untouched
        for d in untouched:
            assert os.path.getmtime(d) == mtimes_before[d]
        # merged layout: complete, still range-clustered and sorted
        got = read_sorted(out).to_pandas()
        assert len(got) == 3050
        assert set(delta.column("id").to_pylist()) <= set(got.id)
        band = read_sorted(out, lo=-0.5, hi=0.5).to_pandas()
        assert set(np.arange(10_000, 10_050)) <= set(band.id)
        for d in glob.glob(os.path.join(out, "range=*")):
            tab = pa.concat_tables(
                pq.read_table(f)
                for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            )
            keys = tab.column("k").to_numpy()
            ids = tab.column("id").to_numpy()
            assert (np.lexsort((ids, keys)) == np.arange(len(keys))).all()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_insert_sorted_rejects_schema_mismatch(ray_session):
    """ADVICE r3: a delta missing columns (or with extra / retyped ones)
    must ERROR up front, never silently null-fill or widen the layout."""
    from pie_ray.sources.sorted_sink import insert_sorted

    t = _make(500)
    out = tempfile.mkdtemp(prefix="sortedschm_")
    try:
        write_sorted_parquet(
            ray.data.from_arrow(t).repartition(2), out, "k", "id", num_ranges=4
        )
        # missing the payload column
        missing = pa.table(
            {
                "id": pa.array([90_001], pa.int64()),
                "k": pa.array([0.0]),
            }
        )
        with pytest.raises(ValueError, match="does not match the stored layout"):
            insert_sorted(out, ray.data.from_arrow(missing))
        # extra column
        extra = pa.table(
            {
                "id": pa.array([90_002], pa.int64()),
                "k": pa.array([0.0]),
                "payload": pa.array(["x"]),
                "rogue": pa.array([1]),
            }
        )
        with pytest.raises(ValueError, match="does not match the stored layout"):
            insert_sorted(out, ray.data.from_arrow(extra))
        # retyped column
        retyped = pa.table(
            {
                "id": pa.array([90_003], pa.int64()),
                "k": pa.array([0.0]),
                "payload": pa.array([7], pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="has type"):
            insert_sorted(out, ray.data.from_arrow(retyped))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _rows(path):
    got = read_sorted(path).to_pandas()
    return sorted(zip(got.id, np.round(got.k, 9), got.payload))


def _delta50():
    return pa.table(
        {
            "id": pa.array(np.arange(20_000, 20_050), pa.int64()),
            "k": pa.array(np.linspace(-1.0, 1.0, 50)),
            "payload": pa.array([f"x{i}" for i in range(50)]),
        }
    )


def test_insert_sorted_crash_rolls_forward(ray_session, monkeypatch):
    """A kill AFTER the journal write rolls FORWARD on recover_sorted —
    the final rows equal an uncrashed insert's, read_sorted refuses the
    half-swapped state in between, and a token-gated retry is a no-op
    (the delta lands exactly once)."""
    import json

    from pie_ray.sources import sorted_sink as ss

    t = _make(1500, seed=9)
    ref = tempfile.mkdtemp(prefix="sortedref_")
    out = tempfile.mkdtemp(prefix="sortedcrash_")
    try:
        for d in (ref, out):
            write_sorted_parquet(
                ray.data.from_arrow(t).repartition(4), d, "k", "id", num_ranges=8
            )
        ss.insert_sorted(ref, ray.data.from_arrow(_delta50()))
        want = _rows(ref)

        # crash at the commit point: journal durable, zero renames done
        def boom(path, journal):
            raise KeyboardInterrupt

        monkeypatch.setattr(ss, "_commit_insert", boom)
        with pytest.raises(KeyboardInterrupt):
            ss.insert_sorted(out, ray.data.from_arrow(_delta50()), token="ing-1")
        monkeypatch.undo()

        assert os.path.isfile(os.path.join(out, ss.INSERT_JOURNAL))
        with pytest.raises(RuntimeError, match="unfinished insert"):
            read_sorted(out)

        # deepen the crash: hand-advance one range into the mid-swap state
        # (old renamed away, tmp not yet moved) before recovering
        with open(os.path.join(out, ss.INSERT_JOURNAL)) as f:
            j = json.load(f)
        assert j["ranges"] and j["token"] == "ing-1"
        r0 = j["ranges"][0]
        rdir = os.path.join(out, f"range={r0}")
        os.rename(rdir, rdir + ".old")

        rec = ss.recover_sorted(out)
        assert rec["recovered"] and rec["rows_inserted"] == 50
        assert not os.path.isfile(os.path.join(out, ss.INSERT_JOURNAL))
        assert not glob.glob(os.path.join(out, "range=*.tmp"))
        assert not glob.glob(os.path.join(out, "range=*.old"))
        assert _rows(out) == want

        # blind re-run with the same token: skipped, nothing duplicated
        rep = ss.insert_sorted(out, ray.data.from_arrow(_delta50()), token="ing-1")
        assert rep == {"skipped": True, "token": "ing-1"}
        assert _rows(out) == want
    finally:
        shutil.rmtree(ref, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_insert_sorted_crash_before_journal_discards(ray_session):
    """A kill BEFORE the journal write means the insert never happened:
    the next call clears the stale prepare-phase dirs and the original
    rows are intact; the re-run then applies the delta exactly once."""
    from pie_ray.sources import sorted_sink as ss

    t = _make(800, seed=12)
    out = tempfile.mkdtemp(prefix="sortedpre_")
    try:
        write_sorted_parquet(
            ray.data.from_arrow(t).repartition(3), out, "k", "id", num_ranges=4
        )
        base = _rows(out)
        # fake a killed prepare: a half-written tmp dir and no journal
        stale = os.path.join(out, "range=2.tmp")
        os.makedirs(stale)
        with open(os.path.join(stale, "part-0.parquet"), "wb") as f:
            f.write(b"partial garbage")
        rec = ss.recover_sorted(out)
        assert rec["recovered"] is False and stale in rec["cleared"]
        assert not os.path.isdir(stale)
        assert _rows(out) == base  # layout untouched
        rep = ss.insert_sorted(out, ray.data.from_arrow(_delta50()), token="t2")
        assert rep["rows_inserted"] == 50
        assert len(_rows(out)) == 850
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_recover_sorted_torn_journal_discards(ray_session):
    """A torn (unparseable) journal with NOTHING pending (no .tmp/.old
    evidence) is exotic corruption with nothing to roll forward: recovery
    discards it instead of crashing, and the layout reads cleanly again.
    Both corruption shapes are covered: invalid JSON and invalid UTF-8."""
    from pie_ray.sources import sorted_sink as ss

    t = _make(400, seed=21)
    for garbage in (b'{"ranges": [1], "rows_ins', b"\xff\xfe{torn\x80"):
        out = tempfile.mkdtemp(prefix="sortedtorn_")
        try:
            write_sorted_parquet(
                ray.data.from_arrow(t).repartition(2), out, "k", "id", num_ranges=4
            )
            base = _rows(out)
            with open(os.path.join(out, ss.INSERT_JOURNAL), "wb") as f:
                f.write(garbage)
            with pytest.raises(RuntimeError, match="unfinished insert"):
                read_sorted(out)
            rec = ss.recover_sorted(out)
            assert rec["recovered"] is False
            assert not os.path.isfile(os.path.join(out, ss.INSERT_JOURNAL))
            assert _rows(out) == base
        finally:
            shutil.rmtree(out, ignore_errors=True)


def test_recover_sorted_torn_journal_with_pending_tmp_refuses(ray_session):
    """A torn journal NEXT TO range=*.tmp dirs (a prepared/partially
    committed insert) must refuse automatic recovery — a fresh-range
    commit leaves no .old evidence, so .tmp counts as evidence too."""
    from pie_ray.sources import sorted_sink as ss

    t = _make(300, seed=22)
    out = tempfile.mkdtemp(prefix="sortedtorntmp_")
    try:
        write_sorted_parquet(
            ray.data.from_arrow(t).repartition(2), out, "k", "id", num_ranges=4
        )
        os.makedirs(os.path.join(out, "range=1.tmp"))
        with open(os.path.join(out, ss.INSERT_JOURNAL), "w") as f:
            f.write("{torn")
        with pytest.raises(RuntimeError, match="half-applied or pending"):
            ss.recover_sorted(out)
        assert os.path.isfile(os.path.join(out, ss.INSERT_JOURNAL))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_recover_sorted_torn_journal_with_started_swap_refuses(ray_session):
    """An unreadable journal NEXT TO range=*.old evidence of a started
    swap must refuse automatic recovery, never silently discard."""
    from pie_ray.sources import sorted_sink as ss

    t = _make(300, seed=30)
    out = tempfile.mkdtemp(prefix="sortedrefuse_")
    try:
        write_sorted_parquet(
            ray.data.from_arrow(t).repartition(2), out, "k", "id", num_ranges=4
        )
        os.makedirs(os.path.join(out, "range=0.old"))
        with open(os.path.join(out, ss.INSERT_JOURNAL), "w") as f:
            f.write("{torn")
        with pytest.raises(RuntimeError, match="half-applied"):
            ss.recover_sorted(out)
        assert os.path.isfile(os.path.join(out, ss.INSERT_JOURNAL))
    finally:
        shutil.rmtree(out, ignore_errors=True)
