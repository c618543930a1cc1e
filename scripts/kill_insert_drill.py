#!/usr/bin/env python
"""insert_sorted SIGKILL drill — exactly-once evidence for the journaled
two-phase commit (companion to kill_resume_drill.py's A19 drill; the unit
suite covers every crash STATE by construction, this drill covers REAL
process kills at arbitrary moments).

Protocol:
  1. Build a sorted layout (BASE_ROWS rows, NUM_RANGES ranges).
  2. Repeatedly spawn a child that streams N_DELTAS token-gated deltas
     into the layout (``insert_sorted(..., token=f"d{i}")``; already-
     applied tokens are skipped) and SIGKILL it at a ramped offset, so
     kills land in every phase — Ray startup, merge tasks, journal write,
     the rename window, token recording.
  3. After each kill, call ``recover_sorted`` (roll forward or discard)
     and assert the ATOMICITY invariant: every delta is present with
     exactly 0 or exactly DELTA_ROWS rows — never partially.
  4. Run one final child to completion (a blind full replay) and assert
     the EXACTLY-ONCE invariant: every delta present exactly once, the
     layout still reads, every range dir still internally sorted.

Usage: python scripts/kill_insert_drill.py            # orchestrates
       python scripts/kill_insert_drill.py --child P  # internal
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_ROWS = 4000
NUM_RANGES = 8
N_DELTAS = 12
DELTA_ROWS = 40
OUT = "/tmp/kill_insert_drill"
# ramped kill offsets (s): early ones land in Ray startup / the first
# merges, later ones deeper into the delta stream's commit windows
KILL_AFTER = [2.0, 6.0, 8.5, 10.0, 11.5, 13.0]


def _session(num_cpus: int = 8):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from pie_ray.util import tune_data_context

    tune_data_context()


def _delta_table(i: int):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(1000 + i)
    return pa.table(
        {
            "id": pa.array(
                np.arange(100_000 + i * DELTA_ROWS, 100_000 + (i + 1) * DELTA_ROWS),
                pa.int64(),
            ),
            "k": pa.array(rng.normal(scale=10, size=DELTA_ROWS)),
            "payload": pa.array([f"d{i}-{j}" for j in range(DELTA_ROWS)]),
        }
    )


def child(path: str, n_deltas: int) -> None:
    """Stream deltas [0, n_deltas) into the layout, token-gated (replays
    skip already-applied tokens)."""
    _session()
    import ray.data

    from pie_ray.sources.sorted_sink import insert_sorted, recover_sorted

    recover_sorted(path)
    for i in range(n_deltas):
        rep = insert_sorted(
            path, ray.data.from_arrow(_delta_table(i)), token=f"d{i}"
        )
        print(f"delta {i}: {rep}", flush=True)


def _delta_counts(path: str, n_deltas: int) -> dict[int, int]:
    import pyarrow.parquet as pq

    # committed range dirs ONLY (the sink's own notion of committed —
    # range=N.tmp/.old staging dirs also match a bare range=* glob, and a
    # killed child's orphaned merge worker can leave uncommitted parquet
    # there; counting it would corrupt the atomicity evidence)
    from pie_ray.sources.sorted_sink import _committed_range_files

    counts: dict[int, int] = {i: 0 for i in range(n_deltas)}
    for f in _committed_range_files(path):
        for p in pq.read_table(f, columns=["payload"]).column("payload").to_pylist():
            if p.startswith("d") and "-" in p:
                i = int(p[1:].split("-", 1)[0])
                if i in counts:
                    counts[i] += 1
    return counts


def _assert_atomic(path: str, n_deltas: int) -> dict[int, int]:
    counts = _delta_counts(path, n_deltas)
    for i, c in counts.items():
        assert c in (0, DELTA_ROWS), f"delta {i} PARTIALLY applied: {c} rows"
    return counts


def main() -> None:
    import numpy as np
    import pyarrow as pa

    _session()
    import ray.data

    from pie_ray.sources.sorted_sink import (
        read_sorted,
        recover_sorted,
        write_sorted_parquet,
    )

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(4)
    base = pa.table(
        {
            "id": pa.array(np.arange(BASE_ROWS), pa.int64()),
            "k": pa.array(rng.normal(scale=10, size=BASE_ROWS)),
            "payload": pa.array([f"p{i}" for i in range(BASE_ROWS)]),
        }
    )
    write_sorted_parquet(
        ray.data.from_arrow(base).repartition(4), OUT, "k", "id", NUM_RANGES
    )

    kills = 0
    journal_kills = 0
    n_total = N_DELTAS

    def spawn(n: int):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", OUT, str(n)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    for kill_after in KILL_AFTER:
        proc = spawn(n_total)
        time.sleep(kill_after)
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            kills += 1
            # let the child's orphaned Ray workers notice the driver died
            # before touching the layout (single-writer contract)
            time.sleep(2.0)
        # layout must recover and be delta-atomic after every kill
        recover_sorted(OUT)
        _assert_atomic(OUT, n_total)

    # journal-window kills: busy-poll for _INSERT_JOURNAL.json and SIGKILL
    # the instant it appears — a REAL kill inside the commit window (the
    # unit tests construct these states; this lands one for real). Each
    # round adds one fresh delta so there's a new commit to catch.
    jp = os.path.join(OUT, "_INSERT_JOURNAL.json")
    for _round in range(10):
        n_total += 1
        proc = spawn(n_total)
        deadline = time.time() + 60.0
        caught = False
        killed_in_loop = False
        while time.time() < deadline and proc.poll() is None:
            if os.path.exists(jp):
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()
                killed_in_loop = True
                caught = os.path.exists(jp)  # still journaled post-kill?
                break
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            killed_in_loop = True
        if killed_in_loop:
            # count EVERY kill sent (a kill whose journal vanished before
            # the post-kill check is still a kill) and always give the
            # child's orphaned Ray workers time to notice the driver died
            # before touching the layout (single-writer contract)
            kills += 1
            time.sleep(2.0)
        if caught:
            journal_kills += 1
            rec = recover_sorted(OUT)
            assert rec["recovered"], rec  # rolled FORWARD from the journal
        else:
            recover_sorted(OUT)
        _assert_atomic(OUT, n_total)
        if journal_kills >= 2:
            break

    assert journal_kills >= 1, "no kill landed inside the journal window"

    # blind full replay to completion: tokens make it exactly-once
    proc = spawn(n_total)
    rc = proc.wait()
    assert rc == 0, "final replay child failed"
    counts = _assert_atomic(OUT, n_total)
    assert all(c == DELTA_ROWS for c in counts.values()), counts

    got = read_sorted(OUT).to_pandas()
    assert len(got) == BASE_ROWS + n_total * DELTA_ROWS, len(got)
    # clustering contract intact: every range dir internally sorted
    import pyarrow.parquet as pq

    for d in sorted(glob.glob(os.path.join(OUT, "range=*"))):
        tab = pa.concat_tables(
            pq.read_table(f) for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        )
        keys = tab.column("k").to_numpy()
        ids = tab.column("id").to_numpy()
        assert (np.lexsort((ids, keys)) == np.arange(len(keys))).all(), d
    tokens = json.load(open(os.path.join(OUT, "_INSERT_TOKENS.json")))
    print(
        json.dumps(
            {
                "kills": kills,
                "journal_window_kills_rolled_forward": journal_kills,
                "deltas": n_total,
                "rows_final": len(got),
                "tokens_recorded": len(tokens),
                "exactly_once": True,
            }
        )
    )


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], int(sys.argv[i + 2]))
    else:
        main()
