#!/usr/bin/env python
"""Near-dup ingest SIGKILL drill (crash-window evidence for the lshix
index, the same discipline as kill_resume_drill / kill_insert_drill).

Setup: a near_dup=True store over 2,000 synth pages. The drilled update
ingests a crawl of 3,000 pages (2,000 url-seen, 1,000 url-new) PLUS 200
content mirrors — already-ingested pages recrawled under different urls,
which only the CONTENT screen can drop.

Trials: the update runs in a child process and is SIGKILLed
  - the instant its slot-1 url ledger appears while the index still has
    one delta (a real kill INSIDE the ledger→index-append window the
    write ordering allows), and
  - at ramped wall offsets (whatever phase that lands in).

After every kill the same crawl replays to completion and the store must
equal an UNINTERRUPTED update on a pristine copy: identical triple set,
identical ledger row count, identical index doc count — and a probe
near-dup of the crawl-only content must still screen out (no index hole).

Usage: python scripts/kill_ingest_drill.py        # orchestrates everything
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_PAGES = 2_000
CRAWL_PAGES = 3_000
MIRROR_RANGE = (500, 700)  # recrawled under new urls -> content-screen work
OUT_ROOT = "/tmp/kill_ingest_drill"
BASE = os.path.join(OUT_ROOT, "base")
RAMP_OFFSETS_S = (8.0, 10.0, 12.0)


def _session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from pie_ray.util import tune_data_context

    tune_data_context()


def _crawl():
    import pyarrow as pa

    import ray.data
    from pie_ray.sources.synth import pages_table, synth_pages

    lo, hi = MIRROR_RANGE

    def mirror_batch(b):
        t = pages_table(b["id"] + lo)
        return t.set_column(
            0, "url",
            pa.array(["https://mirror.test/" + u for u in t.column("url").to_pylist()]),
        )

    mirrors = ray.data.range(hi - lo).map_batches(
        mirror_batch, batch_format="numpy", batch_size=256
    )
    return synth_pages(CRAWL_PAGES, override_num_blocks=16).union(mirrors)


def _probe_dropped(root: str) -> bool:
    """A near-dup (one appended word) of crawl-only content must screen
    out — proves the crawl window's fingerprints are all in the index."""
    import pyarrow as pa

    import ray.data
    from pie_ray.functions.dedup_index import lsh_index_screen
    from pie_ray.sources.synth import gen_page
    from pie_ray.stages.extract import html_to_text

    probe_texts = []
    i = BASE_PAGES + 500
    while len(probe_texts) < 3:
        rec, _ = gen_page(i)
        if rec["lang"] == "en":  # non-en pages are never indexed
            probe_texts.append(html_to_text(rec["html"]) + " tailword")
        i += 1
    kv = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([f"probe{j}" for j in range(len(probe_texts))]),
                "text": pa.array(probe_texts),
            }
        )
    )
    _, rep = lsh_index_screen(os.path.join(root, "lshix"), kv)
    return rep["n_kept"] == 0


def _state(root: str) -> dict:
    import ray.data
    from pie_ray.functions.dedup_index import _read_meta as ix_meta
    from pie_ray.pipelines.incremental import _ledger_rows

    import hashlib

    triples = {
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in ray.data.read_parquet(os.path.join(root, "triples")).take_all()
    }
    digest = hashlib.blake2b(
        "\x1e".join("\x1f".join(t) for t in sorted(triples)).encode(),
        digest_size=8,
    ).hexdigest()
    return {
        "n_triples": len(triples),
        "triples_digest": digest,
        "n_urls": _ledger_rows(root),
        "ix_docs": ix_meta(os.path.join(root, "lshix"))["n_docs"],
    }


def phase_build() -> None:
    _session()
    from pie_ray.pipelines.incremental import incremental_build
    from pie_ray.sources.synth import synth_pages

    incremental_build(
        synth_pages(BASE_PAGES, override_num_blocks=16), BASE, near_dup=True
    )


def phase_update(root: str) -> None:
    _session()
    from pie_ray.pipelines.incremental import incremental_update

    rep = incremental_update(root, _crawl())
    print(json.dumps({k: rep[k] for k in sorted(rep) if isinstance(rep[k], (int, bool))}))


def phase_check(root: str) -> None:
    _session()
    st = _state(root)
    st["probe_neardup_dropped"] = _probe_dropped(root)
    print("CHECK " + json.dumps(st), flush=True)


def _run_child(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, __file__, *args],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def _check(root: str) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--phase-check", root],
        capture_output=True, text=True,
    ).stdout
    for line in out.splitlines():
        if line.startswith("CHECK "):
            return json.loads(line[6:])
    raise RuntimeError(f"no CHECK line in: {out!r}")


def orchestrate() -> None:
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    os.makedirs(OUT_ROOT)
    subprocess.run([sys.executable, __file__, "--phase-build"], check=True)

    # golden: uninterrupted update on a pristine copy
    golden_root = os.path.join(OUT_ROOT, "golden")
    shutil.copytree(BASE, golden_root)
    subprocess.run(
        [sys.executable, __file__, "--phase-update", golden_root], check=True
    )
    golden = _check(golden_root)
    print("golden state:", json.dumps(golden), flush=True)
    assert golden["probe_neardup_dropped"]

    results = []
    trials = [("window", None)] + [(f"ramp{int(s)}", s) for s in RAMP_OFFSETS_S]
    for name, offset in trials:
        root = os.path.join(OUT_ROOT, f"trial_{name}")
        shutil.copytree(BASE, root)
        child = _run_child(["--phase-update", root])
        ledger_glob = os.path.join(root, "urls", "delta_000001", "*.parquet")
        ix_meta_p = os.path.join(root, "lshix", "meta.json")
        t0 = time.time()
        hit_window = False
        if offset is None:
            # busy-poll: kill the INSTANT the slot-1 ledger lands while the
            # index still holds only the build delta
            while child.poll() is None and time.time() - t0 < 120:
                if glob.glob(ledger_glob):
                    n = json.load(open(ix_meta_p))["n_deltas"]
                    child.kill()
                    hit_window = n == 1
                    break
                time.sleep(0.005)
        else:
            time.sleep(offset)
        if child.poll() is None:
            child.kill()
        child.wait()
        killed_mid_run = child.returncode != 0
        # replay the same crawl to completion, then compare against golden
        subprocess.run(
            [sys.executable, __file__, "--phase-update", root], check=True
        )
        st = _check(root)
        ok = st == golden
        results.append(
            {
                "trial": name,
                "killed_mid_run": killed_mid_run,
                "hit_ledger_to_index_window": hit_window,
                "state_equals_golden": ok,
                **st,
            }
        )
        print(json.dumps(results[-1]), flush=True)
        assert ok, f"trial {name}: {st} != {golden}"
    print(
        json.dumps(
            {
                "trials": len(results),
                "window_hits": sum(r["hit_ledger_to_index_window"] for r in results),
                "kills_mid_run": sum(r["killed_mid_run"] for r in results),
                "all_states_equal_golden": all(r["state_equals_golden"] for r in results),
            }
        )
    )


if __name__ == "__main__":
    if "--phase-build" in sys.argv:
        phase_build()
    elif "--phase-update" in sys.argv:
        phase_update(sys.argv[sys.argv.index("--phase-update") + 1])
    elif "--phase-check" in sys.argv:
        phase_check(sys.argv[sys.argv.index("--phase-check") + 1])
    else:
        orchestrate()
