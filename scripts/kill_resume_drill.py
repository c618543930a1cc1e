#!/usr/bin/env python
"""Checkpoint-resume kill drill (A19 evidence, SURVEY.md §5 layer 3).

Phase ``run``: start a resumable KG build; the parent kills this process
with SIGKILL partway through the NER leg.
Phase ``resume``: re-run the same job — only unfinished partitions
recompute — then compare the final triple set against a clean from-scratch
run in the same process.

Usage: python scripts/kill_resume_drill.py          # orchestrates both
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = 100_000
NUM_PARTS = 16
OUT = "/tmp/kill_drill"
KILL_AFTER_S = 18.0


def _session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from pie_ray.util import tune_data_context

    tune_data_context()


def _factory():
    from pie_ray.sources.synth import synth_pages

    return synth_pages(N_PAGES, override_num_blocks=64)


def phase_run() -> None:
    _session()
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    run_resumable(_factory, OUT, KgConfig(ner_concurrency=(2, 14)), num_parts=NUM_PARTS,
                  corpus_id=f"drill{N_PAGES}", parts_per_round=4)


def phase_resume() -> None:
    _session()
    import ray.data

    from pie_ray.golden import precision_recall
    from pie_ray.pipelines.kg import KgConfig, build_triples
    from pie_ray.pipelines.resume import run_resumable
    from pie_ray.state import manifest as mf

    done_before = sorted(mf.done_parts(OUT, "ner", _ner_fp()))
    t0 = time.perf_counter()
    rep = run_resumable(_factory, OUT, KgConfig(ner_concurrency=(2, 14)), num_parts=NUM_PARTS,
                        corpus_id=f"drill{N_PAGES}", parts_per_round=4)
    resumed_wall = time.perf_counter() - t0
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in ray.data.read_parquet(rep["triples_path"]).take_all()
    }
    clean = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_triples(_factory(), KgConfig(ner_concurrency=(2, 14))).take_all()
    }
    print(json.dumps({
        "parts_done_at_kill": done_before,
        "parts_recomputed_on_resume": rep["stages"]["ner"]["ran_parts"],
        "resume_wall_s": round(resumed_wall, 1),
        "triple_set_identical_to_clean_run": got == clean,
        "n_triples": len(got),
    }))
    assert got == clean


def _ner_fp() -> str:
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import _fingerprint

    cfg = KgConfig(ner_concurrency=(2, 14))
    return _fingerprint(f"drill{N_PAGES}", "ner", NUM_PARTS, cfg.langs, cfg.ner_batch_size)


def orchestrate() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    env = dict(os.environ)
    proc = subprocess.Popen([sys.executable, __file__, "--phase-run"], env=env)
    time.sleep(KILL_AFTER_S)
    proc.kill()  # SIGKILL: no cleanup, no manifest flush for in-flight parts
    proc.wait()
    print(f"killed run phase after {KILL_AFTER_S}s (pid {proc.pid})", flush=True)
    sub = subprocess.run([sys.executable, __file__, "--phase-resume"], env=env)
    sys.exit(sub.returncode)


if __name__ == "__main__":
    if "--phase-run" in sys.argv:
        phase_run()
    elif "--phase-resume" in sys.argv:
        phase_resume()
    else:
        orchestrate()
