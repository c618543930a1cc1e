"""A18 — per-partition lineage manifests (SURVEY.md §2 A18/A19).

Layout under an output root:

    {out}/_manifests/{stage}.json         # stage-level record
    {out}/_manifests/{stage}.parts.json   # per-partition records (partitioned stages)
    {out}/{stage}/part={k}/*.parquet      # partitioned stage output

A manifest row carries the stage's input fingerprint — a stable hash of
(config, upstream fingerprint, input identity) — so resume re-runs a
partition iff it is missing, failed, or was produced from different inputs.
Writes are atomic (tmp file + os.replace) so a killed run never leaves a
corrupt manifest; a partition directory with no manifest entry is treated
as dead and overwritten (idempotent re-run, SaveMode-style OVERWRITE).
"""

from __future__ import annotations

import json
import os
import time


def _dir(out_root: str) -> str:
    d = os.path.join(out_root, "_manifests")
    os.makedirs(d, exist_ok=True)
    return d


def _atomic_write(path: str, obj) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


# ---- stage-level ----------------------------------------------------------


def stage_record(
    out_root: str,
    stage: str,
    fingerprint: str,
    rows_in: int,
    rows_out: int,
    wall_s: float,
    output_files: list[str] | None = None,
) -> None:
    _atomic_write(
        os.path.join(_dir(out_root), f"{stage}.json"),
        {
            "stage": stage,
            "input_fingerprint": fingerprint,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_s": round(wall_s, 3),
            "status": "done",
            "ts": time.time(),
            "output_files": output_files or [],
        },
    )


def stage_done(out_root: str, stage: str, fingerprint: str) -> bool:
    path = os.path.join(_dir(out_root), f"{stage}.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        rec = json.load(f)
    return rec.get("status") == "done" and rec.get("input_fingerprint") == fingerprint


# ---- partition-level ------------------------------------------------------


def _parts_path(out_root: str, stage: str) -> str:
    return os.path.join(_dir(out_root), f"{stage}.parts.json")


def load_part_records(out_root: str, stage: str) -> dict[str, dict]:
    path = _parts_path(out_root, stage)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def done_parts(out_root: str, stage: str, fingerprint: str) -> set[int]:
    return {
        int(k)
        for k, rec in load_part_records(out_root, stage).items()
        if rec.get("status") == "done" and rec.get("input_fingerprint") == fingerprint
    }


def part_record(
    out_root: str,
    stage: str,
    part: int,
    fingerprint: str,
    rows_in: int,
    rows_out: int,
    wall_s: float,
) -> None:
    recs = load_part_records(out_root, stage)
    recs[str(part)] = {
        "stage": stage,
        "part": part,
        "input_fingerprint": fingerprint,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "wall_s": round(wall_s, 3),
        "status": "done",
        "ts": time.time(),
    }
    _atomic_write(_parts_path(out_root, stage), recs)


def metrics_table(out_root: str):
    """All manifest rows as one pyarrow Table (the T6 metrics surface)."""
    import pyarrow as pa

    rows = []
    d = _dir(out_root)
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(d, fn)) as f:
            obj = json.load(f)
        if fn.endswith(".parts.json"):
            rows.extend(obj.values())
        else:
            rows.append({**obj, "part": -1})
    cols = ("stage", "part", "input_fingerprint", "rows_in", "rows_out", "wall_s", "status")
    return pa.table(
        {c: pa.array([r.get(c, -1 if c == "part" else None) for r in rows]) for c in cols}
    )
