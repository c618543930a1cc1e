"""Declarative stage planner — the pipeline-level user-extension surface
from SURVEY.md §2 ("stages are a declarative list Stage(name, fn_or_actor_cls,
kind=task|actor, batch_size, resources) composed by a small planner into
Dataset chains"). This is the plugin/UDF hook: a user inserts a custom
transform between any two engine stages without touching pipeline code.

Design notes (Ray-Data-first):
- a ``Stage`` compiles to exactly ONE ``map_batches`` call — ``kind="task"``
  becomes a stateless task map (fusable with its neighbours), ``kind="actor"``
  an actor-pool map with per-actor ``__init__`` state (weights, indexes);
- ``checkpoint=True`` materializes to Parquet at the stage boundary and
  records a manifest row — the same durable-boundary pattern the KG pipeline
  uses for resume (pie_ray/pipelines/resume.py): a re-run with the same
  fingerprint skips every checkpointed stage whose parquet already landed;
- the planner NEVER inserts an exchange — shuffles stay explicit inside
  stage functions (the repo-wide rule that exchanges are visible and
  barriered, docs/SCALE.md).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass
class Stage:
    """One pipeline step. ``fn`` is a batch callable (pa.Table -> pa.Table)
    for ``kind="task"``, or a callable CLASS for ``kind="actor"`` (state
    built once per actor in ``__init__``, applied per batch in
    ``__call__`` — the NerTagger pattern)."""

    name: str
    fn: Callable[..., Any] | type
    kind: str = "task"  # "task" | "actor"
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None
    batch_format: str = "pyarrow"
    fn_kwargs: dict | None = None
    fn_constructor_kwargs: dict | None = None
    checkpoint: bool = False
    _extra: dict = field(default_factory=dict)

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        kw: dict[str, Any] = {"batch_format": self.batch_format, **self._extra}
        if self.batch_size is not None:
            kw["batch_size"] = self.batch_size
        if self.num_cpus is not None:
            kw["num_cpus"] = self.num_cpus
        if self.fn_kwargs:
            kw["fn_kwargs"] = self.fn_kwargs
        if self.kind == "actor":
            if not isinstance(self.fn, type):
                raise TypeError(f"stage {self.name!r}: kind='actor' needs a class")
            kw["concurrency"] = self.concurrency or 2
            if self.fn_constructor_kwargs:
                kw["fn_constructor_kwargs"] = self.fn_constructor_kwargs
        elif self.kind == "task":
            if self.concurrency is not None:
                kw["concurrency"] = self.concurrency
        else:
            raise ValueError(f"stage {self.name!r}: unknown kind {self.kind!r}")
        return ds.map_batches(self.fn, **kw)


def build_chain(ds: "ray.data.Dataset", stages: list[Stage]) -> "ray.data.Dataset":
    """Compose a lazy Dataset chain — no materialization, the streaming
    executor fuses adjacent task stages and pipelines through actor pools."""
    seen: set[str] = set()
    for st in stages:
        if st.name in seen:
            raise ValueError(f"duplicate stage name {st.name!r}")
        seen.add(st.name)
        ds = st.apply(ds)
    return ds


def run_plan(
    ds: "ray.data.Dataset",
    stages: list[Stage],
    out_dir: str | None = None,
    fingerprint: str = "plan-v1",
) -> dict:
    """Execute a plan with durable checkpoints: stages run as one fused
    lazy chain until a ``checkpoint=True`` boundary, which writes Parquet
    under ``out_dir/<stage>`` and records a manifest row. On re-run with
    the same fingerprint, a completed checkpoint is READ instead of
    recomputed — everything upstream of it is skipped (resume semantics;
    a changed fingerprint invalidates downstream checkpoints).

    Returns {"dataset": final lazy Dataset, "checkpoints": {name: path},
    "skipped": [names]} — consume ``dataset`` with write_parquet /
    iter_batches / aggregation (never a driver pull of the full data)."""
    from pie_ray.state.manifest import stage_done, stage_record

    if any(s.checkpoint for s in stages) and out_dir is None:
        raise ValueError("checkpointed stages need out_dir")
    checkpoints: dict[str, str] = {}
    skipped: list[str] = []
    pending: list[Stage] = []

    # longest prefix of already-done checkpoints: resume from the LAST one
    resume_idx, resume_path = -1, None
    if out_dir is not None:
        for i, st in enumerate(stages):
            if not st.checkpoint:
                continue
            path = os.path.join(out_dir, st.name)
            if stage_done(out_dir, st.name, fingerprint) and os.path.isdir(path):
                resume_idx, resume_path = i, path
                checkpoints[st.name] = path
            else:
                break

    if resume_path is not None:
        ds = ray.data.read_parquet(resume_path)
        skipped = [s.name for s in stages[: resume_idx + 1]]

    for st in stages[resume_idx + 1 :]:
        pending.append(st)
        if not st.checkpoint:
            continue
        chained = build_chain(ds, pending)
        path = os.path.join(out_dir, st.name)  # type: ignore[arg-type]
        # a stale (fingerprint-invalidated) checkpoint dir must be cleared:
        # write_parquet APPENDS files into an existing directory
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        t0 = time.perf_counter()
        chained.write_parquet(path)
        rows = ray.data.read_parquet(path).count()  # metadata-only count
        stage_record(
            out_dir,  # type: ignore[arg-type]
            st.name,
            fingerprint=fingerprint,
            rows_in=-1,  # streaming chain — input rows not re-counted
            rows_out=rows,
            wall_s=time.perf_counter() - t0,
        )
        checkpoints[st.name] = path
        ds = ray.data.read_parquet(path)
        pending = []

    if pending:
        ds = build_chain(ds, pending)
    return {"dataset": ds, "checkpoints": checkpoints, "skipped": skipped}
