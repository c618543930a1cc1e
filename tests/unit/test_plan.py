"""Declarative stage planner (pie_ray/pipelines/plan.py) — SURVEY §2's
pipeline-level user-extension surface: Stage specs compose to one
map_batches each; checkpoints are durable parquet + manifest rows with
resume-on-same-fingerprint semantics.

User-supplied stage callables are defined INSIDE the tests: a class at
test-module scope is cloudpickled by reference to ``test_plan``, which Ray
workers cannot import — locals pickle by value (exactly how a user's ad-hoc
UDF ships in an interactive session; packaged UDFs ride the job's
runtime_env instead)."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pie_ray.pipelines.plan import Stage, build_chain, run_plan


def _ids(ds) -> list[int]:
    return sorted(r["id"] for r in ds.take_all())


def _mk_double():
    def double(t: pa.Table) -> pa.Table:
        return t.set_column(0, "id", pc.multiply(t.column("id"), 2))

    return double


def _mk_addbase():
    class AddBase:
        """Actor-pool stage: per-actor state in __init__ (the NerTagger
        pattern), applied per batch."""

        def __init__(self, base: int = 100):
            self.base = base

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.set_column(0, "id", pc.add(t.column("id"), self.base))

    return AddBase


def test_build_chain_task_and_actor(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"id": pa.array(range(10), pa.int64())}))
    out = build_chain(
        ds,
        [
            Stage("double", _mk_double()),
            Stage(
                "addbase",
                _mk_addbase(),
                kind="actor",
                concurrency=2,
                fn_constructor_kwargs={"base": 1000},
            ),
        ],
    )
    assert _ids(out) == [1000 + 2 * i for i in range(10)]


def test_build_chain_rejects_duplicates_and_bad_kind(ray_session):
    import ray.data

    double = _mk_double()
    ds = ray.data.from_arrow(pa.table({"id": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="duplicate"):
        build_chain(ds, [Stage("a", double), Stage("a", double)])
    with pytest.raises(ValueError, match="unknown kind"):
        build_chain(ds, [Stage("a", double, kind="wat")])
    with pytest.raises(TypeError, match="needs a class"):
        build_chain(ds, [Stage("a", double, kind="actor")])


def test_run_plan_checkpoint_and_resume(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "plan")
    double = _mk_double()

    def plus1(t: pa.Table) -> pa.Table:
        return t.set_column(0, "id", pc.add(t.column("id"), 1))

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(range(8), pa.int64())})
    ).repartition(2)
    stages = [
        Stage("double", double, checkpoint=True),
        Stage("plus1", plus1),
    ]
    r1 = run_plan(ds, stages, out_dir=out, fingerprint="fp1")
    assert _ids(r1["dataset"]) == [2 * i + 1 for i in range(8)]
    assert r1["skipped"] == [] and "double" in r1["checkpoints"]

    # same fingerprint: the checkpoint is READ, upstream is skipped — feed a
    # poisoned input to prove the result comes from the checkpoint
    poisoned = ray.data.from_arrow(pa.table({"id": pa.array([999], pa.int64())}))
    r2 = run_plan(poisoned, stages, out_dir=out, fingerprint="fp1")
    assert r2["skipped"] == ["double"]
    assert _ids(r2["dataset"]) == [2 * i + 1 for i in range(8)]

    # changed fingerprint: checkpoint invalid, the poisoned input recomputes
    # and the stale checkpoint dir is REPLACED (not appended into)
    r3 = run_plan(poisoned, stages, out_dir=out, fingerprint="fp2")
    assert r3["skipped"] == []
    assert _ids(r3["dataset"]) == [999 * 2 + 1]
    shutil.rmtree(out, ignore_errors=True)


def test_run_plan_requires_out_dir_for_checkpoints(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"id": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="out_dir"):
        run_plan(ds, [Stage("a", _mk_double(), checkpoint=True)])
