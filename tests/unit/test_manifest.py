"""A18 manifest semantics: atomicity surrogate, fingerprint gating,
partition bookkeeping (no Ray needed)."""

from __future__ import annotations

from pie_ray.state import manifest as mf


def test_stage_record_roundtrip(tmp_path):
    out = str(tmp_path)
    assert not mf.stage_done(out, "canon", "fp1")
    mf.stage_record(out, "canon", "fp1", 100, 50, 1.5)
    assert mf.stage_done(out, "canon", "fp1")
    # a different input fingerprint invalidates the checkpoint
    assert not mf.stage_done(out, "canon", "fp2")


def test_part_records(tmp_path):
    out = str(tmp_path)
    for p in (0, 2):
        mf.part_record(out, "ner", p, "fpA", 10, 5, 0.1)
    mf.part_record(out, "ner", 1, "fpOLD", 10, 5, 0.1)
    assert mf.done_parts(out, "ner", "fpA") == {0, 2}
    # re-record part 1 with the current fingerprint
    mf.part_record(out, "ner", 1, "fpA", 10, 7, 0.2)
    assert mf.done_parts(out, "ner", "fpA") == {0, 1, 2}


def test_metrics_table(tmp_path):
    out = str(tmp_path)
    mf.stage_record(out, "graph", "f", 5, 5, 0.3)
    mf.part_record(out, "ner", 3, "f", 9, 4, 0.2)
    t = mf.metrics_table(out)
    rows = {(r["stage"], r["part"]) for r in t.to_pylist()}
    assert ("graph", -1) in rows and ("ner", 3) in rows
