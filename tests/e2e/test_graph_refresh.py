"""Delta-aware graph maintenance: an --ingest update rebuilds ONLY the
graph partitions whose per-part triple fingerprints changed — untouched
part dirs keep their files byte-for-byte; the fingerprint is sensitive to
provenance (warc_ts), not just the (s,p,o) key set."""

import glob
import os
from datetime import datetime

import pyarrow as pa
import pytest


def _part_files_state(gdir: str) -> dict[str, tuple]:
    out = {}
    for f in glob.glob(os.path.join(gdir, "part=*", "*.parquet")):
        st = os.stat(f)
        out[f] = (st.st_mtime_ns, st.st_size)
    return out


def test_update_rebuilds_only_affected_parts(ray_session, tmp_path):
    from pie_ray.pipelines.incremental import incremental_build, incremental_update
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path / "store")
    cfg = KgConfig(num_graph_parts=64)
    incremental_build(synth_pages(200), root, cfg)
    before = _part_files_state(f"{root}/graph")
    assert before  # the build produced partition dirs

    # small delta: 40 new pages on top of a 200-page recrawl
    rep = incremental_update(root, synth_pages(240), cfg)
    assert rep["rebuilt"]
    assert rep["graph_parts_total"] == 64
    assert 0 < rep["graph_parts_rebuilt"] < 64, rep
    after = _part_files_state(f"{root}/graph")

    untouched = [f for f in before if f in after and after[f] == before[f]]
    assert untouched, "at least one partition must have been left untouched"
    # and the refreshed graph equals a graph built fresh from the store's
    # own triples (the structural equality _rebuild promises)
    import ray.data

    from pie_ray.pipelines.kg import graph_stage

    tri = ray.data.read_parquet(f"{root}/triples").materialize()
    want = {
        (r["src"], r["degree"], r["part"])
        for r in graph_stage(tri, cfg).take_all()
    }
    got = {
        (r["src"], r["degree"], int(r["part"]))  # hive part reads back as str
        for r in ray.data.read_parquet(f"{root}/graph").take_all()
    }
    assert got == want


def test_all_seen_update_touches_no_parts(ray_session, tmp_path):
    from pie_ray.pipelines.incremental import incremental_build, incremental_update
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path / "store")
    cfg = KgConfig(num_graph_parts=16)
    incremental_build(synth_pages(120), root, cfg)
    before = _part_files_state(f"{root}/graph")
    rep = incremental_update(root, synth_pages(120), cfg)  # full recrawl
    assert not rep["rebuilt"]  # all-seen short circuit
    assert _part_files_state(f"{root}/graph") == before


def test_fingerprint_is_provenance_sensitive(ray_session):
    import ray.data

    from pie_ray.pipelines.incremental import part_fingerprints

    def tbl(ts: str) -> pa.Table:
        return pa.table(
            {
                "subj": pa.array(["per:a"], pa.string()),
                "pred": pa.array(["has_email"], pa.string()),
                "obj": pa.array(["a@x.com"], pa.string()),
                "url": pa.array(["https://u/1"], pa.string()),
                "warc_ts": pa.array([datetime.fromisoformat(ts)], pa.timestamp("us")),
                "score": pa.array([1.0], pa.float32()),
            }
        )

    fp1 = part_fingerprints(ray.data.from_arrow(tbl("2024-01-01T00:00:00")), 16)
    fp2 = part_fingerprints(ray.data.from_arrow(tbl("2023-06-01T00:00:00")), 16)
    fp3 = part_fingerprints(ray.data.from_arrow(tbl("2024-01-01T00:00:00")), 16)
    assert fp1 == fp3
    assert fp1 != fp2  # same (s,p,o), earlier min-ts -> graph first_ts changes


def test_crash_mid_refresh_converges_on_rerun(ray_session, tmp_path):
    """Kill the refresh after it has swapped only a subset of the affected
    partitions (sidecar not yet stamped, ingest meta not updated): the
    re-run must recompute the SAME affected set from the stored sidecar
    and leave the graph equal to a fresh build."""
    import ray.data

    import pie_ray.pipelines.incremental as inc
    from pie_ray.pipelines.incremental import incremental_build, incremental_update
    from pie_ray.pipelines.kg import KgConfig, graph_stage
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path / "store")
    cfg = KgConfig(num_graph_parts=32)
    incremental_build(synth_pages(150), root, cfg)

    real_refresh = inc._refresh_graph_parts

    def dying_refresh(root_, triples, affected, cfg_):
        subset = set(sorted(affected)[: max(1, len(affected) // 2)])
        real_refresh(root_, triples, subset, cfg_)  # partial swap...
        raise RuntimeError("simulated crash mid-refresh")

    inc._refresh_graph_parts = dying_refresh
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            incremental_update(root, synth_pages(200), cfg)
    finally:
        inc._refresh_graph_parts = real_refresh

    # re-run the SAME update: Bloom sees all urls, but the delta
    # fingerprint no longer matches the stamped built_fp, so it rebuilds
    rep = incremental_update(root, synth_pages(200), cfg)
    assert rep["rebuilt"]
    assert rep["graph_parts_rebuilt"] > 0

    tri = ray.data.read_parquet(f"{root}/triples").materialize()
    want = {(r["src"], r["degree"], r["part"]) for r in graph_stage(tri, cfg).take_all()}
    got = {
        (r["src"], r["degree"], int(r["part"]))
        for r in ray.data.read_parquet(f"{root}/graph").take_all()
    }
    assert got == want
