"""Delta compaction: many per-increment dirs -> one, byte-equal derived
outputs, no forced rebuild when caches were current, correct rebuild when
they were not, and a mid-compaction kill leaves a recoverable root."""

import glob
import os
import shutil

import pytest


def _triples(path):
    import ray.data

    rows = ray.data.read_parquet(path).take_all()
    return {(r["subj"], r["pred"], r["obj"], r["url"], r["warc_ts"]) for r in rows}


N1, N2, N3 = 100, 150, 200  # three increments over a growing crawl


@pytest.fixture(scope="module")
def compacted_root(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import (
        compact_deltas,
        incremental_build,
        incremental_update,
    )
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_compact"))
    incremental_build(synth_pages(N1), root)
    incremental_update(root, synth_pages(N2))
    incremental_update(root, synth_pages(N3))
    before = _triples(f"{root}/triples")
    stats = compact_deltas(root)
    return root, before, stats


def test_compaction_merges_and_preserves(compacted_root):
    root, before, stats = compacted_root
    assert stats["raw_deltas_before"] == 3 and stats["urls_deltas_before"] == 3
    assert stats["caches_current"] is True
    assert len(glob.glob(f"{root}/raw/delta_*")) == 1
    assert len(glob.glob(f"{root}/urls/delta_*")) == 1
    assert stats["raw_files_after"] <= stats["raw_files_before"]
    # derived caches untouched by compaction
    assert _triples(f"{root}/triples") == before


def test_update_after_compaction_is_consistent(compacted_root, tmp_path_factory):
    from pie_ray.pipelines.incremental import incremental_update
    from pie_ray.pipelines.kg import run_pipeline
    from pie_ray.sources.synth import synth_pages

    root, _, _ = compacted_root
    # all-seen recrawl stays a no-op (fingerprint was re-stamped)
    res = incremental_update(root, synth_pages(N3))
    assert res == {"n_new_pages": 0, "rebuilt": False}
    # a real delta after compaction equals a fresh build over the union
    res = incremental_update(root, synth_pages(N3 + 40))
    assert res["rebuilt"] and res["n_new_pages"] == 40
    fresh = str(tmp_path_factory.mktemp("kg_fresh_after"))
    run_pipeline(synth_pages(N3 + 40), fresh)
    assert _triples(f"{root}/triples") == _triples(f"{fresh}/triples")


def test_compaction_with_stale_caches_keeps_mismatch(ray_session, tmp_path_factory):
    """Compacting a root whose caches do NOT cover the durable raw set must
    not stamp a fresh fingerprint — the next update still rebuilds."""
    import json

    from pie_ray.pipelines.incremental import (
        META_NAME,
        _write_increment,
        compact_deltas,
        incremental_build,
        incremental_update,
    )
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_stale"))
    incremental_build(synth_pages(N1), root)
    # simulate a crash: an increment landed but no rebuild ran
    _write_increment(root, 1, synth_pages(N2), KgConfig())
    stats = compact_deltas(root)
    assert stats["caches_current"] is False
    with open(os.path.join(root, META_NAME)) as f:
        meta = json.load(f)
    # all-seen recrawl must still trigger the catch-up rebuild
    res = incremental_update(root, synth_pages(N2))
    assert res["rebuilt"] and res["n_new_pages"] == 0
    fresh_triples = _triples(f"{root}/triples")
    assert len(fresh_triples) > 0


def test_killed_compaction_leaves_recoverable_root(ray_session, tmp_path_factory):
    """Garbage .compacting dirs from a killed run are cleared on retry and
    never observed by reads (delta_* glob does not match them)."""
    from pie_ray.pipelines.incremental import (
        compact_deltas,
        incremental_build,
        incremental_update,
    )
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_killed"))
    incremental_build(synth_pages(N1), root)
    incremental_update(root, synth_pages(N2))
    before = _triples(f"{root}/triples")
    # fake a kill mid-write: stale partial output in .compacting
    os.makedirs(os.path.join(root, "raw.compacting", "delta_000000"))
    with open(os.path.join(root, "raw.compacting", "delta_000000", "junk"), "w") as f:
        f.write("partial")
    stats = compact_deltas(root)
    assert stats["caches_current"] is True
    assert not os.path.exists(os.path.join(root, "raw.compacting"))
    assert _triples(f"{root}/triples") == before
