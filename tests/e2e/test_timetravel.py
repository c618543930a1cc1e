"""Time travel over the incremental store: an as-of read over the delta
prefix must equal the build that existed after that ingest; the change feed
must equal the brute set-diff of the two as-of triple sets; compaction
honestly destroys history (the documented LSM trade)."""

import pytest


def _tset(ds):
    return {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}


N0, N1 = 120, 200  # increment 0 = pages [0,120), update recrawls [0,200)


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import incremental_build, incremental_update
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_tt"))
    incremental_build(synth_pages(N0), root)
    import ray.data

    live0 = _tset(ray.data.read_parquet(f"{root}/triples"))
    incremental_update(root, synth_pages(N1))
    live1 = _tset(ray.data.read_parquet(f"{root}/triples"))
    return root, live0, live1


def test_asof_equals_historic_builds(store):
    from pie_ray.pipelines.incremental import list_increments, triples_asof

    root, live0, live1 = store
    assert list_increments(root) == [0, 1]
    assert _tset(triples_asof(root, 0)) == live0
    assert _tset(triples_asof(root, 1)) == live1


def test_change_feed_matches_brute_diff(store):
    from pie_ray.pipelines.incremental import kg_changes

    root, live0, live1 = store
    got_added, got_removed = set(), set()
    for r in kg_changes(root, 0, 1).take_all():
        key = (r["subj"], r["pred"], r["obj"])
        (got_added if r["change"] == "added" else got_removed).add(key)
    assert got_added == live1 - live0
    assert got_removed == live0 - live1
    assert got_added  # the update added pages, so the feed must be non-empty


def test_asof_beyond_history_raises_and_compaction_drops_it(store):
    from pie_ray.pipelines.incremental import (
        compact_deltas,
        list_increments,
        triples_asof,
    )

    root, live0, live1 = store
    with pytest.raises(ValueError):
        triples_asof(root, -1)
    compact_deltas(root)
    assert list_increments(root) == [0]  # history collapsed
    # the collapsed delta still reproduces the LIVE set
    assert _tset(triples_asof(root, 0)) == live1
