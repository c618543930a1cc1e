"""Incremental ingestion: a Bloom-gated delta build must equal a fresh
build over the union of all inputs — triples AND graph — while never
re-running NER on already-seen pages; an all-seen recrawl is a no-op."""

import glob
import os

import pytest


def _triple_rows(path):
    import ray.data

    rows = ray.data.read_parquet(path).take_all()
    return {
        (r["subj"], r["pred"], r["obj"], r["url"], r["warc_ts"]) for r in rows
    }


def _graph_rows(path):
    import ray.data

    out = set()
    for r in ray.data.read_parquet(path).take_all():
        adj = tuple(
            sorted(
                (e["dst"], e["pred"], e["weight"], e["first_ts"], e["last_ts"])
                for e in r["adj"]
            )
        )
        out.add((r["src"], adj, r["degree"], r["part"]))
    return out


N_OLD, N_ALL = 160, 240  # update recrawls all 240: 160 seen + 80 new


@pytest.fixture(scope="module")
def fresh_and_inc(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import incremental_build, incremental_update
    from pie_ray.pipelines.kg import run_pipeline
    from pie_ray.sources.synth import synth_pages

    fresh_dir = str(tmp_path_factory.mktemp("kg_fresh"))
    inc_dir = str(tmp_path_factory.mktemp("kg_inc"))
    run_pipeline(synth_pages(N_ALL), fresh_dir)
    built = incremental_build(synth_pages(N_OLD), inc_dir)
    upd = incremental_update(inc_dir, synth_pages(N_ALL))
    return fresh_dir, inc_dir, built, upd


def test_incremental_equals_fresh(fresh_and_inc):
    fresh_dir, inc_dir, built, upd = fresh_and_inc
    assert built["n_new_pages"] == N_OLD
    assert upd["rebuilt"] and upd["n_new_pages"] == N_ALL - N_OLD
    assert _triple_rows(f"{fresh_dir}/triples") == _triple_rows(f"{inc_dir}/triples")
    assert _graph_rows(f"{fresh_dir}/graph") == _graph_rows(f"{inc_dir}/graph")


def test_incremental_noop_on_all_seen(fresh_and_inc):
    from pie_ray.pipelines.incremental import incremental_update
    from pie_ray.sources.synth import synth_pages

    _, inc_dir, _, _ = fresh_and_inc
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{inc_dir}/graph/**/*.parquet", recursive=True)
    }
    res = incremental_update(inc_dir, synth_pages(N_ALL))
    assert res == {"n_new_pages": 0, "rebuilt": False}
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{inc_dir}/graph/**/*.parquet", recursive=True)
    }
    assert before and after == before  # derived caches untouched


def test_incremental_crash_between_increment_and_rebuild(
    ray_session, tmp_path_factory
):
    """Simulate a run killed AFTER its increment landed (raw + urls durable)
    but BEFORE the rebuild: the next update — even an all-seen recrawl —
    must detect the stale caches via the delta fingerprint and rebuild, so
    the crashed increment's triples are never silently lost."""
    from pie_ray.pipelines import incremental as inc
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_crash"))
    inc.incremental_build(synth_pages(120), root)

    # crash replay: the increment of pages 120..180 is durable, rebuild+meta
    # never happened (this is exactly the state a SIGKILL leaves)
    meta = inc._read_meta(root)
    new_pages = inc._truly_new(synth_pages(180), root, meta, fpp=1e-3)
    assert inc._write_increment(root, meta["n_updates"], new_pages, KgConfig()) == 60
    stale = _triple_rows(f"{root}/triples")

    # all-seen recrawl of the ORIGINAL corpus: 0 new pages, but the caches
    # are stale -> must rebuild and incorporate the crashed increment
    res = inc.incremental_update(root, synth_pages(120))
    assert res["n_new_pages"] == 0 and res["rebuilt"]
    rebuilt = _triple_rows(f"{root}/triples")
    assert rebuilt != stale  # the crashed increment changed the output
    # recovery == a fresh build over ALL 180 pages (canonicalization may
    # merge old entities under the larger key universe, so equality with
    # the fresh union — not supersetness of the stale set — is the invariant)
    import tempfile

    from pie_ray.pipelines.kg import run_pipeline

    with tempfile.TemporaryDirectory() as fd:
        run_pipeline(synth_pages(180), fd)
        assert rebuilt == _triple_rows(f"{fd}/triples")
    # ledger-derived bloom capacity covers the crashed increment's urls
    assert inc._read_meta(root)["n_urls"] == 180

    # and now it is a true no-op
    res2 = inc.incremental_update(root, synth_pages(180))
    assert res2 == {"n_new_pages": 0, "rebuilt": False}


def test_incremental_antijoin_path(fresh_and_inc, monkeypatch):
    """Force the at-scale branch (candidate count above the driver cutover:
    key-only left_outer anti-join against the ledger) and require the same
    no-op answer the driver path gives for an all-seen recrawl."""
    import pie_ray.pipelines.incremental as inc
    from pie_ray.sources.synth import synth_pages

    _, inc_dir, _, _ = fresh_and_inc
    monkeypatch.setattr(inc, "INC_DRIVER_CANDIDATES", 0)
    res = inc.incremental_update(inc_dir, synth_pages(N_ALL))
    assert res == {"n_new_pages": 0, "rebuilt": False}


def test_incremental_fp_heavy_filter_still_exact(fresh_and_inc):
    """A deliberately awful filter (fpp=0.5 -> most new pages are Bloom
    hits) exercises the exact-recheck path; the result must be identical."""
    from pie_ray.pipelines.incremental import incremental_update
    from pie_ray.sources.synth import synth_pages

    fresh_dir, inc_dir, _, _ = fresh_and_inc
    res = incremental_update(inc_dir, synth_pages(N_ALL + 40), fpp=0.5)
    assert res["n_new_pages"] == 40
    import tempfile

    from pie_ray.pipelines.kg import run_pipeline

    with tempfile.TemporaryDirectory() as fd:
        run_pipeline(synth_pages(N_ALL + 40), fd)
        assert _triple_rows(f"{fd}/triples") == _triple_rows(f"{inc_dir}/triples")
