"""A18/A19 — checkpoint-resume: kill-after-partial-NER simulation.

Checks (SURVEY.md §5 layer 3):
- a full resumable run equals the non-resumable flagship triple set;
- deleting one NER partition (output + manifest entry) and re-running
  recomputes ONLY that partition and reproduces the identical final
  triple set (byte-identical values, order-insensitive);
- an untouched re-run skips every stage.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

N_PAGES = 120
NUM_PARTS = 4


def _factory(parts=None):
    from pie_ray.sources.synth import synth_pages, synth_pages_for_parts

    if parts is None:
        return synth_pages(N_PAGES)
    # partition-pruned resume input: only the todo partitions are generated
    return synth_pages_for_parts(N_PAGES, parts, NUM_PARTS)


def _factory_noparts():
    from pie_ray.sources.synth import synth_pages

    return synth_pages(N_PAGES)


def _triple_set(path):
    import ray.data

    rows = ray.data.read_parquet(path).take_all()
    return {(r["subj"], r["pred"], r["obj"]) for r in rows}


@pytest.fixture(scope="module")
def full_run(ray_session, tmp_path_factory):
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out = str(tmp_path_factory.mktemp("kg_full"))
    rep = run_resumable(_factory, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120")
    return out, rep


def test_full_run_matches_flagship(full_run):
    from pie_ray.pipelines.kg import KgConfig, build_triples

    out, rep = full_run
    assert sorted(rep["stages"]["ner"]["ran_parts"]) == list(range(NUM_PARTS))
    direct = build_triples(_factory(), KgConfig())
    direct_set = {(r["subj"], r["pred"], r["obj"]) for r in direct.take_all()}
    assert _triple_set(rep["triples_path"]) == direct_set


def test_noop_rerun_skips_everything(full_run):
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out, _ = full_run
    rep2 = run_resumable(_factory, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120")
    assert rep2["stages"]["ner"]["ran_parts"] == []
    assert rep2["stages"]["canon"] == {"ran": False}
    assert rep2["stages"]["graph"] == {"ran": False}


def test_resume_recomputes_only_failed_partition(full_run):
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out, rep = full_run
    golden = _triple_set(rep["triples_path"])

    # simulate a partition that died mid-write: drop output dir + manifest row
    victim = 2
    shutil.rmtree(os.path.join(out, "raw_triples", f"part={victim}"), ignore_errors=True)
    parts_file = os.path.join(out, "_manifests", "ner.parts.json")
    recs = json.load(open(parts_file))
    del recs[str(victim)]
    json.dump(recs, open(parts_file, "w"))
    # downstream consumed the now-changed upstream -> force its re-run too
    os.remove(os.path.join(out, "_manifests", "canon.json"))
    os.remove(os.path.join(out, "_manifests", "graph.json"))

    rep2 = run_resumable(_factory, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120")
    assert rep2["stages"]["ner"]["ran_parts"] == [victim]
    assert sorted(rep2["stages"]["ner"]["skipped_parts"]) == [0, 1, 3]
    assert rep2["stages"]["canon"] == {"ran": True}
    assert _triple_set(rep2["triples_path"]) == golden


def test_dead_partition_dir_is_overwritten(full_run):
    """A partition dir left by a killed write (no manifest entry) must be
    discarded and rebuilt, not appended to."""
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out, rep = full_run
    golden = _triple_set(rep["triples_path"])

    victim = 1
    pdir = os.path.join(out, "raw_triples", f"part={victim}")
    # corrupt: drop the manifest entry but LEAVE (garbage) output in place
    with open(os.path.join(pdir, "garbage.parquet.tmp"), "w") as f:
        f.write("not parquet")
    parts_file = os.path.join(out, "_manifests", "ner.parts.json")
    recs = json.load(open(parts_file))
    del recs[str(victim)]
    json.dump(recs, open(parts_file, "w"))
    os.remove(os.path.join(out, "_manifests", "canon.json"))
    os.remove(os.path.join(out, "_manifests", "graph.json"))

    rep2 = run_resumable(_factory, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120")
    assert rep2["stages"]["ner"]["ran_parts"] == [victim]
    assert not os.path.exists(os.path.join(pdir, "garbage.parquet.tmp"))
    assert _triple_set(rep2["triples_path"]) == golden


def test_persist_mentions_variant(ray_session, tmp_path):
    """persist_mentions=True writes T2 and yields the same final triples."""
    import ray.data

    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out = str(tmp_path / "kg_m")
    rep = run_resumable(
        _factory, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120m",
        persist_mentions=True,
    )
    mentions = ray.data.read_parquet(os.path.join(out, "mentions"))
    assert mentions.count() > 0
    assert {"url", "ent_type", "surface", "norm", "begin", "end"} <= set(
        mentions.schema().names
    )
    from pie_ray.pipelines.kg import build_triples

    direct = {(r["subj"], r["pred"], r["obj"]) for r in build_triples(_factory()).take_all()}
    assert _triple_set(rep["triples_path"]) == direct


def test_metrics_table(full_run):
    from pie_ray.state.manifest import metrics_table

    out, _ = full_run
    t = metrics_table(out)
    stages = set(t.column("stage").to_pylist())
    assert {"ner", "canon", "graph"} <= stages
    assert t.num_rows >= NUM_PARTS + 2


def test_parts_pruned_source_generates_only_todo_parts(ray_session):
    """synth_pages_for_parts yields exactly the rows whose hash-part is in
    the requested set — the resume round's scan is input-pruned, not a full
    regenerate-then-filter."""
    from pie_ray.sources.synth import page_url, synth_pages_for_parts
    from pie_ray.util import part_of

    want = {i for i in range(N_PAGES) if part_of(page_url(i), NUM_PARTS) == 2}
    ds = synth_pages_for_parts(N_PAGES, [2], NUM_PARTS)
    urls = [r["url"] for r in ds.take_all()]
    got = {int(u.rsplit("doc", 1)[1]) for u in urls}
    assert got == want
    assert 0 < len(got) < N_PAGES


def test_zero_arg_factory_still_supported(ray_session, tmp_path):
    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out = str(tmp_path / "kg_legacy")
    rep = run_resumable(
        _factory_noparts, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120"
    )
    assert sorted(rep["stages"]["ner"]["ran_parts"]) == list(range(NUM_PARTS))


def test_stale_partition_dir_pruned_before_downstream(full_run):
    """A part=k dir with no manifest entry under the current fingerprint
    (e.g. left by an earlier higher-num_parts run) must not leak its
    triples into link/canon/graph."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pie_ray.pipelines.kg import KgConfig
    from pie_ray.pipelines.resume import run_resumable

    out, rep = full_run
    golden = _triple_set(rep["triples_path"])

    stale = os.path.join(out, "raw_triples", "part=9")
    os.makedirs(stale, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "subj": ["per:stale entity"],
                "pred": ["has_email"],
                "obj": ["stale@example.com"],
                "url": ["https://stale.example/doc0"],
                "warc_ts": pa.array([0], pa.timestamp("us")),
                "score": pa.array([1.0], pa.float32()),
            }
        ),
        os.path.join(stale, "junk.parquet"),
    )
    # force downstream re-run so the stale dir would be consumed if present
    os.remove(os.path.join(out, "_manifests", "canon.json"))
    os.remove(os.path.join(out, "_manifests", "graph.json"))

    rep2 = run_resumable(_factory, out, KgConfig(), num_parts=NUM_PARTS, corpus_id="t120")
    assert not os.path.exists(stale)
    assert _triple_set(rep2["triples_path"]) == golden


def test_read_pages_parts_roundtrip(ray_session, tmp_path):
    """read_pages_parts returns exactly the rows of the requested partitions
    for all three layouts: a plain T0 parquet (hash-filter fallback), a
    sidecar-validated hive layout (directory pruning), and a hive layout
    WITHOUT a sidecar (pruning not trusted -> hash-filter fallback — a hive
    corpus written under a different num_parts must not yield wrong rows)."""
    import pyarrow.parquet as pq

    from pie_ray.sources.pages import read_pages_parts, write_pages_partitioned
    from pie_ray.sources.synth import pages_table
    from pie_ray.util import part_of

    t = pages_table(range(60))
    plain = str(tmp_path / "plain.parquet")
    pq.write_table(t, plain)

    want = {
        u for u in t.column("url").to_pylist() if part_of(u, NUM_PARTS) in (1, 3)
    }
    got = {r["url"] for r in read_pages_parts(plain, [1, 3], NUM_PARTS).take_all()}
    assert got == want and got

    # sidecar-validated hive layout -> directory pruning engages
    import ray.data

    hive = str(tmp_path / "hive")
    write_pages_partitioned(ray.data.from_arrow(t), hive, NUM_PARTS)
    import os

    assert os.path.isfile(os.path.join(hive, "_PARTS_META.json"))
    got2 = {r["url"] for r in read_pages_parts(hive, [1, 3], NUM_PARTS).take_all()}
    assert got2 == want

    # same hive dirs but NO sidecar: pruning is not trusted; the hash-filter
    # fallback still returns exactly the right rows. A MISMATCHED num_parts
    # (layout written under NUM_PARTS, read under 2*NUM_PARTS) also falls
    # back and stays correct instead of trusting wrong directories.
    os.remove(os.path.join(hive, "_PARTS_META.json"))
    got3 = {r["url"] for r in read_pages_parts(hive, [1, 3], NUM_PARTS).take_all()}
    assert got3 == want
    want4 = {
        u for u in t.column("url").to_pylist() if part_of(u, 2 * NUM_PARTS) in (1, 3)
    }
    got4 = {r["url"] for r in read_pages_parts(hive, [1, 3], 2 * NUM_PARTS).take_all()}
    assert got4 == want4


def test_read_pages_parts_missing_partition_schema(ray_session, tmp_path):
    """Requesting only nonexistent hive partitions yields an EMPTY dataset
    with the T0 data columns and NO hive part column (a leaked part column
    duplicates resume's derived one and breaks downstream lookups)."""
    import ray.data

    from pie_ray.sources.pages import read_pages_parts, write_pages_partitioned
    from pie_ray.sources.synth import pages_table
    from pie_ray.util import part_of

    # 30 urls over 64 parts leaves empty partitions by pigeonhole
    t = pages_table(range(30))
    occupied = {part_of(u, 64) for u in t.column("url").to_pylist()}
    empty_part = next(p for p in range(64) if p not in occupied)
    hive = str(tmp_path / "hive2")
    write_pages_partitioned(ray.data.from_arrow(t), hive, 64)

    ds = read_pages_parts(hive, [empty_part], 64)
    assert ds.count() == 0
    names = ds.schema().names
    assert "part" not in names and "url" in names
