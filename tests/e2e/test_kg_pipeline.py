"""E2E gate (BASELINE.json): full pipeline triple set P/R >= 0.95 vs golden,
determinism across parallelism, distributed-CC equivalence, graph sink."""

import shutil

import pytest

from pie_ray.golden import golden_triples, precision_recall
from pie_ray.pipelines.kg import KgConfig, build_triples, run_pipeline
from pie_ray.sources.synth import synth_pages

N = 400


def _triple_set(df):
    return set(zip(df["subj"], df["pred"], df["obj"]))


@pytest.fixture(scope="module")
def produced(ray_session):
    df = build_triples(synth_pages(N, override_num_blocks=8)).to_pandas()
    return _triple_set(df)


def test_triple_pr_gate(produced):
    p, r = precision_recall(produced, golden_triples(N))
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_determinism_across_parallelism(ray_session, produced):
    cfg = KgConfig(ner_batch_size=32, ner_concurrency=2)
    df = build_triples(synth_pages(N, override_num_blocks=2), cfg).to_pandas()
    assert _triple_set(df) == produced


def test_distributed_cc_equivalent(ray_session, produced):
    cfg = KgConfig(force_distributed_cc=True)
    df = build_triples(synth_pages(N, override_num_blocks=8), cfg).to_pandas()
    assert _triple_set(df) == produced


def test_canon_join_path_equivalent(ray_session, produced):
    """A13's else-branch: labels kept as a Dataset and subj/obj rewritten
    via two hash joins (the past-broadcast-range path) must produce the
    IDENTICAL triple set as the ray.put broadcast rewrite."""
    cfg = KgConfig(force_canon_join=True)
    df = build_triples(synth_pages(N, override_num_blocks=8), cfg).to_pandas()
    assert _triple_set(df) == produced


def test_graph_sink(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "kg")
    shutil.rmtree(out, ignore_errors=True)
    res = run_pipeline(synth_pages(120, override_num_blocks=4), out)
    assert res["n_triples"] > 0
    g = ray.data.read_parquet(res["graph_path"])
    rows = g.take_all()
    assert len(rows) > 0
    srcs = [r["src"] for r in rows]
    assert len(srcs) == len(set(srcs)), "one adjacency row per src"
    r0 = rows[0]
    assert {"src", "adj", "degree", "part"} <= set(r0.keys())
    assert r0["degree"] == len(r0["adj"])
    t = ray.data.read_parquet(res["triples_path"])
    assert t.count() == res["n_triples"]
