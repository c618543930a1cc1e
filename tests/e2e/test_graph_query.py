"""Read-side graph API: partition-pruned neighbor lookup + degree top-k,
and the _GRAPH_META sidecar must not break dataset readers."""

from __future__ import annotations


def test_neighbors_and_topk(ray_session, tmp_path):
    import ray.data

    from pie_ray.pipelines.graph_query import degree_topk, neighbors
    from pie_ray.pipelines.kg import KgConfig, run_pipeline
    from pie_ray.sources.synth import synth_pages

    out = str(tmp_path / "kg")
    cfg = KgConfig(num_graph_parts=8)
    res = run_pipeline(synth_pages(150, override_num_blocks=4), out, cfg)

    # sidecar must be ignored by both readers
    g = ray.data.read_parquet(res["graph_path"])
    rows = g.take_all()
    assert len(rows) > 0

    top = degree_topk(res["graph_path"], k=5)
    assert len(top) >= 1
    assert top == sorted(top, key=lambda x: (-x[1], x[0]))

    # every adjacency row must be reachable via the point lookup
    for r in rows[:10]:
        adj = neighbors(res["graph_path"], r["src"])
        assert len(adj) == r["degree"]
        assert adj == r["adj"]

    assert neighbors(res["graph_path"], "per:nonexistent entity") == []


def test_neighbors_khop(ray_session, tmp_path):
    """k-hop BFS over the partitioned sink: distances consistent with the
    one-hop adjacency reads, each frontier node costing one partition read."""
    import shutil

    from pie_ray.pipelines.kg import run_pipeline
    from pie_ray.pipelines.graph_query import degree_topk, neighbors, neighbors_khop
    from pie_ray.sources.synth import synth_pages

    out = str(tmp_path / "kgq")
    shutil.rmtree(out, ignore_errors=True)
    res = run_pipeline(synth_pages(150, override_num_blocks=4), out)
    gdir = res["graph_path"]
    src = degree_topk(gdir, 1)[0][0]
    d1 = neighbors_khop(gdir, src, k=1)
    direct = {e["dst"] for e in neighbors(gdir, src)}
    assert set(d1) == {src} | direct
    d2 = neighbors_khop(gdir, src, k=2)
    assert set(d1) <= set(d2)
    hop2 = {n for n, v in d2.items() if v == 2}
    reachable = set()
    for n in (n for n, v in d2.items() if v == 1):
        reachable |= {e["dst"] for e in neighbors(gdir, n)}
    assert hop2 <= reachable
