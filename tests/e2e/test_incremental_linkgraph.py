"""Incremental link-graph maintenance: per-increment edge deltas
re-aggregate to exactly the full-corpus graph, slots are idempotent
under crash replay, and a no-new-pages update leaves the graph alone."""

from __future__ import annotations

import pyarrow as pa

from pie_ray.pipelines.incremental import (
    _write_link_delta,
    incremental_build,
    incremental_update,
    linkgraph_from_deltas,
)
from pie_ray.sources.linksynth import synth_link_pages
from pie_ray.sources.synth import synth_pages
from pie_ray.stages.links import host_edges


def _corpus(n_link: int):
    # KG synth pages keep NER/triples non-trivial; linksynth pages carry
    # the cross-host links that make the graph interesting. Subset ONE
    # fixed 400-page link universe by page index (n_hosts scales with n,
    # so generating at different n would change urls between crawls).
    def keep(t: pa.Table) -> pa.Table:
        idx = [int(u.rsplit("/p", 1)[1]) for u in t.column("url").to_pylist()]
        return t.filter(pa.array([i < n_link for i in idx], pa.bool_()))

    links = synth_link_pages(400).map_batches(keep, batch_format="pyarrow")
    return synth_pages(40).union(links).materialize()


def _edge_map(ds_or_none) -> dict:
    if ds_or_none is None:
        return {}
    t = pa.Table.from_pylist(ds_or_none.take_all())
    if t.num_rows == 0:
        return {}
    return {
        (r["src_host"], r["dst_host"]): r["n_links"] for r in t.to_pylist()
    }


def test_linkgraph_deltas_rebuild_exact_and_noop(ray_session, tmp_path):
    root = str(tmp_path / "kg")
    incremental_build(_corpus(200), root, link_deltas=True)
    got0 = _edge_map(linkgraph_from_deltas(root))
    want0 = _edge_map(host_edges(_corpus(200)))
    assert got0 == want0 and len(got0) > 0

    # superset crawl: only the 200 new link pages enter the delta, yet the
    # aggregate equals the FULL current corpus's graph (weights additive)
    r = incremental_update(root, _corpus(400), link_deltas=True)
    assert r["n_new_pages"] == 200
    got1 = _edge_map(linkgraph_from_deltas(root))
    want1 = _edge_map(host_edges(_corpus(400)))
    assert got1 == want1

    # same crawl again: nothing new, graph unchanged
    r2 = incremental_update(root, _corpus(400), link_deltas=True)
    assert r2["n_new_pages"] == 0
    assert _edge_map(linkgraph_from_deltas(root)) == want1


def test_link_delta_slot_idempotent(ray_session, tmp_path):
    root = str(tmp_path / "kg2")
    pages = synth_link_pages(150).materialize()
    # simulate a crashed update replaying the same slot: the second write
    # clears the slot first, so edge counts never double
    _write_link_delta(root, 0, pages)
    once = _edge_map(linkgraph_from_deltas(root))
    _write_link_delta(root, 0, pages)
    assert _edge_map(linkgraph_from_deltas(root)) == once == _edge_map(
        host_edges(pages)
    )


def test_link_deltas_cannot_be_enabled_after_build(ray_session, tmp_path):
    """A root built WITHOUT link deltas has lost its earlier pages, so a
    later --linkgraph ingest must refuse instead of presenting a partial
    graph; reading the graph from such a root refuses likewise."""
    import pytest

    root = str(tmp_path / "kg3")
    incremental_build(_corpus(100), root, link_deltas=False)
    with pytest.raises(ValueError, match="link_deltas"):
        incremental_update(root, _corpus(200), link_deltas=True)
    with pytest.raises(ValueError, match="link_deltas"):
        linkgraph_from_deltas(root)


def test_crash_after_ledger_recovers_slot_edges(ray_session, tmp_path):
    """Regression: crash after the ledger lands but before the slot's
    _DONE — the replay (which sees zero new pages) must rebuild the
    slot's edges from its durable url ledger, not clobber them."""
    import os
    import shutil

    from pie_ray.pipelines.incremental import _read_meta, _write_meta

    root = str(tmp_path / "kg4")
    incremental_build(_corpus(200), root, link_deltas=True)
    meta_before = _read_meta(root)  # state a crash-before-meta would leave
    incremental_update(root, _corpus(400), link_deltas=True)
    want = _edge_map(linkgraph_from_deltas(root))

    # simulate the crash window: ledger + raw landed for slot 1, but the
    # meta write never happened and the slot's edges are gone/partial
    shutil.rmtree(os.path.join(root, "linkedges", "delta_000001"))
    _write_meta(root, meta_before)
    # replay the same crawl — n_new == 0 (urls already ledgered), but the
    # stale-slot recovery rebuilds the edges from the durable ledger
    r = incremental_update(root, _corpus(400), link_deltas=True)
    # (rebuilt may be False: link pages emit no triples, so the RAW
    # fingerprint legitimately matches — the edge recovery runs earlier)
    assert r["n_new_pages"] == 0
    assert _edge_map(linkgraph_from_deltas(root)) == want
    # full coverage on the honest replay: every ledgered url arrived
    assert r["found_urls"] == r["ledgered_urls"] > 0


def test_wrong_crawl_replay_surfaces_coverage_shortfall(
    ray_session, tmp_path, caplog
):
    """Crash after the ledger, then a DIFFERENT crawl replayed into the
    window: the slot can only rebuild from ledger ∩ new crawl, so the
    crashed pages' edges are unrecoverable from this input — the update
    must SAY so (coverage counts in the report + a warning + a durable
    _COVERAGE marker), never hole the graph silently."""
    import logging
    import os
    import shutil

    from pie_ray.pipelines.incremental import _read_meta, _write_meta

    root = str(tmp_path / "kg5")
    incremental_build(_corpus(200), root, link_deltas=True)
    meta_before = _read_meta(root)
    incremental_update(root, _corpus(400), link_deltas=True)

    # crash window for slot 1: edges gone, meta rolled back
    shutil.rmtree(os.path.join(root, "linkedges", "delta_000001"))
    _write_meta(root, meta_before)
    # replay a DIFFERENT, smaller crawl: slot 1's ledger holds the 200
    # link pages of _corpus(400)'s upper half, none of which this crawl
    # carries
    with caplog.at_level(logging.WARNING, "pie_ray.pipelines.incremental"):
        r = incremental_update(root, _corpus(200), link_deltas=True)
    assert r["found_urls"] < r["ledgered_urls"]
    assert any("covers only" in m for m in caplog.messages)
    cov_file = os.path.join(root, "linkedges", "delta_000001", "_COVERAGE")
    with open(cov_file) as f:
        assert f.read().strip() == f"{r['found_urls']}/{r['ledgered_urls']}"
