"""Erasure (GDPR right-to-be-forgotten): forget_urls must leave the store
EQUAL to a fresh build over the corpus minus those pages (triples, graph,
ledger, link graph, and time-travel history); forget_person must remove
every trace of the entity's canonical component while the pages' other
facts survive. Both are idempotent."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _triple_rows(path):
    import ray.data

    return {
        (r["subj"], r["pred"], r["obj"], r["url"], r["warc_ts"])
        for r in ray.data.read_parquet(path).take_all()
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


def _pages_excluding(n, urls):
    import ray

    from pie_ray.sources.synth import synth_pages

    ref = ray.put(pa.array(sorted(urls), pa.string()))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t.column("url"), value_set=ray.get(ref)))
        )

    return synth_pages(n).map_batches(keep, batch_format="pyarrow")


N1, N2 = 140, 200


def _forget_set():
    from pie_ray.sources.synth import page_url

    # spans BOTH increments (pages 10-24 land in delta 0, 150-157 in delta 1)
    return {page_url(i) for i in list(range(10, 25)) + list(range(150, 158))}


def test_forget_urls_equals_fresh_minus(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import (
        forget_urls,
        incremental_build,
        incremental_update,
        list_increments,
        triples_asof,
        _read_meta,
    )
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_forget"))
    incremental_build(synth_pages(N1), root)
    incremental_update(root, synth_pages(N2))
    forget = _forget_set()

    rep = forget_urls(root, forget)
    assert rep["ledger_rows_dropped"] == len(forget)
    assert rep["ledger_deltas_rewritten"] == 2  # both increments touched
    assert _read_meta(root)["n_urls"] == N2 - len(forget)

    fresh = str(tmp_path_factory.mktemp("kg_fresh_minus"))
    incremental_build(_pages_excluding(N2, forget), fresh)
    assert _triple_rows(f"{root}/triples") == _triple_rows(f"{fresh}/triples")
    assert _graph_rows(f"{root}/graph") == _graph_rows(f"{fresh}/graph")

    # history is rewritten too: the as-of read of increment 0 carries no
    # forgotten provenance
    assert 0 in list_increments(root)
    asof_urls = {
        r["url"] for r in triples_asof(root, 0).select_columns(["url"]).take_all()
    }
    assert not (asof_urls & forget)

    # idempotent: a replayed request erases nothing further and the store
    # still equals the fresh-minus build
    rep2 = forget_urls(root, forget)
    assert rep2["raw_rows_dropped"] == 0 and rep2["ledger_rows_dropped"] == 0
    assert _triple_rows(f"{root}/triples") == _triple_rows(f"{fresh}/triples")


def test_forget_urls_untouched_deltas_stay_byte_stable(
    ray_session, tmp_path_factory
):
    from pie_ray.pipelines.incremental import (
        forget_urls,
        incremental_build,
        incremental_update,
    )
    from pie_ray.sources.synth import page_url, synth_pages

    root = str(tmp_path_factory.mktemp("kg_forget_stable"))
    incremental_build(synth_pages(N1), root)
    incremental_update(root, synth_pages(N2))
    # second increment's files before a forget that touches ONLY delta 0
    before = {
        f: os.stat(f).st_ino
        for f in glob.glob(f"{root}/raw/delta_000001/*.parquet")
    }
    assert before
    forget_urls(root, {page_url(3), page_url(7)})
    after = {
        f: os.stat(f).st_ino
        for f in glob.glob(f"{root}/raw/delta_000001/*.parquet")
    }
    assert after == before  # hardlinked through the swap, not rewritten


def test_forget_urls_linkdeltas(ray_session, tmp_path_factory):
    from pie_ray.pipelines.incremental import (
        forget_urls,
        incremental_build,
        linkgraph_from_deltas,
    )
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_forget_links"))
    incremental_build(synth_pages(N1), root, link_deltas=True)
    forget = _forget_set() & {
        r["url"]
        for r in synth_pages(N1).select_columns(["url"]).take_all()
    }
    assert forget
    # counted host-edge aggregates cannot be recomputed without the pages
    with pytest.raises(ValueError, match="link deltas"):
        forget_urls(root, forget)
    rep = forget_urls(root, forget, pages_ds=synth_pages(N1))
    assert rep["link_slots_rewritten"]

    fresh = str(tmp_path_factory.mktemp("kg_fresh_links"))
    incremental_build(_pages_excluding(N1, forget), fresh, link_deltas=True)

    def edge_set(r):
        lg = linkgraph_from_deltas(r)
        return {
            (x["src_host"], x["dst_host"], x["n_links"]) for x in lg.take_all()
        }

    assert edge_set(root) == edge_set(fresh)


def test_forget_person_removes_component_keeps_pages(
    ray_session, tmp_path_factory
):
    import ray.data

    from pie_ray.pipelines.incremental import forget_person, incremental_build
    from pie_ray.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("kg_forget_person"))
    incremental_build(synth_pages(N1), root)
    rows = ray.data.read_parquet(f"{root}/triples").take_all()
    # an entity with co-mention edges, so both match arms are exercised
    person = next(
        r["subj"] for r in rows if r["pred"] == "co_mentioned_with"
    )
    n_before = len(rows)
    page_urls_of_person = {r["url"] for r in rows if r["subj"] == person}

    rep = forget_person(root, person)
    assert rep["raw_rows_dropped"] > 0 and rep["keys_erased"] >= 1

    after = ray.data.read_parquet(f"{root}/triples").take_all()
    assert all(r["subj"] != person for r in after)
    assert all(
        not (r["pred"] == "co_mentioned_with" and r["obj"] == person)
        for r in after
    )
    # the pages the person appeared on still contribute their OTHER facts
    assert any(r["url"] in page_urls_of_person for r in after)
    assert len(after) < n_before

    rep2 = forget_person(root, person)  # idempotent
    assert rep2["raw_rows_dropped"] == 0


def test_forget_survives_stale_staging(ray_session, tmp_path_factory):
    """A killed forget leaves <table>.forgetting staging garbage; the next
    attempt clears it and converges."""
    from pie_ray.pipelines.incremental import forget_urls, incremental_build
    from pie_ray.sources.synth import page_url, synth_pages

    root = str(tmp_path_factory.mktemp("kg_forget_stale"))
    incremental_build(synth_pages(60), root)
    stale = os.path.join(root, "raw.forgetting", "delta_000000")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")
    rep = forget_urls(root, {page_url(1)})
    assert rep["raw_rows_dropped"] >= 0
    assert not os.path.exists(os.path.join(root, "raw.forgetting"))
    fresh = str(tmp_path_factory.mktemp("kg_forget_stale_fresh"))
    incremental_build(_pages_excluding(60, {page_url(1)}), fresh)
    assert _triple_rows(f"{root}/triples") == _triple_rows(f"{fresh}/triples")
