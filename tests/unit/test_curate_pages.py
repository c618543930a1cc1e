"""Domain-prior page curation (curate_pages) + the linked synth corpus:
partition independence of the generator, the spam-host-at-teleport-base
invariant the gate cuts on, broadcast ≡ join keep-path equivalence, and
report accounting (no silent drops)."""

from __future__ import annotations

import pyarrow as pa

from pie_ray.pipelines.curation import (
    curate_pages,
    q_curate_pages,
    q_host_linkgraph,
)
from pie_ray.sources.linksynth import (
    AUTH_FRAC,
    SPAM_FRAC,
    n_hosts_for,
    synth_link_pages,
)
from pie_ray.stages.links import host_edges, host_of, host_pagerank


def _rows(ds, cols):
    out = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        out.extend(zip(*(b.column(c).to_pylist() for c in cols)))
    return sorted(out)


def test_linksynth_partition_independent(ray_session):
    a = _rows(synth_link_pages(300, override_num_blocks=2), ["url", "html"])
    b = _rows(synth_link_pages(300, override_num_blocks=11), ["url", "html"])
    assert a == b and len(a) == 300


def test_spam_hosts_sit_at_teleport_base(ray_session):
    from pie_ray.functions.graphops import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    n = 600
    n_hosts = n_hosts_for(n)
    n_auth = max(2, int(n_hosts * AUTH_FRAC))
    n_spam = max(2, int(n_hosts * SPAM_FRAC))
    ranks = host_pagerank(host_edges(synth_link_pages(n)))
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    by_host = dict(
        zip(ranks.column("host").to_pylist(), ranks.column("rank_scaled").to_pylist())
    )
    spam = [f"h{j}.example" for j in range(n_hosts - n_spam, n_hosts)]
    auth = [f"h{j}.example" for j in range(n_auth)]
    assert all(by_host[h] == base for h in spam)  # no inbound mass, exactly base
    assert all(by_host[h] > base for h in auth)
    # authorities outrank every spam host by a wide margin
    assert min(by_host[h] for h in auth) > 10 * base


def test_curate_pages_paths_agree_and_report_adds_up(ray_session):
    pages = synth_link_pages(400).materialize()
    ranks = host_pagerank(host_edges(pages))
    k_b, r_b = curate_pages(pages, ranks=ranks, keep_path="broadcast")
    k_j, r_j = curate_pages(pages, ranks=ranks, keep_path="join")
    urls_b = _rows(k_b, ["url"])
    urls_j = _rows(k_j, ["url"])
    assert urls_b == urls_j and 0 < len(urls_b) < 400
    for r in (r_b, r_j):
        assert r["n_pages_kept"] + r["n_pages_dropped"] == r["n_pages"] == 400
        assert r["n_hosts_kept"] + r["n_hosts_dropped"] == r["n_hosts"]
    assert r_b["keep_path"] == "broadcast" and r_j["keep_path"] == "join"
    # kept pages are exactly the pages whose host cleared the threshold
    kept_hosts = {
        h
        for h, rs in zip(
            ranks.column("host").to_pylist(),
            ranks.column("rank_scaled").to_pylist(),
        )
        if rs >= r_b["min_rank_scaled"]
    }
    assert {host_of(u) for (u,) in urls_b} == kept_hosts


def test_q_entries_nonempty_and_consistent(ray_session):
    t = q_curate_pages("unused")
    assert t.num_rows > 0
    assert t.schema.names == ["host", "rank_scaled", "kept", "n_pages"]
    kept = t.column("kept").to_pylist()
    assert 0 < sum(kept) < t.num_rows  # gate keeps some, drops some
    assert sum(t.column("n_pages").to_pylist()) == 1200

    g = q_host_linkgraph("unused")
    assert g.num_rows > 0
    assert g.schema.names == ["src_host", "dst_host", "n_links"]
    keys = list(
        zip(g.column("src_host").to_pylist(), g.column("dst_host").to_pylist())
    )
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    assert pa.types.is_int64(g.schema.field("n_links").type)


# ------------------------------------------------- host TrustRank (link farm)


def _farm_setup(n=400):
    from pie_ray.sources.linksynth import AUTH_FRAC, SPAM_FRAC

    n_hosts = n_hosts_for(n)
    n_auth = max(2, int(n_hosts * AUTH_FRAC))
    n_spam = max(2, int(n_hosts * SPAM_FRAC))
    seeds = [f"h{j}.example" for j in range(n_auth)]
    spam = [f"h{j}.example" for j in range(n_hosts - n_spam, n_hosts)]
    pages = synth_link_pages(n, spam_interlink=True).materialize()
    return pages, seeds, spam


def test_link_farm_beats_pagerank_gate_but_not_trustrank(ray_session):
    from pie_ray.functions.graphops import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE
    from pie_ray.stages.links import host_edges, host_trustrank

    pages, seeds, spam = _farm_setup()
    edges = host_edges(pages).materialize()
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    pr = host_pagerank(edges)
    pr_map = dict(
        zip(pr.column("host").to_pylist(), pr.column("rank_scaled").to_pylist())
    )
    tr = host_trustrank(edges, seeds)
    tr_map = dict(
        zip(tr.column("host").to_pylist(), tr.column("rank_scaled").to_pylist())
    )
    # the farm interlinks, so every spam host clears the inbound-mass gate…
    assert all(pr_map[h] >= base + 1 for h in spam)
    # …but has no in-path from a trusted seed: TrustRank exactly 0
    assert all(tr_map[h] == 0 for h in spam)
    assert all(tr_map[h] > 0 for h in seeds)


def test_host_trustrank_driver_vs_join_path_bit_equal(ray_session):
    from pie_ray.stages.links import host_edges, host_trustrank

    pages, seeds, _spam = _farm_setup(300)
    edges = host_edges(pages).materialize()
    a = host_trustrank(edges, seeds, id_path="driver")
    b = host_trustrank(edges, seeds, id_path="join")
    to_map = lambda t: dict(
        zip(t.column("host").to_pylist(), t.column("rank_scaled").to_pylist())
    )
    assert to_map(a) == to_map(b) and a.num_rows > 0


def test_host_trustrank_long_seed_never_truncates(ray_session):
    """A seed LONGER than the longest graph host must match nothing — a
    width-truncating cast (np.asarray(seeds, dtype=hosts.dtype)) would
    clip 'h1.example.phish' to 'h1.example' and spuriously grant it
    trust. Both id paths must agree (bit-equal claim)."""
    import ray.data

    from pie_ray.stages.links import host_trustrank

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_host": pa.array(["h1.example", "h2.example"], pa.string()),
                "dst_host": pa.array(["h2.example", "h1.example"], pa.string()),
                "n_links": pa.array([3, 2], pa.int64()),
            }
        )
    )
    # longer than every graph host; its prefix IS a real host
    seeds = ["h1.example.phish"]
    for path in ("driver", "join"):
        tr = host_trustrank(edges, seeds, id_path=path)
        ranks = dict(
            zip(tr.column("host").to_pylist(), tr.column("rank_scaled").to_pylist())
        )
        # no seed is in the graph -> zero trust everywhere, no spurious match
        assert all(v == 0 for v in ranks.values()), (path, ranks)


def test_curate_pages_with_trustrank_prior_cuts_the_farm(ray_session):
    from pie_ray.stages.links import host_edges, host_of, host_trustrank

    pages, seeds, spam = _farm_setup()
    ranks = host_trustrank(host_edges(pages), seeds)
    kept, report = curate_pages(pages, ranks=ranks, min_rank_scaled=1)
    kept_hosts = {
        host_of(u)
        for b in kept.iter_batches(batch_format="pyarrow", batch_size=4096)
        for u in b.column("url").to_pylist()
    }
    assert kept_hosts.isdisjoint(spam) and set(seeds) <= kept_hosts
    assert report["n_pages_dropped"] > 0


def test_q_host_trustrank_shape(ray_session):
    from pie_ray.pipelines.curation import q_host_trustrank

    t = q_host_trustrank("unused")
    assert t.num_rows > 0
    assert t.schema.names == [
        "host",
        "pagerank_scaled",
        "trustrank_scaled",
        "kept_pagerank_gate",
        "kept_trustrank_gate",
    ]
    kp = t.column("kept_pagerank_gate").to_pylist()
    kt = t.column("kept_trustrank_gate").to_pylist()
    # the two gates genuinely disagree on the farm: some hosts pass
    # PageRank yet fail TrustRank
    assert any(p and not q for p, q in zip(kp, kt))


# ----------------------------------------------- curate_web composite recipe


def _dup_corpus(n=300):
    import pyarrow.compute as pc

    pages = synth_link_pages(n, spam_interlink=True)

    def add_dups(t: pa.Table) -> pa.Table:
        # keyed on the page index in the url — never batch-local position
        keep = [
            int(u.rsplit("/p", 1)[1]) % 5 == 0
            for u in t.column("url").to_pylist()
        ]
        dups = t.filter(pa.array(keep, pa.bool_()))
        if dups.num_rows:
            urls = [f"{u}?utm_source=feed" for u in dups.column("url").to_pylist()]
            ts = pc.add(dups.column("warc_ts").cast(pa.int64()), 1).cast(
                pa.timestamp("us")
            )
            dups = (
                dups.drop_columns(["url", "warc_ts"])
                .append_column("url", pa.array(urls, pa.string()))
                .append_column("warc_ts", ts)
                .select(t.column_names)
            )
        return pa.concat_tables([t, dups]).combine_chunks()

    return pages.map_batches(add_dups, batch_format="pyarrow").materialize(), n


def test_dedup_pages_by_url_paths_agree_and_original_wins(ray_session):
    from pie_ray.pipelines.curation import dedup_pages_by_url

    corpus, n = _dup_corpus()
    k_b, r_b = dedup_pages_by_url(corpus, loser_path="broadcast")
    k_j, r_j = dedup_pages_by_url(corpus, loser_path="join")
    urls_b = _rows(k_b, ["url"])
    urls_j = _rows(k_j, ["url"])
    assert urls_b == urls_j and len(urls_b) == n
    assert r_b["n_url_dups_dropped"] == r_j["n_url_dups_dropped"] > 0
    # the earlier-ts ORIGINAL wins — no surviving url carries the tracker
    assert all("utm_source" not in u for (u,) in urls_b)


def test_curate_web_v1_stage_accounting(ray_session):
    from pie_ray.pipelines.curation import curate_web_v1
    from pie_ray.sources.linksynth import AUTH_FRAC, SPAM_FRAC

    corpus, n = _dup_corpus()
    n_hosts = n_hosts_for(n)
    seeds = [f"h{j}.example" for j in range(max(2, int(n_hosts * AUTH_FRAC)))]
    n_spam = max(2, int(n_hosts * SPAM_FRAC))
    docs, report = curate_web_v1(corpus, seed_hosts=seeds)
    assert report["url_dedup"]["n_kept"] == n  # every planted dup cut
    assert report["structure_gate"]["n_kept"] == n  # real pages all pass
    # the farm's pages all fall to the trust prior
    spam_pages = sum(1 for i in range(n) if (i % n_hosts) >= n_hosts - n_spam)
    assert report["host_prior"]["n_pages_dropped"] == spam_pages
    assert report["host_prior"]["prior"] == "trustrank"
    assert report["n_docs_out"] == n - spam_pages
    schema = docs.schema()
    assert set(schema.names) == {"url", "warc_ts", "text", "lang"}
    # extracted text is real (frozen stripper ran)
    sample = docs.take(3)
    assert all(len(r["text"]) > 0 for r in sample)


def test_q_curate_web_rows(ray_session):
    from pie_ray.pipelines.curation import q_curate_web

    t = q_curate_web("unused")
    assert t.column("stage").to_pylist() == [
        "url_dedup",
        "structure_gate",
        "host_prior",
    ]
    ri = t.column("rows_in").to_pylist()
    ro = t.column("rows_out").to_pylist()
    assert ri[0] > ro[0]  # dups cut
    assert ro[1] == ri[1]  # real pages all structurally fine
    assert ro[2] < ri[2]  # farm cut
    # stages chain: output of one is input of the next
    assert ri[1] == ro[0] and ri[2] == ro[1]


def test_q_host_components_farm_separates(ray_session):
    from pie_ray.pipelines.curation import q_host_components

    t = q_host_components("unused")
    comp = dict(zip(t.column("host").to_pylist(), t.column("component").to_pylist()))
    farm = {
        h
        for h, f in zip(t.column("host").to_pylist(),
                        t.column("is_farm_component").to_pylist())
        if f
    }
    assert farm and farm != set(comp)
    farm_comps = {comp[h] for h in farm}
    real_comps = {comp[h] for h in comp if h not in farm}
    # the farm's component(s) share nothing with the real web's
    assert farm_comps.isdisjoint(real_comps)
    # the real web is one connected component (authorities glue it)
    assert len(real_comps) == 1


def test_dedup_pages_exact_url_recrawl_keeps_winner(ray_session):
    """Regression: the same RAW url recrawled at two timestamps must keep
    the earliest copy — a url-keyed loser set removed the winner too."""
    import ray.data
    from pie_ray.pipelines.curation import dedup_pages_by_url

    t = pa.table(
        {
            "url": pa.array(
                ["https://a.example/x", "https://a.example/x", "https://b.example/y"],
                pa.string(),
            ),
            "warc_ts": pa.array([1, 2, 5], pa.timestamp("us")),
            "html": pa.array([b"h1", b"h2", b"h3"], pa.binary()),
        }
    )
    for path in ("broadcast", "join"):
        kept, report = dedup_pages_by_url(
            ray.data.from_arrow(t), loser_path=path
        )
        rows = sorted(
            (r["url"], r["warc_ts"]) for r in kept.take_all()
        )
        assert [u for u, _ in rows] == ["https://a.example/x", "https://b.example/y"]
        assert rows[0][1].microsecond == 1 or rows[0][1].timestamp() * 1e6 == 1
        assert report["n_kept"] == 2 and report["n_url_dups_dropped"] == 1


def test_dup_corpus_partition_independent(ray_session):
    """Regression: the planted dup set must be a pure function of the
    data — batch-local positions once made it depend on block layout."""
    import ray.data

    sets = []
    for blocks in (2, 13):
        pages = synth_link_pages(
            200, spam_interlink=True, override_num_blocks=blocks
        )

        def add_dups(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = [
                int(u.rsplit("/p", 1)[1]) % 5 == 0
                for u in t.column("url").to_pylist()
            ]
            dups = t.filter(pa.array(keep, pa.bool_()))
            if dups.num_rows:
                urls = [
                    f"{u}?utm_source=feed" for u in dups.column("url").to_pylist()
                ]
                ts = pc.add(dups.column("warc_ts").cast(pa.int64()), 1).cast(
                    pa.timestamp("us")
                )
                dups = (
                    dups.drop_columns(["url", "warc_ts"])
                    .append_column("url", pa.array(urls, pa.string()))
                    .append_column("warc_ts", ts)
                    .select(t.column_names)
                )
            return pa.concat_tables([t, dups]).combine_chunks()

        corpus = pages.map_batches(add_dups, batch_format="pyarrow")
        sets.append(_rows(corpus, ["url"]))
    assert sets[0] == sets[1] and len(sets[0]) == 240
