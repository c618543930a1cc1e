"""Anchor-text extraction + per-host anchor-term top-k: planted-HTML
parity (tag stripping, case folding, empty/non-navigational drops),
deterministic tie-breaks, partition independence, and the linked-synth
signal (each host's top term is its own label)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pie_ray.pipelines.curation import q_anchor_terms
from pie_ray.sources.linksynth import n_hosts_for, synth_link_pages
from pie_ray.stages.links import extract_anchors_batch, host_anchor_terms


def _pages(rows: list[tuple[str, str]]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "html": pa.array([h.encode() for _, h in rows], pa.binary()),
        }
    )


PLANTED = _pages(
    [
        (
            "https://a.com/p1",
            '<a href="https://b.com/x"><b>Acme</b> Widgets</a>'
            '<a href="https://b.com/y">ACME widgets</a>'
            '<a href="https://c.com/z">  </a>'  # collapses to nothing
            '<a href="mailto:z@q.com">mail me</a>',  # non-navigational
        ),
        ("https://b.com/p1", '<a href="/local">home\npage</a>'),
    ]
)


def test_extract_anchors_planted():
    t = extract_anchors_batch(PLANTED)
    got = sorted(
        zip(t.column("dst_host").to_pylist(), t.column("anchor").to_pylist())
    )
    assert got == [
        ("b.com", "acme widgets"),  # nested tag stripped, lowercased
        ("b.com", "acme widgets"),  # case-folded duplicate
        ("b.com", "home page"),  # rooted href -> source host, \n collapsed
    ]


def test_host_anchor_terms_counts_ties_and_partition_independence(ray_session):
    results = []
    for parts, nb in ((1, 4), (3, 16)):
        ds = ray.data.from_arrow(PLANTED).repartition(parts)
        t = pa.Table.from_pylist(
            host_anchor_terms(ds, k=2, num_buckets=nb).take_all()
        )
        results.append(
            sorted(
                zip(
                    t.column("host").to_pylist(),
                    t.column("term").to_pylist(),
                    t.column("n_links").to_pylist(),
                )
            )
        )
    # counts: acme 2, widgets 2, home 1, page 1 -> k=2 keeps the tied top
    # pair, term-asc ordering deterministic
    assert results[0] == [("b.com", "acme", 2), ("b.com", "widgets", 2)]
    assert results[0] == results[1]


def test_linksynth_top_term_names_the_host(ray_session):
    n = 400
    tbl = pa.Table.from_pylist(
        host_anchor_terms(synth_link_pages(n), k=1).take_all()
    )
    by_host = dict(zip(tbl.column("host").to_pylist(), tbl.column("term").to_pylist()))
    n_hosts = n_hosts_for(n)
    # every linked-to host's single top term is its own label (count ties
    # with "official"/"site", term-asc tie-break picks the label)
    assert len(by_host) > 0
    for host, term in by_host.items():
        assert term == host.split(".")[0]
    # spam hosts receive no links, so they never appear
    assert all(h in {f"h{j}.example" for j in range(n_hosts)} for h in by_host)


def test_q_anchor_terms_shape(ray_session):
    t = q_anchor_terms("unused")
    assert t.num_rows > 0
    assert t.schema.names == ["host", "term", "n_links"]
    # at most 3 terms per host, and rows are (host asc, n desc, term asc)
    hosts = t.column("host").to_pylist()
    assert all(hosts.count(h) <= 3 for h in set(hosts))
