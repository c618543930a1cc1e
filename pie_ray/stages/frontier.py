"""Crawl-frontier scheduling: which URLs to fetch next.

The upstream half of every web corpus: given candidate URLs and the host
link-graph prior, emit the next crawl batch — highest-value hosts first,
but POLITE (at most ``per_host_cap`` URLs per host per cycle, the
classic frontier rule that stops one giant host from monopolizing the
fetch fleet) and bounded by a global ``budget``.

Priority is the host's integer rank (``host_pagerank`` /
``host_trustrank`` output — unknown hosts score 0, so a TrustRank prior
automatically starves link farms). All ordering is deterministic:
(priority desc, url asc), so the schedule is a pure function of
(candidates, ranks).

Scale shape: the rank table broadcasts once via ``ray.put`` (hosts, not
pages, bound it); the per-host cap is ONE host-bucketed exchange over
(url, host, priority) rows with a vectorized per-host head; the budget
cut is Ray's distributed sort + limit (an all-to-all, barriered — at a
real frontier's scale the cap has already shrunk the set to
hosts × per_host_cap rows, which is what makes the global sort cheap)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from pie_ray.stages.links import host_of
from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped


def frontier_schedule(
    urls_ds,
    ranks: pa.Table,
    per_host_cap: int = 16,
    budget: int | None = None,
    num_buckets: int | None = None,
):
    """Next crawl batch from a candidate-URL Dataset (column ``url``) and
    a (host, rank_scaled) rank table. Returns a Dataset
    (url, host, priority) — capped per host, globally ordered
    (priority desc, url asc), cut to ``budget`` rows when given."""
    nb = num_buckets or bucket_count(urls_ds.size_bytes(), floor=32)
    rank_ref = ray.put(
        dict(
            zip(
                ranks.column("host").to_pylist(),
                ranks.column("rank_scaled").to_pylist(),
            )
        )
    )
    _OUT = pa.schema(
        [("url", pa.string()), ("host", pa.string()), ("priority", pa.int64())]
    )

    def score(t: pa.Table) -> pa.Table:
        lookup = ray.get(rank_ref)
        urls = t.column("url").to_pylist()
        hosts = [host_of(u or "") for u in urls]
        pr = np.array([lookup.get(h, 0) for h in hosts], np.int64)
        ha = pa.array(hosts, pa.string())
        b = (bucket_hash_strings(ha, salt=0x0F27) % nb).astype("int32")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": ha,
                "priority": pa.array(pr, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def cap(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        g = g.drop_columns(["bucket"]).sort_by(
            [("host", "ascending"), ("url", "ascending")]
        )
        hosts = np.asarray(g.column("host").to_pylist())
        _, starts, counts = np.unique(hosts, return_index=True, return_counts=True)
        pos = np.arange(len(hosts)) - np.repeat(starts, counts)
        return g.filter(pa.array(pos < per_host_cap, pa.bool_()))

    capped = (
        urls_ds.map_batches(score, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cap, batch_format="pyarrow")
        .materialize()
    )
    ordered = capped.sort(["priority", "url"], descending=[True, False])
    return ordered.limit(budget) if budget is not None else ordered


def q_frontier(sf_dir: str):
    """Driver entry (rows-only): schedule the next crawl cycle over the
    linked corpus's own URLs with the host-PageRank prior — authorities
    surface first, capped at 2 per host."""
    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.links import host_edges, host_pagerank
    from pie_ray.util import gather_table

    pages = synth_link_pages(1200).materialize()
    ranks = host_pagerank(host_edges(pages))
    urls = pages.select_columns(["url"])
    out = frontier_schedule(urls, ranks, per_host_cap=2, budget=40)
    tbl = gather_table(out.materialize(), schema=pa.schema(
        [("url", pa.string()), ("host", pa.string()), ("priority", pa.int64())]
    ))
    # gather preserves block order from the sorted+limited Dataset; sort
    # again defensively so the row order is self-evidently deterministic
    return tbl.sort_by([("priority", "descending"), ("url", "ascending")])
