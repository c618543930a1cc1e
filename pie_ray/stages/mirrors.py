"""Mirror-host detection + per-host crawl stats over T0/T1 pages.

Mirrors are the host-level face of exact duplication: the same content
crawled under two domains (mirrors, parked clones, CDN vanity hosts,
scraper sites). Page-level exact dedup removes the rows; MIRROR
DETECTION names the host pairs, which is what a curation pipeline wants
— a scraper mirror of a trusted site should lose at the SOURCE level,
not win page-by-page coin flips. Definition here: hosts (a, b) are
mirror candidates when they share at least ``min_shared`` distinct page
CONTENT hashes (the frozen stripper's text_sha256 — markup may differ,
mirrored text does not).

Scale shape (the MinHash-LSH banding shape, specialized to exact keys):

1. per-batch distinct (sha, host) pairs — a combiner, so exchange volume
   is distinct pairs, never pages;
2. ONE sha-bucketed exchange; per bucket, hosts sharing a sha pair up
   via the vectorized within-group expansion. Hot shas (boilerplate
   pages every host serves — "404", empty text) would explode
   quadratically, so shas seen on more than ``max_hosts_per_sha`` hosts
   are dropped and COUNTED (the LSH hot-band cap rule: a page on 500
   hosts is boilerplate, not a mirror signal);
3. one pair-bucketed count exchange -> (host_a, host_b, n_shared),
   filtered to ``min_shared``.

``host_stats`` is the one-exchange per-host crawl report (pages, bytes,
text chars, distinct content hashes, first/last warc_ts) — the grouping
key is the host, counts are exact int64."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.stages.links import PAIR_SEP, host_of
from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped

MAX_HOSTS_PER_SHA = 64


def _pairs_within_sorted_groups(keys: np.ndarray, vals: np.ndarray):
    """All unordered within-group value pairs of group-sorted key/value
    arrays, vectorized per distinct group size (the graphops pattern)."""
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    for k in np.unique(counts):
        if k < 2:
            continue
        st = starts[counts == k]
        mat = vals[st[:, None] + np.arange(k)[None, :]]
        mat.sort(axis=1)
        iu, ju = np.triu_indices(int(k), 1)
        outs_a.append(mat[:, iu].ravel())
        outs_b.append(mat[:, ju].ravel())
    if not outs_a:
        z = np.empty(0, object)
        return z, z
    return np.concatenate(outs_a), np.concatenate(outs_b)


def mirror_hosts(
    pages_ds,
    min_shared: int = 3,
    max_hosts_per_sha: int = MAX_HOSTS_PER_SHA,
    num_buckets: int | None = None,
):
    """(host_a, host_b, n_shared) for host pairs sharing >= ``min_shared``
    distinct content hashes (host_a < host_b). Input needs (url,
    text_sha256) — i.e. T1 extracted pages. Returns (pairs_ds, report);
    the report counts shas dropped by the hot-sha cap (no silent caps)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1 (sentinel rows carry 0)")
    nb = num_buckets or bucket_count(pages_ds.size_bytes(), floor=32)
    _PAIR_SCHEMA = pa.schema(
        [("host_a", pa.string()), ("host_b", pa.string()), ("n_shared", pa.int64())]
    )

    def sha_host_partial(t: pa.Table) -> pa.Table:
        hosts = [host_of(u or "") for u in t.column("url").to_pylist()]
        shas = t.column("text_sha256").to_pylist()
        seen = sorted({(s, h) for s, h in zip(shas, hosts) if s and h})
        sa = pa.array([s for s, _ in seen], pa.string())
        ha = pa.array([h for _, h in seen], pa.string())
        b = (bucket_hash_strings(sa, salt=0x31AA) % nb).astype("int32")
        return pa.table(
            {"sha": sa, "host": ha, "bucket": pa.array(b, pa.int32())}
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                    "hot_shas": pa.array([], pa.int64()),
                }
            )
        gb = g.drop_columns(["bucket"]).group_by(["sha", "host"]).aggregate([])
        gb = rename_grouped(gb, ["sha", "host"], ["sha", "host"])
        gb = gb.sort_by([("sha", "ascending"), ("host", "ascending")])
        shas = np.asarray(gb.column("sha").to_pylist(), object)
        hosts = np.asarray(gb.column("host").to_pylist(), object)
        # hot-sha cap: a sha on many hosts is boilerplate, not mirroring
        uniq, inv, counts = np.unique(shas, return_inverse=True, return_counts=True)
        hot = counts > max_hosts_per_sha
        keep = ~hot[inv]
        n_hot = int(hot.sum())
        a, b = _pairs_within_sorted_groups(shas[keep], hosts[keep])
        if len(a) == 0:
            gb2 = pa.table(
                {"pair": pa.array([], pa.string()), "n_shared": pa.array([], pa.int64())}
            )
        else:
            pair_tbl = pa.table(
                {
                    "pair": pc.binary_join_element_wise(
                        pa.array(list(a), pa.string()),
                        pa.array(list(b), pa.string()),
                        PAIR_SEP,
                    ),
                    "n_shared": pa.array(np.ones(len(a), np.int64)),
                }
            )
            gb2 = pair_tbl.group_by(["pair"]).aggregate([("n_shared", "sum")])
            gb2 = rename_grouped(gb2, ["pair"], ["pair", "n_shared"])
        # sentinel row carries this bucket's hot-sha count (n_shared=0, so
        # the pair combine's min_shared>=1 filter drops it from results)
        sentinel = pa.table(
            {"pair": pa.array([""], pa.string()), "n_shared": pa.array([0], pa.int64())}
        )
        gb2 = pa.concat_tables([sentinel, gb2])
        return gb2.append_column(
            "hot_shas", pa.array([n_hot] + [0] * (gb2.num_rows - 1), pa.int64())
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        b = (bucket_hash_strings(t.column("pair"), salt=0x77F1) % nb).astype("int32")
        return t.append_column("bucket2", pa.array(b, pa.int32()))

    def pair_combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        gb = (
            g.drop_columns(["bucket2", "hot_shas"])
            .group_by(["pair"])
            .aggregate([("n_shared", "sum")])
        )
        gb = rename_grouped(gb, ["pair"], ["pair", "n_shared"])
        gb = gb.filter(
            pc.greater_equal(gb.column("n_shared"), pa.scalar(min_shared, pa.int64()))
        )
        parts = pc.split_pattern(gb.column("pair"), PAIR_SEP)
        return pa.table(
            {
                "host_a": pc.list_element(parts, 0),
                "host_b": pc.list_element(parts, 1),
                "n_shared": gb.column("n_shared"),
            }
        )

    sha_pairs = (
        pages_ds.map_batches(sha_host_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .materialize()
    )
    n_hot = int(
        sha_pairs.sum("hot_shas") or 0
    )  # streaming sum — no driver pull of pairs
    pairs = (
        sha_pairs.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("bucket2")
        .map_groups(pair_combine, batch_format="pyarrow")
    )
    return pairs, {"n_hot_shas_dropped": n_hot, "min_shared": min_shared}


def host_stats(pages_ds, num_buckets: int | None = None):
    """Per-host crawl report over T1 pages: (host, n_pages, html_or_text
    chars, n_distinct_content, first_ts, last_ts). Per-batch partials
    (distinct shas carried as rows) + ONE host-bucketed exchange."""
    nb = num_buckets or bucket_count(pages_ds.size_bytes(), floor=32)

    def partial(t: pa.Table) -> pa.Table:
        hosts = [host_of(u or "") for u in t.column("url").to_pylist()]
        ts = t.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        chars = np.array(
            [len(x or "") for x in t.column("text").to_pylist()], np.int64
        )
        shas = t.column("text_sha256").to_pylist()
        ha = pa.array(hosts, pa.string())
        tbl = pa.table(
            {
                "host": ha,
                "sha": pa.array(shas, pa.string()),
                "n_pages": pa.array(np.ones(len(hosts), np.int64)),
                "text_chars": pa.array(chars, pa.int64()),
                "first_ts": pa.array(ts, pa.int64()),
                "last_ts": pa.array(ts, pa.int64()),
            }
        )
        gb = tbl.group_by(["host", "sha"]).aggregate(
            [
                ("n_pages", "sum"),
                ("text_chars", "sum"),
                ("first_ts", "min"),
                ("last_ts", "max"),
            ]
        )
        gb = rename_grouped(
            gb,
            ["host", "sha"],
            ["host", "sha", "n_pages", "text_chars", "first_ts", "last_ts"],
        )
        b = (bucket_hash_strings(gb.column("host"), salt=0x5E11) % nb).astype(
            "int32"
        )
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    _OUT = pa.schema(
        [
            ("host", pa.string()),
            ("n_pages", pa.int64()),
            ("text_chars", pa.int64()),
            ("n_distinct_content", pa.int64()),
            ("first_ts", pa.int64()),
            ("last_ts", pa.int64()),
        ]
    )

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        # collapse to per (host, sha) first (cross-batch dups), then host
        g1 = (
            g.drop_columns(["bucket"])
            .group_by(["host", "sha"])
            .aggregate(
                [
                    ("n_pages", "sum"),
                    ("text_chars", "sum"),
                    ("first_ts", "min"),
                    ("last_ts", "max"),
                ]
            )
        )
        g1 = rename_grouped(
            g1,
            ["host", "sha"],
            ["host", "sha", "n_pages", "text_chars", "first_ts", "last_ts"],
        )
        g1 = g1.append_column(
            "n_distinct_content", pa.array(np.ones(g1.num_rows, np.int64))
        )
        g2 = g1.drop_columns(["sha"]).group_by(["host"]).aggregate(
            [
                ("n_pages", "sum"),
                ("text_chars", "sum"),
                ("n_distinct_content", "sum"),
                ("first_ts", "min"),
                ("last_ts", "max"),
            ]
        )
        g2 = rename_grouped(
            g2,
            ["host"],
            [
                "host",
                "n_pages",
                "text_chars",
                "n_distinct_content",
                "first_ts",
                "last_ts",
            ],
        )
        return g2.select(_OUT.names)

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def q_mirror_hosts(sf_dir: str):
    """Driver entry (rows-only — content hashing over HTML is not
    SQL-expressible): plant a scraper mirror of one authority host onto a
    new domain and detect the pair. Returns (host_a, host_b, n_shared)
    sorted."""
    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.extract import extract_batch
    from pie_ray.util import gather_table

    def mirror_batch(t: pa.Table) -> pa.Table:
        # every page of h0.example also appears on mirror-of-h0.example
        urls = t.column("url").to_pylist()
        is_h0 = [u.startswith("https://h0.example/") for u in urls]
        dup = t.filter(pa.array(is_h0, pa.bool_()))
        if dup.num_rows:
            new_urls = [
                u.replace("https://h0.example/", "https://mirror-of-h0.example/")
                for u in dup.column("url").to_pylist()
            ]
            dup = dup.drop_columns(["url"]).append_column(
                "url", pa.array(new_urls, pa.string())
            ).select(t.column_names)
        return pa.concat_tables([t, dup]).combine_chunks()

    pages = (
        synth_link_pages(1200)
        .map_batches(mirror_batch, batch_format="pyarrow")
        .map_batches(extract_batch, batch_format="pyarrow")
    )
    pairs, _report = mirror_hosts(pages, min_shared=3)
    tbl = gather_table(
        pairs,
        schema=pa.schema(
            [
                ("host_a", pa.string()),
                ("host_b", pa.string()),
                ("n_shared", pa.int64()),
            ]
        ),
    )
    return tbl.sort_by([("host_a", "ascending"), ("host_b", "ascending")])


def q_host_stats(sf_dir: str):
    """Driver entry (rows-only): per-host crawl report of the linked
    corpus after extraction, sorted by host."""
    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.extract import extract_batch
    from pie_ray.util import gather_table

    pages = synth_link_pages(1200).map_batches(
        extract_batch, batch_format="pyarrow"
    )
    tbl = gather_table(
        host_stats(pages),
        schema=pa.schema(
            [
                ("host", pa.string()),
                ("n_pages", pa.int64()),
                ("text_chars", pa.int64()),
                ("n_distinct_content", pa.int64()),
                ("first_ts", pa.int64()),
                ("last_ts", pa.int64()),
            ]
        ),
    )
    return tbl.sort_by([("host", "ascending")])
