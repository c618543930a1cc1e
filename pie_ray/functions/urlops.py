"""URL canonicalization + canonical-url page dedup.

The first dedup any web pipeline runs is URL-level: the same page is
crawled as ``http://Site.com/a?utm_source=x`` and ``https://site.com/a``,
and near-dup text dedup is far too expensive to spend on what a string
normalization catches. Canonicalization spec v1 (deterministic, stdlib
``urllib.parse`` only):

- scheme and host lowercased; the host's ``www.`` is KEPT (stripping it
  changes host identity — a policy choice, not a normalization);
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- tracking query params dropped: any ``utm_*`` plus the exact set
  ``gclid/fbclid/msclkid/ref`` (the CCNet/C4-era boilerplate set);
- remaining query params sorted by (key, value); an emptied query is
  dropped entirely;
- a trailing slash on a non-root path stripped (``/a/`` == ``/a``; the
  root ``/`` is kept).

Non-absolute inputs (no scheme://host) are returned stripped but
otherwise untouched — canonicalization is only meaningful for absolute
URLs.

Scale shape: canonicalization is a stateless per-batch map (url-granular
Python over short strings — same cost shape as the frozen stripper's
doc-granular regex pass; the page payload never moves). Dedup is the
house exact-dedup pattern: per-batch canonical keys + ONE key-bucketed
exchange (vectorized FNV bucket hash), per-bucket Arrow group_by min —
exchange volume is (key, order) pairs, never page payloads."""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped

TRACKING_EXACT = frozenset({"gclid", "fbclid", "msclkid", "ref"})


def canonical_url(u: str) -> str:
    """Spec-v1 canonical form of one URL (see module docstring). TOTAL:
    inputs the parser rejects (out-of-range or non-numeric ports, broken
    IPv6 brackets, …) come back stripped-but-unchanged — one malformed
    URL in a crawl must never kill a batch."""
    u = (u or "").strip()
    try:
        parts = urlsplit(u)
        if not parts.scheme or not parts.netloc:
            return u
        scheme = parts.scheme.lower()
        host = parts.hostname.lower() if parts.hostname else ""
        port = parts.port
    except ValueError:
        return u
    netloc = host
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{host}:{port}"
    path = parts.path
    if path.endswith("/") and len(path) > 1:
        path = path.rstrip("/") or "/"
    kept = sorted(
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.lower().startswith("utm_") or k.lower() in TRACKING_EXACT)
    )
    query = urlencode(kept) if kept else ""
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def canonicalize_batch(t: pa.Table, url_col: str = "url",
                       out_col: str = "canon_url") -> pa.Table:
    """Append the canonical form of ``url_col`` as ``out_col``."""
    canon = [canonical_url(u or "") for u in t.column(url_col).to_pylist()]
    return t.append_column(out_col, pa.array(canon, pa.string()))


def dedup_by_canonical_url(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    order_col: str | None = None,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Keep ONE row per canonical URL: the one with the smallest
    (``order_col``, ``url_col``) — deterministic regardless of
    partitioning. ``order_col=None`` orders by the raw url alone (stable
    pick: the lexicographically-first crawl variant).

    The FULL row rides through the one key-bucketed exchange, so this is
    meant for narrow url-keyed rows (crawl frontiers, page metadata — the
    dedup-before-fetch layout). For T0 rows with html payloads, dedup the
    (url, order) projection first and apply the survivor set with the
    curate_pages broadcast/join pattern instead of shuffling payloads."""
    nb = num_buckets or bucket_count(ds.size_bytes(), floor=32)

    def tag(t: pa.Table) -> pa.Table:
        t = canonicalize_batch(t, url_col=url_col, out_col="__canon")
        b = (bucket_hash_strings(t.column("__canon"), salt=0x0C41) % nb).astype(
            "int32"
        )
        return t.append_column("bucket", pa.array(b, pa.int32()))

    order_cols = [order_col] if order_col else []

    def pick(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["bucket"])
        g = g.drop_columns(["bucket"])
        sort_keys = [("__canon", "ascending")] + [
            (c, "ascending") for c in order_cols + [url_col]
        ]
        g = g.sort_by(sort_keys)
        canon = np.asarray(g.column("__canon").to_pylist())
        _, starts = np.unique(canon, return_index=True)
        mask = np.zeros(len(canon), bool)
        mask[starts] = True
        return g.filter(pa.array(mask, pa.bool_()))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
        .map_batches(
            lambda t: t.drop_columns(["__canon"]), batch_format="pyarrow"
        )
    )


# --------------------------------------------------------- driver entries

URL_SITE_MOD = 7
URL_DUP_MOD = 50


def q_url_canonicalize(sf_dir: str):
    """SQL-oracled canonicalization parity: construct a deterministically
    MESSY absolute URL per document (upper-cased scheme/host, default
    port, tracking + unsorted params, fragment, trailing slash) and
    return its canonical form — the oracle states the closed-form
    expected string, so every spec rule is value-hash-checked."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        messy = [
            f"HTTPS://WWW.Site{int(i) % URL_SITE_MOD}.Example:443/a/p{int(i)}/"
            f"?utm_source=x&b=2&a=1#frag"
            for i in ids
        ]
        out = pa.table({"doc_id": t.column("doc_id")})
        out = out.append_column("url", pa.array(messy, pa.string()))
        return canonicalize_batch(out)

    return docs.map_batches(build, batch_format="pyarrow").select_columns(
        ["doc_id", "canon_url"]
    )


URL_CANONICALIZE_ORACLE_SQL = f"""
    -- closed-form canonical url: lowercased, :443 stripped, fragment and
    -- utm_source dropped, params sorted (a=1&b=2), trailing slash cut
    SELECT doc_id,
           'https://www.site' || CAST(doc_id % {URL_SITE_MOD} AS VARCHAR)
             || '.example/a/p' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
             AS canon_url
    FROM documents
"""


def q_dedup_urls(sf_dir: str):
    """SQL-oracled canonical-url dedup: ``URL_DUP_MOD`` crawl variants of
    each logical page (tracking params differ per doc) collapse to one
    canonical URL; keep the smallest doc_id per page."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        urls = [
            f"https://dup{int(i) % URL_DUP_MOD}.example/x?utm_campaign=c{int(i)}"
            for i in ids
        ]
        return pa.table(
            {"url": pa.array(urls, pa.string()), "doc_id": t.column("doc_id")}
        )

    deduped = dedup_by_canonical_url(
        docs.map_batches(build, batch_format="pyarrow"), order_col="doc_id"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canon_url": pa.array(
                    [canonical_url(u) for u in t.column("url").to_pylist()],
                    pa.string(),
                ),
                "doc_id": t.column("doc_id"),
            }
        )

    return deduped.map_batches(finish, batch_format="pyarrow")


DEDUP_URLS_ORACLE_SQL = f"""
    -- variants differ only in tracking params -> one row per canonical
    -- url, smallest doc_id wins
    SELECT 'https://dup' || CAST(doc_id % {URL_DUP_MOD} AS VARCHAR)
             || '.example/x' AS canon_url,
           MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY doc_id % {URL_DUP_MOD}
"""
