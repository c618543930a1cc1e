"""Page-STRUCTURE quality features over T0 pages — the third leg of the
curation triad: curate_corpus* scores the extracted TEXT, curate_pages
scores the SOURCE host (link-graph prior), this scores the PAGE MARKUP.
RefinedWeb/C4-style structural gates live here: a page whose characters
are mostly anchor text is navigation/boilerplate, a page with almost no
text per HTML byte is markup soup — both are cut before any text-side
compute is spent on them.

All features are exact int64 (counts + millionths-scaled ratios), so
results are bit-identical across partitionings and the gates are pure
integer comparisons:

- ``html_bytes``, ``text_chars``, ``n_links``, ``n_tags``,
  ``anchor_chars`` (visible anchor-text chars, stripper-free);
- ``text_to_html_q`` = text_chars * 1e6 // max(html_bytes, 1) — markup
  soup scores low;
- ``link_density_q`` = anchor_chars * 1e6 // max(text_chars, 1) —
  navigation pages score high.

Scale shape: one stateless ``map_batches`` pass, bytes-level compiled
regexes per document (the repo's accepted doc-granular cost shape); the
html payload never leaves the map. The gate is a fused filter — no
shuffle anywhere."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from pie_ray.stages.links import _HREF_RE, _TAG_RE

_LT_RE = re.compile(rb"<[a-zA-Z/!]")
_A_OPEN_RE = re.compile(rb"<a[\s>]", re.IGNORECASE)
_A_CLOSE_RE = re.compile(rb"</a\s*>", re.IGNORECASE)


def _anchor_stats(html: bytes) -> tuple[int, int]:
    """(closed anchors, visible anchor chars) by a LINEAR two-pointer scan
    over open/close tag positions — anchors of ANY inner length count
    (links.py's bounded _ANCHOR_RE is for anchor NAMES; density must see
    the full navigation chrome a >4 KiB anchor body wraps), and unclosed
    <a> tags cost O(1) instead of a backtracking scan to end-of-doc (they
    contribute no text; the href count below still sees them)."""
    n = 0
    chars = 0
    closes = [m.start() for m in _A_CLOSE_RE.finditer(html)]
    ci = 0
    for m in _A_OPEN_RE.finditer(html):
        gt = html.find(b">", m.start())
        if gt == -1:
            break
        while ci < len(closes) and closes[ci] < gt:
            ci += 1
        if ci >= len(closes):
            break
        inner = html[gt + 1 : closes[ci]]
        text = _TAG_RE.sub(b" ", inner).decode("utf-8", errors="replace")
        chars += len(" ".join(text.split()))
        n += 1
        ci += 1
    return n, chars

RATIO_SCALE = 1_000_000
PAGEQ_DROP_BROADCAST_LIMIT = 2_000_000


def page_feature_batch(t: pa.Table) -> pa.Table:
    """(url, html, text) -> per-page structural feature row."""
    urls = t.column("url").to_pylist()
    htmls = t.column("html").to_pylist()
    texts = (
        t.column("text").to_pylist() if "text" in t.column_names else [""] * len(urls)
    )
    n = len(urls)
    html_bytes = np.zeros(n, np.int64)
    text_chars = np.zeros(n, np.int64)
    n_links = np.zeros(n, np.int64)
    n_tags = np.zeros(n, np.int64)
    anchor_chars = np.zeros(n, np.int64)
    for i, (html, text) in enumerate(zip(htmls, texts)):
        if html is None:
            continue
        html_bytes[i] = len(html)
        text_chars[i] = len(text or "")
        n_tags[i] = len(_LT_RE.findall(html))
        # links counted by href (sees unclosed anchors too); anchor text
        # measured by the linear any-length scan
        n_links[i] = len(_HREF_RE.findall(html))
        _, anchor_chars[i] = _anchor_stats(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html_bytes": pa.array(html_bytes, pa.int64()),
            "text_chars": pa.array(text_chars, pa.int64()),
            "n_links": pa.array(n_links, pa.int64()),
            "n_tags": pa.array(n_tags, pa.int64()),
            "anchor_chars": pa.array(anchor_chars, pa.int64()),
            "text_to_html_q": pa.array(
                text_chars * RATIO_SCALE // np.maximum(html_bytes, 1), pa.int64()
            ),
            "link_density_q": pa.array(
                anchor_chars * RATIO_SCALE // np.maximum(text_chars, 1), pa.int64()
            ),
        }
    )


def page_features(pages_ds) -> "object":
    """Feature Dataset over T0 pages (one stateless pass)."""
    return pages_ds.map_batches(page_feature_batch, batch_format="pyarrow")


def filter_by_page_quality(
    pages_ds,
    max_link_density_q: int = RATIO_SCALE // 2,
    min_text_to_html_q: int = RATIO_SCALE // 100,
):
    """Structural gate over T0 pages: drop navigation-heavy pages
    (anchor chars > ``max_link_density_q``/1e6 of text chars) and markup
    soup (text chars < ``min_text_to_html_q``/1e6 of html bytes). Fused
    stateless filter; ONE regex sweep total on the common path — the
    features pass (narrow rows, html stays in the map) yields both the
    per-reason counts AND the drop-url set, which ships as a broadcast
    anti-membership filter under ``PAGEQ_DROP_BROADCAST_LIMIT`` dropped
    pages (drop sets are minority-sized by construction — a gate that
    drops most of the corpus is misconfigured); past the limit the gate
    falls back to recomputing features per batch (a second regex sweep,
    no driver state). The url is the page identity here, as everywhere in
    T0. Returns (kept_ds, report) with exact kept/dropped counts per
    reason (no-silent-drops rule)."""
    import ray

    feats = page_features(pages_ds).materialize()  # narrow rows, no html
    n_pages = feats.count()
    nav = feats.filter(expr=f"link_density_q > {max_link_density_q}").count()
    soup = feats.filter(expr=f"text_to_html_q < {min_text_to_html_q}").count()

    def drop_urls(t: pa.Table) -> pa.Table:
        ld = t.column("link_density_q").to_numpy(zero_copy_only=False)
        th = t.column("text_to_html_q").to_numpy(zero_copy_only=False)
        bad = pa.array((ld > max_link_density_q) | (th < min_text_to_html_q))
        # the drop KEY is (url, html_bytes, text_chars) — both extras are
        # O(1) lengths recomputable in keep_batch without a regex sweep,
        # and they distinguish same-url recrawls with different content
        # so a bad copy never drags its good twin down. Known edge: the
        # lengths are a proxy, not a content hash — a same-url recrawl
        # whose content DIFFERS but whose html/text byte lengths both
        # collide with a gated copy is dropped with it (conservative: a
        # good page is lost, never a bad one kept); a full discriminator
        # would need a content digest in the feature row, which the
        # public page_features schema deliberately omits
        return pa.table(
            {
                "url": t.column("url").filter(bad),
                "hb": t.column("html_bytes").filter(bad),
                "tc": t.column("text_chars").filter(bad),
            }
        )

    drop_ds = feats.map_batches(drop_urls, batch_format="pyarrow").materialize()
    n_drop = drop_ds.count()

    if n_drop <= PAGEQ_DROP_BROADCAST_LIMIT:
        bad_ref = ray.put(
            frozenset(
                (u, hb, tc)
                for b in drop_ds.iter_batches(
                    batch_format="pyarrow", batch_size=65536
                )
                for u, hb, tc in zip(
                    b.column("url").to_pylist(),
                    b.column("hb").to_pylist(),
                    b.column("tc").to_pylist(),
                )
            )
        )

        def keep_batch(t: pa.Table) -> pa.Table:
            bad = ray.get(bad_ref)
            urls = t.column("url").to_pylist()
            htmls = t.column("html").to_pylist()
            texts = (
                t.column("text").to_pylist()
                if "text" in t.column_names
                else [""] * len(urls)
            )
            # mirror page_feature_batch exactly: a null-html row scores
            # (0, 0) there (its text is never measured), so key it (0, 0)
            mask = [
                ((u, 0, 0) if h is None else (u, len(h), len(x or ""))) not in bad
                for u, h, x in zip(urls, htmls, texts)
            ]
            return t.filter(pa.array(mask, pa.bool_()))

    else:  # fallback: recompute features per batch (second regex sweep)

        def keep_batch(t: pa.Table) -> pa.Table:
            f = page_feature_batch(t)
            ld = f.column("link_density_q").to_numpy(zero_copy_only=False)
            th = f.column("text_to_html_q").to_numpy(zero_copy_only=False)
            keep = (ld <= max_link_density_q) & (th >= min_text_to_html_q)
            return t.filter(pa.array(keep, pa.bool_()))

    kept = pages_ds.map_batches(keep_batch, batch_format="pyarrow").materialize()
    n_kept = kept.count()
    report = {
        "n_pages": n_pages,
        "n_kept": n_kept,
        "n_dropped": n_pages - n_kept,
        "n_nav_heavy": nav,
        "n_markup_soup": soup,
        "max_link_density_q": max_link_density_q,
        "min_text_to_html_q": min_text_to_html_q,
    }
    return kept, report


def q_page_features(sf_dir: str):
    """Driver entry (rows-only — html structure is not SQL-expressible):
    structural features of the extracted KG corpus, sorted by url."""
    from pie_ray.sources.synth import synth_pages
    from pie_ray.stages.extract import extract_batch
    from pie_ray.util import gather_table

    def with_text(t: pa.Table) -> pa.Table:
        # extract_batch is row-aligned with langs=None and drops html —
        # re-attach the raw markup so both sides of the ratios are real
        ext = extract_batch(t)
        return pa.table(
            {
                "url": ext.column("url"),
                "html": t.column("html"),
                "text": ext.column("text"),
            }
        )

    pages = synth_pages(600).map_batches(with_text, batch_format="pyarrow")
    tbl = gather_table(
        page_features(pages),
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("html_bytes", pa.int64()),
                ("text_chars", pa.int64()),
                ("n_links", pa.int64()),
                ("n_tags", pa.int64()),
                ("anchor_chars", pa.int64()),
                ("text_to_html_q", pa.int64()),
                ("link_density_q", pa.int64()),
            ]
        ),
    )
    return tbl.sort_by([("url", "ascending")])
