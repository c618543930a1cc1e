"""A3/A5 — deterministic HTML → text boilerplate stripper (STRIPPER SPEC v1).

This function is the engine's per-row invariant surface: the north star
requires "byte-identical extracted text per url" (BASELINE.json north_star /
input_hint; reference checkout empty — SURVEY.md §0). The operative contract:
``html_to_text`` is a FROZEN pure function of the ``html`` bytes — identical
output across runs, batch boundaries, and parallelism levels, locked by
golden ``(url, sha256)`` fixtures in tests/. Never "improve" it silently;
a change requires bumping STRIPPER_SPEC_VERSION and regenerating goldens.

Spec v1 (applied in this exact order):
 1. Decode bytes: UTF-8 strict; on failure latin-1 (never fails).
 2. Remove HTML comments ``<!-- ... -->`` (non-greedy, dotall).
 3. Remove ``<script>/<style>/<template>/<noscript>`` elements entirely
    (case-insensitive, attributes allowed, non-greedy, dotall).
 4. Replace inline-level tags (INLINE_TAGS) with the empty string; replace
    every other tag (including ``<br>``) with a single newline.
 5. Decode entities: named (amp lt gt quot apos nbsp) and numeric
    (``&#123;`` / ``&#x1F;``); ``&nbsp;`` becomes a plain space. ``&amp;``
    is resolved last so double-escaped text is not double-decoded.
 6. Unicode NFC normalization; zero-width chars (U+200B/C/D, U+FEFF) removed.
 7. Whitespace canonicalization: CR removed; tabs/form-feeds to spaces;
    runs of spaces collapsed to one; spaces adjacent to newlines removed;
    runs of newlines collapsed to one; leading/trailing whitespace stripped.

The stage itself is a stateless ``map_batches`` (Arrow in / Arrow out); the
per-row loop is unavoidable string work but each row's work is C-speed regex.
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

from pie_ray import schemas
from pie_ray.util import sha256_hex

STRIPPER_SPEC_VERSION = 1

# Inline (phrasing) tags whose removal must NOT split a token/PII span.
INLINE_TAGS = (
    "a|abbr|b|bdi|bdo|cite|code|data|dfn|em|i|kbd|mark|q|s|samp|small|span|"
    "strong|sub|sup|time|u|var|wbr"
)

_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_BLOCK_DROP_RE = re.compile(
    rb"<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_INLINE_TAG_RE = re.compile(
    r"</?(?:%s)(?:\s[^>]*)?/?>" % INLINE_TAGS, re.IGNORECASE
)
_OTHER_TAG_RE = re.compile(r"<[a-zA-Z/!][^>]*>")
_NUM_ENTITY_RE = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
_ZERO_WIDTH_RE = re.compile("[\\u200b\\u200c\\u200d\\ufeff]")
_SPACE_RUN_RE = re.compile(r" {2,}")
_SPACE_NL_RE = re.compile(r" *\n *")
_NL_RUN_RE = re.compile(r"\n{2,}")

_NAMED_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                   ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "))


def _decode_num_entity(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
    except ValueError:
        pass
    return m.group(0)


def html_to_text(html: bytes) -> str:
    """FROZEN stripper spec v1 — see module docstring. Pure function."""
    if html is None:
        return ""
    # 1. decode
    # 2-3. byte-level removals (before decode would also work; spec says on
    # bytes for comments/blocks so malformed encodings cannot shift matches).
    html = _COMMENT_RE.sub(b"", html)
    html = _BLOCK_DROP_RE.sub(b"", html)
    try:
        text = html.decode("utf-8")
    except UnicodeDecodeError:
        text = html.decode("latin-1")
    # 4. tags
    text = _INLINE_TAG_RE.sub("", text)
    text = _OTHER_TAG_RE.sub("\n", text)
    # 5. entities (numeric first, &amp; last)
    text = _NUM_ENTITY_RE.sub(_decode_num_entity, text)
    for ent, ch in _NAMED_ENTITIES:
        text = text.replace(ent, ch)
    text = text.replace("&amp;", "&")
    # 6. normalize
    text = unicodedata.normalize("NFC", text)
    text = _ZERO_WIDTH_RE.sub("", text)
    # 7. whitespace
    text = text.replace("\r", "")
    text = text.replace("\t", " ").replace("\f", " ").replace("\v", " ")
    text = _SPACE_RUN_RE.sub(" ", text)
    text = _SPACE_NL_RE.sub("\n", text)
    text = _NL_RUN_RE.sub("\n", text)
    return text.strip()


def extract_batch(batch: pa.Table, langs: tuple[str, ...] | None = None) -> pa.Table:
    """T0 pages -> T1 extracted. Stateless map_batches body (Arrow in/out).

    ``langs`` applies the A4 language filter INSIDE this map (a standalone
    Filter op would break operator fusion into the downstream NER actor
    pool, leaving the upstream generator/reader starved of CPUs behind the
    pool's reservation). Drops the wide ``html`` binary column immediately
    (it dominates bytes; keeping it would blow up downstream object-store
    usage — SURVEY.md §4).
    """
    if langs is not None:
        batch = batch.filter(pc.is_in(batch.column("lang"), value_set=pa.array(langs)))
    html_col = batch.column("html")
    texts = [html_to_text(v) for v in html_col.to_pylist()]
    hashes = [sha256_hex(t) for t in texts]
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "text": pa.array(texts, type=pa.string()),
            "lang": batch.column("lang"),
            "text_sha256": pa.array(hashes, type=pa.string()),
        },
        schema=schemas.EXTRACTED,
    )


def lang_filter_expr(allowed: tuple[str, ...] = ("en",)):
    """A4 — predicate for read-time pushdown: pc.field('lang').isin(...)."""
    return pc.field("lang").isin(list(allowed))
