"""HTML table extraction — the WebTables-style structured-fact source
(Cafarella et al., VLDB 2008: relational tables embedded in web pages are
a prime KG input) plus schema.org JSON-LD blocks (the modern embedded
fact source). Operators over T0 pages:

- ``extract_tables_batch``: per-page parse of ``<table>`` markup into long
  form (url, table_idx, row_idx, col_idx, is_header, cell) — a stateless
  map_batches stage; html bytes never leave the map (same rule as link
  extraction in stages/links.py).
- ``table_facts``: the KG feed — tables whose FIRST row is all ``<th>``
  emit one (url, table_idx, row_idx, header, value) fact per data cell
  under its column header (the WebTables attribute-value reading).
- ``extract_jsonld_batch``: every ``<script type="application/ld+json">``
  block parsed and flattened to (path, kind, value) facts; malformed
  blocks surface as @error rows instead of vanishing.

Parse spec v1 (deterministic; the goldens pin it):
- INNERMOST tables only: a ``<table>`` whose body contains another
  ``<table`` is skipped and its inner tables are extracted instead (the
  standard WebTables simplification — outer "layout tables" wrap content
  tables and are noise for fact extraction).
- rows = closed ``<tr>..</tr>``, cells = closed ``<th>/<td>`` in row
  order; tags inside a cell strip to a space, the five XML entities plus
  ``&nbsp;`` unescape, whitespace collapses, ends trim.
- ``html`` decodes as UTF-8 with replacement (arbitrary page encodings
  cannot crash the stage).
- colspan/rowspan are NOT expanded — col_idx is the CELL ordinal, the
  honest grain for ragged real-world tables (documented limitation).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from pie_ray.util import stable_hash64

# a table whose body contains no nested "<table" — innermost-only rule
_TABLE_RE = re.compile(
    rb"<table[^>]*>((?:(?!<table[\s>]).)*?)</table\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TR_RE = re.compile(rb"<tr[^>]*>(.*?)</tr\s*>", re.IGNORECASE | re.DOTALL)
_CELL_RE = re.compile(
    rb"<(th|td)[^>]*>(.*?)</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = (
    (b"&nbsp;", b" "),
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # LAST: unescaping it first would double-decode
)

TABLE_CELLS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("table_idx", pa.int64()),
        ("row_idx", pa.int64()),
        ("col_idx", pa.int64()),
        ("is_header", pa.bool_()),
        ("cell", pa.string()),
    ]
)

TABLE_FACTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("table_idx", pa.int64()),
        ("row_idx", pa.int64()),
        ("header", pa.string()),
        ("value", pa.string()),
    ]
)


def _cell_text(raw: bytes) -> str:
    s = _TAG_RE.sub(b" ", raw)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    return _WS_RE.sub(" ", s.decode("utf-8", "replace")).strip()


def tables_in_html(html: bytes) -> list[list[list[tuple[bool, str]]]]:
    """All innermost tables of one page: per table a list of rows, per row
    a list of (is_header, cell_text)."""
    out = []
    for m in _TABLE_RE.finditer(html):
        rows = []
        for rm in _TR_RE.finditer(m.group(1)):
            rows.append(
                [
                    (tag.lower() == b"th", _cell_text(raw))
                    for tag, raw in _CELL_RE.findall(rm.group(1))
                ]
            )
        rows = [r for r in rows if r]
        if rows:
            out.append(rows)
    return out


def extract_tables_batch(t: pa.Table) -> pa.Table:
    """Stateless map_batches stage: T0-shaped batch (url, html, ...) ->
    long-form cells. Per-doc Python loop over a compiled-regex parse —
    the same cost shape as href extraction; bytes stay inside the map."""
    cols: dict[str, list] = {n: [] for n in TABLE_CELLS_SCHEMA.names}
    for url, html in zip(
        t.column("url").to_pylist(), t.column("html").to_pylist()
    ):
        for ti, rows in enumerate(tables_in_html(html or b"")):
            for ri, row in enumerate(rows):
                for ci, (is_h, text) in enumerate(row):
                    cols["url"].append(url)
                    cols["table_idx"].append(ti)
                    cols["row_idx"].append(ri)
                    cols["col_idx"].append(ci)
                    cols["is_header"].append(is_h)
                    cols["cell"].append(text)
    return pa.table(
        {n: pa.array(cols[n], TABLE_CELLS_SCHEMA.field(n).type) for n in cols},
        schema=TABLE_CELLS_SCHEMA,
    )


def facts_from_tables(tables: list[list[list[tuple[bool, str]]]]):
    """The header-row reading shared by the stage and the golden: tables
    whose first row is ALL <th> (and non-empty, with >= 1 data row) emit
    (table_idx, row_idx, header, value) per data cell under a header."""
    for ti, rows in enumerate(tables):
        head = rows[0]
        if not head or not all(h for h, _ in head) or len(rows) < 2:
            continue
        headers = [txt for _, txt in head]
        for ri, row in enumerate(rows[1:], start=1):
            for ci, (_, val) in enumerate(row):
                if ci < len(headers) and headers[ci]:
                    yield ti, ri, headers[ci], val


def extract_facts_batch(t: pa.Table) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in TABLE_FACTS_SCHEMA.names}
    for url, html in zip(
        t.column("url").to_pylist(), t.column("html").to_pylist()
    ):
        for ti, ri, header, value in facts_from_tables(
            tables_in_html(html or b"")
        ):
            cols["url"].append(url)
            cols["table_idx"].append(ti)
            cols["row_idx"].append(ri)
            cols["header"].append(header)
            cols["value"].append(value)
    return pa.table(
        {n: pa.array(cols[n], TABLE_FACTS_SCHEMA.field(n).type) for n in cols},
        schema=TABLE_FACTS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# deterministic table corpus + goldens (the synthetic T0 pages carry no
# <table> markup — golden byte-identity freezes them — so table entries run
# over their own generated corpus, like the media entries)
# ---------------------------------------------------------------------------

_HEADERS = ["name", "city", "email", "amount", "year", "dept"]
_NAMES = ["Alice Smith", "Bob O'Neil", "Chen Wei", "Dana Fox", "Eve Stone"]
_CITIES = ["Portland", "Austin", "Leeds", "Kyoto", "Tromsø"]


def _synth_tables_for_page(i: int) -> tuple[bytes, list, int]:
    """HTML + ground-truth tables for page ``i`` (pure function of i).
    Every 9th page has NO table; every 7th page wraps its first table in
    an outer layout table (innermost-only rule: the goldens expect just
    the inner one)."""
    rng = np.random.default_rng(stable_hash64(f"tables|{i}") & 0xFFFFFFFF)
    if i % 9 == 4:
        return b"<html><body><p>no tabular data here</p></body></html>", [], 0
    n_tables = 1 + int(rng.integers(0, 2))
    truth: list[list[list[tuple[bool, str]]]] = []
    parts: list[bytes] = [b"<html><body>"]
    for j in range(n_tables):
        ncols = 2 + int(rng.integers(0, 3))
        nrows = 2 + int(rng.integers(0, 4))
        headers = [_HEADERS[(i + j + c) % len(_HEADERS)] for c in range(ncols)]
        rows: list[list[tuple[bool, str]]] = [[(True, h) for h in headers]]
        html_rows = [
            b"<TR>"
            + b"".join(
                b'<TH class="hd"> %s </TH>' % h.encode() for h in headers
            )
            + b"</TR>"
        ]
        for r in range(1, nrows):
            row: list[tuple[bool, str]] = []
            html_cells: list[bytes] = []
            for c in range(ncols):
                h = headers[c]
                if h == "name":
                    v = _NAMES[int(rng.integers(0, len(_NAMES)))]
                    cell = b"<b>" + v.replace("'", "&#39;").encode() + b"</b>"
                elif h == "city":
                    v = _CITIES[int(rng.integers(0, len(_CITIES)))]
                    cell = v.encode("utf-8")
                elif h == "email":
                    v = f"user{int(rng.integers(1, 99))}@mail{j}.example"
                    cell = b'<a href="mailto:x">' + v.encode() + b"</a>"
                elif h == "amount":
                    v = f"{int(rng.integers(1, 9000))} & {int(rng.integers(1, 99))}"
                    cell = v.replace("&", "&amp;").encode()
                elif h == "year":
                    v = str(1990 + int(rng.integers(0, 35)))
                    cell = b"\n  " + v.encode() + b"\t "
                else:
                    v = ""
                    cell = b"&nbsp;"
                row.append((False, v))
                html_cells.append(b"<td>" + cell + b"</td>")
            rows.append(row)
            html_rows.append(b"<tr>" + b"".join(html_cells) + b"</tr>")
        body = b"<table border=1>" + b"".join(html_rows) + b"</table>"
        if j == 0 and i % 7 == 3:
            body = (
                b"<table class=layout><tr><td>" + body + b"</td></tr></table>"
            )
        parts.append(body)
        truth.append(rows)
    parts.append(b"</body></html>")
    return b"".join(parts), truth, n_tables


def table_page_url(i: int) -> str:
    return f"https://tables{i % 7}.example/t{i}"


def synth_table_pages(n: int = 40):
    """Dataset of (url, html) pages with embedded tables."""
    import ray.data

    rows = {"url": [], "html": []}
    for i in range(n):
        html, _, _ = _synth_tables_for_page(i)
        rows["url"].append(table_page_url(i))
        rows["html"].append(html)
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "html": pa.array(rows["html"], pa.binary()),
            }
        )
    )


def golden_table_cells(n: int = 40) -> list[tuple]:
    out = []
    for i in range(n):
        _, truth, _ = _synth_tables_for_page(i)
        for ti, rows in enumerate(truth):
            for ri, row in enumerate(rows):
                for ci, (is_h, text) in enumerate(row):
                    out.append((table_page_url(i), ti, ri, ci, is_h, text))
    return out


def golden_table_facts(n: int = 40) -> list[tuple]:
    out = []
    for i in range(n):
        _, truth, _ = _synth_tables_for_page(i)
        for ti, ri, header, value in facts_from_tables(truth):
            out.append((table_page_url(i), ti, ri, header, value))
    return out


TABLES_N_PAGES = 40


def q_html_tables(sf_dir: str):
    """Driver entry (VALUES-golden oracled): long-form cells of every
    table in the deterministic corpus (sf_dir unused — the frozen synth
    pages carry no table markup, so this runs its own generated pages,
    the media-entry pattern)."""
    return synth_table_pages(TABLES_N_PAGES).map_batches(
        extract_tables_batch, batch_format="pyarrow"
    )


def q_table_facts(sf_dir: str):
    """Driver entry (VALUES-golden oracled): the WebTables header-row
    facts of the same corpus — the structured-fact KG feed."""
    return synth_table_pages(TABLES_N_PAGES).map_batches(
        extract_facts_batch, batch_format="pyarrow"
    )


def _typed_values_sql(rows: list[tuple], cols: list[str], types: list[str]) -> str:
    """Literal-VALUES golden with per-column CASTs (ints must land BIGINT
    — bare VALUES literals infer INT32 and would schema-mismatch)."""

    def lit(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    vals = ",\n".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    cl = ", ".join(cols)
    sel = ", ".join(f"CAST({c} AS {ty}) AS {c}" for c, ty in zip(cols, types))
    return f"SELECT {sel} FROM (VALUES\n{vals}\n) AS t({cl})"


def html_tables_oracle_sql(n: int = TABLES_N_PAGES) -> str:
    return _typed_values_sql(
        sorted(golden_table_cells(n)),
        ["url", "table_idx", "row_idx", "col_idx", "is_header", "cell"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BOOLEAN", "VARCHAR"],
    )


def table_facts_oracle_sql(n: int = TABLES_N_PAGES) -> str:
    return _typed_values_sql(
        sorted(golden_table_facts(n)),
        ["url", "table_idx", "row_idx", "header", "value"],
        ["VARCHAR", "BIGINT", "BIGINT", "VARCHAR", "VARCHAR"],
    )


# ---------------------------------------------------------------------------
# JSON-LD structured data — the modern web-KG fact source (schema.org
# embedded as <script type="application/ld+json"> blocks; W3C JSON-LD 1.1)
# ---------------------------------------------------------------------------

_JSONLD_RE = re.compile(
    rb"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script\s*>",
    re.IGNORECASE | re.DOTALL,
)

JSONLD_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("block_idx", pa.int64()),
        ("path", pa.string()),
        ("kind", pa.string()),  # string | number | bool | null | error
        ("value", pa.string()),
    ]
)


def flatten_jsonld(obj, prefix: str = "$"):
    """Flatten spec v1 (pinned by the goldens): dict keys append ``.key``,
    list items append ``[i]``, scalars emit (path, kind, canonical text).
    Numbers canonicalize via repr of the parsed value (ints stay ints —
    json gives int for integer literals), bools lowercase, null empty."""
    if isinstance(obj, dict):
        for k in sorted(obj):
            yield from flatten_jsonld(obj[k], f"{prefix}.{k}")
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from flatten_jsonld(v, f"{prefix}[{i}]")
    elif isinstance(obj, bool):
        yield prefix, "bool", "true" if obj else "false"
    elif obj is None:
        yield prefix, "null", ""
    elif isinstance(obj, (int, float)):
        yield prefix, "number", repr(obj)
    else:
        yield prefix, "string", str(obj)


def jsonld_blocks(html: bytes):
    """(block_idx, parsed-or-None, error-name) per ld+json script block.
    Malformed JSON never crashes the stage — it surfaces as an @error row
    (no-silent-drops rule: a curator must SEE broken markup counts)."""
    import json

    for bi, m in enumerate(_JSONLD_RE.finditer(html)):
        raw = m.group(1).decode("utf-8", "replace").strip()
        try:
            yield bi, json.loads(raw), None
        except ValueError as e:
            yield bi, None, type(e).__name__


def extract_jsonld_batch(t: pa.Table) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in JSONLD_SCHEMA.names}

    def emit(url, bi, path, kind, value):
        cols["url"].append(url)
        cols["block_idx"].append(bi)
        cols["path"].append(path)
        cols["kind"].append(kind)
        cols["value"].append(value)

    for url, html in zip(
        t.column("url").to_pylist(), t.column("html").to_pylist()
    ):
        for bi, obj, err in jsonld_blocks(html or b""):
            if err is not None:
                emit(url, bi, "$", "error", err)
                continue
            for path, kind, value in flatten_jsonld(obj):
                emit(url, bi, path, kind, value)
    return pa.table(
        {n: pa.array(cols[n], JSONLD_SCHEMA.field(n).type) for n in cols},
        schema=JSONLD_SCHEMA,
    )


_JSONLD_TYPES = ["Person", "Organization", "Article", "Product"]


def _synth_jsonld_for_page(i: int) -> tuple[bytes, list]:
    """HTML + ground-truth (block objects | 'BROKEN') for page ``i``.
    Every 8th page carries no block; every 11th carries a malformed one
    (truth records the json.loads error the engine must surface)."""
    rng = np.random.default_rng(stable_hash64(f"jsonld|{i}") & 0xFFFFFFFF)
    if i % 8 == 5:
        return b"<html><body><p>plain page</p></body></html>", []
    import json

    blocks: list = []
    parts = [b"<html><head>"]
    n_blocks = 1 + int(rng.integers(0, 2))
    for j in range(n_blocks):
        if i % 11 == 7 and j == 0:
            parts.append(
                b'<script type="application/ld+json">{not valid json]</script>'
            )
            blocks.append("BROKEN")
            continue
        t = _JSONLD_TYPES[int(rng.integers(0, len(_JSONLD_TYPES)))]
        obj = {
            "@context": "https://schema.org",
            "@type": t,
            "name": f"{t} {i}-{j} été",
            "identifier": int(rng.integers(1000, 9999)),
            "rating": round(float(rng.integers(10, 50)) / 10.0, 1),
            "active": bool(rng.integers(0, 2)),
            "parent": None,
            "tags": [f"t{int(rng.integers(0, 9))}", f"t{int(rng.integers(10, 19))}"],
            "address": {"city": f"City{int(rng.integers(0, 5))}", "zip": f"{int(rng.integers(10000, 99999))}"},
        }
        if j == 1:
            obj = {"@graph": [obj, {"@type": "WebSite", "name": f"site{i}"}]}
        blocks.append(obj)
        parts.append(
            b'<script type="application/ld+json">\n'
            + json.dumps(obj, ensure_ascii=(i % 2 == 0)).encode("utf-8")
            + b"\n</script>"
        )
    parts.append(b"</head><body>content</body></html>")
    return b"".join(parts), blocks


def synth_jsonld_pages(n: int = 40):
    import ray.data

    rows = {"url": [], "html": []}
    for i in range(n):
        html, _ = _synth_jsonld_for_page(i)
        rows["url"].append(table_page_url(i))
        rows["html"].append(html)
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "html": pa.array(rows["html"], pa.binary()),
            }
        )
    )


def golden_jsonld_facts(n: int = 40) -> list[tuple]:
    out = []
    for i in range(n):
        _, blocks = _synth_jsonld_for_page(i)
        for bi, obj in enumerate(blocks):
            if obj == "BROKEN":
                out.append((table_page_url(i), bi, "$", "error", "JSONDecodeError"))
                continue
            for path, kind, value in flatten_jsonld(obj):
                out.append((table_page_url(i), bi, path, kind, value))
    return out


def q_jsonld_facts(sf_dir: str):
    """Driver entry (VALUES-golden oracled): flattened schema.org facts
    from every ld+json block of the deterministic corpus, malformed
    blocks surfaced as @error rows."""
    return synth_jsonld_pages(TABLES_N_PAGES).map_batches(
        extract_jsonld_batch, batch_format="pyarrow"
    )


def jsonld_oracle_sql(n: int = TABLES_N_PAGES) -> str:
    return _typed_values_sql(
        sorted(golden_jsonld_facts(n)),
        ["url", "block_idx", "path", "kind", "value"],
        ["VARCHAR", "BIGINT", "VARCHAR", "VARCHAR", "VARCHAR"],
    )
