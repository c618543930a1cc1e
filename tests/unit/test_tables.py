"""HTML table extraction: parse-spec hazards, golden parity, the
header-row fact reading, and partition independence."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from pie_ray.stages import tables as T


def test_hazards_parse_to_spec():
    html = (
        b"<html><TABLE id=x><TR><TH> Name </TH><th>City</th></TR>"
        b"<tr><td><b>Bob &amp; Co</b></td><td>\n Leeds \t</td></tr>"
        b"<tr><td>&#39;q&#39;</td><td>&nbsp;</td></tr></TABLE>"
        b"<p>between</p>"
        b"<table><tr><td>solo</td></tr></table></html>"
    )
    got = T.tables_in_html(html)
    assert got == [
        [
            [(True, "Name"), (True, "City")],
            [(False, "Bob & Co"), (False, "Leeds")],
            [(False, "'q'"), (False, "")],
        ],
        [[(False, "solo")]],
    ]


def test_nested_tables_innermost_only():
    html = (
        b"<table class=layout><tr><td>"
        b"<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"
        b"</td></tr></table>"
    )
    assert T.tables_in_html(html) == [[[(True, "h")], [(False, "v")]]]


def test_invalid_utf8_and_empty_are_safe():
    assert T.tables_in_html(b"") == []
    got = T.tables_in_html(b"<table><tr><td>\xff\xfe ok</td></tr></table>")
    assert got[0][0][0][0] is False and got[0][0][0][1].endswith("ok")


def test_facts_require_full_header_row():
    rows_ok = [[(True, "a"), (True, "b")], [(False, "1"), (False, "2")]]
    assert list(T.facts_from_tables([rows_ok])) == [
        (0, 1, "a", "1"),
        (0, 1, "b", "2"),
    ]
    # mixed first row, header-only table, ragged data row
    mixed = [[(True, "a"), (False, "b")], [(False, "1"), (False, "2")]]
    assert list(T.facts_from_tables([mixed])) == []
    assert list(T.facts_from_tables([[[(True, "a")]]])) == []
    ragged = [[(True, "a"), (True, "b")], [(False, "1")]]
    assert list(T.facts_from_tables([ragged])) == [(0, 1, "a", "1")]


def test_golden_parity_and_partition_independence(ray_session):
    cols = ["url", "table_idx", "row_idx", "col_idx", "is_header", "cell"]
    want = sorted(T.golden_table_cells(T.TABLES_N_PAGES))
    for nb in (1, 11):
        ds = T.synth_table_pages(T.TABLES_N_PAGES).repartition(nb)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in ds.map_batches(
                T.extract_tables_batch, batch_format="pyarrow"
            ).take_all()
        )
        assert got == want and len(got) > 400


def test_facts_golden_parity(ray_session):
    cols = ["url", "table_idx", "row_idx", "header", "value"]
    got = sorted(
        tuple(r[c] for c in cols) for r in T.q_table_facts("x").take_all()
    )
    assert got == sorted(T.golden_table_facts(T.TABLES_N_PAGES))
    assert len(got) > 300


def test_corpus_has_the_hazard_pages():
    # the generator must keep exercising: a no-table page, a nested
    # layout-table page, and empty cells
    n = T.TABLES_N_PAGES
    assert any(
        not T._synth_tables_for_page(i)[1] for i in range(n)
    )
    nested = [i for i in range(n) if i % 7 == 3 and i % 9 != 4]
    assert nested
    cells = T.golden_table_cells(n)
    assert any(c[5] == "" for c in cells)


class TestJsonLd:
    def test_flatten_spec(self):
        got = list(
            T.flatten_jsonld(
                {
                    "b": [1, {"x": None}],
                    "a": True,
                    "r": 4.5,
                    "s": "é t",
                }
            )
        )
        assert got == [
            ("$.a", "bool", "true"),
            ("$.b[0]", "number", "1"),
            ("$.b[1].x", "null", ""),
            ("$.r", "number", "4.5"),
            ("$.s", "string", "é t"),
        ]

    def test_blocks_parse_and_errors_surface(self):
        html = (
            b'<script type="application/ld+json">{"@type": "Person"}</script>'
            b'<script type="text/javascript">ignored()</script>'
            b'<SCRIPT TYPE="application/ld+json">{broken</SCRIPT>'
        )
        got = list(T.jsonld_blocks(html))
        assert got[0] == (0, {"@type": "Person"}, None)
        assert got[1][0] == 1 and got[1][1] is None
        assert got[1][2] == "JSONDecodeError"

    def test_golden_parity_and_partition_independence(self, ray_session):
        cols = ["url", "block_idx", "path", "kind", "value"]
        want = sorted(T.golden_jsonld_facts(T.TABLES_N_PAGES))
        for nb in (1, 9):
            ds = T.synth_jsonld_pages(T.TABLES_N_PAGES).repartition(nb)
            got = sorted(
                tuple(r[c] for c in cols)
                for r in ds.map_batches(
                    T.extract_jsonld_batch, batch_format="pyarrow"
                ).take_all()
            )
            assert got == want and len(got) > 400
        # hazard coverage: error rows, @graph nesting, unicode, no-block pages
        assert any(r[3] == "error" for r in want)
        assert any("@graph" in r[2] for r in want)
        assert any("été" in r[4] for r in want)
