"""Stripper spec v1 goldens: hand-written micro-fixtures (non-circular) and
committed corpus hashes (freeze the spec across refactors)."""

import json
import pathlib

import pytest

from pie_ray.sources.synth import gen_page
from pie_ray.stages.extract import html_to_text
from pie_ray.util import sha256_hex

FIX = pathlib.Path(__file__).resolve().parent.parent / "fixtures"

# (name, html bytes, expected stripped text) — expected values are the SPEC.
MICRO_CASES = [
    ("plain", b"<p>hello world</p>", "hello world"),
    ("title_body", b"<html><head><title>T</title></head><body>x</body></html>", "T\nx"),
    ("script_dropped", b"<p>a</p><script>var x = '<b>no</b>';</script><p>b</p>", "a\nb"),
    ("style_dropped", b"<p>a</p><style>p { color: red }</style><p>b</p>", "a\nb"),
    ("noscript_dropped", b"<noscript>enable js</noscript><p>a</p>", "a"),
    ("comment_dropped", b"<p>a<!-- hidden --> b</p>", "a b"),
    ("inline_kept_inline", b"<p>John <b>Smith</b> rocks</p>", "John Smith rocks"),
    ("block_breaks", b"<div>a</div><div>b</div>", "a\nb"),
    ("br_breaks", b"line1<br>line2", "line1\nline2"),
    ("named_entities", b"a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;", 'a & b <tag> "q" \'s\''),
    ("numeric_entities", b"x &#65;&#x42; y", "x AB y"),
    ("nbsp_space", b"a&nbsp;&nbsp;b", "a b"),
    ("double_escape_safe", b"&amp;lt;", "&lt;"),
    ("ws_collapse", b"a   b\t\tc", "a b c"),
    ("nl_collapse", b"<p>a</p>\n\n\n<p>b</p>", "a\nb"),
    ("latin1_fallback", "caf\xe9".encode("latin-1"), "café"),
    ("utf8_first", "café".encode("utf-8"), "café"),
    ("zero_width_removed", "a​b﻿c".encode("utf-8"), "abc"),
    ("malformed_unclosed", b"<div><p>a<p>b", "a\nb"),
    ("empty", b"", ""),
    ("attrs_in_tags", b'<a href="x.html" class=\'y\'>link</a> <img src="z.png">', "link"),
    ("case_insensitive_script", b"<SCRIPT>x</SCRIPT><P>a</P>", "a"),
    ("crlf", b"a\r\nb", "a\nb"),
]


@pytest.mark.parametrize("name,html,expected", MICRO_CASES, ids=[c[0] for c in MICRO_CASES])
def test_micro_fixture(name, html, expected):
    assert html_to_text(html) == expected


def test_golden_corpus_hashes():
    """Byte-identity invariant: per-url sha256 of stripped text is frozen."""
    golden = json.loads((FIX / "golden_text.json").read_text())
    for i in range(200):
        rec, _ = gen_page(i)
        assert sha256_hex(html_to_text(rec["html"])) == golden[rec["url"]], rec["url"]


def test_pure_function_stability():
    rec, _ = gen_page(7)
    assert html_to_text(rec["html"]) == html_to_text(rec["html"])
