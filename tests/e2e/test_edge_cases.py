"""Degenerate-input robustness: the pipeline must produce empty-but-valid
results (not crash) on empty or fully-filtered corpora, and NER offsets must
stay in-range on arbitrary unicode."""

from __future__ import annotations

import pytest


def test_pipeline_on_non_english_only(ray_session):
    """All pages filtered out by the lang filter -> 0 triples, no crash."""
    import pyarrow as pa
    import ray.data

    from pie_ray import schemas
    from pie_ray.pipelines.kg import KgConfig, build_triples
    from pie_ray.sources.synth import pages_table

    t = pages_table(range(40))
    mask = pa.compute.equal(t.column("lang"), "zh")
    zh_only = t.filter(mask)
    if zh_only.num_rows == 0:
        pytest.skip("seeded corpus slice has no zh pages")
    ds = ray.data.from_arrow(zh_only)
    out = build_triples(ds, KgConfig(langs=("en",)))
    assert out.count() == 0


def test_pipeline_on_empty_corpus(ray_session):
    import ray.data

    from pie_ray import schemas
    from pie_ray.pipelines.kg import KgConfig, build_triples

    empty = ray.data.from_arrow(schemas.PAGES.empty_table())
    out = build_triples(empty, KgConfig())
    assert out.count() == 0


def test_ner_offsets_in_range_on_unicode():
    from pie_ray.stages.ner import NerTagger

    tagger = NerTagger()
    texts = [
        "",
        "   ",
        "héllo wörld — Ünïcode test with Émile Zola at emile@test.com.",
        "日本語のテキスト with John Smith mixed in. Call (555) 123-4567.",
        "emoji 🎉🎊 party with Alice Johnson 🎈 alice@example.org",
        "​zero‌width‍ chars",
        "a" * 10000,
    ]
    for text in texts:
        for m in tagger.tag_document(text):
            assert 0 <= m["begin"] < m["end"] <= len(text)
            assert text[m["begin"] : m["end"]] == m["surface"]
