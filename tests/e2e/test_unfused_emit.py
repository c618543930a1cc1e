"""Unfused A8 path (T2 mentions -> triples via bucket shuffle) produces the
same raw triple set as the fused NerTagger(emit='triples') path."""

from __future__ import annotations


def test_unfused_emit_matches_fused(ray_session):
    from pie_ray.pipelines.kg import KgConfig, extract_stage, raw_triples_stage
    from pie_ray.sources.synth import synth_pages
    from pie_ray.stages.ner import NerTagger
    from pie_ray.stages.triples import emit_triples_from_mentions

    cfg = KgConfig()
    N = 150
    ext = extract_stage(synth_pages(N, override_num_blocks=4), cfg).materialize()

    # compare the (subj, pred, obj) SET — the fused path's in-batch combiner
    # collapses url provenance to min(url) per batch, so url columns differ
    fused = raw_triples_stage(ext, cfg)
    fused_set = {(r["subj"], r["pred"], r["obj"]) for r in fused.take_all()}

    mentions = ext.map_batches(
        NerTagger, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    unfused = emit_triples_from_mentions(mentions)
    unfused_set = {(r["subj"], r["pred"], r["obj"]) for r in unfused.take_all()}
    assert fused_set == unfused_set
