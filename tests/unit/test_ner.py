"""NER tagger unit tests: channel regexes, CRF spans, corpus P/R (no Ray)."""

from pie_ray.sources.synth import gen_page
from pie_ray.stages.extract import html_to_text
from pie_ray.stages.ner import NerTagger


def _tag(text):
    return NerTagger().tag_document(text)


def test_email_channel():
    ms = _tag("Contact me at john.doe@example.com today.")
    assert ("EMAIL", "john.doe@example.com") in {(m["ent_type"], m["surface"]) for m in ms}


def test_phone_formats():
    for surf in ["(416) 555-0123", "416-555-0123", "+1 416 555 0123"]:
        ms = _tag(f"Call the office on {surf} now.")
        assert ("PHONE", surf) in {(m["ent_type"], m["surface"]) for m in ms}, surf


def test_id_formats():
    for surf in ["123-45-6789", "AB1234567"]:
        ms = _tag(f"The ID on file is {surf} currently.")
        assert ("ID", surf) in {(m["ent_type"], m["surface"]) for m in ms}, surf


def test_ssn_not_phone():
    ms = _tag("The ID on file is 123-45-6789 currently.")
    types = {m["ent_type"] for m in ms}
    assert "PHONE" not in types


def test_addr_channel():
    ms = _tag("Anna lives at 12 Maple Street, Salem.")
    assert ("ADDR", "12 Maple Street, Salem") in {(m["ent_type"], m["surface"]) for m in ms}


def test_per_alias_forms():
    for surf in ["John Anderson", "J. Anderson", "Anderson, John", "John Q. Anderson"]:
        ms = _tag(f"Contact {surf} at the office.")
        assert ("PER", surf) in {(m["ent_type"], m["surface"]) for m in ms}, surf


def test_email_suppresses_inner_per():
    ms = _tag("Write to john.anderson@acme.com today.")
    pers = [m for m in ms if m["ent_type"] == "PER"]
    assert pers == []


def test_offsets_slice_back():
    text = "Contact J. Anderson at j.a@x.io or call 416-555-0123."
    for m in _tag(text):
        assert text[m["begin"] : m["end"]] == m["surface"]


def test_corpus_mention_prf():
    """Mention-level P/R on 300 synthetic pages must be >= 0.98."""
    tagger = NerTagger()
    tp = fp = fn = 0
    for i in range(300):
        rec, gt = gen_page(i)
        if rec["lang"] != "en":
            continue
        found = {
            (m["ent_type"], m["surface"])
            for m in tagger.tag_document(html_to_text(rec["html"]))
        }
        truth = {(t, s) for sent in gt for (t, s) in sent}
        tp += len(found & truth)
        fp += len(found - truth)
        fn += len(truth - found)
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    assert p >= 0.98 and r >= 0.98, (p, r)


def test_weights_load_from_npz(tmp_path):
    """A7 seam: NerModel weights come from the committed .npz (TRAINED by
    scripts/train_ner.py since round 5, so they intentionally differ from
    the in-code fallback constants); a modified file changes the model
    without touching code; a missing file falls back to the constants."""
    import numpy as np

    from pie_ray.stages.ner_model import (
        DEFAULT_WEIGHTS_PATH,
        EMISSION_W,
        START,
        TRANSITIONS,
        NerModel,
        load_weights,
    )

    import os

    assert os.path.exists(DEFAULT_WEIGHTS_PATH), "committed weight fixture missing"
    w, t, s = load_weights()
    assert w.shape == EMISSION_W.shape and t.shape == TRANSITIONS.shape
    assert s.shape == START.shape
    assert not np.array_equal(w, EMISSION_W), "fixture should be trained weights"

    # missing file -> in-code fallback constants
    w2, t2, s2 = load_weights(str(tmp_path / "absent.npz"))
    assert np.array_equal(w2, EMISSION_W)
    assert np.array_equal(t2, TRANSITIONS)
    assert np.array_equal(s2, START)

    alt = tmp_path / "alt.npz"
    np.savez(alt, emission_w=EMISSION_W * 2, transitions=TRANSITIONS, start=START)
    m = NerModel(weights_path=str(alt))
    assert np.array_equal(m.w, EMISSION_W * 2)
