"""Train the A7 PER tagger (averaged structured perceptron) and commit the
learned weights to pie_ray/stages/ner_weights.npz — REPLACING the
hand-seeded fixture — only if they pass two gates:

1. held-out span F1 on a disjoint page range must be >= 0.99;
2. the FULL tagger path (channels + overlap resolution + span trimming)
   must reproduce the generator's golden mention multiset EXACTLY over a
   wide validation range — the same invariant the kg_mentions_oracle
   DuckDB entry pins (P = R = 1.0), so swapping weights can never break
   the recorded correctness rows.

Deterministic end to end (seeded corpus, seeded shuffle). Run:

    python scripts/train_ner.py
"""

from __future__ import annotations

import collections
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pie_ray.golden import golden_mentions  # noqa: E402
from pie_ray.sources.synth import gen_page  # noqa: E402
from pie_ray.stages.extract import html_to_text  # noqa: E402
from pie_ray.stages.ner import NerTagger  # noqa: E402
from pie_ray.stages.ner_model import DEFAULT_WEIGHTS_PATH  # noqa: E402
from pie_ray.stages.ner_train import train_and_validate  # noqa: E402

N_TRAIN = 1200
N_HELDOUT = 400
N_VALIDATE = 2400  # full-tagger exact-match range (covers the entry corpus)
EPOCHS = 8


def full_tagger_mentions(weights_path: str, n_pages: int):
    """(url, ent_type, surface, norm) multiset via the COMPLETE serving
    path (CRF + channels + overlap resolution) with the candidate file."""
    tagger = NerTagger(weights_path=weights_path)
    out: collections.Counter = collections.Counter()
    for i in range(n_pages):
        rec, _ = gen_page(i)
        if rec["lang"] != "en":
            continue
        text = html_to_text(rec["html"])
        for m in tagger.tag_document(text):
            out[(rec["url"], m["ent_type"], m["surface"], m["norm"])] += 1
    return out


def main() -> None:
    t0 = time.time()
    weights, ho, tr = train_and_validate(N_TRAIN, N_HELDOUT, epochs=EPOCHS)
    print(f"train   P={tr['precision']:.4f} R={tr['recall']:.4f} F1={tr['f1']:.4f}")
    print(f"heldout P={ho['precision']:.4f} R={ho['recall']:.4f} F1={ho['f1']:.4f}")
    if ho["f1"] < 0.99:
        raise SystemExit(f"GATE 1 FAILED: held-out F1 {ho['f1']:.4f} < 0.99")

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        cand = f.name
    try:
        np.savez(
            cand, emission_w=weights[0], transitions=weights[1], start=weights[2]
        )
        got = full_tagger_mentions(cand, N_VALIDATE)
    finally:
        os.unlink(cand)
    want = collections.Counter(golden_mentions(N_VALIDATE))
    if got != want:
        miss = list((want - got).items())[:5]
        extra = list((got - want).items())[:5]
        raise SystemExit(
            f"GATE 2 FAILED: mention multiset mismatch over {N_VALIDATE} pages\n"
            f"  missing: {miss}\n  extra: {extra}"
        )

    # write-then-rename: a kill mid-write must never leave a torn fixture
    # (every NerModel() load would crash until restored from git)
    tmp_out = DEFAULT_WEIGHTS_PATH + ".tmp.npz"
    np.savez(
        tmp_out,
        emission_w=weights[0],
        transitions=weights[1],
        start=weights[2],
        trained=np.array(1, np.int8),
        heldout_f1=np.array(ho["f1"], np.float64),
        heldout_tp_fp_fn=np.array([ho["tp"], ho["fp"], ho["fn"]], np.int64),
        n_train_pages=np.array(N_TRAIN, np.int64),
        epochs=np.array(EPOCHS, np.int64),
    )
    os.replace(tmp_out, DEFAULT_WEIGHTS_PATH)
    print(
        f"wrote TRAINED weights to {DEFAULT_WEIGHTS_PATH} "
        f"({os.path.getsize(DEFAULT_WEIGHTS_PATH)} bytes); "
        f"exact golden-mention match over {N_VALIDATE} pages; "
        f"{time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
