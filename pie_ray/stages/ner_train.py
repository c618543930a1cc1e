"""A7 training — averaged structured perceptron for the PER linear-CRF.

Replaces the hand-seeded weight fixture with weights LEARNED from the
seeded synthetic corpus (Collins 2002 averaged structured perceptron:
no autograd needed, exact inference via the same Viterbi used at serving
time, mistake-driven additive updates on the feature-count difference
between the gold and the predicted path).

Shape notes:
- The annotated set is bounded by construction (labeled data is scarce at
  any corpus scale), so corpus prep can fan out but the optimization loop
  is a driver-side numpy pass over the collected sentences — the same
  split as every perceptron/CRF trainer. For cluster-scale sets, shard +
  iterative parameter mixing (McDonald et al. 2010) drops in: train one
  perceptron per shard per epoch and average; `train()` is shard-pure.
- Features / decode are EXACTLY the serving path (`NerModel.features`,
  `viterbi_batch`), so a trained weight file is behavior-compatible by
  construction; structural IOB constraints (no O->I, no start-at-I) are
  enforced as fixed NEG masks the updates never touch.
- Everything is seeded/deterministic: fixed page ranges, fixed epoch
  order with a seeded shuffle, float32 weights.
"""

from __future__ import annotations

import numpy as np

from pie_ray.sources import gazetteers as gz
from pie_ray.sources.synth import gen_page
from pie_ray.stages import ner_model as nm
from pie_ray.stages.extract import html_to_text
from pie_ray.stages.tokenize import doc_tokens
from pie_ray.util import stable_hash64

O, B, I = nm.O, nm.B, nm.I


def _gold_spans_for_sentence(
    text: str, toks: list[tuple[str, int, int]], gold_surfaces: list[str]
) -> list[tuple[int, int]]:
    """Token-index spans of gold PER surfaces inside one sentence, by
    boundary-checked character matching (longest surfaces claim first, so
    'Mary Ann Smith' wins over a contained 'Ann Smith')."""
    if not toks:
        return []
    lo, hi = toks[0][1], toks[-1][2]
    taken = np.zeros(len(toks), bool)
    spans: list[tuple[int, int]] = []
    # total order (-len, surf): equal-length surfaces tie-break
    # lexicographically, never by set/hash iteration order — training
    # labels (and the committed weight bytes) must be run-independent
    for surf in sorted(set(gold_surfaces), key=lambda s: (-len(s), s)):
        start = lo
        while True:
            p = text.find(surf, start, hi + len(surf))
            if p < 0 or p >= hi:
                break
            start = p + 1
            e = p + len(surf)
            if (p > 0 and (text[p - 1].isalnum())) or (
                e < len(text) and text[e].isalnum()
            ):
                continue  # mid-word hit
            # token indices fully inside [p, e)
            idxs = [k for k, (_, tb, te) in enumerate(toks) if tb >= p and te <= e]
            if not idxs or any(taken[k] for k in idxs):
                continue
            taken[idxs] = True
            spans.append((idxs[0], idxs[-1] + 1))
    return sorted(spans)


def build_sentences(
    start: int, n_pages: int, seed: int = gz.SEED
) -> list[tuple[list[str], np.ndarray]]:
    """(tokens, gold IOB labels) for every sentence of the en pages in
    [start, start + n_pages) — the extraction/tokenization is the frozen
    serving path, so training sees exactly what the tagger will see."""
    out: list[tuple[list[str], np.ndarray]] = []
    for i in range(start, start + n_pages):
        rec, gt = gen_page(i, seed)
        if rec["lang"] != "en":
            continue
        text = html_to_text(rec["html"])
        gold_pers = [s for sent in gt for (t, s) in sent if t == "PER"]
        for toks in doc_tokens(text):
            labels = np.zeros(len(toks), np.int8)
            for b, e in _gold_spans_for_sentence(text, toks, gold_pers):
                labels[b] = B
                labels[b + 1 : e] = I
            out.append(([t for t, _, _ in toks], labels))
    return out


def _phi(feats: np.ndarray, path: np.ndarray):
    """Sufficient statistics of a label path: per-label feature sums
    (N_FEATS, 3), transition counts (3, 3), start one-hot (3,)."""
    em = np.zeros((nm.N_FEATS, nm.N_LABELS), np.float64)
    np.add.at(em.T, path, feats)  # em[:, y] += feats[t] for each t
    tr = np.zeros((nm.N_LABELS, nm.N_LABELS), np.float64)
    if len(path) > 1:
        np.add.at(tr, (path[:-1], path[1:]), 1.0)
    st = np.zeros(nm.N_LABELS, np.float64)
    st[path[0]] += 1.0
    return em, tr, st


# IOB structural constraints: True where the weight is learnable; the
# masked-out entries stay at NEG so no decode can ever produce O->I or a
# sentence starting at I.
_TR_MASK = np.ones((nm.N_LABELS, nm.N_LABELS), bool)
_TR_MASK[O, I] = False
_ST_MASK = np.array([True, True, False])


def train(
    sentences: list[tuple[list[str], np.ndarray]],
    epochs: int = 8,
    seed: int = 1,
    lr: float = 0.5,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Averaged structured perceptron. Returns float32
    (emission_w (N_FEATS, 3), transitions (3, 3), start (3,))."""
    model = nm.NerModel()  # feature extractor + memo only; weights unused
    feats = [
        np.stack([model.features(t) for t in toks]).astype(np.float64)
        if toks
        else np.zeros((0, nm.N_FEATS))
        for toks, _ in sentences
    ]
    golds = [lab.astype(np.int64) for _, lab in sentences]

    W = np.zeros((nm.N_FEATS, nm.N_LABELS), np.float64)
    T = np.where(_TR_MASK, 0.0, nm.NEG)
    S = np.where(_ST_MASK, 0.0, nm.NEG)
    Wsum, Tsum, Ssum = W * 0, np.zeros_like(T), np.zeros_like(S)
    steps = 0

    order = np.arange(len(sentences))
    rng = np.random.default_rng(seed)
    for _ep in range(epochs):
        rng.shuffle(order)
        for si in order:
            F, g = feats[si], golds[si]
            if len(g) == 0:
                continue
            em = (F @ W).astype(np.float32)
            pred = np.asarray(
                nm.viterbi_batch([em], T.astype(np.float32), S.astype(np.float32))[0],
                np.int64,
            )
            if not np.array_equal(pred, g):
                em_g, tr_g, st_g = _phi(F, g)
                em_p, tr_p, st_p = _phi(F, pred)
                W += lr * (em_g - em_p)
                T += lr * np.where(_TR_MASK, tr_g - tr_p, 0.0)
                S += lr * np.where(_ST_MASK, st_g - st_p, 0.0)
            Wsum += W
            Tsum += np.where(_TR_MASK, T, 0.0)
            Ssum += np.where(_ST_MASK, S, 0.0)
            steps += 1

    Wa = Wsum / max(steps, 1)
    Ta = np.where(_TR_MASK, Tsum / max(steps, 1), nm.NEG)
    Sa = np.where(_ST_MASK, Ssum / max(steps, 1), nm.NEG)
    return Wa.astype(np.float32), Ta.astype(np.float32), Sa.astype(np.float32)


def evaluate(
    weights: tuple[np.ndarray, np.ndarray, np.ndarray],
    sentences: list[tuple[list[str], np.ndarray]],
) -> dict[str, float]:
    """Span-level PER precision/recall/F1 of a weight triple over labeled
    sentences (exact-boundary spans, the CoNLL criterion)."""
    W, T, S = weights
    model = nm.NerModel()
    tp = fp = fn = 0
    ems = []
    for toks, _ in sentences:
        F = (
            np.stack([model.features(t) for t in toks]).astype(np.float32)
            if toks
            else np.zeros((0, nm.N_FEATS), np.float32)
        )
        ems.append(F @ W)
    paths = nm.viterbi_batch(ems, T, S)
    for (toks, gold), path in zip(sentences, paths):
        pred_spans = set(_iob_spans(np.asarray(path, np.int64)))
        gold_spans = set(_iob_spans(gold.astype(np.int64)))
        tp += len(pred_spans & gold_spans)
        fp += len(pred_spans - gold_spans)
        fn += len(gold_spans - pred_spans)
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    f1 = 2 * p * r / max(p + r, 1e-12)
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def _iob_spans(path: np.ndarray) -> list[tuple[int, int]]:
    spans = []
    s = None
    for i, lab in enumerate(path.tolist()):
        if lab == B:
            if s is not None:
                spans.append((s, i))
            s = i
        elif lab == I:
            if s is None:
                s = i
        else:
            if s is not None:
                spans.append((s, i))
                s = None
    if s is not None:
        spans.append((s, len(path)))
    return spans


def train_and_validate(
    n_train_pages: int = 1200,
    n_heldout_pages: int = 400,
    seed: int = gz.SEED,
    epochs: int = 8,
) -> tuple[tuple[np.ndarray, np.ndarray, np.ndarray], dict[str, float], dict[str, float]]:
    """Train on pages [0, n_train), evaluate on the DISJOINT held-out range
    [n_train, n_train + n_heldout). Returns (weights, heldout_metrics,
    train_metrics)."""
    tr = build_sentences(0, n_train_pages, seed)
    ho = build_sentences(n_train_pages, n_heldout_pages, seed)
    weights = train(tr, epochs=epochs, seed=int(stable_hash64("ner-train") & 0xFFFF))
    return weights, evaluate(weights, ho), evaluate(weights, tr)
