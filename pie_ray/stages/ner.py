"""A7 — NerTagger: stateful actor-pool stage for batched PII NER.

Usage (SURVEY.md A7):

    mentions = extracted.map_batches(
        NerTagger, batch_format="pyarrow", batch_size=256,
        concurrency=n_actors, num_cpus=1)

``__init__`` (once per actor) builds the numpy CRF model, lexicon sets and
compiled pattern channels; ``__call__`` (per Arrow batch) tokenizes every
document, runs ONE batched Viterbi decode across all sentences of the batch,
merges pattern-channel spans (priority EMAIL > ID > PHONE > ADDR > PER on
overlap), and emits T2 mention rows — or, in fused mode
(``NerTagger(emit="triples")``), pairs mentions doc-locally and emits raw
triple rows directly, avoiding a per-url shuffle between NER and triple
emission entirely (the scale-path default for the KG pipeline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pie_ray import schemas
from pie_ray.normalize import entity_key, normalize, url_domain
from pie_ray.stages import ner_model as nm
from pie_ray.stages.tokenize import doc_tokens, sentence_spans
from pie_ray.util import stable_hash64


class NerTagger:
    def __init__(self, emit: str = "mentions", weights_path: str | None = None) -> None:
        assert emit in ("mentions", "triples")
        self.emit = emit
        self.model = nm.NerModel(weights_path)

    # ---- per-document tagging ------------------------------------------
    def tag_document(self, text: str) -> list[dict]:
        """All PII mentions of one document: dicts with ent_type, surface,
        norm, begin, end, sent_id, score."""
        return self.tag_documents([text])[0]

    # Viterbi decodes per sentence independently (row-wise vectorized dp),
    # so batching ALL sentences of ALL documents into few decode calls is
    # byte-identical to per-document calls — it just amortizes the numpy
    # per-call overhead (measured ~36% of tag time at 12 sentences/doc).
    # Sentences are length-sorted and chunked so each call's padded dp loop
    # runs only to ITS chunk's max length (one pathological long sentence
    # can't stretch every row's decode).
    _VITERBI_CHUNK = 1024

    def tag_documents(self, texts: list[str]) -> list[list[dict]]:
        """Mentions for every document of a batch: one length-chunked
        Viterbi sweep over all sentences, then per-doc span assembly."""
        model = self.model
        doc_sents = [doc_tokens(t) for t in texts]
        flat: list[tuple[int, int]] = []  # (doc_idx, sent_idx)
        ems: list[np.ndarray] = []
        for di, sents in enumerate(doc_sents):
            for si, toks in enumerate(sents):
                flat.append((di, si))
                ems.append(model.emissions([t for t, _, _ in toks]))
        paths: list[list[int] | None] = [None] * len(flat)
        if flat:
            order = sorted(range(len(flat)), key=lambda i: ems[i].shape[0])
            for lo in range(0, len(order), self._VITERBI_CHUNK):
                idxs = order[lo : lo + self._VITERBI_CHUNK]
                got = nm.viterbi_batch([ems[i] for i in idxs], model.t, model.start)
                for i, p in zip(idxs, got):
                    paths[i] = p
        per_doc: list[list] = [[None] * len(s) for s in doc_sents]
        for (di, si), p in zip(flat, paths):
            per_doc[di][si] = p
        return [
            self._assemble(text, sents, ps)
            for text, sents, ps in zip(texts, doc_sents, per_doc)
        ]

    def _assemble(self, text: str, sents, paths) -> list[dict]:
        """Channel merge + overlap resolution + mention rows for one doc,
        given its tokenized sentences and decoded label paths."""
        model = self.model
        spans: list[tuple[int, int, str, float]] = []  # (begin, end, type, score)
        for toks, path in zip(sents, paths):
            for b_idx, e_idx in nm.spans_from_path(path, toks):
                cb, ce = toks[b_idx][1], toks[e_idx - 1][2]
                spans.append((cb, ce, "PER", 1.0))
        for ent_type, rx in model.channels:
            for m in rx.finditer(text):
                spans.append((m.start(), m.end(), ent_type, 1.0))

        # overlap resolution: higher-priority type wins; ties -> leftmost
        spans.sort(key=lambda s: (nm.TYPE_PRIORITY[s[2]], s[0], -(s[1] - s[0])))
        kept: list[tuple[int, int, str, float]] = []
        for b, e, t, sc in spans:
            if all(e <= kb or b >= ke for kb, ke, _, _ in kept):
                kept.append((b, e, t, sc))
        kept.sort()

        sbounds = sentence_spans(text)
        out = []
        for b, e, t, sc in kept:
            sent_id = _sent_of(sbounds, b)
            surface = text[b:e]
            out.append(
                {
                    "ent_type": t,
                    "surface": surface,
                    "norm": normalize(t, surface),
                    "begin": b,
                    "end": e,
                    "sent_id": sent_id,
                    "score": sc,
                }
            )
        return out

    # ---- batch entry point ---------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        texts = batch.column("text").to_pylist()
        if self.emit == "mentions":
            return self._mentions_table(urls, tss, texts)
        return self._triples_table(urls, tss, texts)

    def _mentions_table(self, urls, tss, texts) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "url", "warc_ts", "mention_id", "ent_type", "surface", "norm",
            "begin", "end", "sent_id", "score")}
        for url, ts, doc_mentions in zip(urls, tss, self.tag_documents(texts)):
            for m in doc_mentions:
                cols["url"].append(url)
                cols["warc_ts"].append(ts)
                cols["mention_id"].append(
                    f"{stable_hash64(url):016x}-{m['begin']}-{m['end']}"
                )
                for k in ("ent_type", "surface", "norm", "begin", "end",
                          "sent_id", "score"):
                    cols[k].append(m[k])
        return pa.table(
            {name: pa.array(cols[name], type=schemas.MENTIONS.field(name).type)
             for name in schemas.MENTIONS.names},
            schema=schemas.MENTIONS,
        )

    def _triples_table(self, urls, tss, texts) -> pa.Table:
        from pie_ray.stages.triples import _partial_dedup, triples_for_doc

        rows: dict[str, list] = {k: [] for k in schemas.TRIPLES.names}
        for url, ts, doc_mentions in zip(urls, tss, self.tag_documents(texts)):
            for s, p, o, sc in triples_for_doc(url_domain(url), doc_mentions):
                rows["subj"].append(s)
                rows["pred"].append(p)
                rows["obj"].append(o)
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["score"].append(sc)
        t = pa.table(
            {name: pa.array(rows[name], type=schemas.TRIPLES.field(name).type)
             for name in schemas.TRIPLES.names},
            schema=schemas.TRIPLES,
        )
        # combiner runs INSIDE the actor: a separate task-pool map stage
        # would be starved for CPUs behind this pool's reservation.
        # url STAYS in the combine key: collapsing (subj,pred,obj) across
        # pages here would make raw deltas batch-layout-dependent and lose
        # the per-page provenance grain that url-level erasure
        # (incremental.forget_urls) filters on — the global post-canon
        # dedup reduces to the identical min-url row either way
        return _partial_dedup(t, ("url",))


def _sent_of(sbounds: list[tuple[int, int]], pos: int) -> int:
    lo, hi = 0, len(sbounds) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if sbounds[mid][1] <= pos:
            lo = mid + 1
        else:
            hi = mid
    return lo


def mention_key(ent_type: str, norm: str) -> str:
    return entity_key(ent_type, norm)
