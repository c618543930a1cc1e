"""A2 — deterministic synthetic Common-Crawl-style page corpus (T0), with
ground truth known by construction (FIXTURES.md §1–2).

Every page is a pure function of ``(SEED, row_index)``: per-row RNG seeded by
``row_seed(seed, "pages", idx)``, so output is independent of partitioning,
batch boundaries, and parallelism level. PII spans are injected from the
seeded gazetteers; the generator returns, alongside each T0 row, the list of
injected PII mentions per sentence — the e2e oracle (golden triples) is
derived from these by ``pie_ray.golden``.

Scale-out shape: ``synth_pages(n)`` = ``ray.data.range(n).map_batches(...)``
— the generator itself is an embarrassingly parallel stateless stage, which
is how a 10^12-row corpus would be synthesized on a real cluster.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from pie_ray import schemas
from pie_ray.sources import gazetteers as gz
from pie_ray.util import row_seed

EPOCH = datetime(2024, 1, 1)
TS_STEP_S = 37

LANGS = ["en", "es", "de", "zh", "fr"]
LANG_WEIGHTS = [0.7, 0.1, 0.08, 0.07, 0.05]

# (template, slots) — no apostrophes (frozen tokenizer keeps spans intact).
TEMPLATES = [
    ("Contact {p} at {e}.", ("PER", "EMAIL")),
    ("Call {p} on {ph}.", ("PER", "PHONE")),
    ("{p} lives at {a}.", ("PER", "ADDR")),
    ("The ID of {p} is {i}.", ("PER", "ID")),
    ("{p1} met {p2} at the conference.", ("PER", "PER")),
]


def _filler_sentence(rng: random.Random, words: list[str]) -> str:
    n = rng.randint(5, 11)
    ws = [words[rng.randrange(len(words))] for _ in range(n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def gen_page(idx: int, seed: int = gz.SEED) -> tuple[dict, list[list[tuple[str, str]]]]:
    """Generate one T0 row and its ground truth.

    Returns ``(record, gt_sentences)`` where ``gt_sentences`` is a list of
    sentences, each a list of ``(ent_type, surface)`` injected PII mentions
    (empty for non-PII/filler sentences and for non-en pages).
    """
    rng = random.Random(row_seed(seed, "pages", idx))
    domain = gz.zipf_domain(rng.random())
    url = f"https://{domain}/doc{idx}"
    ts = EPOCH + timedelta(seconds=idx * TS_STEP_S)

    lang = rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]
    pool = gz.person_pool()

    sentences: list[tuple[str, list[tuple[str, str]]]] = []
    if lang == "en":
        k_p = rng.randint(1, 3)
        page_persons = rng.sample(range(len(pool)), k_p)
        n_pii = rng.randint(2, 5)
        for _ in range(n_pii):
            tmpl, slots = TEMPLATES[rng.randrange(len(TEMPLATES))]
            if slots == ("PER", "PER"):
                if k_p < 2:
                    tmpl, slots = TEMPLATES[0]
                else:
                    pi1, pi2 = rng.sample(page_persons, 2)
                    a1 = pool[pi1]["aliases"][rng.randrange(4)]
                    a2 = pool[pi2]["aliases"][rng.randrange(4)]
                    sentences.append(
                        (tmpl.format(p1=a1, p2=a2), [("PER", a1), ("PER", a2)])
                    )
                    continue
            pi = page_persons[rng.randrange(k_p)]
            p = pool[pi]
            alias = p["aliases"][rng.randrange(4)]
            if slots[1] == "EMAIL":
                val = p["email"]
                sent = tmpl.format(p=alias, e=val)
            elif slots[1] == "PHONE":
                val = p["phones"][rng.randrange(3)]
                sent = tmpl.format(p=alias, ph=val)
            elif slots[1] == "ADDR":
                val = p["addr"]
                sent = tmpl.format(p=alias, a=val)
            else:
                val = p["id"]
                sent = tmpl.format(p=alias, i=val)
            sentences.append((sent, [("PER", alias), (slots[1], val)]))
        filler_words = list(gz.FILLER_WORDS)
    else:
        filler_words = list(gz.NONEN_WORDS)

    n_fill = rng.randint(3, 8)
    for _ in range(n_fill):
        sentences.append((_filler_sentence(rng, filler_words), []))
    rng.shuffle(sentences)

    latin1 = lang == "en" and idx % 17 == 0
    if latin1:
        sentences.append(("Voilà un résumé au café près du vieux château.", []))

    title = " ".join(
        filler_words[rng.randrange(len(filler_words))] for _ in range(3)
    )
    body_parts = []
    malformed = idx % 13 == 0
    for si, (sent, _) in enumerate(sentences):
        if not sent.rstrip().endswith((".", "!", "?")):
            sent = sent + "."
        if _ == [] and rng.random() < 0.5:
            # wrap one non-PII word in an inline tag (stripper must not split)
            ws = sent.split(" ")
            wi = rng.randrange(len(ws))
            tag = rng.choice(["b", "em", "strong"])
            ws[wi] = f"<{tag}>{ws[wi]}</{tag}>"
            sent = " ".join(ws)
        if malformed and si == 0:
            body_parts.append(f'<div class="unclosed"><p>{sent}</p>')
        else:
            body_parts.append(f"<p>{sent}</p>")

    html_str = (
        "<html><head><title>"
        + title
        + '</title>\n<script type="text/javascript">var tracker = '
        '"spam@example.com"; track(1);</script>\n'
        "<style>body { margin: 0; font: 12px sans; }</style>\n"
        "</head><body>\n"
        '<nav><a href="/">home</a> <a href="/about">about</a></nav>\n'
        "<!-- generated page -->\n"
        + "\n".join(body_parts)
        + "\n<footer>copyright 2024 all rights reserved</footer>\n"
        "</body></html>"
    )
    html = html_str.encode("latin-1" if latin1 else "utf-8")

    record = {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": "",
        "lang": lang,
    }
    gt = [m for (_, m) in sentences if m]
    return record, gt


def page_gt(idx: int, seed: int = gz.SEED) -> list[list[tuple[str, str]]]:
    """Ground-truth mentions for a page (regenerates; pure function)."""
    return gen_page(idx, seed)[1]


def pages_table(indices, seed: int = gz.SEED) -> pa.Table:
    """Build a T0 Arrow table for the given row indices."""
    recs = [gen_page(int(i), seed)[0] for i in indices]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in recs], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in recs], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in recs], pa.binary()),
            "text": pa.array([r["text"] for r in recs], pa.string()),
            "lang": pa.array([r["lang"] for r in recs], pa.string()),
        },
        schema=schemas.PAGES,
    )


def synth_pages(n: int, seed: int = gz.SEED, *, override_num_blocks: int | None = None):
    """A2 as a Ray Dataset: range(n) -> map_batches(generator). Lazy,
    streaming, partition-independent."""
    import ray.data

    def gen_batch(batch: dict[str, np.ndarray]) -> pa.Table:
        return pages_table(batch["id"], seed)

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen_batch, batch_format="numpy", batch_size=256)


def page_url(idx: int, seed: int = gz.SEED) -> str:
    """URL of page ``idx`` WITHOUT generating its body (the domain is the
    generator's first RNG draw, so this is ~100x cheaper than gen_page)."""
    rng = random.Random(row_seed(seed, "pages", idx))
    return f"https://{gz.zipf_domain(rng.random())}/doc{idx}"


def synth_pages_for_parts(
    n: int,
    parts,
    num_parts: int,
    seed: int = gz.SEED,
    *,
    override_num_blocks: int | None = None,
):
    """Partition-pruned synth source for resumable runs: generates full page
    bodies ONLY for rows whose ``part = hash(url) % num_parts`` is in
    ``parts``. The cheap url derivation runs for every index inside the
    distributed generator task; the expensive body generation is skipped for
    pruned rows — a resume round touching k of P partitions costs ~k/P of a
    full synth pass instead of a full regenerate-then-filter."""
    import ray.data

    from pie_ray.util import hash64_array

    pset = frozenset(int(p) for p in parts)

    def gen_batch(batch: dict[str, np.ndarray]) -> pa.Table:
        ids = batch["id"]
        urls = [page_url(int(i), seed) for i in ids]
        pr = hash64_array(urls, salt=b"part") % num_parts
        kept = [int(i) for i, p in zip(ids, pr) if int(p) in pset]
        return pages_table(kept, seed)

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen_batch, batch_format="numpy", batch_size=256)


def write_corpus(path: str, n: int, seed: int = gz.SEED, num_blocks: int | None = None) -> None:
    """Materialize a synthetic corpus to partitioned Parquet (bench input)."""
    synth_pages(n, seed, override_num_blocks=num_blocks).write_parquet(path)
