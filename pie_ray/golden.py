"""Golden-oracle builder for the e2e triple P/R gate (FIXTURES.md §2).

Computes, purely from the generator's injected ground truth (no engine code
in the loop except the frozen normalization + linking RULE), the expected
canonical triple set for a synthetic corpus:

- raw triples from per-sentence injected mentions (same emission rules as
  pie_ray.stages.triples.triples_for_doc);
- the canonicalization oracle applies the EXACT linking rule — all-pairs
  char-3-gram Jaccard >= tau + connected components — i.e. what the
  pipeline's MinHash-LSH blocking approximates. Pipeline P/R vs this set
  therefore measures real end-to-end loss (stripper, NER, LSH recall).
"""

from __future__ import annotations

from pie_ray.normalize import (
    char_shingles,
    entity_key,
    jaccard,
    normalize,
    url_domain,
)
from pie_ray.sources import gazetteers as gz
from pie_ray.sources.synth import gen_page
from pie_ray.state.dsu import DSU
from pie_ray.stages.linking import TAU

ATTR_PRED = {
    "EMAIL": "has_email",
    "PHONE": "has_phone",
    "ADDR": "has_address",
    "ID": "has_id",
}


def golden_raw_triples(n: int, seed: int = gz.SEED) -> set[tuple[str, str, str]]:
    """Pre-canonicalization triple set from generator ground truth."""
    out: set[tuple[str, str, str]] = set()
    for i in range(n):
        rec, gt = gen_page(i, seed)
        if not gt:
            continue
        domain = url_domain(rec["url"])
        page_persons: set[str] = set()
        for sent in gt:
            pkeys = sorted(
                {entity_key("PER", normalize("PER", s)) for t, s in sent if t == "PER"}
            )
            attrs = [(t, normalize(t, s)) for t, s in sent if t != "PER"]
            page_persons.update(pkeys)
            for pk in pkeys:
                for t, norm in attrs:
                    out.add((pk, ATTR_PRED[t], norm))
            for i1 in range(len(pkeys)):
                for i2 in range(i1 + 1, len(pkeys)):
                    out.add((pkeys[i1], "co_mentioned_with", pkeys[i2]))
        for pk in page_persons:
            out.add((pk, "appears_on", domain))
    return out


def exact_canon_map(per_keys: set[str], tau: float = TAU) -> dict[str, str]:
    """EXACT linking rule: all-pairs Jaccard >= tau -> CC -> min-member id."""
    keys = sorted(per_keys)
    shingles = {k: char_shingles(k.split(":", 1)[1]) for k in keys}
    dsu = DSU()
    for i in range(len(keys)):
        si = shingles[keys[i]]
        for j in range(i + 1, len(keys)):
            if jaccard(si, shingles[keys[j]]) >= tau:
                dsu.union(keys[i], keys[j])
    return dsu.canon_map()


def canonicalize_triples(
    raw: set[tuple[str, str, str]], canon: dict[str, str]
) -> set[tuple[str, str, str]]:
    out: set[tuple[str, str, str]] = set()
    for s, p, o in raw:
        cs = canon.get(s, s)
        if p == "co_mentioned_with":
            co = canon.get(o, o)
            if cs == co:
                continue
            if cs > co:
                cs, co = co, cs
            out.add((cs, p, co))
        else:
            out.add((cs, p, o))
    return out


def golden_triples(
    n: int, seed: int = gz.SEED, tau: float = TAU
) -> set[tuple[str, str, str]]:
    """The e2e comparison set: canonical (subj, pred, obj) for pages [0, n)."""
    raw = golden_raw_triples(n, seed)
    per_keys = {s for s, _, _ in raw}
    per_keys.update(o for _, p, o in raw if p == "co_mentioned_with")
    canon = exact_canon_map(per_keys, tau)
    return canonicalize_triples(raw, canon)


def golden_mentions(n: int, seed: int = gz.SEED) -> list[tuple[str, str, str, str]]:
    """Exact (url, ent_type, surface, norm) mention MULTISET from the
    generator's injected ground truth — the NER stage must reproduce it
    with multiplicity (P=R=1.0 on the synthetic corpus by construction)."""
    rows: list[tuple[str, str, str, str]] = []
    for i in range(n):
        rec, gt = gen_page(i, seed)
        for sent in gt:
            for t, s in sent:
                rows.append((rec["url"], t, s, normalize(t, s)))
    return rows


def _values_sql(rows, cols: list[str]) -> str:
    """Literal-VALUES DuckDB query stating an expected result set directly
    (the closed-form-oracle house pattern, cf. urlops): the generator's
    ground truth is a pure function of the seed, so the expectation can be
    SPELLED OUT rather than recomputed in SQL."""

    def q(v: str) -> str:
        return "'" + v.replace("'", "''") + "'"

    vals = ",\n".join("(" + ", ".join(q(v) for v in r) + ")" for r in rows)
    cl = ", ".join(cols)
    return f"SELECT {cl} FROM (VALUES\n{vals}\n) AS t({cl})"


def golden_triples_sql(n: int, seed: int = gz.SEED) -> str:
    """DuckDB oracle for the flagship canonical-triples projection."""
    return _values_sql(sorted(golden_triples(n, seed)), ["subj", "pred", "obj"])


def golden_mentions_sql(n: int, seed: int = gz.SEED) -> str:
    """DuckDB oracle for the NER mention multiset."""
    return _values_sql(
        sorted(golden_mentions(n, seed)), ["url", "ent_type", "surface", "norm"]
    )


def precision_recall(
    produced: set[tuple[str, str, str]], golden: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not produced or not golden:
        return (0.0, 0.0)
    inter = len(produced & golden)
    return inter / len(produced), inter / len(golden)
