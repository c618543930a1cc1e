"""A8/A9 — triple emission and exact global dedup.

Triple emission is doc-local (no shuffle): within each sentence, every PER
mention pairs with every co-occurring EMAIL/PHONE/ADDR/ID mention ->
``(per_key, has_*, value_norm)``; PER×PER in the same sentence ->
``co_mentioned_with`` (subj = min key, obj = max key); each distinct person on
the page -> ``(per_key, appears_on, domain(url))``. Subjects (and
co_mentioned objects) are PRE-canonicalization entity keys ("per:<norm>");
A13 rewrites them through the canon map.

Exact dedup (A9) is the first pipeline shuffle: hash-partition on
(subj, pred, obj), keep min(warc_ts) / max(score) as provenance — expressed
with partial per-batch combining before the global groupby so the shuffle
moves pre-deduplicated rows (SURVEY.md §4 "pre-aggregate inside map_batches").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pie_ray import schemas
from pie_ray.normalize import entity_key

ATTR_PRED = {
    "EMAIL": "has_email",
    "PHONE": "has_phone",
    "ADDR": "has_address",
    "ID": "has_id",
}


def triples_for_doc(domain: str, mentions: list[dict]) -> list[tuple[str, str, str, float]]:
    """Raw (subj, pred, obj, score) triples for one document's mentions."""
    by_sent: dict[int, list[dict]] = {}
    for m in mentions:
        by_sent.setdefault(m["sent_id"], []).append(m)

    out: set[tuple[str, str, str]] = set()
    scores: dict[tuple[str, str, str], float] = {}
    persons_on_page: set[str] = set()

    def add(s: str, p: str, o: str, sc: float) -> None:
        k = (s, p, o)
        out.add(k)
        scores[k] = max(scores.get(k, 0.0), sc)

    for ms in by_sent.values():
        pers = [m for m in ms if m["ent_type"] == "PER"]
        attrs = [m for m in ms if m["ent_type"] != "PER"]
        pkeys = sorted({entity_key("PER", m["norm"]) for m in pers})
        persons_on_page.update(pkeys)
        for pk in pkeys:
            for a in attrs:
                add(pk, ATTR_PRED[a["ent_type"]], a["norm"],
                    min(1.0, a["score"]))
        for i in range(len(pkeys)):
            for j in range(i + 1, len(pkeys)):
                add(pkeys[i], "co_mentioned_with", pkeys[j], 1.0)
    for pk in sorted(persons_on_page):
        add(pk, "appears_on", domain, 1.0)
    return [(s, p, o, scores[(s, p, o)]) for (s, p, o) in sorted(out)]


def emit_triples_grouped(group: pa.Table) -> pa.Table:
    """A8 over a batch of WHOLE documents' T2 mentions — the unfused path
    (used when T2 is checkpointed and re-read). The batch may contain many
    urls; each url's mentions must be complete within it (guaranteed by
    ``emit_triples_from_mentions``'s hash(url) bucket shuffle)."""
    from pie_ray.normalize import url_domain

    cols = group.select(
        ["url", "warc_ts", "ent_type", "surface", "norm", "begin", "end", "sent_id", "score"]
    ).to_pylist()
    by_url: dict[str, list[dict]] = {}
    ts_of: dict[str, object] = {}
    for m in cols:
        by_url.setdefault(m["url"], []).append(m)
        ts_of[m["url"]] = m["warc_ts"]
    rows = {k: [] for k in schemas.TRIPLES.names}
    for url in sorted(by_url):
        for s, p, o, sc in triples_for_doc(url_domain(url), by_url[url]):
            rows["subj"].append(s)
            rows["pred"].append(p)
            rows["obj"].append(o)
            rows["url"].append(url)
            rows["warc_ts"].append(ts_of[url])
            rows["score"].append(sc)
    return pa.table(
        {n: pa.array(rows[n], type=schemas.TRIPLES.field(n).type)
         for n in schemas.TRIPLES.names},
        schema=schemas.TRIPLES,
    )


def emit_triples_from_mentions(mentions_ds, num_buckets: int = 64):
    """A8 unfused: T2 mentions Dataset -> raw triples. ONE shuffle keyed on
    hash(url) % num_buckets co-locates each document's mentions; the batch
    fn then walks urls with a dict (no per-url Ray group dispatch)."""
    from pie_ray.util import hash64_array

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (hash64_array(t.column("url").to_pylist(), salt=b"emit") % num_buckets).astype(
            "int32"
        )
        return t.append_column("bucket", pa.array(b, pa.int32()))

    return (
        mentions_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: emit_triples_grouped(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


def _partial_dedup(batch: pa.Table, extra_keys: tuple[str, ...] = ()) -> pa.Table:
    """Per-batch combiner: collapse duplicate (subj,pred,obj) before the
    shuffle, keeping min(warc_ts), min(url) provenance and max(score).
    With "url" in ``extra_keys`` the collapse keeps per-page grain (the
    fused raw-delta emit uses this: url-level erasure filters raw rows by
    provenance, so a raw row must never blend two pages' facts)."""
    if batch.num_rows == 0:
        return batch
    keys = ["subj", "pred", "obj", *extra_keys]
    url_in_keys = "url" in keys
    aggs = [("warc_ts", "min"), ("score", "max")]
    names = [*keys, "warc_ts", "score"]
    if not url_in_keys:
        aggs.insert(1, ("url", "min"))
        names.insert(len(keys) + 1, "url")
    gb = batch.group_by(keys).aggregate(aggs)
    return gb.rename_columns(names)


DEDUP_BUCKETS = 64


def dedup_triples(ds, extra_keys: tuple[str, ...] = (), num_buckets: int = DEDUP_BUCKETS):
    """A9 — exact dedup of raw triples (Dataset of TRIPLES schema).

    Three-phase, all group work vectorized:
      1. per-batch combine (Arrow ``Table.group_by``, C++ kernels);
      2. hash shuffle on a LOW-cardinality bucket key
         (``hash(subj,pred,obj) % num_buckets``) — every duplicate lands in
         the same bucket, and Ray's groupby only ever sees ``num_buckets``
         groups instead of one Python-level group per distinct triple;
      3. per-bucket exact dedup, again via Arrow ``group_by``.

    (Ray's built-in high-cardinality ``groupby().aggregate()`` walks groups
    in Python — measured ~20× slower on ~100k distinct keys.)

    ``extra_keys`` scopes the dedup (e.g. ``("part",)`` for per-partition
    resume — the downstream canonical dedup removes any cross-partition
    survivors, so the final triple set is independent of partition batching).
    """
    from pie_ray.util import bucket_hash_strings

    def add_bucket(t: pa.Table) -> pa.Table:
        t = _partial_dedup(t, extra_keys)
        key = pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"),
            *[pc.cast(t.column(k), pa.string()) for k in extra_keys], "\x1f",
        )
        # vectorized FNV bucket hash (bucket choice never feeds results)
        buckets = (bucket_hash_strings(key, salt=0xDED) % num_buckets).astype("int32")
        return t.append_column("bucket", pa.array(buckets, pa.int32()))

    def dedup_bucket(group: pa.Table) -> pa.Table:
        batch = _partial_dedup(group.drop_columns(["bucket"]), extra_keys)
        cols = {
            "subj": batch.column("subj"),
            "pred": batch.column("pred"),
            "obj": batch.column("obj"),
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts").cast(pa.timestamp("us")),
            "score": pc.cast(batch.column("score"), pa.float32()),
        }
        schema = schemas.TRIPLES
        for k in extra_keys:
            cols[k] = batch.column(k)
            schema = schema.append(pa.field(k, batch.column(k).type))
        return pa.table(cols, schema=schema)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(dedup_bucket, batch_format="pyarrow")
