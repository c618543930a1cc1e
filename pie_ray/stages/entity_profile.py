"""Entity profiles over the canonical KG — the per-entity summary a
downstream consumer (review UI, retention audit, entity search) reads
instead of scanning triples: fact counts, predicate breadth, provenance
breadth (distinct source urls + a bounded deterministic sample), and
first/last-seen timestamps.

Scale shape (the repo-standard bucketed exchange):
  1. per-batch partial — collapse to distinct ``(subj, pred, url)`` rows
     carrying a count and min/max timestamp (Arrow group_by; ships at most
     the batch's distinct combinations, never raw triples);
  2. ONE shuffle on ``hash(subj) % buckets`` (size-derived count);
  3. per-bucket vectorized combine: totals by re-aggregation, distincts by
     Arrow ``count_distinct``, top predicate by the grouped-MODE trick
     (count desc, pred asc — deterministic ties), provenance sample = the
     ``SAMPLE_URLS`` lexicographically-smallest distinct urls per subject
     (stable under partitioning by construction).

Every output value is a pure function of the triple set — independent of
partitioning / batch layout (tested)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped

PROFILE_BUCKETS = 64
SAMPLE_URLS = 3

PROFILE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("n_triples", pa.int64()),
        ("n_preds", pa.int64()),
        ("n_urls", pa.int64()),
        ("top_pred", pa.string()),
        ("first_seen", pa.timestamp("us")),
        ("last_seen", pa.timestamp("us")),
        ("sample_urls", pa.list_(pa.string())),
    ]
)


def _partial(t: pa.Table, nb: int) -> pa.Table:
    gb = (
        pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
            }
        )
        .group_by(["subj", "pred", "url"])
        .aggregate([([], "count_all"), ("warc_ts", "min"), ("warc_ts", "max")])
    )
    b = (bucket_hash_strings(gb.column("subj"), salt=0xE9F) % nb).astype("int32")
    return pa.table(
        {
            "subj": gb.column("subj"),
            "pred": gb.column("pred"),
            "url": gb.column("url"),
            "n": pc.cast(gb.column("count_all"), pa.int64()),
            "ts_min": gb.column("warc_ts_min"),
            "ts_max": gb.column("warc_ts_max"),
            "bucket": pa.array(b, pa.int32()),
        }
    )


def _combine(g: pa.Table) -> pa.Table:
    g = g.drop_columns(["bucket"])
    # re-collapse cross-batch duplicates of the same (subj, pred, url)
    g = rename_grouped(
        g.group_by(["subj", "pred", "url"]).aggregate(
            [("n", "sum"), ("ts_min", "min"), ("ts_max", "max")]
        ),
        ["subj", "pred", "url"],
        ["subj", "pred", "url", "n", "ts_min", "ts_max"],
    )
    # per-subject scalars
    subj_agg = rename_grouped(
        g.group_by(["subj"]).aggregate(
            [
                ("n", "sum"),
                ("pred", "count_distinct"),
                ("url", "count_distinct"),
                ("ts_min", "min"),
                ("ts_max", "max"),
            ]
        ),
        ["subj"],
        ["subj", "n_triples", "n_preds", "n_urls", "first_seen", "last_seen"],
    ).sort_by([("subj", "ascending")])
    # top predicate: grouped MODE with deterministic ties (count desc, pred asc)
    pred_cnt = rename_grouped(
        g.group_by(["subj", "pred"]).aggregate([("n", "sum")]),
        ["subj", "pred"],
        ["subj", "pred", "pn"],
    )
    s = pred_cnt.column("subj").to_pylist()
    p = pred_cnt.column("pred").to_pylist()
    n = pred_cnt.column("pn").to_numpy(zero_copy_only=False)
    # factorize to int codes: np.unique returns SORTED uniques, so the
    # inverse codes carry the lexicographic order the tie-break needs
    s_u, s_codes = np.unique(np.asarray(s, dtype=object), return_inverse=True)
    p_u, p_codes = np.unique(np.asarray(p, dtype=object), return_inverse=True)
    order = np.lexsort((p_codes, -n, s_codes))
    s_sorted = s_codes[order]
    _, first = np.unique(s_sorted, return_index=True)
    top_by_subj = dict(
        zip(
            s_u[s_sorted[first]].tolist(),
            p_u[p_codes[order][first]].tolist(),
        )
    )
    # provenance sample: SAMPLE_URLS smallest distinct urls per subject
    su = (
        g.group_by(["subj", "url"])
        .aggregate([])
        .sort_by([("subj", "ascending"), ("url", "ascending")])
    )
    su_s = su.column("subj").to_pylist()
    su_u = su.column("url").to_pylist()
    samples: dict[str, list[str]] = {}
    for subj, url in zip(su_s, su_u):  # rows per bucket are pre-shrunk distincts
        lst = samples.setdefault(subj, [])
        if len(lst) < SAMPLE_URLS:
            lst.append(url)
    subjects = subj_agg.column("subj").to_pylist()
    return pa.table(
        {
            "subj": subj_agg.column("subj"),
            "n_triples": pc.cast(subj_agg.column("n_triples"), pa.int64()),
            "n_preds": pc.cast(subj_agg.column("n_preds"), pa.int64()),
            "n_urls": pc.cast(subj_agg.column("n_urls"), pa.int64()),
            "top_pred": pa.array([top_by_subj[x] for x in subjects], pa.string()),
            "first_seen": subj_agg.column("first_seen").cast(pa.timestamp("us")),
            "last_seen": subj_agg.column("last_seen").cast(pa.timestamp("us")),
            "sample_urls": pa.array(
                [samples[x] for x in subjects], pa.list_(pa.string())
            ),
        },
        schema=PROFILE_SCHEMA,
    )


def entity_profiles(triples_ds, num_buckets: int | None = None):
    """Canonical triples Dataset -> one profile row per subject entity."""
    from ray.data.dataset import MaterializedDataset

    est = (
        triples_ds.size_bytes()
        if isinstance(triples_ds, MaterializedDataset)
        else None
    )
    nb = num_buckets or bucket_count(est, floor=PROFILE_BUCKETS)
    return (
        triples_ds.map_batches(
            _partial, fn_kwargs={"nb": nb}, batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(_combine, batch_format="pyarrow")
    )
