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
    subj_sorted = subj_agg.column("subj").combine_chunks()

    # top predicate: grouped MODE with deterministic ties — ONE Arrow sort
    # (subj asc, count desc, pred asc), then the first row per subject
    # (group boundaries via dictionary-encoded int codes; no per-row Python)
    pred_cnt = rename_grouped(
        g.group_by(["subj", "pred"]).aggregate([("n", "sum")]),
        ["subj", "pred"],
        ["subj", "pred", "pn"],
    ).sort_by(
        [("subj", "ascending"), ("pn", "descending"), ("pred", "ascending")]
    )
    top_first = _group_starts(pred_cnt.column("subj"))
    top_subj = pred_cnt.column("subj").combine_chunks().take(top_first)
    top_pred = pred_cnt.column("pred").combine_chunks().take(top_first)
    top_aligned = top_pred.take(pc.index_in(subj_sorted, value_set=top_subj))

    # provenance sample: the SAMPLE_URLS lexicographically-smallest distinct
    # urls per subject — sorted distinct pairs, vectorized first-k-per-group
    # (position-within-group < k), ListArray built straight from offsets
    su = (
        g.group_by(["subj", "url"])
        .aggregate([])
        .sort_by([("subj", "ascending"), ("url", "ascending")])
    )
    starts = _group_starts(su.column("subj"))
    n_rows = su.num_rows
    counts = np.diff(np.append(starts, n_rows))
    pos = np.arange(n_rows) - np.repeat(starts, counts)
    keep = pos < SAMPLE_URLS
    kept_counts = np.minimum(counts, SAMPLE_URLS)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
    urls_kept = su.column("url").combine_chunks().filter(pa.array(keep))
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), urls_kept)
    su_subj = su.column("subj").combine_chunks().take(pa.array(starts, pa.int64()))
    samples_aligned = lists.take(pc.index_in(subj_sorted, value_set=su_subj)).cast(
        pa.list_(pa.string())
    )

    return pa.table(
        {
            "subj": subj_sorted,
            "n_triples": pc.cast(subj_agg.column("n_triples"), pa.int64()),
            "n_preds": pc.cast(subj_agg.column("n_preds"), pa.int64()),
            "n_urls": pc.cast(subj_agg.column("n_urls"), pa.int64()),
            "top_pred": top_aligned,
            "first_seen": subj_agg.column("first_seen").cast(pa.timestamp("us")),
            "last_seen": subj_agg.column("last_seen").cast(pa.timestamp("us")),
            "sample_urls": samples_aligned,
        },
        schema=PROFILE_SCHEMA,
    )


def _group_starts(col) -> np.ndarray:
    """First-row index of each run in a SORTED column (int codes via
    dictionary encode — C-speed compare, no Python string walk)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    codes = pc.dictionary_encode(arr).indices.to_numpy(zero_copy_only=False)
    if len(codes) == 0:
        return np.empty(0, np.int64)
    return np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]).astype(np.int64)


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
