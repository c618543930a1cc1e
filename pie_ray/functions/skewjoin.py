"""Skew-aware inner hash join — the join-side counterpart of A14's salted
aggregation (pie_ray/stages/salt.py).

The problem a plain hash join has with Zipf keys: every row of a hot key
lands on ONE join partition, so the hottest key's partition is the
straggler that caps throughput no matter how many partitions the shuffle
has. The standard fix (explicit here, per the north rule's "skew handled
explicitly"): split by temperature —

  hot  : the probe finds keys holding > ``min_share`` of the left rows
         (the same cheap per-batch-partial probe as salted aggregation);
         the RIGHT side's rows for those few keys are pulled once, packed
         into offset arrays, ``ray.put`` once, and the skewed mass joins
         MAP-SIDE (a stateless task map, vectorized np.repeat expansion —
         no shuffle at all for the heavy rows);
  cold : the remainder — now guaranteed skew-free above min_share — takes
         the normal bytes-partitioned hash join.

Equivalent to a plain inner join for ANY key distribution (tested against
Ray's join on uniform and 90%-hot inputs). Requires disjoint non-key
column names (the generic-output contract; callers rename upfront).

Scale bound: the broadcast is (hot keys x their right-side rows) — hot keys
are at most 1/min_share by definition, so the build side stays tiny unless
the right side is ALSO skewed on the same keys; in that degenerate case the
output itself is quadratic in the hot rows and no join strategy saves it.

Measured (8-cpu single node, right side 50k 1-row keys): 8M rows at 98%
one key — skew_join 7.9 s vs plain hash join 8.3 s; 3M rows at 85% —
7.8 s vs 5.0 s (the probe + split passes cost more than the single-node
straggler tax at moderate skew). Single-node wall undersells the win: the
plain join SHIPS the hot mass to one partition — on a multi-node cluster
that is one node receiving 98% of the shuffle bytes while the rest idle,
whereas the map-side hot path moves nothing and scales with all nodes.
Use for genuinely pathological keys; plain join is the right default.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def skew_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    min_share: float = 0.05,
):
    """Inner join ``left ⋈ right`` robust to hot left keys. Returns a
    Dataset with columns = left columns + right non-key columns."""
    import ray

    from pie_ray.stages.salt import detect_hot_keys
    from pie_ray.util import join_num_partitions

    right_on = right_on or on
    left = left.materialize()  # probe + hot/cold split consume it twice
    right = right.materialize()
    l_cols = left.schema().names
    r_cols = [c for c in right.schema().names if c != right_on]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    out_cols = list(l_cols) + list(r_cols)

    hot = detect_hot_keys(left, on, min_share=min_share)

    def plain(l_ds, r_ds):
        joined = l_ds.join(
            r_ds,
            join_type="inner",
            num_partitions=join_num_partitions(r_ds.size_bytes()),
            on=(on,),
            right_on=(right_on,),
        )
        return joined.map_batches(
            lambda t: t.select(out_cols), batch_format="pyarrow"
        )

    if not hot:
        return plain(left, right)

    hot_arr = pa.array(hot)

    # build side: ONLY the hot keys' right rows, sorted by key and packed
    # into (keys, starts, ends, columns) offset arrays for O(1) lookup
    hot_batches = [
        b
        for b in right.map_batches(
            lambda t: t.filter(pc.is_in(t.column(right_on), value_set=hot_arr)),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    cold_left = left.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t.column(on), value_set=hot_arr))
        ),
        batch_format="pyarrow",
    )
    cold_right = right.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t.column(right_on), value_set=hot_arr))
        ),
        batch_format="pyarrow",
    )
    if not hot_batches:
        # hot left rows have no right matches at all: inner join drops them
        return plain(cold_left, cold_right)
    hot_right = pa.concat_tables(hot_batches).combine_chunks()
    hot_right = hot_right.take(
        pc.sort_indices(hot_right, sort_keys=[(right_on, "ascending")])
    )
    rk = hot_right.column(right_on).combine_chunks()
    rk_np = np.asarray(rk.to_pylist(), dtype=object)
    change = np.empty(len(rk_np), bool)
    change[0] = True
    change[1:] = rk_np[1:] != rk_np[:-1]
    starts = np.flatnonzero(change).astype(np.int64)
    ends = np.append(starts[1:], len(rk_np)).astype(np.int64)
    keys = rk.take(pa.array(starts))
    build_ref = ray.put((keys, starts, ends, hot_right))

    def hot_map(t: pa.Table, bref=None) -> pa.Table:
        keys_, starts_, ends_, rt = ray.get(bref)
        t = t.combine_chunks()
        # fill_null BEFORE to_numpy: a null index (unmatched hot key, i.e.
        # no right rows) would otherwise turn the whole array float64/NaN
        # and crash integer indexing below
        pos = (
            pc.fill_null(
                pc.index_in(t.column(on).combine_chunks(), value_set=keys_), -1
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # every row is a hot key by construction, but an unmatched hot key
        # must emit nothing -> count 0
        valid = pos >= 0
        cnt = np.zeros(len(pos), np.int64)
        cnt[valid] = ends_[pos[valid]] - starts_[pos[valid]]
        total = int(cnt.sum())
        left_take = np.repeat(np.arange(len(pos), dtype=np.int64), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)])[:-1]
        r_idx = (
            np.repeat(starts_[pos[valid]], cnt[valid])
            + np.arange(total, dtype=np.int64)
            - np.repeat(offs, cnt)
        ) if total else np.empty(0, np.int64)
        cols = {c: t.column(c).take(pa.array(left_take)) for c in l_cols}
        for c in r_cols:
            cols[c] = rt.column(c).take(pa.array(r_idx))
        return pa.table(cols).select(out_cols)

    hot_left = left.map_batches(
        lambda t: t.filter(pc.is_in(t.column(on), value_set=hot_arr)),
        batch_format="pyarrow",
    )
    hot_out = hot_left.map_batches(
        hot_map, fn_kwargs={"bref": build_ref}, batch_format="pyarrow"
    )
    return hot_out.union(plain(cold_left, cold_right))
