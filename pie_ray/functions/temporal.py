"""Temporal join operators Ray Data lacks natively (driver-instruction
examples: as-of join, range join) — implemented as ONE bucket shuffle on the
key + a vectorized per-bucket pass (sort + shift / searchsorted). Partitioning
assumption (documented per instructions): all rows of one key fit one bucket
group; keys are users, so even heavy users are millions of rows — fine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pie_ray.util import hash64_ints

N_BUCKETS = 32


def _bucketed_events(sf_dir: str, columns: list[str]):
    from pie_ray.util import bucket_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)
    nb = bucket_count(ds.size_bytes(), floor=N_BUCKETS)

    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized int-key bucket hash (splitmix64) — no per-row Python
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=6)
            % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def q_asof_prev_event(sf_dir: str):
    """AS-OF (time-ordered lag) self-join: for every event, the value of the
    same user's immediately preceding event in (ts, event_id) order — NULL
    for each user's first event."""

    def prev_batch(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        vals = g.column("value").to_numpy(zero_copy_only=False)
        n = len(users)
        prev = np.empty(n, np.float64)
        valid = np.zeros(n, bool)
        if n:
            prev[1:] = vals[:-1]
            valid[1:] = users[1:] == users[:-1]
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "prev_value": pa.array(
                    [float(p) if v else None for p, v in zip(prev, valid)], pa.float64()
                ),
            }
        )

    return (
        _bucketed_events(sf_dir, ["event_id", "user_id", "ts", "value"])
        .groupby("bucket")
        .map_groups(prev_batch, batch_format="pyarrow")
    )


RANGE_WINDOW_US = 3600 * 1_000_000  # +- 1 hour


def q_temporal_join_events(sf_dir: str):
    """As-of lag AND ±1h range-count under ONE driver entry: one bucket
    shuffle on hash(user), one vectorized sorted pass computing both
    columns (q_asof_prev_event / q_range_join_events remain the library
    surface — this merged form halves the shuffles the driver pays)."""

    def both_batch(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        vals = g.column("value").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(users)
        prev = np.empty(n, np.float64)
        valid = np.zeros(n, bool)
        counts = np.zeros(n, np.int64)
        if n:
            prev[1:] = vals[:-1]
            valid[1:] = users[1:] == users[:-1]
            new = np.empty(n, bool)
            new[0] = True
            new[1:] = users[1:] != users[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                seg = ts[s:e]
                lo = np.searchsorted(seg, seg - RANGE_WINDOW_US, side="left")
                hi = np.searchsorted(seg, seg + RANGE_WINDOW_US, side="right")
                counts[s:e] = hi - lo - 1  # exclude self
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "prev_value": pa.array(
                    [float(p) if v else None for p, v in zip(prev, valid)], pa.float64()
                ),
                "n_within_1h": pa.array(counts),
            }
        )

    return (
        _bucketed_events(sf_dir, ["event_id", "user_id", "ts", "value"])
        .groupby("bucket")
        .map_groups(both_batch, batch_format="pyarrow")
    )


def q_range_join_events(sf_dir: str):
    """Range self-join: for every event, how many OTHER events of the same
    user fall within +-1 hour of it. Vectorized per bucket: per-user sorted
    timestamps + two searchsorted calls (no pairwise materialization)."""

    def range_batch(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(users)
        out = np.zeros(n, np.int64)
        if n:
            new = np.empty(n, bool)
            new[0] = True
            new[1:] = users[1:] != users[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                seg = ts[s:e]
                lo = np.searchsorted(seg, seg - RANGE_WINDOW_US, side="left")
                hi = np.searchsorted(seg, seg + RANGE_WINDOW_US, side="right")
                out[s:e] = hi - lo - 1  # exclude self
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "n_within_1h": pa.array(out),
            }
        )

    return (
        _bucketed_events(sf_dir, ["event_id", "user_id", "ts"])
        .groupby("bucket")
        .map_groups(range_batch, batch_format="pyarrow")
    )
