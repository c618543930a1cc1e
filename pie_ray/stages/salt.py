"""A14 — salted two-phase aggregation for Zipf-skewed hot keys.

The problem: ``groupby(key)`` ships every row of a hot key (a high-frequency
domain or person) to ONE reducer — that reducer becomes the straggler that
caps cluster throughput. The fix: phase 1 groups on ``(key, salt)`` where
``salt = hash(row-identity) % S`` spreads each hot key over S reducers for a
partial aggregate; phase 2 re-groups the (at most S per key) partials on
``key`` alone — a shuffle of |distinct keys| × S tiny rows.

In the KG pipeline the same effect is achieved structurally: every
pre-shuffle ``map_batches`` runs a vectorized per-batch combine (each Arrow
block acts as an implicit salt partition — pie_ray.stages.graph docstring),
and the shuffle itself is keyed on a uniform hash bucket. This module is
the EXPLICIT form for aggregations whose per-batch reduction is weak (hot
key spread over many blocks) — and the conformance surface for A14.

Equivalence: salted == unsalted for any commutative-associative aggregate
(sum/count/min/max) — locked by tests/unit/test_salt.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.util import hash64_array, rename_grouped

DEFAULT_SALTS = 16


def detect_hot_keys(ds, key: str, top_k: int = 20, min_share: float = 0.01) -> list:
    """A14 pre-pass: the cheap hot-key probe that decides whether salting is
    worth a second shuffle — per-batch partial counts (each batch ships at
    most its distinct keys), tiny driver combine, return the top_k keys
    holding more than ``min_share`` of all rows."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))
        gb = t.group_by([key]).aggregate([("__one", "sum")])
        return gb.rename_columns([key, "c"])

    totals: dict = {}
    n_rows = 0
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k, c in zip(batch.column(key).to_pylist(), batch.column("c").to_pylist()):
            totals[k] = totals.get(k, 0) + c
            n_rows += c
    ranked = sorted(totals.items(), key=lambda kv: (-kv[1], str(kv[0])))[:top_k]
    return [k for k, c in ranked if c >= max(1, int(min_share * n_rows))]


def salted_aggregate(
    ds,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count_alias: str = "count",
    num_salts: int = DEFAULT_SALTS,
):
    """Two-phase salted sum/count groupby.

    Returns a Dataset with columns ``[*keys, *sum_cols, count_alias]``.
    Phase 1 shuffle key = (key_hash combined with salt) — uniform even when
    one key holds most rows; phase 2 shuffle is tiny by construction.
    """
    sum_cols = sum_cols or []

    def add_salt(t: pa.Table) -> pa.Table:
        # salt must NOT be a function of the key (that would undo the
        # spreading) — derive it from the row's position-independent
        # content hash of ALL columns; cheap fallback: arange % S is fine
        # for count/sum since any spread works and determinism of the
        # AGGREGATE result is unaffected by salt assignment.
        salt = np.arange(t.num_rows, dtype=np.int64) % num_salts
        t = t.append_column("__salt", pa.array(salt, pa.int64()))
        # count via a never-null ones column: pyarrow "count" defaults to
        # only_valid, so counting a nullable summed column would drop null
        # rows and break the salted == unsalted row-count equivalence
        return t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))

    def partial(group: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [("__one", "sum")]
        gb = group.group_by([*keys, "__salt"]).aggregate(aggs)
        names = [*keys, "__salt", *sum_cols, "__n"]
        return rename_grouped(gb, [*keys, "__salt"], names)

    def final(group: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [("__n", "sum")]
        gb = group.group_by(keys).aggregate(aggs)
        return rename_grouped(gb, keys, [*keys, *sum_cols, count_alias])

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    phase1 = salted.groupby([*keys, "__salt"]).map_groups(partial, batch_format="pyarrow")
    return phase1.groupby(keys).map_groups(final, batch_format="pyarrow")


def adaptive_aggregate(
    ds,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count_alias: str = "count",
    num_salts: int = DEFAULT_SALTS,
    min_share: float = 0.05,
):
    """A14 end to end: run the hot-key probe, then salt ONLY when a key
    actually holds more than ``min_share`` of the rows — uniform keys get a
    plain one-shuffle groupby (the salted second shuffle is pure cost when
    nothing is hot). Results are identical either way (commutative
    aggregates); the probe and the aggregate share one materialization."""
    sum_cols = sum_cols or []
    ds = ds.materialize()  # consumed by the probe AND the aggregate
    hot = detect_hot_keys(ds, keys[0], min_share=min_share)
    if hot:
        return salted_aggregate(ds, keys, sum_cols, count_alias, num_salts)

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))

    def plain(group: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [("__one", "sum")]
        gb = group.group_by(keys).aggregate(aggs)
        return rename_grouped(gb, keys, [*keys, *sum_cols, count_alias])

    return (
        ds.map_batches(add_one, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(plain, batch_format="pyarrow")
    )
