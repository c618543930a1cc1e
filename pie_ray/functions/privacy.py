"""k-anonymity / l-diversity audit and suppression (public theory:
Sweeney 2002 k-anonymity; Machanavajjhala et al. 2006 l-diversity).

The privacy-side complement to pii.py's masking: pii.py hides PII INSIDE
free text, this module governs releasing STRUCTURED rows. A row is
re-identifiable when its quasi-identifier (QI) combination is shared by
fewer than k rows; a QI group leaks its sensitive attribute when the
group carries fewer than l distinct sensitive values. Two operators:

- ``qi_group_stats``  : per-QI-group (group_size, l_distinct) — per-batch
  Arrow group partials, ONE bucketed exchange on hash(QI key), vectorized
  combine (house dedup_exact shape; never a Ray groupby on the raw QI).
- ``enforce_k_anonymity`` : suppression — keep only rows whose QI group
  clears BOTH gates. Size-adaptive release: the qualifying-group set is
  broadcast (ray.put once, pc.is_in per batch — a task map, no actor
  pool) under ``QI_BROADCAST_LIMIT``; above it the filter becomes a
  left_semi hash join on the QI columns (groups, not rows, bound the
  small side — at web scale the group count is the dimension).

Generalization (coarsening QIs until groups clear k) stays the caller's
move: compose any binning map_batches BEFORE these operators (the
relational histogram/binning kernels are the building blocks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.util import (
    bucket_count,
    bucket_hash_strings,
    drop_empty_blocks,
    gather_table,
    join_num_partitions,
    rename_grouped,
)

QI_SEP = "\x1f"
QI_BROADCAST_LIMIT = 5_000_000  # qualifying groups; ~few hundred MB of keys


def _qi_key(t: pa.Table, quasi_cols: list[str]) -> pa.Array:
    """One string key per row for the QI tuple (hash/broadcast handle)."""
    arrs = [
        pc.cast(t.column(c), pa.string()).combine_chunks() for c in quasi_cols
    ]
    if len(arrs) == 1:
        return arrs[0]
    return pc.binary_join_element_wise(*arrs, QI_SEP)


def qi_group_stats(ds, quasi_cols, sensitive_col: str | None = None,
                   num_buckets: int | None = None):
    """Per-QI-group audit table ``(*quasi_cols, group_size, l_distinct)``.

    ``l_distinct`` counts distinct ``sensitive_col`` values per group
    (1 when no sensitive column is named — the pure k-anonymity case).
    Shape: per-batch Arrow group_by collapses each batch to its distinct
    (QI, sensitive) pairs with counts, ONE exchange bucketed on hash(QI)
    co-locates each group, and the combine re-groups vectorized — the
    exchange ships group-grain partials, never raw rows.
    """
    quasi_cols = list(quasi_cols)
    nb = num_buckets or bucket_count(ds.size_bytes(), floor=64)
    pair_cols = quasi_cols + ([sensitive_col] if sensitive_col else [])

    def partial(t: pa.Table) -> pa.Table:
        gb = t.select(pair_cols).group_by(pair_cols).aggregate([([], "count_all")])
        gb = rename_grouped(gb, pair_cols, pair_cols + ["cnt"])
        b = bucket_hash_strings(_qi_key(gb, quasi_cols), salt=0x5A1) % nb
        return gb.append_column("bucket", pa.array(b.astype("int32"), pa.int32()))

    def combine(g: pa.Table) -> pa.Table:
        # distinct (QI, sensitive) pairs may repeat across batches: merge
        # pair counts first, then roll up to the group grain
        pairs = rename_grouped(
            g.drop_columns(["bucket"]).group_by(pair_cols).aggregate([("cnt", "sum")]),
            pair_cols,
            pair_cols + ["cnt"],
        )
        stats = rename_grouped(
            pairs.group_by(quasi_cols).aggregate([("cnt", "sum"), ([], "count_all")]),
            quasi_cols,
            quasi_cols + ["group_size", "l_distinct"],
        )
        if not sensitive_col:
            stats = stats.set_column(
                stats.schema.get_field_index("l_distinct"),
                "l_distinct",
                pa.array(np.ones(stats.num_rows, np.int64), pa.int64()),
            )
        return stats

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )
    in_sch = ds.schema()
    sch = pa.schema(
        [(c, in_sch.types[in_sch.names.index(c)]) for c in quasi_cols]
        + [("group_size", pa.int64()), ("l_distinct", pa.int64())]
    )
    return drop_empty_blocks(out.materialize(), schema=sch)


def enforce_k_anonymity(
    ds,
    quasi_cols,
    k: int,
    sensitive_col: str | None = None,
    l: int = 1,
    broadcast_limit: int | None = None,
):
    """Suppression release: rows of ``ds`` whose QI group has
    ``group_size >= k`` AND ``l_distinct >= l`` (l-diversity gate only
    when ``sensitive_col`` is given). Row order within blocks is
    preserved; suppressed rows are dropped, never masked."""
    import ray
    import ray.data

    quasi_cols = list(quasi_cols)
    limit = QI_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    stats = qi_group_stats(ds, quasi_cols, sensitive_col=sensitive_col)
    ok = stats.map_batches(
        lambda t, _k=k, _l=l: t.filter(
            pc.and_(
                pc.greater_equal(t.column("group_size"), pa.scalar(_k)),
                pc.greater_equal(t.column("l_distinct"), pa.scalar(_l)),
            )
        ).select(quasi_cols),
        batch_format="pyarrow",
    ).materialize()
    n_ok = ok.count()
    if n_ok == 0:
        # typed-empty release (0-row join inputs crash Ray's hash shuffle,
        # and an all-empty mapped Dataset loses its schema downstream)
        in_sch = ds.schema()
        sch = pa.schema(zip(in_sch.names, in_sch.types)) if in_sch else pa.schema([])
        return ray.data.from_arrow(sch.empty_table())
    if n_ok <= limit:
        keys = _qi_key(gather_table(ok), quasi_cols)
        ref = ray.put(keys.take(pc.sort_indices(keys)))

        def keep(t: pa.Table, _ref=ref) -> pa.Table:
            return t.filter(pc.is_in(_qi_key(t, quasi_cols), value_set=ray.get(_ref)))

        return ds.map_batches(keep, batch_format="pyarrow")
    in_sch = ds.schema()
    return drop_empty_blocks(
        ds.join(
            drop_empty_blocks(ok),
            join_type="left_semi",
            num_partitions=join_num_partitions(ds.size_bytes()),
            on=tuple(quasi_cols),
            right_on=tuple(quasi_cols),
        ).materialize(),
        schema=pa.schema(zip(in_sch.names, in_sch.types)) if in_sch else None,
    )


K_ANON_K = 5
K_ANON_L = 3


def q_k_anonymize(sf_dir: str):
    """Driver entry (SQL-oracled): the k-anonymous, l-diverse release of
    customer rows — QI = nationality, sensitive = market segment. Rows in
    nation groups smaller than k=5 or with fewer than l=3 distinct
    segments are suppressed (at sf0.001 this genuinely suppresses; at
    sf0.01 every nation clears both gates — the pass-through case)."""
    import ray.data

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    return enforce_k_anonymity(
        cust,
        ["c_nationkey"],
        k=K_ANON_K,
        sensitive_col="c_mktsegment",
        l=K_ANON_L,
    )


K_ANONYMIZE_ORACLE_SQL = f"""
    SELECT c_custkey, c_nationkey, c_mktsegment
    FROM customer
    WHERE c_nationkey IN (
      SELECT c_nationkey FROM customer
      GROUP BY c_nationkey
      HAVING COUNT(*) >= {K_ANON_K}
         AND COUNT(DISTINCT c_mktsegment) >= {K_ANON_L})
"""
