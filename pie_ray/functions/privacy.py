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

QI_ESC, QI_SEP, QI_NULL = "\x1d", "\x1f", "\x1e"
QI_BROADCAST_LIMIT = 5_000_000  # qualifying groups; ~few hundred MB of keys


def _qi_key(t: pa.Table, quasi_cols: list[str]) -> pa.Array:
    """INJECTIVE, null-safe string key for the QI tuple. Components are
    escape-framed (ESC doubles itself and prefixes SEP/NULL bytes inside
    values — distinct tuples can never collide even when values contain
    the control bytes), nulls become the bare NULL sentinel, then the
    frames are SEP-joined. Null QI values therefore form their own group,
    and every membership path (broadcast pc.is_in AND the key-based hash
    join) sees the identical grouping — plain column joins would silently
    drop null keys."""
    parts = []
    for c in quasi_cols:
        s = pc.cast(t.column(c), pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.replace_substring(s, QI_ESC, QI_ESC + QI_ESC)
        s = pc.replace_substring(s, QI_SEP, QI_ESC + QI_SEP)
        s = pc.replace_substring(s, QI_NULL, QI_ESC + QI_NULL)
        s = pc.fill_null(s, QI_NULL)
        parts.append(s)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, QI_SEP)


def qi_group_stats(ds, quasi_cols, sensitive_col: str | None = None,
                   num_buckets: int | None = None):
    """Per-QI-group audit table ``(*quasi_cols, group_size, l_distinct)``.

    ``l_distinct`` counts distinct NON-NULL ``sensitive_col`` values per
    group (SQL ``COUNT(DISTINCT ...)`` semantics; 1 when no sensitive
    column is named — the pure k-anonymity case). ``group_size`` counts
    every row. Shape: per-batch Arrow group_by collapses each batch to
    its distinct (QI, sensitive) pairs with counts, ONE exchange bucketed
    on hash(QI) co-locates each group, and the combine re-groups
    vectorized — the exchange ships group-grain partials, never raw rows.
    """
    quasi_cols = list(quasi_cols)
    ds = ds.materialize()  # size_bytes() on a mapped plan would EXECUTE it
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
        sizes = rename_grouped(
            pairs.group_by(quasi_cols).aggregate([("cnt", "sum")]),
            quasi_cols,
            quasi_cols + ["group_size"],
        )
        if not sensitive_col:
            return sizes.append_column(
                "l_distinct",
                pa.array(np.ones(sizes.num_rows, np.int64), pa.int64()),
            )
        # COUNT(DISTINCT sensitive) ignores NULLs (SQL semantics): an
        # all-null group gets l_distinct = 0, never a free diversity point
        valid = pairs.filter(
            pc.is_valid(pairs.column(sensitive_col).combine_chunks())
        )
        ls = rename_grouped(
            valid.group_by(quasi_cols).aggregate([([], "count_all")]),
            quasi_cols,
            quasi_cols + ["l_distinct"],
        )
        idx = pc.index_in(_qi_key(sizes, quasi_cols), value_set=_qi_key(ls, quasi_cols))
        lvals = pc.fill_null(pc.take(ls.column("l_distinct"), idx), 0)
        return sizes.append_column("l_distinct", pc.cast(lvals, pa.int64()))

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
    when ``sensitive_col`` is given — passing ``l > 1`` without one is an
    error, not a silent suppress-everything). Null QI values form their
    own group on every path. Row order within blocks is preserved;
    suppressed rows are dropped, never masked."""
    quasi_cols = list(quasi_cols)
    if sensitive_col is None and l > 1:
        raise ValueError(
            "enforce_k_anonymity: l > 1 needs a sensitive_col (without one "
            "l_distinct is fixed at 1 and every group would be suppressed)"
        )
    limit = QI_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    ds = ds.materialize()  # stats + release re-consume; never re-execute
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
    kept, _ = _split_on_membership(ds, quasi_cols, ok, limit, want_rest=False)
    return kept


def _passing_groups(ds, col: str, k: int):
    """Distinct ``col`` values whose group has >= k rows (materialized)."""
    stats = qi_group_stats(ds, [col])
    return stats.map_batches(
        lambda t, _k=k: t.filter(
            pc.greater_equal(t.column("group_size"), pa.scalar(_k))
        ).select([col]),
        batch_format="pyarrow",
    ).materialize()


def _split_on_membership(ds, quasi_cols, members, limit: int,
                         want_rest: bool = True):
    """(rows whose QI tuple is in ``members``, the rest) — the ONE
    membership mechanism every release path shares. Both paths compare
    the same injective ``_qi_key`` string (broadcast ``pc.is_in`` task
    maps under ``limit`` members; a left_semi/left_anti hash join ON THE
    KEY COLUMN above it — joining raw columns would drop null keys and
    diverge from the broadcast path). ``ds`` and ``members`` must be
    materialized; ``members`` is distinct over ``quasi_cols``. With
    ``want_rest=False`` the second element is None and its pass/join is
    skipped."""
    import ray
    import ray.data

    quasi_cols = list(quasi_cols)
    n = members.count()
    in_sch = ds.schema()
    sch = pa.schema(zip(in_sch.names, in_sch.types)) if in_sch else pa.schema([])
    if n == 0:
        empty = ray.data.from_arrow(sch.empty_table())
        return empty, (ds if want_rest else None)
    if n <= limit:
        keys = _qi_key(gather_table(members), quasi_cols)
        ref = ray.put(keys.take(pc.sort_indices(keys)))

        def _mask(t: pa.Table, _ref=ref) -> pa.Array:
            return pc.is_in(_qi_key(t, quasi_cols), value_set=ray.get(_ref))

        kept = ds.map_batches(
            lambda t: t.filter(_mask(t)), batch_format="pyarrow"
        )
        rest = (
            ds.map_batches(
                lambda t: t.filter(pc.invert(_mask(t))), batch_format="pyarrow"
            )
            if want_rest
            else None
        )
        return kept, rest
    n_parts = join_num_partitions(ds.size_bytes())

    def _with_key(t: pa.Table) -> pa.Table:
        return t.append_column("__qi_key", _qi_key(t, quasi_cols))

    left = ds.map_batches(_with_key, batch_format="pyarrow").materialize()
    right = drop_empty_blocks(
        members.map_batches(
            lambda t: pa.table({"__qi_key": _qi_key(t, quasi_cols)}),
            batch_format="pyarrow",
        ).materialize()
    )
    out = []
    for jt in ("left_semi",) + (("left_anti",) if want_rest else ()):
        joined = drop_empty_blocks(
            left.join(
                right,
                join_type=jt,
                num_partitions=n_parts,
                on=("__qi_key",),
                right_on=("__qi_key",),
            ).materialize(),
            schema=sch,  # all-empty case: typed WITHOUT the key column
        )
        out.append(
            joined.map_batches(
                lambda t: t.drop_columns(["__qi_key"])
                if "__qi_key" in t.column_names
                else t,
                batch_format="pyarrow",
            )
        )
    return out[0], (out[1] if want_rest else None)


def generalize_to_k(
    ds,
    ladder_cols,
    k: int,
    all_label: str = "ALL",
    broadcast_limit: int | None = None,
):
    """k-anonymity by LOCAL-RECODING GENERALIZATION down a QI hierarchy
    (Sweeney 2002's ladder, e.g. nation -> region -> ALL): each row keeps
    the FINEST ladder level at which its group (among rows not already
    released at a finer level) reaches k. Nothing is suppressed — rows
    that fail every level coarsen to ``all_label``.

    Returns ``ds``'s columns plus ``qi_level`` (int64 ladder index;
    len(ladder_cols) = the ALL level) and ``qi_value`` (the released
    value as a string). Ladder columns must be int or string (their
    string form must match SQL ``CAST(x AS VARCHAR)`` for the oracle).
    Each level costs one group-stats exchange plus a broadcast split
    (joins past ``broadcast_limit``); L is small by construction."""
    import ray
    import ray.data

    ladder_cols = list(ladder_cols)
    limit = QI_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    in_sch = ds.schema()
    names = list(in_sch.names) if in_sch else []

    def _tag(lvl: int, col: str | None):
        def fn(t: pa.Table, _lvl=lvl, _col=col) -> pa.Table:
            qi = (
                pc.cast(t.column(_col), pa.string())
                if _col is not None
                else pa.array([all_label] * t.num_rows, pa.string())
            )
            return t.append_column(
                "qi_level",
                pa.array(np.full(t.num_rows, _lvl, np.int64), pa.int64()),
            ).append_column("qi_value", qi)

        return fn

    remaining = ds.materialize()
    pieces = []
    for lvl, col in enumerate(ladder_cols):
        if remaining.count() == 0:
            break
        ok = _passing_groups(remaining, col, k)
        kept, remaining = _split_on_membership(remaining, [col], ok, limit)
        kept = kept.materialize()
        remaining = remaining.materialize()
        if kept.count() > 0:
            pieces.append(
                kept.map_batches(_tag(lvl, col), batch_format="pyarrow").materialize()
            )
    if remaining.count() > 0:
        pieces.append(
            remaining.map_batches(
                _tag(len(ladder_cols), None), batch_format="pyarrow"
            ).materialize()
        )
    sch = pa.schema(
        [(n, t) for n, t in zip(names, in_sch.types)]
        + [("qi_level", pa.int64()), ("qi_value", pa.string())]
    ) if in_sch else pa.schema([("qi_level", pa.int64()), ("qi_value", pa.string())])
    if not pieces:
        return ray.data.from_arrow(sch.empty_table())
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return drop_empty_blocks(out.materialize(), schema=sch)


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


def q_k_generalize(sf_dir: str):
    """Driver entry (SQL-oracled): local-recoding generalization of the
    customer QI down the real nation -> region -> ALL hierarchy at k=5.
    Each customer is released at the finest level whose group reaches k
    among not-yet-released rows (at sf0.001 all three levels genuinely
    fire: 124/18/8 rows; at sf0.01 every nation clears k — pass-through).
    The region key rides in via the house broadcast-lookup task map (the
    dimension never shuffles)."""
    import ray
    import ray.data

    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).take_all()
    ks = sorted(r["n_nationkey"] for r in nat)
    by_key = {r["n_nationkey"]: r["n_regionkey"] for r in nat}
    ref = ray.put(
        (pa.array(ks, pa.int64()), pa.array([by_key[k] for k in ks], pa.int64()))
    )

    def add_region(t: pa.Table, _ref=ref) -> pa.Table:
        keys, vals = ray.get(_ref)
        idx = pc.index_in(t.column("c_nationkey").combine_chunks(), value_set=keys)
        return t.append_column("c_regionkey", pc.take(vals, idx))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(add_region, batch_format="pyarrow")
    out = generalize_to_k(cust, ["c_nationkey", "c_regionkey"], k=K_ANON_K)
    return out.map_batches(
        lambda t: t.select(["c_custkey", "qi_level", "qi_value"]),
        batch_format="pyarrow",
    )


K_GENERALIZE_ORACLE_SQL = f"""
    WITH cr AS (
      SELECT c_custkey, c_nationkey, n_regionkey AS c_regionkey
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), l0ok AS (
      SELECT c_nationkey FROM cr GROUP BY 1 HAVING COUNT(*) >= {K_ANON_K}
    ), r0 AS (
      SELECT * FROM cr
      WHERE c_nationkey NOT IN (SELECT c_nationkey FROM l0ok)
    ), l1ok AS (
      SELECT c_regionkey FROM r0 GROUP BY 1 HAVING COUNT(*) >= {K_ANON_K}
    ), r1 AS (
      SELECT * FROM r0
      WHERE c_regionkey NOT IN (SELECT c_regionkey FROM l1ok)
    )
    SELECT c_custkey, CAST(0 AS BIGINT) AS qi_level,
           CAST(c_nationkey AS VARCHAR) AS qi_value
    FROM cr WHERE c_nationkey IN (SELECT c_nationkey FROM l0ok)
    UNION ALL
    SELECT c_custkey, CAST(1 AS BIGINT), CAST(c_regionkey AS VARCHAR)
    FROM r0 WHERE c_regionkey IN (SELECT c_regionkey FROM l1ok)
    UNION ALL
    SELECT c_custkey, CAST(2 AS BIGINT), 'ALL' FROM r1
"""


# ---------------------------------------------------------------------------
# Differential privacy: per-group noisy COUNT + clipped SUM release
# (Dwork et al. 2006 Laplace mechanism, in the discrete two-sided-geometric
# form of Ghosh-Roughgarden-Sundararajan 2009 — integer noise, so the
# engine's exact-cents arithmetic carries through unchanged)
# ---------------------------------------------------------------------------

DP_COUNT_EPS = 1.0
DP_SUM_EPS = 0.5
DP_SUM_CLIP = 200_000.0  # dollars; sensitivity of the clipped sum
DP_SEED = 7


def _dp_u64(key: str) -> int:
    """The md5_number_lower integer (low 8 digest bytes, little-endian) —
    the SAME content-derived uniform source the oracled weighted-sampling
    path uses, so DuckDB reproduces every draw bit-for-bit."""
    import hashlib

    return int.from_bytes(hashlib.md5(key.encode()).digest()[8:16], "little")


def _dp_geometric(key: str, denom: float) -> int:
    """floor(ln(1 - u) / denom) with u = md5-uniform(key) in [0, 1) and
    denom = -epsilon/sensitivity < 0: a geometric draw with success
    probability 1 - exp(denom). Scalar math.log = libm, the same code
    path DuckDB's ln() takes, so engine and oracle agree bit-for-bit."""
    import math

    u = _dp_u64(key) / 18446744073709551616.0
    return math.floor(math.log(1.0 - u) / denom)


def dp_noise(key: str, epsilon: float, sensitivity: float, seed: int) -> int:
    """Two-sided geometric (discrete Laplace) noise for one released cell:
    the difference of two independent geometric draws, each keyed on
    (cell key, channel tag, seed). E[noise] = 0, and the release of
    value + noise is epsilon-DP at the given sensitivity.

    The draws are CONTENT-DERIVED (md5 of the cell key + seed), not from
    an OS RNG — the same trade every seeded-PRNG DP implementation makes:
    the epsilon guarantee holds against adversaries without the seed,
    and in exchange the release is reproducible across runs, partitioning
    and engines (and therefore SQL-oracle-able)."""
    denom = -epsilon / sensitivity
    return _dp_geometric(f"{key}|dp1|{seed}", denom) - _dp_geometric(
        f"{key}|dp2|{seed}", denom
    )


def dp_group_release(
    ds,
    key_col: str,
    val_col: str,
    *,
    clip: float = DP_SUM_CLIP,
    count_eps: float = DP_COUNT_EPS,
    sum_eps: float = DP_SUM_EPS,
    seed: int = DP_SEED,
):
    """Differentially private per-group release: noisy COUNT (sensitivity
    1) + noisy clipped SUM (values clamped to [0, clip] dollars, so one
    row moves the sum by at most clip — the standard contribution bound).
    Total budget by sequential composition = count_eps + sum_eps,
    reported in the epsilon_total column.

    Distribution shape: per-batch Arrow group partials + one driver
    combine (lowcard_group_agg — group count is the dimension, never the
    corpus), then noise is drawn per released CELL from the md5 of its
    group key. No shuffle; adding a group's noise costs O(groups)."""
    from pie_ray.functions.relational import cents, lowcard_group_agg

    clip_c = int(round(clip * 100))

    def derive(t: pa.Table) -> pa.Table:
        v = pc.max_element_wise(
            pc.min_element_wise(cents(t.column(val_col)), pa.scalar(clip_c, pa.int64())),
            pa.scalar(0, pa.int64()),
        )
        return pa.table({key_col: t.column(key_col), "clipped_c": v})

    agg = lowcard_group_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys=[key_col],
        sum_cols=["clipped_c"],
        count_alias="n",
    )
    keys = agg.column(key_col).to_pylist()
    n = agg.column("n").to_pylist()
    s = agg.column("clipped_c__sum").to_pylist()
    noisy_n = [
        ni + dp_noise(f"{k}|cnt", count_eps, 1.0, seed) for k, ni in zip(keys, n)
    ]
    noisy_s = [
        (si + dp_noise(f"{k}|sum", sum_eps, clip_c, seed)) / 100.0
        for k, si in zip(keys, s)
    ]
    return pa.table(
        {
            key_col: agg.column(key_col),
            "noisy_count": pa.array(noisy_n, pa.int64()),
            "noisy_sum": pa.array(noisy_s, pa.float64()),
            "epsilon_total": pa.array([count_eps + sum_eps] * len(keys), pa.float64()),
        }
    )


def q_dp_release(sf_dir: str):
    """Driver entry (SQL-oracled): epsilon-DP release of order counts and
    clipped total-price sums per order status (eps = 1.0 count + 0.5 sum).
    The oracle reproduces the geometric draws exactly via
    md5_number_lower + ln — same pattern as the sample_weighted oracle."""
    import ray.data

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )
    return dp_group_release(orders, "o_orderstatus", "o_totalprice")


def _dp_geom_sql(key_expr: str, tag: str, denom: float) -> str:
    return (
        f"CAST(floor(ln(1 - md5_number_lower({key_expr} || '|{tag}|{DP_SEED}')"
        f" / 18446744073709551616.0) / ({denom!r})) AS BIGINT)"
    )


def _dp_noise_sql(key_expr: str, chan: str, denom: float) -> str:
    k = f"({key_expr} || '|{chan}')"
    return f"({_dp_geom_sql(k, 'dp1', denom)} - {_dp_geom_sql(k, 'dp2', denom)})"


DP_RELEASE_ORACLE_SQL = f"""
    WITH g AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             SUM(LEAST(GREATEST(CAST(round(o_totalprice * 100) AS BIGINT), 0),
                       {int(DP_SUM_CLIP * 100)})) AS s
      FROM orders GROUP BY 1
    )
    SELECT o_orderstatus,
           n + {_dp_noise_sql('o_orderstatus', 'cnt', -DP_COUNT_EPS / 1.0)}
             AS noisy_count,
           (s + {_dp_noise_sql('o_orderstatus', 'sum', -DP_SUM_EPS / (DP_SUM_CLIP * 100))})
             / 100.0 AS noisy_sum,
           CAST({DP_COUNT_EPS + DP_SUM_EPS!r} AS DOUBLE) AS epsilon_total
    FROM g
"""
