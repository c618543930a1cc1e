"""Part B — generic relational operator surface (SURVEY.md §2 Part B).

Thin, named wrappers over Ray Data primitives; each query function takes
``sf_dir`` (a directory of TPC-H-ish parquet tables) and returns a
``ray.data.Dataset`` whose column NAMES match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql()`` exactly.

Scale rules baked in (SURVEY.md §4):
- column pruning at the read (``read_parquet(columns=...)``);
- per-batch work is pyarrow.compute kernels — no Python row loops;
- small-side joins are broadcast (dict / set shipped once via the actor
  constructor), only the big⋈big paths use the hash-shuffle ``Dataset.join``;
- grouped aggregates use built-in ``groupby().aggregate`` (partial + final
  combining inside Ray Data's hash-shuffle aggregator).

Never calls ray.init — session owned by the caller (driver contract
``__ray_entry__`` lines 11-13).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Mean, Min


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# Exact money arithmetic + low-cardinality partial aggregation
#
# The driver's correctness gate hashes values EXACTLY, so float aggregates
# must be bit-identical to the DuckDB oracle. Money columns in the TPC-H-ish
# testdata are 2-decimal fixed-point stored as float64; summing them as
# scaled int64 ("cents") is exact and order-independent, and the matching
# oracle SQL sums CAST(round(x*100) AS BIGINT) the same way. Final division
# back to dollars is one correctly-rounded double op on both sides.
#
# For group keys with a handful of distinct values (return flags, market
# segments, order priorities) a Ray hash-shuffle groupby pays seconds of
# aggregator startup to move a few hundred partial rows. Instead: per-batch
# Arrow ``group_by`` partials inside ``map_batches`` (vectorized, exact
# int64 sums), then ONE tiny driver-side combine of ≤ blocks × groups rows.
# At 100 TB the partials stay proportional to #groups, not #rows.
# ---------------------------------------------------------------------------


def cents(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Exact scaled-int conversion of a 2-decimal money column."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def lowcard_group_agg(ds, keys: list[str], sum_cols: list[str], count_alias: str | None = None):
    """Partial-aggregate ``sum_cols`` (int64) + row count per ``keys`` inside
    each batch, then combine the tiny partials once on the driver.

    Returns a pyarrow Table with columns ``keys + [f"{c}__sum"] + [count]``
    sorted by keys. Caller derives the final (float) output columns."""
    from pie_ray.util import rename_grouped

    # the count rides a never-null __one column (same guard as
    # salted_aggregate): pyarrow's ("col", "count") defaults to only_valid,
    # so counting a key column would under-count null-keyed groups vs the
    # oracle's COUNT(*)
    aggs = [(c, "sum") for c in sum_cols] + [("__one", "sum")]

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))
        return t.group_by(keys).aggregate(aggs)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(parts)
    final = merged.group_by(keys).aggregate(
        [(f"{c}_sum", "sum") for c in sum_cols] + [("__one_sum", "sum")]
    )
    final = rename_grouped(
        final, keys, keys + [f"{c}__sum" for c in sum_cols] + [count_alias or "__count"]
    )
    return final.sort_by([(k, "ascending") for k in keys])


def scan(sf_dir: str, name: str, columns: list[str] | None = None):
    """B1 — parquet scan with column pruning pushed to the reader."""
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns)


# ---------------------------------------------------------------------------
# B1: scan + projection + filter
# ---------------------------------------------------------------------------


def q_filter_project(sf_dir: str):
    """High-quantity recent lineitems; predicate + projection pushed down."""
    ds = scan(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    return ds.filter(expr="l_quantity > 45")


# ---------------------------------------------------------------------------
# B2: per-row scalar functions (string / date / math / JSON) — pc kernels
# ---------------------------------------------------------------------------


def q_string_funcs(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        name = t.column("p_name")
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "name_upper": pc.utf8_upper(name),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "brand_suffix": pc.utf8_slice_codeunits(t.column("p_brand"), 6, 100),
                "type_first": pc.list_element(pc.split_pattern(t.column("p_type"), " "), 0),
            }
        )

    return scan(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"]).map_batches(
        fn, batch_format="pyarrow"
    )


def q_date_funcs(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(d), pa.int64()),
                "o_month": pc.cast(pc.month(d), pa.int64()),
                "o_day": pc.cast(pc.day(d), pa.int64()),
            }
        )

    return scan(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        fn, batch_format="pyarrow"
    )


_JSON_K_PATTERN = r'"k":\s*(?P<k>-?\d+)'


def q_json_extract(sf_dir: str):
    """JSON field extract from events.props (vectorized regex — the props
    payloads are flat one-key objects), then grouped sum."""

    def fn(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), _JSON_K_PATTERN)
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    ds = scan(sf_dir, "events", columns=["event_type", "props"]).map_batches(
        fn, batch_format="pyarrow"
    )
    agg = lowcard_group_agg(ds, keys=["event_type"], sum_cols=["k"], count_alias="n")
    return pa.table(
        {
            "event_type": agg.column("event_type"),
            "sum_k": agg.column("k__sum"),
            "n": agg.column("n"),
        }
    )


# ---------------------------------------------------------------------------
# B3: global aggregates
# ---------------------------------------------------------------------------


def q_global_agg(sf_dir: str):
    """B3 global aggregates — count/sum/min/max PLUS std and count-distinct
    — in ONE distributed pass of per-batch partials (each batch ships 6
    scalars + its bounded distinct-value list; driver combine is O(blocks)).

    Bit-exactness: l_quantity is integer-valued, so Σx and Σx² are exact
    int64 partial sums; stddev_samp computes from the SAME closed form as
    the oracle (sqrt((nΣx² - (Σx)²)/(n(n-1)))) — one identical float
    expression, no accumulation drift."""
    import math

    ds = scan(sf_dir, "lineitem", columns=["l_quantity", "l_shipdate", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # years.min() raises on a zero-size array
            return pa.table({
                "n": pa.array([], pa.int64()), "s1": pa.array([], pa.int64()),
                "s2": pa.array([], pa.int64()), "sy": pa.array([], pa.int64()),
                "sy2": pa.array([], pa.int64()), "sxy": pa.array([], pa.int64()),
                "distinct": pa.array([], pa.list_(pa.int64())),
                "min_year": pa.array([], pa.int64()),
                "max_year": pa.array([], pa.int64()),
            })
        q = pc.cast(t.column("l_quantity"), pa.int64())
        qn = q.to_numpy(zero_copy_only=False)
        years = pc.cast(pc.year(t.column("l_shipdate")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # discount in exact integer percent (values are 0.00..0.10 in cent
        # steps) — keeps every corr sum an exact int64 at any scale factor
        dn = np.round(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(qn)], pa.int64()),
                "s1": pa.array([int(qn.sum())], pa.int64()),
                "s2": pa.array([int((qn * qn).sum())], pa.int64()),
                "sy": pa.array([int(dn.sum())], pa.int64()),
                "sy2": pa.array([int((dn * dn).sum())], pa.int64()),
                "sxy": pa.array([int((qn * dn).sum())], pa.int64()),
                "distinct": pa.array([np.unique(qn).tolist()], pa.list_(pa.int64())),
                "min_year": pa.array([int(years.min())], pa.int64()),
                "max_year": pa.array([int(years.max())], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    s1 = sum(r["s1"] for r in rows)
    s2 = sum(r["s2"] for r in rows)
    sy = sum(r["sy"] for r in rows)
    sy2 = sum(r["sy2"] for r in rows)
    sxy = sum(r["sxy"] for r in rows)
    distinct: set[int] = set()
    for r in rows:
        distinct.update(r["distinct"])
    std = math.sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1))) if n > 1 else 0.0
    # Pearson corr from the SAME closed form (and the same float-conversion
    # points) as the oracle SQL: exact integer moments, then
    # num / (sqrt(dx) * sqrt(dy)) evaluated once in float
    num = n * sxy - s1 * sy
    dx = n * s2 - s1 * s1
    dy = n * sy2 - sy * sy
    corr = float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy))) if dx and dy else 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_qty": pa.array([float(s1)], pa.float64()),
            "min_year": pa.array([min(r["min_year"] for r in rows)], pa.int64()),
            "max_year": pa.array([max(r["max_year"] for r in rows)], pa.int64()),
            "mean_qty": pa.array([s1 * 1.0 / n], pa.float64()),
            "std_qty": pa.array([std], pa.float64()),
            "n_distinct_qty": pa.array([len(distinct)], pa.int64()),
            "corr_qty_disc": pa.array([corr], pa.float64()),
        }
    )


# (q_global_stats was merged into q_global_agg above — one distributed
# pass now carries all seven global aggregates under one driver entry.)


# ---------------------------------------------------------------------------
# B4: grouped aggregate — TPC-H Q1-style pricing summary
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    ds = scan(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        # exact fixed-point: price in cents, discount/tax in percent points;
        # disc_price in 1e-4 dollars, charge in 1e-6 dollars — int64 sums are
        # exact and independent of summation order (bit-stable vs the oracle)
        p = cents(t.column("l_extendedprice"))
        d = cents(t.column("l_discount"))
        x = cents(t.column("l_tax"))
        dp4 = pc.multiply(p, pc.subtract(pa.scalar(100, pa.int64()), d))
        ch6 = pc.multiply(dp4, pc.add(pa.scalar(100, pa.int64()), x))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_c": p,
                "dp4": dp4,
                "ch6": ch6,
                "disc_c": d,
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    agg = lowcard_group_agg(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["qty", "price_c", "dp4", "ch6", "disc_c"],
        count_alias="count_order",
    )
    n = agg.column("count_order")
    qty = pc.cast(agg.column("qty__sum"), pa.float64())
    return pa.table(
        {
            "l_returnflag": agg.column("l_returnflag"),
            "l_linestatus": agg.column("l_linestatus"),
            "sum_qty": qty,
            "sum_base_price": pc.divide(
                pc.cast(agg.column("price_c__sum"), pa.float64()), pa.scalar(100.0)
            ),
            "sum_disc_price": pc.divide(
                pc.cast(agg.column("dp4__sum"), pa.float64()), pa.scalar(10000.0)
            ),
            "sum_charge": pc.divide(
                pc.cast(agg.column("ch6__sum"), pa.float64()), pa.scalar(1000000.0)
            ),
            "avg_qty": pc.divide(qty, pc.cast(n, pa.float64())),
            "avg_disc": pc.divide(
                pc.cast(agg.column("disc_c__sum"), pa.float64()),
                pc.multiply(pa.scalar(100.0), pc.cast(n, pa.float64())),
            ),
            "count_order": n,
        }
    )


# ---------------------------------------------------------------------------
# B5: joins
# ---------------------------------------------------------------------------


def q_join_customer_orders(sf_dir: str):
    """Hash join customer⋈orders (big⋈big path) → per-segment order stats."""
    from pie_ray.util import join_num_partitions

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = scan(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_num_partitions(orders.size_bytes()),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "price_c": cents(t.column("o_totalprice")),
            }
        )

    agg = lowcard_group_agg(
        joined.map_batches(derive, batch_format="pyarrow"),
        keys=["c_mktsegment"],
        sum_cols=["price_c"],
        count_alias="n_orders",
    )
    return pa.table(
        {
            "c_mktsegment": agg.column("c_mktsegment"),
            "n_orders": agg.column("n_orders"),
            "sum_price": pc.divide(
                pc.cast(agg.column("price_c__sum"), pa.float64()), pa.scalar(100.0)
            ),
        }
    )


def _broadcast_lookup_batch(t: pa.Table, lookup_ref=None, key: str = "", out_col: str = "") -> pa.Table:
    """Map-side broadcast join as a task map: the small-side (keys, vals)
    arrays are ray.put() once; ray.get per batch is a local zero-copy
    plasma read. Vectorized index_in + take; misses stay null, matching
    dict.get(k) -> None."""
    import ray

    keys, vals = ray.get(lookup_ref)
    idx = pc.index_in(t.column(key).combine_chunks(), value_set=keys)
    return t.append_column(out_col, pc.take(vals, idx))


def q_broadcast_join_nation_region(sf_dir: str):
    """customer⋈nation⋈region with both dims broadcast (never shuffled)."""
    import ray

    nation = scan(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).take_all()
    region = scan(sf_dir, "region", columns=["r_regionkey", "r_name"]).take_all()
    r_by_key = {r["r_regionkey"]: r["r_name"] for r in region}
    nation_to_region = {n["n_nationkey"]: r_by_key[n["n_regionkey"]] for n in nation}
    ks = sorted(nation_to_region)
    ref = ray.put((pa.array(ks), pa.array([nation_to_region[k] for k in ks])))

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    with_region = cust.map_batches(
        _broadcast_lookup_batch,
        fn_kwargs={"lookup_ref": ref, "key": "c_nationkey", "out_col": "r_name"},
        batch_format="pyarrow",
    )
    # 5 region groups: per-batch partial counts + driver combine — a Ray
    # hash-shuffle groupby pays seconds of aggregator spin-up for 5 rows
    agg = lowcard_group_agg(with_region, keys=["r_name"], sum_cols=[], count_alias="n_customers")
    return agg.select(["r_name", "n_customers"])


def q_semi_join(sf_dir: str):
    """Customers having at least one high-value order (left_semi)."""
    from pie_ray.util import join_num_partitions

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_name"])
    raw_orders = scan(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    orders = raw_orders.filter(expr="o_totalprice > 200000.0")
    return cust.join(
        orders,
        join_type="left_semi",
        num_partitions=join_num_partitions(raw_orders.size_bytes()),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


def q_anti_join(sf_dir: str):
    """Customers with no order above 300k (left_anti)."""
    from pie_ray.util import join_num_partitions

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_name"])
    raw_orders = scan(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    orders = raw_orders.filter(expr="o_totalprice > 300000.0")
    return cust.join(
        orders,
        join_type="left_anti",
        num_partitions=join_num_partitions(raw_orders.size_bytes()),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


def _tag_op(ds, op: str):
    """Append a literal ``op`` column (used by the merged driver entries
    that union two related operators under one correctness row)."""

    def fn(t: pa.Table, _op=op) -> pa.Table:
        return t.append_column("op", pa.array([_op] * t.num_rows, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def q_semi_anti_join(sf_dir: str):
    """B5 semi + anti joins under ONE driver entry (op-tagged union); the
    individual q_semi_join / q_anti_join remain the library surface.
    Each side materializes before the union — two hash-join exchanges live
    in one streaming plan deadlock small CPU budgets (each exchange holds
    its aggregator actors for its whole lifetime)."""
    semi = _tag_op(q_semi_join(sf_dir), "semi").materialize()
    anti = _tag_op(q_anti_join(sf_dir), "anti").materialize()
    return semi.union(anti)


def q_setops_nations(sf_dir: str):
    """B8 EXCEPT + INTERSECT + UNION ALL under ONE driver entry (op-tagged
    union; ``n`` is the member count for the union_all channel and 1 for
    the distinct set ops); q_except_ / q_intersect / q_union_all remain
    the library surface. Materialize serializes the exchanges (see
    q_semi_anti_join)."""

    def with_n(ds, n_const: int | None):
        def fn(t: pa.Table) -> pa.Table:
            if n_const is not None:
                t = t.append_column(
                    "n", pa.array([n_const] * t.num_rows, pa.int64())
                )
            return t.select(["nationkey", "op", "n"])

        return ds.map_batches(fn, batch_format="pyarrow")

    ex = with_n(_tag_op(q_except_(sf_dir), "except"), 1).materialize()
    inter = with_n(_tag_op(q_intersect(sf_dir), "intersect"), 1).materialize()
    # q_union_all's lowcard path already returns a tiny driver-side Table
    ua_tbl = q_union_all(sf_dir)
    ua_tbl = ua_tbl.append_column(
        "op", pa.array(["union_all"] * ua_tbl.num_rows, pa.string())
    ).select(["nationkey", "op", "n"])
    ua = ray.data.from_arrow(ua_tbl)
    return ex.union(inter).union(ua)


# ---------------------------------------------------------------------------
# B6: sort + limit (top-k)
# ---------------------------------------------------------------------------


def q_topk_orders(sf_dir: str):
    """Global top-10 by price: per-batch partial top-k pushdown (each block
    contributes at most k rows), then the tiny global sort+limit — a full
    dataset sort for a top-k would shuffle everything for nothing."""
    ds = scan(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= 10:
            return t
        idx = pc.select_k_unstable(
            t, 10, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx)

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    return partial.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


# ---------------------------------------------------------------------------
# B7: distinct
# ---------------------------------------------------------------------------


def q_distinct(sf_dir: str):
    # <= 6 distinct combos: per-batch Arrow distinct + tiny driver combine
    # (no exchange) — the general high-cardinality path would bucket-shuffle
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    agg = lowcard_group_agg(ds, keys=["l_returnflag", "l_linestatus"], sum_cols=[])
    return agg.select(["l_returnflag", "l_linestatus"])


# ---------------------------------------------------------------------------
# B8: set operations
# ---------------------------------------------------------------------------


def q_union_all(sf_dir: str):
    cust = scan(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t.column("c_nationkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    supp = scan(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    # 25 nation groups: partial counts per batch + driver combine, no shuffle
    agg = lowcard_group_agg(cust.union(supp), keys=["nationkey"], sum_cols=[], count_alias="n")
    return agg.select(["nationkey", "n"])


def _distinct_nationkeys(sf_dir: str):
    return (
        scan(sf_dir, "customer", columns=["c_nationkey"])
        .map_batches(
            lambda t: pa.table({"nationkey": pc.cast(t.column("c_nationkey"), pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .count()
        .select_columns(["nationkey"])
    )


def _rich_supplier_nations(sf_dir: str) -> frozenset[int]:
    """Small side of the set ops — collected once and broadcast (a hash join
    against a handful of rows would leave empty right partitions AND shuffle
    the big side for nothing)."""
    rows = (
        scan(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
        .filter(expr="s_acctbal > 5000.0")
        .take_all()
    )
    return frozenset(int(r["s_nationkey"]) for r in rows)


def _member_filter_batch(t: pa.Table, members_ref=None, col: str = "", keep: bool = True) -> pa.Table:
    """Broadcast set-membership filter (task map): keep=True -> semi
    (INTERSECT), False -> anti (EXCEPT)."""
    import ray

    members = ray.get(members_ref)
    mask = pc.is_in(t.column(col), value_set=members)
    if not keep:
        mask = pc.invert(mask)
    return t.filter(mask)


def _set_op(sf_dir: str, keep: bool):
    import ray

    members_ref = ray.put(
        pa.array(sorted(_rich_supplier_nations(sf_dir)), pa.int64())
    )
    return _distinct_nationkeys(sf_dir).map_batches(
        _member_filter_batch,
        fn_kwargs={"members_ref": members_ref, "col": "nationkey", "keep": keep},
        batch_format="pyarrow",
    )


def q_intersect(sf_dir: str):
    """Nation keys with BOTH customers and rich suppliers (INTERSECT via
    broadcast semi-membership)."""
    return _set_op(sf_dir, keep=True)


def q_except_(sf_dir: str):
    """Nation keys with customers but NO rich supplier (EXCEPT via broadcast
    anti-membership)."""
    return _set_op(sf_dir, keep=False)


def q_topk_per_group(sf_dir: str):
    """Window-rank parity: top-3 orders by totalprice per priority class.

    Shuffle on the group key, vectorized per-group top-k inside the batch
    (sort + run-boundary slicing) — no per-group Python dispatch, no global
    sort."""
    import numpy as np

    ds = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def topk_batch(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column("rnk", pa.array([], pa.int64()))
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("o_orderpriority", "ascending"),
                ("o_totalprice", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        g = g.take(order)
        prio = np.asarray(g.column("o_orderpriority").to_pylist(), dtype=object)
        n = len(prio)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = prio[1:] != prio[:-1]
        # rank within group = index - start_of_group
        starts = np.flatnonzero(new)
        base = np.zeros(n, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)
        rank = np.arange(n) - base
        keep = rank < 3
        out = g.filter(pa.array(keep))
        return out.append_column(
            "rnk", pa.array((rank[keep] + 1).astype(np.int64))
        )

    def local_topk(t: pa.Table) -> pa.Table:
        # partial per-batch top-3 per group: each block ships <= 3 rows per
        # group into the shuffle, so a billion-row hot group can't overwhelm
        # one reducer
        out = topk_batch(t)
        return out.drop_columns(["rnk"])

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    return partial.groupby("o_orderpriority").map_groups(topk_batch, batch_format="pyarrow")


def q_above_avg_balance(sf_dir: str):
    """Customers with balance above their nation's average — the per-nation
    averages (a tiny aggregate) are computed first and broadcast into the
    filter map (no second shuffle of the big side)."""
    import ray

    from ray.data.aggregate import Mean

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    avgs = {
        r["c_nationkey"]: r["avg_bal"]
        for r in cust.groupby("c_nationkey")
        .aggregate(Mean("c_acctbal", alias_name="avg_bal"))
        .take_all()
    }
    ks = sorted(avgs)
    ref = ray.put(
        (pa.array(ks, pa.int64()), pa.array([avgs[k] for k in ks], pa.float64()))
    )

    def above_avg(t: pa.Table, lookup_ref=None) -> pa.Table:
        # vectorized broadcast lookup (task map); a missing nation -> null
        # avg -> null comparison -> filtered out (dict.get(k, inf) semantics)
        keys, vals = ray.get(lookup_ref)
        idx = pc.index_in(
            pc.cast(t.column("c_nationkey").combine_chunks(), pa.int64()),
            value_set=keys,
        )
        keep = pc.greater(t.column("c_acctbal"), pc.take(vals, idx))
        return t.select(["c_custkey", "c_name"]).filter(pc.fill_null(keep, False))

    return cust.map_batches(above_avg, fn_kwargs={"lookup_ref": ref}, batch_format="pyarrow")


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def q_sessionize(sf_dir: str):
    """B10 sessionized events: gap-based sessions per user (new session when
    the gap to the previous event exceeds 30 min).

    Scale shape: shuffle ONCE on hash(user_id) % 32 buckets, then the whole
    sessionization is one vectorized pass per bucket (sort + diff + cumsum)
    — no per-user Python dispatch, no window shuffle per user."""
    import numpy as np

    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized int-key bucket hash (splitmix64) — no per-row Python
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=1) % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def sessionize_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                }
            )
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap = np.empty(n, bool)
        gap[0] = False
        gap[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        new_sess_flag = (~new_user) & gap
        # session_id = cumsum of gap-breaks within each user run
        cums = np.cumsum(new_sess_flag.astype(np.int64))
        base = np.zeros(n, np.int64)
        user_starts = np.flatnonzero(new_user)
        base[user_starts] = cums[user_starts]
        np.maximum.accumulate(base, out=base)
        session_id = cums - base
        # group (user, session) runs: boundaries where user or session changes
        bound = np.empty(n, bool)
        bound[0] = True
        bound[1:] = new_user[1:] | (session_id[1:] != session_id[:-1])
        starts = np.flatnonzero(bound)
        ends = np.append(starts[1:], n)
        return pa.table(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "session_id": pa.array(session_id[starts], pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "session_start": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(ts[ends - 1], pa.int64()).cast(pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessionize_bucket, batch_format="pyarrow")
    )


def q_count_distinct(sf_dir: str):
    """B4 depth: COUNT(DISTINCT customer) per order priority — exact
    two-phase distinct: per-batch distinct pairs, bucketed shuffle on
    hash(custkey) dedups globally, tiny per-priority count partials."""
    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "orders", columns=["o_orderpriority", "o_custkey"])
    nb = bucket_count(ds.size_bytes(), floor=64)

    def partial_distinct(t: pa.Table) -> pa.Table:
        gb = t.group_by(["o_orderpriority", "o_custkey"]).aggregate([])
        b = (
            hash64_ints(gb.column("o_custkey").to_numpy(zero_copy_only=False), salt=5) % nb
        ).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def count_bucket(g: pa.Table) -> pa.Table:
        gb = g.drop_columns(["bucket"]).group_by(["o_orderpriority", "o_custkey"]).aggregate([])
        out = gb.group_by(["o_orderpriority"]).aggregate([("o_custkey", "count")])
        from pie_ray.util import rename_grouped

        return rename_grouped(out, ["o_orderpriority"], ["o_orderpriority", "n_cust"])

    partials = (
        ds.map_batches(partial_distinct, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
        .take_all()
    )
    merged: dict[str, int] = {}
    for r in partials:
        merged[r["o_orderpriority"]] = merged.get(r["o_orderpriority"], 0) + r["n_cust"]
    keys = sorted(merged)
    return pa.table(
        {
            "o_orderpriority": pa.array(keys, pa.string()),
            "n_cust": pa.array([merged[k] for k in keys], pa.int64()),
        }
    )


def q_grouped_mode(sf_dir: str):
    """B4 depth: distributed grouped MODE — most frequent event_type per
    user, with the DETERMINISTIC tie-break (highest count, then smallest
    value) that makes mode oracle-able (DuckDB's ``mode()`` leaves ties
    unspecified, so the oracle uses ROW_NUMBER over the same ordering).
    Shape: per-batch (user, event) count partials collapse each batch to
    near-distinct size, ONE bucketed shuffle on hash(user_id) co-locates
    each user's partials, per-bucket Arrow sum + sort + vectorized
    first-row-per-group argmax. Groups are high-cardinality (users) — the
    standard bucketed exchange, never a per-group Ray groupby."""
    from pie_ray.util import bucket_count, hash64_ints, rename_grouped

    ds = scan(sf_dir, "events", columns=["user_id", "event_type"])
    nb = bucket_count(ds.size_bytes(), floor=64)

    def partial(t: pa.Table) -> pa.Table:
        gb = t.group_by(["user_id", "event_type"]).aggregate([("event_type", "count")])
        gb = rename_grouped(gb, ["user_id", "event_type"], ["user_id", "event_type", "c"])
        b = (
            hash64_ints(gb.column("user_id").to_numpy(zero_copy_only=False), salt=0x30DE)
            % nb
        ).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def mode_bucket(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["user_id", "event_type"])
            .aggregate([("c", "sum")])
        )
        gb = rename_grouped(gb, ["user_id", "event_type"], ["user_id", "event_type", "c"])
        srt = gb.sort_by(
            [("user_id", "ascending"), ("c", "descending"), ("event_type", "ascending")]
        )
        u = srt.column("user_id").to_numpy(zero_copy_only=False)
        _, first = np.unique(u, return_index=True)
        out = srt.take(first)
        return pa.table(
            {
                "user_id": out.column("user_id"),
                "mode_event": out.column("event_type"),
                "n_occurrences": out.column("c"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mode_bucket, batch_format="pyarrow")
    )


def q_rollup_revenue(sf_dir: str):
    """GROUPING SETS / ROLLUP parity: revenue at (flag, status), (flag) and
    grand-total levels, absent keys as 'ALL' — three exact partial-agg
    passes over the same derived cents column."""
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "price_c": cents(t.column("l_extendedprice")),
            }
        )

    derived = ds.map_batches(derive, batch_format="pyarrow").materialize()
    lvl2 = lowcard_group_agg(
        derived, keys=["l_returnflag", "l_linestatus"], sum_cols=["price_c"]
    )
    lvl1 = lowcard_group_agg(derived, keys=["l_returnflag"], sum_cols=["price_c"])
    total = int(pc.sum(lvl1.column("price_c__sum")).as_py())
    flags = lvl2.column("l_returnflag").to_pylist() + lvl1.column("l_returnflag").to_pylist() + ["ALL"]
    stats = lvl2.column("l_linestatus").to_pylist() + ["ALL"] * lvl1.num_rows + ["ALL"]
    sums = (
        lvl2.column("price_c__sum").to_pylist()
        + lvl1.column("price_c__sum").to_pylist()
        + [total]
    )
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "l_linestatus": pa.array(stats, pa.string()),
            "sum_price": pa.array([s / 100.0 for s in sums], pa.float64()),
        }
    )


def q_moving_avg(sf_dir: str):
    """B10 depth: trailing 3-event moving average of value per user
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — one bucket shuffle on
    hash(user), vectorized sliding window via cumsum differences over
    exact cents."""
    import numpy as np

    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized int-key bucket hash (splitmix64) — no per-row Python
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=2) % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def mavg_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        vc = cents(g.column("value")).to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "avg_value_3": pa.array([], pa.float64()),
                }
            )
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new)
        base = np.zeros(n, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)  # start index of each user run
        pos = np.arange(n) - base  # 0-based position within the user run
        cs = np.concatenate([[0], np.cumsum(vc)])  # cs[i] = sum of vc[:i]
        win = np.minimum(pos + 1, 3)
        lo = np.arange(n) + 1 - win
        sums = cs[np.arange(n) + 1] - cs[lo]
        avg = sums * 1.0 / (100.0 * win)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "avg_value_3": pa.array(avg),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mavg_bucket, batch_format="pyarrow")
    )


def q_string_agg(sf_dir: str):
    """B4 depth: grouped string aggregation — comma-joined sorted region
    names per nation-key bucket of suppliers... simpler: nation names per
    region. Low-cardinality keys -> partial list-collect per batch is
    unnecessary; one small groupby of a dimension table."""
    ds = scan(sf_dir, "nation", columns=["n_regionkey", "n_name"])

    def agg(g: pa.Table) -> pa.Table:
        names = sorted(g.column("n_name").to_pylist())
        return pa.table(
            {
                "n_regionkey": pa.array(
                    [g.column("n_regionkey")[0].as_py()], pa.int64()
                ),
                "nations": pa.array([",".join(names)], pa.string()),
                "n_nations": pa.array([len(names)], pa.int64()),
            }
        )

    return ds.groupby("n_regionkey").map_groups(agg, batch_format="pyarrow")


PIVOT_LINESTATUSES = ("F", "O")


def q_pivot_revenue(sf_dir: str):
    """Pivot via conditional aggregation: one row per l_returnflag, one
    column per linestatus, values = exact cents sums (same int64
    partial-agg path as pricing_summary, then a driver-side reshape of the
    tiny grouped table)."""
    ds = scan(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"]
    )

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "price_c": cents(t.column("l_extendedprice")),
            }
        )

    agg = lowcard_group_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["price_c"],
    )
    flags = agg.column("l_returnflag").to_pylist()
    stats = agg.column("l_linestatus").to_pylist()
    sums = agg.column("price_c__sum").to_pylist()
    by_flag: dict[str, dict[str, int]] = {}
    for f, s, v in zip(flags, stats, sums):
        by_flag.setdefault(f, {})[s] = v
    out_flags = sorted(by_flag)
    cols: dict[str, object] = {"l_returnflag": pa.array(out_flags, pa.string())}
    # pivot over the FIXED linestatus domain, not the statuses observed in
    # the data: the oracle hardcodes sum_price_F/sum_price_O, so a scale
    # factor where one status is absent must still emit both columns (0.0)
    for status in PIVOT_LINESTATUSES:
        cols[f"sum_price_{status}"] = pa.array(
            [by_flag[f].get(status, 0) / 100.0 for f in out_flags], pa.float64()
        )
    return pa.table(cols)


def _lerp_percentile(values: "np.ndarray", counts: "np.ndarray", q: float) -> float:
    """Exact quantile_cont from a (sorted values, counts) histogram —
    numpy's linear-interpolation formula reproduced bit-for-bit (incl. the
    g >= 0.5 branch np.percentile uses for accuracy), so results match the
    previous materialized np.percentile path and the DuckDB oracle."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    h = q * (n - 1)
    j0 = int(np.floor(h))
    g = h - j0
    cum = np.cumsum(counts)
    v0 = values[np.searchsorted(cum, j0 + 1)]
    if g == 0.0:
        return float(v0)
    v1 = values[np.searchsorted(cum, min(j0 + 1, n - 1) + 1)]
    diff = v1 - v0
    return float(v1 - diff * (1 - g)) if g >= 0.5 else float(v0 + diff * g)


def _flag_quantity_histogram(sf_dir: str):
    """Shared mergeable per-(flag, value) count histogram for the exact
    quantile entries: per-batch Arrow group_by partials, ONE bounded driver
    combine (groups x distinct values, never rows). Returns (flags list,
    values np, counts np) sorted by (flag, value)."""
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        gb = t.group_by(["l_returnflag", "l_quantity"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "l_returnflag": gb.column("l_returnflag"),
                "l_quantity": gb.column("l_quantity"),
                "cnt": pc.cast(gb.column("count_all"), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = (
        pa.Table.from_pylist(parts)
        .group_by(["l_returnflag", "l_quantity"])
        .aggregate([("cnt", "sum")])
    ).sort_by([("l_returnflag", "ascending"), ("l_quantity", "ascending")])
    return (
        merged.column("l_returnflag").to_pylist(),
        merged.column("l_quantity").to_numpy(zero_copy_only=False),
        merged.column("cnt_sum").to_numpy(zero_copy_only=False),
    )


def _per_flag_percentiles(flags, vals, cnts):
    """(flags, median, p90) lists from the sorted histogram runs."""
    out_flags, med, p90 = [], [], []
    start = 0
    for i in range(1, len(flags) + 1):
        if i == len(flags) or flags[i] != flags[start]:
            out_flags.append(flags[start])
            med.append(_lerp_percentile(vals[start:i], cnts[start:i], 0.5))
            p90.append(_lerp_percentile(vals[start:i], cnts[start:i], 0.9))
            start = i
    return out_flags, med, p90


def q_grouped_quantiles(sf_dir: str):
    """B3 depth: exact per-group order statistics (median / p90 per return
    flag) from a MERGEABLE per-(group, value) count histogram: per-batch
    Arrow group_by partials, combined once on the driver (bounded by
    groups x distinct values — l_quantity has 50 — never by row count, so
    a billion-row group costs the same as a thousand-row one). Columns with
    unbounded distinct values use grouped_quantile_sketch (accuracy-bounded
    fixed bins) instead; exact quantiles there require a distributed sort."""
    flags, vals, cnts = _flag_quantity_histogram(sf_dir)
    out_flags, med, p90 = _per_flag_percentiles(flags, vals, cnts)
    return pa.table(
        {
            "l_returnflag": pa.array(out_flags, pa.string()),
            "median_qty": pa.array(med, pa.float64()),
            "p90_qty": pa.array(p90, pa.float64()),
        }
    )


def q_cumsum_user_value(sf_dir: str):
    """B10 depth: running total per user ordered by (ts, event_id) — the
    same ONE-shuffle bucket pattern as sessionize (hash(user) % 32), with a
    vectorized per-bucket sort + segmented cumsum. Values sum as exact
    int64 cents so the doubles match the SQL window oracle bit-for-bit."""
    import numpy as np

    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized int-key bucket hash (splitmix64) — no per-row Python
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=3) % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def cum_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        vc = cents(g.column("value")).to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "cum_value": pa.array([], pa.float64()),
                }
            )
        cs = np.cumsum(vc)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new)
        # per-run base = cumsum just BEFORE the run start, propagated by
        # run index (NOT maximum.accumulate over cumsum values — that is
        # only valid when values are non-negative)
        run_id = np.cumsum(new) - 1
        run_base = cs[starts] - vc[starts]
        cum = cs - run_base[run_id]
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "cum_value": pa.array(cum.astype(np.float64) / 100.0),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cum_bucket, batch_format="pyarrow")
    )


def q_window_funcs_events(sf_dir: str):
    """B10 window functions — trailing 3-row moving average AND running
    total per user — computed in ONE bucket shuffle + one vectorized sorted
    pass (q_moving_avg / q_cumsum_user_value remain the library surface;
    this merged form is the driver entry and shares their exact-cents
    contract, so the doubles match the SQL window oracle bit-for-bit)."""
    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized int-key bucket hash (splitmix64) — no per-row Python
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=4) % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def window_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        vc = cents(g.column("value")).to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "avg_value_3": pa.array([], pa.float64()),
                    "cum_value": pa.array([], pa.float64()),
                }
            )
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new)
        base = np.zeros(n, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)  # start index of each user run
        pos = np.arange(n) - base  # 0-based position within the user run
        cs = np.concatenate([[0], np.cumsum(vc)])  # cs[i] = sum of vc[:i]
        # trailing window of <= 3 rows via cumsum differences
        win = np.minimum(pos + 1, 3)
        lo = np.arange(n) + 1 - win
        sums3 = cs[np.arange(n) + 1] - cs[lo]
        avg = sums3 * 1.0 / (100.0 * win)
        # running total = cumsum minus the run-start base (run-id indexed —
        # valid for negative values, unlike maximum.accumulate over sums)
        run_id = np.cumsum(new) - 1
        run_base = cs[starts]  # cumsum BEFORE each run's first element
        cum = cs[1:] - run_base[run_id]
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "avg_value_3": pa.array(avg),
                "cum_value": pa.array(cum.astype(np.float64) / 100.0),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window_bucket, batch_format="pyarrow")
    )


def quantile_sketch(ds, col: str, qs: list[float], n_bins: int = 8192) -> dict[float, float]:
    """Mergeable two-pass histogram quantile sketch — the bounded-memory
    scale path for order statistics (exact per-group quantiles hold a group
    in memory; this holds ``n_bins`` counters regardless of row count).

    Pass 1: global min/max. Pass 2: per-batch histogram counts (numpy),
    merged by addition. Estimate = left edge + linear interpolation within
    the containing bin; absolute error <= (max-min)/n_bins."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi <= lo:
        return {q: lo for q in qs}
    edges = np.linspace(lo, hi, n_bins + 1)

    def hist_batch(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        h, _ = np.histogram(v, bins=edges)
        nz = np.flatnonzero(h)
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)), "cnt": pa.array(h[nz].astype(np.int64))}
        )

    counts = np.zeros(n_bins, np.int64)
    for batch in ds.map_batches(hist_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            counts,
            np.asarray(batch.column("bin").to_pylist(), dtype=np.int64),
            np.asarray(batch.column("cnt").to_pylist(), dtype=np.int64),
        )
    total = counts.sum()
    cum = np.cumsum(counts)
    out = {}
    for q in qs:
        target = q * (total - 1) + 1
        b = int(np.searchsorted(cum, target))
        b = min(b, n_bins - 1)
        prev = cum[b - 1] if b > 0 else 0
        within = counts[b]
        frac = (target - prev) / within if within > 0 else 0.0
        out[q] = float(edges[b] + frac * (edges[b + 1] - edges[b]))
    return out


def q_quantile_sketch(sf_dir: str):
    """Approximate median/p90 of l_quantity via the histogram sketch
    (rows-only; accuracy vs exact quantiles gated in tests)."""
    ds = scan(sf_dir, "lineitem", columns=["l_quantity"])
    est = quantile_sketch(ds, "l_quantity", [0.5, 0.9])
    return pa.table(
        {
            "median_qty_est": pa.array([round(est[0.5], 6)], pa.float64()),
            "p90_qty_est": pa.array([round(est[0.9], 6)], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# approximate count-distinct — HyperLogLog (Flajolet et al. 2007, public).
# The bounded-memory scale path for distinct statistics: the exact two-phase
# distinct (q_count_distinct) ships every distinct value through a shuffle;
# HLL ships 2^p max-registers per batch regardless of cardinality and merges
# by elementwise max (commutative/associative — partition-independent).
# ---------------------------------------------------------------------------

HLL_P = 14  # 16384 registers, standard error ~0.81%


def _hll_partial(h: "np.ndarray", p: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index, rho) arrays. rho = 1 + trailing
    zeros of the top 64-p hash bits (trailing-zero variant; statistically
    equivalent to leading-zero HLL). log2 of an exact power of two is exact
    in float64, so the vectorized tz extraction is integer-precise."""
    m = np.uint64(1 << p)
    idx = (h & (m - np.uint64(1))).astype(np.int64)
    w = h >> np.uint64(p)
    lsb = w & (~w + np.uint64(1))
    bits = 64 - p
    tz = np.where(
        w == 0, bits, np.log2(np.maximum(lsb, np.uint64(1)).astype(np.float64)).astype(np.int64)
    )
    return idx, (tz + 1).astype(np.int64)


def _hll_estimate(registers: "np.ndarray") -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


def _hash_col(col: pa.ChunkedArray | pa.Array) -> "np.ndarray":
    """uint64 hashes of a column: splitmix64 for integer types (C-speed),
    blake2b for strings."""
    from pie_ray.util import hash64_array, hash64_ints

    t = col.type
    if pa.types.is_integer(t):
        arr = col.to_numpy(zero_copy_only=False) if not isinstance(col, pa.ChunkedArray) else col.combine_chunks().to_numpy(zero_copy_only=False)
        return hash64_ints(arr.astype(np.int64), salt=99)
    vals = col.to_pylist()
    return hash64_array([v if v is None else str(v) for v in vals], salt=b"hll")


def approx_count_distinct(ds, col: str, p: int = HLL_P) -> float:
    """Mergeable approximate COUNT(DISTINCT col): per-batch HLL registers
    (as sparse (idx, rho-max) rows), merged by max on the driver — O(2^p)
    state end to end, ~0.8% standard error at p=14 (accuracy-gated in
    tests). At 10^12 rows this replaces a full distinct shuffle with one
    map pass."""

    def partial(t: pa.Table) -> pa.Table:
        # COUNT(DISTINCT col) excludes NULL — hash only the valid values
        idx, rho = _hll_partial(_hash_col(t.column(col).drop_null()), p)
        gb = (
            pa.table({"idx": pa.array(idx), "rho": pa.array(rho)})
            .group_by(["idx"])
            .aggregate([("rho", "max")])
        )
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, ["idx"], ["idx", "rho"])

    registers = np.zeros(1 << p, np.int64)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bi = batch.column("idx").to_numpy(zero_copy_only=False)
        br = batch.column("rho").to_numpy(zero_copy_only=False)
        np.maximum.at(registers, bi, br)
    return _hll_estimate(registers)


def grouped_approx_count_distinct(
    ds, key: str, col: str, p: int = 12, num_buckets: int | None = None
):
    """PER-GROUP HLL distinct counts behind ONE bucketed shuffle on
    hash(key): per-batch (key, idx, rho-max) partials (bounded by
    groups x 2^p per batch), per-bucket elementwise-max merge + estimate.
    Returns a Dataset (key, n_distinct_approx)."""
    from pie_ray.util import hash64_array

    nbk = num_buckets or GQS_BUCKETS

    def partial(t: pa.Table) -> pa.Table:
        all_keys = pc.unique(t.column(key).combine_chunks())
        t = t.filter(pc.is_valid(t.column(col)))  # COUNT(DISTINCT) skips NULL
        idx, rho = _hll_partial(_hash_col(t.column(col)), p)
        gb = (
            pa.table({key: t.column(key), "idx": pa.array(idx), "rho": pa.array(rho)})
            .group_by([key, "idx"])
            .aggregate([("rho", "max")])
        )
        from pie_ray.util import rename_grouped

        gb = rename_grouped(gb, [key, "idx"], [key, "idx", "rho"])
        # a group whose values are ALL null must still report 0, not
        # vanish: ship a zero-register row per key (max-merge identity)
        zeros = pa.table(
            {
                key: all_keys,
                "idx": pa.array(np.zeros(len(all_keys), np.int64)),
                "rho": pa.array(np.zeros(len(all_keys), np.int64)),
            }
        )
        gb = pa.concat_tables([gb.select([key, "idx", "rho"]), zeros])
        b = (
            hash64_array([str(k) for k in gb.column(key).to_pylist()], salt=b"ghll")
            % nbk
        ).astype("int32")
        return gb.append_column("bucket", pa.array(b, pa.int32()))

    def estimate_bucket(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by([key, "idx"])
            .aggregate([("rho", "max")])
            .sort_by([(key, "ascending"), ("idx", "ascending")])
        )
        keys_l = gb.column(key).to_pylist()
        idxs = gb.column("idx").to_numpy(zero_copy_only=False)
        rhos = gb.column("rho_max").to_numpy(zero_copy_only=False)
        out_k, out_n = [], []
        start = 0
        for i in range(1, len(keys_l) + 1):
            if i == len(keys_l) or keys_l[i] != keys_l[start]:
                regs = np.zeros(1 << p, np.int64)
                regs[idxs[start:i]] = rhos[start:i]
                out_k.append(keys_l[start])
                out_n.append(_hll_estimate(regs))
                start = i
        return pa.table(
            {key: pa.array(out_k), "n_distinct_approx": pa.array(out_n, pa.float64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(estimate_bucket, batch_format="pyarrow")
    )


GQS_BUCKETS = 64


def grouped_quantile_sketch(
    ds,
    key: str,
    col: str,
    qs: list[float],
    n_bins: int = 2048,
    num_buckets: int | None = None,
):
    """PER-GROUP mergeable histogram quantiles — the bounded-memory scale
    path for grouped order statistics (the exact per-(group,value) histogram
    needs a bounded value domain; this holds ``n_bins`` counters per group
    for ANY value distribution).

    Pass 1: global [min, max]. Pass 2: per-batch (key, bin) count partials
    (vectorized Arrow group_by), ONE bucketed shuffle on hash(key) merges
    them by addition, and each bucket interpolates its keys' quantiles —
    state is groups x n_bins counters spread across buckets, independent of
    group row counts. Absolute error <= (max-min)/n_bins (gated in tests).
    Returns a Dataset (key, q{50}, ...) with one column per requested q."""
    from ray.data.aggregate import Max, Min

    from pie_ray.util import hash64_array

    nbk = num_buckets or GQS_BUCKETS
    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    span = hi - lo
    edges = np.linspace(lo, hi, n_bins + 1)
    qcols = [f"q{int(round(q * 100)):02d}" for q in qs]

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if span <= 0:
            bins = np.zeros(len(v), np.int64)
        else:
            bins = np.clip(((v - lo) / span * n_bins).astype(np.int64), 0, n_bins - 1)
        gb = (
            pa.table({key: t.column(key), "bin": pa.array(bins)})
            .group_by([key, "bin"])
            .aggregate([([], "count_all")])
        )
        b = (hash64_array([str(k) for k in gb.column(key).to_pylist()], salt=b"gqs") % nbk).astype("int32")
        return pa.table(
            {
                key: gb.column(key),
                "bin": gb.column("bin"),
                "cnt": pc.cast(gb.column("count_all"), pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def quantiles_bucket(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by([key, "bin"])
            .aggregate([("cnt", "sum")])
            .sort_by([(key, "ascending"), ("bin", "ascending")])
        )
        keys_l = gb.column(key).to_pylist()
        bins = gb.column("bin").to_numpy(zero_copy_only=False)
        cnts = gb.column("cnt_sum").to_numpy(zero_copy_only=False)
        out: dict[str, list] = {key: []} | {c: [] for c in qcols}
        start = 0
        for i in range(1, len(keys_l) + 1):
            if i == len(keys_l) or keys_l[i] != keys_l[start]:
                counts = np.zeros(n_bins, np.int64)
                counts[bins[start:i]] = cnts[start:i]
                total = counts.sum()
                cum = np.cumsum(counts)
                out[key].append(keys_l[start])
                for q, c in zip(qs, qcols):
                    if span <= 0:
                        out[c].append(lo)
                        continue
                    target = q * (total - 1) + 1
                    b_ = min(int(np.searchsorted(cum, target)), n_bins - 1)
                    prev = cum[b_ - 1] if b_ > 0 else 0
                    within = counts[b_]
                    frac = (target - prev) / within if within > 0 else 0.0
                    out[c].append(float(edges[b_] + frac * (edges[b_ + 1] - edges[b_])))
                start = i
        return pa.table(
            {key: pa.array(out[key])}
            | {c: pa.array(out[c], pa.float64()) for c in qcols}
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(quantiles_bucket, batch_format="pyarrow")
    )


def q_grouped_quantile_sketch(sf_dir: str):
    """Per-event-type approximate median/p90 of events.value via the
    grouped mergeable histogram sketch (rows-only oracle; accuracy vs exact
    per-group quantiles gated in tests/unit/test_functions.py)."""
    ds = scan(sf_dir, "events", columns=["event_type", "value"])
    from pie_ray.util import bucket_count

    return grouped_quantile_sketch(
        ds,
        "event_type",
        "value",
        [0.5, 0.9],
        num_buckets=bucket_count(ds.size_bytes(), floor=GQS_BUCKETS),
    )


def q_quantiles_rollup(sf_dir: str):
    """B3 order statistics, global + per-group under ONE entry (rollup
    shape: per-return-flag rows plus an 'ALL' row). One pass builds the
    shared mergeable histogram (_flag_quantity_histogram); the global row
    reuses the SAME histogram re-merged across flags — the driver combine
    stays bounded by groups x distinct values, never row count.
    q_quantiles / q_grouped_quantiles remain the library surface."""
    flags, vals, cnts = _flag_quantity_histogram(sf_dir)
    out_flags, med, p90 = _per_flag_percentiles(flags, vals, cnts)
    # global row from the same histogram, re-merged across flags
    g = (
        pa.table({"v": pa.array(vals), "c": pa.array(cnts)})
        .group_by(["v"])
        .aggregate([("c", "sum")])
    ).sort_by([("v", "ascending")])
    gv = g.column("v").to_numpy(zero_copy_only=False)
    gc = g.column("c_sum").to_numpy(zero_copy_only=False)
    out_flags.append("ALL")
    med.append(_lerp_percentile(gv, gc, 0.5))
    p90.append(_lerp_percentile(gv, gc, 0.9))
    return pa.table(
        {
            "l_returnflag": pa.array(out_flags, pa.string()),
            "median_qty": pa.array(med, pa.float64()),
            "p90_qty": pa.array(p90, pa.float64()),
        }
    )


def q_quantiles(sf_dir: str):
    """B3 approximate/order statistics: median and p90 (built-in Quantile)."""
    from ray.data.aggregate import Quantile

    ds = scan(sf_dir, "lineitem", columns=["l_quantity"])
    res = ds.aggregate(
        Quantile("l_quantity", q=0.5, alias_name="median_qty"),
        Quantile("l_quantity", q=0.9, alias_name="p90_qty"),
    )
    return pa.table(
        {
            "median_qty": pa.array([float(res["median_qty"])], pa.float64()),
            "p90_qty": pa.array([float(res["p90_qty"])], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# B9: sampling (rows-only oracle)
# ---------------------------------------------------------------------------


SAMPLE_FRAC = 0.1


def q_sample(sf_dir: str):
    """B9 random sampling. The random channel has no SQL oracle, so the
    entry SELF-CHECKS: the sample size is Binomial(n, frac), and a count
    outside mean ± 3σ (p < 0.3%) raises instead of returning — the driver
    row is therefore 'ran AND passed a statistical gate', not 'ran'."""
    import math

    ds = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    n = ds.count()
    sample = ds.random_sample(SAMPLE_FRAC, seed=20240817).materialize()
    k = sample.count()
    mu = n * SAMPLE_FRAC
    sigma = math.sqrt(n * SAMPLE_FRAC * (1 - SAMPLE_FRAC))
    if abs(k - mu) > 3 * sigma:
        raise AssertionError(
            f"random_sample count {k} outside {mu:.1f} ± 3σ ({3 * sigma:.1f})"
        )
    return sample


def q_sampling(sf_dir: str):
    """B9 sampling under ONE entry: runs the RANDOM channel's binomial
    ±3σ self-check (q_sample — raises on failure, so a green driver row
    proves the random path ran AND passed its statistical gate), then
    returns the DETERMINISTIC md5-holdout rows, which the SQL oracle
    reproduces exactly. q_sample / q_sample_hash remain the library
    surface."""
    q_sample(sf_dir)  # statistical gate; result intentionally discarded
    return q_sample_hash(sf_dir)


def q_sample_hash(sf_dir: str):
    """Deterministic ~1/16 sample: keep rows whose md5(orderkey_linenumber)
    starts with '0'. Unlike random_sample this is reproducible across runs,
    partitioning and engines — the form of sampling a 100 TB pipeline wants
    for repeatable holdouts — and exactly SQL-expressible (md5 prefix)."""
    import hashlib

    ds = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def fn(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_pylist()
        ln = t.column("l_linenumber").to_pylist()
        keep = [
            hashlib.md5(f"{o}_{n}".encode()).hexdigest()[0] == "0"
            for o, n in zip(ok, ln)
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def q_outer_join(sf_dir: str):
    """B5 depth — LEFT OUTER join at row grain: every customer, paired
    with each of their big orders (>250k) or a single null-padded row.
    Runs on Ray Data's native ``join_type="left_outer"`` hash join with
    bytes-derived partition count; unmatched nulls are coalesced to
    sentinels (-1 / 0.0) so the driver's value hash never compares nulls
    (same guard as rollup's COALESCE)."""
    from pie_ray.util import join_num_partitions

    cust = scan(sf_dir, "customer", columns=["c_custkey"])
    raw_orders = scan(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    n_parts = join_num_partitions(raw_orders.size_bytes())  # RAW scan
    orders = raw_orders.filter(expr="o_totalprice > 250000.0")
    joined = cust.join(
        orders,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def coalesce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "o_orderkey": pc.fill_null(t.column("o_orderkey"), pa.scalar(-1, pa.int64())),
                "o_totalprice": pc.fill_null(t.column("o_totalprice"), pa.scalar(0.0)),
            }
        )

    return joined.map_batches(coalesce, batch_format="pyarrow")


WEIGHTED_SAMPLE_K = 500


def q_sample_weighted(sf_dir: str):
    """B9 depth — deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets key = u^(1/w) with w its
    weight (l_quantity) and u a content-derived uniform (md5 of the row
    id, low 8 digest bytes little-endian / 2^64 — the exact integer
    DuckDB's md5_number_lower returns, so the oracle reproduces every key
    bit-for-bit); the global top-k keys ARE the weighted sample.

    Distribution: per-batch partial top-k (each block forwards <= k rows,
    same pushdown as q_topk_orders), tiny final sort — no full shuffle, no
    driver pull beyond blocks x k rows. Reproducible across runs,
    partitioning and engines, unlike random_sample: at 100 TB this is the
    form of weighted selection (quality-weighted corpus subsampling) that
    can be re-run and audited."""
    import hashlib

    k = WEIGHTED_SAMPLE_K
    ds = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def keyed(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_pylist()
        ln = t.column("l_linenumber").to_pylist()
        u64 = np.array(
            [
                int.from_bytes(
                    hashlib.md5(f"{o}_{n}".encode()).digest()[8:16], "little"
                )
                for o, n in zip(ok, ln)
            ],
            dtype=np.uint64,
        )
        u = u64.astype(np.float64) / 18446744073709551616.0
        w = t.column("l_quantity").to_numpy(zero_copy_only=False)
        key = u ** (1.0 / w)
        t = t.append_column("__key", pa.array(key, pa.float64()))
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(
            t, k, sort_keys=[("__key", "descending"), ("l_orderkey", "ascending")]
        )
        return t.take(idx)

    partial = ds.map_batches(keyed, batch_format="pyarrow")
    top = partial.sort(
        ["__key", "l_orderkey", "l_linenumber"], descending=[True, False, False]
    ).limit(k)
    return top.drop_columns(["__key"])


# ---------------------------------------------------------------------------
# B10: tumbling-window event aggregation (derived-column groupby; bounded
# input, batch semantics — no watermarks by design, SURVEY.md §2B)
# ---------------------------------------------------------------------------


def q_window_tumbling(sf_dir: str):
    """B10 depth — tumbling (15-min) and hopping (30-min window / 15-min
    hop) aggregates under ONE op-tagged entry, the two standard fixed
    windows of a streaming engine expressed over bounded event-time data.

    Tumbling: each event lands in exactly the epoch-aligned 15-min bucket
    that contains it. Hopping: overlapping 30-min windows starting every
    15 min — each event belongs to the windows starting at floor15(ts)
    and floor15(ts) - 15min, produced by a per-batch 2x explode (the
    window-assignment fan-out is width/hop, bounded and known up front).
    Sums are exact int64 cents, so the merge order never matters; group
    count is (15-min buckets in the corpus) x 2 kinds — time-bounded, not
    row-bounded — so the partial-agg + driver-combine path applies at any
    corpus size (same argument as q_window_events' hourly groups)."""
    import datetime

    ds = scan(sf_dir, "events", columns=["ts", "value"])
    hop = pa.scalar(datetime.timedelta(minutes=15))

    def fn(t: pa.Table) -> pa.Table:
        win0 = pc.floor_temporal(t.column("ts"), multiple=15, unit="minute")
        value_c = cents(t.column("value"))
        n = t.num_rows
        parts = [
            pa.table(
                {
                    "window_start": win0,
                    "kind": pa.array(["tumble"] * n, pa.string()),
                    "value_c": value_c,
                }
            ),
            pa.table(
                {
                    "window_start": win0,
                    "kind": pa.array(["hop"] * n, pa.string()),
                    "value_c": value_c,
                }
            ),
            pa.table(
                {
                    "window_start": pc.subtract(win0, hop),
                    "kind": pa.array(["hop"] * n, pa.string()),
                    "value_c": value_c,
                }
            ),
        ]
        return pa.concat_tables(parts)

    exploded = ds.map_batches(fn, batch_format="pyarrow")
    agg = lowcard_group_agg(
        exploded,
        keys=["window_start", "kind"],
        sum_cols=["value_c"],
        count_alias="n_events",
    )
    return pa.table(
        {
            "window_start": agg.column("window_start"),
            "kind": agg.column("kind"),
            "n_events": agg.column("n_events"),
            "sum_value": pc.divide(
                pc.cast(agg.column("value_c__sum"), pa.float64()), pa.scalar(100.0)
            ),
        }
    )


def q_window_events(sf_dir: str):
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "value"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.floor_temporal(t.column("ts"), unit="hour"),
                "event_type": t.column("event_type"),
                "value_c": cents(t.column("value")),
            }
        )

    ds = ds.map_batches(fn, batch_format="pyarrow")
    # group count = hours-in-corpus × event types — small at any corpus size,
    # so the partial-agg + driver combine path applies
    agg = lowcard_group_agg(
        ds, keys=["window_start", "event_type"], sum_cols=["value_c"], count_alias="n_events"
    )
    return pa.table(
        {
            "window_start": agg.column("window_start"),
            "event_type": agg.column("event_type"),
            "n_events": agg.column("n_events"),
            "sum_value": pc.divide(
                pc.cast(agg.column("value_c__sum"), pa.float64()), pa.scalar(100.0)
            ),
        }
    )


# ---------------------------------------------------------------------------
# B5 composite: 3-way join pipeline (customer⋈orders⋈lineitem)
# ---------------------------------------------------------------------------


def q_order_lineitem_join(sf_dir: str):
    """Revenue per order priority: orders⋈lineitem hash join then group."""
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        # revenue in exact 1e-4 dollars: cents * (100 - discount points),
        # PRE-REDUCED per l_orderkey inside the batch before the join: an
        # order's ~4 lineitems are usually co-located in one batch, so the
        # join ships ~orderkey-many rows instead of lineitem-many (the
        # partial stays exact — cnt carries the joined COUNT(*))
        from pie_ray.util import rename_grouped

        rev4 = pc.multiply(
            cents(t.column("l_extendedprice")),
            pc.subtract(pa.scalar(100, pa.int64()), cents(t.column("l_discount"))),
        )
        part = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev4": rev4,
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        gb = part.group_by(["l_orderkey"]).aggregate([("rev4", "sum"), ("cnt", "sum")])
        return rename_grouped(gb, ["l_orderkey"], ["l_orderkey", "rev4", "cnt"])

    from pie_ray.util import join_num_partitions

    n_parts = join_num_partitions(li.size_bytes())
    li = li.map_batches(revenue, batch_format="pyarrow")
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = lowcard_group_agg(joined, keys=["o_orderpriority"], sum_cols=["rev4", "cnt"])
    return pa.table(
        {
            "o_orderpriority": agg.column("o_orderpriority"),
            "n_items": agg.column("cnt__sum"),
            "sum_revenue": pc.divide(
                pc.cast(agg.column("rev4__sum"), pa.float64()), pa.scalar(10000.0)
            ),
        }
    )


# ---------------------------------------------------------------------------
# B5 depth: FULL OUTER join (both sides null-padded)
# ---------------------------------------------------------------------------


def q_full_outer_join(sf_dir: str):
    """FULL OUTER join at row grain: rich customers (acctbal > 7000) vs big
    orders (totalprice > 400k) on custkey — thresholds chosen so BOTH sides
    have unmatched rows at sf0.001 and sf0.01 (6/226 and 50/2093 left/right
    unmatched), exercising both null-padding directions. Ray Data's native
    ``join_type="full_outer"`` hash join with bytes-derived partitioning;
    unmatched nulls coalesced to sentinels (-1 / 0.0) so the driver's value
    hash never compares nulls (same guard as q_outer_join)."""
    from pie_ray.util import join_num_partitions

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 7000.0"
    )
    orders = scan(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    ).filter(expr="o_totalprice > 400000.0")
    joined = cust.join(
        orders,
        join_type="full_outer",
        num_partitions=join_num_partitions(orders.size_bytes()),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def coalesce(t: pa.Table) -> pa.Table:
        # Ray's full_outer merges the right key INTO the left key column
        # (c_custkey is never null in the output) — only the payload
        # columns need sentinel fills
        return pa.table(
            {
                "custkey": t.column("c_custkey"),
                "c_acctbal": pc.fill_null(t.column("c_acctbal"), pa.scalar(-1.0)),
                "o_orderkey": pc.fill_null(
                    t.column("o_orderkey"), pa.scalar(-1, pa.int64())
                ),
                "o_totalprice": pc.fill_null(t.column("o_totalprice"), pa.scalar(0.0)),
            }
        )

    return joined.map_batches(coalesce, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# B9 depth: stratified (per-group) deterministic sampling
# ---------------------------------------------------------------------------

STRATIFIED_N = 5


def stratified_sample(ds, group_col: str, id_cols: list[str], n: int):
    """Deterministic n rows PER GROUP: within each group, the n rows with
    the smallest md5 of the '_'-joined id columns (ties broken by the ids)
    — a repeatable stratified holdout, exactly SQL-expressible via
    row_number() over (partition by group order by md5(...)).

    Scale shape: same partial pushdown as per-group top-k — every batch
    forwards <= n rows per group into ONE group-key shuffle, so a
    billion-row group ships n rows per block, never its mass. Group count
    is assumed shuffle-sized (it is the stratification key, e.g. language
    or source); the md5 loop is per-row but bounded by the batch.
    """
    import hashlib

    import numpy as np

    def key_batch(t: pa.Table) -> pa.Table:
        ids = [t.column(c).to_pylist() for c in id_cols]
        keys = [
            hashlib.md5("_".join(str(v) for v in row).encode()).hexdigest()
            for row in zip(*ids)
        ]
        return t.append_column("__mkey", pa.array(keys, pa.string()))

    def topn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending"), ("__mkey", "ascending")]
            + [(c, "ascending") for c in id_cols],
        )
        t = t.take(order)
        grp = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        m = len(grp)
        new = np.empty(m, bool)
        new[0] = True
        new[1:] = grp[1:] != grp[:-1]
        starts = np.flatnonzero(new)
        base = np.zeros(m, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)
        rank = np.arange(m) - base
        return t.filter(pa.array(rank < n))

    partial = ds.map_batches(key_batch, batch_format="pyarrow").map_batches(
        topn, batch_format="pyarrow"
    )
    final = partial.groupby(group_col).map_groups(topn, batch_format="pyarrow")

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__mkey"])

    return final.map_batches(strip, batch_format="pyarrow")


def q_stratified_sample(sf_dir: str):
    """B9 depth — STRATIFIED_N orders per priority class, deterministic."""
    ds = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    return stratified_sample(
        ds, "o_orderpriority", ["o_orderkey"], STRATIFIED_N
    )


# ---------------------------------------------------------------------------
# B4 depth: GROUP BY CUBE (full grouping sets)
# ---------------------------------------------------------------------------


def q_cube_revenue(sf_dir: str):
    """CUBE(l_returnflag, l_linestatus) revenue — all four grouping sets.
    ONE distributed pass computes the finest level (exact int-cents,
    bounded-cardinality partial agg); the three coarser levels are derived
    from its <= |flags|x|statuses| rows on the driver, so CUBE costs the
    same exchange as a plain grouped agg at any corpus size."""
    from collections import defaultdict

    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "price_c": cents(t.column("l_extendedprice")),
            }
        )

    lvl2 = lowcard_group_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["price_c"],
    )
    flags2 = lvl2.column("l_returnflag").to_pylist()
    stats2 = lvl2.column("l_linestatus").to_pylist()
    sums2 = lvl2.column("price_c__sum").to_pylist()
    by_flag: dict = defaultdict(int)
    by_stat: dict = defaultdict(int)
    for f, s, c in zip(flags2, stats2, sums2):
        by_flag[f] += c
        by_stat[s] += c
    total = sum(sums2)
    flags = flags2 + list(by_flag) + ["ALL"] * len(by_stat) + ["ALL"]
    stats = stats2 + ["ALL"] * len(by_flag) + list(by_stat) + ["ALL"]
    sums = sums2 + list(by_flag.values()) + list(by_stat.values()) + [total]
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "l_linestatus": pa.array(stats, pa.string()),
            "sum_price": pa.array([s / 100.0 for s in sums], pa.float64()),
        }
    )


def q_window_rank_events(sf_dir: str):
    """B10 depth — navigation window functions per key: row_number, lag and
    lead of ``value`` per user ordered by (ts, event_id). Same single
    bucket-shuffle + vectorized sorted pass as q_window_funcs_events; lag /
    lead are pure value COPIES (no arithmetic), so floats match the SQL
    oracle bit-for-bit; window edges use a -1.0 sentinel (COALESCE'd the
    same way in the oracle — the driver hash never compares nulls)."""
    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=7) % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def rank_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        vals = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "prev_value": pa.array([], pa.float64()),
                    "next_value": pa.array([], pa.float64()),
                }
            )
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new)
        base = np.zeros(n, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)
        rn = np.arange(n) - base + 1
        prev = np.full(n, -1.0)
        prev[~new] = vals[np.flatnonzero(~new) - 1]
        last = np.empty(n, bool)  # last row of its user run
        last[:-1] = new[1:]
        last[-1] = True
        nxt = np.full(n, -1.0)
        nxt[~last] = vals[np.flatnonzero(~last) + 1]
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "rn": pa.array(rn, pa.int64()),
                "prev_value": pa.array(prev, pa.float64()),
                "next_value": pa.array(nxt, pa.float64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# CDC-style keyed upsert merge (SCD-1 "MERGE INTO ... latest version wins")
# ---------------------------------------------------------------------------


def merge_upsert(
    base_ds, updates_ds, key_cols: list[str], version_col: str, num_buckets: int = 64
):
    """Latest-version-per-key merge of two same-schema datasets: the row
    with the highest ``version_col`` per ``key_cols`` survives (SCD-1 /
    MERGE semantics — updates overwrite, unseen keys insert). ONE bounded
    exchange: rows bucket on hash(key) % 64, each bucket resolves its keys
    with a vectorized sort + first-of-run pass. No per-key groupby, no
    driver pull — scales to any corpus. Version ties (e.g. a replayed
    delta) are broken deterministically by sorting the REMAINING columns
    ascending (nested columns sort by a content-hash surrogate) and
    keeping the first — output is a pure function of the row multiset,
    independent of partitioning (house invariant)."""
    from pie_ray.util import hash64_array, hash64_ints

    def add_bucket(t: pa.Table) -> pa.Table:
        acc = np.zeros(t.num_rows, np.uint64)
        for k in key_cols:
            col = t.column(k)
            if pa.types.is_integer(col.type):
                h = hash64_ints(col.to_numpy(zero_copy_only=False), salt=11)
            else:
                h = hash64_array(col.to_pylist(), salt=b"mu")
            acc ^= h.astype(np.uint64)
        return t.append_column(
            "__bucket", pa.array((acc % num_buckets).astype(np.int32), pa.int32())
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        from pie_ray.util import hash64_array

        g = g.drop_columns(["__bucket"])
        # tie-break on every payload column so the survivor is a pure
        # function of the row multiset (house determinism invariant);
        # nested types (list/struct) crash Arrow sorting, so they ride as
        # a content-hash surrogate — computed ONLY when the bucket
        # actually contains a (key, version) duplicate (rare in real CDC;
        # the per-row stringify+hash is too expensive to pay always)
        nested = [
            c
            for c in g.column_names
            if c not in key_cols
            and c != version_col
            and pa.types.is_nested(g.schema.field(c).type)
        ]
        need_hash = False
        if nested and g.num_rows > 1:
            kv = g.select(key_cols + [version_col])
            need_hash = (
                kv.group_by(key_cols + [version_col]).aggregate([]).num_rows
                < g.num_rows
            )
        rest = []
        drop_after = []
        for c in g.column_names:
            if c in key_cols or c == version_col:
                continue
            if c in nested:
                if not need_hash:
                    continue  # no ties: nested columns need no tie-break
                hname = f"__h_{c}"
                g = g.append_column(
                    hname,
                    pa.array(
                        hash64_array(
                            [str(x) for x in g.column(c).to_pylist()], salt=b"mun"
                        ).astype("uint64"),
                        pa.uint64(),
                    ),
                )
                rest.append(hname)
                drop_after.append(hname)
            else:
                rest.append(c)
        order = pc.sort_indices(
            g,
            sort_keys=[(k, "ascending") for k in key_cols]
            + [(version_col, "descending")]
            + [(c, "ascending") for c in rest],
        )
        g = g.take(order)
        if drop_after:
            g = g.drop_columns(drop_after)
        n = g.num_rows
        if n == 0:
            return g
        first = np.zeros(n, bool)
        first[0] = True
        for k in key_cols:
            col = g.column(k).combine_chunks()
            neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
            first[1:] |= neq.to_numpy(zero_copy_only=False)
        return g.filter(pa.array(first))

    return (
        base_ds.union(updates_ds)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def q_merge_upsert(sf_dir: str):
    """Driver entry: orders is the base snapshot (version 0); a deterministic
    CDC delta (every 7th orderkey, price bumped 500 cents, version 1)
    upserts into it. Exact int-cents so the merged values hash bit-equal."""
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]

    def shape(version: int, bump: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": t.column("o_orderkey"),
                    "o_custkey": t.column("o_custkey"),
                    "price_cents": pc.add(cents(t.column("o_totalprice")), bump),
                    "version": pa.array(
                        np.full(t.num_rows, version, np.int64), pa.int64()
                    ),
                }
            )

        return fn

    from pie_ray.util import bucket_count

    raw = scan(sf_dir, "orders", columns=cols)
    nb = bucket_count(raw.size_bytes(), floor=64)
    base = raw.map_batches(shape(0, 0), batch_format="pyarrow")
    def pick_delta(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys % 7 == 0))

    upd = (
        scan(sf_dir, "orders", columns=cols)
        .map_batches(pick_delta, batch_format="pyarrow")
        .map_batches(shape(1, 500), batch_format="pyarrow")
    )
    return merge_upsert(base, upd, ["o_orderkey"], "version", num_buckets=nb)


# ---------------------------------------------------------------------------
# UNPIVOT / melt (wide -> long), the inverse of q_pivot_revenue
# ---------------------------------------------------------------------------


def melt(ds, id_vars: list[str], value_vars: list[str], var_name: str = "measure",
         value_name: str = "value"):
    """Distributed wide->long explode: each row becomes len(value_vars) rows
    (id_vars, var_name=<column name>, value_name=<that column's value>).
    Stateless map-only (fuse-friendly), no shuffle: the explode is a
    per-batch Arrow concat of one slice per value column. All value_vars
    must share one Arrow type (they land in a single column)."""

    def explode(t: pa.Table) -> pa.Table:
        pieces = []
        for v in value_vars:
            cols = {k: t.column(k) for k in id_vars}
            cols[var_name] = pa.array([v] * t.num_rows, pa.string())
            cols[value_name] = t.column(v)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(explode, batch_format="pyarrow")


def q_unpivot_revenue(sf_dir: str):
    """Driver entry: per-returnflag sums of quantity and price-cents
    (exact int64 partial agg), melted to (l_returnflag, measure, value)
    long form — the inverse shape of pivot_revenue."""
    ds = scan(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def to_ints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_c": cents(t.column("l_extendedprice")),
            }
        )

    agg = lowcard_group_agg(
        ds.map_batches(to_ints, batch_format="pyarrow"),
        ["l_returnflag"],
        ["qty", "price_c"],
    )
    wide = pa.table(
        {
            "l_returnflag": agg.column("l_returnflag"),
            "sum_qty": agg.column("qty__sum"),
            "sum_price_cents": agg.column("price_c__sum"),
        }
    )
    return melt(
        ray.data.from_arrow(wide),
        id_vars=["l_returnflag"],
        value_vars=["sum_qty", "sum_price_cents"],
    )


# ---------------------------------------------------------------------------
# Ranking window functions: rank / dense_rank / percent_rank / ntile
# ---------------------------------------------------------------------------


def q_window_ntile_events(sf_dir: str):
    """B10 depth — ranking windows per user: rank/dense_rank/percent_rank
    over a TIE-RICH key (event_type — ties are the whole point of these
    three), plus ntile(4) over the unique (value, event_id) order. Same
    one-bucket-shuffle + vectorized sorted pass as q_window_rank_events;
    percent_rank is the same (rank-1)/(n-1) double division DuckDB does,
    so floats match bit-for-bit."""
    from pie_ray.util import bucket_count, hash64_ints

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=7) % nb
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def rank_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        n = g.num_rows
        empty = {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
            "drnk": pa.array([], pa.int64()),
            "pct": pa.array([], pa.float64()),
            "cd": pa.array([], pa.float64()),
            "nt": pa.array([], pa.int64()),
        }
        if n == 0:
            return pa.table(empty)
        # pass 1: (user_id, event_type) ordering for rank/dense/percent
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("event_type", "ascending")]
        )
        s = g.take(order)
        users = s.column("user_id").to_numpy(zero_copy_only=False)
        new_u = np.zeros(n, bool)
        new_u[0] = True
        new_u[1:] = users[1:] != users[:-1]
        et = s.column("event_type").combine_chunks()
        new_key = new_u.copy()
        new_key[1:] |= pc.not_equal(et.slice(1), et.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.zeros(n, np.int64)
        starts[new_u] = np.flatnonzero(new_u)
        np.maximum.accumulate(starts, out=starts)
        # rank: position of the first row of this tie-group within the user
        tie_start = np.zeros(n, np.int64)
        tie_start[new_key] = np.flatnonzero(new_key)
        np.maximum.accumulate(tie_start, out=tie_start)
        rnk = tie_start - starts + 1
        # dense_rank: running count of tie-group starts within the user
        grp = np.cumsum(new_key)
        grp_at_start = np.zeros(n, np.int64)
        grp_at_start[new_u] = grp[new_u]
        np.maximum.accumulate(grp_at_start, out=grp_at_start)
        drnk = grp - grp_at_start + 1
        # cume_dist: (rows preceding or peer) / user rows — the peer-group
        # END index makes the numerator; same int/int double division as SQL
        tg_starts = np.flatnonzero(new_key)
        tg_ends = np.append(tg_starts[1:], n)
        tgid = grp - 1
        # percent_rank: (rank-1)/(user_rows-1), 0.0 for single-row users
        last_u = np.empty(n, bool)
        last_u[:-1] = new_u[1:]
        last_u[-1] = True
        idx_last = np.flatnonzero(last_u)
        lens = np.diff(np.concatenate(([0], idx_last + 1)))
        run_len = np.repeat(lens, lens)
        pct = np.where(run_len > 1, (rnk - 1) / np.maximum(run_len - 1, 1), 0.0)
        cd = (tg_ends[tgid] - starts) / run_len
        ids_pass1 = s.column("event_id")

        # pass 2: ntile(4) over the unique (value, event_id) order
        order2 = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("value", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        s2 = g.take(order2)
        users2 = s2.column("user_id").to_numpy(zero_copy_only=False)
        new2 = np.zeros(n, bool)
        new2[0] = True
        new2[1:] = users2[1:] != users2[:-1]
        starts2 = np.zeros(n, np.int64)
        starts2[new2] = np.flatnonzero(new2)
        np.maximum.accumulate(starts2, out=starts2)
        pos2 = np.arange(n) - starts2
        last2 = np.empty(n, bool)
        last2[:-1] = new2[1:]
        last2[-1] = True
        idx_last2 = np.flatnonzero(last2)
        lens2 = np.diff(np.concatenate(([0], idx_last2 + 1)))
        rl2 = np.repeat(lens2, lens2)
        # SQL ntile(k): first (n % k) buckets get ceil(n/k) rows
        k = 4
        big = rl2 % k
        size_big = -(-rl2 // k)  # ceil
        size_small = rl2 // k
        cut = big * size_big  # rows covered by the big buckets
        nt = np.where(
            pos2 < cut,
            pos2 // np.maximum(size_big, 1),
            big + (pos2 - cut) // np.maximum(size_small, 1),
        ) + 1

        t1 = pa.table(
            {
                "event_id": ids_pass1,
                "rnk": pa.array(rnk, pa.int64()),
                "drnk": pa.array(drnk, pa.int64()),
                "pct": pa.array(pct, pa.float64()),
                "cd": pa.array(cd, pa.float64()),
            }
        )
        t2 = pa.table(
            {"event_id": s2.column("event_id"), "nt": pa.array(nt, pa.int64())}
        )
        j = t1.join(t2, keys=["event_id"], join_type="inner")
        j = j.take(pc.sort_indices(j, sort_keys=[("event_id", "ascending")]))
        uid = g.take(
            pc.sort_indices(g, sort_keys=[("event_id", "ascending")])
        ).column("user_id")
        return pa.table(
            {
                "event_id": j.column("event_id"),
                "user_id": uid,
                "rnk": j.column("rnk"),
                "drnk": j.column("drnk"),
                "pct": j.column("pct"),
                "cd": j.column("cd"),
                "nt": j.column("nt"),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# UNNEST / explode of a list column, and broadcast CROSS JOIN
# ---------------------------------------------------------------------------


def explode_list(ds, id_cols: list[str], list_col: str,
                 pos_name: str = "pos", value_name: str = "val"):
    """Distributed UNNEST WITH ORDINALITY: one output row per list element,
    carrying ``id_cols``, the 0-based element position and the element
    value. Stateless per-batch Arrow explode (flatten + np.repeat of ids —
    no Python loop over rows), no shuffle. Null/empty lists emit no rows
    (DuckDB unnest semantics)."""

    def explode(t: pa.Table) -> pa.Table:
        col = t.column(list_col).combine_chunks()
        lens = (
            pc.fill_null(pc.list_value_length(col), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        values = pc.list_flatten(col)
        idx = np.repeat(np.arange(t.num_rows), lens)
        # position within each list: global arange minus each row's start;
        # the [:1] slice (not [0]) keeps the seed empty for a 0-row batch,
        # where cumsum(lens)[:-1] has length 0 but ([0], ...) would not
        starts = np.repeat(
            np.concatenate((np.zeros(min(len(lens), 1), np.int64), np.cumsum(lens)[:-1])),
            lens,
        )
        pos = np.arange(int(lens.sum())) - starts
        cols = {c: t.column(c).take(pa.array(idx)) for c in id_cols}
        cols[pos_name] = pa.array(pos, pa.int64())
        cols[value_name] = values
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def q_explode_embedding(sf_dir: str):
    """Driver entry: UNNEST the embedding vectors — (vec_id, pos, val),
    one row per vector component."""
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return explode_list(ds, ["vec_id"], "embedding")


def cross_join(big_ds, small_table: pa.Table):
    """Broadcast CROSS JOIN: every big-side row pairs with every row of the
    (small, driver-resident) right table. The right side ships to workers
    once via the object store (captured ref) — each batch explodes to
    n x m rows with vectorized repeat/tile, no shuffle. For two LARGE
    inputs a cross join is O(n*m) output and is the wrong tool at scale —
    this is deliberately the broadcast form only."""
    import ray as _ray

    small_ref = _ray.put(small_table)

    def pair(t: pa.Table) -> pa.Table:
        s = _ray.get(small_ref)
        n, m = t.num_rows, s.num_rows
        left_idx = pa.array(np.repeat(np.arange(n), m))
        right_idx = pa.array(np.tile(np.arange(m), n))
        cols = {c: t.column(c).take(left_idx) for c in t.column_names}
        for c in s.column_names:
            cols[c] = s.column(c).take(right_idx)
        return pa.table(cols)

    return big_ds.map_batches(pair, batch_format="pyarrow")


def q_cross_join(sf_dir: str):
    """Driver entry: nation x region (25 x 5) — the canonical small-dims
    cartesian product."""
    import pyarrow.parquet as pq

    nations = scan(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    region = pq.read_table(table_path(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    return cross_join(nations, region)


# ---------------------------------------------------------------------------
# Total-order global sort rank (distributed ORDER BY + row_number)
# ---------------------------------------------------------------------------


def sample_range_boundaries(ds, key_col: str, num_ranges: int):
    """Range-partitioning boundaries for a total order on ``key_col``:
    each batch ships <= 32 stride-sampled keys to the driver, which picks
    the num_ranges-1 sample quantiles. Returns a sorted deduped numpy
    array, or None for an empty dataset. Boundaries only balance load —
    exactness of consumers (global_rank, the sorted sink) never depends
    on the sample."""

    def sample_keys(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        n = len(keys)
        stride = max(1, n // 32)
        return pa.table({"k": keys.take(pa.array(range(0, n, stride)))})

    samples = ds.map_batches(sample_keys, batch_format="pyarrow").take_all()
    if not samples:
        return None
    ks = np.sort(np.asarray([r["k"] for r in samples]))
    qs = np.linspace(0, len(ks) - 1, num_ranges + 1)[1:-1].astype(np.int64)
    return np.unique(ks[qs])


def make_range_tagger(key_col: str, boundaries: np.ndarray):
    """Batch fn appending ``__range`` = searchsorted(boundaries, key,
    side='right') — all ties of a key value land in ONE range, so ranges
    partition the total order exactly. The boundary array rides the
    object store once (captured ref), not per task."""
    import ray as _ray

    bref = _ray.put(boundaries)

    def add_range(t: pa.Table) -> pa.Table:
        b = _ray.get(bref)
        r = np.searchsorted(
            b, t.column(key_col).to_numpy(zero_copy_only=False), side="right"
        ).astype(np.int32)
        return t.append_column("__range", pa.array(r, pa.int32()))

    return add_range


def global_rank(ds, key_col: str, tie_col: str, rank_name: str = "rn",
                num_ranges: int = 64):
    """Dense global row numbering under ORDER BY (key_col, tie_col) — the
    distributed total-order sort primitive — WITHOUT pulling the data to
    the driver. Three bounded steps:

    1. sample: each batch ships <= 32 stride-sampled keys; the driver picks
       ``num_ranges``-1 quantile boundaries (tiny).
    2. count: one map pass bins rows into ranges (searchsorted side='right'
       — all ties of a key land in ONE range, so ranges partition the total
       order exactly); per-batch range counts combine to prefix-sum offsets
       on the driver (num_ranges ints).
    3. rank: ONE exchange on the range id; each range sorts locally by
       (key, tie) and adds its offset.

    Ranks are EXACT and independent of partitioning and of the sampled
    boundaries (boundaries only balance load). Heavy key ties concentrate
    in one range by construction — a total order cannot split ties — so
    callers with a near-constant key should rank on a finer key.
    ``tie_col`` must be unique per row (it makes the order total).

    The input is SCANNED THREE times (sample, count, rank) rather than
    materialized between passes — at corpus scale two extra streaming map
    passes are cheaper than pinning the whole dataset in the object store;
    pass a pre-materialized ds if the input is an expensive derived chain."""
    boundaries = sample_range_boundaries(ds, key_col, num_ranges)
    if boundaries is None:
        return ds.map_batches(
            lambda t: t.append_column(rank_name, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    import ray as _ray

    add_range = make_range_tagger(key_col, boundaries)

    def count_ranges(t: pa.Table) -> pa.Table:
        cnt = np.bincount(
            t.column("__range").to_numpy(zero_copy_only=False),
            minlength=len(boundaries) + 1,
        )
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "r": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    ranged = ds.map_batches(add_range, batch_format="pyarrow")
    counts = np.zeros(len(boundaries) + 1, np.int64)
    for row in ranged.map_batches(count_ranges, batch_format="pyarrow").take_all():
        counts[row["r"]] += row["c"]
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    oref = _ray.put(offsets)

    def rank_range(g: pa.Table) -> pa.Table:
        off = _ray.get(oref)[int(g.column("__range")[0].as_py())]
        g = g.drop_columns(["__range"])
        order = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (tie_col, "ascending")]
        )
        g = g.take(order)
        return g.append_column(
            rank_name, pa.array(off + 1 + np.arange(g.num_rows), pa.int64())
        )

    return ranged.groupby("__range").map_groups(rank_range, batch_format="pyarrow")


def q_global_sort(sf_dir: str):
    """Driver entry: dense global rank of every event under
    ORDER BY (value, event_id) — verifies the distributed total order
    row-for-row (an unranked ORDER BY would be invisible to the driver's
    order-insensitive hash)."""
    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return global_rank(ds, "value", "event_id")


# ---------------------------------------------------------------------------
# Fixed-bin numeric histogram (the EDA staple; exact, mergeable counts)
# ---------------------------------------------------------------------------


def histogram(ds, col: str, lo: float, hi: float, nbins: int) -> pa.Table:
    """Exact fixed-width histogram of ``col`` over [lo, hi): per-batch
    np.bincount partials (nbins+2 ints each — underflow bin -1 and
    overflow bin nbins included) merged by addition on the driver. ONE
    map pass, no shuffle; driver state is O(nbins). Bin rule is
    floor((v-lo)/width) in float64 — the same double math the SQL oracle
    computes, so edge values bin identically. Nulls AND NaNs are skipped
    (NaN would otherwise floor to NaN and poison the int cast)."""
    width = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(col), pa.float64()).drop_null().to_numpy(
            zero_copy_only=False
        )
        v = v[~np.isnan(v)]
        b = np.floor((v - lo) / width)
        b = np.clip(b, -1, nbins).astype(np.int64) + 1  # -1..nbins -> 0..nbins+1
        cnt = np.bincount(b, minlength=nbins + 2)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    counts = np.zeros(nbins + 2, np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        counts[row["b"]] += row["c"]
    bins = np.arange(-1, nbins + 1, dtype=np.int64)
    keep = counts > 0
    return pa.table(
        {
            "bin": pa.array(bins[keep], pa.int64()),
            "lo": pa.array(np.where(bins == -1, -np.inf, lo + bins * width)[keep]),
            "hi": pa.array(
                np.where(bins == nbins, np.inf, lo + (bins + 1) * width)[keep]
            ),
            "n": pa.array(counts[keep], pa.int64()),
        }
    )


def q_histogram_quantity(sf_dir: str):
    """Driver entry: 10-bin histogram of lineitem quantity over [0, 50)
    (integer-valued column — no float edge ambiguity in the oracle)."""
    ds = scan(sf_dir, "lineitem", columns=["l_quantity"])
    t = histogram(ds, "l_quantity", 0.0, 50.0, 10)
    return t.select(["bin", "n"])


# ---------------------------------------------------------------------------
# TPC-H Q5-style 5-table star join (region -> nation -> customer -> orders
# -> lineitem): the composition flagship for the relational layer
# ---------------------------------------------------------------------------


def q_regional_revenue(sf_dir: str):
    """Revenue per nation for one region: both dimension hops (region
    filter, nation names) ride a BROADCAST dict — only the two fact tables
    ever shuffle, and the lineitem side is pre-reduced per orderkey inside
    each batch before its join (the same exact-1e-4-dollars partial as
    q_order_lineitem_join). One customer⋈orders hash join, one
    pre-reduced-lineitem⋈result hash join, then a 25-key driver combine."""
    import pyarrow.parquet as pq

    from pie_ray.util import join_num_partitions, rename_grouped

    region = pq.read_table(table_path(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkeys = set(
        region.filter(pc.equal(region.column("r_name"), "ASIA"))
        .column("r_regionkey")
        .to_pylist()
    )
    nation = pq.read_table(
        table_path(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey", "n_name"]
    )
    nation = nation.filter(
        pc.is_in(nation.column("n_regionkey"), pa.array(sorted(rkeys)))
    )
    name_of = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    keep_nations = pa.array(sorted(name_of), pa.int64())

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def in_region(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t.column("c_nationkey"), pa.int64()), keep_nations))

    cust = cust.map_batches(in_region, batch_format="pyarrow")
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    co = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_num_partitions(orders.size_bytes()),
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).materialize()  # SMALL (regional orders) barrier: never let the two
    # join exchanges share one streaming plan (aggregator-actor starvation
    # hangs at few CPUs — the repo-wide exchange rule)

    li = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    # size the join off the RAW scan (metadata) — size_bytes() on the
    # mapped plan would execute the whole pre-reduce an extra time
    li_parts = join_num_partitions(li.size_bytes())

    def pre_reduce(t: pa.Table) -> pa.Table:
        rev4 = pc.multiply(
            cents(t.column("l_extendedprice")),
            pc.subtract(pa.scalar(100, pa.int64()), cents(t.column("l_discount"))),
        )
        part = pa.table({"l_orderkey": t.column("l_orderkey"), "rev4": rev4})
        gb = part.group_by(["l_orderkey"]).aggregate([("rev4", "sum")])
        return rename_grouped(gb, ["l_orderkey"], ["l_orderkey", "rev4"])

    li = li.map_batches(pre_reduce, batch_format="pyarrow")
    joined = li.join(
        co,
        join_type="inner",
        num_partitions=li_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = lowcard_group_agg(joined, keys=["c_nationkey"], sum_cols=["rev4"])
    names = pa.array(
        [name_of[int(k)] for k in agg.column("c_nationkey").to_pylist()], pa.string()
    )
    out = pa.table(
        {
            "n_name": names,
            "revenue": pc.divide(
                pc.cast(agg.column("rev4__sum"), pa.float64()), pa.scalar(10000.0)
            ),
        }
    )
    return out.sort_by([("n_name", "ascending")])


def grouped_histogram(ds, col: str, keys: list[str], lo: float, hi: float,
                      nbins: int) -> pa.Table:
    """Per-group fixed-width histogram: same exact float64 floor rule as
    ``histogram``, with per-batch (keys, bin) partial counts combined once
    on the driver (state is O(groups x nbins) — for low-cardinality keys,
    the lowcard_group_agg shape; a high-cardinality key belongs in a
    bucketed shuffle instead)."""
    width = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(col)))  # COUNT(col) semantics
        v = pc.cast(t.column(col), pa.float64()).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(~np.isnan(v)))  # NaN skipped like null
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / width), -1, nbins).astype(np.int64)
        part = pa.table(
            {
                **{k: t.column(k) for k in keys},
                "bin": pa.array(b, pa.int64()),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        gb = part.group_by(keys + ["bin"]).aggregate([("n", "sum")])
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, keys + ["bin"], keys + ["bin", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(parts)
    gb = merged.group_by(keys + ["bin"]).aggregate([("n", "sum")])
    from pie_ray.util import rename_grouped

    out = rename_grouped(gb, keys + ["bin"], keys + ["bin", "n"])
    return out.sort_by([(k, "ascending") for k in keys] + [("bin", "ascending")])


def q_grouped_histogram(sf_dir: str):
    """Driver entry: per-returnflag 10-bin quantity histogram."""
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return grouped_histogram(ds, "l_quantity", ["l_returnflag"], 0.0, 50.0, 10)


# ---------------------------------------------------------------------------
# Funnel analysis (A-then-B per user over the events stream)
# ---------------------------------------------------------------------------


def funnel(ds, step_a: str, step_b: str, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           num_buckets: int = 32):
    """Per-user two-step funnel: the user's FIRST ``step_a`` event, and the
    first ``step_b`` event strictly after it (epoch-us sentinel 0 when the
    user never converts). One user-bucketed exchange, vectorized sorted
    pass per bucket — rows with other event types are dropped map-side
    before the shuffle, so only funnel-relevant events move."""
    from pie_ray.util import hash64_ints

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column(type_col), pa.array([step_a, step_b]))
        t = t.filter(mask)
        b = (
            hash64_ints(t.column(user_col).to_numpy(zero_copy_only=False), salt=13)
            % num_buckets
        ).astype("int32")
        return pa.table(
            {
                "user_id": t.column(user_col),
                "ts_us": pc.cast(t.column(ts_col), pa.int64()),
                "is_a": pc.equal(t.column(type_col), step_a),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts_us", "ascending")]
        )
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        is_a = g.column("is_a").to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "first_a_us": pa.array([], pa.int64()),
                    "first_b_after_us": pa.array([], pa.int64()),
                }
            )
        new = np.zeros(n, bool)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1  # 0..nruns-1, one per user
        nruns = len(starts)
        # first A row per user (scatter-min of row positions), then the
        # first B row strictly after that A — all vectorized
        first_a = np.full(nruns, n, np.int64)
        np.minimum.at(first_a, run_id[is_a], np.flatnonzero(is_a))
        has_a = first_a < n
        ta = np.where(has_a, ts[np.minimum(first_a, n - 1)], 0)
        cand = (~is_a) & (ts > ta[run_id]) & has_a[run_id]
        first_b = np.full(nruns, n, np.int64)
        np.minimum.at(first_b, run_id[cand], np.flatnonzero(cand))
        tb = np.where(first_b < n, ts[np.minimum(first_b, n - 1)], 0)
        return pa.table(
            {
                "user_id": pa.array(users[starts][has_a], pa.int64()),
                "first_a_us": pa.array(ta[has_a], pa.int64()),
                "first_b_after_us": pa.array(tb[has_a], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def q_funnel_events(sf_dir: str):
    """Driver entry: click -> purchase funnel over the events table."""
    from pie_ray.util import bucket_count

    ds = scan(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel(
        ds, "click", "purchase", num_buckets=bucket_count(ds.size_bytes(), floor=32)
    )


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events: users cohorted by their first
    'signup' day (epoch days — deliberately calendar-free integer math so
    the engine and SQL agree exactly), counted once per (cohort_day,
    week_offset) they were active in. ONE user-bucketed exchange (a user's
    rows co-locate, so per-bucket distinct IS global distinct), per-bucket
    scatter-min + vectorized offsets, driver combine over the tiny
    (cohorts x offsets) matrix."""
    from pie_ray.util import bucket_count, hash64_ints, rename_grouped

    DAY_US = 86_400_000_000
    ds = scan(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    nb = bucket_count(ds.size_bytes(), floor=32)

    def prep(t: pa.Table) -> pa.Table:
        b = (
            hash64_ints(t.column("user_id").to_numpy(zero_copy_only=False), salt=19)
            % nb
        ).astype("int32")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(pc.cast(t.column("ts"), pa.int64()), DAY_US),
                "is_signup": pc.equal(t.column("event_type"), "signup"),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(g, sort_keys=[("user_id", "ascending")])
        g = g.take(order)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        is_s = g.column("is_signup").to_numpy(zero_copy_only=False)
        n = len(users)
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "week_off": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        new = np.zeros(n, bool)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        run_id = np.cumsum(new) - 1
        nruns = int(run_id[-1]) + 1
        BIG = np.iinfo(np.int64).max
        cohort = np.full(nruns, BIG, np.int64)
        np.minimum.at(cohort, run_id[is_s], day[is_s])
        has = cohort[run_id] != BIG
        sel = has & (day >= cohort[run_id])
        co = cohort[run_id][sel]
        off = (day[sel] - co) // 7
        trip = pa.table(
            {
                "cohort_day": pa.array(co, pa.int64()),
                "week_off": pa.array(off, pa.int64()),
                "u": pa.array(users[sel], pa.int64()),
            }
        )
        d = trip.group_by(["cohort_day", "week_off", "u"]).aggregate([])
        d = d.append_column("n", pa.array(np.ones(d.num_rows, np.int64)))
        gb = d.select(["cohort_day", "week_off", "n"]).group_by(
            ["cohort_day", "week_off"]
        ).aggregate([("n", "sum")])
        return rename_grouped(
            gb, ["cohort_day", "week_off"], ["cohort_day", "week_off", "n"]
        )

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .take_all()
    )
    merged = pa.Table.from_pylist(parts)
    from pie_ray.util import rename_grouped

    gb = merged.group_by(["cohort_day", "week_off"]).aggregate([("n", "sum")])
    out = rename_grouped(
        gb, ["cohort_day", "week_off"], ["cohort_day", "week_off", "n_users"]
    )
    return out.sort_by([("cohort_day", "ascending"), ("week_off", "ascending")])


def q_right_outer_join(sf_dir: str):
    """B5 completeness — RIGHT OUTER at row grain: every big order keeps
    its row even when its customer fails the balance filter (the mirrored
    shape of q_outer_join; Ray's native ``right_outer`` hash join). Same
    sentinel-coalesce guard so the driver hash never compares nulls."""
    from pie_ray.util import join_num_partitions

    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 5000.0"
    )
    raw_orders = scan(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    n_parts = join_num_partitions(raw_orders.size_bytes())  # RAW scan: a
    # filtered plan's size_bytes would execute the filter an extra time
    orders = raw_orders.filter(expr="o_totalprice > 250000.0")
    joined = cust.join(
        orders,
        join_type="right_outer",
        num_partitions=n_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def coalesce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_totalprice": t.column("o_totalprice"),
                "c_acctbal": pc.fill_null(t.column("c_acctbal"), pa.scalar(-1.0)),
            }
        )

    return joined.map_batches(coalesce, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact order statistics on unbounded-distinct columns: distributed
# selection by iterative histogram refinement (no shuffle, no sort)
# ---------------------------------------------------------------------------

EQ_BINS = 2048
EQ_PULL_LIMIT = 262_144


def _eq_rank(n: int, q: float) -> int:
    """DuckDB quantile_disc rank: the max(1, ceil(n*q))-th smallest,
    computed with the SAME double product DuckDB uses (verified
    empirically incl. the float edges 7*0.7 and 10*0.9)."""
    import math

    return max(1, math.ceil(n * q))


def _eq_clean(t: pa.Table, col: str) -> np.ndarray:
    v = pc.cast(t.column(col), pa.float64()).drop_null().to_numpy(
        zero_copy_only=False
    )
    return v[~np.isnan(v)]


def _eq_member(v: np.ndarray, sels) -> np.ndarray:
    """Exact round membership: the CONJUNCTION of every prior round's bin
    test, applied in the IDENTICAL clip form the counting pass used (a
    plain floor test would disagree at the edge bins — the column max
    always raw-floors to EQ_BINS and only clip folds it into the last
    bin). The chain is PURE clip tests: no derived-range (v >= lo)&(v <= hi)
    refinement anywhere, because the derived child bounds lo + j*w are not
    exactly nested in the parent bin under float rounding — a value within
    ~1 ulp of a bin boundary could be counted in bin j yet dropped by the
    range test next round, shifting the selected rank (ADVICE r3). With
    clip-only tests the round population is exactly the set the previous
    round counted."""
    keep = np.ones(len(v), bool)
    for lo, w, j, _hi in sels:
        keep &= np.clip(np.floor((v - lo) / w), 0, EQ_BINS - 1) == j
    return v[keep]


def exact_quantile_disc(ds, col: str, q: float,
                        stats: tuple[int, float, float] | None = None,
                        k: int | None = None) -> float:
    """The k-th smallest value (k = max(1, ceil(n*q)) — DuckDB
    quantile_disc semantics) of a column with UNBOUNDED distinct values,
    found WITHOUT a distributed sort: each round is one streaming map pass
    producing a 2048-bin count histogram of the current candidate set; the
    bin containing the k-th value narrows the candidates 2048x. Float64
    ranges collapse in <= ~5 rounds; the terminal bin (<= EQ_PULL_LIMIT
    rows) is pulled once and selected exactly. Driver state is O(bins) per
    round + one bounded pull — at 10^12 rows this replaces the full sort a
    naive exact quantile needs. Nulls/NaNs are excluded (SQL semantics).
    Pass ``stats`` = (n, min, max) to reuse one stats pass across several
    quantiles of the same column. Pass ``k`` to select an explicit
    1-indexed ORDER STATISTIC instead of deriving it from ``q`` (the
    interpolated-median caller needs both middle ranks)."""

    if stats is None:
        stats = _eq_stats(ds, col)
    n, lo, hi = stats
    k = _eq_rank(n, q) if k is None else k
    sels: list[tuple[float, float, int]] = []

    for _ in range(24):
        if not (hi > lo):
            return _eq_select_terminal(ds, col, sels, lo, hi, k)
        width = (hi - lo) / EQ_BINS
        if not (lo + width > lo):  # range at float resolution
            return _eq_select_terminal(ds, col, sels, lo, hi, k)

        def bin_counts(t: pa.Table, lo=lo, width=width, sels=tuple(sels)) -> pa.Table:
            # population = the selector chain ALONE (clip handles binning;
            # a derived-range refilter here would disagree with the chain
            # at bin-boundary ulps — see _eq_member)
            v = _eq_member(_eq_clean(t, col), sels)
            b = np.clip(np.floor((v - lo) / width), 0, EQ_BINS - 1).astype(np.int64)
            cnt = np.bincount(b, minlength=EQ_BINS)
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "b": pa.array(nz.astype(np.int64), pa.int64()),
                    "c": pa.array(cnt[nz].astype(np.int64), pa.int64()),
                }
            )

        counts = np.zeros(EQ_BINS, np.int64)
        for r in ds.map_batches(bin_counts, batch_format="pyarrow").take_all():
            counts[r["b"]] += r["c"]
        cum = np.cumsum(counts)
        # clamp: k <= cum[-1] holds by construction (population == counted
        # set), the min() is a guard against ever indexing counts[EQ_BINS]
        j = min(int(np.searchsorted(cum, k)), EQ_BINS - 1)
        before = int(cum[j - 1]) if j > 0 else 0
        # NOTE: the round's bin test is the clip form above; the recorded
        # selector must match it exactly for edge bins
        if counts[j] <= EQ_PULL_LIMIT:
            sels_final = sels + [(lo, width, j, hi)]
            return _eq_select_pull(ds, col, sels_final, k - before)
        k -= before
        sels = sels + [(lo, width, j, hi)]
        lo, hi = lo + j * width, min(hi, lo + (j + 1) * width)
    return _eq_select_terminal(ds, col, sels, lo, hi, k)


def _eq_stats(ds, col: str) -> tuple[int, float, float]:
    def minmax_count(t: pa.Table) -> pa.Table:
        v = _eq_clean(t, col)
        if len(v) == 0:
            return pa.table(
                {"n": pa.array([], pa.int64()), "lo": pa.array([], pa.float64()),
                 "hi": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "lo": pa.array([float(v.min())], pa.float64()),
                "hi": pa.array([float(v.max())], pa.float64()),
            }
        )

    rows = ds.map_batches(minmax_count, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError(f"exact_quantile_disc: no non-null values in {col}")
    return (
        sum(r["n"] for r in rows),
        min(r["lo"] for r in rows),
        max(r["hi"] for r in rows),
    )


def _eq_select_pull(ds, col: str, sels, k: int) -> float:
    """Terminal: pull the final bin's members (the selector chain defines
    the set EXACTLY as counted) and select the k-th smallest."""

    def pull(t: pa.Table, sels=tuple(sels)) -> pa.Table:
        v = _eq_member(_eq_clean(t, col), sels)
        return pa.table({"v": pa.array(v, pa.float64())})

    vals = np.sort(
        np.concatenate(
            [
                bt.column("v").to_numpy(zero_copy_only=False)
                for bt in ds.map_batches(pull, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
                if bt.num_rows
            ]
        )
    )
    return float(vals[k - 1])


def _eq_select_terminal(ds, col: str, sels, lo: float, hi: float, k: int) -> float:
    """Collapsed-range terminal: distinct(value)+counts of the current
    candidate set (a float-resolution interval holds at most ~EQ_BINS
    representable doubles), exact selection on the driver. Always returns
    an ACTUAL data value."""

    def dcounts(t: pa.Table, sels=tuple(sels)) -> pa.Table:
        # chain-only population (the interval bound holds structurally:
        # with an empty chain lo/hi are the GLOBAL min/max of a
        # sub-resolution range, with a chain the members sit in the last
        # selected bin — either way distinct values stay ~EQ_BINS-bounded)
        v = _eq_member(_eq_clean(t, col), sels)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.float64()), "c": pa.array(c.astype(np.int64))}
        )

    acc: dict[float, int] = {}
    for r in ds.map_batches(dcounts, batch_format="pyarrow").take_all():
        acc[r["v"]] = acc.get(r["v"], 0) + r["c"]
    us = np.array(sorted(acc))
    cs = np.array([acc[u] for u in us], np.int64)
    return float(us[min(int(np.searchsorted(np.cumsum(cs), k)), len(us) - 1)])


def q_exact_median(sf_dir: str):
    """Driver entry: exact discrete median and p90 of l_extendedprice —
    an unbounded-distinct column where the count-histogram quantile
    (q_grouped_quantiles) does not apply; values are actual data points,
    so the floats match the SQL oracle bit-for-bit. The stats pass is
    shared across the two quantiles."""
    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])
    stats = _eq_stats(ds, "l_extendedprice")
    return pa.table(
        {
            "median_price": pa.array(
                [exact_quantile_disc(ds, "l_extendedprice", 0.5, stats=stats)],
                pa.float64(),
            ),
            "p90_price": pa.array(
                [exact_quantile_disc(ds, "l_extendedprice", 0.9, stats=stats)],
                pa.float64(),
            ),
        }
    )


def q_exact_median_interp(sf_dir: str):
    """Driver entry: INTERPOLATED exact median of l_extendedprice. Both
    middle order statistics come from the histogram-narrowing selector
    (ranks (n+1)//2 and n//2+1 — equal when n is odd), and the result is
    the ONE float expression ``(a + b) / 2.0`` on both sides, so the
    value hash-matches the oracle bit-for-bit without depending on any
    engine's quantile_cont interpolation formula."""
    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])
    stats = _eq_stats(ds, "l_extendedprice")
    n = stats[0]
    a = exact_quantile_disc(ds, "l_extendedprice", 0.5, stats=stats,
                            k=(n + 1) // 2)
    b = exact_quantile_disc(ds, "l_extendedprice", 0.5, stats=stats,
                            k=n // 2 + 1)
    return pa.table({"median_interp": pa.array([(a + b) / 2.0], pa.float64())})


EXACT_MEDIAN_INTERP_ORACLE_SQL = """
    -- both middle order statistics by VALUE rank, one shared float
    -- expression (a + b) / 2.0 — no engine quantile_cont involved
    WITH o AS (
      SELECT l_extendedprice AS x,
             row_number() OVER (ORDER BY l_extendedprice) AS rn
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), n AS (SELECT COUNT(*) AS c FROM o)
    SELECT (a.x + b.x) / 2.0 AS median_interp
    FROM o a, o b, n
    WHERE a.rn = (n.c + 1) // 2 AND b.rn = n.c // 2 + 1
"""


def exact_quantile_disc_grouped(ds, col: str, q: float, key: str) -> pa.Table:
    """Per-group exact_quantile_disc (k = max(1, ceil(n_g * q)) per group),
    all groups refined SIMULTANEOUSLY: every round is still one streaming
    pass — each row bins inside ITS group's candidate set (broadcast
    per-group selector chains, index_in on the key), so driver state is
    O(groups x EQ_BINS) and the pass count stays <= ~5 regardless of group
    count. Low-cardinality keys only (the state is driver-resident); a
    high-cardinality key wants the sketch. Key dtype (string or int) is
    preserved. Returns (key, value)."""
    import ray as _ray

    sch = ds.schema()
    ktype = sch.types[sch.names.index(key)]

    def minmax_count(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(col)))
        v = pc.cast(t.column(col), pa.float64()).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(~np.isnan(v)))
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], ktype), "n": pa.array([], pa.int64()),
                 "lo": pa.array([], pa.float64()), "hi": pa.array([], pa.float64())}
            )
        part = pa.table(
            {
                key: t.column(key),
                "v": pc.cast(t.column(col), pa.float64()),
                "__one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        gb = part.group_by([key]).aggregate(
            [("__one", "sum"), ("v", "min"), ("v", "max")]
        )
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, [key], [key, "n", "lo", "hi"])

    state: dict = {}
    for r in ds.map_batches(minmax_count, batch_format="pyarrow").take_all():
        st = state.setdefault(r[key], {"n": 0, "lo": np.inf, "hi": -np.inf})
        st["n"] += r["n"]
        st["lo"] = min(st["lo"], r["lo"])
        st["hi"] = max(st["hi"], r["hi"])
    groups = sorted(state)
    for g in groups:
        st = state[g]
        st["k"] = _eq_rank(st["n"], q)
        st["sels"] = []
        st["final"] = False  # True once the terminal bin is selected

    for _ in range(24):
        live = [
            g for g in groups
            if not state[g]["final"]
            and state[g]["hi"] > state[g]["lo"]
            and state[g]["lo"] + (state[g]["hi"] - state[g]["lo"]) / EQ_BINS
            > state[g]["lo"]
        ]
        if not live:
            break
        keys_arr = pa.array(live, ktype)
        los = np.array([state[g]["lo"] for g in live])
        widths = np.array([(state[g]["hi"] - state[g]["lo"]) / EQ_BINS for g in live])
        his = np.array([state[g]["hi"] for g in live])
        sels_by_gi = [tuple(state[g]["sels"]) for g in live]
        bref = _ray.put((keys_arr, los, widths, his, sels_by_gi))

        def bin_counts(t: pa.Table, bref=bref) -> pa.Table:
            keys_, los_, widths_, his_, sels_ = _ray.get(bref)
            t = t.filter(pc.is_valid(t.column(col)))
            gi = pc.fill_null(
                pc.index_in(t.column(key).combine_chunks(), value_set=keys_), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            v = pc.cast(t.column(col), pa.float64()).to_numpy(zero_copy_only=False)
            ok = (gi >= 0) & ~np.isnan(v)
            gi, v = gi[ok], v[ok]
            keep = np.ones(len(v), bool)
            for i in range(len(keys_)):  # selector chains are per group
                m = gi == i
                if not m.any() or not sels_[i]:
                    continue
                vi = v[m]
                ki = np.ones(len(vi), bool)
                # pure clip chain — see _eq_member (the derived-range test
                # is not ulp-nested in the parent bin)
                for lo_s, w_s, j_s, _hi_s in sels_[i]:
                    ki &= np.clip(
                        np.floor((vi - lo_s) / w_s), 0, EQ_BINS - 1
                    ) == j_s
                keep[np.flatnonzero(m)[~ki]] = False
            gi, v = gi[keep], v[keep]
            b = np.clip(
                np.floor((v - los_[gi]) / widths_[gi]), 0, EQ_BINS - 1
            ).astype(np.int64)
            cell = gi * EQ_BINS + b
            cnt = np.bincount(cell, minlength=len(keys_) * EQ_BINS)
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cell": pa.array(nz.astype(np.int64), pa.int64()),
                    "c": pa.array(cnt[nz].astype(np.int64), pa.int64()),
                }
            )

        counts = np.zeros(len(live) * EQ_BINS, np.int64)
        for r in ds.map_batches(bin_counts, batch_format="pyarrow").take_all():
            counts[r["cell"]] += r["c"]
        counts = counts.reshape(len(live), EQ_BINS)
        for i, g in enumerate(live):
            st = state[g]
            cum = np.cumsum(counts[i])
            j = min(int(np.searchsorted(cum, st["k"])), EQ_BINS - 1)
            before = int(cum[j - 1]) if j > 0 else 0
            width = (st["hi"] - st["lo"]) / EQ_BINS
            st["sels"] = st["sels"] + [(st["lo"], width, j, st["hi"])]
            st["k"] -= before
            if counts[i][j] <= EQ_PULL_LIMIT:
                st["final"] = True
            else:
                st["lo"], st["hi"] = (
                    st["lo"] + j * width,
                    min(st["hi"], st["lo"] + (j + 1) * width),
                )

    # terminal: ONE pass pulls distinct(value)+counts of every group's
    # final candidate set (each defined EXACTLY by its selector chain,
    # or by its collapsed [lo, hi] range), exact selection on the driver
    rng_keys = pa.array(groups, ktype)
    rlo = np.array([state[g]["lo"] for g in groups])
    rhi = np.array([state[g]["hi"] for g in groups])
    sels_all = [tuple(state[g]["sels"]) for g in groups]
    rref = _ray.put((rng_keys, rlo, rhi, sels_all))

    def dcounts(t: pa.Table, rref=rref) -> pa.Table:
        keys_, los_, his_, sels_ = _ray.get(rref)
        t = t.filter(pc.is_valid(t.column(col)))
        gi = pc.fill_null(
            pc.index_in(t.column(key).combine_chunks(), value_set=keys_), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        v = pc.cast(t.column(col), pa.float64()).to_numpy(zero_copy_only=False)
        ok = (gi >= 0) & ~np.isnan(v)
        gi, v = gi[ok], v[ok]
        keep = np.ones(len(v), bool)
        for i in range(len(keys_)):
            m = gi == i
            if not m.any():
                continue
            vi = v[m]
            # chain-only population (see _eq_select_terminal: the distinct
            # set stays bounded structurally without a range refilter)
            ki = np.ones(len(vi), bool)
            for lo_s, w_s, j_s, _hi_s in sels_[i]:
                ki &= np.clip(
                    np.floor((vi - lo_s) / w_s), 0, EQ_BINS - 1
                ) == j_s
            keep[np.flatnonzero(m)[~ki]] = False
        gi, v = gi[keep], v[keep]
        gb = (
            pa.table(
                {
                    "g": pa.array(gi, pa.int64()),
                    "v": pa.array(v, pa.float64()),
                    "c": pa.array(np.ones(len(v), np.int64)),
                }
            )
            .group_by(["g", "v"])
            .aggregate([("c", "sum")])
        )
        from pie_ray.util import rename_grouped

        return rename_grouped(gb, ["g", "v"], ["g", "v", "c"])

    acc: dict[tuple[int, float], int] = {}
    for r in ds.map_batches(dcounts, batch_format="pyarrow").take_all():
        kk = (r["g"], r["v"])
        acc[kk] = acc.get(kk, 0) + r["c"]
    out_vals = []
    for i, g in enumerate(groups):
        pairs = sorted((v, c) for (gi, v), c in acc.items() if gi == i)
        cs = np.cumsum([c for _, c in pairs])
        out_vals.append(
            pairs[min(int(np.searchsorted(cs, state[g]["k"])), len(pairs) - 1)][0]
        )
    return pa.table(
        {key: pa.array(groups, ktype), "value": pa.array(out_vals, pa.float64())}
    )


def q_exact_median_grouped(sf_dir: str):
    """Driver entry: exact per-returnflag median of l_extendedprice — the
    grouped refinement (all groups narrowed in the same passes)."""
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    t = exact_quantile_disc_grouped(ds, "l_extendedprice", 0.5, "l_returnflag")
    return t.rename_columns(["l_returnflag", "median_price"])


# ---------------------------------------------------------------------------
# B3+: grouped least-squares regression / covariance (exact integer moments)
# ---------------------------------------------------------------------------


def grouped_regression(ds, key: str, x_col: str, y_col: str):
    """Per-group simple linear regression y = slope*x + intercept plus
    sample covariance and r² — from EXACT integer moments.

    ``x_col`` and ``y_col`` must already be int64 columns (the caller maps
    money to cents / rounds first). Each batch ships one tiny partial row
    per group (n, Σx, Σy, Σx², Σy², Σxy — exact int64 sums); the driver
    combines them in arbitrary-precision Python ints, so n·Σxy etc. never
    overflow at any corpus size, then evaluates each statistic as ONE float
    expression over the exact moments:

        slope     = float(nΣxy − ΣxΣy) / float(nΣx² − (Σx)²)
        intercept = (float(Σy) − slope·float(Σx)) / n
        covar_s   = float(nΣxy − ΣxΣy) / float(n) / float(n−1)
        r2        = float(num)² / (float(dx)·float(dy))

    The oracle SQL computes the SAME expressions over SUM(BIGINT) moments
    (HUGEINT-exact in DuckDB), so every double is bit-identical — the same
    closed-form trick as q_global_agg's corr. Driver state is O(groups);
    no shuffle (lowcard keys only)."""
    from pie_ray.util import rename_grouped

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "sy": pa.array([], pa.int64()),
                    "sx2": pa.array([], pa.int64()),
                    "sy2": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                }
            )
        x = t.column(x_col)
        y = t.column(y_col)
        d = pa.table(
            {
                key: t.column(key),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "sx": x,
                "sy": y,
                "sx2": pc.multiply(x, x),
                "sy2": pc.multiply(y, y),
                "sxy": pc.multiply(x, y),
            }
        )
        gb = d.group_by([key]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sx2", "sy2", "sxy")]
        )
        return rename_grouped(
            gb, [key], [key, "n", "sx", "sy", "sx2", "sy2", "sxy"]
        )

    acc: dict[str, list[int]] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        m = acc.setdefault(r[key], [0, 0, 0, 0, 0, 0])
        for i, c in enumerate(("n", "sx", "sy", "sx2", "sy2", "sxy")):
            m[i] += int(r[c])  # python ints: no overflow at any scale

    keys, ns, slopes, intercepts, covars, r2s = [], [], [], [], [], []
    for k in sorted(acc):
        n, sx, sy, sx2, sy2, sxy = acc[k]
        num = n * sxy - sx * sy
        dx = n * sx2 - sx * sx
        dy = n * sy2 - sy * sy
        slope = float(num) / float(dx) if dx else 0.0
        keys.append(k)
        ns.append(n)
        slopes.append(slope)
        intercepts.append((float(sy) - slope * float(sx)) / n if n else 0.0)
        covars.append(float(num) / float(n) / float(n - 1) if n > 1 else 0.0)
        r2s.append(
            (float(num) * float(num)) / (float(dx) * float(dy))
            if dx and dy
            else 0.0
        )
    return pa.table(
        {
            key: pa.array(keys, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "slope": pa.array(slopes, pa.float64()),
            "intercept": pa.array(intercepts, pa.float64()),
            "covar_samp": pa.array(covars, pa.float64()),
            "r2": pa.array(r2s, pa.float64()),
        }
    )


def q_regr_by_flag(sf_dir: str):
    """Driver entry: per-returnflag regression of price-in-cents on
    quantity (slope = cents of extended price per unit of quantity)."""
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "x": pc.cast(t.column("l_quantity"), pa.int64()),
                "y": cents(t.column("l_extendedprice")),
            }
        )

    return grouped_regression(
        ds.map_batches(derive, batch_format="pyarrow"), "l_returnflag", "x", "y"
    )


# ---------------------------------------------------------------------------
# B10+: gaps-and-islands — per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------


def activity_streaks(ds, user_col: str = "user_id", ts_col: str = "ts",
                     num_buckets: int = 32):
    """Per-user consecutive-day activity streaks (gaps-and-islands): an
    island is a maximal run of consecutive epoch-days on which the user
    had >=1 event. Returns (user_id, n_active_days, n_streaks,
    longest_streak).

    Map-side: rows collapse to distinct (user, day) pairs per batch before
    the shuffle, so at most one row per user-day ships. ONE user-bucketed
    exchange; per bucket a fully vectorized sorted pass (a user's rows
    co-locate, so per-bucket islands ARE global islands). Driver never
    sees row-proportional data."""
    from pie_ray.util import hash64_ints

    DAY_US = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        day = (
            pc.cast(t.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        pairs = np.unique(np.stack([u, day], axis=1), axis=0)
        b = (hash64_ints(pairs[:, 0], salt=23) % num_buckets).astype("int32")
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_active_days": pa.array([], pa.int64()),
                "n_streaks": pa.array([], pa.int64()),
                "longest_streak": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        pairs = np.unique(
            np.stack(
                [
                    g.column("user_id").to_numpy(zero_copy_only=False),
                    g.column("day").to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        u, day = pairs[:, 0], pairs[:, 1]
        n = len(u)
        new_user = np.ones(n, bool)
        new_user[1:] = u[1:] != u[:-1]
        # a new streak starts on a new user OR a >1-day gap
        new_streak = new_user.copy()
        new_streak[1:] |= day[1:] != day[:-1] + 1
        s_starts = np.flatnonzero(new_streak)
        s_len = np.diff(np.append(s_starts, n))
        # per-user combine over the streak table (users' streaks contiguous)
        u_starts = np.flatnonzero(new_user)
        su = u[s_starts]  # user of each streak, sorted
        su_new = np.ones(len(su), bool)
        su_new[1:] = su[1:] != su[:-1]
        su_starts = np.flatnonzero(su_new)
        n_streaks = np.diff(np.append(su_starts, len(su)))
        longest = np.maximum.reduceat(s_len, su_starts)
        active = np.add.reduceat(s_len, su_starts)
        return pa.table(
            {
                "user_id": pa.array(u[u_starts], pa.int64()),
                "n_active_days": pa.array(active.astype(np.int64), pa.int64()),
                "n_streaks": pa.array(n_streaks.astype(np.int64), pa.int64()),
                "longest_streak": pa.array(longest.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def q_streaks_events(sf_dir: str):
    """Driver entry: activity streaks over the events table."""
    from pie_ray.util import bucket_count

    ds = scan(sf_dir, "events", columns=["user_id", "ts"])
    return activity_streaks(
        ds, num_buckets=bucket_count(ds.size_bytes(), floor=32)
    )

# ---------------------------------------------------------------------------
# B10+: frame value window functions — first_value / last_value / nth_value
# ---------------------------------------------------------------------------


def frame_value_windows(ds, key_col: str, order_cols: list[str], value_col: str,
                        num_buckets: int = 32, sentinel: float = -1.0):
    """Per-key full-frame value windows: first_value, last_value and
    nth_value(2) of ``value_col`` over the whole partition ordered by
    ``order_cols`` (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING). All
    three outputs are pure value COPIES — floats match the SQL oracle
    bit-for-bit; ``second_val`` uses ``sentinel`` for 1-row partitions
    (COALESCE'd identically in the oracle).

    Same shape as the other window entries: ONE key-bucketed exchange (a
    key's rows co-locate, so per-bucket frames ARE global frames), then a
    fully vectorized sorted pass per bucket — no Python row loops, state
    bounded by bucket size."""
    from pie_ray.util import hash64_ints

    out_cols = order_cols + [key_col]

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            hash64_ints(t.column(key_col).to_numpy(zero_copy_only=False), salt=31)
            % num_buckets
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending")] + [(c, "ascending") for c in order_cols]
        )
        g = g.take(order)
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        vals = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(keys)
        if n == 0:
            return pa.table(
                {c: g.column(c) for c in out_cols}
                | {
                    "first_val": pa.array([], pa.float64()),
                    "last_val": pa.array([], pa.float64()),
                    "second_val": pa.array([], pa.float64()),
                }
            )
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        base = np.zeros(n, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)  # per-row partition start
        run_id = np.cumsum(new) - 1
        run_ends = np.append(starts[1:], n) - 1  # per-run last index
        ends = run_ends[run_id]  # per-row partition end
        first = vals[base]
        last = vals[ends]
        second = np.full(n, sentinel, np.float64)
        has2 = ends - base >= 1
        second[has2] = vals[base[has2] + 1]
        return pa.table(
            {c: g.column(c) for c in out_cols}
            | {
                "first_val": pa.array(first, pa.float64()),
                "last_val": pa.array(last, pa.float64()),
                "second_val": pa.array(second, pa.float64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def q_window_first_last(sf_dir: str):
    """Driver entry: first/last/2nd value of ``value`` per user over the
    full (ts, event_id)-ordered partition."""
    from pie_ray.util import bucket_count

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = frame_value_windows(
        ds,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="value",
        num_buckets=bucket_count(ds.size_bytes(), floor=32),
    )
    return out.map_batches(
        lambda t: t.drop_columns(["ts"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# B10+: null imputation — constant fill / LOCF forward-fill / group-mean fill
# ---------------------------------------------------------------------------


def impute_nulls(ds, key_col: str, order_cols: list[str], value_col: str,
                 num_buckets: int = 32, const: float = 0.0,
                 sentinel: float = -1.0):
    """Three imputation channels for a nullable float column in one pass:
    ``v_const`` (COALESCE with ``const``), ``v_locf`` (last-observation-
    carried-forward per key in ``order_cols`` order — ``sentinel`` when a
    key has no prior observation) and ``v_mean`` (per-key mean of the
    observed values — ``sentinel`` for all-null keys). Non-null rows pass
    through bit-exactly on every channel (copies).

    The mean is computed as ONE float expression over exact int64 cents
    (``(float(sum_cents) / count) / 100``) so it hash-matches the SQL
    oracle's ``CAST(SUM(BIGINT) AS DOUBLE) / cnt / 100`` bit-for-bit —
    the 2-decimal fixed-point contract the money columns already use.

    ONE key-bucketed exchange (a key's rows co-locate, so per-bucket LOCF
    runs and per-key moments ARE global); per bucket a vectorized sorted
    pass — LOCF is a maximum.accumulate over observed row indices, with
    carries from a previous key rejected by comparing against the
    partition start (keys are contiguous after the sort)."""
    from pie_ray.util import hash64_ints

    out_cols = order_cols + [key_col]

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            hash64_ints(t.column(key_col).to_numpy(zero_copy_only=False), salt=37)
            % num_buckets
        ).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        order = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending")] + [(c, "ascending") for c in order_cols]
        )
        g = g.take(order)
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        vcol = g.column(value_col)
        valid = ~np.asarray(pc.is_null(vcol).combine_chunks().to_numpy(
            zero_copy_only=False))
        vals = np.asarray(vcol.to_numpy(zero_copy_only=False), np.float64)
        n = len(keys)
        if n == 0:
            return pa.table(
                {c: g.column(c) for c in out_cols}
                | {
                    "v_const": pa.array([], pa.float64()),
                    "v_locf": pa.array([], pa.float64()),
                    "v_mean": pa.array([], pa.float64()),
                }
            )
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        base = np.zeros(n, np.int64)
        base[starts] = starts
        np.maximum.accumulate(base, out=base)  # per-row partition start
        # constant fill
        v_const = np.where(valid, vals, const)
        # LOCF: index of the latest observed row at-or-before each row;
        # an index carried across a key boundary is < the partition start
        # and rejected (keys are contiguous)
        idx = np.arange(n, dtype=np.int64)
        carry = np.where(valid, idx, -1)
        np.maximum.accumulate(carry, out=carry)
        in_key = carry >= base
        v_locf = np.full(n, sentinel, np.float64)
        v_locf[in_key] = vals[carry[in_key]]
        # group mean over observed values from exact integer cents
        c = np.zeros(n, np.int64)
        # half-away-from-zero like the DuckDB oracle's round() and the
        # repo's pc.round cents path — np.rint is half-to-even and would
        # hash-mismatch on values landing exactly on .5 cents (money here
        # is non-negative, so floor(v*100 + 0.5) is exactly that rule)
        c[valid] = np.floor(vals[valid] * 100.0 + 0.5).astype(np.int64)
        run_id = np.cumsum(new) - 1
        sum_c = np.add.reduceat(c, starts)
        cnt = np.add.reduceat(valid.astype(np.int64), starts)
        mean = np.full(len(starts), sentinel, np.float64)
        obs = cnt > 0
        mean[obs] = (sum_c[obs].astype(np.float64) / cnt[obs]) / 100.0
        v_mean = np.where(valid, vals, mean[run_id])
        return pa.table(
            {c2: g.column(c2) for c2 in out_cols}
            | {
                "v_const": pa.array(v_const, pa.float64()),
                "v_locf": pa.array(v_locf, pa.float64()),
                "v_mean": pa.array(v_mean, pa.float64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def q_impute_nulls(sf_dir: str):
    """Driver entry: impute a deterministically-nulled copy of
    ``events.value`` (NULL when event_id % 7 == 0 — the parquet tables
    carry no nulls, so the entry plants them identically on both sides)."""
    from pie_ray.util import bucket_count

    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def plant(t: pa.Table) -> pa.Table:
        keep = pa.array(
            t.column("event_id").to_numpy(zero_copy_only=False) % 7 != 0
        )
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pc.if_else(keep, t.column("value"), pa.scalar(None, pa.float64())),
        )

    out = impute_nulls(
        ds.map_batches(plant, batch_format="pyarrow"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="value",
        num_buckets=bucket_count(ds.size_bytes(), floor=32),
    )
    return out.map_batches(
        lambda t: t.drop_columns(["ts"]), batch_format="pyarrow"
    )
