"""One-pass table profiling — the data-engine staple report: per column,
row/null counts, typed min/max, mean (numeric), and an approximate distinct
count (mergeable HLL registers).

Scale shape: ONE streaming pass; each batch ships one row per column
holding six scalars plus its sparse HLL (idx, rho) pairs — driver state is
O(columns x 2^p), never the data. No shuffle anywhere. At 10^12 rows this
is the difference between "profile the corpus" being a map pass and being
a per-column distinct shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.functions.relational import _hash_col, _hll_estimate, _hll_partial

PROFILE_HLL_P = 14  # ~0.8% standard error


def _kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "temporal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    return "other"


def _render(kind: str, v) -> str | None:
    if v is None:
        return None
    if kind == "int":
        return str(int(v))
    if kind == "float":
        return repr(float(v))
    if kind == "temporal":
        return str(np.datetime64(int(v), "us"))
    return str(v)


def profile_table(ds, columns: list[str] | None = None, p: int = PROFILE_HLL_P) -> pa.Table:
    """-> report table (column, dtype, n_rows, null_count,
    n_distinct_approx, min, max, mean). min/max are exact (typed combine,
    stringified only for display); mean is exact-sum/count for numeric and
    temporal-as-epoch-us columns; distinct is HLL-approximate."""
    schema = ds.schema()
    names = list(columns or schema.names)
    types = {n: schema.types[schema.names.index(n)] for n in names}
    kinds = {n: _kind(types[n]) for n in names}

    def partial(t: pa.Table) -> pa.Table:
        cols, ns, nulls, sums, mins, maxs, idxs, rhos, strmin, strmax = (
            [], [], [], [], [], [], [], [], [], []
        )
        for c in names:
            col = t.column(c).combine_chunks()
            valid = col.drop_null()
            cols.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            k = kinds[c]
            smin = smax = None
            vmin = vmax = vsum = None
            if len(valid):
                if k in ("int", "float", "temporal"):
                    if k == "temporal":
                        # normalize dates AND timestamps to epoch-us so the
                        # report's µs rendering is correct for date32/64
                        # (a raw int64 cast of date32 yields DAYS)
                        num = pc.cast(
                            pc.cast(valid, pa.timestamp("us")), pa.int64()
                        )
                    else:
                        num = valid
                    mm = pc.min_max(num)
                    vmin = float(mm["min"].as_py())
                    vmax = float(mm["max"].as_py())
                    vsum = float(pc.sum(pc.cast(num, pa.float64())).as_py())
                elif k == "string":
                    mm = pc.min_max(valid)
                    smin, smax = mm["min"].as_py(), mm["max"].as_py()
                # shrink the per-row (idx, rho) pairs to this batch's sparse
                # register maxima before they ship — at most 2^p per column
                idx_r, rho_r = _hll_partial(_hash_col(valid), p)
                reg = np.zeros(1 << p, np.int64)
                np.maximum.at(reg, idx_r, rho_r)
                idx = np.flatnonzero(reg)
                rho = reg[idx]
            else:
                idx = np.empty(0, np.int64)
                rho = np.empty(0, np.int64)
            sums.append(vsum)
            mins.append(vmin)
            maxs.append(vmax)
            strmin.append(smin)
            strmax.append(smax)
            idxs.append(idx.tolist())
            rhos.append(rho.tolist())
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "sum": pa.array(sums, pa.float64()),
                "min_num": pa.array(mins, pa.float64()),
                "max_num": pa.array(maxs, pa.float64()),
                "min_str": pa.array(strmin, pa.string()),
                "max_str": pa.array(strmax, pa.string()),
                "hll_idx": pa.array(idxs, pa.list_(pa.int64())),
                "hll_rho": pa.array(rhos, pa.list_(pa.int64())),
            }
        )

    acc = {
        c: {
            "n": 0,
            "nulls": 0,
            "sum": 0.0,
            "has_sum": False,
            "min": None,
            "max": None,
            "reg": np.zeros(1 << p, np.int64),
        }
        for c in names
    }
    for bt in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in bt.to_pylist():
            a = acc[r["column"]]
            a["n"] += r["n"]
            a["nulls"] += r["nulls"]
            if r["sum"] is not None:
                a["sum"] += r["sum"]
                a["has_sum"] = True
            k = kinds[r["column"]]
            lo = r["min_str"] if k == "string" else r["min_num"]
            hi = r["max_str"] if k == "string" else r["max_num"]
            if lo is not None:
                a["min"] = lo if a["min"] is None else min(a["min"], lo)
            if hi is not None:
                a["max"] = hi if a["max"] is None else max(a["max"], hi)
            if r["hll_idx"]:
                np.maximum.at(
                    a["reg"],
                    np.asarray(r["hll_idx"], np.int64),
                    np.asarray(r["hll_rho"], np.int64),
                )

    out = {
        "column": [],
        "dtype": [],
        "n_rows": [],
        "null_count": [],
        "n_distinct_approx": [],
        "min": [],
        "max": [],
        "mean": [],
    }
    for c in names:
        a = acc[c]
        k = kinds[c]
        n_valid = a["n"] - a["nulls"]
        out["column"].append(c)
        out["dtype"].append(str(types[c]))
        out["n_rows"].append(a["n"])
        out["null_count"].append(a["nulls"])
        out["n_distinct_approx"].append(
            int(round(_hll_estimate(a["reg"]))) if n_valid else 0
        )
        out["min"].append(_render(k, a["min"]))
        out["max"].append(_render(k, a["max"]))
        out["mean"].append(a["sum"] / n_valid if a["has_sum"] and n_valid else None)
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "dtype": pa.array(out["dtype"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "null_count": pa.array(out["null_count"], pa.int64()),
            "n_distinct_approx": pa.array(out["n_distinct_approx"], pa.int64()),
            "min": pa.array(out["min"], pa.string()),
            "max": pa.array(out["max"], pa.string()),
            "mean": pa.array(out["mean"], pa.float64()),
        }
    )
