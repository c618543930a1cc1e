"""Row validation + quarantine — the data-quality gate every production
ingest runs before expensive stages: declarative per-column rules, one
vectorized tagging pass, and a split into clean rows vs quarantined rows
that carry WHY they failed (the reprocess-after-fix loop needs the reason,
not just the reject).

Scale shape: rules evaluate as Arrow kernels per batch (no Python row
loop); the tag pass adds a ``violations`` list<string> column and both
splits are plain filters over it — fuse-friendly stateless maps, no
shuffle, no driver state. Quarantine output is written next to the good
rows, never dropped silently (the no-silent-caps rule).
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VIOLATIONS_COL = "violations"


def not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col, "label": f"{col}:null"}


def in_range(col: str, lo=None, hi=None) -> dict:
    return {
        "kind": "in_range",
        "col": col,
        "lo": lo,
        "hi": hi,
        "label": f"{col}:range",
    }


def matches(col: str, pattern: str) -> dict:
    _re.compile(pattern)  # fail fast on bad patterns (RE2-able subset only)
    return {"kind": "matches", "col": col, "pattern": pattern, "label": f"{col}:regex"}


def in_set(col: str, values: list) -> dict:
    return {"kind": "in_set", "col": col, "values": list(values), "label": f"{col}:set"}


def _rule_fail_mask(t: pa.Table, rule: dict) -> np.ndarray:
    """True where the rule FAILS. Nulls fail only not_null — a null value
    is one defect, not one defect per rule (standard quarantine semantics)."""
    col = t.column(rule["col"]).combine_chunks()
    null = pc.is_null(col).to_numpy(zero_copy_only=False)
    kind = rule["kind"]
    if kind == "not_null":
        return null
    if kind == "in_range":
        ok = pa.array(np.ones(len(col), bool))
        if rule["lo"] is not None:
            ok = pc.and_kleene(ok, pc.greater_equal(col, rule["lo"]))
        if rule["hi"] is not None:
            ok = pc.and_kleene(ok, pc.less_equal(col, rule["hi"]))
        bad = pc.invert(pc.fill_null(ok, True)).to_numpy(zero_copy_only=False)
        return bad & ~null
    if kind == "matches":
        ok = pc.match_substring_regex(col, rule["pattern"])
        bad = pc.invert(pc.fill_null(ok, True)).to_numpy(zero_copy_only=False)
        return bad & ~null
    if kind == "in_set":
        ok = pc.is_in(col, value_set=pa.array(rule["values"], col.type))
        bad = pc.invert(pc.fill_null(ok, True)).to_numpy(zero_copy_only=False)
        return bad & ~null
    raise ValueError(f"unknown rule kind {kind!r}")


def tag_batch(t: pa.Table, rules: list[dict]) -> pa.Table:
    """Append the ``violations`` list<string> column (empty list = clean
    row) to one Arrow batch. Vectorized list assembly: per-row offsets +
    labels laid out in rule order (row-major fill over the rule masks)."""
    n = t.num_rows
    fails = [(_rule_fail_mask(t, r), r["label"]) for r in rules]
    counts = np.zeros(n, np.int64)
    for mask, _ in fails:
        counts += mask
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    labels = np.empty(int(offsets[-1]), object)
    cursor = offsets[:-1].copy()
    for mask, label in fails:
        idx = np.flatnonzero(mask)
        labels[cursor[idx]] = label
        cursor[idx] += 1
    viol = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(labels.tolist(), pa.string())
    )
    return t.append_column(VIOLATIONS_COL, viol)


def tag_violations(ds, rules: list[dict]):
    """Add a ``violations`` list<string> column (empty list = clean row)."""
    return ds.map_batches(
        lambda t: tag_batch(t, rules), batch_format="pyarrow"
    )


def split_valid(tagged_ds):
    """(clean rows without the tag column, quarantined rows with reasons).
    Two filters over the tagged stream — materialize the tag pass first if
    both sides will be consumed (otherwise the rules re-evaluate per side)."""

    def clean(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.list_value_length(t.column(VIOLATIONS_COL)), 0)
        return t.filter(keep).drop_columns([VIOLATIONS_COL])

    def quarantine(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(pc.list_value_length(t.column(VIOLATIONS_COL)), 0)
        )

    return (
        tagged_ds.map_batches(clean, batch_format="pyarrow"),
        tagged_ds.map_batches(quarantine, batch_format="pyarrow"),
    )


def validate(ds, rules: list[dict], materialize: bool = True):
    """One-call gate: tag -> (clean, quarantined). ``materialize=True``
    evaluates the rules once for both consumers (the default; pass False
    to keep the whole thing lazy inside a larger single-consumer plan)."""
    tagged = tag_violations(ds, rules)
    if materialize:
        tagged = tagged.materialize()
    return split_valid(tagged)


# ---------------------------------------------------------------------------
# driver/query surface — quarantine report over the lineitem table
# ---------------------------------------------------------------------------

# Fixed demo ruleset over lineitem: plausible ingest bounds that each
# quarantine a real slice of TPC-H-ish data (quantity caps at 50, discount
# at 0.10, returnflag has three values) so the report is non-empty at every
# scale factor. Order matters: labels join in rule order.
LINEITEM_RULES = [
    {"kind": "not_null", "col": "l_quantity", "label": "l_quantity:null"},
    {"kind": "in_range", "col": "l_quantity", "lo": 1, "hi": 40, "label": "l_quantity:range"},
    {"kind": "in_set", "col": "l_returnflag", "values": ["A", "N"], "label": "l_returnflag:set"},
    {"kind": "in_range", "col": "l_discount", "lo": 0.0, "hi": 0.08, "label": "l_discount:range"},
]


def q_validate(sf_dir: str):
    """Quarantine report: every lineitem row violating LINEITEM_RULES with
    the comma-joined reason labels (rule order). Single consumer, so the
    whole chain stays one fused lazy map — no materialize."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount"],
    )

    def report(t: pa.Table) -> pa.Table:
        t = tag_batch(t, LINEITEM_RULES)
        t = t.filter(pc.greater(pc.list_value_length(t.column(VIOLATIONS_COL)), 0))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "violations": pc.binary_join(t.column(VIOLATIONS_COL), ","),
            }
        )

    return ds.map_batches(report, batch_format="pyarrow")


def validate_oracle_sql(table_sql: str = "lineitem") -> str:
    """DuckDB equivalent of ``q_validate``: concat_ws skips NULL CASE arms,
    reproducing the rule-order label join; NULL comparisons yield no label
    for range/set rules (only not_null fires on NULL), matching
    ``_rule_fail_mask``."""
    return f"""
        SELECT l_orderkey, l_linenumber,
               concat_ws(',',
                 CASE WHEN l_quantity IS NULL THEN 'l_quantity:null' END,
                 CASE WHEN NOT (l_quantity BETWEEN 1 AND 40) THEN 'l_quantity:range' END,
                 CASE WHEN l_returnflag NOT IN ('A', 'N') THEN 'l_returnflag:set' END,
                 CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.08) THEN 'l_discount:range' END
               ) AS violations
        FROM {table_sql}
        WHERE l_quantity IS NULL
           OR NOT (l_quantity BETWEEN 1 AND 40)
           OR l_returnflag NOT IN ('A', 'N')
           OR NOT (l_discount BETWEEN 0.0 AND 0.08)
    """
