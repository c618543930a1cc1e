"""Count-min sketch — mergeable approximate frequency table (Cormode &
Muthukrishnan 2005, public recipe). Complements the exact-second-pass heavy
hitters in textops: CMS answers point frequency queries for ANY value in
one streaming pass with bounded memory, with the classic one-sided
guarantee est >= true and est <= true + e/width * N w.h.p.

Scale shape: ONE map pass; each batch ships its sketch as sparse
(cell, count) pairs — at most depth x distinct-in-batch cells, never rows.
Driver state is the dense depth x width int64 matrix (with the defaults,
128 KiB) — merging is pure addition, so the sketch is partition- and
parallelism-independent BIT-exactly. No shuffle anywhere; at 10^12 rows
this stays a map pass (the same shape as profile_table's HLL merge).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pie_ray.util import hash64_array

CMS_WIDTH = 4096
CMS_DEPTH = 4


def _cell_hashes(values: list[str], depth: int, width: int) -> np.ndarray:
    """(depth, n) int64 cell indices; row d uses an independent salt."""
    out = np.empty((depth, len(values)), np.int64)
    for d in range(depth):
        out[d] = (hash64_array(values, salt=b"cms%d" % d) % width).astype(np.int64)
    return out


def cms_build(
    ds, col: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> tuple[np.ndarray, int]:
    """-> (sketch[depth, width] int64, total_count). Null values are
    skipped (and excluded from total_count), matching COUNT(col) semantics."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).drop_null().to_pylist()
        sk = np.zeros((depth, width), np.int64)
        if vals:
            cells = _cell_hashes([str(v) for v in vals], depth, width)
            for d in range(depth):
                np.add.at(sk[d], cells[d], 1)
        flat = sk.ravel()
        idx = np.flatnonzero(flat)
        return pa.table(
            {
                "n": pa.array([len(vals)], pa.int64()),
                "cell": pa.array([idx.tolist()], pa.list_(pa.int64())),
                "count": pa.array([flat[idx].tolist()], pa.list_(pa.int64())),
            }
        )

    sketch = np.zeros(depth * width, np.int64)
    total = 0
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        total += row["n"]
        cells = np.asarray(row["cell"], np.int64)
        if len(cells):
            sketch[cells] += np.asarray(row["count"], np.int64)
    return sketch.reshape(depth, width), total


def cms_query(sketch: np.ndarray, values: list[str]) -> np.ndarray:
    """Point frequency estimates (int64, one per value): min over rows."""
    depth, width = sketch.shape
    if not values:
        return np.empty(0, np.int64)
    cells = _cell_hashes([str(v) for v in values], depth, width)
    ests = np.stack([sketch[d, cells[d]] for d in range(depth)])
    return ests.min(axis=0)


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sketches over disjoint inputs combine by addition (the property the
    driver combine in cms_build relies on)."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return a + b
