"""A1 — read_pages: the production T0 source (Parquet web-page table).

Column pruning and the language predicate are pushed INTO the parquet scan
(`columns=` + `filter=`) so non-matching row groups never leave storage —
at 10^12 rows the lang filter alone prunes ~30% of bytes before the first
map stage. The `html` column is still the dominant payload; it is dropped
by the extract stage immediately after text extraction (SURVEY.md §4).
"""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.dataset as pa_ds

import ray.data

T0_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    path: str,
    langs: tuple[str, ...] | None = None,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """Parquet scan of a T0 pages table with read-time pushdown."""
    kwargs = {}
    if langs:
        kwargs["filter"] = pc.field("lang").isin(list(langs))
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns or T0_COLUMNS, **kwargs)
