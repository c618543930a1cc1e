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


PARTS_META = "_PARTS_META.json"
PARTITION_RULE = "blake2b64(url, salt=b'part') % num_parts"


def write_pages_partitioned(pages_ds, path: str, num_parts: int) -> None:
    """Write a T0 corpus as hive ``part=k/`` dirs + a sidecar recording the
    partition rule, so ``read_pages_parts`` can safely prune directories."""
    import json
    import os

    from pie_ray.util import hash64_array

    def assign(t):
        pr = (hash64_array(t.column("url").to_pylist(), salt=b"part") % num_parts).astype(
            "int32"
        )
        import pyarrow as pa

        return t.append_column("part", pa.array(pr, pa.int32()))

    pages_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["part"]
    )
    with open(os.path.join(path, PARTS_META), "w") as f:
        json.dump({"num_parts": num_parts, "partition_rule": PARTITION_RULE}, f)


def _hive_sidecar_valid(path: str, num_parts: int) -> bool:
    """Directory pruning is only trusted when a sidecar proves the layout
    was written under the SAME num_parts/rule — a hive corpus written under
    a different num_parts would silently yield wrong partition contents
    (rows of part k under P' live in other directories)."""
    import json
    import os

    meta_path = os.path.join(path, PARTS_META)
    if not os.path.isfile(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    return meta.get("num_parts") == num_parts and meta.get("partition_rule") == PARTITION_RULE


def read_pages_parts(
    path: str,
    parts,
    num_parts: int,
    langs: tuple[str, ...] | None = None,
    columns: list[str] | None = None,
):
    """Partition-pruned T0 scan for resumable runs.

    If the corpus is laid out as hive ``part=k/`` directories AND its
    ``_PARTS_META.json`` sidecar matches (written by
    ``write_pages_partitioned``), only the requested partitions'
    DIRECTORIES are read — pruned partitions never leave storage. Without a
    matching sidecar the part predicate (hash(url) % num_parts) cannot be
    trusted to the layout; it is applied as a vectorized post-scan filter
    inside the read tasks (distributed and always correct, but the pruned
    rows are still read — persist the sidecar at write time to get true
    input pruning)."""
    import os

    filt = pc.field("lang").isin(list(langs)) if langs else None
    plist = [int(p) for p in parts]
    if os.path.isdir(path) and _hive_sidecar_valid(path, num_parts):
        part_dirs = [
            os.path.join(path, f"part={k}")
            for k in plist
            if os.path.isdir(os.path.join(path, f"part={k}"))
        ]
        has_hive = any(
            name.startswith("part=") for name in os.listdir(path)
        )
        if has_hive:
            # a list of paths must be FILES for the parquet reader
            part_files = [
                os.path.join(d, f)
                for d in part_dirs
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
            if not part_files:  # none of the requested partitions exist
                # data columns only — the hive 'part' partition field must
                # NOT leak into the schema (resume re-derives part from url
                # and a duplicate column breaks t.column("part") downstream)
                schema = pa_ds.dataset(path, partitioning="hive").schema
                cols = columns or [c for c in T0_COLUMNS if c in schema.names]
                import pyarrow as pa

                return ray.data.from_arrow(
                    pa.schema([schema.field(c) for c in cols]).empty_table()
                )
            return ray.data.read_parquet(
                part_files,
                columns=columns or T0_COLUMNS,
                **({"filter": filt} if filt is not None else {}),
            )

    ds = ray.data.read_parquet(
        path, columns=columns or T0_COLUMNS, **({"filter": filt} if filt is not None else {})
    )

    def part_filter(t):
        from pie_ray.util import hash64_array

        pr = hash64_array(t.column("url").to_pylist(), salt=b"part") % num_parts
        import numpy as np
        import pyarrow as pa

        keep = np.isin(pr, np.asarray(plist, dtype=np.uint64))
        return t.filter(pa.array(keep))

    return ds.map_batches(part_filter, batch_format="pyarrow")
