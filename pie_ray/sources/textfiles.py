"""JSONL / CSV text-corpus sources and sinks.

Web-text corpora ship as JSON-lines (C4/OSCAR-style dumps) and CSV at
least as often as Parquet; this is the thin, schema-coerced boundary
between those formats and the engine's ``documents`` shape. Built on
Ray Data's native streaming readers (``read_json`` / ``read_csv`` — one
Arrow block per file chunk, no driver materialization), plus hazard-safe
parse options:

- CSV reads enable ``newlines_in_values`` so quoted multi-line document
  text survives (Arrow's default silently mis-parses it into row soup).
- Column pruning happens right after the scan (JSON/CSV can't push
  projections into the file the way Parquet does — documented seam; the
  format is the bottleneck, not the engine).
- ``coerce`` pins the output schema: JSON/CSV inference can widen or
  narrow types per file chunk (int vs double, null-only columns);
  coercing every block to the declared schema keeps downstream joins'
  key types stable.

The round-trip entry (``q_text_source_roundtrip``) writes the documents
table out as BOTH formats and reads each back through these sources; the
DuckDB oracle computes the same aggregate from the original parquet —
so a value-hash match proves write + read + coercion are lossless.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _coerce_batch(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = {}
    for f in schema:
        if f.name not in t.column_names:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
            continue
        c = t.column(f.name)
        cols[f.name] = c if c.type.equals(f.type) else pc.cast(c, f.type)
    return pa.table(cols)


def read_jsonl_docs(paths, columns=None, schema: pa.Schema = DOC_SCHEMA,
                    **read_kwargs):
    """Streaming JSONL corpus scan coerced to ``schema`` (documents shape
    by default), pruned to ``columns`` right after the scan."""
    import ray.data

    ds = ray.data.read_json(paths, **read_kwargs)
    keep = (
        schema
        if columns is None
        else pa.schema([schema.field(c) for c in columns])
    )
    return ds.map_batches(
        lambda t, _s=keep: _coerce_batch(t, _s), batch_format="pyarrow"
    )


def read_csv_docs(paths, columns=None, schema: pa.Schema = DOC_SCHEMA,
                  **read_kwargs):
    """Streaming CSV corpus scan — quoted multi-line text enabled — then
    the same coercion/pruning as the JSONL source."""
    from pyarrow import csv as pacsv

    import ray.data

    parse = read_kwargs.pop("parse_options", None) or pacsv.ParseOptions(
        newlines_in_values=True
    )
    ds = ray.data.read_csv(paths, parse_options=parse, **read_kwargs)
    keep = (
        schema
        if columns is None
        else pa.schema([schema.field(c) for c in columns])
    )
    return ds.map_batches(
        lambda t, _s=keep: _coerce_batch(t, _s), batch_format="pyarrow"
    )


def write_text_corpus(ds, out_dir: str, fmt: str):
    """Partitioned JSONL/CSV sink (one file per block — the resumable
    layout rule applies to text formats too)."""
    if fmt == "jsonl":
        ds.write_json(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    else:
        raise ValueError(f"unknown text corpus format: {fmt!r}")


def _per_source_agg(ds, fmt: str):
    """(fmt, source, n_docs, sum_chars) — per-batch partials + a driver
    combine (sources are low-cardinality; a Ray groupby would pay
    aggregator spin-up for a handful of rows)."""
    from pie_ray.util import gather_table

    def part(t: pa.Table) -> pa.Table:
        gb = t.group_by(["source"]).aggregate([([], "count_all")])
        # chars summed separately: utf8_length AFTER the round trip, so a
        # lossy write/read (mangled newlines, re-encoded unicode) shows up
        lens = pc.utf8_length(t.column("text").combine_chunks())
        sums = (
            pa.table({"source": t.column("source"), "n": lens})
            .group_by(["source"])
            .aggregate([("n", "sum")])
        )
        key = gb.column("source")
        idx = pc.index_in(key, value_set=sums.column("source").combine_chunks())
        return pa.table(
            {
                "source": key,
                "n_docs": pc.cast(gb.column("count_all"), pa.int64()),
                "sum_chars": pc.cast(pc.take(sums.column("n_sum"), idx), pa.int64()),
            }
        )

    parts = gather_table(
        ds.map_batches(part, batch_format="pyarrow"),
        schema=pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()), ("sum_chars", pa.int64())]
        ),
    )
    comb = parts.group_by(["source"]).aggregate([("n_docs", "sum"), ("sum_chars", "sum")])
    n = comb.num_rows
    return pa.table(
        {
            "fmt": pa.array([fmt] * n, pa.string()),
            "source": comb.column("source"),
            "n_docs": pc.cast(comb.column("n_docs_sum"), pa.int64()),
            "sum_chars": pc.cast(comb.column("sum_chars_sum"), pa.int64()),
        }
    )


def q_text_source_roundtrip(sf_dir: str):
    """Driver entry (SQL-oracled): documents -> JSONL and CSV sinks under
    /tmp -> back through the streaming sources -> per-source aggregates.
    The oracle computes the identical aggregate straight from the parquet
    view, so the hash match proves both text formats round-trip losslessly
    (count + exact character mass per source, both formats)."""
    import hashlib
    import shutil

    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = f"/tmp/pie_ray_textsrc_{key}"
    pieces = []
    sub = pa.schema([DOC_SCHEMA.field(c) for c in ("doc_id", "text", "source")])
    for fmt, reader in (("csv", read_csv_docs), ("jsonl", read_jsonl_docs)):
        out = f"{base}/{fmt}"
        shutil.rmtree(out, ignore_errors=True)
        write_text_corpus(docs, out, fmt)
        back = reader(out, schema=sub)
        pieces.append(_per_source_agg(back, fmt))
    tbl = pa.concat_tables(pieces)
    return tbl.sort_by([("fmt", "ascending"), ("source", "ascending")])


TEXT_ROUNDTRIP_ORACLE_SQL = """
    SELECT 'csv' AS fmt, source, COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source
    UNION ALL
    SELECT 'jsonl', source, COUNT(*), CAST(SUM(LENGTH(text)) AS BIGINT)
    FROM documents GROUP BY source
"""
