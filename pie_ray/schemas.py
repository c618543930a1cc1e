"""Declared Arrow schemas for every logical table (SURVEY.md §1.1, T0–T6).

Schemas are fixed and declared (not inferred) so that
``map_batches(batch_format="pyarrow", zero_copy_batch=True)`` stages stay
zero-copy end to end and every stage boundary (Parquet checkpoint) has a
stable, diffable schema.
"""

from __future__ import annotations

import pyarrow as pa

# T0 — input web pages (authoritative shape from BASELINE.json input_hint).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# T1 — extracted text (frozen stripper output; byte-identical per url).
EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("text_sha256", pa.string()),
    ]
)

# T2 — PII mentions (one row per detected mention).
MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("mention_id", pa.string()),
        ("ent_type", pa.string()),  # PER | EMAIL | PHONE | ADDR | ID
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("begin", pa.int32()),  # char offsets into EXTRACTED.text
        ("end", pa.int32()),
        ("sent_id", pa.int32()),
        ("score", pa.float32()),
    ]
)

# T3 — privacy triples (set-valued comparison surface: P/R >= 0.95).
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("score", pa.float32()),
    ]
)

PREDICATES = (
    "has_email",
    "has_phone",
    "has_address",
    "has_id",
    "co_mentioned_with",
    "appears_on",
)

# T4 — canonicalization map (union-find output).
CANON_MAP = pa.schema(
    [
        ("entity_key", pa.string()),
        ("canon_id", pa.string()),
    ]
)

# Aggregated edges (pre-adjacency).
EDGES = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("pred", pa.string()),
        ("weight", pa.int64()),
        ("first_ts", pa.timestamp("us")),
        ("last_ts", pa.timestamp("us")),
    ]
)

# T5 — adjacency-list graph partitions (sink).
ADJ_ENTRY = pa.struct(
    [
        ("dst", pa.string()),
        ("pred", pa.string()),
        ("weight", pa.int64()),
        ("first_ts", pa.timestamp("us")),
        ("last_ts", pa.timestamp("us")),
    ]
)
GRAPH = pa.schema(
    [
        ("src", pa.string()),
        ("adj", pa.list_(ADJ_ENTRY)),
        ("degree", pa.int64()),
        ("part", pa.int32()),  # hash(src) % P — parquet partition column
    ]
)

# T6 — per-partition lineage manifest rows (also JSON sidecars).
MANIFEST = pa.schema(
    [
        ("stage", pa.string()),
        ("part", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_s", pa.float64()),
        ("status", pa.string()),
    ]
)
