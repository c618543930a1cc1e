"""PII detection and redaction — a standard curation step between raw web
text and a training corpus (emails, phone numbers, IP addresses, SSNs,
card numbers replaced by typed placeholder tokens).

Map-only: every pattern is an RE2 regex applied with
``pyarrow.compute.replace_substring_regex`` inside one ``map_batches`` —
no shuffle at any corpus scale, and byte-identical to DuckDB's
``regexp_replace(.., 'g')`` (both engines run RE2 with the same
leftmost-longest-free, leftmost-earliest semantics), which is how the
conformance test checks it (tests/conformance/test_pii_lines.py).

Patterns are deliberately conservative (no lookaround — RE2 has none) and
applied in a FIXED order, counting matches on the text each pattern
actually sees (SSN before phone before IP so the narrower shapes win).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (name, RE2 pattern, replacement) — ORDER IS THE CONTRACT: each pattern is
# counted and replaced on the output of the previous one, and the SQL
# oracle nests regexp_replace in the same order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact one Arrow batch. Output: the input columns with ``text``
    replaced by its redacted form, plus ``n_<name>`` int64 match counts per
    pattern and ``n_pii`` (their sum)."""
    txt = pc.fill_null(t.column(text_col), "")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        c = pc.count_substring_regex(txt, pat)
        counts.append(pc.cast(c, pa.int64()))
        txt = pc.replace_substring_regex(txt, pat, repl)
    out = t.set_column(t.schema.get_field_index(text_col), text_col, txt)
    total = counts[0]
    for c in counts[1:]:
        total = pc.add(total, c)
    for (name, _, _), c in zip(PII_PATTERNS, counts):
        out = out.append_column(f"n_{name}", c)
    return out.append_column("n_pii", total)


def pii_redact(docs_ds, text_col: str = "text"):
    """Dataset-level redaction: one stateless vectorized task map."""
    return docs_ds.map_batches(
        redact_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )


def pii_oracle_sql(table_sql: str = "documents") -> str:
    """The DuckDB-equivalent SELECT for ``pii_redact`` over (doc_id, text).
    Each pattern's count is ``len(regexp_extract_all(<chain so far>, pat))``
    — i.e. counted on the text AFTER the previous patterns' replacements,
    exactly mirroring redact_batch — and the redacted text is the full
    nested regexp_replace chain in PII_PATTERNS order."""
    txt = "text"
    count_exprs = []
    for name, pat, repl in PII_PATTERNS:
        # DuckDB plain string literals pass backslashes through unescaped
        p = pat.replace("'", "''")
        count_exprs.append(
            f"len(regexp_extract_all({txt}, '{p}'))::BIGINT AS n_{name}"
        )
        txt = f"regexp_replace({txt}, '{p}', '{repl}', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        f"SELECT doc_id, {txt} AS text, "
        + ", ".join(count_exprs)
        + f", ({total})::BIGINT AS n_pii FROM {table_sql}"
    )


def q_pii_redact(sf_dir: str):
    """Library/query surface over the documents table (the synthetic table
    plants no PII, so on driver data this is an identity map with zero
    counts — the conformance test runs it over a planted corpus)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pii_redact(ds)
