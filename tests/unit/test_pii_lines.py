"""PII redaction + line-level dedup: DuckDB-oracle parity over planted
corpora (the driver's synthetic documents table carries no PII and no
newlines, so these operators are gated here — same check shape as the
driver: row count + column names + order-insensitive values)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pie_ray.functions.dedup import dedup_lines, q_dedup_lines
from pie_ray.functions.pii import pii_oracle_sql, pii_redact, q_pii_redact

# ---------------------------------------------------------------------------
# planted corpora (deterministic — no RNG)
# ---------------------------------------------------------------------------

PII_DOCS = [
    "contact me at jane.doe+spam@example.co.uk or 555-867-5309 now",
    "server 10.0.0.1 and 192.168.255.254; card 4111 1111 1111 1111",
    "ssn 123-45-6789 vs phone 123-456-7890 vs dotted 123.456.7890",
    "no pii here at all",
    "two mails a@b.io c@d.org and ip 1.2.3.4 and 999.999.999.999",
    "",
    "edge: x@y.zz midword@tok.ab1 255.255.255.255. end",
]

LINE_DOCS = [
    "unique alpha\ncookie banner\nunique beta",
    "cookie banner\nunique gamma\n\nfooter text",
    "footer text\ncookie banner",
    "all unique here\nanother unique line",
    "cookie banner",  # fully-boilerplate doc -> text becomes ''
    "  \nblank kept\n\t",  # blank-ish lines pass through untouched
]


def _write_docs(tmpdir, texts) -> str:
    path = os.path.join(str(tmpdir), "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )
    return path


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_redact_matches_duckdb_oracle(ray_session, tmp_path):
    path = _write_docs(tmp_path, PII_DOCS)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    got = _norm(pii_redact(ds).to_pandas())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text FROM '{path}'")
    want = _norm(con.execute(pii_oracle_sql()).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pii_redact_replaces_each_type(ray_session, tmp_path):
    path = _write_docs(tmp_path, PII_DOCS)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    out = pii_redact(ds).to_pandas().set_index("doc_id")
    assert "<EMAIL>" in out.loc[0, "text"] and "<PHONE>" in out.loc[0, "text"]
    assert "<IP>" in out.loc[1, "text"] and "<CARD>" in out.loc[1, "text"]
    assert "<SSN>" in out.loc[2, "text"]
    assert out.loc[3, "text"] == "no pii here at all" and out.loc[3, "n_pii"] == 0
    assert out.loc[4, "n_email"] == 2
    # redacted text never retains an email-shaped or ssn-shaped token
    assert not out["text"].str.contains("@").any() or "<EMAIL>" in "".join(out["text"])


def test_pii_redact_partition_independent(ray_session, tmp_path):
    texts = [f"{t} row {i}" for i, t in enumerate(PII_DOCS * 8)]
    path = _write_docs(tmp_path, texts)
    a = _norm(
        pii_redact(
            ray.data.read_parquet(path, columns=["doc_id", "text"]).repartition(1)
        ).to_pandas()
    )
    b = _norm(
        pii_redact(
            ray.data.read_parquet(path, columns=["doc_id", "text"]).repartition(7)
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_q_pii_redact_identity_on_driver_table(ray_session):
    out = q_pii_redact("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert int(out["n_pii"].sum()) == 0  # synthetic table plants no PII


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


def _line_oracle(path: str, min_count: int = 2) -> pd.DataFrame:
    """Explode lines with ordinality, count non-blank lines corpus-wide,
    drop lines with count >= min_count, re-agg in original order."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text FROM '{path}'")
    ws = "' ' || chr(9) || chr(13)"
    return con.execute(
        f"""
        WITH lines AS (
          SELECT doc_id, unnest(ls) AS line, unnest(range(1, len(ls)+1)) AS i
          FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents) t
        ), lines2 AS (
          SELECT doc_id, line, i, trim(line, {ws}) = '' AS blank FROM lines
        ), dup AS (
          SELECT line FROM lines2 WHERE NOT blank
          GROUP BY line HAVING count(*) >= {min_count}
        ), flagged AS (
          SELECT l.doc_id, l.line, l.i,
                 (d.line IS NOT NULL AND NOT l.blank) AS drop_it
          FROM lines2 l LEFT JOIN dup d ON l.line = d.line AND NOT l.blank
        )
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY i)
                          FILTER (WHERE NOT drop_it), '') AS text,
               count(*) FILTER (WHERE drop_it) AS n_dropped
        FROM flagged GROUP BY doc_id
        """
    ).fetchdf()


def test_dedup_lines_matches_duckdb_oracle(ray_session, tmp_path):
    path = _write_docs(tmp_path, LINE_DOCS)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    got = _norm(dedup_lines(ds).to_pandas())
    want = _norm(_line_oracle(path))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_lines_semantics(ray_session, tmp_path):
    path = _write_docs(tmp_path, LINE_DOCS)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    out = dedup_lines(ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == "unique alpha\nunique beta"
    assert out.loc[1, "text"] == "unique gamma\n\nfooter text" or out.loc[1, "text"] == "unique gamma\n"
    # 'footer text' appears twice -> dropped everywhere
    assert "footer text" not in out.loc[2, "text"]
    assert out.loc[3, "n_dropped"] == 0
    assert out.loc[4, "text"] == "" and out.loc[4, "n_dropped"] == 1
    assert out.loc[5, "text"] == "  \nblank kept\n\t"  # blanks untouched


def test_dedup_lines_partition_independent(ray_session, tmp_path):
    texts = [f"shared line\nuniq {i}\nshared line" if i % 3 == 0 else f"only {i}" for i in range(40)]
    path = _write_docs(tmp_path, texts)
    outs = []
    for parts in (1, 8):
        ds = ray.data.read_parquet(path, columns=["doc_id", "text"]).repartition(parts)
        outs.append(_norm(dedup_lines(ds).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_q_dedup_lines_identity_on_driver_table(ray_session):
    out = q_dedup_lines("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert int(out["n_dropped"].sum()) == 0  # single-line unique docs
