"""BM25 top-k: DuckDB-oracle parity over the driver documents table and a
planted corpus, determinism across partitioning, edge cases."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pie_ray.functions.search import bm25_oracle_sql, bm25_topk, q_bm25

SF = "/root/testdata/sf0.001"


def _oracle(path: str, query: str, k: int = 10) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text FROM '{path}'")
    return con.execute(bm25_oracle_sql(query, k=k)).fetchdf()


def test_bm25_matches_oracle_on_driver_table(ray_session):
    query = "spark join window"
    got = q_bm25(SF, query=query, k=10).to_pandas()
    want = _oracle(f"{SF}/documents.parquet", query, k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # per-doc score is a float sum over query terms; summation order is
    # unspecified in both engines, so parity is to within rounding
    assert np.allclose(got["score"], want["score"], rtol=1e-12, atol=0)


def test_bm25_planted_relevance(ray_session, tmp_path):
    texts = ["cat dog fish"] * 5 + ["zebra quokka zebra zebra", "zebra apple"] + ["dog dog"] * 3
    path = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    top = bm25_topk(ds, "zebra", k=3).to_pandas()
    # rare term: only the two zebra docs score; tf-heavier doc first
    assert top["doc_id"].tolist() == [5, 6]
    want = _oracle(path, "zebra", k=3)
    assert np.allclose(top["score"], want["score"], rtol=1e-12, atol=0)


def test_bm25_partition_independent(ray_session):
    outs = []
    for parts in (1, 8):
        ds = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).repartition(parts)
        outs.append(bm25_topk(ds, "merge sort", k=5).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bm25_empty_query_and_no_match(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert bm25_topk(ds, "   ", k=5).num_rows == 0
    assert bm25_topk(ds, "zzzznotaword", k=5).num_rows == 0


def test_indexed_bm25_matches_scan_path(ray_session, tmp_path):
    """The materialized index must reproduce the scan path exactly: same
    top-k doc order, scores equal to 1e-9 (same formula, different but
    deterministic summation order)."""
    import ray.data

    from pie_ray.functions.search import (
        bm25_topk,
        bm25_topk_indexed,
        build_text_index,
    )

    sf = "/root/testdata/sf0.01"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    idx = str(tmp_path / "tidx")
    meta = build_text_index(docs, idx)
    assert meta["n_docs"] == docs.count()

    for q in ("spark join window", "the shuffle", "zzz-not-a-word", ""):
        scan_res = bm25_topk(docs, q, k=10)
        idx_res = bm25_topk_indexed(idx, q, k=10)
        assert idx_res.column("doc_id").to_pylist() == scan_res.column(
            "doc_id"
        ).to_pylist(), q
        import numpy as np

        a = np.array(scan_res.column("score").to_pylist())
        b = np.array(idx_res.column("score").to_pylist())
        assert np.allclose(a, b, rtol=0, atol=1e-9), q
