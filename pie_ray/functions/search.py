"""Full-text relevance search over the corpus — BM25 top-k, the retrieval
primitive a data pipeline uses for targeted corpus probes (find documents
about X), hard-negative mining and eval-set curation.

Scale shape: no inverted index is materialized. Pass A is a cheap global
aggregate (N docs, average length). Pass B streams the corpus once and
keeps ONLY rows matching a query term — (doc_id, word, tf, dl), a table
bounded by |matching docs| x |query terms|, tiny next to the corpus. Term
document-frequencies come from that matched table (per-batch partials over
<= |query| words, driver combine), scores are a stateless broadcast map,
and the per-doc sum + top-k runs as ONE bucketed exchange with per-bucket
partial top-k so the driver merge sees <= buckets x k rows. Everything
after pass B is sized by the match set, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from pie_ray.functions.textops import WS_CHARS, explode_ws_lower, ws_tokens

BM25_K1 = 1.2
BM25_B = 0.75
SEARCH_BUCKETS = 64


def _match_rows(docs_ds, q_terms: list[str]):
    """(doc_id, word, tf, dl) for every document containing a query term
    (one row per matching distinct term)."""
    qset = pa.array(q_terms, pa.string())

    def scan(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text").combine_chunks(), "")
        trimmed = pc.utf8_trim(pc.utf8_lower(text), characters=WS_CHARS)
        nonempty = pc.not_equal(trimmed, "")
        lists = pc.split_pattern_regex(
            trimmed.filter(nonempty), r"[ \t\n\f\r]+"
        )
        dl = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        words = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ids = (
            t.column("doc_id")
            .combine_chunks()
            .filter(nonempty)
            .to_numpy(zero_copy_only=False)
        )
        hit = pc.is_in(words, value_set=qset).to_numpy(zero_copy_only=False)
        if not hit.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                }
            )
        sub = pa.table(
            {
                "doc_id": pa.array(ids[parent[hit]], pa.int64()),
                "word": words.filter(pa.array(hit)),
                "dl": pa.array(dl[parent[hit]], pa.int64()),
            }
        )
        gb = sub.group_by(["doc_id", "word"]).aggregate([("dl", "count"), ("dl", "min")])
        from pie_ray.util import rename_grouped

        gb = rename_grouped(gb, ["doc_id", "word"], ["doc_id", "word", "tf", "dl"])
        return gb

    return docs_ds.map_batches(scan, batch_format="pyarrow")


def bm25_topk(
    docs_ds,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    num_buckets: int = SEARCH_BUCKETS,
):
    """Top-k (doc_id, score) for a free-text query, BM25 with the
    Robertson-Sparck-Jones idf ``ln(1 + (N - df + 0.5) / (df + 0.5))``
    (always positive). Deterministic: ties broken by ascending doc_id.
    Returns a pyarrow Table (k rows — a driver-sized result)."""
    q_terms = sorted(set(ws_tokens(query.lower())))
    if not q_terms:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )

    # pass A: corpus stats (N, avgdl) — one streaming aggregate
    from pie_ray.functions.textops import token_count_batch

    stats = docs_ds.map_batches(
        lambda t: pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "len": pa.array(
                    [pc.sum(token_count_batch(t).column("n_tokens_ws")).as_py() or 0],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    n_docs = 0
    tot_len = 0
    for bt in stats.iter_batches(batch_format="pyarrow"):
        n_docs += pc.sum(bt.column("n")).as_py() or 0
        tot_len += pc.sum(bt.column("len")).as_py() or 0
    if n_docs == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    avgdl = tot_len / n_docs

    # pass B: matched rows — bounded by |matching docs| x |query terms|
    matched = _match_rows(docs_ds, q_terms).materialize()

    # df per query term from the matched table (<= |query| distinct words):
    # per-batch partial counts, driver combine
    df: dict[str, int] = {}
    for bt in matched.map_batches(
        lambda t: t.group_by(["word"]).aggregate([("doc_id", "count")]),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for w, c in zip(
            bt.column("word").to_pylist(), bt.column("doc_id_count").to_pylist()
        ):
            df[w] = df.get(w, 0) + int(c)
    # ln(1 + x) spelled exactly as the SQL oracle's ln(1 + ...) — not
    # log1p — so engine and DuckDB agree to the last bit
    idf = {
        w: float(np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))) for w, d in df.items()
    }
    idf_ref = ray.put(idf)

    # score rows (stateless broadcast map), then per-doc sum + partial
    # top-k inside ONE bucketed exchange
    def score(t: pa.Table, ref=None) -> pa.Table:
        iv = ray.get(ref)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dlv = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        w_idf = np.array([iv[w] for w in t.column("word").to_pylist()])
        s = w_idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dlv / avgdl))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "s": pa.array(s, pa.float64())}
        )
        return out.append_column(
            "bucket",
            pa.array((ids % num_buckets).astype(np.int32), pa.int32()),
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        gb = g.group_by(["doc_id"]).aggregate([("s", "sum")])
        from pie_ray.util import rename_grouped

        gb = rename_grouped(gb, ["doc_id"], ["doc_id", "score"])
        order = pc.sort_indices(
            gb,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        return gb.take(order[:k])

    parts = [
        bt
        for bt in matched.map_batches(score, fn_kwargs={"ref": idf_ref}, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: bucket_topk(g.drop_columns(["bucket"])), batch_format="pyarrow"
        )
        .iter_batches(batch_format="pyarrow")
    ]
    allp = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    )
    order = pc.sort_indices(
        allp, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    return allp.take(order[:k])


def q_bm25(sf_dir: str, query: str = "spark join window", k: int = 10) -> pa.Table:
    """Library/query surface over the documents table; DuckDB-oracle
    parity (same formula in SQL) gated in tests/unit/test_search.py."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_topk(docs, query, k=k)


def bm25_oracle_sql(query: str, k: int = 10, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB SQL computing the same BM25 top-k over ``documents`` —
    identical tokenizer class, idf and scoring arithmetic."""
    q_terms = sorted(set(ws_tokens(query.lower())))
    terms_sql = ", ".join("'" + w.replace("'", "''") + "'" for w in q_terms)
    ws = r"[ \t\n\f\r]+"
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '{ws}')) AS word
      FROM documents WHERE trim(lower(text), ' ' || chr(9) || chr(10) || chr(12) || chr(13)) <> ''
    ), dls AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT (SELECT count(*) FROM documents) AS n,
             (SELECT sum(dl) FROM dls)::DOUBLE
               / (SELECT count(*) FROM documents) AS avgdl
    ), tfs AS (
      SELECT doc_id, word, count(*) AS tf FROM toks
      WHERE word IN ({terms_sql}) GROUP BY doc_id, word
    ), dfs AS (
      SELECT word, count(*) AS df FROM tfs GROUP BY word
    ), scored AS (
      SELECT t.doc_id,
             sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
                 * (t.tf * ({k1} + 1.0))
                 / (t.tf + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl))) AS score
      FROM tfs t
      JOIN dfs f USING (word) JOIN dls d USING (doc_id) CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


# ------------------------------------------------- materialized text index

TEXT_INDEX_PARTS = 64
# driver bound for the indexed query path: sum of the query terms' posting
# rows. Interactive point queries stay far below it; a stop-word-heavy
# query against a huge corpus should use the scan path (bm25_topk), which
# distributes the scoring.
INDEX_DRIVER_ROWS = 5_000_000


def _posting_rows(t: pa.Table) -> pa.Table:
    """(word, doc_id, tf, dl) for every distinct (doc, word) in the batch —
    exact per-document tf because a document never spans batches."""
    from pie_ray.util import hash64_array, rename_grouped

    text = pc.fill_null(t.column("text").combine_chunks(), "")
    trimmed = pc.utf8_trim(pc.utf8_lower(text), characters=WS_CHARS)
    nonempty = pc.not_equal(trimmed, "")
    lists = pc.split_pattern_regex(trimmed.filter(nonempty), r"[ \t\n\f\r]+")
    dl = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    ids = (
        t.column("doc_id").combine_chunks().filter(nonempty).to_numpy(zero_copy_only=False)
    )
    sub = pa.table(
        {
            "word": words,
            "doc_id": pa.array(ids[parent], pa.int64()),
            "dl": pa.array(dl[parent], pa.int64()),
        }
    )
    gb = rename_grouped(
        sub.group_by(["word", "doc_id"]).aggregate([("dl", "count"), ("dl", "min")]),
        ["word", "doc_id"],
        ["word", "doc_id", "tf", "dl"],
    )
    part = (
        hash64_array(gb.column("word").to_pylist(), salt=b"tidx") % TEXT_INDEX_PARTS
    ).astype("int32")
    return gb.append_column("part", pa.array(part, pa.int32()))


def build_text_index(docs_ds, out_dir: str, num_parts: int = TEXT_INDEX_PARTS) -> dict:
    """Materialize an inverted index: posting rows hash-partitioned by term
    (ONE bucketed exchange, postings sorted by (word, doc_id) inside each
    partition so parquet row-group stats prune term lookups), plus a
    corpus-stats sidecar. The search counterpart of the partitioned graph
    sink: a query then reads only its terms' partitions — never the corpus."""
    import json
    import os

    from pie_ray.functions.textops import token_count_batch

    def sort_part(g: pa.Table) -> pa.Table:
        return g.take(
            pc.sort_indices(g, sort_keys=[("word", "ascending"), ("doc_id", "ascending")])
        )

    os.makedirs(out_dir, exist_ok=True)
    (
        docs_ds.map_batches(_posting_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sort_part, batch_format="pyarrow")
        .write_parquet(os.path.join(out_dir, "postings"), partition_cols=["part"])
    )

    # corpus stats (N docs incl. empty ones, avgdl) — one streaming pass
    n_docs = 0
    tot_len = 0
    for bt in docs_ds.map_batches(
        lambda t: pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "len": pa.array(
                    [pc.sum(token_count_batch(t).column("n_tokens_ws")).as_py() or 0],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        n_docs += pc.sum(bt.column("n")).as_py() or 0
        tot_len += pc.sum(bt.column("len")).as_py() or 0
    meta = {"n_docs": n_docs, "total_len": tot_len, "num_parts": num_parts}
    with open(os.path.join(out_dir, "_INDEX_META.json"), "w") as f:
        json.dump(meta, f)
    return meta


def bm25_topk_indexed(
    index_dir: str,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> pa.Table:
    """BM25 top-k served from the materialized index: reads ONLY the query
    terms' posting partitions (parquet filter on the sorted word column —
    row-group pruning), scores driver-side over the matched rows. Identical
    results to the scan path ``bm25_topk`` (gated in tests). Driver memory
    = the query terms' posting rows, capped at INDEX_DRIVER_ROWS."""
    import json
    import os

    import pyarrow.parquet as pq

    from pie_ray.util import hash64_array

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )
    q_terms = sorted(set(ws_tokens(query.lower())))
    if not q_terms:
        return empty
    with open(os.path.join(index_dir, "_INDEX_META.json")) as f:
        meta = json.load(f)
    n_docs, num_parts = meta["n_docs"], meta["num_parts"]
    if n_docs == 0:
        return empty
    avgdl = meta["total_len"] / n_docs

    parts = hash64_array(q_terms, salt=b"tidx") % num_parts
    tabs = []
    for part in sorted(set(int(p) for p in parts)):
        pdir = os.path.join(index_dir, "postings", f"part={part}")
        if not os.path.isdir(pdir):
            continue
        terms = [t for t, p in zip(q_terms, parts) if int(p) == part]
        tabs.append(
            pq.read_table(
                pdir,
                columns=["word", "doc_id", "tf", "dl"],
                filters=[("word", "in", terms)],
            )
        )
    if not tabs:
        return empty
    m = pa.concat_tables(tabs)
    if m.num_rows > INDEX_DRIVER_ROWS:
        raise ValueError(
            f"query matches {m.num_rows} posting rows (> {INDEX_DRIVER_ROWS}); "
            "use the distributed scan path bm25_topk() for stop-word-scale terms"
        )
    if m.num_rows == 0:
        return empty

    # same arithmetic as bm25_topk, in deterministic sorted (word, doc) order
    m = m.take(pc.sort_indices(m, sort_keys=[("word", "ascending"), ("doc_id", "ascending")]))
    words = m.column("word").to_pylist()
    df: dict[str, int] = {}
    for w in words:
        df[w] = df.get(w, 0) + 1
    idf = {w: float(np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))) for w, d in df.items()}
    tf = m.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    dlv = m.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
    w_idf = np.array([idf[w] for w in words])
    s = w_idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dlv / avgdl))
    scored = pa.table(
        {"doc_id": m.column("doc_id"), "s": pa.array(s, pa.float64())}
    )
    from pie_ray.util import rename_grouped

    gb = rename_grouped(
        scored.group_by(["doc_id"]).aggregate([("s", "sum")]), ["doc_id"], ["doc_id", "score"]
    )
    order = pc.sort_indices(
        gb, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    return gb.take(order[:k])
