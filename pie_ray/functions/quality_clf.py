"""Model-based corpus quality classifier — the CCNet / GPT-3-style filter
(public recipe: train a linear text classifier on a "curated" positive set
vs the raw crawl, keep documents the model scores as curated-like). The
repo's lm_quality module is the UNSUPERVISED half of that toolbox
(self-perplexity bands); this is the SUPERVISED half: a Naive-Bayes-style
per-word model trained distributed and applied as one vectorized pass.

No external data exists in this sandbox, so the training labels are a
deterministic proxy derivable from the documents table itself (docs whose
``source`` has an even numeric suffix are the "curated" class) — the
LABELING is a stand-in, but the TRAINING and SCORING machinery is the real
distributed shape a fastText-like filter needs at 100 TB:

- training = ONE bucketed word exchange (per-batch (word, label) partial
  counts — at most vocab-per-batch rows ship, never tokens), identical in
  shape to the corpus word-count pass;
- the model is a per-word table; it BROADCASTS via ``ray.put`` when the
  vocabulary fits (common case — even web-scale wordpiece/fastText vocabs
  are millions, not billions) and falls back to a terms-hash-join scoring
  path above the threshold (``force_join`` locks equivalence in tests);
- scoring is stateless and vectorized: explode -> index_in -> take ->
  per-doc segment sum.

Integer fixed-point weights make the whole pipeline SQL-ORACLE-ABLE (the
same trick as the integer PageRank in graphops.py): weight(w) =
(c_pos+1) * SCALE // (c_pos+c_neg+2) — a Laplace-smoothed positive rate in
millionths — and a document's score is the int64 SUM of its tokens'
weights, which is order-free, so DuckDB reproduces every value bit-for-bit
(a float log-odds sum never hash-matches across engines). The decision
rule "mean token weight > 1/2" is the integer comparison
2*score > n_tokens*SCALE.

Tokenization is the repo-wide whitespace contract (textops.explode_ws_lower
== the SQL string_split_regex expression); docs whose text trims to empty
have no tokens and are omitted, matching the oracle's inner join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pie_ray.functions.textops import WC_BUCKETS
from pie_ray.util import (
    bucket_count,
    bucket_hash_strings,
    drop_empty_blocks,
    gather_table,
    hash64_ints,
    join_num_partitions,
)

WEIGHT_SCALE = 1_000_000
# past this many vocabulary rows the (words, weights) ray.put broadcast
# stops being safe; scoring switches to the terms-join path
QCLF_VOCAB_BROADCAST_MAX = 2_000_000

_WEIGHTS_SCHEMA = pa.schema(
    [
        ("word", pa.string()),
        ("c_pos", pa.int64()),
        ("c_neg", pa.int64()),
        ("wt", pa.int64()),
    ]
)


def _label_pos(source: pa.Array) -> pa.Array:
    """bool array: even numeric suffix of ``source`` ('src12' -> 12 -> True).
    Mirrors the oracle's CAST(substr(source, 4) AS BIGINT) % 2 = 0."""
    suffix = pc.utf8_slice_codeunits(source, start=3)
    num = pc.cast(suffix, pa.int64())
    return pc.equal(pc.bit_wise_and(num, pa.scalar(1, pa.int64())), 0)


def _explode_tokens(t: pa.Table, cols: list[str]):
    """(words, parent_row_indices, filtered companion columns) — delegates
    to the ONE frozen tokenization implementation (textops.explode_ws_lower
    with extra_cols); a local copy would silently diverge on a spec bump."""
    from pie_ray.functions.textops import explode_ws_lower

    return explode_ws_lower(t, extra_cols=cols)


def train_quality_classifier(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(word, c_pos, c_neg, wt) per distinct word, wt = Laplace-smoothed
    positive rate in millionths (int64). ONE bucketed exchange; per-batch
    partials ship at most the batch's distinct (word) rows."""
    nb = bucket_count(docs.size_bytes(), floor=WC_BUCKETS)

    def partial(t: pa.Table) -> pa.Table:
        words, parents, (source,) = _explode_tokens(t, ["source"])
        if len(words) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "pos_n": pa.array([], pa.int64()),
                    "tot_n": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        pos = pc.take(_label_pos(source), parents)
        gb = (
            pa.table({"word": words, "pos": pc.cast(pos, pa.int64())})
            .group_by(["word"])
            .aggregate([("pos", "sum"), ([], "count_all")])
        )
        word = gb.column("word")
        b = (bucket_hash_strings(word, salt=0x9CF1) % nb).astype("int32")
        return pa.table(
            {
                "word": word,
                "pos_n": pc.cast(gb.column("pos_sum"), pa.int64()),
                "tot_n": pc.cast(gb.column("count_all"), pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["word"])
            .aggregate([("pos_n", "sum"), ("tot_n", "sum")])
        )
        c_pos = gb.column("pos_n_sum").to_numpy(zero_copy_only=False)
        tot = gb.column("tot_n_sum").to_numpy(zero_copy_only=False)
        c_neg = tot - c_pos
        # integer floor division on non-negatives == DuckDB's `//`
        wt = (c_pos + 1) * WEIGHT_SCALE // (tot + 2)
        return pa.table(
            {
                "word": gb.column("word"),
                "c_pos": pa.array(c_pos, pa.int64()),
                "c_neg": pa.array(c_neg, pa.int64()),
                "wt": pa.array(wt, pa.int64()),
            }
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )
    return drop_empty_blocks(out.materialize(), schema=_WEIGHTS_SCHEMA)


def _finalize(doc_id: np.ndarray, score: np.ndarray, n_tok: np.ndarray) -> pa.Table:
    predicted = np.where(2 * score > n_tok * WEIGHT_SCALE, "pos", "neg")
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "score_scaled": pa.array(score, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "predicted": pa.array(predicted, pa.string()),
        }
    )


def score_quality(
    docs: "ray.data.Dataset",
    weights: "ray.data.Dataset",
    weights_as: str = "auto",
) -> "ray.data.Dataset":
    """(doc_id, score_scaled, n_tokens, predicted) — one row per doc with
    >=1 token. ``weights_as``: auto | broadcast | join (size-adaptive like
    the tfidf df attach; the join path adds one doc-bucket combine exchange
    because a doc's term rows scatter across join partitions)."""
    import ray as _ray

    n_vocab = weights.count()
    use_join = weights_as == "join" or (
        weights_as == "auto" and n_vocab > QCLF_VOCAB_BROADCAST_MAX
    )

    if not use_join:
        wtbl = gather_table(weights, schema=_WEIGHTS_SCHEMA)
        order = pc.sort_indices(wtbl.column("word"))
        words_sorted = pc.take(wtbl.column("word").combine_chunks(), order)
        wts_sorted = pc.take(wtbl.column("wt").combine_chunks(), order)
        ref = _ray.put((words_sorted, wts_sorted))

        def score_batch(t: pa.Table, lookup_ref=None) -> pa.Table:
            keys_, wts_ = _ray.get(lookup_ref)
            words, parents, (doc_ids,) = _explode_tokens(t, ["doc_id"])
            if len(words) == 0:
                return _finalize(
                    np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
                )
            idx = pc.index_in(words, value_set=keys_)
            # OOV tokens (scoring a corpus beyond the training vocabulary)
            # drop, matching the join path's inner join and the oracle;
            # n_tokens therefore counts in-vocabulary tokens only
            valid = pc.is_valid(idx)
            idx = idx.filter(valid)
            parents = parents.filter(valid)
            if len(idx) == 0:
                return _finalize(
                    np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
                )
            tok_wt = wts_.take(idx).to_numpy(zero_copy_only=False)
            did = pc.take(doc_ids, parents).to_numpy(zero_copy_only=False)
            uids, inv = np.unique(did, return_inverse=True)
            score = np.zeros(len(uids), np.int64)
            np.add.at(score, inv, tok_wt)
            n_tok = np.bincount(inv, minlength=len(uids)).astype(np.int64)
            return _finalize(uids.astype(np.int64), score, n_tok)

        return docs.map_batches(
            score_batch, fn_kwargs={"lookup_ref": ref}, batch_format="pyarrow"
        )

    # join path: per-doc term counts ⋈ weights on word, then ONE doc-bucket
    # exchange to combine the scattered per-term partials
    from pie_ray.functions.textops import _term_counts

    terms = _term_counts(docs).materialize()
    nb = bucket_count(terms.size_bytes(), floor=WC_BUCKETS)
    # barrier between the join exchange and the doc-bucket exchange (repo
    # rule: two all-to-alls in one streaming plan starve each other's
    # aggregator actors at few CPUs); strip the join's empty-schema blocks
    joined = drop_empty_blocks(
        terms.join(
            weights,
            join_type="inner",
            num_partitions=join_num_partitions(terms.size_bytes()),
            on=("word",),
        ).materialize()
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        wt = t.column("wt").to_numpy(zero_copy_only=False)
        uids, inv = np.unique(did, return_inverse=True)
        score = np.zeros(len(uids), np.int64)
        np.add.at(score, inv, tf * wt)
        n_tok = np.zeros(len(uids), np.int64)
        np.add.at(n_tok, inv, tf)
        b = (hash64_ints(uids, salt=0x9CF2) % nb).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(uids.astype(np.int64), pa.int64()),
                "score": pa.array(score, pa.int64()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def doc_combine(g: pa.Table) -> pa.Table:
        gb = (
            g.drop_columns(["bucket"])
            .group_by(["doc_id"])
            .aggregate([("score", "sum"), ("n_tok", "sum")])
        )
        return _finalize(
            gb.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
            gb.column("score_sum").to_numpy(zero_copy_only=False).astype(np.int64),
            gb.column("n_tok_sum").to_numpy(zero_copy_only=False).astype(np.int64),
        )

    return (
        joined.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(doc_combine, batch_format="pyarrow")
    )


def q_quality_classifier(sf_dir: str, weights_as: str = "auto"):
    """Driver entry: train on the full documents table (even-source-suffix
    = positive proxy labels), score every doc. All-integer output →
    bit-exact DuckDB parity (see module docstring)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    weights = train_quality_classifier(docs)
    return score_quality(docs, weights, weights_as=weights_as)


QUALITY_CLF_ORACLE_SQL = r"""
    -- NB-style quality classifier, integer fixed-point (bit-exact vs the
    -- engine): Laplace-smoothed positive-rate weight per word in
    -- millionths, per-doc score = SUM of token weights (int64, order-free)
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '[ \t\n\f\r]+') AS words,
             CAST(substr(source, 4) AS BIGINT) % 2 = 0 AS pos
      FROM documents
      WHERE trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) <> ''
    ), tok AS (
      SELECT doc_id, pos, unnest(words) AS word FROM docs
    ), wc AS (
      SELECT word,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
             CAST(COUNT(*) AS BIGINT) AS c_tot
      FROM tok GROUP BY word
    ), w AS (
      SELECT word,
             CAST((c_pos + 1) * 1000000 // (c_tot + 2) AS BIGINT) AS wt
      FROM wc
    )
    SELECT t.doc_id,
           CAST(SUM(w.wt) AS BIGINT) AS score_scaled,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CASE WHEN 2 * SUM(w.wt) > COUNT(*) * 1000000
                THEN 'pos' ELSE 'neg' END AS predicted
    FROM tok t JOIN w ON t.word = w.word
    GROUP BY t.doc_id
"""
