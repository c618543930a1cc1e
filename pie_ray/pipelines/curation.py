"""Full training-data curation pipeline v2 — the composition of this
round's operators into the standard web-corpus recipe (CCNet → C4 →
Lee-et-al order):

    1. validate      : schema gate (non-null, non-blank text) → quarantine
    2. LM band filter: corpus self-perplexity, keep the middle of the
                       bits-per-word distribution (drop boilerplate AND
                       gibberish tails)
    3. line dedup    : C4-style corpus-duplicated line removal
    4. span dedup    : exact duplicate-passage (word-8-gram) removal
    5. length floor  : docs left under min_tokens after the cuts are dropped

Each stage reports rows in/out (and chars dropped where applicable) — the
no-silent-caps rule: every removal is counted, quarantined rows carry
reasons. All stages are the library operators with their own gates; this
module owns only the composition and the report.

Scale shape: three corpus-wide exchanges total (unigram counts, line
counts, gram counts) + stateless maps. Driver state is bounded everywhere:
band edges come from the mergeable histogram quantile sketch (n_bins
counters, never the score column), the LM/dup-line/dup-gram artifacts are
capped broadcasts, and report sums use streaming ``Dataset.sum``/``count``
— no corpus-sized pull anywhere. The LM is trained ONCE and reused for the
band-edge pass and the filtering pass (one extra scoring pass instead of a
doc_id join — stateless beats a shuffle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    docs_ds,
    bits_lo_q: float = 0.05,
    bits_hi_q: float = 0.95,
    min_tokens: int = 10,
    lm_min_count: int = 5,
):
    """(curated_ds with (doc_id, text, n_tokens), report dict)."""
    from pie_ray.functions.dedup import dedup_lines
    from pie_ray.functions.lm_quality import score_perplexity, unigram_model
    from pie_ray.functions.relational import quantile_sketch
    from pie_ray.functions.spandedup import dedup_spans
    from pie_ray.functions.validate import matches, not_null, validate

    report: dict = {"rows_in": docs_ds.count()}

    # 1. validate: text present and non-blank (matches() passes nulls by
    #    design — not_null is the load-bearing rule for them)
    clean, quarantined = validate(docs_ds, [not_null("text"), matches("text", r"\S")])
    report["rows_quarantined"] = quarantined.count()

    # 2. perplexity band: train the LM once; edges from the histogram
    #    sketch over a score-only pass; filter in a second stateless pass
    #    that carries text (band edges are two driver floats)
    model = unigram_model(clean, min_count=lm_min_count)
    scored = score_perplexity(clean, model=model).filter(expr="n_tokens > 0")
    scored = scored.materialize()  # consumed 3x: min/max, sketch, (via clean) refilter
    edges = quantile_sketch(scored, "bits_per_word", [bits_lo_q, bits_hi_q])
    # widen by the sketch's error bound (one bin width): an interpolated
    # edge can land a hair inside the score mass and cut rows the true
    # quantile keeps — the band must be conservative OUTWARD
    from ray.data.aggregate import Max, Min

    mm = scored.aggregate(
        Min("bits_per_word", alias_name="lo"), Max("bits_per_word", alias_name="hi")
    )
    err = (float(mm["hi"]) - float(mm["lo"])) / 8192
    lo, hi = edges[bits_lo_q] - err, edges[bits_hi_q] + err
    report["bits_band"] = (lo, hi)
    banded = (
        score_perplexity(clean, model=model, keep_cols=("text",))
        .filter(expr=f"bits_per_word >= {lo!r} and bits_per_word <= {hi!r}")
        .select_columns(["doc_id", "text"])
        .materialize()
    )
    report["rows_after_band"] = banded.count()

    # 3 + 4. line dedup then span dedup (line-level first: removing
    # boilerplate lines shrinks the gram universe the span pass counts)
    lined = dedup_lines(banded).materialize()
    report["chars_dropped_lines"] = int(lined.sum("n_dropped") or 0)
    spanned = dedup_spans(
        lined.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        )
    ).materialize()
    report["chars_dropped_spans"] = int(spanned.sum("n_chars_dropped") or 0)

    # 5. length floor on the FINAL text
    def finalize(t: pa.Table) -> pa.Table:
        from pie_ray.functions.textops import token_count_batch

        tc = token_count_batch(t.select(["doc_id", "text"]))
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "n_tokens": tc.column("n_tokens_ws"),
            }
        )
        return out.filter(
            pc.greater_equal(out.column("n_tokens"), pa.scalar(min_tokens, pa.int64()))
        )

    curated = spanned.map_batches(finalize, batch_format="pyarrow").materialize()
    report["rows_out"] = curated.count()
    return curated, report


def q_curate_corpus(sf_dir: str):
    """Driver surface: the curated rows (the stage report is the library
    call's second return). Deterministic: band edges are a pure function of
    the score histogram, all dedup artifacts are content hashes."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    curated, _report = curate_corpus(ds)
    return curated


def curate_corpus_v3(
    docs_ds,
    emb_ds,
    tau: float = 0.92,
    k_clusters: int = 16,
    chunk_chars: int = 400,
    chunk_stride: int = 300,
    **v2_kwargs,
):
    """v2 + the semantic layer + chunking — the full LLM-data recipe:

        1-5. curate_corpus (validate → LM band → line dedup → span dedup
             → length floor)
        6.   SemDeDup: embeddings joined on doc id (docs WITHOUT an
             embedding pass through — absence of a vector is not evidence
             of duplication), keep only each duplicate component's
             representative
        7.   chunk_documents: overlapping char chunks, training-ready

    Returns (chunks_ds with (doc_id, off, chunk), report). Same accounting
    contract as v2: every removal counted, nothing silent.

    Scale: adds ONE bounded cluster exchange (semdedup) and a broadcast
    keep-set — the kept/dropped verdict table is doc-count-sized ids, not
    text; the embeddings join ships ids+vectors only for docs that
    SURVIVED steps 1-5 (semi-join pushdown by broadcast id set would be
    the next refinement at 10^12 rows; at that scale prefer running
    semdedup FIRST on the full embedding store, where it is one exchange
    regardless)."""
    import numpy as np
    import ray

    from pie_ray.functions.semdedup import semantic_dedup
    from pie_ray.functions.textops import chunk_documents

    curated, report = curate_corpus(docs_ds, **v2_kwargs)

    # semi-join by broadcast sorted id array (Ray's hash join cannot carry
    # list<float> payloads, and the survivor id set is ids-only — bounded);
    # streamed as Arrow batches, never per-row Python dicts
    def _ids_array(ds_ids, col):
        parts = [
            b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            for b in ds_ids.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

    kept_ids = _ids_array(curated.select_columns(["doc_id"]), "doc_id")
    ids_ref = ray.put(kept_ids)

    def emb_of_survivors(t: pa.Table) -> pa.Table:
        ks = ray.get(ids_ref)
        if t.num_rows == 0 or len(ks) == 0:
            return t.slice(0, 0)
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, v)
        hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == v)
        return t.filter(pa.array(hit))

    emb = emb_ds.map_batches(emb_of_survivors, batch_format="pyarrow").materialize()
    n_emb = emb.count()
    report["rows_with_embedding"] = n_emb
    if n_emb == 0:
        report["rows_semdedup_dropped"] = 0
        report["rows_after_semdedup"] = report["rows_out"]
        chunks = chunk_documents(
            curated, chunk_chars=chunk_chars, stride=chunk_stride
        ).materialize()
        report["chunks_out"] = chunks.count()
        return chunks, report

    # k must stay well under n or every point seeds its own cluster and
    # nothing ever shares one (mean cluster size >= 4 here)
    k_eff = max(1, min(k_clusters, n_emb // 4))
    verdict = semantic_dedup(emb, k=k_eff, tau=tau).materialize()
    # a doc is dropped only when NO row of its id was kept — an id with
    # duplicate embedding rows (append-only re-ingest) has one kept copy
    # and must survive
    drop_rows = _ids_array(
        verdict.map_batches(
            lambda t: t.filter(pc.invert(t.column("keep"))).select(["vec_id"]),
            batch_format="pyarrow",
        ),
        "vec_id",
    )
    keep_rows_ids = _ids_array(
        verdict.map_batches(
            lambda t: t.filter(t.column("keep")).select(["vec_id"]),
            batch_format="pyarrow",
        ),
        "vec_id",
    )
    drop_ids = np.setdiff1d(drop_rows, keep_rows_ids)
    report["rows_semdedup_dropped"] = len(drop_ids)
    drop_ref = ray.put(drop_ids)

    def keep_rows(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if len(d) == 0 or t.num_rows == 0:
            return t
        ids_np = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(d, ids_np)
        is_drop = (pos < len(d)) & (d[np.minimum(pos, len(d) - 1)] == ids_np)
        return t.filter(pa.array(~is_drop))

    kept = curated.map_batches(keep_rows, batch_format="pyarrow")
    chunks = chunk_documents(kept, chunk_chars=chunk_chars, stride=chunk_stride)
    report["rows_after_semdedup"] = report["rows_out"] - len(drop_ids)
    chunks = chunks.materialize()
    report["chunks_out"] = chunks.count()
    return chunks, report


def q_curate_corpus_v3(sf_dir: str):
    """Driver surface: curated + semantically deduped + chunked corpus
    (embeddings attached by id from the embeddings table)."""
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    chunks, _report = curate_corpus_v3(docs, emb)
    return chunks


# ---------------------------------------------------------------------------
# curate_pages — CCNet/RefinedWeb-style DOMAIN-PRIOR gate over T0 pages
# ---------------------------------------------------------------------------

CURATE_HOST_BROADCAST_LIMIT = 2_000_000


def curate_pages(pages_ds, min_rank_scaled: int | None = None,
                 keep_path: str = "auto", ranks: "pa.Table | None" = None):
    """Gate T0 pages on the standing of their HOST in the web link graph
    (the other half of the curation recipe: curate_corpus* scores the
    TEXT, this scores the SOURCE — CCNet buckets by LM quality, RefinedWeb
    gates on URL/domain signals; host PageRank over the corpus's own link
    graph is the classic self-contained domain prior).

    Pipeline: host_edges (one pair-bucketed exchange over the pages) →
    host_pagerank (integer-exact, deterministic) → keep pages whose host
    rank is >= ``min_rank_scaled``. The default threshold is
    ``teleport base + 1``: a host with NO inbound mass converges to
    exactly ``scale*15//100``, so the default keeps precisely the hosts
    at least one other host links to — source-only link farms fall out.

    Keep-set application is size-adaptive (``keep_path``: auto | broadcast
    | join): under CURATE_HOST_BROADCAST_LIMIT kept hosts, a frozenset
    ships once via ``ray.put`` and a stateless task map filters (the html
    payload never moves); above it, pages pick up their host in a map and
    an inner hash join against the kept-host table co-locates by host —
    the join moves the page payload, which the broadcast path avoids, so
    the limit is deliberately generous.

    Returns (kept_pages_ds, report) — report counts hosts/pages kept and
    dropped (no-silent-drops rule)."""
    import ray
    import ray.data

    from pie_ray.functions.graphops import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE
    from pie_ray.stages.links import host_edges, host_of, host_pagerank
    from pie_ray.util import drop_empty_blocks, join_num_partitions

    if min_rank_scaled is None:
        min_rank_scaled = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN + 1

    pages_ds = pages_ds.materialize()
    if ranks is None:
        ranks = host_pagerank(host_edges(pages_ds))  # (host, rank_scaled)
    rs = ranks.column("rank_scaled")
    kept_mask = pc.greater_equal(rs, pa.scalar(min_rank_scaled, pa.int64()))
    kept_hosts_tbl = ranks.filter(kept_mask)
    n_hosts, n_kept_hosts = ranks.num_rows, kept_hosts_tbl.num_rows
    n_pages = pages_ds.count()

    use_broadcast = keep_path == "broadcast" or (
        keep_path == "auto" and n_kept_hosts <= CURATE_HOST_BROADCAST_LIMIT
    )
    if use_broadcast:
        keep_ref = ray.put(frozenset(kept_hosts_tbl.column("host").to_pylist()))

        def keep_batch(t: pa.Table) -> pa.Table:
            keep = ray.get(keep_ref)
            mask = [host_of(u or "") in keep for u in t.column("url").to_pylist()]
            return t.filter(pa.array(mask, pa.bool_()))

        kept = pages_ds.map_batches(keep_batch, batch_format="pyarrow")
    else:
        def add_host(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__host",
                pa.array([host_of(u or "") for u in t.column("url").to_pylist()],
                         pa.string()),
            )

        hosts_ds = ray.data.from_arrow(
            pa.table({"__khost": kept_hosts_tbl.column("host")})
        )
        joined = drop_empty_blocks(
            pages_ds.map_batches(add_host, batch_format="pyarrow")
            .join(
                hosts_ds,
                join_type="inner",
                num_partitions=join_num_partitions(pages_ds.size_bytes()),
                on=("__host",),
                right_on=("__khost",),
            )
            .materialize()
        )
        kept = joined.map_batches(
            lambda t: t.drop_columns(["__host"]), batch_format="pyarrow"
        )

    kept = kept.materialize()
    n_kept_pages = kept.count()
    report = {
        "n_hosts": n_hosts,
        "n_hosts_kept": n_kept_hosts,
        "n_hosts_dropped": n_hosts - n_kept_hosts,
        "n_pages": n_pages,
        "n_pages_kept": n_kept_pages,
        "n_pages_dropped": n_pages - n_kept_pages,
        "min_rank_scaled": min_rank_scaled,
        "keep_path": "broadcast" if use_broadcast else "join",
    }
    return kept, report


def q_curate_pages(sf_dir: str):
    """Driver entry (rows-only — link topology is not SQL-expressible over
    HTML): domain-prior curation over the deterministic linked corpus.
    Returns the per-host summary (host, rank_scaled, kept, n_pages)."""
    import numpy as np

    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.links import host_edges, host_of, host_pagerank

    pages = synth_link_pages(1200).materialize()
    ranks = host_pagerank(host_edges(pages))
    kept_ds, report = curate_pages(pages, ranks=ranks)

    def host_counts(ds):
        import collections

        counts: collections.Counter = collections.Counter()
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            for u in batch.column("url").to_pylist():
                counts[host_of(u or "")] += 1
        return counts

    per_host = host_counts(pages)
    hosts = ranks.column("host").to_pylist()
    rs = ranks.column("rank_scaled").to_pylist()
    kept_flag = [r >= report["min_rank_scaled"] for r in rs]
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "rank_scaled": pa.array(rs, pa.int64()),
            "kept": pa.array(kept_flag, pa.bool_()),
            "n_pages": pa.array(
                np.array([per_host.get(h, 0) for h in hosts], np.int64), pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# curate_web — the full SOURCE-side web-curation recipe in one pipeline
# ---------------------------------------------------------------------------

URL_LOSER_BROADCAST_LIMIT = 2_000_000


def dedup_pages_by_url(pages_ds, order_col: str = "warc_ts",
                       loser_path: str = "auto"):
    """URL-level dedup for PAYLOAD rows: the winners are decided on a
    NARROW (canon, order, url) projection — the html column never enters
    the dedup exchange — and the LOSER url set is removed from the full
    rows by anti-membership. Losers, not winners, are the broadcast:
    duplicate crawls are a minority of a corpus, so the loser set is
    proportional to the DUPLICATES (broadcast frozenset under
    URL_LOSER_BROADCAST_LIMIT; one ``left_anti`` hash join above it — the
    only path that shuffles payload). Returns (kept_ds, report).

    Known edge consumers must expect: BYTE-IDENTICAL rows (same url AND
    same ``order_col``) both survive — an anti-membership set cannot say
    "drop k-1 of k indistinguishable rows". Such exact re-ingests are
    upstream artifacts; ``n_kept`` is MEASURED, so the report stays
    truthful when they occur."""
    import ray
    import ray.data

    from pie_ray.functions.urlops import canonicalize_batch
    from pie_ray.util import (
        bucket_count,
        bucket_hash_strings,
        drop_empty_blocks,
        gather_table,
        join_num_partitions,
    )

    pages_ds = pages_ds.materialize()
    nb = bucket_count(pages_ds.size_bytes(), floor=32)
    _sch = pages_ds.schema()
    ord_type = _sch.types[_sch.names.index(order_col)]
    _LOSER_SCHEMA = pa.schema([("url", pa.string()), ("ord", ord_type)])

    def tag(t: pa.Table) -> pa.Table:
        proj = pa.table({"url": t.column("url"), "ord": t.column(order_col)})
        proj = canonicalize_batch(proj, out_col="__canon")
        b = (bucket_hash_strings(proj.column("__canon"), salt=0x10dE) % nb).astype(
            "int32"
        )
        return proj.append_column("bucket", pa.array(b, pa.int32()))

    def losers(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _LOSER_SCHEMA.empty_table()
        # winner identity is the (url, ord) PAIR, not the url string: an
        # exact-url recrawl (same url, two warc_ts) must lose only its
        # non-winning timestamps — a url-keyed loser set would remove the
        # winner too. Collapse identical (canon, url, ord) rows first so
        # a byte-identical duplicate row never marks its twin a loser
        # (identical full dups keep both copies — documented edge; they
        # carry no distinguishing feature an anti-set could select on).
        g = g.drop_columns(["bucket"]).group_by(["__canon", "url", "ord"]).aggregate([])
        from pie_ray.util import rename_grouped

        g = rename_grouped(g, ["__canon", "url", "ord"], ["__canon", "url", "ord"])
        g = g.sort_by(
            [("__canon", "ascending"), ("ord", "ascending"), ("url", "ascending")]
        )
        canon = np.asarray(g.column("__canon").to_pylist())
        _, starts = np.unique(canon, return_index=True)
        keep = np.zeros(len(canon), bool)
        keep[starts] = True
        lose = pa.array(~keep)
        return pa.table(
            {"url": g.column("url").filter(lose), "ord": g.column("ord").filter(lose)}
        )

    losers_ds = drop_empty_blocks(
        pages_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(losers, batch_format="pyarrow")
        .materialize(),
        schema=_LOSER_SCHEMA,
    ).materialize()
    n_losers = losers_ds.count()
    n_pages = pages_ds.count()

    if n_losers == 0:
        kept = pages_ds
    elif loser_path == "broadcast" or (
        loser_path == "auto" and n_losers <= URL_LOSER_BROADCAST_LIMIT
    ):
        loser_tbl = gather_table(losers_ds, schema=_LOSER_SCHEMA)
        loser_ref = ray.put(
            frozenset(
                zip(
                    loser_tbl.column("url").to_pylist(),
                    loser_tbl.column("ord").to_pylist(),
                )
            )
        )

        def drop_losers(t: pa.Table) -> pa.Table:
            bad = ray.get(loser_ref)
            mask = [
                (u, o) not in bad
                for u, o in zip(
                    t.column("url").to_pylist(), t.column(order_col).to_pylist()
                )
            ]
            return t.filter(pa.array(mask, pa.bool_()))

        kept = pages_ds.map_batches(drop_losers, batch_format="pyarrow")
    else:
        kept = drop_empty_blocks(
            pages_ds.join(
                losers_ds.map_batches(
                    lambda t: pa.table(
                        {"__lurl": t.column("url"), "__lord": t.column("ord")}
                    ),
                    batch_format="pyarrow",
                ).materialize(),
                join_type="left_anti",
                num_partitions=join_num_partitions(pages_ds.size_bytes()),
                on=("url", order_col),
                right_on=("__lurl", "__lord"),
            ).materialize()
        )

    kept = kept.materialize()
    n_kept = kept.count()  # MEASURED — never derived from the loser count
    report = {
        "n_pages": n_pages,
        "n_url_dups_dropped": n_pages - n_kept,
        "n_kept": n_kept,
    }
    return kept, report


def curate_web_v1(pages_ds, seed_hosts=None,
                  max_link_density_q: int | None = None,
                  min_text_to_html_q: int | None = None,
                  blocklist=None):
    """The SOURCE-side web-curation recipe end to end, each stage one of
    this repo's operators (the text-side recipe is ``curate_corpus_v2/3``):

        1. URL dedup      : canonical-url crawl variants collapse
                            (narrow-projection winners, loser anti-set)
        2. extract        : frozen stripper fills ``text`` (html kept for
                            stage 3, dropped right after)
        3. structure gate : nav-heavy / markup-soup pages cut on exact
                            integer ratios
        3b. blocklist     : optional C4-style banned-words cut over the
                            extracted text (one RE2 kernel per batch;
                            ``blocklist`` = iterable of words, off when
                            None/empty)
        4. host prior     : host PageRank gate — or TrustRank when
                            ``seed_hosts`` is given (link farms fall to 0)

    Returns (docs_ds, report): docs carry (url, warc_ts, text, lang) and
    the report chains every stage's exact in/out counts (no silent
    drops)."""
    from pie_ray.stages.extract import extract_batch
    from pie_ray.stages.links import host_edges, host_pagerank, host_trustrank
    from pie_ray.stages.pagequality import filter_by_page_quality

    kept1, r1 = dedup_pages_by_url(pages_ds)

    def with_text(t: pa.Table) -> pa.Table:
        ext = extract_batch(t)
        return pa.table(
            {
                "url": ext.column("url"),
                "warc_ts": ext.column("warc_ts"),
                "html": t.column("html"),
                "text": ext.column("text"),
                "lang": ext.column("lang"),
            }
        )

    extracted = kept1.map_batches(with_text, batch_format="pyarrow").materialize()
    gate_kwargs = {}
    if max_link_density_q is not None:
        gate_kwargs["max_link_density_q"] = max_link_density_q
    if min_text_to_html_q is not None:
        gate_kwargs["min_text_to_html_q"] = min_text_to_html_q
    kept3, r3 = filter_by_page_quality(extracted, **gate_kwargs)

    rb = None
    if blocklist:
        from pie_ray.functions.textops import blocklist_pattern

        pattern = blocklist_pattern(tuple(blocklist))

        def clean(t: pa.Table) -> pa.Table:
            n = pc.count_substring_regex(
                pc.utf8_lower(t.column("text")), pattern=pattern
            )
            return t.filter(pc.equal(n, pa.scalar(0, pa.int32())))

        n_in = kept3.count()
        kept3 = kept3.map_batches(clean, batch_format="pyarrow").materialize()
        rb = {"n_pages": n_in, "n_kept": kept3.count(), "n_words": len(set(blocklist))}

    edges = host_edges(kept3).materialize()
    if seed_hosts is not None:
        ranks = host_trustrank(edges, seed_hosts)
        min_rank = 1
    else:
        ranks = host_pagerank(edges)
        min_rank = None  # curate_pages default: teleport base + 1
    kept4, r4 = curate_pages(kept3, ranks=ranks, min_rank_scaled=min_rank)

    docs = kept4.map_batches(
        lambda t: t.drop_columns(["html"]), batch_format="pyarrow"
    ).materialize()
    report = {
        "url_dedup": r1,
        "structure_gate": r3,
        "host_prior": {**r4, "prior": "trustrank" if seed_hosts else "pagerank"},
        "n_docs_out": docs.count(),
    }
    if rb is not None:
        report["blocklist"] = rb
    return docs, report


def q_curate_web(sf_dir: str):
    """Driver entry (rows-only): the full source-side recipe over the
    link-farm corpus with planted duplicate crawls — TrustRank seeds are
    the authority hosts, so the farm is cut even though it interlinks.
    Returns one summary row per stage (stage, rows_in, rows_out)."""
    from pie_ray.sources.linksynth import AUTH_FRAC, n_hosts_for, synth_link_pages

    n = 1200
    n_hosts = n_hosts_for(n)
    seeds = [f"h{j}.example" for j in range(max(2, int(n_hosts * AUTH_FRAC)))]
    pages = synth_link_pages(n, spam_interlink=True)

    def add_dup_variants(t: pa.Table) -> pa.Table:
        # every 5th page (by PAGE INDEX parsed from the url — batch-local
        # positions would make the dup set depend on block layout) also
        # arrives as a tracking-param crawl variant with a LATER
        # timestamp (the original must win)
        keep = [
            int(u.rsplit("/p", 1)[1]) % 5 == 0
            for u in t.column("url").to_pylist()
        ]
        dups = t.filter(pa.array(keep, pa.bool_()))
        if dups.num_rows:
            urls = [f"{u}?utm_source=feed" for u in dups.column("url").to_pylist()]
            ts = pc.add(dups.column("warc_ts").cast(pa.int64()), 1).cast(
                pa.timestamp("us")
            )
            dups = (
                dups.drop_columns(["url", "warc_ts"])
                .append_column("url", pa.array(urls, pa.string()))
                .append_column("warc_ts", ts)
                .select(t.column_names)
            )
        return pa.concat_tables([t, dups]).combine_chunks()

    corpus = pages.map_batches(add_dup_variants, batch_format="pyarrow")
    _docs, report = curate_web_v1(corpus, seed_hosts=seeds)
    rows = [
        ("url_dedup", report["url_dedup"]["n_pages"], report["url_dedup"]["n_kept"]),
        (
            "structure_gate",
            report["structure_gate"]["n_pages"],
            report["structure_gate"]["n_kept"],
        ),
        (
            "host_prior",
            report["host_prior"]["n_pages"],
            report["host_prior"]["n_pages_kept"],
        ),
    ]
    return pa.table(
        {
            "stage": pa.array([r[0] for r in rows], pa.string()),
            "rows_in": pa.array([r[1] for r in rows], pa.int64()),
            "rows_out": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_host_trustrank(sf_dir: str):
    """Driver entry (rows-only): PageRank vs TrustRank over the
    LINK-FARM variant of the linked corpus — interlinked spam hosts clear
    the inbound-mass PageRank gate but hold exactly 0 TrustRank (no
    in-path from the trusted seeds, the authority hosts). One row per
    host: both ranks and both gate decisions."""
    from pie_ray.functions.graphops import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE
    from pie_ray.sources.linksynth import AUTH_FRAC, n_hosts_for, synth_link_pages
    from pie_ray.stages.links import host_edges, host_pagerank, host_trustrank

    n = 1200
    n_hosts = n_hosts_for(n)
    seeds = [f"h{j}.example" for j in range(max(2, int(n_hosts * AUTH_FRAC)))]
    edges = host_edges(
        synth_link_pages(n, spam_interlink=True).materialize()
    ).materialize()
    pr = host_pagerank(edges)
    tr = host_trustrank(edges, seeds)
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    tr_map = dict(
        zip(tr.column("host").to_pylist(), tr.column("rank_scaled").to_pylist())
    )
    hosts = pr.column("host").to_pylist()
    prs = pr.column("rank_scaled").to_pylist()
    trs = [tr_map[h] for h in hosts]
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "pagerank_scaled": pa.array(prs, pa.int64()),
            "trustrank_scaled": pa.array(trs, pa.int64()),
            "kept_pagerank_gate": pa.array([r >= base + 1 for r in prs], pa.bool_()),
            "kept_trustrank_gate": pa.array([r >= 1 for r in trs], pa.bool_()),
        }
    )


def q_host_components(sf_dir: str):
    """Driver entry (rows-only): connected components of the (undirected)
    host link graph over the LINK-FARM corpus — the interlinked farm never
    exchanges links with the real web, so it separates as its own
    component, the community-level face of the TrustRank signal. Returns
    (host, component, is_farm_component)."""
    from pie_ray.functions.graphops import connected_components
    from pie_ray.sources.linksynth import SPAM_FRAC, n_hosts_for, synth_link_pages
    from pie_ray.stages.links import host_edges
    from pie_ray.util import gather_table

    n = 1200
    n_hosts = n_hosts_for(n)
    n_spam = max(2, int(n_hosts * SPAM_FRAC))
    spam = {f"h{j}.example" for j in range(n_hosts - n_spam, n_hosts)}
    edges = host_edges(
        synth_link_pages(n, spam_interlink=True).materialize()
    ).materialize()
    labels = connected_components(edges, src="src_host", dst="dst_host")
    tbl = gather_table(
        labels.materialize(),
        schema=pa.schema([("node", pa.string()), ("component", pa.string())]),
    ).sort_by([("node", "ascending")])
    hosts = tbl.column("node").to_pylist()
    return pa.table(
        {
            "host": tbl.column("node"),
            "component": tbl.column("component"),
            "is_farm_component": pa.array([h in spam for h in hosts], pa.bool_()),
        }
    )


def q_anchor_terms(sf_dir: str):
    """Driver entry (rows-only — anchor extraction over HTML is not
    SQL-expressible): top-3 anchor-text terms per destination host over
    the deterministic linked corpus — how the corpus names each site."""
    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.links import host_anchor_terms
    from pie_ray.util import gather_table

    tbl = gather_table(
        host_anchor_terms(synth_link_pages(1200), k=3),
        schema=pa.schema(
            [("host", pa.string()), ("term", pa.string()), ("n_links", pa.int64())]
        ),
    )
    return tbl.sort_by([("host", "ascending"), ("n_links", "descending"),
                        ("term", "ascending")])


def q_host_linkgraph(sf_dir: str):
    """Driver entry (rows-only — link extraction over HTML is not
    SQL-expressible): the weighted host link graph of the deterministic
    linked corpus, sorted for a stable row order."""
    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.links import host_edges
    from pie_ray.util import gather_table

    edges = host_edges(synth_link_pages(1200))
    tbl = gather_table(
        edges,
        schema=pa.schema(
            [
                ("src_host", pa.string()),
                ("dst_host", pa.string()),
                ("n_links", pa.int64()),
            ]
        ),
    )
    return tbl.sort_by([("src_host", "ascending"), ("dst_host", "ascending")])


# fixed entry corpus/seed set, shared verbatim with the DuckDB oracle
# (linksynth.crawl_radius_oracle_sql builds the SQL from the same values)
CRAWL_ENTRY_N = 1200
CRAWL_ENTRY_SEEDS = ["h0.example", "h30.example"]  # one authority, one mid


def q_host_crawl_radius(sf_dir: str):
    """Driver entry (FULL oracle parity): BFS crawl radius from a trusted
    seed-host pair over the deterministic linked corpus's host graph. The
    oracle states the GENERATOR's link plan as a literal VALUES edge table
    and recurses the same depth-capped BFS in SQL — so the comparison
    verifies HTML link extraction, the host rollup, and the size-adaptive
    BFS end to end against ground truth (the golden-twin pattern)."""
    from pie_ray.sources.linksynth import synth_link_pages
    from pie_ray.stages.links import host_crawl_radius, host_edges
    from pie_ray.util import gather_table

    edges = host_edges(synth_link_pages(CRAWL_ENTRY_N))
    res = host_crawl_radius(edges, CRAWL_ENTRY_SEEDS)
    tbl = gather_table(
        res, schema=pa.schema([("host", pa.string()), ("depth", pa.int64())])
    )
    return tbl.sort_by([("host", "ascending")])
