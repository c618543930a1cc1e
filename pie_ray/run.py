"""E1 — the job entry point (SURVEY.md §3.1):

    ray job submit -- python -m pie_ray.run \
        --input /data/pages_parquet --output /data/kg_out \
        --langs en --num-parts 256 --resume

or, for a synthetic corpus (deterministic, ground truth by construction):

    python -m pie_ray.run --synth 100000 --output /tmp/kg_out

Owns the Ray session (the ONLY library-adjacent place that does, besides
bench.py and the test fixture): inits local when standalone, attaches to the
cluster under `ray job submit` (RAY_ADDRESS set by the job runner).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pie_ray.run", description="KG-construction pipeline")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="Parquet dir/file of T0 pages (url, warc_ts, html, text, lang)")
    src.add_argument("--synth", type=int, metavar="N", help="synthesize N pages instead")
    src.add_argument(
        "--compact",
        action="store_true",
        help="maintenance: merge accumulated --ingest delta dirs under "
        "--output into one delta each (no new pages processed)",
    )
    src.add_argument(
        "--changes",
        nargs=2,
        type=int,
        metavar=("FROM", "TO"),
        help="time-travel change feed over an --ingest store: print the "
        "added/removed fact counts between two increments and write the "
        "diff to <output>/changes_FROM_TO (no build runs)",
    )
    src.add_argument(
        "--forget-urls",
        metavar="FILE",
        help="erasure (GDPR): newline-separated urls to remove from an "
        "--ingest store under --output — raw triples, ledger rows, link "
        "deltas and time-travel history all rewrite, then the derived "
        "caches rebuild (no new pages processed). Link-delta stores also "
        "need --forget-pages",
    )
    src.add_argument(
        "--forget-person",
        metavar="KEY",
        help="erasure (GDPR): remove one person entity's canonical "
        "component (all linked subject keys + co-mention edges) from an "
        "--ingest store under --output; the pages' other facts survive",
    )
    p.add_argument(
        "--forget-pages",
        metavar="PATH",
        help="T0 pages parquet covering the affected increments' surviving "
        "pages — required by --forget-urls on a link-delta store (counted "
        "host-edge aggregates rebuild from the pages)",
    )
    p.add_argument("--output", required=True, help="output root (triples/, graph/, _manifests/)")
    p.add_argument(
        "--langs",
        default="en",
        help="comma-separated language allowlist ('' = no filter, e.g. for WARC)",
    )
    p.add_argument(
        "--input-format",
        choices=["parquet", "warc"],
        default="parquet",
        help="input layout; *.warc / *.warc.gz paths auto-detect",
    )
    p.add_argument("--num-parts", type=int, default=16, help="NER resume partitions")
    p.add_argument("--graph-parts", type=int, default=64, help="graph sink partitions")
    p.add_argument("--ner-batch-size", type=int, default=256)
    p.add_argument("--ner-actors", type=int, default=0, help="max NER actors (0 = auto)")
    p.add_argument("--resume", action="store_true", help="skip partitions already done")
    p.add_argument("--tau", type=float, default=0.35, help="linking Jaccard threshold")
    p.add_argument(
        "--ingest",
        action="store_true",
        help="incremental mode: first run builds + leaves a url ledger; later "
        "runs NER only never-seen pages and rebuild triples/graph "
        "(pipelines/incremental.py). Mutually exclusive with --resume.",
    )
    p.add_argument(
        "--fpp", type=float, default=1e-3, help="ingest Bloom false-positive rate"
    )
    p.add_argument(
        "--neardup",
        action="store_true",
        help="with --ingest on a FIRST run: also maintain a persisted "
        "MinHash-LSH content index so every later ingest drops pages whose "
        "extracted text near-dups the corpus (or a kept same-crawl twin) "
        "BEFORE NER. Sticky: later updates consult the store meta.",
    )
    p.add_argument(
        "--profiles",
        action="store_true",
        help="also write per-entity profiles (fact/predicate/provenance "
        "breadth, first/last seen) to <output>/profiles",
    )
    p.add_argument(
        "--linkgraph",
        action="store_true",
        help="also extract the host-level link graph from the input pages "
        "and write <output>/linkgraph (src_host, dst_host, n_links) plus "
        "<output>/hostrank (host, rank_scaled — integer-exact weighted "
        "PageRank, the domain-quality prior) plus <output>/anchors "
        "(host, term, n_links — top anchor-text terms per destination)",
    )
    p.add_argument(
        "--curate-web",
        action="store_true",
        help="run the SOURCE-side curation recipe instead of the KG "
        "pipeline: URL dedup -> extract -> page-structure gate -> host "
        "PageRank prior (TrustRank when --trust-seeds is given); writes "
        "curated (url, warc_ts, text, lang) docs to <output>/curated and "
        "prints the per-stage report",
    )
    p.add_argument(
        "--blocklist",
        metavar="FILE",
        help="newline-separated banned words for --curate-web's C4-style "
        "text cut (stage 3b; off when absent)",
    )
    p.add_argument(
        "--structured",
        action="store_true",
        help="extract structured data instead of running the KG pipeline: "
        "write <output>/tables (long-form <table> cells), "
        "<output>/table_facts (WebTables header-row facts) and "
        "<output>/jsonld (flattened ld+json facts) from the input pages",
    )
    p.add_argument(
        "--trust-seeds",
        type=str,
        default=None,
        help="comma-separated trusted hosts for the --curate-web prior "
        "(switches host PageRank to TrustRank; link farms fall to 0)",
    )
    return p


def _write_profiles(triples_path: str, out_root: str) -> dict:
    """Entity profiles parquet next to the triples (one subj-bucketed
    exchange over the just-written canonical set; list column flattened to
    a joined string for plain-parquet consumers)."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pie_ray.stages.entity_profile import entity_profiles

    triples = ray.data.read_parquet(triples_path)
    prof = entity_profiles(triples.materialize())

    def flatten(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sample_urls"),
            "sample_urls",
            pc.binary_join(t.column("sample_urls"), "|"),
        )

    out = f"{out_root}/profiles"
    shutil.rmtree(out, ignore_errors=True)
    flat = prof.map_batches(flatten, batch_format="pyarrow").materialize()
    flat.write_parquet(out)
    return {"profiles_path": out, "n_entities": flat.count()}


def _write_linkgraph(pages_ds, out_root: str) -> dict:
    """Host link graph + host PageRank + anchor-term top-k next to the KG
    output (two extra passes over the input pages; the html column never
    leaves either map)."""
    import shutil

    import ray.data

    from pie_ray.stages.links import host_anchor_terms, host_edges, host_pagerank

    # NOT materialized: the input re-executes per pass, but pinning every
    # html payload in the object store for the duration of two passes is
    # the worse trade at corpus scale (the stream-html rule)
    edges = host_edges(pages_ds).materialize()
    out_e = f"{out_root}/linkgraph"
    shutil.rmtree(out_e, ignore_errors=True)
    edges.write_parquet(out_e)
    n_edges = edges.count()
    report = {"linkgraph_path": out_e, "n_host_edges": n_edges}
    if n_edges:
        ranks = host_pagerank(edges)  # pa.Table on either id path
        out_r = f"{out_root}/hostrank"
        shutil.rmtree(out_r, ignore_errors=True)
        ray.data.from_arrow(ranks).write_parquet(out_r)
        report.update({"hostrank_path": out_r, "n_hosts": ranks.num_rows})
        anchors = host_anchor_terms(pages_ds).materialize()
        out_a = f"{out_root}/anchors"
        shutil.rmtree(out_a, ignore_errors=True)
        anchors.write_parquet(out_a)
        report.update(
            {"anchors_path": out_a, "n_anchor_terms": anchors.count()}
        )
    return report


def _write_linkgraph_from_deltas(root: str) -> dict:
    """--ingest twin of _write_linkgraph: the graph re-aggregates from the
    per-increment edge partials (cost tracks deltas, never the corpus);
    hostrank recomputes over the aggregated edges. Anchor terms need the
    page payloads, so they are a full-mode-only output."""
    import shutil

    import ray.data

    from pie_ray.pipelines.incremental import linkgraph_from_deltas
    from pie_ray.stages.links import host_pagerank

    edges = linkgraph_from_deltas(root)
    if edges is None:
        return {"n_host_edges": 0}
    edges = edges.materialize()
    out_e = f"{root}/linkgraph"
    shutil.rmtree(out_e, ignore_errors=True)
    edges.write_parquet(out_e)
    n_edges = edges.count()
    report = {"linkgraph_path": out_e, "n_host_edges": n_edges}
    if n_edges:
        ranks = host_pagerank(edges)
        out_r = f"{root}/hostrank"
        shutil.rmtree(out_r, ignore_errors=True)
        ray.data.from_arrow(ranks).write_parquet(out_r)
        report.update({"hostrank_path": out_r, "n_hosts": ranks.num_rows})
    return report


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    from pie_ray.util import tune_data_context

    if args.compact:
        import json as _json

        from pie_ray.pipelines.incremental import compact_deltas

        tune_data_context()
        stats = compact_deltas(args.output)
        print(_json.dumps(stats, indent=1))
        ray.shutdown()
        return 0

    tune_data_context()

    from pie_ray.pipelines.kg import KgConfig

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    max_actors = args.ner_actors or max(2, n_cpus - 2)
    # ONE config for every branch: an as-of re-link under different
    # linking params (tau) than the store was built with would produce a
    # different canonicalization than the store ever served
    cfg = KgConfig(
        langs=tuple(s for s in args.langs.split(",") if s),
        ner_batch_size=args.ner_batch_size,
        ner_concurrency=(1, max_actors),
        tau=args.tau,
        num_graph_parts=args.graph_parts,
    )

    if args.forget_urls or args.forget_person:
        import json as _json

        from pie_ray.pipelines.incremental import forget_person, forget_urls

        if args.forget_urls:
            with open(args.forget_urls) as f:
                urls = [ln.strip() for ln in f if ln.strip()]
            pages = (
                ray.data.read_parquet(args.forget_pages)
                if args.forget_pages
                else None
            )
            rep = forget_urls(args.output, urls, cfg, pages_ds=pages)
        else:
            rep = forget_person(args.output, args.forget_person, cfg)
        print(_json.dumps(rep, indent=1))
        ray.shutdown()
        return 0

    if args.changes:
        import json as _json
        import shutil

        from pie_ray.pipelines.incremental import kg_changes, list_increments

        k_from, k_to = args.changes
        diff = kg_changes(args.output, k_from, k_to, cfg).materialize()
        out = f"{args.output}/changes_{k_from}_{k_to}"
        shutil.rmtree(out, ignore_errors=True)
        diff.write_parquet(out)
        n_added = diff.filter(expr="change == 'added'").count()
        print(
            _json.dumps(
                {
                    "increments": list_increments(args.output),
                    "from": k_from,
                    "to": k_to,
                    "added": n_added,
                    "removed": diff.count() - n_added,
                    "changes_path": out,
                },
                indent=1,
            )
        )
        ray.shutdown()
        return 0

    from pie_ray.pipelines.resume import run_resumable

    if args.synth is not None:
        from pie_ray.sources.synth import synth_pages, synth_pages_for_parts

        n = args.synth
        corpus_id = f"synth:{n}"
        nblocks = max(8, n_cpus * 2)

        def factory(parts=None):
            if parts is None:
                return synth_pages(n, override_num_blocks=nblocks)
            # resume round: generate only the todo partitions' pages
            return synth_pages_for_parts(
                n, parts, args.num_parts, override_num_blocks=nblocks
            )

    elif args.input and (
        args.input.endswith((".warc", ".warc.gz")) or args.input_format == "warc"
    ):
        path = args.input
        corpus_id = f"warc:{path}"

        def factory(parts=None):
            from pie_ray.sources.warc import read_warc

            # WARC carries no lang column (emitted ''): the lang filter
            # cannot push down; extract runs with langs=None and lang-id
            # happens downstream. Resume rounds prune by the standard
            # url-hash rule AFTER the parse (record-level pruning; file-
            # level pruning is not possible inside an archive).
            ds = read_warc(path)
            if parts is None:
                return ds

            import numpy as np
            import pyarrow as pa

            from pie_ray.util import hash64_array

            want = np.array(sorted(parts), dtype=np.uint64)

            def keep_parts(t: pa.Table) -> pa.Table:
                pr = hash64_array(
                    t.column("url").to_pylist(), salt=b"part"
                ) % args.num_parts
                return t.filter(pa.array(np.isin(pr, want)))

            return ds.map_batches(keep_parts, batch_format="pyarrow")

    else:
        path = args.input
        corpus_id = f"parquet:{path}"

        def factory(parts=None):
            from pie_ray.sources.pages import read_pages, read_pages_parts

            # lang predicate pushed to the scan; extract re-filters (cheap)
            if parts is None:
                return read_pages(path, langs=cfg.langs)
            return read_pages_parts(path, parts, args.num_parts, langs=cfg.langs)

    if args.structured:
        import shutil

        from pie_ray.stages.tables import (
            extract_facts_batch,
            extract_jsonld_batch,
            extract_tables_batch,
        )

        t0 = time.perf_counter()
        pages = factory(None).materialize()
        report = {"n_pages": pages.count()}
        for name, fn in (
            ("tables", extract_tables_batch),
            ("table_facts", extract_facts_batch),
            ("jsonld", extract_jsonld_batch),
        ):
            out = f"{args.output}/{name}"
            shutil.rmtree(out, ignore_errors=True)
            res = pages.map_batches(fn, batch_format="pyarrow").materialize()
            res.write_parquet(out)
            report[name] = {"rows": res.count(), "path": out}
        report["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(report, indent=1))
        ray.shutdown()
        return 0

    if args.curate_web:
        if args.resume or args.ingest:
            print("--curate-web runs standalone; drop --resume/--ingest",
                  file=sys.stderr)
            return 2
        import shutil

        from pie_ray.pipelines.curation import curate_web_v1

        seeds = (
            [h.strip() for h in args.trust_seeds.split(",") if h.strip()]
            if args.trust_seeds
            else None
        )
        words = None
        if args.blocklist:
            with open(args.blocklist) as f:
                words = [w.strip() for w in f if w.strip()]
        t0 = time.perf_counter()
        docs, report = curate_web_v1(factory(None), seed_hosts=seeds,
                                     blocklist=words)
        out = f"{args.output}/curated"
        shutil.rmtree(out, ignore_errors=True)
        docs.write_parquet(out)
        report["curated_path"] = out
        report["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(report, indent=1))
        ray.shutdown()
        return 0

    if args.ingest:
        if args.resume:
            print("--ingest manages its own state; drop --resume", file=sys.stderr)
            return 2
        import os

        from pie_ray.pipelines.incremental import (
            META_NAME,
            incremental_build,
            incremental_update,
        )

        t0 = time.perf_counter()
        if os.path.exists(os.path.join(args.output, META_NAME)):
            report = incremental_update(
                args.output, factory(None), cfg, fpp=args.fpp,
                link_deltas=args.linkgraph,
            )
        else:
            report = incremental_build(
                factory(None), args.output, cfg, link_deltas=args.linkgraph,
                near_dup=args.neardup,
            )
        if args.profiles:
            report.update(_write_profiles(report["triples_path"], args.output))
        if args.linkgraph:
            report.update(_write_linkgraph_from_deltas(args.output))
        report["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(report, indent=1))
        ray.shutdown()
        return 0

    if not args.resume:
        # fresh run: wipe manifests AND their outputs together — stale
        # part dirs under raw_triples/ or mentions/ must not survive a
        # manifest wipe (they would read as dead-but-present output)
        import shutil

        for sub in ("_manifests", "raw_triples", "mentions"):
            shutil.rmtree(f"{args.output}/{sub}", ignore_errors=True)

    t0 = time.perf_counter()
    report = run_resumable(factory, args.output, cfg, num_parts=args.num_parts, corpus_id=corpus_id)
    if args.profiles:
        report.update(_write_profiles(report["triples_path"], args.output))
    if args.linkgraph:
        report.update(_write_linkgraph(factory(None), args.output))
    report["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report, indent=1))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
