"""E1 — the flagship KG-construction pipeline (SURVEY.md §3.1).

Stages (S1..S6), all streaming Ray Data:

  S1-S3      : read/gen -> lang-filtered extract -> NerTagger actor pool
               with FUSED triple emission + per-batch combine — ONE fused
               operator on the pool, zero shuffles (the exact dedup runs
               once, post-canonicalization, where it is mandatory anyway)
  S4 link    : per-batch-distinct person keys -> size-adaptive MinHash-LSH
               (driver-local below 2M distinct keys; bucketed band shuffle
               + hash-min connected components above) -> canon map
  S5 canon   : broadcast canon map (ray.put once), rewrite subj/obj,
               ONE global exact dedup (bucket shuffle #1)
  S6 graph   : edge aggregation (bucket shuffle #2 on src) -> adjacency
               built on the SAME exchange (no extra shuffle) ->
               partitioned parquet sink

Never calls ray.init — the session is owned by the caller; checkpointed /
resumable variant lives in pie_ray.pipelines.resume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass
class KgConfig:
    langs: tuple[str, ...] = ("en",)
    ner_batch_size: int = 256
    # autoscaling pool: min 1 actor so the stage can never reserve every CPU
    # and starve the upstream read/generate tasks on small sessions
    ner_concurrency: int | tuple[int, int] = (1, 4)
    bands: int = 64
    band_rows: int = 2
    tau: float = 0.35
    num_graph_parts: int = 64
    force_distributed_cc: bool = False
    # force A13's JOIN path (labels stay a Dataset; subj/obj rewritten via
    # two hash joins). Auto-engages past linking.CANON_BROADCAST_LIMIT
    # linked keys; the flag exists so tests can drive the path at any size.
    force_canon_join: bool = False
    # >0 on GPU clusters: each NER actor reserves this many GPUs and the
    # decode batches run on the accelerator (the numpy scorer is the CPU
    # fallback; the stage shape — actor pool, batched decode — is identical)
    ner_num_gpus: float = 0.0
    extra: dict = field(default_factory=dict)


def extract_stage(pages_ds, cfg: KgConfig):
    """S1: T0 -> T1 (lang-filtered inside the map so the whole
    read/gen -> extract -> NER chain fuses onto the NER actor pool)."""
    from pie_ray.stages.extract import extract_batch

    # langs=None/() disables the filter (e.g. WARC input has no lang column
    # at read time — lang-id runs downstream on the extracted text)
    return pages_ds.map_batches(
        extract_batch,
        fn_kwargs={"langs": tuple(cfg.langs) if cfg.langs else None},
        batch_format="pyarrow",
    )


def raw_triples_stage(extracted_ds, cfg: KgConfig):
    """S2+S3 fused: T1 -> batch-combined raw triples (pre-canonicalization).

    Only the per-batch combiner runs here — the ONE global (subj,pred,obj)
    dedup shuffle happens post-canonicalization in S5 (it must run there
    anyway, so a second global shuffle before linking would be pure cost;
    linking tolerates non-distinct keys by construction)."""
    from pie_ray.stages.ner import NerTagger

    kwargs = {}
    if cfg.ner_num_gpus:
        kwargs["num_gpus"] = cfg.ner_num_gpus
    return extracted_ds.map_batches(
        NerTagger,
        fn_constructor_kwargs={"emit": "triples"},
        batch_format="pyarrow",
        batch_size=cfg.ner_batch_size,
        concurrency=cfg.ner_concurrency,
        **kwargs,
    )


def link_stage(raw_triples_ds, cfg: KgConfig):
    """S4: canon labels from distinct person keys — ``("map", dict)`` in
    broadcast range, ``("ds", labels)`` past CANON_BROADCAST_LIMIT (or when
    cfg.force_canon_join drives the join path for tests)."""
    from pie_ray.stages.linking import build_canon_labels, distinct_person_keys

    keys = distinct_person_keys(raw_triples_ds)
    return build_canon_labels(
        keys,
        bands=cfg.bands,
        rows=cfg.band_rows,
        tau=cfg.tau,
        force_distributed=cfg.force_distributed_cc,
        force_join_path=cfg.force_canon_join,
    )


def canonicalize_stage(
    raw_triples_ds,
    canon_map: dict[str, str],
    cfg: KgConfig,
    num_buckets: int | None = None,
):
    """S5: rewrite through canon map (broadcast), re-dedup -> final T3.

    A plain-function task map (no actor pool): the vectorized rewrite has no
    per-actor state worth a pool, tasks reuse warm Ray workers (no spin-up
    serial cost), and nothing here can starve the dedup shuffle.
    ``num_buckets`` sizes the dedup exchange — build_triples derives it from
    the materialized raw-triple bytes (floor = the sandbox constant)."""
    import ray

    from pie_ray.stages.linking import canonicalize_batch, canonicalize_join
    from pie_ray.stages.triples import dedup_triples

    if isinstance(canon_map, tuple):
        kind, payload = canon_map
    else:  # plain dict — the original (and resume/incremental) call shape
        kind, payload = "map", canon_map
    if kind == "ds":
        # A13 join path: labels past broadcast range stay a Dataset;
        # barrier before the dedup exchange (two joins already ran)
        mapped = canonicalize_join(raw_triples_ds, payload).materialize()
    else:
        canon_ref = ray.put(payload)
        mapped = raw_triples_ds.map_batches(
            canonicalize_batch,
            fn_kwargs={"canon_ref": canon_ref},
            batch_format="pyarrow",
        )
    if num_buckets is None:
        return dedup_triples(mapped)
    return dedup_triples(mapped, num_buckets=num_buckets)


def graph_stage(triples_ds, cfg: KgConfig):
    """S6: T3 -> adjacency dataset (caller writes or consumes). Edge
    aggregation and adjacency build are fused into one src-bucketed
    exchange (src-completeness is structural, not a block-size bet). When
    the caller hands a MATERIALIZED triple set (run_pipeline does), the
    exchange's bucket count derives from its size."""
    from ray.data.dataset import MaterializedDataset

    from pie_ray.stages.graph import EDGE_BUCKETS, aggregate_edges_to_adjacency
    from pie_ray.util import bucket_count

    # size_bytes() would EXECUTE an unmaterialized plan — only consult it on
    # a MaterializedDataset (metadata, O(1)); otherwise keep the floor
    est = (
        triples_ds.size_bytes()
        if isinstance(triples_ds, MaterializedDataset)
        else None
    )
    return aggregate_edges_to_adjacency(
        triples_ds,
        cfg.num_graph_parts,
        num_buckets=bucket_count(est, floor=EDGE_BUCKETS),
    )


def build_triples(pages_ds, cfg: KgConfig | None = None):
    """pages -> final canonical triples Dataset (no I/O). The flagship path."""
    cfg = cfg or KgConfig()
    extracted = extract_stage(pages_ds, cfg)
    raw = raw_triples_stage(extracted, cfg).materialize()
    canon = link_stage(raw, cfg)
    from pie_ray.stages.triples import DEDUP_BUCKETS
    from pie_ray.util import bucket_count

    nb = bucket_count(raw.size_bytes(), floor=DEDUP_BUCKETS)
    return canonicalize_stage(raw, canon, cfg, num_buckets=nb)


def run_pipeline(pages_ds, out_dir: str, cfg: KgConfig | None = None) -> dict:
    """Full S1..S6 with parquet outputs under out_dir. Returns artifact paths
    and row counts. Resume-aware variant lives in pie_ray.pipelines.resume."""
    from pie_ray.stages.graph import write_graph

    cfg = cfg or KgConfig()
    triples = build_triples(pages_ds, cfg).materialize()
    triples_path = f"{out_dir}/triples"
    triples.write_parquet(triples_path)
    adj = graph_stage(triples, cfg)
    graph_path = f"{out_dir}/graph"
    write_graph(adj, graph_path, num_parts=cfg.num_graph_parts)
    return {
        "triples_path": triples_path,
        "graph_path": graph_path,
        "n_triples": triples.count(),
    }
