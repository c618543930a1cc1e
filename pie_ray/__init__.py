"""pie_ray — Ray-Data-native privacy-knowledge-graph construction engine.

A brand-new engine (not a port) with the capabilities of the reference
privacy-KG system (rayliutoronto/PIE; reference checkout empty this build —
see SURVEY.md §0): a streaming ``ray.data.Dataset`` pipeline that reads
Parquet tables of Common-Crawl-style web pages ``(url, warc_ts, html, text,
lang)``, extracts text with a deterministic boilerplate stripper
(byte-identical per url), runs batched PII NER on stateful actor pools over
zero-copy Arrow batches, emits deduplicated ``(subj, pred, obj)`` triples,
links/canonicalizes entities via MinHash-LSH + union-find connected
components (salted-key skew handling), and materializes adjacency-list graph
partitions to Parquet with per-partition lineage manifests and
checkpoint-resume.

Library code never calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
