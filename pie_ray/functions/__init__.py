"""Generic operator surface: relational wrappers (DuckDB-oracled), text
analysis, dedup families, similarity search, multimodal plumbing."""

from pie_ray.functions import dedup, multimodal, relational, similarity, temporal, textops

__all__ = ["dedup", "multimodal", "relational", "similarity", "temporal", "textops"]
