"""End-to-end pipelines (linkage, dedup, text analysis, similarity, …)."""
