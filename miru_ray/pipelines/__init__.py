"""End-to-end pipelines: index build, BM25 query, operator family."""
