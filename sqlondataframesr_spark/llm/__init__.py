"""LLM-training-data pipeline operators (north-star extension; not
reference-derived — BASELINE.json:6): deduplication, similarity
search, text analysis, multimodal column plumbing. All built on the
``documents`` / ``embeddings`` synthetic tables and designed
partition-first for 100 TB corpora."""
