"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. All are map_batches-first; shuffles only
where a groupby is semantically required (LSH buckets, dedup groups)."""
