"""End-to-end pipelines (parse → enrich → route → aggregate)."""
