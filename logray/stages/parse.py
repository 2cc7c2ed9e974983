"""Parse stage — the vectorized RuleSet executed inside ``map_batches``.

Stateless-task form (``parse_batch_fn``): the compiled RuleSet is cached
per worker process (module global), so regex compilation happens once per
worker, not per batch — the task-pool analogue of actor ``__init__`` state.

Use ``batch_format='pyarrow', zero_copy_batch=True`` so the text column is
read zero-copy from the object store (BASELINE.json:6).
"""

from __future__ import annotations

import pyarrow as pa

from ..ruleset import RuleSet
from ..rules_transcripts import transcript_ruleset

_CACHED: RuleSet | None = None


def _ruleset() -> RuleSet:
    global _CACHED
    if _CACHED is None:
        _CACHED = transcript_ruleset()
    return _CACHED


def parse_batch_fn(batch: pa.Table, extra_cols: tuple[str, ...] = ()) -> pa.Table:
    """map_batches body: transcript batch -> parsed/classified/routed batch.
    ``extra_cols`` ride through unchanged (e.g. a partition/lineage tag)."""
    return _ruleset().parse_batch(batch, extra_cols=extra_cols)


class ParseStage:
    """Actor-pool form of the parse stage (compile once per actor in
    ``__init__``); equivalent semantics to ``parse_batch_fn``. Useful when a
    custom (non-default) ruleset must be shipped to workers once."""

    def __init__(self, ruleset: RuleSet | None = None):
        self.ruleset = ruleset if ruleset is not None else transcript_ruleset()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.ruleset.parse_batch(batch)
