"""Enrich stage — stateful actor pool joining rows against broadcast lookups.

The reference has no enrich stage (single process, module-global tables);
the north rule mandates one: "a stateful actor-pool stage enriches rows
against broadcast lookup tables (role/tool dictionaries keyed by
conv_id-derived hash)" (BASELINE.json:6).

Pattern: the driver builds the small lookup dicts once and ``ray.put``s
them; each pool actor fetches the object refs ONCE in ``__init__`` (a
zero-copy shared-memory read on the same node), then ``__call__`` does a
vectorized dictionary-encode → map-uniques → take per batch. The small
side is never re-shipped per batch and never shuffled.

Lookup tables are frozen in FIXTURES.md §3:
- role_dict: role -> (role_code int32, role_group)
- tool_dict: 16 tools -> (tool_tier, tool_owner, cost_class int32);
  unknown tool -> tier 'unknown', never a dropped row
- conv_bucket: crc32(conv_id) % 64 -> bucket_label
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import map_via_dict, stable_bucket
from ..gen import TOOLS

ROLE_DICT: dict[str, tuple[int, str]] = {
    "user": (0, "human"),
    "assistant": (1, "model"),
    "system": (2, "control"),
    "tool": (3, "machine"),
}

TOOL_TIERS = ("free", "basic", "pro", "enterprise")


def build_tool_dict() -> dict[str, tuple[str, str, int]]:
    """tool -> (tool_tier, tool_owner, cost_class); deterministic attributes."""
    return {
        t: (TOOL_TIERS[i % 4], f"team{i % 5}", i % 3)
        for i, t in enumerate(TOOLS)
    }


CONV_BUCKETS = 64


def bucket_label(bucket: int) -> str:
    return f"b{bucket:02d}"


class Enricher:
    """Callable class for ``map_batches(Enricher, concurrency=(m,n), ...)``.

    ``lookups_ref`` is a ``ray.ObjectRef`` to ``(role_dict, tool_dict)``
    produced by ``ray.put`` on the driver; resolved once per actor. Passing
    ``None`` builds the frozen FIXTURES.md tables locally (tests, oracle
    comparisons) without needing a Ray session.
    """

    def __init__(self, lookups_ref=None):
        if lookups_ref is not None:
            import ray

            role_dict, tool_dict = ray.get(lookups_ref)
        else:
            role_dict, tool_dict = ROLE_DICT, build_tool_dict()
        self.role_code = {k: v[0] for k, v in role_dict.items()}
        self.role_group = {k: v[1] for k, v in role_dict.items()}
        self.tool_tier = {k: v[0] for k, v in tool_dict.items()}
        self.cost_class = {k: v[2] for k, v in tool_dict.items()}
        self.labels = pa.array([bucket_label(b) for b in range(CONV_BUCKETS)], pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        role = batch["role"]
        tool = batch["tool"]
        buckets = stable_bucket(batch["conv_id"], CONV_BUCKETS)
        batch = batch.append_column("role_code", map_via_dict(role, self.role_code, None, pa.int32()))
        batch = batch.append_column("role_group", map_via_dict(role, self.role_group, "unknown", pa.string()))
        batch = batch.append_column("tool_tier", map_via_dict(tool, self.tool_tier, "unknown", pa.string()))
        batch = batch.append_column("cost_class", map_via_dict(tool, self.cost_class, None, pa.int32()))
        batch = batch.append_column("conv_bucket", buckets)
        batch = batch.append_column("bucket_label", self.labels.take(buckets))
        return batch
