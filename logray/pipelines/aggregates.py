"""Aggregation strategies (M4) — partial-then-combine, salted for skew.

The only all-to-all shuffle in the flagship DAG. Two exact strategies:

- ``sink_rule_counts``: per-batch partial counts inside ``map_batches``
  (one row per key per batch) then a tiny ``groupby().sum()`` — the
  combiner pattern; the shuffle moves partials, never raw rows.
- ``salted_group_counts``: per-conversation counts where one hot key
  (FIXTURES.md: hot conversations have 50× turns) would otherwise land
  on a single reducer: rows are first grouped by
  ``(key, _salt = turn_idx % S)`` so a hot key's rows spread across S
  reducers, then the salt is dropped and partials re-combined — exact
  counts, bounded per-reducer load (BASELINE.json:6 skew mandate).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _partial_counts(cols: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(cols).aggregate([(cols[0], "count")])
        agg = agg.rename_columns([("n" if c == f"{cols[0]}_count" else c) for c in agg.column_names])
        return agg.select(cols + ["n"])
    return fn


def sink_rule_counts(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-(sink, rule_id) counts via partial per-batch aggregation."""
    partials = parsed.map_batches(_partial_counts(["sink", "rule_id"]), batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return partials.groupby(["sink", "rule_id"]).aggregate(Sum("n", alias_name="n"))


def salted_group_counts(ds: "ray.data.Dataset", key: str, salt: int = 8,
                        salt_source: str = "turn_idx") -> "ray.data.Dataset":
    """Exact per-``key`` row counts with two-phase salted combine.

    Phase 1 groups by ``(key, salt)`` so a skewed key fans out over
    ``salt`` reducers; phase 2 drops the salt and sums the partials.
    ``salt_source`` must be an integer column with within-key variation
    (``turn_idx`` for transcripts) so the fan-out is deterministic.
    """
    import pyarrow.compute as pc

    if salt & (salt - 1):
        raise ValueError("salt must be a power of two")

    def add_salt(batch: pa.Table) -> pa.Table:
        s = pc.cast(pc.bit_wise_and(pc.cast(batch[salt_source], pa.int64()), salt - 1), pa.int32())
        # pre-aggregate within the batch: one row per (key, salt)
        t = batch.append_column("_salt", s)
        agg = t.group_by([key, "_salt"]).aggregate([(key, "count")])
        agg = agg.rename_columns([("n" if c == f"{key}_count" else c) for c in agg.column_names])
        return agg.select([key, "_salt", "n"])

    from ray.data.aggregate import Sum

    partials = ds.map_batches(add_salt, batch_format="pyarrow")
    salted = partials.groupby([key, "_salt"]).aggregate(Sum("n", alias_name="n"))
    return (salted
            .map_batches(lambda t: t.drop(["_salt"]), batch_format="pyarrow")
            .groupby(key).aggregate(Sum("n", alias_name="n")))
