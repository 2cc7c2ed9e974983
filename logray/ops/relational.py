"""Relational operators expressed Ray-Data-first (SURVEY.md §2 C4–C7).

- ``broadcast_join``: small side shipped once (``ray.put`` when a Ray
  session exists, closure capture otherwise) and merged per batch with a
  vectorized pandas merge — no shuffle. This is the C4 lookup-join path;
  large-large joins would hash-bucket both sides (see ray_guide) but no
  pipeline here needs one.
- ``grouped_agg``: partial per-batch aggregation (combiner) then a small
  groupby().sum / min / max over the partials — the C5 pattern: the
  shuffle moves one row per key per batch, never raw rows.
- ``topk``: per-batch local top-k then a driver-side combine of
  blocks×k candidate rows (C6).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small: pd.DataFrame, on: str | list[str], *,
                   how: str = "inner", broadcast: bool = True):
    """Join a Dataset with a small pandas table by broadcasting the small side."""
    ref = None
    if broadcast:
        try:
            import ray

            if ray.is_initialized():
                ref = ray.put(small)
        except Exception:
            ref = None
    small_local = small if ref is None else None

    # Plain tasks, not an actor pool: the per-task ray.get(ref) is a
    # node-local shared-memory read of the already-broadcast small side
    # (cheap at any fan-out), while an actor pool would pay its spin-up on
    # every query — dominant for small/medium inputs.
    def joiner(batch: pd.DataFrame) -> pd.DataFrame:
        if ref is not None:
            import ray

            right = ray.get(ref)
        else:
            right = small_local
        return batch.merge(right, on=on, how=how)

    return ds.map_batches(joiner, batch_format="pandas")


_COMBINE = {"sum": "sum", "count": "sum", "count_all": "sum", "min": "min", "max": "max"}


def grouped_agg(ds, keys: Sequence[str], aggs: dict[str, tuple[str, str]]):
    """Grouped aggregation with partial-per-batch combine.

    ``aggs``: output_name -> (input_col, fn) with fn in
    {sum, count, min, max, mean}. ``count`` counts ROWS (SQL ``count(*)``
    semantics — Arrow's per-column count would silently skip nulls and
    diverge from the oracles); ``mean`` is computed from sum + non-null
    count partials so it matches SQL ``avg`` exactly. Returns a Dataset
    with columns ``keys + list(aggs)``.
    """
    keys = list(keys)
    means = {o: c for o, (c, f) in aggs.items() if f == "mean"}
    partial_specs: dict[str, tuple[str, str]] = {}
    for out, (col, fn) in aggs.items():
        if fn == "mean":
            partial_specs[f"__sum_{out}"] = (col, "sum")
            partial_specs[f"__cnt_{out}"] = (col, "count")
        elif fn == "count":
            partial_specs[out] = ("", "count_all")
        else:
            partial_specs[out] = (col, fn)

    def partial(batch: pa.Table) -> pa.Table:
        # aggregate each unique (col, fn) pair once, then alias per spec
        uniq = sorted({cf for cf in partial_specs.values()})
        gb = batch.group_by(keys).aggregate(
            [(([] if fn == "count_all" else col), fn) for col, fn in uniq])
        cols = {k: gb[k] for k in keys}
        for out, (col, fn) in partial_specs.items():
            cols[out] = gb["count_all" if fn == "count_all" else f"{col}_{fn}"]
        return pa.table(cols)

    from ray.data.aggregate import Max, Min, Sum

    combiners = []
    for out, (col, fn) in partial_specs.items():
        cls = {"sum": Sum, "count": Sum, "min": Min, "max": Max}[_COMBINE.get(fn, fn)]
        combiners.append(cls(out, alias_name=out))
    combined = ds.map_batches(partial, batch_format="pyarrow").groupby(keys).aggregate(*combiners)

    if means:
        def finish(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            for out in means:
                batch = batch.append_column(
                    out, pc.divide(pc.cast(batch[f"__sum_{out}"], pa.float64()),
                                   pc.cast(batch[f"__cnt_{out}"], pa.float64())))
            drop = [c for c in batch.column_names if c.startswith("__sum_") or c.startswith("__cnt_")]
            return batch.drop(drop)

        combined = combined.map_batches(finish, batch_format="pyarrow")
    return combined


def topk(ds, sort_cols: list[tuple[str, bool]], k: int) -> pd.DataFrame:
    """Global top-k: local top-k per batch, then combine candidates.

    ``sort_cols``: [(col, descending)]; include a unique tiebreak column
    last so results are deterministic. Returns a pandas DataFrame.
    """
    by = [c for c, _ in sort_cols]
    asc = [not d for _, d in sort_cols]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=asc).head(k)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return cand.sort_values(by, ascending=asc).head(k).reset_index(drop=True)


def distinct(ds, cols: list[str]):
    """Distinct rows over ``cols``: per-batch unique (combiner) then one
    vectorized drop_duplicates per co-located bucket — the shuffle sees
    only per-batch uniques, and Python overhead is O(num_buckets)."""
    from .window import _bucketed_apply

    def local(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    pre = ds.map_batches(local, batch_format="pyarrow")
    return _bucketed_apply(pre, cols[0],
                           lambda df: df.drop_duplicates(cols))


def keep_first(ds, keys: list[str], order_col: str):
    """Dedup: keep the row with min ``order_col`` per ``keys`` group (C7).

    Co-locates by a stable bucket of the first key (full-key groups never
    split across buckets) and runs one vectorized pandas kernel per
    bucket — O(num_buckets) Python overhead, not O(num_keys)."""
    from .window import _bucketed_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([*keys, order_col], kind="mergesort")
                  .groupby(keys, sort=False).head(1))

    return _bucketed_apply(ds, keys[0], per_bucket)
