"""Windowed / ordered operators (SURVEY.md §2 C6/C9 extensions).

The reference has no window functions (its only ordered semantics is
continuation folding, see ``logray.stages.fold``); these are the
graft-mandated custom operators a Ray-Data-native engine needs where the
Dataset API has no primitive: sessionization, per-group top-n
(row_number), running sums, lag/gap, and as-of joins.

Execution pattern (scale-critical): every operator co-locates its
partition key via ONE stable-hash bucket groupby, then runs a
**vectorized pandas kernel over the whole bucket** (pandas groupby /
merge_asof inside the group fn). Python-level call overhead is
O(num_buckets), never O(num_keys) — at 10^9 users the per-key map_groups
pattern would make the executor the bottleneck.

Ordering contract: kernels sort by (key, order_cols) internally with a
unique tie-break column so results are deterministic and match the SQL
oracles' ``ORDER BY`` exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_bucket


def default_num_buckets(multiplier: int = 4, lo: int = 16, hi: int = 4096) -> int:
    """Shuffle width for bucketed ops, derived from the cluster: total
    CPU cores × ``multiplier`` (clamped). A fixed constant either caps
    parallelism on a wide cluster or over-fragments a small one; deriving
    it from ``ray.cluster_resources()`` scales the all-to-all width with
    the machine the job actually runs on."""
    cores = 8
    try:
        import ray

        if ray.is_initialized():
            cores = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    return max(lo, min(hi, cores * multiplier))


def _int_bucket(col, num_buckets: int) -> pa.Array:
    """Stable bucket of an integer key column. Nulls are filled to 0 INSIDE
    Arrow before ``to_numpy`` — a null otherwise widens the whole array to
    float64 and the NaN→int64 cast is undefined (the same class of bug as
    the round-1 stable_hash64 advisory); null keys co-locate with key 0,
    which is harmless because every bucket kernel is per-key downstream."""
    import pyarrow.compute as pc

    typ = col.type
    if pa.types.is_floating(typ):
        # floats can't cast losslessly — bucket on the stable bit-view hash
        from ..functions.hashing import stable_hash64

        v = stable_hash64(col)
    else:
        filled = pc.fill_null(pc.cast(col, pa.int64()), 0)
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
        v = filled.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return pa.array(((v * np.int64(2654435761)) % num_buckets).astype(np.int32))


def _bucketed_apply(ds, key: str, fn, *, num_buckets: int | None = None):
    """groupby(stable bucket of ``key``) → vectorized pandas fn per bucket.
    ``num_buckets=None`` → cluster-derived via ``default_num_buckets``."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if pa.types.is_string(batch.schema.field(key).type):
            b = stable_bucket(col, num_buckets)
        else:
            b = _int_bucket(col, num_buckets)
        return batch.append_column("__bucket", b)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns="__bucket"))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(run, batch_format="pandas"))


def session_counts(ds, key: str, ts_col: str, gap_s: float, *,
                   num_buckets: int | None = None, out_col: str = "n_sessions"):
    """Per-key session count with gap-based session breaks: a new session
    starts when the time since the key's previous event exceeds ``gap_s``.
    Equivalent SQL: 1 + count of lag-gaps > gap_s per key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        g = df.groupby(key, sort=False)
        gap = (df[ts_col] - g[ts_col].shift()).dt.total_seconds()
        breaks = (gap > gap_s).groupby(df[key], sort=False).sum()
        out = (breaks + 1).astype("int64").rename(out_col).reset_index()
        return out

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def grouped_topn(ds, part_col: str, order_cols: list[tuple[str, bool]], n: int, *,
                 num_buckets: int | None = None, rank_col: str = "rn"):
    """row_number() OVER (PARTITION BY part_col ORDER BY order_cols) <= n.

    ``order_cols``: [(col, descending)]; include a unique tie-break last.
    """
    by = [c for c, _ in order_cols]
    asc = [not d for _, d in order_cols]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([part_col] + by, ascending=[True] + asc, kind="mergesort")
        df[rank_col] = df.groupby(part_col, sort=False).cumcount() + 1
        return df[df[rank_col] <= n]

    return _bucketed_apply(ds, part_col, per_bucket, num_buckets=num_buckets)


def running_sum(ds, key: str, order_cols: list[str], val_col: str, *,
                num_buckets: int | None = None, out_col: str = "running_value"):
    """sum(val) OVER (PARTITION BY key ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING) — sequential within-key accumulation, deterministic order."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        df[out_col] = df.groupby(key, sort=False)[val_col].cumsum()
        return df

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def lag_gap(ds, key: str, ts_col: str, order_cols: list[str], *,
            num_buckets: int | None = None, out_col: str = "gap_s"):
    """Seconds since the key's previous event (lag); null for the first."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        df[out_col] = (df[ts_col] - df.groupby(key, sort=False)[ts_col].shift()
                       ).dt.total_seconds()
        return df

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def rolling_mean(ds, key: str, order_cols: list[str], val_col: str, window: int, *,
                 num_buckets: int | None = None, out_col: str = "rolling_mean"):
    """avg(val) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW) — a per-key moving average.

    Computed as rolling-sum / rolling-count (not pandas ``.mean()``) so
    the division matches SQL ``sum/count`` bit-for-bit when ``val_col``
    holds exact integers (see queries: cent-scaled values).
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        g = df.groupby(key, sort=False)[val_col]
        s = g.rolling(window, min_periods=1).sum().reset_index(drop=True)
        c = g.rolling(window, min_periods=1).count().reset_index(drop=True)
        out = df.reset_index(drop=True)
        out[out_col] = s.to_numpy() / c.to_numpy()
        return out

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def dense_rank(ds, part_col: str, order_col: str, *, descending: bool = True,
               num_buckets: int | None = None, rank_col: str = "rnk"):
    """dense_rank() OVER (PARTITION BY part_col ORDER BY order_col) —
    equal values share a rank with no gaps after ties."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[rank_col] = (df.groupby(part_col, sort=False)[order_col]
                        .rank(method="dense", ascending=not descending)
                        .astype("int64"))
        return df

    return _bucketed_apply(ds, part_col, per_bucket, num_buckets=num_buckets)


def lead_col(ds, key: str, order_cols: list[str], val_col: str, *,
             num_buckets: int | None = None, out_col: str = "next_value"):
    """lead(val) OVER (PARTITION BY key ORDER BY order_cols) — the value of
    the key's NEXT row in order; null for the last row of each key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        df[out_col] = df.groupby(key, sort=False)[val_col].shift(-1)
        return df

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def _sql_ntile(n: int, k: int) -> np.ndarray:
    """Exact SQL NTILE(k) tile numbers for n ordered rows (1-based): the
    first n % k tiles get ceil(n/k) rows, the rest floor(n/k)."""
    big, rem = divmod(n, k)
    idx = np.arange(n, dtype=np.int64)
    cut = rem * (big + 1)
    tile = np.where(idx < cut,
                    idx // max(big + 1, 1),
                    rem + (idx - cut) // max(big, 1))
    return tile + 1


def ntile(ds, part_col: str, order_cols: list[tuple[str, bool]], k: int, *,
          num_buckets: int | None = None, out_col: str = "tile"):
    """ntile(k) OVER (PARTITION BY part_col ORDER BY order_cols) with exact
    SQL tile-size semantics (first n%k tiles one row larger).

    ``order_cols``: [(col, descending)]; include a unique tie-break last so
    the assignment is deterministic and matches the SQL oracle."""
    by = [c for c, _ in order_cols]
    asc = [not d for _, d in order_cols]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([part_col] + by, ascending=[True] + asc,
                            kind="mergesort").reset_index(drop=True)
        sizes = df.groupby(part_col, sort=False).size().to_numpy()
        df[out_col] = np.concatenate([_sql_ntile(int(n), k) for n in sizes]) \
            if len(sizes) else np.array([], dtype=np.int64)
        return df

    return _bucketed_apply(ds, part_col, per_bucket, num_buckets=num_buckets)


def _asof_tol_int(tolerance, on_type):
    """Normalize a tolerance to the units ``on`` is cast to inside the
    as-of kernel: timestamps cast to int64 in their own unit, so a
    pd.Timedelta converts via its ns value; numeric columns take the
    tolerance as given."""
    if tolerance is None:
        return None
    if pa.types.is_timestamp(on_type):
        import pandas as pd

        ns = pd.Timedelta(tolerance).value
        div = {"s": 1_000_000_000, "ms": 1_000_000,
               "us": 1_000, "ns": 1}[on_type.unit]
        return ns // div
    return tolerance


def _asof_bucket_kernel(t: pa.Table, *, by: str, on: str,
                        left_cols: list[str], right_vals: list[str],
                        out_fields, empty: pa.Table, direction: str,
                        tol=None) -> pa.Table:
    """Pure Arrow/numpy as-of kernel over a side-tagged bucket table
    (r4, shared by broadcast and distributed variants in r5): one
    np.lexsort over (by-code, on, right-before-left) interleaves both
    sides, a maximum.accumulate carries the LAST right position
    forward, a code-equality check invalidates carries across key
    boundaries, and an optional tolerance invalidates matches farther
    than ``tol`` on the (unit-cast) ``on`` axis — O(n log n) with zero
    per-row Python and no pandas frame materialization."""
    side = t["__side"]
    if isinstance(side, pa.ChunkedArray):
        side = side.combine_chunks()
    sid = side.to_numpy(zero_copy_only=False)
    n_left = int((sid == 0).sum())
    if n_left == 0:
        return empty
    byv = t[by].combine_chunks() if isinstance(t[by], pa.ChunkedArray) \
        else t[by]
    code = byv.to_numpy(zero_copy_only=False)
    if code.dtype == object:  # string keys: factorize for fast sort
        code = np.unique(code, return_inverse=True)[1]
    onv = t[on]
    on_type = t.schema.field(on).type
    if pa.types.is_timestamp(on_type) or pa.types.is_date(on_type):
        onv = pc.cast(onv, pa.int64())
    ov = np.asarray(onv.combine_chunks().to_numpy(zero_copy_only=False)
                    if isinstance(onv, pa.ChunkedArray)
                    else onv.to_numpy(zero_copy_only=False))
    if direction == "forward":
        ov = -ov  # forward = backward on the reversed time axis
    elif direction != "backward":
        raise ValueError(f"unsupported direction {direction!r}")
    # rights sort BEFORE lefts at equal (code, on) → inclusive match
    perm = np.lexsort((1 - sid, ov, code))
    sid_s = sid[perm]
    code_s = code[perm]
    is_r = sid_s == 1
    carry = np.where(is_r, np.arange(len(perm)), -1)
    np.maximum.accumulate(carry, out=carry)
    lpos = np.flatnonzero(~is_r)
    match = carry[lpos]
    valid = (match >= 0) & (code_s[np.maximum(match, 0)] == code_s[lpos])
    if tol is not None:
        ov_s = ov[perm]
        dist = ov_s[lpos] - ov_s[np.maximum(match, 0)]
        valid &= dist <= tol
    orig_left = perm[lpos]
    orig_right = perm[np.maximum(match, 0)]
    l_idx = pa.array(orig_left, pa.int64())
    r_idx = pa.array(np.where(valid, orig_right, 0), pa.int64(),
                     mask=~valid)  # masked take → typed nulls
    cols = {c: t[c].take(l_idx) for c in left_cols}
    for c in right_vals:
        cols[c] = t[c].take(r_idx)
    return pa.table({c: cols[c] for c, _ in out_fields})


def asof_join(left_ds, right_df: pd.DataFrame, *, by: str, on: str,
              value_cols: list[str], num_buckets: int | None = None,
              direction: str = "backward", suffix: str = "_right",
              tolerance=None, left_schema: pa.Schema | None = None):
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction='backward') within the same ``by``
    key. Small right side is broadcast ONCE as an Arrow table (ray.put
    when a session exists); each left bucket pre-filters the broadcast
    rights to its own keys and runs the shared pure-Arrow lexsort
    kernel (r5 — replaced the per-bucket pandas sort + pd.merge_asof;
    exact equality with merge_asof is pytest-asserted).

    ``tolerance``: optional max distance on ``on`` (e.g. a pd.Timedelta)
    — matches farther than this come back null, the SQL "within window"
    as-of refinement.

    The right side must be unique per (by, on) — pre-aggregate it if not,
    or the matched value is implementation-defined.
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()
    # pass left_schema when the left side sits behind an all-to-all —
    # .schema() discovery would execute that upstream shuffle twice
    lsch = left_schema if left_schema is not None else left_ds.schema()
    left_cols = list(lsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    right_tbl = pa.Table.from_pandas(
        right_df[[by, on] + list(value_cols)], preserve_index=False)
    rtypes = {c: right_tbl.schema.field(c).type
              for c in right_tbl.column_names}
    out_name = {c: (c + suffix if c in left_cols else c)
                for c in value_cols}
    types: dict[str, pa.DataType] = dict(ltypes)
    types.update({out_name[c]: rtypes[c] for c in value_cols})
    right_vals = [out_name[c] for c in value_cols]
    all_cols = list(left_cols) + right_vals
    out_fields = [(c, types[c]) for c in all_cols]
    empty = pa.table({c: pa.array([], t) for c, t in out_fields})
    tol = _asof_tol_int(tolerance, rtypes[on])

    # right side padded ONCE into the union layout on the driver
    nr = right_tbl.num_rows
    src_of = {v: k for k, v in out_name.items()}
    rcols = {c: (right_tbl[c] if c in (by, on)
                 else right_tbl[src_of[c]] if c in right_vals
                 else pa.nulls(nr, types[c]))
             for c in all_cols}
    right_padded = pa.table(rcols).append_column(
        "__side", pa.array(np.ones(nr, np.int8)))
    ref = None
    try:
        import ray

        if ray.is_initialized():
            ref = ray.put(right_padded)
    except Exception:
        ref = None
    right_local = right_padded if ref is None else None

    def add_bucket(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: (batch[c] if c in batch.column_names
                    else pa.nulls(n, types[c])) for c in all_cols}
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        out = pa.table(cols)
        key = batch[by]
        b = (stable_bucket(key, num_buckets)
             if pa.types.is_string(types[by])
             else _int_bucket(key, num_buckets))
        return out.append_column("__bucket", b)

    def merge(t: pa.Table) -> pa.Table:
        right = right_local if ref is None else __import__("ray").get(ref)
        t = t.drop(["__bucket"])
        # pre-filter broadcast rights to this bucket's keys so the sort
        # is O(bucket + relevant rights), not O(bucket + all rights)
        lk = t[by].combine_chunks() if isinstance(t[by], pa.ChunkedArray) \
            else t[by]
        rk = right[by].combine_chunks() \
            if isinstance(right[by], pa.ChunkedArray) else right[by]
        keep = pc.is_in(rk, value_set=lk.unique())
        sub = right.filter(keep)
        both = pa.concat_tables([t, sub], promote_options="default")
        return _asof_bucket_kernel(
            both, by=by, on=on, left_cols=left_cols,
            right_vals=right_vals, out_fields=out_fields, empty=empty,
            direction=direction, tol=tol)

    return (left_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(merge,
                                            batch_format="pyarrow"))


def asof_join_dist(left_ds, right_ds, *, by: str, on: str,
                   value_cols: list[str], direction: str = "backward",
                   suffix: str = "_right", num_buckets: int | None = None,
                   left_schema: pa.Schema | None = None,
                   right_schema: pa.Schema | None = None,
                   tolerance=None):
    """Large×large as-of join — the scale path when the right side
    outgrows ``asof_join``'s broadcast idiom.

    Both sides co-partition on ``by`` in ONE all-to-all: each side is
    side-tagged, padded to the union schema with typed null columns, and
    bucketed by the same stable hash of ``by``; a single
    ``groupby('__bucket')`` exchange co-locates them and each bucket runs
    one vectorized ``pd.merge_asof``. Partitioning assumption: all rows
    of one ``by`` key fit in a task (salt/split by time range first if a
    single key outgrows a worker).

    Pass ``left_schema`` / ``right_schema`` when a side sits behind an
    all-to-all — ``.schema()`` discovery would execute that upstream
    shuffle once for discovery and again for the real run. The right side
    must be unique per (by, on); pre-aggregate it if not.
    """
    import pyarrow.compute as pc

    if num_buckets is None:
        num_buckets = default_num_buckets()
    lsch = left_schema if left_schema is not None else left_ds.schema()
    rsch = right_schema if right_schema is not None else right_ds.schema()
    if lsch is None or rsch is None:
        raise ValueError("asof_join_dist: side has no discoverable schema — "
                         "pass left_schema/right_schema explicitly")
    left_cols = list(lsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    for k in (by, on):
        if k in ltypes and k in rtypes and ltypes[k] != rtypes[k]:
            raise ValueError(
                f"asof_join_dist: key {k!r} type differs across sides "
                f"({ltypes[k]} vs {rtypes[k]}) — cast first")
    # right value columns enter the union ALREADY under their suffixed
    # output name when they collide with a left column, so left and right
    # types never share a padded slot (a shared slot with differing types
    # breaks the union; with matching types it silently mixed semantics)
    out_name = {c: (c + suffix if c in left_cols else c) for c in value_cols}
    if len(set(out_name.values())) != len(value_cols) or any(
            v in left_cols for v in out_name.values()):
        raise ValueError(
            f"asof_join_dist: suffixed value columns "
            f"{sorted(out_name.values())} still collide with left columns "
            f"— pick a different suffix")
    types: dict[str, pa.DataType] = dict(ltypes)
    types.update({out_name[c]: rtypes[c] for c in value_cols})
    all_cols = sorted(set(left_cols) | {by, on} | set(out_name.values()))

    def pad(rename: dict[str, str], side_tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            here = {dst: batch[src] for src, dst in rename.items()}
            cols = {c: here.get(c, None) for c in all_cols}
            cols = {c: (v if v is not None else pa.nulls(n, types[c]))
                    for c, v in cols.items()}
            cols["__side"] = pa.array(np.full(n, side_tag, np.int8))
            key = batch[by]
            if pa.types.is_string(types[by]):
                cols["__bucket"] = stable_bucket(key, num_buckets)
            else:
                cols["__bucket"] = _int_bucket(key, num_buckets)
            return pa.table(cols)
        return fn

    tol = _asof_tol_int(tolerance, rtypes[on])
    right_out = [by, on] + [out_name[c] for c in value_cols]
    tagged = left_ds.map_batches(
        pad({c: c for c in left_cols}, 0), batch_format="pyarrow").union(
        right_ds.map_batches(
            pad({by: by, on: on, **out_name}, 1), batch_format="pyarrow"))

    out_fields = [(c, types[c]) for c in left_cols]
    out_fields += [(out_name[c], types[out_name[c]]) for c in value_cols]
    empty = pa.table({c: pa.array([], t) for c, t in out_fields})
    right_vals = [out_name[c] for c in value_cols]

    def merge(t: pa.Table) -> pa.Table:
        # shared pure Arrow/numpy as-of kernel (see _asof_bucket_kernel)
        return _asof_bucket_kernel(
            t, by=by, on=on, left_cols=left_cols, right_vals=right_vals,
            out_fields=out_fields, empty=empty, direction=direction,
            tol=tol)

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def percent_rank(ds, part_col: str, order_col: str, *, descending: bool = False,
                 num_buckets: int | None = None, out_col: str = "pct_rank"):
    """percent_rank() OVER (PARTITION BY part_col ORDER BY order_col) —
    (rank - 1) / (n - 1) with SQL min-rank tie semantics; 0.0 for
    single-row partitions. Same bucketed-shuffle shape as dense_rank:
    partitions co-locate by stable hash bucket, each bucket computes its
    partitions' ranks with one vectorized pandas pass."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        g = df.groupby(part_col, sort=False)[order_col]
        rnk = g.rank(method="min", ascending=not descending)
        n = g.transform("size")
        denom = (n - 1).where(n > 1, 1)
        df[out_col] = ((rnk - 1) / denom).astype("float64")
        return df

    return _bucketed_apply(ds, part_col, per_bucket, num_buckets=num_buckets)


def collect_sorted(ds, key: str, val_col: str, *, sep: str = ",",
                   distinct: bool = True, num_buckets: int | None = None,
                   out_col: str = "vals"):
    """Grouped ordered string collection — SQL
    ``string_agg(DISTINCT val, sep ORDER BY val)``. Scale shape: when
    ``distinct``, the stream is first reduced to unique (key, val) pairs
    with a distributed grouped-count (tiny vs the input), so only the
    deduplicated pairs enter the bucketed shuffle; the join itself is one
    vectorized pandas groupby-join per bucket."""

    if distinct:
        from . import relational

        ds = relational.distinct(ds, [key, val_col])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, val_col], kind="mergesort")
        out = (df.groupby(key, sort=False)[val_col]
               .agg(lambda s: sep.join(s.astype(str))).rename(out_col)
               .reset_index())
        return out

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def funnel(ds, key: str, ts_col: str, type_col: str, steps: list[str], *,
           num_buckets: int | None = None, out_col: str = "funnel_stage"):
    """Ordered funnel / sequence match (C9): per key, the number of
    ``steps`` completed IN ORDER — step i+1 counts only if it occurs
    STRICTLY after the key's earliest qualifying occurrence of step i
    (the MATCH_RECOGNIZE-lite shape of product analytics funnels).

    Scale shape: rows matching no step are dropped per batch BEFORE the
    exchange; survivors co-partition by key with one bucketed shuffle and
    each bucket runs a vectorized per-step min-after scan (O(steps)
    pandas groupby-merges, no per-row Python). Returns one row per key
    that reached at least step 1: ``(key, out_col)``.
    """
    import pyarrow.compute as pc

    steps = list(steps)

    def prefilter(t: pa.Table) -> pa.Table:
        t = t.select([key, ts_col, type_col])
        m = pc.and_(pc.is_in(t[type_col], value_set=pa.array(steps)),
                    pc.is_valid(t[key]))
        return t.filter(m)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        prev_ts = None  # Series: key -> ts of previous completed step
        stage = None
        for i, st in enumerate(steps, start=1):
            sel = df[df[type_col] == st]
            if prev_ts is not None:
                sel = sel.merge(prev_ts.rename("__prev").reset_index(),
                                on=key)
                sel = sel[sel[ts_col] > sel["__prev"]]
            t = sel.groupby(key, sort=False)[ts_col].min()
            if i == 1:
                stage = pd.Series(1, index=t.index, dtype="int64")
            else:
                stage.loc[t.index] = i
            prev_ts = t
            if len(t) == 0:
                break
        if stage is None or len(stage) == 0:
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 out_col: pd.Series([], dtype="int64")})
        out = stage.rename(out_col).reset_index()
        out.columns = [key, out_col]
        return out

    return _bucketed_apply(
        ds.map_batches(prefilter, batch_format="pyarrow"),
        key, per_bucket, num_buckets=num_buckets)


def session_ids(ds, key: str, ts_col: str, gap_s: float, *,
                num_buckets: int | None = None, out_col: str = "session_id",
                keep_cols: list[str] | None = None):
    """Per-EVENT session assignment (vs ``session_counts``' per-key
    totals): within each key ordered by time, session_id = 1 + number of
    preceding gaps > ``gap_s`` — SQL
    ``sum(CASE WHEN gap > g THEN 1 ELSE 0 END) OVER (PARTITION BY key
    ORDER BY ts ...) + 1``. Ties on ``ts_col`` within a key share a
    session (cumulative sum over a stable sort)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        g = df.groupby(key, sort=False)
        gap = (df[ts_col] - g[ts_col].shift()).dt.total_seconds()
        brk = (gap > gap_s).astype("int64")
        df[out_col] = brk.groupby(df[key], sort=False).cumsum() + 1
        cols = ([key, ts_col] if keep_cols is None else keep_cols) + [out_col]
        return df[cols]

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def rolling_mean_centered(ds, key: str, order_cols: list[str], val_col: str,
                          before: int, after: int, *,
                          num_buckets: int | None = None,
                          out_col: str = "rolling_value"):
    """Centered row-frame rolling mean — SQL ``avg(val) OVER (PARTITION
    BY key ORDER BY order_cols ROWS BETWEEN before PRECEDING AND after
    FOLLOWING)``. pandas' centered rolling only supports symmetric
    windows, so the frame is built from cumulative sums with explicit
    index arithmetic — exact for any (before, after)."""
    import numpy as np

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        out = np.empty(len(df), dtype="float64")
        pos = 0
        for _, g in df.groupby(key, sort=False):
            v = g[val_col].to_numpy(dtype="float64")
            n = len(v)
            cs = np.concatenate([[0.0], np.cumsum(v)])
            i = np.arange(n)
            lo = np.maximum(i - before, 0)
            hi = np.minimum(i + after, n - 1)
            out[pos:pos + n] = (cs[hi + 1] - cs[lo]) / (hi - lo + 1)
            pos += n
        df[out_col] = out
        return df

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def range_count(ds, *, by: str, ts_col: str, before, after,
                out_col: str = "n_nearby", num_buckets: int | None = None):
    """Symmetric event-time RANGE frame count (C9): for every row, how
    many same-``by`` rows fall within [ts−before, ts+after] — SQL
    ``count(*) OVER (... RANGE BETWEEN x PRECEDING AND y FOLLOWING)``.
    Co-partition by key; per bucket two vectorized searchsorteds on the
    group's sorted timestamps."""
    import numpy as np

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, ts_col], kind="mergesort")
        out = np.empty(len(df), dtype=np.int64)
        ts_all = df[ts_col].to_numpy()
        start = 0
        for _, g in df.groupby(by, sort=False):
            n = len(g)
            ts = ts_all[start:start + n]
            lo = np.searchsorted(ts, ts - before, side="left")
            hi = np.searchsorted(ts, ts + after, side="right")
            out[start:start + n] = hi - lo
            start += n
        return df.assign(**{out_col: out})

    return _bucketed_apply(ds, by, per_bucket, num_buckets=num_buckets)


def interval_coverage(ds, *, by: str, start_col: str, end_col: str,
                      out_col: str = "covered", num_buckets: int | None = None):
    """Union-of-intervals length per key (C9 ordered op): overlapping /
    touching [start, end) intervals merge into islands; returns one row
    per key with the summed island lengths (e.g. total active wall-clock
    from per-event activity windows). Co-partition by key; per bucket the
    island detection is one vectorized cummax + cumsum pass."""
    import numpy as np

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, start_col, end_col], kind="mergesort")
        s = df[start_col].to_numpy()
        e = df[end_col].to_numpy()
        run_max = df.groupby(by, sort=False)[end_col].cummax().to_numpy()
        prev_max = np.roll(run_max, 1)
        grp_first = (df[by] != df[by].shift()).to_numpy()
        brk = grp_first | (s > np.where(grp_first, s, prev_max))
        island = np.cumsum(brk)
        isl = pd.DataFrame({by: df[by].to_numpy(), "__i": island,
                            "__s": s, "__e": run_max})
        g = isl.groupby([by, "__i"], sort=False).agg(
            s0=("__s", "min"), e1=("__e", "max")).reset_index()
        cov = (g["e1"] - g["s0"])
        out = pd.DataFrame({by: g[by], out_col: cov}).groupby(
            by, as_index=False, sort=False)[out_col].sum()
        return out

    return _bucketed_apply(ds, by, per_bucket, num_buckets=num_buckets)


def scd2(ds, key: str, order_cols: list[str], state_col: str, ts_col: str, *,
         keep_cols: list[str] | None = None, num_buckets: int | None = None):
    """Slowly-changing-dimension Type 2 history from a change log (C9):
    per key ordered by ``order_cols``, consecutive rows with the same
    ``state_col`` collapse into one run (run-length encode), and each run
    becomes a validity interval [valid_from, valid_to) where valid_from is
    the run-opening row's ``ts_col`` and valid_to is the NEXT run's start
    (null ⇒ the currently-valid state). SQL equivalent: LAG to drop
    same-state rows, then LEAD over the survivors for valid_to.

    Co-partitioned by key (one bucket shuffle); run collapse and interval
    stitch are vectorized per bucket — no per-row Python."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # numpy run-length kernel (r4 — replaced sort_values + two
        # groupby shifts): one np.lexsort orders (key, *order_cols);
        # run opens where the key OR the state changes vs the previous
        # sorted row (shifted array compares — no groupby machinery);
        # valid_to is the next run's start within the same key, read
        # off the run-level arrays. ~2× per bucket, zero per-row Python.
        k = df[key].to_numpy()
        perm = np.lexsort(tuple(df[c].to_numpy()
                                for c in reversed(order_cols)) + (k,))
        k_s = k[perm]
        st_s = df[state_col].to_numpy()[perm]
        same_key = np.concatenate(([False], k_s[1:] == k_s[:-1]))
        same_st = np.concatenate(([False], st_s[1:] == st_s[:-1]))
        run_idx = np.flatnonzero(~(same_key & same_st))
        runs = df.iloc[perm[run_idx]].copy()
        run_key = k_s[run_idx]
        valid_from = df[ts_col].to_numpy()[perm[run_idx]]
        nxt = pd.Series(valid_from).shift(-1)
        key_cont = np.concatenate((run_key[1:] == run_key[:-1], [False]))
        runs["valid_from"] = valid_from
        runs["valid_to"] = nxt.where(pd.Series(key_cont)).to_numpy()
        runs["is_current"] = ~key_cont
        cols = ([key] if keep_cols is None else keep_cols) + [
            state_col, "valid_from", "valid_to", "is_current"]
        return runs[cols]

    return _bucketed_apply(ds, key, per_bucket, num_buckets=num_buckets)


def grouped_topk_ties(ds, part_col: str, val_col: str, n: int, *,
                      descending: bool = True, num_buckets: int | None = None,
                      rank_col: str = "rnk"):
    """rank() OVER (PARTITION BY part_col ORDER BY val_col) <= n — the
    WITH TIES top-k: every row whose VALUE ranks in the top n survives,
    so groups can return more than n rows. Same one-bucket-shuffle shape
    as ``grouped_topn``; rank is the vectorized gaps-kept 'min' method."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        r = df.groupby(part_col, sort=False)[val_col].rank(
            method="min", ascending=not descending)
        df = df.assign(**{rank_col: r.astype("int64")})
        return df[df[rank_col] <= n]

    return _bucketed_apply(ds, part_col, per_bucket, num_buckets=num_buckets)


def global_running_sum(ds, order_cols: list[str], ascending: list[bool],
                       val_col: str, range_key: str, *,
                       out_col: str = "running"):
    """Distributed global prefix sum — a running aggregate over ONE total
    order (what per-key running ops can't give), without ever holding
    the stream in one place.

    Requirement: ``range_key`` must be a coarsening of the leading order
    column (e.g. the hour of the ordering timestamp), so the key's sort
    order prefixes ``order_cols`` — then partitions ARE contiguous runs
    of the total order. Two passes: (1) per-key totals (a tiny combiner
    aggregate, O(keys) rows to the driver) whose exclusive scan in key
    order yields each partition's carry-in; (2) one groupby(range_key)
    exchange where each partition sorts locally, takes a vectorized
    cumsum and adds its carry. Nothing global materializes; driver state
    is O(partitions)."""
    from .relational import grouped_agg

    totals = grouped_agg(ds, [range_key],
                         {"__t": (val_col, "sum")}).to_pandas()
    totals = totals.sort_values(range_key).reset_index(drop=True)
    carry = dict(zip(
        totals[range_key],
        np.concatenate(([0], np.cumsum(totals["__t"].to_numpy())[:-1]))))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending,
                            kind="mergesort").reset_index(drop=True)
        base = carry[df[range_key].iloc[0]]
        df[out_col] = base + np.cumsum(df[val_col].to_numpy())
        return df

    return ds.groupby(range_key).map_groups(per_partition,
                                            batch_format="pandas")


def scd2_merge(history_ds, changes_ds, key: str, order_cols: list[str],
               state_col: str, ts_col: str, *,
               keep_cols: list[str] | None = None,
               num_buckets: int | None = None):
    """Incremental SCD2 maintenance (the CDC merge): fold a batch of new
    change rows into an EXISTING dimension history without reprocessing
    the raw prefix.

    Identity that makes it exact: an SCD2 history's run-opening rows ARE
    the change log's state-change events, so re-collapsing
    (history-as-changes ∪ new changes) equals recomputing SCD2 over the
    full stream — ``scd2_merge(scd2(prefix), suffix) == scd2(full)``
    (the invariant pytest pins). The incremental win at scale: the
    history side carries one row per RUN (≪ raw rows), so each merge
    shuffles O(runs + batch), not O(stream). New change rows must carry
    ``ts_col`` ≥ their key's open run (late data is the watermark
    family's concern, not the merge's)."""
    import pyarrow.compute as pc

    cols = ([key] if keep_cols is None else list(keep_cols))
    cols += [c for c in (state_col, ts_col) if c not in cols]
    extra = [c for c in order_cols if c not in cols and c != ts_col]

    def strip(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols + extra:
            out[c] = (t[c] if c != ts_col
                      else pc.cast(t["valid_from"], pa.timestamp("us")))
        return pa.table(out)

    def align(t: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(t[c], pa.timestamp("us"))
                         if c == ts_col else t[c] for c in cols + extra})

    as_changes = history_ds.map_batches(strip, batch_format="pyarrow")
    unioned = as_changes.union(
        changes_ds.map_batches(align, batch_format="pyarrow"))
    return scd2(unioned, key, order_cols, state_col, ts_col,
                keep_cols=keep_cols, num_buckets=num_buckets)
