"""Relational operators expressed Ray-Data-first (SURVEY.md §2 C4–C7).

- ``broadcast_join``: small side shipped once (``ray.put`` when a Ray
  session exists, closure capture otherwise) and merged per batch with a
  vectorized pandas merge — no shuffle. This is the C4 lookup-join path.
- ``hash_join``: the large×large scale path — both sides bucketed by a
  stable hash of the join key, co-located with ONE groupby shuffle over
  the tagged union, and merged with a vectorized pandas merge per bucket.
- ``semi_filter``: broadcast semi/anti join — distinct keys of the
  filter side collected once and shipped via ``ray.put``; each batch
  keeps (semi) or drops (anti) members with a vectorized sorted-
  membership test. The big side never shuffles.
- ``grouped_agg``: partial per-batch aggregation (combiner) then a small
  groupby().sum / min / max over the partials — the C5 pattern: the
  shuffle moves one row per key per batch, never raw rows.
- ``topk``: per-batch local top-k then a driver-side combine of
  blocks×k candidate rows (C6).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(ds, small: pd.DataFrame, on: str | list[str], *,
                   how: str = "inner", broadcast: bool = True):
    """Join a Dataset with a small pandas table by broadcasting the small
    side.

    Fast path (r5): a SINGLE non-null DENSE-integer key (span of
    [min, max] within 4× the right row count or 4M slots — dimension
    keys in practice) with no non-key column collisions runs a pure
    Arrow/numpy kernel per batch: the right side is sorted ONCE on the
    driver with O(span) first-position/count lookup arrays, each batch
    probes them by direct indexing (O(rows), no hashing, no sort) and
    expands m:n matches vectorized; output columns assemble with Arrow
    takes (masked take → typed nulls for left-join misses). Measured
    ~1.6× over the pandas merge per batch AND skips both
    arrow→pandas→arrow conversions. Everything else (multi-key,
    string/float/sparse keys, colliding payload columns) keeps the
    pandas ``merge`` kernel — equality between the two paths is
    pytest-asserted."""
    single = isinstance(on, str)
    fast = False
    right_sorted = first = cnt = None
    kmin = 0
    if single and how in ("inner", "left") and len(small) and             small[on].notna().all() and small[on].dtype.kind in "iu":
        rk = small[on].to_numpy()
        kmin, kmax = int(rk.min()), int(rk.max())
        span = kmax - kmin + 1
        if span <= max(4 * len(small), 1 << 22):
            right_tbl = pa.Table.from_pandas(small, preserve_index=False)
            order = np.argsort(rk, kind="stable")
            right_sorted = right_tbl.take(pa.array(order, pa.int64()))
            rks = rk[order]
            cnt = np.zeros(span, np.int64)
            np.add.at(cnt, rks - kmin, 1)
            first = np.cumsum(cnt) - cnt
            fast = True
    payload = (right_sorted, first, cnt, kmin) if fast else small
    ref = None
    if broadcast:
        try:
            import ray

            if ray.is_initialized():
                ref = ray.put(payload)
        except Exception:
            ref = None
    payload_local = payload if ref is None else None

    # Plain tasks, not an actor pool: the per-task ray.get(ref) is a
    # node-local shared-memory read of the already-broadcast small side
    # (cheap at any fan-out), while an actor pool would pay its spin-up on
    # every query — dominant for small/medium inputs.
    def joiner(batch: pd.DataFrame) -> pd.DataFrame:
        if ref is not None:
            import ray

            right = ray.get(ref)
        else:
            right = payload_local
        return batch.merge(right, on=on, how=how)

    def arrow_joiner(batch: pa.Table) -> pa.Table:
        right, first_, cnt_, kmin_ = (
            payload_local if ref is None else __import__("ray").get(ref))
        rcols = [c for c in right.column_names if c != on]
        if any(c in batch.column_names for c in rcols):
            # payload collision: match pandas-merge suffix semantics
            df = batch.to_pandas().merge(
                right.to_pandas(), on=on, how=how)
            return pa.Table.from_pandas(df, preserve_index=False)
        kcol = batch[on]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        nullkey = pc.is_null(kcol).to_numpy(zero_copy_only=False)
        u = pc.fill_null(pc.cast(kcol, pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        ui = u - kmin_
        inb = (ui >= 0) & (ui < len(cnt_)) & ~nullkey
        uc = np.where(inb, ui, 0)
        counts = np.where(inb, cnt_[uc], 0)
        c2 = counts if how == "inner" else np.maximum(counts, 1)
        total = int(c2.sum())
        l_idx = np.repeat(np.arange(len(u), dtype=np.int64), c2)
        base = np.repeat(first_[uc], c2)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(c2) - c2, c2)
        r_pos = base + offs
        li = pa.array(l_idx, pa.int64())
        if how == "inner":
            ri = pa.array(r_pos, pa.int64())
        else:
            valid = np.repeat(counts > 0, c2)
            ri = pa.array(np.where(valid, r_pos, 0), pa.int64(),
                          mask=~valid)  # masked take → typed nulls
        cols = {c: batch[c].take(li) for c in batch.column_names}
        for c in rcols:
            cols[c] = right[c].take(ri)
        return pa.table(cols)

    if fast:
        return ds.map_batches(arrow_joiner, batch_format="pyarrow")
    return ds.map_batches(joiner, batch_format="pandas")


def _unify_key_type(name: str, ktypes: list) -> pa.DataType:
    """One Arrow type for a join key seen with possibly-different types
    across sides: identical → itself; all integers → int64; string family
    → (large_)string. Anything else mixed is a plan-time ValueError rather
    than a runtime schema-mismatch inside the shuffle."""
    if all(t == ktypes[0] for t in ktypes):
        return ktypes[0]
    if all(pa.types.is_integer(t) for t in ktypes):
        return pa.int64()
    if all(pa.types.is_string(t) or pa.types.is_large_string(t) for t in ktypes):
        return (pa.large_string()
                if any(pa.types.is_large_string(t) for t in ktypes) else pa.string())
    raise ValueError(
        f"join key {name!r} has incompatible types across sides: {ktypes}")


def multi_hash_join(sides: list, on: str | list[str], *, how: str = "inner",
                    num_buckets: int | None = None, bucket_post=None,
                    schemas: list | None = None):
    """k-way large×large shuffle join on one shared key — ONE all-to-all
    (C4 scale path; "pick ONE partitioning key and reuse it across
    stages"). Every side is bucketed by a stable mixed hash over ALL join
    key columns (a key's rows never split across buckets), tagged with its
    side index, padded to the union schema with null columns, unioned, and
    co-located with a single ``groupby('__bucket')`` exchange; each bucket
    then merges the k slices left-to-right with vectorized pandas merges.
    A k-way join therefore moves each side exactly once, where chaining
    ``hash_join`` would pay k-1 exchanges and re-shuffle intermediates.

    ``on`` columns must exist under the same names on all sides (rename
    first); non-key column names must not collide across sides. ``how``:
    'inner' for any k; 'left'/'right'/'outer' (full outer) only for k=2 — correct
    because buckets partition the key space, so an unmatched key surfaces
    in exactly one bucket. At cluster scale, set ``num_buckets`` ≈ total
    cores × 4.

    ``schemas``: optional list aligned with ``sides`` (None entries fall
    back to ``.schema()``) — pass them when a side sits behind an
    all-to-all, since ``.schema()`` discovery would execute that whole
    upstream shuffle once and the real run again.

    ``bucket_post``: optional ``pd.DataFrame -> pd.DataFrame`` applied to
    each merged bucket INSIDE the same map_groups task. Because a bucket
    holds every row of its join keys, a group-by on (a superset of) the
    join key can run here and skip another all-to-all — join+aggregate
    fusion on shared partitioning.

    Null join keys follow pandas merge semantics (null matches null,
    unlike SQL, where NULL = NULL is unknown); all null keys hash to one
    bucket, so the property holds distributed too. Filter nulls first for
    SQL semantics.
    """
    from ..functions.hashing import stable_hash64
    from .window import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    on = [on] if isinstance(on, str) else list(on)
    if len(sides) < 2:
        raise ValueError("multi_hash_join needs at least two sides")
    if how != "inner" and len(sides) != 2:
        raise ValueError("how='left'/'outer' is only defined for 2 sides")
    if schemas is None:
        schemas = [None] * len(sides)
    scm = [s if s is not None else ds.schema() for ds, s in zip(sides, schemas)]
    for i, s in enumerate(scm):
        if s is None:  # Ray reports no schema for an empty Dataset
            raise ValueError(
                f"join side {i} has no discoverable schema (empty dataset?) — "
                f"pass schemas=[...] / left_schema / right_schema explicitly")
    side_cols = [list(s.names) for s in scm]
    seen: dict[str, int] = {}
    for i, cols in enumerate(side_cols):
        for c in cols:
            if c in on:
                continue
            if c in seen:
                raise ValueError(
                    f"non-key column collision: {c!r} on sides {seen[c]} and {i}")
            seen[c] = i
    def as_arrow(t):
        # Ray's Schema reports pandas-origin columns as numpy dtypes or the
        # raw ``object`` class; normalize so cast/nulls below always get a
        # real Arrow DataType (object dtype == string in this engine).
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()

    types: dict[str, pa.DataType] = {}
    for s in scm:
        types.update({n: as_arrow(t) for n, t in zip(s.names, s.types)})
    # Unify key-column types across sides (int32-vs-int64, string-vs-large
    # _string); pad() casts keys to the unified type so union blocks share
    # one schema instead of failing downstream with an opaque Arrow error.
    for c in on:
        ktypes = []
        for i, s in enumerate(scm):
            if c not in s.names:
                raise ValueError(f"join key {c!r} missing on side {i}")
            ktypes.append(as_arrow(dict(zip(s.names, s.types))[c]))
        types[c] = _unify_key_type(c, ktypes)
    all_cols = on + sorted(set(types) - set(on))

    def pad(cols_here: list[str], side_tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for c in all_cols:
                if c in cols_here:
                    col = batch[c]
                    if col.type != types[c]:  # key cast to the unified type
                        col = col.cast(types[c])
                    cols[c] = col
                else:
                    cols[c] = pa.nulls(n, types[c])
            cols["__side"] = pa.array(np.full(n, side_tag, np.int8))
            # mix ALL key columns into the bucket: bucketing only the first
            # key collapses the bucket space when it is low-cardinality
            # (e.g. on=["day", "user_id"] would leave ~#days live buckets)
            h = np.zeros(n, dtype=np.int64)
            for c in on:
                h = h * np.int64(1000003) + stable_hash64(batch[c])
            cols["__bucket"] = pa.array(
                (np.abs(h) % num_buckets).astype(np.int32))
            return pa.table(cols)
        return fn

    tagged = sides[0].map_batches(pad(side_cols[0], 0), batch_format="pyarrow")
    for i in range(1, len(sides)):
        tagged = tagged.union(
            sides[i].map_batches(pad(side_cols[i], i), batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        # split by side BEFORE to_pandas: each slice then has no padding
        # nulls, so int64 columns stay int64 instead of widening to float
        side = t["__side"]
        import pyarrow.compute as pc

        def slice_of(i: int) -> pd.DataFrame:
            keep = on + [c for c in all_cols if c in side_cols[i] and c not in on]
            return t.filter(pc.equal(side, i)).select(keep).to_pandas()

        out = slice_of(0)
        for i in range(1, len(sides)):
            out = out.merge(slice_of(i), on=on, how=how)
        if bucket_post is not None:
            out = bucket_post(out)
        return pa.Table.from_pandas(out, preserve_index=False)

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def hash_join(left, right, on: str | list[str], *, how: str = "inner",
              num_buckets: int | None = None, bucket_post=None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Two-sided shuffle join — the k=2 case of ``multi_hash_join`` (see
    there for semantics, skew notes and the ``*_schema`` rationale)."""
    return multi_hash_join([left, right], on, how=how, num_buckets=num_buckets,
                           bucket_post=bucket_post,
                           schemas=[left_schema, right_schema])


def hash_semi_join(left, right, on: str | list[str], *, anti: bool = False,
                   num_buckets: int | None = None,
                   left_schema: pa.Schema | None = None,
                   right_schema: pa.Schema | None = None):
    """Large×large shuffle semi/anti join — SQL EXISTS / NOT EXISTS.

    ``semi_filter`` is the small-filter-side path (distinct keys collected
    and broadcast); this is the path when the filter side's distinct keys
    don't fit a broadcast. Both sides are bucketed by a stable mixed hash
    over the key columns and co-located with ONE tagged-union exchange —
    the right side ships ONLY its key columns, deduped per batch before
    the exchange, so the shuffle moves (per-batch-distinct) keys, never
    payload rows. Inside each bucket the left slice is kept (semi) or
    dropped (anti) by a vectorized merge-indicator membership test; left
    rows are never duplicated regardless of right-side multiplicity.

    Null semantics are SQL EXISTS, not pandas merge: a left row with any
    null key never matches — dropped by semi, KEPT by anti (this matches
    NOT EXISTS, which is also what DuckDB's NOT IN would do only when the
    subquery has no nulls — write oracles with EXISTS/NOT EXISTS).

    ``*_schema``: pass when a side sits behind an all-to-all (see
    ``multi_hash_join``).
    """
    from ..functions.hashing import stable_hash64
    from .window import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    on = [on] if isinstance(on, str) else list(on)
    lscm = left_schema if left_schema is not None else left.schema()
    rscm = right_schema if right_schema is not None else right.schema()
    if lscm is None or rscm is None:
        raise ValueError("hash_semi_join side has no discoverable schema "
                         "(empty dataset?) — pass left_schema/right_schema")
    left_cols = list(lscm.names)
    ltypes = dict(zip(lscm.names, lscm.types))
    rtypes = dict(zip(rscm.names, rscm.types))
    for c in on:
        if c not in ltypes or c not in rtypes:
            raise ValueError(f"semi-join key {c!r} missing on a side")
    ktypes = {c: _unify_key_type(c, [ltypes[c], rtypes[c]]) for c in on}

    def bucket_of(t: pa.Table) -> pa.Array:
        h = np.zeros(t.num_rows, dtype=np.int64)
        for c in on:
            h = h * np.int64(1000003) + stable_hash64(t[c])
        return pa.array((np.abs(h) % num_buckets).astype(np.int32))

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            col = t[c]
            if c in ktypes and col.type != ktypes[c]:
                col = col.cast(ktypes[c])
            cols[c] = col
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["__bucket"] = bucket_of(t)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # keys only, cast to the unified type, deduped per batch: the
        # exchange never moves right-side payload or duplicate keys
        t = t.select(on)
        t = pa.table({c: (t[c].cast(ktypes[c]) if t[c].type != ktypes[c]
                          else t[c]) for c in on})
        t = t.group_by(on).aggregate([])
        n = t.num_rows
        cols = {}
        for c in left_cols:
            cols[c] = t[c] if c in on else pa.nulls(n, ltypes[c])
        cols["__side"] = pa.array(np.ones(n, np.int8))
        cols["__bucket"] = bucket_of(t)
        return pa.table(cols)

    tagged = (left.map_batches(tag_left, batch_format="pyarrow")
              .union(right.map_batches(tag_right, batch_format="pyarrow")))

    out_cols = list(left_cols)

    def merge(t: pa.Table) -> pa.Table:
        # pure Arrow/numpy membership kernel (r5 — replaced the
        # per-bucket pandas merge+indicator): each key column
        # dictionary-encodes over the WHOLE bucket (both sides share
        # one dictionary, so codes are comparable), np.unique(axis=0)
        # assigns exact tuple ids (no hash-mix overflow), and one
        # np.isin answers membership. SQL null semantics preserved:
        # a null in any key column never matches on either side.
        import pyarrow.compute as pc

        side = t["__side"]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        sid = side.to_numpy(zero_copy_only=False)
        lmask = sid == 0
        lt = t.filter(pa.array(lmask)).select(out_cols)
        if lt.num_rows == 0:
            return lt
        M = np.empty((t.num_rows, len(on)), np.int64)
        nulls = np.zeros(t.num_rows, bool)
        for j, c in enumerate(on):
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nulls |= pc.is_null(col).to_numpy(zero_copy_only=False)
            d = col.dictionary_encode()
            M[:, j] = pc.fill_null(d.indices, 0).to_numpy(
                zero_copy_only=False)
        tid = (M[:, 0] if len(on) == 1
               else np.unique(M, axis=0, return_inverse=True)[1])
        rids = np.unique(tid[~lmask & ~nulls])
        member = np.isin(tid[lmask], rids) & ~nulls[lmask]
        keep = ~member if anti else member
        return lt.filter(pa.array(keep))

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def semi_filter(ds, col: str, keys, *, keep: bool = True):
    """Broadcast semi (keep=True) / anti (keep=False) join on ``col``.

    ``keys``: 1-D numpy array of the filter side's distinct keys (sorted
    or not). Shipped once via ``ray.put``; membership per batch is a
    vectorized ``searchsorted`` — no shuffle of the big side.
    """
    keys = np.unique(np.asarray(keys))
    ref = None
    try:
        import ray

        if ray.is_initialized():
            ref = ray.put(keys)
    except Exception:
        ref = None
    keys_local = keys if ref is None else None

    def fn(t: pa.Table) -> pa.Table:
        ks = keys_local if ref is None else __import__("ray").get(ref)
        u = t[col].to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            member = np.zeros(len(u), bool)
        else:
            idx = np.clip(np.searchsorted(ks, u), 0, len(ks) - 1)
            member = ks[idx] == u
        return t.filter(pa.array(member if keep else ~member))

    return ds.map_batches(fn, batch_format="pyarrow")


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


def arg_extreme(ds, keys: list[str], order_col: str, *, descending: bool = True,
                num_buckets: int | None = None):
    """Grouped argmax/argmin (SQL ``arg_max`` / ``max_by``): the whole row
    holding the group's extreme ``order_col``.

    Two-level: each batch first reduces to one candidate row per key (a
    combiner — the shuffle moves ≤ one row per key per batch, never raw
    rows), then buckets co-locate keys and keep the global extreme.
    ``order_col`` must be unique per group (use a unique id) or the winner
    among ties is implementation-defined."""
    from .window import _bucketed_apply

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([*keys, order_col],
                               ascending=[True] * len(keys) + [not descending],
                               kind="mergesort")
                  .groupby(keys, sort=False).head(1))

    pre = ds.map_batches(local, batch_format="pandas")
    return _bucketed_apply(pre, keys[0], local, num_buckets=num_buckets)


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


def reservoir_sample(ds, key_col: str, k: int, *,
                     method: str = "hash64",
                     weight_col: str | None = None) -> pd.DataFrame:
    """Exact-k uniform sample without replacement in ONE streaming pass —
    bottom-k ("priority") sampling, the distributed replacement for the
    classic reservoir (C6).

    Each row gets a pseudo-random priority derived from its unique
    ``key_col``; the k globally-smallest priorities are a uniform k-subset.
    Per-block bottom-k partials are mergeable, so the combiner keeps driver
    state at O(k × blocks-at-once), no shuffle runs, and the answer is
    exact-k even when the input size is unknown — "give me exactly k rows
    from 100 TB" without a sort of the full data.

    ``method='hash64'`` (default, the scale path): vectorized priorities —
    ``stable_hash64`` of the key re-mixed through splitmix64, numpy
    ``argpartition`` bottom-k per block; zero per-row Python.
    ``method='md5'`` (oracle mode): per-row md5 hexdigest, deterministic
    AND DuckDB-expressible (ORDER BY md5(key) LIMIT k) — kept only so the
    driver's SQL oracle can value-check the op end-to-end.

    ``weight_col``: Efraimidis–Spirakis weighted sampling without
    replacement — priority becomes ``-ln(u)/w`` (u uniform from the key
    hash, w the row's positive weight), whose bottom-k is the exact-k
    weighted sample. Same mergeable bottom-k combine; both methods
    support it (md5 mode stays DuckDB-expressible: identical float
    expression on both sides)."""
    if method == "md5":
        import hashlib

        def with_priority(df: pd.DataFrame) -> pd.DataFrame:
            hexd = df[key_col].astype(str).map(
                lambda s: hashlib.md5(s.encode()).hexdigest())
            if weight_col is None:
                pri = hexd
            else:
                u = hexd.str[:13].map(lambda h: int(h, 16)) / 4503599627370496.0
                pri = -np.log(u.to_numpy()) / df[weight_col].to_numpy()
            return df.assign(__pri=pri).sort_values(["__pri", key_col]).head(k)

        cand = ds.map_batches(with_priority, batch_format="pandas").to_pandas()
        out = cand.sort_values(["__pri", key_col]).head(k).drop(columns="__pri")
        return out.reset_index(drop=True)

    from ..functions.hashing import stable_hash64
    from .bloom import _splitmix64

    def local(t: pa.Table) -> pa.Table:
        h = _splitmix64(stable_hash64(t[key_col]).view(np.uint64))
        if weight_col is None:
            pri = h
        else:
            u = (h >> np.uint64(11)).astype(np.float64) / 9007199254740992.0
            w = t[weight_col].to_numpy(zero_copy_only=False)
            pri = -np.log(np.maximum(u, 1e-18)) / w
        if t.num_rows > k:
            idx = np.argpartition(pri, k)[:k]
            t = t.take(pa.array(idx, pa.int64()))
            pri = pri[idx]
        if weight_col is None:
            return t.append_column("__pri", pa.array(pri.view(np.int64)))
        return t.append_column("__pri", pa.array(pri))

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if weight_col is None:
        cand["__pri"] = cand["__pri"].astype(np.int64).values.view(np.uint64)
    out = cand.sort_values(["__pri", key_col]).head(k).drop(columns="__pri")
    return out.reset_index(drop=True)


def skew_join(left, right, on: str, *, hot_keys=None, hot_threshold: int = 100_000,
              num_buckets: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Skew-split INNER join: hot keys take the broadcast path, the rest
    the shuffle path (C4 skew handling).

    A hash-partitioned join sends every row of a key to ONE bucket — a
    single hot key (the 10M-turn conversation) turns into one straggler
    task. Split instead:

    - detect hot keys with a combiner pass (``grouped_agg`` pre-aggregates
      per batch, the driver only ever pulls keys whose count exceeds
      ``hot_threshold`` — bounded driver state at any input size), or pass
      ``hot_keys`` explicitly;
    - hot rows join against the (small: one row set per hot key) hot slice
      of ``right`` broadcast via ``ray.put`` — these keys never shuffle;
    - cold rows run the normal ``hash_join``; results union.

    INNER only: outer semantics across the split would need unmatched-key
    bookkeeping on both paths. ``right`` is read twice (hot slice +
    cold shuffle) — at scale pass a cheap re-readable Dataset, not a
    materialized chain.
    """
    import pyarrow.compute as pc

    if hot_keys is None:
        counts = grouped_agg(left, [on], {"__n": (on, "count")})
        hot_tbl = counts.map_batches(
            lambda t: t.filter(pc.greater(t["__n"], hot_threshold)),
            batch_format="pyarrow").to_pandas()
        # an all-empty filtered Dataset comes back with NO columns
        hot_keys = (hot_tbl[on].to_numpy() if on in hot_tbl.columns
                    else np.empty(0))
    hot_keys = np.unique(np.asarray(hot_keys))
    if len(hot_keys) == 0:
        return hash_join(left, right, on, num_buckets=num_buckets,
                         left_schema=left_schema, right_schema=right_schema)
    right_hot = semi_filter(right, on, hot_keys).to_pandas()
    if on not in right_hot.columns:
        # a hot key detected on the left may have NO right matches; Ray
        # returns a column-less frame for the all-empty result, which would
        # crash the pandas merge inside broadcast_join. Rebuild an empty
        # frame with the right side's real columns instead.
        rs = right_schema if right_schema is not None else right.schema()
        right_hot = pa.table(
            {n: pa.nulls(0, t) for n, t in zip(rs.names, rs.types)}).to_pandas()
    hot_out = broadcast_join(semi_filter(left, on, hot_keys), right_hot, on=on)
    cold_out = hash_join(semi_filter(left, on, hot_keys, keep=False),
                         semi_filter(right, on, hot_keys, keep=False),
                         on, num_buckets=num_buckets,
                         left_schema=left_schema, right_schema=right_schema)
    # align column order before union (broadcast path: left cols then right)
    cols = None
    if left_schema is not None and right_schema is not None:
        cols = list(left_schema.names) + [c for c in right_schema.names if c != on]
    if cols is None:
        cols = sorted(set(hot_out.schema().names))

    def order(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return (hot_out.map_batches(order, batch_format="pyarrow")
            .union(cold_out.map_batches(order, batch_format="pyarrow")))


def upsert(base, updates, keys: list[str], order_col: str):
    """CDC upsert / keep-latest (C7): union ``base`` and ``updates`` and
    keep, per ``keys`` group, the row with the greatest ``order_col``;
    ``updates`` wins order-column ties (MERGE "when matched then update"
    semantics, plus inserts for keys only in ``updates``).

    Same shape as ``keep_first``: one co-partitioning exchange on the
    first key, then a vectorized sort+tail kernel per bucket — the scale
    path, since per-key state never concentrates on the driver."""
    from .window import _bucketed_apply

    def tag(src: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__src", pa.array(np.full(t.num_rows, src, dtype=np.int8)))
        return fn

    uni = (base.map_batches(tag(0), batch_format="pyarrow")
           .union(updates.map_batches(tag(1), batch_format="pyarrow")))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*keys, order_col, "__src"], kind="mergesort")
        return df.groupby(keys, sort=False).tail(1).drop(columns="__src")

    return _bucketed_apply(uni, keys[0], per_bucket)


def snapshot_diff(old, new, keys: list[str], compare: list[str], *,
                  detail: bool = False):
    """Snapshot delta / CDC diff: classify every key as ``added`` (in
    ``new`` only), ``removed`` (in ``old`` only) or ``changed`` (present
    in both with any ``compare`` column differing); unchanged keys are
    dropped. Returns ``keys + [change]``; with ``detail=True`` also the
    before/after images ``{c}_old`` / ``{c}_new`` per compare column —
    the delta stream an incremental-view-maintenance consumer applies.

    Both snapshots ride ONE side-tagged co-partitioning exchange (only
    ``keys``+``compare`` columns move); each bucket diffs its key range
    with a single vectorized outer merge. Assumes ``keys`` identify at
    most one row per side (snapshot semantics)."""
    from .window import _bucketed_apply

    cols = [*keys, *compare]

    def tag(src: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(cols).append_column(
                "__src", pa.array(np.full(t.num_rows, src, dtype=np.int8)))
        return fn

    uni = (old.map_batches(tag(0), batch_format="pyarrow")
           .union(new.map_batches(tag(1), batch_format="pyarrow")))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["__src"] == 0]
        n = df[df["__src"] == 1]
        m = o.merge(n, on=keys, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        diff = np.zeros(len(m), dtype=bool)
        for c in compare:
            a, b = m[f"{c}_o"], m[f"{c}_n"]
            diff |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
        change = np.where(m["_merge"] == "right_only", "added",
                          np.where(m["_merge"] == "left_only", "removed",
                                   np.where(diff, "changed", "")))
        m = m.assign(change=change)
        m = m[m["change"] != ""]
        if not detail:
            return m[[*keys, "change"]]
        out = m[[*keys, "change"]].copy()
        for c in compare:
            out[f"{c}_old"] = m[f"{c}_o"].to_numpy()
            out[f"{c}_new"] = m[f"{c}_n"].to_numpy()
        return out

    return _bucketed_apply(uni, keys[0], per_bucket)


def cogroup(left, right, keys: list[str], fn, *,
            num_buckets: int | None = None):
    """Generalized cogroup (the two-input ``map_groups``): co-partition
    both datasets on ``keys`` in ONE side-tagged exchange and call
    ``fn(left_df, right_df)`` once per bucket — both frames hold complete
    key groups, so any per-key combine (joins the merge family can't
    express, asymmetric aggregates, custom reconciliation) runs
    vectorized inside. ``fn`` must return a DataFrame."""
    from .window import _bucketed_apply

    def tag(src: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__src", pa.array(np.full(t.num_rows, src, dtype=np.int8)))
        return f

    uni = (left.map_batches(tag(0), batch_format="pyarrow")
           .union(right.map_batches(tag(1), batch_format="pyarrow")))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__src"] == 0].drop(columns="__src")
        r = df[df["__src"] == 1].drop(columns="__src")
        return fn(l, r)

    return _bucketed_apply(uni, keys[0], per_bucket, num_buckets=num_buckets)


def pruned_read(path: str, columns: list[str], key_col: str, keys,
                *, isin_threshold: int = 100_000):
    """Dynamic partition pruning: read only the fraction of a big table
    that can join a small side's already-known key set.

    The runtime analogue of static predicate pushdown — the predicate is
    DERIVED from the small side at execution time (Spark/Trino's "dynamic
    filtering"). Small key sets (≤ ``isin_threshold``) ship into the scan
    as an ``isin`` dataset expression, so parquet row-group statistics
    and dictionary/page filtering drop non-matching stripes at the
    SOURCE; larger sets push only their [min, max] envelope (stats-only
    pruning, still skips disjoint row groups) and apply the exact
    membership test vectorized right behind the read. Either way the
    result is exactly the semi-filtered scan, and the object store never
    sees rows that cannot join.
    """
    import pyarrow.dataset as pads
    import ray.data

    ks = pa.array(keys) if not isinstance(keys, (pa.Array, pa.ChunkedArray)) \
        else keys
    ks = pc.unique(ks if isinstance(ks, pa.Array) else ks.combine_chunks())
    if len(ks) == 0:
        # empty small side: nothing can join; emit an empty typed scan
        expr = pads.field(key_col).isin(ks)
        return ray.data.read_parquet(path, columns=columns, filter=expr)
    if len(ks) <= isin_threshold:
        return ray.data.read_parquet(path, columns=columns,
                                     filter=pads.field(key_col).isin(ks))
    lo, hi = pc.min(ks).as_py(), pc.max(ks).as_py()
    expr = (pads.field(key_col) >= lo) & (pads.field(key_col) <= hi)
    ds = ray.data.read_parquet(path, columns=columns, filter=expr)
    # exact membership behind the stats-pruned scan, broadcast via the
    # established ray.put + searchsorted semi-filter
    return semi_filter(ds, key_col, ks.to_numpy(zero_copy_only=False))


def nth_element(ds, col: str, ranks, *, passes_max: int = 64,
                pull_threshold: int = 200_000, nbins: int = 1024):
    """EXACT global order statistics WITHOUT a global sort: distributed
    QuickSelect by iterative histogram narrowing.

    ``ds.sort`` answers an O(1)-sized question with an all-to-all over
    every row; this instead repeats an aggregate-shaped pass — each
    iteration scans the (single, pruned) column, bins the values falling
    in each live candidate range into ``nbins`` buckets (per-batch
    ``np.histogram`` partials; the exchange carries ≤ nbins counts per
    batch per range, never values), and descends into the bucket holding
    each requested rank. A range is resolved by pulling its DISTINCT
    values with counts (bounded by the bucket count ≤ ``pull_threshold``,
    and by ≤ 2 representable floats for degenerate-width tie buckets
    however many ROWS they hold) and indexing the cumulative counts.

    Values are compared as float64 — exact for doubles and for integers
    up to 2^53 (use minor units for money, as the house style does
    anyway). Nulls/NaNs are ignored (SQL ORDER BY ... OFFSET over the
    non-null values). ``ranks``: 0-based global ranks, ascending order;
    returns {rank: value}. Equivalent SQL:
    ``ORDER BY col LIMIT 1 OFFSET rank``.
    """
    from ray.data.aggregate import Sum as _RaySum

    ranks = sorted(set(int(r) for r in ranks))

    def minmax(t: pa.Table) -> pa.Table:
        v = t[col]
        n = t.num_rows - v.null_count
        lo = pc.min(v).as_py() if n else None
        hi = pc.max(v).as_py() if n else None
        return pa.table({"lo": pa.array([lo], pa.float64()),
                         "hi": pa.array([hi], pa.float64()),
                         "n": pa.array([n], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    n_total = int(mm["n"].sum())
    if n_total == 0:
        return {r: None for r in ranks}
    for r in ranks:
        if not 0 <= r < n_total:
            raise ValueError(f"rank {r} out of range for {n_total} values")
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())

    # per unresolved rank: closed candidate range + rank within it
    state: dict[int, tuple[float, float, int]] = {
        r: (glo, ghi, r) for r in ranks}
    out: dict[int, float] = {}

    def resolve(lo: float, hi: float, within: int) -> float:
        """Pull the sliver's distinct values + counts and index them."""
        def uniq(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            v = v[(v >= lo) & (v <= hi)]
            u, c = np.unique(v, return_counts=True)
            return pa.table({"v": pa.array(u, pa.float64()),
                             "c": pa.array(c, pa.int64())})

        agg = (ds.map_batches(uniq, batch_format="pyarrow")
               .groupby("v").aggregate(_RaySum("c", alias_name="c"))
               .to_pandas().sort_values("v").reset_index(drop=True))
        csum = np.cumsum(agg["c"].to_numpy())
        return float(agg["v"].iloc[int(np.searchsorted(csum, within + 1))])

    for _ in range(passes_max):
        # zero-width candidate range: every value in it is identical —
        # the answer IS the bound (covers the all-equal column upfront
        # and tie slivers that narrow to one representable float)
        for r, (lo, hi, _k) in list(state.items()):
            if r not in out and lo >= hi:
                out[r] = lo
        live = {r: s for r, s in state.items() if r not in out}
        if not live:
            break
        ranges = sorted({(lo, hi) for lo, hi, _ in live.values()})

        def hist(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            rows_ri, rows_bin, rows_c = [], [], []
            for ri, (lo, hi) in enumerate(ranges):
                sel = v[(v >= lo) & (v <= hi)]
                if not len(sel):
                    continue
                c, _ = np.histogram(sel, bins=nbins, range=(lo, hi))
                nz = np.flatnonzero(c)
                rows_ri.append(np.full(len(nz), ri, np.int32))
                rows_bin.append(nz.astype(np.int32))
                rows_c.append(c[nz])
            if not rows_ri:
                return pa.table({"ri": pa.array([], pa.int32()),
                                 "bin": pa.array([], pa.int32()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({
                "ri": pa.array(np.concatenate(rows_ri)),
                "bin": pa.array(np.concatenate(rows_bin)),
                "c": pa.array(np.concatenate(rows_c), pa.int64())})

        agg = (ds.map_batches(hist, batch_format="pyarrow")
               .groupby(["ri", "bin"]).aggregate(_RaySum("c", alias_name="c"))
               .to_pandas())
        for r, (lo, hi, k) in list(live.items()):
            ri = ranges.index((lo, hi))
            h = np.zeros(nbins, dtype=np.int64)
            sub = agg[agg["ri"] == ri]
            h[sub["bin"].to_numpy()] = sub["c"].to_numpy()
            csum = np.cumsum(h)
            b = int(np.searchsorted(csum, k + 1))
            within = int(k - (csum[b - 1] if b else 0))
            edges = np.linspace(lo, hi, nbins + 1)
            # histogram bins are [e_b, e_{b+1}) except the last (closed);
            # keep ranges CLOSED by shaving one ulp off non-final tops
            nlo = float(edges[b])
            nhi = hi if b == nbins - 1 else float(
                np.nextafter(edges[b + 1], -np.inf))
            cnt = int(h[b])
            if cnt <= pull_threshold or nhi <= np.nextafter(nlo, np.inf):
                out[r] = resolve(nlo, nhi, within)
            else:
                state[r] = (nlo, nhi, within)
    missing = [r for r in ranks if r not in out]
    if missing:
        raise RuntimeError(f"nth_element did not converge for {missing}")
    return out


def auto_join(left, right, on: str, *, how: str = "inner",
              broadcast_threshold_rows: int = 500_000,
              skew_hot_threshold: int = 100_000,
              sample_rows: int = 100_000,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Adaptive join: pick broadcast / skew-split / hash-shuffle from
    DATA statistics at plan time (the AQE decision, made explicit).

    1. Size the right side with ``count()`` — metadata-cheap on a fresh
       parquet scan (footer row counts), aggregate-shaped otherwise.
       Small enough → ``broadcast_join`` (no shuffle at all).
    2. Otherwise sample the LEFT's leading blocks (``limit(sample_rows)``
       — a streaming prefix, never a full scan) and extrapolate the top
       key's total count; above ``skew_hot_threshold`` → ``skew_join``
       (hot keys broadcast, cold keys shuffle), else plain ``hash_join``.

    Returns ``(strategy, dataset)`` with strategy in
    {'broadcast', 'skew', 'hash'} so callers can log the decision the
    planner made. The sampled estimate only STEERS the strategy — every
    path computes the identical join (equality-tested across all three).
    INNER-only for the skew path (its documented restriction); non-inner
    ``how`` falls back to broadcast/hash.

    The LEFT side is never executed at plan time: its cardinality comes
    from dataset metadata (``_meta_count`` — parquet footers / known
    block counts) when available, else from the sampled prefix itself
    (a short sample IS the whole left). When neither pins it down the
    only safe statement is ``n_left ≥ sample_rows``, so that lower
    bound extrapolates the hot key — conservative toward 'hash', and
    never a second pass over the left pipeline.
    """
    n_right = right.count()
    if n_right <= broadcast_threshold_rows:
        small = right.to_pandas()
        return "broadcast", broadcast_join(left, small, on, how=how)

    if how == "inner":
        sample = left.limit(sample_rows).select_columns([on]).to_pandas()
        if len(sample):
            top = sample[on].value_counts()
            n_left = left._meta_count()
            if n_left is None and len(sample) < sample_rows:
                n_left = len(sample)  # the prefix exhausted the left
            if n_left is None:
                n_left = sample_rows  # lower bound: prefix was full
            est_top = float(top.iloc[0]) / len(sample) * float(n_left)
            if est_top >= skew_hot_threshold:
                return "skew", skew_join(
                    left, right, on, hot_threshold=skew_hot_threshold,
                    left_schema=left_schema, right_schema=right_schema)
    return "hash", hash_join(left, right, on, how=how)
