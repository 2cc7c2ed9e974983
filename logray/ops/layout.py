"""Data-layout operators: multi-dimensional clustering for scan pruning.

Z-ordering (Morton codes) interleaves the bits of several key columns so
that rows close in EVERY dimension land close in the linear sort order.
Written to Parquet in that order, each file/row-group covers a small
hyper-rectangle of the key space, so a reader filtering on ANY subset of
the z-order columns can prune most fragments from their min/max stats —
the standard lakehouse OPTIMIZE ZORDER BY layout, expressed as a Ray
Dataset sort + partitioned write.

All bit-twiddling is vectorized numpy on uint64; the identical shift/mask
expression chain is SQL-replayable (DuckDB bigint bit ops), which keeps
z-code assignment value-checkable against an oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each element to the even bit positions
    of a 32-bit lane (Morton 'part1by1'), vectorized on uint64."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton code interleaving two 16-bit integer keys
    (x takes the even bits, y the odd bits). Returns int64."""
    return (part1by1(x) | (part1by1(y) << np.uint64(1))).astype(np.int64)


def add_zorder_key(t: pa.Table, x_col: str, y_col: str,
                   out_col: str = "_z") -> pa.Table:
    """Append the 2-D Morton key of two integer columns (low 16 bits
    each). Callers quantize wider domains to 16 bits first."""
    x = t[x_col].to_numpy(zero_copy_only=False)
    y = t[y_col].to_numpy(zero_copy_only=False)
    return t.append_column(out_col, pa.array(morton2(x, y), pa.int64()))


def zorder_write(ds, x_col: str, y_col: str, out_dir: str, *,
                 num_files: int = 8):
    """Sort the dataset by the 2-D Morton key of (x_col, y_col) and write
    Parquet in that order — one all-to-all (the sort is the point: it IS
    the clustering), then a streaming write. Returns the output dir.

    At cluster scale the sort's range partitioner gives each output file a
    tight z-range ⇒ a tight (x, y) hyper-rectangle in its min/max stats,
    which is what downstream readers prune on."""
    from ..state.fsio import fspath

    zed = ds.map_batches(lambda t: add_zorder_key(t, x_col, y_col),
                         batch_format="pyarrow")
    out = fspath(out_dir)
    zs = zed.sort("_z").repartition(num_files)
    if out.is_local:
        zs.write_parquet(out.path)
    else:  # registered scheme:// mount → shared object storage
        zs.write_parquet(out.path, filesystem=out.fs)
    return out_dir


def footer_stats(paths: list[str], columns: list[str]) -> dict:
    """Scan-free COUNT/MIN/MAX from Parquet footer statistics (the C1
    scale path for lake-wide metadata aggregates: over 100 TB these
    answers live in row-group metadata — a few KB of footer per file —
    never in the data pages).

    One lightweight Ray task per file reads ONLY the footer and returns
    (row_count, per-column min, per-column max); the driver combines one
    tiny tuple per file. Raises if any row group lacks statistics for a
    requested column (caller falls back to a real scan) — exact for
    fixed-width types (numeric / timestamp); avoid string columns, whose
    stats writers may truncate.

    Returns {"n_rows": int, "min": {col: v}, "max": {col: v}}.
    """
    import ray

    from ..state.fsio import fspath

    @ray.remote(num_cpus=0.25)
    def one(fp, cols: list[str]):
        import pyarrow.parquet as pq

        # fp arrives pre-resolved (FsPath, filesystem by value) — the
        # scheme registry exists only on the driver
        f = pq.ParquetFile(fp.path if fp.is_local
                           else fp.fs.open_input_file(fp.path))
        md = f.metadata
        idx = {c: f.schema_arrow.names.index(c) for c in cols}
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c, i in idx.items():
                st = g.column(i).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"no min/max statistics for {c!r} in {path} "
                        f"row-group {rg}; fall back to a scan")
                mins[c] = st.min if c not in mins else min(mins[c], st.min)
                maxs[c] = st.max if c not in maxs else max(maxs[c], st.max)
        return md.num_rows, mins, maxs

    parts = ray.get([one.remote(fspath(p), columns) for p in paths])
    out = {"n_rows": int(sum(p[0] for p in parts)), "min": {}, "max": {}}
    for _, mins, maxs in parts:
        for c in columns:
            if c in mins:
                cur = out["min"].get(c)
                out["min"][c] = mins[c] if cur is None else min(cur, mins[c])
                cur = out["max"].get(c)
                out["max"][c] = maxs[c] if cur is None else max(cur, maxs[c])
    return out


def write_bucketed(ds, key: str, out_dir: str, *, num_buckets: int = 16):
    """Persist a dataset hash-bucketed by ``key``: one parquet file per
    bucket under ``bucket=NNN/``, bucket = stable_hash64(key) mod N.
    This bakes the partitioning INTO THE LAYOUT, so any later join or
    grouped op on the same key can run bucket-by-bucket with NO shuffle
    at all (see ``bucket_join``) — the persisted form of "pick ONE
    partitioning key and reuse it across stages". One exchange now buys
    every downstream co-location forever (until keys change)."""
    from ..functions.hashing import stable_hash64
    from ..state import fsio
    from ..state.fsio import fspath

    out = fspath(out_dir)

    def tag(t: pa.Table) -> pa.Table:
        b = (stable_hash64(t[key]).astype(np.uint64)
             % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def write_bucket(df) -> "pd.DataFrame":
        import pandas as pd

        b = int(df["__bucket"].iloc[0])
        d = out / f"bucket={b:03d}"
        d.mkdirs()
        t = pa.Table.from_pandas(df.drop(columns="__bucket"),
                                 preserve_index=False)
        fsio.write_table(t, d / "part-0.parquet")
        return pd.DataFrame({"bucket": [b], "rows": [len(df)]})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(write_bucket, batch_format="pandas")
            .to_pandas())


def bucket_join(dir_a: str, dir_b: str, on: str, *, bucket_post=None):
    """Shuffle-FREE join of two tables ``write_bucketed`` with the same
    key and bucket count: matching bucket directories are co-located BY
    LAYOUT, so the join is a flat map over bucket pairs — each task
    reads its two small files and merges vectorized; no all-to-all ever
    exists in the plan. ``bucket_post`` fuses a per-bucket group-by
    exactly like ``hash_join``'s."""
    import ray

    from ..state.fsio import fspath

    a, b = fspath(dir_a), fspath(dir_b)
    buckets_a = {p.name for p in a.glob("bucket=*")}
    buckets_b = {p.name for p in b.glob("bucket=*")}
    # an empty bucket writes no directory; inner join with an absent
    # side is empty, so only INTERSECTING buckets run
    common = sorted(buckets_a & buckets_b)

    @ray.remote
    def join_bucket(name: str) -> pa.Table:
        from ..state import fsio

        ta = fsio.read_table(a / name / "part-0.parquet")
        tb = fsio.read_table(b / name / "part-0.parquet")
        df = ta.to_pandas().merge(tb.to_pandas(), on=on)
        if bucket_post is not None:
            df = bucket_post(df)
        return pa.Table.from_pandas(df, preserve_index=False)

    import ray.data

    refs = [join_bucket.remote(n) for n in common]
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.from_arrow_refs([ray.put(t) for t in tables])
