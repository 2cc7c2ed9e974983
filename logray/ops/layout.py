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
    zed = ds.map_batches(lambda t: add_zorder_key(t, x_col, y_col),
                         batch_format="pyarrow")
    zed.sort("_z").repartition(num_files).write_parquet(out_dir)
    return out_dir
