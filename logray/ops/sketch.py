"""Sketch operators — approximate aggregates whose partials merge exactly.

HyperLogLog count-distinct: the scale path for DISTINCT when the key
cardinality itself is too big to shuffle. Each batch reduces to one
4 KiB register array per group (a mergeable partial — element-wise max),
so the shuffle moves O(groups) fixed-size sketches regardless of row
count; relative error ≈ 1.04/√m ≈ 1.6% at p=12.

Pure numpy, no per-row Python: hashing via ``pd.util.hash_pandas_object``
(one pass), register index = top p bits, rank = leading-zero count of the
remaining bits via a float64-exponent trick (frexp), per-register max via
``np.maximum.at``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "0123456789123456"


def _hll_partial(values: pd.Series, p: int) -> np.ndarray:
    """One HLL register array (uint8[2**p]) for a column of values."""
    m = 1 << p
    h = pd.util.hash_pandas_object(values, index=False, hash_key=_HASH_KEY).to_numpy()
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # low bits set: rank ≤ 64-p+1
    # leading zeros of a uint64 via the float64 exponent: for x>0,
    # frexp(x) = (frac, exp) with 2**(exp-1) <= x < 2**exp → lz = 64-exp
    _, exp = np.frexp(rest.astype(np.float64))
    # float64 rounding can push exp one too high for values near 2**64; clamp
    lz = np.clip(64 - exp, 0, 64 - p).astype(np.uint8)
    rank = lz + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    E = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if E <= 2.5 * m and zeros:
        E = m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(E)


def approx_distinct(ds, group_cols: list[str], value_col: str, *, p: int = 12):
    """Approximate per-group COUNT(DISTINCT value_col) via HyperLogLog.

    map_batches emits one (group, registers) row per group per batch;
    the final merge is an element-wise max over the fixed-size register
    arrays — exact regardless of how rows were split across batches.
    Returns a Dataset with ``group_cols + [n_approx]``.
    """
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(group_cols + [value_col]).to_pandas()
        rows = {c: [] for c in group_cols}
        sketches = []
        for key, g in df.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            for c, v in zip(group_cols, key):
                rows[c].append(v)
            sketches.append(_hll_partial(g[value_col], p).tobytes())
        out = {c: pa.array(rows[c]) for c in group_cols}
        out["_regs"] = pa.array(sketches, pa.binary(m))
        return pa.table(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for b in g["_regs"]:
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
        out = g.iloc[:1][group_cols].copy()
        out["n_approx"] = int(round(_hll_estimate(regs)))
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_cols).map_groups(merge, batch_format="pandas"))
