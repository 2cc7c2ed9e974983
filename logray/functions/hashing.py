"""Stable (cross-process, cross-node) hashing helpers.

Python's builtin ``hash`` is salted per process; every key that must
partition identically across workers/restarts goes through crc32 here.
Vectorized via dictionary-encode → hash the (few) uniques → take.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def crc32_str(s: str) -> int:
    return zlib.crc32(s.encode())


def stable_bucket(arr: pa.ChunkedArray | pa.Array, mod: int) -> pa.Array:
    """crc32(value) % mod for a string array, vectorized over uniques."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    buckets = np.asarray([zlib.crc32(u.encode()) % mod if u is not None else 0 for u in uniq],
                         dtype=np.int32)
    codes = d.indices
    out = pa.array(buckets)
    return out.take(codes) if len(uniq) else pa.nulls(len(arr), pa.int32())


def map_via_dict(arr: pa.ChunkedArray | pa.Array, mapping: dict, default, out_type: pa.DataType) -> pa.Array:
    """Vectorized dict lookup on a string column (encode → map uniques → take)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    vals = pa.array([mapping.get(u, default) if u is not None else default for u in uniq], out_type)
    if len(uniq) == 0:
        return pa.nulls(len(arr), out_type)
    return vals.take(d.indices)


def stable_hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable int64 hash of a column for partitioning: strings via
    crc32-over-uniques, integer/temporal via their int64 value, floats via
    bit view; nulls -> 0. Identical across processes/nodes (no Python
    hash salt)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        d = arr.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        if not uniq:
            return np.zeros(len(arr), np.int64)
        hs = np.asarray([zlib.crc32(u.encode()) for u in uniq], dtype=np.int64)
        idx = np.asarray(d.indices.fill_null(-1).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return np.where(idx >= 0, hs[np.clip(idx, 0, None)], np.int64(0))
    if pa.types.is_floating(t):
        v = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64)
        out = v.view(np.int64).copy()
        out[np.isnan(v)] = 0
        return out
    v = arr.cast(pa.int64()) if t != pa.int64() else arr
    if v.null_count:
        # Fill nulls INSIDE Arrow so to_numpy never widens int64 -> float64
        # (which silently rounds |value| > 2^53 and makes the same key hash
        # differently depending on whether its batch contains a null).
        import pyarrow.compute as pc

        v = pc.fill_null(v, 0)
    x = v.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(x, dtype=np.int64)
