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
