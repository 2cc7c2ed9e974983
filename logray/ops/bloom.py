"""Bloom-filter join pruning — the scale path for large×large semi joins.

At 100 TB a semi join whose "small" side is merely *smaller* (10⁸ keys)
can't be broadcast as an exact hash set, and shuffling the big side just
to discard 99% of it wastes the whole exchange. The standard fix
(SURVEY.md §2 C4 scale note) is a Bloom filter: build an m-bit filter
over the key side (mergeable per-block partials, OR-combined — the
filter is a few MB regardless of input size), broadcast it once via
``ray.put``, and prune the big side inside ``map_batches`` before any
shuffle/exact join. False positives only ever *keep* extra rows, so a
downstream exact join stays correct; false negatives are impossible.

All hot paths are vectorized numpy: keys hash via a splitmix64-style
mixer, the k probe positions derive from double hashing
(h1 + i·h2 mod m), and membership tests are bitwise gathers over the
packed uint64 bit array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64_scalar(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


# Fixed hash for null keys — must agree between build and probe sides.
_NULL_HASH = np.uint64(_splitmix64_scalar(0))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uniform 64-bit mix of int keys."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _key_hashes(arr) -> np.ndarray:
    """uint64 hashes for an Arrow/numpy key column (ints directly;
    strings via crc32 over uniques, then mixed)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array) and pa.types.is_string(arr.type):
        import zlib

        d = arr.dictionary_encode()
        uniq = np.asarray(
            [zlib.crc32(u.encode()) if u is not None else 0
             for u in d.dictionary.to_pylist()], dtype=np.uint64)
        h = _splitmix64(uniq)
        if len(h) == 0:
            return np.full(len(arr), _NULL_HASH, dtype=np.uint64)
        # Null values have null dictionary indices; np.asarray on those
        # yields float NaN (fancy-index crash). Fill inside Arrow and map
        # nulls to a fixed hash, identical on build and probe sides.
        idx = np.asarray(d.indices.fill_null(-1).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return np.where(idx >= 0, h[np.clip(idx, 0, None)], _NULL_HASH)
    if isinstance(arr, pa.Array):
        # Fill nulls INSIDE Arrow so int64 keys never widen to float64
        # (which would hash large keys differently on build vs probe —
        # Bloom false negatives). Nulls hash as key 0 on both sides.
        import pyarrow.compute as pc

        v64 = arr.cast(pa.int64()) if arr.type != pa.int64() else arr
        if v64.null_count:
            v64 = pc.fill_null(v64, 0)
        v = v64.to_numpy(zero_copy_only=False)
    else:
        v = np.asarray(arr)
    return _splitmix64(np.ascontiguousarray(v, dtype=np.int64).view(np.uint64))


class BloomFilter:
    """Fixed-size mergeable Bloom filter over int64/string keys.

    ``bits`` is a packed uint64 array (m = len(bits)·64 bit positions);
    two filters with equal (m, k) merge by bitwise OR — the basis for the
    distributed build (per-block partials, driver combine).
    """

    def __init__(self, m_bits: int = 1 << 20, k: int = 5,
                 bits: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = (np.zeros((self.m + 63) // 64, dtype=np.uint64)
                     if bits is None else bits)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) probe positions via double hashing."""
        h1 = h % np.uint64(self.m)
        h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd => full cycle
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * (h2[None, :] % np.uint64(self.m))) % np.uint64(self.m)

    def add(self, arr) -> None:
        h = _key_hashes(arr)
        if h.size == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, arr) -> np.ndarray:
        """Vectorized membership: bool array, True may be false-positive,
        False is definite."""
        h = _key_hashes(arr)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        got = (self.bits[pos >> np.uint64(6)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        return got.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        return BloomFilter(self.m, self.k, self.bits | other.bits)


def build_bloom(ds, col: str, *, m_bits: int = 1 << 20,
                k: int = 5) -> BloomFilter:
    """Distributed build: each block folds its keys into a partial
    filter (one m/8-byte row leaves each task), and the partials
    OR-combine through a WORKER-side fan-in (map_batches with a batch
    size that groups ~8 partials per task, repeated until one row
    remains) — the driver maps exactly ONE m/8-byte blob, not one per
    input block (r5 10× soak finding: a driver-side OR loop over 128 ×
    64 MB partials pushed driver maxrss to 8 GB; the tree keeps it at
    one filter). Filter size is independent of input row count — this
    is the piece that scales where an exact broadcast set cannot."""

    def partial(t: pa.Table) -> pa.Table:
        f = BloomFilter(m_bits, k)
        f.add(t[col])
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        acc = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
        for raw in t["bits"].to_pylist():
            acc |= np.frombuffer(raw, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # fan-in rounds: each worker task ORs up to 8 partial blobs into
    # one; repartition re-groups the survivors until a single row holds
    # the full filter. Rounds are O(log_8 blocks) — 2 for ≤64 blocks.
    for width in (32, 4, 1):
        parts = parts.repartition(width).map_batches(
            combine, batch_format="pyarrow", batch_size=None)
    rows = parts.take_all()
    out = BloomFilter(m_bits, k)
    for r in rows:
        out.bits |= np.frombuffer(r["bits"], dtype=np.uint64)
    return out


def bloom_prune(ds, col: str, bloom: BloomFilter, *, keep: bool = True):
    """Prune ``ds`` to rows whose key *may* be in the filter (``keep=True``,
    the probe-side join prune) or whose key is PROVABLY absent
    (``keep=False`` — no false negatives, so these rows are exactly novel
    and can bypass any downstream verification shuffle). Ships the filter
    once via ``ray.put`` (object-store broadcast, resolved per actor/task —
    never per batch); downstream exact joins remove the residual false
    positives of the ``keep=True`` side."""
    import ray

    payload = (bloom.m, bloom.k, bloom.bits)
    ref = ray.put(payload) if ray.is_initialized() else None

    class Pruner:
        def __init__(self):
            m, k, bits = ray.get(ref) if ref is not None else payload
            self.bloom = BloomFilter(m, k, bits)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self.bloom.contains(t[col])
            return t.filter(pa.array(m if keep else ~m))

    return ds.map_batches(Pruner, batch_format="pyarrow", concurrency=(1, 8))
