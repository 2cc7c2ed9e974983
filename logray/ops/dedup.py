"""Deduplication operators (exact + near-dup families).

All follow the same scale shape: a vectorized ``map_batches`` stage computes
per-row keys/signatures, a ``groupby`` co-locates candidates (the only
shuffle, keyed by hash so it partitions evenly), and verification happens
inside small groups — the full corpus is never pairwise-compared.

- exact_dedup        : content hash → group → keep first (hash-partitioned)
- minhash_lsh_dedup  : shingles → minhash sig → band buckets → candidate
                       pairs → signature-Jaccard verify → connected comps
- simhash_dedup      : 64-bit simhash → 4×16-bit pigeonhole bands →
                       hamming verify
- ngram_jaccard_pairs: exact n-gram Jaccard verification kernel (used on
                       candidate pairs; also standalone within buckets)
- embedding_neardup  : random-hyperplane LSH over unit vectors → cosine
                       verify

Candidate-pair edge lists are orders of magnitude smaller than the corpus
(bounded by band-bucket sizes); cluster labeling streams them into
``graph.connected_components``, which picks the strategy by edge count:
driver-side union-find over just the endpoints while the edge list is
small, iterative min-label propagation (fully distributed) when it isn't —
so a high-duplicate-rate corpus never collects its edges on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HASH_KEY = "0123456789123456"  # pandas default; fixed => cross-process stable


def _stable_hash64(s: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(s.fillna(""), index=False, hash_key=_HASH_KEY).to_numpy()


# ------------------------------------------------------------------ exact ---

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                cache_corpus: bool = False):
    """Exact dedup: keep the min-id row per distinct ``text_col`` value.

    Scale shape: a stable 64-bit content hash per row, then a grouped
    COUNT over hashes (partial-aggregated — the shuffle moves one row per
    hash per block). Hashes seen once are provably unique texts and pass
    through with **no shuffle of their content at all**; only rows in
    duplicated hash buckets (bounded by the corpus duplicate rate) are
    co-located and verified on the real text (collision-safe keep-first).
    Avoids both a full-text shuffle and per-singleton-group Python
    overhead. Returns a Dataset with the surviving rows (original schema).

    The three consumers (count pass, unique split, duplicate split) each
    re-execute the upstream scan + hash by default — one crc-speed pass
    each over an (already column-pruned) source — instead of pinning the
    hashed corpus INCLUDING ITS TEXT in the object store for the whole
    run, which at 100 TB is a corpus-sized spill residency.
    ``cache_corpus=True`` restores the pin for small inputs or expensive
    non-re-readable upstreams.
    """
    from ray.data.aggregate import Sum

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _stable_hash64(batch[text_col].to_pandas()).view(np.int64)
        return batch.append_column("_h", pa.array(h, pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    if cache_corpus:
        hashed = hashed.materialize()

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("_h").aggregate([("_h", "count")])
        return pa.table({"_h": g["_h"], "n": g["_h_count"]})

    counts = (hashed.map_batches(partial_counts, batch_format="pyarrow")
              .groupby("_h").aggregate(Sum("n", alias_name="n")))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select(["_h"]),
        batch_format="pyarrow").to_pandas()
    hot_keys = np.sort(hot["_h"].to_numpy()) if len(hot) else np.zeros(0, np.int64)

    ref = None
    try:
        import ray

        if ray.is_initialized():
            ref = ray.put(hot_keys)
    except Exception:
        ref = None

    def split(batch: pa.Table, keep_hot: bool) -> pa.Table:
        keys = hot_keys if ref is None else __import__("ray").get(ref)
        if len(keys) == 0:
            m = np.zeros(batch.num_rows, bool)
        else:
            h = batch["_h"].to_numpy(zero_copy_only=False)
            idx = np.clip(np.searchsorted(keys, h), 0, len(keys) - 1)
            m = keys[idx] == h
        return batch.filter(pa.array(m if keep_hot else ~m))

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # verify true equality inside the hash bucket (collision-safe);
        # dropna=False: null-text rows form a group too (SQL GROUP BY
        # semantics — pandas would silently drop the NaN key)
        return (group.sort_values(id_col)
                .groupby(text_col, as_index=False, sort=False, dropna=False).first())

    uniques = hashed.map_batches(split, fn_kwargs={"keep_hot": False},
                                 batch_format="pyarrow")
    dup_survivors = (hashed.map_batches(split, fn_kwargs={"keep_hot": True},
                                        batch_format="pyarrow")
                     .groupby("_h").map_groups(keep_first, batch_format="pandas"))
    return uniques.union(dup_survivors).drop_columns(["_h"])


# ---------------------------------------------------------------- minhash ---

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_ROLL = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _flat_word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-split all docs and hash every word in ONE pass.

    Accepts an Arrow array/chunked array or a pandas Series. Returns
    ``(word_hashes uint64, offsets int64)`` where doc d's words span
    ``word_hashes[offsets[d]:offsets[d+1]]``."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .text import split_whitespace_safe

    arr = texts if isinstance(texts, (_pa.Array, _pa.ChunkedArray)) else _pa.array(
        texts.fillna("").astype(str).tolist(), _pa.string())
    if isinstance(arr, _pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = _pc.fill_null(arr, "")
    split = split_whitespace_safe(arr)
    flat_words = split.flatten()
    offsets = split.offsets.to_numpy().astype(np.int64)
    # Arrow's splitter keeps empty tokens around whitespace runs; drop them
    # (str.split() semantics) and remap offsets via a prefix sum.
    nonempty = _pc.not_equal(flat_words, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        cs = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        offsets = cs[offsets]
        flat_words = flat_words.filter(_pa.array(nonempty))
    wh = pd.util.hash_pandas_object(
        flat_words.to_pandas(), index=False, hash_key=_HASH_KEY).to_numpy()
    return wh, offsets


def _flat_shingle_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Corpus-level shingling, no per-doc Python loop.

    Returns ``(flat, starts)``: ``flat`` holds the 64-bit rolling hashes of
    every word k-shingle of every document, grouped contiguously by doc;
    ``starts`` are the start offsets per doc (len n_docs, for reduceat).
    Word hashes come from one ``hash_pandas_object`` pass over the flattened
    split; k-gram hashes fold k consecutive word hashes with a wrapping
    multiply-add (k vectorized passes). Docs with < k words contribute one
    shingle folding all their words (empty doc => hash of nothing = 0)."""
    wh, offsets = _flat_word_hashes(texts)
    n_words = len(wh)
    lens = np.diff(offsets)
    full = lens >= k                      # docs with >= k words: sliding k-grams
    n_sh = np.where(full, lens - k + 1, 1)
    starts = np.concatenate(([0], np.cumsum(n_sh)))[:-1]

    # sliding k-gram hashes over the whole flat word stream (wrapping)
    with np.errstate(over="ignore"):
        if n_words >= k:
            acc = np.zeros(n_words - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = acc * _ROLL + wh[j:n_words - k + 1 + j]
        else:
            acc = np.zeros(0, dtype=np.uint64)

        total = int(n_sh.sum())
        flat = np.zeros(total, dtype=np.uint64)
        # full docs: shingle t of doc d lives at acc[offsets[d] + t]
        src = (np.arange(total) - np.repeat(starts, n_sh)
               + np.repeat(offsets[:-1], n_sh))
        m = np.repeat(full, n_sh)
        flat[m] = acc[src[m]]
        # short docs: fold all words into one hash (rare path, tiny loop)
        for d in np.flatnonzero(~full):
            h = np.uint64(0)
            for j in range(offsets[d], offsets[d + 1]):
                h = h * _ROLL + wh[j]
            flat[starts[d]] = h
    return flat, starts


def minhash_signatures(texts, num_perm: int, shingle_k: int,
                       perm_chunk: int = 16) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix, fully vectorized:
    one (perm_chunk × total_shingles) multiply-add per chunk followed by
    ``np.minimum.reduceat`` at doc boundaries. Permutations use wrapping
    64-bit universal hashing (a*x+b mod 2^64)."""
    a, b = _perm_params(num_perm)
    flat, starts = _flat_shingle_hashes(texts, shingle_k)
    n_docs = len(starts)
    out = np.empty((n_docs, num_perm), dtype=np.uint64)
    if len(flat) == 0:
        out[:] = 0
        return out
    with np.errstate(over="ignore"):
        for p0 in range(0, num_perm, perm_chunk):
            p1 = min(p0 + perm_chunk, num_perm)
            vals = a[p0:p1, None] * flat[None, :] + b[p0:p1, None]
            out[:, p0:p1] = np.minimum.reduceat(vals, starts, axis=1).T
    return out


def _minhash_sig_batch(batch: pa.Table, *, text_col: str, id_col: str,
                       num_perm: int, bands: int, shingle_k: int,
                       negate_ids: bool = False) -> pa.Table:
    """Shared per-batch MinHash kernel: per-doc signature + per-band
    bucket hash (band row-slices folded with a wrapping multiply-add).
    ``negate_ids`` sign-codes ids to ``-(id+1)`` — the cross-corpus
    marker used by ``minhash_decontaminate``."""
    rows_per_band = num_perm // bands
    if batch.num_rows == 0:  # keep the schema typed on empty blocks
        id_type = pa.int64() if negate_ids else batch.schema.field(id_col).type
        return pa.table({
            id_col: pa.array([], id_type),
            "_sig": pa.array([], pa.list_(pa.uint64())),
            "_bh": pa.array([], pa.list_(pa.int64())),
        })
    texts = batch[text_col]
    ids = batch[id_col].to_pandas().to_numpy()
    if negate_ids:
        ids = -(ids.astype(np.int64) + 1)
    sig = minhash_signatures(texts, num_perm, shingle_k)
    band_view = sig.reshape(len(texts), bands, rows_per_band)
    bh = np.zeros((len(texts), bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows_per_band):
            bh = bh * _ROLL + band_view[:, :, r]
    return pa.table({
        id_col: pa.array(ids),
        "_sig": pa.array(list(sig)),
        "_bh": pa.array(list(bh.view(np.int64))),  # int64 bits: uint64 overflows Ray aggregates
    })


def _explode_bands(batch: pa.Table, *, id_col: str, bands: int,
                   carry: tuple[str, ...] = ()) -> pa.Table:
    """Shared band explode: per-doc ``_bh`` list → one narrow
    (id, band_id, band_hash) row per band — the only rows that enter the
    bucket-count shuffle; signatures never ride it.

    ``carry`` names extra per-doc columns (e.g. ``_sig``) to replicate onto
    each band row via a vectorized ``take`` — used by the VERIFY pass,
    which filters to hot buckets *before* its exchange so only
    duplicate-rate-bounded rows pay the replication."""
    n = batch.num_rows
    ids = batch[id_col].to_pandas().to_numpy()
    if n == 0:
        bh = np.zeros((0, bands), dtype=np.int64)
    else:
        bh = np.stack(batch["_bh"].to_pandas().to_numpy())
    cols = {
        id_col: pa.array(np.repeat(ids, bands), batch.schema.field(id_col).type),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
    }
    if carry:
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        for c in carry:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(rep)
    return pa.table(cols)


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.8,
                      cc_driver_threshold: int = 2_000_000,
                      hot_broadcast_threshold: int = 4_000_000):
    """MinHash+LSH near-dup clustering.

    Pipeline: map_batches(signature) → explode (band_id, band_hash, id)
    → groupby bands → candidate pairs within buckets → estimated-Jaccard
    filter (signature agreement ≥ threshold) → union-find → Dataset of
    ``(id_col, cluster_id, keep)`` where cluster_id = min id of the
    component and keep marks the canonical survivor.

    Scale shape: signatures ride ONCE per doc in a compact per-doc table
    (``doc_id, _sig[num_perm], 16 band hashes``, no text) — the only
    materialization, a deliberate bounded cache (~0.6 KB/doc) that spares
    three recomputations of the signature pass. The exploded band stream
    that goes through the bucket-count shuffle carries only
    (id, band_id, band_hash) — never the 512-byte signature. The verify
    pass re-explodes WITH the signature column but filters to hot (≥2
    member) buckets *before* its groupby exchange, so signature bytes are
    shuffled only for duplicate-rate-bounded rows and nothing O(corpus)
    is ever collected on the driver or broadcast. Clustering streams
    the pair Dataset into ``graph.connected_components``: up to
    ``cc_driver_threshold`` edges a driver union-find over the endpoints
    wins; above it the fully-distributed min-label propagation takes over
    automatically — the band/bucket stages are unchanged either way.
    """
    sig_tbl = ds.map_batches(
        _minhash_sig_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, num_perm=num_perm,
                       bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow").materialize()
    banded = sig_tbl.map_batches(_explode_bands,
                                 fn_kwargs=dict(id_col=id_col, bands=bands),
                                 batch_format="pyarrow")
    banded_sig = sig_tbl.map_batches(
        _explode_bands, fn_kwargs=dict(id_col=id_col, bands=bands,
                                       carry=("_sig",)),
        batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "est_jaccard": pd.Series([], dtype="float64")})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["_sig"].to_numpy()).astype(np.uint64)
        A, B, J = [], [], []
        for i in range(len(ids)):
            agree = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            hit = np.flatnonzero(agree >= threshold)
            A.extend([ids[i]] * len(hit))
            B.extend(ids[i + 1 + hit])
            J.extend(agree[hit])
        return pd.DataFrame({"a": A, "b": B, "est_jaccard": J})

    pairs = _hot_bucket_pairs(
        banded, pairs_in_bucket, banded_verify=banded_sig,
        materialize_banded=False,
        hot_broadcast_threshold=hot_broadcast_threshold,
        verify_schema=_verify_schema(sig_tbl, id_col, pa.list_(pa.uint64())))
    return _components_dataset(ds, id_col, pairs,
                               driver_threshold=cc_driver_threshold)


def _verify_schema(sig_tbl, id_col: str, sig_type: pa.DataType) -> pa.Schema:
    """Static schema of an ``_explode_bands(carry=('_sig',))`` stream —
    passed to the distributed hot-filter semi-join so it never has to
    peek-execute the lazy verify stream to discover it."""
    id_type = dict(zip(sig_tbl.schema().names, sig_tbl.schema().types))[id_col]
    if not isinstance(id_type, pa.DataType):
        id_type = pa.from_numpy_dtype(id_type)
    return pa.schema([(id_col, id_type), ("band_id", pa.int32()),
                      ("band_hash", pa.int64()), ("_sig", sig_type)])


def _fold_bucket_key(t: pa.Table) -> np.ndarray:
    """(band_hash, band_id) folded to one uint64 key per row."""
    bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    bi = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        return bh * _ROLL + bi


def _hot_bucket_pairs(banded, pairs_fn, *, banded_verify=None,
                      materialize_banded=True, verify_schema=None,
                      hot_broadcast_threshold: int = 4_000_000):
    """Run ``pairs_fn`` only on band buckets with ≥2 members.

    A naive ``groupby(bucket).map_groups`` pays per-group overhead on every
    bucket — and almost all buckets are singletons (non-duplicate docs).
    Instead: (1) grouped count per bucket, combined WITHIN each batch
    first so the count shuffle carries per-batch bucket cardinality, not
    the full band stream, (2) filter the verify stream down to the ≥2
    "hot" buckets, (3) ``map_groups`` over the survivors only.

    ``banded_verify`` is the stream the verify groupby runs over: it
    carries whatever per-row payload ``pairs_fn`` reads (e.g. the ``_sig``
    minhash signature column). Because the hot filter runs BEFORE the
    verify exchange, payload bytes are only replicated/shuffled for rows
    in duplicate-rate-bounded buckets — nothing O(corpus) is ever
    collected on the driver or broadcast (the round-2 verify path
    collected all survivors + a dense signature matrix driver-side; this
    shape replaces it). Defaults to ``banded`` itself.

    The hot filter itself is adaptive: up to ``hot_broadcast_threshold``
    hot-bucket KEYS (8 bytes each — bounded by the number of duplicated
    buckets, not docs) they are collected, sorted and broadcast via
    ``ray.put`` with a vectorized searchsorted membership test (zero extra
    exchange); above it the filter becomes a fully distributed
    ``hash_semi_join`` against the hot-count Dataset, so even a
    pathological corpus where most buckets are hot never lands keys on
    the driver.

    ``materialize_banded=False`` skips pinning the exploded band stream in
    the object store: callers whose ``banded`` is a cheap map off an
    ALREADY-materialized per-doc table (minhash / embedding / decontaminate)
    re-run only that map for the two consumers, saving a full band-stream
    materialization. Leave True when ``banded`` hangs off an unmaterialized
    source (re-execution would re-read + re-hash the corpus).

    ``pairs_fn`` is a plain group function ``pd.DataFrame → pd.DataFrame``
    over one (band_id, band_hash) bucket of the verify stream."""
    import pyarrow.compute as pc

    from .relational import grouped_agg

    if materialize_banded:
        banded = banded.materialize()  # reused by the count and filter passes
    if banded_verify is None:
        banded_verify = banded

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"band_id": t["band_id"],
                             "band_hash": t["band_hash"],
                             "n": pa.array([], pa.int64())})
        g = t.select(["band_id", "band_hash"]).group_by(
            ["band_id", "band_hash"]).aggregate([("band_hash", "count")])
        return pa.table({"band_id": g["band_id"],
                         "band_hash": g["band_hash"],
                         "n": pc.cast(g["band_hash_count"], pa.int64())})

    counts = grouped_agg(
        banded.map_batches(count_partial, batch_format="pyarrow"),
        ["band_id", "band_hash"], {"n": ("n", "sum")})
    # materialized: tiny (keys of duplicated buckets only) and consumed by
    # both the count() probe and whichever filter path wins below
    hot_counts = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select(["band_id", "band_hash"]),
        batch_format="pyarrow").materialize()
    n_hot = hot_counts.count()

    if n_hot > hot_broadcast_threshold:
        # distributed path: co-locate verify rows with hot keys via ONE
        # keys-only exchange — the driver never sees a single bucket key
        from .relational import hash_semi_join

        survivors = hash_semi_join(
            banded_verify, hot_counts, ["band_id", "band_hash"],
            left_schema=(verify_schema if verify_schema is not None
                         else banded_verify.schema()),
            right_schema=pa.schema([("band_id", pa.int32()),
                                    ("band_hash", pa.int64())]))
    else:
        hot = hot_counts.to_pandas()
        hot_keys = (_fold_bucket_key(pa.Table.from_pandas(hot))
                    if len(hot) else np.zeros(0, np.uint64))
        hot_keys.sort()

        ref = None
        try:
            import ray

            if ray.is_initialized():
                ref = ray.put(hot_keys)
        except Exception:
            ref = None

        def keep_hot(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            if ref is not None:
                import ray as _r

                keys = _r.get(ref)
            else:
                keys = hot_keys
            if len(keys) == 0:
                return t.slice(0, 0)
            k = _fold_bucket_key(t)
            idx = np.clip(np.searchsorted(keys, k), 0, len(keys) - 1)
            return t.filter(pa.array(keys[idx] == k))

        survivors = banded_verify.map_batches(keep_hot, batch_format="pyarrow")

    # the verify groupby is the survivors' ONLY consumer — no materialize
    return survivors.groupby(["band_id", "band_hash"]).map_groups(
        pairs_fn, batch_format="pandas")


def _components_dataset(ds, id_col: str, pairs, *,
                        driver_threshold: int = 2_000_000):
    """Duplicate-pair clustering → (id, cluster_id, keep) Dataset.

    Delegates to ``graph.connected_components``, which is size-adaptive:
    small edge lists (≤ its ``driver_threshold``) run a driver union-find
    over just the edge endpoints; larger ones stay fully distributed via
    iterative min-label propagation. Either way, the candidate-PAIR
    Dataset streams in without ever being collected into a driver-side
    Python set, so a high-duplicate-rate corpus can't blow the driver.
    ``pairs`` needs columns ``a``/``b`` (extra score columns are ignored).
    """
    from .graph import connected_components

    ids = ds.map_batches(lambda t: pa.table({id_col: t[id_col]}),
                         batch_format="pyarrow")
    cc = connected_components(pairs, a_col="a", b_col="b",
                              nodes=ids, node_col=id_col,
                              driver_threshold=driver_threshold)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t["node"],
            "cluster_id": t["cluster_id"],
            "keep": pc.equal(t["node"], t["cluster_id"]),
        })

    return cc.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash ---

def simhash_signatures(texts) -> np.ndarray:
    """64-bit simhash over whitespace tokens (uniform weights).

    Vectorized across the whole batch: words are hashed in one pass; each
    bit's per-doc popcount comes from a prefix-sum differenced at doc
    boundaries (64 cumsum passes over the flat word-hash array, no
    per-doc Python loop)."""
    wh, offsets = _flat_word_hashes(texts)
    lens = np.diff(offsets)
    n_docs = len(lens)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(wh) == 0:
        return out
    half = lens.astype(np.int64)  # bit set iff popcount*2 > n_words
    for b in range(64):
        bits = ((wh >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(bits)))
        cnt = csum[offsets[1:]] - csum[offsets[:-1]]
        out |= ((2 * cnt > half).astype(np.uint64) << np.uint64(b))
    out[lens == 0] = 0
    return out


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  max_hamming: int = 3, cc_driver_threshold: int = 2_000_000):
    """SimHash near-dup: 4×16-bit pigeonhole bands (any pair within hamming
    ≤3 of a 64-bit hash agrees exactly on ≥1 of 4 bands) → verify hamming
    within buckets → union-find components (same contract as minhash)."""

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_pandas().to_numpy()
        sig = simhash_signatures(texts)
        n = len(ids)
        bands = [(sig >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)]
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4)),
            "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "band_hash": pa.array(np.stack(bands, axis=1).reshape(-1).view(np.int64)),
            "_sig": pa.array(np.repeat(sig, 4)),
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sigs = g["_sig"].to_numpy().astype(np.uint64)
        A, B, H = [], [], []
        for i in range(len(ids) - 1):
            x = np.ascontiguousarray(sigs[i] ^ sigs[i + 1:])
            # vectorized popcount: 8 bytes/word unpacked to bits, summed
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                                axis=1).sum(axis=1).astype(np.int64)
            hit = np.flatnonzero(ham <= max_hamming)
            A.extend([ids[i]] * len(hit))
            B.extend(ids[i + 1 + hit])
            H.extend(ham[hit])
        return pd.DataFrame({"a": A, "b": B, "hamming": H})

    banded = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = _hot_bucket_pairs(banded, pairs_in_bucket)
    return _components_dataset(ds, id_col, pairs,
                               driver_threshold=cc_driver_threshold)


# ----------------------------------------------------------- ngram jaccard --

def char_ngrams(text: str, n: int = 3) -> set[str]:
    t = " ".join(text.split()).lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = char_ngrams(a, n), char_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def ngram_pairs_group_fn(text_col: str = "text", id_col: str = "doc_id",
                         *, n: int = 3, threshold: float = 0.5):
    """Group kernel behind ``ngram_jaccard_pairs``: all-pairs exact
    char-n-gram Jaccard within ONE bucket DataFrame → (a, b, jaccard)
    rows with a < b and jaccard ≥ threshold. Exposed so banded callers
    (e.g. ``queries.ngram_dup_pairs_documents``) can run it under
    ``_hot_bucket_pairs`` without replicating text into cold buckets."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].tolist()
        texts = g[text_col].tolist()
        grams = [char_ngrams(t or "", n) for t in texts]
        A, B, J = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                si, sj = grams[i], grams[j]
                if not si and not sj:
                    continue
                inter = len(si & sj)
                jac = inter / (len(si) + len(sj) - inter)
                if jac >= threshold:
                    A.append(ids[i])
                    B.append(ids[j])
                    J.append(jac)
        return pd.DataFrame({"a": pd.Series(A, dtype="int64"),
                             "b": pd.Series(B, dtype="int64"),
                             "jaccard": pd.Series(J, dtype="float64")})

    return pairs


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                        bucket_col: str | None = None, n: int = 3,
                        threshold: float = 0.5):
    """Exact char-n-gram Jaccard over pairs within buckets.

    ``bucket_col`` keys the groupby that bounds the pairwise work (e.g. a
    band hash from minhash/simhash, or a metadata column like source).
    With None, a single global bucket is used — only for small inputs.
    Returns Dataset (a, b, jaccard) with a < b and jaccard ≥ threshold.
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        texts = g[text_col].tolist()
        grams = [char_ngrams(t or "", n) for t in texts]
        A, B, J = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                si, sj = grams[i], grams[j]
                if not si and not sj:
                    continue
                inter = len(si & sj)
                jac = inter / (len(si) + len(sj) - inter)
                if jac >= threshold:
                    A.append(ids[i])
                    B.append(ids[j])
                    J.append(jac)
        return pd.DataFrame({"a": pd.Series(A, dtype="int64"),
                             "b": pd.Series(B, dtype="int64"),
                             "jaccard": pd.Series(J, dtype="float64")})

    if bucket_col is None:
        def one_bucket(batch: pa.Table) -> pa.Table:
            return batch.append_column("_bucket", pa.array(np.zeros(batch.num_rows, np.int32)))
        ds = ds.map_batches(one_bucket, batch_format="pyarrow")
        bucket_col = "_bucket"
    return ds.groupby(bucket_col).map_groups(pairs, batch_format="pandas")


# ------------------------------------------------------- embedding neardup --

def embedding_neardup(ds, vec_col: str = "embedding", id_col: str = "vec_id", *,
                      n_planes: int = 16, n_tables: int = 4, dim: int | None = None,
                      threshold: float = 0.95, seed: int = 11,
                      cc_driver_threshold: int = 2_000_000):
    """Near-dup by embedding cosine: random-hyperplane LSH buckets →
    exact cosine verify within buckets → union-find components.

    ``n_tables`` independent hyperplane sets bound the miss rate; a pair is
    a candidate if it agrees on all ``n_planes`` signs in ≥1 table.
    """
    from .similarity import _vec_matrix

    def per_doc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "_sig": pa.array([], pa.list_(pa.float64())),
                "_bh": pa.array([], pa.list_(pa.int64())),
            })
        X = _vec_matrix(batch, vec_col)
        local_rng = np.random.default_rng(seed)
        planes_per_table = [local_rng.standard_normal((X.shape[1], n_planes))
                            for _ in range(n_tables)]
        norm = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = X / np.maximum(norm, 1e-12)
        ids = batch[id_col].to_pandas().to_numpy()
        n = len(ids)
        keys = np.empty((n, n_tables), dtype=np.uint64)
        two = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        for t, P in enumerate(planes_per_table):
            signs = (Xn @ P) > 0
            keys[:, t] = (signs.astype(np.uint64) * two[None, :]).sum(axis=1)
        return pa.table({
            id_col: pa.array(ids),
            "_sig": pa.array(list(Xn)),  # normalized vector, broadcast to verify
            "_bh": pa.array(list(keys.view(np.int64))),
        })

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[id_col].to_pandas().to_numpy()
        if n == 0:
            bh = np.zeros((0, n_tables), dtype=np.int64)
        else:
            bh = np.stack(batch["_bh"].to_pandas().to_numpy())
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_tables), batch.schema.field(id_col).type),
            "band_id": pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        })

    sig_tbl = ds.map_batches(per_doc, batch_format="pyarrow").materialize()
    bucketed = sig_tbl.map_batches(explode, batch_format="pyarrow")
    bucketed_sig = sig_tbl.map_batches(
        _explode_bands, fn_kwargs=dict(id_col=id_col, bands=n_tables,
                                       carry=("_sig",)),
        batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        ids = g[id_col].to_numpy()
        V = np.stack(g["_sig"].to_numpy()).astype(np.float64)
        S = V @ V.T
        iu = np.triu_indices(len(ids), k=1)
        hit = np.flatnonzero(S[iu] >= threshold)
        return pd.DataFrame({"a": ids[iu[0][hit]], "b": ids[iu[1][hit]],
                             "cosine": S[iu][hit]})

    pairs = _hot_bucket_pairs(
        bucketed, pairs_in_bucket, banded_verify=bucketed_sig,
        materialize_banded=False,
        verify_schema=_verify_schema(sig_tbl, id_col, pa.list_(pa.float64())))
    return _components_dataset(ds, id_col, pairs,
                               driver_threshold=cc_driver_threshold)


def minhash_decontaminate(train, bench, text_col: str = "text",
                          id_col: str = "doc_id", *, num_perm: int = 64,
                          bands: int = 16, shingle_k: int = 5,
                          threshold: float = 0.8):
    """Cross-corpus FUZZY decontamination: training docs that are MinHash
    near-duplicates of any held-out benchmark doc (the fuzzy counterpart
    of exact n-gram overlap — catches paraphrased/lightly-edited leakage
    that exact n-grams miss).

    Reuses the LSH machinery of ``minhash_lsh_dedup`` with one twist:
    benchmark ids are mapped to ``-(id+1)`` before the shared band
    pipeline, so both corpora ride ONE signature table / ONE band shuffle
    / ONE hot-bucket prefilter, and the verify kernel recognizes a
    cross-corpus candidate by sign — only train×bench pairs are scored
    (train×train agreement inside a hot bucket is skipped, not clustered;
    dedup-within-corpus is a separate op). Returns one row per
    contaminated train doc: ``(id_col, bench_id, est_jaccard)`` with the
    best-matching benchmark doc.
    """
    kw = dict(text_col=text_col, id_col=id_col, num_perm=num_perm,
              bands=bands, shingle_k=shingle_k)
    # ids must be int64 on BOTH sides so the union schema matches the
    # sign-coded bench ids
    sig_tbl = (train.map_batches(
                   lambda t: pa.table({**{c: t[c] for c in t.column_names
                                          if c != id_col},
                                       id_col: pc.cast(t[id_col], pa.int64())}),
                   batch_format="pyarrow")
               .map_batches(_minhash_sig_batch, fn_kwargs=kw,
                            batch_format="pyarrow")
               .union(bench.map_batches(_minhash_sig_batch,
                                        fn_kwargs=dict(kw, negate_ids=True),
                                        batch_format="pyarrow"))
               .materialize())
    banded = sig_tbl.map_batches(_explode_bands,
                                 fn_kwargs=dict(id_col=id_col, bands=bands),
                                 batch_format="pyarrow")
    banded_sig = sig_tbl.map_batches(
        _explode_bands, fn_kwargs=dict(id_col=id_col, bands=bands,
                                       carry=("_sig",)),
        batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "est_jaccard": pd.Series([], dtype="float64")})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        is_tr = g[id_col].to_numpy() >= 0
        if not is_tr.any() or is_tr.all():
            return empty
        sigs = np.stack(g["_sig"].to_numpy()).astype(np.uint64)
        ids = g[id_col].to_numpy()
        tr, ts = ids[is_tr], sigs[is_tr]
        be, bs = ids[~is_tr], sigs[~is_tr]
        # (train × bench) agreement matrix — bounded by hot-bucket sizes
        agree = (ts[:, None, :] == bs[None, :, :]).mean(axis=2)
        ti, bi = np.nonzero(agree >= threshold)
        if len(ti) == 0:
            return empty
        return pd.DataFrame({"a": tr[ti], "b": be[bi],
                             "est_jaccard": agree[ti, bi]})

    pairs = _hot_bucket_pairs(
        banded, pairs_in_bucket, banded_verify=banded_sig,
        materialize_banded=False,
        verify_schema=_verify_schema(sig_tbl, id_col, pa.list_(pa.uint64())))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # best benchmark match per train doc; decode bench ids
        df = df.sort_values(["est_jaccard", "b"], ascending=[False, True])
        df = df.drop_duplicates("a")
        return pd.DataFrame({id_col: df["a"].to_numpy(),
                             "bench_id": (-df["b"].to_numpy() - 1),
                             "est_jaccard": df["est_jaccard"].to_numpy()})

    from .window import _bucketed_apply

    return _bucketed_apply(pairs, "a", finish)
