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
(bounded by band-bucket sizes); connected components run as driver-side
union-find over the streamed edge list — the standard approach while edges
fit the driver; the iterative min-label-propagation alternative is noted in
each docstring for when they don't.
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

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: keep the min-id row per distinct ``text_col`` value.

    map_batches adds a stable 64-bit content hash; groupby(hash) co-locates
    candidates; within each (small) group, equality is verified on the real
    content, so hash collisions cannot merge distinct texts.
    Returns a Dataset with the surviving rows (original schema).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _stable_hash64(batch[text_col].to_pandas())
        return batch.append_column("_h", pa.array(h, pa.uint64()))

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # verify true equality inside the hash group (collision-safe)
        return group.sort_values(id_col).groupby(text_col, as_index=False, sort=False).first()

    out = (ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
             .groupby("_h")
             .map_groups(keep_first, batch_format="pandas"))
    return out.drop_columns(["_h"])


# ---------------------------------------------------------------- minhash ---

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable 64-bit hashes of the word k-shingles of one document."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return pd.util.hash_pandas_object(pd.Series(grams), index=False,
                                      hash_key=_HASH_KEY).to_numpy()


def minhash_signatures(texts: pd.Series, num_perm: int, shingle_k: int) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix. Per-doc loop with
    a fully vectorized (num_perm × n_shingles) inner kernel."""
    a, b = _perm_params(num_perm)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        sh = _shingle_hashes(t, shingle_k) & np.uint64(_MERSENNE)
        vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        out[i] = vals.min(axis=1)
    return out


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.8):
    """MinHash+LSH near-dup clustering.

    Pipeline: map_batches(signature) → explode (band_id, band_hash, id)
    → groupby bands → candidate pairs within buckets → estimated-Jaccard
    filter (signature agreement ≥ threshold) → union-find → Dataset of
    ``(id_col, cluster_id, keep)`` where cluster_id = min id of the
    component and keep marks the canonical survivor.

    Scale note: the edge list (not the corpus) is collected for the final
    union-find; when edges outgrow the driver, swap the last step for
    iterative min-label propagation (groupby rounds) — the band/bucket
    stages are unchanged.
    """
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_pandas().to_numpy()
        sig = minhash_signatures(texts, num_perm, shingle_k)
        band_view = sig.reshape(len(texts), bands, rows_per_band)
        # hash each band's row-slice to one bucket key
        bh = np.empty((len(texts), bands), dtype=np.uint64)
        for bi in range(bands):
            bh[:, bi] = pd.util.hash_pandas_object(
                pd.Series([v.tobytes() for v in band_view[:, bi, :]]),
                index=False, hash_key=_HASH_KEY).to_numpy()
        n = len(texts)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1)),
            "_sig": pa.array(list(np.repeat(sig, bands, axis=0))),
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "est_jaccard": pd.Series([], dtype="float64")})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["_sig"].to_numpy())
        A, B, J = [], [], []
        for i in range(len(ids)):
            agree = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            hit = np.flatnonzero(agree >= threshold)
            A.extend([ids[i]] * len(hit))
            B.extend(ids[i + 1 + hit])
            J.extend(agree[hit])
        return pd.DataFrame({"a": A, "b": B, "est_jaccard": J})

    banded = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas")
    edges = set()
    for b in pairs.iter_batches(batch_format="pandas", batch_size=65536):
        edges.update(zip(b["a"].tolist(), b["b"].tolist()))
    return _components_dataset(ds, id_col, edges)


def _components_dataset(ds, id_col: str, edges: set[tuple]):
    """Union-find over the edge list → (id, cluster_id, keep) Dataset."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {x: find(x) for x in parent}

    def label(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pandas()
        cluster = ids.map(lambda i: roots.get(i, i))
        keep = ids.to_numpy() == cluster.to_numpy()
        return pa.table({
            id_col: pa.array(ids),
            "cluster_id": pa.array(cluster),
            "keep": pa.array(keep),
        })

    return ds.map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash ---

def simhash_signatures(texts: pd.Series) -> np.ndarray:
    """64-bit simhash over whitespace tokens (uniform weights)."""
    out = np.empty(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        toks = t.split()
        if not toks:
            out[i] = 0
            continue
        th = pd.util.hash_pandas_object(pd.Series(toks), index=False,
                                        hash_key=_HASH_KEY).to_numpy()
        bits = ((th[:, None] >> bit_idx[None, :]) & 1).astype(np.int32)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((v > 0).astype(np.uint64) << bit_idx).sum())
    return out


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  max_hamming: int = 3):
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
            "band_hash": pa.array(np.stack(bands, axis=1).reshape(-1)),
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
            x = sigs[i] ^ sigs[i + 1:]
            ham = np.array([bin(v).count("1") for v in x])
            hit = np.flatnonzero(ham <= max_hamming)
            A.extend([ids[i]] * len(hit))
            B.extend(ids[i + 1 + hit])
            H.extend(ham[hit])
        return pd.DataFrame({"a": A, "b": B, "hamming": H})

    banded = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas")
    edges = set()
    for b in pairs.iter_batches(batch_format="pandas", batch_size=65536):
        edges.update(zip(b["a"].tolist(), b["b"].tolist()))
    return _components_dataset(ds, id_col, edges)


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
                      threshold: float = 0.95, seed: int = 11):
    """Near-dup by embedding cosine: random-hyperplane LSH buckets →
    exact cosine verify within buckets → union-find components.

    ``n_tables`` independent hyperplane sets bound the miss rate; a pair is
    a candidate if it agrees on all ``n_planes`` signs in ≥1 table.
    """
    rng = np.random.default_rng(seed)
    planes_per_table: list[np.ndarray] | None = None

    def to_buckets(batch: pa.Table) -> pa.Table:
        nonlocal planes_per_table
        X = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        if planes_per_table is None:
            d = X.shape[1]
            local_rng = np.random.default_rng(seed)
            planes_per_table = [local_rng.standard_normal((d, n_planes)) for _ in range(n_tables)]
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
            id_col: pa.array(np.repeat(ids, n_tables)),
            "band_id": pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
            "band_hash": pa.array(keys.reshape(-1)),
            "_vec": pa.array(list(np.repeat(Xn, n_tables, axis=0))),
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        ids = g[id_col].to_numpy()
        V = np.stack(g["_vec"].to_numpy())
        S = V @ V.T
        iu = np.triu_indices(len(ids), k=1)
        hit = np.flatnonzero(S[iu] >= threshold)
        return pd.DataFrame({"a": ids[iu[0][hit]], "b": ids[iu[1][hit]],
                             "cosine": S[iu][hit]})

    bucketed = ds.map_batches(to_buckets, batch_format="pyarrow")
    pairs = bucketed.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas")
    edges = set()
    for b in pairs.iter_batches(batch_format="pandas", batch_size=65536):
        edges.update(zip(b["a"].tolist(), b["b"].tolist()))
    return _components_dataset(ds, id_col, edges)
