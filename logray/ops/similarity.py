"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``: brute-force cosine top-k — the exact baseline. The query
  matrix is broadcast once (``ray.put`` driver-side / closure capture);
  each batch does one numpy matmul and emits only its local top-k rows,
  so the combine step sees num_blocks × k candidates, never the corpus.
- ``IvfIndex``: the scale path — k-means coarse quantizer built on a
  sample (driver, numpy), then batches assign rows to their nearest
  centroid bucket; a query probes only ``nprobe`` buckets. The fitted
  index is tiny (centroids matrix) and broadcast to workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _vec_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix.

    Zero-copy fast path: uniform-length lists reshape straight from the
    flattened values buffer (no per-row object materialization)."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0))
    offsets = col.offsets.to_numpy()
    lens = np.diff(offsets)
    if len(lens) and (lens == lens[0]).all() and offsets[0] == 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(lens), lens[0]).astype(np.float64)
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


def ann_topk(ds, queries: np.ndarray, k: int = 10, *,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k for each query row of ``queries`` (q × d).

    Returns a small pandas DataFrame (query_id, vec_id, cosine, rank),
    rank 1 = best. Per-batch: one matmul + argpartition; driver combine:
    q × (blocks·k) candidate rows.
    """
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    nq = Q.shape[0]

    _EMPTY = pa.table({"query_id": pa.array([], pa.int64()),
                       "vec_id": pa.array([], pa.int64()),
                       "cosine": pa.array([], pa.float64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        X = _normalize(_vec_matrix(batch, vec_col))
        ids = batch[id_col].to_pandas().to_numpy()
        S = X @ Q.T  # (n, q)
        kk = min(k, S.shape[0])
        part = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, q)
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(nq):
            sel = part[:, qi]
            rows["query_id"].extend([qi] * len(sel))
            rows["vec_id"].extend(ids[sel])
            rows["cosine"].extend(S[sel, qi])
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "cosine": pa.array(rows["cosine"], pa.float64()),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cosine", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


class IvfIndex:
    """IVF (inverted-file) coarse index: k-means centroids over a sample.

    ``fit`` runs a few Lloyd iterations on the driver (sample must fit —
    it's a uniform random_sample of the corpus, small by construction).
    ``assign_stage`` is a map_batches body labeling rows with their
    nearest centroid; ``search`` probes the ``nprobe`` closest buckets.
    """

    def __init__(self, n_lists: int = 16, iters: int = 10, seed: int = 5):
        self.n_lists = n_lists
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IvfIndex":
        X = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.default_rng(self.seed)
        k = min(self.n_lists, len(X))
        C = X[rng.choice(len(X), k, replace=False)]
        for _ in range(self.iters):
            assign = (X @ C.T).argmax(axis=1)
            for j in range(k):
                m = assign == j
                if m.any():
                    C[j] = X[m].mean(axis=0)
            C = _normalize(C)
        self.centroids = C
        return self

    def assign_stage(self, vec_col: str = "embedding"):
        C = self.centroids
        assert C is not None, "fit() first"

        def assign(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column("ivf_list", pa.array([], pa.int32()))
            X = _normalize(_vec_matrix(batch, vec_col))
            lists = (X @ C.T).argmax(axis=1).astype(np.int32)
            return batch.append_column("ivf_list", pa.array(lists))

        return assign

    def search(self, assigned_ds, queries: np.ndarray, k: int = 10, *,
               nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"):
        """Probe the nprobe nearest lists per query; exact cosine inside."""
        C = self.centroids
        assert C is not None
        Q = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
        wanted: dict[int, list[int]] = {}
        for qi, lists in enumerate(probe):
            for li in lists:
                wanted.setdefault(int(li), []).append(qi)

        def local(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            lists = batch["ivf_list"].to_pandas().to_numpy()
            rows = {"query_id": [], "vec_id": [], "cosine": []}
            ids = batch[id_col].to_pandas().to_numpy()
            X = None
            for li, qis in wanted.items():
                m = np.flatnonzero(lists == li)
                if len(m) == 0:
                    continue
                if X is None:
                    X = _normalize(_vec_matrix(batch, vec_col))
                S = X[m] @ Q[qis].T
                kk = min(k, len(m))
                part = np.argpartition(-S, kk - 1, axis=0)[:kk]
                for c, qi in enumerate(qis):
                    sel = m[part[:, c]]
                    rows["query_id"].extend([qi] * len(sel))
                    rows["vec_id"].extend(ids[sel])
                    rows["cosine"].extend(S[part[:, c], c])
            return pa.table({
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            })

        cand = assigned_ds.map_batches(local, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(["query_id", "cosine", "vec_id"],
                                ascending=[True, False, True])
        out = cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
        out["rank"] = out.groupby("query_id").cumcount() + 1
        return out


def kmeans(ds, *, k: int = 8, iters: int = 10, vec_col: str = "embedding",
           seed: int = 5, sample_frac: float = 0.1, init: str = "random"):
    """Distributed Lloyd's k-means over an embedding column.

    Init: k centroids from a small driver-side random sample —
    ``init="random"`` draws them uniformly; ``init="kpp"`` runs a
    deterministic farthest-first traversal over the sample (the k-means++
    idea with argmax instead of D² sampling: Arthur & Vassilvitskii 2007),
    which provably seeds every well-separated cluster and removes the
    random-init failure mode of dropping a cluster entirely. Each
    iteration is ONE streaming pass: every block computes per-centroid
    partial (sum-vector, count) — a k×d matrix regardless of block size —
    and the driver combines the partials and updates centroids. No
    per-row data ever returns to the driver and nothing is shuffled, so
    the cost at 100 TB is iters × (one read of the corpus).

    Returns (centroids, assign_stage) where ``assign_stage`` is a
    map_batches body labeling rows with their nearest centroid in a
    ``cluster_id`` column.
    """
    import pyarrow.compute as _pc  # noqa: F401  (kept for symmetry)

    sample = ds.random_sample(sample_frac, seed=seed).take_batch(
        10_000, batch_format="pyarrow")
    X0 = _normalize(_vec_matrix(sample, vec_col))
    rng = np.random.default_rng(seed)
    k = min(k, len(X0))
    if init == "kpp":
        # farthest-first on the (normalized) sample under cosine distance
        chosen = [int(rng.integers(len(X0)))]
        mind = 1.0 - X0 @ X0[chosen[0]]
        while len(chosen) < k:
            nxt = int(np.argmax(mind))
            chosen.append(nxt)
            mind = np.minimum(mind, 1.0 - X0 @ X0[nxt])
        C = X0[chosen].copy()
    else:
        C = X0[rng.choice(len(X0), k, replace=False)].copy()

    for _ in range(iters):
        C_bcast = C  # captured by value in the closure below

        def partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"cid": pa.array([], pa.int32()),
                                 "n": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            X = _normalize(_vec_matrix(batch, vec_col))
            assign = (X @ C_bcast.T).argmax(axis=1)
            cids, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(cids), X.shape[1]))
            np.add.at(sums, inv, X)
            counts = np.bincount(inv, minlength=len(cids)).astype(np.int64)
            return pa.table({"cid": pa.array(cids.astype(np.int32)),
                             "n": pa.array(counts),
                             "vsum": pa.array(list(sums))})

        agg = pa.concat_tables(
            ds.map_batches(partials, batch_format="pyarrow")
            .iter_batches(batch_size=2 ** 20, batch_format="pyarrow"))
        cids = agg["cid"].to_numpy(zero_copy_only=False)
        counts = agg["n"].to_numpy(zero_copy_only=False)
        sums = np.stack(agg["vsum"].to_pylist()) if agg.num_rows else \
            np.zeros((0, C.shape[1]))
        newC = C.copy()
        for j in range(k):
            m = cids == j
            if counts[m].sum() > 0:
                newC[j] = sums[m].sum(axis=0) / counts[m].sum()
        C = _normalize(newC)

    centroids = C

    def assign_stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cluster_id", pa.array([], pa.int32()))
        X = _normalize(_vec_matrix(batch, vec_col))
        lab = (X @ centroids.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("cluster_id", pa.array(lab))

    return centroids, assign_stage


def semdedup(ds, *, k: int = 8, iters: int = 5, vec_col: str = "embedding",
             id_col: str = "vec_id", threshold: float = 0.95, seed: int = 5,
             cc_driver_threshold: int = 2_000_000):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means partitions the embedding space, exact pairwise cosine runs
    ONLY within each cluster, and near-duplicate components keep one
    representative (min id). Complements ``dedup.embedding_neardup``
    (random-hyperplane LSH buckets): learned clusters follow the data
    distribution, so recall doesn't depend on hash luck near the
    threshold.

    Scale shape: k-means is iters streaming passes (k×d partials, no
    shuffle); the pairwise stage shuffles each row ONCE to its cluster
    and costs Σ |cluster|² — size k so the largest cluster's vectors fit
    a worker (at web scale: k in the tens of thousands, as in the
    paper). Returns (id, cluster_id, keep) via the size-adaptive
    connected-components endpoint.
    """
    import pandas as pd

    from .dedup import _components_dataset

    _, assign = kmeans(ds, k=k, iters=iters, vec_col=vec_col, seed=seed)
    labeled = ds.map_batches(assign, batch_format="pyarrow")

    def pairs_in_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        X = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = Xn @ Xn.T
        iu = np.triu_indices(len(ids), k=1)
        hit = np.flatnonzero(S[iu[0], iu[1]] >= threshold)
        return pd.DataFrame({"a": ids[iu[0][hit]], "b": ids[iu[1][hit]]})

    pairs = (labeled.groupby("cluster_id")
             .map_groups(pairs_in_cluster, batch_format="pandas"))
    return _components_dataset(ds, id_col, pairs,
                               driver_threshold=cc_driver_threshold)


def hard_negatives(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                   label_col: str = "label"):
    """Contrastive hard-negative mining: for every vector, the most
    cosine-similar vector carrying a DIFFERENT label (ties broken by
    smaller candidate id). The reference corpus is collected once on the
    driver in id order and broadcast via ``ray.put`` — the demo-scale
    brute-force path; past broadcast size, swap the reference for the
    IVF index (same per-batch kernel against nprobe buckets).

    Returns a Dataset of ``(id_col, neg_id)``."""
    import ray

    ids, mats, labs = [], [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        ids.append(b[id_col].to_numpy(zero_copy_only=False))
        mats.append(_normalize(_vec_matrix(b, vec_col)))
        labs.append(b[label_col].to_numpy(zero_copy_only=False))
    ids = np.concatenate(ids)
    order = np.argsort(ids, kind="stable")   # argmax's first-max => lowest id
    ids = ids[order]
    R = np.concatenate(mats)[order]
    labs = np.concatenate(labs)[order]
    ref = ray.put((ids, R, labs))

    def fn(batch: pa.Table) -> pa.Table:
        rids, rmat, rlabs = ray.get(ref)
        X = _normalize(_vec_matrix(batch, vec_col))
        bid = batch[id_col].to_numpy(zero_copy_only=False)
        blab = batch[label_col].to_numpy(zero_copy_only=False)
        S = X @ rmat.T                                   # (n, N)
        S[blab[:, None] == rlabs[None, :]] = -np.inf     # same-label (and self)
        best = np.argmax(S, axis=1)
        # a row whose label covers the whole reference has no negative at
        # all (S all -inf, argmax silently 0) — drop it rather than emit a
        # same-label vector as its "hard negative"
        has_neg = ~np.isneginf(S[np.arange(len(best)), best])
        return pa.table({id_col: pa.array(bid[has_neg].astype(np.int64)),
                         "neg_id": pa.array(rids[best[has_neg]].astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")


def _codes_matrix(col, m: int) -> np.ndarray:
    """list<uint8> codes column → (n, m) uint8 matrix, zero-copy from
    the flattened values buffer (uniform length by construction)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, m), np.uint8)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat).reshape(len(col), m)


class PqIndex:
    """Product quantization (Jégou, Douze & Schmid 2011, public): split
    each d-dim vector into ``m`` subspaces of d/m dims, train a
    ``2**bits``-centroid codebook PER SUBSPACE on a driver-side sample,
    and encode every corpus vector as ``m`` uint8 codes — float32 d-dim
    → m bytes (32× at d=64, m=8), which at 100 TB decides whether the
    searchable corpus fits the object store at all (the int8 path is
    4×; PQ is the order-of-magnitude step after it).

    Search is asymmetric distance computation (ADC): per query, an
    (m × 2^bits) lookup table of subspace dot products against the
    codebooks is built ONCE; a vector's approximate cosine is the sum
    of m table lookups on its codes — the corpus floats are never
    reconstructed. Scale shape mirrors ``IvfIndex``: codebooks train
    once on a sample (driver) and broadcast by closure; ``encode_stage``
    is a stateless vectorized map; ``search`` runs per-batch LUT gather
    + partial top-k over the CODES dataset with the same small driver
    combine as ``ann_topk`` (q × blocks·k candidate rows).
    """

    def __init__(self, m: int = 8, bits: int = 8, iters: int = 10,
                 seed: int = 5):
        self.m = m
        self.bits = bits
        self.iters = iters
        self.seed = seed
        self.codebooks: np.ndarray | None = None  # (m, 2^bits, d/m)

    def fit(self, sample: np.ndarray) -> "PqIndex":
        return self.fit_raw(_normalize(np.asarray(sample,
                                                  dtype=np.float64)))

    def fit_raw(self, X: np.ndarray,
                init: np.ndarray | None = None) -> "PqIndex":
        """Train on vectors AS GIVEN (no normalization) — the residual
        space of ``IvfPqIndex`` must not be re-normalized. ``init``
        ((m, k, d/m) codebooks) warm-starts Lloyd's from an existing
        state instead of a seeded random sample — every Lloyd step is
        then non-increasing RELATIVE TO THAT STATE, the property
        ``opq_train``'s monotone-error theorem needs (a fresh random
        init is not a minimizer w.r.t. the previous iteration)."""
        X = np.asarray(X, dtype=np.float64)
        n, d = X.shape
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m}")
        ds_ = d // self.m
        k = min(2 ** self.bits, n)
        rng = np.random.default_rng(self.seed)
        books = np.empty((self.m, k, ds_))
        for s in range(self.m):
            Xs = X[:, s * ds_:(s + 1) * ds_]
            C = (init[s].copy() if init is not None
                 else Xs[rng.choice(n, k, replace=False)].copy())
            for _ in range(self.iters):
                # nearest centroid under L2 (= max dot − ||c||²/2)
                d2 = (Xs ** 2).sum(1, keepdims=True)                     - 2.0 * Xs @ C.T + (C ** 2).sum(1)
                a = d2.argmin(axis=1)
                sums = np.zeros_like(C)
                np.add.at(sums, a, Xs)
                cnt = np.bincount(a, minlength=k).astype(np.float64)
                nz = cnt > 0
                C[nz] = sums[nz] / cnt[nz, None]
            books[s] = C
        self.codebooks = books
        return self

    def _codes(self, X: np.ndarray) -> np.ndarray:
        B = self.codebooks
        n, d = X.shape
        ds_ = d // self.m
        out = np.empty((n, self.m), np.uint8)
        for s in range(self.m):
            Xs = X[:, s * ds_:(s + 1) * ds_]
            C = B[s]
            d2 = (Xs ** 2).sum(1, keepdims=True)                 - 2.0 * Xs @ C.T + (C ** 2).sum(1)
            out[:, s] = d2.argmin(axis=1).astype(np.uint8)
        return out

    def encode_stage(self, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
        assert self.codebooks is not None, "fit() first"

        def encode(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "pq_codes": pa.array(
                                     [], pa.list_(pa.uint8()))})
            X = _normalize(_vec_matrix(batch, vec_col))
            codes = self._codes(X)
            return pa.table({id_col: batch[id_col],
                             "pq_codes": pa.array(list(codes))})

        return encode

    def search(self, codes_ds, queries: np.ndarray, k: int = 10, *,
               id_col: str = "vec_id"):
        """ADC top-k over an encoded dataset; returns the same
        (query_id, vec_id, score, rank) frame shape as ``ann_topk``."""
        assert self.codebooks is not None, "fit() first"
        Q = _normalize(np.asarray(queries, dtype=np.float64))
        nq, d = Q.shape
        ds_ = d // self.m
        # per-query LUT: dot(query subvector, every subspace centroid)
        lut = np.stack([
            np.stack([Q[:, s * ds_:(s + 1) * ds_] @ self.codebooks[s].T
                      for s in range(self.m)], axis=1)  # (nq, m, k)
        ])[0]

        _EMPTY = pa.table({"query_id": pa.array([], pa.int64()),
                           id_col: pa.array([], pa.int64()),
                           "score": pa.array([], pa.float64())})

        def local_topk(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _EMPTY
            codes = _codes_matrix(batch["pq_codes"], self.m)
            ids = batch[id_col].to_pandas().to_numpy()
            rows = {"query_id": [], id_col: [], "score": []}
            sub = np.arange(self.m)
            for qi in range(nq):
                s = lut[qi][sub, codes].sum(axis=1)  # (n,) ADC scores
                kk = min(k, len(s))
                sel = np.argpartition(-s, kk - 1)[:kk]
                rows["query_id"].extend([qi] * kk)
                rows[id_col].extend(ids[sel])
                rows["score"].extend(s[sel])
            return pa.table({
                "query_id": pa.array(rows["query_id"], pa.int64()),
                id_col: pa.array(rows[id_col], pa.int64()),
                "score": pa.array(rows["score"], pa.float64())})

        cand = codes_ds.map_batches(local_topk,
                                    batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(["query_id", "score", id_col],
                                ascending=[True, False, True])
        out = cand.groupby("query_id", as_index=False).head(k)             .reset_index(drop=True)
        out["rank"] = out.groupby("query_id").cumcount() + 1
        return out


class IvfPqIndex:
    """IVF-PQ (the canonical billion-scale composition, Jégou et al.
    2011 / FAISS IVFPQ shape): an IVF coarse quantizer routes each
    vector to one of ``n_lists`` inverted lists, and PQ encodes the
    RESIDUAL (x − coarse centroid) — residuals concentrate near the
    origin, so the same code budget quantizes far finer than raw PQ.
    Search probes the ``nprobe`` closest lists per query and scores
    candidates as q·c_list + ADC(residual) — one LUT per query, no
    float reconstruction, and only probed-list rows are touched (the
    candidate set shrinks ~n_lists/nprobe-fold vs flat PQ).

    Scale shape: both quantizers train on one driver-side sample and
    broadcast by closure; ``encode_stage`` is a stateless vectorized
    map emitting (list id, m uint8 codes); ``search`` is map_batches
    over the codes with per-batch probed-list masking + partial top-k
    and the same small driver combine as ``ann_topk``."""

    def __init__(self, n_lists: int = 16, m: int = 16, bits: int = 8,
                 iters: int = 10, seed: int = 5):
        self.coarse = IvfIndex(n_lists=n_lists, iters=iters, seed=seed)
        self.pq = PqIndex(m=m, bits=bits, iters=iters, seed=seed)

    def fit(self, sample: np.ndarray) -> "IvfPqIndex":
        X = _normalize(np.asarray(sample, dtype=np.float64))
        self.coarse.fit(X)
        C = self.coarse.centroids
        lists = (X @ C.T).argmax(axis=1)
        # PQ trains on residuals; _codes/_luts stay in residual space
        res = X - C[lists]
        self.pq.codebooks = None
        self.pq.fit_raw(res)
        return self

    def encode_stage(self, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
        C = self.coarse.centroids
        pq_ = self.pq
        assert C is not None and pq_.codebooks is not None, "fit() first"

        def encode(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "ivf_list": pa.array([], pa.int32()),
                                 "pq_codes": pa.array(
                                     [], pa.list_(pa.uint8()))})
            X = _normalize(_vec_matrix(batch, vec_col))
            lists = (X @ C.T).argmax(axis=1)
            codes = pq_._codes(X - C[lists])
            return pa.table({id_col: batch[id_col],
                             "ivf_list": pa.array(
                                 lists.astype(np.int32)),
                             "pq_codes": pa.array(list(codes))})

        return encode

    def search(self, codes_ds, queries: np.ndarray, k: int = 10, *,
               nprobe: int = 4, id_col: str = "vec_id"):
        C = self.coarse.centroids
        pq_ = self.pq
        Q = _normalize(np.asarray(queries, dtype=np.float64))
        nq, d = Q.shape
        m = pq_.m
        ds_ = d // m
        base = Q @ C.T                       # (nq, n_lists) q·c_list
        probed = np.argsort(-base, axis=1)[:, :nprobe]
        lut = np.stack([Q[:, s * ds_:(s + 1) * ds_] @ pq_.codebooks[s].T
                        for s in range(m)], axis=1)   # (nq, m, k)

        _EMPTY = pa.table({"query_id": pa.array([], pa.int64()),
                           id_col: pa.array([], pa.int64()),
                           "score": pa.array([], pa.float64())})

        def local_topk(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _EMPTY
            lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
            codes = _codes_matrix(batch["pq_codes"], m)
            ids = batch[id_col].to_pandas().to_numpy()
            sub = np.arange(m)
            rows = {"query_id": [], id_col: [], "score": []}
            for qi in range(nq):
                mask = np.isin(lists, probed[qi])
                if not mask.any():
                    continue
                cm = codes[mask]
                s = base[qi, lists[mask]] + lut[qi][sub, cm].sum(axis=1)
                kk = min(k, len(s))
                sel = np.argpartition(-s, kk - 1)[:kk]
                rows["query_id"].extend([qi] * kk)
                rows[id_col].extend(ids[mask][sel])
                rows["score"].extend(s[sel])
            if not rows["query_id"]:
                return _EMPTY
            return pa.table({
                "query_id": pa.array(rows["query_id"], pa.int64()),
                id_col: pa.array(rows[id_col], pa.int64()),
                "score": pa.array(rows["score"], pa.float64())})

        cand = codes_ds.map_batches(local_topk,
                                    batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(["query_id", "score", id_col],
                                ascending=[True, False, True])
        out = cand.groupby("query_id", as_index=False).head(k)             .reset_index(drop=True)
        out["rank"] = out.groupby("query_id").cumcount() + 1
        return out


def opq_train(sample: np.ndarray, *, m: int = 16, bits: int = 8,
              iters: int = 8, pq_iters: int = 6, seed: int = 5):
    """OPQ (Ge, He, Ke & Sun 2013, public): learn an ORTHONORMAL
    rotation R so the rotated space quantizes better under product
    quantization — subspaces decorrelate, so the same code budget
    spends bits where the variance is. Alternating optimization on the
    driver-side sample: fix R → continue PQ training on X·Rᵀ
    WARM-STARTED from the previous iteration's codebooks (they remain
    valid in the newly rotated space because Procrustes re-fits R to
    the same decoded targets); fix codebooks → R = argmin
    ‖X·Rᵀ − decoded‖² is the orthogonal-Procrustes solution R = V·Uᵀ
    of SVD(decodedᵀ·X). Every step — Procrustes, warm-started Lloyd
    assignment/update, final encode — is then a minimizer (or exact
    coordinate descent step) of the SAME objective RELATIVE TO THE
    PRIOR STATE, so the sample reconstruction error is monotonically
    non-increasing as a theorem, not a seed accident (a cold random
    re-init per iteration, the pre-r5 behavior, is NOT a minimizer
    w.r.t. the previous state and can regress). Iteration 0 IS plain
    PQ, so OPQ's final sample error ≤ plain PQ's — the exact invariant
    the registered query asserts.

    Returns ``(R [d,d], PqIndex fitted in the rotated space,
    errors [iters+1])`` — encode corpus batches as
    ``pq._codes(normalize(X) @ R.T)``; search by rotating queries the
    same way (rotation preserves dot products).
    """
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = X.shape
    R = np.eye(d)
    errors = []
    pq_ = None
    for it in range(iters + 1):
        Xr = X @ R.T
        prev_books = None if pq_ is None else pq_.codebooks
        pq_ = PqIndex(m=m, bits=bits, iters=pq_iters, seed=seed)
        pq_.fit_raw(Xr, init=prev_books)
        codes = pq_._codes(Xr)
        ds_ = d // m
        dec = np.empty_like(Xr)
        for s in range(m):
            dec[:, s * ds_:(s + 1) * ds_] = pq_.codebooks[s][codes[:, s]]
        errors.append(float(((Xr - dec) ** 2).sum() / n))
        if it == iters:
            break
        # Procrustes: R minimizing ‖X Rᵀ − dec‖_F with R orthonormal
        U, _, Vt = np.linalg.svd(dec.T @ X)
        R = U @ Vt
    return R, pq_, np.asarray(errors)


def pca(ds, *, vec_col: str = "embedding", id_col: str = "vec_id", k: int = 8):
    """Distributed PCA over an embedding column: mean and covariance
    assemble from per-batch ``(n, Σx, XᵀX)`` moment partials — each batch
    contributes one d-vector and one d×d matrix regardless of row count,
    so the driver combine is O(batches·d²) while the corpus streams.
    Eigendecomposition of the d×d covariance runs on the driver; the
    projection is a stateless broadcast pass. Component signs are fixed
    deterministically (largest-|loading| coordinate made positive).

    Returns ``(components [k,d], explained_var [k], projected Dataset
    (id_col, pc1..pck))``."""
    import ray

    def partials(t: pa.Table) -> pa.Table:
        X = _vec_matrix(t, vec_col).astype(np.float64)
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "s": pa.array([X.sum(axis=0)]),
            "xtx": pa.array([(X.T @ X).reshape(-1)]),
        })

    part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    n_tot = int(part["n"].sum())
    s = np.sum(np.stack(part["s"].to_numpy()), axis=0)
    d = len(s)
    xtx = np.sum(np.stack(part["xtx"].to_numpy()), axis=0).reshape(d, d)
    mu = s / n_tot
    cov = (xtx - n_tot * np.outer(mu, mu)) / (n_tot - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T                      # [k, d]
    sign = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps = comps * sign[:, None]
    evar = w[order]
    ref = ray.put((mu, comps))

    def project(t: pa.Table) -> pa.Table:
        m, W = ray.get(ref)
        X = _vec_matrix(t, vec_col).astype(np.float64)
        P = (X - m) @ W.T
        cols = {id_col: t[id_col]}
        for i in range(W.shape[0]):
            cols[f"pc{i+1}"] = pa.array(P[:, i])
        return pa.table(cols)

    return comps, evar, ds.map_batches(project, batch_format="pyarrow")


def knn_join(ds, k: int = 3, *, vec_col: str = "embedding",
             id_col: str = "vec_id", exclude_self: bool = True):
    """Exact cosine k-nearest-neighbor SELF-join: for EVERY row, its k
    closest other rows — the all-rows generalization of ``ann_topk``
    (whose queries are a handful) and the primitive under SemDeDup-style
    clustering and recsys candidate generation.

    Shape: the corpus matrix is collected once, L2-normalized and
    broadcast via ``ray.put``; each batch computes one (batch × corpus)
    matmul + argpartition and emits its own rows' top-k — no pairwise
    shuffle ever exists. The broadcast bounds this exact path to
    corpora whose matrix fits a worker (~10⁶×256 floats ≈ 1 GB); past
    that, ``IvfIndex`` with queries=corpus is the documented scale path
    (recall-tested separately).

    Returns a Dataset of (src_id, nbr_id, cosine, rank), rank 1 = best,
    ties broken on nbr_id ascending (matching SQL row_number order)."""
    import ray

    mat_tbl = (ds.map_batches(
        lambda t: pa.table({id_col: t[id_col], vec_col: t[vec_col]}),
        batch_format="pyarrow").to_pandas())
    mat_tbl = mat_tbl.sort_values(id_col).reset_index(drop=True)
    C = _normalize(np.stack(mat_tbl[vec_col].to_numpy()).astype(np.float64))
    ids = mat_tbl[id_col].to_numpy()
    ref = ray.put((C, ids)) if ray.is_initialized() else (C, ids)

    def local(batch: pa.Table) -> pa.Table:
        Cb, idsb = (ray.get(ref) if not isinstance(ref, tuple) else ref)
        X = _normalize(_vec_matrix(batch, vec_col))
        src = batch[id_col].to_pandas().to_numpy()
        S = X @ Cb.T  # (b, n)
        if exclude_self:
            self_pos = np.searchsorted(idsb, src)
            hit = (self_pos < len(idsb)) & (idsb[np.clip(
                self_pos, 0, len(idsb) - 1)] == src)
            S[np.flatnonzero(hit), self_pos[hit]] = -np.inf
        kk = min(k, S.shape[1] - (1 if exclude_self else 0))
        rows = {"src_id": [], "nbr_id": [], "cosine": [], "rank": []}
        for i in range(S.shape[0]):
            # candidates = everything >= the kk-th largest score, so a
            # tie AT the cut can never be dropped before the id
            # tie-break (lexsort on (-cosine, nbr_id)) decides it
            thresh = np.partition(S[i], -kk)[-kk]
            cand = np.flatnonzero(S[i] >= thresh)
            order = np.lexsort((idsb[cand], -S[i, cand]))[:kk]
            sel = cand[order]
            rows["src_id"].extend([src[i]] * len(sel))
            rows["nbr_id"].extend(idsb[sel])
            rows["cosine"].extend(S[i, sel])
            rows["rank"].extend(range(1, len(sel) + 1))
        return pa.table({
            "src_id": pa.array(rows["src_id"], pa.int64()),
            "nbr_id": pa.array(rows["nbr_id"], pa.int64()),
            "cosine": pa.array(rows["cosine"], pa.float64()),
            "rank": pa.array(rows["rank"], pa.int64())})

    return ds.map_batches(local, batch_format="pyarrow")
