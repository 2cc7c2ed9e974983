"""Distributed trained text classifier (the quality-filter shape).

The classic LLM-data quality filter (CCNet / GPT-3-style) is a linear
classifier over hashed bag-of-words features trained on a
labeled-by-construction corpus and then applied to every document. This
module implements that shape Ray-Data-first:

- **Featurization** is vectorized Arrow → numpy: regex token split,
  ``list_flatten`` + offset arithmetic (no per-row loops), crc32 token
  hashing into ``dim`` buckets via the repo's ``stable_hash64``
  (cross-process stable — no Python hash salt), mean pooling (each
  document's feature vector is its token-bucket counts / token count,
  the fastText recipe).
- **Training** is full-batch gradient descent: one ``map_batches`` pass
  per iteration computes SPARSE per-block gradient partials (only the
  buckets a block actually observed travel back), the driver sums them
  and updates the weight vector, and the next iteration broadcasts the
  new weights via ``ray.put`` (read zero-copy in every task — shipped
  once per iteration, not per batch). Driver traffic per iteration is
  Σ_blocks nnz(block) ≤ corpus tokens-per-pass, independent of ``dim``;
  at cluster scale the partials would go through one tree-reduce
  ``groupby(bucket).sum()`` round instead of the driver sum — the
  partial format (bucket ids + values) is already that exchange's
  payload, so the switch is a consumer change, not a redesign.
- Each iteration **re-executes the pruned scan** (multi-epoch training's
  normal shape) rather than pinning a featurized copy of the corpus in
  the object store — the same re-read-over-materialize trade the dedup
  family makes; pass an already-materialized ``ds`` to opt out.
- **Scoring** is a stateful actor stage: weights arrive through the
  object store once per actor in ``__init__``, batches score via one
  ``bincount`` matvec.

Determinism note: block partials are float sums whose addition order can
vary with scheduling; bounds-style verification (accuracy ≥ threshold)
is the right oracle, same protocol as the k-means/IVF tolerance rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

_TOKEN_SPLIT = r"[^a-z0-9]+"


def _hashed_rows(texts, dim: int):
    """Vectorized featurization: (row_idx, bucket_id, row_len) triples
    for every token, lower-cased, split on non-alphanumerics, hashed
    into ``dim`` buckets. Empty tokens (split artifacts) are dropped."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), _TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    ids = (stable_hash64(flat)[keep] % dim).astype(np.int64)
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[keep]
    row_len = np.maximum(np.bincount(row_idx, minlength=len(lens)), 1)
    return row_idx, ids, row_len


def _scores(row_idx, ids, row_len, w, b, n_rows: int) -> np.ndarray:
    """Mean-pooled linear scores: one bincount matvec, no per-row loop."""
    z = np.bincount(row_idx, weights=w[ids], minlength=n_rows)
    return z / row_len + b


def train_text_classifier(ds, *, text_col: str = "text",
                          label_col: str = "label", dim: int = 1 << 16,
                          iters: int = 15, lr: float = 1.0):
    """Full-batch logistic regression over hashed bag-of-words, with
    Adagrad per-coordinate step scaling — plain GD is hopeless here
    because mean-pooled hashed features span orders of magnitude (a
    stopword bucket vs a rare planted token), so one global step size
    either crawls or diverges (both measured); the diagonal
    preconditioner equalizes them and converges in ~12 passes.

    Returns ``(w, b, losses)`` — weights, bias, and the per-iteration
    mean log-loss trace (net-decreasing; Adagrad's first steps are
    sign-sized, so strict monotonicity is NOT guaranteed or asserted).
    """
    import ray

    w = np.zeros(dim)
    b = 0.0
    acc_g = np.zeros(dim)  # Adagrad accumulators live on the driver
    acc_gb = 0.0
    losses: list[float] = []
    for _ in range(iters):
        w_ref = ray.put(w)

        def grad_partial(t: pa.Table, w_ref=w_ref, b=b) -> pa.Table:
            import ray as _ray

            wv = _ray.get(w_ref)
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            row_idx, ids, row_len = _hashed_rows(t[text_col], dim)
            z = _scores(row_idx, ids, row_len, wv, b, len(y))
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y  # d(loss)/d(z)
            tok_w = np.repeat(r / row_len, np.bincount(
                row_idx, minlength=len(y)))
            g = np.bincount(ids, weights=tok_w, minlength=dim)
            nz = np.nonzero(g)[0]
            eps = 1e-12
            loss = float(-np.sum(y * np.log(p + eps)
                                 + (1 - y) * np.log(1 - p + eps)))
            return pa.table({
                "ids": pa.array([nz], pa.list_(pa.int64())),
                "vals": pa.array([g[nz]], pa.list_(pa.float64())),
                "gb": pa.array([float(r.sum())], pa.float64()),
                "loss": pa.array([loss], pa.float64()),
                "n": pa.array([len(y)], pa.int64())})

        parts = ds.map_batches(grad_partial, batch_format="pyarrow",
                               batch_size=8192).take_all()
        n = sum(p["n"] for p in parts)
        g = np.zeros(dim)
        for p in parts:
            np.add.at(g, np.asarray(p["ids"], np.int64),
                      np.asarray(p["vals"], np.float64))
        gb = sum(p["gb"] for p in parts)
        losses.append(sum(p["loss"] for p in parts) / max(n, 1))
        g /= max(n, 1)
        gb /= max(n, 1)
        acc_g += g * g
        acc_gb += gb * gb
        w = w - lr * g / (np.sqrt(acc_g) + 1e-8)
        b = b - lr * gb / (np.sqrt(acc_gb) + 1e-8)
    return w, b, losses


class ClassifierScoreStage:
    """Actor-pool scoring stage: weights land once per actor via the
    object store (``__init__``), batches score with one bincount matvec
    (``__call__``). Emits ``score`` (sigmoid) and ``pred`` columns."""

    def __init__(self, w_ref, b: float, dim: int, text_col: str = "text",
                 threshold: float = 0.5):
        import ray

        self.w = ray.get(w_ref) if not isinstance(w_ref, np.ndarray) \
            else w_ref
        self.b, self.dim = b, dim
        self.text_col, self.threshold = text_col, threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        row_idx, ids, row_len = _hashed_rows(t[self.text_col], self.dim)
        z = _scores(row_idx, ids, row_len, self.w, self.b, t.num_rows)
        p = 1.0 / (1.0 + np.exp(-z))
        return t.append_column(
            "score", pa.array(p, pa.float64())).append_column(
            "pred", pa.array((p >= self.threshold).astype(np.int64),
                             pa.int64()))
