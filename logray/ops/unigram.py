"""Unigram-LM tokenizer (SentencePiece's unigram model, Kudo 2018):
distributed word-frequency pass, EM training with a DISTRIBUTED E-step
over the distinct-word table, actor-pool Viterbi encode.

Mirrors the BPE op's decomposition (``logray/ops/bpe.py``): the corpus
is touched only by the exact word-frequency combiner (the one all-to-all
moves per-batch-unique words); training then runs over the bounded
distinct-word table. Unlike BPE's driver-side merge loop, the unigram
E-step (lattice forward–backward per word) is itself a ``map_batches``
over the word table with the piece vocabulary broadcast — per-iteration
cost scales out with the word count. The M-step is one tiny grouped sum.
Encoding is a stateful actor stage: Viterbi segmentations are memoized
per actor over batch-unique words, exactly like the BPE encode cache.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def seed_vocab(word_freqs: dict[str, int], *, max_piece_len: int = 8,
               seed_size: int = 2000) -> dict[str, float]:
    """Candidate seed vocabulary: every substring (length ≤
    ``max_piece_len``) of the distinct words, scored by
    occurrence-count × length (the standard make-big-pieces-cheap
    heuristic); the top ``seed_size`` multi-char pieces plus EVERY single
    character (the fallback alphabet that keeps all words tokenizable).
    Initial probabilities ∝ raw substring counts."""
    from collections import Counter

    cand: Counter = Counter()
    chars: set[str] = set()
    for w, f in word_freqs.items():
        L = len(w)
        for i in range(L):
            chars.add(w[i])
            for j in range(i + 2, min(i + max_piece_len, L) + 1):
                cand[w[i:j]] += f
    scored = sorted(((c * len(p), p) for p, c in cand.items()),
                    key=lambda t: (-t[0], t[1]))
    vocab = {p for _, p in scored[:seed_size]}
    vocab |= chars
    for ch in chars:
        cand.setdefault(ch, 0)
    charc: Counter = Counter()
    for w, f in word_freqs.items():
        for ch in w:
            charc[ch] += f
    weights = {p: (cand[p] if len(p) > 1 else charc[p]) for p in vocab}
    tot = float(sum(weights.values())) or 1.0
    return {p: weights[p] / tot for p in sorted(vocab)}


def _lattice_passes(word: str, theta: dict[str, float],
                    max_piece_len: int) -> tuple[float, dict[str, float]]:
    """Forward–backward over the segmentation lattice of one word:
    returns (marginal likelihood, posterior expected count per piece)."""
    L = len(word)
    alpha = np.zeros(L + 1)
    alpha[0] = 1.0
    edges: list[tuple[int, int, str, float]] = []
    for i in range(L):
        if alpha[i] == 0.0:
            continue
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            p = theta.get(word[i:j])
            if p:
                alpha[j] += alpha[i] * p
                edges.append((i, j, word[i:j], p))
    Z = alpha[L]
    if Z == 0.0:
        return 0.0, {}
    beta = np.zeros(L + 1)
    beta[L] = 1.0
    for i, j, piece, p in reversed(edges):
        beta[i] += p * beta[j]
    counts: dict[str, float] = {}
    for i, j, piece, p in edges:
        post = alpha[i] * p * beta[j] / Z
        counts[piece] = counts.get(piece, 0.0) + post
    return float(Z), counts


def _em_round(wf, theta: dict[str, float], max_piece_len: int):
    """One distributed EM iteration: the E-step maps the word-frequency
    Dataset with ``theta`` broadcast, emitting per-batch (piece, expected
    count) partials plus the batch log-likelihood; the M-step is one
    grouped sum. Returns (new theta dict, corpus log-likelihood)."""
    import ray

    from .relational import grouped_agg

    ref = ray.put(theta) if ray.is_initialized() else None
    theta_local = None if ref is not None else theta

    def estep(t: pa.Table) -> pa.Table:
        th = ray.get(ref) if ref is not None else theta_local
        agg: dict[str, float] = {}
        ll = 0.0
        for w, f in zip(t["word"].to_pylist(), t["c"].to_pylist()):
            Z, cnt = _lattice_passes(w, th, max_piece_len)
            if Z == 0.0:
                continue
            ll += f * float(np.log(Z))
            for piece, c in cnt.items():
                agg[piece] = agg.get(piece, 0.0) + f * c
        pieces = sorted(agg)
        return pa.table({
            "piece": pa.array(pieces, pa.string()),
            "e": pa.array([agg[p] for p in pieces], pa.float64()),
            "__ll_once": pa.array(
                [ll] + [0.0] * (len(pieces) - 1) if pieces else [],
                pa.float64())})

    part = wf.map_batches(estep, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum

    ll = part.aggregate(Sum("__ll_once"))["sum(__ll_once)"] or 0.0
    e = grouped_agg(part, ["piece"], {"e": ("e", "sum")}).to_pandas()
    tot = float(e["e"].sum()) or 1.0
    new = dict(zip(e["piece"], e["e"] / tot))
    # characters must never leave the vocabulary (tokenizability floor)
    for p, v in theta.items():
        if len(p) == 1 and p not in new:
            new[p] = 1e-12
    return new, float(ll)


def train_unigram(wf_dataset, *, vocab_size: int = 512,
                  max_piece_len: int = 8, seed_size: int = 2000,
                  em_rounds: int = 2) -> dict[str, float]:
    """Train the unigram LM: seed from substring counts (driver, over the
    bounded distinct-word table), ``em_rounds`` distributed EM rounds,
    prune to the top ``vocab_size`` pieces by expected count (single
    chars always kept), one final EM round to renormalize. Returns the
    piece → probability dict."""
    wf_df = wf_dataset if isinstance(wf_dataset, pd.DataFrame) else \
        wf_dataset.to_pandas()
    import ray.data

    freqs = dict(zip(wf_df["word"], wf_df["c"]))
    theta = seed_vocab(freqs, max_piece_len=max_piece_len,
                       seed_size=seed_size)
    wf = ray.data.from_pandas(wf_df).repartition(8)
    for _ in range(em_rounds):
        theta, _ = _em_round(wf, theta, max_piece_len)
    multi = sorted((p for p in theta if len(p) > 1),
                   key=lambda p: (-theta[p], p))
    chars = [p for p in theta if len(p) == 1]
    keep = set(multi[:max(vocab_size - len(chars), 0)]) | set(chars)
    theta = {p: v for p, v in theta.items() if p in keep}
    tot = sum(theta.values()) or 1.0
    theta = {p: v / tot for p, v in theta.items()}
    theta, _ = _em_round(wf, theta, max_piece_len)
    return theta


def viterbi_encode(word: str, logtheta: dict[str, float],
                   max_piece_len: int) -> list[str]:
    """Most-likely segmentation of one word under the unigram LM
    (dynamic program over positions, log-space). Single characters are
    always in the vocabulary, so every word is tokenizable; unknown
    characters fall back to themselves as singleton pieces."""
    L = len(word)
    NEG = -1e18
    best = np.full(L + 1, NEG)
    best[0] = 0.0
    back = np.zeros(L + 1, dtype=np.int64)
    for i in range(L):
        if best[i] == NEG:
            continue
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            lp = logtheta.get(word[i:j])
            if lp is None:
                if j == i + 1:
                    lp = -50.0  # unknown char fallback
                else:
                    continue
            s = best[i] + lp
            if s > best[j]:
                best[j] = s
                back[j] = i
    out = []
    j = L
    while j > 0:
        i = int(back[j])
        out.append(word[i:j])
        j = i
    return out[::-1]


class UnigramEncodeStage:
    """Actor-pool Viterbi encode stage: log-probabilities built once per
    actor, segmentations memoized across batches over batch-unique words
    (dictionary-encode → encode uniques → vectorized scatter), mirroring
    ``BpeEncodeStage``. Emits per-doc word/piece counts and a
    roundtrip_ok flag (pieces concatenate back to every word)."""

    def __init__(self, theta: dict[str, float], text_col: str = "text",
                 id_col: str = "doc_id", max_piece_len: int = 8):
        self.logtheta = {p: float(np.log(v)) for p, v in theta.items()
                         if v > 0}
        self.max_piece_len = max_piece_len
        self.cache: dict[str, tuple[int, bool]] = {}
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        trimmed = pc.utf8_trim_whitespace(
            pc.utf8_lower(pc.fill_null(t[self.text_col], "")))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        npieces = np.empty(len(uniq), dtype=np.int64)
        okvec = np.empty(len(uniq), dtype=bool)
        for i, w in enumerate(uniq):
            hit = self.cache.get(w)
            if hit is None:
                if w:
                    pieces = viterbi_encode(w, self.logtheta,
                                            self.max_piece_len)
                    hit = (len(pieces), "".join(pieces) == w)
                else:
                    hit = (0, True)
                self.cache[w] = hit
            npieces[i], okvec[i] = hit
        if len(uniq):
            idx = np.asarray(d.indices.fill_null(0).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            per_word = npieces[idx]
            per_ok = okvec[idx]
        else:
            per_word = np.zeros(0, dtype=np.int64)
            per_ok = np.zeros(0, dtype=bool)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(per_word)])
        ends = np.cumsum(lens)
        n_pieces = cs[ends] - cs[ends - lens]
        ok_cs = np.concatenate([[0], np.cumsum(~per_ok)])
        all_ok = (ok_cs[ends] - ok_cs[ends - lens]) == 0
        return pa.table({self.id_col: t[self.id_col],
                         "n_words": pa.array(lens),
                         "n_pieces": pa.array(n_pieces),
                         "roundtrip_ok": pa.array(all_ok)})


def unigram_token_counts(ds, text_col: str = "text",
                         id_col: str = "doc_id", *,
                         vocab_size: int = 512, max_piece_len: int = 8,
                         max_vocab: int = 65536, em_rounds: int = 2,
                         concurrency=None):
    """End-to-end unigram-LM pipeline: distributed word-frequency pass →
    distributed-EM training → actor-pool Viterbi encode. Returns
    (id_col, n_words, n_pieces, roundtrip_ok)."""
    from .bpe import word_frequencies

    wf = word_frequencies(ds, text_col, max_vocab=max_vocab)
    theta = train_unigram(wf, vocab_size=vocab_size,
                          max_piece_len=max_piece_len,
                          em_rounds=em_rounds)
    if concurrency is None:
        # clamp the actor pool below the cluster CPU count: a pool that
        # holds every CPU starves the 0.5-CPU read tasks and the
        # streaming executor waits forever (same live deadlock the
        # flagship hit at ray.init(num_cpus=4))
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        concurrency = max(1, min(4, cpus - 1))
    kwargs = {"concurrency": concurrency}
    return ds.map_batches(
        UnigramEncodeStage,
        fn_constructor_args=(theta, text_col, id_col, max_piece_len),
        batch_format="pyarrow", **kwargs)
