"""Byte-pair-encoding tokenizer: distributed frequency pass, driver-side
merge training, actor-pool encode.

The training loop (Sennrich et al. 2016) runs over the corpus's UNIQUE
words only — the distributed part is the exact word-frequency table
(per-batch combiner + one small grouped sum), which is also the only
all-to-all. Encoding is a stateful actor stage: merge ranks are built
once per actor in ``__init__`` and every encoded word is memoized in
actor memory, so across batches each unique word is encoded once per
actor, not once per occurrence (Zipf makes the cache hit rate extreme).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_EOW = "▁"  # end-of-word marker symbol


def word_frequencies(ds, text_col: str = "text", *,
                     max_vocab: int = 65536) -> pd.DataFrame:
    """Exact corpus word counts: per-batch value_counts partials (the
    combiner — the shuffle only ever sees per-batch uniques) → grouped
    sum → top ``max_vocab`` by count on the driver."""
    from .relational import grouped_agg

    def local(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(
            pc.utf8_lower(pc.fill_null(t[text_col], "")))
        flat = pc.list_flatten(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = flat.value_counts()
        if len(vc) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"word": vc.field("values"),
                         "c": vc.field("counts")})

    wf = grouped_agg(ds.map_batches(local, batch_format="pyarrow"),
                     ["word"], {"c": ("c", "sum")}).to_pandas()
    wf = wf[wf["word"] != ""]
    return (wf.sort_values(["c", "word"], ascending=[False, True])
            .head(max_vocab).reset_index(drop=True))


def train_bpe(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training on a word-frequency dict: repeatedly merge
    the most frequent adjacent symbol pair (ties broken lexicographically
    for determinism). Returns the ordered merge list."""
    from collections import Counter

    words = {w: tuple(w) + (_EOW,) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] += f
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        a, b = best
        ab = a + b
        new_words = {}
        for w, syms in words.items():
            if a in syms:
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = tuple(out)
            new_words[w] = syms
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly apply the lowest-rank
    applicable merge (the standard inference rule)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncodeStage:
    """Actor-pool encode stage: merge ranks built once per actor, encoded
    words memoized in actor memory across batches. Per batch, the word
    stream is dictionary-encoded so the Python encode loop runs over
    batch-unique words only; per-doc totals assemble vectorized."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.cache: dict[str, int] = {}
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
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
        ntok = np.empty(len(uniq), dtype=np.int64)
        for i, w in enumerate(uniq):
            n = self.cache.get(w)
            if n is None:
                n = len(encode_word(w, self.ranks)) if w else 0
                self.cache[w] = n
            ntok[i] = n
        if len(uniq):
            idx = np.asarray(d.indices.fill_null(0).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            per_word = ntok[idx]
        else:
            per_word = np.zeros(0, dtype=np.int64)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(per_word)])
        ends = np.cumsum(lens)
        n_bpe = cs[ends] - cs[ends - lens]
        return pa.table({self.id_col: t[self.id_col],
                         "n_words": pa.array(lens),
                         "n_bpe_tokens": pa.array(n_bpe)})


def bpe_token_counts(ds, text_col: str = "text", id_col: str = "doc_id", *,
                     num_merges: int = 200, max_vocab: int = 65536,
                     concurrency=None):
    """End-to-end BPE pipeline: distributed word-frequency pass → driver
    merge training → actor-pool encode. Returns (id_col, n_words,
    n_bpe_tokens)."""
    wf = word_frequencies(ds, text_col, max_vocab=max_vocab)
    merges = train_bpe(dict(zip(wf["word"], wf["c"])), num_merges)
    if concurrency is None:
        # clamp the actor pool below the cluster CPU count — a pool that
        # holds every CPU starves the 0.5-CPU read tasks (the flagship's
        # live streaming-executor deadlock at ray.init(num_cpus=4))
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        concurrency = max(1, min(4, cpus - 1))
    kwargs = {"concurrency": concurrency}
    return ds.map_batches(BpeEncodeStage,
                          fn_constructor_args=(merges, text_col, id_col),
                          batch_format="pyarrow", **kwargs)
