"""Text-analysis operators over a document table (SURVEY.md task mandate):
language-ID, quality scoring, token counting, document fingerprinting.

All batch bodies are vectorized end-to-end (pyarrow.compute regex/string
kernels + numpy prefix-sum tricks); the only remaining per-row Python is
the md5 hex digest in ``add_fingerprint`` (kept so the op stays
DuckDB-oracle-able via ``md5(lower(text))``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- tokens ----

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def split_whitespace_safe(texts) -> pa.ListArray:
    """``pc.utf8_split_whitespace`` with its buffer-tail defect patched.

    pyarrow 16.1's native whitespace splitter intermittently fails to
    classify the FINAL character of an array's data buffer as whitespace
    (a past-the-end read: the outcome depends on whatever heap bytes
    follow the buffer, so identical inputs flip between runs). When it
    strikes, the last token of the LAST string keeps its trailing
    whitespace and the trailing empty token goes missing — the round-2
    hypothesis FlakyFailure in ``test_sliding_chunks_cover_every_word_
    le_twice`` was exactly this (reproduced at ~5/10⁴ arrays under a
    layout stress; ``split_pattern_regex`` measured clean on the same
    stress). Only the final string can be affected (mid-buffer reads see
    real data and classify deterministically), so the defense re-splits
    just the last string against a sentinel-padded fresh two-element
    array — the sentinel occupies the buffer tail — and splices the
    result in when it differs. O(last string) per batch; the splice
    itself only runs on the ~10⁻⁴ corrupted arrays.

    Accepts an Array or ChunkedArray (nulls already filled); returns a
    combined ``ListArray`` whose ``.offsets``/``.values`` are safe for
    the offset-arithmetic kernels below.
    """
    split = pc.utf8_split_whitespace(texts)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    n = len(split)
    if n == 0:
        return split
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    # the victim is the string owning the buffer's FINAL byte: the last
    # string with non-zero byte length (trailing empty strings own none)
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False)
    owners = np.flatnonzero(np.nan_to_num(lens) > 0)
    if len(owners) == 0:
        return split
    j = int(owners[-1])
    last = arr[j].as_py()
    # re-split unconditionally (O(one string)): covers both the observed
    # mode (trailing whitespace not recognized) and the inverse (a
    # non-whitespace tail byte misread as whitespace)
    fix = pc.utf8_split_whitespace(pa.array([last, " "], pa.string()))
    good = fix.values.slice(0, fix.offsets[1].as_py())
    off = split.offsets.to_numpy().astype(np.int64)
    cur = split.values.slice(off[j], off[j + 1] - off[j])
    if cur.equals(good):
        return split
    vals = (split.values.combine_chunks()
            if isinstance(split.values, pa.ChunkedArray) else split.values)
    new_vals = pa.concat_arrays(
        [vals.slice(0, off[j]), good, vals.slice(off[j + 1])])
    delta = len(good) - (off[j + 1] - off[j])
    new_off = np.concatenate([off[:j + 1], off[j + 1:] + delta])
    return pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), new_vals)


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count, vectorized."""
    ws = pc.count_substring_regex(batch[text_col], r"\S+")
    bpe = pc.count_substring_regex(batch[text_col], TOKEN_REGEX)
    batch = batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
    return batch.append_column("n_tokens_bpe", pc.cast(bpe, pa.int64()))


# ------------------------------------------------------------- fingerprint --

def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    method: str = "rolling") -> pa.Table:
    """Deterministic document fingerprint (hex string column
    ``fingerprint``).

    Default ``'rolling'`` is the SCALE path: the fully-vectorized
    64-bit order-sensitive rolling hash over the lowercased token
    stream (``add_rolling_fingerprint``'s prefix-sum kernel — no
    per-row Python), rendered as 16-hex-char strings. ``'md5'`` is the
    opt-in ORACLE mode (per-row hashlib over lowercased text) kept
    only so the op stays DuckDB-replayable as ``md5(lower(text))``.
    """
    if method == "md5":
        low = pc.utf8_lower(batch[text_col])
        s = low.to_pandas()
        fp = s.map(lambda v: hashlib.md5(v.encode()).hexdigest()
                   if v is not None else None)
        return batch.append_column("fingerprint", pa.array(fp, pa.string()))
    import binascii

    low = batch.set_column(
        batch.schema.get_field_index(text_col), text_col,
        pc.utf8_lower(batch[text_col]))
    rf = add_rolling_fingerprint(low, text_col)["rolling_fp"]
    v = rf.combine_chunks().to_numpy(zero_copy_only=False)
    # vectorized uint64 → 16-hex-char: big-endian bytes, one hexlify
    # over the whole batch, reinterpret as fixed-width S16 strings
    hx = np.frombuffer(binascii.hexlify(v.astype(">u8").tobytes()),
                       dtype="S16").astype(str)
    return batch.append_column("fingerprint", pa.array(hx))


_ROLL_BASE = 1099511628211
_ROLL_SEED = 14695981039346656037
_U64 = (1 << 64) - 1


_ROLL_INV = pow(_ROLL_BASE, -1, 1 << 64)  # modular inverse: _ROLL_BASE is odd


def add_rolling_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Order-sensitive polynomial rolling hash over the token stream,
    vectorized across the whole batch: every token is hashed in one pass,
    then per-doc hashes ``h_d = Σ_i th_i · B^(L_d-1-i) (mod 2^64)`` come
    from a prefix-sum trick — ``S = cumsum(th · B⁻ⁱ)`` differenced at doc
    boundaries and rescaled by ``B^(end_d-1)`` — no per-doc Python loop.
    Order-sensitive by construction (B-weighted positions)."""
    from .dedup import _flat_word_hashes

    wh, offsets = _flat_word_hashes(batch[text_col])
    n = len(wh)
    lens = np.diff(offsets)
    out = np.zeros(len(lens), dtype=np.uint64)
    if n:
        B = np.uint64(_ROLL_BASE)
        Binv = np.uint64(_ROLL_INV)
        with np.errstate(over="ignore"):
            # P[i] = B^i, Q[i] = B^-i (wrapping cumulative products)
            P = np.ones(n, dtype=np.uint64)
            Q = np.ones(n, dtype=np.uint64)
            np.multiply.accumulate(np.full(n, B, dtype=np.uint64), out=P)
            np.multiply.accumulate(np.full(n, Binv, dtype=np.uint64), out=Q)
            P = np.concatenate(([np.uint64(1)], P))  # P[i] = B^i, i in [0, n]
            Q = np.concatenate(([np.uint64(1)], Q[:-1]))
            S = np.concatenate(([np.uint64(0)], np.cumsum(wh * Q, dtype=np.uint64)))
            seg = S[offsets[1:]] - S[offsets[:-1]]
            nonzero = lens > 0
            ends = offsets[1:][nonzero]
            out[nonzero] = seg[nonzero] * P[ends - 1]
    return batch.append_column("rolling_fp", pa.array(out, pa.uint64()))


# ------------------------------------------------------------------ langid --

# tiny per-language stopword profiles (public common-word lists)
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that for on with as at be this have".split()),
    "de": frozenset("der die das und ist nicht ich ein zu mit von auf für den im sie".split()),
    "es": frozenset("el la de que y en un los una por con para es se del las no".split()),
    "fr": frozenset("le la de et les des en un une du que pour dans est qui sur pas".split()),
    "it": frozenset("il la di e che un per con del non le una sono da si come".split()),
}


class LangIdStage:
    """Stateful (actor-pool-friendly) language-ID stage.

    Heuristic: stopword-profile overlap + CJK codepoint ratio. Profiles are
    compiled once in ``__init__`` (per actor); ``__call__`` is per batch.
    Returns ``lang_pred`` + ``lang_score`` (confidence in [0,1]).
    """

    def __init__(self) -> None:
        # one alternation regex per language, compiled once per actor;
        # scored on stopword OCCURRENCES (vectorized count per batch)
        self.langs = list(_LANG_PROFILES)
        self.patterns = {
            lang: r"\b(?:" + "|".join(sorted(words)) + r")\b"
            for lang, words in _LANG_PROFILES.items()
        }
        self.cjk_pattern = r"[一-鿿぀-ヿ가-힯]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        low = pc.utf8_lower(text)
        n_chars = np.maximum(pc.utf8_length(text).to_numpy(zero_copy_only=False), 1)
        cjk = pc.count_substring_regex(text, self.cjk_pattern).to_numpy(zero_copy_only=False)
        counts = np.stack([
            pc.count_substring_regex(low, self.patterns[lang]).to_numpy(zero_copy_only=False)
            for lang in self.langs
        ], axis=1)
        best_i = counts.argmax(axis=1)
        best_n = counts[np.arange(len(best_i)), best_i]
        preds = np.asarray(self.langs, dtype=object)[best_i]
        preds[best_n < 2] = "unknown"
        scores = np.minimum(1.0, best_n / 8.0)
        cjk_ratio = cjk / n_chars
        is_zh = cjk_ratio > 0.05
        preds[is_zh] = "zh"
        scores = np.where(is_zh, np.minimum(1.0, cjk_ratio * 4), scores)
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_score", pa.array(scores, pa.float64()))


# ----------------------------------------------------------------- quality --

_STOPWORDS = _LANG_PROFILES["en"]


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    word length, digit ratio → composite ``quality`` in [0,1]. Fully
    vectorized (stopword ratio via one alternation-regex count)."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.float64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_words = pc.max_element_wise(n_words, pa.scalar(1.0))
    punct_ratio = pc.divide(n_punct, safe_chars)
    digit_ratio = pc.divide(n_digit, safe_chars)
    mean_word_len = pc.divide(n_chars, safe_words)

    low = pc.utf8_lower(pc.fill_null(text, ""))
    stop_pat = r"\b(?:" + "|".join(sorted(_STOPWORDS)) + r")\b"
    n_stop = pc.count_substring_regex(low, stop_pat).to_numpy(zero_copy_only=False)
    n_alpha = np.maximum(
        pc.count_substring_regex(low, r"[a-z]+").to_numpy(zero_copy_only=False), 1)
    stop_arr = pa.array(n_stop / n_alpha, pa.float64())

    # composite: reward moderate length & stopword presence, punish symbol soup
    len_score = pc.min_element_wise(pc.divide(n_chars, pa.scalar(200.0)), pa.scalar(1.0))
    score = pc.multiply(
        pc.multiply(len_score, pc.subtract(pa.scalar(1.0), pc.min_element_wise(
            pc.multiply(punct_ratio, pa.scalar(2.0)), pa.scalar(1.0)))),
        pc.add(pa.scalar(0.5), pc.multiply(stop_arr, pa.scalar(0.5))))
    for name, col in [("n_chars_q", n_chars), ("punct_ratio", punct_ratio),
                      ("digit_ratio", digit_ratio), ("mean_word_len", mean_word_len),
                      ("stopword_ratio", stop_arr), ("quality", score)]:
        batch = batch.append_column(name, col)
    return batch


def ngram_explode(t: pa.Table, id_col: str, text_col: str,
                  width: int) -> pa.Table:
    """Explode each document into its word ``width``-grams → one flat
    ``(id_col, ngram)`` table per batch. Tokens of ALL docs in the batch
    stay in one flat Arrow array — the n-gram join is ``width`` zero-copy
    slices through one vectorized string join; starts whose window would
    straddle a document boundary are masked by offset arithmetic (same
    technique as the bigram stats, generalized to any width). Doc ids are
    propagated to starts with one searchsorted over the token-count
    cumsum — no per-row Python."""
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(t[text_col], "")))
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    empty = pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                      "ngram": pa.array([], pa.string())})
    if n < width:
        return empty
    m = n - width + 1
    ng = pc.binary_join_element_wise(
        *[flat.slice(k, m) for k in range(width)], " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ends = np.cumsum(lens)                      # doc end (exclusive) in flat
    valid = np.ones(m, dtype=bool)
    for k in range(1, width):                   # starts straddling a boundary
        inv = ends[:-1] - k
        inv = inv[(inv >= 0) & (inv < m)]
        valid[inv] = False
    starts = np.flatnonzero(valid)
    if len(starts) == 0:
        return empty
    docidx = np.searchsorted(ends, starts, side="right")
    ids = (t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray)
           else t[id_col]).take(pa.array(docidx))
    return pa.table({id_col: ids, "ngram": ng.filter(pa.array(valid))})


def add_repetition_signals(t: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text") -> pa.Table:
    """Per-doc repetition quality signals (the Gopher-rules family):
    ``dup_word_frac`` = 1 − distinct/total tokens; ``top_bigram_frac`` =
    share of the doc's bigrams taken by its most frequent bigram (high →
    boilerplate/spam). Docs never split across batches, so this is
    embarrassingly parallel: one flat tokenize per batch (zero-copy slice
    join for bigrams) + hash-based pandas groupbys — no shuffle."""
    import pandas as pd

    toks = ngram_explode(t, id_col, text_col, 1)
    bigs = ngram_explode(t, id_col, text_col, 2)
    td = toks.to_pandas()
    g = td.groupby(id_col, sort=False)["ngram"]
    stats = pd.DataFrame({"n": g.size(), "nd": g.nunique()})
    stats["dup_word_frac"] = (1.0 - stats["nd"] / stats["n"]).round(6)
    bd = bigs.to_pandas()
    if len(bd):
        bc = (bd.groupby([id_col, "ngram"], sort=False)
              .size().rename("c").reset_index())
        bg = bc.groupby(id_col, sort=False)["c"]
        bstats = (bg.max() / bg.sum()).rename("top_bigram_frac").round(6)
        stats = stats.join(bstats)
    else:
        stats["top_bigram_frac"] = np.nan
    stats["top_bigram_frac"] = stats["top_bigram_frac"].fillna(0.0)
    out = stats.reset_index()[[id_col, "dup_word_frac", "top_bigram_frac"]]
    # docs with zero tokens never enter `toks`; restore them with frac 0
    have = pa.array(out[id_col].to_numpy())
    missing = t.filter(pc.invert(pc.is_in(t[id_col], value_set=have)))
    if missing.num_rows:
        out = pd.concat([out, pd.DataFrame({
            id_col: missing[id_col].to_pandas(),
            "dup_word_frac": 0.0, "top_bigram_frac": 0.0})],
            ignore_index=True)
    return pa.table({id_col: pa.array(out[id_col].to_numpy()),
                     "dup_word_frac": pa.array(out["dup_word_frac"], pa.float64()),
                     "top_bigram_frac": pa.array(out["top_bigram_frac"], pa.float64())})


def hashed_token_profile(ds, text_col: str = "text", *, dim: int = 4096):
    """Corpus-level hashed-unigram count vector (the DSIR feature space,
    Xie et al. 2023): each batch tokenizes, buckets tokens by stable
    crc32 % dim and emits its (bucket, count) partial; one small grouped
    sum combines them. Only ≤dim rows per batch ever shuffle, so the
    profile of an arbitrarily large corpus costs one tiny exchange.
    Returns a dense numpy ``float64[dim]`` on the driver (dim is small
    by construction)."""
    from ..functions.hashing import stable_bucket
    from .relational import grouped_agg

    def per_batch(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(
            pc.utf8_lower(pc.fill_null(t[text_col], "")))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "c": pa.array([], pa.int64())})
        b = np.asarray(stable_bucket(flat, dim), dtype=np.int64)
        cnt = np.bincount(b, minlength=dim)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz.astype(np.int32)),
                         "c": pa.array(cnt[nz])})

    agg = grouped_agg(ds.map_batches(per_batch, batch_format="pyarrow"),
                      ["bucket"], {"c": ("c", "sum")}).to_pandas()
    out = np.zeros(dim, dtype=np.float64)
    out[agg["bucket"].to_numpy()] = agg["c"].to_numpy()
    return out


def dsir_score_stage(lam_ref, id_col: str, text_col: str, *, dim: int):
    """Batch fn scoring docs by mean hashed-unigram log-likelihood ratio
    (DSIR importance weight). ``lam_ref`` is a ``ray.put`` handle to the
    dense float64[dim] log-ratio vector — broadcast once, zero-copy from
    the object store in every task."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        from ..functions.hashing import stable_bucket

        lam = ray.get(lam_ref)
        trimmed = pc.utf8_trim_whitespace(
            pc.utf8_lower(pc.fill_null(t[text_col], "")))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        if len(flat):
            b = np.asarray(stable_bucket(flat, dim), dtype=np.int64)
            vals = lam[b]
        else:
            vals = np.zeros(0, dtype=np.float64)
        cs = np.concatenate([[0.0], np.cumsum(vals)])
        ends = np.cumsum(lens)
        starts = ends - lens
        tot = cs[ends] - cs[starts]
        score = np.divide(tot, lens, out=np.zeros_like(tot),
                          where=lens > 0)
        return pa.table({id_col: t[id_col],
                         "dsir_score": pa.array(score)})

    return fn


def dsir_importance_scores(raw, target, id_col: str = "doc_id",
                           text_col: str = "text", *, dim: int = 4096,
                           alpha: float = 1.0):
    """DSIR (Data Selection with Importance Resampling, Xie et al. 2023):
    score every ``raw`` doc by how target-like its hashed-unigram
    distribution is — mean log((p_target+α)/(p_raw+α)) over the doc's
    token buckets. Two tiny profile exchanges + one broadcast + one
    stateless scoring pass; nothing large ever concentrates.

    Returns a Dataset of ``(id_col, dsir_score)``; select with topk /
    weighted sampling downstream."""
    import ray

    tgt = hashed_token_profile(target, text_col, dim=dim)
    rawp = hashed_token_profile(raw, text_col, dim=dim)
    lam = (np.log((tgt + alpha) / (tgt + alpha).sum())
           - np.log((rawp + alpha) / (rawp + alpha).sum()))
    lam_ref = ray.put(lam)
    return raw.map_batches(dsir_score_stage(lam_ref, id_col, text_col, dim=dim),
                           batch_format="pyarrow")


def levenshtein_batch(a, b) -> np.ndarray:
    """Vectorized-across-pairs Levenshtein edit distance (C8 string
    similarity): classic O(|a|·|b|) dynamic program, but every DP cell
    update runs as one numpy op over ALL pairs in the batch — Python
    loops scale with string LENGTH (bounded, e.g. 48 for a prefix
    compare), never with batch size. ``a``/``b``: sequences of str."""
    a = list(a)
    b = list(b)
    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.asarray([len(s) for s in a], dtype=np.int64)
    lb = np.asarray([len(s) for s in b], dtype=np.int64)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    # pad with side-distinct sentinels so padded tails never match
    A = np.full((P, ma), -1, dtype=np.int32)
    B = np.full((P, mb), -2, dtype=np.int32)
    # surrogatepass: lone surrogates cannot reach the engine (Arrow
    # strings are valid UTF-8) but the kernel stays total over ANY
    # Python str — hypothesis found '\ud800' crashing the plain encode
    for p, s in enumerate(a):
        A[p, :len(s)] = np.frombuffer(
            s.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    for p, s in enumerate(b):
        B[p, :len(s)] = np.frombuffer(
            s.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    prev = np.tile(np.arange(ma + 1, dtype=np.int64), (P, 1))
    out = np.where(lb == 0, la, 0)
    for j in range(1, mb + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = j
        bj = B[:, j - 1][:, None]           # [P,1] char of b at j
        sub = prev[:, :-1] + (A != bj)      # substitution / match
        dele = prev[:, 1:] + 1              # delete from a
        best = np.minimum(sub, dele)
        for i in range(1, ma + 1):          # insert needs the fresh cell
            cur[:, i] = np.minimum(best[:, i - 1], cur[:, i - 1] + 1)
        live = lb == j                      # pairs whose b ends exactly here
        if live.any():
            out[live] = cur[live, la[live]]
        prev = cur
    return out


def bigram_logprob_stage(uni_ref, bi_ref, vocab_size: int, id_col: str,
                         text_col: str):
    """Batch fn scoring docs by mean add-half-smoothed bigram
    log-probability (a corpus-trained statistical LM — the classic
    perplexity quality filter). Probabilities and logs are computed with
    ONE canonical expression, then scaled ×1e6 and floored to int64 per
    bigram BEFORE summing — integer sums are order-independent, so the
    distributed result is exactly replayable (and SQL-oracle-able) in
    any execution order.

    ``uni_ref``/``bi_ref``: ray.put handles to pandas Series count maps
    (token → n, "a b" → n)."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        uni, bi = ray.get(uni_ref), ray.get(bi_ref)
        trimmed = pc.utf8_trim_whitespace(
            pc.utf8_lower(pc.fill_null(t[text_col], "")))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        ends = np.cumsum(lens)
        if n >= 2:
            m = n - 1
            bg = pc.binary_join_element_wise(flat.slice(0, m),
                                             flat.slice(1, m), " ")
            prev = flat.slice(0, m)
            valid = np.ones(m, dtype=bool)
            inv = ends[:-1] - 1
            inv = inv[(inv >= 0) & (inv < m)]
            valid[inv] = False            # pairs straddling a doc boundary
            c_bi = bi.reindex(bg.to_pylist(), fill_value=0).to_numpy(np.float64)
            c_un = uni.reindex(prev.to_pylist(), fill_value=0).to_numpy(np.float64)
            # canonical prob/log expression — identical in the SQL oracle
            p = (c_bi + 0.5) / (c_un + 0.5 * vocab_size)
            scaled = np.floor(1e6 * np.log(p)).astype(np.int64)
            scaled[~valid] = 0
        else:
            m = 0
            scaled = np.zeros(0, dtype=np.int64)
            valid = np.zeros(0, dtype=bool)
        cs = np.concatenate([[0], np.cumsum(scaled)])
        vs = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
        starts = ends - lens
        e_cl = np.minimum(ends - 1, m)
        s_cl = np.minimum(starts, m)
        tot = cs[np.maximum(e_cl, 0)] - cs[np.maximum(s_cl, 0)]
        cnt = vs[np.maximum(e_cl, 0)] - vs[np.maximum(s_cl, 0)]
        # exact integer mean in micro-nats (float tot/cnt can land on a
        # .5 ulp and round differently per engine). tot ≤ 0 always, and
        # numpy floor-divides where DuckDB truncates — dividing the
        # NEGATED (positive) value makes floor == trunc on both sides.
        mean_u = np.where(cnt > 0,
                          -(np.floor_divide(-tot, np.maximum(cnt, 1))), 0)
        return pa.table({id_col: t[id_col],
                         "n_bigrams": pa.array(cnt.astype(np.int64)),
                         "mean_logprob_u": pa.array(mean_u.astype(np.int64))})

    return fn


def segment_explode(t: pa.Table, id_col: str, text_col: str,
                    words_per_seg: int = 10) -> pa.Table:
    """Explode each document into consecutive fixed-width word segments →
    one flat ``(id_col, seg_idx, seg)`` table per batch (the C4-style
    "paragraph" unit for corpus-wide segment dedup, on word windows since
    the synthetic corpus has no line structure). Whitespace-split words of
    ALL docs in the batch stay in one flat Arrow array; because consecutive
    segments tile each doc exactly, the segment list-offsets array is pure
    per-doc arithmetic-progression math, and every segment string comes
    from ONE vectorized ``binary_join`` — no per-row Python. Whitespace-only
    docs contribute nothing."""
    split = split_whitespace_safe(pc.fill_null(t[text_col], ""))
    flat = split.flatten()
    offsets = split.offsets.to_numpy().astype(np.int64)
    # Arrow's splitter keeps empty tokens around whitespace runs; drop them
    # and remap offsets via a prefix sum (str.split() semantics).
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        cs = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        offsets = cs[offsets]
        flat = flat.filter(pa.array(nonempty))
    lens = np.diff(offsets)
    nseg = -(-lens // words_per_seg)            # ceil; 0 for empty docs
    total = int(nseg.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                         "seg_idx": pa.array([], pa.int64()),
                         "seg": pa.array([], pa.string())})
    cum = np.concatenate(([0], np.cumsum(nseg)))
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], nseg)
    seg_starts = np.repeat(offsets[:-1], nseg) + words_per_seg * intra
    seg_offsets = np.append(seg_starts, offsets[-1]).astype(np.int32)
    segs = pc.binary_join(
        pa.ListArray.from_arrays(seg_offsets, flat.cast(pa.string())), " ")
    docidx = np.repeat(np.arange(len(lens), dtype=np.int64), nseg)
    ids = (t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray)
           else t[id_col]).take(pa.array(docidx))
    return pa.table({id_col: ids,
                     "seg_idx": pa.array(intra, pa.int64()),
                     "seg": segs.cast(pa.string())})


def reassemble_segments(s: pa.Table, kept: np.ndarray, id_col: str = "doc_id",
                        seg_col: str = "seg",
                        out_col: str = "clean_text") -> pa.Table:
    """Rebuild documents from the ``kept``-flagged rows of a
    ``segment_explode`` table (one space-joined string per doc; docs whose
    segments are all dropped vanish). Offsets come from run-length
    boundaries of ``id_col`` in BATCH ORDER — ``segment_explode`` emits
    each doc's segments contiguously, but nothing guarantees doc ids are
    globally sorted within a block, and a sorted-id assumption (np.unique)
    would reassemble documents from each other's segments."""
    n = s.num_rows
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         out_col: pa.array([], pa.string())})
    docidx = s[id_col].to_numpy(zero_copy_only=False)
    starts = np.concatenate(
        ([0], np.flatnonzero(docidx[1:] != docidx[:-1]) + 1))
    bounds = np.append(starts, n)
    run_ids = docidx[starts]
    kept_cum = np.concatenate(([0], np.cumsum(kept)))
    counts = kept_cum[bounds[1:]] - kept_cum[bounds[:-1]]
    offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    segs_kept = s[seg_col].filter(pa.array(kept))
    clean = pc.binary_join(
        pa.ListArray.from_arrays(offs, segs_kept.combine_chunks()
                                 if isinstance(segs_kept, pa.ChunkedArray)
                                 else segs_kept), " ")
    m = counts > 0
    return pa.table({id_col: pa.array(run_ids[m], pa.int64()),
                     out_col: clean.filter(pa.array(m))})


def sliding_chunk_explode(t: pa.Table, id_col: str, text_col: str, *,
                          width: int = 50, stride: int = 25) -> pa.Table:
    """Explode each document into OVERLAPPING word windows (RAG-style
    sliding chunks): chunk c covers words [stride·c, stride·c + width) and
    chunks exist while stride·c < len(words). Like ``segment_explode`` the
    whole batch's words stay in one flat Arrow array, but overlapping
    windows don't tile the doc, so a vectorized gather-index (the
    repeat/cumsum arange trick) materializes each chunk's word span before
    ONE ``binary_join`` — still no per-row Python."""
    split = split_whitespace_safe(pc.fill_null(t[text_col], ""))
    flat = split.flatten()
    offsets = split.offsets.to_numpy().astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        cs = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        offsets = cs[offsets]
        flat = flat.filter(pa.array(nonempty))
    lens = np.diff(offsets)
    nchunk = -(-lens // stride)                  # ceil; 0 for empty docs
    total = int(nchunk.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string())})
    cum = np.concatenate(([0], np.cumsum(nchunk)))
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], nchunk)
    doc_start = np.repeat(offsets[:-1], nchunk)
    doc_end = np.repeat(offsets[1:], nchunk)
    c_start = doc_start + stride * intra
    c_len = np.minimum(c_start + width, doc_end) - c_start
    # gather index: concat of [c_start_i, c_start_i + c_len_i) per chunk
    goff = np.concatenate(([0], np.cumsum(c_len)))
    idx = (np.arange(goff[-1], dtype=np.int64)
           - np.repeat(goff[:-1], c_len) + np.repeat(c_start, c_len))
    words = flat.take(pa.array(idx))
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(goff.astype(np.int32),
                                 words.combine_chunks()
                                 if isinstance(words, pa.ChunkedArray)
                                 else words), " ")
    docidx = np.repeat(np.arange(len(lens), dtype=np.int64), nchunk)
    ids = (t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray)
           else t[id_col]).take(pa.array(docidx))
    return pa.table({id_col: ids,
                     "chunk_id": pa.array(intra, pa.int64()),
                     "chunk_text": chunks.cast(pa.string())})


def add_compression_ratio(batch: pa.Table, text_col: str = "text",
                          out_col: str = "deflate_ratio") -> pa.Table:
    """Deflate compression ratio per document (compressed/raw bytes, level
    6): highly templated or repetitive text compresses far below ~0.5 —
    a standard corpus-quality signal complementing the Gopher repetition
    fractions. Deterministic (fixed zlib level); the per-row C deflate
    call is the dominant cost by design — ratio of byte lengths only,
    the compressed bytes are never kept. Not SQL-expressible → rows-only
    driver check, behavior-tested in pytest."""
    import zlib

    s = batch[text_col].to_pandas()
    raw = s.fillna("").map(lambda v: v.encode())
    ratio = raw.map(lambda b: len(zlib.compress(b, 6)) / max(len(b), 1))
    return batch.append_column(out_col,
                               pa.array(ratio.to_numpy(), pa.float64()))


# PII scrubbing (training-data hygiene): ordered (pattern, token) passes.
# Patterns are RE2-compatible and translate VERBATIM to DuckDB's RE2
# regexp_replace(..., 'g') — the oracle replays the same chain in the same
# order, so redaction is value-checked end-to-end. Order matters only for
# overlapping classes (an email's domain can't match the IP pattern — the
# TLD class is alphabetic — but the fixed order makes agreement a
# non-question). \b is an ASCII word boundary in both engines.
PII_PASSES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
)


def pii_redact_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str = "redacted") -> pa.Table:
    """Redact PII spans in one vectorized pass chain: per class, count
    matches (``count_substring_regex``) then replace-all
    (``replace_substring_regex`` — RE2 global semantics). Appends the
    redacted column plus one int64 count per class (``n_email`` /
    ``n_ip`` / ``n_phone``); the original column is preserved for
    downstream audit. Stateless — safe as a task-pool ``map_batches``."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    counts = {}
    red = text
    for (pat, token), name in zip(PII_PASSES, ("n_email", "n_ip", "n_phone")):
        counts[name] = pc.cast(
            pc.fill_null(pc.count_substring_regex(red, pat), 0), pa.int64())
        red = pc.replace_substring_regex(red, pattern=pat, replacement=token)
    out = batch.append_column(out_col, red)
    for name, arr in counts.items():
        out = out.append_column(name, arr)
    return out


def ed1_blocking_keys(s: str) -> list[tuple[int, str]]:
    """Half-string pigeonhole blocking keys for the ed≤1 self-join:
    (band, key) pairs where band encodes (half-length h,
    prefix-or-suffix) and key is the corresponding half-string. Two
    strings within edit distance 1 ALWAYS share at least one key (see
    ``edit_distance_selfjoin`` for the proof); hypothesis-tested directly
    in tests/test_property.py. Only 4 keys/row, but a domain-wide shared
    prefix ('Supplier#…') collapses a whole band into ONE O(n²) bucket —
    prefer ``ed1_deletion_keys`` for identifier-like domains."""
    ls = len(s)
    out = []
    for h in {max(ls // 2, 0), max((ls - 1) // 2, 0)}:
        out.append((h * 2, s[:h]))
        out.append((h * 2 + 1, s[-h:] if h else ""))
    return out


def ed1_deletion_keys(s: str) -> list[tuple[int, str]]:
    """FastSS deletion-neighborhood blocking keys for the ed≤1 self-join:
    the string itself plus every single-character-deletion variant,
    deduped. Completeness: ed(s,t)=1 is a substitution (deleting the
    edited position from both sides yields equal variants), an insertion
    into s (deleting the inserted char from t yields s, which is s's own
    self-key), or equality (self keys match); spurious shared variants
    (e.g. 'ab'/'ba' both delete to 'a') die in the exact DP verify.
    Buckets stay tiny on identifier-like domains where every value shares
    a long common prefix — the half-key pathological case — at the cost
    of L+1 hashed keys per row instead of 4 (the exchange carries 16-byte
    hashed keys, not the variants themselves)."""
    out = {(0, s)}
    for i in range(len(s)):
        out.add((0, s[:i] + s[i + 1:]))
    return sorted(out)


def edk_deletion_keys(s: str, k: int) -> list[tuple[int, str]]:
    """FastSS deletion-neighborhood keys for ed≤k: every variant of ``s``
    with AT MOST ``k`` single-character deletions, deduped. Completeness
    (Bocek et al. 2007): take an optimal alignment witnessing
    ed(s,t) ≤ k and delete from ``s`` the positions it substitutes or
    deletes and from ``t`` the positions it substitutes or inserts —
    both sides reach the SAME string with ≤ k deletions each, so the
    neighborhoods intersect. Key count grows O(L^k / k!) (L=20, k=2 →
    ~211 hashed keys/row) — the identifier-length domain this join is
    for, not free text."""
    frontier = {s}
    out = {(0, s)}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        out.update((0, v) for v in nxt)
        frontier = nxt
    return sorted(out)


def edit_distance_selfjoin(ds, text_col: str = "text",
                           id_col: str = "doc_id", *, k: int = 1,
                           block: str = "deletions"):
    """EXACT edit-distance-≤k similarity self-join (entity-resolution /
    data-cleaning C4 shape) via complete blocking + DP verify.

    ``block`` selects the (provably complete) blocking-key scheme:
    'deletions' (default) = FastSS deletion neighborhood
    (``ed1_deletion_keys``: L+1 hashed keys/row, buckets bounded by true
    near-match density — right for identifier-like domains with shared
    prefixes); 'halves' = prefix/suffix pigeonhole
    (``ed1_blocking_keys``: 4 keys/row — for ed(s,t) ≤ 1 with
    h = ⌊min(|s|,|t|)/2⌋ one edit cannot touch both the length-h prefix
    and the length-h suffix since h+h ≤ min length — cheaper keys, but a
    corpus-wide shared prefix collapses a band into one O(n²) bucket).
    Both schemes emit every true pair; false candidates die in the exact
    vectorized DP verify, so the output is identical either way
    (unit-tested).

    Scale shape: rides ``dedup._hot_bucket_pairs`` — the blocking-key
    count exchange is keys-only (hashed, 16 B/key); TEXT ships only for
    rows already in a ≥2-member bucket. k ∈ {2, 3} uses the generalized
    ``edk_deletion_keys`` neighborhood (key count O(L^k) — identifier
    domains, not free text).

    Returns a Dataset of (a, b, dist) with a < b and dist ≤ k.
    """
    import pandas as pd

    from .dedup import _hot_bucket_pairs, _stable_hash64

    if block == "halves":
        if k != 1:
            raise NotImplementedError("half-string pigeonhole keys only "
                                      "cover k=1; use block='deletions'")
        keys_fn = ed1_blocking_keys
    elif block == "deletions":
        if k == 1:
            keys_fn = ed1_deletion_keys
        elif k in (2, 3):
            keys_fn = lambda s: edk_deletion_keys(s, k)  # noqa: E731
        else:
            raise NotImplementedError("deletion-neighborhood key count is "
                                      "O(L^k); k ≤ 3 supported")
    else:
        raise ValueError(f"unknown blocking scheme {block!r}")

    def to_bands(batch: pa.Table, carry_text: bool) -> pa.Table:
        txt = batch[text_col].to_pandas().fillna("")
        ids = batch[id_col].to_numpy()
        # per-row-bounded slicing has no vectorized pandas form; the keys
        # are short substrings, so this loop is O(batch) slices
        recs_id, recs_band, recs_key = [], [], []
        tl = txt.tolist()
        for i, s in enumerate(tl):
            for band, key in keys_fn(s):
                recs_id.append(i)
                recs_band.append(band)
                recs_key.append(key)
        take = np.asarray(recs_id, dtype=np.int64)
        kh = _stable_hash64(pd.Series(recs_key)).view(np.int64)
        cols = {
            id_col: pa.array(ids[take]),
            "band_id": pa.array(np.asarray(recs_band, np.int32)),
            "band_hash": pa.array(kh, pa.int64()),
        }
        if carry_text:
            t = batch[text_col]
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            cols[text_col] = t.take(pa.array(take))
        return pa.table(cols)

    banded = ds.map_batches(to_bands, fn_kwargs={"carry_text": False},
                            batch_format="pyarrow")
    banded_text = ds.map_batches(to_bands, fn_kwargs={"carry_text": True},
                                 batch_format="pyarrow")

    def ed_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        txt = g[text_col].fillna("").to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64")})
        L = np.asarray([len(x) for x in txt])
        iu = np.triu_indices(len(ids), k=1)
        cand = np.flatnonzero(np.abs(L[iu[0]] - L[iu[1]]) <= k)
        if not len(cand):
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64")})
        d = levenshtein_batch(txt[iu[0][cand]], txt[iu[1][cand]])
        hit = d <= k
        return pd.DataFrame({"a": ids[iu[0][cand[hit]]],
                             "b": ids[iu[1][cand[hit]]],
                             "dist": d[hit].astype(np.int64)})

    id_type = pa.int64()
    pairs = _hot_bucket_pairs(
        banded, ed_pairs, banded_verify=banded_text,
        materialize_banded=False,
        verify_schema=pa.schema([(id_col, id_type),
                                 ("band_id", pa.int32()),
                                 ("band_hash", pa.int64()),
                                 (text_col, pa.string())]))
    return pairs


def dup_substring_spans(ds, *, min_len: int = 40, id_col: str = "doc_id",
                        text_col: str = "text",
                        num_buckets: int | None = None):
    """ExactSubstr-style maximal duplicate-span extraction (the
    suffix-array dedup of Lee et al. 2022, re-expressed as three keyed
    exchanges): every maximal substring of length ≥ ``min_len`` BYTES
    shared by two distinct documents, as
    ``(a_id, b_id, a_start, b_start, length)`` with ``a_id < b_id`` and
    0-based byte offsets.

    Shape: (1) an anchor pass emits one rolling polynomial hash per
    min_len-byte window — vectorized over each batch's flat Arrow string
    buffer (prefix products/sums mod 2^64, odd base so window hashes
    normalize by a modular-inverse power; no per-row Python). This is
    O(corpus bytes) rows of (hash, id, pos), the same order as the
    suffix-array the reference technique materializes — the honest cost
    of EXACT all-pairs span discovery. (2) one exchange groups anchors
    by hash; multi-member groups expand to cross-doc position pairs.
    (3) a second exchange groups pairs by (a, b, offset-delta); runs of
    consecutive positions ARE the maximal spans (a shared span of length
    M contributes exactly M−min_len+1 consecutive anchor pairs at one
    delta, and a matching byte beyond either end would extend the run,
    so run-maximality == span-maximality). (4) spans join the two texts
    back (spans are bounded by duplicate content, orders below the
    corpus) and every span is verified by exact byte compare — a hash
    collision (~2⁻⁶⁴) can only create or over-extend a run, never hide
    one, so collisions surface as a failed verify, never a missed span.

    Inputs must be non-null; positions are BYTE offsets (equal to
    character offsets for ASCII corpora — the SQL-oracle parity
    condition).
    """
    import pandas as pd

    from .relational import hash_join
    from .window import _bucketed_apply

    L = int(min_len)

    def anchors(t: pa.Table) -> pa.Table:
        a = pc.fill_null(t[text_col], "").combine_chunks()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        off_dtype = (np.int64 if pa.types.is_large_string(a.type)
                     else np.int32)
        off = np.frombuffer(a.buffers()[1], dtype=off_dtype)[
            a.offset: a.offset + len(a) + 1].astype(np.int64)
        data = np.frombuffer(a.buffers()[2], dtype=np.uint8)[
            off[0]: off[-1]]
        off = off - off[0]
        n = data.shape[0]
        empty = pa.table({"h": pa.array([], pa.int64()),
                          "id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if n < L:
            return empty
        base = 1099511628211  # odd → invertible mod 2^64
        pw = np.empty(n, np.uint64)
        pw[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, base, np.uint64), out=pw[1:])
        ipw = np.empty(n, np.uint64)
        ipw[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, pow(base, -1, 1 << 64), np.uint64),
                       out=ipw[1:])
        # S[i] = Σ_{j<i} byte[j]·base^(n−1−j) (wrapping); window [i,i+L)
        # hash = (S[i+L]−S[i])·base^−(n−L−i) — position-independent
        S = np.zeros(n + 1, np.uint64)
        np.cumsum(data.astype(np.uint64) * pw[::-1], out=S[1:])
        norm = (S[L:] - S[:-L]) * ipw[n - L::-1]
        lens = np.diff(off)
        nwin = np.maximum(lens - L + 1, 0)
        total = int(nwin.sum())
        if total == 0:
            return empty
        starts = np.repeat(off[:-1], nwin)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(nwin) - nwin, nwin)
        return pa.table({
            "h": pa.array(norm[starts + intra].view(np.int64)),
            "id": pa.array(np.repeat(ids, nwin)),
            "pos": pa.array(intra)})

    anchor_ds = ds.map_batches(anchors, batch_format="pyarrow")

    def pair_fn(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="h")
        m = m[m["id_x"] < m["id_y"]]
        if m.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("k", "a", "b", "delta", "pos")})
        a = m["id_x"].to_numpy()
        b = m["id_y"].to_numpy()
        delta = m["pos_x"].to_numpy() - m["pos_y"].to_numpy()
        # composite co-location key for the run exchange (wrapping is
        # fine — it only places (a,b,delta) groups, grouping is exact)
        k = (a * np.int64(1000003) + b) * np.int64(1000003) + delta
        return pd.DataFrame({"k": k, "a": a, "b": b, "delta": delta,
                             "pos": m["pos_x"].to_numpy()})

    pairs = _bucketed_apply(anchor_ds, "h", pair_fn,
                            num_buckets=num_buckets)

    def run_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["a", "b", "delta", "pos"], kind="mergesort")
        brk = (df[["a", "b", "delta"]].ne(
            df[["a", "b", "delta"]].shift()).any(axis=1).to_numpy()
            | (df["pos"].diff().fillna(2) != 1).to_numpy())
        isl = np.cumsum(brk)
        g = df.groupby(isl, sort=False)
        out = pd.DataFrame({
            "a_id": g["a"].first(), "b_id": g["b"].first(),
            "a_start": g["pos"].min(),
            "delta": g["delta"].first(), "n": g["pos"].size()})
        out["b_start"] = out["a_start"] - out["delta"]
        out["length"] = out["n"] + L - 1
        return out[["a_id", "b_id", "a_start", "b_start",
                    "length"]].reset_index(drop=True)

    spans = _bucketed_apply(pairs, "k", run_fn, num_buckets=num_buckets)

    span_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                             ("a_start", pa.int64()), ("b_start", pa.int64()),
                             ("length", pa.int64())])
    docs = ds.map_batches(
        lambda t: pa.table({"a_id": pc.cast(t[id_col], pa.int64()),
                            "__ta": pc.fill_null(t[text_col], "")}),
        batch_format="pyarrow")
    j1 = hash_join(spans, docs, on="a_id", left_schema=span_schema,
                   right_schema=pa.schema([("a_id", pa.int64()),
                                           ("__ta", pa.string())]))
    docs_b = ds.map_batches(
        lambda t: pa.table({"b_id": pc.cast(t[id_col], pa.int64()),
                            "__tb": pc.fill_null(t[text_col], "")}),
        batch_format="pyarrow")
    j2 = hash_join(j1, docs_b, on="b_id",
                   left_schema=span_schema.append(pa.field("__ta",
                                                           pa.string())),
                   right_schema=pa.schema([("b_id", pa.int64()),
                                           ("__tb", pa.string())]))

    def verify(t: pa.Table) -> pa.Table:
        # spans are few (bounded by shared content); the per-span slice
        # compare is O(span bytes) each and stays off any O(corpus) path
        ta = t["__ta"].to_pylist()
        tb = t["__tb"].to_pylist()
        sa = t["a_start"].to_numpy()
        sb = t["b_start"].to_numpy()
        ln = t["length"].to_numpy()
        keep = np.fromiter(
            (ta[i].encode()[sa[i]:sa[i] + ln[i]]
             == tb[i].encode()[sb[i]:sb[i] + ln[i]]
             for i in range(t.num_rows)), dtype=bool, count=t.num_rows)
        return t.filter(pa.array(keep)).select(
            ["a_id", "b_id", "a_start", "b_start", "length"])

    return j2.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------------------ URLs ----

_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/:?#]+)"
           r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
           r"(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$")

_DEFAULT_PORTS = (("http", "80"), ("https", "443"))


def canonicalize_urls(urls, *, drop_param_prefixes: tuple[str, ...] = ("utm_",)):
    """Vectorized URL canonicalization — the first normalization pass of
    every web-crawl dedup pipeline (two fetches of the same resource must
    collide BEFORE content dedup ever runs):

    - scheme and host lowercased;
    - default ports stripped (http:80, https:443), others kept;
    - path: runs of '/' collapsed, trailing '/' stripped (root kept),
      empty path → '/';
    - fragment dropped;
    - query: params with a ``drop_param_prefixes`` prefix (tracking
      params) removed, the rest SORTED by byte order and rejoined — order
      differences stop mattering.

    One ``extract_regex`` + Arrow string kernels; the per-row param sort
    is two stable argsorts over the flattened param list (offset
    arithmetic, no Python loop). Non-URL rows return null. Returns a
    ``pa.Array`` aligned with the input.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    st = pc.extract_regex(urls, _URL_RE)
    bad = st.is_null()
    scheme = pc.utf8_lower(st.field("scheme"))
    host = pc.utf8_lower(st.field("host"))
    port = st.field("port")
    drop_port = pc.equal(port, "")
    for sch, prt in _DEFAULT_PORTS:
        drop_port = pc.or_(drop_port, pc.and_(pc.equal(scheme, sch),
                                              pc.equal(port, prt)))
    port_sfx = pc.if_else(drop_port, "",
                          pc.binary_join_element_wise(":", port, ""))
    path = st.field("path")
    path = pc.replace_substring_regex(path, "/{2,}", "/")
    path = pc.replace_substring_regex(path, "^$", "/")
    path = pc.replace_substring_regex(path, "(.)/$", "\\1")

    # query params: flatten → drop tracking/empty → stable two-pass sort
    # (by param bytes, then by row) → regroup → join
    query = st.field("query")
    parts = pc.split_pattern(query, "&")
    flat = parts.flatten()
    n = len(urls)
    counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
    rowidx = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = pc.invert(pc.equal(flat, ""))
    for pref in drop_param_prefixes:
        keep = pc.and_(keep, pc.invert(pc.starts_with(flat, pref)))
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat_np = flat.to_numpy(zero_copy_only=False)[keep_np]
    rowidx = rowidx[keep_np]
    o1 = np.argsort(flat_np, kind="stable")
    o2 = np.argsort(rowidx[o1], kind="stable")
    order = o1[o2]
    kept_counts = np.bincount(rowidx, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=offsets[1:])
    relist = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(flat_np[order], pa.string()))
    joined = pc.binary_join(relist, "&")
    q_sfx = pc.if_else(pc.equal(joined, ""), "",
                       pc.binary_join_element_wise("?", joined, ""))

    out = pc.binary_join_element_wise(
        scheme, "://", host, port_sfx, path, q_sfx, "")
    return pc.if_else(bad, pa.scalar(None, pa.string()), out)


def extract_links(texts) -> pa.ListArray:
    """All ``<a href="...">`` targets per row, in document order —
    vectorized explode, no per-row Python: split each row on the literal
    anchor prefix, drop every row's FIRST segment (pre-anchor text, an
    offset-arithmetic mask), take each remaining segment's prefix up to
    the closing quote. Segments with no closing quote (truncated HTML)
    drop out as extract_regex nulls. Returns a ListArray aligned with
    the input; callers filter relative targets with their own host
    regex."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern(pc.fill_null(texts, ""), '<a href="')
    flat = parts.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(texts)
    offs = parts.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offs)
    mask = np.ones(len(flat), dtype=bool)
    mask[offs[:-1]] = False  # each row's first segment precedes any anchor
    st = pc.extract_regex(flat, '^(?P<u>[^"]*)"')
    # children of null struct rows hold '' (not null) — gate on the
    # STRUCT's validity, not the child's
    keep = mask & st.is_valid().to_numpy(zero_copy_only=False)
    rowidx = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
    vals = st.field("u").filter(pa.array(keep))
    kept_counts = np.bincount(rowidx, minlength=n)
    out_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=out_offs[1:])
    return pa.ListArray.from_arrays(pa.array(out_offs, pa.int32()), vals)


def html_to_text(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Boilerplate-free text from simple HTML: tags strip to spaces
    (one RE2 pass), the five standard entities decode with ``&amp;``
    LAST — so a literal ``&amp;lt;`` correctly renders ``&lt;`` rather
    than double-decoding — and whitespace collapses to single spaces.
    All pyarrow kernel passes, no per-row Python; the crawl-lane
    text-extraction stage between WARC ingest and the document
    cleanup funnel."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.replace_substring_regex(arr, pattern=r"<[^>]*>",
                                   replacement=" ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(s)


def sanitize_utf8(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Binary → valid-UTF-8 string with U+FFFD replacement — the
    decoder real web crawls need (mojibake, truncated multibyte tails,
    latin-1 strays). Fast path: one zero-copy cast attempt for the
    whole array — clean batches (the overwhelming majority) never see
    Python; only a batch Arrow rejects pays the per-row decode, with
    ``errors='replace'`` applied just to rows strict decode refuses.
    Nulls stay null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        return pc.cast(arr, pa.string())
    except pa.ArrowInvalid:
        pass
    out = []
    for v in arr:
        b = v.as_py()
        if b is None:
            out.append(None)
            continue
        try:
            out.append(b.decode("utf-8"))
        except UnicodeDecodeError:
            out.append(b.decode("utf-8", errors="replace"))
    return pa.array(out, pa.string())
