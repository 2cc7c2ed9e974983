"""Text-analysis operators over a document table (SURVEY.md task mandate):
language-ID, quality scoring, token counting, document fingerprinting.

All batch bodies are vectorized (pyarrow.compute / pandas str / numpy);
the only per-row Python is hashing/ngram set construction where a scalar
kernel is unavoidable — kept in numpy inner loops.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- tokens ----

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count, vectorized."""
    ws = pc.count_substring_regex(batch[text_col], r"\S+")
    bpe = pc.count_substring_regex(batch[text_col], TOKEN_REGEX)
    batch = batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
    return batch.append_column("n_tokens_bpe", pc.cast(bpe, pa.int64()))


# ------------------------------------------------------------- fingerprint --

def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic document fingerprint: md5 of lowercased text (hex).

    md5 keeps the op DuckDB-oracle-able (``md5(lower(text))``); see
    ``add_rolling_fingerprint`` for the rolling-hash variant.
    """
    low = pc.utf8_lower(batch[text_col])
    s = low.to_pandas()
    fp = s.map(lambda v: hashlib.md5(v.encode()).hexdigest() if v is not None else None)
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


_ROLL_BASE = 1099511628211
_ROLL_SEED = 14695981039346656037
_U64 = (1 << 64) - 1


def _rolling_hash(tokens: list[str]) -> int:
    h = _ROLL_SEED
    for t in tokens:
        th = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        h = ((h * _ROLL_BASE) & _U64) ^ th
    return h


def add_rolling_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Order-sensitive rolling (FNV-style) hash over the token stream."""
    s = batch[text_col].to_pandas().fillna("")
    toks = s.str.split()
    fp = toks.map(_rolling_hash).astype("uint64")
    return batch.append_column("rolling_fp", pa.array(fp, pa.uint64()))


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
        self.profiles = _LANG_PROFILES
        self.word_rx = re.compile(r"[a-zàâäéèêëíìîïóòôöúùûüñçß]+")
        self.cjk_rx = re.compile(r"[一-鿿぀-ヿ가-힯]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("")
        preds, scores = [], []
        for v in s:
            cjk = len(self.cjk_rx.findall(v))
            if cjk and cjk / max(len(v), 1) > 0.05:
                preds.append("zh")
                scores.append(min(1.0, cjk / max(len(v), 1) * 4))
                continue
            words = set(self.word_rx.findall(v.lower()))
            best, best_n = "unknown", 0
            for lang, prof in self.profiles.items():
                n = len(words & prof)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best if best_n >= 2 else "unknown")
            scores.append(min(1.0, best_n / 8))
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_score", pa.array(scores, pa.float64()))


# ----------------------------------------------------------------- quality --

_STOPWORDS = _LANG_PROFILES["en"]


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    word length, digit ratio → composite ``quality`` in [0,1]. Vectorized
    pyarrow kernels except the stopword set intersection (pandas map)."""
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

    s = text.to_pandas().fillna("")
    toks = s.str.lower().str.findall(r"[a-z]+")
    stop_ratio = toks.map(lambda ws: sum(w in _STOPWORDS for w in ws) / max(1, len(ws)))
    stop_arr = pa.array(stop_ratio, pa.float64())

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
