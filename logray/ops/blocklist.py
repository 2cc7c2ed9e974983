"""Multi-phrase blocklist filtering — the UT1/RefinedWeb content gate.

Web-crawl training pipelines drop documents that hit a curated phrase /
domain blocklist (RefinedWeb §3.1 uses the UT1 lists; C4 uses a "bad
words" list). The classic engine for K-pattern matching is Aho–Corasick:
one automaton pass over the bytes, O(bytes) independent of K. RE2 gives
the same asymptotics for a literal alternation — it compiles
``p1|p2|...`` into a lazy DFA — and Arrow's ``count_substring_regex``
runs that DFA as ONE vectorized kernel pass per batch with zero Python
in the loop. So the scale shape here is: compile the alternation once
per actor (``__init__``), scan each batch with a single kernel call.
K separate ``count_substring`` passes would pay O(K·bytes); this pays
O(bytes) like AC.

Match semantics are the standard non-overlapping left-to-right scan
(both RE2 surfaces — Arrow and DuckDB — resume after each match end),
with longer phrases preferred at equal start positions because the
alternation is sorted longest-first. That makes the DuckDB replay
(``regexp_extract_all`` over the same alternation) an exact oracle.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["BlocklistStage", "blocklist_pattern"]


def blocklist_pattern(phrases: list[str], *, whole_word: bool = True) -> str:
    """Compile a phrase list into one RE2 alternation (the AC analogue).

    Phrases are regex-escaped (they are literals, not patterns) and
    sorted longest-first so the leftmost-FIRST alternative RE2 picks at
    a shared start position is the longest phrase — i.e. leftmost-
    longest, the AC reporting convention for nested phrases.
    """
    if not phrases:
        raise ValueError("blocklist: empty phrase list")
    ordered = sorted(set(phrases), key=lambda p: (-len(p), p))
    pat = "|".join(re.escape(p.lower()) for p in ordered)
    return r"\b(?:" + pat + r")\b" if whole_word else "(?:" + pat + ")"


class BlocklistStage:
    """Actor-pool stage: per-doc blocklist hit count + verdict.

    The alternation DFA state (the expensive part for large K) lives in
    the actor; ``__call__`` is one lower + one count kernel per batch.
    Emits ``n_hits`` (non-overlapping match count) and ``blocked``
    (any hit) per row; null text counts as clean.
    """

    def __init__(self, phrases: list[str], *, text_col: str = "text",
                 id_col: str = "doc_id", whole_word: bool = True):
        self._pat = blocklist_pattern(phrases, whole_word=whole_word)
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t[self._text_col])
        hits = pc.fill_null(
            pc.count_substring_regex(low, self._pat), 0)
        hits = pc.cast(hits, pa.int64())
        return pa.table({
            self._id_col: t[self._id_col],
            "n_hits": hits,
            "blocked": pc.greater(hits, 0),
        })
