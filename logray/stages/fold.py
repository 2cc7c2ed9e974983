"""Continuation folding — the reference's only *stateful* parse semantics.

In the reference's ``parse_log`` generator (SURVEY.md §3.1 B3,
reconstructed — reference tree empty in this sandbox), a line that does
NOT match the envelope regex (java stack-trace lines, StatusLogger table
bodies) is folded into the *previous* event: appended to a list field on
the in-flight event dict. This is ordering-dependent — the one place the
reference relies on file order.

Graft semantics (normative, documented deviation noted below): within
each conversation ordered by ``turn_idx``, a parsed row whose ``rule_id``
equals the default/unknown rule is a **continuation**: its ``text`` is
appended to the ``continuations`` list of the most recent preceding
non-continuation event in the same conversation, and the row is removed
from the stream. Rows at the start of a conversation with no preceding
event are kept as standalone unknown events (the reference silently
drops pre-first-event garbage; we keep it so per-sink count parity —
folded + kept == input rows — stays an exact invariant).

Implementation is a segmented vectorized kernel (numpy maximum-
accumulate forward fill, no Python row loop), applied per co-located key
group. Distribution contract: every row of a conversation must be in the
same group — provided either by the corpus layout (one file per
``crc32(conv_id) % P``) or by ``fold_continuations``'s bucket groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_bucket

DEFAULT_CONT_RULE = "R99_default"


def fold_batch(table: pa.Table, *, cont_rule: str = DEFAULT_CONT_RULE,
               conv_col: str = "conv_id", order_col: str = "turn_idx",
               text_col: str = "text") -> pa.Table:
    """Fold continuations across one table of WHOLE conversations.

    The table may hold many conversations in any row order; it is sorted
    by (conv, turn) internally. Appends ``continuations: list<string>``
    and ``n_folded: int32`` and drops folded rows.
    """
    n = table.num_rows
    if n == 0:
        out = table
        out = out.append_column("continuations", pa.nulls(0, pa.list_(pa.string())))
        return out.append_column("n_folded", pa.nulls(0, pa.int32()))

    conv = table[conv_col]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    codes = conv.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    turn = np.asarray(table[order_col].to_numpy(zero_copy_only=False))
    order = np.lexsort((turn, codes))
    t = table.take(pa.array(order))

    codes = codes[order]
    rule_id = np.asarray(t["rule_id"].to_numpy(zero_copy_only=False))
    cont = rule_id == cont_rule
    idx = np.arange(n)
    conv_start = np.empty(n, dtype=bool)
    conv_start[0] = True
    conv_start[1:] = codes[1:] != codes[:-1]

    # segmented forward-fill: index of last non-continuation row, reset at
    # conversation boundaries (anchor < segment start => no previous event)
    last_noncont = np.maximum.accumulate(np.where(~cont, idx, -1))
    seg_start = np.maximum.accumulate(np.where(conv_start, idx, -1))
    anchor = np.where(last_noncont >= seg_start, last_noncont, -1)

    folded = cont & (anchor != -1)
    keep = ~folded
    keep_idx = np.flatnonzero(keep)

    counts = np.bincount(anchor[folded], minlength=n)[keep_idx]
    offsets = np.zeros(len(keep_idx) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # anchors are non-decreasing over folded rows (maximum.accumulate is
    # monotone), so folded texts in row order are already grouped by anchor
    values = text.take(pa.array(np.flatnonzero(folded)))
    cont_list = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)

    out = t.take(pa.array(keep_idx))
    out = out.append_column("continuations", cont_list)
    return out.append_column("n_folded", pa.array(counts.astype(np.int32)))


def fold_continuations(parsed_ds, *, cont_rule: str = DEFAULT_CONT_RULE,
                       num_buckets: int = 64):
    """Dataset-level fold: co-locate conversations via a stable-hash bucket
    groupby (the shuffle), then run the vectorized segmented kernel once
    per bucket — NOT once per conversation, so the Python-call overhead is
    O(buckets), not O(conversations)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", stable_bucket(batch["conv_id"], num_buckets))

    def fold_bucket(batch: pa.Table) -> pa.Table:
        return fold_batch(batch.drop(["__bucket"]), cont_rule=cont_rule)

    return (parsed_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(fold_bucket, batch_format="pyarrow"))
