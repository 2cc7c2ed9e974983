"""Drop-in generator API mirroring the reference's call shape.

`riptano/logparse` exposes ``parse_log(fileobj, **extras)`` — a lazy
generator yielding one structured dict per logical event, folding lines
that fail the envelope regex into the previous event (SURVEY.md §3.1,
reconstructed; reference tree empty in this sandbox). This module gives
a reference user the same call shape on top of the vectorized engine:
lines are consumed lazily in batches, each batch runs the Arrow envelope
+ rule kernels, and dicts stream out in input order with continuation
folding across batch boundaries.

This is the single-process convenience path; the distributed path is
``logray.pipelines.flagship`` / ``logray.sources.read_raw_log``. Both
share the same engine and frozen rule table, so outputs agree.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pyarrow as pa

from .sources import envelope_parse
from .stages.parse import parse_batch_fn

_IDX = "__line_idx"


def _batch_to_events(lines: list[str]) -> list[dict[str, Any]]:
    """Envelope + rule parse of one batch; returns per-line dicts in input
    order. Envelope failures come back as ``None`` placeholders (to be
    folded by the caller)."""
    t = pa.table({"text": pa.array(lines, pa.string())})
    env = envelope_parse(t)
    env = env.append_column(_IDX, pa.array(range(len(lines)), pa.int64()))
    err = env["envelope_error"].to_pylist()
    parsed = parse_batch_fn(env.drop(["envelope_error"]), extra_cols=(_IDX,))
    parsed = parsed.sort_by(_IDX)
    rows: list[dict[str, Any] | None] = [None] * len(lines)
    for r in parsed.to_pylist():
        i = r.pop(_IDX)
        rows[i] = r
    for i, is_err in enumerate(err):
        if is_err:
            rows[i] = None  # envelope miss => continuation line
    return rows


def parse_log(source: Iterable[str], batch_lines: int = 8192,
              **extras: Any) -> Iterator[dict[str, Any]]:
    """Lazily parse an iterable of raw log lines into structured dicts.

    Reference-parity semantics:
    - one dict per logical event, in input order;
    - a line that fails the envelope regex is appended to the previous
      event's ``continuations`` list (never yielded on its own); leading
      continuation lines with no previous event yield a minimal
      ``rule_id='__orphan__'`` event rather than being dropped;
    - ``extras`` are injected into every yielded dict (the reference's
      ``parse_log(f, **extras)`` behavior);
    - vectorized underneath: lines batch through the Arrow engine, only
      the generator surface is per-row.
    """
    pending: dict[str, Any] | None = None
    buf: list[str] = []

    def flush(batch: list[str]) -> Iterator[dict[str, Any]]:
        nonlocal pending
        for line, row in zip(batch, _batch_to_events(batch)):
            if row is None:  # continuation: fold into the previous event
                if pending is None:
                    pending = {"rule_id": "__orphan__", "text": line,
                               "continuations": [], **extras}
                    continue
                pending.setdefault("continuations", []).append(line)
                continue
            if pending is not None:
                yield pending
            row.setdefault("continuations", [])
            row.update(extras)
            pending = row

    for line in source:
        buf.append(line.rstrip("\n"))
        if len(buf) >= batch_lines:
            yield from flush(buf)
            buf = []
    if buf:
        yield from flush(buf)
    if pending is not None:
        yield pending
