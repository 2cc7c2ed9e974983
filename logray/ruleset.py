"""Vectorized rule-DSL engine (M0) — the core of the logparse reimplementation.

The reference (``riptano/logparse`` — rules.py, ~100-150 LoC pure Python; see
SURVEY.md §2A, reconstructed: the reference tree is empty in this sandbox)
exposes higher-order combinators ``switch``/``case``/``rule``/``capture``/
``convert``/``update``/``default`` that run one compiled regex cascade per
*line*, first match wins, mutating a per-event dict.

This module re-expresses the same semantics as an **Arrow-batch kernel**:

- a ``Rule`` is a declarative record (gate, ordered patterns, typed casts,
  constant updates, sink) — config, not code;
- ``RuleSet.compile()`` precompiles patterns and groups rules by their gate
  value — the two-level dispatch is the "compiled pattern trie" of
  BASELINE.json:6 (gate check is a vectorized ``is_in`` before any regex);
- ``RuleSet.parse_batch(pa.Table)`` implements first-match-wins over a whole
  batch with a shrinking "unmatched" boolean mask + ``pc.extract_regex``
  (RE2), falling back to Python ``re`` only for patterns RE2 rejects, and
  only on that rule's candidate rows.

Semantics (normative, FIXTURES.md §2):
- rules evaluated in declaration order; gates checked first; first match wins
- unmatched rows fall through to the ``default`` rule (never dropped)
- failed type conversions yield null + ``parse_error=true``; the rule still
  matches
- optional capture groups that do not participate in a match yield ``''``
  (empty string), matching Arrow/RE2 and DuckDB ``regexp_extract`` behavior
- ``''`` input to a numeric/timestamp cast yields null WITHOUT parse_error
  (absent optional field, not a malformed value)

The engine never iterates Python rows on the hot path: extraction, casting
and constant attachment are Arrow kernels; per-rule sub-tables are emitted
grouped-by-rule (row order within a batch is NOT preserved — the pipeline's
ordering invariant is enforced by explicit ``(conv_id, turn_idx)`` sorts at
verification points, see SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "Cast",
    "Rule",
    "CompiledRule",
    "RuleSet",
    "CONVERTER_TYPES",
]

# converter name -> output arrow type; 'percent' divides by 100 after int parse,
# 'timestamp:<fmt>' parses with strptime(fmt) to timestamp[us].
CONVERTER_TYPES: dict[str, pa.DataType] = {
    "int64": pa.int64(),
    "float64": pa.float64(),
    "percent": pa.float64(),
    "string": pa.string(),
}


@dataclass(frozen=True)
class Cast:
    """``convert(converter, field)`` of the reference DSL, with an explicit
    destination so one source capture can fan out to several typed columns
    (e.g. ``pct`` → int64 ``pct`` and float64 ``frac``)."""

    src: str
    converter: str  # 'int64' | 'float64' | 'percent' | 'timestamp:<fmt>' | 'string'
    dst: str | None = None

    @property
    def dst_field(self) -> str:
        return self.dst if self.dst is not None else self.src

    @property
    def arrow_type(self) -> pa.DataType:
        if self.converter.startswith("timestamp:"):
            return pa.timestamp("us")
        try:
            return CONVERTER_TYPES[self.converter]
        except KeyError:
            raise ValueError(f"unknown converter {self.converter!r}") from None


@dataclass(frozen=True)
class Rule:
    """One ``rule(case(...), capture(...), convert(...), update(...))`` of the
    reference DSL as a declarative record. ``patterns`` empty => the
    ``default(...)`` catch-all (matches every remaining row)."""

    rule_id: str
    sink: str
    patterns: tuple[str, ...] = ()
    gate: Mapping[str, tuple[str, ...]] = field(default_factory=dict)
    casts: tuple[Cast, ...] = ()
    consts: Mapping[str, str] = field(default_factory=dict)


def _rewrite_dollar(pattern: str) -> str:
    r"""Rewrite anchor ``$`` to ``\Z`` with a small scanner that tracks
    escape and character-class state — a lookbehind-based re.sub corrupts
    ``[$]`` (produces an invalid ``[\Z]``) and mis-skips ``\$`` (escaped
    backslash followed by a real anchor)."""
    out: list[str] = []
    in_class = esc = False
    for ch in pattern:
        if esc:
            out.append(ch)
            esc = False
        elif ch == "\\":
            out.append(ch)
            esc = True
        elif in_class:
            out.append(ch)
            in_class = ch != "]"
        elif ch == "[":
            out.append(ch)
            in_class = True
        elif ch == "$":
            out.append("\\Z")
        else:
            out.append(ch)
    return "".join(out)


def compile_re2_like(pattern: str) -> re.Pattern:
    r"""Compile ``pattern`` with Python ``re`` so its semantics mirror RE2
    partial match: ``$`` in RE2 (no multiline) anchors at end-of-text,
    while Python's ``$`` also matches before a trailing newline — rewrite
    anchor ``$`` to ``\Z``. Callers must use ``.search`` (RE2
    extract_regex matches anywhere in the string)."""
    return re.compile(_rewrite_dollar(pattern))


_META = set(".^$*+?{}[]()|\\")


def _literal_prefix(pattern: str) -> str:
    r"""Longest REQUIRED literal prefix of an anchored pattern — the cheap
    vectorized gate (``pc.starts_with``) run before the regex, the batch
    analogue of the reference's pattern-trie dispatch. Rules: pattern must
    start with ``^``; ordinary chars and escaped punctuation (``\[`` →
    ``[``) extend the prefix; any other metachar stops the scan; a
    quantifier (``? * + {``) makes the PRECEDING char non-required, so it
    is dropped. Returns ``''`` when no useful prefix exists."""
    if not pattern.startswith("^"):
        return ""
    out: list[str] = []
    i = 1
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 < n and not pattern[i + 1].isalnum():
                nxt = pattern[i + 2] if i + 2 < n else ""
                if nxt in "?*+{":
                    break
                out.append(pattern[i + 1])
                i += 2
                continue
            break  # \d, \w, ... — a class, not a literal
        if ch in _META:
            if ch in "?*+{" and out:
                out.pop()  # quantifier makes the previous literal optional
            break
        nxt = pattern[i + 1] if i + 1 < n else ""
        if nxt in "?*+{":
            break  # this char is quantified — not required
        out.append(ch)
        i += 1
    return "".join(out)


def _re2_ok(pattern: str) -> bool:
    """True if Arrow's RE2 accepts the pattern (probed on an empty array)."""
    try:
        pc.extract_regex(pa.array([], pa.string()), pattern)
        return True
    except pa.ArrowInvalid:
        return False


@dataclass
class CompiledRule:
    rule: Rule
    capture_fields: tuple[str, ...]  # union of named groups across patterns
    arrow_patterns: tuple[str, ...]  # patterns RE2 accepts (hot path)
    py_patterns: tuple[re.Pattern, ...]  # residual Python-re fallback patterns
    # per-arrow-pattern required literal prefix ('' = none): pc.starts_with
    # gate before the regex — the pattern-trie dispatch, vectorized
    arrow_prefixes: tuple[str, ...] = ()

    @property
    def is_default(self) -> bool:
        return not self.rule.patterns


def _compile_rule(rule: Rule) -> CompiledRule:
    captures: list[str] = []
    arrow_pats: list[str] = []
    arrow_prefixes: list[str] = []
    py_pats: list[re.Pattern] = []
    for p in rule.patterns:
        rx = compile_re2_like(p)
        for g in rx.groupindex:
            if g not in captures:
                captures.append(g)
        if _re2_ok(p):
            arrow_pats.append(p)
            # a 1-char prefix gate costs more than it saves; require >= 2
            pre = _literal_prefix(p)
            arrow_prefixes.append(pre if len(pre) >= 2 else "")
        else:
            py_pats.append(rx)
    cast_srcs = {c.src for c in rule.casts}
    missing = cast_srcs - set(captures)
    if missing and rule.patterns:
        raise ValueError(f"rule {rule.rule_id}: casts reference unknown captures {missing}")
    return CompiledRule(rule, tuple(captures), tuple(arrow_pats), tuple(py_pats),
                        tuple(arrow_prefixes))


def _safe_cast(arr: pa.Array, cast: Cast) -> tuple[pa.Array, np.ndarray]:
    """String array -> typed array; returns (values, error_mask).

    ``''``/null input -> null, no error. Malformed values -> null + error.
    Vectorized fast path via pc.cast / pc.strptime; elementwise fallback only
    when the whole-array kernel raises (rare: e.g. int64 overflow rows).
    """
    n = len(arr)
    empty = pc.equal(arr, "")
    arr = pc.if_else(pc.fill_null(empty, False), pa.nulls(n, pa.string()), arr)
    errors = np.zeros(n, dtype=bool)
    conv = cast.converter
    if conv == "string":
        return arr, errors
    if conv.startswith("timestamp:"):
        fmt = conv.split(":", 1)[1]
        out = pc.strptime(arr, format=fmt, unit="us", error_is_null=True)
        errors = np.asarray(pc.and_(arr.is_valid(), out.is_null()).to_numpy(zero_copy_only=False))
        return out, errors
    target = pa.int64() if conv in ("int64",) else pa.float64()
    parse_as = pa.int64() if conv in ("int64", "percent") else pa.float64()
    try:
        out = pc.cast(arr, parse_as)
    except pa.ArrowInvalid:
        vals: list[Any] = []
        py = int if parse_as == pa.int64() else float
        lo, hi = -(2**63), 2**63 - 1
        for i, v in enumerate(arr.to_pylist()):
            if v is None:
                vals.append(None)
                continue
            try:
                x = py(v)
                if parse_as == pa.int64() and not (lo <= x <= hi):
                    raise OverflowError(v)
                vals.append(x)
            except (ValueError, OverflowError):
                vals.append(None)
                errors[i] = True
        out = pa.array(vals, parse_as)
    if conv == "percent":
        out = pc.divide(pc.cast(out, pa.float64()), pa.scalar(100.0))
    elif out.type != target:
        out = pc.cast(out, target)
    return out, errors


class RuleSet:
    """Ordered first-match-wins rule table, compiled for Arrow-batch execution.

    Equivalent of the reference's ``switch((case(...), rule(...), ...))``
    applied per batch instead of per line. The output schema is fixed at
    compile time: passthrough columns + ``rule_id``/``sink`` + the union of
    all const fields (string) + the union of all capture/cast columns
    (typed) + ``parse_error`` (bool).
    """

    def __init__(self, rules: Sequence[Rule], passthrough: Sequence[tuple[str, pa.DataType]]):
        if not rules:
            raise ValueError("empty ruleset")
        self.rules = [_compile_rule(r) for r in rules]
        defaults = [cr for cr in self.rules if cr.is_default]
        if len(defaults) != 1 or not self.rules[-1].is_default:
            raise ValueError("ruleset must end with exactly one default rule")
        self.passthrough = list(passthrough)
        # union output schema
        const_fields: list[str] = []
        capture_types: dict[str, pa.DataType] = {}
        for cr in self.rules:
            for k in cr.rule.consts:
                if k not in const_fields:
                    const_fields.append(k)
            for c in cr.rule.casts:
                t = c.arrow_type
                prev = capture_types.get(c.dst_field)
                if prev is not None and prev != t:
                    raise ValueError(f"type conflict for output column {c.dst_field}: {prev} vs {t}")
                capture_types[c.dst_field] = t
            for g in cr.capture_fields:
                # capture without a cast keeps its raw string form
                if g not in capture_types and not any(c.src == g and c.dst is None for c in cr.rule.casts):
                    capture_types.setdefault(g, pa.string())
        # a raw (uncast) capture in one rule must not collide with a typed
        # cast output of the same name in another rule
        for cr in self.rules:
            cast_dsts = {c.dst_field for c in cr.rule.casts}
            for g in cr.capture_fields:
                if g not in cast_dsts and capture_types.get(g, pa.string()) != pa.string():
                    raise ValueError(
                        f"rule {cr.rule.rule_id}: raw capture {g!r} collides with a "
                        f"typed column {capture_types[g]} produced by another rule"
                    )
        self.const_fields = const_fields
        self.capture_fields = list(capture_types.keys())
        fields = [pa.field(n, t) for n, t in self.passthrough]
        fields.append(pa.field("rule_id", pa.string()))
        fields.append(pa.field("sink", pa.string()))
        fields += [pa.field(n, pa.string()) for n in const_fields]
        fields += [pa.field(n, capture_types[n]) for n in capture_types]
        fields.append(pa.field("parse_error", pa.bool_()))
        self.schema = pa.schema(fields)

    def sink_columns(self) -> dict[str, set[str]]:
        """Per-sink column allowlist for the fan-out writer (SURVEY.md §7
        hard-part 1): envelope/classification/consts for every sink, plus
        ONLY the capture/cast columns of the rules routed to that sink —
        columns owned by other sinks' rules are all-null there and get
        pruned at write time. Columns outside this universe (e.g. enrich
        outputs appended after parse) always pass through."""
        common = {n for n, _ in self.passthrough}
        common |= {"rule_id", "sink", "parse_error"}
        common |= set(self.const_fields)
        out: dict[str, set[str]] = {}
        for cr in self.rules:
            cols = out.setdefault(cr.rule.sink, set(common))
            cols.update(cr.capture_fields)
            cols.update(c.dst_field for c in cr.rule.casts)
        return out

    # -- batch execution ----------------------------------------------------

    def _gate_mask(self, cr: CompiledRule, table: pa.Table, n: int,
                   cache: dict | None = None) -> np.ndarray:
        # gates repeat across rules (e.g. several rules share role=assistant):
        # memoize each (col, values) is_in scan per batch
        mask = np.ones(n, dtype=bool)
        for col, values in cr.rule.gate.items():
            key = (col, values)
            m = cache.get(key) if cache is not None else None
            if m is None:
                ok = pc.is_in(table[col], value_set=pa.array(values, pa.string()))
                m = np.asarray(pc.fill_null(ok, False).to_numpy(zero_copy_only=False))
                if cache is not None:
                    cache[key] = m
            mask &= m
        return mask

    def _extract(self, cr: CompiledRule, text: pa.ChunkedArray | pa.Array, idx: np.ndarray
                 ) -> tuple[np.ndarray, dict[str, pa.Array]]:
        """Run the rule's pattern cascade over candidate rows ``idx``.

        Returns (matched positions into idx, capture column -> values aligned
        with those positions)."""
        sub = text.take(pa.array(idx)) if len(idx) else text.slice(0, 0)
        if isinstance(sub, pa.ChunkedArray):
            sub = sub.combine_chunks()
        remaining = np.arange(len(idx))
        matched_pos: list[np.ndarray] = []
        matched_caps: list[dict[str, pa.Array]] = []
        for pat, prefix in zip(cr.arrow_patterns, cr.arrow_prefixes):
            if len(remaining) == 0:
                break
            s = sub.take(pa.array(remaining)) if len(remaining) != len(sub) else sub
            cand = remaining
            use_prefix = False
            if prefix:
                # vectorized literal gate: the regex only runs on rows that
                # carry its required prefix — rows without it stay in
                # `remaining` untouched (they can't match, by construction).
                # Only pay the candidate `take` when the gate is selective
                # (< 50% pass): RE2 already memchr-skips a required prefix
                # internally, so an unselective gate just adds a copy.
                # Measured on the v2 transcript corpus: neutral overall
                # (605k vs 605k rows/s/core, best-of-3) — the win case is
                # tables whose expensive patterns rarely match their gate's
                # rows; kept because it is adaptive and equivalence-tested.
                pm = np.asarray(pc.fill_null(
                    pc.starts_with(s, prefix), False).to_numpy(zero_copy_only=False))
                cand_local = np.flatnonzero(pm)
                if len(cand_local) == 0:
                    continue
                if len(cand_local) * 2 < len(pm):
                    use_prefix = True
                    s = s.take(pa.array(cand_local))
                    cand = remaining[cand_local]
            struct = pc.extract_regex(s, pat)
            valid = np.asarray(struct.is_valid())
            hit_local = np.flatnonzero(valid)
            if len(hit_local):
                hit = cand[hit_local]
                caps = {}
                names = {f.name for f in struct.type}
                for g in cr.capture_fields:
                    if g in names:
                        caps[g] = struct.field(g).take(pa.array(hit_local))
                    else:
                        caps[g] = pa.nulls(len(hit_local), pa.string())
                matched_pos.append(hit)
                matched_caps.append(caps)
                if use_prefix:
                    keep = np.ones(len(remaining), dtype=bool)
                    # positions (into remaining) of matched candidates
                    keep[cand_local[valid]] = False
                    remaining = remaining[keep]
                else:
                    remaining = remaining[~valid]
        for rx in cr.py_patterns:
            if len(remaining) == 0:
                break
            s = sub.take(pa.array(remaining)).to_pylist()
            hit_local, rows = [], []
            for i, v in enumerate(s):
                if v is None:
                    continue
                m = rx.search(v)
                if m:
                    hit_local.append(i)
                    rows.append(m.groupdict())
            if hit_local:
                hl = np.asarray(hit_local)
                # groups of THIS pattern: unmatched-optional => '' (RE2
                # behavior); groups owned by other patterns => null, same
                # as the Arrow path above
                caps = {}
                for g in cr.capture_fields:
                    if g in rx.groupindex:
                        caps[g] = pa.array(
                            [("" if r.get(g) is None else r.get(g)) for r in rows],
                            pa.string())
                    else:
                        caps[g] = pa.nulls(len(rows), pa.string())
                matched_pos.append(remaining[hl])
                matched_caps.append(caps)
                keep = np.ones(len(remaining), dtype=bool)
                keep[hl] = False
                remaining = remaining[keep]
        if not matched_pos:
            return np.empty(0, dtype=np.int64), {}
        pos = np.concatenate(matched_pos)
        caps = {
            g: pa.concat_arrays([pc.cast(c[g], pa.string()) for c in matched_caps])
            for g in cr.capture_fields
        }
        return pos, caps

    def _out_schema(self, table: pa.Table, extra_cols: tuple[str, ...]) -> pa.Schema:
        schema = self.schema
        for c in extra_cols:
            schema = schema.append(pa.field(c, table.schema.field(c).type))
        return schema

    @staticmethod
    def _concat_pieces(pieces: list[tuple[int, pa.Array | None]],
                       typ: pa.DataType) -> pa.Array:
        """Assemble one output column from ordered (length, values|None)
        pieces, coalescing adjacent null runs — a column owned by few rules
        costs O(owners) arrays, not O(rules)."""
        arrays: list[pa.Array] = []
        null_run = 0
        for n, vals in pieces:
            if n == 0:
                continue
            if vals is None:
                null_run += n
                continue
            if null_run:
                arrays.append(pa.nulls(null_run, typ))
                null_run = 0
            arrays.append(vals if vals.type == typ else pc.cast(vals, typ))
        if null_run:
            arrays.append(pa.nulls(null_run, typ))
        if not arrays:
            return pa.nulls(0, typ)
        return pa.concat_arrays(arrays) if len(arrays) > 1 else arrays[0]

    def _assemble(self, table: pa.Table,
                  emits: list[tuple[CompiledRule, np.ndarray, dict[str, pa.Array]]],
                  extra_cols: tuple[str, ...]) -> pa.Table:
        """Build the union-schema output in ONE pass per column. ``emits``
        is the per-rule match list in output order; rows come out grouped
        by rule. Columns a rule doesn't own contribute a null run, so cost
        is O(columns + total owner pieces), not O(rules × columns) — the
        wide-sparse union schema stays cheap at 100+ rule tables."""
        counts = [len(idx) for _, idx, _ in emits]
        global_idx = (np.concatenate([idx for _, idx, _ in emits])
                      if emits else np.empty(0, np.int64))
        sub = table.take(pa.array(global_idx))
        cols: list[pa.Array | pa.ChunkedArray] = [sub[name] for name, _ in self.passthrough]
        # pa.repeat materializes the constant run in C — measurably cheaper
        # than building an n-element Python list per (rule, column) piece
        cols.append(self._concat_pieces(
            [(n, pa.repeat(pa.scalar(cr.rule.rule_id, pa.string()), n))
             for (cr, _, _), n in zip(emits, counts)], pa.string()))
        cols.append(self._concat_pieces(
            [(n, pa.repeat(pa.scalar(cr.rule.sink, pa.string()), n))
             for (cr, _, _), n in zip(emits, counts)], pa.string()))
        for f in self.const_fields:
            cols.append(self._concat_pieces(
                [(n, pa.repeat(pa.scalar(v, pa.string()), n)
                  if (v := cr.rule.consts.get(f)) is not None else None)
                 for (cr, _, _), n in zip(emits, counts)], pa.string()))
        # typed capture/cast columns + the parse_error union
        err_parts: list[np.ndarray] = []
        cap_pieces: dict[str, list[tuple[int, pa.Array | None]]] = {
            name: [] for name in self.capture_fields}
        for (cr, _, caps), n in zip(emits, counts):
            err = np.zeros(n, dtype=bool)
            cast_by_dst = {c.dst_field: c for c in cr.rule.casts}
            for name in self.capture_fields:
                piece: pa.Array | None = None
                if name in cast_by_dst:
                    c = cast_by_dst[name]
                    if c.src in caps:
                        piece, e = _safe_cast(caps[c.src], c)
                        err |= e
                elif name in caps and self.schema.field(name).type == pa.string():
                    piece = caps[name]
                cap_pieces[name].append((n, piece))
            err_parts.append(err)
        for name in self.capture_fields:
            cols.append(self._concat_pieces(cap_pieces[name],
                                            self.schema.field(name).type))
        cols.append(pa.array(np.concatenate(err_parts)
                             if err_parts else np.zeros(0, bool)))
        for c in extra_cols:
            cols.append(sub[c])
        return pa.Table.from_arrays(cols, schema=self._out_schema(table, extra_cols))

    def parse_batch(self, table: pa.Table, text_col: str = "text",
                    extra_cols: tuple[str, ...] = ()) -> pa.Table:
        """First-match-wins parse of one Arrow batch. Row order is grouped by
        matching rule (order-insensitive downstream; see module docstring).
        ``extra_cols``: input columns outside the compiled passthrough set to
        carry into the output unchanged (e.g. a lineage/partition tag)."""
        n = table.num_rows
        # schema evolution: an input partition written before a column was
        # added simply lacks it — treat as all-null (absent optional field,
        # same semantics as '' captures), never crash. Gates on a null
        # column don't match, so those rows fall through to ungated rules.
        for name, typ in self.passthrough:
            if name not in table.column_names:
                table = table.append_column(name, pa.nulls(n, typ))
        if n == 0:
            return self._out_schema(table, extra_cols).empty_table()
        text = table[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        unmatched = np.ones(n, dtype=bool)
        gate_cache: dict = {}
        emits: list[tuple[CompiledRule, np.ndarray, dict[str, pa.Array]]] = []
        for cr in self.rules:
            if not unmatched.any():
                break
            gate = self._gate_mask(cr, table, n, gate_cache)
            idx = np.flatnonzero(unmatched & gate)
            if len(idx) == 0:
                continue
            if cr.is_default:
                emits.append((cr, idx, {}))
                unmatched[idx] = False
                continue
            pos, caps = self._extract(cr, text, idx)
            if len(pos) == 0:
                continue
            take_idx = idx[pos]
            unmatched[take_idx] = False
            emits.append((cr, take_idx, caps))
        if unmatched.any():
            # gated default shouldn't happen (default has no gate), but never drop rows
            emits.append((self.rules[-1], np.flatnonzero(unmatched), {}))
        return self._assemble(table, emits, extra_cols)
