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
# 'timestamp:<fmt>' parses with strptime(fmt) to timestamp[us], 'duration'
# parses '[<H>h][<M>m]<S>s' wall-clock spans (seconds required, larger units
# optional) to total int64 seconds, 'size' parses '<int>[.<frac>]<unit>'
# human-readable binary byte sizes (unit in B/KiB/MiB/GiB/TiB) to int64
# bytes, flooring any sub-byte remainder.
CONVERTER_TYPES: dict[str, pa.DataType] = {
    "int64": pa.int64(),
    "float64": pa.float64(),
    "percent": pa.float64(),
    "duration": pa.int64(),
    "size": pa.int64(),
    "string": pa.string(),
}


@dataclass(frozen=True)
class Cast:
    """``convert(converter, field)`` of the reference DSL, with an explicit
    destination so one source capture can fan out to several typed columns
    (e.g. ``pct`` → int64 ``pct`` and float64 ``frac``)."""

    src: str
    converter: str  # 'int64' | 'float64' | 'percent' | 'duration' | 'timestamp:<fmt>' | 'string'
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

# fully-anchored single-group dot-run pattern — ^(?P<g>.{m,n})$ / .* / .+ —
# semantically: no newline anywhere (RE2 '.' excludes \n) and rune length
# within [m,n]; the capture is the whole text. Compiled to vectorized
# utf8_length + match_substring kernels instead of RE2 (the catch-all rules
# of a log table route MOST rows, so this is the hottest pattern shape).
_TRIVIAL_DOTRUN = re.compile(
    r"^\^\(\?P<([A-Za-z_]\w*)>\.(?:\{(\d+),(\d+)\}|([*+]))\)\$$")


def _trivial_spec(pattern: str) -> tuple[str, int, int] | None:
    m = _TRIVIAL_DOTRUN.match(pattern)
    if m is None:
        return None
    name, lo, hi, star = m.groups()
    if star is not None:
        return (name, 0 if star == "*" else 1, -1)
    return (name, int(lo), int(hi))


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


class _NullPool:
    """Zero-copy null runs: one cached all-null array per type, sliced per
    run. ``pa.nulls`` allocates (and the kernel zeroes) a full data buffer
    every call — across a 150-column union schema that is ~100 MB of fresh
    pages per batch, measured as the dominant assembly cost."""

    def __init__(self) -> None:
        self._pool: dict[pa.DataType, pa.Array] = {}

    def run(self, typ: pa.DataType, n: int) -> pa.Array:
        arr = self._pool.get(typ)
        if arr is None or len(arr) < n:
            size = max(n, 2 * len(arr) if arr is not None else n)
            arr = pa.nulls(size, typ)
            self._pool[typ] = arr
        return arr.slice(0, n)


def _col_from_spans(spans: list[tuple[int, pa.Array]], total: int,
                    typ: pa.DataType, pool: _NullPool) -> pa.ChunkedArray:
    """Assemble one output column from (start_offset, values) spans owned by
    few rules; gaps between spans become null runs. Spans must be ordered
    and non-overlapping (they are: emits are visited in output order).
    Returns a CHUNKED array — no buffer is copied or allocated for null
    runs; Table columns are chunked anyway."""
    arrays: list[pa.Array] = []
    pos = 0
    for off, vals in spans:
        if off > pos:
            arrays.append(pool.run(typ, off - pos))
        arrays.append(vals if vals.type == typ else pc.cast(vals, typ))
        pos = off + len(vals)
    if pos < total:
        arrays.append(pool.run(typ, total - pos))
    return pa.chunked_array(arrays, typ)


@dataclass
class CompiledRule:
    rule: Rule
    capture_fields: tuple[str, ...]  # union of named groups across patterns
    arrow_patterns: tuple[str, ...]  # patterns RE2 accepts (hot path)
    py_patterns: tuple[re.Pattern, ...]  # residual Python-re fallback patterns
    # per-arrow-pattern required literal prefix ('' = none): pc.starts_with
    # gate before the regex — the pattern-trie dispatch, vectorized
    arrow_prefixes: tuple[str, ...] = ()
    # required literal prefixes of ALL patterns (arrow + py), for the
    # batch-level trie dispatch; None when any pattern lacks one (the rule
    # must then see every remaining row)
    dispatch_prefixes: tuple[str, ...] | None = None
    # per-arrow-pattern (name, min_len, max_len|-1) when the pattern is a
    # trivial anchored dot-run — executed with length kernels, not RE2
    arrow_trivial: tuple[tuple[str, int, int] | None, ...] = ()
    # filled by RuleSet.__init__ (needs the union schema): the output
    # columns this rule can own, and its casts keyed by destination
    out_fields: tuple[str, ...] = ()
    cast_by_dst: Mapping[str, Cast] = field(default_factory=dict)

    @property
    def is_default(self) -> bool:
        return not self.rule.patterns


def _compile_rule(rule: Rule) -> CompiledRule:
    captures: list[str] = []
    arrow_pats: list[str] = []
    arrow_prefixes: list[str] = []
    py_pats: list[re.Pattern] = []
    disp: list[str] = []
    trivial: list[tuple[str, int, int] | None] = []
    dispatchable = bool(rule.patterns)
    for p in rule.patterns:
        rx = compile_re2_like(p)
        for g in rx.groupindex:
            if g not in captures:
                captures.append(g)
        pre = _literal_prefix(p)
        if pre:
            disp.append(pre)
        else:
            dispatchable = False
        if _re2_ok(p):
            arrow_pats.append(p)
            # a 1-char prefix gate costs more than it saves; require >= 2
            arrow_prefixes.append(pre if len(pre) >= 2 else "")
            trivial.append(_trivial_spec(p))
        else:
            py_pats.append(rx)
    cast_srcs = {c.src for c in rule.casts}
    missing = cast_srcs - set(captures)
    if missing and rule.patterns:
        raise ValueError(f"rule {rule.rule_id}: casts reference unknown captures {missing}")
    return CompiledRule(rule, tuple(captures), tuple(arrow_pats), tuple(py_pats),
                        tuple(arrow_prefixes),
                        tuple(disp) if dispatchable else None,
                        tuple(trivial))


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
    if conv == "duration":
        # '[<H>h][<M>m]<S>s' -> total seconds (int64). extract_regex yields a
        # null struct slot on no-match and '' for non-participating optional
        # groups; both coalesce to 0 before the unit arithmetic, and no-match
        # rows are nulled + flagged afterwards (same contract as strptime).
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # unit runs bounded to 15 digits so the int64 arithmetic cannot
        # overflow (1e15 h/m/s each stay < 2^63 combined); longer runs are
        # a no-match -> null + parse_error, matching the oracle parser
        st = pc.extract_regex(
            arr, r"^(?:(?P<h>\d{1,15})h)?(?:(?P<m>\d{1,15})m)?(?P<s>\d{1,15})s$")
        matched = st.is_valid()

        def _unit(name: str, mult: int) -> pa.Array:
            f = pc.fill_null(st.field(name), "0")
            f = pc.if_else(pc.equal(f, ""), pa.scalar("0"), f)
            return pc.multiply(pc.cast(f, pa.int64()), pa.scalar(mult, pa.int64()))

        secs = pc.add(pc.add(_unit("h", 3600), _unit("m", 60)), _unit("s", 1))
        out = pc.if_else(matched, secs, pa.nulls(n, pa.int64()))
        errors = np.asarray(pc.and_(arr.is_valid(), pc.invert(matched))
                            .to_numpy(zero_copy_only=False))
        return out, errors
    if conv == "size":
        # '<int>[.<frac>]<unit>' -> bytes (int64), binary units. Exact
        # integer arithmetic: bytes = whole*mult + frac3*mult // 1000 where
        # frac3 is the fraction right-padded to 3 digits (floor(a + b) ==
        # a + floor(b) when a is integral, so the decomposition is exact).
        # Whole part bounded to 6 digits so whole*mult fits int64 even at
        # TiB (1e6 * 2^40 < 2^63); longer runs / unknown units -> null +
        # parse_error, same contract as duration.
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        st = pc.extract_regex(
            arr, r"^(?P<w>\d{1,6})(?:\.(?P<f>\d{1,3}))?(?P<u>B|KiB|MiB|GiB|TiB)$")
        matched = st.is_valid()
        units = pa.array(["B", "KiB", "MiB", "GiB", "TiB"])
        mults = pa.array([1, 1024, 1024**2, 1024**3, 1024**4], pa.int64())
        mult = pc.take(mults, pc.index_in(pc.fill_null(st.field("u"), "B"),
                                          value_set=units))
        w = pc.fill_null(st.field("w"), "0")
        whole = pc.cast(pc.if_else(pc.equal(w, ""), pa.scalar("0"), w),
                        pa.int64())
        f = pc.fill_null(st.field("f"), "")
        fint = pc.cast(pc.if_else(pc.equal(f, ""), pa.scalar("0"), f),
                       pa.int64())
        # right-pad the fraction to 3 digits via a power-of-ten scale
        scale = pc.take(pa.array([1000, 100, 10, 1], pa.int64()),
                        pc.utf8_length(f))
        frac3 = pc.multiply(fint, scale)
        bytes_ = pc.add(
            pc.multiply(whole, mult),
            pc.divide(pc.multiply(frac3, mult), pa.scalar(1000, pa.int64())))
        out = pc.if_else(matched, bytes_, pa.nulls(n, pa.int64()))
        errors = np.asarray(pc.and_(arr.is_valid(), pc.invert(matched))
                            .to_numpy(zero_copy_only=False))
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
        # owner metadata: the columns each rule can emit (everything else is
        # a null run in its output slice) — lets _assemble touch only
        # O(total owners) pieces instead of O(rules × columns)
        for cr in self.rules:
            cbd = {c.dst_field: c for c in cr.rule.casts}
            cr.cast_by_dst = cbd
            outs = [d for d in cbd]
            outs += [g for g in cr.capture_fields
                     if g not in cbd and capture_types.get(g, None) == pa.string()]
            cr.out_fields = tuple(outs)
        # compiled pattern trie (BASELINE.json north_star): group every
        # rule's required literal prefix by byte length; parse_batch then
        # classifies each row with ONE binary_slice + hash-table index_in
        # pass per distinct length, and a rule's regex only ever sees rows
        # that carry one of its prefixes. Work becomes O(rows × lengths),
        # not O(rows × rules).
        # prefix lengths are quantized to a small ladder: each slice +
        # index_in pass costs ~1.4 ms/87k rows, so 20+ distinct lengths
        # would eat the dispatch win. Truncating a required prefix keeps
        # it required (any prefix of a required prefix is required); 8-16
        # literal bytes are near-unique in practice.
        _Q = (1, 2, 3, 4, 6, 8, 12, 16)
        trie: dict[int, dict[bytes, int]] = {}
        self._rule_disp: list[tuple[tuple[int, int], ...] | None] = []
        for cr in self.rules:
            if cr.is_default or cr.dispatch_prefixes is None:
                self._rule_disp.append(None)
                continue
            pairs: list[tuple[int, int]] = []
            for p in cr.dispatch_prefixes:
                b = p.encode()
                qlen = max(q for q in _Q if q <= len(b))
                b = b[:qlen]
                d = trie.setdefault(qlen, {})
                pairs.append((qlen, d.setdefault(b, len(d))))
            self._rule_disp.append(tuple(pairs))
        self._trie_sets = {
            length: pa.array(list(d.keys()), pa.binary())
            for length, d in trie.items()
        }
        self._null_pool = _NullPool()

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
        # memoize the COMBINED mask per gate signature per batch (callers
        # only read it), plus each (col, values) is_in scan underneath
        sig = tuple(sorted(cr.rule.gate.items()))
        if cache is not None:
            cached = cache.get(sig)
            if cached is not None:
                return cached
        mask: np.ndarray | None = None
        for col, values in cr.rule.gate.items():
            key = (col, values)
            m = cache.get(key) if cache is not None else None
            if m is None:
                ok = pc.is_in(table[col], value_set=pa.array(values, pa.string()))
                m = np.asarray(pc.fill_null(ok, False).to_numpy(zero_copy_only=False))
                if cache is not None:
                    cache[key] = m
            mask = m if mask is None else (mask & m)
        if mask is None:
            mask = np.ones(n, dtype=bool)
        if cache is not None:
            cache[sig] = mask
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
        for pat, prefix, triv in zip(cr.arrow_patterns, cr.arrow_prefixes,
                                     cr.arrow_trivial):
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
            if triv is None:
                struct = pc.extract_regex(s, pat)
                valid = np.asarray(struct.is_valid())
            else:
                # anchored dot-run fast path: no newline + rune length in
                # range; the capture is the text itself (no RE2 run)
                struct = None
                ln = pc.utf8_length(s)
                ok = pc.greater_equal(ln, pa.scalar(triv[1], ln.type))
                if triv[2] >= 0:
                    ok = pc.and_kleene(
                        ok, pc.less_equal(ln, pa.scalar(triv[2], ln.type)))
                ok = pc.and_kleene(
                    ok, pc.invert(pc.match_substring(s, "\n")))
                valid = np.asarray(
                    pc.fill_null(ok, False).to_numpy(zero_copy_only=False))
            hit_local = np.flatnonzero(valid)
            if len(hit_local):
                hit = cand[hit_local]
                caps = {}
                if struct is not None:
                    names = {f.name for f in struct.type}
                    for g in cr.capture_fields:
                        if g in names:
                            caps[g] = struct.field(g).take(pa.array(hit_local))
                        else:
                            caps[g] = pa.nulls(len(hit_local), pa.string())
                else:
                    for g in cr.capture_fields:
                        if g == triv[0]:
                            caps[g] = s.take(pa.array(hit_local))
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

    def _concat_pieces(self, pieces: list[tuple[int, pa.Array | None]],
                       typ: pa.DataType) -> pa.ChunkedArray:
        """Assemble one output column from ordered (length, values|None)
        pieces, coalescing adjacent null runs — a column owned by few rules
        costs O(owners) arrays, not O(rules). Chunked output: null runs are
        zero-copy slices of the shared pool, nothing is concatenated."""
        arrays: list[pa.Array] = []
        null_run = 0
        for n, vals in pieces:
            if n == 0:
                continue
            if vals is None:
                null_run += n
                continue
            if null_run:
                arrays.append(self._null_pool.run(typ, null_run))
                null_run = 0
            arrays.append(vals if vals.type == typ else pc.cast(vals, typ))
        if null_run:
            arrays.append(self._null_pool.run(typ, null_run))
        return pa.chunked_array(arrays, typ)

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
        # typed capture/cast columns + the parse_error union. Each emit only
        # visits the columns its rule OWNS (precomputed out_fields); other
        # columns get their null run reconstructed from span offsets — cost
        # is O(total owner pieces + columns), not O(rules × columns).
        err_parts: list[np.ndarray] = []
        cap_spans: dict[str, list[tuple[int, pa.Array]]] = {
            name: [] for name in self.capture_fields}
        offset = 0
        for (cr, _, caps), n in zip(emits, counts):
            err = np.zeros(n, dtype=bool)
            for name in cr.out_fields:
                c = cr.cast_by_dst.get(name)
                if c is not None:
                    if c.src in caps:
                        piece, e = _safe_cast(caps[c.src], c)
                        err |= e
                        cap_spans[name].append((offset, piece))
                elif name in caps:
                    cap_spans[name].append((offset, caps[name]))
            err_parts.append(err)
            offset += n
        for name in self.capture_fields:
            cols.append(_col_from_spans(cap_spans[name], offset,
                                        self.schema.field(name).type,
                                        self._null_pool))
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
        # trie dispatch: one byte-slice + hash lookup per DISTINCT prefix
        # length classifies every row once (computed lazily per length);
        # each prefixed rule then reduces its candidate set to rows whose
        # leading bytes equal one of its prefixes before any regex or take.
        text_bin: pa.Array | None = None
        trie_buckets: dict[int, list[np.ndarray]] = {}

        def _buckets(length: int) -> list[np.ndarray]:
            """Row indices per trie prefix of this length, computed once:
            slice + hash lookup + stable argsort-split. Per-rule candidate
            selection is then O(bucket size), not O(batch)."""
            nonlocal text_bin
            bs = trie_buckets.get(length)
            if bs is None:
                if text_bin is None:
                    text_bin = pc.cast(text, pa.binary())  # zero-copy view
                sl = pc.binary_slice(text_bin, 0, length)
                mi = pc.index_in(sl, value_set=self._trie_sets[length])
                col = np.asarray(
                    pc.fill_null(mi, -1).to_numpy(zero_copy_only=False))
                order = np.argsort(col, kind="stable")
                counts = np.bincount(
                    col + 1, minlength=len(self._trie_sets[length]) + 1)
                bs = np.split(order, np.cumsum(counts)[:-1])[1:]
                trie_buckets[length] = bs
            return bs

        unmatched = np.ones(n, dtype=bool)
        left = n
        gate_cache: dict = {}
        emits: list[tuple[CompiledRule, np.ndarray, dict[str, pa.Array]]] = []
        for cr, disp in zip(self.rules, self._rule_disp):
            if left == 0:
                break
            gate = self._gate_mask(cr, table, n, gate_cache)
            if disp is not None:
                parts = [_buckets(length)[pidx] for length, pidx in disp]
                cand = (parts[0] if len(parts) == 1
                        else np.sort(np.concatenate(parts)))
                if len(cand) == 0:
                    continue
                idx = cand[unmatched[cand] & gate[cand]]
            else:
                idx = np.flatnonzero(unmatched & gate)
            if len(idx) == 0:
                continue
            if cr.is_default:
                emits.append((cr, idx, {}))
                unmatched[idx] = False
                left -= len(idx)
                continue
            pos, caps = self._extract(cr, text, idx)
            if len(pos) == 0:
                continue
            take_idx = idx[pos]
            unmatched[take_idx] = False
            left -= len(take_idx)
            emits.append((cr, take_idx, caps))
        if unmatched.any():
            # gated default shouldn't happen (default has no gate), but never drop rows
            emits.append((self.rules[-1], np.flatnonzero(unmatched), {}))
        return self._assemble(table, emits, extra_cols)
