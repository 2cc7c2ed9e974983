"""Single-process oracle parser — the reference-style row-at-a-time engine.

Mirrors the control flow of the reference's ``parse_log`` generator
(SURVEY.md §3.1, reconstructed: one mutable dict per event, ordered rule
dispatch, first match wins, default fall-through) and is used ONLY by tests
to verify the vectorized engine: FIXTURES.md §5 invariant 2 requires the
Ray pipeline's routed rows to equal this oracle's outputs under stable
``(conv_id, turn_idx)`` ordering.

Must implement the exact same normative semantics as ``logray.ruleset``:
- first-match-wins in declaration order, gate checked first
- optional non-participating capture group -> ``''``
- failed numeric/timestamp convert -> None + ``parse_error=True``
- ``''`` fed to a convert -> None, no parse_error
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Mapping

from .ruleset import Rule, compile_re2_like
from .rules_transcripts import TRANSCRIPT_RULES


class OracleParser:
    def __init__(self, rules: list[Rule] | None = None):
        self.rules = rules if rules is not None else TRANSCRIPT_RULES
        self._compiled = [
            (r, [compile_re2_like(p) for p in r.patterns]) for r in self.rules
        ]

    def parse_row(self, row: Mapping[str, Any]) -> dict[str, Any]:
        """Parse one transcript row dict -> event dict (envelope + fields)."""
        text = row.get("text")
        for rule, patterns in self._compiled:
            if rule.gate and any(row.get(col) not in vals for col, vals in rule.gate.items()):
                continue
            if not patterns:  # default rule
                return self._emit(rule, row, {})
            if text is None:
                continue
            for rx in patterns:
                m = rx.search(text)  # RE2 extract_regex matches anywhere
                if m:
                    caps = {g: ("" if v is None else v) for g, v in m.groupdict().items()}
                    return self._emit(rule, row, caps)
        # unreachable when the ruleset ends with a default, but never drop
        last = self.rules[-1]
        return self._emit(last, row, {})

    def _emit(self, rule: Rule, row: Mapping[str, Any], caps: dict[str, str]) -> dict[str, Any]:
        out: dict[str, Any] = dict(row)
        out["rule_id"] = rule.rule_id
        out["sink"] = rule.sink
        out.update(rule.consts)
        parse_error = False
        for name, v in caps.items():
            out.setdefault(name, v)
        for c in rule.casts:
            raw = caps.get(c.src)
            if raw is None or raw == "":
                out[c.dst_field] = None
                continue
            try:
                if c.converter == "int64":
                    x = int(raw)
                    if not (-(2**63) <= x <= 2**63 - 1):
                        raise OverflowError(raw)
                    out[c.dst_field] = x
                elif c.converter == "float64":
                    out[c.dst_field] = float(raw)
                elif c.converter == "percent":
                    x = int(raw)
                    if not (-(2**63) <= x <= 2**63 - 1):
                        raise OverflowError(raw)
                    out[c.dst_field] = x / 100.0
                elif c.converter == "duration":
                    m = re.fullmatch(r"(?:(\d{1,15})h)?(?:(\d{1,15})m)?(\d{1,15})s", raw)
                    if m is None:
                        raise ValueError(raw)
                    out[c.dst_field] = (int(m.group(1) or 0) * 3600
                                        + int(m.group(2) or 0) * 60
                                        + int(m.group(3)))
                elif c.converter == "size":
                    m = re.fullmatch(
                        r"(\d{1,6})(?:\.(\d{1,3}))?(B|KiB|MiB|GiB|TiB)", raw)
                    if m is None:
                        raise ValueError(raw)
                    mult = {"B": 1, "KiB": 1024, "MiB": 1024 ** 2,
                            "GiB": 1024 ** 3, "TiB": 1024 ** 4}[m.group(3)]
                    frac3 = int((m.group(2) or "").ljust(3, "0") or "0")
                    out[c.dst_field] = (int(m.group(1)) * mult
                                        + frac3 * mult // 1000)
                elif c.converter.startswith("timestamp:"):
                    from datetime import datetime

                    out[c.dst_field] = datetime.strptime(raw, c.converter.split(":", 1)[1])
                else:
                    out[c.dst_field] = raw
            except (ValueError, OverflowError):
                out[c.dst_field] = None
                parse_error = True
        out["parse_error"] = parse_error
        return out

    def parse_rows(self, rows: Iterable[Mapping[str, Any]]) -> Iterable[dict[str, Any]]:
        for row in rows:
            yield self.parse_row(row)

    def fold_rows(self, rows: Iterable[Mapping[str, Any]],
                  cont_rule: str = "R99_default") -> Iterable[dict[str, Any]]:
        """Reference-style continuation fold (SURVEY.md §3.1: ``parse_log``
        appends non-matching lines to the in-flight event). ``rows`` must be
        one conversation's parsed rows in ``turn_idx`` order. Continuation
        rows (rule_id == cont_rule) with a preceding event are folded into
        its ``continuations`` list; leading continuations are kept standalone
        (deviation for count parity — see logray.stages.fold)."""
        current: dict[str, Any] | None = None
        for row in rows:
            if row["rule_id"] == cont_rule:
                if current is not None:
                    current["continuations"].append(row["text"])
                    current["n_folded"] += 1
                else:
                    # leading continuation: standalone, never an anchor —
                    # a continuation row can only attach to a real event
                    lead = dict(row)
                    lead["continuations"] = []
                    lead["n_folded"] = 0
                    yield lead
                continue
            if current is not None:
                yield current
            current = dict(row)
            current["continuations"] = []
            current["n_folded"] = 0
        if current is not None:
            yield current
