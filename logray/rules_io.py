"""Declarative ruleset serialization — rule tables as data files (C10).

The reference's extension surface is "write another systemlog.py": users
author rule tables in Python (logparse/systemlog.py ~700-900 LoC is pure
table, SURVEY.md §2B/C10). Here the ``Rule`` records are already plain
data, so the natural Ray-era extension surface is a JSON document a user
can author, diff, and ship WITHOUT writing Python: this module round-trips
``(rules, passthrough)`` to/from JSON with full fidelity.

Format (versioned, one object):

    {"version": 1,
     "passthrough": [["conv_id", "string"], ["turn_idx", "int32"], ...],
     "rules": [{"rule_id": "R01_tool_call",
                "sink": "sink_action",
                "gate": {"role": ["assistant"]},
                "patterns": ["^\\[tool:(?P<tool_name>...)..."],
                "casts": [{"src": "call_id", "converter": "int64"},
                          {"src": "pct", "converter": "percent", "dst": "frac"}],
                "consts": {"category": "action"}},
               ...,
               {"rule_id": "R99", "sink": "sink_unknown", ...}]}

Arrow types in ``passthrough`` use their canonical ``str(pa.DataType)``
spellings (``string``, ``int32``, ``timestamp[us]``, ...); the subset
below covers every envelope type the engine emits. Compilation and
validation stay in ``RuleSet`` — a malformed table fails at load with the
same errors a Python-authored one would.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import pyarrow as pa

from .ruleset import Cast, Rule, RuleSet

FORMAT_VERSION = 1

# canonical str(pa.DataType) spelling -> type, for the envelope-column types
# the engine supports (extend alongside ruleset.CONVERTER_TYPES)
_TYPES: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "binary": pa.binary(),
    "date32[day]": pa.date32(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
}


def _type_to_str(t: pa.DataType) -> str:
    s = str(t)
    if s not in _TYPES:
        raise ValueError(f"unsupported passthrough type {s!r} "
                         f"(supported: {sorted(_TYPES)})")
    return s


def _type_from_str(s: str) -> pa.DataType:
    try:
        return _TYPES[s]
    except KeyError:
        raise ValueError(f"unknown passthrough type {s!r} "
                         f"(supported: {sorted(_TYPES)})") from None


def rule_to_dict(rule: Rule) -> dict:
    d: dict = {"rule_id": rule.rule_id, "sink": rule.sink}
    if rule.gate:
        d["gate"] = {k: list(v) for k, v in rule.gate.items()}
    if rule.patterns:
        d["patterns"] = list(rule.patterns)
    if rule.casts:
        d["casts"] = [
            {"src": c.src, "converter": c.converter,
             **({"dst": c.dst} if c.dst is not None else {})}
            for c in rule.casts
        ]
    if rule.consts:
        d["consts"] = dict(rule.consts)
    return d


def rule_from_dict(d: dict, grok_library: dict | None = None) -> Rule:
    known = {"rule_id", "sink", "gate", "patterns", "casts", "consts"}
    extra = set(d) - known
    if extra:
        raise ValueError(f"rule {d.get('rule_id')!r}: unknown keys {sorted(extra)}")
    from .functions.grok import grok_expand

    # grok sugar: %{NAME:field} refs expand to plain regex AT LOAD TIME,
    # so the vectorized engine never sees grok syntax (zero runtime cost)
    patterns = tuple(
        grok_expand(p, grok_library) if "%{" in p else p
        for p in d.get("patterns", ()))
    return Rule(
        rule_id=d["rule_id"],
        sink=d["sink"],
        patterns=patterns,
        gate={k: tuple(v) for k, v in d.get("gate", {}).items()},
        casts=tuple(Cast(c["src"], c["converter"], c.get("dst"))
                    for c in d.get("casts", ())),
        consts=dict(d.get("consts", {})),
    )


def ruleset_to_json(rules: Sequence[Rule],
                    passthrough: Sequence[tuple[str, pa.DataType]]) -> str:
    doc = {
        "version": FORMAT_VERSION,
        "passthrough": [[n, _type_to_str(t)] for n, t in passthrough],
        "rules": [rule_to_dict(r) for r in rules],
    }
    return json.dumps(doc, indent=2)


def parse_ruleset_json(text: str) -> tuple[list[Rule], list[tuple[str, pa.DataType]]]:
    """Decode a ruleset document; returns (rules, passthrough) uncompiled so
    callers can compose tables before building the ``RuleSet``."""
    doc = json.loads(text)
    v = doc.get("version")
    if v != FORMAT_VERSION:
        raise ValueError(f"unsupported ruleset format version {v!r}")
    passthrough = [(n, _type_from_str(s)) for n, s in doc["passthrough"]]
    # optional user-defined grok patterns, composable with the built-ins
    grok_library = doc.get("grok_patterns") or None
    rules = [rule_from_dict(d, grok_library) for d in doc["rules"]]
    return rules, passthrough


def load_ruleset(path: str | Path) -> RuleSet:
    """Compile a RuleSet from a JSON rule-table file (the user-facing entry:
    author JSON, run the engine — no Python required)."""
    rules, passthrough = parse_ruleset_json(Path(path).read_text())
    return RuleSet(rules, passthrough)
