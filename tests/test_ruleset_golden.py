"""Golden-line tests (reference test style, SURVEY.md §5.1): one raw line in,
one expected structured event out — field-for-field, including classification
triple and converted types. Runs each case through BOTH the pure-Python oracle
parser and the vectorized Arrow engine; they must agree with the golden dict
and with each other."""

from __future__ import annotations

import datetime
import json
import math
from pathlib import Path

import pyarrow as pa
import pytest

from logray.oracle import OracleParser
from logray.rules_transcripts import TRANSCRIPT_PASSTHROUGH, transcript_ruleset

GOLDEN = Path(__file__).parent / "golden.jsonl"

_TS = datetime.datetime(2026, 1, 1)


def _load_cases():
    cases = [json.loads(line) for line in GOLDEN.read_text().splitlines() if line.strip()]
    # 400-char boundary cases (awkward to keep readable inside the jsonl)
    cases.append({"text": "x" * 400, "role": "user", "tool": "",
                  "expected": {"rule_id": "R09_user_msg", "sink": "sink_dialogue",
                               "category": "dialogue", "event_type": "user_msg",
                               "msg": "x" * 400, "parse_error": False}})
    cases.append({"text": "x" * 401, "role": "user", "tool": "",
                  "expected": {"rule_id": "R99_default", "sink": "sink_unknown",
                               "category": "unknown", "event_type": "unknown",
                               "parse_error": False}})
    # timestamp:<fmt> converter cases (datetime values can't live in jsonl):
    # R41 is the one rule with a timestamp cast — happy path and a strptime
    # failure (regex \d{2} admits month 13; the CONVERTER must reject it)
    ckpt_base = {"rule_id": "R41_checkpoint", "sink": "sink_control",
                 "category": "control", "event_type": "checkpoint",
                 "ckpt_id": "00ff00ff", "turns": 42, "bytes": 100000}
    cases.append({"text": "[checkpoint] id=00ff00ff turns=42 bytes=100000 "
                          "at=2026-01-15T12:30:45",
                  "role": "system", "tool": "",
                  "expected": {**ckpt_base, "at": "2026-01-15T12:30:45",
                               "ckpt_ts": datetime.datetime(2026, 1, 15, 12, 30, 45),
                               "parse_error": False}})
    cases.append({"text": "[checkpoint] id=00ff00ff turns=42 bytes=100000 "
                          "at=2026-13-40T25:61:61",
                  "role": "system", "tool": "",
                  "expected": {**ckpt_base, "at": "2026-13-40T25:61:61",
                               "ckpt_ts": None, "parse_error": True}})
    return cases


CASES = _load_cases()


def _row(case, i):
    return {"conv_id": "cg", "turn_idx": i, "role": case["role"],
            "text": case["text"], "tool": case["tool"], "ts": _TS}


def _check(expected: dict, got: dict, label: str):
    for k, v in expected.items():
        g = got.get(k)
        if isinstance(v, float) and isinstance(g, float):
            assert math.isclose(g, v, rel_tol=1e-12), f"{label}: field {k}: {g!r} != {v!r}"
        else:
            assert g == v, f"{label}: field {k}: {g!r} != {v!r}"


@pytest.mark.parametrize("i", range(len(CASES)), ids=lambda i: f"case{i:02d}")
def test_oracle_golden(i):
    case = CASES[i]
    got = OracleParser().parse_row(_row(case, i))
    _check(case["expected"], got, f"oracle case {i} {case['text'][:40]!r}")


def test_engine_golden_batch():
    """All golden lines in ONE batch — exercises mask shrinking across rules."""
    rs = transcript_ruleset()
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    tbl = pa.Table.from_pylist([_row(c, i) for i, c in enumerate(CASES)], schema=schema)
    out = rs.parse_batch(tbl)
    assert out.num_rows == len(CASES), "routed-row parity: no row dropped or duplicated"
    by_turn = {r["turn_idx"]: r for r in out.to_pylist()}
    for i, case in enumerate(CASES):
        _check(case["expected"], by_turn[i], f"engine case {i} {case['text'][:40]!r}")
        # fields not claimed by the expected dict must be null (schema union)
        for k, v in by_turn[i].items():
            if k in case["expected"] or k in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
                continue
            assert v is None, f"case {i}: unexpected non-null field {k}={v!r}"


def test_engine_matches_oracle_rowwise():
    rs = transcript_ruleset()
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    rows = [_row(c, i) for i, c in enumerate(CASES)]
    out = rs.parse_batch(pa.Table.from_pylist(rows, schema=schema))
    by_turn = {r["turn_idx"]: r for r in out.to_pylist()}
    op = OracleParser()
    for i, row in enumerate(rows):
        o = op.parse_row(row)
        e = by_turn[i]
        for k in set(o) | set(e):
            ov, ev = o.get(k), e.get(k)
            if isinstance(ov, float) and isinstance(ev, float):
                assert math.isclose(ov, ev, rel_tol=1e-12), (i, k, ov, ev)
            else:
                assert ov == ev, (i, k, ov, ev)


def test_empty_batch():
    rs = transcript_ruleset()
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    out = rs.parse_batch(schema.empty_table())
    assert out.num_rows == 0
    assert out.schema == rs.schema


def test_null_text_falls_through():
    rs = transcript_ruleset()
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    tbl = pa.Table.from_pylist(
        [{"conv_id": "c", "turn_idx": 0, "role": "user", "text": None, "tool": "", "ts": _TS}],
        schema=schema)
    out = rs.parse_batch(tbl).to_pylist()[0]
    assert out["rule_id"] == "R99_default"
    assert out["sink"] == "sink_unknown"


def test_python_re_fallback_for_non_re2_patterns():
    """Patterns RE2 rejects (backreferences) must run through the Python-re
    fallback on that rule's residual rows only, with identical
    capture/convert/priority semantics."""
    from logray.ruleset import Cast, Rule, RuleSet

    rules = [
        Rule("R_dup", "s_dup",
             patterns=(r"^(?P<word>\w+) (?P=word) x=(?P<x>\d+)$",),  # backref: not RE2
             casts=(Cast("x", "int64"),)),
        Rule("R_any", "s_any", patterns=(r"^(?P<head>\w+) ",)),
        Rule("R_def", "s_def"),
    ]
    rs = RuleSet(rules, passthrough=[("text", pa.string())])
    # confirm the dup rule actually compiled to the fallback path
    assert rs.rules[0].py_patterns and not rs.rules[0].arrow_patterns
    t = pa.table({"text": pa.array([
        "echo echo x=42",      # backref matches -> R_dup (first match wins)
        "echo print x=42",     # backref fails -> R_any
        "###",                 # nothing -> default
        None,                  # null -> default
    ])})
    out = rs.parse_batch(t).sort_by("text")
    by_text = {r["text"]: r for r in out.to_pylist()}
    assert by_text["echo echo x=42"]["rule_id"] == "R_dup"
    assert by_text["echo echo x=42"]["x"] == 42
    assert by_text["echo print x=42"]["rule_id"] == "R_any"
    assert by_text["echo print x=42"]["head"] == "echo"
    assert by_text["###"]["rule_id"] == "R_def"
    assert out.num_rows == 4 and not any(r["parse_error"] for r in out.to_pylist())


def test_dollar_rewrite_scanner():
    """`$` rewrite must leave char-class dollars and escaped dollars alone
    and anchor like RE2 (\\Z), including after an escaped backslash."""
    from logray.ruleset import compile_re2_like

    assert compile_re2_like(r"cost[$]").search("cost$")
    rx = compile_re2_like(r"end$")
    assert rx.search("end") and not rx.search("end\n")
    rx2 = compile_re2_like(r"p\\$")  # escaped backslash THEN a real anchor
    assert rx2.search("p\\") and not rx2.search("p\\\n")
    assert compile_re2_like(r"a\$b").search("xa$by")


def test_literal_prefix_scanner():
    """The prefix gate must only ever claim REQUIRED literals — a wrong
    prefix silently drops matches, so every tricky shape is pinned."""
    from logray.ruleset import _literal_prefix

    assert _literal_prefix(r"^\[tool:(?P<t>[a-z_]+)\] call") == "[tool:"
    assert _literal_prefix(r"^Traceback \(most recent call last\): x") == \
        "Traceback (most recent call last): "
    assert _literal_prefix(r"^I can't help with (?P<t>.{1,80})\.$") == \
        "I can't help with "
    assert _literal_prefix(r"^.{1,400}$") == ""          # metachar first
    assert _literal_prefix(r"no_anchor") == ""            # not anchored
    assert _literal_prefix(r"^ab?c") == "a"               # quantified b optional
    assert _literal_prefix(r"^ab*c") == "a"
    assert _literal_prefix(r"^ab{2}c") == "a"             # {2} means b required, but scanner is conservative
    assert _literal_prefix(r"^a\[?x") == "a"              # escaped-punct quantified
    assert _literal_prefix(r"^\d+ x") == ""               # class escape
    assert _literal_prefix(r"^https?://") == "http"       # s optional
    assert _literal_prefix(r"^(?:a|b)c") == ""            # group first


def test_generator_templates_always_hit_their_intended_rule():
    """Template-level fuzz: across many seeds, every text the corpus
    generator fills for rule R lands on EXACTLY R under first-match-wins
    dispatch (guards both the templates and the declaration order — a new
    rule that shadows an earlier family breaks here, not in a driver
    run)."""
    import numpy as np

    from logray import gen
    from logray.rules_transcripts import TRANSCRIPT_RULES, transcript_ruleset

    rule_role = {}
    for role, templates in gen.ROLE_TEMPLATES.items():
        for rid, _ in templates:
            rule_role[rid] = role
    rs = transcript_ruleset()
    import pyarrow as pa

    for seed in range(5):
        rng = np.random.default_rng(1000 + seed)
        for rule in TRANSCRIPT_RULES:
            rid = rule.rule_id
            if rid == "R99_default" or rid not in rule_role:
                continue
            k = 40
            tools = np.array(["bash"] * k, dtype=object)
            texts = gen._fill_texts(rid, k, rng, tools)
            t = pa.table({
                "conv_id": pa.array(["c"] * k),
                "turn_idx": pa.array(range(k), pa.int32()),
                "role": pa.array([rule_role[rid]] * k),
                "text": pa.array([str(x) for x in texts]),
                "tool": pa.array([""] * k),
                "ts": pa.array([0] * k, pa.timestamp("us")),
            })
            out = rs.parse_batch(t)
            got = set(out["rule_id"].to_pylist())
            assert got == {rid}, f"seed {seed} rule {rid}: dispatched {got}"
