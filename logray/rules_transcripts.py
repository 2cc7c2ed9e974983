"""Frozen normative ruleset for transcript parsing (FIXTURES.md §2).

This is the "config" half of the engine/config split: the analogue of the
reference's ``systemlog.py`` rule table (a ``switch`` of ``case``-gated
``rule``s; SURVEY.md §2B, reconstructed — reference tree empty in sandbox),
instantiated on the transcript domain of BASELINE.json's ``input_hint``.

Dispatch semantics (enforced by ``logray.ruleset.RuleSet``): rules evaluated
in ``rule_id`` order within their gate, gates checked first, first match
wins, unmatched rows fall through to R99 (never dropped).

Order-sensitivity by construction (first-match-wins regression pairs):
- R08 ``/cmd`` must win over R09's catch-all (``/help`` matches both)
- R01 ``[tool:...]`` must win over R10's catch-all
"""

from __future__ import annotations

import pyarrow as pa

from .ruleset import Cast, Rule, RuleSet

# passthrough envelope: the input columns (BASELINE.json input_hint)
TRANSCRIPT_PASSTHROUGH: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]

TRANSCRIPT_RULES: list[Rule] = [
    Rule(
        rule_id="R01_tool_call",
        sink="sink_action",
        gate={"role": ("assistant",)},
        patterns=(r"^\[tool:(?P<tool_name>[a-z_]+)\] call id=(?P<call_id>\d+) args=(?P<args_json>\{.*\})$",),
        casts=(Cast("call_id", "int64"),),
        consts={"category": "action", "event_type": "tool_call"},
    ),
    Rule(
        rule_id="R02_tool_result_ok",
        sink="sink_action",
        gate={"role": ("tool",)},
        patterns=(r"^\[tool:(?P<tool_name>[a-z_]+)\] ok id=(?P<call_id>\d+) bytes=(?P<bytes>\d+) dur_ms=(?P<dur_ms>\d+)$",),
        casts=(Cast("call_id", "int64"), Cast("bytes", "int64"), Cast("dur_ms", "int64")),
        consts={"category": "action", "event_type": "tool_ok"},
    ),
    Rule(
        rule_id="R03_tool_result_err",
        sink="sink_error",
        gate={"role": ("tool",)},
        patterns=(r"^\[tool:(?P<tool_name>[a-z_]+)\] error id=(?P<call_id>\d+) code=(?P<code>[A-Z_]+) dur_ms=(?P<dur_ms>\d+)$",),
        casts=(Cast("call_id", "int64"), Cast("dur_ms", "int64")),
        consts={"category": "error", "event_type": "tool_err"},
    ),
    Rule(
        rule_id="R04_traceback",
        sink="sink_error",
        gate={"role": ("tool",)},
        patterns=(r"^Traceback \(most recent call last\): (?P<exc_type>[A-Za-z_.]+): (?P<exc_msg>.*)$",),
        consts={"category": "error", "event_type": "exception"},
    ),
    Rule(
        rule_id="R05_metric",
        sink="sink_telemetry",
        gate={"role": ("assistant",)},
        patterns=(r"^\[metrics\] tokens=(?P<tokens>\d+) latency_ms=(?P<latency_ms>\d+) cost_usd=(?P<cost_usd>\d+\.\d+)$",),
        casts=(Cast("tokens", "int64"), Cast("latency_ms", "int64"), Cast("cost_usd", "float64")),
        consts={"category": "telemetry", "event_type": "metrics"},
    ),
    Rule(
        rule_id="R06_status",
        sink="sink_telemetry",
        gate={"role": ("system",)},
        patterns=(r"^\[status\] phase=(?P<phase>[a-z]+) pct=(?P<pct>\d+)%$",),
        casts=(Cast("pct", "int64"), Cast("pct", "percent", "frac")),
        consts={"category": "telemetry", "event_type": "status"},
    ),
    Rule(
        rule_id="R07_sys_prompt",
        sink="sink_control",
        gate={"role": ("system",)},
        patterns=(r"^You are (?P<agent_name>[A-Za-z ]+)\. Session (?P<session>[0-9a-f]{8})\.$",),
        consts={"category": "control", "event_type": "system_prompt"},
    ),
    Rule(
        rule_id="R08_user_cmd",
        sink="sink_control",
        gate={"role": ("user",)},
        patterns=(r"^/(?P<cmd>[a-z]+)(?: (?P<cmd_args>.*))?$",),
        consts={"category": "control", "event_type": "command"},
    ),
    Rule(
        rule_id="R09_user_msg",
        sink="sink_dialogue",
        gate={"role": ("user",)},
        patterns=(r"^(?P<msg>.{1,400})$",),
        consts={"category": "dialogue", "event_type": "user_msg"},
    ),
    Rule(
        rule_id="R10_assist_msg",
        sink="sink_dialogue",
        gate={"role": ("assistant",)},
        patterns=(r"^(?P<msg>.{1,400})$",),
        consts={"category": "dialogue", "event_type": "assistant_msg"},
    ),
    Rule(
        rule_id="R99_default",
        sink="sink_unknown",
        consts={"category": "unknown", "event_type": "unknown"},
    ),
]

SINKS: tuple[str, ...] = (
    "sink_action",
    "sink_error",
    "sink_telemetry",
    "sink_control",
    "sink_dialogue",
    "sink_unknown",
)


def transcript_ruleset() -> RuleSet:
    """Compile the frozen ruleset (fresh instance; compile once per actor)."""
    return RuleSet(TRANSCRIPT_RULES, TRANSCRIPT_PASSTHROUGH)


def sink_columns() -> dict[str, set[str]]:
    """Per-sink column allowlist (SURVEY.md §7 hard-part 1: fixed schema
    per sink): envelope/classification/consts for every sink, plus ONLY
    the capture/cast columns of the rules routed to that sink — columns
    belonging to other sinks' rules are all-null there and are pruned at
    write time. Columns not listed here (e.g. enrich outputs appended
    after parse) always pass through."""
    return transcript_ruleset().sink_columns()
