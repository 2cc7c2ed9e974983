"""Grok-style named pattern library for rule tables (C10 extension
surface).

Log-pipeline users write ``%{IP:src_ip}`` instead of raw regex; expansion
happens once at rule-TABLE LOAD time (`rules_io`), so the vectorized
engine still compiles plain regexes — grok is pure declarative sugar, no
runtime cost. ``%{NAME:field}`` becomes a named capture group
``(?P<field>...)`` (which the engine's ``capture`` semantics already
extract); ``%{NAME}`` becomes a non-capturing group. Library entries may
reference other entries (bounded recursive expansion). Users can pass
their own ``library`` dict to extend or override the built-ins.
"""

from __future__ import annotations

import re

GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
            r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARNING|WARN|ERROR|FATAL|CRITICAL)",
    "UNIXPATH": r"(?:/[\w.-]+)+",
    "HEX": r"0[xX][0-9a-fA-F]+",
    "HOSTNAME": r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
                r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*",
}

_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")
_MAX_DEPTH = 8


def grok_expand(pattern: str, library: dict[str, str] | None = None) -> str:
    """Expand every ``%{NAME[:field]}`` reference in ``pattern`` into its
    regex from the library (built-ins + optional user overrides).
    References inside library entries expand recursively up to a fixed
    depth; an unknown name or a reference cycle raises ``ValueError``."""
    lib = dict(GROK_PATTERNS)
    if library:
        lib.update(library)

    def sub_one(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if name not in lib:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = lib[name]
        return f"(?P<{field}>{body})" if field else f"(?:{body})"

    for _ in range(_MAX_DEPTH):
        expanded = _REF.sub(sub_one, pattern)
        if expanded == pattern:
            return expanded
        pattern = expanded
    raise ValueError("grok expansion did not converge "
                     f"(reference cycle?): {pattern[:80]!r}")
