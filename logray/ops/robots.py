"""robots.txt evaluation (RFC 9309 subset) — the crawl-politeness filter
that sits between ingest and fetch/keep decisions in every web pipeline.

From-scratch parser + vectorized matcher (no urllib.robotparser: it
predates RFC 9309's longest-match rule and mishandles Allow
precedence):

- group selection: the group whose ``User-agent`` line best matches the
  caller's agent (exact product token, else ``*``); multiple agent lines
  may head one group;
- rule matching: ``Allow``/``Disallow`` paths with ``*`` wildcards and a
  ``$`` end anchor, compiled to anchored RE2;
- precedence: the LONGEST matching rule wins; on a length tie Allow
  wins; no rule matching means allowed; an empty Disallow value is
  allow-all.

Evaluation is vectorized across URLs: each compiled rule runs one
``match_substring_regex`` over the whole path column; a running
(best_len, verdict) pair per row resolves precedence — O(rules) kernel
passes, no per-row Python.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse robots.txt into [(path_pattern, allow)] for ``agent``.

    Groups are runs of consecutive ``User-agent`` lines followed by
    rules. A group headed by the exact agent token wins over ``*``;
    with no applicable group the result is [] (allow-all)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    in_agents = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((agents, rules))
                agents, rules = [], []
            in_agents = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if val == "":
                if key == "disallow":
                    continue  # empty Disallow = allow-all (no rule)
                continue      # empty Allow is meaningless — skip
            rules.append((val, key == "allow"))
    if agents or rules:
        groups.append((agents, rules))
    agent = agent.lower()
    exact = [r for a, r in groups if agent in a]
    if exact:
        return exact[0]
    star = [r for a, r in groups if "*" in a]
    return star[0] if star else []


def compile_rules(rules: list[tuple[str, bool]]):
    """Compile rule paths to anchored RE2 with effective lengths:
    ``*`` → ``.*``, trailing ``$`` → end anchor, everything else
    escaped. Returns [(pattern, length, allow)] — length is the raw
    rule-path length, the RFC's specificity measure."""
    out = []
    for path, allow in rules:
        body = path
        anchored = body.endswith("$")
        if anchored:
            body = body[:-1]
        parts = [re.escape(seg) for seg in body.split("*")]
        # RE2 end-of-text is '$' (non-multiline) — '\Z' is invalid RE2
        pat = "^" + ".*".join(parts) + ("$" if anchored else "")
        out.append((pat, len(path), allow))
    return out


def allowed_mask(paths, compiled) -> np.ndarray:
    """Vectorized RFC 9309 evaluation: for each path, the longest
    matching rule decides (ties → Allow). One regex kernel pass per
    rule; precedence resolved with running per-row (best_len, verdict)
    arrays."""
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    n = len(paths)
    best_len = np.full(n, -1, dtype=np.int64)
    verdict = np.ones(n, dtype=bool)
    # evaluate Disallow before Allow at each length so an equal-length
    # Allow overwrites (RFC tie rule): sort by (length, allow)
    for pat, length, allow in sorted(compiled, key=lambda r: (r[1], r[2])):
        m = pc.match_substring_regex(paths, pat).to_numpy(
            zero_copy_only=False)
        upd = m & (length >= best_len)
        verdict[upd] = allow
        best_len[upd & (best_len < length)] = length
    return verdict


class RobotsFilterStage:
    """Actor-pool stage: per-host compiled rule tables built once per
    actor from the broadcast robots map; ``__call__`` evaluates each
    batch host-by-host (hosts are few; rows per host vectorized). Emits
    the input columns plus ``robots_ok``."""

    def __init__(self, robots_ref, host_col: str = "host",
                 path_col: str = "path", agent: str = "*"):
        import ray

        robots = ray.get(robots_ref) if not isinstance(robots_ref, dict) \
            else robots_ref
        self.compiled = {h: compile_rules(parse_robots(txt, agent))
                         for h, txt in robots.items()}
        self.host_col = host_col
        self.path_col = path_col

    def __call__(self, t: pa.Table) -> pa.Table:
        hosts = t[self.host_col]
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        paths = t[self.path_col]
        if isinstance(paths, pa.ChunkedArray):
            paths = paths.combine_chunks()
        ok = np.ones(t.num_rows, dtype=bool)
        d = hosts.dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False)
        for i, h in enumerate(d.dictionary.to_pylist()):
            rules = self.compiled.get(h)
            if not rules:
                continue  # unknown host / empty rules → allowed
            sel = idx == i
            sub = paths.take(pa.array(np.flatnonzero(sel)))
            ok[sel] = allowed_mask(sub, rules)
        return t.append_column("robots_ok", pa.array(ok))
