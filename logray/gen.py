"""Deterministic transcript-corpus generator (FIXTURES.md §1).

Generates the normative synthetic input table — schema exactly per
BASELINE.json ``input_hint`` — with per-rule counts that are analytically
recomputable: every row's template choice is recorded, so FIXTURES.md §5
invariant 1 (per-sink aggregate-count parity) is an exact equality check.

Layout: one Parquet file per ``crc32(conv_id) % partitions`` partition
(default P=8) so partition-granular resume/lineage is testable. A sidecar
``_expected/`` directory holds ``(conv_id, turn_idx, expected_rule)`` for
row-level routing checks — the pipeline itself never reads it.

Skew: conversations drawn with p=0.001 are "hot" (turns ×50) to exercise
the salted-aggregation path (BASELINE.json:6).
"""

from __future__ import annotations

import json
import zlib
from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# tz-pinned: naive .timestamp() depends on the host TZ and would make
# the "deterministic" corpus differ across machines
BASE_TS_US = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

TOOLS = (
    "search", "browser", "bash", "python", "calculator", "sql", "email",
    "calendar", "files", "editor", "weather", "maps", "translate", "vision",
    "audio", "scraper",
)
ERROR_CODES = ("TIMEOUT", "NOT_FOUND", "PERMISSION_DENIED", "RATE_LIMIT", "INTERNAL")
EXC_TYPES = ("ValueError", "KeyError", "TimeoutError", "requests.exceptions.ConnectionError")
PHASES = ("plan", "execute", "review", "reflect", "finalize")
AGENT_NAMES = ("Helpful Agent", "Atlas", "Code Assistant", "Research Bot")
COMMANDS = ("help", "run", "status", "deploy", "search", "test")
VOCAB = (
    "please summarize report cluster deploy metrics latency tokens budget "
    "review the quarterly numbers and draft a response for our team today "
    "check whether these results look correct then explain the difference "
    "model data batch stream shuffle partition actor worker node memory"
).split()
NOISE = ("", "line one\nline two", "###\n@@@", "z" * 450, "\n", "🦜\n🪺")

# template weights within each role (FIXTURES.md §2, column w)
ROLE_TEMPLATES: dict[str, tuple[tuple[str, float], ...]] = {
    "user": (("R08_user_cmd", 0.20), ("R09_user_msg", 0.80)),
    "assistant": (("R01_tool_call", 0.30), ("R05_metric", 0.10), ("R10_assist_msg", 0.60)),
    "system": (("R06_status", 0.50), ("R07_sys_prompt", 0.50)),
    "tool": (("R02_tool_result_ok", 0.80), ("R03_tool_result_err", 0.15), ("R04_traceback", 0.05)),
}
NOISE_P = 0.02
HOT_P = 0.001
HOT_FACTOR = 50
TOOL_TURN_P = 0.35
SYS_TURN_P = 0.08


def conv_partition(conv_id: str, partitions: int) -> int:
    """Stable cross-process partition assignment (crc32, not Python hash)."""
    return zlib.crc32(conv_id.encode()) % partitions


def _role_sequence(n_turns: int, draws: np.ndarray) -> list[str]:
    """Deterministic role state machine: system prologue, then
    user→assistant(→tool→assistant) cycles with occasional system turns."""
    roles = ["system"]
    di = 0
    while len(roles) < n_turns:
        roles.append("user")
        if len(roles) >= n_turns:
            break
        roles.append("assistant")
        if len(roles) >= n_turns:
            break
        if draws[di % len(draws)] < TOOL_TURN_P:
            roles.append("tool")
            if len(roles) >= n_turns:
                break
            roles.append("assistant")
            if len(roles) >= n_turns:
                break
        di += 1
        if draws[di % len(draws)] < SYS_TURN_P:
            roles.append("system")
        di += 1
    return roles[:n_turns]


def _fill_texts(rule: str, k: int, rng: np.random.Generator, tools: np.ndarray) -> list[str]:
    """Vectorized-ish template fill for k rows of one rule. ``tools`` holds the
    per-row tool column value (used so text and tool column agree)."""
    if rule == "R01_tool_call":
        cid = rng.integers(1, 100_000, k)
        w = rng.choice(VOCAB, k)
        return [f'[tool:{t}] call id={c} args={{"q": "{q}"}}' for t, c, q in zip(tools, cid, w)]
    if rule == "R02_tool_result_ok":
        cid = rng.integers(1, 100_000, k)
        b = rng.integers(0, 10_000_000, k)
        d = rng.integers(1, 60_000, k)
        return [f"[tool:{t}] ok id={c} bytes={bb} dur_ms={dd}" for t, c, bb, dd in zip(tools, cid, b, d)]
    if rule == "R03_tool_result_err":
        cid = rng.integers(1, 100_000, k)
        code = rng.choice(ERROR_CODES, k)
        d = rng.integers(1, 60_000, k)
        return [f"[tool:{t}] error id={c} code={cc} dur_ms={dd}" for t, c, cc, dd in zip(tools, cid, code, d)]
    if rule == "R04_traceback":
        exc = rng.choice(EXC_TYPES, k)
        w1 = rng.choice(VOCAB, k)
        w2 = rng.choice(VOCAB, k)
        return [f"Traceback (most recent call last): {e}: {a} {b}" for e, a, b in zip(exc, w1, w2)]
    if rule == "R05_metric":
        t = rng.integers(1, 50_000, k)
        l = rng.integers(1, 120_000, k)
        c = rng.integers(1, 10_000, k)
        return [f"[metrics] tokens={tt} latency_ms={ll} cost_usd={cc / 10000:.4f}" for tt, ll, cc in zip(t, l, c)]
    if rule == "R06_status":
        ph = rng.choice(PHASES, k)
        p = rng.integers(0, 101, k)
        return [f"[status] phase={a} pct={b}%" for a, b in zip(ph, p)]
    if rule == "R07_sys_prompt":
        nm = rng.choice(AGENT_NAMES, k)
        sess = rng.integers(0, 2**32, k, dtype=np.uint64)
        return [f"You are {n}. Session {s:08x}." for n, s in zip(nm, sess)]
    if rule == "R08_user_cmd":
        cmd = rng.choice(COMMANDS, k)
        has_args = rng.random(k) < 0.6
        w1 = rng.choice(VOCAB, k)
        w2 = rng.choice(VOCAB, k)
        return [f"/{c} {a} {b}" if h else f"/{c}" for c, h, a, b in zip(cmd, has_args, w1, w2)]
    if rule in ("R09_user_msg", "R10_assist_msg"):
        lens = rng.integers(3, 21, k)
        flat = rng.choice(VOCAB, int(lens.sum()))
        out, pos = [], 0
        for n in lens:
            out.append(" ".join(flat[pos:pos + n]))
            pos += n
        return out
    if rule == "R99_default":  # noise
        return list(rng.choice(NOISE, k))
    raise ValueError(rule)


def generate_corpus(sf: float, out_dir: str | Path, partitions: int = 8,
                    with_expected: bool = True, seed: int | None = None) -> dict:
    """Generate the corpus; returns analytic metadata (per-rule counts etc.).

    Deterministic for a given (sf, partitions): seed = 42 + int(sf*1000)
    unless overridden. Writes ``part-{p:02d}.parquet`` per partition, a
    ``_expected/`` sidecar, and ``_meta.json`` with the analytic counts.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    seed = (42 + int(sf * 1000)) if seed is None else seed
    rng = np.random.default_rng(seed)

    n_convs = max(1, int(sf * 100_000))
    raw = rng.lognormal(mean=2.0, sigma=0.6, size=n_convs)
    turns = np.clip(raw.astype(np.int64), 2, 200)
    hot = rng.random(n_convs) < HOT_P
    turns = np.where(hot, np.minimum(turns * HOT_FACTOR, 10_000), turns)
    jitter_s = rng.integers(1, 31, n_convs)

    # role sequences (per-conversation state machine)
    conv_ids: list[str] = [f"c{i:08d}" for i in range(n_convs)]
    all_conv_idx = np.empty(int(turns.sum()), dtype=np.int64)
    all_turn_idx = np.empty(int(turns.sum()), dtype=np.int32)
    all_roles: list[str] = []
    pos = 0
    draws = rng.random(4096)  # shared decision stream, offset per conv for determinism
    for i in range(n_convs):
        n = int(turns[i])
        seq = _role_sequence(n, draws[(i * 7) % 2048:] if n > 1 else draws)
        all_conv_idx[pos:pos + n] = i
        all_turn_idx[pos:pos + n] = np.arange(n, dtype=np.int32)
        all_roles.extend(seq)
        pos += n
    total = pos
    roles = np.asarray(all_roles, dtype=object)

    # template choice per row (within-role weights), then noise override
    expected = np.empty(total, dtype=object)
    for role, templates in ROLE_TEMPLATES.items():
        m = roles == role
        k = int(m.sum())
        if k == 0:
            continue
        names = [t for t, _ in templates]
        w = np.asarray([p for _, p in templates])
        expected[m] = rng.choice(names, size=k, p=w / w.sum())
    noise = rng.random(total) < NOISE_P
    expected[noise] = "R99_default"

    # tool column: tool-role turns and R01 tool calls carry a tool name
    tool_col = np.full(total, "", dtype=object)
    needs_tool = (roles == "tool") | (expected == "R01_tool_call")
    tool_col[needs_tool] = rng.choice(TOOLS, int(needs_tool.sum()))

    # text per rule template
    texts = np.empty(total, dtype=object)
    for rule in sorted(set(expected.tolist())):  # sorted: set order is not process-stable
        m = expected == rule
        texts[m] = _fill_texts(rule, int(m.sum()), rng, tool_col[m])
    # noise rows keep their role; tool-role noise rows won't parse -> R99 ✓

    # but: noise text may accidentally be parseable? NOISE templates are all
    # empty/multi-line/>400 chars -> fail every rule incl. catch-alls. The
    # one exception would be a role with no catch-all: already R99. Safe.

    ts = (BASE_TS_US
          + all_conv_idx * 60_000_000
          + all_turn_idx.astype(np.int64) * jitter_s[all_conv_idx] * 1_000_000)

    conv_col = np.asarray(conv_ids, dtype=object)[all_conv_idx]
    part = np.asarray([conv_partition(c, partitions) for c in conv_ids])[all_conv_idx]

    table = pa.table({
        "conv_id": pa.array(conv_col, pa.string()),
        "turn_idx": pa.array(all_turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tool_col, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    exp_arr = pa.array(expected, pa.string())

    if with_expected:
        (out_dir / "_expected").mkdir(exist_ok=True)
    for p in range(partitions):
        m = pa.array(part == p)
        sub = table.filter(m)
        pq.write_table(sub, out_dir / f"part-{p:02d}.parquet")
        if with_expected:
            side = pa.table({
                "conv_id": sub["conv_id"],
                "turn_idx": sub["turn_idx"],
                "expected_rule": exp_arr.filter(m),
            })
            pq.write_table(side, out_dir / "_expected" / f"part-{p:02d}.parquet")

    import collections
    rule_counts = dict(collections.Counter(expected.tolist()))
    _finish_meta(out_dir, sf, seed, partitions, n_convs, total, int(hot.sum()), rule_counts)
    return json.loads((out_dir / "_meta.json").read_text())


def _finish_meta(out_dir, sf, seed, partitions, n_convs, total, hot, rule_counts):
    meta = {
        "sf": sf, "seed": seed, "partitions": partitions,
        "n_convs": n_convs, "n_turns": int(total),
        "hot_convs": hot,
        "rule_counts": {k: int(v) for k, v in sorted(rule_counts.items())},
    }
    (out_dir / "_meta.json").write_text(json.dumps(meta, indent=2))


def replicate_corpus(base_dir: str | Path, out_dir: str | Path, rep: int) -> dict:
    """Scale a generated corpus ``rep``× by copying each partition file with
    remapped conversation ids (``c…`` → ``r{k}c…``). Text/role/tool streams
    repeat across replicas — fine for throughput benchmarks, which are
    regex-bound per row — while conv-level keys stay globally unique so
    grouped/salted aggregates see ``rep``× the key cardinality. Output keeps
    one parquet file per (replica, partition): partition-granular resume is
    exercised at rep× the manifest count. Analytic per-rule counts scale
    exactly by ``rep``."""
    import pyarrow.compute as pc

    base_dir, out_dir = Path(base_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    base_meta = json.loads((base_dir / "_meta.json").read_text())
    for f in sorted(base_dir.glob("part-*.parquet")):
        t = pq.read_table(f)
        for k in range(rep):
            conv = pc.binary_join_element_wise(
                pa.scalar(f"r{k:02d}", pa.string()), t["conv_id"].combine_chunks(), "")
            pq.write_table(t.set_column(t.schema.get_field_index("conv_id"), "conv_id", conv),
                           out_dir / f"part-r{k:02d}-{f.stem.split('-')[1]}.parquet")
    _finish_meta(out_dir, base_meta["sf"] * rep, base_meta["seed"],
                 base_meta["partitions"] * rep, base_meta["n_convs"] * rep,
                 base_meta["n_turns"] * rep, base_meta["hot_convs"] * rep,
                 {k: v * rep for k, v in base_meta["rule_counts"].items()})
    return json.loads((out_dir / "_meta.json").read_text())
