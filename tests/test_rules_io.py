"""Declarative ruleset round-trip (C10 extension surface): a rule table
serialized to JSON and loaded back must compile to an engine that produces
byte-identical parse output — the "author JSON, run the engine" contract."""

from __future__ import annotations

import datetime
import json

import pyarrow as pa
import pytest

from logray import rules_io
from logray.rules_transcripts import (TRANSCRIPT_PASSTHROUGH, TRANSCRIPT_RULES,
                                      transcript_ruleset)
from logray.ruleset import RuleSet

GOLDEN = __import__("pathlib").Path(__file__).parent / "golden.jsonl"


def _golden_table() -> pa.Table:
    cases = [json.loads(line) for line in GOLDEN.read_text().splitlines()
             if line.strip()]
    ts = datetime.datetime(2026, 1, 1)
    rows = [{"conv_id": "cg", "turn_idx": i, "role": c["role"],
             "text": c["text"], "tool": c["tool"], "ts": ts}
            for i, c in enumerate(cases)]
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    return pa.Table.from_pylist(rows, schema=schema)


def test_roundtrip_identity():
    text = rules_io.ruleset_to_json(TRANSCRIPT_RULES, TRANSCRIPT_PASSTHROUGH)
    rules, passthrough = rules_io.parse_ruleset_json(text)
    assert rules == TRANSCRIPT_RULES
    assert passthrough == TRANSCRIPT_PASSTHROUGH
    # and the re-serialization is stable (no lossy normalization)
    assert rules_io.ruleset_to_json(rules, passthrough) == text


def test_loaded_ruleset_parses_identically(tmp_path):
    p = tmp_path / "transcripts.rules.json"
    p.write_text(rules_io.ruleset_to_json(TRANSCRIPT_RULES, TRANSCRIPT_PASSTHROUGH))
    rs = rules_io.load_ruleset(p)
    want = transcript_ruleset().parse_batch(_golden_table())
    got = rs.parse_batch(_golden_table())
    assert got.schema == want.schema
    assert got.sort_by("turn_idx").equals(want.sort_by("turn_idx"))


def test_json_is_plain_data():
    doc = json.loads(rules_io.ruleset_to_json(TRANSCRIPT_RULES, TRANSCRIPT_PASSTHROUGH))
    assert doc["version"] == rules_io.FORMAT_VERSION
    assert all(isinstance(r, dict) for r in doc["rules"])
    # default rule still last (ordering is part of first-match-wins semantics)
    assert doc["rules"][-1]["rule_id"] == TRANSCRIPT_RULES[-1].rule_id


def test_user_authored_table_compiles(tmp_path):
    doc = {
        "version": 1,
        "passthrough": [["text", "string"], ["role", "string"]],
        "rules": [
            {"rule_id": "R1", "sink": "s_num", "gate": {"role": ["user"]},
             "patterns": ["^n=(?P<n>\\d+)$"],
             "casts": [{"src": "n", "converter": "int64"}]},
            {"rule_id": "R9", "sink": "s_rest",
             "consts": {"event_type": "unknown"}},
        ],
    }
    p = tmp_path / "user.rules.json"
    p.write_text(json.dumps(doc))
    rs = rules_io.load_ruleset(p)
    out = rs.parse_batch(pa.table({
        "text": pa.array(["n=41", "nope"]),
        "role": pa.array(["user", "user"]),
    })).sort_by("text")
    rows = out.to_pylist()
    assert rows[0]["rule_id"] == "R1" and rows[0]["n"] == 41
    assert rows[1]["rule_id"] == "R9" and rows[1]["event_type"] == "unknown"


def test_flagship_runs_custom_rule_table(ray_session, tmp_path_factory):
    """End-to-end C10: `run --rules user.json` semantics — the flagship DAG
    executes a user-authored declarative table (transcript envelope kept,
    different rules/sinks) and routes/aggregates by ITS sinks."""
    from logray.gen import generate_corpus
    from logray.pipelines.flagship import run_flagship

    in_dir = tmp_path_factory.mktemp("rcorpus")
    generate_corpus(0.002, in_dir)
    out = tmp_path_factory.mktemp("rout")

    doc = {
        "version": 1,
        "passthrough": [["conv_id", "string"], ["turn_idx", "int32"],
                        ["role", "string"], ["text", "string"],
                        ["tool", "string"], ["ts", "timestamp[us]"]],
        "rules": [
            {"rule_id": "U01_tool_line", "sink": "sink_tools",
             "patterns": ["^\\[tool:(?P<tname>[a-z_]+)\\]"],
             "casts": [{"src": "tname", "converter": "string"}],
             "consts": {"event_type": "any_tool_line"}},
            {"rule_id": "U99_rest", "sink": "sink_rest",
             "consts": {"event_type": "other"}},
        ],
    }
    metrics = run_flagship(in_dir, out, enrich_concurrency=2,
                           rules_json=json.dumps(doc))
    import pyarrow.parquet as pq

    rows_in = sum(pq.read_metadata(f).num_rows for f in in_dir.glob("*.parquet"))
    assert metrics["rows"] == rows_in, "routed-row parity under a custom table"
    sinks = {p.name.split("=", 1)[1]
             for p in out.glob("partition=*/sink=*") if p.is_dir()}
    assert sinks <= {"sink_tools", "sink_rest"} and "sink_tools" in sinks
    agg = pq.read_table(out / "_aggregates.parquet").to_pylist()
    assert {r["rule_id"] for r in agg} <= {"U01_tool_line", "U99_rest"}
    assert sum(r["n"] for r in agg) == rows_in


def test_bad_documents_rejected(tmp_path):
    ok = json.loads(rules_io.ruleset_to_json(TRANSCRIPT_RULES, TRANSCRIPT_PASSTHROUGH))

    bad_version = dict(ok, version=99)
    with pytest.raises(ValueError, match="version"):
        rules_io.parse_ruleset_json(json.dumps(bad_version))

    bad_type = dict(ok, passthrough=[["x", "decimal128(3,2)"]])
    with pytest.raises(ValueError, match="unknown passthrough type"):
        rules_io.parse_ruleset_json(json.dumps(bad_type))

    bad_key = dict(ok, rules=[dict(ok["rules"][0], regexes=["oops"])])
    with pytest.raises(ValueError, match="unknown keys"):
        rules_io.parse_ruleset_json(json.dumps(bad_key))

    # structural rules (e.g. trailing default) are RuleSet's job and still fire
    no_default = dict(ok, rules=ok["rules"][:-1])
    rules, passthrough = rules_io.parse_ruleset_json(json.dumps(no_default))
    with pytest.raises(ValueError, match="default"):
        RuleSet(rules, passthrough)


def test_fuzzed_tables_roundtrip_and_parse_identically():
    """Random (valid) rule tables: JSON round-trip must preserve the table
    exactly and the loaded engine must parse identically to the directly
    compiled one — the serialization layer can't change semantics."""
    import random

    from logray.ruleset import Cast, Rule, RuleSet

    rnd = random.Random(42)
    gates = ["user", "assistant", "tool", "system"]
    for trial in range(20):
        n = rnd.randint(1, 12)
        rules = []
        for i in range(n):
            has_gate = rnd.random() < 0.7
            has_num = rnd.random() < 0.5
            pat = (rf"^m{i:02d} a=(?P<a{i:02d}>\d+)$" if has_num
                   else rf"^m{i:02d} w=(?P<w{i:02d}>[a-z]+)$")
            rules.append(Rule(
                rule_id=f"F{i:02d}", sink=f"s{i % 3}",
                gate={"role": tuple(rnd.sample(gates, rnd.randint(1, 2)))}
                if has_gate else {},
                patterns=(pat,),
                casts=(Cast(f"a{i:02d}", "int64"),) if has_num else (),
                consts={"event_type": f"t{i % 4}"} if rnd.random() < 0.8 else {},
            ))
        rules.append(Rule(rule_id="F99", sink="s_def",
                          consts={"event_type": "unknown"}))
        passthrough = [("role", pa.string()), ("text", pa.string())]
        text = rules_io.ruleset_to_json(rules, passthrough)
        r2, p2 = rules_io.parse_ruleset_json(text)
        assert r2 == rules and p2 == passthrough, f"trial {trial}"

        batch = pa.table({
            "role": pa.array([gates[j % 4] for j in range(80)]),
            "text": pa.array(
                [f"m{rnd.randint(0, n + 1):02d} a={j}" if j % 3 == 0 else
                 f"m{rnd.randint(0, n + 1):02d} w=abc" if j % 3 == 1 else
                 f"junk {j}" for j in range(80)]),
        })
        direct = RuleSet(rules, passthrough).parse_batch(batch)
        loaded = RuleSet(r2, p2).parse_batch(batch)
        assert direct.schema == loaded.schema, f"trial {trial}"
        assert direct.equals(loaded), f"trial {trial}"
        assert direct.num_rows == 80  # never drops rows


def test_grok_expansion_named_and_anonymous():
    from logray.functions.grok import GROK_PATTERNS, grok_expand

    got = grok_expand(r"^%{IP:src} -> %{IP}$")
    assert got == (f"^(?P<src>{GROK_PATTERNS['IP']}) -> "
                   f"(?:{GROK_PATTERNS['IP']})$")
    with pytest.raises(ValueError, match="unknown grok"):
        grok_expand("%{NOPE:x}")
    # user library overrides + recursive references
    lib = {"PAIR": r"%{INT}:%{INT}", "INT": r"\d+"}
    assert grok_expand("%{PAIR:p}", lib) == r"(?P<p>(?:\d+):(?:\d+))"
    with pytest.raises(ValueError, match="converge"):
        grok_expand("%{LOOP}", {"LOOP": "%{LOOP}"})


def test_grok_rule_table_end_to_end(tmp_path):
    doc = {
        "version": 1,
        "passthrough": [["text", "string"], ["role", "string"]],
        "grok_patterns": {"REQID": "req-[0-9a-f]{4}"},
        "rules": [
            {"rule_id": "G1", "sink": "s_conn",
             "patterns": ["^%{LOGLEVEL:level} conn from %{IP:src_ip} "
                          "id=%{REQID:req} took %{NUMBER:ms}ms$"],
             "casts": [{"src": "ms", "converter": "float64"}]},
            {"rule_id": "G9", "sink": "s_rest",
             "consts": {"event_type": "unknown"}},
        ],
    }
    p = tmp_path / "grok.rules.json"
    p.write_text(json.dumps(doc))
    rs = rules_io.load_ruleset(p)
    out = rs.parse_batch(pa.table({
        "text": pa.array(["INFO conn from 10.1.2.3 id=req-00af took 12.5ms",
                          "not a log line"]),
        "role": pa.array(["tool", "tool"]),
    })).sort_by("text")
    rows = {r["rule_id"]: r for r in out.to_pylist()}
    g = rows["G1"]
    assert (g["level"], g["src_ip"], g["req"], g["ms"]) == \
        ("INFO", "10.1.2.3", "req-00af", 12.5)
    assert rows["G9"]["event_type"] == "unknown"


# ---- declarative relational front-end (C10, round 4) ----------------


def test_dsl_plans_match_handwritten_queries(ray_session):
    """Every registered declarative plan computes the same result as
    its hand-written twin (same rows, same values, order-insensitive)."""
    import pandas as pd
    import pyarrow as pa

    from logray.pipelines.queries import QUERIES
    from logray.query_dsl import PLANS, execute

    sf = "/root/testdata/sf0.001"

    def norm(res) -> pd.DataFrame:
        df = (res if isinstance(res, pd.DataFrame)
              else res.to_pandas())
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name, plan in PLANS.items():
        a = norm(execute(plan, sf))
        b = norm(QUERIES[name](sf))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      rtol=1e-9, atol=1e-9), name


def test_dsl_expression_compiler():
    import pyarrow as pa

    from logray.query_dsl import compile_expr

    t = pa.table({"x": [1.0, 2.0, 3.0], "y": [10.0, 20.0, 30.0]})
    e = compile_expr({"add": [{"mul": [{"col": "x"}, {"lit": 2.0}]},
                              {"col": "y"}]})
    assert e(t).to_pylist() == [12.0, 24.0, 36.0]
    f = compile_expr({"and": [{"gt": [{"col": "x"}, {"lit": 1.5}]},
                              {"lt": [{"col": "y"}, {"lit": 30.0}]}]})
    assert f(t).to_pylist() == [False, True, False]
    c = compile_expr({"cents": [{"col": "x"}, 100]})
    assert c(t).to_pylist() == [100, 200, 300]
    iv = compile_expr({"isin": [{"col": "x"}, [1.0, 3.0]]})
    assert iv(t).to_pylist() == [True, False, True]
    import pytest

    with pytest.raises(ValueError):
        compile_expr({"nope": []})


def test_dsl_plan_json_roundtrip_and_cli(ray_session, tmp_path,
                                         capsys):
    """Plans serialize to JSON documents and run through the CLI verb."""
    import json

    from logray.query_dsl import PLANS

    plan_file = tmp_path / "plan.json"
    plan_file.write_text(json.dumps(PLANS["grouped_count_events"]))
    from logray.__main__ import main

    rc = main(["query-plan", str(plan_file), "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "event_type" in out and "n" in out


def test_dsl_broadcast_outer_join_rejected(ray_session):
    """A per-batch broadcast OUTER join would re-emit unmatched right
    rows once per batch — the compiler must reject it (hash strategy
    expresses it correctly)."""
    import pytest

    from logray.query_dsl import execute

    plan = {"from": {"table": "customer", "columns": ["c_custkey"]},
            "ops": [{"op": "join", "on": "c_custkey", "how": "outer",
                     "strategy": "broadcast",
                     "with": {"from": {"table": "customer",
                                       "columns": ["c_custkey"]}}}]}
    with pytest.raises(ValueError, match="broadcast join"):
        execute(plan, "/root/testdata/sf0.001")


def test_dsl_asof_dist_tolerance_matches_broadcast(ray_session):
    """The dist as-of strategy supports tolerance (r5 — the shared
    Arrow kernel gained it): same plan, both strategies, identical
    result."""
    import copy

    import pandas as pd

    from logray.query_dsl import PLANS, execute

    plan = copy.deepcopy(PLANS["asof_tolerance_purchase_click"])
    for step in plan["ops"]:
        if step["op"] == "asof":
            step["strategy"] = "dist"
    sf = "/root/testdata/sf0.001"

    def norm(res):
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        return (df[sorted(df.columns)]
                .sort_values(sorted(df.columns))
                .reset_index(drop=True))

    a = norm(execute(plan, sf))
    b = norm(execute(PLANS["asof_tolerance_purchase_click"], sf))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dsl_topk_must_be_final_step(ray_session):
    import pytest

    from logray.query_dsl import execute

    plan = {"from": {"table": "events", "columns": ["event_id", "ts"]},
            "ops": [{"op": "topk", "by": [["ts", False]], "k": 5},
                    {"op": "limit", "n": 3}]}
    with pytest.raises(ValueError, match="final step"):
        execute(plan, "/root/testdata/sf0.001")


def test_example_plan_files_match_registry_plans():
    """The shipped examples/ plan documents stay byte-equal (as JSON
    values) to their PLANS entries — drift would ship stale docs."""
    import json
    from pathlib import Path

    from logray.query_dsl import PLANS

    ex = Path(__file__).resolve().parents[1] / "examples"
    found = sorted(ex.glob("plan_*.json"))
    assert found, "examples/plan_*.json missing"
    for f in found:
        name = f.stem[len("plan_"):]
        assert json.loads(f.read_text()) == PLANS[name], name
