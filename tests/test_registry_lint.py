"""Registry hygiene lint (r5 verdict item 2): Python's last-wins
semantics turn a duplicate ``def`` / ``ORACLE_SQL[...]`` assignment /
registry dict key into ~60 lines of silently-dead code — an edit to
the shadowed first definition does nothing while the suite stays
green (the exact landmine the r4 ``benford_first_digit_events``
duplicate was). These lints make any recurrence a test failure."""

from __future__ import annotations

import ast
from collections import Counter
from pathlib import Path

QUERIES_SRC = (Path(__file__).resolve().parents[1]
               / "logray" / "pipelines" / "queries.py")
ORACLES_SRC = (Path(__file__).resolve().parents[1]
               / "logray" / "pipelines" / "oracles.py")


def test_no_duplicate_toplevel_defs_in_queries():
    tree = ast.parse(QUERIES_SRC.read_text())
    names = [n.name for n in tree.body
             if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
    dupes = [n for n, c in Counter(names).items() if c > 1]
    assert not dupes, f"shadowed top-level defs in queries.py: {dupes}"


def test_no_duplicate_oracle_sql_assignments():
    tree = ast.parse(ORACLES_SRC.read_text())
    keys = []
    for n in ast.walk(tree):
        if (isinstance(n, ast.Assign) and len(n.targets) == 1
                and isinstance(n.targets[0], ast.Subscript)
                and isinstance(n.targets[0].value, ast.Name)
                and n.targets[0].value.id == "ORACLE_SQL"
                and isinstance(n.targets[0].slice, ast.Constant)):
            keys.append(n.targets[0].slice.value)
    dupes = [k for k, c in Counter(keys).items() if c > 1]
    assert not dupes, f"repeated ORACLE_SQL assignments: {dupes}"


def test_no_duplicate_registry_dict_keys():
    tree = ast.parse(QUERIES_SRC.read_text())
    for n in tree.body:
        if (isinstance(n, ast.Assign) and len(n.targets) == 1
                and isinstance(n.targets[0], ast.Name)
                and n.targets[0].id == "QUERIES"
                and isinstance(n.value, ast.Dict)):
            keys = [k.value for k in n.value.keys
                    if isinstance(k, ast.Constant)]
            dupes = [k for k, c in Counter(keys).items() if c > 1]
            assert not dupes, f"duplicate QUERIES keys: {dupes}"
            break
    else:
        raise AssertionError("QUERIES dict literal not found")


def test_every_query_is_oracled_and_vice_versa():
    """The 100%-oracled invariant the registry closed in r4: every
    registered query has an oracle entry (SQL-exact or invariant) and
    every oracle names a registered query."""
    from logray.pipelines.oracles import ORACLE_SQL
    from logray.pipelines.queries import QUERIES

    missing = sorted(set(QUERIES) - set(ORACLE_SQL))
    stray = sorted(set(ORACLE_SQL) - set(QUERIES))
    assert not missing, f"queries without oracles: {missing[:10]}"
    assert not stray, f"oracles without queries: {stray[:10]}"
