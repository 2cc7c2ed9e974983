"""Declarative query front-end over the operator catalogue (C10).

The rule tables already have a JSON DSL (``rules_io``); this module
gives the RELATIONAL side the same treatment: a pipeline is a JSON
object — one scan plus a list of operator steps — compiled onto the
same ``relational``/Dataset primitives the hand-written registry
queries use, so a declarative plan inherits their scale shape
(combiner aggregations, broadcast/hash join selection, top-k combine)
instead of inventing a new executor.

Plan shape::

    {"from": {"table": "events", "columns": ["event_type", "value"]},
     "ops": [
       {"op": "derive", "cols": {"cents": {"cents": [{"col": "value"}, 100]}}},
       {"op": "groupby", "keys": ["event_type"],
        "aggs": {"n": ["value", "count"], "s": ["cents", "sum"]}},
       {"op": "derive", "cols": {"s": {"uncents": [{"col": "s"}, 100]}}},
       {"op": "topk", "by": [["n", true]], "k": 10}]}

Expressions are structured JSON (no eval): ``{"col": name}``,
``{"lit": v}``, ``{"ts": "YYYY-MM-DD"}``, and operator nodes
``{"add"|"sub"|"mul"|"div"|"eq"|"ne"|"lt"|"le"|"gt"|"ge"|"and"|"or":
[e, e]}``, ``{"round": [e, ndigits]}``, ``{"cents": [e, scale]}``
(exact integer minor units), ``{"uncents": [e, scale]}``,
``{"not": e}``, ``{"isin": [e, [v, ...]]}``, ``{"coalesce": [e, e]}``,
``{"fill": [e, v]}`` (null AND NaN → v — the post-outer-join
null-fill), ``{"int": e}`` (cast to int64).

Steps: ``select``, ``rename``, ``filter`` (expr), ``derive`` (named
exprs), ``groupby`` (keys + aggs over the grouped_agg fns),
``having`` (post-aggregate filter — same compiled predicate as
``filter``, named for plans that read like SQL), ``sort``
(+ ``limit``), ``topk`` (combiner top-k → Table), ``distinct``,
``limit``, ``join`` (sub-plan right side; ``strategy`` broadcast —
right collected once, ``ray.put`` inside broadcast_join — or hash;
``how`` inner/left on broadcast, inner/left/outer on hash: a
per-batch broadcast OUTER would re-emit unmatched right rows once
per batch, so it's rejected at compile time), ``union`` (sub-plan
appended stream-wise, no shuffle — SQL UNION ALL; follow with
``distinct`` for UNION), ``asof`` (sub-plan right side; ``by`` key +
ordered ``on`` column, ``value_cols`` carried over, optional
``tolerance`` like "30m"; ``strategy`` broadcast — right collected
+ merge_asof per bucket — or dist — both sides co-partition in one
exchange via ``asof_join_dist``), ``semi``/``anti`` (sub-plan key
side, co-partitioned semi-join), ``window`` (lead / dense_rank /
ntile / percent_rank / running_sum / lag_gap / rolling_mean / topn /
session_count — the bucketed-shuffle window ops of ``ops.window``).

Entry points: ``execute(plan, sf_dir)`` and the CLI
``python -m logray query-plan <plan.json> <sf_dir>``. Every plan in
``PLANS`` is registered in the driver contract as ``dsl_<name>`` and
value-checked against the SAME DuckDB oracle as its hand-written
twin (``tests/test_rules_io.py`` asserts result equality too).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ops import relational

# ------------------------------------------------------------ expressions --

_BINOPS = {
    "add": pc.add, "sub": pc.subtract, "mul": pc.multiply,
    "div": pc.divide, "eq": pc.equal, "ne": pc.not_equal,
    "lt": pc.less, "le": pc.less_equal, "gt": pc.greater,
    "ge": pc.greater_equal, "and": pc.and_kleene, "or": pc.or_kleene,
}


def compile_expr(node: Any):
    """Compile a structured-JSON expression to ``table -> Array``."""
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"bad expression node: {node!r}")
    (kind, arg), = node.items()
    if kind == "col":
        return lambda t: t[arg]
    if kind == "lit":
        return lambda t: pa.scalar(arg)
    if kind == "ts":
        v = pa.scalar(np.datetime64(arg, "us"))
        return lambda t: v
    if kind == "not":
        sub = compile_expr(arg)
        return lambda t: pc.invert(sub(t))
    if kind == "isin":
        sub = compile_expr(arg[0])
        vals = pa.array(arg[1])
        return lambda t: pc.is_in(sub(t), value_set=vals)
    if kind == "round":
        sub = compile_expr(arg[0])
        nd = int(arg[1])
        return lambda t: pc.round(sub(t), ndigits=nd)
    if kind == "cents":
        sub = compile_expr(arg[0])
        scale = float(arg[1])
        return lambda t: pc.cast(
            pc.round(pc.multiply(sub(t), scale)), pa.int64())
    if kind == "uncents":
        sub = compile_expr(arg[0])
        scale = float(arg[1])
        return lambda t: pc.round(
            pc.divide(pc.cast(sub(t), pa.float64()), scale),
            ndigits=max(0, int(round(np.log10(scale)))))
    if kind == "coalesce":
        a, b = compile_expr(arg[0]), compile_expr(arg[1])
        return lambda t: pc.coalesce(a(t), b(t))
    if kind == "fill":
        sub = compile_expr(arg[0])
        v = arg[1]

        def fill(t):
            x = sub(t)
            x = pc.fill_null(x, v)
            if pa.types.is_floating(x.type):
                x = pc.if_else(pc.is_nan(x), pa.scalar(float(v)), x)
            return x

        return fill
    if kind == "int":
        sub = compile_expr(arg)
        return lambda t: pc.cast(sub(t), pa.int64())
    if kind == "float":
        sub = compile_expr(arg)
        return lambda t: pc.cast(sub(t), pa.float64())
    if kind in _BINOPS:
        a, b = compile_expr(arg[0]), compile_expr(arg[1])
        fn = _BINOPS[kind]
        return lambda t: fn(a(t), b(t))
    raise ValueError(f"unknown expression op {kind!r}")


# ------------------------------------------------------------------ steps --

def _apply_filter(ds, expr):
    f = compile_expr(expr)
    return ds.map_batches(lambda t: t.filter(f(t)),
                          batch_format="pyarrow")


def _apply_derive(ds, cols: dict):
    fns = {name: compile_expr(e) for name, e in cols.items()}

    def add(t: pa.Table) -> pa.Table:
        for name, f in fns.items():
            v = f(t)
            if isinstance(v, pa.Scalar):
                v = pa.nulls(t.num_rows, v.type).fill_null(v)
            if name in t.column_names:
                t = t.set_column(t.schema.get_field_index(name), name, v)
            else:
                t = t.append_column(name, v)
        return t

    return ds.map_batches(add, batch_format="pyarrow")


def execute(plan: dict | str, sf_dir: str):
    """Run a declarative plan against the sf tables; returns a Dataset
    or (after ``topk``) a pyarrow Table."""
    if isinstance(plan, str):
        plan = json.loads(plan)
    import ray.data

    src = plan["from"]
    ds = ray.data.read_parquet(f"{sf_dir}/{src['table']}.parquet",
                               columns=src.get("columns"))
    for step in plan.get("ops", []):
        op = step["op"]
        if op == "select":
            cols = step["cols"]
            ds = ds.map_batches(lambda t, c=cols: t.select(c),
                                batch_format="pyarrow")
        elif op == "rename":
            m = step["cols"]
            ds = ds.map_batches(
                lambda t, m=m: t.rename_columns(
                    [m.get(c, c) for c in t.column_names]),
                batch_format="pyarrow")
        elif op in ("filter", "having"):
            ds = _apply_filter(ds, step["expr"])
        elif op == "derive":
            ds = _apply_derive(ds, step["cols"])
        elif op == "groupby":
            aggs = {out: (col, fn)
                    for out, (col, fn) in step["aggs"].items()}
            ds = relational.grouped_agg(ds, step["keys"], aggs)
        elif op == "distinct":
            ds = relational.distinct(ds, step["cols"])
        elif op == "sort":
            by = [b[0] for b in step["by"]]
            desc = [bool(b[1]) for b in step["by"]]
            ds = ds.sort(by, descending=desc)
            if "limit" in step:
                ds = ds.limit(int(step["limit"]))
        elif op == "limit":
            ds = ds.limit(int(step["n"]))
        elif op == "topk":
            if step is not plan["ops"][-1]:
                raise ValueError("'topk' must be the final step (it "
                                 "materializes the combiner result)")
            by = [(b[0], bool(b[1])) for b in step["by"]]
            return pa.Table.from_pandas(
                relational.topk(ds, by, int(step["k"])),
                preserve_index=False)
        elif op == "join":
            right = execute(step["with"], sf_dir)
            how = step.get("how", "inner")
            if step.get("strategy", "broadcast") == "broadcast":
                if how not in ("inner", "left"):
                    raise ValueError(
                        f"broadcast join cannot express how={how!r}: a "
                        f"per-batch merge would re-emit unmatched right "
                        f"rows once per batch — use strategy 'hash'")
                small = (right.to_pandas()
                         if not isinstance(right, pa.Table)
                         else right.to_pandas())
                ds = relational.broadcast_join(ds, small, on=step["on"],
                                               how=how)
            else:
                ds = relational.hash_join(ds, right, on=step["on"],
                                          how=how)
        elif op == "union":
            right = execute(step["with"], sf_dir)
            if isinstance(right, pa.Table):
                import ray.data

                right = ray.data.from_arrow(right)
            ds = ds.union(right)
        elif op == "asof":
            import pandas as pd

            from .ops import window as W

            right = execute(step["with"], sf_dir)
            tol = (pd.Timedelta(step["tolerance"])
                   if "tolerance" in step else None)
            kw = dict(by=step["by"], on=step["on"],
                      value_cols=step["value_cols"],
                      direction=step.get("direction", "backward"))
            if step.get("strategy", "broadcast") == "broadcast":
                small = (right.to_pandas() if not isinstance(
                    right, pa.Table) else right.to_pandas())
                ds = W.asof_join(ds, small, tolerance=tol, **kw)
            else:
                ds = W.asof_join_dist(ds, right, tolerance=tol, **kw)
        elif op == "window":
            from .ops import window as W

            fn = step["fn"]
            if fn == "lead":
                ds = W.lead_col(ds, step["part"], step["order"],
                                step["col"],
                                out_col=step.get("out", "next_value"))
            elif fn == "dense_rank":
                ds = W.dense_rank(ds, step["part"], step["col"],
                                  descending=bool(step.get(
                                      "descending", True)),
                                  rank_col=step.get("out", "rnk"))
            elif fn == "ntile":
                ds = W.ntile(ds, step["part"],
                             [(c, bool(d)) for c, d in step["order"]],
                             int(step["k"]),
                             out_col=step.get("out", "tile"))
            elif fn == "percent_rank":
                ds = W.percent_rank(ds, step["part"], step["col"],
                                    descending=bool(step.get(
                                        "descending", False)),
                                    out_col=step.get("out", "pct_rank"))
            elif fn == "running_sum":
                ds = W.running_sum(ds, step["part"], step["order"],
                                   step["col"],
                                   out_col=step.get("out", "running"))
            elif fn == "lag_gap":
                ds = W.lag_gap(ds, step["part"], step["ts"],
                               step["order"],
                               out_col=step.get("out", "gap_s"))
            elif fn == "rolling_mean":
                ds = W.rolling_mean(ds, step["part"], step["order"],
                                    step["col"], int(step["window"]),
                                    out_col=step.get("out",
                                                     "rolling_mean"))
            elif fn == "topn":
                ds = W.grouped_topn(ds, step["part"],
                                    [(c, bool(d))
                                     for c, d in step["order"]],
                                    int(step["n"]),
                                    rank_col=step.get("out", "rn"))
            elif fn == "session_count":
                ds = W.session_counts(ds, step["part"], step["ts"],
                                      float(step["gap_s"]),
                                      out_col=step.get("out",
                                                       "n_sessions"))
            else:
                raise ValueError(f"unknown window fn {fn!r}")
        elif op in ("semi", "anti"):
            right = execute(step["with"], sf_dir)
            ds = relational.hash_semi_join(ds, right, step["on"],
                                           anti=(op == "anti"))
        else:
            raise ValueError(f"unknown step op {op!r}")
    return ds


# --------------------------------------------- registered example plans --
# Each re-expresses an existing registry query; the driver checks it
# against the SAME DuckDB oracle (oracles.py aliases dsl_<name>).

PLANS: dict[str, dict] = {
    "grouped_count_events": {
        "from": {"table": "events", "columns": ["event_type", "event_id"]},
        "ops": [
            {"op": "groupby", "keys": ["event_type"],
             "aggs": {"n": ["event_id", "count"]}},
        ],
    },
    "grouped_agg_events": {
        "from": {"table": "events", "columns": ["event_type", "value"]},
        "ops": [
            {"op": "derive", "cols": {
                "__cents": {"cents": [{"col": "value"}, 100]}}},
            {"op": "groupby", "keys": ["event_type"],
             "aggs": {"sum_value": ["__cents", "sum"],
                      "avg_value": ["value", "mean"],
                      "n": ["value", "count"]}},
            {"op": "derive", "cols": {
                "sum_value": {"uncents": [{"col": "sum_value"}, 100]},
                "avg_value": {"round": [{"col": "avg_value"}, 6]}}},
        ],
    },
    "sort_limit_events": {
        "from": {"table": "events", "columns": ["event_id", "ts"]},
        "ops": [
            {"op": "topk", "by": [["ts", False], ["event_id", False]],
             "k": 20},
        ],
    },
    "topk_users_by_value": {
        "from": {"table": "events", "columns": ["user_id", "value"]},
        "ops": [
            {"op": "derive", "cols": {
                "__cents": {"cents": [{"col": "value"}, 100]}}},
            {"op": "groupby", "keys": ["user_id"],
             "aggs": {"total_value": ["__cents", "sum"]}},
            {"op": "derive", "cols": {
                "total_value": {"uncents": [{"col": "total_value"}, 100]}}},
            {"op": "topk", "by": [["total_value", True],
                                  ["user_id", False]], "k": 10},
        ],
    },
    "distinct_event_types": {
        "from": {"table": "events", "columns": ["event_type"]},
        "ops": [{"op": "distinct", "cols": ["event_type"]}],
    },
    "customers_without_big_orders": {
        "from": {"table": "customer", "columns": ["c_custkey"]},
        "ops": [
            {"op": "anti", "on": "c_custkey", "with": {
                "from": {"table": "orders",
                         "columns": ["o_custkey", "o_totalprice"]},
                "ops": [
                    {"op": "filter", "expr": {
                        "gt": [{"col": "o_totalprice"}, {"lit": 350000.0}]}},
                    {"op": "select", "cols": ["o_custkey"]},
                    {"op": "rename", "cols": {"o_custkey": "c_custkey"}},
                    {"op": "distinct", "cols": ["c_custkey"]},
                ]}},
        ],
    },
    "join_customer_nation_region": {
        "from": {"table": "customer",
                 "columns": ["c_custkey", "c_nationkey", "c_acctbal"]},
        "ops": [
            {"op": "join", "on": "c_nationkey", "strategy": "broadcast",
             "with": {
                 "from": {"table": "nation",
                          "columns": ["n_nationkey", "n_name",
                                      "n_regionkey"]},
                 "ops": [
                     {"op": "join", "on": "n_regionkey",
                      "strategy": "broadcast", "with": {
                          "from": {"table": "region",
                                   "columns": ["r_regionkey", "r_name"]},
                          "ops": [{"op": "rename",
                                   "cols": {"r_regionkey": "n_regionkey"}}],
                      }},
                     {"op": "select", "cols": ["n_nationkey", "r_name"]},
                     {"op": "rename",
                      "cols": {"n_nationkey": "c_nationkey"}},
                 ]}},
            {"op": "derive", "cols": {
                "__cents": {"cents": [{"col": "c_acctbal"}, 100]}}},
            {"op": "groupby", "keys": ["r_name"],
             "aggs": {"n_cust": ["c_custkey", "count"],
                      "sum_bal": ["__cents", "sum"]}},
            {"op": "derive", "cols": {
                "sum_bal": {"uncents": [{"col": "sum_bal"}, 100]}}},
        ],
    },
    "lead_value_events": {
        "from": {"table": "events",
                 "columns": ["event_id", "user_id", "ts", "value"]},
        "ops": [
            {"op": "window", "fn": "lead", "part": "user_id",
             "order": ["ts", "event_id"], "col": "value",
             "out": "next_value"},
            {"op": "derive", "cols": {
                "next_value": {"round": [{"col": "next_value"}, 2]}}},
            {"op": "select", "cols": ["event_id", "next_value"]},
        ],
    },
    "ntile_value_quartiles": {
        "from": {"table": "events",
                 "columns": ["event_id", "event_type", "value"]},
        "ops": [
            {"op": "window", "fn": "ntile", "part": "event_type",
             "order": [["value", False], ["event_id", False]], "k": 4,
             "out": "tile"},
            {"op": "select", "cols": ["event_id", "tile"]},
        ],
    },
    "pricing_summary_lineitem": {
        "from": {"table": "lineitem",
                 "columns": ["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount",
                             "l_shipdate"]},
        "ops": [
            {"op": "filter", "expr": {
                "le": [{"col": "l_shipdate"}, {"ts": "1998-09-02"}]}},
            {"op": "derive", "cols": {
                "disc_price": {"mul": [
                    {"col": "l_extendedprice"},
                    {"sub": [{"lit": 1.0}, {"col": "l_discount"}]}]},
            }},
            {"op": "derive", "cols": {
                "__qty_c": {"cents": [{"col": "l_quantity"}, 100]},
                "__base_c": {"cents": [{"col": "l_extendedprice"}, 100]},
                "__disc_c": {"cents": [{"col": "disc_price"}, 10000]},
            }},
            {"op": "groupby", "keys": ["l_returnflag", "l_linestatus"],
             "aggs": {"sum_qty": ["__qty_c", "sum"],
                      "sum_base_price": ["__base_c", "sum"],
                      "sum_disc_price": ["__disc_c", "sum"],
                      "avg_qty": ["l_quantity", "mean"],
                      "avg_price": ["l_extendedprice", "mean"],
                      "n": ["l_quantity", "count"]}},
            {"op": "derive", "cols": {
                "sum_qty": {"uncents": [{"col": "sum_qty"}, 100]},
                "sum_base_price": {"uncents": [{"col": "sum_base_price"},
                                               100]},
                "sum_disc_price": {"uncents": [{"col": "sum_disc_price"},
                                               10000]},
                "avg_qty": {"round": [{"col": "avg_qty"}, 6]},
                "avg_price": {"round": [{"col": "avg_price"}, 6]}}},
        ],
    },
    # ---- r5 additions: union / outer+left join / having / as-of ----
    "union_purchases_errors": {
        "from": {"table": "events", "columns": ["event_id", "event_type"]},
        "ops": [
            {"op": "filter", "expr": {
                "eq": [{"col": "event_type"}, {"lit": "purchase"}]}},
            {"op": "union", "with": {
                "from": {"table": "events",
                         "columns": ["event_id", "event_type"]},
                "ops": [{"op": "filter", "expr": {
                    "eq": [{"col": "event_type"}, {"lit": "error"}]}}]}},
        ],
    },
    "union_distinct_users": {
        "from": {"table": "events", "columns": ["user_id", "event_type"]},
        "ops": [
            {"op": "filter", "expr": {
                "eq": [{"col": "event_type"}, {"lit": "purchase"}]}},
            {"op": "select", "cols": ["user_id"]},
            {"op": "union", "with": {
                "from": {"table": "events",
                         "columns": ["user_id", "event_type"]},
                "ops": [
                    {"op": "filter", "expr": {
                        "eq": [{"col": "event_type"}, {"lit": "error"}]}},
                    {"op": "select", "cols": ["user_id"]}]}},
            {"op": "distinct", "cols": ["user_id"]},
        ],
    },
    "purchase_error_outer_join": {
        "from": {"table": "events", "columns": ["user_id", "event_type"]},
        "ops": [
            {"op": "filter", "expr": {
                "eq": [{"col": "event_type"}, {"lit": "purchase"}]}},
            {"op": "groupby", "keys": ["user_id"],
             "aggs": {"n_purchase": ["user_id", "count"]}},
            {"op": "join", "on": "user_id", "how": "outer",
             "strategy": "hash", "with": {
                 "from": {"table": "events",
                          "columns": ["user_id", "event_type"]},
                 "ops": [
                     {"op": "filter", "expr": {
                         "eq": [{"col": "event_type"}, {"lit": "error"}]}},
                     {"op": "groupby", "keys": ["user_id"],
                      "aggs": {"n_error": ["user_id", "count"]}}]}},
        ],
    },
    "customer_order_counts": {
        "from": {"table": "customer", "columns": ["c_custkey"]},
        "ops": [
            {"op": "join", "on": "c_custkey", "how": "left",
             "strategy": "hash", "with": {
                 "from": {"table": "orders",
                          "columns": ["o_custkey", "o_orderkey"]},
                 "ops": [
                     {"op": "groupby", "keys": ["o_custkey"],
                      "aggs": {"n_orders": ["o_orderkey", "count"]}},
                     {"op": "rename",
                      "cols": {"o_custkey": "c_custkey"}}]}},
            {"op": "derive", "cols": {
                "n_orders": {"int": {"fill": [{"col": "n_orders"}, 0]}}}},
        ],
    },
    "q18_large_volume_customers": {
        "from": {"table": "orders",
                 "columns": ["o_orderkey", "o_custkey", "o_totalprice",
                             "o_orderdate"]},
        "ops": [
            # heavy-hitter orders are tiny BY CONSTRUCTION → broadcast
            {"op": "join", "on": "o_orderkey", "strategy": "broadcast",
             "with": {
                 "from": {"table": "lineitem",
                          "columns": ["l_orderkey", "l_quantity"]},
                 "ops": [
                     {"op": "derive", "cols": {
                         "__q": {"cents": [{"col": "l_quantity"}, 1]}}},
                     {"op": "rename",
                      "cols": {"l_orderkey": "o_orderkey"}},
                     {"op": "groupby", "keys": ["o_orderkey"],
                      "aggs": {"total_qty": ["__q", "sum"]}},
                     {"op": "having", "expr": {
                         "gt": [{"col": "total_qty"}, {"lit": 300}]}}]}},
            {"op": "join", "on": "o_custkey", "strategy": "broadcast",
             "with": {
                 "from": {"table": "customer",
                          "columns": ["c_custkey", "c_name"]},
                 "ops": [{"op": "rename",
                          "cols": {"c_custkey": "o_custkey"}}]}},
            {"op": "select", "cols": ["c_name", "o_custkey", "o_orderkey",
                                      "o_orderdate", "o_totalprice",
                                      "total_qty"]},
        ],
    },
    "asof_purchase_prior_click": {
        "from": {"table": "events",
                 "columns": ["event_id", "user_id", "ts", "event_type"]},
        "ops": [
            {"op": "filter", "expr": {
                "eq": [{"col": "event_type"}, {"lit": "purchase"}]}},
            {"op": "select", "cols": ["event_id", "user_id", "ts"]},
            {"op": "asof", "by": "user_id", "on": "ts",
             "value_cols": ["prior_click_value"], "with": {
                 "from": {"table": "events",
                          "columns": ["user_id", "ts", "event_type",
                                      "value"]},
                 "ops": [
                     {"op": "filter", "expr": {
                         "eq": [{"col": "event_type"}, {"lit": "click"}]}},
                     {"op": "groupby", "keys": ["user_id", "ts"],
                      "aggs": {"prior_click_value": ["value", "max"]}}]}},
            {"op": "derive", "cols": {
                "prior_click_value": {
                    "round": [{"col": "prior_click_value"}, 2]}}},
            {"op": "select", "cols": ["event_id", "prior_click_value"]},
        ],
    },
    "asof_tolerance_purchase_click": {
        "from": {"table": "events",
                 "columns": ["event_id", "user_id", "ts", "event_type"]},
        "ops": [
            {"op": "filter", "expr": {
                "eq": [{"col": "event_type"}, {"lit": "purchase"}]}},
            {"op": "select", "cols": ["event_id", "user_id", "ts"]},
            {"op": "asof", "by": "user_id", "on": "ts",
             "value_cols": ["prior_click_value"], "tolerance": "30m",
             "with": {
                 "from": {"table": "events",
                          "columns": ["user_id", "ts", "event_type",
                                      "value"]},
                 "ops": [
                     {"op": "filter", "expr": {
                         "eq": [{"col": "event_type"}, {"lit": "click"}]}},
                     {"op": "groupby", "keys": ["user_id", "ts"],
                      "aggs": {"prior_click_value": ["value", "max"]}}]}},
            {"op": "derive", "cols": {
                "prior_click_value": {
                    "round": [{"col": "prior_click_value"}, 2]}}},
            {"op": "select", "cols": ["event_id", "prior_click_value"]},
        ],
    },
    "asof_view_prior_purchase_dist": {
        "from": {"table": "events",
                 "columns": ["event_id", "user_id", "ts", "event_type"]},
        "ops": [
            {"op": "filter", "expr": {
                "eq": [{"col": "event_type"}, {"lit": "view"}]}},
            {"op": "select", "cols": ["event_id", "user_id", "ts"]},
            {"op": "asof", "by": "user_id", "on": "ts",
             "value_cols": ["prior_purchase_value"], "strategy": "dist",
             "with": {
                 "from": {"table": "events",
                          "columns": ["user_id", "ts", "event_type",
                                      "value"]},
                 "ops": [
                     {"op": "filter", "expr": {
                         "eq": [{"col": "event_type"},
                                {"lit": "purchase"}]}},
                     {"op": "groupby", "keys": ["user_id", "ts"],
                      "aggs": {"prior_purchase_value":
                               ["value", "max"]}}]}},
            {"op": "derive", "cols": {
                "prior_purchase_value": {
                    "round": [{"col": "prior_purchase_value"}, 2]}}},
            {"op": "select", "cols": ["event_id", "prior_purchase_value"]},
        ],
    },
    "lag_gap_events": {
        "from": {"table": "events",
                 "columns": ["user_id", "ts", "event_id"]},
        "ops": [
            {"op": "window", "fn": "lag_gap", "part": "user_id",
             "ts": "ts", "order": ["ts", "event_id"], "out": "gap_s"},
            {"op": "derive", "cols": {
                "gap_s": {"float": {"col": "gap_s"}}}},
            {"op": "select", "cols": ["event_id", "gap_s"]},
        ],
    },
    "moving_avg_user_events": {
        "from": {"table": "events",
                 "columns": ["user_id", "ts", "event_id", "value"]},
        "ops": [
            {"op": "derive", "cols": {
                "__cents": {"cents": [{"col": "value"}, 100]}}},
            {"op": "select", "cols": ["user_id", "ts", "event_id",
                                      "__cents"]},
            {"op": "window", "fn": "rolling_mean", "part": "user_id",
             "order": ["ts", "event_id"], "col": "__cents",
             "window": 3, "out": "ma3"},
            {"op": "derive", "cols": {
                "ma3": {"round": [{"div": [{"float": {"col": "ma3"}},
                                           {"lit": 100.0}]}, 6]}}},
            {"op": "select", "cols": ["event_id", "ma3"]},
        ],
    },
    "top3_events_per_type": {
        "from": {"table": "events",
                 "columns": ["event_type", "event_id", "value"]},
        "ops": [
            {"op": "window", "fn": "topn", "part": "event_type",
             "order": [["value", True], ["event_id", False]], "n": 3,
             "out": "rn"},
        ],
    },
    "session_counts_events": {
        "from": {"table": "events", "columns": ["user_id", "ts"]},
        "ops": [
            {"op": "window", "fn": "session_count", "part": "user_id",
             "ts": "ts", "gap_s": 1800.0},
        ],
    },
}


def run_plan_json(text: str, sf_dir: str):
    """CLI body: execute a JSON plan document (string)."""
    return execute(json.loads(text), sf_dir)
