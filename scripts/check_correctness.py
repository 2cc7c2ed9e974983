"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare with oracle_sql() via DuckDB — row count,
column names, and order-insensitive value comparison (sorted columns,
sorted rows, float-tolerant equality).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"schema mismatch: ray={sorted(got.columns)} sql={sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"row count: ray={len(got)} sql={len(want)}")
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            ok = np.allclose(gv.astype(float), wv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = gv.astype(str).equals(wv.astype(str))
        if not ok:
            bad = (gv.astype(str) != wv.astype(str)) if gv.dtype.kind != "f" else ~np.isclose(
                gv.astype(float), wv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
            i = int(np.argmax(bad.to_numpy() if hasattr(bad, "to_numpy") else bad))
            problems.append(f"col {c}: first diff at row {i}: ray={gv.iloc[i]!r} sql={wv.iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not a.startswith("/")]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Recycle the Ray session periodically: a single local session
        # accumulates thousands of short-lived Datasets over a full sweep
        # and Ray 2.49's task manager can hit an internal race
        # ("Tried to complete task that was not pending",
        # task_manager.cc:930 — observed once at ~2 090 datasets /
        # ~240 queries; a second flavor, reference_count.cc:581
        # "submitted_task_ref_count > 0", aborted a sweep at query 179 —
        # ~79 queries into a recycled session). Fresh sessions every 50
        # queries keep each session's dataset churn below both observed
        # failure points; on an abort, re-run the remaining names (the
        # arg list) — completed results are unaffected.
        n_run += 1
        if n_run % 50 == 0:
            ray.shutdown()
            ray.init(address="local", num_cpus=8, include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
            DataContext.get_current().enable_progress_bars = False
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?   {name}: rows={len(got)} cols={sorted(got.columns)} "
                  f"[rows-only, {dt:.1f}s]")
            if len(got) == 0 and name != "noop":
                print(f"WARN  {name}: zero rows")
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL raised {ex}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK    {name}: rows={len(got)} ({dt:.1f}s)")
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
