"""10× scale soak of the heaviest extended-tier ops (r5 verdict item 5).

Replicates the needed sf0.1 tables 10× with per-replica KEY OFFSETS
(ids stay unique; texts duplicate — the dedup-relevant regime) into a
scratch dir, then runs the four most expensive registry pipelines at
32 CPUs with driver peak-RSS tracking:

- ``triangle_counts_parts``        (graph: co-occurrence triangles)
- ``pagerank_customer_supplier``   (graph: iterative pagerank)
- ``dup_ngram_coverage_documents`` (rolling-hash n-gram coverage)
- ``minhash_dedup_documents``      (MinHash+LSH clustering)

The soak answers one question the sf0.1 bench cannot: does any of
these blow up superlinearly in wall time or DRIVER memory when the
input grows 10×? A flat driver RSS (the corpus never lands on the
driver) is the pass criterion; per-op wall times are recorded for the
superlinearity check against the 1× readings.

Usage: python scripts/soak_extended.py [rep] [sf_dir] [--ops a,b,c]
Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import json
import resource
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).parent.parent))

OFFSET_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(sf_dir: str, out_dir: Path, rep: int) -> None:
    """rep disjoint copies of each table: offset every key column by
    replica × (max+1) so ids never collide across replicas while the
    payload (texts, quantities) duplicates — graph queries see rep
    disjoint components, dedup sees a rep-times-duplicated corpus."""
    out_dir.mkdir(parents=True, exist_ok=True)
    for table, keys in OFFSET_COLS.items():
        t = pq.read_table(f"{sf_dir}/{table}.parquet")
        spans = {k: int(pa.compute.max(t[k]).as_py()) + 1 for k in keys}
        parts = []
        for r in range(rep):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in keys:
                    v = col.to_numpy(zero_copy_only=False)
                    col = pa.array(v + r * spans[name], col.type)
                cols[name] = col
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts),
                       out_dir / f"{table}.parquet")


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main() -> None:
    import ray

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rep = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    ops_arg = [a.split("=", 1)[1] for a in sys.argv[1:]
               if a.startswith("--ops=")]
    scratch = Path(tempfile.mkdtemp(prefix="logray-soak-"))
    try:
        t0 = time.perf_counter()
        replicate(sf_dir, scratch, rep)
        t_prep = time.perf_counter() - t0

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=32,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from logray.pipelines.queries import QUERIES

        names = (ops_arg[0].split(",") if ops_arg else
                 ["triangle_counts_parts", "pagerank_customer_supplier",
                  "dup_ngram_coverage_documents",
                  "minhash_dedup_documents"])
        out = {"rep": rep, "sf_dir": sf_dir, "prep_s": round(t_prep, 1),
               "rss_mb_baseline": round(rss_mb(), 1), "ops": {}}
        for name in names:
            t0 = time.perf_counter()
            res = QUERIES[name](str(scratch))
            import pandas as pd

            n = (len(res) if isinstance(res, (pd.DataFrame, pa.Table))
                 else res.count())  # ray Dataset
            out["ops"][name] = {
                "wall_s": round(time.perf_counter() - t0, 2),
                "rows": int(n),
                "rss_mb_after": round(rss_mb(), 1),
            }
        out["rss_mb_peak"] = round(rss_mb(), 1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    main()
