"""Flagship DAG (M1–M5): read → parse → enrich → route/fan-out → aggregate.

Ray-Data-native execution of the reference's parse loop at corpus scale
(SURVEY.md §3.2). One streaming pass per input partition:

    read_parquet(partition files)            # blocks = Arrow tables
      → map_batches(parse_batch_fn)          # stateless tasks, zero-copy
      → map_batches(Enricher, concurrency=N) # stateful actor pool
      → map_batches(SinkWriter)              # per-task multi-sink fan-out
      → driver collects tiny per-batch partials → manifest commit

The partition loop is the checkpoint/resume boundary: at 100 TB each
input partition is itself thousands of blocks, so per-partition Datasets
keep full intra-partition parallelism while giving partition-granular
resume (skip committed manifests). Aggregates are rolled up from the
partials recorded in manifests — the full parsed stream is never
re-shuffled or materialized for counting.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.enrich import Enricher
from ..stages.parse import parse_batch_fn
from ..stages.route import SinkWriter
from ..state import manifests


def discover_partitions(input_dir: str | Path) -> dict[str, list[str]]:
    """Input partitions: one per parquet file (the generator lays out one
    file per crc32(conv_id) % P). Directories starting with '_' (sidecars
    like _expected/) are ignored."""
    input_dir = Path(input_dir)
    parts: dict[str, list[str]] = {}
    for f in sorted(input_dir.glob("*.parquet")):
        parts[f.stem] = [str(f)]
    if not parts:
        raise FileNotFoundError(f"no parquet files in {input_dir}")
    return parts


def run_partition(files: list[str], out_dir: str, partition_id: str, *,
                  lookups_ref=None, enrich_concurrency=4, batch_size: int | None = None,
                  override_num_blocks: int | None = None) -> dict:
    """One streaming pass over one input partition; returns manifest payload."""
    import ray.data

    ds = ray.data.read_parquet(files, override_num_blocks=override_num_blocks)
    parsed = ds.map_batches(parse_batch_fn, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)
    enriched = parsed.map_batches(
        Enricher, fn_constructor_kwargs={"lookups_ref": lookups_ref},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=enrich_concurrency, batch_size=batch_size)
    writer = SinkWriter(out_dir, partition_id)
    summaries = enriched.map_batches(writer, batch_format="pyarrow", batch_size=batch_size)
    rows = summaries.take_all()  # tiny: one row per (sink, rule, batch-file)

    sink_files: dict[str, list[str]] = {}
    counts: dict[tuple[str, str], int] = {}
    errors = 0
    for r in rows:
        sink_files.setdefault(r["sink"], [])
        if r["file"] not in sink_files[r["sink"]]:
            sink_files[r["sink"]].append(r["file"])
        counts[(r["sink"], r["rule_id"])] = counts.get((r["sink"], r["rule_id"]), 0) + r["n"]
        errors += r["parse_errors"]
    total = sum(counts.values())
    unknown = sum(v for (s, _), v in counts.items() if s == "sink_unknown")
    payload = {
        "input_files": files,
        "sink_files": {k: sorted(v) for k, v in sorted(sink_files.items())},
        "rule_counts": {f"{s}|{r}": n for (s, r), n in sorted(counts.items())},
        "metrics": {
            "rows": total,
            "parse_errors": errors,
            "unknown_rows": unknown,
            "matched_pct": round(100.0 * (total - unknown) / total, 4) if total else 0.0,
        },
    }
    return payload


def run_flagship(input_dir: str | Path, out_dir: str | Path, *,
                 resume: bool = True, lookups_ref=None, enrich_concurrency=4,
                 batch_size: int | None = None, override_num_blocks: int | None = None) -> dict:
    """Run the full pipeline with partition-granular resume; returns metrics.

    Rollup artifacts written under ``out_dir``:
    - ``partition=*/sink=*/part-*.parquet`` — routed sinks
    - ``partition=*/_manifest.json``        — lineage + metrics per partition
    - ``_aggregates.parquet``               — per-(sink, rule_id) counts
    - ``_metrics.json``                     — global rollup
    """
    t0 = time.time()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    parts = discover_partitions(input_dir)
    ran, skipped = [], []
    for pid, files in parts.items():
        if resume and manifests.is_committed(out_dir, pid):
            skipped.append(pid)
            continue
        payload = run_partition(files, str(out_dir), pid, lookups_ref=lookups_ref,
                                enrich_concurrency=enrich_concurrency,
                                batch_size=batch_size,
                                override_num_blocks=override_num_blocks)
        manifests.commit_manifest(out_dir, pid, payload)
        ran.append(pid)

    # rollup from manifests (no second pass over data)
    agg: dict[tuple[str, str], int] = {}
    rows = errors = unknown = 0
    for m in manifests.all_manifests(out_dir):
        for k, n in m["rule_counts"].items():
            s, r = k.split("|", 1)
            agg[(s, r)] = agg.get((s, r), 0) + n
        rows += m["metrics"]["rows"]
        errors += m["metrics"]["parse_errors"]
        unknown += m["metrics"]["unknown_rows"]
    agg_table = pa.table({
        "sink": [k[0] for k in sorted(agg)],
        "rule_id": [k[1] for k in sorted(agg)],
        "n": [agg[k] for k in sorted(agg)],
    })
    pq.write_table(agg_table, out_dir / "_aggregates.parquet")
    metrics = {
        "rows": rows,
        "parse_errors": errors,
        "unknown_rows": unknown,
        "matched_pct": round(100.0 * (rows - unknown) / rows, 4) if rows else 0.0,
        "partitions_ran": ran,
        "partitions_skipped": skipped,
        "elapsed_sec": round(time.time() - t0, 3),
        "turns_per_sec": round(rows / max(time.time() - t0, 1e-9), 1) if ran else None,
    }
    (out_dir / "_metrics.json").write_text(json.dumps(metrics, indent=2))
    return metrics


def read_sink(out_dir: str | Path, sink: str):
    """Dataset over one routed sink, via manifests (orphan files invisible)."""
    import ray.data

    files = manifests.manifest_files(out_dir, sink)
    if not files:
        import pyarrow as _pa

        return ray.data.from_arrow(_pa.table({}))
    return ray.data.read_parquet(files)
