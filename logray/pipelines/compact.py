"""Sink compaction — the small-files maintenance job (C1/B6 operations).

The fan-out writer emits one file per (batch, sink) slice, which is right
for streaming throughput but wrong to leave on disk at 100 TB: millions of
small parquet files tax metadata servers and downstream readers. This job
rewrites each committed (partition, sink)'s fragments into files of
~``target_bytes`` and commits the new file list through the SAME manifest
protocol the writer uses, so every intermediate state is safe:

- new merged files are written FIRST under uuid-fresh names — a crash
  before the manifest commit leaves them as unreferenced orphans
  (invisible to readers, removed by ``manifests.sweep_orphans``);
- the manifest replace is atomic (``os.replace`` locally; copy-PUT +
  delete via ``fsio.publish_replace`` on shared object storage), so
  readers always see either the old complete file set or the new one,
  never a mix;
- replaced fragments are deleted only AFTER the commit — a crash between
  commit and delete leaves old files as orphans, same sweep.

Partitions are independent: one Ray task each (a file-surgery job, not a
data transform — the documented raw-task carve-out), so compaction
parallelizes across the cluster and can run while new partitions are
still being ingested (it only touches committed manifests).
"""

from __future__ import annotations

import time
import uuid
from pathlib import Path

import pyarrow.parquet as pq

from ..state import fsio, manifests
from ..state.fsio import fspath


def _plan_bins(files: list[str], target_bytes: int) -> list[list[str]]:
    """Greedy size-ordered first-fit: group fragments into bins whose total
    on-disk size is ≤ target (one oversize file stays alone). Only bins
    with ≥2 files are rewritten."""
    sized = sorted(((fspath(f).size(), f) for f in files), reverse=True)
    bins: list[tuple[int, list[str]]] = []
    for size, f in sized:
        for i, (tot, members) in enumerate(bins):
            if tot + size <= target_bytes:
                bins[i] = (tot + size, members + [f])
                break
        else:
            bins.append((size, [f]))
    return [members for _, members in bins]


def compact_partition(out_dir: str, partition_id: str,
                      target_bytes: int = 128 * 1024 * 1024,
                      compression: str = "zstd") -> dict:
    """Compact one committed partition in place; returns stats. Safe to
    re-run (no-op once every sink is within the bin plan)."""
    m = manifests.load_manifest(out_dir, partition_id)
    if m is None:
        return {"partition": partition_id, "skipped": "uncommitted"}
    new_sink_files: dict[str, list[str]] = {}
    replaced: list[str] = []
    files_before = files_after = 0
    for sink, files in m.get("sink_files", {}).items():
        files_before += len(files)
        keep: list[str] = []
        for members in _plan_bins(files, target_bytes):
            if len(members) < 2:
                keep.extend(members)
                continue
            sink_dir = fspath(members[0]).parent
            out = sink_dir / f"part-{uuid.uuid4().hex}.parquet"
            # stream fragment-by-fragment: peak heap is ONE decompressed
            # fragment, not the whole decompressed bin (a 128 MB-compressed
            # bin of text is ~1 GB in memory). Same codec/stat settings as
            # the streaming writer (route.py). Fragments of one sink share
            # a schema by construction (fixed per-sink allowlist); a
            # mismatch (e.g. fragments from two pipeline versions) keeps
            # that fragment un-compacted rather than failing the job.
            ordered = sorted(members)
            schema = fsio.read_schema(ordered[0])
            mismatched = [f for f in ordered
                          if fsio.read_schema(f) != schema]
            group = [f for f in ordered if f not in set(mismatched)]
            if len(group) < 2:
                keep.extend(members)
                continue
            with pq.ParquetWriter(out.path, schema, filesystem=out.fs,
                                  compression=compression,
                                  use_dictionary=False,
                                  write_statistics=False) as w:
                for f in group:
                    w.write_table(fsio.read_table(f))
            keep.append(str(out))
            keep.extend(mismatched)
            replaced.extend(group)
        new_sink_files[sink] = sorted(keep)
        files_after += len(keep)
    if not replaced:
        return {"partition": partition_id, "files_before": files_before,
                "files_after": files_before, "rewritten": 0}
    m["sink_files"] = new_sink_files
    manifests.commit_manifest(out_dir, partition_id, m)  # atomic swap
    for f in replaced:  # only after commit: crash here -> orphans, swept
        fspath(f).unlink(missing_ok=True)
    return {"partition": partition_id, "files_before": files_before,
            "files_after": files_after, "rewritten": len(replaced)}


def compact(out_dir: str | Path, *, target_mb: int = 128,
            compression: str = "zstd") -> dict:
    """Compact every committed partition (one Ray task each when a Ray
    session exists; serial fallback otherwise). Returns rollup metrics."""
    t0 = time.time()
    # resolve once driver-side; the FsPath (filesystem included) ships
    # to compaction tasks by value — workers never resolve schemes
    out_dir = fspath(out_dir)
    pids = [m["partition_id"] for m in manifests.all_manifests(out_dir)]
    target = target_mb * 1024 * 1024
    results: list[dict]
    try:
        import ray

        have_ray = ray.is_initialized()
    except Exception:
        have_ray = False
    if have_ray and len(pids) > 1:
        import ray

        task = ray.remote(num_cpus=1)(compact_partition)
        results = ray.get([task.remote(out_dir, p, target, compression)
                           for p in pids])
    else:
        results = [compact_partition(out_dir, p, target, compression)
                   for p in pids]
    return {
        "partitions": len(pids),
        "files_before": sum(r.get("files_before", 0) for r in results),
        "files_after": sum(r.get("files_after", 0) for r in results),
        "rewritten": sum(r.get("rewritten", 0) for r in results),
        "elapsed_sec": round(time.time() - t0, 3),
    }
