"""Per-partition lineage manifests — the checkpoint/resume unit (M5).

The north rule requires: "resumable from checkpoint with per-partition
lineage + metrics" (BASELINE.json:14). Design (SURVEY.md §4.2):

- the unit of work is an **input partition** (a set of input files; the
  corpus is laid out one file per ``crc32(conv_id) % P``);
- sink files carry unique names per task attempt, so a retried write task
  never overwrites a live file — it produces a new file and the old one
  becomes an unreferenced orphan;
- the manifest is the **source of truth**: it lists exactly the sink files
  produced by the successful execution, plus lineage (input files, row
  counts, per-rule histogram) and parse/route metrics;
- commit is atomic: write ``_manifest.json.tmp`` then publish — local:
  ``os.replace``; shared object storage (``out_dir`` as a
  ``scheme://`` URI, see ``logray.state.fsio``): move, i.e. copy-PUT +
  delete, so readers see the old or the complete new manifest, never a
  partial write. Partition manifests are single-writer (the driver
  commits after the wave's blocks return), so last-writer-wins replace
  is the correct protocol here — OCC belongs to the versioned layer;
- resume = skip partitions whose manifest exists and validates; readers of
  sink output must go through ``manifest_files()`` (orphans are invisible);
  ``sweep_orphans`` deletes files not referenced by any manifest.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Iterable

from . import fsio
from .fsio import FsPath, fspath

MANIFEST_NAME = "_manifest.json"


def partition_dir(out_dir: str | Path | FsPath, partition_id: str) -> FsPath:
    return fspath(out_dir) / f"partition={partition_id}"


def commit_manifest(out_dir: str | Path | FsPath, partition_id: str,
                    payload: dict[str, Any]) -> FsPath:
    pdir = partition_dir(out_dir, partition_id)
    pdir.mkdirs()
    payload = dict(payload)
    payload["partition_id"] = partition_id
    payload["committed"] = True
    tmp = pdir / (MANIFEST_NAME + ".tmp")
    tmp.write_text(json.dumps(payload, indent=2, sort_keys=True))
    final = pdir / MANIFEST_NAME
    fsio.publish_replace(tmp, final)  # atomic commit
    return final


def load_manifest(out_dir: str | Path | FsPath,
                  partition_id: str) -> dict[str, Any] | None:
    p = partition_dir(out_dir, partition_id) / MANIFEST_NAME
    if not p.exists():
        return None
    try:
        m = json.loads(p.read_text())
    except json.JSONDecodeError:
        return None
    return m if m.get("committed") else None


def is_committed(out_dir: str | Path | FsPath, partition_id: str) -> bool:
    return load_manifest(out_dir, partition_id) is not None


def all_manifests(out_dir: str | Path | FsPath) -> list[dict[str, Any]]:
    out = []
    for pdir in fspath(out_dir).glob("partition=*"):
        p = pdir / MANIFEST_NAME
        if p.exists():
            try:
                m = json.loads(p.read_text())
            except json.JSONDecodeError:
                continue
            if m.get("committed"):
                out.append(m)
    return out


def manifest_files(out_dir: str | Path | FsPath,
                   sink: str | None = None) -> list[str]:
    """All committed sink files (absolute paths / URIs), optionally for
    one sink. Re-resolve with ``fsio.fspath`` / scan with
    ``fsio.read_parquet_dataset``."""
    files: list[str] = []
    for m in all_manifests(out_dir):
        for s, fs in m.get("sink_files", {}).items():
            if sink is None or s == sink:
                files.extend(fs)
    return files


def sweep_orphans(out_dir: str | Path | FsPath,
                  dry_run: bool = False) -> list[str]:
    """Delete parquet files under partition dirs that no manifest references
    (leftovers of failed/retried task attempts)."""
    referenced = set(manifest_files(out_dir))
    orphans: list[str] = []
    for pdir in fspath(out_dir).glob("partition=*"):
        if not (pdir / MANIFEST_NAME).exists():
            continue  # uncommitted partition: in-flight files are not orphans
        for f in pdir.glob("*.parquet", recursive=True):
            if str(f) not in referenced:
                orphans.append(str(f))
                if not dry_run:
                    f.unlink()
    return orphans


def uncommitted_partitions(out_dir: str | Path | FsPath,
                           partition_ids: Iterable[str]) -> list[str]:
    return [p for p in partition_ids if not is_committed(out_dir, p)]
