"""Versioned table layer: snapshot isolation + time travel over parquet
(the Iceberg/Delta shape, manifest-list style).

Each commit writes its NEW data files under uuid-fresh names and then a
``v{N}.manifest.json`` listing the COMPLETE file set of that version —
unchanged files are carried by reference (copy-on-write), so a commit
costs only its delta in data bytes plus one O(files) manifest. The
manifest lands via write-tmp + atomic EXCLUSIVE hard-link, so a reader
can never observe a half-written version, a concurrent writer racing
for the same version number gets ``VersionConflict`` instead of a lost
update (plan-level staleness is caught by ``expected_parent``), and a
crashed commit leaves only orphan data files for ``vacuum`` to sweep.

Time travel: ``read(dir, version=K)`` is just "scan K's file list" —
no log replay; old versions stay readable until ``vacuum`` drops their
manifests and any data file no kept version references.

Scale: manifests carry file PATHS, never rows; ``read`` returns a lazy
``ray.data.read_parquet`` over the listed files, so a 100 TB version
streams like any other scan. Upserts rewrite only the files that hold
touched keys (callers partition accordingly); this module does not
bucket for you.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST_GLOB = "v*.manifest.json"


def _manifest_path(d: Path, version: int) -> Path:
    return d / f"v{version:06d}.manifest.json"


def versions(table_dir: str | Path) -> list[int]:
    d = Path(table_dir)
    out = []
    for p in sorted(d.glob(_MANIFEST_GLOB)):
        out.append(int(p.name[1:7]))
    return out


def _load(d: Path, version: int) -> dict:
    return json.loads(_manifest_path(d, version).read_text())


class VersionConflict(RuntimeError):
    """Another writer published this version first (optimistic
    concurrency): retry against the new latest version."""


def _publish(tmp: Path, target: Path) -> None:
    """Atomic EXCLUSIVE publish: hard-link tmp → target (fails with
    EEXIST when a concurrent writer won the race — plain rename would
    silently REPLACE their manifest, a lost update), then drop tmp."""
    import os

    try:
        os.link(tmp, target)
    except FileExistsError:
        tmp.unlink()
        raise VersionConflict(
            f"{target.name} was committed concurrently — rebase on the "
            f"new latest version and retry") from None
    tmp.unlink()


def commit(table_dir: str | Path, new_tables: list[pa.Table], *,
           carry_files: list[str] | None = None, op: str = "append",
           drop_files: list[str] | None = None,
           expected_parent: int | None = None) -> int:
    """Commit a new version: write ``new_tables`` as uuid-fresh parquet
    files, carry ``carry_files`` (default: ALL of the parent version's
    files minus ``drop_files``) by reference, and publish the manifest
    atomically. Returns the new version number (1-based; 1 = first).

    ``expected_parent``: optimistic-concurrency guard — pass the version
    this commit's plan (its carry/drop lists) was computed against;
    raises ``VersionConflict`` if another writer advanced the table in
    between (a blind append can omit it; anything derived from a
    snapshot, like MERGE INTO, must not). The publish itself is an
    exclusive hard-link, closing the remaining read-plan-publish window."""
    d = Path(table_dir)
    d.mkdir(parents=True, exist_ok=True)
    vs = versions(d)
    parent = vs[-1] if vs else 0
    if expected_parent is not None and parent != expected_parent:
        raise VersionConflict(
            f"planned against v{expected_parent} but latest is "
            f"v{parent} — rebase and retry")
    if carry_files is None:
        carried = list(_load(d, parent)["files"]) if parent else []
    else:
        carried = list(carry_files)
    if drop_files:
        dropped = set(drop_files)
        carried = [f for f in carried if f not in dropped]
    new_files = []
    for t in new_tables:
        if t.num_rows == 0:
            continue
        name = f"data-{uuid.uuid4().hex}.parquet"
        pq.write_table(t, d / name)
        new_files.append(name)
    version = parent + 1
    manifest = {"version": version, "parent": parent, "op": op,
                "files": sorted(carried + new_files),
                "added": sorted(new_files),
                "removed": sorted(drop_files or [])}
    if parent and op != "materialize-deletes":
        pm = _load(d, parent)
        if pm.get("deletes"):
            # deletion vectors are key-based and global: every child
            # version keeps hiding those keys until materialized
            manifest["deletes"] = pm["deletes"]
            manifest["delete_key"] = pm["delete_key"]
    tmp = d / f".v{version:06d}.tmp"
    tmp.write_text(json.dumps(manifest, indent=1))
    _publish(tmp, _manifest_path(d, version))
    return version


def read(table_dir: str | Path, version: int | None = None, *,
         columns: list[str] | None = None,
         key_range: tuple | None = None):
    """Lazy Dataset over one version's file list (time travel); the
    latest version when ``version`` is None. An empty version yields an
    empty Dataset.

    ``columns`` prunes at the scan. ``key_range=(lo, hi)`` (closed, on
    the stats key of a ``commit_with_stats`` table) skips every file
    whose recorded [min, max] misses the range BEFORE any scan task
    launches — manifest-level file skipping, the read-side half of the
    MERGE INTO stats; rows inside surviving files still need a filter
    (stats prune files, not rows)."""
    import ray.data

    d = Path(table_dir)
    vs = versions(d)
    if not vs:
        raise FileNotFoundError(f"no versions in {d}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    m = _load(d, v)
    names = m["files"]
    if key_range is not None:
        stats = m.get("stats")
        if stats is None:
            raise ValueError("key_range needs commit_with_stats "
                             "manifests")
        lo, hi = key_range
        names = [f for f in names
                 if stats[f][0] <= hi and stats[f][1] >= lo]
    files = [str(d / f) for f in names]
    if not files:
        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.read_parquet(files, columns=columns)
    dv = _dv_keys(d, m)
    if dv is not None:
        key, ks = dv
        if columns is None or key in columns:
            from ..ops.relational import semi_filter

            ds = semi_filter(ds, key, ks, keep=False)
        else:
            raise ValueError(
                f"column pruning dropped DV key {key!r}; include it or "
                f"materialize_deletes() first")
    return ds


def file_diff(table_dir: str | Path, v_from: int, v_to: int) -> dict:
    """File-level diff between two versions (what a sync/replication
    job ships): files added and removed going from ``v_from``→``v_to``."""
    d = Path(table_dir)
    a = set(_load(d, v_from)["files"])
    b = set(_load(d, v_to)["files"])
    return {"added": sorted(b - a), "removed": sorted(a - b)}


def vacuum(table_dir: str | Path, *, keep_last: int = 1,
           dry_run: bool = False) -> dict:
    """Drop all but the last ``keep_last`` versions and delete every
    data file no kept version references (plus crashed-commit tmp
    files). Kept versions remain fully readable."""
    d = Path(table_dir)
    vs = versions(d)
    keep = set(vs[-keep_last:]) if keep_last > 0 else set()
    referenced: set[str] = set()
    for v in keep:
        m = _load(d, v)
        referenced.update(m["files"])
        referenced.update(_dv_files(m))
    dropped_versions = [v for v in vs if v not in keep]
    orphans = [p.name for p in d.glob("data-*.parquet")
               if p.name not in referenced]
    orphans += [p.name for p in d.glob("dv-*.parquet")
                if p.name not in referenced]
    orphans += [p.name for p in d.glob(".v*.tmp")]
    if not dry_run:
        for v in dropped_versions:
            _manifest_path(d, v).unlink()
        for name in orphans:
            (d / name).unlink()
    return {"dropped_versions": dropped_versions,
            "deleted_files": sorted(orphans)}


def commit_with_stats(table_dir: str | Path, new_tables: list[pa.Table],
                      key: str, *, carry_files: list[str] | None = None,
                      op: str = "append",
                      drop_files: list[str] | None = None,
                      expected_parent: int | None = None) -> int:
    """``commit`` that also records per-file [min, max] of ``key`` in
    the manifest — the file-skipping statistic MERGE INTO prunes with.
    Carried files keep their recorded stats (copied from the parent
    manifest when present)."""
    d = Path(table_dir)
    d.mkdir(parents=True, exist_ok=True)
    vs = versions(d)
    parent = vs[-1] if vs else 0
    parent_stats = {}
    if parent:
        parent_stats = _load(d, parent).get("stats", {})
    version = commit(d, new_tables, carry_files=carry_files, op=op,
                     drop_files=drop_files,
                     expected_parent=expected_parent)
    m = _load(d, version)
    stats = {f: parent_stats[f] for f in m["files"] if f in parent_stats}
    for f in m["added"]:
        t = pq.read_table(d / f, columns=[key])
        col = t[key]
        stats[f] = [col.combine_chunks().to_numpy(
            zero_copy_only=False).min().item(),
            col.combine_chunks().to_numpy(
            zero_copy_only=False).max().item()]
    m["stats"] = stats
    tmp = d / f".v{version:06d}.tmp"
    tmp.write_text(json.dumps(m, indent=1))
    # same-writer update of the version it just created exclusively —
    # replace is safe here; only the INITIAL publish must be exclusive
    tmp.replace(_manifest_path(d, version))
    return version


def merge_into(table_dir: str | Path, changes: pa.Table, key: str) -> int:
    """MERGE INTO (upsert) producing a new version: rows in ``changes``
    REPLACE same-key rows, unmatched keys INSERT. Only files whose
    recorded [min, max] key range overlaps a changed key are rewritten
    — the manifest-stats file skipping that makes a 10-row merge into a
    10-file rewrite instead of a full-table rewrite; untouched files
    carry by reference, byte-identical. Changed keys outside every
    file's range land in one fresh insert file."""
    import numpy as np
    import pandas as pd

    d = Path(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    stats = m.get("stats")
    if stats is None:
        raise ValueError("merge_into needs commit_with_stats manifests")
    ck = np.unique(changes[key].combine_chunks().to_numpy(
        zero_copy_only=False))
    affected = [f for f in m["files"]
                if np.any((ck >= stats[f][0]) & (ck <= stats[f][1]))]
    cdf = changes.to_pandas().drop_duplicates(key, keep="last")
    matched_keys: set = set()
    rewritten = []
    for f in affected:
        t = pq.read_table(d / f)
        base = t.to_pandas()
        hit = base[key].isin(cdf[key])
        matched_keys.update(base.loc[hit, key])
        merged = base.loc[~hit]
        repl = cdf[cdf[key].isin(base.loc[hit, key])]
        out = pa.Table.from_pandas(pd.concat([merged, repl]),
                                   preserve_index=False).cast(t.schema)
        rewritten.append(out)
    inserts = cdf[~cdf[key].isin(matched_keys)]
    if len(inserts):
        rewritten.append(pa.Table.from_pandas(
            inserts, preserve_index=False).cast(changes.schema))
    # the rewrite plan was derived from v's manifest: any concurrent
    # advance invalidates it — expected_parent turns that into a
    # VersionConflict instead of a lost update
    version = commit_with_stats(d, rewritten, key, op="merge",
                                drop_files=affected, expected_parent=v)
    # a merged key is live again: subtract it from any deletion vector
    mm = _load(d, version)
    if _dv_files(mm) and mm.get("delete_key") == key:
        live = set(np.asarray(cdf[key]))
        new_dvs = []
        for f in _dv_files(mm):
            t = pq.read_table(d / f)
            col = t[key].combine_chunks().to_numpy(zero_copy_only=False)
            kept = t.filter(pa.array([c not in live for c in col]))
            if kept.num_rows:
                name = f"dv-{uuid.uuid4().hex}.parquet"
                pq.write_table(kept, d / name)
                new_dvs.append(name)
        if new_dvs:
            mm["deletes"] = sorted(new_dvs)
        else:
            mm.pop("deletes", None)
            mm.pop("delete_key", None)
        tmp = d / f".v{version:06d}.tmp"
        tmp.write_text(json.dumps(mm, indent=1))
        tmp.replace(_manifest_path(d, version))
    return version


def incremental_agg(table_dir: str | Path, v_from: int, v_to: int,
                    prev: dict, sum_cols: list[str]) -> dict:
    """Incremental view maintenance over the LAYOUT: roll an aggregate
    forward between versions by scanning ONLY the diffed files —
    agg(v_to) = agg(v_from) − Σ(removed files) + Σ(added files), exact
    for any commutative-invertible aggregate (count / sum here). A
    10-file merge updates a 100 TB table's totals by reading 10 files;
    equality with the full recompute is the pytest invariant."""
    d = Path(table_dir)
    diff = file_diff(d, v_from, v_to)
    out = dict(prev)

    def apply(files: list[str], sign: int) -> None:
        for f in files:
            t = pq.read_table(d / f, columns=sum_cols)
            out["n_rows"] = out.get("n_rows", 0) + sign * t.num_rows
            for c in sum_cols:
                import pyarrow.compute as _pc

                s = _pc.sum(t[c]).as_py() or 0
                out[f"sum_{c}"] = out.get(f"sum_{c}", 0) + sign * s

    apply(diff["removed"], -1)
    apply(diff["added"], +1)
    return out


def compact(table_dir: str | Path, *, target_rows: int = 1_000_000,
            key: str | None = None) -> int:
    """Small-file compaction as a NEW VERSION (the lakehouse OPTIMIZE):
    files under ``target_rows`` coalesce greedily into ≈target-sized
    replacements; files already at or above target carry by reference,
    byte-identical. History stays intact — the pre-compaction version
    remains time-travel-readable until ``vacuum`` — and the rewrite
    plan is guarded by ``expected_parent``, so a concurrent commit
    turns into a conflict, never a lost update. Pass ``key`` on a
    stats-carrying table to keep per-file [min,max] stats recorded."""
    d = Path(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    sizes = {f: pq.read_metadata(d / f).num_rows for f in m["files"]}
    small = [f for f in m["files"] if sizes[f] < target_rows]
    if len(small) < 2:
        return v  # nothing to do; no empty version published
    groups: list[list[str]] = [[]]
    acc = 0
    for f in small:
        if acc >= target_rows and groups[-1]:
            groups.append([])
            acc = 0
        groups[-1].append(f)
        acc += sizes[f]
    merged = [pa.concat_tables([pq.read_table(d / f) for f in g])
              for g in groups if g]
    if key is not None:
        return commit_with_stats(d, merged, key, op="compact",
                                 drop_files=small, expected_parent=v)
    return commit(d, merged, op="compact", drop_files=small,
                  expected_parent=v)


def _dv_files(m: dict) -> list[str]:
    return m.get("deletes", [])


def delete_keys(table_dir: str | Path, keys, key: str) -> int:
    """Merge-on-read DELETE via a deletion vector (the Delta/Iceberg
    DV shape): scattered deletes publish one tiny key-list sidecar and
    a new version carrying every data file UNTOUCHED — no rewrite at
    delete time; ``read`` anti-filters the union of DVs behind the
    scan. Time travel to pre-delete versions still shows the rows.
    Re-inserting a deleted key later requires ``merge_into`` (which
    subtracts its keys from the DVs) or ``materialize_deletes``."""
    import numpy as np

    d = Path(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    ks = np.unique(np.asarray(list(keys)))
    name = f"dv-{uuid.uuid4().hex}.parquet"
    pq.write_table(pa.table({key: pa.array(ks)}), d / name)
    version = commit(d, [], op="delete", expected_parent=v)
    mm = _load(d, version)
    mm["deletes"] = sorted(_dv_files(m) + [name])
    mm["delete_key"] = key
    if "stats" in m:
        mm["stats"] = m["stats"]
    tmp = d / f".v{version:06d}.tmp"
    tmp.write_text(json.dumps(mm, indent=1))
    tmp.replace(_manifest_path(d, version))  # same-writer update
    return version


def _dv_keys(d: Path, m: dict):
    import numpy as np

    dvs = _dv_files(m)
    if not dvs:
        return None
    key = m["delete_key"]
    arrs = [pq.read_table(d / f)[key].combine_chunks().to_numpy(
        zero_copy_only=False) for f in dvs]
    return key, np.unique(np.concatenate(arrs))


def materialize_deletes(table_dir: str | Path) -> int:
    """Rewrite every file applying the deletion vectors, then publish a
    DV-free version — the compaction step that turns merge-on-read
    back into pure data files."""
    import numpy as np

    d = Path(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    dv = _dv_keys(d, m)
    if dv is None:
        return v
    key, ks = dv
    rewritten = []
    for f in m["files"]:
        t = pq.read_table(d / f)
        col = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(ks, col), 0, len(ks) - 1)
        keep = ~(ks[idx] == col) if len(ks) else np.ones(len(col), bool)
        rewritten.append(t.filter(pa.array(keep)))
    stats_key = m.get("delete_key") if "stats" in m else None
    if stats_key is not None:
        return commit_with_stats(d, rewritten, stats_key,
                                 op="materialize-deletes",
                                 drop_files=m["files"],
                                 expected_parent=v)
    return commit(d, rewritten, op="materialize-deletes",
                  drop_files=m["files"], expected_parent=v)
