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

Single-publish invariant: a manifest is COMPLETE (files, stats,
deletion vectors) before the exclusive link and is NEVER rewritten
afterwards — there is no window where a reader of a published version
sees it without its deletes/stats, and a concurrent writer that
commits the next version inherits the full parent state. Callers that
need to attach extra fields do it through ``commit(finalize=...)``,
which mutates the manifest dict pre-publish.

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
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from . import fsio
from .fsio import FsPath, fspath

_MANIFEST_GLOB = "v*.manifest.json"


def _manifest_path(d: FsPath, version: int) -> FsPath:
    return d / f"v{version:06d}.manifest.json"


def versions(table_dir: str | Path | FsPath) -> list[int]:
    d = fspath(table_dir)
    out = []
    for p in d.glob(_MANIFEST_GLOB):
        out.append(int(p.name[1:7]))
    return out


def _load(d: FsPath, version: int) -> dict:
    return json.loads(_manifest_path(d, version).read_text())


class VersionConflict(RuntimeError):
    """Another writer published this version first (optimistic
    concurrency): retry against the new latest version."""


def _publish(tmp: FsPath, target: FsPath) -> None:
    """Atomic EXCLUSIVE publish — local: hard-link tmp → target
    (kernel-atomic EEXIST when a concurrent writer won the race; plain
    rename would silently REPLACE their manifest, a lost update);
    remote: fsio's check → move → read-back-verify put-if-absent (see
    fsio module docstring for the object-store contract). This is the
    ONLY way a manifest reaches its published name; no code path
    rewrites a manifest after it publishes."""
    if not fsio.publish_exclusive(tmp, target):
        raise VersionConflict(
            f"{target.name} was committed concurrently — rebase on the "
            f"new latest version and retry")


def _minmax(col: pa.ChunkedArray | pa.Array) -> list:
    mm = pc.min_max(col)
    return [mm["min"].as_py(), mm["max"].as_py()]


def _file_minmax(d: FsPath, name: str, key: str) -> list:
    return _minmax(fsio.read_table(d / name, columns=[key])[key])


def commit(table_dir: str | Path, new_tables: list[pa.Table], *,
           carry_files: list[str] | None = None, op: str = "append",
           drop_files: list[str] | None = None,
           expected_parent: int | None = None,
           stats_key: str | None = None,
           finalize: Callable[[dict], None] | None = None) -> int:
    """Commit a new version: write ``new_tables`` as uuid-fresh parquet
    files, carry ``carry_files`` (default: ALL of the parent version's
    files minus ``drop_files``) by reference, and publish the manifest
    atomically. Returns the new version number (1-based; 1 = first).

    ``expected_parent``: optimistic-concurrency guard — pass the version
    this commit's plan (its carry/drop lists) was computed against;
    raises ``VersionConflict`` if another writer advanced the table in
    between (a blind append can omit it; anything derived from a
    snapshot, like MERGE INTO, must not). The publish itself is an
    exclusive hard-link, closing the remaining read-plan-publish window.

    Stats inheritance: once a table has a ``stats_key`` (first set via
    ``commit_with_stats``), EVERY later commit — plain appends included
    — carries the parent's per-file [min, max] for carried files and
    computes them for its new files, so stats coverage never decays and
    ``merge_into``/``read(key_range=...)`` keep working after any mix
    of commits. A carried file missing a parent stats entry (legacy
    manifest) is repaired by reading its key column once.

    ``finalize(manifest)`` runs on the fully-assembled manifest dict
    just before the tmp write + exclusive link — the supported way to
    attach fields (deletion vectors, app metadata) while keeping the
    single-publish invariant."""
    d = fspath(table_dir)
    d.mkdirs()
    vs = versions(d)
    parent = vs[-1] if vs else 0
    if expected_parent is not None and parent != expected_parent:
        raise VersionConflict(
            f"planned against v{expected_parent} but latest is "
            f"v{parent} — rebase and retry")
    pm = _load(d, parent) if parent else {}
    if carry_files is None:
        carried = list(pm.get("files", []))
    else:
        carried = list(carry_files)
    if drop_files:
        dropped = set(drop_files)
        carried = [f for f in carried if f not in dropped]
    new_files: list[str] = []
    new_by_name: dict[str, pa.Table] = {}
    for t in new_tables:
        if t.num_rows == 0:
            continue
        name = f"data-{uuid.uuid4().hex}.parquet"
        fsio.write_table(t, d / name)
        new_files.append(name)
        new_by_name[name] = t
    version = parent + 1
    manifest = {"version": version, "parent": parent, "op": op,
                "files": sorted(carried + new_files),
                "added": sorted(new_files),
                "removed": sorted(drop_files or [])}
    if parent and op != "materialize-deletes" and pm.get("deletes"):
        # deletion vectors are key-based and global: every child
        # version keeps hiding those keys until materialized
        manifest["deletes"] = pm["deletes"]
        manifest["delete_key"] = pm["delete_key"]
    sk = stats_key or pm.get("stats_key")
    if sk is not None:
        parent_stats = pm.get("stats", {})
        stats = {}
        for f in carried:
            stats[f] = (parent_stats[f] if f in parent_stats
                        else _file_minmax(d, f, sk))
        for f in new_files:
            stats[f] = _minmax(new_by_name[f][sk])
        manifest["stats"] = stats
        manifest["stats_key"] = sk
    if finalize is not None:
        finalize(manifest)
    # tmp name is unique PER WRITER: two racers for the same version
    # must never share a tmp path, or the loser's write can replace the
    # winner's bytes between its write and its link (a lost update the
    # OCC stress test caught in the wild — the link itself stays the
    # only arbiter); losers' tmps are swept by vacuum
    tmp = d / f".v{version:06d}.{uuid.uuid4().hex}.tmp"
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

    d = fspath(table_dir)
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
    if not names:
        return ray.data.from_arrow(pa.table({}))
    ds = fsio.read_parquet_dataset([d / f for f in names],
                                   columns=columns)
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
    d = fspath(table_dir)
    a = set(_load(d, v_from)["files"])
    b = set(_load(d, v_to)["files"])
    return {"added": sorted(b - a), "removed": sorted(a - b)}


def vacuum(table_dir: str | Path, *, keep_last: int = 1,
           dry_run: bool = False) -> dict:
    """Drop all but the last ``keep_last`` versions and delete every
    data file no kept version references (plus crashed-commit tmp
    files). Kept versions remain fully readable."""
    d = fspath(table_dir)
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
                      expected_parent: int | None = None,
                      finalize: Callable[[dict], None] | None = None
                      ) -> int:
    """``commit`` that also records per-file [min, max] of ``key`` in
    the manifest — the file-skipping statistic MERGE INTO prunes with.
    Once set, the key persists in the manifest (``stats_key``) and
    every subsequent plain ``commit`` keeps stats coverage complete.
    Changing the key of an existing stats table is an error (the
    carried files' recorded ranges would be for the wrong column)."""
    d = fspath(table_dir)
    vs = versions(d)
    if vs:
        prev = _load(d, vs[-1]).get("stats_key")
        if prev is not None and prev != key:
            raise ValueError(
                f"table already keyed on {prev!r}; cannot re-key to "
                f"{key!r} (rewrite via materialize/compact first)")
    return commit(d, new_tables, carry_files=carry_files, op=op,
                  drop_files=drop_files, expected_parent=expected_parent,
                  stats_key=key, finalize=finalize)


def merge_into(table_dir: str | Path, changes: pa.Table, key: str) -> int:
    """MERGE INTO (upsert) producing a new version: rows in ``changes``
    REPLACE same-key rows, unmatched keys INSERT. Only files whose
    recorded [min, max] key range overlaps a changed key are rewritten
    — the manifest-stats file skipping that makes a 10-row merge into a
    10-file rewrite instead of a full-table rewrite; untouched files
    carry by reference, byte-identical. Changed keys outside every
    file's range land in one fresh insert file.

    A matched key that physically exists in MORE THAN ONE affected file
    (appends don't enforce key uniqueness) is collapsed to ONE upserted
    row: the replacement is emitted with the first file that held it,
    and later files only drop their stale copies.

    Deletion vectors: a merged key is live again, so its entry is
    subtracted from the DVs — in the SAME atomic publish as the data
    commit (the new DV sidecars are written first; the manifest links
    them via ``finalize``), never by rewriting a published manifest."""
    import numpy as np
    import pandas as pd

    d = fspath(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    stats = m.get("stats")
    if stats is None:
        raise ValueError("merge_into needs commit_with_stats manifests")
    if m.get("stats_key") != key:
        raise ValueError(
            f"table stats are keyed on {m.get('stats_key')!r}; merging "
            f"on {key!r} would prune by the wrong column's ranges")
    ck = np.unique(changes[key].combine_chunks().to_numpy(
        zero_copy_only=False))
    affected = [f for f in m["files"]
                if np.any((ck >= stats[f][0]) & (ck <= stats[f][1]))]
    cdf = changes.to_pandas().drop_duplicates(key, keep="last")
    matched_keys: set = set()
    emitted: set = set()
    rewritten = []
    for f in affected:
        t = fsio.read_table(d / f)
        base = t.to_pandas()
        hit = base[key].isin(cdf[key])
        hit_keys = set(base.loc[hit, key])
        matched_keys.update(hit_keys)
        merged = base.loc[~hit]
        # emit each replacement exactly once across files (a key can
        # live in several files; all stale copies drop, one row lands)
        fresh = hit_keys - emitted
        repl = cdf[cdf[key].isin(fresh)]
        emitted.update(fresh)
        out = pa.Table.from_pandas(pd.concat([merged, repl]),
                                   preserve_index=False).cast(t.schema)
        rewritten.append(out)
    inserts = cdf[~cdf[key].isin(matched_keys)]
    if len(inserts):
        rewritten.append(pa.Table.from_pandas(
            inserts, preserve_index=False).cast(changes.schema))

    # pre-compute the DV subtraction (merged keys are live again) so the
    # updated sidecar list rides the one-and-only manifest publish
    def _subtract_dvs(mm: dict) -> None:
        if not _dv_files(mm) or mm.get("delete_key") != key:
            return
        live = set(np.asarray(cdf[key]))
        new_dvs = []
        for f in _dv_files(mm):
            t = fsio.read_table(d / f)
            col = t[key].combine_chunks().to_numpy(zero_copy_only=False)
            kept = t.filter(pa.array([c not in live for c in col]))
            if kept.num_rows:
                name = f"dv-{uuid.uuid4().hex}.parquet"
                fsio.write_table(kept, d / name)
                new_dvs.append(name)
        if new_dvs:
            mm["deletes"] = sorted(new_dvs)
        else:
            mm.pop("deletes", None)
            mm.pop("delete_key", None)

    # the rewrite plan was derived from v's manifest: any concurrent
    # advance invalidates it — expected_parent turns that into a
    # VersionConflict instead of a lost update
    return commit_with_stats(d, rewritten, key, op="merge",
                             drop_files=affected, expected_parent=v,
                             finalize=_subtract_dvs)


def _dv_hidden_agg(d: FsPath, m: dict, sum_cols: list[str]) -> dict:
    """Contribution (row count + column sums) of the rows a version's
    deletion vectors HIDE from its file list — what ``incremental_agg``
    must subtract so the rolled-forward aggregate equals the aggregate
    of ``read()`` (which anti-filters the DVs). Manifest stats prune
    files whose [min, max] can't hold any deleted key — ONLY when the
    stats column IS the delete key (stats on A say nothing about which
    files hold deleted B values; a mismatched prune would silently
    skip files containing deleted rows and diverge from the full
    recompute). Mismatched tables scan every file instead."""
    import numpy as np

    out = {"n_rows": 0, **{f"sum_{c}": 0 for c in sum_cols}}
    dv = _dv_keys(d, m)
    if dv is None:
        return out
    key, ks = dv
    stats = m.get("stats") if m.get("stats_key") == key else None
    cols = list(dict.fromkeys([key, *sum_cols]))
    for f in m["files"]:
        if stats and f in stats:
            lo, hi = stats[f]
            if not np.any((ks >= lo) & (ks <= hi)):
                continue
        t = fsio.read_table(d / f, columns=cols)
        col = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(ks, col), 0, len(ks) - 1)
        hidden = ks[idx] == col
        n = int(hidden.sum())
        if not n:
            continue
        out["n_rows"] += n
        ht = t.filter(pa.array(hidden))
        for c in sum_cols:
            out[f"sum_{c}"] += pc.sum(ht[c]).as_py() or 0
    return out


def incremental_agg(table_dir: str | Path, v_from: int, v_to: int,
                    prev: dict, sum_cols: list[str]) -> dict:
    """Incremental view maintenance over the LAYOUT: roll an aggregate
    forward between versions by scanning ONLY the diffed files —
    agg(v_to) = agg(v_from) − Σ(removed files) + Σ(added files), exact
    for any commutative-invertible aggregate (count / sum here). A
    10-file merge updates a 100 TB table's totals by reading 10 files;
    equality with the full recompute is the pytest invariant.

    Deletion vectors: a ``delete_keys`` version changes what ``read``
    RETURNS without changing the file list, so the file diff alone
    would roll the aggregate forward unchanged while the table shrank.
    The DV-hidden contribution of each endpoint is therefore folded in:
    result = prev − removed + added − hidden(v_to) + hidden(v_from),
    keeping exact equality with a full recompute of the visible rows
    across any mix of appends, merges, and merge-on-read deletes."""
    d = fspath(table_dir)
    diff = file_diff(d, v_from, v_to)
    out = dict(prev)

    def apply(files: list[str], sign: int) -> None:
        for f in files:
            t = fsio.read_table(d / f, columns=sum_cols)
            out["n_rows"] = out.get("n_rows", 0) + sign * t.num_rows
            for c in sum_cols:
                s = pc.sum(t[c]).as_py() or 0
                out[f"sum_{c}"] = out.get(f"sum_{c}", 0) + sign * s

    apply(diff["removed"], -1)
    apply(diff["added"], +1)
    h_to = _dv_hidden_agg(d, _load(d, v_to), sum_cols)
    h_from = _dv_hidden_agg(d, _load(d, v_from), sum_cols)
    for k, v in h_to.items():
        out[k] = out.get(k, 0) - v
    for k, v in h_from.items():
        out[k] = out.get(k, 0) + v
    return out


def compact(table_dir: str | Path, *, target_rows: int = 1_000_000,
            key: str | None = None) -> int:
    """Small-file compaction as a NEW VERSION (the lakehouse OPTIMIZE):
    files under ``target_rows`` coalesce greedily into ≈target-sized
    replacements; files already at or above target carry by reference,
    byte-identical. History stays intact — the pre-compaction version
    remains time-travel-readable until ``vacuum`` — and the rewrite
    plan is guarded by ``expected_parent``, so a concurrent commit
    turns into a conflict, never a lost update. A stats table keeps
    its per-file [min, max] automatically (``stats_key`` inheritance);
    ``key`` is only needed to INTRODUCE stats on an unkeyed table."""
    d = fspath(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    sizes = {f: fsio.read_metadata(d / f).num_rows for f in m["files"]}
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
    merged = [pa.concat_tables([fsio.read_table(d / f) for f in g])
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
    subtracts its keys from the DVs) or ``materialize_deletes``.

    The DV sidecar is written FIRST and linked into the manifest via
    ``finalize`` — the published manifest carries the delete from its
    first readable instant (no publish-then-patch window)."""
    import numpy as np

    d = fspath(table_dir)
    v = versions(d)[-1]
    ks = np.unique(np.asarray(list(keys)))
    name = f"dv-{uuid.uuid4().hex}.parquet"
    fsio.write_table(pa.table({key: pa.array(ks)}), d / name)

    def _attach(mm: dict) -> None:
        prior = mm.get("delete_key")
        if prior is not None and prior != key:
            raise ValueError(
                f"existing deletion vectors key on {prior!r}; "
                f"materialize_deletes() before deleting on {key!r}")
        mm["deletes"] = sorted(set(_dv_files(mm)) | {name})
        mm["delete_key"] = key

    return commit(d, [], op="delete", expected_parent=v,
                  finalize=_attach)


def _dv_keys(d: FsPath, m: dict):
    import numpy as np

    dvs = _dv_files(m)
    if not dvs:
        return None
    key = m["delete_key"]
    arrs = [fsio.read_table(d / f)[key].combine_chunks().to_numpy(
        zero_copy_only=False) for f in dvs]
    return key, np.unique(np.concatenate(arrs))


def materialize_deletes(table_dir: str | Path) -> int:
    """Rewrite every file applying the deletion vectors, then publish a
    DV-free version — the compaction step that turns merge-on-read
    back into pure data files. Stats (when present) recompute for the
    rewritten files via ``stats_key`` inheritance."""
    import numpy as np

    d = fspath(table_dir)
    v = versions(d)[-1]
    m = _load(d, v)
    dv = _dv_keys(d, m)
    if dv is None:
        return v
    key, ks = dv
    rewritten = []
    for f in m["files"]:
        t = fsio.read_table(d / f)
        col = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(ks, col), 0, len(ks) - 1)
        keep = ~(ks[idx] == col) if len(ks) else np.ones(len(col), bool)
        rewritten.append(t.filter(pa.array(keep)))
    return commit(d, rewritten, op="materialize-deletes",
                  drop_files=m["files"], expected_parent=v)
