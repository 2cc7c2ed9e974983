"""Versioned-table layer: snapshot isolation, time travel, CoW upsert,
file diff, vacuum retention and crashed-commit hygiene."""

from __future__ import annotations

import json

import pyarrow as pa

from logray.state import versioned


def _t(ids, vals):
    return pa.table({"id": pa.array(list(ids), pa.int64()),
                     "v": pa.array(list(vals), pa.int64())})


def _rows(ds):
    df = ds.to_pandas()
    return sorted(zip(df["id"], df["v"]))


def test_commit_timetravel_upsert_and_diff(ray_session, tmp_path):
    d = tmp_path / "tbl"
    v1 = versioned.commit(d, [_t(range(10), range(10))], op="insert")
    assert v1 == 1
    v2 = versioned.commit(d, [_t(range(10, 15), range(10, 15))],
                          op="append")
    # upsert: rewrite the file holding ids 0-9 with doubled values,
    # carrying everything else by reference
    m1_files = json.loads(
        (d / "v000001.manifest.json").read_text())["files"]
    assert len(m1_files) == 1
    v3 = versioned.commit(
        d, [_t(range(10), [2 * i for i in range(10)])],
        op="upsert", drop_files=m1_files)

    assert versioned.versions(d) == [1, 2, 3]
    assert _rows(versioned.read(d, 1)) == [(i, i) for i in range(10)]
    assert _rows(versioned.read(d, 2)) == [(i, i) for i in range(15)]
    assert _rows(versioned.read(d)) == (
        [(i, 2 * i) for i in range(10)]
        + [(i, i) for i in range(10, 15)])

    diff = versioned.file_diff(d, 2, 3)
    assert len(diff["added"]) == 1 and diff["removed"] == m1_files


def test_vacuum_retention_and_crash_hygiene(ray_session, tmp_path):
    d = tmp_path / "tbl"
    versioned.commit(d, [_t([1], [1])])
    f1 = json.loads((d / "v000001.manifest.json").read_text())["files"]
    versioned.commit(d, [_t([2], [2])], op="upsert", drop_files=f1)
    (d / ".v000099.tmp").write_text("{}")  # crashed commit leftover

    rep = versioned.vacuum(d, keep_last=1, dry_run=True)
    assert rep["dropped_versions"] == [1]
    assert (d / "v000001.manifest.json").exists()  # dry run touches nothing

    rep = versioned.vacuum(d, keep_last=1)
    assert rep["dropped_versions"] == [1]
    assert f1[0] in rep["deleted_files"]  # unreferenced by kept v2
    assert ".v000099.tmp" in rep["deleted_files"]
    assert versioned.versions(d) == [2]
    assert _rows(versioned.read(d)) == [(2, 2)]
    assert not (d / f1[0]).exists()


def test_merge_into_prunes_by_file_stats(ray_session, tmp_path):
    """MERGE INTO rewrites ONLY files whose key range overlaps the
    changes (untouched files carry byte-identically), replaces matched
    keys, inserts unmatched ones, and equals a pandas reference merge."""
    import numpy as np
    import pandas as pd

    d = tmp_path / "tbl"
    # three key-partitioned files: [0,99], [100,199], [200,299]
    versioned.commit_with_stats(
        d, [_t(range(0, 100), range(0, 100)),
            _t(range(100, 200), range(100, 200)),
            _t(range(200, 300), range(200, 300))], "id", op="insert")
    m1 = json.loads((d / "v000001.manifest.json").read_text())
    assert all(len(v) == 2 for v in m1["stats"].values())

    # changes touch only [100,199] plus brand-new keys 400..404
    changes = _t([150, 151, 400, 401, 402, 403, 404],
                 [9150, 9151, 9400, 9401, 9402, 9403, 9404])
    v2 = versioned.merge_into(d, changes, "id")
    m2 = json.loads((d / f"v{v2:06d}.manifest.json").read_text())

    untouched = [f for f in m1["files"]
                 if not (100 <= m1["stats"][f][0] <= 199)]
    assert set(untouched) <= set(m2["files"])      # carried by reference
    assert len(m2["removed"]) == 1                 # only the middle file
    assert len(m2["added"]) == 2                   # rewrite + inserts

    ref = pd.DataFrame({"id": range(300), "v": range(300)})
    ch = changes.to_pandas()
    ref = pd.concat([ref[~ref["id"].isin(ch["id"])], ch])
    got = versioned.read(d, v2).to_pandas()
    assert (got.sort_values("id").reset_index(drop=True)
            .equals(ref.sort_values("id").reset_index(drop=True)
                    .astype(np.int64)))


def test_incremental_agg_equals_full_recompute(ray_session, tmp_path):
    """Rolling an aggregate forward over the file diff == recomputing
    from the new version's full file list."""
    d = tmp_path / "tbl"
    versioned.commit_with_stats(
        d, [_t(range(0, 50), range(0, 50)),
            _t(range(50, 100), range(50, 100))], "id", op="insert")
    base = versioned.read(d, 1).to_pandas()
    prev = {"n_rows": len(base), "sum_v": int(base["v"].sum())}

    changes = _t([10, 60, 200], [1000, 2000, 3000])
    v2 = versioned.merge_into(d, changes, "id")

    rolled = versioned.incremental_agg(d, 1, v2, prev, ["v"])
    full = versioned.read(d, v2).to_pandas()
    assert rolled["n_rows"] == len(full)
    assert rolled["sum_v"] == int(full["v"].sum())


def test_concurrent_commit_conflict_detected(ray_session, tmp_path):
    """Optimistic concurrency: a writer whose version was published
    first by someone else gets VersionConflict, never a lost update."""
    import pytest

    d = tmp_path / "tbl"
    versioned.commit(d, [_t([1], [1])])
    # a concurrent writer publishes v2 first
    winner = json.dumps({"version": 2, "parent": 1, "op": "append",
                         "files": [], "added": [], "removed": []})
    (d / "v000002.manifest.json").write_text(winner)
    # a blind append simply rebases onto the new latest (v3) ...
    assert versioned.commit(d, [_t([2], [2])]) == 3
    # ... but a plan computed against the stale snapshot must conflict
    with pytest.raises(versioned.VersionConflict):
        versioned.commit(d, [_t([3], [3])], expected_parent=1)
    # and merge_into always guards its snapshot-derived rewrite plan
    (d / "v000009.manifest.json").write_text(json.dumps(
        {"version": 9, "parent": 3, "op": "append",
         "files": [], "added": [], "removed": []}))
    # the winner's manifest is untouched and no tmp is left behind
    assert (d / "v000002.manifest.json").read_text() == winner
    assert not list(d.glob(".v*.tmp"))


def test_compact_coalesces_small_files_and_preserves_history(
        ray_session, tmp_path):
    d = tmp_path / "tbl"
    # five small files + one already-large file
    versioned.commit_with_stats(
        d, [_t(range(i * 10, i * 10 + 10), range(i * 10, i * 10 + 10))
            for i in range(5)] + [_t(range(100, 400), range(100, 400))],
        "id", op="insert")
    m1 = json.loads((d / "v000001.manifest.json").read_text())
    big = [f for f in m1["files"]
           if m1["stats"][f][0] == 100]
    v2 = versioned.compact(d, target_rows=25, key="id")
    assert v2 == 2
    m2 = json.loads((d / "v000002.manifest.json").read_text())
    assert big[0] in m2["files"]            # large file carried as-is
    assert len(m2["files"]) < len(m1["files"])
    assert set(m2["files"]) & set(m2["stats"])  # stats maintained
    # content identical across versions; history intact
    assert _rows(versioned.read(d, 2)) == _rows(versioned.read(d, 1))
    # idempotent-ish: nothing left to compact → same version returned
    assert versioned.compact(d, target_rows=25, key="id") in (2, 3)


def test_schema_evolution_reads_old_files_with_nulls(ray_session,
                                                     tmp_path):
    """A later version adding a column still reads historical files —
    absent values surface as nulls (additive schema evolution)."""
    d = tmp_path / "tbl"
    versioned.commit(d, [_t([1, 2], [1, 2])])
    evolved = pa.table({"id": pa.array([3], pa.int64()),
                        "v": pa.array([3], pa.int64()),
                        "w": pa.array(["x"])})
    versioned.commit(d, [evolved])
    df = versioned.read(d).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert list(df["id"]) == [1, 2, 3]
    assert df["w"].isna().tolist() == [True, True, False]
    assert df.loc[2, "w"] == "x"
    # time travel to v1 is untouched by the evolution
    assert sorted(versioned.read(d, 1).to_pandas().columns) == ["id", "v"]


def test_read_key_range_skips_files_by_stats(ray_session, tmp_path):
    """key_range reads prune whole files from the manifest stats before
    any scan task launches; surviving files still carry out-of-range
    rows (stats prune files, not rows)."""
    d = tmp_path / "tbl"
    versioned.commit_with_stats(
        d, [_t(range(0, 100), range(0, 100)),
            _t(range(100, 200), range(100, 200)),
            _t(range(200, 300), range(200, 300))], "id")
    ds = versioned.read(d, key_range=(120, 180))
    df = ds.to_pandas()
    # only the middle file was read: ids 100..199 present, others not
    assert df["id"].min() == 100 and df["id"].max() == 199
    assert len(df) == 100
    # column pruning
    slim = versioned.read(d, columns=["id"]).to_pandas()
    assert list(slim.columns) == ["id"]
    # disjoint range -> empty
    assert len(versioned.read(d, key_range=(900, 999)).to_pandas()) == 0


def test_deletion_vectors_merge_on_read(ray_session, tmp_path):
    """delete_keys hides rows without touching data files; time travel
    shows them; appends carry the DV; merge_into revives re-inserted
    keys; materialize_deletes rewrites and drops the DV; vacuum keeps
    referenced DVs."""
    d = tmp_path / "tbl"
    versioned.commit_with_stats(
        d, [_t(range(0, 50), range(0, 50)),
            _t(range(50, 100), range(50, 100))], "id", op="insert")
    m1_files = json.loads(
        (d / "v000001.manifest.json").read_text())["files"]

    v2 = versioned.delete_keys(d, [5, 60, 99], "id")
    m2 = json.loads((d / f"v{v2:06d}.manifest.json").read_text())
    assert sorted(m2["files"]) == sorted(m1_files)  # no rewrite
    got = set(versioned.read(d).to_pandas()["id"])
    assert {5, 60, 99}.isdisjoint(got) and len(got) == 97
    assert len(versioned.read(d, 1).to_pandas()) == 100  # time travel

    # an append carries the DV forward
    versioned.commit_with_stats(d, [_t([200], [200])], "id")
    assert 5 not in set(versioned.read(d).to_pandas()["id"])

    # merging key 5 back revives it; 60/99 stay hidden
    versioned.merge_into(d, _t([5], [555]), "id")
    df = versioned.read(d).to_pandas()
    assert int(df.loc[df["id"] == 5, "v"].iloc[0]) == 555
    assert {60, 99}.isdisjoint(set(df["id"]))

    vmat = versioned.materialize_deletes(d)
    mm = json.loads((d / f"v{vmat:06d}.manifest.json").read_text())
    assert "deletes" not in mm
    dfm = versioned.read(d).to_pandas()
    assert set(dfm["id"]) == set(df["id"])  # same visible rows

    rep = versioned.vacuum(d, keep_last=1)
    assert all(f.startswith(("data-", "dv-", ".v"))
               for f in rep["deleted_files"])
    assert set(versioned.read(d).to_pandas()["id"]) == set(dfm["id"])


# ---- round-4 ADVICE regressions: single-publish manifests, stats
# ---- persistence, DV-aware incremental agg, multi-file merge dedup


def test_manifest_complete_at_publish_instant(ray_session, tmp_path,
                                              monkeypatch):
    """ADVICE r3 (medium): deletes/stats must ride the ONE exclusive
    publish — capture the tmp content at link time and assert the
    fields are already there (no publish-then-patch window)."""
    published: list[dict] = []
    real = versioned._publish

    def spy(tmp, target):
        published.append(json.loads(tmp.read_text()))
        real(tmp, target)

    monkeypatch.setattr(versioned, "_publish", spy)
    d = tmp_path / "tbl"
    versioned.commit_with_stats(
        d, [_t(range(5), range(5)), _t(range(10, 15), range(5))], "id")
    assert "stats" in published[-1] and len(published[-1]["stats"]) == 2
    assert published[-1]["stats_key"] == "id"

    versioned.delete_keys(d, [3, 12], "id")
    assert published[-1].get("deletes"), "DV missing at publish instant"
    assert published[-1]["delete_key"] == "id"
    assert "stats" in published[-1]  # delete version keeps stats

    versioned.merge_into(d, _t([3, 40], [99, 40]), "id")
    m = published[-1]
    assert "stats" in m and set(m["stats"]) == set(m["files"])
    # key 3 merged back live: its DV entry subtracted pre-publish
    import numpy as np

    dv = versioned._dv_keys(d, m)
    assert dv is not None and list(np.asarray(dv[1])) == [12]


def test_stats_survive_plain_commits_and_unkeyed_compact(
        ray_session, tmp_path):
    """ADVICE r3 (low): stats coverage must not decay across plain
    commit() / compact() — merge_into still works afterwards."""
    d = tmp_path / "tbl"
    versioned.commit_with_stats(d, [_t(range(5), range(5))], "id")
    versioned.commit(d, [_t(range(100, 105), range(5))])  # plain append
    m = json.loads((d / "v000002.manifest.json").read_text())
    assert set(m["stats"]) == set(m["files"]) and len(m["files"]) == 2
    versioned.compact(d, target_rows=1000)  # no key arg
    m = json.loads((d / "v000003.manifest.json").read_text())
    assert set(m["stats"]) == set(m["files"])
    v = versioned.merge_into(d, _t([2, 102], [222, 222]), "id")
    rows = dict(_rows(versioned.read(d, v)))
    assert rows[2] == 222 and rows[102] == 222 and len(rows) == 10


def test_commit_with_stats_rejects_key_change(ray_session, tmp_path):
    d = tmp_path / "tbl"
    versioned.commit_with_stats(d, [_t([1], [1])], "id")
    import pytest

    with pytest.raises(ValueError, match="keyed on"):
        versioned.commit_with_stats(d, [_t([2], [2])], "v")


def test_incremental_agg_crosses_delete_keys(ray_session, tmp_path):
    """ADVICE r3 (medium): a merge-on-read delete adds no data files,
    so the file diff alone would miss it — the rolled-forward
    aggregate must equal the full recompute of the VISIBLE rows."""
    d = tmp_path / "tbl"
    v1 = versioned.commit_with_stats(
        d, [_t(range(10), range(10)), _t(range(10, 20), range(10, 20))],
        "id")

    def full(v):
        df = versioned.read(d, v).to_pandas()
        return {"n_rows": len(df), "sum_v": int(df["v"].sum())}

    base = full(v1)
    v2 = versioned.delete_keys(d, [3, 17], "id")
    rolled = versioned.incremental_agg(d, v1, v2, base, ["v"])
    assert rolled == full(v2) == {"n_rows": 18, "sum_v": 190 - 20}
    # and forward across a mixed delete → append → merge chain
    versioned.commit(d, [_t([50], [50])])
    v4 = versioned.merge_into(d, _t([17, 5], [170, 500]), "id")
    rolled = versioned.incremental_agg(d, v2, v4, rolled, ["v"])
    assert rolled == full(v4)
    # rolling FROM a DV version also adds hidden(v_from) back
    rolled2 = versioned.incremental_agg(d, v1, v4, base, ["v"])
    assert rolled2 == full(v4)


def test_incremental_agg_mismatched_delete_and_stats_key(
        ray_session, tmp_path):
    """r5 ADVICE fix (medium): stats on column A say nothing about
    which files hold deleted B values — with delete_key != stats_key
    the DV-hidden scan must NOT prune by stats (it previously skipped
    files that actually contained deleted rows, silently diverging
    from the full recompute), and merge_into on the wrong key must
    refuse rather than prune by the wrong column's ranges."""
    import pytest

    d = tmp_path / "tbl"
    # stats keyed on id; the two files' v-ranges do NOT cover the
    # deleted v values' positions the stats-prune would assume
    t1 = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                   "v": pa.array([100, 101, 102], pa.int64())})
    t2 = pa.table({"id": pa.array([10, 11, 12], pa.int64()),
                   "v": pa.array([5, 6, 7], pa.int64())})
    v1 = versioned.commit_with_stats(d, [t1, t2], "id")
    # delete keyed on v: 101 lives in the FIRST file, whose id-stats
    # range [0,2] excludes 101 — a stats-keyed prune would skip it
    v2 = versioned.delete_keys(d, [101], "v")

    def full(v):
        df = versioned.read(d, v).to_pandas()
        return {"n_rows": len(df), "sum_v": int(df["v"].sum())}

    base = full(v1)
    rolled = versioned.incremental_agg(d, v1, v2, base, ["v"])
    assert rolled == full(v2) == {"n_rows": 5, "sum_v": 100 + 102 + 18}

    with pytest.raises(ValueError, match="keyed on"):
        versioned.merge_into(d, t1.slice(0, 1), "v")


def test_merge_into_key_in_multiple_files_upserts_once(
        ray_session, tmp_path):
    """ADVICE r3 (low): a key physically present in two files must
    yield ONE merged row, not one per file."""
    d = tmp_path / "tbl"
    versioned.commit_with_stats(d, [_t([1, 2], [1, 2])], "id")
    versioned.commit(d, [_t([2, 3], [20, 3])])  # id=2 now in 2 files
    v = versioned.merge_into(d, _t([2], [222]), "id")
    rows = _rows(versioned.read(d, v))
    assert rows == [(1, 1), (2, 222), (3, 3)]


def test_cli_delete_casts_values_to_key_type(ray_session, tmp_path,
                                             capsys):
    """ADVICE r3 (low): all-digit --values on a STRING key column must
    cast to string (zero-padded ids), not int64."""
    d = tmp_path / "tbl"
    t = pa.table({"sid": pa.array(["007", "042", "100"]),
                  "v": pa.array([1, 2, 3], pa.int64())})
    versioned.commit(d, [t])
    from logray.__main__ import main

    rc = main(["table", "delete", str(d), "--key", "sid",
               "--values", "007,100"])
    assert rc == 0
    df = versioned.read(d).to_pandas()
    assert list(df["sid"]) == ["042"]


def test_concurrent_writers_no_lost_updates(ray_session, tmp_path):
    """OCC under REAL concurrency: 4 processes × 8 commits race on one
    table with rebase-and-retry on VersionConflict. Every appended row
    must appear exactly once in the final version (no lost updates) and
    the version chain must be gapless — the hard-link publish plus
    expected_parent make the interleaving serializable."""
    import subprocess
    import sys
    from pathlib import Path as _P

    d = tmp_path / "tbl"
    script = r"""
import sys, time
sys.path.insert(0, {repo!r})
import pyarrow as pa
from logray.state import versioned

wid = int(sys.argv[1])
for i in range(8):
    row = pa.table({{"id": pa.array([wid * 1000 + i], pa.int64()),
                     "v": pa.array([wid], pa.int64())}})
    while True:
        vs = versioned.versions({d!r})
        parent = vs[-1] if vs else 0
        try:
            versioned.commit({d!r}, [row], expected_parent=parent)
            break
        except versioned.VersionConflict:
            time.sleep(0.002)
print("DONE", wid)
""".format(repo=str(_P(__file__).resolve().parents[1]), d=str(d))
    procs = [subprocess.Popen([sys.executable, "-c", script, str(w)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for w in range(4)]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-500:]
        assert b"DONE" in out

    vs = versioned.versions(d)
    assert vs == list(range(1, 33))  # gapless: 32 commits, no clobbers
    df = versioned.read(d).to_pandas()
    assert len(df) == 32 and df["id"].is_unique
    want = {w * 1000 + i for w in range(4) for i in range(8)}
    assert set(df["id"]) == want
