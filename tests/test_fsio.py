"""State layer against a NON-local pyarrow filesystem (r4 VERDICT item
1): the sink/manifest/versioned plumbing must work when ``out_dir`` /
``table_dir`` is a ``scheme://`` URI on shared object storage, not a
POSIX path — actors on a real multi-node cluster would otherwise write
sinks to their own local disks.

The mock mount is an fsspec ``DirFileSystem`` wrapped in
``PyFileSystem(FSSpecHandler(...))``: pyarrow sees a genuinely foreign
filesystem (no ``os.link``/``os.replace``/pathlib anywhere in the code
path — ``FsPath.is_local`` is False, so every commit goes through the
generic move-based protocols), while Ray workers in other processes
can still read the bytes, which an in-memory mock cannot provide."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest
from fsspec.implementations.dirfs import DirFileSystem
from fsspec.implementations.local import LocalFileSystem as _FsspecLocal
from pyarrow.fs import FSSpecHandler, PyFileSystem

from logray.state import fsio, manifests, versioned


@pytest.fixture()
def mock_fs(tmp_path):
    """Mount a fresh DirFileSystem under mock:// for this test."""
    root = tmp_path / "mockroot"
    root.mkdir()
    fs = PyFileSystem(FSSpecHandler(
        DirFileSystem(path=str(root), fs=_FsspecLocal())))
    fsio.register_filesystem("mock", fs)
    return fs


def _t(ids, vals):
    return pa.table({"id": pa.array(list(ids), pa.int64()),
                     "v": pa.array(list(vals), pa.int64())})


def _rows(ds):
    df = ds.to_pandas()
    return sorted(zip(df["id"], df["v"]))


def test_fspath_remote_semantics(mock_fs):
    p = fsio.fspath("mock://a/b")
    assert not p.is_local and str(p) == "mock://a/b"
    assert (p / "c.txt").name == "c.txt" and p.parent.path == "a"
    with pytest.raises(TypeError):
        import os

        os.fspath(p)  # remote paths must refuse os interop
    p.mkdirs()
    f = p / "x.txt"
    f.write_text("hi")
    assert f.exists() and f.read_text() == "hi"
    assert [q.name for q in p.glob("*.txt")] == ["x.txt"]


def test_versioned_lifecycle_on_remote_fs(ray_session, mock_fs):
    """Full lakehouse lifecycle — commits, stats inheritance, deletion
    vectors, merge, incremental agg, time travel, conflict, vacuum —
    on the foreign filesystem, value-identical to the local path."""
    d = "mock://tbl"
    v1 = versioned.commit_with_stats(
        d, [_t(range(10), range(10)), _t(range(10, 20), range(10, 20))],
        "id")
    versioned.commit(d, [_t([50], [50])])  # plain append inherits stats
    v3 = versioned.delete_keys(d, [3, 17], "id")
    v4 = versioned.merge_into(d, _t([3, 99], [333, 99]), "id")

    rows = dict(_rows(versioned.read(d)))
    assert rows[3] == 333 and rows[99] == 99 and 17 not in rows
    assert len(rows) == 21  # 20 base + 50 + 99 insert − deleted 17
    # time travel still shows pre-delete state
    assert len(_rows(versioned.read(d, v1))) == 20
    # incremental agg crosses the DV version exactly
    base_df = versioned.read(d, v1).to_pandas()
    base = {"n_rows": len(base_df), "sum_v": int(base_df["v"].sum())}
    rolled = versioned.incremental_agg(d, v1, v4, base, ["v"])
    cur = versioned.read(d, v4).to_pandas()
    assert rolled == {"n_rows": len(cur), "sum_v": int(cur["v"].sum())}
    # key-range file skipping via manifest stats works remotely
    pruned = versioned.read(d, key_range=(50, 50)).to_pandas()
    assert set(pruned["id"]) == {50}
    # OCC: stale expected_parent conflicts, never a lost update
    with pytest.raises(versioned.VersionConflict):
        versioned.commit(d, [_t([1], [1])], expected_parent=v3)
    # compact + materialize produce clean versions; vacuum drops history
    versioned.materialize_deletes(d)
    versioned.compact(d, target_rows=1000)
    rep = versioned.vacuum(d, keep_last=1)
    assert rep["dropped_versions"]
    assert dict(_rows(versioned.read(d))) == rows


def test_remote_publish_is_exclusive_and_single_step(mock_fs,
                                                     monkeypatch):
    """The generic (non-hard-link) publish still refuses to replace a
    concurrently-committed manifest, and the manifest content is
    complete (stats) at the publish instant."""
    d = "mock://tbl2"
    published = []
    real = fsio.publish_exclusive

    def spy(tmp, target):
        published.append(json.loads(tmp.read_text()))
        return real(tmp, target)

    monkeypatch.setattr(versioned.fsio, "publish_exclusive", spy)
    versioned.commit_with_stats(d, [_t([1], [1])], "id")
    assert "stats" in published[-1] and published[-1]["stats_key"] == "id"

    # simulate a racer landing v2 first: the next commit must conflict
    racer = fsio.fspath(d) / "v000002.manifest.json"
    racer.write_text(json.dumps({"version": 2, "parent": 1,
                                 "op": "append", "files": [],
                                 "added": [], "removed": []}))
    with pytest.raises(versioned.VersionConflict):
        versioned.commit(d, [_t([2], [2])], expected_parent=1)


def test_crash_window_on_remote_fs(mock_fs):
    """Crash-window guarantees survive the FS abstraction: a tmp
    manifest written but never published is invisible to readers and
    swept by vacuum together with its orphan data files."""
    d = "mock://tbl3"
    versioned.commit(d, [_t([1], [1])])
    fp = fsio.fspath(d)
    # simulate a writer that died between data write and publish
    fsio.write_table(_t([2], [2]), fp / "data-deadbeef.parquet")
    (fp / ".v000002.tmp").write_text("{ not even json")
    assert versioned.versions(d) == [1]
    assert _rows(versioned.read(d)) == [(1, 1)]
    rep = versioned.vacuum(d, keep_last=1)
    assert "data-deadbeef.parquet" in rep["deleted_files"]
    assert ".v000002.tmp" in rep["deleted_files"]


def test_manifests_and_sink_writer_on_remote_fs(ray_session, mock_fs):
    """Lineage manifests + the fan-out SinkWriter write to the foreign
    filesystem; manifest_files round-trips URIs; sweep_orphans removes
    unreferenced files remotely."""
    from logray.stages.route import SinkWriter

    out = fsio.fspath("mock://out")
    w = SinkWriter(out, partition_id="p0")
    batch = pa.table({
        "sink": pa.array(["a", "a", "b"]),
        "rule_id": pa.array(["r1", "r1", "r2"]),
        "parse_error": pa.array([0, 0, 0], pa.int8()),
        "text": pa.array(["x", "y", "z"]),
    })
    summary = w(batch)
    files = {}
    for r in summary.to_pylist():
        files.setdefault(r["sink"], []).append(r["file"])
    manifests.commit_manifest(out, "p0", {"sink_files": files,
                                          "metrics": {"rows": 3}})
    assert manifests.is_committed(out, "p0")
    got = manifests.manifest_files(out, "a")
    assert len(got) == 1 and got[0].startswith("mock://")
    ds = fsio.read_parquet_dataset(got)
    assert sorted(ds.to_pandas()["text"]) == ["x", "y"]

    # an unreferenced retry leftover is swept
    stray = fsio.fspath(got[0]).parent / "part-stray.parquet"
    fsio.write_table(batch, stray)
    swept = manifests.sweep_orphans(out)
    assert [s for s in swept if "part-stray" in s] and not stray.exists()


@pytest.mark.slow
def test_flagship_end_to_end_on_remote_fs(ray_session, tmp_path,
                                          mock_fs):
    """run_flagship with a mock:// out_dir: sinks, manifests, rollups
    and resume all land on the foreign filesystem; a re-run skips every
    committed partition; sink compaction works remotely too."""
    from logray.gen import generate_corpus
    from logray.pipelines.compact import compact
    from logray.pipelines.flagship import read_sink, run_flagship

    corpus = tmp_path / "corpus"
    meta = generate_corpus(0.002, corpus, with_expected=False)
    out = "mock://flagout"
    m1 = run_flagship(corpus, out, wave_size=2, enrich_concurrency=2)
    assert m1["rows"] == meta["n_turns"] and not m1["partitions_skipped"]

    agg = fsio.read_table(fsio.fspath(out) / "_aggregates.parquet")
    assert int(pc.sum(agg["n"]).as_py()) == meta["n_turns"]
    total = sum(read_sink(out, s).count()
                for t in [json.loads(
                    (fsio.fspath(out) / "_metrics.json").read_text())]
                for s in {r["sink"] for r in agg.to_pylist()})
    assert total == meta["n_turns"]

    m2 = run_flagship(corpus, out, wave_size=2, enrich_concurrency=2)
    assert not m2["partitions_ran"]  # resume: everything skipped
    assert m2["rows"] == meta["n_turns"]

    rep = compact(out, target_mb=64)
    assert rep["files_after"] <= rep["files_before"]
    assert sum(read_sink(out, s).count()
               for s in {r["sink"] for r in agg.to_pylist()}) \
        == meta["n_turns"]


def test_remote_publish_detects_lost_put_race(tmp_path):
    """The read-back-verify branch: when a concurrent writer's PUT
    lands between our move and our verify (last-writer-wins store),
    publish_exclusive must report the loss instead of claiming the
    commit. The race is injected at the fsspec layer (pyarrow fs
    attributes are read-only)."""

    class RacingDirFS(DirFileSystem):
        def mv(self, path1, path2, **kw):
            super().mv(path1, path2, **kw)
            if path2.endswith(".manifest.json"):
                with super().open(path2, "wb") as f:
                    f.write(b'{"theirs": true}')

    root = tmp_path / "raceroot"
    root.mkdir()
    fs = PyFileSystem(FSSpecHandler(
        RacingDirFS(path=str(root), fs=_FsspecLocal())))
    fsio.register_filesystem("race", fs)
    base = fsio.fspath("race://tbl")
    base.mkdirs()
    tmp, target = base / ".v1.tmp", base / "v1.manifest.json"
    tmp.write_text('{"mine": true}')
    assert fsio.publish_exclusive(tmp, target) is False
    assert target.read_text() == '{"theirs": true}'  # racer survives


def _strict_put_if_absent(root):
    """A conditional-put backend with REAL cross-process atomicity:
    O_CREAT|O_EXCL on the DirFileSystem's backing path — the semantics
    of S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``."""
    import os as _os

    def put(fs, path, data: bytes) -> bool:
        real = _os.path.join(str(root), path)
        _os.makedirs(_os.path.dirname(real), exist_ok=True)
        try:
            fd = _os.open(real, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            return False
        with _os.fdopen(fd, "wb") as f:
            f.write(data)
        return True

    return put


def test_conditional_put_backend_refuses_loser(tmp_path):
    """r5 verdict item 1: with a ``register_put_if_absent`` backend
    mounted, the OCC publish is a true store-side put-if-absent — the
    loser is deterministically REFUSED (no read-back-verify fallback,
    no LWW window) and the winner's bytes survive untouched."""
    root = tmp_path / "cputroot"
    root.mkdir()
    fs = PyFileSystem(FSSpecHandler(
        DirFileSystem(path=str(root), fs=_FsspecLocal())))
    fsio.register_filesystem("cput", fs)
    fsio.register_put_if_absent(fs, _strict_put_if_absent(root))
    try:
        base = fsio.fspath("cput://tbl")
        base.mkdirs()
        target = base / "v1.manifest.json"
        t1 = base / ".v1.a.tmp"
        t1.write_text('{"winner": 1}')
        assert fsio.publish_exclusive(t1, target) is True
        assert not t1.exists()  # tmp consumed
        t2 = base / ".v1.b.tmp"
        t2.write_text('{"loser": 2}')
        assert fsio.publish_exclusive(t2, target) is False
        assert target.read_text() == '{"winner": 1}'
        assert not t2.exists()
        # versioned layer surfaces the refusal as VersionConflict
        versioned.commit("cput://tbl2", [_t([1], [1])])
        racer = fsio.fspath("cput://tbl2") / "v000002.manifest.json"
        racer.write_text(json.dumps({"version": 2, "parent": 1,
                                     "op": "append", "files": [],
                                     "added": [], "removed": []}))
        with pytest.raises(versioned.VersionConflict):
            versioned.commit("cput://tbl2", [_t([2], [2])],
                             expected_parent=1)
    finally:
        fsio.register_put_if_absent(fs, None)


def test_occ_stress_on_mock_with_strict_backend(tmp_path):
    """r5 verdict item 1 'done' criterion: 4 processes × 6 commits
    race on one mock:// table THROUGH the strict conditional-put
    backend — every row lands exactly once, version chain gapless."""
    import subprocess
    import sys
    from pathlib import Path as _P

    root = tmp_path / "mockroot"
    root.mkdir()
    script = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from fsspec.implementations.dirfs import DirFileSystem
from fsspec.implementations.local import LocalFileSystem
from pyarrow.fs import FSSpecHandler, PyFileSystem
import pyarrow as pa
from logray.state import fsio, versioned

root = {root!r}
fs = PyFileSystem(FSSpecHandler(
    DirFileSystem(path=root, fs=LocalFileSystem())))
fsio.register_filesystem("mock", fs)

def put(fs_, path, data):
    real = os.path.join(root, path)
    os.makedirs(os.path.dirname(real), exist_ok=True)
    try:
        fd = os.open(real, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    return True

fsio.register_put_if_absent(fs, put)
wid = int(sys.argv[1])
for i in range(6):
    row = pa.table({{"id": pa.array([wid * 1000 + i], pa.int64()),
                     "v": pa.array([wid], pa.int64())}})
    while True:
        vs = versioned.versions("mock://tbl")
        parent = vs[-1] if vs else 0
        try:
            versioned.commit("mock://tbl", [row],
                             expected_parent=parent)
            break
        except versioned.VersionConflict:
            time.sleep(0.002)
print("DONE", wid)
""".format(repo=str(_P(__file__).resolve().parents[1]), root=str(root))
    procs = [__import__("subprocess").Popen(
        [sys.executable, "-c", script, str(w)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for w in range(4)]
    for pr in procs:
        out, err = pr.communicate(timeout=120)
        assert pr.returncode == 0, err.decode()[-800:]
        assert b"DONE" in out

    fs = PyFileSystem(FSSpecHandler(
        DirFileSystem(path=str(root), fs=_FsspecLocal())))
    fsio.register_filesystem("mock", fs)
    vs = versioned.versions("mock://tbl")
    assert vs == list(range(1, 25))  # gapless: 24 commits, no clobbers
    t = pa.concat_tables(
        [fsio.read_table(fsio.fspath("mock://tbl") / f)
         for f in versioned._load(fsio.fspath("mock://tbl"),
                                  vs[-1])["files"]])
    ids = sorted(t["id"].to_pylist())
    assert ids == sorted(w * 1000 + i for w in range(4)
                         for i in range(6))


def test_publish_replace_no_notfound_window(tmp_path):
    """r5 ADVICE fix: republishing over an EXISTING manifest on an
    overwriting store must go through one atomic move — never a
    delete-then-move that exposes readers to NotFound mid-publish. A
    store whose move refuses existing destinations still works via
    the unlink+retry fallback."""

    class RecordingDirFS(DirFileSystem):
        deleted: list = []

        def rm_file(self, path, **kw):
            RecordingDirFS.deleted.append(path)
            super().rm_file(path, **kw)

        def rm(self, path, **kw):
            RecordingDirFS.deleted.append(path)
            super().rm(path, **kw)

    root = tmp_path / "repl"
    root.mkdir()
    fs = PyFileSystem(FSSpecHandler(
        RecordingDirFS(path=str(root), fs=_FsspecLocal())))
    fsio.register_filesystem("repl", fs)
    base = fsio.fspath("repl://out")
    base.mkdirs()
    target = base / "m.json"
    target.write_text("old")
    RecordingDirFS.deleted = []
    tmp = base / ".m.tmp"
    tmp.write_text("new")
    fsio.publish_replace(tmp, target)
    assert target.read_text() == "new"
    assert not any(d.endswith("m.json") and not d.endswith(".m.tmp")
                   for d in RecordingDirFS.deleted), \
        RecordingDirFS.deleted  # target never deleted pre-move

    class RefusingDirFS(DirFileSystem):
        def mv(self, path1, path2, **kw):
            if self.exists(path2):
                raise OSError("destination exists")
            super().mv(path1, path2, **kw)

    root2 = tmp_path / "ref"
    root2.mkdir()
    fs2 = PyFileSystem(FSSpecHandler(
        RefusingDirFS(path=str(root2), fs=_FsspecLocal())))
    fsio.register_filesystem("refuse", fs2)
    base2 = fsio.fspath("refuse://out")
    base2.mkdirs()
    target2 = base2 / "m.json"
    target2.write_text("old")
    tmp2 = base2 / ".m.tmp"
    tmp2.write_text("new")
    fsio.publish_replace(tmp2, target2)
    assert target2.read_text() == "new"


def test_bucket_layout_and_zorder_on_remote_fs(ray_session, mock_fs):
    """The persisted layouts (hash buckets, z-order) write to and join
    from the foreign filesystem: write_bucketed → bucket_join is
    shuffle-free AND shared-storage-ready; footer_stats reads remote
    footers only."""
    import numpy as np
    import ray.data

    from logray.ops import layout

    n = 2_000
    rng = np.random.default_rng(3)
    left = pa.table({"k": pa.array(rng.integers(0, 200, n)),
                     "lv": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({"k": pa.array(np.arange(200, dtype=np.int64)),
                      "rv": pa.array(np.arange(200, dtype=np.int64) * 3)})
    layout.write_bucketed(ray.data.from_arrow(left), "k",
                          "mock://lay/a", num_buckets=8)
    layout.write_bucketed(ray.data.from_arrow(right), "k",
                          "mock://lay/b", num_buckets=8)
    joined = layout.bucket_join("mock://lay/a", "mock://lay/b",
                                "k").to_pandas()
    assert len(joined) == n  # 1:1 key coverage
    want = left.to_pandas().merge(right.to_pandas(), on="k")
    assert (joined.sort_values("lv").reset_index(drop=True)["rv"]
            == want.sort_values("lv").reset_index(drop=True)["rv"]).all()

    # z-order write lands remotely; footer stats read remote footers
    ev = pa.table({"x": pa.array(rng.integers(0, 1000, n)),
                   "y": pa.array(rng.integers(0, 1000, n))})
    layout.zorder_write(ray.data.from_arrow(ev), "x", "y",
                        "mock://lay/z", num_files=4)
    files = fsio.fspath("mock://lay/z").glob("*.parquet")
    assert len(files) >= 1
    stats = layout.footer_stats([str(f) for f in files], ["x", "y"])
    assert stats["n_rows"] == n
    assert stats["min"]["x"] == int(ev["x"].to_pandas().min())
    assert stats["max"]["y"] == int(ev["y"].to_pandas().max())
