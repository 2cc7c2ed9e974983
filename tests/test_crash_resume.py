"""Hard-crash resume: SIGKILL a flagship run mid-flight, restart, and
require exact aggregates with no duplicated rows — validates that
manifest commits are atomic (commit-by-rename) and that orphan files
from the killed attempt are never referenced."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from logray.gen import generate_corpus
from logray.rules_transcripts import TRANSCRIPT_RULES
from logray.state import manifests

RULE_SINK = {r.rule_id: r.sink for r in TRANSCRIPT_RULES}

RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from logray.pipelines.flagship import run_flagship
# wave_size=1 => one manifest commit per partition: maximal kill windows
run_flagship({corpus!r}, {out!r}, wave_size=1, enrich_concurrency=2)
print("COMPLETE", flush=True)
"""


@pytest.mark.slow
def test_sigkill_mid_run_then_resume(tmp_path):
    corpus = tmp_path / "corpus"
    meta = generate_corpus(0.004, corpus, with_expected=False)
    out = tmp_path / "out"
    repo = str(Path(__file__).resolve().parents[1])
    script = RUNNER.format(repo=repo, corpus=str(corpus), out=str(out))

    # run 1: kill as soon as at least one partition manifest is committed
    p = subprocess.Popen([sys.executable, "-c", script],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        committed = [pid for pid in (f"part-{i:02d}" for i in range(meta["partitions"]))
                     if manifests.is_committed(out, pid)]
        if 0 < len(committed) < meta["partitions"]:
            os.kill(p.pid, signal.SIGKILL)
            killed = True
            break
        if p.poll() is not None:
            break
        time.sleep(0.05)
    p.wait()
    if not killed:
        pytest.skip("run finished before a kill window opened")

    n_committed_after_kill = sum(
        manifests.is_committed(out, f"part-{i:02d}")
        for i in range(meta["partitions"]))
    assert 0 < n_committed_after_kill < meta["partitions"]

    # run 2: must skip committed partitions and finish exactly
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300)
    assert "COMPLETE" in r.stdout, r.stderr[-2000:]

    agg = pq.read_table(out / "_aggregates.parquet").to_pylist()
    got = {(row["sink"], row["rule_id"]): row["n"] for row in agg}
    want = {(RULE_SINK[rid], rid): n for rid, n in meta["rule_counts"].items()}
    assert got == want

    m = json.loads((out / "_metrics.json").read_text())
    assert m["rows"] == meta["n_turns"]

    # rows referenced by manifests must be exactly the corpus (no dupes);
    # any files the killed attempt left behind are unreferenced orphans
    referenced = manifests.manifest_files(out)
    total_rows = sum(pq.read_metadata(f).num_rows for f in referenced)
    assert total_rows == meta["n_turns"]
    manifests.sweep_orphans(out)


def test_follow_mode_staged_arrival_equals_cold_batch(ray_session, tmp_path):
    """follow_flagship over files arriving in two waves produces byte-
    identical aggregates to one cold batch run over all files."""
    import pandas as pd

    from logray.pipelines.flagship import follow_flagship, run_flagship

    full = tmp_path / "full"
    generate_corpus(0.004, full, with_expected=False)
    files = sorted(full.glob("*.parquet"))
    assert len(files) >= 4
    live = tmp_path / "live"
    live.mkdir()
    for f in files[: len(files) // 2]:          # wave 1
        (live / f.name).write_bytes(f.read_bytes())

    def hook(cycle: int, metrics: dict) -> bool:
        if cycle == 1:                           # wave 2 arrives
            for f in files[len(files) // 2:]:
                (live / f.name).write_bytes(f.read_bytes())
            assert metrics["partitions_ran"]
        return cycle < 4  # two data cycles + idle confirms

    out_live = tmp_path / "out_live"
    m = follow_flagship(str(live), str(out_live), poll_hook=hook,
                        enrich_concurrency=2)
    assert m["cycles"] >= 3 and m["total_new_partitions"] == len(files)

    out_cold = tmp_path / "out_cold"
    run_flagship(str(full), str(out_cold), enrich_concurrency=2)

    a = pq.read_table(out_live / "_aggregates.parquet").to_pandas()
    b = pq.read_table(out_cold / "_aggregates.parquet").to_pandas()
    key = ["sink", "rule_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


@pytest.mark.slow
def test_actor_killed_mid_wave_retries_and_matches_cold_run(
        ray_session, tmp_path):
    """r5 fault injection: one FlagshipWorker actor dies (os._exit)
    AFTER writing sink files but before returning its batch summary.
    Ray Data must restart the actor and retry the batch; the run
    completes, aggregates equal a cold run, the dead attempt's sink
    files stay unreferenced by every manifest, and sweep_orphans
    removes them."""
    import unittest.mock as mock

    from logray.pipelines import flagship

    corpus = tmp_path / "corpus"
    meta = generate_corpus(0.003, corpus, with_expected=False)
    marker = tmp_path / "crashed.marker"

    class CrashingWorker(flagship.FlagshipWorker):
        def __call__(self, batch):
            out = super().__call__(batch)
            # first batch anywhere: write files, then die before the
            # summary escapes — the classic lost-worker window
            try:
                import os as _os

                fd = _os.open(str(marker),
                              _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                _os.close(fd)
                _os._exit(1)
            except FileExistsError:
                pass
            return out

    out_a = tmp_path / "out_a"
    with mock.patch.object(flagship, "FlagshipWorker", CrashingWorker):
        m = flagship.run_flagship(corpus, out_a, wave_size=2,
                                  enrich_concurrency=2)
    assert marker.exists()  # the crash really fired
    assert m["rows"] == meta["n_turns"]

    out_b = tmp_path / "out_b"
    flagship.run_flagship(corpus, out_b, wave_size=2,
                          enrich_concurrency=2)
    agg_a = {(r["sink"], r["rule_id"]): r["n"] for r in
             pq.read_table(out_a / "_aggregates.parquet").to_pylist()}
    agg_b = {(r["sink"], r["rule_id"]): r["n"] for r in
             pq.read_table(out_b / "_aggregates.parquet").to_pylist()}
    assert agg_a == agg_b

    # manifests reference exactly the corpus row count; the crashed
    # attempt's files are orphans and sweepable
    referenced = manifests.manifest_files(out_a)
    total_rows = sum(pq.read_metadata(f).num_rows for f in referenced)
    assert total_rows == meta["n_turns"]
    swept = manifests.sweep_orphans(out_a)
    assert swept  # the dead actor's unreturned files really existed
    referenced2 = manifests.manifest_files(out_a)
    assert sorted(referenced2) == sorted(referenced)


def test_crash_mid_publish_leaves_consistent_table(tmp_path):
    """r5 fault injection: a versioned commit that dies BETWEEN the
    remote PUT of the manifest and the tmp cleanup (the copy+delete
    move's crash window) leaves a fully-readable committed version plus
    one orphan tmp — never a half-visible version. A follow-up commit
    sees the published parent and vacuum sweeps the leftover."""
    import pyarrow as pa
    from fsspec.implementations.dirfs import DirFileSystem
    from fsspec.implementations.local import LocalFileSystem
    from pyarrow.fs import FSSpecHandler, PyFileSystem

    from logray.state import fsio, versioned

    class DieAfterPut(DirFileSystem):
        armed = False

        def mv(self, path1, path2, **kw):
            if DieAfterPut.armed and path2.endswith(".manifest.json"):
                # crash simulation: complete the PUT, skip the delete
                with self.open(path1, "rb") as f:
                    data = f.read()
                with self.open(path2, "wb") as f:
                    f.write(data)
                DieAfterPut.armed = False
                raise RuntimeError("process died mid-publish")
            super().mv(path1, path2, **kw)

    root = tmp_path / "midpub"
    root.mkdir()
    fs = PyFileSystem(FSSpecHandler(
        DieAfterPut(path=str(root), fs=LocalFileSystem())))
    fsio.register_filesystem("midpub", fs)
    d = "midpub://tbl"

    def t(ids):
        return pa.table({"id": pa.array(list(ids), pa.int64())})

    versioned.commit(d, [t([1])])
    DieAfterPut.armed = True
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="mid-publish"):
        versioned.commit(d, [t([2])])
    # the manifest IS published and complete despite the crash
    # (read files straight off the manifest — the ad-hoc fsspec
    # subclass above isn't picklable into Ray read tasks)
    assert versioned.versions(d) == [1, 2]

    def rows():
        dd = fsio.fspath(d)
        m = versioned._load(dd, versioned.versions(d)[-1])
        return sorted(i for f in m["files"]
                      for i in fsio.read_table(dd / f)["id"].to_pylist())

    assert rows() == [1, 2]
    # the crashed writer's tmp survives as an orphan; vacuum sweeps it
    tmps = fsio.fspath(d).glob(".v*.tmp")
    assert tmps
    versioned.commit(d, [t([3])])
    rep = versioned.vacuum(d, keep_last=1)
    assert any(n.startswith(".v") for n in rep["deleted_files"])
    assert rows() == [1, 2, 3]


def test_corrupt_partial_file_from_crash_is_inert(ray_session, tmp_path):
    """A writer killed MID-FILE leaves a truncated (unparseable) parquet
    in a sink directory. Because every consumer — read_sink, compaction,
    aggregates — walks manifest-referenced files only, the corpse is
    inert: results unchanged, compaction succeeds without reading it,
    and sweep_orphans removes it without parsing it."""
    import pyarrow as pa

    from logray.gen import generate_corpus
    from logray.pipelines.compact import compact
    from logray.pipelines.flagship import read_sink, run_flagship

    corpus = tmp_path / "corpus"
    meta = generate_corpus(0.002, corpus, with_expected=False)
    out = tmp_path / "out"
    run_flagship(corpus, out, wave_size=2, enrich_concurrency=2)
    agg_before = pq.read_table(out / "_aggregates.parquet").to_pylist()
    sinks = sorted({r["sink"] for r in agg_before})
    counts_before = {s: read_sink(out, s).count() for s in sinks}

    # plant a truncated parquet corpse in a real sink dir (valid magic
    # prefix, torn off mid-body — what a SIGKILL mid-write leaves)
    sink_dir = next(p for p in out.iterdir()
                    if p.is_dir() and not p.name.startswith("_"))
    real = next(sink_dir.rglob("*.parquet"))
    corpse = real.parent / "part-deadbeefcafe.parquet"
    corpse.write_bytes(real.read_bytes()[: max(16, real.stat().st_size // 3)])

    assert {s: read_sink(out, s).count() for s in sinks} == counts_before
    rep = compact(out, target_mb=64)
    assert rep["files_after"] <= rep["files_before"]
    assert {s: read_sink(out, s).count() for s in sinks} == counts_before
    assert sum(counts_before.values()) == meta["n_turns"]

    from logray.state import manifests as M

    swept = M.sweep_orphans(out)
    assert any("part-deadbeefcafe" in s for s in swept)
    assert not corpse.exists()
