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
