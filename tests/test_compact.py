"""Sink compaction: fragment merge preserves every routed row and count,
goes through the manifest protocol (readers never see a mixed state,
orphans stay invisible), and is idempotent."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from logray.gen import generate_corpus
from logray.pipelines.compact import compact, compact_partition
from logray.pipelines.flagship import read_sink, run_flagship
from logray.state import manifests

SF = 0.002


@pytest.fixture(scope="module")
def fragmented_run(ray_session, tmp_path_factory):
    in_dir = tmp_path_factory.mktemp("ccorpus")
    generate_corpus(SF, in_dir)
    out = tmp_path_factory.mktemp("cout")
    # tiny batches => every (partition, sink) gets several fragments
    metrics = run_flagship(in_dir, out, enrich_concurrency=2, batch_size=64)
    return out, metrics


def _sink_counts(out):
    sinks = {}
    for m in manifests.all_manifests(out):
        for k, n in m["rule_counts"].items():
            s = k.split("|", 1)[0]
            sinks[s] = sinks.get(s, 0) + n
    return sinks


def _rows_per_sink_on_disk(out):
    return {s: sum(pq.read_metadata(f).num_rows
                   for f in manifests.manifest_files(out, s))
            for s in _sink_counts(out)}


def test_compact_preserves_rows_and_merges(fragmented_run, ray_session):
    out, _ = fragmented_run
    before_counts = _sink_counts(out)
    before_rows = _rows_per_sink_on_disk(out)
    assert before_rows == before_counts
    n_files_before = len(manifests.manifest_files(out))
    assert n_files_before > len(before_counts)  # actually fragmented

    stats = compact(out, target_mb=512)
    assert stats["files_before"] == n_files_before
    assert stats["files_after"] < n_files_before
    # big target + small data => exactly one file per (partition, sink)
    per = {}
    for m in manifests.all_manifests(out):
        for s, fs in m["sink_files"].items():
            per[(m["partition_id"], s)] = len(fs)
    assert all(n == 1 for n in per.values())

    # every routed row and manifest count intact
    assert _sink_counts(out) == before_counts
    assert _rows_per_sink_on_disk(out) == before_counts
    # replaced fragments gone; nothing orphaned
    assert manifests.sweep_orphans(out, dry_run=True) == []
    # Dataset reader sees the compacted files
    for s, n in before_counts.items():
        assert read_sink(out, s).count() == n


def test_compact_idempotent(fragmented_run, ray_session):
    out, _ = fragmented_run
    again = compact(out, target_mb=512)
    assert again["rewritten"] == 0
    assert again["files_before"] == again["files_after"]


def test_compact_skips_uncommitted(tmp_path):
    r = compact_partition(str(tmp_path), "nope")
    assert r["skipped"] == "uncommitted"


def test_crash_window_leaves_only_orphans(fragmented_run, ray_session, tmp_path):
    """Simulate the crash window: new merged file written but manifest not
    committed — the file must be invisible and swept as an orphan."""
    out, _ = fragmented_run
    some = manifests.all_manifests(out)[0]
    pdir = manifests.partition_dir(out, some["partition_id"])
    sink_dir = next(p for p in pdir.iterdir() if p.is_dir())
    stray = sink_dir / "part-deadbeef.parquet"
    src = manifests.manifest_files(out)[0]
    stray.write_bytes(open(src, "rb").read())
    assert str(stray) not in manifests.manifest_files(out)
    swept = manifests.sweep_orphans(out)
    assert str(stray) in swept and not stray.exists()


def test_compact_schema_mismatch_left_alone(tmp_path):
    """Fragments whose schema differs (e.g. written by two pipeline
    versions) are kept un-compacted instead of failing the job."""
    import pyarrow as pa

    pdir = tmp_path / "partition=p0" / "sink=s"
    pdir.mkdir(parents=True)
    a = pa.table({"x": pa.array([1, 2], pa.int64())})
    b = pa.table({"x": pa.array([3], pa.int64())})
    odd = pa.table({"x": pa.array([9], pa.int64()),
                    "extra": pa.array(["v"], pa.string())})
    files = []
    for i, t in enumerate([a, b, odd]):
        f = pdir / f"part-{i}.parquet"
        pq.write_table(t, f)
        files.append(str(f))
    manifests.commit_manifest(tmp_path, "p0", {
        "sink_files": {"s": files}, "rule_counts": {"s|r": 4},
        "metrics": {"rows": 4, "parse_errors": 0, "unknown_rows": 0}})
    r = compact_partition(str(tmp_path), "p0", target_bytes=1 << 30)
    assert r["rewritten"] == 2 and r["files_after"] == 2
    kept = manifests.manifest_files(tmp_path, "s")
    assert files[2] in kept and len(kept) == 2
    total = sum(pq.read_metadata(f).num_rows for f in kept)
    assert total == 4
    assert manifests.sweep_orphans(tmp_path, dry_run=True) == []
