"""Flagship DAG (M1–M5): read → parse → enrich → route/fan-out → aggregate.

Ray-Data-native execution of the reference's parse loop at corpus scale
(SURVEY.md §3.2). Partitions are processed in **waves**: one streaming
Dataset pass covers up to ``wave_size`` input partitions at once —

    read_parquet(wave files, include_paths)   # light tasks, num_cpus=0.5
      → map_batches(FlagshipWorker,           # stateful actor pool:
                    concurrency=(m, n))       #   parse → enrich → route/write
      → driver collects tiny per-batch partials → per-pid manifest commit

``FlagshipWorker`` is ONE actor-pool stage fusing the whole row path:
the compiled ruleset, the broadcast enrich lookups and the sink writer
all live in actor state (built once per actor in ``__init__``), and only
the per-(pid, sink, rule, file) summary rows ever leave the actors —
the enriched row stream (~400 B/row) never crosses the object store.
Measured on this 32-CPU host, the fused layout beats the 3-operator
task/actor/task chain ~2× (no inter-stage object transfer, no actor-pool
ceiling on the heavy stage). Reads run at ``num_cpus=0.5`` so a pool
spanning nearly the whole cluster can never starve them into deadlock.

Wave execution keeps the whole cluster busy (one actor-pool spin-up per
wave instead of per partition) while the manifest commit stays
partition-granular: a crash mid-wave loses at most one wave of work and
a restart skips every committed partition. At 100 TB, ``wave_size``
bounds both the lost-work window and driver-side summary state.

Aggregates are rolled up from the partials recorded in manifests — the
full parsed stream is never re-shuffled or materialized for counting.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.enrich import Enricher
from ..stages.parse import parse_batch_fn
from ..stages.route import PID_COL, SinkWriter
from ..state import fsio, manifests
from ..state.fsio import fspath


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


def _fold_path_to_pid(batch: pa.Table) -> pa.Table:
    """Fallback pid fold: the Ray-provided per-row ``path`` string →
    its stem (dictionary-take over the few distinct paths). Used only
    when the input layout is NOT hash-derivable (see ``pid_deriver``) —
    the path column costs ~50–70 B/row of object-store transfer that
    the derivable path avoids entirely. (Read-side folding is not an
    option: Ray 2.49 never fuses ReadParquet with a downstream
    MapBatches, so a pre-actor fold would ADD a store hop.)"""
    path = batch["path"]
    if isinstance(path, pa.ChunkedArray):
        path = path.combine_chunks()
    d = path.dictionary_encode()
    pids = pa.array([Path(p).stem for p in d.dictionary.to_pylist()],
                    pa.string())
    return batch.drop(["path"]).append_column(PID_COL, pids.take(d.indices))


def pid_deriver(input_dir: str | Path, parts: dict[str, list[str]]):
    """Partition id as a FUNCTION OF THE DATA (r4 bytes/row reduction):
    the generator lays files out as ``part-{crc32(conv_id) % P:02d}``
    (gen.py:228; replicated corpora as ``part-r{K}-{crc32 % P}`` with
    conv ids prefixed ``r{K}``), so for corpora carrying the
    generator's ``_meta.json`` the pid is recomputable from ``conv_id``
    alone — the read skips ``include_paths`` and no per-row path
    string (~50–70 B/row) ever crosses the object store to the actor
    pool. Returns a vectorized ``batch -> batch(+PID_COL)`` fold, or
    None when the layout isn't provably hash-derived (foreign inputs
    fall back to the path column). crc32 runs once per DISTINCT
    conv_id per batch (dictionary-encode → hash uniques → take).

    Two gates guard against a FOREIGN corpus whose directory happens
    to match the generator's shape but whose conv_id scheme differs
    (derived pids would then disagree with the files rows came from,
    silently breaking partition-granular resume):
    1. build-time: a sample of conv_id values is read from up to 3
       files (footer-cheap, first row group only) and the candidate
       fold must reproduce each file's own stem EXACTLY — any
       mismatch returns None, i.e. the path-column fallback;
    2. runtime: ``fold_rep`` parses the replica prefix with the same
       ``r\\d+`` regex as the directory gate; a conv_id that doesn't
       match past the sample gate (mixed/corrupt input) raises a
       diagnostic naming the value and the LOGRAY_FORCE_PATH_PID
       escape hatch rather than mis-hashing rows into wrong
       partitions (the path column is not read on this code path, so
       a silent per-row fallback does not exist)."""
    import re
    import zlib

    meta_p = Path(input_dir) / "_meta.json"
    if not meta_p.exists():
        return None
    stems = sorted(parts)
    fold = None
    plain = {f"part-{i:02d}" for i in range(len(parts))}
    if set(stems) == plain:
        P = len(parts)

        def fold_plain(batch: pa.Table) -> pa.Table:
            conv = batch["conv_id"]
            if isinstance(conv, pa.ChunkedArray):
                conv = conv.combine_chunks()
            d = conv.dictionary_encode()
            pids = pa.array(
                [f"part-{zlib.crc32(u.encode()) % P:02d}"
                 for u in d.dictionary.to_pylist()], pa.string())
            return batch.append_column(PID_COL, pids.take(d.indices))

        fold = fold_plain
    else:
        m = [re.fullmatch(r"part-(r\d+)-(\d{2})", s) for s in stems]
        if all(m):
            reps = {g.group(1) for g in m}
            base = {g.group(2) for g in m}
            P = len(base)
            if (len(parts) == len(reps) * P
                    and base == {f"{i:02d}" for i in range(P)}):
                rep_re = re.compile(r"(r\d+)(c.*)", re.DOTALL)

                def fold_rep(batch: pa.Table) -> pa.Table:
                    conv = batch["conv_id"]
                    if isinstance(conv, pa.ChunkedArray):
                        conv = conv.combine_chunks()
                    d = conv.dictionary_encode()
                    # replica prefix "r<k>" up to the original id's
                    # leading 'c' — variable width (r00 … r119 …),
                    # parsed with the same shape the dir gate used
                    pids = []
                    for u in d.dictionary.to_pylist():
                        g = rep_re.fullmatch(u)
                        if g is None:
                            raise ValueError(
                                f"conv_id {u!r} does not match the "
                                f"replicated-layout scheme r<K>c...; "
                                f"the corpus mixes id schemes — rerun "
                                f"with LOGRAY_FORCE_PATH_PID=1 to "
                                f"route by file path instead")
                        pids.append(
                            f"part-{g.group(1)}-"
                            f"{zlib.crc32(g.group(2).encode()) % P:02d}")
                    pids = pa.array(pids, pa.string())
                    return batch.append_column(PID_COL,
                                               pids.take(d.indices))

                fold = fold_rep
    if fold is None:
        return None
    # build-time sample gate: the fold must reproduce each sampled
    # file's own stem, else the conv_id scheme is foreign → path fold
    try:
        for stem in stems[:: max(1, len(stems) // 3)][:3]:
            f = pq.ParquetFile(parts[stem][0])
            if f.metadata.num_rows == 0:
                continue
            sample = f.read_row_group(0, columns=["conv_id"]).slice(0, 64)
            derived = fold(sample)[PID_COL].to_pylist()
            if any(p != stem for p in derived):
                return None
    except (ValueError, KeyError, OSError):
        return None
    return fold


def _parse_with_pid(batch: pa.Table, ruleset=None,
                    pid_fn=None) -> pa.Table:
    """Parse stage body for wave mode: the partition id — derived from
    ``conv_id`` by ``pid_fn`` when the layout allows (no path column
    read at all), else folded from the Ray-provided ``path`` column —
    rides through the rule engine. ``ruleset`` None => the
    process-cached frozen transcript table."""
    if PID_COL not in batch.column_names:
        batch = (pid_fn(batch) if pid_fn is not None
                 else _fold_path_to_pid(batch))
    if ruleset is not None:
        return ruleset.parse_batch(batch, extra_cols=(PID_COL,))
    return parse_batch_fn(batch, extra_cols=(PID_COL,))


class FlagshipWorker:
    """Fused stateful stage: parse → enrich → route/fan-out in one actor.

    All per-worker state — compiled pattern trie (via the parse module's
    process-level cache), broadcast lookup dicts (``lookups_ref`` from
    ``ray.put``, resolved once here, never re-shipped per batch) and the
    multi-sink writer — is built once per actor; ``__call__`` handles one
    Arrow batch end-to-end and returns only the tiny summary table."""

    def __init__(self, out_dir: str, lookups_ref=None, compression: str = "zstd",
                 rules_json: str | None = None, pid_fn=None):
        self.pid_fn = pid_fn
        from ..rules_transcripts import sink_columns

        # custom declarative rule table (rules_io JSON text, shipped inline
        # in the actor constructor args — no shared-FS assumption); None =>
        # the frozen transcript table via the per-process compile cache
        if rules_json is not None:
            from ..rules_io import parse_ruleset_json
            from ..ruleset import RuleSet

            self.ruleset = RuleSet(*parse_ruleset_json(rules_json))
            cols = self.ruleset.sink_columns()
        else:
            self.ruleset = None
            cols = sink_columns()
        self.enricher = Enricher(lookups_ref)
        self.writer = SinkWriter(out_dir, compression=compression,
                                 sink_columns=cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.writer(self.enricher(
            _parse_with_pid(batch, self.ruleset, self.pid_fn)))


def _default_pool() -> tuple[int, int]:
    """Actor-pool bounds from the cluster size: ~7/8 of CPUs warm-started,
    growing to cpus-1 (reads take the fractional remainder)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (max(1, cpus * 7 // 8), max(2, cpus - 1))


def run_wave(wave: list[str], parts: dict[str, list[str]], out_dir, *,
             lookups_ref=None, enrich_concurrency=None, batch_size: int | None = None,
             override_num_blocks: int | None = None,
             rules_json: str | None = None, pid_fn=None) -> dict[str, dict]:
    """One streaming pass over one wave of partitions; returns
    {partition_id: manifest payload}."""
    import ray.data

    files = [f for pid in wave for f in parts[pid]]
    if enrich_concurrency is None:
        enrich_concurrency = _default_pool()
    if override_num_blocks is None:
        # Block sizing balances two measured costs: each worker batch pays
        # ~240 ms FIXED (per-rule kernel dispatch ~0.85 ms/rule + parquet
        # writer setup per sink slice) on top of ~4 µs/row marginal, so
        # blocks want to be ≥~50k rows to amortize the knee — but never so
        # few that the actor pool idles (a 2-block layout on a 28-actor
        # pool measured 2× slower e2e than an 11-block one on the same
        # corpus). Floor = enough ≥8k-row blocks to cover the pool; row
        # counts come from parquet footers only (no data pages). The old
        # 2-blocks-per-file heuristic hit the knee whenever input files
        # were small (5.5k-row blocks: ~60 ms dispatch for ~10 ms of
        # matching). ONE footer read only — files within a wave share the
        # partition layout, and a per-file metadata pass is a serial
        # driver-side scan (measured ~4 s at 960 files/wave).
        rows_per_file = pq.ParquetFile(files[0]).metadata.num_rows
        total_est = rows_per_file * len(files)
        pool_hi = (enrich_concurrency[1]
                   if isinstance(enrich_concurrency, tuple) else enrich_concurrency)
        amortized = round(total_est / 50_000)
        parallel_floor = min(int(pool_hi), round(total_est / 8_000))
        override_num_blocks = max(1, amortized, parallel_floor)
    if isinstance(enrich_concurrency, tuple):
        # never spawn more actors than there are blocks to feed them —
        # actor spin-up (~40 ms + lookup fetch each) is pure waste past
        # that; at corpus scale blocks ≫ pool and this is a no-op
        lo, hi = enrich_concurrency
        enrich_concurrency = (max(1, min(int(lo), override_num_blocks)),
                              max(1, min(int(hi), override_num_blocks)))
    ds = ray.data.read_parquet(files, include_paths=pid_fn is None,
                               override_num_blocks=override_num_blocks,
                               ray_remote_args={"num_cpus": 0.5})
    summaries = ds.map_batches(
        FlagshipWorker,
        fn_constructor_kwargs={"out_dir": out_dir, "lookups_ref": lookups_ref,
                               "rules_json": rules_json, "pid_fn": pid_fn},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=enrich_concurrency, batch_size=batch_size)
    rows = summaries.take_all()  # tiny: one row per (pid, sink, rule, batch-file)
    try:
        # per-stage wall/CPU breakdown for the wave — the ds.stats() feedback
        # loop, persisted so operators can audit where time went after the run
        (fspath(out_dir) / "_last_wave_stats.txt").write_text(summaries.stats())
    except Exception:
        pass

    payloads: dict[str, dict] = {}
    for pid in wave:
        payloads[pid] = {
            "input_files": parts[pid],
            "sink_files": {},
            "rule_counts": {},
            "metrics": {"rows": 0, "parse_errors": 0, "unknown_rows": 0},
        }
    for r in rows:
        p = payloads[r["pid"]]
        p["sink_files"].setdefault(r["sink"], [])
        if r["file"] not in p["sink_files"][r["sink"]]:
            p["sink_files"][r["sink"]].append(r["file"])
        key = f"{r['sink']}|{r['rule_id']}"
        p["rule_counts"][key] = p["rule_counts"].get(key, 0) + r["n"]
        p["metrics"]["rows"] += r["n"]
        p["metrics"]["parse_errors"] += r["parse_errors"]
        if r["sink"] == "sink_unknown":
            p["metrics"]["unknown_rows"] += r["n"]
    for p in payloads.values():
        p["sink_files"] = {k: sorted(v) for k, v in sorted(p["sink_files"].items())}
        p["rule_counts"] = dict(sorted(p["rule_counts"].items()))
        m = p["metrics"]
        m["matched_pct"] = (round(100.0 * (m["rows"] - m["unknown_rows"]) / m["rows"], 4)
                            if m["rows"] else 0.0)
    return payloads


def run_partition(files: list[str], out_dir: str, partition_id: str, *,
                  lookups_ref=None, enrich_concurrency=None, batch_size: int | None = None,
                  override_num_blocks: int | None = None,
                  rules_json: str | None = None) -> dict:
    """Single-partition compatibility wrapper around ``run_wave``."""
    return run_wave([partition_id], {partition_id: files}, out_dir,
                    lookups_ref=lookups_ref, enrich_concurrency=enrich_concurrency,
                    batch_size=batch_size,
                    override_num_blocks=override_num_blocks,
                    rules_json=rules_json)[partition_id]


def run_flagship(input_dir: str | Path, out_dir: str | Path, *,
                 resume: bool = True, lookups_ref=None, enrich_concurrency=None,
                 batch_size: int | None = None, override_num_blocks: int | None = None,
                 wave_size: int | None = None,
                 rules_json: str | None = None) -> dict:
    """Run the full pipeline with partition-granular resume; returns metrics.

    ``rules_json``: optional declarative rule table (``logray.rules_io``
    JSON text) replacing the frozen transcript ruleset — the C10 extension
    surface end-to-end. The table's passthrough must keep the transcript
    envelope (conv_id, turn_idx, role, text, tool, ts): the enrich stage
    keys off role/tool/conv_id.

    Rollup artifacts written under ``out_dir``:
    - ``partition=*/sink=*/part-*.parquet`` — routed sinks
    - ``partition=*/_manifest.json``        — lineage + metrics per partition
    - ``_aggregates.parquet``               — per-(sink, rule_id) counts
    - ``_metrics.json``                     — global rollup
    """
    t0 = time.time()
    # local path or registered scheme:// URI (shared object storage on a
    # real cluster) — resolved ONCE here; workers receive the FsPath
    out_dir = fspath(out_dir)
    out_dir.mkdirs()
    if wave_size is None:
        # waves sized to cluster width: each wave should carry enough
        # blocks (2/partition) to keep every slot busy well past ramp-up;
        # too-small waves pay a drain barrier per wave (measured 3×
        # slowdown at 32-files/wave on a 960-partition input)
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
            wave_size = max(32, cpus * 8)
        else:
            wave_size = 32  # Ray not up yet (it auto-inits in run_wave)
    parts = discover_partitions(input_dir)
    # hash-derivable layouts skip the per-row path column entirely
    # (LOGRAY_FORCE_PATH_PID=1 forces the fallback — the A/B switch the
    # scaling bench uses to measure the reduction in one quiet window)
    import os as _os

    pid_fn = (None if _os.environ.get("LOGRAY_FORCE_PATH_PID")
              else pid_deriver(input_dir, parts))
    ran, skipped = [], []
    pending = []
    for pid in parts:
        if resume and manifests.is_committed(out_dir, pid):
            skipped.append(pid)
        else:
            pending.append(pid)
    for i in range(0, len(pending), wave_size):
        wave = pending[i:i + wave_size]
        payloads = run_wave(wave, parts, out_dir, lookups_ref=lookups_ref,
                            pid_fn=pid_fn,
                            enrich_concurrency=enrich_concurrency,
                            batch_size=batch_size,
                            override_num_blocks=override_num_blocks,
                            rules_json=rules_json)
        for pid in wave:
            manifests.commit_manifest(out_dir, pid, payloads[pid])
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
    fsio.write_table(agg_table, out_dir / "_aggregates.parquet")
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
    return fsio.read_parquet_dataset(files)


def follow_flagship(input_dir: str | Path, out_dir: str | Path, *,
                    poll_hook=None, poll_s: float = 2.0,
                    max_idle_polls: int = 3, **run_kwargs) -> dict:
    """Streaming micro-batch mode (`run --follow`): poll the input
    directory and process ONLY newly-arrived partitions each cycle —
    partition-granular resume IS the incremental-ingest contract, so a
    cycle is just ``run_flagship(resume=True)`` and already-committed
    partitions cost one manifest stat each. The manifest rollup
    re-aggregates after every cycle, so ``_aggregates.parquet`` is
    always consistent with everything committed so far (exactly what a
    cold batch run over the same files would write — equality-tested).

    Stops after ``max_idle_polls`` consecutive cycles that found no new
    partitions. ``poll_hook(cycle, metrics) -> bool`` (tests/embedders:
    return False to stop immediately; arrival simulation happens here);
    default sleeps ``poll_s`` between cycles. Returns the last cycle's
    metrics plus ``cycles`` and ``total_new_partitions``."""
    cycles = idle = total_new = 0
    metrics: dict = {}
    while True:
        metrics = run_flagship(input_dir, out_dir, resume=True,
                               **run_kwargs)
        cycles += 1
        new = len(metrics["partitions_ran"])
        total_new += new
        idle = idle + 1 if new == 0 else 0
        if poll_hook is not None:
            if not poll_hook(cycles, metrics):
                break
        if idle >= max_idle_polls:
            break
        if poll_hook is None and poll_s > 0:
            time.sleep(poll_s)
    metrics["cycles"] = cycles
    metrics["total_new_partitions"] = total_new
    return metrics
