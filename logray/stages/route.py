"""Route + fan-out stage — one-pass multi-sink Parquet writer (M3).

The parse stage already assigned each row its ``sink`` (from ``rule_id``,
the routing function of SURVEY.md §2 C11). Writing six sinks as six
filtered ``write_parquet`` calls would re-execute the lazy pipeline six
times (or force a full materialization); instead each task splits its
batch by sink and writes one file per (sink, batch) in a single pass —
the "custom per-task multi-sink writer" of SURVEY.md §7 hard-part 2.

Idempotence under Ray's task retries: file names embed a uuid per call,
so a retried task writes NEW files; only the files reported by blocks
that reached the driver get recorded in the partition manifest — orphans
from failed attempts are never referenced (see logray.state.manifests).

``__call__`` returns a small summary table, one row per
(sink, rule_id, file): the downstream aggregate consumes these partials
instead of re-shuffling the full parsed stream (partial aggregation
before the groupby — SURVEY.md §2 C5).
"""

from __future__ import annotations

import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SUMMARY_SCHEMA = pa.schema([
    ("sink", pa.string()),
    ("rule_id", pa.string()),
    ("n", pa.int64()),
    ("parse_errors", pa.int64()),
    ("file", pa.string()),
])


class SinkWriter:
    """map_batches stage: write each batch fanned out per sink, emit partials.

    Parameters
    ----------
    out_dir: root output directory
    partition_id: input partition this run covers (manifest unit)
    compression: parquet codec for sink files
    """

    def __init__(self, out_dir: str, partition_id: str, compression: str = "zstd"):
        self.base = Path(out_dir) / f"partition={partition_id}"
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in ("sink", "rule_id", "n", "parse_errors", "file")}
        if batch.num_rows == 0:
            return SUMMARY_SCHEMA.empty_table()
        sinks = batch["sink"]
        for sink_val in pc.unique(sinks.combine_chunks() if isinstance(sinks, pa.ChunkedArray) else sinks).to_pylist():
            sub = batch.filter(pc.equal(sinks, sink_val))
            sink_dir = self.base / f"sink={sink_val}"
            sink_dir.mkdir(parents=True, exist_ok=True)
            fname = sink_dir / f"part-{uuid.uuid4().hex}.parquet"
            pq.write_table(sub, fname, compression=self.compression)
            # per-rule partial counts for this sink slice
            agg = sub.group_by("rule_id").aggregate([("rule_id", "count"), ("parse_error", "sum")])
            for r in agg.to_pylist():
                rows["sink"].append(sink_val)
                rows["rule_id"].append(r["rule_id"])
                rows["n"].append(r["rule_id_count"])
                rows["parse_errors"].append(int(r["parse_error_sum"] or 0))
                rows["file"].append(str(fname))
        return pa.Table.from_pydict(rows, schema=SUMMARY_SCHEMA)
