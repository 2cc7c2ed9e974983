"""Input schema evolution: partitions written before/after a column change
must flow through the flagship unchanged — extra columns are ignored,
missing envelope columns degrade to all-null (absent optional field), and
row parity holds either way."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logray.gen import generate_corpus
from logray.pipelines.flagship import run_flagship
from logray.rules_transcripts import transcript_ruleset

SF = 0.002


@pytest.fixture()
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("evo")
    meta = generate_corpus(SF, d)
    return d, meta["n_turns"]


def test_extra_column_ignored(ray_session, corpus, tmp_path_factory):
    src, n_turns = corpus
    f = sorted(src.glob("*.parquet"))[0]
    t = pq.read_table(f)
    pq.write_table(t.append_column("new_meta", pa.array(["m"] * t.num_rows)), f)
    out = tmp_path_factory.mktemp("evo_out_extra")
    m = run_flagship(src, out, enrich_concurrency=2)
    assert m["rows"] == n_turns and m["parse_errors"] == 0


def test_missing_column_degrades_to_null(ray_session, corpus, tmp_path_factory):
    src, n_turns = corpus
    f = sorted(src.glob("*.parquet"))[0]
    pq.write_table(pq.read_table(f).drop(["tool"]), f)
    out = tmp_path_factory.mktemp("evo_out_missing")
    m = run_flagship(src, out, enrich_concurrency=2)
    assert m["rows"] == n_turns and m["parse_errors"] == 0  # row parity kept


def test_engine_fills_missing_passthrough_with_nulls():
    rs = transcript_ruleset()
    import datetime

    batch = pa.table({  # no 'tool', no 'ts'
        "conv_id": pa.array(["c1"]),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"]),
        "text": pa.array(["hello there"]),
    })
    out = rs.parse_batch(batch)
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["tool"] is None and row["ts"] is None
    assert row["rule_id"] == "R09_user_msg"  # role gate still dispatches
    assert row["conv_id"] == "c1"
    # a gate on a MISSING column must not match its rules
    t2 = pa.table({
        "conv_id": pa.array(["c2"]),
        "turn_idx": pa.array([0], pa.int32()),
        "text": pa.array(["[tool:search] ok id=1 bytes=2 dur_ms=3"]),
        "tool": pa.array(["search"]),
        "ts": pa.array([datetime.datetime(2026, 1, 1)], pa.timestamp("us")),
    })  # no 'role' → role-gated rules (all non-default) skip → default
    out2 = rs.parse_batch(t2).to_pylist()[0]
    assert out2["rule_id"] == "R99_default"
