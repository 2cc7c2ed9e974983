"""Compat generator: the reference's ``parse_log(fileobj, **extras)`` call
shape over the vectorized engine — ordered dicts, continuation folding,
extras injection, batch-boundary correctness."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from logray.compat import parse_log
from logray.gen import generate_corpus
from logray.oracle import OracleParser
from logray.sources import render_raw_log


def test_ordered_events_with_extras(tmp_path):
    generate_corpus(0.002, tmp_path / "c", with_expected=False)
    files = render_raw_log(tmp_path / "c", tmp_path / "r")
    with open(files[0]) as fh:
        events = list(parse_log(fh, node="n1"))

    src = pq.read_table(sorted((tmp_path / "c").glob("*.parquet"))[0])
    src = src.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert len(events) == src.num_rows
    # input order == (conv_id, turn_idx) order for a rendered partition
    got_keys = [(e["conv_id"], e["turn_idx"]) for e in events]
    want_keys = list(zip(src["conv_id"].to_pylist(), src["turn_idx"].to_pylist()))
    assert got_keys == want_keys
    assert all(e["node"] == "n1" for e in events)

    # field-level parity vs the single-process oracle parser
    op = OracleParser()
    for e, row in zip(events[:200], src.to_pylist()[:200]):
        want = op.parse_row(row)
        for k, v in want.items():
            gv = e.get(k)
            if isinstance(v, float) and isinstance(gv, float):
                assert abs(v - gv) < 1e-9, k
            else:
                assert gv == v, (k, gv, v)


@pytest.mark.parametrize("batch_lines", [3, 8192])
def test_continuation_folding_across_batches(batch_lines):
    lines = [
        "garbage before any event",
        "2026-01-01T00:00:00.000000 [user] c1#0 tool= :: hello there friend",
        "java.lang.RuntimeException: boom",
        "    at Frame.one(Frame.java:1)",
        "2026-01-01T00:00:10.000000 [assistant] c1#1 tool= :: sure thing pal",
        "trailing junk",
    ]
    events = list(parse_log(iter(lines), batch_lines=batch_lines))
    assert [e["rule_id"] for e in events] == ["__orphan__", "R09_user_msg",
                                              "R10_assist_msg"]
    assert events[1]["continuations"] == ["java.lang.RuntimeException: boom",
                                          "    at Frame.one(Frame.java:1)"]
    assert events[2]["continuations"] == ["trailing junk"]


def test_empty_source():
    assert list(parse_log(iter([]))) == []
