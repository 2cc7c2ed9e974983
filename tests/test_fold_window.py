"""Continuation fold (vs the single-process oracle) and windowed operators
(vs DuckDB window SQL) — FIXTURES.md §5 invariant style."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pathlib import Path

from logray.gen import generate_corpus
from logray.oracle import OracleParser
from logray.stages.fold import fold_batch, fold_continuations
from logray.stages.parse import parse_batch_fn

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("fold_corpus")
    generate_corpus(0.004, d, partitions=2, with_expected=False)
    return d


def _parsed_table(corpus) -> pa.Table:
    t = pa.concat_tables([pq.read_table(p) for p in sorted(corpus.glob("*.parquet"))])
    return parse_batch_fn(t)


def _oracle_folded(parsed: pa.Table) -> pd.DataFrame:
    df = parsed.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    o = OracleParser()
    out = []
    for _, g in df.groupby("conv_id", sort=True):
        out.extend(o.fold_rows(g.to_dict("records")))
    return pd.DataFrame(out)


class TestFoldBatch:
    def test_matches_oracle_rowwise(self, corpus):
        parsed = _parsed_table(corpus)
        want = _oracle_folded(parsed)
        got = fold_batch(parsed).to_pandas()
        key = ["conv_id", "turn_idx"]
        got = got.sort_values(key, kind="mergesort").reset_index(drop=True)
        want = want.sort_values(key, kind="mergesort").reset_index(drop=True)
        assert len(got) == len(want)
        assert got["rule_id"].tolist() == want["rule_id"].tolist()
        assert got["n_folded"].tolist() == want["n_folded"].tolist()
        assert [list(c) for c in got["continuations"]] == want["continuations"].tolist()

    def test_count_parity(self, corpus):
        """folded + kept == input rows; fold never drops or duplicates."""
        parsed = _parsed_table(corpus)
        folded = fold_batch(parsed)
        assert folded.num_rows + sum(folded["n_folded"].to_pylist()) == parsed.num_rows

    def test_leading_continuations_kept(self):
        t = pa.table({
            "conv_id": ["c1"] * 4,
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "rule_id": ["R99_default", "R05_metric", "R99_default", "R99_default"],
            "text": ["garbage", "ok", "tb1", "tb2"],
        })
        out = fold_batch(t).to_pandas().sort_values("turn_idx")
        assert out["turn_idx"].tolist() == [0, 1]
        assert list(out["continuations"].iloc[0]) == []
        assert list(out["continuations"].iloc[1]) == ["tb1", "tb2"]
        assert out["n_folded"].tolist() == [0, 2]

    def test_all_continuation_conversation(self):
        """Continuation rows never anchor to another continuation: an
        all-unknown conversation stays row-for-row (kernel + oracle agree)."""
        t = pa.table({
            "conv_id": ["z"] * 3,
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "rule_id": ["R99_default"] * 3,
            "text": ["a", "b", "c"],
        })
        out = fold_batch(t)
        assert out.num_rows == 3
        assert out["n_folded"].to_pylist() == [0, 0, 0]
        got = list(OracleParser().fold_rows(t.to_pandas().to_dict("records")))
        assert [r["n_folded"] for r in got] == [0, 0, 0]
        assert [r["turn_idx"] for r in got] == [0, 1, 2]

    def test_fold_resets_at_conversation_boundary(self):
        t = pa.table({
            "conv_id": ["a", "a", "b"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "rule_id": ["R05_metric", "R99_default", "R99_default"],
            "text": ["x", "cont", "lead"],
        })
        out = fold_batch(t).to_pandas().sort_values(["conv_id", "turn_idx"])
        assert out["conv_id"].tolist() == ["a", "b"]
        assert list(out["continuations"].iloc[0]) == ["cont"]
        # b's leading continuation must NOT fold into a's event
        assert list(out["continuations"].iloc[1]) == []


class TestFoldDataset:
    def test_distributed_equals_local(self, ray_session, corpus):
        import ray.data

        parsed = _parsed_table(corpus)
        ds = ray.data.from_arrow(parsed).repartition(5)
        got = fold_continuations(ds.map_batches(lambda t: t, batch_format="pyarrow"))
        gdf = got.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want = fold_batch(parsed).to_pandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(gdf) == len(want)
        assert gdf["rule_id"].tolist() == want["rule_id"].tolist()
        assert gdf["n_folded"].tolist() == want["n_folded"].tolist()


class TestWindowOps:
    @pytest.fixture(scope="class")
    def con(self):
        c = duckdb.connect()
        c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')")
        return c

    def _events_ds(self):
        import ray.data

        return ray.data.read_parquet(EVENTS)

    def test_session_counts(self, ray_session, con):
        from logray.ops.window import session_counts

        got = session_counts(self._events_ds(), "user_id", "ts", 1800.0
                             ).to_pandas().sort_values("user_id").reset_index(drop=True)
        want = con.execute("""
            WITH g AS (SELECT user_id,
                epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
                FROM events)
            SELECT user_id, CAST(1 + count(*) FILTER (WHERE gap > 1800) AS BIGINT)
                AS n_sessions FROM g GROUP BY user_id ORDER BY user_id
        """).df()
        pd.testing.assert_frame_equal(got[["user_id", "n_sessions"]], want)

    def test_grouped_topn(self, ray_session, con):
        from logray.ops.window import grouped_topn

        got = grouped_topn(self._events_ds(), "event_type",
                           [("value", True), ("event_id", False)], 2)
        gdf = got.to_pandas().sort_values(["event_type", "rn"]).reset_index(drop=True)
        want = con.execute("""
            SELECT event_id, event_type, rn FROM (
                SELECT event_id, event_type, row_number() OVER (
                    PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
                FROM events) WHERE rn <= 2 ORDER BY event_type, rn
        """).df()
        assert gdf["event_id"].tolist() == want["event_id"].tolist()

    def test_asof_join_matches_merge_asof(self, ray_session):
        from logray.ops.window import asof_join

        ev = pq.read_table(EVENTS).to_pandas()
        left_df = ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
        right = (ev[ev.event_type == "click"]
                 .groupby(["user_id", "ts"], as_index=False)["value"].max()
                 .rename(columns={"value": "v"}))
        import ray.data

        got = asof_join(ray.data.from_pandas(left_df.reset_index(drop=True)),
                        right, by="user_id", on="ts", value_cols=["v"])
        gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
        want = pd.merge_asof(left_df.sort_values("ts"), right.sort_values("ts"),
                             on="ts", by="user_id").sort_values("event_id"
                             ).reset_index(drop=True)
        assert np.allclose(gdf["v"].to_numpy(dtype=float),
                           want["v"].to_numpy(dtype=float), equal_nan=True)


def test_tool_error_followup_matches_single_process(ray_session, tmp_path):
    """Distributed ordered analysis == single-process pandas reference."""
    import pandas as pd
    import pyarrow.parquet as pq

    from logray.gen import generate_corpus
    from logray.oracle import OracleParser
    from logray.pipelines.queries import _CORPUS_CACHE, tool_error_followup_transcripts

    # the query maps sf_dir name -> corpus scale; reuse the cached sf0.002 path
    sf_dir = tmp_path / "sf0.002"
    sf_dir.mkdir()
    corpus = Path(_CORPUS_CACHE) / "sf0.002"
    if not (corpus / "_meta.json").exists():
        generate_corpus(0.002, corpus)

    got = (tool_error_followup_transcripts(str(sf_dir)).to_pandas()
           .sort_values("tool").reset_index(drop=True))

    rows = pa.concat_tables(
        [pq.read_table(f) for f in sorted(corpus.glob("*.parquet"))]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).to_pylist()
    op = OracleParser()
    ev = [op.parse_row(r) for r in rows]
    df = pd.DataFrame([{"conv_id": e["conv_id"], "turn_idx": e["turn_idx"],
                        "rule_id": e["rule_id"], "tool": e["tool"]} for e in ev])
    df = df[df["rule_id"].isin(["R01_tool_call", "R03_tool_result_err"])]
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    nxt_rule = df.groupby("conv_id", sort=False)["rule_id"].shift(-1)
    nxt_turn = df.groupby("conv_id", sort=False)["turn_idx"].shift(-1)
    calls = df["rule_id"] == "R01_tool_call"
    err = (calls & (nxt_rule == "R03_tool_result_err") & (nxt_turn - df["turn_idx"] <= 3))
    want = (pd.DataFrame({"tool": df.loc[calls, "tool"], "err": err[calls].astype("int64")})
            .groupby("tool").agg(n_calls=("err", "size"), n_err_followed=("err", "sum"))
            .reset_index().sort_values("tool").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["tool", "n_calls", "n_err_followed"]], want, check_dtype=False)


def test_funnel_order_sensitive(ray_session):
    import pandas as pd
    import ray.data

    from logray.ops import window

    ts = pd.to_datetime
    df = pd.DataFrame([
        # user 1: full ordered funnel
        (1, ts("2024-01-01 10:00"), "view"),
        (1, ts("2024-01-01 10:05"), "click"),
        (1, ts("2024-01-01 10:10"), "purchase"),
        # user 2: purchase BEFORE click -> stops at stage 2
        (2, ts("2024-01-01 09:00"), "view"),
        (2, ts("2024-01-01 09:01"), "purchase"),
        (2, ts("2024-01-01 09:02"), "click"),
        # user 3: click only, never viewed -> no row (stage 0)
        (3, ts("2024-01-01 08:00"), "click"),
        # user 4: click at the SAME instant as view -> strictly-after fails
        (4, ts("2024-01-01 07:00"), "view"),
        (4, ts("2024-01-01 07:00"), "click"),
        # noise type is ignored
        (1, ts("2024-01-01 10:02"), "error"),
    ], columns=["user_id", "ts", "event_type"])
    out = window.funnel(ray.data.from_pandas(df), "user_id", "ts",
                        "event_type", ["view", "click", "purchase"],
                        num_buckets=3).to_pandas()
    got = dict(zip(out["user_id"], out["funnel_stage"]))
    assert got == {1: 3, 2: 2, 4: 1}


def test_session_ids_assignment(ray_session):
    import pandas as pd
    import ray.data

    from logray.ops import window

    ts = pd.to_datetime
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts": [ts("2024-01-01 10:00"), ts("2024-01-01 10:20"),
               ts("2024-01-01 12:00"), ts("2024-01-01 12:10"),
               ts("2024-01-01 10:00")],
        "event_id": [1, 2, 3, 4, 5]})
    out = window.session_ids(ray.data.from_pandas(df), "user_id", "ts",
                             gap_s=3600.0, keep_cols=["event_id"],
                             num_buckets=2).to_pandas()
    got = dict(zip(out["event_id"], out["session_id"]))
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_rolling_mean_centered_matches_naive(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from logray.ops import window

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 4, 200),
                       "o": np.arange(200),
                       "v": rng.integers(0, 100, 200).astype(float)})
    out = window.rolling_mean_centered(
        ray.data.from_pandas(df), "k", ["o"], "v", before=2, after=1,
        num_buckets=3, out_col="ca").to_pandas()
    for k, g in df.sort_values(["k", "o"]).groupby("k"):
        v = g["v"].to_numpy()
        want = [v[max(i - 2, 0):i + 2].mean() for i in range(len(v))]
        got = out[out["k"] == k].sort_values("o")["ca"].tolist()
        assert np.allclose(got, want)


def test_global_running_sum_matches_single_stream(ray_session):
    """Distributed prefix sum == pandas cumsum over the same total order,
    across partition boundaries, ties and negative carries."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from logray.ops.window import global_running_sum

    rng = np.random.default_rng(23)
    n = 4_000
    hours = rng.integers(0, 24, n)
    # ties on the order column inside and across hour buckets
    ts = hours * 3600 + rng.integers(0, 3600, n) // 7 * 7
    val = rng.integers(-5, 6, n)
    tie = np.arange(n, dtype=np.int64)  # unique final tiebreak
    t = pa.table({"hour": pa.array(hours, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "tie": pa.array(tie),
                  "val": pa.array(val, pa.int64())})
    out = global_running_sum(
        ray.data.from_arrow(t).repartition(16),
        ["ts", "val", "tie"], [True, False, True], "val", "hour"
    ).to_pandas().sort_values(["ts", "val", "tie"],
                              ascending=[True, False, True])
    ref = (pd.DataFrame({"ts": ts, "val": val, "tie": tie})
           .sort_values(["ts", "val", "tie"], ascending=[True, False, True]))
    assert (out["running"].to_numpy()
            == np.cumsum(ref["val"].to_numpy())).all()


def test_scd2_merge_equals_full_recompute(ray_session):
    """scd2_merge(scd2(prefix), suffix) == scd2(full) for a random
    change stream split at several points (the CDC-merge identity)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from logray.ops.window import scd2, scd2_merge

    rng = np.random.default_rng(71)
    n = 3_000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array((np.arange(n) * 1_000_000).astype("datetime64[us]")),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "state": pa.array(rng.choice(list("abc"), n))})

    def norm(ds):
        df = ds.to_pandas().sort_values(["k", "valid_from"]) \
            .reset_index(drop=True)
        return [tuple(r) for r in df[["k", "eid", "state", "valid_from",
                                      "valid_to", "is_current"]]
                .itertuples(index=False)]

    full = norm(scd2(ray.data.from_arrow(t).repartition(4), "k",
                     ["ts", "eid"], "state", "ts", keep_cols=["k", "eid"]))
    for cut in (1, 700, 2_999):
        base = ray.data.from_arrow(t.slice(0, cut)).repartition(3)
        suffix = ray.data.from_arrow(t.slice(cut)).repartition(3)
        hist = scd2(base, "k", ["ts", "eid"], "state", "ts",
                    keep_cols=["k", "eid"])
        merged = scd2_merge(hist, suffix, "k", ["ts", "eid"], "state",
                            "ts", keep_cols=["k", "eid"])
        assert norm(merged) == full, f"cut={cut}"
