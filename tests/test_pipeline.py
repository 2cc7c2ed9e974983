"""End-to-end invariants (FIXTURES.md §5) over the generated transcript table:
count parity, routed-row equality, per-turn text equality vs the oracle,
salted-aggregate exactness, resume idempotence, determinism."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from logray.gen import generate_corpus
from logray.oracle import OracleParser
from logray.pipelines import aggregates
from logray.pipelines.flagship import read_sink, run_flagship
from logray.rules_transcripts import SINKS, TRANSCRIPT_RULES
from logray.state import manifests

SF = 0.002  # ~200 convs, ~1.7k turns — fast but covers every rule

RULE_SINK = {r.rule_id: r.sink for r in TRANSCRIPT_RULES}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    meta = generate_corpus(SF, d)
    return d, meta


@pytest.fixture(scope="module")
def flagship_run(ray_session, corpus, tmp_path_factory):
    in_dir, meta = corpus
    out = tmp_path_factory.mktemp("out")
    metrics = run_flagship(in_dir, out, enrich_concurrency=2)
    return in_dir, meta, out, metrics


def test_count_parity(flagship_run):
    """Invariant 1: per-(sink, rule) aggregate counts == analytic counts."""
    _, meta, out, metrics = flagship_run
    agg = pq.read_table(out / "_aggregates.parquet").to_pylist()
    got = {(r["sink"], r["rule_id"]): r["n"] for r in agg}
    want = {(RULE_SINK[rid], rid): n for rid, n in meta["rule_counts"].items()}
    assert got == want
    assert metrics["rows"] == meta["n_turns"]
    assert metrics["parse_errors"] == 0


def test_routed_row_equality_and_text_order(flagship_run):
    """Invariant 2: each input row in exactly one sink; union == oracle parse;
    per-turn text equality under stable (conv_id, turn_idx) ordering."""
    in_dir, meta, out, _ = flagship_run
    sink_tables = []
    for s in SINKS:
        files = manifests.manifest_files(out, s)
        if files:
            t = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
            sink_tables.append(t)
    union = pa.concat_tables(sink_tables, promote_options="default")
    assert union.num_rows == meta["n_turns"]

    # exactly-one-sink: (conv_id, turn_idx) unique across the union
    keys = union.select(["conv_id", "turn_idx"])
    assert keys.group_by(["conv_id", "turn_idx"]).aggregate([("conv_id", "count")]).num_rows \
        == meta["n_turns"]

    # stable-order text equality + full field equality vs the oracle parser
    union = union.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    inputs = pa.concat_tables([pq.read_table(f) for f in sorted(Path(in_dir).glob("*.parquet"))])
    inputs = inputs.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert union["text"].to_pylist() == inputs["text"].to_pylist()

    op = OracleParser()
    got_rows = union.to_pylist()
    for i, row in enumerate(inputs.to_pylist()):
        o = op.parse_row(row)
        g = got_rows[i]
        for k, v in o.items():
            gv = g.get(k)
            if isinstance(v, float) and isinstance(gv, float):
                assert abs(v - gv) < 1e-9, (i, k)
            else:
                assert gv == v, (i, k, gv, v)


def test_enriched_columns(flagship_run):
    """Enrich stage: lookups present with frozen FIXTURES.md §3 semantics."""
    _, _, out, _ = flagship_run
    files = manifests.manifest_files(out, "sink_action")
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert {"role_code", "role_group", "tool_tier", "cost_class", "conv_bucket",
            "bucket_label"} <= set(t.column_names)
    # tool rows in sink_action have known tools -> never 'unknown'
    ok_rows = t.filter(pc.equal(t["rule_id"], "R02_tool_result_ok"))
    assert pc.all(pc.not_equal(ok_rows["tool_tier"], "unknown")).as_py()
    # role codes follow the frozen dict
    tool_rows = t.filter(pc.equal(t["role"], "tool"))
    assert pc.all(pc.equal(tool_rows["role_code"], 3)).as_py()
    dialogue = pa.concat_tables(
        [pq.read_table(f) for f in manifests.manifest_files(out, "sink_dialogue")])
    no_tool = dialogue.filter(pc.equal(dialogue["tool"], ""))
    assert pc.all(pc.equal(no_tool["tool_tier"], "unknown")).as_py()
    assert pc.all(no_tool["cost_class"].is_null()).as_py()


def test_salted_counts_exact(ray_session, flagship_run):
    """Invariant 1 (salted path): salted per-conv counts == plain groupby."""
    import ray.data

    in_dir, meta, _, _ = flagship_run
    ds = ray.data.read_parquet([str(f) for f in sorted(Path(in_dir).glob("*.parquet"))])
    salted = {r["conv_id"]: r["n"] for r in
              aggregates.salted_group_counts(ds, "conv_id", salt=8).take_all()}
    plain = {r["conv_id()"] if "conv_id()" in r else r["conv_id"]: r["count()"]
             for r in ds.groupby("conv_id").count().take_all()}
    assert salted == plain
    assert sum(salted.values()) == meta["n_turns"]


def test_sink_rule_counts_shuffle_matches_manifest(ray_session, flagship_run):
    """Cross-check: shuffle-based aggregate == manifest-rollup aggregate."""
    import ray.data

    in_dir, _, out, _ = flagship_run
    from logray.stages.parse import parse_batch_fn

    ds = ray.data.read_parquet([str(f) for f in sorted(Path(in_dir).glob("*.parquet"))])
    parsed = ds.map_batches(parse_batch_fn, batch_format="pyarrow", zero_copy_batch=True)
    shuffle = {(r["sink"], r["rule_id"]): r["n"]
               for r in aggregates.sink_rule_counts(parsed).take_all()}
    agg = pq.read_table(out / "_aggregates.parquet").to_pylist()
    rollup = {(r["sink"], r["rule_id"]): r["n"] for r in agg}
    assert shuffle == rollup


def test_resume_skips_committed_and_is_idempotent(ray_session, corpus, tmp_path_factory):
    """Invariant 3: delete some manifests, rerun — identical aggregates, no
    duplicated rows; committed partitions are skipped."""
    in_dir, meta = corpus
    out = tmp_path_factory.mktemp("resume_out")
    m1 = run_flagship(in_dir, out, enrich_concurrency=2)
    agg1 = pq.read_table(out / "_aggregates.parquet")
    assert len(m1["partitions_ran"]) == meta["partitions"]

    # simulate a crash after k partitions: drop 3 manifests (+ their files)
    victims = m1["partitions_ran"][:3]
    for pid in victims:
        shutil.rmtree(manifests.partition_dir(out, pid))
    m2 = run_flagship(in_dir, out, enrich_concurrency=2)
    assert sorted(m2["partitions_ran"]) == sorted(victims)
    assert sorted(m2["partitions_skipped"]) == sorted(set(p for p, _ in
                  [(p, None) for p in m1["partitions_ran"]]) - set(victims))
    agg2 = pq.read_table(out / "_aggregates.parquet")
    assert agg1.equals(agg2)
    assert m2["rows"] == meta["n_turns"]

    # orphan sweep finds nothing after clean runs
    assert manifests.sweep_orphans(out, dry_run=True) == []


def test_orphan_files_invisible(ray_session, corpus, tmp_path_factory):
    """A stray file from a failed attempt is not referenced and gets swept."""
    in_dir, _, = corpus[0], corpus[1]
    in_dir = corpus[0]
    out = tmp_path_factory.mktemp("orphan_out")
    run_flagship(in_dir, out, enrich_concurrency=2)
    victim_dir = next(Path(out).glob("partition=*/sink=sink_dialogue"))
    orphan = victim_dir / "part-deadbeef.parquet"
    shutil.copyfile(next(victim_dir.glob("*.parquet")), orphan)
    assert str(orphan) not in manifests.manifest_files(out)
    swept = manifests.sweep_orphans(out)
    assert [str(orphan)] == swept and not orphan.exists()


def test_metrics_json_written(flagship_run):
    _, meta, out, _ = flagship_run
    m = json.loads((out / "_metrics.json").read_text())
    assert m["rows"] == meta["n_turns"]
    assert 0 < m["matched_pct"] < 100


def test_two_runs_byte_identical(ray_session, corpus, tmp_path_factory):
    """Invariant 5: two independent full runs produce byte-identical
    aggregate artifacts (deterministic despite parallel execution)."""
    in_dir, _ = corpus
    outs = []
    for name in ("det_a", "det_b"):
        out = tmp_path_factory.mktemp(name)
        run_flagship(in_dir, out, enrich_concurrency=2)
        outs.append(out)
    a = (outs[0] / "_aggregates.parquet").read_bytes()
    b = (outs[1] / "_aggregates.parquet").read_bytes()
    assert a == b
    ma = json.loads((outs[0] / "_metrics.json").read_text())
    mb = json.loads((outs[1] / "_metrics.json").read_text())
    for k in ("rows", "parse_errors", "unknown_rows", "matched_pct"):
        assert ma[k] == mb[k], k


def test_pid_deriver_equals_path_stem(ray_session, tmp_path):
    """r4 bytes/row reduction: the conv_id-derived partition id must
    equal the file-stem pid for EVERY row, on both the plain and the
    replicated corpus layout — and run_flagship picks the derived path
    (no per-row path column) with identical manifests/aggregates."""
    import json

    import pyarrow.parquet as pq_

    from logray.gen import generate_corpus, replicate_corpus
    from logray.pipelines import flagship

    corpus = tmp_path / "c"
    generate_corpus(0.002, corpus, with_expected=False)
    rep = tmp_path / "r"
    replicate_corpus(corpus, rep, 3)

    for d in (corpus, rep):
        parts = flagship.discover_partitions(d)
        fn = flagship.pid_deriver(d, parts)
        assert fn is not None, d
        for stem, files in parts.items():
            t = pq_.read_table(files[0], columns=["conv_id"])
            out = fn(t)
            got = set(out[flagship.PID_COL].to_pylist())
            assert got == {stem}, (stem, got)

    # end-to-end equality: derived-pid run == forced path-column run
    out_a = tmp_path / "out_a"
    out_b = tmp_path / "out_b"
    flagship.run_flagship(corpus, out_a, wave_size=2,
                          enrich_concurrency=2)
    import unittest.mock as mock

    with mock.patch.object(flagship, "pid_deriver",
                           lambda *a, **k: None):
        flagship.run_flagship(corpus, out_b, wave_size=2,
                              enrich_concurrency=2)
    agg_a = pq_.read_table(out_a / "_aggregates.parquet").to_pylist()
    agg_b = pq_.read_table(out_b / "_aggregates.parquet").to_pylist()
    assert agg_a == agg_b
    ma = json.loads((out_a / "_metrics.json").read_text())
    mb = json.loads((out_b / "_metrics.json").read_text())
    assert ma["rows"] == mb["rows"] and ma["matched_pct"] == mb["matched_pct"]


def test_pid_deriver_rejects_foreign_corpus(tmp_path):
    """r5 ADVICE fix: a FOREIGN corpus whose directory matches the
    generator's shape (``_meta.json`` + ``part-NN`` / ``part-rK-NN``
    names) but whose conv_id scheme differs must NOT get a derived
    pid — the build-time sample gate returns None so the path-column
    fold routes rows by their actual source file, and the replicated
    fold never mis-hashes or dies on ``u.index('c')``."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from logray.pipelines import flagship

    def mk(d, names, conv_ids):
        d.mkdir()
        (d / "_meta.json").write_text(json.dumps({"foreign": True}))
        for name, cid in zip(names, conv_ids):
            pq_.write_table(
                pa.table({"conv_id": pa.array([cid] * 4),
                          "turn_idx": pa.array(range(4), pa.int32()),
                          "text": pa.array(["x"] * 4)}),
                d / f"{name}.parquet")

    # plain shape, foreign ids: crc32 routing disagrees with stems
    a = tmp_path / "a"
    mk(a, ["part-00", "part-01"], ["sess-alpha", "sess-beta"])
    assert flagship.pid_deriver(a, flagship.discover_partitions(a)) \
        is None

    # replicated shape, ids lacking the r<K>c... scheme entirely:
    # the old u.index('c') would raise; the gate must just return None
    b = tmp_path / "b"
    mk(b, ["part-r0-00", "part-r1-00"], ["0123-9", "9876-1"])
    assert flagship.pid_deriver(b, flagship.discover_partitions(b)) \
        is None

    # genuine generator corpus still derives (regression guard for
    # the gate itself)
    from logray.gen import generate_corpus

    c = tmp_path / "c"
    generate_corpus(0.002, c, with_expected=False)
    assert flagship.pid_deriver(c, flagship.discover_partitions(c)) \
        is not None
