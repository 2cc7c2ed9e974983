"""Versioned-table layer: snapshot isolation, time travel, CoW upsert,
file diff, vacuum retention and crashed-commit hygiene."""

from __future__ import annotations

import json

import pyarrow as pa

from logray.state import versioned


def _t(ids, vals):
    return pa.table({"id": pa.array(list(ids), pa.int64()),
                     "v": pa.array(list(vals), pa.int64())})


def _rows(ds):
    df = ds.to_pandas()
    return sorted(zip(df["id"], df["v"]))


def test_commit_timetravel_upsert_and_diff(ray_session, tmp_path):
    d = tmp_path / "tbl"
    v1 = versioned.commit(d, [_t(range(10), range(10))], op="insert")
    assert v1 == 1
    v2 = versioned.commit(d, [_t(range(10, 15), range(10, 15))],
                          op="append")
    # upsert: rewrite the file holding ids 0-9 with doubled values,
    # carrying everything else by reference
    m1_files = json.loads(
        (d / "v000001.manifest.json").read_text())["files"]
    assert len(m1_files) == 1
    v3 = versioned.commit(
        d, [_t(range(10), [2 * i for i in range(10)])],
        op="upsert", drop_files=m1_files)

    assert versioned.versions(d) == [1, 2, 3]
    assert _rows(versioned.read(d, 1)) == [(i, i) for i in range(10)]
    assert _rows(versioned.read(d, 2)) == [(i, i) for i in range(15)]
    assert _rows(versioned.read(d)) == (
        [(i, 2 * i) for i in range(10)]
        + [(i, i) for i in range(10, 15)])

    diff = versioned.file_diff(d, 2, 3)
    assert len(diff["added"]) == 1 and diff["removed"] == m1_files


def test_vacuum_retention_and_crash_hygiene(ray_session, tmp_path):
    d = tmp_path / "tbl"
    versioned.commit(d, [_t([1], [1])])
    f1 = json.loads((d / "v000001.manifest.json").read_text())["files"]
    versioned.commit(d, [_t([2], [2])], op="upsert", drop_files=f1)
    (d / ".v000099.tmp").write_text("{}")  # crashed commit leftover

    rep = versioned.vacuum(d, keep_last=1, dry_run=True)
    assert rep["dropped_versions"] == [1]
    assert (d / "v000001.manifest.json").exists()  # dry run touches nothing

    rep = versioned.vacuum(d, keep_last=1)
    assert rep["dropped_versions"] == [1]
    assert f1[0] in rep["deleted_files"]  # unreferenced by kept v2
    assert ".v000099.tmp" in rep["deleted_files"]
    assert versioned.versions(d) == [2]
    assert _rows(versioned.read(d)) == [(2, 2)]
    assert not (d / f1[0]).exists()
