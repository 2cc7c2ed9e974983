"""Raw-text source round-trip (SURVEY.md §2 B5/B1): corpus → rendered
.log files → read_text + envelope regex → exact transcript reconstruction
→ rule-engine parity with the Parquet path."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from logray.gen import generate_corpus
from logray.sources import envelope_parse, read_raw_log, render_raw_log


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("src_corpus")
    meta = generate_corpus(0.002, d, with_expected=False)
    return d, meta


def test_roundtrip_exact(ray_session, corpus, tmp_path_factory):
    """Every column survives render → ingest byte-identically, including
    multi-line noise texts; unmatched lines never occur on clean input."""
    in_dir, meta = corpus
    raw = tmp_path_factory.mktemp("rawlog")
    files = render_raw_log(in_dir, raw)
    assert len(files) == meta["partitions"]

    got = (read_raw_log(raw).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want = pa.concat_tables(
        [pq.read_table(f) for f in sorted(in_dir.glob("*.parquet"))]
    ).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert len(got) == meta["n_turns"]
    assert not got["envelope_error"].any()
    for col in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        assert got[col].tolist() == want[col].tolist(), col


def test_unmatched_lines_survive():
    """Reference default semantics: garbage lines yield error rows, not
    dropped rows."""
    t = pa.table({"text": [
        "2026-01-01T00:00:00.000000 [user] c1#0 tool= :: hi there",
        "not a log line at all",
        "",
    ]})
    out = envelope_parse(t)
    assert out.num_rows == 3
    assert out["envelope_error"].to_pylist() == [False, True, True]
    assert out["conv_id"].to_pylist()[1] is None
    assert out["text"].to_pylist()[0] == "hi there"


def test_rule_parity_with_parquet_path(ray_session, corpus, tmp_path_factory):
    """Per-rule histogram via the raw-text path == analytic corpus counts."""
    import ray.data

    from logray.stages.parse import parse_batch_fn

    in_dir, meta = corpus
    raw = tmp_path_factory.mktemp("rawlog2")
    render_raw_log(in_dir, raw)
    parsed = read_raw_log(raw).map_batches(
        lambda t: parse_batch_fn(t.drop(["envelope_error"])),
        batch_format="pyarrow")
    hist: dict[str, int] = {}
    for b in parsed.iter_batches(batch_format="pyarrow", batch_size=65536):
        for r in b.group_by("rule_id").aggregate([("rule_id", "count")]).to_pylist():
            hist[r["rule_id"]] = hist.get(r["rule_id"], 0) + r["rule_id_count"]
    assert hist == meta["rule_counts"]


def test_gzip_roundtrip(ray_session, corpus, tmp_path_factory):
    """Compressed ingestion: .log.gz renders + reads back identically."""
    in_dir, meta = corpus
    raw = tmp_path_factory.mktemp("rawgz")
    files = render_raw_log(in_dir, raw, compression="gzip")
    assert all(f.endswith(".log.gz") for f in files)
    got = read_raw_log(raw)
    assert got.count() == meta["n_turns"]
    assert not got.to_pandas()["envelope_error"].any()


def test_ipc_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from logray import sources

    t = pa.table({"a": pa.array(range(100), pa.int64()),
                  "s": [f"v{i}" for i in range(100)]})
    n = sources.write_ipc(ray.data.from_arrow(t), tmp_path)
    assert n == 100
    back = sources.read_ipc(tmp_path).to_pandas().sort_values("a")
    assert back["a"].tolist() == list(range(100))
    assert back["s"].iloc[3] == "v3"


def test_tar_shard_roundtrip(ray_session, tmp_path):
    """Pack → read_tar_shards explode: every member returns byte-identical
    from the right shard; archives are deterministic (fixed mtime)."""
    import pyarrow.parquet as pq

    from logray.ops.multimodal import make_tar_shards
    from logray.sources import read_tar_shards

    meta = make_tar_shards(tmp_path, n=24, shards=3)
    assert meta == {"shards": 3, "members": 24, "dir": str(tmp_path)}
    truth = pq.read_table(tmp_path / "truth.parquet").to_pandas() \
        .set_index("media_id")
    got = read_tar_shards(tmp_path).to_pandas()
    assert len(got) == 24
    for r in got.itertuples():
        mid = int(r.member.split(".")[0])
        t = truth.loc[mid]
        assert r.shard == t["shard"]
        assert len(r.payload) == t["n_bytes"]
        assert r.payload.startswith(b"P6\n")
    # determinism: re-pack elsewhere -> identical shard bytes
    import hashlib
    d2 = tmp_path / "again"
    make_tar_shards(d2, n=24, shards=3)
    for k in range(3):
        a = (tmp_path / f"shard-{k:02d}.tar").read_bytes()
        b = (d2 / f"shard-{k:02d}.tar").read_bytes()
        assert hashlib.sha256(a).digest() == hashlib.sha256(b).digest()


def test_warc_record_walk_and_hazards():
    """Spec-exact WARC walk: fixture shards parse to the sidecar truth
    (plain and multi-member-gzip shards identically); bad version lines,
    missing mandatory headers, truncated blocks, missing CRLFCRLF
    terminators, non-integer Content-Length, truncated gzip members and
    malformed HTTP payloads all raise ValueError."""
    import gzip
    import zlib
    from pathlib import Path

    import pyarrow.parquet as pq
    import pytest

    from logray.sources import (_gunzip_members, http_response_split,
                                make_warc_shards, warc_split_records)

    d = Path("/tmp/logray/test_warc_fixture")
    make_warc_shards(d, n=40, shards=4)
    truth = pq.read_table(d / "truth.parquet").to_pydict()

    got = {}
    for f in sorted(d.glob("*.warc")) + sorted(d.glob("*.warc.gz")):
        blob = f.read_bytes()
        if f.name.endswith(".gz"):
            blob = _gunzip_members(blob)
        for fields, block in warc_split_records(blob):
            if fields["warc-type"] != "response":
                continue
            status, headers, body = http_response_split(block)
            is_robots = fields["warc-target-uri"].endswith("/robots.txt")
            assert headers["content-type"] == (
                "text/plain" if is_robots else "text/html")
            got[fields["warc-record-id"]] = (f.name, status, len(body),
                                             zlib.crc32(body))
    assert len(got) == 40 + 12  # pages + one robots.txt per host
    for i, rid in enumerate(truth["rec_id"]):
        assert got[rid] == (truth["shard"][i], truth["status"][i],
                            truth["n_bytes"][i], truth["body_crc32"][i])

    def rec(headers: str, block: bytes, version=b"WARC/1.0") -> bytes:
        return (version + b"\r\n" + headers.encode()
                + f"Content-Length: {len(block)}\r\n\r\n".encode()
                + block + b"\r\n\r\n")

    base_hdr = ("WARC-Type: resource\r\nWARC-Record-ID: <urn:uuid:x>\r\n"
                "WARC-Date: 2026-01-01T00:00:00Z\r\n")
    good = rec(base_hdr, b"hello")
    assert len(warc_split_records(good * 3)) == 3

    with pytest.raises(ValueError, match="bad version"):
        warc_split_records(rec(base_hdr, b"x", version=b"WARC/9.9"))
    with pytest.raises(ValueError, match="missing mandatory"):
        warc_split_records(rec("WARC-Type: resource\r\n", b"x"))
    with pytest.raises(ValueError, match="truncated record block"):
        warc_split_records(good[:-6])
    with pytest.raises(ValueError, match="CRLFCRLF"):
        warc_split_records(good[:-4] + b"XX\r\n")
    with pytest.raises(ValueError, match="non-integer Content-Length"):
        warc_split_records(b"WARC/1.0\r\n" + base_hdr.encode()
                           + b"Content-Length: ten\r\n\r\nx\r\n\r\n")
    with pytest.raises(ValueError, match="missing header terminator"):
        warc_split_records(b"WARC/1.0\r\nWARC-Type: resource\r\n")
    with pytest.raises(ValueError, match="truncated gzip member"):
        _gunzip_members(gzip.compress(good, mtime=0)[:-5])
    with pytest.raises(ValueError, match="http payload missing"):
        http_response_split(b"HTTP/1.1 200 OK\r\nonly-headers: 1\r\n")
    with pytest.raises(ValueError, match="bad http status"):
        http_response_split(b"GET / HTTP/1.1\r\n\r\nbody")
    with pytest.raises(ValueError, match="non-integer http status"):
        http_response_split(b"HTTP/1.1 2xx Z\r\n\r\nbody")


def test_avro_codec_roundtrip_and_hazards():
    """From-scratch Avro object-container codec: zigzag varint edge
    values, every datum type through encode→decode, container round-trip
    under both codecs with truth-sidecar parity, and crafted foreign
    streams (bad magic, unknown codec, sync mismatch, truncated/overlong
    varints, out-of-range enum/union indexes, truncated blocks, trailing
    bytes) all raise ValueError."""
    import hashlib
    import io
    from pathlib import Path

    import pyarrow.parquet as pq
    import pytest

    from logray.ops.avrocodec import (MAGIC, decode_datum, decode_long,
                                      encode_datum, encode_long,
                                      read_container, write_container)
    from logray.sources import AVRO_TURN_SCHEMA, make_avro_shards

    # zigzag varint: spec edge values round-trip
    for v in (0, -1, 1, -2, 63, 64, -64, -65, 2**31 - 1, -2**31,
              2**63 - 1, -2**63):
        assert decode_long(io.BytesIO(encode_long(v))) == v
    assert encode_long(0) == b"\x00" and encode_long(-1) == b"\x01"
    assert encode_long(1) == b"\x02" and encode_long(-2) == b"\x03"

    # every datum type round-trips (incl. nested record + both union arms)
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "by", "type": "bytes"},
        {"name": "u", "type": ["null", "string"]},
        {"name": "a", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "e", "type": {"type": "enum", "name": "e_", "symbols":
                               ["x", "y"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {"name": "nest", "type": {"type": "record", "name": "n",
                                  "fields": [{"name": "s",
                                              "type": "string"}]}},
    ]}
    for u in ("hello", None):
        val = {"b": True, "i": -7, "f": 0.5, "d": 2.25, "by": b"\x00\xff",
               "u": u, "a": [1, -2, 3], "m": {"k": "v", "z": ""},
               "e": "y", "fx": b"abcd", "nest": {"s": "s"}}
        assert decode_datum(sch, io.BytesIO(encode_datum(sch, val))) == val
    # empty array/map take the zero-count fast path
    val0 = dict(val, a=[], m={})
    assert decode_datum(sch, io.BytesIO(encode_datum(sch, val0))) == val0

    # container round-trip under both codecs, fixture vs sidecar truth
    d = Path("/tmp/logray/test_avro_fixture")
    make_avro_shards(d, n=36, shards=4)
    truth = pq.read_table(d / "truth.parquet").to_pydict()
    got = {}
    codecs = set()
    for f in sorted(d.glob("*.avro")):
        schema, recs = read_container(f.read_bytes())
        assert schema == AVRO_TURN_SCHEMA
        codecs.add(f.read_bytes()[:4] == MAGIC)
        for r in recs:
            got[(f.name, r["conv_id"], r["turn_idx"])] = r
    assert len(got) == 36
    for i in range(36):
        r = got[(truth["shard"][i], truth["conv_id"][i],
                 truth["turn_idx"][i])]
        assert r["role"] == truth["role"][i]
        assert r["tool"] == truth["tool"][i]
        assert len(r["text"]) == truth["n_chars"][i]
        assert r["ts"] == truth["ts_micros"][i]
        assert len(r["flags"]) == truth["n_flags"][i]
        assert sum(r["attrs"].values()) == truth["attr_sum"][i]
        assert r["fp"].hex() == truth["fp_hex"][i]

    # hazards: crafted foreign streams must raise, never mis-decode
    sync = hashlib.md5(b"t").digest()
    good = write_container(sch, [val], sync, codec="deflate")
    assert read_container(good)[1] == [val]
    with pytest.raises(ValueError, match="bad magic"):
        read_container(b"Obj\x02" + good[4:])
    with pytest.raises(ValueError, match="unsupported codec"):
        read_container(write_container(sch, [], sync, codec="snappy"))
    bad_sync = bytearray(good)
    bad_sync[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker mismatch"):
        read_container(bytes(bad_sync))
    with pytest.raises(ValueError, match="truncated data block"):
        read_container(good[:-20])
    with pytest.raises(ValueError, match="truncated varint"):
        decode_long(io.BytesIO(b"\x80\x80"))
    with pytest.raises(ValueError, match="longer than 10"):
        decode_long(io.BytesIO(b"\x80" * 11))
    with pytest.raises(ValueError, match="enum index"):
        decode_datum({"type": "enum", "name": "e", "symbols": ["x"]},
                     io.BytesIO(encode_long(5)))
    with pytest.raises(ValueError, match="union index"):
        decode_datum(["null", "string"], io.BytesIO(encode_long(2)))
    with pytest.raises(ValueError, match="truncated bytes"):
        decode_datum("string", io.BytesIO(encode_long(10) + b"ab"))
    with pytest.raises(ValueError, match="corrupt deflate"):
        blk = write_container(sch, [val], sync, codec="deflate")
        # flip a byte inside the deflate body (after header+sync)
        hdr_end = blk.index(sync) + 16
        bad = bytearray(blk)
        bad[hdr_end + 3] ^= 0xFF
        read_container(bytes(bad))
    with pytest.raises(ValueError, match="missing avro.schema"):
        read_container(MAGIC + encode_long(0) + sync)


def test_avro_shard_reader(ray_session):
    """read_avro_shards end-to-end: Arrow-typed Dataset matches the
    sidecar truth row-for-row, nullable union + map/list columns intact;
    fixture packing is deterministic."""
    import hashlib
    from pathlib import Path

    import pyarrow.parquet as pq

    from logray.sources import make_avro_shards, read_avro_shards

    d = Path("/tmp/logray/test_avro_fixture2")
    make_avro_shards(d, n=48, shards=4)
    got = read_avro_shards(d).to_pandas()
    assert len(got) == 48
    truth = pq.read_table(d / "truth.parquet").to_pandas()
    t = truth.set_index(["shard", "conv_id", "turn_idx"])
    n_null_tool = 0
    for r in got.itertuples():
        tr = t.loc[(r.shard, r.conv_id, r.turn_idx)]
        assert tr["role"] == r.role
        if r.tool is None:
            n_null_tool += 1
            assert tr["tool"] is None
        else:
            assert tr["tool"] == r.tool
        assert tr["n_chars"] == len(r.text)
        # ts surfaces as timestamp[us] (Avro logicalType) — compare micros
        import pandas as pd
        assert tr["ts_micros"] == pd.Timestamp(r.ts).value // 1000
        assert tr["n_flags"] == len(r.flags)
        assert tr["attr_sum"] == sum(v for _, v in r.attrs)
        assert tr["fp_hex"] == r.fp.hex()
    assert n_null_tool > 0  # the union's null arm is actually exercised
    d2 = Path("/tmp/logray/test_avro_fixture3")
    make_avro_shards(d2, n=48, shards=4)
    for f in sorted(d.glob("*.avro")):
        a = f.read_bytes()
        b = (d2 / f.name).read_bytes()
        assert hashlib.sha256(a).digest() == hashlib.sha256(b).digest()


def test_lz4_codec_conformance_and_hazards():
    """From-scratch LZ4: xxHash32 public vectors, block + frame
    round-trips over varied content, BIDIRECTIONAL conformance against
    pyarrow's real LZ4-frame codec (a foreign implementation — stronger
    than self-round-trip), and crafted foreign streams all raise."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from logray.ops.lz4codec import (compress_block, compress_frame,
                                     decompress_block, decompress_frame,
                                     xxh32)

    # public xxHash32 vectors (seed 0)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert xxh32(b"abc", seed=1) != xxh32(b"abc")

    rng = np.random.default_rng(11)
    cases = [b"", b"x", b"hello world " * 40, bytes(20),
             bytes(rng.integers(0, 4, 5000, dtype=np.uint8) + 97),
             bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
             b"ab" * 40000]
    for c in cases:
        assert decompress_block(compress_block(c), max(len(c), 1) + 1) == c
        for kw in ({}, {"block_checksums": True, "content_size": True},
                   {"block_size_code": 5, "content_checksum": False}):
            assert decompress_frame(compress_frame(c, **kw)) == c

    # bidirectional conformance vs pyarrow's LZ4-frame codec
    if pa.Codec.is_available("lz4"):
        arrow = pa.Codec("lz4")
        for c in cases:
            assert arrow.decompress(
                compress_frame(c, block_checksums=True),
                len(c)).to_pybytes() == c
            assert decompress_frame(bytes(arrow.compress(c))) == c

    # hazards — every crafted stream must raise, never mis-decode
    def with_desc(flg: int, bd: int, rest: bytes) -> bytes:
        desc = bytes([flg, bd])
        return (good[:4] + desc + bytes([(xxh32(desc) >> 8) & 0xFF])
                + rest)

    good = compress_frame(b"payload " * 100, block_checksums=True)
    with pytest.raises(ValueError, match="bad magic"):
        decompress_frame(b"\x00" + good[1:])
    with pytest.raises(ValueError, match="header checksum"):
        bad = bytearray(good)
        bad[6] ^= 0xFF  # the HC byte itself
        decompress_frame(bytes(bad))
    with pytest.raises(ValueError, match="reserved/dict FLG"):
        decompress_frame(with_desc(good[4] | 0x01, good[5], good[7:]))
    with pytest.raises(ValueError, match="unsupported frame version"):
        decompress_frame(with_desc(good[4] & 0x3F | 0x80, good[5],
                                   good[7:]))
    with pytest.raises(ValueError, match="reserved BD"):
        decompress_frame(with_desc(good[4], good[5] | 0x08, good[7:]))
    with pytest.raises(ValueError, match="block checksum mismatch"):
        bad = bytearray(good)
        bad[-9] ^= 0xFF  # last block's stored checksum region
        decompress_frame(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decompress_frame(good[:10])
    with pytest.raises(ValueError, match="content checksum mismatch"):
        tweaked = bytearray(compress_frame(b"payload " * 100))
        tweaked[-1] ^= 0xFF  # the stored content checksum
        decompress_frame(bytes(tweaked))
    nocheck = compress_frame(b"payload " * 100, content_checksum=False)
    with pytest.raises(ValueError, match="truncated block size"):
        decompress_frame(nocheck[:-4])  # EndMark removed
    with pytest.raises(ValueError, match="zero match offset"):
        decompress_block(b"\x10a\x00\x00", 64)
    with pytest.raises(ValueError, match="offset beyond output"):
        decompress_block(b"\x11ab\x05\x00", 64)
    with pytest.raises(ValueError, match="literal run past end"):
        decompress_block(b"\xf0" + b"\x05" + b"ab", 64)
    with pytest.raises(ValueError, match="exceeds declared block size"):
        decompress_block(compress_block(b"z" * 100), 10)


def test_lz4_raw_log_roundtrip(ray_session, corpus, tmp_path_factory):
    """LZ4-framed raw-log lane: render corpus → .log.lz4 → read_raw_log
    reconstructs the exact transcript rows the parquet path yields."""
    import pandas as pd

    from logray.sources import read_raw_log, render_raw_log

    in_dir, meta = corpus
    out = tmp_path_factory.mktemp("lz4logs")
    written = render_raw_log(in_dir, out, compression="lz4")
    assert all(w.endswith(".log.lz4") for w in written)
    got = read_raw_log(out).to_pandas()
    assert not got["envelope_error"].any()
    want = pd.concat([pq.read_table(f).to_pandas()
                      for f in sorted(in_dir.glob("*.parquet"))])
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        assert got[col].tolist() == want[col].tolist()
    assert (got["ts"].astype("int64") == want["ts"].astype("int64")).all()


def test_avro_sink_roundtrip(ray_session, tmp_path):
    """write_avro → read_avro_shards round-trips a transcript-shaped
    Dataset exactly (nullable union per column, timestamp-micros logical
    type, list + map + fixed columns), under both container codecs."""
    import pyarrow as pa
    import ray.data

    from logray.sources import read_avro_shards, write_avro

    rows = []
    for i in range(57):
        rows.append({
            "conv_id": f"c{i % 5}", "turn_idx": i,
            "tool": None if i % 3 == 0 else f"t{i % 4}",
            "ts": 1_700_000_000_000_000 + i,
            "score": i / 8, "flags": [f"f{j}" for j in range(i % 3)],
            "attrs": {f"k{j}": j * i for j in range(i % 2 + 1)},
            "fp": bytes([i % 256] * 8)})
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ("score", pa.float64()), ("flags", pa.list_(pa.string())),
        ("attrs", pa.map_(pa.string(), pa.int64())),
        ("fp", pa.binary(8))])
    want = pa.Table.from_pylist(rows, schema=schema)
    for codec in ("null", "deflate"):
        out = tmp_path / codec
        n = write_avro(ray.data.from_arrow(want), out, codec=codec)
        assert n == 57
        got = read_avro_shards(out).to_pandas().sort_values(
            "turn_idx").reset_index(drop=True)
        wdf = want.to_pandas()
        for col in ("conv_id", "turn_idx", "tool", "ts", "score", "fp"):
            assert got[col].tolist() == wdf[col].tolist(), (codec, col)
        assert [list(v) for v in got["flags"]] == \
            [list(v) for v in wdf["flags"]]
        assert [sorted(v) for v in got["attrs"]] == \
            [sorted(v) for v in wdf["attrs"]]


def test_snappy_codec_conformance_and_hazards():
    """From-scratch raw Snappy: round-trips over varied content,
    BIDIRECTIONAL conformance against pyarrow's real Snappy codec, all
    four tag forms decoded (incl. 11-bit-offset and 32-bit-offset copies
    we craft by hand since our encoder emits only 16-bit), and crafted
    foreign streams raise."""
    import struct

    import numpy as np
    import pyarrow as pa
    import pytest

    from logray.ops.snappycodec import (_uvarint_encode, compress,
                                        decompress)

    rng = np.random.default_rng(17)
    cases = [b"", b"x", b"hello world " * 50, bytes(100),
             bytes(rng.integers(0, 4, 7000, dtype=np.uint8) + 97),
             bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
             b"ab" * 50000, b"a" * 300, b"abcd" * 100 + b"tail"]
    arrow = pa.Codec("snappy")
    for c in cases:
        assert decompress(compress(c)) == c
        assert arrow.decompress(compress(c), len(c)).to_pybytes() == c
        assert decompress(bytes(arrow.compress(c))) == c

    # hand-crafted tag forms our encoder never emits
    # copy-1 (11-bit offset): literal 'abcd' then copy len 4 offset 4
    blob = _uvarint_encode(8) + bytes([3 << 2]) + b"abcd" \
        + bytes([0b01 | (0 << 2) | (0 << 5), 4])
    assert decompress(blob) == b"abcdabcd"
    # copy-4 (32-bit offset)
    blob = _uvarint_encode(8) + bytes([3 << 2]) + b"abcd" \
        + bytes([0b11 | (3 << 2)]) + struct.pack("<I", 4)
    assert decompress(blob) == b"abcdabcd"
    # 4-byte literal-length form
    blob = _uvarint_encode(3) + bytes([63 << 2]) \
        + struct.pack("<I", 2) + b"xyz"
    assert decompress(blob) == b"xyz"

    # hazards
    with pytest.raises(ValueError, match="truncated length varint"):
        decompress(b"")
    with pytest.raises(ValueError, match="longer than 5"):
        decompress(b"\x80" * 6)
    with pytest.raises(ValueError, match="truncated literal"):
        decompress(_uvarint_encode(10) + bytes([9 << 2]) + b"abc")
    with pytest.raises(ValueError, match="zero copy offset"):
        decompress(_uvarint_encode(8) + bytes([3 << 2]) + b"abcd"
                   + bytes([0b10 | (3 << 2)]) + struct.pack("<H", 0))
    with pytest.raises(ValueError, match="offset beyond output"):
        decompress(_uvarint_encode(8) + bytes([3 << 2]) + b"abcd"
                   + bytes([0b10 | (3 << 2)]) + struct.pack("<H", 9))
    with pytest.raises(ValueError, match="exceeds declared"):
        decompress(_uvarint_encode(2) + bytes([3 << 2]) + b"abcd")
    with pytest.raises(ValueError, match="shorter than declared"):
        decompress(_uvarint_encode(9) + bytes([3 << 2]) + b"abcd")


def test_access_log_parse_and_hazards(ray_session):
    """CLF envelope: fixture shards parse to the sidecar truth (bare CLF
    and combined format, '-' markers → nulls, 204/304 bodyless rows);
    malformed lines survive as error rows, never dropped."""
    from pathlib import Path

    import pandas as pd
    import pyarrow.parquet as pq

    from logray.sources import (access_log_parse, make_access_logs,
                                read_access_log)

    d = Path("/tmp/logray/test_accesslog_fixture")
    make_access_logs(d, n=120, shards=4)
    got = read_access_log(d).to_pandas()
    assert len(got) == 120 and not got["parse_error"].any()
    truth = pq.read_table(d / "truth.parquet").to_pandas()
    got = got.sort_values("ts").reset_index(drop=True)
    truth = truth.sort_values("ts_us").reset_index(drop=True)
    assert (got["ts"].astype("int64") == truth["ts_us"]).all()
    for col in ("ip", "method", "path"):
        assert got[col].tolist() == truth[col].tolist()
    assert got["status"].astype("int64").tolist() == \
        truth["status"].tolist()
    # nullable columns: NaN-safe compare
    for col in ("user", "agent", "n_bytes"):
        a = got[col].astype(object).where(got[col].notna(), None).tolist()
        b = truth[col].astype(object).where(truth[col].notna(),
                                            None).tolist()
        assert a == b, col
    # 204/304 rows exist and carry null bytes (the '-' marker)
    assert got.loc[got["status"].isin([204, 304]), "n_bytes"] \
        .isna().all()
    assert got.loc[~got["status"].isin([204, 304]), "n_bytes"] \
        .notna().all()
    # referer: combined-format lines write "-" -> null
    assert got["referer"].isna().all()

    # malformed lines: reference default semantics
    t = pa.table({"text": [
        '1.2.3.4 - - [19/Aug/2026:01:02:03 +0000] "GET / HTTP/1.1" 200 5',
        "total garbage",
        '9.9.9.9 - - [not-a-date +0000] "GET / HTTP/1.1" 200 5',
    ]})
    out = access_log_parse(t)
    assert out["parse_error"].to_pylist() == [False, True, True]
    assert out["ip"].to_pylist() == ["1.2.3.4", None, None]
    assert out["n_bytes"].to_pylist() == [5, None, None]


def test_bz2_xz_raw_log_roundtrip(ray_session, corpus, tmp_path_factory):
    """Archival-compression lanes: .log.bz2 (Arrow streaming inflate)
    and .log.xz (stdlib lzma, non-Arrow codec → read_binary_files path)
    both reconstruct the exact transcript rows."""
    import pandas as pd

    from logray.sources import read_raw_log, render_raw_log

    in_dir, meta = corpus
    want = pd.concat([pq.read_table(f).to_pandas()
                      for f in sorted(in_dir.glob("*.parquet"))])
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for comp, ext in (("bz2", "bz2"), ("xz", "xz"), ("zstd", "zst")):
        out = tmp_path_factory.mktemp(f"{comp}logs")
        written = render_raw_log(in_dir, out, compression=comp)
        assert all(w.endswith(f".log.{ext}") for w in written)
        got = read_raw_log(out).to_pandas()
        assert not got["envelope_error"].any()
        got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        for col in ("conv_id", "turn_idx", "role", "text", "tool"):
            assert got[col].tolist() == want[col].tolist()
        assert (got["ts"].astype("int64")
                == want["ts"].astype("int64")).all()


def test_logfmt_envelope_hazards(ray_session):
    """Key order is irrelevant; quoted msg text containing other keys'
    patterns must not leak; escapes round-trip; malformed lines survive
    as error rows; absent optional keys surface as nulls."""
    import pyarrow as pa

    from logray.sources import logfmt_parse

    lines = [
        # shuffled order + all keys
        'ok=true svc=gw msg="hello" ts=2026-01-02T00:00:00Z level=info '
        'conv=c001 turn=3 dur_ms=42',
        # key-spoof hazard: turn=/level= inside the quoted msg
        'ts=2026-01-02T00:00:03Z level=warn svc=rt conv=c002 turn=7 '
        'msg="retry turn=99 level=evil" dur_ms=5',
        # escape hazards
        'ts=2026-01-02T00:00:06Z level=error svc=gw conv=c003 turn=1 '
        'msg="path \\"quoted\\" and C:\\\\tmp"',
        # malformed: no ts
        'level=info svc=gw conv=c004 turn=2',
        # minimal: optional keys absent
        'ts=2026-01-02T00:00:09Z level=debug svc=sk conv=c005 turn=0',
    ]
    out = logfmt_parse(pa.table({"text": pa.array(lines)}))
    assert out["parse_error"].to_pylist() == [False, False, False, True,
                                              False]
    assert out["turn"].to_pylist() == [3, 7, 1, None, 0]
    assert out["level"].to_pylist() == ["info", "warn", "error", None,
                                        "debug"]
    assert out["msg"].to_pylist() == [
        "hello", "retry turn=99 level=evil", 'path "quoted" and C:\\tmp',
        None, None]
    assert out["dur_ms"].to_pylist() == [42, 5, None, None, None]
    assert out["ok"].to_pylist() == [True, None, None, None, None]


def test_syslog_envelope_hazards(ray_session):
    """RFC 5424: escaped brackets/quotes inside SD values must not
    truncate the SD run; msg brackets must not read as SD; NIL fields
    null; facility/severity derive from PRI; malformed lines survive."""
    import pyarrow as pa

    from logray.sources import syslog_parse

    lines = [
        # 2 SD elements, escape hazards in the first
        '<165>1 2026-01-02T00:00:00Z h1 app1 77 M1 '
        '[meta@32473 conv="c001" turn="3" note="a\\]b\\"c"]'
        '[origin ip="10.0.0.1"] routed ok',
        # NIL sd + msg beginning with brackets (must NOT parse as SD)
        '<13>1 2026-01-02T00:00:01Z h2 app2 - - - [not sd] literal',
        # no msg at all -> null
        '<0>1 2026-01-02T00:00:02Z h3 app3 12 M2 [meta@32473 conv="c002" turn="4"]',
        'total garbage',
    ]
    out = syslog_parse(pa.table({"text": pa.array(lines)}))
    assert out["parse_error"].to_pylist() == [False, False, False, True]
    assert out["facility"].to_pylist() == [20, 1, 0, None]
    assert out["severity"].to_pylist() == [5, 5, 0, None]
    assert out["n_sd"].to_pylist() == [2, 0, 1, 0]
    assert out["conv"].to_pylist() == ["c001", None, "c002", None]
    assert out["turn"].to_pylist() == [3, None, 4, None]
    assert out["procid"].to_pylist() == [77, None, 12, None]
    assert out["msg"].to_pylist() == ["routed ok", "[not sd] literal",
                                      None, None]
