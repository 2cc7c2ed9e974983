"""From-scratch Apache Avro object-container codec (binary encoding).

Implements the PUBLIC Avro 1.11 specification (no avro/fastavro in the
sandbox — and none is imported): zigzag base-128 varints, the full
primitive set, records, enums, unions, arrays/maps with the spec's
count-prefixed block series (including the NEGATIVE-count form that
prefixes a byte size for skippability), fixed, and the object container
file layout (magic ``Obj\\x01``, metadata map, 16-byte sync marker,
count+size data blocks, per-block sync validation) with the ``null`` and
``deflate`` codecs (raw RFC-1951 DEFLATE, zlib ``wbits=-15`` — the spec
notes the deflate codec carries no zlib header/checksum).

Both directions are provided so the container tests can round-trip
encoder→decoder AND the decoder can be hazard-tested against crafted
foreign streams. The reader is the trust boundary for foreign data:
every length/count/index is validated before use (truncated or overlong
varints, negative block byte-sizes, out-of-range enum/union indexes,
sync-marker mismatches and unknown codecs all raise ``ValueError``
rather than mis-decoding).

Reference parity note: the reference repo (`/root/reference`) is empty
this round; the format is reconstructed from the public Avro spec, per
SURVEY.md's sources-coverage row (§2 B5).
"""
from __future__ import annotations

import datetime as _dt
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"
_MAX_VARINT_BYTES = 10  # 64-bit zigzag values never need more
_MAX_INFLATE = 256 << 20  # deflate-bomb cap per block (foreign input)
# Zero-byte-wide items (null arrays, all-null records) decouple block
# counts from input size — an amplification vector. A declared count may
# exceed the remaining input bytes by at most this slack before the
# reader rejects it (legitimate encoders never ship astronomically more
# items than bytes).
_ZERO_WIDTH_SLACK = 16


def _remaining(buf: io.BytesIO) -> int:
    return buf.getbuffer().nbytes - buf.tell()


def _check_count(count: int, buf: io.BytesIO, what: str) -> None:
    if count > _remaining(buf) + _ZERO_WIDTH_SLACK:
        raise ValueError(f"avro: {what} count {count} exceeds input size")


# --------------------------------------------------------------- primitives

def encode_long(value: int) -> bytes:
    """Zigzag base-128 varint (Avro int and long share this encoding)."""
    n = (value << 1) ^ (value >> 63) if value < 0 else (value << 1)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: io.BytesIO) -> int:
    n, shift = 0, 0
    for _ in range(_MAX_VARINT_BYTES):
        raw = buf.read(1)
        if not raw:
            raise ValueError("avro: truncated varint")
        b = raw[0]
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (n >> 1) ^ -(n & 1)
        shift += 7
    raise ValueError("avro: varint longer than 10 bytes")


def _read_exact(buf: io.BytesIO, n: int, what: str) -> bytes:
    if n < 0:
        raise ValueError(f"avro: negative {what} length")
    data = buf.read(n)
    if len(data) != n:
        raise ValueError(f"avro: truncated {what}")
    return data


def encode_bytes(value: bytes) -> bytes:
    return encode_long(len(value)) + value


def decode_bytes(buf: io.BytesIO) -> bytes:
    return _read_exact(buf, decode_long(buf), "bytes")


# --------------------------------------------------------------- schema walk

def _named_type(schema):
    """Normalize a schema node to (type_name, node_dict_or_None)."""
    if isinstance(schema, str):
        return schema, None
    if isinstance(schema, list):
        return "union", None
    if isinstance(schema, dict):
        return schema["type"], schema
    raise ValueError(f"avro: bad schema node {schema!r}")


def _branch_accepts(branch, value) -> bool:
    """Python-type → Avro-branch compatibility for union encoding."""
    bt, _ = _named_type(branch)
    if bt == "null":
        return value is None
    if value is None:
        return False
    if bt == "boolean":
        return isinstance(value, bool)
    if bt in ("int", "long"):
        return (isinstance(value, (int, _dt.datetime))
                and not isinstance(value, bool))
    if bt in ("float", "double"):
        return isinstance(value, float)
    if bt in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if bt in ("string", "enum"):
        return isinstance(value, str)
    if bt == "array":
        return isinstance(value, (list, tuple))
    if bt == "map":
        return isinstance(value, dict) or (
            isinstance(value, list)
            and all(isinstance(p, tuple) and len(p) == 2 for p in value))
    if bt == "record":
        return isinstance(value, dict)
    return False


def encode_datum(schema, value) -> bytes:
    """Encode one datum against ``schema`` (parsed JSON, not a string)."""
    t, node = _named_type(schema)
    if t == "null":
        if value is not None:
            raise ValueError("avro: non-None for null type")
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        if isinstance(value, _dt.datetime):  # logicalType timestamp-micros
            epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
            value = (value - epoch) // _dt.timedelta(microseconds=1)
        return encode_long(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        return encode_bytes(bytes(value))
    if t == "string":
        return encode_bytes(value.encode("utf-8"))
    if t == "fixed":
        v = bytes(value)
        if len(v) != node["size"]:
            raise ValueError("avro: fixed size mismatch")
        return v
    if t == "enum":
        return encode_long(node["symbols"].index(value))
    if t == "union":
        # branch selection is TYPE-aware, not first-non-null: a
        # [null, long, string] union must route "abc" to the string
        # branch, never coerce it through long
        for i, br in enumerate(schema):
            if _branch_accepts(br, value):
                return encode_long(i) + encode_datum(br, value)
        raise ValueError("avro: no union branch for value")
    if t == "record":
        return b"".join(encode_datum(f["type"], value[f["name"]])
                        for f in node["fields"])
    if t == "array":
        items = list(value)
        if not items:
            return encode_long(0)
        body = b"".join(encode_datum(node["items"], v) for v in items)
        # negative-count block form: |count| items prefixed by the byte
        # size, the spec's skippability affordance — emitted for real so
        # foreign readers (and our own) exercise the path
        return (encode_long(-len(items)) + encode_long(len(body)) + body
                + encode_long(0))
    if t == "map":
        # dict OR list-of-(key, value) pairs (the shape Arrow MapArray
        # yields from to_pylist) — both are real caller shapes
        pairs = list(value.items()) if isinstance(value, dict) \
            else list(value)
        if not pairs:
            return encode_long(0)
        body = b"".join(encode_bytes(k.encode("utf-8"))
                        + encode_datum(node["values"], v)
                        for k, v in pairs)
        return encode_long(len(pairs)) + body + encode_long(0)
    raise ValueError(f"avro: unsupported type {t!r}")


def decode_datum(schema, buf: io.BytesIO):
    t, node = _named_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return _read_exact(buf, 1, "boolean")[0] != 0
    if t in ("int", "long"):
        return decode_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4, "float"))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8, "double"))[0]
    if t == "bytes":
        return decode_bytes(buf)
    if t == "string":
        return decode_bytes(buf).decode("utf-8")
    if t == "fixed":
        return _read_exact(buf, node["size"], "fixed")
    if t == "enum":
        i = decode_long(buf)
        syms = node["symbols"]
        if not 0 <= i < len(syms):
            raise ValueError(f"avro: enum index {i} out of range")
        return syms[i]
    if t == "union":
        i = decode_long(buf)
        if not 0 <= i < len(schema):
            raise ValueError(f"avro: union index {i} out of range")
        return decode_datum(schema[i], buf)
    if t == "record":
        return {f["name"]: decode_datum(f["type"], buf)
                for f in node["fields"]}
    if t == "array":
        out = []
        while True:
            count = decode_long(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                if decode_long(buf) < 0:  # block byte size (skippability)
                    raise ValueError("avro: negative array block size")
            _check_count(count, buf, "array block")
            for _ in range(count):
                out.append(decode_datum(node["items"], buf))
    if t == "map":
        out = {}
        while True:
            count = decode_long(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                if decode_long(buf) < 0:
                    raise ValueError("avro: negative map block size")
            _check_count(count, buf, "map block")
            for _ in range(count):
                key = decode_bytes(buf).decode("utf-8")
                out[key] = decode_datum(node["values"], buf)
    raise ValueError(f"avro: unsupported type {t!r}")


_PRIMITIVES = ("null", "boolean", "int", "long", "float", "double",
               "bytes", "string")


def validate_schema(schema) -> None:
    """Structural validation of a (possibly hostile) parsed Avro schema:
    every malformed node raises ``ValueError`` — without this, decode
    walks would surface raw ``KeyError``/``TypeError`` from fuzzed
    metadata, breaking the module's all-errors-are-ValueError contract."""
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            raise ValueError(f"avro: unknown type name {schema!r}")
        return
    if isinstance(schema, list):
        if not schema:
            raise ValueError("avro: empty union")
        for br in schema:
            validate_schema(br)
        return
    if not isinstance(schema, dict) or "type" not in schema:
        raise ValueError(f"avro: bad schema node {schema!r}")
    t = schema["type"]
    if t in _PRIMITIVES:
        return
    if t == "enum":
        syms = schema.get("symbols")
        if not (isinstance(syms, list) and syms
                and all(isinstance(s, str) for s in syms)):
            raise ValueError("avro: enum without valid symbols")
        return
    if t == "fixed":
        size = schema.get("size")
        if not (isinstance(size, int) and 0 <= size <= (1 << 30)):
            raise ValueError("avro: fixed without valid size")
        return
    if t == "array":
        if "items" not in schema:
            raise ValueError("avro: array without items")
        validate_schema(schema["items"])
        return
    if t == "map":
        if "values" not in schema:
            raise ValueError("avro: map without values")
        validate_schema(schema["values"])
        return
    if t == "record":
        fields = schema.get("fields")
        if not isinstance(fields, list):
            raise ValueError("avro: record without fields")
        for f in fields:
            if not (isinstance(f, dict) and isinstance(f.get("name"), str)
                    and "type" in f):
                raise ValueError("avro: bad record field")
            validate_schema(f["type"])
        return
    raise ValueError(f"avro: unsupported type {t!r}")


# ----------------------------------------------------------- container file

def write_container(schema: dict, records: list, sync: bytes | None,
                    codec: str = "null", block_records: int = 40) -> bytes:
    """Serialize ``records`` into one Avro object-container file.

    ``sync=None`` derives the 16-byte sync marker from the encoded
    content (md5 over schema + block bodies) so the whole container is
    deterministic for given records — retried writer tasks regenerate
    byte-identical files."""
    import hashlib

    schema_json = json.dumps(schema).encode("utf-8")
    blocks: list[tuple[int, bytes]] = []
    for i in range(0, len(records), block_records):
        chunk = records[i:i + block_records]
        body = b"".join(encode_datum(schema, r) for r in chunk)
        if codec == "deflate":
            body = zlib.compress(body, 6)[2:-4]  # strip zlib hdr+adler -> raw
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        blocks.append((len(chunk), body))
    if sync is None:
        h = hashlib.md5(schema_json)
        for _, body in blocks:
            h.update(body)
        sync = h.digest()
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")
    meta = {"avro.schema": schema_json,
            "avro.codec": codec.encode("utf-8")}
    out = bytearray(MAGIC)
    out += encode_long(len(meta))
    for k, v in meta.items():
        out += encode_bytes(k.encode("utf-8")) + encode_bytes(v)
    out += encode_long(0)
    out += sync
    for n, body in blocks:
        out += encode_long(n) + encode_long(len(body)) + body + sync
    return bytes(out)


def read_container(blob: bytes) -> tuple[dict, list]:
    """Parse one object-container file → (schema, records).

    Spec-exact walk: magic, metadata map (count-prefixed block series,
    negative counts carry a byte size), 16-byte sync, then data blocks of
    (count, size, data) each terminated by the file's sync marker.
    """
    buf = io.BytesIO(blob)
    if _read_exact(buf, 4, "magic") != MAGIC:
        raise ValueError("avro: bad magic")
    meta: dict[str, bytes] = {}
    while True:
        count = decode_long(buf)
        if count == 0:
            break
        if count < 0:
            count = -count
            if decode_long(buf) < 0:
                raise ValueError("avro: negative metadata block size")
        _check_count(count, buf, "metadata block")
        for _ in range(count):
            key = decode_bytes(buf).decode("utf-8")
            meta[key] = decode_bytes(buf)
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
    except UnicodeDecodeError as e:
        raise ValueError("avro: non-UTF-8 schema metadata") from e
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro: container schema must be a record")
    validate_schema(schema)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = _read_exact(buf, 16, "sync marker")
    records = []
    while True:
        probe = buf.read(1)
        if not probe:
            return schema, records
        buf.seek(-1, io.SEEK_CUR)
        count = decode_long(buf)
        if count < 0:
            raise ValueError("avro: negative block record count")
        size = decode_long(buf)
        body = _read_exact(buf, size, "data block")
        if codec == "deflate":
            try:
                d = zlib.decompressobj(wbits=-15)
                body = d.decompress(body, _MAX_INFLATE)
                if d.unconsumed_tail:
                    raise ValueError(
                        "avro: deflate block inflates beyond cap")
            except zlib.error as e:
                raise ValueError(f"avro: corrupt deflate block: {e}") from e
        if _read_exact(buf, 16, "block sync") != sync:
            raise ValueError("avro: sync marker mismatch")
        bbuf = io.BytesIO(body)
        if count > len(body) + _ZERO_WIDTH_SLACK:
            raise ValueError(
                f"avro: block record count {count} exceeds block size")
        for _ in range(count):
            records.append(decode_datum(schema, bbuf))
        if bbuf.read(1):
            raise ValueError("avro: trailing bytes in data block")
