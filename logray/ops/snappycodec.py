"""From-scratch raw Snappy codec (the Parquet default codec).

Implements the PUBLIC Snappy format description (the raw block format:
varint uncompressed-length preamble, then tagged elements — 2-bit tag
00 literal with the 60..63 extended-length forms, 01 copy with 11-bit
offset and 4..11 length, 10 copy with 16-bit offset, 11 copy with
32-bit offset) with no third-party snappy dependency.

Both directions are provided; conformance is pinned BIDIRECTIONALLY
against pyarrow's real Snappy codec in tests (a foreign implementation,
stronger than self-round-trip — same protocol as the LZ4 codec). The
decoder treats input as untrusted: truncated varints/elements, zero or
out-of-window copy offsets, and any mismatch between decoded and
declared length raise ``ValueError`` rather than mis-decoding.

Reference parity note: `/root/reference` is empty this round; the
format is reconstructed from the public spec (SURVEY.md §2 B5 row).
"""
from __future__ import annotations

import struct


def _uvarint_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _uvarint_decode(src: bytes, pos: int) -> tuple[int, int]:
    n, shift = 0, 0
    for _ in range(5):  # 32-bit lengths per the spec
        if pos >= len(src):
            raise ValueError("snappy: truncated length varint")
        b = src[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return n, pos
        shift += 7
    raise ValueError("snappy: length varint longer than 5 bytes")


def compress(src: bytes) -> bytes:
    """Greedy raw-Snappy encoder: 4-byte hash-table matcher emitting
    16-bit-offset copies (the form every decoder must handle) and
    literals in all four length forms."""
    n = len(src)
    out = bytearray(_uvarint_encode(n))
    table: dict[int, int] = {}
    anchor = 0
    i = 0

    def emit_literal(end: int):
        start = anchor  # bytearray mutated in place (extend, not +=)
        while start < end:
            ln = min(end - start, 65536)  # 3-byte form covers plenty
            l1 = ln - 1
            if l1 < 60:
                out.append(l1 << 2)
            elif l1 < 256:
                out.append(60 << 2)
                out.append(l1)
            else:
                out.append(61 << 2)
                out.extend(struct.pack("<H", l1))
            out.extend(src[start:start + ln])
            start += ln

    while i + 4 <= n:
        key = src[i:i + 4]
        h = hash(key)  # process-local matcher state only
        cand = table.get(h)
        table[h] = i
        if (cand is not None and i - cand <= 0xFFFF
                and src[cand:cand + 4] == key):
            emit_literal(i)
            mlen = 4
            while i + mlen < n and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            offset = i - cand
            rest = mlen
            while rest >= 4:
                ln = min(rest, 64)
                if 0 < rest - ln < 4:  # never leave a <4-byte tail copy
                    ln = rest - 4
                out.append(0b10 | ((ln - 1) << 2))
                out += struct.pack("<H", offset)
                rest -= ln
            i += mlen - rest  # a 1..3-byte tail re-enters as literals
            anchor = i
        else:
            i += 1
    emit_literal(n)
    return bytes(out)


def decompress(src: bytes) -> bytes:
    """Raw-Snappy decoder over untrusted bytes."""
    declared, pos = _uvarint_decode(src, 0)
    out = bytearray()
    n = len(src)

    def take(k: int, what: str) -> bytes:
        nonlocal pos
        if pos + k > n:
            raise ValueError(f"snappy: truncated {what}")
        b = src[pos:pos + k]
        pos += k
        return b

    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:  # literal
            l1 = tag >> 2
            if l1 >= 60:
                extra = take(l1 - 59, "literal length")
                l1 = int.from_bytes(extra, "little")
            length = l1 + 1
            out += take(length, "literal")
        else:
            if kind == 0b01:  # copy, 11-bit offset, 4..11 length
                length = ((tag >> 2) & 0x07) + 4
                (lo,) = take(1, "copy offset")
                offset = ((tag >> 5) << 8) | lo
            elif kind == 0b10:
                length = (tag >> 2) + 1
                (offset,) = struct.unpack("<H", take(2, "copy offset"))
            else:
                length = (tag >> 2) + 1
                (offset,) = struct.unpack("<I", take(4, "copy offset"))
            if offset == 0:
                raise ValueError("snappy: zero copy offset")
            if offset > len(out):
                raise ValueError("snappy: copy offset beyond output")
            start = len(out) - offset
            if offset >= length:
                out += out[start:start + length]
            else:  # overlapping copy is byte-serial per the spec
                for k in range(length):
                    out.append(out[start + k])
        if len(out) > declared:
            raise ValueError("snappy: output exceeds declared length")
    if len(out) != declared:
        raise ValueError("snappy: output shorter than declared length")
    return bytes(out)
