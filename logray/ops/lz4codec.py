"""From-scratch LZ4 codec: block format, frame format, and xxHash32.

Implements the PUBLIC LZ4 specifications (block format + frame format
v1.6, and the xxHash32 checksum the frame format prescribes) with no
third-party lz4/xxhash dependency — the shard-compression format data
pipelines actually ship text shards in (and the object-spill codec of
several engines).

Both directions are provided: a greedy hash-table encoder (so container
tests round-trip encoder→decoder under every frame-flag combination) and
a decoder that treats foreign bytes as untrusted — every length, offset
and checksum is validated before use (bad magic/version, reserved bits,
header-checksum mismatch, zero or out-of-window match offsets, literal
or match overruns, truncated blocks, missing EndMark, block- and
content-checksum mismatches all raise ``ValueError`` rather than
mis-decoding).

Block-format end rules the encoder honors and the decoder exploits: the
last sequence is literals-only, the final 5 bytes are always literals,
and no match begins within the last 12 bytes of a block.

Reference parity note: `/root/reference` is empty this round; the format
is reconstructed from the public spec (SURVEY.md §2 B5 sources row).
"""
from __future__ import annotations

import struct

MAGIC = 0x184D2204
_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public algorithm; the frame format's checksum)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (l,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + l * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --------------------------------------------------------------- block codec

def compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block encoder: 4-byte hash-table matcher, offsets
    within the 64 KiB window, spec end rules (last sequence literals-
    only, ≥5 trailing literals, no match starting in the last 12 bytes)."""
    n = len(src)
    out = bytearray()
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    # positions from which a match may START (spec: mflimit = n - 12)
    mflimit = n - 12

    def emit(lit_end: int, match_len: int = 0, offset: int = 0):
        lit_len = lit_end - anchor
        tok_lit = min(lit_len, 15)
        tok_match = 0 if match_len == 0 else min(match_len - 4, 15)
        out.append((tok_lit << 4) | tok_match)
        rest = lit_len - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(src[anchor:lit_end])
        if match_len:
            out.extend(struct.pack("<H", offset))
            rest = match_len - 4 - 15
            while rest >= 0:
                out.append(min(rest, 255))
                if rest < 255:
                    break
                rest -= 255

    while i < mflimit:
        key = src[i:i + 4]
        h = hash(key)  # process-local table only; never serialized
        cand = table.get(h)
        table[h] = i
        if (cand is not None and i - cand <= 0xFFFF
                and src[cand:cand + 4] == key):
            mlen = 4
            limit = n - 5  # last 5 bytes must stay literals
            while i + mlen < limit and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(i, mlen, i - cand)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(n)  # final literals-only sequence
    return bytes(out)


def decompress_block(src: bytes, max_out: int, prefix: bytes = b"") -> bytes:
    """LZ4 block decoder over untrusted bytes: validates every literal
    and match extent, rejects zero/out-of-window offsets, caps output at
    ``max_out`` (the frame's declared block maximum). ``prefix`` is the
    prior window for LINKED blocks (frame B.Indep bit clear — what
    Arrow's encoder emits): matches may reach back into it."""
    out = bytearray(prefix)
    base = len(prefix)
    pos, n = 0, len(src)

    def varlen(base: int) -> int:
        nonlocal pos
        ln = base
        if base == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated length extension")
                b = src[pos]
                pos += 1
                ln += b
                if b < 255:
                    return ln
        return ln

    while True:
        if pos >= n:
            raise ValueError("lz4: block ends without a final sequence")
        token = src[pos]
        pos += 1
        lit_len = varlen(token >> 4)
        if pos + lit_len > n:
            raise ValueError("lz4: literal run past end of block")
        out += src[pos:pos + lit_len]
        pos += lit_len
        if len(out) - base > max_out:
            raise ValueError("lz4: output exceeds declared block size")
        if pos == n:
            return bytes(out[base:])  # literals-only final sequence
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        (offset,) = struct.unpack_from("<H", src, pos)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        if offset > len(out):
            raise ValueError("lz4: match offset beyond output window")
        mlen = varlen(token & 0x0F) + 4
        if len(out) - base + mlen > max_out:
            raise ValueError("lz4: output exceeds declared block size")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start:start + mlen]
        else:  # overlapping copy: byte-serial semantics per the spec
            for k in range(mlen):
                out.append(out[start + k])


# --------------------------------------------------------------- frame codec

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress_frame(data: bytes, *, block_size_code: int = 4,
                   block_checksums: bool = False,
                   content_checksum: bool = True,
                   content_size: bool = False) -> bytes:
    """Serialize ``data`` as one LZ4 frame. Blocks that don't shrink are
    stored with the spec's uncompressed-bit (high bit of the size word)
    so both decode paths are exercised by real encoder output."""
    if block_size_code not in _BD_SIZES:
        raise ValueError("lz4: bad block max-size code")
    flg = 0x40 | 0x20  # version 01, block-independent
    if block_checksums:
        flg |= 0x10
    if content_size:
        flg |= 0x08
    if content_checksum:
        flg |= 0x04
    bd = block_size_code << 4
    desc = bytes([flg, bd])
    if content_size:
        desc += struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    bmax = _BD_SIZES[block_size_code]
    for i in range(0, len(data), bmax):
        chunk = data[i:i + bmax]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            blk = comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            blk = chunk
        out += blk
        if block_checksums:
            out += struct.pack("<I", xxh32(blk))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress_frame(blob: bytes) -> bytes:
    """Parse one LZ4 frame from untrusted bytes → decompressed content."""
    pos = 0

    def take(n: int, what: str) -> bytes:
        nonlocal pos
        if pos + n > len(blob):
            raise ValueError(f"lz4: truncated {what}")
        b = blob[pos:pos + n]
        pos += n
        return b

    (magic,) = struct.unpack("<I", take(4, "magic"))
    if magic != MAGIC:
        raise ValueError("lz4: bad magic")
    desc_start = pos
    flg, bd = take(2, "frame descriptor")
    if (flg >> 6) != 0b01:
        raise ValueError("lz4: unsupported frame version")
    if flg & 0x02 or flg & 0x01:
        raise ValueError("lz4: reserved/dict FLG bits set")
    if bd & 0x8F:
        raise ValueError("lz4: reserved BD bits set")
    bcode = (bd >> 4) & 0x07
    if bcode not in _BD_SIZES:
        raise ValueError("lz4: bad block max-size code")
    declared = None
    if flg & 0x08:
        (declared,) = struct.unpack("<Q", take(8, "content size"))
    desc = blob[desc_start:pos]
    (hc,) = take(1, "header checksum")
    if hc != (xxh32(desc) >> 8) & 0xFF:
        raise ValueError("lz4: header checksum mismatch")
    bmax = _BD_SIZES[bcode]
    indep = bool(flg & 0x20)
    parts = []
    window = b""  # prior 64 KiB for linked blocks (B.Indep clear)
    while True:
        (word,) = struct.unpack("<I", take(4, "block size"))
        if word == 0:
            break
        stored = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        if size > bmax + (0 if stored else bmax):
            raise ValueError("lz4: block size exceeds frame maximum")
        blk = take(size, "data block")
        if flg & 0x10:
            (bsum,) = struct.unpack("<I", take(4, "block checksum"))
            if bsum != xxh32(blk):
                raise ValueError("lz4: block checksum mismatch")
        piece = blk if stored else decompress_block(blk, bmax, window)
        parts.append(piece)
        if not indep:
            window = (window + piece)[-(1 << 16):]
    content = b"".join(parts)
    if flg & 0x04:
        (csum,) = struct.unpack("<I", take(4, "content checksum"))
        if csum != xxh32(content):
            raise ValueError("lz4: content checksum mismatch")
    if declared is not None and declared != len(content):
        raise ValueError("lz4: content size mismatch")
    return content
