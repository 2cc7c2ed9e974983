"""Baseline-sequential JPEG (ITU-T T.81) encoder/decoder from scratch.

No imaging library: numpy does the 8×8 DCT as a matrix product, the
entropy layer is canonical JPEG Huffman built from Annex-K-style
BITS/HUFFVAL tables, and the container is hand-assembled JFIF markers.
Everything a real baseline decoder must survive is exercised by the
fixture generator:

- **byte stuffing** — 0xFF bytes inside the entropy stream are escaped
  as FF 00 by the writer and unstuffed by the reader;
- **restart markers** — DRI + RSTn every N MCUs: the reader byte-aligns,
  consumes the marker, and both sides reset their DC predictors;
- **chroma subsampling** — the MCU loop is generic over per-component
  (Hi, Vi) sampling factors, so 4:4:4 (all 1×1) and 4:2:0 (luma 2×2)
  share one code path; the decoder upsamples by pixel replication;
- **non-multiple-of-8 dims** — planes are edge-padded to the MCU grid
  at encode and cropped back at decode.

Scope: 8-bit 3-component baseline DCT (SOF0) with Huffman entropy
coding — the overwhelmingly dominant JPEG variant in web crawls.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``ValueError`` with the marker that triggered it.

JPEG is lossy, so the lane's oracle follows the µ-law precedent
(multimodal.py G.711 lane): generation-time truth is computed from the
DECODED pixels, while the decoder itself is pinned by exact
quantized-coefficient inversion (encode → parse reproduces the encoder's
coefficient arrays bit-for-bit) and round-trip tolerance tests in
tests/test_ops.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- tables (ITU-T T.81 Annex K) ------------------------------------------

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64).reshape(8, 8)

# DC/AC Huffman table specs as (BITS[1..16], HUFFVAL). Correctness does
# not depend on matching Annex K exactly: the encoder embeds whatever
# tables it used in DHT segments and the decoder rebuilds from those, so
# a deviation would only cost compression ratio. The value SETS are the
# complete ones (DC sizes 0..11; AC = EOB + ZRL + run 0..15 × size 1..10)
# so every symbol the encoder can emit has a code.
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))

_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_LUMA_SPEC = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
                _AC_LUMA_VALS)

_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_SPEC = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
                  _AC_CHROMA_VALS)

for _spec in (DC_LUMA_SPEC, DC_CHROMA_SPEC, AC_LUMA_SPEC, AC_CHROMA_SPEC):
    assert sum(_spec[0]) == len(_spec[1]), "BITS/HUFFVAL length mismatch"


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not hardcoded): index
    i of the output is the raster position of the i-th zigzag element."""
    order = sorted(((y, x) for y in range(8) for x in range(8)),
                   key=lambda p: (p[0] + p[1],
                                  p[1] if (p[0] + p[1]) % 2 else p[0]))
    return np.array([y * 8 + x for y, x in order], np.int64)


ZIGZAG = _zigzag()                       # zigzag index -> raster index
UNZIGZAG = np.argsort(ZIGZAG)            # raster index -> zigzag index


def _dct_mat() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


_DCT = _dct_mat()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public formula)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int64)
    return sc(Q_LUMA), sc(Q_CHROMA)


# ---- canonical Huffman -----------------------------------------------------

def _build_codes(spec) -> dict[int, tuple[int, int]]:
    """value -> (code, bit-length), canonical JPEG assignment (codes of
    each length numbered consecutively, doubling at each length step)."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits, vals) -> dict[tuple[int, int], int]:
    """(bit-length, code) -> value — the inverse of _build_codes."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Byte-align by padding with 1-bits (T.81 §B.2.5)."""
        if self.n:
            self.write(0xFF, 8 - self.n)  # pads with 1s, also handles stuff


class _BitReader:
    """MSB-first reader over entropy-coded bytes: unstuffs FF 00 and
    refuses to read past a real marker (a decoder bug, not bad data)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _load(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(
                    f"hit marker FF{nxt:02X} mid-entropy-stream"
                    if nxt is not None else "JPEG entropy stream truncated")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bits(self, length: int) -> int:
        while self.n < length:
            self._load()
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self, m: int) -> None:
        """Byte-align, then consume the expected RSTm marker."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG truncated at restart marker")
        if (self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (m & 7)):
            raise ValueError(
                f"expected RST{m & 7}, found "
                f"{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}")
        self.pos += 2

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code (>16 bits)")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size` received bits back to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---- color + blocking ------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad to (h, w) — replication keeps block DCTs smooth
    at the boundary (zero-pad would ring)."""
    ph, pw = plane.shape
    return np.pad(plane, ((0, h - ph), (0, w - pw)), mode="edge")


def _plane_qblocks(plane: np.ndarray, qtbl: np.ndarray,
                   bh: int, bw: int) -> np.ndarray:
    """DCT + quantize a padded plane into an (bh, bw, 64) int array of
    zigzagged quantized coefficients — fully vectorized (one einsum over
    every block at once)."""
    h, w = bh * 8, bw * 8
    blocks = (plane.astype(np.float64) - 128.0).reshape(bh, 8, bw, 8)
    blocks = blocks.transpose(0, 2, 1, 3)                    # (bh,bw,8,8)
    f = np.einsum("ux,ijxy,vy->ijuv", _DCT, blocks, _DCT)
    q = np.round(f / qtbl).astype(np.int64)
    return q.reshape(bh, bw, 64)[..., ZIGZAG]


def _qblocks_plane(qblocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Inverse of _plane_qblocks: dequantize + IDCT every block at once,
    returning the padded float plane (levels restored, not yet clipped)."""
    bh, bw, _ = qblocks.shape
    rast = qblocks[..., UNZIGZAG].reshape(bh, bw, 8, 8).astype(np.float64)
    rast *= qtbl
    px = np.einsum("xu,ijuv,yv->ijxy", _DCT.T, rast, _DCT.T) + 128.0
    return px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


# ---- encoder ----------------------------------------------------------------

def _component_layout(w: int, h: int, subsample: bool):
    """Per-component (sampling factors, plane dims, padded block dims).
    Components are Y, Cb, Cr; 4:2:0 gives Y 2×2 and chroma 1×1."""
    samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []
    for hi, vi in samps:
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        comps.append({"h": hi, "v": vi, "w": cw, "ht": ch,
                      "bw": mcux * hi, "bh": mcuy * vi})
    return comps, mcux, mcuy


def _forward_qblocks(px: np.ndarray, quality: int, subsample: bool):
    """Color-convert, (optionally) subsample, pad, DCT, quantize — the
    exact coefficient arrays the scan will carry. Exposed so tests can
    assert the decoder inverts the entropy layer bit-for-bit."""
    h, w = px.shape[:2]
    ycc = _rgb_to_ycbcr(px)
    ql, qc = quality_tables(quality)
    comps, mcux, mcuy = _component_layout(w, h, subsample)
    out = []
    for ci, comp in enumerate(comps):
        plane = ycc[..., ci]
        if (comp["w"], comp["ht"]) != (w, h):
            # 2×2 box mean; odd edges replicate first so the box is full
            ph = plane if h % 2 == 0 else np.vstack([plane, plane[-1:]])
            ph = ph if w % 2 == 0 else np.hstack([ph, ph[:, -1:]])
            plane = ph.reshape(comp["ht"], 2, comp["w"], 2).mean(axis=(1, 3))
        padded = _pad_to(plane, comp["bh"] * 8, comp["bw"] * 8)
        out.append(_plane_qblocks(padded, ql if ci == 0 else qc,
                                  comp["bh"], comp["bw"]))
    return out, comps, mcux, mcuy


def _encode_block(wtr: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    size = abs(diff).bit_length()
    code, ln = dc_codes[size]
    wtr.write(code, ln)
    if size:
        wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]          # ZRL
            wtr.write(zc, zl)
            run -= 16
        s = abs(v).bit_length()
        ac, al = ac_codes[(run << 4) | s]
        wtr.write(ac, al)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_codes[0x00]              # EOB
        wtr.write(ec, el)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(px: np.ndarray, quality: int = 85, *,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """REAL baseline JPEG: (h, w, 3) uint8 RGB -> JFIF bytes."""
    h, w, c = px.shape
    assert c == 3, "RGB only"
    qblocks, comps, mcux, mcuy = _forward_qblocks(px, quality, subsample)
    ql, qc = quality_tables(quality)
    dc_l = _build_codes(DC_LUMA_SPEC)
    dc_c = _build_codes(DC_CHROMA_SPEC)
    ac_l = _build_codes(AC_LUMA_SPEC)
    ac_c = _build_codes(AC_CHROMA_SPEC)

    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_rst == restart_interval:
                wtr.flush()
                wtr.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                since_rst = 0
                preds = [0, 0, 0]
            for ci, comp in enumerate(comps):
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        zz = qblocks[ci][my * comp["v"] + v,
                                         mx * comp["h"] + hh]
                        preds[ci] = _encode_block(
                            wtr, zz, preds[ci],
                            dc_l if ci == 0 else dc_c,
                            ac_l if ci == 0 else ac_c)
            since_rst += 1
    wtr.flush()

    out = bytearray(b"\xff\xd8")                                    # SOI
    out += _seg(0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB",          # APP0
                                                1, 1, 0, 1, 1, 0, 0))
    out += _seg(0xDB, bytes([0x00])                                  # DQT
                + ql.flatten()[ZIGZAG].astype(np.uint8).tobytes()
                + bytes([0x01])
                + qc.flatten()[ZIGZAG].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for i, comp in enumerate(comps):
        sof += bytes([i + 1, (comp["h"] << 4) | comp["v"], 0 if i == 0 else 1])
    out += _seg(0xC0, sof)                                           # SOF0
    dht = bytearray()
    for cls, tid, spec in ((0, 0, DC_LUMA_SPEC), (1, 0, AC_LUMA_SPEC),
                           (0, 1, DC_CHROMA_SPEC), (1, 1, AC_CHROMA_SPEC)):
        dht += bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1])
    out += _seg(0xC4, bytes(dht))                                    # DHT
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))       # DRI
    sos = bytes([3])
    for i in range(3):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)                                           # SOS
    out += wtr.buf
    out += b"\xff\xd9"                                               # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------------

def _parse_segments(payload: bytes):
    """Marker walk up to (and including) the scan header. Returns the
    parsed state + the entropy-coded bytes of the single baseline scan."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got "
                             f"{payload[pos]:02X}")
        marker = payload[pos + 1]
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        data = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:                                   # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(data[i + 1:i + 65], np.uint8)
                t = np.zeros(64, np.int64)
                t[ZIGZAG] = zz
                qtabs[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:                                 # DHT
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 15
                bits = list(data[i + 1:i + 17])
                n = sum(bits)
                vals = list(data[i + 17:i + 17 + n])
                htabs[(cls, tid)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:                                 # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc != 3:
                raise ValueError(
                    f"unsupported component count {nc} in SOF0 "
                    "(3-component YCbCr only; grayscale/CMYK not handled)")
            comps = []
            for ci in range(nc):
                cid, hv, tq = data[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker FF{marker:02X};"
                " only baseline sequential SOF0 is implemented)")
        elif marker == 0xDD:                                 # DRI
            dri = struct.unpack(">H", data)[0]
        elif marker == 0xDA:                                 # SOS
            ns = data[0]
            scomps = []
            for si in range(ns):
                cs, tdta = data[1 + 2 * si:3 + 2 * si]
                scomps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 15})
            # entropy bytes run until the first marker that is neither
            # stuffing (FF 00) nor a restart (FF D0-D7)
            end = pos
            while end + 1 < len(payload):
                if payload[end] == 0xFF and payload[end + 1] not in (
                        0x00,) and not (0xD0 <= payload[end + 1] <= 0xD7):
                    break
                end += 1
            return sof, qtabs, htabs, dri, scomps, payload[pos:end]
        # APPn / COM / others: skipped
    raise ValueError("JPEG missing SOS scan")


def _decode_qblocks(payload: bytes):
    """Entropy-decode the scan back to per-component zigzagged quantized
    coefficient arrays — the exact inverse of _forward_qblocks' output
    (plus layout metadata). Split out for the inversion test."""
    sof, qtabs, htabs, dri, scomps, scan = _parse_segments(payload)
    if sof is None:
        raise ValueError("JPEG missing SOF0 header")
    w, h, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if c["tq"] not in qtabs:
            raise ValueError(
                f"component references undefined quant table {c['tq']}")
    by_id = {c["id"]: c for c in comps}
    if any(s["cs"] not in by_id for s in scomps):
        raise ValueError("SOS references a component id not in SOF0")
    order = [by_id[s["cs"]] for s in scomps]
    for c, s in zip(order, scomps):
        if (0, s["td"]) not in htabs or (1, s["ta"]) not in htabs:
            raise ValueError(
                f"scan references undefined Huffman table "
                f"(dc={s['td']}, ac={s['ta']})")
        c["dc"] = htabs[(0, s["td"])]
        c["ac"] = htabs[(1, s["ta"])]
        c["blocks"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)

    rdr = _BitReader(scan)
    preds = {c["id"]: 0 for c in comps}
    rst = 0
    since = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and since == dri:
                rdr.restart(rst)
                rst += 1
                since = 0
                preds = {c["id"]: 0 for c in comps}
            for c in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = c["blocks"][my * c["v"] + v, mx * c["h"] + hh]
                        t = rdr.decode_huff(c["dc"])
                        preds[c["id"]] += _extend(rdr.read_bits(t), t)
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rdr.decode_huff(c["ac"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16          # ZRL
                                    if k > 64:       # 16 zeros must fit
                                        raise ValueError(
                                            "ZRL run past block end")
                                    continue
                                break                # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rdr.read_bits(s), s)
                            k += 1
            since += 1
    return comps, qtabs, w, h, hmax, vmax


def parse_jpeg(payload: bytes) -> np.ndarray:
    """REAL baseline JPEG decode -> (h, w, 3) uint8 RGB."""
    comps, qtabs, w, h, hmax, vmax = _decode_qblocks(payload)
    planes = []
    for c in comps:
        plane = _qblocks_plane(c["blocks"], qtabs[c["tq"]])
        # nearest-neighbor chroma upsample to the full-res grid
        if c["h"] != hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:h, :w])
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
