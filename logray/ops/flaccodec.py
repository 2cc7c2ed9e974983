"""FLAC-subset lossless audio codec from scratch (stdlib + numpy).

The encoder emits a real FLAC-shaped stream: ``fLaC`` magic, a
STREAMINFO metadata block carrying the MD5 of the unencoded samples,
then fixed-blocksize FRAMEs — sync code, CRC-8-protected header with a
UTF-8-coded frame number, per-channel SUBFRAMEs (CONSTANT / VERBATIM /
FIXED predictors order 0–4 with Rice-coded residuals incl. the 4-bit
escape to raw two's-complement), byte-alignment padding, and a CRC-16
over the whole frame. Stereo frames pick the cheapest of
independent / left-side / right-side / mid-side decorrelation per frame.

The decoder verifies everything it can: magic, both CRCs per frame, and
the STREAMINFO MD5 against the decoded samples — so a successful decode
is itself an integrity proof. The codec is LOSSLESS: round-trip is
bit-exact (asserted in tests over every subframe type and channel
mode), which makes the pipeline lane's oracle the strongest of the
media lanes — truth computed from the ORIGINAL samples, reproduced
exactly from compressed bytes.

Subset scope (documented, not hidden): fixed block size, 16-bit
samples, mono/stereo, fixed predictors only (no generic LPC), Rice
partition order 0, no wasted-bits tracking. Streams from general FLAC
encoders using those features are outside this subset and raise.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: np.array([], np.int64),
    1: np.array([1], np.int64),
    2: np.array([2, -1], np.int64),
    3: np.array([3, -3, 1], np.int64),
    4: np.array([4, -6, 4, -1], np.int64),
}

# channel assignment codes (frame header): index = our mode name
_MODE_CODE = {"mono": 0b0000, "indep": 0b0001, "left_side": 0b1000,
              "right_side": 0b1001, "mid_side": 0b1010}
_CODE_MODE = {v: k for k, v in _MODE_CODE.items()}


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[(c ^ b) & 0xFF])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = (int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ (c << 8)) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length integer (frame number)."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F),
                      0x80 | (n & 0x3F)])
    if n < 0x200000:
        return bytes([0xF0 | (n >> 18), 0x80 | ((n >> 12) & 0x3F),
                      0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    raise ValueError("frame number too large for this subset")


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bits(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("FLAC stream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read_bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.acc = 0
        self.n = 0


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _unzigzag(z: int) -> int:
    return (z >> 1) if (z & 1) == 0 else -((z + 1) >> 1)


def _rice_cost(zig: np.ndarray) -> tuple[int, int]:
    """(best 4-bit rice param, total bits) over params 0..14, vectorized."""
    n = len(zig)
    best_p, best_c = 0, None
    for p in range(15):
        c = int((zig >> p).sum()) + n * (p + 1)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _residuals(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _subframe_plan(x: np.ndarray, bps: int):
    """Pick the cheapest subframe encoding for one channel of one frame.
    Returns (kind, order, payload-dict, cost_bits)."""
    n = len(x)
    if n and (x == x[0]).all():
        return ("constant", 0, {"value": int(x[0])}, bps)
    verbatim_cost = n * bps
    best = ("verbatim", 0, {}, verbatim_cost)
    for order in range(0, 5):
        if n <= order:
            continue
        res = _residuals(x, order)
        zig = _zigzag(res)
        p, rice_bits = _rice_cost(zig)
        width = 0
        esc_bits = None
        if len(res):
            width = max(1, int(np.abs(res).max()).bit_length() + 1)
            if width <= 31:
                esc_bits = 5 + len(res) * width
        cost = order * bps + 2 + 4  # warmup + coding method + part order
        if esc_bits is not None and esc_bits < rice_bits:
            cost += 4 + esc_bits
            enc = {"escape": width, "res": res}
        else:
            cost += 4 + rice_bits
            enc = {"param": p, "res": res}
        if cost < best[3]:
            best = ("fixed", order, enc, cost)
    return best


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int, plan) -> None:
    kind, order, enc, _ = plan
    w.write(0, 1)                                    # zero pad bit
    if kind == "constant":
        w.write(0b000000, 6)
        w.write(0, 1)                                # wasted bits: none
        w.write(enc["value"] & ((1 << bps) - 1), bps)
        return
    if kind == "verbatim":
        w.write(0b000001, 6)
        w.write(0, 1)
        mask = (1 << bps) - 1
        for v in x:
            w.write(int(v) & mask, bps)
        return
    w.write(0b001000 | order, 6)
    w.write(0, 1)
    mask = (1 << bps) - 1
    for v in x[:order]:                              # warmup, verbatim
        w.write(int(v) & mask, bps)
    res = enc["res"]
    w.write(0b00, 2)                                 # rice method, 4-bit
    w.write(0, 4)                                    # partition order 0
    if "escape" in enc:
        w.write(0b1111, 4)                           # escape code
        width = enc["escape"]
        w.write(width, 5)
        m = (1 << width) - 1
        for r in res:
            w.write(int(r) & m, width)
    else:
        p = enc["param"]
        w.write(p, 4)
        zig = _zigzag(res)
        for z in zig:
            q = int(z) >> p
            w.write(0, q)                            # q zeros …
            w.write(1, 1)                            # … then the stop 1
            w.write(int(z) & ((1 << p) - 1), p)
    return


def _read_subframe(r: _BitReader, n: int, bps: int) -> np.ndarray:
    if r.read_bits(1) != 0:
        raise ValueError("subframe padding bit set")
    t = r.read_bits(6)
    if r.read_bits(1) != 0:
        raise ValueError("wasted-bits subframes outside this subset")
    sign = 1 << (bps - 1)
    full = 1 << bps

    def sext(v: int) -> int:
        return v - full if v & sign else v

    if t == 0b000000:                                # CONSTANT
        return np.full(n, sext(r.read_bits(bps)), np.int64)
    if t == 0b000001:                                # VERBATIM
        return np.array([sext(r.read_bits(bps)) for _ in range(n)], np.int64)
    if (t >> 3) != 0b001:
        raise ValueError(f"subframe type {t:06b} (LPC?) outside this subset")
    order = t & 0b000111
    if order > 4:
        raise ValueError(f"fixed predictor order {order} invalid")
    warm = [sext(r.read_bits(bps)) for _ in range(order)]
    method = r.read_bits(2)
    if method != 0:
        raise ValueError("only 4-bit rice residual method supported")
    if r.read_bits(4) != 0:
        raise ValueError("rice partition order >0 outside this subset")
    p = r.read_bits(4)
    nres = n - order
    res = np.empty(nres, np.int64)
    if p == 0b1111:                                  # escape: raw binary
        width = r.read_bits(5)
        if width == 0:
            # legal in real FLAC: all residuals stored in zero bits
            res.fill(0)
        else:
            s2 = 1 << (width - 1)
            f2 = 1 << width
            for i in range(nres):
                v = r.read_bits(width)
                res[i] = v - f2 if v & s2 else v
    else:
        for i in range(nres):
            q = r.read_unary()
            z = (q << p) | r.read_bits(p)
            res[i] = _unzigzag(z)
    # undo the fixed predictor: integrate `order` times, seeding each
    # level with the first element of the k-th forward difference of the
    # warmup samples (seeding with raw warmups is only right for order 1)
    firsts = []
    w = np.array(warm, np.int64)
    for _ in range(order):
        firsts.append(int(w[0]))
        w = np.diff(w)
    x = res
    for k in range(order - 1, -1, -1):
        x = np.concatenate([[firsts[k]], x]).cumsum()
    return x.astype(np.int64)


def encode_flac(pcm: np.ndarray, rate: int = 8000,
                block_size: int = 1024, force_mode: str | None = None) -> bytes:
    """(n,) or (n, 2) int16 samples -> FLAC-subset bytes."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    assert nch in (1, 2) and pcm.dtype == np.int16
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)          # min block size
    si.write(block_size, 16)          # max block size
    si.write(0, 24)                   # min frame size (unknown)
    si.write(0, 24)                   # max frame size (unknown)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    info = bytes(si.buf) + md5
    out += bytes([0x80, 0, 0, len(info)]) + info   # last-block flag set

    # n == 0 emits zero frames; the decoder's `while got < total` loop
    # never starts and the MD5 of zero samples still verifies.
    for fi in range(-(-n // block_size)):
        lo = fi * block_size
        hi = min(n, lo + block_size)
        bs = hi - lo
        chans = [pcm[lo:hi, c].astype(np.int64) for c in range(nch)]
        # plan each distinct (channel, bps) pair once per frame — the four
        # stereo modes share channels (4 plans, not 8) and the chosen
        # mode's plans are reused by the write loop below
        memo: dict[tuple[int, int], tuple] = {}

        def _plan(x: np.ndarray, b: int):
            key = (id(x), b)
            if key not in memo:
                memo[key] = _subframe_plan(x, b)
            return memo[key]

        if nch == 1:
            subs = [(chans[0], 16)]
            mode = "mono"
        else:
            left, right = chans
            side = left - right
            cands = {
                "indep": [(left, 16), (right, 16)],
                "left_side": [(left, 16), (side, 17)],
                "right_side": [(side, 17), (right, 16)],
                "mid_side": [((left + right) >> 1, 16), (side, 17)],
            }
            if force_mode:
                mode = force_mode
            else:
                mode = min(cands, key=lambda m: sum(
                    _plan(x, b)[3] for x, b in cands[m]))
            subs = cands[mode]

        hdr = bytearray(b"\xff\xf8")
        hdr.append((0b0111 << 4) | 0b0000)   # bs: 16-bit at end; sr: STREAMINFO
        hdr.append((_MODE_CODE[mode] << 4) | (0b100 << 1))  # 16-bit samples
        hdr += _utf8_number(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        w = _BitWriter()
        for x, bps in subs:
            _write_subframe(w, x, bps, _plan(x, bps))
        w.align()
        frame = bytes(hdr) + bytes(w.buf)
        out += frame + struct.pack(">H", _crc16(frame))
        if hi >= n:
            break
    return bytes(out)


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC-subset bytes -> ((n, ch) int16 samples, sample_rate).
    Verifies the frame-header CRC-8, each frame's CRC-16, and the
    STREAMINFO MD5 of the decoded samples."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = nch = total = None
    md5 = b""
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr, ln = payload[pos], int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + ln]
        if hdr & 0x7F == 0:                          # STREAMINFO
            r = _BitReader(body)
            r.read_bits(16); r.read_bits(16)
            r.read_bits(24); r.read_bits(24)
            rate = r.read_bits(20)
            nch = r.read_bits(3) + 1
            if r.read_bits(5) + 1 != 16:
                raise ValueError("only 16-bit samples in this subset")
            total = r.read_bits(36)
            md5 = body[18:34]
        pos += 4 + ln
        if hdr & 0x80:                               # last metadata block
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    chans_out: list[np.ndarray] = []
    got = 0
    while got < total:
        # fixed header (4) + shortest utf8 number (1) + blocksize (2) +
        # crc8 (1) is the minimum a frame header can occupy
        if pos + 8 > len(payload):
            raise ValueError("FLAC stream truncated")
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFE) != 0xF8:
            raise ValueError(f"bad frame sync at {pos}")
        # header: fixed 4 bytes + utf8 number + 2-byte blocksize + crc8
        hpos = pos + 4
        first = payload[hpos]
        if first < 0x80:
            nfollow = 0
        elif first >> 5 == 0b110:
            nfollow = 1
        elif first >> 4 == 0b1110:
            nfollow = 2
        else:
            nfollow = 3
        hpos += 1 + nfollow
        if hpos + 3 > len(payload):                  # blocksize (2) + crc8
            raise ValueError("FLAC frame header truncated")
        bs = struct.unpack_from(">H", payload, hpos)[0] + 1
        hpos += 2
        if _crc8(payload[pos:hpos]) != payload[hpos]:
            raise ValueError("frame header CRC-8 mismatch")
        mode = _CODE_MODE.get(payload[pos + 3] >> 4)
        if mode is None:
            raise ValueError("unknown channel assignment")
        r = _BitReader(payload, hpos + 1)
        if mode == "mono":
            sig = [_read_subframe(r, bs, 16)]
        elif mode == "indep":
            sig = [_read_subframe(r, bs, 16), _read_subframe(r, bs, 16)]
        elif mode == "left_side":
            left = _read_subframe(r, bs, 16)
            side = _read_subframe(r, bs, 17)
            sig = [left, left - side]
        elif mode == "right_side":
            side = _read_subframe(r, bs, 17)
            right = _read_subframe(r, bs, 16)
            sig = [side + right, right]
        else:                                        # mid_side
            mid = _read_subframe(r, bs, 16)
            side = _read_subframe(r, bs, 17)
            # mid = (l+r)>>1 drops the sum's low bit, but side = l-r has
            # the same parity as l+r, so (mid<<1)|(side&1) == l+r exactly
            lr = (mid << 1) | (side & 1)
            sig = [(lr + side) >> 1, (lr - side) >> 1]
        r.align()
        end = r.pos
        if _crc16(payload[pos:end]) != struct.unpack_from(
                ">H", payload, end)[0]:
            raise ValueError("frame CRC-16 mismatch")
        pos = end + 2
        chans_out.append(np.stack(sig, axis=1))
        got += bs
    samples = (np.concatenate(chans_out, axis=0) if chans_out
               else np.zeros((0, nch), np.int64))
    if got != total:
        raise ValueError("decoded sample count != STREAMINFO total")
    out = samples.astype(np.int16)
    if (out.astype(np.int64) != samples).any():
        raise ValueError("decoded samples exceed 16-bit range")
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("decoded-audio MD5 mismatch vs STREAMINFO")
    return out, rate
