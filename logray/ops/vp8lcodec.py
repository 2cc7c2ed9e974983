"""WebP-lossless (VP8L) image codec from scratch (stdlib + numpy).

The encoder emits a real RIFF/WEBP container holding a real VP8L
bitstream: the 0x2F signature, LSB-first-packed 14-bit dimensions, the
optional SUBTRACT_GREEN transform, an optional color cache (the spec's
``(0x1e35a7bd * ARGB) >> (32 - bits)`` keying), and the spatially-coded
image — five canonical prefix codes (green+length+cache / red / blue /
alpha / distance) serialized through the spec's code-length code
(alphabet 19, ``kCodeLengthCodeOrder``, zero-run repeats 17/18, the
"simple code" 1/2-symbol form), pixels as literals, color-cache refs,
or LZ77 backward references whose lengths/distances use the
``(prefix, extra-bits)`` scheme and whose short distances go through
the 120-entry close-neighborhood plane-code mapping.

ALL FOUR spec transforms are implemented end-to-end, plus meta prefix
codes — this is a complete VP8L decoder, not a subset:

- PREDICTOR: the encoder picks the cheapest of the 14 spatial
  predictors per 2^b × 2^b block, ships the mode image as a recursive
  entropy-coded sub-resolution image, codes residuals; the decoder
  applies the spec's edge rules (top-left predicts black, row 0
  predicts L, column 0 predicts T, the rightmost column's top-right
  wraps to the current row's first pixel).
- COLOR (cross-color): per-block green→red / green→blue / red→blue
  3.5-fixed-point signed multipliers ((int8)t * (int8)c >> 5); the
  blue reconstruction uses the already-reconstructed red, so the
  forward direction uses the original red.
- SUBTRACT_GREEN: r/b deltas against green.
- COLOR_INDEXING: delta-coded palette image + pixel bundling (2/4/8
  indices per green byte for palettes ≤16/≤4/≤2 colors, earliest pixel
  in the least significant bits); bundling shrinks the coded width for
  every later read, tracked per-transform for the inverse.
- Meta prefix codes: an entropy image maps 2^b-pixel blocks to prefix-
  code groups ((red<<8)|green); every symbol is coded with its pixel's
  group. The encoder exercises a real two-group split.

Inverse transforms run in REVERSE bitstream order, each at the width
recorded when it was read. The decoder validates what the spec
validates: signature/version, prefix-code completeness (Kraft), repeat
overruns, in-bounds distances / cache indices / palette indices,
predictor-mode range, duplicate transforms, bitstream overrun.
Round-trip is bit-exact on pixels (lossless), so the pipeline lane's
truth sidecar (dims / luma / ahash computed from the ORIGINAL pixels)
is reproduced exactly from compressed bytes. Bit-order conventions
follow the public spec (RFC 9649): non-prefix values LSB-first, prefix
codes MSB-first, canonical code assignment as in DEFLATE.

Cross-implementation caveat (same status as the GIF/JPEG lanes): no
imaging library exists in this container, so conformance is established
by spec transcription + round-trip + hazard tests, not by decoding a
foreign encoder's output. The close-neighborhood distance table is
generated from the spec's ordering rule (distance, then |dx|, positive
dx first) over its domain dx∈[-7,8], dy∈[0,7]; head entries are pinned
in tests.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code symbol transmission order (spec kCodeLengthCodeOrder)
_KORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_MAX_CODE_LEN = 15        # pixel-code trees
_MAX_CLC_LEN = 7          # code-length-code lengths are stored in 3 bits
_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24    # max copy length (2+1)<<10 + 2^10 = 4096
_NUM_DIST_CODES = 40
_MAX_COPY_LEN = 4096
# largest distance the 40-code (prefix, extra-bits) alphabet can express:
# code 39 -> offset (2+1)<<18, plus 2^18 extra values -> 1,048,576; the
# plane-code mapping adds 120, so raw distances clamp 120 lower
_MAX_DIST_CODE = (3 << 18) + (1 << 18)
_HASH_MUL = 0x1E35A7BD    # color-cache multiplier (spec constant)


def _plane_codes() -> list[tuple[int, int]]:
    """The 120 close-neighborhood (dx, dy) pairs: dx in [-7, 8],
    dy in [0, 7], excluding non-positive raster offsets (dy == 0 needs
    dx >= 1), ordered by squared distance, then |dx|, positive first."""
    cand = [(dx, dy) for dy in range(8) for dx in range(-7, 9)
            if dy > 0 or dx >= 1]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cand) == 120
    return cand


_PLANE = _plane_codes()


# ---------------------------------------------------------------- bit I/O

class _BitWriter:
    """LSB-first bit packer; `code()` writes prefix codes MSB-first."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val: int, n: int) -> None:
        self.acc |= (val & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


class _BitReader:
    """LSB-first bit reader over a bytes buffer."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.d):
            raise ValueError("vp8l: bitstream overrun")
        b = (self.d[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


# ------------------------------------------------- canonical prefix codes

def _huff_once(freqs: list[int]) -> list[int]:
    """Optimal prefix-code lengths for positive frequencies (>=2 syms)."""
    import heapq

    heap = [(f, i, None) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    cnt = len(heap)
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        node = (a[0] + b[0], cnt, (a, b))
        cnt += 1
        heapq.heappush(heap, node)
    lens = [0] * len(freqs)
    stack = [(heap[0], 0)]
    while stack:
        (f, i, kids), depth = stack.pop()
        if kids is None:
            lens[i] = max(depth, 1)
        else:
            stack.append((kids[0], depth + 1))
            stack.append((kids[1], depth + 1))
    return lens


def _huff_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Length-limited prefix-code lengths via frequency halving (halving
    converges to a balanced tree, depth <= ceil(log2(k)) <= max_len for
    every alphabet used here)."""
    used = [i for i, f in enumerate(freqs) if f > 0]
    out = [0] * len(freqs)
    if not used:
        return out
    if len(used) == 1:
        out[used[0]] = 1
        return out
    f = [freqs[i] for i in used]
    while True:
        lens = _huff_once(f)
        if max(lens) <= max_len:
            break
        f = [max(1, x >> 1) for x in f]
    for s, ln in zip(used, lens):
        out[s] = ln
    return out


def _canon_codes(lengths: list[int]) -> list[int]:
    """DEFLATE-style canonical code assignment from code lengths."""
    max_l = max(lengths) if lengths else 0
    bl = [0] * (max_l + 1)
    for ln in lengths:
        if ln:
            bl[ln] += 1
    code = 0
    next_code = [0] * (max_l + 1)
    for ln in range(1, max_l + 1):
        code = (code + bl[ln - 1]) << 1
        next_code[ln] = code
    out = [0] * len(lengths)
    for s, ln in enumerate(lengths):
        if ln:
            out[s] = next_code[ln]
            next_code[ln] += 1
    return out


class _Tree:
    """Canonical prefix-code decoder (MSB-first bit-at-a-time); validates
    Kraft completeness. A one-symbol tree consumes zero bits (the spec's
    simple-code degenerate case)."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.single: int | None = nz[0][1]
            return
        self.single = None
        if sum(1 << (_MAX_CODE_LEN - ln) for ln, _ in nz) != 1 << _MAX_CODE_LEN:
            raise ValueError("vp8l: incomplete or oversubscribed prefix code")
        codes = _canon_codes(lengths)
        self.first: dict[int, int] = {}
        self.syms: dict[int, list[int]] = {}
        for ln, s in sorted(nz):
            if ln not in self.first:
                self.first[ln] = codes[s]
                self.syms[ln] = []
            self.syms[ln].append(s)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.bit()
            syms = self.syms.get(ln)
            if syms is not None:
                idx = code - self.first[ln]
                if 0 <= idx < len(syms):
                    return syms[idx]
        raise ValueError("vp8l: invalid prefix code in stream")


# ------------------------------------- prefix-code (de)serialization

def _zero_run_tokens(lengths: list[int]):
    """Tokenize code lengths with the spec's 17/18 zero-run repeats."""
    toks: list[tuple[int, int]] = []  # (symbol, extra_value)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run:
                if run >= 11:
                    take = min(run, 138)
                    toks.append((18, take - 11))
                elif run >= 3:
                    take = min(run, 10)
                    toks.append((17, take - 3))
                else:
                    toks.extend((0, 0) for _ in range(run))
                    take = run
                run -= take
        else:
            toks.append((lengths[i], 0))
            i += 1
    return toks


def _write_prefix_code(bw: _BitWriter, freqs: list[int]):
    """Serialize one prefix code; returns (lengths, codes) for writing
    symbols. Uses the simple form for <=2 used symbols that fit 8 bits,
    the normal code-length-code form otherwise."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    if not used:
        used = [0]
    if len(used) <= 2 and used[-1] <= 255:
        bw.bits(1, 1)                       # simple code
        bw.bits(len(used) - 1, 1)           # num_symbols - 1
        if len(used) == 1:
            first_8 = 1 if used[0] > 1 else 0
            bw.bits(first_8, 1)
            bw.bits(used[0], 8 if first_8 else 1)
            lengths = [0] * len(freqs)
            lengths[used[0]] = 0            # zero-bit code
            codes = [0] * len(freqs)
            return lengths, codes, {used[0]: (0, 0)}
        bw.bits(1, 1)                       # first symbol in 8 bits
        bw.bits(used[0], 8)
        bw.bits(used[1], 8)
        sym_bits = {used[0]: (0, 1), used[1]: (1, 1)}
        return None, None, sym_bits
    lengths = _huff_lengths(freqs, _MAX_CODE_LEN)
    codes = _canon_codes(lengths)
    toks = _zero_run_tokens(lengths)
    clf = [0] * 19
    for s, _ in toks:
        clf[s] += 1
    cl_lengths = _huff_lengths(clf, _MAX_CLC_LEN)
    cl_codes = _canon_codes(cl_lengths)
    bw.bits(0, 1)                           # not simple
    bw.bits(19 - 4, 4)                      # transmit all 19 CLC lengths
    for s in _KORDER:
        bw.bits(cl_lengths[s], 3)
    bw.bits(0, 1)                           # no explicit max_symbol
    one_sym = sum(1 for ln in cl_lengths if ln) == 1
    for s, extra in toks:
        if not one_sym:                     # single-symbol CLC: zero bits
            bw.code(cl_codes[s], cl_lengths[s])
        if s == 17:
            bw.bits(extra, 3)
        elif s == 18:
            bw.bits(extra, 7)
    if sum(1 for ln in lengths if ln) == 1:
        # a normal-coded tree with ONE used symbol decodes with ZERO bits
        # (the reader's single-symbol tree) — symbols >255 can't take the
        # simple form, so this path is reachable, e.g. a prefix-code
        # group whose every token is a backreference
        sym_bits = {s: (0, 0) for s, ln in enumerate(lengths) if ln}
    else:
        sym_bits = {s: (codes[s], lengths[s])
                    for s, ln in enumerate(lengths) if ln}
    return lengths, codes, sym_bits


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Tree:
    if br.bit():                            # simple code
        num_symbols = br.bit() + 1
        first_8 = br.bit()
        s0 = br.bits(8 if first_8 else 1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 1:
            lengths[s0] = 1                 # _Tree treats 1 symbol as 0-bit
            return _Tree(lengths)
        s1 = br.bits(8)
        if s1 >= alphabet_size or s1 == s0:
            raise ValueError("vp8l: bad simple-code symbol pair")
        # the simple form only lists the symbols; decoding is canonical
        # like every other prefix code (both lengths are 1, so bit 0 maps
        # to the SMALLER symbol regardless of transmission order)
        lengths = [0] * alphabet_size
        lengths[s0] = lengths[s1] = 1
        return _Tree(lengths)
    num_codes = br.bits(4) + 4
    if num_codes > 19:
        raise ValueError("vp8l: bad code-length-code count")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_KORDER[i]] = br.bits(3)
    clt = _Tree(cl_lengths)
    if br.bit():                            # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clt.read(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = br.bits(2) + 3, prev_len
            elif code_len == 17:
                repeat, fill = br.bits(3) + 3, 0
            else:
                repeat, fill = br.bits(7) + 11, 0
            if sym + repeat > alphabet_size:
                raise ValueError("vp8l: code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
    return _Tree(lengths)


# ------------------------------------------- (prefix, extra) value coding

def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_symbol, extra_bits, extra_value)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length() - 1
    extra = n - 1
    lsb = (x >> extra) & 1
    sym = 2 * extra + 2 + lsb
    rem = x - ((2 + lsb) << extra)
    return sym, extra, rem


def _prefix_decode(sym: int, br: _BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.bits(extra) + 1


def _cache_key(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# ------------------------------------------------ predictor transform math

def _ch(v: int) -> tuple[int, int, int, int]:
    return ((v >> 24) & 255, (v >> 16) & 255, (v >> 8) & 255, v & 255)


def _argb(c: tuple[int, int, int, int]) -> int:
    return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]


def _avg2(a, b):
    return ((a[0] + b[0]) >> 1, (a[1] + b[1]) >> 1,
            (a[2] + b[2]) >> 1, (a[3] + b[3]) >> 1)


def _clamp255(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


def _predict(mode: int, L, T, TL, TR):
    """The spec's 14 spatial predictors over (a, r, g, b) tuples.

    Select's tie (mode 11) goes to T and ClampAddSubtractHalf truncates
    toward zero, mirroring the C reference arithmetic; encoder and
    decoder share this function, so the choice is self-consistent."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        p = (L[0] + T[0] - TL[0], L[1] + T[1] - TL[1],
             L[2] + T[2] - TL[2], L[3] + T[3] - TL[3])
        pL = (abs(p[0] - L[0]) + abs(p[1] - L[1])
              + abs(p[2] - L[2]) + abs(p[3] - L[3]))
        pT = (abs(p[0] - T[0]) + abs(p[1] - T[1])
              + abs(p[2] - T[2]) + abs(p[3] - T[3]))
        return T if pT <= pL else L
    if mode == 12:
        return tuple(_clamp255(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:
        a = _avg2(L, T)
        out = []
        for ac, tlc in zip(a, TL):
            d = ac - tlc
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_clamp255(ac + half))
        return tuple(out)
    raise ValueError(f"vp8l: invalid predictor mode {mode}")


def _pred_at(buf, i, x, y, w, mode):
    """Prediction for pixel i given already-known pixels in buf; edge
    rules per the spec: (0,0) predicts BLACK, the rest of row 0 predicts
    L, column 0 predicts T. TR of the rightmost column is buf[i-w+1] =
    the current row's first pixel (raster order makes it well-defined)."""
    if y == 0:
        return (255, 0, 0, 0) if x == 0 else buf[i - 1]
    if x == 0:
        return buf[i - w]
    return _predict(mode, buf[i - 1], buf[i - w], buf[i - w - 1],
                    buf[i - w + 1])


def _apply_predictor(ch_px, w, h, size_bits):
    """Forward predictor transform: pick the cheapest of the 14 modes per
    block (cost = sum of per-channel signed-residual magnitudes), return
    (residual argb ints, mode-image argb ints)."""
    pw = (w + (1 << size_bits) - 1) >> size_bits
    ph = (h + (1 << size_bits) - 1) >> size_bits
    modes = [0] * (pw * ph)
    for by in range(ph):
        y0, y1 = by << size_bits, min((by + 1) << size_bits, h)
        for bx in range(pw):
            x0, x1 = bx << size_bits, min((bx + 1) << size_bits, w)
            best_mode, best_cost = 0, None
            for mode in range(14):
                cost = 0
                for y in range(y0, y1):
                    base = y * w
                    for x in range(x0, x1):
                        i = base + x
                        pred = _pred_at(ch_px, i, x, y, w, mode)
                        v = ch_px[i]
                        for c in range(4):
                            r = (v[c] - pred[c]) & 255
                            cost += r if r < 128 else 256 - r
                    if best_cost is not None and cost >= best_cost:
                        break
                if best_cost is None or cost < best_cost:
                    best_mode, best_cost = mode, cost
            modes[by * pw + bx] = best_mode
    res = [0] * (w * h)
    for i, v in enumerate(ch_px):
        y, x = divmod(i, w)
        mode = modes[(y >> size_bits) * pw + (x >> size_bits)]
        pred = _pred_at(ch_px, i, x, y, w, mode)
        res[i] = _argb(((v[0] - pred[0]) & 255, (v[1] - pred[1]) & 255,
                        (v[2] - pred[2]) & 255, (v[3] - pred[3]) & 255))
    return res, [0xFF000000 | (m << 8) for m in modes]


def _inverse_predictor(res, w, h, size_bits, sub):
    """Inverse predictor transform over residual argb ints."""
    pw = (w + (1 << size_bits) - 1) >> size_bits
    ph = (h + (1 << size_bits) - 1) >> size_bits
    if len(sub) != pw * ph:
        raise ValueError("vp8l: predictor image size mismatch")
    if len(res) != w * h:
        raise ValueError("vp8l: predictor input size mismatch")
    out = [None] * len(res)
    for i, rv in enumerate(res):
        y, x = divmod(i, w)
        if y == 0 or x == 0:
            pred = _pred_at(out, i, x, y, w, 0)
        else:
            mode = (sub[(y >> size_bits) * pw + (x >> size_bits)] >> 8) & 255
            if mode > 13:
                raise ValueError(f"vp8l: invalid predictor mode {mode}")
            pred = _pred_at(out, i, x, y, w, mode)
        r = _ch(rv)
        out[i] = ((r[0] + pred[0]) & 255, (r[1] + pred[1]) & 255,
                  (r[2] + pred[2]) & 255, (r[3] + pred[3]) & 255)
    return [_argb(c) for c in out]


# ------------------------------------------------ color (cross-color)

def _as_int8(a):
    """Reinterpret uint8-valued ints as signed int8 (numpy-safe)."""
    return ((a + 128) % 256) - 128


def _color_delta_np(t: int, c):
    """Vectorized ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic
    shift, matching the C reference)."""
    return (_as_int8(t) * _as_int8(c)) >> 5


def _apply_color(argb, w, h, size_bits):
    """Forward cross-color transform: per block, pick (green_to_red,
    green_to_blue, red_to_blue) from a candidate grid minimizing the
    signed-residual magnitude (numpy-vectorized per candidate); returns
    (residual argb ints, cte-image argb ints). The r2b delta uses the
    ORIGINAL red, mirroring the inverse which reconstructs red first."""
    arr = np.array(argb, dtype=np.uint32).reshape(h, w)
    red = ((arr >> 16) & 255).astype(np.int64)
    green = ((arr >> 8) & 255).astype(np.int64)
    blue = (arr & 255).astype(np.int64)
    pw = (w + (1 << size_bits) - 1) >> size_bits
    ph = (h + (1 << size_bits) - 1) >> size_bits
    cands = (-96, -64, -32, 0, 32, 64, 96)
    r2b_cands = (-32, 0, 32)
    ctes = [0] * (pw * ph)
    new_red = np.zeros_like(red)
    new_blue = np.zeros_like(blue)

    def mag(x):
        m = x % 256
        return np.minimum(m, 256 - m).sum()

    for by in range(ph):
        y0, y1 = by << size_bits, min((by + 1) << size_bits, h)
        for bx in range(pw):
            x0, x1 = bx << size_bits, min((bx + 1) << size_bits, w)
            rb = red[y0:y1, x0:x1]
            gb = green[y0:y1, x0:x1]
            bb = blue[y0:y1, x0:x1]
            g2r = min(cands, key=lambda t: mag(rb - _color_delta_np(t, gb)))
            res_r = (rb - _color_delta_np(g2r, gb)) % 256
            best = None
            for g2b in cands:
                part = bb - _color_delta_np(g2b, gb)
                for r2b in r2b_cands:
                    cost = mag(part - _color_delta_np(r2b, rb))
                    if best is None or cost < best[0]:
                        best = (cost, g2b, r2b)
            _, g2b, r2b = best
            res_b = (bb - _color_delta_np(g2b, gb)
                     - _color_delta_np(r2b, rb)) % 256
            new_red[y0:y1, x0:x1] = res_r
            new_blue[y0:y1, x0:x1] = res_b
            ctes[by * pw + bx] = (0xFF000000 | ((r2b & 255) << 16)
                                  | ((g2b & 255) << 8) | (g2r & 255))
    out = ((arr & 0xFF00FF00)
           | (new_red.astype(np.uint32) << 16)
           | new_blue.astype(np.uint32))
    return [int(v) for v in out.ravel()], ctes


def _inverse_color(res, w, h, size_bits, sub):
    """Inverse cross-color transform (vectorized: no sequential pixel
    dependency — red reconstructs from green alone, blue from green and
    the reconstructed red)."""
    pw = (w + (1 << size_bits) - 1) >> size_bits
    ph = (h + (1 << size_bits) - 1) >> size_bits
    if len(sub) != pw * ph:
        raise ValueError("vp8l: color image size mismatch")
    if len(res) != w * h:
        raise ValueError("vp8l: color input size mismatch")
    arr = np.array(res, dtype=np.uint32).reshape(h, w)
    ys = (np.arange(h) >> size_bits)[:, None]
    xs = (np.arange(w) >> size_bits)[None, :]
    cte = np.array(sub, dtype=np.uint32).reshape(ph, pw)[ys, xs]
    g2r = ((cte & 255)).astype(np.int64)
    g2b = ((cte >> 8) & 255).astype(np.int64)
    r2b = ((cte >> 16) & 255).astype(np.int64)
    red = ((arr >> 16) & 255).astype(np.int64)
    green = ((arr >> 8) & 255).astype(np.int64)
    blue = (arr & 255).astype(np.int64)
    red = (red + (_as_int8(g2r) * _as_int8(green) >> 5)) % 256
    blue = (blue + (_as_int8(g2b) * _as_int8(green) >> 5)
            + (_as_int8(r2b) * _as_int8(red) >> 5)) % 256
    out = ((arr & 0xFF00FF00)
           | (red.astype(np.uint32) << 16) | blue.astype(np.uint32))
    return [int(v) for v in out.ravel()]


# ------------------------------------------------ color indexing (palette)

def _palette_width_bits(size: int) -> int:
    return 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0


def _apply_palette(argb, w, h):
    """Forward color-indexing transform: order-preserving palette, the
    spec's delta-coded palette image, and pixel bundling for palettes of
    at most 16 colors (2/4/8 indices packed into one green byte, earliest
    pixel in the least significant bits). Returns (packed argb ints,
    packed width, coded palette argb ints, width_bits) or None when the
    image has more than 256 distinct colors."""
    pal: list[int] = []
    index: dict[int, int] = {}
    for v in argb:
        if v not in index:
            if len(pal) == 256:
                return None
            index[v] = len(pal)
            pal.append(v)
    width_bits = _palette_width_bits(len(pal))
    per = 1 << width_bits
    bpp = 8 >> width_bits
    packed_w = (w + per - 1) >> width_bits
    packed = [0] * (packed_w * h)
    for y in range(h):
        row = y * w
        for gx in range(packed_w):
            gval = 0
            for k in range(per):
                x = (gx << width_bits) + k
                if x >= w:
                    break
                gval |= index[argb[row + x]] << (k * bpp)
            packed[y * packed_w + gx] = 0xFF000000 | (gval << 8)
    coded = []
    prev = (0, 0, 0, 0)
    for v in pal:
        c = _ch(v)
        coded.append(_argb(tuple((cc - pc) & 255 for cc, pc in zip(c, prev))))
        prev = c
    return packed, packed_w, coded, width_bits


def _inverse_palette(packed, packed_w, w, h, pal, width_bits):
    """Inverse color-indexing: unbundle indices from the green channel
    and look them up; out-of-range indices raise (strict, unlike decoders
    that emit black)."""
    if len(packed) != packed_w * h:
        raise ValueError("vp8l: palette input size mismatch")
    per = 1 << width_bits
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    npal = len(pal)
    out = [0] * (w * h)
    for y in range(h):
        prow = y * packed_w
        orow = y * w
        for x in range(w):
            green = (packed[prow + (x >> width_bits)] >> 8) & 255
            idx = (green >> ((x % per) * bpp)) & mask
            if idx >= npal:
                raise ValueError("vp8l: palette index out of range")
            out[orow + x] = pal[idx]
    return out


# --------------------------------------------------- entropy-coded images

def _tokenize_stream(argb, w, *, cache_bits, min_match):
    """LZ77 + color-cache tokenization shared by all group layouts.
    Returns (tokens, positions): token k starts at pixel positions[k]."""
    n = len(argb)
    dist_to_plane: dict[int, int] = {}
    for ci, (dx, dy) in enumerate(_PLANE):
        d = dy * w + dx
        if d >= 1 and d not in dist_to_plane:
            dist_to_plane[d] = ci + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    filled = [False] * cache_size
    tokens: list[tuple] = []
    positions: list[int] = []
    chains: dict[tuple[int, int], list[int]] = {}

    def note_pixel(pos: int) -> None:
        v = argb[pos]
        if cache_size:
            k = _cache_key(v, cache_bits)
            cache[k] = v
            filled[k] = True
        if pos + 1 < n:
            key = (v, argb[pos + 1])
            lst = chains.setdefault(key, [])
            lst.append(pos)
            if len(lst) > 8:
                del lst[0]

    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 1 < n:
            cands = list(chains.get((argb[i], argb[i + 1]), ()))
        else:
            cands = []
        if i >= 1:
            cands.append(i - 1)
        if i >= w:
            cands.append(i - w)
        lim = min(_MAX_COPY_LEN, n - i)
        for j in cands:
            if argb[j] != argb[i]:
                continue
            if i - j + 120 > _MAX_DIST_CODE:
                continue    # beyond the distance alphabet's reach
            ln = 1
            while ln < lim and argb[j + ln] == argb[i + ln]:
                ln += 1
            if ln > best_len:
                best_len, best_dist = ln, i - j
        if best_len >= min_match:
            dist_code = dist_to_plane.get(best_dist, best_dist + 120)
            lsym, lxb, lxv = _prefix_encode(best_len)
            dsym, dxb, dxv = _prefix_encode(dist_code)
            tokens.append(("copy", lsym, lxb, lxv, dsym, dxb, dxv))
            positions.append(i)
            for k in range(best_len):
                note_pixel(i + k)
            i += best_len
            continue
        v = argb[i]
        if cache_size:
            k = _cache_key(v, cache_bits)
            if filled[k] and cache[k] == v:
                tokens.append(("cache", k))
                positions.append(i)
                note_pixel(i)
                i += 1
                continue
        tokens.append(("lit", v))
        positions.append(i)
        note_pixel(i)
        i += 1
    return tokens, positions


def _write_image_stream(bw: _BitWriter, argb: list[int], w: int, *,
                        cache_bits: int = 0, min_match: int = 3,
                        is_level0: bool = False,
                        meta_bits: int | None = None) -> None:
    """Serialize one entropy-coded image (the spatially-coded main image
    or a transform's sub-resolution image): color-cache bit(s), the
    level-0 meta-prefix bit — with an optional REAL meta-prefix layout
    when ``meta_bits`` is set: the entropy image maps each 2^b × 2^b
    block to a prefix-code group, frequencies accumulate per group, and
    every token is coded with its start pixel's group — then the groups'
    prefix codes and the token stream. The caller writes everything
    upstream (dims, transforms)."""
    n = len(argb)
    h = (n + w - 1) // w
    cache_size = (1 << cache_bits) if cache_bits else 0
    tokens, positions = _tokenize_stream(argb, w, cache_bits=cache_bits,
                                         min_match=min_match)

    if meta_bits is not None:
        if not is_level0:
            raise ValueError("meta prefix codes are a level-0 feature")
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        # two groups: top half of meta rows vs bottom half (exercises
        # real group switching without an open-ended search)
        split = max(1, mh // 2)
        meta_img = [0xFF000000 | ((0 if my < split else 1) << 8)
                    for my in range(mh) for _ in range(mw)]
        ngroups = 2 if mh > 1 else 1

        def group_of(pos: int) -> int:
            y, x = divmod(pos, w)
            return (meta_img[(y >> meta_bits) * mw
                             + (x >> meta_bits)] >> 8) & 0xFFFF
    else:
        ngroups = 1

        def group_of(pos: int) -> int:
            return 0

    gfreq = [[0] * (_NUM_LITERALS + _NUM_LENGTH_CODES + cache_size)
             for _ in range(ngroups)]
    rfreq = [[0] * 256 for _ in range(ngroups)]
    bfreq = [[0] * 256 for _ in range(ngroups)]
    afreq = [[0] * 256 for _ in range(ngroups)]
    dfreq = [[0] * _NUM_DIST_CODES for _ in range(ngroups)]
    tok_groups = []
    for tok, pos in zip(tokens, positions):
        gi = group_of(pos)
        tok_groups.append(gi)
        if tok[0] == "lit":
            v = tok[1]
            gfreq[gi][(v >> 8) & 0xFF] += 1
            rfreq[gi][(v >> 16) & 0xFF] += 1
            bfreq[gi][v & 0xFF] += 1
            afreq[gi][(v >> 24) & 0xFF] += 1
        elif tok[0] == "copy":
            gfreq[gi][_NUM_LITERALS + tok[1]] += 1
            dfreq[gi][tok[4]] += 1
        else:
            gfreq[gi][_NUM_LITERALS + _NUM_LENGTH_CODES + tok[1]] += 1

    if cache_size:
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    if is_level0:
        if meta_bits is not None:
            bw.bits(1, 1)
            bw.bits(meta_bits - 2, 3)
            _write_image_stream(bw, meta_img, mw, cache_bits=0,
                                min_match=min_match)
        else:
            bw.bits(0, 1)               # no meta prefix codes

    groups = []
    for gi in range(ngroups):
        _, _, gsym = _write_prefix_code(bw, gfreq[gi])
        _, _, rsym = _write_prefix_code(bw, rfreq[gi])
        _, _, bsym = _write_prefix_code(bw, bfreq[gi])
        _, _, asym = _write_prefix_code(bw, afreq[gi])
        _, _, dsym = _write_prefix_code(bw, dfreq[gi])
        groups.append((gsym, rsym, bsym, asym, dsym))

    for tok, gi in zip(tokens, tok_groups):
        gsym, rsym, bsym, asym, dsym_codes = groups[gi]
        if tok[0] == "lit":
            v = tok[1]
            c, ln = gsym[(v >> 8) & 0xFF]
            bw.code(c, ln)
            c, ln = rsym[(v >> 16) & 0xFF]
            bw.code(c, ln)
            c, ln = bsym[v & 0xFF]
            bw.code(c, ln)
            c, ln = asym[(v >> 24) & 0xFF]
            bw.code(c, ln)
        elif tok[0] == "copy":
            _, lsym, lxb, lxv, ds, dxb, dxv = tok
            c, ln = gsym[_NUM_LITERALS + lsym]
            bw.code(c, ln)
            if lxb:
                bw.bits(lxv, lxb)
            c, ln = dsym_codes[ds]
            bw.code(c, ln)
            if dxb:
                bw.bits(dxv, dxb)
        else:
            c, ln = gsym[_NUM_LITERALS + _NUM_LENGTH_CODES + tok[1]]
            bw.code(c, ln)


def _read_image_stream(br: _BitReader, w: int, h: int, *,
                       is_level0: bool):
    """Decode one entropy-coded image; at level 0 also reads the
    transform list (recursing into sub-resolution images for PREDICTOR /
    COLOR / COLOR_INDEXING) and the meta-prefix entropy image. Returns
    (argb_list, transforms) — transforms in read order, each carrying
    the image width in effect when it was read (COLOR_INDEXING shrinks
    the width for everything downstream via pixel bundling)."""
    transforms: list[tuple] = []
    if is_level0:
        seen = set()
        while br.bit():
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 2:
                transforms.append(("subtract_green", w))
            elif ttype in (0, 1):
                size_bits = br.bits(3) + 2
                pw = (w + (1 << size_bits) - 1) >> size_bits
                ph = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _read_image_stream(br, pw, ph, is_level0=False)
                kind = "predictor" if ttype == 0 else "color"
                transforms.append((kind, w, size_bits, sub))
            else:                       # ttype == 3: COLOR_INDEXING
                psize = br.bits(8) + 1
                coded, _ = _read_image_stream(br, psize, 1,
                                              is_level0=False)
                pal = []
                prev = (0, 0, 0, 0)
                for v in coded:
                    c = _ch(v)
                    prev = tuple((pc + cc) & 255 for pc, cc in zip(prev, c))
                    pal.append(_argb(prev))
                width_bits = _palette_width_bits(psize)
                transforms.append(("palette", w, pal, width_bits))
                w = (w + (1 << width_bits) - 1) >> width_bits

    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color-cache size")

    meta = None
    ngroups = 1
    if is_level0 and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img, _ = _read_image_stream(br, mw, mh, is_level0=False)
        meta = (meta_bits, mw, [((v >> 8) & 0xFFFF) for v in meta_img])
        ngroups = max(meta[2]) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(ngroups):
        gtree = _read_prefix_code(
            br, _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size)
        rtree = _read_prefix_code(br, 256)
        btree = _read_prefix_code(br, 256)
        atree = _read_prefix_code(br, 256)
        dtree = _read_prefix_code(br, _NUM_DIST_CODES)
        groups.append((gtree, rtree, btree, atree, dtree))

    n = w * h
    out = [0] * n
    cache = [0] * cache_size
    i = 0
    while i < n:
        if meta is None:
            gtree, rtree, btree, atree, dtree = groups[0]
        else:
            meta_bits, mw, mvals = meta
            y, x = divmod(i, w)
            gi = mvals[(y >> meta_bits) * mw + (x >> meta_bits)]
            gtree, rtree, btree, atree, dtree = groups[gi]
        s = gtree.read(br)
        if s < _NUM_LITERALS:
            green = s
            red = rtree.read(br)
            blue = btree.read(br)
            alpha = atree.read(br)
            v = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[i] = v
            if cache_size:
                cache[_cache_key(v, cache_bits)] = v
            i += 1
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _prefix_decode(s - _NUM_LITERALS, br)
            dist_code = _prefix_decode(dtree.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _PLANE[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > i:
                raise ValueError("vp8l: backward reference before start")
            if i + length > n:
                raise ValueError("vp8l: backward reference overruns image")
            for _ in range(length):
                v = out[i - dist]
                out[i] = v
                if cache_size:
                    cache[_cache_key(v, cache_bits)] = v
                i += 1
        else:
            idx = s - _NUM_LITERALS - _NUM_LENGTH_CODES
            if idx >= cache_size:
                raise ValueError("vp8l: color-cache index out of range")
            out[i] = cache[idx]
            i += 1
    return out, transforms


# ----------------------------------------------------------------- encode

def encode_vp8l(px: np.ndarray, *, cache_bits: int = 0,
                subtract_green: bool = False,
                predictor_bits: int | None = None,
                color_bits: int | None = None,
                palette: bool = False,
                meta_bits: int | None = None,
                min_match: int = 3) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a RIFF/WEBP VP8L stream.

    All four spec transforms are available: ``subtract_green``;
    ``predictor_bits`` (2..9) for the 14-mode spatial predictor;
    ``color_bits`` (2..9) for the cross-color transform (per-block
    green→red / green→blue / red→blue 3.5-fixed-point multipliers);
    ``palette=True`` for color indexing with the spec's delta-coded
    palette image and pixel bundling (requires ≤256 distinct colors and
    excludes the other transforms, matching how real encoders use it).
    ``meta_bits`` (2..9) enables meta prefix codes: a real two-group
    entropy image splitting the image's upper and lower meta-block rows.
    Transforms are applied in stream-read order (SG → COLOR → PREDICTOR)
    and inverted by the decoder in reverse."""
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_vp8l expects (h, w, 3) uint8")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits must be in [0, 11]")
    for name, val in (("predictor_bits", predictor_bits),
                      ("color_bits", color_bits), ("meta_bits", meta_bits)):
        if val is not None and not 2 <= val <= 9:
            raise ValueError(f"{name} must be in [2, 9]")
    if palette and (subtract_green or predictor_bits or color_bits):
        raise ValueError("palette excludes the pixel-space transforms")
    h, w = px.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("vp8l dimensions out of range")
    r = px[:, :, 0].astype(np.int32)
    g = px[:, :, 1].astype(np.int32)
    b = px[:, :, 2].astype(np.int32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    argb = ((0xFF << 24) | (r << 16) | (g << 8) | b).ravel().tolist()

    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)                           # alpha hint: opaque
    bw.bits(0, 3)                           # version 0
    code_w = w
    if palette:
        packed = _apply_palette(argb, w, h)
        if packed is None:
            raise ValueError("palette requires <=256 distinct colors")
        argb, code_w, coded_pal, width_bits = packed
        bw.bits(1, 1)                       # transform present
        bw.bits(3, 2)                       # COLOR_INDEXING
        bw.bits(len(coded_pal) - 1, 8)
        _write_image_stream(bw, coded_pal, len(coded_pal),
                            min_match=min_match)
    if subtract_green:
        bw.bits(1, 1)                       # transform present
        bw.bits(2, 2)                       # SUBTRACT_GREEN
    if color_bits is not None:
        argb, cte_img = _apply_color(argb, w, h, color_bits)
        bw.bits(1, 1)
        bw.bits(1, 2)                       # COLOR
        bw.bits(color_bits - 2, 3)
        cw = (w + (1 << color_bits) - 1) >> color_bits
        _write_image_stream(bw, cte_img, cw, min_match=min_match)
    if predictor_bits is not None:
        ch_px = [_ch(v) for v in argb]
        argb, mode_img = _apply_predictor(ch_px, w, h, predictor_bits)
        bw.bits(1, 1)
        bw.bits(0, 2)                       # PREDICTOR
        bw.bits(predictor_bits - 2, 3)
        pw = (w + (1 << predictor_bits) - 1) >> predictor_bits
        _write_image_stream(bw, mode_img, pw, min_match=min_match)
    bw.bits(0, 1)                           # end of transforms
    _write_image_stream(bw, argb, code_w, cache_bits=cache_bits,
                        min_match=min_match, is_level0=True,
                        meta_bits=meta_bits)

    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ----------------------------------------------------------------- decode

def decode_vp8l(payload: bytes, *, return_alpha: bool = False) -> np.ndarray:
    """Decode a RIFF/WEBP VP8L stream to an (h, w, 3) uint8 RGB array
    ((h, w, 4) RGBA with ``return_alpha``). The full lossless format is
    supported: all four transforms (PREDICTOR, COLOR, SUBTRACT_GREEN,
    COLOR_INDEXING incl. pixel bundling), color cache, LZ77 with
    plane-code distances, meta prefix codes, and every prefix-code
    serialization form."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("vp8l: not a RIFF/WEBP container")
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("vp8l: truncated chunk")
        if fourcc == b"VP8L":
            data = body
            break
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("vp8l: no VP8L chunk")
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()                                # alpha hint (informational)
    if br.bits(3) != 0:
        raise ValueError("vp8l: unsupported version")

    out, transforms = _read_image_stream(br, w, h, is_level0=True)

    # inverse transforms run in REVERSE read order (spec); each runs at
    # the width recorded when it was read (palette expands the width)
    for t in reversed(transforms):
        if t[0] == "predictor":
            out = _inverse_predictor(out, t[1], h, t[2], t[3])
        elif t[0] == "color":
            out = _inverse_color(out, t[1], h, t[2], t[3])
        elif t[0] == "palette":
            full_w, pal, width_bits = t[1], t[2], t[3]
            packed_w = (full_w + (1 << width_bits) - 1) >> width_bits
            out = _inverse_palette(out, packed_w, full_w, h, pal,
                                   width_bits)
        else:                               # subtract_green, in place
            arr = np.array(out, dtype=np.uint32)
            g = (arr >> 8) & 0xFF
            r = (((arr >> 16) & 0xFF) + g) & 0xFF
            b = ((arr & 0xFF) + g) & 0xFF
            arr = (arr & 0xFF00FF00) | (r << 16) | b
            out = [int(v) for v in arr]

    arr = np.array(out, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.int32)
    g = ((arr >> 8) & 0xFF).astype(np.int32)
    b = (arr & 0xFF).astype(np.int32)
    if return_alpha:
        return np.stack([r, g, b, a.astype(np.int32)],
                        axis=-1).astype(np.uint8)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)
