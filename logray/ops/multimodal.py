"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Decode modes per stage:
- ``decode="wav"`` / ``decode="ppm"`` — REAL decoders for formats the
  standard library + numpy can handle: RIFF/WAVE PCM16 audio (stdlib
  ``wave``) and netpbm P6 images (header parse + raw RGB). Real duration/
  RMS/zero-crossings from real samples; real dimensions/Rec.601 luma/
  8×8 average-hash from real pixels; real nearest-neighbor resampling
  emitting a valid P6 payload.
- ``decode="png"`` / ``decode="gif"`` / ``decode="jpeg"`` /
  ``decode="webp"`` — REAL decoders for compressed formats, built from
  scratch on stdlib + numpy: PNG (zlib inflate + all five scanline
  filters), GIF89a (hand-rolled variable-width LZW), baseline-sequential
  JPEG (numpy DCT, canonical Huffman, byte stuffing, restart markers,
  4:2:0 — see ``logray/ops/jpegcodec.py``), and WebP-lossless VP8L
  (canonical prefix codes, LZ77 plane-code distances, color cache,
  SUBTRACT_GREEN — see ``logray/ops/vp8lcodec.py``).
- ``decode="real"`` — the Pillow/ffmpeg lane for the remaining formats
  (lossy-VP8 WebP/AVIF/MP3/MP4 samples): STUBBED with
  ``NotImplementedError`` (those libraries are not in this container,
  per the task mandate; their container METADATA walks are real — see
  the MP3/MP4/WebP meta lanes below).
- ``decode="fake"`` — deterministic pseudo-features from payload bytes,
  for plumbing tests that don't care about content.

Scale notes baked into the design:
- payloads ride as Arrow ``binary`` (zero-copy between stages; never
  pandas object dtype);
- decode stages are actor pools (model/codec loaded once per actor in
  ``__init__``) with SMALL batch sizes — payload bytes × batch_size ×
  concurrency must fit worker heap;
- outputs keep the payload out of wide shuffles: feature columns are
  projected before any groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),        # metadata as produced upstream; may be null
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def make_fake_media_table(n: int, kind: str = "image", seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests/benches (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array([f"{kind}/fake"] * n),
        "width": pa.nulls(n, pa.int32()),
        "height": pa.nulls(n, pa.int32()),
        "duration_ms": pa.nulls(n, pa.int32()),
    })


# -------------------------------------------------- real codecs (stdlib) --

def make_wav_media_table(n: int, seed: int = 11, rate: int = 16000) -> pa.Table:
    """n REAL RIFF/WAVE PCM16 payloads (sine + noise, deterministic) plus
    analytic-truth columns computed from the SAME samples at generation
    time — the decode oracle: a distributed decode stage must reproduce
    them from the bytes alone."""
    import io
    import wave as _wave

    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_duration_ms": [],
            "true_rms_db": [], "true_zcr": []}
    for i in range(n):
        nf = int(rng.integers(rate // 10, rate))  # 0.1–1.0 s
        t = np.arange(nf) / rate
        f = float(rng.uniform(100, 2000))
        x = np.clip(0.5 * np.sin(2 * np.pi * f * t)
                    + 0.1 * rng.standard_normal(nf), -1, 1)
        pcm = (x * 32767).astype("<i2")
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        rows["media_id"].append(i)
        rows["payload"].append(buf.getvalue())
        rows["true_duration_ms"].append(int(nf * 1000 / rate))
        rows["true_rms_db"].append(_pcm_rms_db(pcm))
        rows["true_zcr"].append(_pcm_zcr(pcm))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_duration_ms": pa.array(rows["true_duration_ms"], pa.int64()),
        "true_rms_db": pa.array(rows["true_rms_db"], pa.float64()),
        "true_zcr": pa.array(rows["true_zcr"], pa.float64()),
    })


def _pcm_rms_db(pcm: np.ndarray) -> float:
    x = pcm.astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return round(20.0 * np.log10(max(rms, 1e-9)), 6)


def _pcm_zcr(pcm: np.ndarray) -> float:
    if pcm.size < 2:
        return 0.0
    s = np.signbit(pcm.astype(np.float64))
    return round(float(np.mean(s[1:] != s[:-1])), 6)


def decode_wav_features(payload: bytes) -> tuple[int, float, float]:
    """REAL RIFF/WAVE decode (stdlib): (duration_ms, rms_db, zcr)."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(payload), "rb") as w:
        rate, nf, nch, sw = (w.getframerate(), w.getnframes(),
                             w.getnchannels(), w.getsampwidth())
        raw = w.readframes(nf)
    if sw != 2:
        raise ValueError(f"only PCM16 supported, got sampwidth={sw}")
    pcm = np.frombuffer(raw, dtype="<i2")
    if nch > 1:  # average channels
        pcm = pcm.reshape(-1, nch).mean(axis=1).astype("<i2")
    return int(nf * 1000 / rate), _pcm_rms_db(pcm), _pcm_zcr(pcm)


_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def encode_mulaw(pcm: np.ndarray) -> bytes:
    """G.711 µ-law compand (vectorized): int16 linear → one byte per
    sample. Standard algorithm — bias 0x84, clip 32635, 3-bit exponent
    from the leading-one position, 4-bit mantissa, complemented."""
    x = pcm.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = position of the leading one above bit 7 (0..7)
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def decode_mulaw(data: bytes) -> np.ndarray:
    """G.711 µ-law expand (vectorized): bytes → int16 linear samples."""
    u = (~np.frombuffer(data, np.uint8).astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def _riff_mulaw(samples: bytes, rate: int) -> bytes:
    """RIFF/WAVE container with fmt code 7 (WAVE_FORMAT_MULAW, 8-bit mono)
    — the stdlib ``wave`` module cannot write or read this format code,
    so both sides are hand-rolled."""
    import struct

    fmt = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<II", 4, len(samples))
              + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_mulaw_wav_features(payload: bytes) -> tuple[int, float, float]:
    """REAL µ-law WAV decode: hand-rolled RIFF chunk walk (fmt code 7 —
    outside stdlib ``wave``'s vocabulary) → µ-law expand → the same
    (duration_ms, rms_db, zcr) features as the PCM16 lane, computed on
    the EXPANDED linear samples."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid, ln = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            code, nch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if code != 7 or nch != 1 or bits != 8:
                raise ValueError(
                    f"only mono 8-bit mu-law supported (code={code})")
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("RIFF missing fmt/data chunk")
    pcm = decode_mulaw(data)
    return int(len(pcm) * 1000 / rate), _pcm_rms_db(pcm), _pcm_zcr(pcm)


def make_mulaw_media_table(n: int, seed: int = 16, rate: int = 8000) -> pa.Table:
    """n REAL µ-law WAV payloads (fmt code 7). Truths are computed from
    the µ-law-DECODED samples (companding is lossy, so the exact oracle
    is decode(encode(x)), not x), making the distributed decode
    value-check exact."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_duration_ms": [],
            "true_rms_db": [], "true_zcr": []}
    for i in range(n):
        nf = int(rng.integers(rate // 10, rate))
        t = np.arange(nf) / rate
        f = float(rng.uniform(100, 2000))
        x = np.clip(0.5 * np.sin(2 * np.pi * f * t)
                    + 0.1 * rng.standard_normal(nf), -1, 1)
        ulaw = encode_mulaw((x * 32767).astype(np.int16))
        back = decode_mulaw(ulaw)
        rows["media_id"].append(i)
        rows["payload"].append(_riff_mulaw(ulaw, rate))
        rows["true_duration_ms"].append(int(nf * 1000 / rate))
        rows["true_rms_db"].append(_pcm_rms_db(back))
        rows["true_zcr"].append(_pcm_zcr(back))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_duration_ms": pa.array(rows["true_duration_ms"], pa.int64()),
        "true_rms_db": pa.array(rows["true_rms_db"], pa.float64()),
        "true_zcr": pa.array(rows["true_zcr"], pa.float64()),
    })


def decode_flac_features(payload: bytes) -> tuple[int, float, float]:
    """REAL FLAC-subset decode (logray/ops/flaccodec.py): lossless, so
    (duration_ms, rms_db, zcr) — channel 0 for stereo — are EXACTLY the
    original samples' features. The decoder also verifies frame CRCs and
    the STREAMINFO MD5, so a successful decode is an integrity proof."""
    from .flaccodec import decode_flac

    pcm, rate = decode_flac(payload)
    ch0 = pcm[:, 0]
    return int(len(ch0) * 1000 / rate), _pcm_rms_db(ch0), _pcm_zcr(ch0)


def make_flac_media_table(n: int, seed: int = 19, rate: int = 8000) -> pa.Table:
    """n REAL FLAC-subset payloads: mono/stereo alternating, sine+noise
    with planted silence gaps (CONSTANT subframes) and occasional pure
    noise (verbatim/escape residuals), partial final frames throughout.
    LOSSLESS codec ⇒ the truth columns are computed from the ORIGINAL
    samples — the strongest oracle protocol of the media lanes (the
    µ-law/JPEG lanes can only use decoded-sample truth)."""
    from .flaccodec import encode_flac

    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_duration_ms": [],
            "true_rms_db": [], "true_zcr": [], "true_channels": []}
    for i in range(n):
        nf = int(rng.integers(rate // 10, rate))  # 0.1–1.0 s
        t = np.arange(nf) / rate
        f = float(rng.uniform(100, 2000))
        x = np.clip(0.5 * np.sin(2 * np.pi * f * t)
                    + 0.1 * rng.standard_normal(nf), -1, 1)
        if i % 4 == 0:  # plant a silence gap -> CONSTANT subframes
            g0 = int(rng.integers(0, max(1, nf - nf // 4)))
            x[g0:g0 + nf // 4] = 0.0
        if i % 11 == 5:  # pure noise -> verbatim/escape residuals
            x = rng.uniform(-1, 1, nf)
        pcm = (x * 32767).astype(np.int16)
        if i % 2 == 1:  # stereo: correlated right channel
            r = np.clip(pcm.astype(np.int64) * 0.97
                        + rng.integers(-64, 64, nf), -32768, 32767)
            pcm = np.stack([pcm, r.astype(np.int16)], axis=1)
        payload = encode_flac(pcm, rate, block_size=1024)
        ch0 = pcm if pcm.ndim == 1 else pcm[:, 0]
        rows["media_id"].append(i)
        rows["payload"].append(payload)
        rows["true_duration_ms"].append(int(nf * 1000 / rate))
        rows["true_rms_db"].append(_pcm_rms_db(ch0))
        rows["true_zcr"].append(_pcm_zcr(ch0))
        rows["true_channels"].append(1 if pcm.ndim == 1 else 2)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_duration_ms": pa.array(rows["true_duration_ms"], pa.int64()),
        "true_rms_db": pa.array(rows["true_rms_db"], pa.float64()),
        "true_zcr": pa.array(rows["true_zcr"], pa.float64()),
        "true_channels": pa.array(rows["true_channels"], pa.int64()),
    })


def make_ppm_media_table(n: int, seed: int = 12) -> pa.Table:
    """n REAL netpbm P6 images (random RGB, deterministic) + analytic
    truth (dimensions, Rec.601 mean luma, 8×8 average-hash)."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_mean_luma": [], "true_ahash": [],
            "true_thumb_w": [], "true_thumb_h": []}
    for i in range(n):
        w = int(rng.integers(16, 128))
        h = int(rng.integers(16, 128))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["payload"].append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        luma = _luma(px)
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_mean_luma"].append(round(float(luma.mean()) / 255.0, 6))
        rows["true_ahash"].append(_ahash64(luma))
        tw, th = thumb_dims(w, h, 64)
        rows["true_thumb_w"].append(tw)
        rows["true_thumb_h"].append(th)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_mean_luma": pa.array(rows["true_mean_luma"], pa.float64()),
        "true_ahash": pa.array(rows["true_ahash"], pa.uint64()),
        "true_thumb_w": pa.array(rows["true_thumb_w"], pa.int64()),
        "true_thumb_h": pa.array(rows["true_thumb_h"], pa.int64()),
    })


def thumb_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving clamp shared by the resize stage and the
    analytic-truth generator (ONE rounding implementation — Python round
    is banker's, SQL round is not, so the formula must never be
    re-implemented oracle-side)."""
    if max(w, h) <= max_side:
        return max(w, 1), max(h, 1)
    if w >= h:
        return max_side, max(1, round(h * max_side / w))
    return max(1, round(w * max_side / h)), max_side


def _luma(px: np.ndarray) -> np.ndarray:
    return (0.299 * px[..., 0].astype(np.float64)
            + 0.587 * px[..., 1] + 0.114 * px[..., 2])


def _ahash64(luma: np.ndarray) -> int:
    """Classic 64-bit average hash: nearest-sample the luma plane on an
    8×8 grid, threshold at the grid mean."""
    h, w = luma.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    g = luma[np.ix_(ys, xs)]
    bits = (g > g.mean()).astype(np.uint64).reshape(-1)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def parse_ppm(payload: bytes) -> np.ndarray:
    """REAL P6 parse: header (magic, width, height, maxval, one whitespace)
    then raw RGB. Returns (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # positional tokenizer — bytes.split would swallow raster bytes that
    # happen to be whitespace-valued (0x09/0x0a/0x20...): per the netpbm
    # spec exactly ONE whitespace separates maxval from the raster, so the
    # data offset must be tracked, not re-split. Comments (#) are legal in
    # netpbm but our generator never emits them.
    ws = b" \t\n\r\x0b\x0c"
    pos = 2
    vals = []
    for _ in range(3):
        while pos < len(payload) and payload[pos:pos + 1] in ws:
            pos += 1
        start = pos
        while pos < len(payload) and payload[pos:pos + 1] not in ws:
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = w * h * 3
    raw = payload[pos:pos + need]
    if len(raw) < need:
        raise ValueError("truncated ppm payload")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(px).tobytes()


def resize_nearest(px: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """REAL nearest-neighbor resample via integer index gather."""
    h, w = px.shape[:2]
    ys = (np.arange(oh) * h) // oh
    xs = (np.arange(ow) * w) // ow
    return px[np.ix_(ys, xs)]


class DecodeImageStage:
    """Actor-pool stage: payload -> (width, height, mean_luma, phash64).

    Use ``map_batches(DecodeImageStage, fn_constructor_kwargs={'decode':
    'fake'}, concurrency=N, batch_size=small, batch_format='pyarrow')``.
    """

    def __init__(self, decode: str = "real"):
        self.decode = decode
        if decode == "real":
            # real path would import PIL here (once per actor); the library
            # is not available in this environment by design
            self._pil = None

    def _decode_one(self, payload: bytes) -> tuple[int, int, float, int]:
        if self.decode in ("ppm", "bmp", "png", "gif", "jpeg",
                           "webp"):  # REAL lanes
            from .jpegcodec import parse_jpeg
            from .vp8lcodec import decode_vp8l
            px = {"ppm": parse_ppm, "bmp": parse_bmp, "png": parse_png,
                  "gif": parse_gif, "jpeg": parse_jpeg,
                  "webp": decode_vp8l}[self.decode](payload)
            luma = _luma(px)
            return (px.shape[1], px.shape[0],
                    round(float(luma.mean()) / 255.0, 6), _ahash64(luma))
        if self.decode == "real":
            raise NotImplementedError(
                "lossy-VP8 WebP/AVIF decode requires Pillow, not available "
                "in this container; use decode='jpeg'/'png'/'gif'/'webp' "
                "(REAL compressed lanes), decode='ppm'/'bmp' (real "
                "uncompressed lanes) or decode='fake' for deterministic "
                "pseudo-features")
        h = hashlib.blake2b(payload, digest_size=16).digest()
        w = 64 + h[0]  # deterministic pseudo dimensions
        ht = 64 + h[1]
        luma = int.from_bytes(h[2:4], "big") / 65535.0
        phash = int.from_bytes(h[8:16], "big")
        return w, ht, luma, phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [self._decode_one(p) for p in payloads]
        batch = batch.set_column(batch.schema.get_field_index("width"), "width",
                                 pa.array([f[0] for f in feats], pa.int32()))
        batch = batch.set_column(batch.schema.get_field_index("height"), "height",
                                 pa.array([f[1] for f in feats], pa.int32()))
        batch = batch.append_column("mean_luma", pa.array([f[2] for f in feats], pa.float64()))
        return batch.append_column("phash64", pa.array([f[3] for f in feats], pa.uint64()))


class ResizeImageStage:
    """Actor-pool stage: payload -> thumbnail payload + (width, height)
    clamped to ``max_side`` with aspect preserved — the transform whose
    OUTPUT is itself a binary column (unlike the feature extractors), so it
    exercises the write-side of binary plumbing too. Real resampling is
    stubbed (Pillow absent); the fake path computes the exact output
    dimensions a real resize would and emits a deterministic
    payload-derived thumbnail of proportional size."""

    def __init__(self, max_side: int = 256, decode: str = "real"):
        self.max_side = max_side
        self.decode = decode

    def _resize_one(self, payload: bytes, w: int, h: int) -> tuple[bytes, int, int]:
        if self.decode == "ppm":  # REAL resample (nearest-neighbor)
            px = parse_ppm(payload)
            ih, iw = px.shape[:2]
            ow, oh = thumb_dims(iw, ih, self.max_side)
            return encode_ppm(resize_nearest(px, ow, oh)), ow, oh
        if self.decode == "jpeg":  # REAL compressed-in/compressed-out lane
            from .jpegcodec import encode_jpeg, parse_jpeg
            px = parse_jpeg(payload)
            ih, iw = px.shape[:2]
            ow, oh = thumb_dims(iw, ih, self.max_side)
            return (encode_jpeg(resize_nearest(px, ow, oh),
                                quality=THUMB_JPEG_QUALITY), ow, oh)
        if self.decode == "webp":  # REAL compressed-in/compressed-out #2
            from .vp8lcodec import decode_vp8l, encode_vp8l
            px = decode_vp8l(payload)
            ih, iw = px.shape[:2]
            ow, oh = thumb_dims(iw, ih, self.max_side)
            return (encode_vp8l(resize_nearest(px, ow, oh),
                                subtract_green=True, cache_bits=4), ow, oh)
        if self.decode == "real":
            raise NotImplementedError(
                "compressed image resize beyond JPEG/WebP-lossless requires "
                "Pillow, not available in this container; use decode='jpeg' "
                "or decode='webp' (REAL decode->resample->re-encode), "
                "decode='ppm' or decode='fake'")
        if max(w, h) <= self.max_side:
            ow, oh = max(w, 1), max(h, 1)
        elif w >= h:
            # longer side pinned exactly (int(w*scale) float-truncates to
            # max_side-1 for some sizes); shorter side rounds
            ow, oh = self.max_side, max(1, round(h * self.max_side / w))
        else:
            oh, ow = self.max_side, max(1, round(w * self.max_side / h))
        # deterministic stand-in bytes, sized like a real thumbnail
        # (payload shrinks by the pixel ratio)
        n = max(16, int(len(payload) * (ow * oh) / max(w * h, 1)))
        rep = hashlib.blake2b(payload, digest_size=32).digest()
        return (rep * (n // 32 + 1))[:n], ow, oh

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out = [self._resize_one(p, w or 0, h or 0)
               for p, w, h in zip(payloads, ws, hs)]
        i = batch.schema.get_field_index
        batch = batch.set_column(i("payload"), "payload",
                                 pa.array([o[0] for o in out], pa.binary()))
        batch = batch.set_column(i("width"), "width",
                                 pa.array([o[1] for o in out], pa.int32()))
        return batch.set_column(i("height"), "height",
                                pa.array([o[2] for o in out], pa.int32()))


class AudioFeatureStage:
    """Actor-pool stage: payload -> (duration_ms, rms_db) — stubbed decode."""

    def __init__(self, decode: str = "real", sample_rate: int = 16000):
        self.decode = decode
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode in ("wav", "mulaw", "flac"):  # REAL decode lanes
            dec = {"wav": decode_wav_features,
                   "mulaw": decode_mulaw_wav_features,
                   "flac": decode_flac_features}[self.decode]
            feats = [dec(p) for p in batch["payload"].to_pylist()]
            i = batch.schema.get_field_index("duration_ms")
            if i >= 0:
                batch = batch.set_column(
                    i, "duration_ms",
                    pa.array([f[0] for f in feats], pa.int32()))
            else:
                batch = batch.append_column(
                    "duration_ms", pa.array([f[0] for f in feats], pa.int32()))
            batch = batch.append_column(
                "rms_db", pa.array([f[1] for f in feats], pa.float64()))
            return batch.append_column(
                "zcr", pa.array([f[2] for f in feats], pa.float64()))
        if self.decode == "real":
            raise NotImplementedError(
                "MP3/AAC decode requires soundfile/ffmpeg, not in this "
                "container; use decode='flac' (REAL lossless compressed "
                "lane), decode='wav' (real PCM16 lane), decode='mulaw' "
                "(real G.711 companded lane) or decode='fake'")
        payloads = batch["payload"].to_pylist()
        dur = [int(len(p) * 1000 / (2 * self.sample_rate)) for p in payloads]
        def _rms(p: bytes) -> float:
            x = np.frombuffer(p[: len(p) // 2 * 2], dtype=np.int16)
            # empty slice -> std() is NaN (and NaN is truthy, so `or` can't
            # guard it); use an explicit size check
            return float(x.astype(np.float64).std()) if x.size else 1.0

        rms = [_rms(p) for p in payloads]
        batch = batch.set_column(batch.schema.get_field_index("duration_ms"), "duration_ms",
                                 pa.array(dur, pa.int32()))
        return batch.append_column("rms_db", pa.array([20 * np.log10(max(r, 1e-9)) for r in rms],
                                                      pa.float64()))


def frame_sample_plan(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling *plan* (real decoding stubbed): one row per
    frame to extract, keyed (media_id, frame_ts_ms). Demonstrates the
    explode/fan-out layout a real extractor stage would feed."""
    ids = batch["media_id"].to_pylist()
    durs = batch["duration_ms"].to_pylist()
    out_ids, out_ts = [], []
    for mid, d in zip(ids, durs):
        d = d if d is not None else 0
        ts = list(range(0, max(d, 1), every_ms))
        out_ids.extend([mid] * len(ts))
        out_ts.extend(ts)
    return pa.table({
        "media_id": pa.array(out_ids, pa.int64()),
        "frame_ts_ms": pa.array(out_ts, pa.int32()),
    })


def make_tar_shards(out_dir, n: int = 240, shards: int = 6,
                    seed: int = 13) -> dict:
    """WebDataset-style shard fixture: REAL netpbm P6 payloads packed into
    ``shards`` tar archives (member name = ``{media_id:06d}.ppm``), plus a
    ``truth.parquet`` sidecar carrying the generation-time analytic truth
    (dims / Rec.601 luma / ahash / byte size) and each member's shard —
    the oracle for any pipeline that must re-derive those from the tar
    bytes alone. Members are assigned round-robin so every shard holds a
    spread of ids (the way a sharded corpus is actually laid out)."""
    import tarfile
    from pathlib import Path

    import pyarrow.parquet as _pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    t = make_ppm_media_table(n, seed=seed)
    ids = t["media_id"].to_pylist()
    payloads = t["payload"].to_pylist()
    shard_of = [i % shards for i in range(n)]
    writers = {}
    for k in range(shards):
        writers[k] = tarfile.open(out / f"shard-{k:02d}.tar", "w")
    mtime = 1_767_225_600  # fixed 2026-01-01 — deterministic archives
    for i, (mid, payload) in enumerate(zip(ids, payloads)):
        info = tarfile.TarInfo(name=f"{mid:06d}.ppm")
        info.size = len(payload)
        info.mtime = mtime
        import io as _io

        writers[shard_of[i]].addfile(info, _io.BytesIO(payload))
    for w in writers.values():
        w.close()
    truth = t.drop(["payload"]).append_column(
        "shard", pa.array([f"shard-{k:02d}.tar" for k in shard_of], pa.string())
    ).append_column(
        "n_bytes", pa.array([len(p) for p in payloads], pa.int64()))
    _pq.write_table(truth, out / "truth.parquet")
    return {"shards": shards, "members": n, "dir": str(out)}


def encode_bmp(px: np.ndarray) -> bytes:
    """REAL 24-bit uncompressed BMP (BITMAPINFOHEADER): rows stored
    BOTTOM-UP in BGR order, each padded to a 4-byte boundary — the three
    classic BMP parsing hazards, all exercised on purpose."""
    import struct

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):          # bottom-up
        rows += px[y, :, ::-1].tobytes()    # BGR
        rows += pad
    return header + info + bytes(rows)


def parse_bmp(payload: bytes) -> np.ndarray:
    """REAL BMP decode (stdlib struct): 24-bit uncompressed
    BITMAPINFOHEADER → (h, w, 3) RGB array. Handles bottom-up AND
    top-down (negative height) row order and per-row 4-byte padding."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported "
                         f"(hdr={hdr_size}, bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a); pb = abs(p - b); pc_ = abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def encode_png(px: np.ndarray, *, filters: list[int] | None = None,
               idat_split: int = 1) -> bytes:
    """REAL 8-bit RGB PNG (stdlib ``zlib`` + ``struct``): IHDR/IDAT/IEND
    chunks with CRCs, scanlines filtered per row. ``filters`` picks the
    per-row filter type (default cycles 0..4 so every unfilter path is
    exercised); ``idat_split > 1`` splits the zlib stream across several
    IDAT chunks (decoders must concatenate IDAT payloads before
    inflating — a classic parsing hazard)."""
    import struct
    import zlib as _z

    h, w, c = px.shape
    assert c == 3, "RGB only"
    bpp = 3
    raw = px.astype(np.int64)
    out = bytearray()
    for y in range(h):
        f = (filters[y % len(filters)] if filters else y % 5)
        line = raw[y].reshape(-1)                      # w*3 ints
        left = np.concatenate([np.zeros(bpp, np.int64),
                               raw[y].reshape(-1)[:-bpp]])
        up = raw[y - 1].reshape(-1) if y else np.zeros(w * bpp, np.int64)
        upleft = (np.concatenate([np.zeros(bpp, np.int64), up[:-bpp]])
                  if y else np.zeros(w * bpp, np.int64))
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - up
        elif f == 3:
            filt = line - (left + up) // 2
        else:
            pred = np.array([_paeth(int(a), int(b), int(cc))
                             for a, b, cc in zip(left, up, upleft)], np.int64)
            filt = line - pred
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
    z = _z.compress(bytes(out), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunks = [_png_chunk(b"IHDR", ihdr)]
    step = max(1, (len(z) + idat_split - 1) // idat_split)
    for i in range(0, len(z), step):
        chunks.append(_png_chunk(b"IDAT", z[i:i + step]))
    chunks.append(_png_chunk(b"IEND", b""))
    return _PNG_SIG + b"".join(chunks)


def parse_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode (stdlib ``zlib``): chunk walk with CRC checks →
    concatenated-IDAT inflate → per-row unfiltering of all five PNG
    filter types (None/Sub/Up/Average/Paeth) → (h, w, 3) RGB array.
    8-bit colortype-2 non-interlaced only (the shape this repo's
    generator emits); anything else raises."""
    import struct
    import zlib as _z

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + ln]
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if _z.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"only 8-bit RGB non-interlaced PNG supported "
                    f"(depth={depth}, color={ctype}, interlace={ilace})")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = _z.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline payload size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    fs = arr[:, 0]
    lines = arr[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(fs[y])
        line = lines[y]
        if f == 0:
            r = line
        elif f == 1:
            # Sub: recon[x] = line[x] + recon[x-bpp] — per-channel prefix
            # sum mod 256 (addition mod 256 is associative, so cumsum in
            # int64 then %256 is exact)
            r = np.cumsum(line.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif f == 2:
            r = (line + prev) % 256
        elif f in (3, 4):
            r = np.empty(stride, np.int64)
            for x in range(stride):
                a = r[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    r[x] = (line[x] + (a + b) // 2) % 256
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    r[x] = (line[x] + _paeth(int(a), int(b), int(cc))) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        recon[y] = r
        prev = recon[y]
    return recon.astype(np.uint8).reshape(h, w, 3)


def make_png_media_table(n: int, seed: int = 15) -> pa.Table:
    """n REAL PNG images: per-row filters cycle through all five types,
    every third payload splits its zlib stream across multiple IDAT
    chunks, and 1-pixel-wide images (no left neighbor anywhere) are
    guaranteed present. Same analytic truths as the P6/BMP lanes."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_mean_luma": [], "true_ahash": []}
    for i in range(n):
        w = 1 if i % 7 == 3 else int(rng.integers(8, 96))
        h = int(rng.integers(8, 96))
        # smooth gradients + noise: exercises filters on realistic data
        base = rng.integers(0, 256, size=(1, 1, 3))
        gy = np.linspace(0, rng.integers(1, 128), h)[:, None, None]
        gx = np.linspace(0, rng.integers(1, 128), w)[None, :, None]
        px = ((base + gy + gx + rng.integers(0, 32, size=(h, w, 3)))
              % 256).astype(np.uint8)
        luma = _luma(px)
        rows["media_id"].append(i)
        rows["payload"].append(
            encode_png(px, idat_split=3 if i % 3 == 0 else 1))
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_mean_luma"].append(round(float(luma.mean()) / 255.0, 6))
        rows["true_ahash"].append(_ahash64(luma))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_mean_luma": pa.array(rows["true_mean_luma"], pa.float64()),
        "true_ahash": pa.array(rows["true_ahash"], pa.uint64()),
    })


def make_webpl_media_table(n: int, seed: int = 24) -> pa.Table:
    """n REAL WebP-lossless (VP8L) images cycling content kinds (noise /
    tiled-repetitive so LZ77 backrefs dominate / smooth gradient) and
    encoder configurations spanning the FULL format: color cache,
    SUBTRACT_GREEN, the 14-mode PREDICTOR, the cross-color COLOR
    transform, meta prefix codes (two real groups), and — on the
    low-color tiled images — COLOR_INDEXING with pixel bundling.
    1-pixel-wide images guaranteed present. Same analytic truth sidecar
    as the P6/BMP/PNG lanes: the distributed decoder must reproduce
    dims / Rec.601 luma / ahash from the compressed bytes alone
    (lossless, so equality is exact)."""
    from .vp8lcodec import encode_vp8l

    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_mean_luma": [], "true_ahash": [],
            "true_thumb_w": [], "true_thumb_h": [],
            "true_thumb_luma": [], "true_thumb_ahash": []}
    configs = [dict(), dict(cache_bits=4, subtract_green=True),
               dict(cache_bits=6, predictor_bits=4),
               dict(color_bits=4, cache_bits=4),
               dict(meta_bits=3, cache_bits=4, subtract_green=True),
               dict(predictor_bits=3, subtract_green=True, cache_bits=6)]
    for i in range(n):
        w = 1 if i % 7 == 3 else int(rng.integers(8, 72))
        h = int(rng.integers(8, 72))
        kind = i % 3
        if kind == 0:
            px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        elif kind == 1:
            tile = rng.integers(0, 256, size=(4, 4, 3))
            px = np.tile(tile, (h // 4 + 1, w // 4 + 1, 1))[:h, :w]
            px = px.astype(np.uint8)
        else:
            base = rng.integers(0, 256, size=(1, 1, 3))
            gy = np.linspace(0, rng.integers(1, 128), h)[:, None, None]
            gx = np.linspace(0, rng.integers(1, 128), w)[None, :, None]
            px = ((base + gy + gx) % 256).astype(np.uint8)
        cfg = configs[i % len(configs)]
        if kind == 1 and i % 4 == 1:
            cfg = dict(palette=True)    # tiles have ≤16 colors → bundling
        luma = _luma(px)
        rows["media_id"].append(i)
        rows["payload"].append(encode_vp8l(px, **cfg))
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_mean_luma"].append(round(float(luma.mean()) / 255.0, 6))
        rows["true_ahash"].append(_ahash64(luma))
        # thumbnail truth: the codec is LOSSLESS, so the re-encoded
        # thumbnail's features equal the resampled pixels' features
        tw, th = thumb_dims(w, h, THUMB_MAX_SIDE)
        tpx = resize_nearest(px, tw, th)
        tluma = _luma(tpx)
        rows["true_thumb_w"].append(tw)
        rows["true_thumb_h"].append(th)
        rows["true_thumb_luma"].append(
            round(float(tluma.mean()) / 255.0, 6))
        rows["true_thumb_ahash"].append(_ahash64(tluma))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_mean_luma": pa.array(rows["true_mean_luma"], pa.float64()),
        "true_ahash": pa.array(rows["true_ahash"], pa.uint64()),
        "true_thumb_w": pa.array(rows["true_thumb_w"], pa.int64()),
        "true_thumb_h": pa.array(rows["true_thumb_h"], pa.int64()),
        "true_thumb_luma": pa.array(rows["true_thumb_luma"], pa.float64()),
        "true_thumb_ahash": pa.array(rows["true_thumb_ahash"], pa.uint64()),
    })


# thumbnail re-encode quality: one constant shared by the resize stage
# and the fixture's truth computation (the sidecar oracle is only valid
# if both sides re-encode identically)
THUMB_JPEG_QUALITY = 90
THUMB_MAX_SIDE = 32


def make_jpeg_media_table(n: int, seed: int = 18) -> pa.Table:
    """n REAL baseline JPEGs (from-scratch codec, logray/ops/jpegcodec.py)
    covering the hazards a web-crawl decoder meets: 4:2:0 chroma
    subsampling on every other payload, DRI/RSTn restart markers on every
    third, non-multiple-of-8 dims throughout, 1-pixel-wide images, and
    naturally-occurring byte stuffing (asserted present across the
    fixture). JPEG is lossy, so — exactly like the µ-law audio lane —
    the truth columns are computed from the DECODED pixels at generation
    time; decoder correctness itself is pinned by the exact
    quantized-coefficient inversion + round-trip tolerance tests in
    tests/test_ops.py."""
    from .jpegcodec import encode_jpeg, parse_jpeg

    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_mean_luma": [], "true_ahash": [],
            "true_thumb_w": [], "true_thumb_h": [], "true_thumb_luma": [],
            "true_thumb_ahash": []}
    stuffed_seen = False
    for i in range(n):
        w = 1 if i % 7 == 3 else int(rng.integers(8, 96))
        h = int(rng.integers(8, 96))
        # smooth clipped gradients + mild noise: realistic photographic
        # statistics (the %256 wrap the lossless lanes use would put
        # hard 255->0 edges everywhere, which JPEG ringing amplifies)
        base = rng.integers(20, 200, size=(1, 1, 3)).astype(np.float64)
        gy = np.linspace(0, float(rng.integers(1, 64)), h)[:, None, None]
        gx = np.linspace(0, float(rng.integers(1, 64)), w)[None, :, None]
        noise = rng.integers(0, 16, size=(h, w, 3))
        px = np.clip(base + gy + gx + noise, 0, 255).astype(np.uint8)
        payload = encode_jpeg(
            px, quality=int(rng.integers(60, 96)),
            subsample=(i % 2 == 1),
            restart_interval=(2 if i % 3 == 0 else 0))
        stuffed_seen = stuffed_seen or b"\xff\x00" in payload
        dec = parse_jpeg(payload)
        assert dec.shape == (h, w, 3)
        luma = _luma(dec)
        rows["media_id"].append(i)
        rows["payload"].append(payload)
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_mean_luma"].append(round(float(luma.mean()) / 255.0, 6))
        rows["true_ahash"].append(_ahash64(luma))
        # resize-lane truth: the full decode->resample->re-encode->decode
        # chain the distributed pipeline must reproduce from bytes alone
        ow, oh = thumb_dims(w, h, THUMB_MAX_SIDE)
        thumb = encode_jpeg(resize_nearest(dec, ow, oh),
                            quality=THUMB_JPEG_QUALITY)
        tluma = _luma(parse_jpeg(thumb))
        rows["true_thumb_w"].append(ow)
        rows["true_thumb_h"].append(oh)
        rows["true_thumb_luma"].append(round(float(tluma.mean()) / 255.0, 6))
        rows["true_thumb_ahash"].append(_ahash64(tluma))
    assert stuffed_seen, "fixture must exercise FF 00 byte stuffing"
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_mean_luma": pa.array(rows["true_mean_luma"], pa.float64()),
        "true_ahash": pa.array(rows["true_ahash"], pa.uint64()),
        "true_thumb_w": pa.array(rows["true_thumb_w"], pa.int64()),
        "true_thumb_h": pa.array(rows["true_thumb_h"], pa.int64()),
        "true_thumb_luma": pa.array(rows["true_thumb_luma"], pa.float64()),
        "true_thumb_ahash": pa.array(rows["true_thumb_ahash"], pa.uint64()),
    })


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """REAL GIF-flavor LZW compression: variable code width (grows at
    2^width, capped at 12 bits, CLEAR resets the table), codes packed
    LSB-first. Dictionary keyed on (prefix_code, next_symbol)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    prefix = -1
    for sym in indices.tolist():
        if prefix < 0:
            prefix = sym
            continue
        key = (prefix, sym)
        if key in table:
            prefix = table[key]
            continue
        emit(prefix, width)
        table[key] = next_code
        next_code += 1
        # early-change rule: width grows as soon as the NEXT code to
        # assign would not fit — mirrors the decoder growing when its
        # table reaches 2^width entries after an append
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = sym
    if prefix >= 0:
        emit(prefix, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> np.ndarray:
    """REAL GIF LZW decode: LSB-first variable-width codes, CLEAR/EOI,
    table growth with the KwKwK (code == next_index) case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # early-change: the decoder's table lags the encoder's by ONE
            # entry at read time (the encoder assigns an entry with each
            # emit; the decoder reconstructs it one code later), so width
            # must grow at 2^width - 1 entries to read the next code with
            # the same width the encoder used to write it
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out), np.uint8)


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """REAL single-frame GIF89a (from-scratch LZW): logical screen
    descriptor, global color table, image descriptor, LZW-compressed
    index stream split into ≤255-byte sub-blocks, trailer."""
    import struct

    h, w = idx.shape
    ncol = len(palette)
    gct_bits = max(1, (int(ncol) - 1).bit_length())
    gct_size = 1 << gct_bits
    gct = np.zeros((gct_size, 3), np.uint8)
    gct[:ncol] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) << 4)
                       | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT/interlace
    mcs = max(2, gct_bits)
    out.append(mcs)
    z = _lzw_compress(idx.reshape(-1), mcs)
    for i in range(0, len(z), 255):
        blk = z[i:i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3B"
    return bytes(out)


def parse_gif(payload: bytes) -> np.ndarray:
    """REAL GIF decode (from-scratch LZW, no imaging library): header +
    screen descriptor + global color table, extension-block skipping,
    image descriptor, sub-block reassembly, LZW decompression →
    palette lookup → (h, w, 3) RGB. Single-frame non-interlaced GIFs
    with a global color table (the shape this repo's generator emits)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("GIF without a global color table unsupported")
    gct_size = 2 << (flags & 0x07)
    gct = np.frombuffer(payload, np.uint8, count=gct_size * 3,
                        offset=pos).reshape(gct_size, 3)
    pos += gct_size * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                        # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF trailer before any image descriptor")
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
    pos += 10
    if iflags & 0xC0:
        raise ValueError("local color tables / interlace unsupported")
    mcs = payload[pos]
    pos += 1
    z = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated inside the image data stream")
        ln = payload[pos]
        if ln == 0:
            break
        blk = payload[pos + 1:pos + 1 + ln]
        if len(blk) < ln:
            raise ValueError("GIF truncated inside a data sub-block")
        z += blk
        pos += 1 + ln
    idx = _lzw_decompress(bytes(z), mcs)
    if idx.size != w * h:
        raise ValueError(f"GIF pixel count mismatch: {idx.size} != {w * h}")
    if int(idx.max(initial=0)) >= gct_size:
        raise ValueError("GIF index outside the color table")
    return gct[idx.reshape(h, w)]


def make_gif_media_table(n: int, seed: int = 17) -> pa.Table:
    """n REAL single-frame GIFs (from-scratch LZW encode): palette sizes
    4→256, gradient+noise index rasters (LZW-compressible AND
    table-growth-forcing), a comment extension block on every fourth
    payload, 1-pixel-wide images present. Truths as the other lanes."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_mean_luma": [], "true_ahash": []}
    for i in range(n):
        w = 1 if i % 9 == 4 else int(rng.integers(8, 96))
        h = int(rng.integers(8, 96))
        ncol = int(rng.choice((4, 16, 64, 256)))
        palette = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
        gy = np.linspace(0, ncol - 1, h)[:, None]
        gx = np.linspace(0, ncol - 1, w)[None, :]
        idx = ((gy + gx) / 2 + rng.integers(0, max(2, ncol // 4),
                                            size=(h, w))).astype(np.int64)
        idx = (idx % ncol).astype(np.uint8)
        payload = encode_gif(idx, palette)
        if i % 4 == 0:  # comment extension between GCT and image
            comment = b"\x21\xFE\x05logx!\x00"
            sd_end = 13 + (2 << (payload[10] & 0x07)) * 3
            payload = payload[:sd_end] + comment + payload[sd_end:]
        px = palette[idx]
        luma = _luma(px)
        rows["media_id"].append(i)
        rows["payload"].append(payload)
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_mean_luma"].append(round(float(luma.mean()) / 255.0, 6))
        rows["true_ahash"].append(_ahash64(luma))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_mean_luma": pa.array(rows["true_mean_luma"], pa.float64()),
        "true_ahash": pa.array(rows["true_ahash"], pa.uint64()),
    })


def make_bmp_media_table(n: int, seed: int = 14) -> pa.Table:
    """n REAL 24-bit BMP images (odd widths guaranteed present so the
    4-byte row padding path is always exercised) + the same analytic
    truths as the P6 lane."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_mean_luma": [], "true_ahash": []}
    for i in range(n):
        w = int(rng.integers(16, 128))
        if i % 2:
            w |= 1  # force odd width -> nonzero row padding
        h = int(rng.integers(16, 128))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        luma = _luma(px)
        rows["media_id"].append(i)
        rows["payload"].append(encode_bmp(px))
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_mean_luma"].append(round(float(luma.mean()) / 255.0, 6))
        rows["true_ahash"].append(_ahash64(luma))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_mean_luma": pa.array(rows["true_mean_luma"], pa.float64()),
        "true_ahash": pa.array(rows["true_ahash"], pa.uint64()),
    })


# ---------------------------------------------------------------------------
# Container-METADATA lanes: MP3 / MP4 (ISO-BMFF) / WebP.
#
# Full audio/video DECODE of these formats needs codec libraries the
# sandbox doesn't ship (the decode stubs above say so) — but the metadata
# walk (duration, dimensions, track layout) is pure header/box arithmetic,
# and it is the operation a 100 TB media pipeline actually runs first:
# routing, budgeting and filtering by duration/dims WITHOUT touching a
# single coded sample. These parsers are spec-exact over real container
# structures (MPEG-1 Layer III frame-length arithmetic incl. ID3v2
# syncsafe skip and padding bits; ISO-BMFF box tree incl. 64-bit
# largesize, version-0/1 mvhd/tkhd and 16.16 fixed-point dims; RIFF/WEBP
# incl. the VP8 start-code, the VP8L bit-packed dims and the VP8X 24-bit
# canvas), and the fixtures are built by independent writers in this
# module, with truth computed analytically at generation time.
# ---------------------------------------------------------------------------

_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                 128, 160, 192, 224, 256, 320)  # MPEG-1 Layer III, kbps
_MP3_RATES = (44100, 48000, 32000)  # samplerate index 0..2 (3 = reserved)
_MP3_SPF = 1152  # samples per MPEG-1 Layer III frame


def _mp3_header(kbps_idx: int, sr_idx: int, pad: int) -> bytes:
    """One spec-exact MPEG-1 Layer III frame header (no CRC, joint
    stereo)."""
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
    h |= (kbps_idx << 12) | (sr_idx << 10) | (pad << 9) | (1 << 6)
    return h.to_bytes(4, "big")


def _mp3_frame_len(kbps: int, sr: int, pad: int) -> int:
    # the Layer III formula: floor(144 * bitrate / samplerate) + padding
    return 144_000 * kbps // sr + pad


def build_mp3(kbps_indices: list[int], sr_idx: int, pads: list[int],
              rng: np.random.Generator, id3v2_size: int | None = None,
              id3v1: bool = False) -> bytes:
    """A REAL MPEG-1 Layer III stream skeleton: every frame header and
    frame length is spec-exact (the metadata walk never reads coded
    audio, so frame bodies are random bytes); optional ID3v2 prefix
    (syncsafe size) and ID3v1 trailer (128-byte 'TAG' block)."""
    out = []
    if id3v2_size is not None:
        ss = bytes(((id3v2_size >> s) & 0x7F) for s in (21, 14, 7, 0))
        out.append(b"ID3" + b"\x03\x00\x00" + ss
                   + rng.integers(0, 256, id3v2_size).astype(np.uint8)
                   .tobytes())
    for bi, pad in zip(kbps_indices, pads):
        flen = _mp3_frame_len(_MP3_BITRATES[bi], _MP3_RATES[sr_idx], pad)
        body = rng.integers(0, 256, flen - 4).astype(np.uint8).tobytes()
        out.append(_mp3_header(bi, sr_idx, pad) + body)
    if id3v1:
        out.append(b"TAG" + bytes(125))
    return b"".join(out)


def parse_mp3_meta(payload: bytes) -> dict:
    """Frame-header walk: skip ID3v2 by its syncsafe size, then hop
    frame-to-frame by the Layer III length formula, validating the sync
    word and field ranges at every hop; stop at a trailing ID3v1 block.
    Returns n_frames / duration_ms / kbps_sum / sample_rate; raises
    ValueError on lost sync, reserved field values, truncated final
    frame, or inconsistent samplerate."""
    pos, n = 0, len(payload)
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("truncated ID3v2 header")
        ss = payload[6:10]
        if any(b & 0x80 for b in ss):
            raise ValueError("non-syncsafe ID3v2 size")
        size = (ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3]
        pos = 10 + size + (10 if payload[5] & 0x10 else 0)
        if pos > n:
            raise ValueError("ID3v2 size exceeds payload")
    frames = kbps_sum = 0
    sr = None
    while True:
        rem = n - pos
        if rem == 0:
            break
        if rem == 128 and payload[pos:pos + 3] == b"TAG":
            break
        if rem < 4:
            raise ValueError("trailing garbage after last frame")
        h = int.from_bytes(payload[pos:pos + 4], "big")
        if h >> 21 != 0x7FF:
            raise ValueError(f"lost sync at offset {pos}")
        if (h >> 19) & 3 != 3 or (h >> 17) & 3 != 1:
            raise ValueError("not an MPEG-1 Layer III frame")
        bi, si, pad = (h >> 12) & 0xF, (h >> 10) & 3, (h >> 9) & 1
        if bi in (0, 15):
            raise ValueError("free-format/reserved bitrate index")
        if si == 3:
            raise ValueError("reserved samplerate index")
        if sr is None:
            sr = _MP3_RATES[si]
        elif sr != _MP3_RATES[si]:
            raise ValueError("samplerate changes mid-stream")
        flen = _mp3_frame_len(_MP3_BITRATES[bi], sr, pad)
        if rem < flen:
            raise ValueError("truncated final frame")
        frames += 1
        kbps_sum += _MP3_BITRATES[bi]
        pos += flen
    if frames == 0:
        raise ValueError("no MPEG frames")
    return {"n_frames": frames,
            "duration_ms": frames * _MP3_SPF * 1000 // sr,
            "kbps_sum": kbps_sum, "sample_rate": sr}


def make_mp3_media_table(n: int, seed: int = 21) -> pa.Table:
    """n REAL MP3 frame-sequence payloads: CBR and VBR streams, random
    padding bits, ~40% ID3v2-prefixed (junk tag body the walk must skip
    by syncsafe size), ~30% ID3v1-trailed. Truth is analytic at build
    time: the walk must recover frame count / duration / bitrate sum /
    samplerate from bytes alone."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_n_frames": [],
            "true_duration_ms": [], "true_kbps_sum": [],
            "true_sample_rate": []}
    for i in range(n):
        nf = int(rng.integers(5, 120))
        sr_idx = int(rng.integers(0, 3))
        if rng.random() < 0.5:  # CBR
            bis = [int(rng.integers(1, 15))] * nf
        else:  # VBR
            bis = [int(b) for b in rng.integers(1, 15, nf)]
        pads = [int(p) for p in rng.integers(0, 2, nf)]
        id3v2 = int(rng.integers(20, 300)) if rng.random() < 0.4 else None
        payload = build_mp3(bis, sr_idx, pads, rng, id3v2_size=id3v2,
                            id3v1=rng.random() < 0.3)
        sr = _MP3_RATES[sr_idx]
        rows["media_id"].append(i)
        rows["payload"].append(payload)
        rows["true_n_frames"].append(nf)
        rows["true_duration_ms"].append(nf * _MP3_SPF * 1000 // sr)
        rows["true_kbps_sum"].append(sum(_MP3_BITRATES[b] for b in bis))
        rows["true_sample_rate"].append(sr)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_n_frames": pa.array(rows["true_n_frames"], pa.int64()),
        "true_duration_ms": pa.array(rows["true_duration_ms"], pa.int64()),
        "true_kbps_sum": pa.array(rows["true_kbps_sum"], pa.int64()),
        "true_sample_rate": pa.array(rows["true_sample_rate"], pa.int64()),
    })


def _mp4_box(typ: bytes, payload: bytes, large: bool = False) -> bytes:
    """One ISO-BMFF box; ``large=True`` uses the size==1 + 64-bit
    largesize encoding (spec §4.2)."""
    import struct

    if large:
        return struct.pack(">I4sQ", 1, typ, len(payload) + 16) + payload
    return struct.pack(">I4s", len(payload) + 8, typ) + payload


def _mp4_mvhd(timescale: int, duration: int, version: int) -> bytes:
    import struct

    if version:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    tail = (struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
            + bytes(10) + _MP4_UNITY + bytes(24)
            + struct.pack(">I", 0xFFFFFFFF))
    return _mp4_box(b"mvhd", bytes([version]) + b"\x00\x00\x00" + body + tail)


# the unity transformation matrix every mvhd/tkhd carries (9 × 32-bit)
_MP4_UNITY = (b"\x00\x01\x00\x00" + bytes(4) * 2
              + bytes(4) + b"\x00\x01\x00\x00" + bytes(4)
              + bytes(4) * 2 + b"\x40\x00\x00\x00")


def _mp4_tkhd(track_id: int, duration: int, w: int, h: int,
              version: int) -> bytes:
    import struct

    if version:
        body = struct.pack(">QQII", 0, 0, track_id, 0) + struct.pack(">Q", duration)
    else:
        body = struct.pack(">IIII", 0, 0, track_id, 0) + struct.pack(">I", duration)
    tail = (bytes(8) + bytes(4) + struct.pack(">h", 0x0100) + bytes(2)
            + _MP4_UNITY
            + struct.pack(">II", w << 16, h << 16))  # 16.16 fixed point
    return _mp4_box(b"tkhd", bytes([version]) + b"\x00\x00\x07" + body + tail)


def _mp4_hdlr(handler: bytes) -> bytes:
    return _mp4_box(b"hdlr", bytes(8) + handler + bytes(12) + b"logray\x00")


def build_mp4(timescale: int, duration: int, tracks: list[tuple[bytes, int, int]],
              rng: np.random.Generator, version: int = 0,
              large_mdat: bool = False) -> bytes:
    """A REAL ISO-BMFF skeleton: ftyp + moov(mvhd + trak(tkhd +
    mdia(hdlr))×k + udta junk) + free junk + mdat junk. Box sizes,
    version-0/1 time fields and 16.16 fixed-point track dims are
    spec-exact; sample tables are omitted (the metadata walk stops at
    the track headers, exactly like a real fast-probe)."""
    traks = b"".join(
        _mp4_box(b"trak", _mp4_tkhd(i + 1, duration, w, h, version)
                 + _mp4_box(b"mdia", _mp4_hdlr(handler)))
        for i, (handler, w, h) in enumerate(tracks))
    udta = _mp4_box(b"udta",
                    rng.integers(0, 256, 24).astype(np.uint8).tobytes())
    moov = _mp4_box(b"moov",
                    _mp4_mvhd(timescale, duration, version) + traks + udta)
    ftyp = _mp4_box(b"ftyp", b"isom" + bytes(4) + b"isommp42")
    free = _mp4_box(b"free",
                    rng.integers(0, 256, int(rng.integers(0, 40)))
                    .astype(np.uint8).tobytes())
    mdat = _mp4_box(b"mdat",
                    rng.integers(0, 256, int(rng.integers(16, 256)))
                    .astype(np.uint8).tobytes(), large=large_mdat)
    return ftyp + free + moov + mdat


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def parse_mp4_meta(payload: bytes) -> dict:
    """ISO-BMFF box walk: recurse through container boxes, handle 64-bit
    largesize and size==0 (to end of file), parse version-0/1 mvhd
    (movie duration) and tkhd (16.16 fixed-point dims), count tracks by
    hdlr handler type. Never touches mdat. Raises ValueError on
    malformed sizes or a missing moov/mvhd."""
    meta = {"duration_ms": None, "n_tracks": 0, "n_video": 0,
            "n_audio": 0, "max_width": 0, "max_height": 0}
    in_trak_w = in_trak_h = 0

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal in_trak_w, in_trak_h
        pos = lo
        while pos < hi:
            if hi - pos < 8:
                raise ValueError("short box header")
            size = int.from_bytes(payload[pos:pos + 4], "big")
            typ = payload[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:
                if hi - pos < 16:
                    raise ValueError("short largesize header")
                size = int.from_bytes(payload[pos + 8:pos + 16], "big")
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < body - pos or pos + size > hi:
                raise ValueError(f"box {typ!r} size out of bounds")
            if typ == b"trak":
                in_trak_w = in_trak_h = 0
                meta["n_tracks"] += 1
                walk(body, pos + size, depth + 1)
            elif typ in _MP4_CONTAINERS:
                walk(body, pos + size, depth + 1)
            elif typ == b"mvhd":
                if pos + size - body < 20:
                    raise ValueError("mvhd box too short")
                v = payload[body]
                if v:
                    ts = int.from_bytes(payload[body + 20:body + 24], "big")
                    dur = int.from_bytes(payload[body + 24:body + 32], "big")
                else:
                    ts = int.from_bytes(payload[body + 12:body + 16], "big")
                    dur = int.from_bytes(payload[body + 16:body + 20], "big")
                if ts == 0:
                    raise ValueError("mvhd timescale 0")
                meta["duration_ms"] = dur * 1000 // ts
            elif typ == b"tkhd":
                if size < 8 + 84:  # v0 payload is 84 bytes minimum
                    raise ValueError("tkhd box too short")
                end = pos + size
                in_trak_w = int.from_bytes(payload[end - 8:end - 4],
                                           "big") >> 16
                in_trak_h = int.from_bytes(payload[end - 4:end], "big") >> 16
            elif typ == b"hdlr":
                handler = payload[body + 8:body + 12]
                if handler == b"vide":
                    meta["n_video"] += 1
                    meta["max_width"] = max(meta["max_width"], in_trak_w)
                    meta["max_height"] = max(meta["max_height"], in_trak_h)
                elif handler == b"soun":
                    meta["n_audio"] += 1
            pos += size

    walk(0, len(payload), 0)
    if meta["duration_ms"] is None:
        raise ValueError("no moov/mvhd box")
    return meta


def make_mp4_media_table(n: int, seed: int = 22) -> pa.Table:
    """n REAL ISO-BMFF payloads: mixed timescales (600/1000/90000/44100),
    1-3 tracks of mixed vide/soun handlers, version-1 (64-bit) time
    fields every 5th file, a 64-bit largesize mdat every 7th, junk free/
    udta boxes the walk must skip. Truth is analytic at build time."""
    rng = np.random.default_rng(seed)
    scales = (600, 1000, 90000, 44100)
    dims = ((640, 360), (1280, 720), (1920, 1080), (320, 240))
    rows = {"media_id": [], "payload": [], "true_duration_ms": [],
            "true_n_tracks": [], "true_n_video": [], "true_n_audio": [],
            "true_max_width": [], "true_max_height": []}
    for i in range(n):
        ts = scales[int(rng.integers(0, 4))]
        dur = int(rng.integers(ts // 2, ts * 600))
        k = int(rng.integers(1, 4))
        tracks, nv, na, mw, mh = [], 0, 0, 0, 0
        for _ in range(k):
            if rng.random() < 0.6:
                w, h = dims[int(rng.integers(0, 4))]
                tracks.append((b"vide", w, h))
                nv += 1
                mw, mh = max(mw, w), max(mh, h)
            else:
                tracks.append((b"soun", 0, 0))
                na += 1
        payload = build_mp4(ts, dur, tracks, rng, version=int(i % 5 == 4),
                            large_mdat=i % 7 == 3)
        rows["media_id"].append(i)
        rows["payload"].append(payload)
        rows["true_duration_ms"].append(dur * 1000 // ts)
        rows["true_n_tracks"].append(k)
        rows["true_n_video"].append(nv)
        rows["true_n_audio"].append(na)
        rows["true_max_width"].append(mw)
        rows["true_max_height"].append(mh)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_duration_ms": pa.array(rows["true_duration_ms"], pa.int64()),
        "true_n_tracks": pa.array(rows["true_n_tracks"], pa.int64()),
        "true_n_video": pa.array(rows["true_n_video"], pa.int64()),
        "true_n_audio": pa.array(rows["true_n_audio"], pa.int64()),
        "true_max_width": pa.array(rows["true_max_width"], pa.int64()),
        "true_max_height": pa.array(rows["true_max_height"], pa.int64()),
    })


def build_webp(variant: str, w: int, h: int, rng: np.random.Generator,
               has_alpha: bool = False) -> bytes:
    """A REAL RIFF/WEBP container: 'VP8 ' (lossy keyframe tag + the
    9D 01 2A start code + 14-bit dims), 'VP8L' (0x2F signature +
    bit-packed 14-bit width-1/height-1 + alpha bit) or 'VP8X' (flags +
    24-bit LE canvas dims wrapping an inner VP8L chunk). Coded pixel
    data is random bytes — the metadata parse never reads it — but
    every header field and the RIFF even-padding rule are spec-exact."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    junk = rng.integers(0, 256, int(rng.integers(5, 40))).astype(
        np.uint8).tobytes()
    if variant == "lossy":
        # frame tag: keyframe (bit0=0), version 0, show_frame, partition size
        tag = (0 | (0 << 1) | (1 << 4) | (len(junk) << 5)).to_bytes(3, "little")
        body = (tag + b"\x9d\x01\x2a"
                + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + junk)
        payload = chunk(b"VP8 ", body)
    elif variant == "lossless":
        bits = (w - 1) | ((h - 1) << 14) | (int(has_alpha) << 28)
        body = b"\x2f" + struct.pack("<I", bits) + junk
        payload = chunk(b"VP8L", body)
    else:  # extended
        flags = 0x10 if has_alpha else 0
        body = (bytes([flags]) + bytes(3)
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        bits = (w - 1) | ((h - 1) << 14) | (int(has_alpha) << 28)
        inner = chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits) + junk)
        payload = chunk(b"VP8X", body) + inner
    return (b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP"
            + payload)


def parse_webp_meta(payload: bytes) -> dict:
    """RIFF/WEBP chunk walk (even-padded sizes) dispatching on the first
    image chunk: VP8 lossy (validates the 9D 01 2A start code), VP8L
    lossless (validates the 0x2F signature, unpacks the 14-bit dims and
    the alpha bit), VP8X extended (24-bit LE canvas dims + alpha flag).
    Raises ValueError on a foreign container or malformed headers."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")
    pos = 12
    while pos < len(payload):
        if len(payload) - pos < 8:
            raise ValueError("short chunk header")
        fourcc = payload[pos:pos + 4]
        clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = pos + 8
        if body + clen > len(payload):
            raise ValueError(f"chunk {fourcc!r} overruns payload")
        if fourcc == b"VP8 ":
            if clen < 10:
                raise ValueError("VP8 chunk too short")
            if payload[body + 3:body + 6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code")
            w, h = struct.unpack("<HH", payload[body + 6:body + 10])
            return {"width": w & 0x3FFF, "height": h & 0x3FFF,
                    "variant": "lossy", "has_alpha": False}
        if fourcc == b"VP8L":
            if clen < 5:
                raise ValueError("VP8L chunk too short")
            if payload[body] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = struct.unpack("<I", payload[body + 1:body + 5])[0]
            if (bits >> 29) & 7:
                raise ValueError("unsupported VP8L version")
            return {"width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1,
                    "variant": "lossless",
                    "has_alpha": bool((bits >> 28) & 1)}
        if fourcc == b"VP8X":
            if clen < 10:
                raise ValueError("VP8X chunk too short")
            flags = payload[body]
            w = int.from_bytes(payload[body + 4:body + 7], "little") + 1
            h = int.from_bytes(payload[body + 7:body + 10], "little") + 1
            return {"width": w, "height": h, "variant": "extended",
                    "has_alpha": bool(flags & 0x10)}
        pos = body + clen + (clen & 1)  # even padding
    raise ValueError("no image chunk found")


def make_webp_media_table(n: int, seed: int = 23) -> pa.Table:
    """n REAL WebP containers cycling the three header variants (lossy /
    lossless / extended), odd body lengths guaranteed so the RIFF
    even-padding rule is always exercised, alpha planted on half the
    lossless/extended files. Truth is analytic at build time."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "true_width": [],
            "true_height": [], "true_variant": [], "true_has_alpha": []}
    variants = ("lossy", "lossless", "extended")
    for i in range(n):
        v = variants[i % 3]
        w = int(rng.integers(1, 16384))
        h = int(rng.integers(1, 16384))
        alpha = bool(rng.random() < 0.5) and v != "lossy"
        rows["media_id"].append(i)
        rows["payload"].append(build_webp(v, w, h, rng, has_alpha=alpha))
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_variant"].append(v)
        rows["true_has_alpha"].append(alpha)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_variant": pa.array(rows["true_variant"], pa.string()),
        "true_has_alpha": pa.array(rows["true_has_alpha"], pa.bool_()),
    })


_META_SCHEMA: dict[str, tuple[tuple[str, pa.DataType], ...]] = {
    "mp3": (("n_frames", pa.int64()), ("duration_ms", pa.int64()),
            ("kbps_sum", pa.int64()), ("sample_rate", pa.int64())),
    "mp4": (("duration_ms", pa.int64()), ("n_tracks", pa.int64()),
            ("n_video", pa.int64()), ("n_audio", pa.int64()),
            ("max_width", pa.int64()), ("max_height", pa.int64())),
    "webp": (("width", pa.int64()), ("height", pa.int64()),
             ("variant", pa.string()), ("has_alpha", pa.bool_())),
}


class MediaMetaStage:
    """Actor-pool stage: container-metadata extraction WITHOUT decode —
    the 100 TB fast path (route/filter/budget by duration and dims
    before any expensive decode stage runs). Parser dispatch is bound
    once per actor in ``__init__``; ``__call__`` walks each payload's
    headers only (MP3 frame hops, MP4 box tree, WebP chunk list), never
    the coded samples, so per-row cost is O(header bytes), independent
    of payload size."""

    def __init__(self, kind: str):
        self.kind = kind
        self._parse = {"mp3": parse_mp3_meta, "mp4": parse_mp4_meta,
                       "webp": parse_webp_meta}[kind]
        self._schema = _META_SCHEMA[kind]

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self._parse(p) for p in batch["payload"].to_pylist()]
        cols: dict[str, pa.Array] = {"media_id": batch["media_id"]}
        for name, typ in self._schema:
            cols[name] = pa.array([m[name] for m in metas], typ)
        return pa.table(cols)
