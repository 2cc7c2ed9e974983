"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode kernels themselves are STUBS (image/audio libraries are not in
this container): ``decode=\"real\"`` raises ``NotImplementedError`` at the
point where Pillow/ffmpeg would be called; ``decode=\"fake\"`` derives
deterministic pseudo-features from the payload bytes so the Ray-side
plumbing — schema, actor-pool signature, batch sizing, output layout —
is fully real and testable.

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
        if self.decode == "real":
            raise NotImplementedError(
                "image decode requires Pillow, not available in this container; "
                "run with decode='fake' for deterministic pseudo-features")
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
        if self.decode == "real":
            raise NotImplementedError(
                "image resize requires Pillow, not available in this container; "
                "run with decode='fake'")
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
        if self.decode == "real":
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg, not in this container; "
                "use decode='fake'")
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
