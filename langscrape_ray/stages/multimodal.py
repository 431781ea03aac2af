"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as binary columns
with typed metadata, decoded/feature-extracted in actor-pool map_batches
stages (task brief).  The actual codec libraries (PIL/ffmpeg/torchaudio) are
NOT in this container, so the decode kernels are explicitly gated: with
``fake=True`` (default) they parse a deterministic fixture header; with
``fake=False`` they raise NotImplementedError at the exact integration
point.  Everything Ray-side — schema handling, batch sizing, actor
signature, output layout — is real and tested.

Fixture payload format (deterministic, produced by make_image_payload):
    b"IMG1" + width:uint16 + height:uint16 + fmt:1byte + pixels-ish bytes
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np
import pyarrow as pa

_MAGIC = b"IMG1"
_FORMATS = ("png", "jpeg", "webp")


def make_image_payload(width: int, height: int, fmt: str = "png", seed: int = 0) -> bytes:
    """Deterministic fake image bytes (fixture generator)."""
    body_len = min(4096, width * height)
    body = bytes((seed + i * 31) % 251 for i in range(body_len))
    return _MAGIC + struct.pack("<HHB", width, height, _FORMATS.index(fmt)) + body


class DecodeImageMeta:
    """Actor-pool stage: binary payload -> (width, height, format, n_bytes).

    Small batches are mandatory for large binary payloads (batch x
    concurrency must fit the worker heap) — callers pass batch_size
    explicitly, e.g. ``map_batches(DecodeImageMeta, batch_size=32,
    concurrency=4)``."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode_one(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires PIL/imageio — not available in "
                "this environment; run with fake=True for fixture payloads"
            )
        if payload is None or not payload.startswith(_MAGIC):
            return None
        w, h, f = struct.unpack("<HHB", payload[4:9])
        return w, h, _FORMATS[f] if f < len(_FORMATS) else "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths: List[int] = []
        heights: List[int] = []
        fmts: List[str] = []
        sizes: List[int] = []
        ok: List[bool] = []
        for payload in batch["image"].to_pylist():
            meta = self._decode_one(payload)
            sizes.append(len(payload) if payload is not None else 0)
            if meta is None:
                widths.append(0)
                heights.append(0)
                fmts.append("invalid")
                ok.append(False)
            else:
                widths.append(meta[0])
                heights.append(meta[1])
                fmts.append(meta[2])
                ok.append(True)
        cols = {n: batch[n] for n in batch.column_names if n != "image"}
        cols["width"] = pa.array(widths, pa.int32())
        cols["height"] = pa.array(heights, pa.int32())
        cols["format"] = pa.array(fmts, pa.string())
        cols["n_bytes"] = pa.array(sizes, pa.int64())
        cols["decode_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


class ImageFeatureStub:
    """Actor-pool stage: payload -> deterministic feature vector
    (list<float32>, dim=``dim``).  Stands in for batched model inference —
    the state (the 'model': a projection matrix) loads once per actor in
    __init__, exactly the pattern a real encoder uses."""

    def __init__(self, dim: int = 16):
        rng = np.random.RandomState(1234)
        self.proj = rng.standard_normal((64, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: List[np.ndarray] = []
        for payload in batch["image"].to_pylist():
            if not payload:
                feats.append(np.zeros(self.proj.shape[1], dtype=np.float32))
                continue
            head = np.frombuffer(bytes(payload[:64]).ljust(64, b"\0"), dtype=np.uint8)
            feats.append((head.astype(np.float32) / 255.0) @ self.proj)
        cols = {n: batch[n] for n in batch.column_names if n != "image"}
        cols["embedding"] = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32())
        )
        return pa.table(cols)


class ResizeImageStub:
    """Actor-pool stage: payload -> payload resized to fit (max_w, max_h),
    aspect preserved.  The fixture 'resize' rewrites the header dims and
    truncates the body proportionally — deterministic, so downstream
    DecodeImageMeta sees consistent metadata; with fake=False it raises at
    the exact point a PIL ``Image.resize`` call belongs.  Output column
    replaces ``image`` in place (payload-in/payload-out layout, the shape
    a real thumbnailing stage uses)."""

    def __init__(self, max_w: int = 256, max_h: int = 256, fake: bool = True):
        self.max_w = max_w
        self.max_h = max_h
        self.fake = fake

    def _resize_one(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "real image resize requires PIL — not available here; "
                "run with fake=True for fixture payloads"
            )
        if payload is None or not payload.startswith(_MAGIC):
            return payload
        w, h, f = struct.unpack("<HHB", payload[4:9])
        if w <= self.max_w and h <= self.max_h:
            return payload
        scale = min(self.max_w / w, self.max_h / h)
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        body = payload[9:]
        keep = max(1, int(len(body) * (nw * nh) / (w * h)))
        return _MAGIC + struct.pack("<HHB", nw, nh, f) + body[:keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_one(p) for p in batch["image"].to_pylist()]
        cols = {n: batch[n] for n in batch.column_names if n != "image"}
        cols["image"] = pa.array(out, pa.binary())
        return pa.table(cols)


# --------------------------------------------------------------------------
# video: frame sampling (explode layout)
# --------------------------------------------------------------------------

_VID_MAGIC = b"VID1"


def make_video_payload(n_frames: int, width: int, height: int,
                       fps: int = 25, seed: int = 0) -> bytes:
    """Deterministic fake video: header + n_frames fixed-size frame blobs."""
    frame_len = 64
    frames = b"".join(
        bytes((seed + fi * 17 + i * 31) % 251 for i in range(frame_len))
        for fi in range(n_frames)
    )
    return (
        _VID_MAGIC
        + struct.pack("<IHHB", n_frames, width, height, fps)
        + frames
    )


class SampleVideoFrames:
    """Actor-pool stage: video payload -> ONE ROW PER SAMPLED FRAME
    (doc keys + frame_idx + ts_ms + an IMG1 frame payload).  The explode
    layout is the real contract a frame-level training pipeline needs:
    downstream image stages (DecodeImageMeta / ImageFeatureStub /
    ResizeImageStub) consume the output unchanged.  ``stride`` samples
    every Nth frame — at 100 TB the batch_size upstream of this stage must
    be sized for payload x stride expansion, not row count.  fake=False
    raises where an ffmpeg/pyav demux call belongs."""

    def __init__(self, stride: int = 5, fake: bool = True):
        assert stride >= 1
        self.stride = stride
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg/pyav — not available "
                "here; run with fake=True for fixture payloads"
            )
        key_cols = [n for n in batch.column_names if n != "video"]
        out_keys: dict = {n: [] for n in key_cols}
        frame_idx: List[int] = []
        ts_ms: List[int] = []
        frames: List[bytes] = []
        for row, payload in enumerate(batch["video"].to_pylist()):
            if payload is None or not payload.startswith(_VID_MAGIC):
                continue
            n_frames, w, h, fps = struct.unpack("<IHHB", payload[4:13])
            frame_len = 64
            body = payload[13:]
            for fi in range(0, n_frames, self.stride):
                blob = body[fi * frame_len : (fi + 1) * frame_len]
                for n in key_cols:
                    out_keys[n].append(batch[n][row].as_py())
                frame_idx.append(fi)
                ts_ms.append(fi * 1000 // max(1, fps))
                frames.append(
                    _MAGIC + struct.pack("<HHB", w, h, 0) + blob
                )
        # pin key-column types from the input schema — an untyped
        # pa.array([]) on an empty/all-invalid batch would emit null-typed
        # columns and break the downstream schema union
        cols = {
            n: pa.array(v, type=batch.schema.field(n).type)
            for n, v in out_keys.items()
        }
        cols["frame_idx"] = pa.array(frame_idx, pa.int32())
        cols["ts_ms"] = pa.array(ts_ms, pa.int64())
        cols["image"] = pa.array(frames, pa.binary())
        return pa.table(cols)


# --------------------------------------------------------------------------
# audio: feature extraction
# --------------------------------------------------------------------------

_AUD_MAGIC = b"AUD1"


def make_audio_payload(n_samples: int, rate: int = 16000, seed: int = 0) -> bytes:
    """Deterministic fake audio: header + uint8 'pcm' body (capped)."""
    body_len = min(8192, n_samples)
    body = bytes((seed + i * 13) % 251 for i in range(body_len))
    return _AUD_MAGIC + struct.pack("<II", n_samples, rate) + body


class AudioFeatureStub:
    """Actor-pool stage: audio payload -> (duration_ms, rate, rms_e6).
    rms is computed over the fixture body bytes (stands in for a real
    PCM decode + frame-level features); fake=False raises where a
    torchaudio/soundfile load belongs."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real audio decode requires soundfile/torchaudio — not "
                "available here; run with fake=True for fixture payloads"
            )
        dur: List[int] = []
        rates: List[int] = []
        rms: List[int] = []
        ok: List[bool] = []
        for payload in batch["audio"].to_pylist():
            if payload is None or not payload.startswith(_AUD_MAGIC):
                dur.append(0); rates.append(0); rms.append(0); ok.append(False)
                continue
            n_samples, rate = struct.unpack("<II", payload[4:12])
            body = np.frombuffer(payload[12:], dtype=np.uint8)
            x = body.astype(np.float64) / 255.0
            r = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            dur.append(n_samples * 1000 // max(1, rate))
            rates.append(rate)
            rms.append(int(round(r * 1_000_000)))
            ok.append(True)
        cols = {n: batch[n] for n in batch.column_names if n != "audio"}
        cols["duration_ms"] = pa.array(dur, pa.int64())
        cols["rate"] = pa.array(rates, pa.int32())
        cols["rms_e6"] = pa.array(rms, pa.int64())
        cols["decode_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)
