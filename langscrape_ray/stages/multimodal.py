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
