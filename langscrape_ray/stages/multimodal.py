"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as binary columns
with typed metadata, decoded/feature-extracted in actor-pool map_batches
stages (task brief).  Codec wiring (round 3):

- ``fake=True`` (default) parses the deterministic fixture header —
  driver-oracled end to end.
- ``fake=False`` runs the REAL codec path: images via PIL, video demux via
  pyav (both import-guarded — absent in this container, the stage raises
  NotImplementedError at the exact integration point), and audio via the
  stdlib ``wave`` module, which needs NO external dependency, so the real
  WAV decode path runs and is tested HERE.

Everything Ray-side — schema handling, batch sizing, actor signature,
output layout — is identical between the two modes.

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
            # REAL tier 1: stdlib PNG codec (sources/png.py) — no PIL
            # needed for the format a crawl sees most.
            if payload is not None and bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
                from langscrape_ray.sources.png import (
                    BadPng,
                    UnsupportedPng,
                    png_meta,
                )

                try:
                    w, h, _ch = png_meta(bytes(payload))
                    return w, h, "png"
                except UnsupportedPng:
                    # valid PNG outside the codec subset — dims are still
                    # in the IHDR (parsed before the subset check)
                    w, h = struct.unpack(">II", bytes(payload[16:24]))
                    return w, h, "png"
                except BadPng:
                    return None
            # REAL tier 1b: stdlib baseline JPEG codec (sources/jpeg.py)
            if payload is not None and bytes(payload[:2]) == b"\xff\xd8":
                from langscrape_ray.sources.jpeg import (
                    BadJpeg,
                    UnsupportedJpeg,
                    jpeg_meta,
                )

                try:
                    w, h, _nc = jpeg_meta(bytes(payload))
                    return w, h, "jpeg"
                except (UnsupportedJpeg, BadJpeg):
                    return None
            # tier 2: PIL for the other formats, loud when absent
            try:
                from io import BytesIO

                from PIL import Image  # optional dep, absent in container
            except ImportError:
                raise NotImplementedError(
                    "real image decode beyond PNG/baseline-JPEG requires "
                    "PIL — not available in this environment; PNG decodes "
                    "natively (sources/png.py), baseline JPEG natively "
                    "(sources/jpeg.py), or run with fake=True for fixture "
                    "payloads"
                ) from None
            try:
                with Image.open(BytesIO(payload)) as im:
                    return im.width, im.height, (im.format or "unknown").lower()
            except Exception:
                return None
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
    __init__, exactly the pattern a real encoder uses.

    REAL-pixel tier: a payload carrying genuine PNG bytes is decoded by
    the stdlib codec (sources/png.py) and featurized from its ACTUAL
    pixels — per-channel means/stds, normalized dims, and an 8-bin
    grayscale histogram, projected up/down to ``dim``.  Non-PNG payloads
    keep the byte-head projection (the deterministic stand-in for an
    absent learned encoder)."""

    def __init__(self, dim: int = 16):
        rng = np.random.RandomState(1234)
        self.proj = rng.standard_normal((64, dim)).astype(np.float32)
        self.dim = dim

    def _pixel_features(self, arr: "np.ndarray") -> "np.ndarray":
        """16 deterministic stats from decoded pixels, tiled/cut to dim."""
        a = arr.astype(np.float32)
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, ch = a.shape
        gray = a.mean(axis=2)
        hist = np.histogram(gray, bins=8, range=(0.0, 256.0))[0]
        hist = hist.astype(np.float32) / max(1, gray.size)
        chans = np.zeros(6, dtype=np.float32)
        for c in range(min(3, ch)):
            chans[c] = a[:, :, c].mean() / 255.0
            chans[3 + c] = a[:, :, c].std() / 255.0
        base = np.concatenate(
            [chans, [w / 4096.0, h / 4096.0], hist]
        ).astype(np.float32)  # 16 values
        reps = -(-self.dim // base.size)
        return np.tile(base, reps)[: self.dim]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: List[np.ndarray] = []
        for payload in batch["image"].to_pylist():
            if not payload:
                feats.append(np.zeros(self.dim, dtype=np.float32))
                continue
            if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
                from langscrape_ray.sources.png import (
                    BadPng,
                    UnsupportedPng,
                    read_png,
                )

                try:
                    feats.append(self._pixel_features(read_png(bytes(payload))))
                    continue
                except (BadPng, UnsupportedPng):
                    pass
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
            # REAL tier 1: stdlib PNG decode -> nearest-neighbor downscale
            # -> PNG re-encode (sources/png.py), no PIL needed.
            if payload is not None and bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
                from langscrape_ray.sources.png import (
                    BadPng,
                    UnsupportedPng,
                    png_bytes,
                    png_meta,
                    read_png,
                    resize_nearest,
                )

                try:
                    # header-only sniff first: the fits-already no-op path
                    # must cost O(IHDR), not a full inflate+unfilter
                    w, h, _ch = png_meta(bytes(payload))
                    if w <= self.max_w and h <= self.max_h:
                        return payload
                    arr = read_png(bytes(payload))
                except (BadPng, UnsupportedPng):
                    return payload
                return png_bytes(
                    resize_nearest(arr, self.max_w, self.max_h)
                )
            # REAL tier 1b: stdlib baseline JPEG decode -> nearest
            # downscale -> JPEG re-encode (sources/jpeg.py), no PIL.
            if payload is not None and bytes(payload[:2]) == b"\xff\xd8":
                from langscrape_ray.sources.jpeg import (
                    BadJpeg,
                    UnsupportedJpeg,
                    jpeg_bytes,
                    jpeg_meta,
                    read_jpeg,
                )
                from langscrape_ray.sources.png import resize_nearest

                try:
                    # header-only sniff first: the fits-already no-op
                    # path must cost O(SOF0), not a full Huffman decode
                    w, h, _nc = jpeg_meta(bytes(payload))
                    if w <= self.max_w and h <= self.max_h:
                        return payload
                    arr = read_jpeg(bytes(payload))
                except (BadJpeg, UnsupportedJpeg):
                    return payload
                return jpeg_bytes(
                    resize_nearest(arr, self.max_w, self.max_h)
                )
            try:
                from io import BytesIO

                from PIL import Image  # optional dep, absent in container
            except ImportError:
                raise NotImplementedError(
                    "real image resize beyond PNG/baseline-JPEG requires "
                    "PIL — not available here; PNG and baseline JPEG "
                    "resize natively (sources/png.py, sources/jpeg.py), "
                    "or run with fake=True for fixture payloads"
                ) from None
            try:
                with Image.open(BytesIO(payload)) as im:
                    fmt = im.format or "PNG"
                    if im.width <= self.max_w and im.height <= self.max_h:
                        return payload
                    im.thumbnail((self.max_w, self.max_h))
                    buf = BytesIO()
                    im.save(buf, format=fmt)
                    return buf.getvalue()
            except Exception:
                return payload
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

    def _demux_real(self, payload: bytes):
        """Real path, tier 1: stdlib RIFF/AVI demux (sources/avi.py) for
        uncompressed-DIB containers — every ``stride``-th frame re-encoded
        as a REAL PNG so the downstream image stages stay on their native
        codec path.  Tier 2: pyav for compressed containers, import-guarded
        (absent in this container)."""
        if payload is not None and bytes(payload[:4]) == b"RIFF" and bytes(
            payload[8:12]
        ) == b"AVI ":
            from langscrape_ray.sources.avi import (
                BadAvi,
                UnsupportedAvi,
                read_avi,
            )
            from langscrape_ray.sources.png import png_bytes

            try:
                frames, fps = read_avi(bytes(payload))
            except (BadAvi, UnsupportedAvi) as e:
                if isinstance(e, BadAvi):
                    return []
                raise NotImplementedError(
                    f"compressed AVI needs pyav ({e}); uncompressed DIB "
                    "demuxes natively (sources/avi.py)"
                ) from None
            return [
                (fi, fi * 1000 // max(1, fps), png_bytes(frames[fi]))
                for fi in range(0, len(frames), self.stride)
            ]
        try:
            import av  # optional dep, absent in container
        except ImportError:
            raise NotImplementedError(
                "real non-AVI frame sampling requires ffmpeg/pyav — not "
                "available here; uncompressed AVI demuxes natively "
                "(sources/avi.py), or run with fake=True for fixture "
                "payloads"
            ) from None
        from io import BytesIO

        out = []
        with av.open(BytesIO(payload)) as container:
            stream = container.streams.video[0]
            tb = stream.time_base
            for fi, frame in enumerate(container.decode(stream)):
                if fi % self.stride:
                    continue
                ts_ms = int((frame.pts or 0) * tb * 1000) if tb else 0
                arr = frame.to_ndarray(format="gray")
                blob = arr.tobytes()[:64].ljust(64, b"\0")
                out.append(
                    (fi, ts_ms,
                     _MAGIC + struct.pack("<HHB", frame.width, frame.height, 0)
                     + blob)
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_cols = [n for n in batch.column_names if n != "video"]
        if not self.fake:
            out_keys = {n: [] for n in key_cols}
            frame_idx, ts_ms, frames = [], [], []
            for row, payload in enumerate(batch["video"].to_pylist()):
                for fi, ts, blob in self._demux_real(payload):
                    for n in key_cols:
                        out_keys[n].append(batch[n][row].as_py())
                    frame_idx.append(fi)
                    ts_ms.append(ts)
                    frames.append(blob)
            cols = {
                n: pa.array(v, type=batch.schema.field(n).type)
                for n, v in out_keys.items()
            }
            cols["frame_idx"] = pa.array(frame_idx, pa.int32())
            cols["ts_ms"] = pa.array(ts_ms, pa.int64())
            cols["image"] = pa.array(frames, pa.binary())
            return pa.table(cols)
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


def make_wav_payload(n_samples: int, rate: int = 16000, seed: int = 0) -> bytes:
    """Deterministic REAL RIFF/WAV payload (16-bit mono PCM) via the stdlib
    ``wave`` writer — exercises the fake=False decode path with no external
    dependency."""
    import wave
    from io import BytesIO

    pcm = np.empty(n_samples, dtype=np.int16)
    idx = np.arange(n_samples, dtype=np.int64)
    pcm[:] = ((seed * 7919 + idx * 2654435761) % 65536 - 32768).astype(np.int16)
    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioFeatureStub:
    """Actor-pool stage: audio payload -> (duration_ms, rate, rms_e6).

    fake=True parses the AUD1 fixture header and computes rms over the
    fixture body bytes.  fake=False decodes REAL RIFF/WAV via the stdlib
    ``wave`` module (16-bit PCM, any channel count) — no external
    dependency, so the real branch runs in this container; non-WAV bytes
    land as decode_ok=False rather than raising, matching the fixture
    path's invalid-payload contract."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode_wav(self, payload: bytes):
        """(n_samples, rate, rms[0..1]) from RIFF/WAV bytes, or None."""
        import wave
        from io import BytesIO

        try:
            with wave.open(BytesIO(payload), "rb") as w:
                rate = w.getframerate()
                n_frames = w.getnframes()
                width = w.getsampwidth()
                raw = w.readframes(n_frames)
        except Exception:
            return None
        if width == 2:
            x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
        elif width == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            return None
        r = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        return n_frames, rate, r

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur: List[int] = []
        rates: List[int] = []
        rms: List[int] = []
        ok: List[bool] = []
        for payload in batch["audio"].to_pylist():
            if not self.fake:
                meta = self._decode_wav(payload) if payload else None
                if meta is None:
                    dur.append(0); rates.append(0); rms.append(0); ok.append(False)
                    continue
                n_samples, rate, r = meta
            else:
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
