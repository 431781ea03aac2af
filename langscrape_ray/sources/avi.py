"""REAL AVI (RIFF) video container codec on struct alone — no pyav/ffmpeg.

The video sibling of ``sources/png.py`` / ``sources/warc.py``: a genuine
container format implemented from the public spec (Microsoft AVI RIFF /
OpenDML) so SampleVideoFrames demuxes REAL bytes.  Scope: one video stream,
uncompressed 24-bit BI_RGB DIB frames ('00db' chunks, bottom-up BGR rows
padded to 4 bytes — the DIB contract), 'idx1' index emitted on write and
tolerated on read.  Compressed fourccs raise ``UnsupportedAvi`` at the
integration point (the pyav tier handles those when present).

Reference analog: none (the reference has no video pipeline) — engine
surface for the multimodal-columns requirement.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


class BadAvi(ValueError):
    """Not an AVI / corrupt RIFF framing."""


class UnsupportedAvi(ValueError):
    """Valid AVI, but outside the supported spec subset."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _dib_frame(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> DIB bytes: bottom-up rows, BGR, 4-byte padded."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # flip rows, RGB->BGR
    row_len = w * 3
    pad = (-row_len) % 4
    if pad:
        rows = np.zeros((h, row_len + pad), dtype=np.uint8)
        rows[:, :row_len] = bgr.reshape(h, row_len)
        return rows.tobytes()
    return bgr.tobytes()


def avi_bytes(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames into a real uncompressed AVI."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise UnsupportedAvi("expected (n, h, w, 3) RGB frames")
    n, h, w, _ = a.shape
    row_len = w * 3 + ((-w * 3) % 4)
    frame_size = row_len * h

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps),  # usec per frame
        frame_size * fps,          # max bytes/sec
        0,                         # padding granularity
        0x10,                      # AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, max(1, fps),            # scale / rate => fps
        0, n, frame_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0,        # BITMAPINFOHEADER, BI_RGB
        frame_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00db", _dib_frame(a[i])) for i in range(n))
    movi = _list(b"movi", movi_payload)
    # idx1: offsets relative to the start of the 'movi' list kind fourcc
    idx_entries = []
    off = 4
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_size))
        off += 8 + frame_size + (frame_size % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return _chunk(b"RIFF", riff_payload)


def avi_meta(data: bytes) -> Tuple[int, int, int, int]:
    """(n_frames, width, height, fps) from the headers alone."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise BadAvi("not a RIFF/AVI")
    n = w = h = None
    fps = 25
    pos = 12
    end = 8 + struct.unpack("<I", data[4:8])[0]
    while pos + 8 <= min(end, len(data)):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"LIST":
            kind = body[:4]
            if kind in (b"hdrl", b"strl"):
                pos += 12  # descend
                continue
            # movi or other lists: skip whole
        elif tag == b"avih":
            fields = struct.unpack("<IIIIIIIIII", body[:40])
            n, w, h = fields[4], fields[8], fields[9]
        elif tag == b"strh":
            if body[:4] == b"vids":
                if body[4:8] not in (b"DIB ", b"\x00\x00\x00\x00"):
                    raise UnsupportedAvi(
                        f"compressed fourcc {body[4:8]!r}"
                    )
                scale, rate = struct.unpack("<II", body[20:28])
                if scale:
                    fps = max(1, rate // scale)
        pos += 8 + ln + (ln % 2)
    if n is None:
        raise BadAvi("missing avih")
    return n, w, h, fps


def read_avi(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode a supported AVI to ((n, h, w, 3) uint8 RGB frames, fps)."""
    n, w, h, fps = avi_meta(data)
    row_len = w * 3 + ((-w * 3) % 4)
    frames = []
    pos = 12
    end = 8 + struct.unpack("<I", data[4:8])[0]
    while pos + 8 <= min(end, len(data)):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"LIST":
            kind = data[pos + 8 : pos + 12]
            if kind in (b"hdrl", b"strl", b"movi"):
                pos += 12  # descend into headers AND frame data
                continue
        elif tag == b"00dc":
            # '00dc' marks a COMPRESSED-stream chunk: even when the strh
            # fourcc is the tolerated all-zero value, decoding it as a raw
            # DIB would silently mis-decode whenever the size coincides
            raise UnsupportedAvi("compressed frame chunk '00dc'")
        elif tag == b"00db":
            raw = data[pos + 8 : pos + 8 + ln]
            if len(raw) != row_len * h:
                raise BadAvi(f"frame size {len(raw)} != {row_len * h}")
            rows = np.frombuffer(raw, np.uint8).reshape(h, row_len)
            bgr = rows[:, : w * 3].reshape(h, w, 3)
            frames.append(bgr[::-1, :, ::-1])  # bottom-up -> top-down, BGR->RGB
        pos += 8 + ln + (ln % 2)
    if len(frames) != n:
        raise BadAvi(f"frame count {len(frames)} != header {n}")
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), fps
