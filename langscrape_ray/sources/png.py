"""REAL PNG codec on the stdlib alone (zlib + struct) — no PIL.

The image sibling of ``sources/warc.py`` / ``sources/xlsx.py`` /
``sources/sevenzip.py``: a genuine binary image format implemented from the
public spec (RFC 2083 / W3C PNG) so the multimodal image stages decode REAL
bytes instead of gating on an absent optional dependency.

Scope (spec subset, loud on anything else): 8-bit depth, color types 0
(grayscale), 2 (RGB) and 6 (RGBA), no interlace, all five scanline filters
(None/Sub/Up/Average/Paeth) on both encode and decode, chunk CRCs verified.
That covers the overwhelming share of web PNGs a crawl actually sees at
8-bit; palette/16-bit/interlaced raise ``UnsupportedPng`` at the exact
integration point (the DecodeImageMeta gate pattern).

Reference analog: none (the reference has no image pipeline) — this is
engine surface for the multimodal-columns requirement.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Optional

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedPng(ValueError):
    """Valid PNG, but outside the supported spec subset."""


class BadPng(ValueError):
    """Not a PNG / corrupt framing / CRC mismatch."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}  # PNG color type -> channels


def png_bytes(arr: np.ndarray, filters: Optional[List[int]] = None) -> bytes:
    """Encode an (h, w) or (h, w, {1,3,4}) uint8 array to real PNG bytes.

    ``filters`` cycles per scanline (default [0]); passing e.g.
    [0, 1, 2, 3, 4] exercises every filter type so a decode proves the
    full unfilter path, not just the trivial one.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_TYPE:
        raise UnsupportedPng(f"{ch}-channel arrays not encodable")
    filters = filters or [0]
    if filters == [0]:
        # all-None filtering (the default encode) needs no per-row loop:
        # one filter byte column + the raw scanlines
        buf = np.zeros((h, 1 + w * ch), dtype=np.uint8)
        buf[:, 1:] = a.reshape(h, w * ch)
        ihdr0 = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
        return (
            _SIG
            + _chunk(b"IHDR", ihdr0)
            + _chunk(b"IDAT", zlib.compress(buf.tobytes()))
            + _chunk(b"IEND", b"")
        )
    if any(ft not in (0, 1, 2, 3, 4) for ft in filters):
        raise UnsupportedPng(f"filter set {filters}")
    # Encode predictors reference the RAW previous scanline (not the
    # encoded one), so the whole image filters in one vectorized pass:
    ai = a.astype(np.int16)
    left = np.zeros_like(ai)
    left[:, 1:] = ai[:, :-1]
    up = np.zeros_like(ai)
    up[1:] = ai[:-1]
    ul = np.zeros_like(ai)
    ul[1:, 1:] = ai[:-1, :-1]
    ftcol = np.array(
        [filters[y % len(filters)] for y in range(h)], dtype=np.uint8
    )
    pred = np.zeros_like(ai)
    pred[ftcol == 1] = left[ftcol == 1]
    pred[ftcol == 2] = up[ftcol == 2]
    pred[ftcol == 3] = ((left + up) // 2)[ftcol == 3]
    if np.any(ftcol == 4):
        pred[ftcol == 4] = _paeth(
            left[ftcol == 4], up[ftcol == 4], ul[ftcol == 4]
        )
    enc = (ai - pred).astype(np.uint8).reshape(h, w * ch)
    buf = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    buf[:, 0] = ftcol
    buf[:, 1:] = enc
    raw = buf.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int16 inputs (a=left, b=up, c=up-left)."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out


def png_meta(data: bytes) -> "tuple[int, int, int]":
    """(width, height, channels) from the IHDR alone — the cheap header
    sniff for DecodeImageMeta (no inflate)."""
    if data[:8] != _SIG:
        raise BadPng("bad signature")
    if data[12:16] != b"IHDR":
        raise BadPng("IHDR not first")
    w, h, depth, ctype, comp, flt, inter = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if depth != 8 or ctype not in _CHANNELS:
        raise UnsupportedPng(f"depth={depth} colortype={ctype}")
    if inter:
        raise UnsupportedPng("interlaced")
    return w, h, _CHANNELS[ctype]


def read_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (h, w, channels) uint8 array.

    Full chunk walk with CRC verification, multi-IDAT concatenation, and
    all five scanline unfilters.  Sub/Average/Paeth are sequential in x
    by definition; rows are short and the engine's parallelism axis is
    images-per-actor-pool, not pixels-per-image."""
    w, h, ch = png_meta(data)
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise BadPng(f"CRC mismatch in {tag!r}")
        if tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        elif tag in (b"PLTE",):
            raise UnsupportedPng("palette")
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise BadPng(f"inflated size {len(raw)} != {h * (stride + 1)}")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.int16)
    prev_b = bytes(stride)
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        if ft == 0:
            cur = np.frombuffer(raw, np.uint8, stride, base + 1).reshape(
                w, ch
            ).astype(np.int16)
        elif ft == 1:  # Sub — a per-channel running sum mod 256
            row = np.frombuffer(raw, np.uint8, stride, base + 1).reshape(
                w, ch
            )
            cur = (np.cumsum(row, axis=0, dtype=np.int64) & 0xFF).astype(
                np.int16
            )
        elif ft == 2:  # Up — vectorized
            row = np.frombuffer(raw, np.uint8, stride, base + 1).reshape(
                w, ch
            ).astype(np.int16)
            cur = (row + prev) & 0xFF
        elif ft in (3, 4):
            # Average/Paeth are sequential in x by definition; plain-int
            # bytearray arithmetic beats per-pixel numpy ops ~5x here
            rb = raw[base + 1 : base + 1 + stride]
            ob = bytearray(stride)
            pb = prev_b
            if ft == 3:
                for i in range(stride):
                    left = ob[i - ch] if i >= ch else 0
                    ob[i] = (rb[i] + ((left + pb[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    left = ob[i - ch] if i >= ch else 0
                    ul = pb[i - ch] if i >= ch else 0
                    up = pb[i]
                    p = left + up - ul
                    pa_ = p - left if p >= left else left - p
                    pb_ = p - up if p >= up else up - p
                    pc_ = p - ul if p >= ul else ul - p
                    if pa_ <= pb_ and pa_ <= pc_:
                        pred = left
                    elif pb_ <= pc_:
                        pred = up
                    else:
                        pred = ul
                    ob[i] = (rb[i] + pred) & 0xFF
            cur = np.frombuffer(bytes(ob), np.uint8).reshape(w, ch).astype(
                np.int16
            )
        else:
            raise BadPng(f"filter byte {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
        prev_b = out[y].tobytes()
    return out


def resize_nearest(arr: np.ndarray, max_w: int, max_h: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale (no-op if it fits) —
    deterministic integer index math, no float resampling kernels."""
    h, w = arr.shape[:2]
    if w <= max_w and h <= max_h:
        return arr
    scale = min(max_w / w, max_h / h)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * h // nh).astype(np.int64)
    xs = (np.arange(nw) * w // nw).astype(np.int64)
    return arr[ys][:, xs]
