"""Multimodal metadata pipeline: binary payload -> resize -> decode, oracled.

The image/audio stage classes live in ``stages/multimodal.py``; this module
wires them into a driver-visible query.  Payloads are built deterministically
from ``doc_id`` (the synthetic corpus carries no real media), so the Ray
side exercises the REAL binary encode -> ResizeImageStub -> DecodeImageMeta
path while the DuckDB oracle computes the expected metadata in closed form
from the same doc_id rule — the exact oracle pattern ``table_stats`` uses
for planted tables.  Every arithmetic step (scale, truncation, body-length
cap) is reproduced with FLOOR/LEAST double math so the hash is bit-exact.

Scale notes: payload columns are binary and dominate block size — the
attach stage caps ``batch_size`` so batch x concurrency stays inside the
worker heap; resize/decode are actor pools (state once per actor)."""

from __future__ import annotations

from typing import List

import pyarrow as pa
import ray.data as rd

from langscrape_ray.stages.multimodal import (
    AudioFeatureStub,
    DecodeImageMeta,
    ResizeImageStub,
    SampleVideoFrames,
    make_audio_payload,
    make_image_payload,
    make_video_payload,
    make_wav_payload,
)

_FMTS = ("png", "jpeg", "webp")


def _payload_params(doc_id: int):
    w = 100 + (doc_id * 7) % 900
    h = 80 + (doc_id * 13) % 700
    return w, h, _FMTS[doc_id % 3]


def attach_payloads(t: pa.Table) -> pa.Table:
    payloads: List[bytes] = []
    for did in t["doc_id"].to_pylist():
        w, h, fmt = _payload_params(did)
        payloads.append(make_image_payload(w, h, fmt, seed=did % 97))
    return pa.table(
        {"doc_id": t["doc_id"], "image": pa.array(payloads, pa.binary())}
    )


def media_meta(sf_dir: str, max_w: int = 256, max_h: int = 256) -> "rd.Dataset":
    """(doc_id, width, height, format, n_bytes, decode_ok): image metadata
    after a bounded-thumbnail resize — the standard normalize step of a
    multimodal ingest pipeline, run over real binary payloads."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        docs.map_batches(attach_payloads, batch_format="pyarrow", batch_size=256)
        .map_batches(
            ResizeImageStub,
            fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
            num_cpus=0.5,  # two light actor pools must co-schedule with the
            # upstream read even on a tiny (4-CPU test) cluster
        )
        .map_batches(
            DecodeImageMeta,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
            num_cpus=0.5,
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": t["width"].cast(pa.int64()),
                "height": t["height"].cast(pa.int64()),
                "format": t["format"],
                "n_bytes": t["n_bytes"].cast(pa.int64()),
                "decode_ok": t["decode_ok"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def pdf_extract(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_pages, n_chars, pdf_text): REAL PDF round-trip — build a
    deterministic multi-page FlateDecode PDF per doc (kernel/pdf.py
    build_minimal_pdf: real xref, page tree, compressed content streams,
    Tj ops) and run the real text-object extractor over the bytes
    (reference parity: langscrape/pdf/pdf_utils.py:17-34 page-join +
    normalize semantics).  The SQL oracle reconstructs the expected
    normalized text in closed form from the same doc_id rule.

    Scale notes: payload synthesis + extraction are one fused actor-pool
    stage over binary batches (batch_size capped for payload growth);
    zlib compress/decompress happens on the workers, never the driver."""
    from langscrape_ray.kernel.pdf import build_minimal_pdf, extract_pdf_text

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    class BuildAndExtract:
        """Fused synth -> parse stage (one actor-pool hop: the PDF bytes
        never cross a stage boundary, so block size stays text-sized)."""

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_pylist()
            n_pages, n_chars, texts = [], [], []
            for did in ids:
                np_ = 1 + did % 3
                pages = [
                    [f"Doc {did} page {p}", f"body.. {(did * 7 + p) % 100}"]
                    for p in range(np_)
                ]
                text = extract_pdf_text(build_minimal_pdf(pages))
                n_pages.append(np_)
                n_chars.append(len(text))
                texts.append(text)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_pages": pa.array(n_pages, pa.int64()),
                    "n_chars": pa.array(n_chars, pa.int64()),
                    "pdf_text": pa.array(texts, pa.string()),
                }
            )

    return docs.map_batches(
        BuildAndExtract,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=0.5,
    )


def media_frames(sf_dir: str, stride: int = 5) -> "rd.Dataset":
    """(doc_id, frame_idx, ts_ms, width, height): video -> one row per
    sampled frame, then per-frame image decode — the explode layout a
    frame-level training pipeline feeds to downstream image stages.
    Video params derive from doc_id (n_frames = 10 + doc_id % 40, fps 25);
    the SQL oracle regenerates the sampled-frame rows with a stepped
    range() and the frame metadata in closed form."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def attach(t: pa.Table) -> pa.Table:
        payloads: List[bytes] = []
        for did in t["doc_id"].to_pylist():
            payloads.append(
                make_video_payload(
                    n_frames=10 + did % 40,
                    width=320 + (did * 3) % 300,
                    height=200 + (did * 5) % 200,
                    fps=25,
                    seed=did % 97,
                )
            )
        return pa.table(
            {"doc_id": t["doc_id"], "video": pa.array(payloads, pa.binary())}
        )

    out = (
        docs.map_batches(attach, batch_format="pyarrow", batch_size=256)
        .map_batches(
            SampleVideoFrames,
            fn_constructor_kwargs={"stride": stride},
            batch_format="pyarrow",
            batch_size=64,  # explode stage: size for payload x stride growth
            concurrency=(1, 8),
            num_cpus=0.5,
        )
        .map_batches(
            DecodeImageMeta,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
            num_cpus=0.5,
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "frame_idx": t["frame_idx"].cast(pa.int64()),
                "ts_ms": t["ts_ms"].cast(pa.int64()),
                "width": t["width"].cast(pa.int64()),
                "height": t["height"].cast(pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def media_wav(sf_dir: str) -> "rd.Dataset":
    """(doc_id, duration_ms, rate, decode_ok): REAL codec path — genuine
    RIFF/WAV bytes (stdlib ``wave`` writer, 16-bit PCM) decoded by
    ``AudioFeatureStub(fake=False)``, i.e. the fake=False branch runs live
    in this container with no external dependency.  duration/rate come from
    the actual WAV header, so the SQL oracle reproduces them in closed form
    from the doc_id payload rule.  rms_e6 is intentionally NOT in the
    oracled projection: numpy's pairwise float sum and DuckDB's sequential
    sum disagree in the last ulps over thousands of samples — its
    exactness vs a closed-form numpy recompute is asserted in pytest
    (tests/test_stages_misc.py::test_audio_real_wav_decode) instead.

    Scale notes: WAV payloads are 2 B/sample — the attach stage caps
    batch_size so batch x concurrency stays inside the worker heap; decode
    is an actor pool (codec state once per actor)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def attach(t: pa.Table) -> pa.Table:
        payloads: List[bytes] = []
        for did in t["doc_id"].to_pylist():
            payloads.append(
                make_wav_payload(
                    n_samples=2000 + (did * 29) % 3000,
                    rate=16000 if did % 2 == 0 else 8000,
                    seed=did % 97,
                )
            )
        return pa.table(
            {"doc_id": t["doc_id"], "audio": pa.array(payloads, pa.binary())}
        )

    out = docs.map_batches(attach, batch_format="pyarrow", batch_size=256).map_batches(
        AudioFeatureStub,
        fn_constructor_kwargs={"fake": False},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=0.5,
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "duration_ms": t["duration_ms"].cast(pa.int64()),
                "rate": t["rate"].cast(pa.int64()),
                "decode_ok": t["decode_ok"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def media_audio(sf_dir: str) -> "rd.Dataset":
    """(doc_id, duration_ms, rate, rms_e6): audio feature extraction over
    doc_id-derived payloads.  duration/rate are closed-form; rms_e6 is
    recomputed by the oracle from the same deterministic byte rule
    ((seed + i*13) % 251 over the capped body) via a range() sum."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def attach(t: pa.Table) -> pa.Table:
        payloads: List[bytes] = []
        for did in t["doc_id"].to_pylist():
            payloads.append(
                make_audio_payload(
                    n_samples=4000 + (did * 37) % 9000,
                    rate=16000 if did % 2 == 0 else 8000,
                    seed=did % 97,
                )
            )
        return pa.table(
            {"doc_id": t["doc_id"], "audio": pa.array(payloads, pa.binary())}
        )

    out = docs.map_batches(attach, batch_format="pyarrow", batch_size=256).map_batches(
        AudioFeatureStub,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=0.5,
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "duration_ms": t["duration_ms"].cast(pa.int64()),
                "rate": t["rate"].cast(pa.int64()),
                "rms_e6": t["rms_e6"].cast(pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def png_roundtrip(sf_dir: str, max_w: int = 32, max_h: int = 32) -> "rd.Dataset":
    """(doc_id, width, height, sum_r, sum_g, sum_b): documents through the
    REAL PNG codec (``sources/png.py`` — stdlib zlib, no PIL), distributed:

      1. deterministic RGB pixels from doc_id — flat value i is
         ``(doc_id*7 + i) % 256`` over a ``(6 + doc_id%11) x (8 +
         doc_id%16) x 3`` image;
      2. encode to GENUINE PNG bytes with the scanline filter CYCLING
         0..4, so the decode exercises every unfilter (None/Sub/Up/
         Average/Paeth), not just the trivial one;
      3. the real ``ResizeImageStub(fake=False)`` PNG path runs as the
         actor-pool normalize step (images here fit max_w/max_h, so it's
         a verified no-op — the resize math itself is pytest-gated);
      4. ``read_png`` decodes and per-channel pixel SUMS come out.

    The DuckDB oracle rebuilds the sums in closed form from the same
    doc_id rule (list_transform over range), so the driver hash proves
    the full encode->filter->inflate->unfilter->decode chain on every
    row.  Scale notes: payloads stay worker-local, stateless encode +
    actor-pool decode, no shuffle."""
    import numpy as np

    from langscrape_ray.sources.png import png_bytes, read_png
    from langscrape_ray.stages.multimodal import ResizeImageStub

    def attach_png(t: pa.Table) -> pa.Table:
        payloads: List[bytes] = []
        for did in t["doc_id"].to_pylist():
            w = 8 + did % 16
            h = 6 + did % 11
            flat = (np.arange(h * w * 3, dtype=np.int64) * 1 + did * 7) % 256
            arr = flat.astype(np.uint8).reshape(h, w, 3)
            payloads.append(png_bytes(arr, filters=[0, 1, 2, 3, 4]))
        return pa.table(
            {"doc_id": t["doc_id"], "image": pa.array(payloads, pa.binary())}
        )

    def decode_sums(t: pa.Table) -> pa.Table:
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for did, payload in zip(
            t["doc_id"].to_pylist(), t["image"].to_pylist()
        ):
            arr = read_png(bytes(payload)).astype(np.int64)
            ids.append(did)
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
            sums = arr.sum(axis=(0, 1))
            sr.append(int(sums[0]))
            sg.append(int(sums[1]))
            sb.append(int(sums[2]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "sum_r": pa.array(sr, pa.int64()),
                "sum_g": pa.array(sg, pa.int64()),
                "sum_b": pa.array(sb, pa.int64()),
            }
        )

    # a single small parquet file plans as ONE block, which would serialize
    # the per-pixel encode/decode work; split the read so the codec chain
    # fans out (at 100 TB the row groups do this naturally)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        override_num_blocks=16,
    )
    return (
        docs.map_batches(attach_png, batch_format="pyarrow", batch_size=256)
        .map_batches(
            ResizeImageStub,
            fn_constructor_kwargs={
                "max_w": max_w, "max_h": max_h, "fake": False,
            },
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
            num_cpus=0.5,
        )
        .map_batches(decode_sums, batch_format="pyarrow", batch_size=256)
    )


class _JpegDecodeSums:
    """Actor-pool stage for jpeg_roundtrip: real header sniff
    (``jpeg_meta``) + full baseline decode -> per-channel pixel sums.
    Codec import and DCT-matrix setup happen once per actor."""

    def __init__(self) -> None:
        import numpy as np

        from langscrape_ray.sources.jpeg import jpeg_meta, read_jpeg

        self._np = np
        self._meta = jpeg_meta
        self._read = read_jpeg

    def __call__(self, t: pa.Table) -> pa.Table:
        np = self._np
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for did, payload in zip(
            t["doc_id"].to_pylist(), t["image"].to_pylist()
        ):
            raw = bytes(payload)
            w, h, nc = self._meta(raw)  # cheap sniff first (no decode)
            arr = self._read(raw).astype(np.int64)
            assert arr.shape == (h, w, nc)
            ids.append(did)
            ws.append(w)
            hs.append(h)
            sums = arr.sum(axis=(0, 1))
            sr.append(int(sums[0]))
            sg.append(int(sums[1]))
            sb.append(int(sums[2]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "sum_r": pa.array(sr, pa.int64()),
                "sum_g": pa.array(sg, pa.int64()),
                "sum_b": pa.array(sb, pa.int64()),
            }
        )


def jpeg_roundtrip(sf_dir: str) -> "rd.Dataset":
    """(doc_id, width, height, sum_r, sum_g, sum_b): documents through
    the REAL baseline JPEG codec (``sources/jpeg.py`` — stdlib + numpy,
    no PIL), distributed — the lossy sibling of ``png_roundtrip``:

      1. deterministic images from doc_id: W = 16*(1 + doc_id%2),
         H = 16, gray-valued RGB (R=G=B) constant per 8x8 block, block
         b (raster order) valued ``(doc_id*13 + b*29) % 256``;
      2. encode to GENUINE 4:2:0 color JPEG bytes — RGB->YCbCr, chroma
         box-downsample, FDCT, quantize (DC step 8 so constant blocks
         survive exactly — see sources/jpeg.py docstring), zigzag,
         differential-DC Huffman, byte stuffing;
      3. an actor-pool stage header-sniffs (``jpeg_meta``) then runs
         the full marker walk + Huffman decode + dequant + batch IDCT
         + chroma upsample + YCbCr->RGB.

    The DuckDB oracle rebuilds the per-channel sums in closed form from
    the block rule (64 * block value, summed), so the driver hash proves
    the ENTIRE lossy codec chain is bit-exact on this fixture family —
    every stage of a real JPEG passes through, including the
    interleaved-MCU layout and the differential DC chain across blocks.
    The general lossy path (AC coefficients, arbitrary content, 4:4:4,
    restart markers, odd dims) is error-bound-tested in
    tests/test_jpeg.py.  Scale notes: payloads stay worker-local,
    stateless encode + actor-pool decode, no shuffle."""
    import numpy as np

    from langscrape_ray.sources.jpeg import exact_dc_tables, jpeg_bytes

    qtabs = exact_dc_tables()

    def attach_jpeg(t: pa.Table) -> pa.Table:
        payloads: List[bytes] = []
        for did in t["doc_id"].to_pylist():
            w = 16 * (1 + did % 2)
            bx, by = w // 8, 2
            v = ((did * 13 + np.arange(bx * by, dtype=np.int64) * 29) % 256)
            blocks = v.astype(np.uint8).reshape(by, bx)
            gray = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
            rgb = np.stack([gray] * 3, axis=-1)
            payloads.append(jpeg_bytes(rgb, subsample="420", qtables=qtabs))
        return pa.table(
            {"doc_id": t["doc_id"], "image": pa.array(payloads, pa.binary())}
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        override_num_blocks=16,  # fan out the codec chain (see png_roundtrip)
    )
    return docs.map_batches(
        attach_jpeg, batch_format="pyarrow", batch_size=256
    ).map_batches(
        _JpegDecodeSums,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=0.5,
    )


def avi_frames(sf_dir: str, stride: int = 2) -> "rd.Dataset":
    """(doc_id, frame_idx, ts_ms, width, height, sum_rgb): documents
    through the REAL video container chain, distributed — deterministic
    RGB frames from doc_id -> genuine uncompressed RIFF/AVI bytes
    (``sources/avi.py``) -> the real ``SampleVideoFrames(fake=False)``
    stdlib demux (every ``stride``-th frame re-encoded as a REAL PNG) ->
    the real PNG decode for per-frame pixel sums.

    Frame rule (SQL-mirrorable): n_frames = 4 + doc_id%5, w = 4 +
    doc_id%5, h = 3 + doc_id%3, fps = 10, flat pixel i of frame fi is
    ``(doc_id*11 + fi*7 + i) % 256``.  The closed-form oracle rebuilds
    frame_idx/ts_ms/dims/sums, so the driver hash proves BOTH real
    codecs (AVI demux + PNG encode/decode) end to end on every sampled
    frame.  Scale notes: payloads worker-local, explode layout (one row
    per frame) exactly as a frame-level training pipeline consumes it,
    actor pools for the stateful stages, no shuffle."""
    import numpy as np

    from langscrape_ray.sources.avi import avi_bytes
    from langscrape_ray.sources.png import read_png
    from langscrape_ray.stages.multimodal import SampleVideoFrames

    def attach_avi(t: pa.Table) -> pa.Table:
        payloads: List[bytes] = []
        for did in t["doc_id"].to_pylist():
            n = 4 + did % 5
            w = 4 + did % 5
            h = 3 + did % 3
            per = h * w * 3
            fi = np.arange(n, dtype=np.int64)[:, None]
            i = np.arange(per, dtype=np.int64)[None, :]
            flat = (did * 11 + fi * 7 + i) % 256
            frames = flat.astype(np.uint8).reshape(n, h, w, 3)
            payloads.append(avi_bytes(frames, fps=10))
        return pa.table(
            {"doc_id": t["doc_id"], "video": pa.array(payloads, pa.binary())}
        )

    def frame_sums(t: pa.Table) -> pa.Table:
        arrs = [read_png(bytes(p)) for p in t["image"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "frame_idx": t["frame_idx"].cast(pa.int64()),
                "ts_ms": t["ts_ms"].cast(pa.int64()),
                "width": pa.array([a.shape[1] for a in arrs], pa.int64()),
                "height": pa.array([a.shape[0] for a in arrs], pa.int64()),
                "sum_rgb": pa.array(
                    [int(a.astype(np.int64).sum()) for a in arrs], pa.int64()
                ),
            }
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        override_num_blocks=16,  # fan out the codec chain (see png_roundtrip)
    )
    return (
        docs.map_batches(attach_avi, batch_format="pyarrow", batch_size=256)
        .map_batches(
            SampleVideoFrames,
            fn_constructor_kwargs={"stride": stride, "fake": False},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=(1, 8),
            num_cpus=0.5,
        )
        .map_batches(frame_sums, batch_format="pyarrow", batch_size=512)
    )
