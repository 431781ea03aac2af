"""Tests: the real stdlib PNG codec (sources/png.py) and its stage wiring."""

import numpy as np
import pyarrow as pa
import pytest

from langscrape_ray.sources.png import (
    BadPng,
    UnsupportedPng,
    png_bytes,
    png_meta,
    read_png,
    resize_nearest,
)


@pytest.mark.parametrize("shape", [(16, 24, 3), (5, 3, 4), (9, 7), (1, 1, 3)])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_all_filters(shape, filters):
    rng = np.random.default_rng(sum(shape) * 10 + filters[0])
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    data = png_bytes(a, filters)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = read_png(data)
    ref = a[:, :, None] if a.ndim == 2 else a
    assert np.array_equal(ref, back)
    w, h, ch = png_meta(data)
    assert (h, w, ch) == ref.shape


def test_png_meta_rejects_bad_and_unsupported():
    with pytest.raises(BadPng):
        png_meta(b"not a png at all----------------")
    a = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(png_bytes(a))
    data[24] = 16  # bit depth 16 -> unsupported subset
    with pytest.raises(UnsupportedPng):
        png_meta(bytes(data))


def test_png_crc_is_verified():
    data = bytearray(png_bytes(np.zeros((4, 4, 3), np.uint8)))
    # flip one byte inside IDAT payload (after the 8-byte sig + 25-byte IHDR
    # chunk + 8-byte IDAT header)
    data[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(BadPng):
        read_png(bytes(data))


def test_resize_nearest_semantics():
    a = np.arange(100 * 60 * 3, dtype=np.int64).astype(np.uint8).reshape(
        100, 60, 3
    )
    assert resize_nearest(a, 60, 100) is a  # fits: no-op, zero-copy
    r = resize_nearest(a, 30, 30)
    assert r.shape == (30, 18, 3)
    # nearest-neighbor: every output pixel is an exact input pixel
    ys = (np.arange(30) * 100 // 30)
    xs = (np.arange(18) * 60 // 18)
    assert np.array_equal(r, a[ys][:, xs])


def test_resize_stage_real_png_path():
    """ResizeImageStub(fake=False) on an oversized REAL PNG: output is a
    valid PNG whose pixels equal resize_nearest of the original."""
    from langscrape_ray.stages.multimodal import DecodeImageMeta, ResizeImageStub

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (40, 70, 3), dtype=np.uint8)
    batch = pa.table(
        {
            "img_id": pa.array([1], pa.int64()),
            "image": pa.array([png_bytes(a, [0, 4])], pa.binary()),
        }
    )
    out = ResizeImageStub(max_w=32, max_h=32, fake=False)(batch)
    resized = read_png(out["image"].to_pylist()[0])
    assert np.array_equal(resized, resize_nearest(a, 32, 32))
    meta = DecodeImageMeta(fake=False)(out)
    assert meta["decode_ok"].to_pylist() == [True]
    assert meta["format"].to_pylist() == ["png"]
    assert meta["width"].to_pylist()[0] == resized.shape[1]
    assert meta["height"].to_pylist()[0] == resized.shape[0]


# ---------------------------------------------------------------------------
# AVI container codec (sources/avi.py) — the video sibling
# ---------------------------------------------------------------------------


def test_avi_roundtrip_shapes():
    from langscrape_ray.sources.avi import avi_bytes, avi_meta, read_avi

    rng = np.random.default_rng(11)
    for shape in [(4, 6, 8, 3), (1, 1, 1, 3), (3, 5, 7, 3)]:  # odd widths pad
        f = rng.integers(0, 256, shape, dtype=np.uint8)
        data = avi_bytes(f, fps=10)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        back, fps = read_avi(data)
        assert fps == 10
        assert np.array_equal(f, back)
        n, w, h, _ = avi_meta(data)
        assert (n, h, w) == shape[:3]


def test_avi_gates():
    from langscrape_ray.sources.avi import (
        BadAvi,
        UnsupportedAvi,
        avi_bytes,
        avi_meta,
    )

    with pytest.raises(BadAvi):
        avi_meta(b"not an avi" + b"\0" * 40)
    data = bytearray(avi_bytes(np.zeros((2, 4, 4, 3), np.uint8)))
    i = data.index(b"DIB ")
    data[i : i + 4] = b"MJPG"  # compressed fourcc -> pyav tier
    with pytest.raises(UnsupportedAvi):
        avi_meta(bytes(data))


def test_avi_00dc_chunk_rejected():
    """A '00dc' (compressed-stream) frame chunk must raise UnsupportedAvi
    even when its size coincides with the raw DIB size — never silently
    decode compressed bytes as pixels."""
    from langscrape_ray.sources.avi import UnsupportedAvi, avi_bytes, read_avi

    data = bytearray(avi_bytes(np.zeros((2, 4, 4, 3), np.uint8)))
    i = data.index(b"00db")  # first frame chunk
    data[i : i + 4] = b"00dc"
    with pytest.raises(UnsupportedAvi):
        read_avi(bytes(data))


def test_sample_video_frames_real_avi_path():
    """SampleVideoFrames(fake=False) on a REAL AVI: stdlib demux, sampled
    frames come back as REAL PNGs whose pixels equal the originals."""
    from langscrape_ray.sources.avi import avi_bytes
    from langscrape_ray.sources.png import read_png
    from langscrape_ray.stages.multimodal import SampleVideoFrames

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (6, 4, 5, 3), dtype=np.uint8)
    batch = pa.table(
        {
            "doc_id": pa.array([9], pa.int64()),
            "video": pa.array([avi_bytes(frames, fps=5)], pa.binary()),
        }
    )
    out = SampleVideoFrames(stride=2, fake=False)(batch)
    assert out["frame_idx"].to_pylist() == [0, 2, 4]
    assert out["ts_ms"].to_pylist() == [0, 400, 800]
    for fi, blob in zip(out["frame_idx"].to_pylist(), out["image"].to_pylist()):
        assert np.array_equal(read_png(bytes(blob)), frames[fi])
    # non-AVI payload without pyav raises at the integration point
    other = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "video": pa.array([b"\x00\x00\x00\x18ftypmp42 fake"], pa.binary()),
        }
    )
    try:
        import av  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            SampleVideoFrames(stride=2, fake=False)(other)


def test_image_features_from_real_pixels():
    """ImageFeatureStub on genuine PNG bytes featurizes the DECODED pixels
    (channel means/stds, dims, gray histogram), not the byte head."""
    from langscrape_ray.stages.multimodal import ImageFeatureStub

    solid = np.zeros((10, 20, 3), np.uint8)
    solid[:, :, 0] = 200  # pure red 200
    batch = pa.table(
        {
            "img_id": pa.array([0, 1], pa.int64()),
            "image": pa.array(
                [png_bytes(solid), b"not-an-image-head" + b"\0" * 50],
                pa.binary(),
            ),
        }
    )
    out = ImageFeatureStub(dim=16)(batch)
    emb = np.array(out["embedding"].to_pylist(), dtype=np.float32)
    assert emb.shape == (2, 16)
    f = emb[0]
    assert abs(f[0] - 200 / 255.0) < 1e-6  # mean_r
    assert abs(f[1]) < 1e-6 and abs(f[2]) < 1e-6  # mean_g/b zero
    assert abs(f[3]) < 1e-6  # std_r zero (solid)
    assert abs(f[6] - 20 / 4096.0) < 1e-6 and abs(f[7] - 10 / 4096.0) < 1e-6
    # gray = 200/3 ≈ 66.7 -> histogram bin 2 of 8 gets everything
    assert abs(f[8 + 2] - 1.0) < 1e-6
    # the non-PNG row keeps the projection path (non-degenerate values)
    assert np.abs(emb[1]).sum() > 0


def test_codec_corruption_fuzz_never_silent():
    """Deterministic corruption fuzz over both codecs: single-byte flips
    must either decode to SOMETHING typed or raise a typed codec error —
    never hang, crash the interpreter, or return a wrong-shaped array."""
    from langscrape_ray.sources.avi import BadAvi, UnsupportedAvi, avi_bytes, read_avi
    from langscrape_ray.sources.png import BadPng, UnsupportedPng

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    png = bytearray(png_bytes(img, [0, 1, 2, 3, 4]))
    for pos in range(0, len(png), 7):
        mut = bytearray(png)
        mut[pos] ^= 0x5A
        try:
            out = read_png(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (BadPng, UnsupportedPng, Exception) as e:
            # zlib/struct errors are acceptable typed failures; silent
            # wrong SHAPES are not (checked above)
            assert not isinstance(e, (SystemError, MemoryError))

    vid = bytearray(avi_bytes(rng.integers(0, 256, (3, 4, 5, 3), np.uint8)))
    for pos in range(0, len(vid), 11):
        mut = bytearray(vid)
        mut[pos] ^= 0xA5
        try:
            frames, fps = read_avi(bytes(mut))
            assert frames.dtype == np.uint8 and frames.ndim == 4
        except (BadAvi, UnsupportedAvi, Exception) as e:
            assert not isinstance(e, (SystemError, MemoryError))
