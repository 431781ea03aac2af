"""Baseline JPEG codec (sources/jpeg.py) + jpeg_roundtrip pipeline.

The oracled query certifies only the bit-exact constant-block fixture;
these tests cover the general lossy surface: DCT inverse property, AC
coefficient coding on arbitrary content, 4:4:4 vs 4:2:0, odd dims
(MCU padding + crop), restart markers, grayscale, multi-segment DQT/DHT
parse of foreign-ish layouts, meta sniff, and the Unsupported gates.
"""

import numpy as np
import pytest

from langscrape_ray.sources.jpeg import (
    BadJpeg,
    UnsupportedJpeg,
    exact_dc_tables,
    fdct_blocks,
    idct_blocks,
    jpeg_bytes,
    jpeg_meta,
    quality_tables,
    read_jpeg,
)


def _smooth_rgb(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Chroma-smooth test image (4:2:0 box-averaging stays faithful)."""
    x = np.arange(w)
    y = np.arange(h)
    base = ((x[None, :] * 2 + y[:, None] * 2) // 2 + 30 + seed) % 180 + 20
    return np.stack(
        [base, base // 2 + 40, 200 - base // 2], axis=-1
    ).astype(np.uint8)


def test_dct_inverse_property():
    rng = np.random.RandomState(7)
    blocks = rng.randint(-128, 128, (64, 8, 8)).astype(np.float64)
    back = idct_blocks(fdct_blocks(blocks))
    assert np.abs(back - blocks).max() < 1e-9


def test_dct_matches_direct_definition():
    # F(u,v) = 1/4 C(u)C(v) sum f cos((2x+1)u pi/16) cos((2y+1)v pi/16)
    rng = np.random.RandomState(1)
    f = rng.randint(-128, 128, (8, 8)).astype(np.float64)
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[u, v] = 0.25 * cu * cv * s
    got = fdct_blocks(f[None])[0]
    assert np.abs(got - ref).max() < 1e-9


def test_exact_constant_block_color_roundtrip():
    # the jpeg_roundtrip oracle family, plus taller variants (mcuy > 1)
    for did in (0, 1, 5, 17, 123, 999):
        w = 16 * (1 + did % 3)
        h = 16 * (1 + did % 2)
        bx, by = w // 8, h // 8
        v = ((did * 13 + np.arange(bx * by) * 29) % 256).astype(np.uint8)
        gray = np.repeat(np.repeat(v.reshape(by, bx), 8, 0), 8, 1)
        rgb = np.stack([gray] * 3, axis=-1)
        enc = jpeg_bytes(rgb, subsample="420", qtables=exact_dc_tables())
        assert jpeg_meta(enc) == (w, h, 3)
        assert np.array_equal(read_jpeg(enc), rgb)


def test_exact_constant_block_grayscale_roundtrip():
    for did in (3, 42, 200):
        v = ((did * 13 + np.arange(6) * 29) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(v.reshape(2, 3), 8, 0), 8, 1)
        enc = jpeg_bytes(img, qtables=exact_dc_tables())
        assert jpeg_meta(enc) == (24, 16, 1)
        dec = read_jpeg(enc)
        assert dec.ndim == 2
        assert np.array_equal(dec, img)


def test_lossy_roundtrip_error_bound_444():
    rgb = _smooth_rgb(48, 64)
    enc = jpeg_bytes(rgb, quality=95, subsample="444")
    dec = read_jpeg(enc)
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 12


def test_lossy_roundtrip_error_bound_420():
    rgb = _smooth_rgb(48, 64, seed=9)
    enc = jpeg_bytes(rgb, quality=95, subsample="420")
    dec = read_jpeg(enc)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 16
    # 4:2:0 must actually be smaller than 4:4:4 on the same content
    assert len(enc) < len(jpeg_bytes(rgb, quality=95, subsample="444"))


def test_ac_coefficients_are_exercised():
    # textured content emits nonzero AC symbols: encoding must shrink
    # vs an upper bound and still decode within a loose bound at q90
    rng = np.random.RandomState(3)
    base = rng.randint(80, 176, (32, 32))
    tex = base + (np.indices((32, 32)).sum(0) % 2) * 8  # checker texture
    img = tex.astype(np.uint8)
    enc = jpeg_bytes(img, quality=90)
    dec = read_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 24


def test_odd_dimensions_pad_and_crop():
    rgb = _smooth_rgb(37, 51)
    for ss in ("444", "420"):
        dec = read_jpeg(jpeg_bytes(rgb, quality=92, subsample=ss))
        assert dec.shape == (37, 51, 3)
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 20


def test_restart_marker_parity():
    rgb = _smooth_rgb(37, 51, seed=4)
    plain = read_jpeg(jpeg_bytes(rgb, quality=90, subsample="420"))
    with_dri = jpeg_bytes(
        rgb, quality=90, subsample="420", restart_interval=2
    )
    assert b"\xff\xdd" in with_dri  # DRI segment present
    assert any(
        bytes([0xFF, 0xD0 + k]) in with_dri for k in range(8)
    )  # RSTn emitted
    assert np.array_equal(read_jpeg(with_dri), plain)


def test_byte_stuffing_roundtrip():
    # hunt a fixture whose entropy stream contains stuffed 0xFF00 —
    # decode must unstuff it transparently
    found = False
    for seed in range(40):
        rgb = _smooth_rgb(24, 24, seed=seed * 31)
        enc = jpeg_bytes(rgb, quality=97, subsample="444")
        scan = enc[enc.index(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            found = True
            dec = read_jpeg(enc)
            assert dec.shape == rgb.shape
    assert found, "no fixture produced a stuffed byte — widen the search"


def test_quality_tables_scale():
    l50, c50 = quality_tables(50)
    l90, _ = quality_tables(90)
    l10, _ = quality_tables(10)
    assert (l90 <= l50).all() and (l10 >= l50).all()
    assert l50.min() >= 1 and c50.max() <= 255
    edc_l, edc_c = exact_dc_tables()
    assert edc_l[0] == 8 and edc_c[0] == 8


def test_meta_sniff_no_decode():
    rgb = _smooth_rgb(20, 30)
    enc = jpeg_bytes(rgb, quality=80)
    assert jpeg_meta(enc) == (30, 20, 3)
    # sniff succeeds even when the entropy data is truncated
    assert jpeg_meta(enc[: enc.index(b"\xff\xda") + 20]) == (30, 20, 3)


def test_unsupported_gates():
    rgb = _smooth_rgb(16, 16)
    enc = bytearray(jpeg_bytes(rgb, quality=80))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(UnsupportedJpeg, match="progressive"):
        jpeg_meta(bytes(enc))
    with pytest.raises(UnsupportedJpeg, match="progressive"):
        read_jpeg(bytes(enc))
    with pytest.raises(BadJpeg):
        jpeg_meta(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(BadJpeg):
        read_jpeg(jpeg_bytes(rgb)[:40])
    with pytest.raises(UnsupportedJpeg):
        jpeg_bytes(np.zeros((4, 4, 2), np.uint8))


def test_decode_image_meta_jpeg_tier():
    from langscrape_ray.stages.multimodal import DecodeImageMeta
    import pyarrow as pa

    rgb = _smooth_rgb(20, 28)
    enc = jpeg_bytes(rgb, quality=85)
    stage = DecodeImageMeta(fake=False)
    out = stage(
        pa.table({"doc_id": [1], "image": pa.array([enc], pa.binary())})
    )
    assert out["format"][0].as_py() == "jpeg"
    assert out["width"][0].as_py() == 28
    assert out["height"][0].as_py() == 20
    assert out["decode_ok"][0].as_py()


def test_jpeg_roundtrip_query_matches_local_recompute(ray_session):
    from langscrape_ray.pipelines.media import jpeg_roundtrip

    sf_dir = "/root/testdata/sf0.001"
    got = jpeg_roundtrip(sf_dir).to_pandas().sort_values("doc_id")
    import pandas as pd
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).to_pandas()
    rows = []
    for did in docs["doc_id"]:
        did = int(did)
        w = 16 * (1 + did % 2)
        nb = (w // 8) * 2
        s = int(
            sum(64 * ((did * 13 + b * 29) % 256) for b in range(nb))
        )
        rows.append((did, w, 16, s, s, s))
    exp = pd.DataFrame(
        rows,
        columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
    ).sort_values("doc_id")
    assert len(got) == len(exp)
    for col in exp.columns:
        assert (
            got[col].to_numpy() == exp[col].to_numpy()
        ).all(), col
