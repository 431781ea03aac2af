"""Archive ingest (S9/S10): the stdlib 7z codec and the three-format
corpus ingest, parity-checked against the directory-based corpus reader."""

import os

import pandas as pd
import pytest

from langscrape_ray.sources.sevenzip import (
    Corrupt7z,
    SevenZipReader,
    Unsupported7z,
    read_number,
    write_7z,
    write_number,
)

FILES = {
    "a.txt": b"hello seven zip",
    "dir/b.bin": bytes(range(256)) * 40,
    "dir/deep/c.htm": "<html>é中文</html>".encode("utf-8"),
    "empty.txt": b"",
    "uniéode.txt": b"unicode name",
}


@pytest.mark.parametrize("codec", ["copy", "lzma2"])
def test_7z_roundtrip(codec):
    blob = write_7z(FILES, codec=codec)
    rd_ = SevenZipReader(blob)
    out = rd_.read_all()
    assert out == FILES
    assert sorted(rd_.namelist()) == sorted(FILES)


def test_7z_number_encoding_roundtrip():
    vals = [0, 1, 0x7F, 0x80, 0xFF, 0x3FFF, 0x4000, 0xFFFF, 1 << 20,
            (1 << 28) - 1, 1 << 28, 1 << 40, (1 << 56) - 1, 1 << 56,
            (1 << 63) - 1]
    for v in vals:
        enc = write_number(v)
        got, pos = read_number(enc + b"\xaa\xbb", 0)
        assert got == v, v
        assert pos == len(enc)


def test_7z_crc_detects_corruption():
    blob = bytearray(write_7z({"x.txt": b"payload-bytes-here"}, codec="copy"))
    # flip a payload byte (between signature header and next header)
    blob[40] ^= 0xFF
    with pytest.raises(Corrupt7z):
        SevenZipReader(bytes(blob)).read_all()


def test_7z_rejects_bad_magic():
    with pytest.raises(Corrupt7z):
        SevenZipReader(b"PK\x03\x04" + b"\x00" * 64)


def test_7z_empty_archive():
    blob = write_7z({})
    assert SevenZipReader(blob).read_all() == {}


@pytest.mark.parametrize("fmt", ["7z", "zip", "tar.gz"])
def test_corpus_archive_parity(ray_session, tmp_path, fmt):
    """pack fixture corpus -> archive -> (a) extract+directory-read and
    (b) direct Ray ingest both equal the original directory read."""
    from langscrape_ray.sources.archive import (
        extract_archive,
        load_corpus_archives,
        pack_corpus_archive,
    )
    from langscrape_ray.sources.corpus import load_corpus, write_fixture_corpus

    root = tmp_path / "corpus"
    write_fixture_corpus(str(root))
    want = (
        load_corpus(str(root))
        .to_pandas()
        .sort_values(["category", "site", "page_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 0

    arc = str(tmp_path / f"corpus.{fmt}")
    pack_corpus_archive(str(root), arc, fmt=fmt)

    # (a) extract + reuse the directory reader
    out_dir = str(tmp_path / f"x_{fmt.replace('.', '_')}")
    os.makedirs(out_dir)
    extract_archive(arc, out_dir)
    via_extract = (
        load_corpus(out_dir)
        .to_pandas()
        .sort_values(["category", "site", "page_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(want, via_extract)

    # (b) direct in-task ingest (no extraction to disk)
    direct = (
        load_corpus_archives([arc])
        .to_pandas()
        .sort_values(["category", "site", "page_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        want[sorted(want.columns)], direct[sorted(direct.columns)]
    )


def test_extract_archive_blocks_path_escape(tmp_path):
    from langscrape_ray.sources.archive import extract_archive

    evil = write_7z({"../evil.txt": b"nope"})
    arc = tmp_path / "evil.7z"
    arc.write_bytes(evil)
    out = tmp_path / "out"
    out.mkdir()
    with pytest.raises(ValueError):
        extract_archive(str(arc), str(out))


def test_7z_unsupported_codec_is_loud():
    blob = bytearray(write_7z({"a.txt": b"x" * 50}, codec="copy"))
    # the Copy codec id byte (0x00) lives in the header; rewrite it to a
    # bogus codec id and expect Unsupported7z, not silent garbage
    hdr_off = 32 + int.from_bytes(blob[12:20], "little")
    hdr = bytearray(blob[hdr_off:])
    # find coder flags byte (0x01 = id size 1) followed by codec 0x00:
    # locate the kFolder..coder section: flags 0x01, id 0x00
    # layout: [0x0B kFolder][0x01 nFolders][0x00 external][0x01 nCoders]
    #         [0x01 flags][0x00 codec-id]
    for i in range(4, len(hdr) - 1):
        if (hdr[i] == 0x01 and hdr[i + 1] == 0x00 and hdr[i - 4] == 0x0B
                and hdr[i - 2] == 0x00):
            hdr[i + 1] = 0x7E  # bogus codec id
            break
    else:
        pytest.skip("coder byte not located")
    import zlib

    new_hdr = bytes(hdr)
    blob[hdr_off:] = new_hdr
    blob[28:32] = zlib.crc32(new_hdr).to_bytes(4, "little")
    start = blob[12:32]
    blob[8:12] = zlib.crc32(bytes(start)).to_bytes(4, "little")
    with pytest.raises(Unsupported7z):
        SevenZipReader(bytes(blob)).read_all()
