"""WARC source/sink: round-trips against the fixture pages table, both
plain and Common-Crawl member-gzip layouts, loud on malformed framing."""

import gzip

import pyarrow as pa
import pytest

from langscrape_ray.sources.warc import (
    WarcError,
    read_warc,
    read_warc_ds,
    write_warc,
)


def _pages():
    from langscrape_ray.sources.fixtures_gen import FixtureConfig, build_pages_table

    return build_pages_table(FixtureConfig(n_pages=60, n_hosts=5, n_seeds=10))


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(tmp_path, gz):
    pages = _pages()
    path = str(tmp_path / ("p.warc.gz" if gz else "p.warc"))
    write_warc(pages, path, per_record_gzip=gz)
    back = read_warc(path)
    assert back["url"].to_pylist() == pages["url"].to_pylist()
    assert back["html"].to_pylist() == pages["html"].to_pylist()
    # WARC-Date is second-granular; the fixture warc_ts is too
    orig_ts = pages["warc_ts"].cast(pa.timestamp("us")).to_pylist()
    got_ts = back["warc_ts"].to_pylist()
    for a, b in zip(got_ts, orig_ts):
        assert abs((a - b).total_seconds()) < 1.0


def test_warc_ray_ingest_parity(ray_session, tmp_path):
    pages = _pages()
    # split across two files: one gz, one plain
    t1, t2 = pages.slice(0, 30), pages.slice(30)
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc")
    write_warc(t1, p1, per_record_gzip=True)
    write_warc(t2, p2, per_record_gzip=False)
    df = read_warc_ds([p1, p2]).to_pandas().sort_values("url").reset_index(drop=True)
    want = (
        pa.table(
            {
                "url": pages["url"],
                "html": pages["html"],
            }
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(df["url"]) == list(want["url"])
    assert list(df["html"]) == list(want["html"])


def test_warc_bad_framing_is_loud(tmp_path):
    p = str(tmp_path / "bad.warc")
    with open(p, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nmissing length")
    with pytest.raises(WarcError):
        read_warc(p)
    with open(p, "wb") as f:
        f.write(b"NOTWARC")
    with pytest.raises(WarcError):
        read_warc(p)


def test_warc_skips_non_response_records(tmp_path):
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/a\r\n"
        b"WARC-Date: 2020-01-02T03:04:05Z\r\n"
        b"Content-Length: 3\r\n\r\n"
        b"abc\r\n\r\n"
    )
    p = str(tmp_path / "mixed.warc")
    with open(p, "wb") as f:
        f.write(rec)
    t = read_warc(p)
    assert t.num_rows == 1
    assert t["url"][0].as_py() == "http://x.example/a"
    assert t["html"][0].as_py() == b"abc"


def test_write_warc_ds_resumable_sink(ray_session, tmp_path):
    """Partitioned export: multiple segment files, lossless re-read via
    read_warc_ds, and a re-run skips every already-written part."""
    import os

    import ray.data as rd

    from langscrape_ray.sources.warc import write_warc_ds

    pages = _pages().select(["url", "warc_ts", "html"])
    ds = rd.from_arrow(pages).repartition(4)
    manifest = write_warc_ds(ds, str(tmp_path / "out"))
    assert len(manifest) == 4
    assert not any(m["skipped"] for m in manifest)
    assert sum(m["n_records"] for m in manifest) == pages.num_rows
    for m in manifest:
        assert os.path.exists(m["path"])
        assert m["path"].endswith(".warc.gz")

    # lossless: read every part back and compare the full (url -> html) map
    back = read_warc_ds([m["path"] for m in manifest]).to_pandas()
    assert len(back) == pages.num_rows
    orig = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
    got = dict(zip(back["url"], back["html"]))
    assert got == {u: (h or b"") for u, h in orig.items()}

    # resume: identical input -> identical content-addressed names, all
    # parts skipped, nothing rewritten
    mtimes = {m["path"]: os.path.getmtime(m["path"]) for m in manifest}
    manifest2 = write_warc_ds(rd.from_arrow(pages).repartition(4),
                              str(tmp_path / "out"))
    assert sorted(m["path"] for m in manifest2) == sorted(mtimes)
    assert all(m["skipped"] for m in manifest2)
    assert all(os.path.getmtime(p) == t for p, t in mtimes.items())


def test_warc_roundtrip_adversarial_payloads():
    """Framing relies on Content-Length, so payloads that CONTAIN the
    record markers (CRLFCRLF, 'WARC/1.0', gzip magic) must survive
    byte-identically in both layouts."""
    from langscrape_ray.sources.warc import read_warc_bytes, warc_bytes

    payloads = [
        b"",
        b"\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake",
        b"abc\r\n\r\nWARC/1.0\r\n\r\n" * 3,
        b"\x1f\x8b\x08\x00fake-gzip-magic",
        bytes(range(256)),
        b"x" * 70_000,
    ]
    t = pa.table(
        {
            "url": pa.array(
                [f"https://adv.example/p/{i}" for i in range(len(payloads))]
            ),
            "warc_ts": pa.array(
                [1_700_000_000_000_000 + i * 1_000_000
                 for i in range(len(payloads))],
                pa.timestamp("us"),
            ),
            "html": pa.array(payloads, pa.binary()),
        }
    )
    for gz in (True, False):
        back = read_warc_bytes(warc_bytes(t, per_record_gzip=gz))
        assert back["url"].to_pylist() == t["url"].to_pylist()
        assert back["html"].to_pylist() == payloads
        assert back["warc_ts"].to_pylist() == t["warc_ts"].to_pylist()


def test_warc_roundtrip_fuzz():
    """Property fuzz: random byte payloads (including marker-laden ones)
    round-trip byte-identically through the member-gzip layout."""
    import random

    from langscrape_ray.sources.warc import read_warc_bytes, warc_bytes

    rng = random.Random(0xFEED)
    markers = [b"\r\n", b"\r\n\r\n", b"WARC/1.0", b"Content-Length: 0"]
    for trial in range(25):
        n = rng.randint(1, 8)
        payloads = []
        for _ in range(n):
            parts = [
                bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 200)))
            ]
            for _ in range(rng.randint(0, 3)):
                parts.append(rng.choice(markers))
                parts.append(
                    bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 50)))
                )
            payloads.append(b"".join(parts))
        t = pa.table(
            {
                "url": pa.array([f"https://f.example/{trial}/{i}"
                                 for i in range(n)]),
                "warc_ts": pa.array(
                    [1_600_000_000_000_000 + i for i in range(n)],
                    pa.timestamp("us"),
                ),
                "html": pa.array(payloads, pa.binary()),
            }
        )
        back = read_warc_bytes(warc_bytes(t))
        assert back["html"].to_pylist() == payloads, f"trial {trial}"
