"""WARC source/sink for the Common-Crawl-style pages table.

The engine's input contract is a Parquet table of
(url, warc_ts, html, text, lang) — the Parquet rendering of what Common
Crawl ships as WARC files.  This module closes the format loop with a
stdlib WARC/1.0 codec so existing WARC corpora can be ingested and crawl
output can be exported in the archive-native format:

- ``write_warc(table, path, per_record_gzip=True)`` — one ``response``
  record per page.  ``per_record_gzip`` emits the Common-Crawl layout:
  each record its own gzip member, members concatenated (standard
  multi-member gzip, so the file is also valid as a whole-file stream).
- ``read_warc(path)`` — parse records back to (url, warc_ts, html);
  non-response records are skipped, malformed framing raises loudly.
- ``read_warc_ds(paths)`` — Ray ingest: ONE task per WARC file.  Common
  Crawl publishes ~1 GB segment files by the tens of thousands, so the
  file is the natural parallel unit (the same per-archive rule as
  sources/archive.py); record-level splitting of a gzip stream is not
  possible without an external index.
- ``write_warc_ds(ds, out_dir)`` — partitioned resumable Ray export:
  one content-addressed segment file per block, skip-if-exists resume,
  atomic rename; per-part manifest back to the caller.

Framing (ISO 28500): ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` +
Content-Length payload bytes + ``\\r\\n\\r\\n``.  The writer stores the raw
HTML as the record block (Content-Type: text/html) rather than wrapping
an HTTP envelope — the reader states which it expects; round-trip tests
pin both directions.

Reference analog: none (the reference fetches live pages one at a time);
this is input-format surface for the 100 TB corpus path.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import List, Optional, Tuple

import pyarrow as pa
import ray.data as rd


class WarcError(ValueError):
    pass


def _warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> int:
    dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _record_bytes(url: str, ts_us: int, html: bytes, seq: int) -> bytes:
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + _warc_date(ts_us).encode("ascii"),
        b"WARC-Record-ID: <urn:langscrape-ray:record:%d>" % seq,
        b"Content-Type: text/html",
        b"Content-Length: %d" % len(html),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + html + b"\r\n\r\n"


def warc_bytes(table: pa.Table, per_record_gzip: bool = True) -> bytes:
    """Serialize a pages table (url, warc_ts, html at minimum) to WARC
    bytes.  ``per_record_gzip=True`` is the Common-Crawl layout (one gzip
    member per record); False is plain WARC.  Deterministic (gzip mtime
    pinned to 0)."""
    urls = table["url"].to_pylist()
    tss = table["warc_ts"].cast(pa.timestamp("us")).to_pylist()
    htmls = table["html"].to_pylist()
    out = io.BytesIO()
    for i, (u, ts, h) in enumerate(zip(urls, tss, htmls)):
        ts_us = int(ts.timestamp() * 1_000_000) if ts is not None else 0
        rec = _record_bytes(u, ts_us, h or b"", i)
        if per_record_gzip:
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(rec)
        else:
            out.write(rec)
    return out.getvalue()


def write_warc(table: pa.Table, path: str, per_record_gzip: bool = True) -> str:
    """``warc_bytes`` to a file path."""
    with open(path, "wb") as f:
        f.write(warc_bytes(table, per_record_gzip))
    return path


def _split_records(data: bytes) -> List[bytes]:
    """Split a plain WARC stream into framed records (loud on bad
    framing)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos: pos + 5] != b"WARC/":
            raise WarcError(f"bad record start at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError("unterminated WARC header")
        header = data[pos: hdr_end]
        clen = None
        for line in header.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                clen = int(v.strip())
        if clen is None:
            raise WarcError("record missing Content-Length")
        body_start = hdr_end + 4
        rec_end = body_start + clen
        if data[rec_end: rec_end + 4] != b"\r\n\r\n":
            raise WarcError("record not terminated by CRLFCRLF")
        out.append(data[pos: rec_end + 4])
        pos = rec_end + 4
    return out


def _parse_record(rec: bytes) -> Optional[Tuple[str, int, bytes]]:
    """(url, ts_us, html) for a response record; None for other types."""
    hdr_end = rec.find(b"\r\n\r\n")
    header = rec[:hdr_end].decode("utf-8", errors="replace")
    fields = {}
    for line in header.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        fields[k.strip().lower()] = v.strip()
    if fields.get("warc-type") != "response":
        return None
    url = fields.get("warc-target-uri")
    if url is None:
        raise WarcError("response record missing WARC-Target-URI")
    ts_us = _parse_warc_date(fields["warc-date"]) if "warc-date" in fields else 0
    clen = int(fields["content-length"])
    body = rec[hdr_end + 4: hdr_end + 4 + clen]
    return url, ts_us, body


def read_warc_bytes(raw: bytes) -> pa.Table:
    """Parse WARC bytes (plain or member-gzipped) into
    (url, warc_ts, html)."""
    if raw[:2] == b"\x1f\x8b":
        # multi-member gzip: gzip.decompress iterates members transparently
        raw = gzip.decompress(raw)
    urls, tss, htmls = [], [], []
    for rec in _split_records(raw):
        parsed = _parse_record(rec)
        if parsed is None:
            continue
        url, ts_us, html = parsed
        urls.append(url)
        tss.append(ts_us)
        htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc(path: str) -> pa.Table:
    """``read_warc_bytes`` from a file path."""
    with open(path, "rb") as f:
        raw = f.read()
    return read_warc_bytes(raw)


def read_warc_ds(paths: List[str]) -> rd.Dataset:
    """Ray ingest of WARC files — one worker task per file (see module
    docstring for why the file is the parallel unit)."""

    def load(batch: pa.Table) -> pa.Table:
        tables = [read_warc(p) for p in batch["item"].to_pylist()]
        return pa.concat_tables(tables)

    return rd.from_items(paths).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


def write_warc_ds(ds: rd.Dataset, out_dir: str) -> "List[dict]":
    """Partitioned, RESUMABLE WARC sink: each block of the pages dataset
    becomes one content-addressed ``part-<md516>.warc.gz`` segment file
    (Common-Crawl layout) under ``out_dir``.

    Content addressing (md5 of the record bytes) gives the resume
    property without coordination: a re-run over the same input produces
    the same names, and a part whose file already exists is skipped —
    the same never-one-giant-file / skip-finished-partitions contract as
    ``sinks.resumable_write``, with the name derived from the DATA so no
    sentinel is needed (a gzip member set is rewritten atomically via
    os.replace).  Workers write directly to shared storage; only the
    per-part manifest rows (path, n_records, n_bytes, skipped) flow back.
    """
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                    "skipped": pa.array([], pa.bool_()),
                }
            )
        data = warc_bytes(t)
        name = f"part-{hashlib.md5(data).hexdigest()[:16]}.warc.gz"
        path = os.path.join(out_dir, name)
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic: no partial part is ever seen
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([t.num_rows], pa.int64()),
                "n_bytes": pa.array([len(data)], pa.int64()),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )

    return (
        ds.map_batches(write_part, batch_format="pyarrow")
        .to_pandas()
        .to_dict("records")
    )
