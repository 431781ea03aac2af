"""Archive-packed corpus ingest (SURVEY.md §2.1 S9/S10).

The reference downloads SWDE verticals as .7z archives and extracts them
before reading (/root/reference/feilian/dataset_tools.py:35-63).  This
module provides the archive side of that pipeline without external
dependencies:

- ``extract_archive(path, out_dir)`` — the S10 extractor: .zip (stdlib
  zipfile), .tar/.tar.gz (stdlib tarfile), .7z (``sources/sevenzip.py``,
  the spec-subset codec).  Zip-slip guarded.
- ``pack_corpus_archive(root, out, fmt)`` — the inverse (S9 converter
  direction): packs a SWDE-layout tree into any of the three formats
  (used to build fixture archives; the 7z writer emits real archives).
- ``load_corpus_archives(paths)`` — Ray-native ingest that never touches
  the driver with file bytes: ONE task per archive opens it, parses the
  ground-truth files and page HTML in-task, and emits the same joined
  (category, site, page_id, html, ground_truth) rows as
  ``corpus.load_corpus`` does for an extracted tree (parity asserted in
  tests/test_archive.py).

Scale note: archives are sequential containers (a single-folder LZMA2 7z
cannot be split), so the parallel unit is the ARCHIVE — matching SWDE's
one-archive-per-vertical layout.  For 100 TB corpora the right storage
is the extracted parquet, not archives; this path exists for ingest
compatibility, and each archive streams through exactly one worker task.
"""

from __future__ import annotations

import io
import json
import os
import re
import tarfile
import zipfile
from pathlib import Path
from typing import Dict, List

import pyarrow as pa
import ray.data as rd

_SRC = os.path.join("sourceCode", "sourceCode")


def _safe_join(out_dir: str, name: str) -> str:
    dest = os.path.realpath(os.path.join(out_dir, name))
    if not dest.startswith(os.path.realpath(out_dir) + os.sep):
        raise ValueError(f"archive member escapes target dir: {name!r}")
    return dest


def _read_members(path: str) -> Dict[str, bytes]:
    """name -> bytes for every file member, normalized to '/' separators."""
    suffix = Path(path).name.lower()
    out: Dict[str, bytes] = {}
    if suffix.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            for info in zf.infolist():
                if not info.is_dir():
                    out[info.filename] = zf.read(info)
    elif suffix.endswith((".tar", ".tar.gz", ".tgz")):
        with tarfile.open(path) as tf:
            for m in tf.getmembers():
                if m.isfile():
                    f = tf.extractfile(m)
                    out[m.name] = f.read() if f else b""
    elif suffix.endswith(".7z"):
        from langscrape_ray.sources.sevenzip import SevenZipReader

        with open(path, "rb") as f:
            out = {
                name.replace("\\", "/"): data
                for name, data in SevenZipReader(f.read()).read_all().items()
            }
    else:
        raise ValueError(f"unsupported archive format: {path}")
    return out


def extract_archive(path: str, out_dir: str) -> List[str]:
    """Extract any supported archive to ``out_dir`` (files only, paths
    sanitized); returns the extracted member names."""
    members = _read_members(path)
    for name, data in members.items():
        dest = _safe_join(out_dir, name)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as f:
            f.write(data)
    return sorted(members)


def pack_corpus_archive(root: str, out_path: str, fmt: str = "7z") -> str:
    """Pack a directory tree into .zip / .tar.gz / .7z with archive-root-
    relative member names."""
    rootp = Path(root)
    files = {
        str(p.relative_to(rootp)).replace(os.sep, "/"): p.read_bytes()
        for p in sorted(rootp.rglob("*"))
        if p.is_file()
    }
    if fmt == "7z":
        from langscrape_ray.sources.sevenzip import write_7z

        blob = write_7z(files, codec="lzma2")
        with open(out_path, "wb") as f:
            f.write(blob)
    elif fmt == "zip":
        with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for name, data in files.items():
                zf.writestr(name, data)
    elif fmt == "tar.gz":
        with tarfile.open(out_path, "w:gz") as tf:
            for name, data in files.items():
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    else:
        raise ValueError("fmt must be '7z', 'zip' or 'tar.gz'")
    return out_path


# ---------------------------------------------------------------------------
# Ray-native in-task corpus ingest
# ---------------------------------------------------------------------------

_PAGE_RE = re.compile(
    r"sourceCode/sourceCode/(?P<cat>[a-z0-9]+)/"
    r"(?P=cat)-(?P<site>\w+)\((?P<n>\d+)\)/(?P<pid>[^/]+)\.htm$"
)
_GT_RE = re.compile(
    r"sourceCode/sourceCode/groundtruth/(?P<cat>[a-z0-9]+)/"
    r"(?P=cat)-(?P<site>\w+)-(?P<attr>\w+)\.txt$"
)


def _corpus_rows_from_members(members: Dict[str, bytes]) -> pa.Table:
    """Join pages with ground truth entirely in-task; mirrors
    corpus.load_corpus semantics (inner join: GT-covered pages only)."""
    from langscrape_ray.sources.corpus import parse_gt_text

    pages: Dict[tuple, bytes] = {}
    gt_raw: Dict[tuple, Dict[str, Dict[str, List[str]]]] = {}
    for name, data in members.items():
        m = _PAGE_RE.search(name)
        if m:
            pages[(m["cat"], m["site"], m["pid"])] = data
            continue
        g = _GT_RE.search(name)
        if g:
            site_map = gt_raw.setdefault((g["cat"], g["site"]), {})
            site_map[g["attr"]] = parse_gt_text(data.decode("utf-8"))

    cats, sites, pids, htmls, gts = [], [], [], [], []
    for (cat, site), per_attr in sorted(gt_raw.items()):
        all_pids = sorted({p for rows in per_attr.values() for p in rows})
        for pid in all_pids:
            html = pages.get((cat, site, pid))
            if html is None:
                continue  # inner-join semantics
            gt = {
                attr: per_attr[attr].get(pid, [])
                for attr in sorted(per_attr)
            }
            cats.append(cat)
            sites.append(site)
            pids.append(pid)
            htmls.append(html)
            gts.append(json.dumps(gt, ensure_ascii=False, sort_keys=True))
    return pa.table(
        {
            "category": pa.array(cats, pa.string()),
            "site": pa.array(sites, pa.string()),
            "page_id": pa.array(pids, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "ground_truth": pa.array(gts, pa.string()),
        }
    )


def load_corpus_archives(paths: List[str]) -> rd.Dataset:
    """Corpus rows from a list of archives — one worker task per archive
    (the archive is the parallel unit; see module docstring).  Output
    schema and values match ``corpus.load_corpus`` on the extracted
    tree."""

    def load(batch: pa.Table) -> pa.Table:
        tables = [
            _corpus_rows_from_members(_read_members(p))
            for p in batch["item"].to_pylist()
        ]
        return pa.concat_tables(tables)

    return rd.from_items(paths).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
