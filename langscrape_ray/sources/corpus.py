"""SWDE-style corpus reader (SURVEY.md §2.1 S8/S9, §2.4 J1).

Reads the reference's corpus layout
(/root/reference/feilian/datasets/dataset.py:92-289,
/root/reference/feilian/dataset_tools.py:66-95):

    <root>/sourceCode/sourceCode/<category>/<category>-<site>(<npages>)/<page_id>.htm
    <root>/sourceCode/sourceCode/groundtruth/<category>/<category>-<site>-<attr>.txt

Ground-truth files: two header lines, then tab-separated
``page_id \t n \t value...`` rows; ``<NULL>`` value rows are skipped and
values are normalize_text'd into lists (dataset.py:199-231 semantics).

Ray shape:
- GT parsing runs one task per (category, site): each task reads that
  site's per-attribute files and outer-merges them on page_id IN the task
  (J1) — site-level parallelism, zero shuffle, because one site's GT is
  the natural small unit.
- Page HTML reads are distributed: the driver only walks directory names
  (metadata), the file bytes are read inside map_batches tasks.
- Pages join ground truth with a co-partitioned ``Dataset.join`` on
  (category, site, page_id).

``write_fixture_corpus`` generates a deterministic miniature corpus in
this exact layout for tests (S9's converter analog, inverted).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import ray.data as rd

from langscrape_ray.kernel.textops import normalize_text

_SRC = os.path.join("sourceCode", "sourceCode")


# ---------------------------------------------------------------------------
# discovery (driver-side: names only, no file contents)
# ---------------------------------------------------------------------------

def list_categories(root: str) -> List[str]:
    """Lowercase non-groundtruth dirs are categories (dataset.py:141-150)."""
    base = Path(root) / _SRC
    out = []
    for p in sorted(base.glob("*")):
        name = p.name
        if p.is_dir() and name.islower() and "." not in name and name != "groundtruth":
            out.append(name)
    return out


def list_sites(root: str, category: str) -> List[Tuple[str, str]]:
    """(site, npages) pairs parsed from ``<category>-<site>(<n>)`` dir
    names (dataset.py:184-192)."""
    import re

    base = Path(root) / _SRC / category
    out = []
    for p in sorted(os.listdir(base)):
        tail = p.split("-", 1)[1] if "-" in p else p
        site = re.search(r"\w+", tail)
        pages = re.search(r"\d+", tail)
        if site and pages:
            out.append((site.group(), pages.group()))
    return out


# ---------------------------------------------------------------------------
# ground truth (one task per site; in-task J1 outer merge)
# ---------------------------------------------------------------------------

def parse_gt_text(text: str) -> Dict[str, List[str]]:
    """page_id -> [normalized values] for ONE attribute file's contents
    (dataset.py:194-231: skip 2 header lines, drop <NULL> rows, normalize
    values).  Shared by the directory reader below and the archive ingest
    (sources/archive.py)."""
    rows: Dict[str, List[str]] = {}
    for line in text.splitlines()[2:]:
        line = line.strip()
        if not line:
            continue
        parts = line.split("\t")
        if len(parts) < 3 or parts[2] == "<NULL>":
            continue
        rows[parts[0]] = [normalize_text(v) for v in parts[2:]]
    return rows


def parse_site_ground_truth(root: str, category: str, site: str) -> Dict[str, Dict]:
    """page_id -> {attr: [normalized values]} for one site; missing attrs
    fill as []."""
    gt_dir = Path(root) / _SRC / "groundtruth" / category
    per_attr: Dict[str, Dict[str, List[str]]] = {}
    for fp in sorted(gt_dir.rglob(f"{category}-{site}-*.txt")):
        attr = fp.stem.split("-")[-1]
        with open(fp, "r", encoding="utf-8") as f:
            rows = parse_gt_text(f.read())
        per_attr[attr] = rows
    all_pages = sorted({pid for rows in per_attr.values() for pid in rows})
    return {
        pid: {attr: per_attr[attr].get(pid, []) for attr in sorted(per_attr)}
        for pid in all_pages
    }


def read_ground_truth(root: str) -> rd.Dataset:
    """Dataset of (category, site, page_id, ground_truth JSON) — one parse
    task per (category, site)."""
    sites = [
        {"category": c, "site": s, "npages": n}
        for c in list_categories(root)
        for s, n in list_sites(root, c)
    ]

    def parse(batch: pa.Table) -> pa.Table:
        cats, sts, pids, gts = [], [], [], []
        for cat, site in zip(
            batch["category"].to_pylist(), batch["site"].to_pylist()
        ):
            for pid, gt in parse_site_ground_truth(root, cat, site).items():
                cats.append(cat)
                sts.append(site)
                pids.append(pid)
                gts.append(json.dumps(gt, ensure_ascii=False, sort_keys=True))
        return pa.table(
            {
                "category": pa.array(cats, pa.string()),
                "site": pa.array(sts, pa.string()),
                "page_id": pa.array(pids, pa.string()),
                "ground_truth": pa.array(gts, pa.string()),
            }
        )

    return rd.from_items(sites).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


# ---------------------------------------------------------------------------
# pages (distributed file reads)
# ---------------------------------------------------------------------------

def read_corpus_pages(root: str) -> rd.Dataset:
    """Dataset of (category, site, page_id, html binary).  The driver
    walks names only; file bytes are read inside tasks."""
    items = []
    for cat in list_categories(root):
        for site, npages in list_sites(root, cat):
            site_dir = Path(root) / _SRC / cat / f"{cat}-{site}({npages})"
            for fp in sorted(site_dir.glob("*.htm")):
                items.append(
                    {
                        "category": cat,
                        "site": site,
                        "page_id": fp.stem,
                        "path": str(fp),
                    }
                )

    def load(batch: pa.Table) -> pa.Table:
        htmls = []
        for path in batch["path"].to_pylist():
            with open(path, "rb") as f:
                htmls.append(f.read())
        return pa.table(
            {
                "category": batch["category"],
                "site": batch["site"],
                "page_id": batch["page_id"],
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return rd.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=64
    )


def load_corpus(root: str, num_partitions: Optional[int] = None) -> rd.Dataset:
    """Pages joined with ground truth on (category, site, page_id) — the
    J1 GT merge expressed as a co-partitioned hash join.  Inner join: the
    reference materializes html for exactly the GT-covered pages
    (dataset.py:260-289)."""
    if num_partitions is None:
        from langscrape_ray.pipelines.dedup import _join_parts

        num_partitions = _join_parts(8)
    pages = read_corpus_pages(root)
    gt = read_ground_truth(root)
    return pages.join(
        gt,
        join_type="inner",
        num_partitions=num_partitions,
        on=("category", "site", "page_id"),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )


def with_truth_columns(ds: rd.Dataset, fields: List[str]) -> rd.Dataset:
    """Expand the ground_truth JSON into one ``truth_<field>``
    list<string> column per requested field (rule_eval's input shape)."""

    def expand(batch: pa.Table) -> pa.Table:
        gts = [json.loads(s) for s in batch["ground_truth"].to_pylist()]
        for f in fields:
            batch = batch.append_column(
                f"truth_{f}",
                pa.array([g.get(f, []) for g in gts], pa.list_(pa.string())),
            )
        return batch

    return ds.map_batches(expand, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic fixture corpus (S9 inverse: table -> corpus layout)
# ---------------------------------------------------------------------------

_FIXTURE_ATTRS = {
    "auto": ["model", "price"],
    "book": ["title", "author"],
}


def write_fixture_corpus(
    root: str, n_sites: int = 2, n_pages: int = 6
) -> Dict[str, List[str]]:
    """Write a miniature deterministic SWDE-layout corpus; returns
    {category: [site, ...]}.  Page k of site s plants attribute values
    ``<attr>-<site>-<k>`` at stable xpaths (//h2 for the first attr,
    //span[@class='v2'] for the second)."""
    out: Dict[str, List[str]] = {}
    for cat, attrs in _FIXTURE_ATTRS.items():
        # site names must be digit-free: the (reference-faithful) dir-name
        # parser takes the FIRST digit run as the page count
        sites = [f"{cat}site{chr(97 + i)}" for i in range(n_sites)]
        out[cat] = sites
        for site in sites:
            site_dir = Path(root) / _SRC / cat / f"{cat}-{site}({n_pages})"
            site_dir.mkdir(parents=True, exist_ok=True)
            gt_dir = Path(root) / _SRC / "groundtruth" / cat
            gt_dir.mkdir(parents=True, exist_ok=True)
            gt_lines: Dict[str, List[str]] = {a: [] for a in attrs}
            for k in range(n_pages):
                pid = f"{k:04d}"
                v1 = f"{attrs[0]}-{site}-{k}"
                v2 = f"{attrs[1]}-{site}-{k}"
                html = (
                    "<html><body>"
                    f"<div class='hdr'><h2>{v1}</h2></div>"
                    f"<p>filler {site} {k}</p>"
                    f"<span class='v2'>{v2}</span>"
                    f"<span class='noise'>decoy {k}</span>"
                    "</body></html>"
                )
                (site_dir / f"{pid}.htm").write_text(html, encoding="utf-8")
                # every third page has no value for attr2 (<NULL> row)
                gt_lines[attrs[0]].append(f"{pid}\t1\t{v1}")
                if k % 3 == 2:
                    gt_lines[attrs[1]].append(f"{pid}\t1\t<NULL>")
                else:
                    gt_lines[attrs[1]].append(f"{pid}\t1\t{v2}")
            for attr, lines in gt_lines.items():
                body = [f"{cat}-{site}-{attr}", "header2"] + lines
                (gt_dir / f"{cat}-{site}-{attr}.txt").write_text(
                    "\n".join(body) + "\n", encoding="utf-8"
                )
    return out
