"""Seed/frontier readers (SURVEY.md §2.1 S1/S2).

The reference reads its frontier from xlsx/csv files
(/root/reference/scripts/run.py:53-56 pd.read_excel of (ID, url);
/root/reference/tests/test_pdf_graph.py:51-58 pd.read_csv + .pdf filter).
Here seeds are Parquet-first with a CSV fallback; both normalize to the
canonical seed schema (url: string, seed_order: int64, priority: int32) —
seed_order is the file order, the reference's crawl-order contract.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _normalize(ds: rd.Dataset, url_col: str, priority_col: Optional[str]) -> pa.Table:
    tbl = pa.concat_tables(
        [t for t in (ray_get_tables(ds)) if t.num_rows], promote_options="default"
    )
    urls = pc.cast(tbl[url_col], pa.string())
    n = len(urls)
    prio = (
        pc.cast(tbl[priority_col], pa.int32())
        if priority_col and priority_col in tbl.column_names
        else pa.array([0] * n, pa.int32())
    )
    return pa.table(
        {
            "url": urls,
            "seed_order": pa.array(range(n), pa.int64()),
            "priority": prio,
        }
    )


def ray_get_tables(ds: rd.Dataset):
    import ray

    return [ray.get(ref) for ref in ds.to_arrow_refs()]


def read_seeds_parquet(
    path: str, url_col: str = "url", priority_col: Optional[str] = "priority"
) -> pa.Table:
    return _normalize(rd.read_parquet(path), url_col, priority_col)


def read_seeds_csv(
    path: str,
    url_col: str = "url",
    priority_col: Optional[str] = None,
    pdf_only: bool = False,
) -> pa.Table:
    """CSV seed reader; ``pdf_only`` reproduces the reference's .pdf suffix
    filter (test_pdf_graph.py:51-58)."""
    tbl = _normalize(rd.read_csv(path), url_col, priority_col)
    if pdf_only:
        mask = pc.match_substring_regex(
            pc.utf8_lower(tbl["url"]), r"\.pdf$"
        )
        tbl = tbl.filter(mask)
    return tbl
