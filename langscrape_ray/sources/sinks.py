"""Resumable partitioned parquet sink (task brief: "Resumable output").

``resumable_write`` writes one directory per partition-key value with an
atomic ``_COMPLETE`` sentinel (written last, after the data), so a failed
run re-invoked with the same arguments skips every finished partition and
rebuilds only the missing ones — never one giant file, never a partial
directory mistaken for a finished one.  The crawl pipeline has its own
round-structured variant (`state/checkpoint.py`); this is the generic
query-output form.

Scale shape: the partition split is ONE hash shuffle on the key
(`groupby(col).map_groups` writes each group from the worker that owns
it); the driver only checks sentinels.  Workers write directly to shared
storage — nothing flows back through the driver.
"""

from __future__ import annotations

import os
from typing import List

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_SENTINEL = "_COMPLETE"


def _partition_dir(out_dir: str, col: str, value) -> str:
    return os.path.join(out_dir, f"{col}={value}")


def completed_partitions(out_dir: str) -> List[str]:
    if not os.path.isdir(out_dir):
        return []
    return sorted(
        d for d in os.listdir(out_dir)
        if os.path.exists(os.path.join(out_dir, d, _SENTINEL))
    )


def resumable_write(ds: "rd.Dataset", out_dir: str, col: str) -> dict:
    """Write ``ds`` as ``out_dir/<col>=<value>/part.parquet`` per distinct
    key, skipping partitions whose ``_COMPLETE`` sentinel already exists.
    Returns {"written": [...], "skipped": [...]}."""
    os.makedirs(out_dir, exist_ok=True)
    done = set(completed_partitions(out_dir))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        value = g[col].iloc[0]
        part = f"{col}={value}"
        if part in done:
            return pd.DataFrame({"partition": [part], "rows": [0],
                                 "skipped": [True]})
        pdir = _partition_dir(out_dir, col, value)
        tmp = pdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g.sort_values(list(g.columns)), preserve_index=False),
            os.path.join(tmp, "part.parquet"),
        )
        if os.path.isdir(pdir):  # stale partial dir from a crashed run
            import shutil

            shutil.rmtree(pdir)
        os.replace(tmp, pdir)
        # sentinel LAST: a crash before this line leaves no _COMPLETE, so
        # the partition is rebuilt on resume
        with open(os.path.join(pdir, _SENTINEL), "w") as f:
            f.write("ok")
        return pd.DataFrame({"partition": [part], "rows": [len(g)],
                             "skipped": [False]})

    log = ds.groupby(col).map_groups(write_group, batch_format="pandas").to_pandas()
    return {
        "written": sorted(log[~log["skipped"]]["partition"]),
        "skipped": sorted(log[log["skipped"]]["partition"]),
    }


def read_partitioned(out_dir: str) -> "rd.Dataset":
    """Read back every COMPLETE partition (ignores partials)."""
    paths = [
        os.path.join(out_dir, d, "part.parquet")
        for d in completed_partitions(out_dir)
    ]
    return rd.read_parquet(paths)
