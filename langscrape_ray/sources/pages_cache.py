"""Parallel generation + on-disk caching of bench-scale pages tables.

The synthetic web is deterministic (fixtures_gen), so a generated parquet is
reusable across processes and CPU counts — bench runs at num_cpus=8 and 32
read the identical bytes.  Generation itself is a Ray pipeline: page HTML +
golden text rendering is CPU-heavy, so chunks fan out over the cluster.

The cache is written hash-partitioned on ``shard = url_hash64(url) % K``
(one ``shard=N`` directory per pages-store shard).  That layout is what
lets ``PagesStore(path=..., partitioned=True)`` load the store with K
parallel worker-side reads instead of one driver-side ``pq.read_table`` of
the whole multi-GB table (measured: 170 s single-threaded driver read +
a further driver-side shard split vs a few seconds of parallel tasks).
It is also the resumable-output layout: a killed generation leaves no
``_DONE`` marker and the partial directory is wiped before regenerating,
so stale chunk files can never mix into a fresh build.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from langscrape_ray.sources.fixtures_gen import (
    FixtureConfig,
    _all_urls,
    build_pages_batch,
)

# fixed shard count baked into the cache layout (and its path tag); must
# match PagesStore.num_shards for partitioned loads
PAGES_SHARDS = 64


def cache_path(cfg: FixtureConfig, base: str = "/tmp/langscrape_ray_cache") -> str:
    tag = (
        f"pages_s{cfg.seed}_p{cfg.n_pages}_h{cfg.n_hosts}_b{cfg.body_scale}"
        f"_k{PAGES_SHARDS}v2"  # v2 = compacted url-sorted shard layout
    )
    return os.path.join(base, tag)


def _compact_shards(path: str, row_group_rows: int = 128) -> None:
    """Layout v2: rewrite each shard dir as ONE url-sorted parquet file.

    The distributed partitioned write leaves ~n_chunks small files per
    shard (measured 67 files/shard at sf0.1) — a non-resident lookup then
    parses every footer and decompresses most row groups per probe.  One
    sorted file per shard means one footer, and url-clustered row groups
    whose min/max stats make the ``url isin`` pushdown selective: at
    store >> probe-list scale (the 100 TB configuration) a lookup reads
    only the row groups its probe urls actually land in.  At real scale
    this per-shard compaction is itself a distributed sort per shard —
    here each shard fits one task.  Crash-safe: _DONE is written only
    after compaction, and a partial build is wiped before regeneration."""
    import ray
    import pyarrow.parquet as pq

    @ray.remote
    def compact(sdir: str) -> int:
        t = pq.read_table(sdir)
        t = t.sort_by("url")
        olds = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        tmp = os.path.join(sdir, "compact.parquet.tmp")
        pq.write_table(t, tmp, row_group_size=row_group_rows)
        os.replace(tmp, os.path.join(sdir, "compact.parquet"))
        for f in olds:
            os.unlink(os.path.join(sdir, f))
        return t.num_rows

    dirs = [
        os.path.join(path, d)
        for d in os.listdir(path)
        if d.startswith("shard=")
    ]
    ray.get([compact.remote(d) for d in dirs])


def build_pages_parquet(cfg: FixtureConfig, path: str | None = None,
                        chunk_size: int = 256) -> str:
    """Generate the pages table in parallel and write shard-partitioned
    parquet.  Returns the directory path; skips generation when the _DONE
    marker exists (resumable-output layout)."""
    import ray

    from langscrape_ray.frontier.canonical import url_hash64

    path = path or cache_path(cfg)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    # no marker: any existing files are a stale partial build — wipe them
    # or write_parquet would append beside them (duplicate pages)
    shutil.rmtree(path, ignore_errors=True)
    triples = _all_urls(cfg)
    urls = [u for _, _, u in triples]
    urls_ref = ray.put(urls)
    n_chunks = max(1, (len(triples) + chunk_size - 1) // chunk_size)

    def gen(batch: pa.Table) -> pa.Table:
        all_urls = ray.get(urls_ref)
        out = []
        for cid in batch["id"].to_pylist():
            chunk = triples[cid * chunk_size : (cid + 1) * chunk_size]
            out.append(build_pages_batch(cfg, chunk, all_urls))
        tbl = pa.concat_tables(out)
        shard = np.fromiter(
            (url_hash64(u) % PAGES_SHARDS for u in tbl["url"].to_pylist()),
            dtype=np.int64, count=tbl.num_rows,
        )
        return tbl.append_column("shard", pa.array(shard))

    (
        rd.range(n_chunks)
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
        .write_parquet(path, partition_cols=["shard"])
    )
    _compact_shards(path)
    open(done, "w").close()
    return path
