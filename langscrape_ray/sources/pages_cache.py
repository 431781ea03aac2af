"""Parallel generation + on-disk caching of bench-scale pages tables.

The synthetic web is deterministic (fixtures_gen), so a generated parquet is
reusable across processes and CPU counts — bench runs at num_cpus=8 and 32
read the identical bytes.  Generation itself is a Ray pipeline: page HTML +
golden text rendering is CPU-heavy, so chunks fan out over the cluster.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from langscrape_ray.sources.fixtures_gen import (
    FixtureConfig,
    _all_urls,
    build_pages_batch,
)


def cache_path(cfg: FixtureConfig, base: str = "/tmp/langscrape_ray_cache") -> str:
    tag = f"pages_s{cfg.seed}_p{cfg.n_pages}_h{cfg.n_hosts}_b{cfg.body_scale}"
    return os.path.join(base, tag)


def build_pages_parquet(cfg: FixtureConfig, path: str | None = None,
                        chunk_size: int = 256) -> str:
    """Generate the pages table in parallel and write partitioned parquet.
    Returns the directory path; skips generation when the _DONE marker
    exists (resumable-output layout)."""
    import ray

    path = path or cache_path(cfg)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
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
        return pa.concat_tables(out)

    (
        rd.range(n_chunks)
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
        .write_parquet(path)
    )
    open(done, "w").close()
    return path
