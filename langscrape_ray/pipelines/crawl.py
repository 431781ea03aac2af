"""The flagship pipeline: multi-round Ray Data crawl over a pages table.

Implements SURVEY.md §7.1 (R1-R7) as a batch-iterative loop — each frontier
round is one Ray Data pipeline pass (the reference's analog is the
sequential per-URL loop, /root/reference/scripts/run.py:63-98):

    R1 canonicalize + robots     map_batches (stateless, Arrow)
    R2 within-round dedup        propose/admit protocol on host-sharded seen
                                 actors (min order_key wins; associative +
                                 idempotent, so retry- and order-safe) — no
                                 groupby(url_hash) all-to-all
    R3 politeness scheduling     INSIDE the host-affine shard actors: the
                                 per-host priority queues + virtual clocks
                                 live with the seen-set; the actor routing
                                 is the (only) data exchange per round
    R4 fetch (simulated)         shard-partitioned broadcast lookup against
                                 the pages store (or filtered parquet read)
    R5 extract                   vectorized stateless map_batches tasks
    R6 frontier update           outlink explode with per-row order keys
    R7 sinks + checkpoint        write_parquet per round + manifest

Determinism: every ordering decision is computed from (fetch_ms, -priority,
order_key) by the same pure functions the oracle uses; nothing depends on
task completion order.  Scale notes per stage are in the method docstrings.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from langscrape_ray.frontier.canonical import outlink_order_key
from langscrape_ray.frontier.politeness import CrawlPolicy
from langscrape_ray.frontier.robots import DEFAULT_CRAWL_DELAY_MS, parse_robots
from langscrape_ray.stages.extract import ExtractPages
from langscrape_ray.stages.frontier_stages import (
    CanonProposePayloadBatch,
    SeenShard,
)
from langscrape_ray.state.checkpoint import (
    last_complete_round,
    read_round_checkpoint,
    write_round_checkpoint,
)

_FRONTIER_SCHEMA = {"url": pa.string(), "priority": pa.int64(), "order_key": pa.int64()}

# sentinel returned by _run_round when the NEXT round's frontier was already
# exploded + canonicalized + proposed inside this round's extract launch
# (the fused pipeline) — the loop then starts the next round at admit
_PROPOSED = object()

# below this many frontier rows, canonicalize+robots+propose skip the
# Dataset launch: with propose fusion, a full map_batches launch only
# ever canonicalizes the SEED round, and for a few thousand seed urls the
# launch overhead is ~1.4 s of pure fixed cost (measured at 16 CPUs,
# sf0.1) for milliseconds of work — the largest remaining term of the
# per-round coordination floor.  Tiny frontiers run the identical
# CanonProposePayloadBatch kernel in-process on the driver; mid-size ones
# fan the same kernel out as raw Ray tasks over table slices (identical
# canonicalize + robots decisions and the same idempotent per-shard
# propose fold, ~ms of task overhead instead of the launch cost).
# Billion-url seed lists stay on the distributed Dataset path.
_DRIVER_CANON_MAX_ROWS = 65_536
_CANON_TASK_CHUNK = 2_048


@ray.remote(num_cpus=1)
def _canon_propose_task(canonprop, tbl: pa.Table) -> pa.Table:
    """Raw-task wrapper for the small-frontier canonicalize fan-out."""
    return canonprop(tbl)


def explode_outlinks(batch: pa.Table) -> pa.Table:
    """R6 outlink explode with per-row order keys — vectorized:
    pc.list_flatten for the urls (zero-copy view of the child array) +
    pc.list_parent_indices / offsets for per-link positions, no per-row
    Python loop.  The okey hash itself stays a flat comprehension (it's
    a keyed blake2 per link — the semantic, not an artifact)."""
    links = batch["outlinks"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    n = len(flat)
    if n == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "priority": pa.array([], pa.int64()),
                "order_key": pa.array([], pa.int64()),
            }
        )
    parent = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(links)
    if counts.null_count:
        counts = pc.fill_null(counts, 0)
    counts = counts.to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.arange(n, dtype=np.int64) - starts[parent]
    pkeys = batch["order_key"].to_numpy(zero_copy_only=False)[parent]
    okeys = [outlink_order_key(int(k), int(p)) for k, p in zip(pkeys, pos)]
    if not pa.types.is_string(flat.type):
        flat = flat.cast(pa.string())
    return pa.table(
        {
            "url": flat,
            "priority": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "order_key": pa.array(okeys, pa.int64()),
        }
    )


class ProposeOutlinksPassthrough:
    """FUSED R6+next-round-R1/R2a: a passthrough stage chained AFTER the
    extract operator in the SAME Dataset launch — it explodes the
    extracted batch's outlinks and canonicalizes + robots-filters +
    proposes them for the NEXT round, then returns the batch unchanged
    (zero-copy).  The round-4 scaling verdict's coordination floor was
    ~0.5 s of fixed per-round launch overhead; this removes one of the
    two launches per round.

    Runs at BLOCK granularity (batch_size=None), NOT the extract stage's
    64-row batches: one canonicalize+propose RPC fan-out per block.  A
    first cut that proposed inside the extract UDF itself issued ~9
    blocking shard RPCs per 64-row batch and collapsed throughput 6x —
    the shard actor pool serialized the whole extract stage.

    The extract launch's materialize IS the propose barrier: when it
    returns, every outlink proposal is resident on its host-affine
    shard, so the next round starts directly at the one-per-shard
    admit_enqueue_round RPC.  Counter stats (n_total, n_ok) ride to a
    shard keyed by a deterministic batch token (first/last parent
    order_key + row count), so a retried task overwrites its own
    contribution instead of double-counting; admit_enqueue_round folds
    and returns them.

    Ordering parity: proposals are min-order_key idempotent and the
    admit decision is deferred to the barrier exactly as in the unfused
    path, so the crawl order and all counters are bit-identical (pinned
    by scripts/verify_crawl.py and the fused-vs-unfused test)."""

    def __init__(self, robots_rules, shards):
        self.canonprop = CanonProposePayloadBatch(robots_rules, shards)
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        links = explode_outlinks(
            batch.select(["order_key", "outlinks"])
        )
        if links.num_rows:
            stats = self.canonprop(links)
            n_total = int(stats["n_total"][0].as_py())
            n_ok = int(stats["n_ok"][0].as_py())
            ok = links["order_key"]
            token = (
                int(ok[0].as_py()),
                int(ok[-1].as_py()),
                links.num_rows,
            )
            sid = (token[0] ^ token[1]) % len(self.shards)
            ray.get(
                self.shards[sid].propose_stats.remote(token, n_total, n_ok)
            )
        return batch


class PagesStore:
    """Simulated web: lookup html by canonical url (SURVEY.md §2.4 J5).

    Parquet-backed: a filtered ``read_parquet`` (predicate pushdown on url)
    per round — the round's fetch list is bounded by the politeness budget,
    so this is a selective scan, not O(pages) per round when row groups are
    url-sorted.  At real scale this becomes a bucketed hash join on
    url_hash; the in-memory variant serves tests.
    """

    def __init__(
        self,
        path: Optional[str] = None,
        table: Optional[pa.Table] = None,
        num_shards: int = 64,
        partitioned: bool = False,
        resident: bool = True,
    ):
        assert (path is None) != (table is None)
        assert not (partitioned and path is None)
        assert resident or partitioned, "non-resident mode needs a partitioned path"
        self.path = path
        self.table = table
        self.num_shards = num_shards
        # partitioned=True: `path` is a shard=N-partitioned parquet dir
        # (pages_cache layout, shard = url_hash64(url) % num_shards) and the
        # store loads itself with one Ray task per shard — the driver never
        # materializes the table
        self.partitioned = partitioned
        # resident=False: the pages table exceeds cluster memory — no shard
        # is ever pinned in the object store; every lookup task instead
        # runs a predicate-pushdown read of ONLY its shard directory,
        # filtered to the batch's urls.  Row-group pruning makes this a
        # selective scan when shards are written url-clustered; latency
        # trades against plasma residency.  This is the 100 TB pages-store
        # configuration; resident=True is the fits-in-memory fast path.
        self.resident = resident
        self._refs = None  # lazy (ray may not be initialised yet)
        if partitioned and path is not None and os.path.isdir(path):
            # the cache layout pins K (shard = url_hash64 % K): a mismatched
            # num_shards would make every lookup miss its shard and drop
            # pages silently as fetch_miss — validate against the shard=N
            # dirs on disk (ids >= num_shards are proof of a different K;
            # missing top dirs are fine, small caches leave shards empty)
            on_disk = [
                int(d.split("=", 1)[1])
                for d in os.listdir(path)
                if d.startswith("shard=") and d.split("=", 1)[1].isdigit()
            ]
            if on_disk and max(on_disk) >= num_shards:
                raise ValueError(
                    f"pages cache at {path} has shard ids up to "
                    f"{max(on_disk)} but num_shards={num_shards}; pass the "
                    "K the cache was written with"
                )

    def _shard_slice(self, sid: int, urls: List[str]) -> Tuple[pa.Table, dict]:
        """Non-resident gather: filtered read of one shard dir restricted
        to `urls`; returns (rows, url->row index) like a resident shard."""
        import pyarrow.parquet as pq

        shard_dir = os.path.join(self.path, f"shard={sid}")
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "html": pa.array([], pa.large_binary()),
                "warc_ts": pa.array([], pa.timestamp("us")),
            }
        )
        if not os.path.isdir(shard_dir):
            return empty, {}
        t = pq.read_table(
            shard_dir,
            columns=["url", "html", "warc_ts"],
            filters=pc.field("url").isin(urls),
            # single-threaded: this runs INSIDE a num_cpus=1 Ray task —
            # the default thread pool (os.cpu_count() threads) multiplied
            # by 64 concurrent lookup tasks thrashes the node, and the
            # selective compacted-shard read is not faster threaded
            use_threads=False,
        )
        t = t.set_column(
            t.schema.get_field_index("html"),
            "html",
            t["html"].cast(pa.large_binary()),
        ).combine_chunks()
        return t, {u: j for j, u in enumerate(t["url"].to_pylist())}

    def _shard_refs(self):
        """Broadcast the pages table ONCE, sharded by hash(url): each shard
        (rows + its url->row index) is a separate object-store entry, so a
        lookup task only ever touches its own 1/K slice — a full-table
        broadcast makes every task page through the whole store and
        anti-scales with worker count.

        Partitioned-path mode: each shard is read + indexed by its own Ray
        task directly from its ``shard=N`` parquet directory; the task's
        return ref IS the shard's object-store entry.  K parallel worker
        reads replace the single-threaded driver read (measured 170 s on a
        1.6 GB / 400-file cache) and the driver-side split."""
        if self._refs is None and self.partitioned:

            @ray.remote
            def load_shard(path: str, sid: int):
                import pyarrow.parquet as pq

                shard_dir = os.path.join(path, f"shard={sid}")
                if not os.path.isdir(shard_dir):
                    shard = pa.table(
                        {
                            "url": pa.array([], pa.string()),
                            "html": pa.array([], pa.large_binary()),
                            "warc_ts": pa.array([], pa.timestamp("us")),
                        }
                    )
                    return (shard, {})
                shard = pq.read_table(
                    shard_dir, columns=["url", "html", "warc_ts"]
                )
                shard = shard.set_column(
                    shard.schema.get_field_index("html"),
                    "html",
                    shard["html"].cast(pa.large_binary()),
                ).combine_chunks()
                index = {u: j for j, u in enumerate(shard["url"].to_pylist())}
                return (shard, index)

            self._refs = [
                load_shard.remote(self.path, s) for s in range(self.num_shards)
            ]
        if self._refs is None:
            from langscrape_ray.frontier.canonical import url_hash64

            tbl = self.table.select(["url", "html", "warc_ts"])
            # 64-bit offsets: take() concatenates chunks, and a >2 GiB
            # binary column overflows 32-bit offsets otherwise
            tbl = tbl.set_column(
                tbl.schema.get_field_index("html"),
                "html",
                tbl["html"].cast(pa.large_binary()),
            )
            # take() on a many-chunk binary column re-concatenates the
            # WHOLE column per call (~15 s/call on a 3 GB 400-chunk
            # table); one up-front combine (~4 s) makes every per-shard
            # take a sub-100-ms contiguous gather
            tbl = tbl.combine_chunks()
            urls = tbl["url"].to_pylist()
            K = self.num_shards
            by_shard: List[List[int]] = [[] for _ in range(K)]
            for i, u in enumerate(urls):
                by_shard[url_hash64(u) % K].append(i)

            # driver-side build: on the single-chunk table each per-shard
            # take is a contiguous sub-100-ms gather, so building 64 shards
            # serially (~3 s) beats a task wave where every worker process
            # page-faults the full multi-GB broadcast out of plasma (~23 s
            # of kernel time at 32 workers).  Each shard is its own
            # object-store entry; lookups touch only their 1/K slice.
            self._refs = []
            for rows in by_shard:
                shard = tbl.take(pa.array(rows, pa.int64()))
                index = {u: j for j, u in enumerate(shard["url"].to_pylist())}
                self._refs.append(ray.put((shard, index)))
        return self._refs

    def fetch_with_meta(self, meta_tbl: pa.Table, chunk_rows: int = 512) -> rd.Dataset:
        """meta_tbl: (url, seq, round, priority, order_key, fetch_ms) for
        the round's fetch list.  Returns a Dataset of meta + (html, warc_ts)
        for the urls present in the store (misses dropped).

        In-memory store: shard-partitioned broadcast lookup (the J5 hash
        join; meta rows are grouped by their url-hash shard, so each task
        reads exactly one shard zero-copy).  Parquet store: a filtered read
        joined to the (bounded) meta — the at-scale configuration where the
        pages table exceeds memory.
        """
        if self.path is not None and not self.partitioned:
            urls = meta_tbl["url"].to_pylist()
            meta_ref = ray.put(meta_tbl)

            def attach(batch: pa.Table) -> pa.Table:
                m = ray.get(meta_ref)
                idx = {u: i for i, u in enumerate(m["url"].to_pylist())}
                rows = [idx[u] for u in batch["url"].to_pylist()]
                sub = m.take(rows)
                for name in sub.column_names:
                    if name != "url":
                        batch = batch.append_column(name, sub[name])
                return batch

            return rd.read_parquet(
                self.path,
                columns=["url", "html", "warc_ts"],
                filter=pc.field("url").isin(urls),
            ).map_batches(attach, batch_format="pyarrow")

        from langscrape_ray.frontier.canonical import url_hash64

        refs = self._shard_refs() if self.resident else None
        store = self if not self.resident else None
        K = self.num_shards
        sids = [url_hash64(u) % K for u in meta_tbl["url"].to_pylist()]
        order: List[List[int]] = [[] for _ in range(K)]
        for i, s in enumerate(sids):
            order[s].append(i)
        chunks: List[pa.Table] = []
        chunk_sids: List[int] = []
        for s in range(K):
            if not order[s]:
                continue
            part = meta_tbl.take(order[s])
            for off in range(0, part.num_rows, chunk_rows):
                chunks.append(part.slice(off, chunk_rows))
                chunk_sids.append(s)

        def lookup(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                batch = batch.append_column("html", pa.array([], pa.binary()))
                return batch.append_column("warc_ts", pa.array([], pa.timestamp("us")))
            # every row in this chunk belongs to one shard by construction
            sid = url_hash64(batch["url"][0].as_py()) % K
            if refs is not None:
                tbl, idx = ray.get(refs[sid])  # zero-copy from plasma
            else:
                tbl, idx = store._shard_slice(sid, batch["url"].to_pylist())
            rows = [idx.get(u, -1) for u in batch["url"].to_pylist()]
            keep = [i for i, r in enumerate(rows) if r >= 0]
            if not keep:
                empty = batch.slice(0, 0)
                empty = empty.append_column("html", pa.array([], pa.binary()))
                return empty.append_column("warc_ts", pa.array([], pa.timestamp("us")))
            sub = tbl.take([rows[i] for i in keep])
            out = batch.take(keep)
            out = out.append_column("html", sub["html"])
            return out.append_column("warc_ts", sub["warc_ts"])

        if not chunks:
            chunks = [meta_tbl.slice(0, 0)]
        return rd.from_arrow(chunks).map_batches(lookup, batch_format="pyarrow")

    def fetch_with_meta_ds(self, meta_ds: rd.Dataset) -> rd.Dataset:
        """Dataset-input variant of fetch_with_meta for the distributed
        ordering path: the meta rows never touch the driver, so each batch
        may span shards — the lookup groups its rows by shard INSIDE the
        task and gathers from each touched shard once, preserving the
        batch's (seq-sorted) row order."""
        from langscrape_ray.frontier.canonical import url_hash64

        refs = self._shard_refs() if self.resident else None
        store = self if not self.resident else None
        K = self.num_shards

        def lookup_multi(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                batch = batch.append_column("html", pa.array([], pa.binary()))
                return batch.append_column(
                    "warc_ts", pa.array([], pa.timestamp("us"))
                )
            urls = batch["url"].to_pylist()
            by_sid: Dict[int, List[int]] = {}
            for i, u in enumerate(urls):
                by_sid.setdefault(url_hash64(u) % K, []).append(i)
            subs: List[pa.Table] = []
            for sid, idxs in sorted(by_sid.items()):
                if refs is not None:
                    tbl, idx = ray.get(refs[sid])  # zero-copy from plasma
                else:
                    tbl, idx = store._shard_slice(sid, [urls[i] for i in idxs])
                hit = [(i, idx[urls[i]]) for i in idxs if urls[i] in idx]
                if not hit:
                    continue
                sub = tbl.take([r for _, r in hit])
                subs.append(
                    pa.table(
                        {
                            "_row": pa.array([i for i, _ in hit], pa.int64()),
                            "html": sub["html"],
                            "warc_ts": sub["warc_ts"],
                        }
                    )
                )
            if not subs:
                empty = batch.slice(0, 0)
                empty = empty.append_column("html", pa.array([], pa.binary()))
                return empty.append_column(
                    "warc_ts", pa.array([], pa.timestamp("us"))
                )
            merged = pa.concat_tables(subs)
            # restore the batch's original (seq-sorted) row order
            order = pc.sort_indices(merged["_row"])
            merged = merged.take(order)
            out = batch.take(merged["_row"])
            out = out.append_column("html", merged["html"])
            return out.append_column("warc_ts", merged["warc_ts"])

        return meta_ds.map_batches(lookup_multi, batch_format="pyarrow")


class RayCrawl:
    """Distributed crawl loop.  ``pages`` is the fetcher plug-point: any
    PagesAdapter (see stages/fetchers.py — fetch_with_meta /
    fetch_with_meta_ds returning meta + (html, warc_ts), misses dropped)
    drives the same loop: the simulated PagesStore, the real
    HttpPagesStore, or a JS-rendering BrowserPagesStore — proven
    interchangeable by the three-way trace-parity test in
    tests/test_http_fetch.py."""

    def __init__(
        self,
        pages: PagesStore,
        robots_txt_by_host: Dict[str, str],
        default_rules: Dict[str, dict],
        rules_by_host: Optional[Dict[str, Dict[str, dict]]] = None,
        policy: Optional[CrawlPolicy] = None,
        num_shards: int = 4,
        seen_capacity: int = 1_000_000,
        out_dir: Optional[str] = None,
        ckpt_dir: Optional[str] = None,
        exact_audit: bool = True,
        extract_concurrency: Optional[int] = None,
        trace_dir: Optional[str] = None,
        extract_udfs: Optional[list] = None,
        dist_order_threshold: int = 200_000,
        fuse_propose: bool = True,
    ):
        self.pages = pages
        self.policy = policy or CrawlPolicy()
        self.default_rules = default_rules
        self.rules_by_host = rules_by_host or {}
        self.out_dir = out_dir
        self.ckpt_dir = ckpt_dir
        self.exact_audit = exact_audit
        self.extract_concurrency = extract_concurrency
        # §2.11: named/callable batch UDFs applied after extraction
        self.extract_udfs = list(extract_udfs or [])
        # above this many fetches in one round, the global crawl-order sort
        # + seq assignment + trace write run DISTRIBUTED (Dataset.sort +
        # per-block prefix-sum rank assign) instead of a driver-side pandas
        # sort.  The driver path is faster below it (one politeness budget's
        # worth of rows); the distributed path is the 10^7-rows-per-round
        # configuration.  Tests set 0 to force the distributed path.
        self.dist_order_threshold = dist_order_threshold
        # fuse round n+1's explode+canonicalize+propose INTO round n's
        # extract launch (ExtractProposeBatch): one Dataset launch per
        # round instead of two — the round-4 scaling analysis measured a
        # fixed ~0.5 s/round coordination floor dominated by per-launch
        # overhead, the Amdahl term capping raw 4->16-CPU scaling.  Off
        # switch kept for the fused-vs-unfused parity test.
        self.fuse_propose = fuse_propose
        # robots parsed once; broadcast as a plain dict (small side).  At
        # 10^8-host scale this becomes a host-partitioned join table.
        self.robots_rules = {
            h: (r.disallow, r.crawl_delay_ms)
            for h, r in ((h, parse_robots(t)) for h, t in robots_txt_by_host.items())
        }
        delays = {h: r[1] for h, r in self.robots_rules.items()}
        self.num_shards = num_shards
        # FrontierShard actors: URL-seen membership (bloom+cuckoo[+exact])
        # AND the per-host politeness queues + virtual clocks.  Host-affine
        # routing (host_hash % K) keeps each host's state on one actor.
        self.shards = [
            SeenShard.remote(
                i,
                seen_capacity,
                exact_audit,
                delays_by_host=delays,
                max_per_host_per_round=self.policy.max_per_host_per_round,
                default_delay_ms=DEFAULT_CRAWL_DELAY_MS,
            )
            for i in range(num_shards)
        ]
        self.counters: Dict[str, int] = {}
        # Append-only per-round trace parquet (replaces the round-1
        # driver-resident trace list + its re-serialization into every
        # manifest: O(total_urls) driver state and O(rounds x total)
        # checkpoint bytes — the one genuine scale-killer in the flagship).
        # Driver state is now counters + next_seq only; the full trace is
        # assembled from the round files only when a caller asks for it.
        if trace_dir is None:
            if ckpt_dir:
                trace_dir = os.path.join(ckpt_dir, "trace")
            else:
                import tempfile

                trace_dir = tempfile.mkdtemp(prefix="lsr_trace_")
        self.trace_dir = trace_dir
        os.makedirs(self.trace_dir, exist_ok=True)
        self._seq = 0
        self._frontier_rows = 0  # rows in the current round's new frontier
        self.phase_sec: Dict[str, float] = {}

    def _tick(self, phase: str, t0: float) -> float:
        import time as _time

        now = _time.perf_counter()
        self.phase_sec[phase] = self.phase_sec.get(phase, 0.0) + (now - t0)
        return now

    # ------------------------------------------------------------------
    def _bump(self, key: str, n: int) -> None:
        self.counters[key] = self.counters.get(key, 0) + int(n)

    # ------------------------------------------------------------------
    def run(self, seeds: pa.Table, resume: bool = False) -> Dict[str, object]:
        """Run the crawl to completion (or policy.max_rounds).

        ``seeds``: table (url, seed_order, priority).  Returns a summary
        dict with counters, the ordered fetched trace, and rounds run."""
        start_round = 0
        self._frontier_rows = seeds.num_rows
        # frontier is Dataset | pa.Table | _PROPOSED | None: a raw Arrow
        # table takes the small-frontier driver canonicalize path in
        # _run_round (same kernel, no Dataset launch)
        seed_tbl = pa.table(
            {
                "url": seeds["url"],
                "priority": pc.cast(seeds["priority"], pa.int64()),
                "order_key": pc.cast(seeds["seed_order"], pa.int64()),
            }
        )
        frontier = (
            seed_tbl
            if seed_tbl.num_rows <= _DRIVER_CANON_MAX_ROWS
            else rd.from_arrow(seed_tbl)
        )
        if resume and self.ckpt_dir:
            last = last_complete_round(self.ckpt_dir)
            if last is not None:
                manifest, _carry, shard_states = read_round_checkpoint(
                    self.ckpt_dir, last
                )
                self.counters = {k: int(v) for k, v in manifest["counters"].items()}
                self._seq = int(manifest["next_seq"])
                self._frontier_rows = int(manifest.get("next_frontier_rows", 0))
                if shard_states:
                    ray.get(
                        [
                            s.restore.remote(st)
                            for s, st in zip(self.shards, shard_states)
                        ]
                    )
                start_round = last + 1
                nf_path = manifest.get("next_frontier_path")
                if manifest.get("next_proposed"):
                    # the interrupted run's fused extract already proposed
                    # round start_round's frontier; the restored shard
                    # snapshots carry the pending proposals + stats, so
                    # the round resumes directly at the admit barrier
                    frontier = _PROPOSED
                elif nf_path:
                    import pyarrow.dataset as pads

                    # metadata-only row count decides the tier: small
                    # checkpointed frontiers resume on the driver path
                    n_rows = pads.dataset(nf_path).count_rows()
                    frontier = (
                        pads.dataset(nf_path).to_table()
                        if n_rows <= _DRIVER_CANON_MAX_ROWS
                        else rd.read_parquet(nf_path)
                    )
                else:
                    frontier = None
                # drop any trace file an interrupted round left behind —
                # the re-run rewrites it (deterministically identical), but
                # a round that re-runs to zero fetches writes nothing and
                # a stale file would corrupt the assembled trace
                for name in os.listdir(self.trace_dir):
                    if (
                        name.startswith("round=")
                        and int(name.split("=")[1].split(".")[0]) >= start_round
                    ):
                        os.unlink(os.path.join(self.trace_dir, name))

        rnd = start_round
        while rnd < self.policy.max_rounds:
            if frontier is None:
                backlog = sum(ray.get([s.backlog_size.remote() for s in self.shards]))
                if backlog == 0:
                    break
            frontier = self._run_round(rnd, frontier)
            rnd += 1

        return {
            "rounds": rnd,
            "counters": dict(self.counters),
            # assembled lazily from the per-round parquet files; the crawl
            # loop itself never holds the trace in driver memory
            "trace_fetched": self.read_trace(),
            "trace_dir": self.trace_dir,
            "seen_size": sum(ray.get([s.size.remote() for s in self.shards])),
            "out_dir": self.out_dir,
        }

    # ------------------------------------------------------------------
    def _write_round_trace(self, rnd: int, fetch_pd: pd.DataFrame,
                           seqs: List[int]) -> None:
        """Append the round's (small, budget-bounded) trace as one parquet
        file, atomically (tmp + rename) so interrupted-round re-runs
        overwrite cleanly."""
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "url": pa.array(fetch_pd["canon_url"].tolist(), pa.string()),
                "host": pa.array(fetch_pd["host"].tolist(), pa.string()),
                "round": pa.array([rnd] * len(seqs), pa.int64()),
                "fetch_ms": pa.array(fetch_pd["fetch_ms"].astype("int64")),
                "priority": pa.array(fetch_pd["priority"].astype("int64")),
                "order_key": pa.array(fetch_pd["order_key"].astype("int64")),
            }
        )
        path = os.path.join(self.trace_dir, f"round={rnd:04d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    def read_trace(self) -> List[dict]:
        """Read the full fetched trace back from the round files (small
        result at test scale; at 10^10-URL scale callers read the parquet
        directory as a Dataset instead of this list-of-dicts view).
        Handles both layouts: one file per round (driver ordering) and one
        part-directory per round (distributed ordering; parts are named in
        sorted-block order, so lexicographic part order == seq order)."""
        import pyarrow.parquet as pq

        tbls = []
        for name in sorted(os.listdir(self.trace_dir)):
            p = os.path.join(self.trace_dir, name)
            if name.startswith("round=") and name.endswith(".parquet"):
                tbls.append(pq.read_table(p))
            elif name.startswith("round=") and name.endswith(".d"):
                for part in sorted(os.listdir(p)):
                    if part.endswith(".parquet"):
                        tbls.append(pq.read_table(os.path.join(p, part)))
        if not tbls:
            return []
        return pa.concat_tables(tbls).to_pylist()

    # ------------------------------------------------------------------
    def _order_round_distributed(self, rnd: int, n_fetch: int) -> rd.Dataset:
        """Distributed crawl-order assignment (the 10^7-rows-per-round
        path): shard fetch tables flow by ObjectRef into ONE Dataset.sort
        on (fetch_ms, -priority, order_key); ranks then attach per block
        via prefix-sum offsets (rank-assign has no Dataset primitive, so
        the per-block attach runs as raw tasks on the sorted blocks —
        the documented custom-operator escape hatch).  Trace parts are
        written by the same tasks into a tmp dir renamed atomically.
        Produces the identical seq assignment as the driver path: the
        sort keys form a total order (order_key is globally unique)."""
        import pyarrow.parquet as pq

        refs = [s.last_fetch_table.remote() for s in self.shards]
        ds = (
            rd.from_arrow_refs(refs)
            .sort(
                ["fetch_ms", "priority", "order_key"],
                descending=[False, True, False],
            )
            .materialize()
        )
        block_refs = ds.to_arrow_refs()

        @ray.remote
        def _rows(t: pa.Table) -> int:
            return t.num_rows

        counts = ray.get([_rows.remote(b) for b in block_refs])
        starts = []
        off = self._seq
        for c in counts:
            starts.append(off)
            off += c
        assert off - self._seq == n_fetch
        self._seq = off

        tmp_dir = os.path.join(self.trace_dir, f"round={rnd:04d}.d.tmp")
        final_dir = os.path.join(self.trace_dir, f"round={rnd:04d}.d")
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)

        @ray.remote
        def _assign(t: pa.Table, start: int, bi: int) -> pa.Table:
            seqs = pa.array(range(start, start + t.num_rows), pa.int64())
            trace = pa.table(
                {
                    "seq": seqs,
                    "url": t["canon_url"],
                    "host": t["host"],
                    "round": pa.array([rnd] * t.num_rows, pa.int64()),
                    "fetch_ms": t["fetch_ms"],
                    "priority": t["priority"],
                    "order_key": t["order_key"],
                }
            )
            pq.write_table(
                trace, os.path.join(tmp_dir, f"part-{bi:05d}.parquet")
            )
            return pa.table(
                {
                    "url": t["canon_url"],
                    "seq": seqs,
                    "round": pa.array([rnd] * t.num_rows, pa.int64()),
                    "priority": t["priority"],
                    "order_key": t["order_key"],
                    "fetch_ms": t["fetch_ms"],
                }
            )

        assigned = [
            _assign.remote(b, st, bi)
            for bi, (b, st) in enumerate(zip(block_refs, starts))
        ]
        ray.wait(assigned, num_returns=len(assigned))  # parts written
        os.replace(tmp_dir, final_dir)
        meta_ds = rd.from_arrow_refs(assigned)
        return self.pages.fetch_with_meta_ds(meta_ds)

    # ------------------------------------------------------------------
    def _run_round(
        self, rnd: int, frontier  # Dataset | pa.Table | _PROPOSED | None
    ) -> Optional[rd.Dataset]:
        import time as _time

        _t = _time.perf_counter()
        # ---- R1/R2a: canonicalize + robots + propose (fused, 1 launch) ---
        # ``frontier`` may be a LAZY chain ending in the previous round's
        # outlink explode — it fuses into this launch (no materialized
        # intermediate frontier).  Or it may be the _PROPOSED sentinel:
        # the previous round's FUSED extract (ExtractProposeBatch) already
        # exploded + canonicalized + proposed this round's frontier inside
        # its own launch, so this round makes ZERO frontier passes and
        # starts directly at the admit barrier.
        n_ok = 0
        n_total = 0
        had_frontier = frontier is not None
        if frontier is not None and frontier is not _PROPOSED:
            if isinstance(frontier, pa.Table):
                # small-frontier driver fast path (seed round / resume):
                # the SAME CanonProposePayloadBatch kernel runs once on
                # the driver — identical canonicalize + robots decisions
                # and identical per-shard propose_payload_tbl RPCs (the
                # shards see one table each instead of one per block; the
                # propose fold is batch-count-insensitive) — skipping the
                # ~1.4 s fixed cost of a Dataset launch for a frontier
                # that fits in one batch
                canonprop = CanonProposePayloadBatch(
                    self.robots_rules, self.shards
                )
                nrows = frontier.num_rows
                if nrows <= _CANON_TASK_CHUNK:
                    stats_tbls = [canonprop(frontier)]
                else:
                    cp_ref = ray.put(canonprop)
                    stats_tbls = ray.get(
                        [
                            _canon_propose_task.remote(
                                cp_ref,
                                frontier.slice(i, _CANON_TASK_CHUNK),
                            )
                            for i in range(0, nrows, _CANON_TASK_CHUNK)
                        ]
                    )
                for st in stats_tbls:
                    n_total += int(pc.sum(st["n_total"]).as_py() or 0)
                    n_ok += int(pc.sum(st["n_ok"]).as_py() or 0)
            else:
                # ONE pass: canonicalize + robots + payload-carrying
                # propose; the stats output materializing IS the propose
                # barrier, and its sums replace the two full-frontier
                # count() launches
                stats = frontier.map_batches(
                    CanonProposePayloadBatch(self.robots_rules, self.shards),
                    batch_format="pyarrow",
                ).materialize()
                # fold the per-block (n_total, n_ok) rows on the driver
                # from the already-materialized block refs: stats is k
                # tiny rows (one per block), and a ds.sum() here would
                # launch a whole aggregation plan per round — a constant
                # ~0.3-0.5 s that never parallelizes (measured 0.39
                # scaling efficiency on the canonicalize phase before
                # this fold)
                for blk in ray.get(stats.to_arrow_refs()):
                    if blk.num_rows:
                        n_total += int(pc.sum(blk["n_total"]).as_py() or 0)
                        n_ok += int(pc.sum(blk["n_ok"]).as_py() or 0)
        _t = self._tick("canonicalize", _t)

        # ---- R2b+R3: ONE barrier RPC per shard: admit proposal winners,
        # run the politeness scheduler (fetch tables stay STASHED on the
        # host-affine actors — the driver gets counts only, and either
        # pulls the budget-bounded tables for the fast driver-side
        # ordering or hands the actors' ObjectRefs to the distributed
        # ordering pipeline), and clear round state.  On the _PROPOSED
        # path the same RPC also returns the (n_total, n_ok) stats the
        # fused extract batches deposited (token-keyed, retry-idempotent).
        res = ray.get([s.resolve_round.remote() for s in self.shards])
        n_fetch = sum(r[0] for r in res)
        n_deferred = sum(r[1] for r in res)
        n_admitted = sum(r[2] for r in res)
        if frontier is _PROPOSED:
            n_total = sum(r[3] for r in res)
            n_ok = sum(r[4] for r in res)
        if had_frontier:
            self._bump("rejected", n_total - n_ok)
        _t = self._tick("enqueue", _t)
        self._bump("deferred", n_deferred)
        if had_frontier:
            self._bump("deduped", n_ok - n_admitted)
        self._bump("fetched", n_fetch)
        if n_fetch == 0:
            self._checkpoint(rnd, None)
            return None

        if n_fetch > self.dist_order_threshold:
            pages_ds = self._order_round_distributed(rnd, n_fetch)
            _t = self._tick("schedule", _t)
            _t = self._tick("fetch_prep", _t)
        else:
            fetched_tbls = [
                t
                for t in ray.get(
                    [s.last_fetch_table.remote() for s in self.shards]
                )
                if t.num_rows
            ]
            fetch_tbl = pa.concat_tables(fetched_tbls)
            # global crawl order: (fetch_ms, -priority, order_key) — computed.
            fetch_pd = fetch_tbl.to_pandas().sort_values(
                ["fetch_ms", "priority", "order_key"],
                ascending=[True, False, True],
            ).reset_index(drop=True)
            seqs = list(range(self._seq, self._seq + n_fetch))
            self._seq += n_fetch
            self._write_round_trace(rnd, fetch_pd, seqs)
            _t = self._tick("schedule", _t)

            # ---- R4/R5: fetch + extract ----------------------------------
            meta_tbl = pa.table(
                {
                    "url": pa.array(fetch_pd["canon_url"].tolist(), pa.string()),
                    "seq": pa.array(seqs, pa.int64()),
                    "round": pa.array([rnd] * n_fetch, pa.int64()),
                    "priority": pa.array(fetch_pd["priority"].astype("int64")),
                    "order_key": pa.array(fetch_pd["order_key"].astype("int64")),
                    "fetch_ms": pa.array(fetch_pd["fetch_ms"].astype("int64")),
                }
            )
            pages_ds = self.pages.fetch_with_meta(meta_tbl)
            _t = self._tick("fetch_prep", _t)

        # Extraction runs as STATELESS tasks by default: the rule dicts are
        # cheap to ship, and tasks reuse warm workers across rounds instead
        # of paying actor-pool ramp-up per round.  extract_concurrency opts
        # into a bounded actor pool (the right mode once the stage holds
        # heavy state, e.g. a model).  When fusing, a block-granularity
        # ProposeOutlinksPassthrough stage is CHAINED after the extract in
        # the same launch: it explodes + canonicalizes + proposes round
        # rnd+1's outlinks and passes the extract output through (no
        # fusion into the final round — there is no rnd+1 to propose).
        fused = self.fuse_propose and (rnd + 1 < self.policy.max_rounds)
        if self.extract_concurrency:
            ext_ds = pages_ds.map_batches(
                ExtractPages,
                fn_constructor_args=(self.default_rules, self.rules_by_host),
                fn_constructor_kwargs={"post_udfs": self.extract_udfs},
                batch_format="pyarrow",
                batch_size=64,
                concurrency=self.extract_concurrency,
            )
        else:
            ext = ExtractPages(
                self.default_rules,
                self.rules_by_host,
                post_udfs=self.extract_udfs,
            )
            ext_ds = pages_ds.map_batches(
                lambda t, _e=ext: _e(t), batch_format="pyarrow", batch_size=64
            )
        if fused:
            prop = ProposeOutlinksPassthrough(self.robots_rules, self.shards)
            ext_ds = ext_ds.map_batches(
                lambda t, _p=prop: _p(t),
                batch_format="pyarrow",
                batch_size=None,  # block granularity: one RPC fan-out/block
            )
        extracted = ext_ds.materialize()
        if os.environ.get("LSR_CRAWL_STATS"):
            import sys as _sys

            print(
                f"==== round {rnd} extract stats ====\n{extracted.stats()}",
                file=_sys.stderr,
            )
        _t = self._tick("fetch_extract", _t)
        n_matched = extracted.count()
        self._bump("fetch_miss", n_fetch - n_matched)

        if self.out_dir:
            out = os.path.join(self.out_dir, f"round={rnd:04d}")
            extracted.drop_columns(["outlinks"]).write_parquet(out)
        _t = self._tick("write_out", _t)

        # ---- R6: frontier update (outlink explode, per-row order keys) ---
        if fused:
            # the explode + canonicalize + propose for round rnd+1 already
            # ran INSIDE the extract launch (ExtractProposeBatch); nothing
            # left to do but signal the loop that the propose barrier is
            # behind us (the extract materialize was the barrier)
            _t = self._tick("outlinks", _t)
            self._checkpoint(rnd, None, proposed=bool(n_matched))
            self._tick("checkpoint", _t)
            return _PROPOSED if n_matched else None

        # LAZY: the explode fuses into the next round's canonicalize launch
        next_frontier = (
            extracted.select_columns(["order_key", "outlinks"]).map_batches(
                explode_outlinks, batch_format="pyarrow"
            )
            if n_matched
            else None
        )
        _t = self._tick("outlinks", _t)

        self._checkpoint(rnd, next_frontier)
        self._tick("checkpoint", _t)
        return next_frontier

    # ------------------------------------------------------------------
    def _checkpoint(
        self,
        rnd: int,
        next_frontier: Optional[rd.Dataset],
        proposed: bool = False,
    ) -> None:
        if not self.ckpt_dir:
            return
        nf_path = None
        if next_frontier is not None:
            nf_path = os.path.join(self.ckpt_dir, f"frontier_round={rnd + 1:04d}")
            next_frontier.write_parquet(nf_path)
        shard_states = ray.get([s.snapshot.remote() for s in self.shards])
        # counters + next_seq + lineage only — NO trace payload: the trace
        # lives in append-only per-round parquet, so manifest size is O(1)
        # per round instead of O(total urls crawled so far)
        manifest = {
            "round": rnd,
            "counters": dict(self.counters),
            "next_seq": self._seq,
            "next_frontier_path": nf_path,
            "next_frontier_rows": self._frontier_rows,
            # fused-propose carryover: round rnd+1's proposals are already
            # resident in the shard snapshots; resume starts it at admit
            "next_proposed": bool(proposed),
            "policy": {
                "max_per_host_per_round": self.policy.max_per_host_per_round,
                "max_rounds": self.policy.max_rounds,
            },
        }
        write_round_checkpoint(self.ckpt_dir, rnd, manifest, None, shard_states)

