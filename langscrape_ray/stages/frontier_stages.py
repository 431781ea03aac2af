"""Frontier stages: canonicalize batch UDF, seen-shard actors, scheduling.

Distributed counterparts of the frontier kernel (SURVEY.md §7.1 R1-R3).
All status/ordering decisions call the same pure functions as the oracle
(frontier/politeness.py, frontier/canonical.py) so the distributed run
reproduces the oracle's crawl order and seen set exactly.
"""

from __future__ import annotations

from typing import Dict, List
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import ray

from langscrape_ray.frontier.bloom import BloomFilter
from langscrape_ray.frontier.canonical import (
    canonicalize_url,
    host_hash64,
    url_hash64,
)
from langscrape_ray.frontier.cuckoo import CuckooFilter

STATUS_OK = "ok"
STATUS_REJECTED_INVALID = "rejected_invalid"
STATUS_REJECTED_ROBOTS = "rejected_robots"


class CanonicalizeBatch:
    """R1+robots: url -> (canon_url, host, url_hash, host_hash, status).

    ``robots_rules``: host -> (disallow_prefix_tuple, crawl_delay_ms) —
    a small broadcast side (frozen dict shipped once per actor).  Robots
    filtering here (not in the scheduler) so rejects never shuffle.
    """

    def __init__(self, robots_rules: Dict[str, tuple]):
        self.robots = robots_rules

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        canons, hosts, uhashes, hhashes, statuses = [], [], [], [], []
        for url in urls:
            res = canonicalize_url(url)
            if res is None:
                canons.append(url or "")
                hosts.append("")
                uhashes.append(0)
                hhashes.append(0)
                statuses.append(STATUS_REJECTED_INVALID)
                continue
            canon, host = res
            rules = self.robots.get(host)
            if rules is not None:
                path = urlsplit(canon).path or "/"
                if any(p and path.startswith(p) for p in rules[0]):
                    canons.append(canon)
                    hosts.append(host)
                    uhashes.append(0)
                    hhashes.append(0)
                    statuses.append(STATUS_REJECTED_ROBOTS)
                    continue
            canons.append(canon)
            hosts.append(host)
            # store 64-bit hashes as signed int64 (two's complement view)
            uhashes.append(np.uint64(url_hash64(canon)).astype(np.int64).item())
            hhashes.append(np.uint64(host_hash64(host)).astype(np.int64).item())
            statuses.append(STATUS_OK)
        cols = {name: batch[name] for name in batch.column_names}
        cols["canon_url"] = pa.array(canons, pa.string())
        cols["host"] = pa.array(hosts, pa.string())
        cols["url_hash"] = pa.array(uhashes, pa.int64())
        cols["host_hash"] = pa.array(hhashes, pa.int64())
        cols["status"] = pa.array(statuses, pa.string())
        return pa.table(cols)


@ray.remote
class SeenShard:
    """One shard of the URL-seen set (shard = host_hash % num_shards, so a
    host's URLs always hit the same shard — SURVEY.md §7.1 R2).

    bloom pre-filter + cuckoo filter membership; ``exact_audit=True``
    additionally keeps the exact hash set and uses it as the authority (the
    sandbox/test configuration — guarantees oracle parity).  At 10^10-URL
    scale set exact_audit=False: membership is the cuckoo filter with
    ~1.2e-4 false-positive rate (a FP URL is skipped as "already seen"),
    bounded memory per shard, and within-round exactness still guaranteed by
    the upstream groupby(url_hash) dedup.
    """

    def __init__(self, shard_id: int, capacity: int, exact_audit: bool = True):
        self.shard_id = shard_id
        self.bloom = BloomFilter(capacity=capacity, fp_rate=0.01)
        self.cuckoo = CuckooFilter(capacity=capacity)
        self.exact = set() if exact_audit else None

    def query(self, keys: List[int]) -> List[bool]:
        """Membership only — NO mutation, so Ray task retries that re-send a
        batch are harmless.  bloom 'definitely new' short-circuits the
        membership probe (the bloom itself is only refreshed in add())."""
        ukeys = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        maybe = self.bloom.contains(ukeys)
        out: List[bool] = []
        for i, key in enumerate(ukeys.tolist()):
            if not maybe[i]:
                out.append(False)
            elif self.exact is not None:
                out.append(key in self.exact)
            else:
                out.append(self.cuckoo.contains(key))
        return out

    def add(self, keys: List[int]) -> int:
        """Idempotent bulk add (a retried add of the same keys is a no-op).
        Returns the number of newly admitted keys."""
        ukeys = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        self.bloom.add(ukeys)
        admitted = 0
        for key in ukeys.tolist():
            if self.exact is not None:
                if key not in self.exact:
                    self.exact.add(key)
                    self.cuckoo.add(key)
                    admitted += 1
            else:
                if not self.cuckoo.check_and_add(key):
                    admitted += 1
        return admitted

    def check_and_add(self, keys: List[int]) -> List[bool]:
        """Single-round-trip query+add (used by unit tests / non-retrying
        callers; the pipeline uses the two-phase query()/add() so task
        retries stay safe)."""
        seen = self.query(keys)
        self.add(keys)
        return seen

    def size(self) -> int:
        return len(self.exact) if self.exact is not None else self.cuckoo.count

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "bloom": self.bloom.state(),
            "cuckoo": self.cuckoo.state(),
            "exact": np.fromiter(self.exact, dtype=np.uint64)
            if self.exact is not None
            else None,
        }

    def restore(self, state: dict) -> None:
        self.shard_id = state["shard_id"]
        self.bloom = BloomFilter.from_state(state["bloom"])
        self.cuckoo = CuckooFilter.from_state(state["cuckoo"])
        self.exact = (
            set(np.asarray(state["exact"], dtype=np.uint64).tolist())
            if state["exact"] is not None
            else None
        )


def _shard_route(batch: pa.Table, num_shards: int):
    hh = np.asarray(batch["host_hash"]).astype(np.uint64)
    return (hh % np.uint64(num_shards)).astype(np.int64)


class SeenCheckBatch:
    """map_batches UDF that routes url_hashes to their shard actor and adds
    a ``seen`` bool column (query-only — retry-safe).  Routing key =
    host_hash % num_shards; one actor round-trip per (batch, shard) pair,
    not per row."""

    def __init__(self, shards: List["ray.actor.ActorHandle"]):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("seen", pa.array([], pa.bool_()))
        uh = batch["url_hash"].to_pylist()
        shard_ids = _shard_route(batch, len(self.shards))
        seen = np.zeros(n, dtype=bool)
        futures = {}
        for sid in np.unique(shard_ids):
            idx = np.nonzero(shard_ids == sid)[0]
            futures[int(sid)] = (idx, self.shards[int(sid)].query.remote([uh[i] for i in idx]))
        for _sid, (idx, fut) in futures.items():
            seen[idx] = ray.get(fut)
        return batch.append_column("seen", pa.array(seen.tolist(), pa.bool_()))


class SeenAddBatch:
    """map_batches UDF: idempotently record every row's url_hash in its
    shard; passes the batch through unchanged.  Run AFTER the admission set
    is materialized, so task retries re-add the same keys (no-op)."""

    def __init__(self, shards: List["ray.actor.ActorHandle"]):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            uh = batch["url_hash"].to_pylist()
            shard_ids = _shard_route(batch, len(self.shards))
            futs = []
            for sid in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == sid)[0]
                futs.append(self.shards[int(sid)].add.remote([uh[i] for i in idx]))
            ray.get(futs)
        return batch
