"""Frontier stages: canonicalize batch UDF, seen-shard actors, scheduling.

Distributed counterparts of the frontier kernel (SURVEY.md §7.1 R1-R3).
All status/ordering decisions call the same pure functions as the oracle
(frontier/politeness.py, frontier/canonical.py) so the distributed run
reproduces the oracle's crawl order and seen set exactly.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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
        # host-hash memo: host cardinality is tiny next to URL volume, so
        # the blake2b per host amortizes to a dict hit per row
        self._hh: Dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        canons, hosts, uhashes, hhashes, statuses = [], [], [], [], []
        hh_memo = self._hh
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
                # canon is scheme://netloc + path [+ ?query]: slice the
                # path out directly instead of a second urlsplit
                i = canon.find("/", canon.find("://") + 3)
                path = canon[i:] if i != -1 else "/"
                qi = path.find("?")
                if qi != -1:
                    path = path[:qi]
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
            hh = hh_memo.get(host)
            if hh is None:
                hh = np.uint64(host_hash64(host)).astype(np.int64).item()
                hh_memo[host] = hh
            hhashes.append(hh)
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

    def __init__(
        self,
        shard_id: int,
        capacity: int,
        exact_audit: bool = True,
        delays_by_host: Optional[dict] = None,
        max_per_host_per_round: int = 8,
        default_delay_ms: int = 1000,
    ):
        self.shard_id = shard_id
        self.bloom = BloomFilter(capacity=capacity, fp_rate=0.01)
        self.cuckoo = CuckooFilter(capacity=capacity)
        self.exact = set() if exact_audit else None
        # per-round admission state (propose/admit protocol)
        self.proposals: dict = {}
        # payload-carrying propose (propose_payload_tbl): the min-okey
        # proposer's (url, host, priority) rides along, so admit+enqueue
        # resolves as ONE per-shard RPC at the round barrier instead of a
        # second full pass over the frontier
        self.prop_payload: dict = {}
        self.round_admitted: set = set()
        # fused-propose stats (crawl.py ExtractProposeBatch): per-batch
        # (n_total, n_ok) keyed by a deterministic batch token, so a Ray
        # task retry that re-sends its stats overwrites instead of
        # double-counting — the idempotency twin of min-okey propose
        self.round_stats: dict = {}
        # politeness state (host-affine: shard = host_hash % K, so every URL
        # of a host lands here) — the per-host priority queue + virtual
        # clock live IN the actor, per the frontier design (backlog never
        # round-trips through the driver)
        self.backlog: dict = {}  # host -> list[(url, priority, order_key)]
        self.clocks: dict = {}  # host -> next_free_ms
        self.delays = delays_by_host or {}
        self.max_per_host = max_per_host_per_round
        self.default_delay_ms = default_delay_ms

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

    # -- propose/admit: within-round dedup WITHOUT a groupby shuffle -------
    # Phase 1 (propose) streams every candidate; each shard keeps the MIN
    # order_key per url_hash — min is associative/idempotent, so concurrent
    # batches and Ray task retries are all safe.  Phase 2 (admit), after the
    # propose barrier, admits exactly the min-okey proposer that is not
    # already in the cross-round seen set; the decision is deterministic, so
    # admit retries return the same answer (round_admitted memo).
    def propose(self, keys, okeys) -> int:
        p = self.proposals
        if isinstance(keys, np.ndarray):  # RPC fast path: ndarray payloads
            keys, okeys = keys.tolist(), okeys.tolist()
        for k, o in zip(keys, okeys):
            cur = p.get(k)
            if cur is None or o < cur:
                p[k] = o
        return len(p)

    def propose_payload_tbl(self, tbl: pa.Table) -> int:
        """Payload-carrying propose: like ``propose`` but the winning
        (min order_key) proposer's row payload is retained, so the admit +
        enqueue phase collapses into the single ``admit_enqueue_round``
        RPC — no second pass over the frontier.  Idempotent: min-okey is
        associative and the payload always tracks the current min, so
        re-sent batches (Ray task retries) converge to the same state."""
        p = self.proposals
        pay = self.prop_payload
        keys = tbl["url_hash"].to_pylist()
        okeys = tbl["order_key"].to_pylist()
        urls = tbl["canon_url"].to_pylist()
        hosts = tbl["host"].to_pylist()
        prios = tbl["priority"].to_pylist()
        for k, o, u, h, pr in zip(keys, okeys, urls, hosts, prios):
            cur = p.get(k)
            if cur is None or o < cur:
                p[k] = o
                pay[k] = (u, h, pr)
        return len(p)

    def propose_stats(self, token, n_total: int, n_ok: int) -> None:
        """Record one fused-propose batch's (n_total, n_ok) counter
        contribution under its deterministic token (retry-idempotent)."""
        self.round_stats[token] = (int(n_total), int(n_ok))

    def admit_enqueue_round(self) -> tuple:
        """Resolve the round: admit every proposal winner not in the
        cross-round seen set and push its payload into the politeness
        backlog.  Runs ONCE per shard per round after the propose barrier
        — every entry in ``proposals`` IS its key's min-okey winner, and
        the per-key decisions are independent (unique keys), so dict
        iteration order cannot affect the outcome; downstream scheduling
        totally orders candidates by (-priority, order_key) anyway.
        Deterministic and retry-safe (round_admitted memo).  Returns the
        shard's admitted count this round."""
        backlog = self.backlog
        admitted: List[int] = []
        pay = self.prop_payload
        for k, o in self.proposals.items():
            uk = np.int64(k).astype(np.uint64).item()
            if uk in self.round_admitted:
                continue  # RPC retry
            if self.exact is not None:
                if uk in self.exact:
                    continue
            elif self.cuckoo.contains(uk):
                continue
            u, h, pr = pay[k]
            self.round_admitted.add(uk)
            if self.exact is not None:
                self.exact.add(uk)
            self.cuckoo.add(uk)
            admitted.append(uk)
            backlog.setdefault(h, []).append((u, int(pr), int(o)))
        if admitted:
            self.bloom.add(np.asarray(admitted, dtype=np.uint64))
        n_total = sum(s[0] for s in self.round_stats.values())
        n_ok = sum(s[1] for s in self.round_stats.values())
        return len(self.round_admitted), n_total, n_ok

    def admit(self, keys: List[int], okeys: List[int]) -> List[bool]:
        out: List[bool] = []
        ukeys = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        admitted: List[int] = []
        for (k, o, uk) in zip(keys, okeys, ukeys.tolist()):
            if self.proposals.get(k) != o:
                out.append(False)  # within-round duplicate (lost min-okey)
                continue
            if uk in self.round_admitted:
                out.append(True)  # task retry of the winner
                continue
            if self.exact is not None:
                seen_before = uk in self.exact
            else:
                seen_before = self.cuckoo.contains(uk)
            if seen_before:
                out.append(False)  # cross-round duplicate
                continue
            self.round_admitted.add(uk)
            if self.exact is not None:
                self.exact.add(uk)
            self.cuckoo.add(uk)
            admitted.append(uk)
            out.append(True)
        if admitted:
            self.bloom.add(np.asarray(admitted, dtype=np.uint64))
        return out

    def end_round(self) -> None:
        self.proposals = {}
        self.prop_payload = {}
        self.round_admitted = set()
        self.round_stats = {}

    # -- admit + enqueue into the politeness backlog -----------------------
    def enqueue_admitted(
        self,
        keys: List[int],
        okeys: List[int],
        urls: List[str],
        hosts: List[str],
        priorities: List[int],
    ) -> int:
        """Admit propose-phase winners that are not yet seen, pushing them
        into this shard's per-host backlog.  Idempotent (round_admitted
        memo), so Ray task retries cannot double-enqueue.  Returns rows
        processed (informational)."""
        ukeys = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        admitted: List[int] = []
        backlog = self.backlog
        for k, o, u, h, p, uk in zip(
            keys, okeys, urls, hosts, priorities, ukeys.tolist()
        ):
            if self.proposals.get(k) != o:
                continue  # within-round duplicate (lost min-okey)
            if uk in self.round_admitted:
                continue  # retry of an already-enqueued winner
            if self.exact is not None:
                if uk in self.exact:
                    continue
            elif self.cuckoo.contains(uk):
                continue
            self.round_admitted.add(uk)
            if self.exact is not None:
                self.exact.add(uk)
            self.cuckoo.add(uk)
            admitted.append(uk)
            backlog.setdefault(h, []).append((u, int(p), int(o)))
        if admitted:
            # ONE vectorized bloom update per RPC (a per-row 1-element
            # bloom.add dominated this actor's service time)
            self.bloom.add(np.asarray(admitted, dtype=np.uint64))
        return len(self.round_admitted)

    def enqueue_admitted_tbl(self, tbl: pa.Table) -> int:
        """Arrow-payload variant of enqueue_admitted (the RPC fast path:
        the caller ships one sub-table per shard instead of five Python
        lists; identical admit semantics)."""
        return self.enqueue_admitted(
            tbl["url_hash"].to_pylist(),
            tbl["order_key"].to_pylist(),
            tbl["canon_url"].to_pylist(),
            tbl["host"].to_pylist(),
            tbl["priority"].to_pylist(),
        )

    def schedule_round(self) -> tuple:
        """Schedule every backlogged host for one round (politeness.py
        contract: order by (-priority, order_key), take the per-host budget,
        stamp virtual fetch times, advance the host clock).  Returns
        (fetched_table, n_deferred, n_admitted_this_round)."""
        from langscrape_ray.frontier.politeness import (
            CrawlPolicy,
            schedule_host_round,
        )

        policy = CrawlPolicy(max_per_host_per_round=self.max_per_host)
        out_url, out_host, out_prio, out_okey, out_ms = [], [], [], [], []
        n_deferred = 0
        for host in sorted(self.backlog):
            cands = self.backlog[host]
            if not cands:
                continue
            delay = self.delays.get(host, self.default_delay_ms)
            fetched, deferred, new_free = schedule_host_round(
                self.clocks.get(host, 0), delay, cands, policy
            )
            self.clocks[host] = new_free
            self.backlog[host] = deferred
            n_deferred += len(deferred)
            for u, p, o, ms in fetched:
                out_url.append(u)
                out_host.append(host)
                out_prio.append(p)
                out_okey.append(o)
                out_ms.append(ms)
        tbl = pa.table(
            {
                "canon_url": pa.array(out_url, pa.string()),
                "host": pa.array(out_host, pa.string()),
                "priority": pa.array(out_prio, pa.int64()),
                "order_key": pa.array(out_okey, pa.int64()),
                "fetch_ms": pa.array(out_ms, pa.int64()),
            }
        )
        return tbl, n_deferred, len(self.round_admitted)

    def schedule_round_counts(self) -> tuple:
        """Like schedule_round, but STASHES the fetch table on the actor
        and returns only (n_fetched, n_deferred, n_admitted) — the driver
        never receives the table; `last_fetch_table` hands its ObjectRef
        straight to the distributed ordering pipeline (crawl.py
        _order_round_distributed)."""
        tbl, n_deferred, n_admitted = self.schedule_round()
        self._last_fetch = tbl
        return tbl.num_rows, n_deferred, n_admitted

    def resolve_round(self) -> tuple:
        """ONE per-round barrier RPC: admit this round's proposal winners
        into the politeness backlog, run the per-host scheduler (stashing
        the fetch table on the actor), and clear round state — replacing
        three sequential RPC waves (admit_enqueue_round,
        schedule_round_counts, end_round).  The fixed per-round
        coordination cost is the crawl's Amdahl term at high CPU counts,
        so every removed driver-barrier wave feeds straight into scaling
        efficiency.  Returns (n_fetch, n_deferred, n_admitted, n_total,
        n_ok) — the last two fold the fused-propose batch stats (zeros
        when the driver computed stats itself on the unfused path)."""
        _, n_total, n_ok = self.admit_enqueue_round()
        n_fetch, n_deferred, n_admitted = self.schedule_round_counts()
        self.end_round()
        return n_fetch, n_deferred, n_admitted, n_total, n_ok

    def last_fetch_table(self) -> pa.Table:
        """The fetch table stashed by the most recent
        schedule_round_counts call (empty-schema table if none)."""
        tbl = getattr(self, "_last_fetch", None)
        if tbl is None:
            tbl = pa.table(
                {
                    "canon_url": pa.array([], pa.string()),
                    "host": pa.array([], pa.string()),
                    "priority": pa.array([], pa.int64()),
                    "order_key": pa.array([], pa.int64()),
                    "fetch_ms": pa.array([], pa.int64()),
                }
            )
        return tbl

    def backlog_size(self) -> int:
        return sum(len(v) for v in self.backlog.values())

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
            "backlog": {h: list(v) for h, v in self.backlog.items() if v},
            "clocks": dict(self.clocks),
            # fused-propose carryover: a checkpoint taken after round n's
            # fused extract holds round n+1's pending proposals — resume
            # restores them and starts straight at admit_enqueue_round
            "proposals": dict(self.proposals),
            "prop_payload": dict(self.prop_payload),
            "round_stats": dict(self.round_stats),
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
        self.backlog = {
            h: [tuple(c) for c in v] for h, v in state.get("backlog", {}).items()
        }
        self.clocks = dict(state.get("clocks", {}))
        self.proposals = dict(state.get("proposals", {}))
        self.prop_payload = {
            k: tuple(v) for k, v in state.get("prop_payload", {}).items()
        }
        self.round_stats = dict(state.get("round_stats", {}))
        self.round_admitted = set()


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


class CanonProposeBatch:
    """Fused R1+R2-phase-1: canonicalize + robots-filter + propose, one
    pipeline launch.  Emits ALL rows with a status column (the downstream
    EnqueueBatch drops rejects and its count() yields n_ok for free)."""

    def __init__(self, robots_rules: Dict[str, tuple],
                 shards: List["ray.actor.ActorHandle"]):
        self.canon = CanonicalizeBatch(robots_rules)
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.canon(batch)
        ok_rows = out.filter(pc.equal(out["status"], STATUS_OK))
        if ok_rows.num_rows:
            # numpy payloads: zero-copy off the Arrow columns, C-speed
            # fancy-index per shard, and Ray serializes ndarrays without
            # the per-element cost of Python lists
            uh = ok_rows["url_hash"].to_numpy(zero_copy_only=False)
            ok = ok_rows["order_key"].to_numpy(zero_copy_only=False)
            shard_ids = _shard_route(ok_rows, len(self.shards))
            futs = []
            for sid in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == sid)[0]
                futs.append(
                    self.shards[int(sid)].propose.remote(uh[idx], ok[idx])
                )
            ray.get(futs)
        return out


class CanonProposePayloadBatch:
    """Fully fused R1+R2: canonicalize + robots-filter + payload-carrying
    propose, one pipeline launch — the admit+enqueue phase then resolves
    as one per-shard ``admit_enqueue_round`` RPC at the barrier, so the
    round makes ONE pass over the frontier instead of two (the second
    pass previously re-shipped every surviving row to the shards and was
    bounded by the fixed shard-pool, the crawl's worst-scaling phase).
    Emits one (n_total, n_ok) stats row per batch: materializing the
    stats output IS the propose barrier, and counter sums replace the two
    full-frontier count() passes."""

    def __init__(self, robots_rules: Dict[str, tuple],
                 shards: List["ray.actor.ActorHandle"]):
        self.canon = CanonicalizeBatch(robots_rules)
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.canon(batch)
        ok_rows = out.filter(pc.equal(out["status"], STATUS_OK))
        if ok_rows.num_rows:
            sub_cols = ok_rows.select(
                ["url_hash", "order_key", "canon_url", "host", "priority"]
            )
            shard_ids = _shard_route(ok_rows, len(self.shards))
            futs = []
            for sid in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == sid)[0]
                futs.append(
                    self.shards[int(sid)].propose_payload_tbl.remote(
                        sub_cols.take(pa.array(idx))
                    )
                )
            ray.get(futs)
        return pa.table(
            {
                "n_total": pa.array([out.num_rows], pa.int64()),
                "n_ok": pa.array([ok_rows.num_rows], pa.int64()),
            }
        )


class ProposeBatch:
    """Phase-1 UDF of the propose/admit dedup: stream (url_hash, order_key)
    to the host-routed shard; batch passes through unchanged."""

    def __init__(self, shards: List["ray.actor.ActorHandle"]):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            uh = batch["url_hash"].to_numpy(zero_copy_only=False)
            ok = batch["order_key"].to_numpy(zero_copy_only=False)
            shard_ids = _shard_route(batch, len(self.shards))
            futs = []
            for sid in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == sid)[0]
                futs.append(
                    self.shards[int(sid)].propose.remote(uh[idx], ok[idx])
                )
            ray.get(futs)
        return batch


class AdmitBatch:
    """Phase-2 UDF: adds an ``admitted`` bool column (deterministic winner
    decision; idempotent under task retries)."""

    def __init__(self, shards: List["ray.actor.ActorHandle"]):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("admitted", pa.array([], pa.bool_()))
        uh = batch["url_hash"].to_pylist()
        ok = batch["order_key"].to_pylist()
        shard_ids = _shard_route(batch, len(self.shards))
        admitted = np.zeros(n, dtype=bool)
        futures = {}
        for sid in np.unique(shard_ids):
            idx = np.nonzero(shard_ids == sid)[0]
            futures[int(sid)] = (
                idx,
                self.shards[int(sid)].admit.remote(
                    [uh[i] for i in idx], [ok[i] for i in idx]
                ),
            )
        for _sid, (idx, fut) in futures.items():
            admitted[idx] = ray.get(fut)
        return batch.append_column("admitted", pa.array(admitted.tolist(), pa.bool_()))


class EnqueueBatch:
    """Phase-2 UDF of the actor-resident frontier: route each candidate to
    its host-affine shard for admit+enqueue.  Batch passes through (the
    driver only needs the pipeline to RUN; admitted rows live in the
    shards' backlogs afterwards)."""

    def __init__(self, shards: List["ray.actor.ActorHandle"]):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "status" in batch.column_names:
            batch = batch.filter(pc.equal(batch["status"], STATUS_OK))
        if batch.num_rows:
            # one C-speed take per shard; the sub-table ships as Arrow
            # buffers (no per-element Python list serialization)
            sub_cols = batch.select(
                ["url_hash", "order_key", "canon_url", "host", "priority"]
            )
            shard_ids = _shard_route(batch, len(self.shards))
            futs = []
            for sid in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == sid)[0]
                futs.append(
                    self.shards[int(sid)].enqueue_admitted_tbl.remote(
                        sub_cols.take(pa.array(idx))
                    )
                )
            ray.get(futs)
        return batch.select(["canon_url"])
