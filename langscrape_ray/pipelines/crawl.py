"""The flagship pipeline: multi-round Ray Data crawl over a pages table.

Implements SURVEY.md §7.1 (R1-R7) as a batch-iterative loop — each frontier
round is one Ray Data pipeline pass (the reference's analog is the
sequential per-URL loop, /root/reference/scripts/run.py:63-98):

    R1 canonicalize + robots     map_batches (stateless, Arrow)
    R2 within-round dedup        groupby(url_hash) min-order-key (the one
                                 required shuffle) + seen-shard actor query
    R3 politeness scheduling     groupby(host) map_groups with virtual-time
                                 host clocks (politeness.py contract)
    R4 fetch (simulated)         filtered read of the pages table on the
                                 round's bounded fetch list
    R5 extract                   map_batches(ExtractPages) actor pool
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
from langscrape_ray.frontier.politeness import CrawlPolicy, schedule_host_round
from langscrape_ray.frontier.robots import DEFAULT_CRAWL_DELAY_MS, parse_robots
from langscrape_ray.stages.extract import ExtractPages
from langscrape_ray.stages.frontier_stages import (
    STATUS_OK,
    CanonicalizeBatch,
    SeenAddBatch,
    SeenCheckBatch,
    SeenShard,
)
from langscrape_ray.state.checkpoint import (
    last_complete_round,
    read_round_checkpoint,
    write_round_checkpoint,
)

_FRONTIER_SCHEMA = {"url": pa.string(), "priority": pa.int64(), "order_key": pa.int64()}


class PagesStore:
    """Simulated web: lookup html by canonical url (SURVEY.md §2.4 J5).

    Parquet-backed: a filtered ``read_parquet`` (predicate pushdown on url)
    per round — the round's fetch list is bounded by the politeness budget,
    so this is a selective scan, not O(pages) per round when row groups are
    url-sorted.  At real scale this becomes a bucketed hash join on
    url_hash; the in-memory variant serves tests.
    """

    def __init__(self, path: Optional[str] = None, table: Optional[pa.Table] = None):
        assert (path is None) != (table is None)
        self.path = path
        self.table = table

    def fetch(self, urls: List[str]) -> rd.Dataset:
        if self.path is not None:
            return rd.read_parquet(
                self.path,
                columns=["url", "html", "warc_ts"],
                filter=pc.field("url").isin(urls),
            )
        tbl = self.table.select(["url", "html", "warc_ts"])
        mask = pc.is_in(tbl["url"], value_set=pa.array(urls, pa.string()))
        return rd.from_arrow(tbl.filter(mask))


class RayCrawl:
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
    ):
        self.pages = pages
        self.policy = policy or CrawlPolicy()
        self.default_rules = default_rules
        self.rules_by_host = rules_by_host or {}
        self.out_dir = out_dir
        self.ckpt_dir = ckpt_dir
        self.exact_audit = exact_audit
        self.extract_concurrency = extract_concurrency
        # robots parsed once; broadcast as a plain dict (small side).  At
        # 10^8-host scale this becomes a host-partitioned join table.
        self.robots_rules = {
            h: (r.disallow, r.crawl_delay_ms)
            for h, r in ((h, parse_robots(t)) for h, t in robots_txt_by_host.items())
        }
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(i, seen_capacity, exact_audit) for i in range(num_shards)
        ]
        self.host_clocks: Dict[str, int] = {}
        self.counters: Dict[str, int] = {}
        self.trace_fetched: List[dict] = []
        self._seq = 0

    # ------------------------------------------------------------------
    def _bump(self, key: str, n: int) -> None:
        self.counters[key] = self.counters.get(key, 0) + int(n)

    def _delay_for(self, host: str) -> int:
        rules = self.robots_rules.get(host)
        return rules[1] if rules else DEFAULT_CRAWL_DELAY_MS

    # ------------------------------------------------------------------
    def run(
        self, seeds: pa.Table, resume: bool = False
    ) -> Dict[str, object]:
        """Run the crawl to completion (or policy.max_rounds).

        ``seeds``: table (url, seed_order, priority).  Returns a summary dict
        with counters, the ordered fetched trace, and rounds executed.
        """
        start_round = 0
        carryover: Optional[pa.Table] = None
        frontier: Optional[rd.Dataset] = rd.from_arrow(
            pa.table(
                {
                    "url": seeds["url"],
                    "priority": pc.cast(seeds["priority"], pa.int64()),
                    "order_key": pc.cast(seeds["seed_order"], pa.int64()),
                }
            )
        )
        if resume and self.ckpt_dir:
            last = last_complete_round(self.ckpt_dir)
            if last is not None:
                manifest, carryover, shard_states = read_round_checkpoint(
                    self.ckpt_dir, last
                )
                self.host_clocks = {
                    k: int(v) for k, v in manifest["host_clocks"].items()
                }
                self.counters = {k: int(v) for k, v in manifest["counters"].items()}
                self.trace_fetched = manifest["trace_fetched"]
                self._seq = int(manifest["next_seq"])
                if shard_states:
                    ray.get(
                        [
                            s.restore.remote(st)
                            for s, st in zip(self.shards, shard_states)
                        ]
                    )
                start_round = last + 1
                nf_path = manifest.get("next_frontier_path")
                frontier = rd.read_parquet(nf_path) if nf_path else None

        rnd = start_round
        while rnd < self.policy.max_rounds:
            if (frontier is None) and (carryover is None or carryover.num_rows == 0):
                break
            frontier, carryover = self._run_round(rnd, frontier, carryover)
            rnd += 1

        return {
            "rounds": rnd,
            "counters": dict(self.counters),
            "trace_fetched": list(self.trace_fetched),
            "seen_size": sum(ray.get([s.size.remote() for s in self.shards])),
            "out_dir": self.out_dir,
        }

    # ------------------------------------------------------------------
    def _run_round(
        self, rnd: int, frontier: Optional[rd.Dataset], carryover: Optional[pa.Table]
    ) -> Tuple[Optional[rd.Dataset], Optional[pa.Table]]:
        # ---- R1/R2: canonicalize + robots + dedup + seen-filter ----------
        admitted_tbl = pa.table(
            {
                "canon_url": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "priority": pa.array([], pa.int64()),
                "order_key": pa.array([], pa.int64()),
                "url_hash": pa.array([], pa.int64()),
            }
        )
        if frontier is not None:
            canon = frontier.map_batches(
                CanonicalizeBatch(self.robots_rules), batch_format="pyarrow"
            ).materialize()
            n_total = canon.count()
            ok = canon.map_batches(
                lambda t: t.filter(pc.equal(t["status"], STATUS_OK)),
                batch_format="pyarrow",
            )
            n_ok = ok.count()
            self._bump("rejected", n_total - n_ok)

            # within-round dedup: min order_key per url_hash (order-free).
            def _min_okey(g: pd.DataFrame) -> pd.DataFrame:
                return g.nsmallest(1, "order_key")

            winners = ok.groupby("url_hash").map_groups(
                _min_okey, batch_format="pandas"
            )
            checked = winners.map_batches(
                SeenCheckBatch(self.shards), batch_format="pyarrow"
            ).materialize()
            n_winners = checked.count()
            new = checked.map_batches(
                lambda t: t.filter(pc.invert(t["seen"])), batch_format="pyarrow"
            ).materialize()
            n_new = new.count()
            # record admissions idempotently AFTER the admission set is fixed
            new.map_batches(SeenAddBatch(self.shards), batch_format="pyarrow").count()
            self._bump("deduped", (n_ok - n_winners) + (n_winners - n_new))

            if n_new:
                admitted_tbl = _to_table(new).select(
                    ["canon_url", "host", "priority", "order_key", "url_hash"]
                )

        if carryover is not None and carryover.num_rows:
            admitted_tbl = pa.concat_tables(
                [admitted_tbl, carryover.select(admitted_tbl.column_names)]
            )

        if admitted_tbl.num_rows == 0:
            self._checkpoint(rnd, None, None)
            return None, None

        # ---- R3: politeness scheduling (groupby host — the shuffle) ------
        clocks = dict(self.host_clocks)
        delays = {h: self._delay_for(h) for h in set(admitted_tbl["host"].to_pylist())}
        policy = self.policy

        def _schedule(g: pd.DataFrame) -> pd.DataFrame:
            host = g["host"].iloc[0]
            cands = list(zip(g["canon_url"], g["priority"], g["order_key"]))
            fetched, deferred, _free = schedule_host_round(
                clocks.get(host, 0), delays.get(host, DEFAULT_CRAWL_DELAY_MS),
                [(u, int(p), int(o)) for u, p, o in cands], policy,
            )
            rows = [
                {"canon_url": u, "host": host, "priority": p, "order_key": o,
                 "fetch_ms": ms, "kind": "fetch"}
                for u, p, o, ms in fetched
            ] + [
                {"canon_url": u, "host": host, "priority": p, "order_key": o,
                 "fetch_ms": -1, "kind": "defer"}
                for u, p, o in deferred
            ]
            return pd.DataFrame(rows)

        sched_ds = (
            rd.from_arrow(admitted_tbl)
            .groupby("host")
            .map_groups(_schedule, batch_format="pandas")
            .materialize()
        )
        sched = _to_table(sched_ds)
        fetch_tbl = sched.filter(pc.equal(sched["kind"], "fetch"))
        defer_tbl = sched.filter(pc.equal(sched["kind"], "defer"))
        self._bump("deferred", defer_tbl.num_rows)
        self._bump("fetched", fetch_tbl.num_rows)

        # advance host clocks from fetch counts (driver-side; the per-host
        # clock table is tiny relative to the frontier)
        hosts_fetched = fetch_tbl["host"].to_pylist()
        for host in hosts_fetched:
            self.host_clocks[host] = self.host_clocks.get(host, 0) + self._delay_for(host)

        # global crawl order: (fetch_ms, -priority, order_key) — computed
        fetch_pd = fetch_tbl.to_pandas().sort_values(
            ["fetch_ms", "priority", "order_key"], ascending=[True, False, True]
        )
        meta: Dict[str, dict] = {}
        for _i, row in fetch_pd.iterrows():
            meta[row["canon_url"]] = {
                "seq": self._seq,
                "round": rnd,
                "priority": int(row["priority"]),
                "order_key": int(row["order_key"]),
                "fetch_ms": int(row["fetch_ms"]),
            }
            self.trace_fetched.append(
                {
                    "seq": self._seq,
                    "url": row["canon_url"],
                    "host": row["host"],
                    "round": rnd,
                    "fetch_ms": int(row["fetch_ms"]),
                    "priority": int(row["priority"]),
                    "order_key": int(row["order_key"]),
                }
            )
            self._seq += 1

        # ---- R4/R5: fetch + extract --------------------------------------
        urls = fetch_pd["canon_url"].tolist()
        pages_ds = self.pages.fetch(urls)
        meta_ref = ray.put(meta)

        class AttachMeta:
            def __init__(self, ref):
                self.meta = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                m = [self.meta[u] for u in batch["url"].to_pylist()]
                for key in ("seq", "round", "priority", "order_key", "fetch_ms"):
                    batch = batch.append_column(
                        key, pa.array([x[key] for x in m], pa.int64())
                    )
                return batch

        map_kwargs = {}
        if self.extract_concurrency:
            map_kwargs["concurrency"] = self.extract_concurrency
        extracted = (
            pages_ds.map_batches(AttachMeta(meta_ref), batch_format="pyarrow")
            .map_batches(
                ExtractPages(self.default_rules, self.rules_by_host),
                batch_format="pyarrow",
                batch_size=64,
                **map_kwargs,
            )
            .materialize()
        )
        n_matched = extracted.count()
        self._bump("fetch_miss", fetch_tbl.num_rows - n_matched)

        if self.out_dir:
            out = os.path.join(self.out_dir, f"round={rnd:04d}")
            extracted.drop_columns(["outlinks"]).write_parquet(out)

        # ---- R6: frontier update (outlink explode, per-row order keys) ---
        def _explode(batch: pa.Table) -> pa.Table:
            urls_out: List[str] = []
            okeys: List[int] = []
            for okey, links in zip(
                batch["order_key"].to_pylist(), batch["outlinks"].to_pylist()
            ):
                for pos, link in enumerate(links):
                    urls_out.append(link)
                    okeys.append(outlink_order_key(int(okey), pos))
            return pa.table(
                {
                    "url": pa.array(urls_out, pa.string()),
                    "priority": pa.array([0] * len(urls_out), pa.int64()),
                    "order_key": pa.array(okeys, pa.int64()),
                }
            )

        next_frontier = extracted.select_columns(["order_key", "outlinks"]).map_batches(
            _explode, batch_format="pyarrow"
        ).materialize()
        if next_frontier.count() == 0:
            next_frontier = None

        carry_out = None
        if defer_tbl.num_rows:
            from langscrape_ray.frontier.canonical import url_hash64

            carry_out = defer_tbl.select(
                ["canon_url", "host", "priority", "order_key"]
            ).append_column(
                "url_hash",
                pa.array(
                    [
                        np.uint64(url_hash64(u)).astype(np.int64).item()
                        for u in defer_tbl["canon_url"].to_pylist()
                    ],
                    pa.int64(),
                ),
            )

        self._checkpoint(rnd, carry_out, next_frontier)
        return next_frontier, carry_out

    # ------------------------------------------------------------------
    def _checkpoint(
        self,
        rnd: int,
        carryover: Optional[pa.Table],
        next_frontier: Optional[rd.Dataset],
    ) -> None:
        if not self.ckpt_dir:
            return
        nf_path = None
        if next_frontier is not None:
            nf_path = os.path.join(self.ckpt_dir, f"frontier_round={rnd + 1:04d}")
            next_frontier.write_parquet(nf_path)
        shard_states = ray.get([s.snapshot.remote() for s in self.shards])
        manifest = {
            "round": rnd,
            "counters": dict(self.counters),
            "host_clocks": dict(self.host_clocks),
            "trace_fetched": list(self.trace_fetched),
            "next_seq": self._seq,
            "next_frontier_path": nf_path,
            "policy": {
                "max_per_host_per_round": self.policy.max_per_host_per_round,
                "max_rounds": self.policy.max_rounds,
            },
        }
        write_round_checkpoint(self.ckpt_dir, rnd, manifest, carryover, shard_states)


def _to_table(ds: rd.Dataset) -> pa.Table:
    """Materialize a (small, bounded) dataset to one Arrow table."""
    tables = [ray.get(ref) for ref in ds.to_arrow_refs()]
    nonempty = [t for t in tables if t.num_rows]
    if not nonempty:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(nonempty, promote_options="default")
