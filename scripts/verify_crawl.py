"""Verification driver: end-to-end crawl through the public package API."""
import collections
import json
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

from langscrape_ray.sources.fixtures_gen import (
    FixtureConfig, build_pages_table, build_seeds_table, build_robots_table,
    pages_dict, robots_dict, field_rules, host_name,
)
from langscrape_ray.frontier.oracle import oracle_crawl
from langscrape_ray.frontier.politeness import CrawlPolicy
from langscrape_ray.pipelines.crawl import RayCrawl, PagesStore

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
cfg = FixtureConfig(n_pages=300, n_hosts=10, n_seeds=30)
pages, seeds, robots = build_pages_table(cfg), build_seeds_table(cfg), build_robots_table(cfg)
rules_by_host = {host_name(cfg, h): field_rules(cfg, host_name(cfg, h)) for h in range(cfg.n_hosts)}

def make(policy, **kw):
    return RayCrawl(PagesStore(table=pages), robots_dict(robots), field_rules(cfg),
                    rules_by_host, policy, **kw)

if mode == "full":
    res = make(CrawlPolicy(max_rounds=3), out_dir="/tmp/vout").run(seeds)
    otrace, oseen = oracle_crawl(
        list(zip(seeds["url"].to_pylist(), seeds["priority"].to_pylist(), seeds["seed_order"].to_pylist())),
        pages_dict(pages), robots_dict(robots), CrawlPolicy(max_rounds=3))
    ofetched = [(r["seq"], r["url"]) for r in otrace if r["status"] == "fetched"]
    rfetched = [(r["seq"], r["url"]) for r in res["trace_fetched"]]
    print(json.dumps({
        "counters": res["counters"], "seen": res["seen_size"],
        "order_matches_oracle": rfetched == ofetched,
        "oracle_counts": dict(collections.Counter(r["status"] for r in otrace)),
    }))
    # probe: robots disallow — no fetched /shop/ URL on a Disallow: /shop/ host
    shop_hosts = {h for h, t in robots_dict(robots).items() if "Disallow: /shop/" in t}
    bad = [r for r in res["trace_fetched"] if r["host"] in shop_hosts and "/shop/" in r["url"]]
    print("PROBE robots-disallow fetched-shop-rows:", len(bad), "(expect 0); disallow hosts:", len(shop_hosts))
elif mode == "phase1":
    res = make(CrawlPolicy(max_rounds=1), ckpt_dir="/tmp/vckpt").run(seeds)
    print("phase1 trace len:", len(res["trace_fetched"]))
elif mode == "phase2":
    res = make(CrawlPolicy(max_rounds=3), ckpt_dir="/tmp/vckpt").run(seeds, resume=True)
    print(json.dumps({"resumed_counters": res["counters"], "trace_len": len(res["trace_fetched"]),
                      "seen": res["seen_size"]}))
elif mode == "empty":
    import pyarrow as pa
    empty = pa.table({"url": pa.array([], pa.string()),
                      "seed_order": pa.array([], pa.int64()),
                      "priority": pa.array([], pa.int32())})
    res = make(CrawlPolicy(max_rounds=3)).run(empty)
    print("PROBE empty seeds -> rounds:", res["rounds"], "counters:", res["counters"])

ray.shutdown()
