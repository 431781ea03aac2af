"""Distributed crawl vs single-process oracle: ordering, seen set, counters,
resume (SURVEY.md §5 items 3-4)."""

import collections

import pytest

from langscrape_ray.frontier.oracle import oracle_crawl
from langscrape_ray.frontier.politeness import CrawlPolicy
from langscrape_ray.sources.fixtures_gen import (
    field_rules,
    host_name,
    pages_dict,
    robots_dict,
)


def _seedlist(seeds):
    return list(
        zip(
            seeds["url"].to_pylist(),
            seeds["priority"].to_pylist(),
            seeds["seed_order"].to_pylist(),
        )
    )


def _make_crawl(small_cfg, pages, robots, policy, **kw):
    from langscrape_ray.pipelines.crawl import PagesStore, RayCrawl

    rules_by_host = {
        host_name(small_cfg, h): field_rules(small_cfg, host_name(small_cfg, h))
        for h in range(small_cfg.n_hosts)
    }
    return RayCrawl(
        PagesStore(table=pages),
        robots_dict(robots),
        field_rules(small_cfg),
        rules_by_host,
        policy,
        **kw,
    )


@pytest.fixture(scope="module")
def oracle_result(small_world):
    pages, seeds, robots = small_world
    policy = CrawlPolicy(max_rounds=3)
    trace, seen = oracle_crawl(
        _seedlist(seeds), pages_dict(pages), robots_dict(robots), policy
    )
    return trace, seen


def test_crawl_matches_oracle(ray_session, small_cfg, small_world, oracle_result):
    pages, seeds, robots = small_world
    otrace, oseen = oracle_result
    crawl = _make_crawl(small_cfg, pages, robots, CrawlPolicy(max_rounds=3))
    res = crawl.run(seeds)

    ofetched = [(r["seq"], r["url"]) for r in otrace if r["status"] == "fetched"]
    rfetched = [(r["seq"], r["url"]) for r in res["trace_fetched"]]
    assert rfetched == ofetched  # exact crawl-order reproduction

    assert res["seen_size"] == len(oseen)  # final URL-seen set size

    oc = collections.Counter(r["status"] for r in otrace)
    for key in ("rejected", "deduped", "fetched", "deferred"):
        assert res["counters"].get(key, 0) == oc.get(key, 0), key


def test_crawl_resume_identical(ray_session, small_cfg, small_world, tmp_path_factory):
    """Kill-after-round-0 then resume == uninterrupted run (BASELINE.md
    resumability target)."""
    pages, seeds, robots = small_world

    full = _make_crawl(small_cfg, pages, robots, CrawlPolicy(max_rounds=3))
    full_res = full.run(seeds)

    ck = str(tmp_path_factory.mktemp("crawl_ckpt"))
    partial = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=1), ckpt_dir=ck
    )
    partial.run(seeds)  # "killed" after round 0 (checkpoint complete)

    resumed = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=3), ckpt_dir=ck
    )
    res2 = resumed.run(seeds, resume=True)

    assert res2["trace_fetched"] == full_res["trace_fetched"]
    assert res2["seen_size"] == full_res["seen_size"]
    assert res2["counters"] == full_res["counters"]


def test_crawl_fused_vs_unfused_parity(ray_session, small_cfg, small_world,
                                       oracle_result):
    """fuse_propose=True (round n's extract launch also explodes +
    canonicalizes + proposes round n+1 — ONE Dataset launch per round)
    must be bit-identical to the unfused two-launch path AND to the
    oracle: trace, counters, seen set."""
    pages, seeds, robots = small_world
    policy = CrawlPolicy(max_rounds=3)
    fused = _make_crawl(small_cfg, pages, robots, policy).run(seeds)
    unfused = _make_crawl(
        small_cfg, pages, robots, policy, fuse_propose=False
    ).run(seeds)
    assert fused["trace_fetched"] == unfused["trace_fetched"]
    assert fused["counters"] == unfused["counters"]
    assert fused["seen_size"] == unfused["seen_size"]
    otrace, _ = oracle_result
    ofetched = [(r["seq"], r["url"]) for r in otrace if r["status"] == "fetched"]
    assert [(r["seq"], r["url"]) for r in fused["trace_fetched"]] == ofetched


def test_crawl_resume_from_fused_checkpoint(ray_session, small_cfg, small_world,
                                            tmp_path_factory):
    """A checkpoint taken after a FUSED round carries round n+1's pending
    proposals inside the shard snapshots (manifest next_proposed=True);
    resume must start that round at the admit barrier and reproduce the
    uninterrupted run exactly."""
    import os
    import shutil

    pages, seeds, robots = small_world
    full = _make_crawl(small_cfg, pages, robots, CrawlPolicy(max_rounds=3)).run(
        seeds
    )

    ck = str(tmp_path_factory.mktemp("crawl_ckpt_fused"))
    # max_rounds=2 so round 0 FUSES (1 < 2); then discard round 1's
    # checkpoint to simulate a kill right after the fused round 0
    _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=2), ckpt_dir=ck
    ).run(seeds)
    shutil.rmtree(os.path.join(ck, "round=0001"))
    import json

    with open(os.path.join(ck, "round=0000", "manifest.json")) as f:
        assert json.load(f)["next_proposed"] is True

    resumed = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=3), ckpt_dir=ck
    ).run(seeds, resume=True)
    assert resumed["trace_fetched"] == full["trace_fetched"]
    assert resumed["counters"] == full["counters"]
    assert resumed["seen_size"] == full["seen_size"]


def test_fused_propose_retry_idempotent(ray_session):
    """A Ray task retry re-runs ProposeOutlinksPassthrough on the SAME
    extracted batch: min-order-key propose and token-keyed stats must
    make the duplicate invisible — resolve_round returns identical
    (n_fetch, n_deferred, n_admitted, n_total, n_ok) as a single call."""
    import pyarrow as pa

    from langscrape_ray.pipelines.crawl import ProposeOutlinksPassthrough
    from langscrape_ray.stages.frontier_stages import SeenShard

    def run(calls: int) -> tuple:
        shards = [
            SeenShard.remote(i, 10_000, True, delays_by_host={},
                             max_per_host_per_round=50, default_delay_ms=0)
            for i in range(2)
        ]
        batch = pa.table(
            {
                "order_key": pa.array([11, 22], pa.int64()),
                "outlinks": pa.array(
                    [
                        ["http://a.example/x", "http://b.example/y"],
                        ["http://a.example/x", "http://c.example/z"],
                    ],
                    pa.list_(pa.string()),
                ),
            }
        )
        prop = ProposeOutlinksPassthrough({}, shards)
        for _ in range(calls):
            out = prop(batch)
            assert out is batch  # zero-copy passthrough
        res = ray.get([s.resolve_round.remote() for s in shards])
        agg = tuple(sum(r[i] for r in res) for i in range(5))
        backlog = sum(ray.get([s.backlog_size.remote() for s in shards]))
        return agg + (backlog,)

    import ray

    once = run(1)
    thrice = run(3)
    assert once == thrice
    # 4 links proposed, 3 distinct after min-okey dedup
    n_fetch, n_deferred, n_admitted, n_total, n_ok = once[:5]
    assert (n_total, n_ok, n_admitted) == (4, 4, 3)


def test_crawl_matches_oracle_deferred_heavy(ray_session, small_cfg, small_world):
    """Tight politeness budget (2/host/round, 5 rounds): the deferred
    backlog dominates — exercises the actor-resident queue ordering across
    rounds against the oracle."""
    pages, seeds, robots = small_world
    policy = CrawlPolicy(max_per_host_per_round=2, max_rounds=5)
    otrace, oseen = oracle_crawl(
        _seedlist(seeds), pages_dict(pages), robots_dict(robots), policy
    )
    crawl = _make_crawl(small_cfg, pages, robots, policy)
    res = crawl.run(seeds)
    ofetched = [(r["seq"], r["url"]) for r in otrace if r["status"] == "fetched"]
    rfetched = [(r["seq"], r["url"]) for r in res["trace_fetched"]]
    assert rfetched == ofetched
    assert res["seen_size"] == len(oseen)
    oc = collections.Counter(r["status"] for r in otrace)
    for key in ("rejected", "deduped", "fetched", "deferred"):
        assert res["counters"].get(key, 0) == oc.get(key, 0), key


def test_resume_ignores_incomplete_round_dir(ray_session, small_cfg, small_world,
                                             tmp_path_factory):
    """An interrupted round (dir without the _COMPLETE sentinel) must be
    ignored: resume restarts from the last COMPLETE round and still produces
    the uninterrupted result."""
    import os
    import shutil

    pages, seeds, robots = small_world
    full = _make_crawl(small_cfg, pages, robots, CrawlPolicy(max_rounds=3))
    full_res = full.run(seeds)

    ck = str(tmp_path_factory.mktemp("crawl_ckpt2"))
    partial = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=1), ckpt_dir=ck
    )
    partial.run(seeds)
    # simulate a crash mid-round-1: a round dir exists but no _COMPLETE
    crashed = os.path.join(ck, "round=0001")
    shutil.copytree(os.path.join(ck, "round=0000"), crashed)
    os.remove(os.path.join(crashed, "_COMPLETE"))

    resumed = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=3), ckpt_dir=ck
    )
    res2 = resumed.run(seeds, resume=True)
    assert res2["trace_fetched"] == full_res["trace_fetched"]
    assert res2["counters"] == full_res["counters"]


def test_crawl_cuckoo_only_mode(ray_session, small_cfg, small_world):
    """exact_audit=False: membership is the cuckoo filter alone (the
    10^10-scale memory configuration).  With its ~1e-4 FP rate the result
    should still match the oracle at this scale; allow a tiny FP budget so
    the test is not flaky by construction."""
    pages, seeds, robots = small_world
    policy = CrawlPolicy(max_rounds=3)
    otrace, oseen = oracle_crawl(
        _seedlist(seeds), pages_dict(pages), robots_dict(robots), policy
    )
    crawl = _make_crawl(small_cfg, pages, robots, policy, exact_audit=False)
    res = crawl.run(seeds)
    n_oracle = sum(1 for r in otrace if r["status"] == "fetched")
    assert abs(res["counters"]["fetched"] - n_oracle) <= 2
    assert abs(res["seen_size"] - len(oseen)) <= 2


def test_crawl_partitioned_store_parity(ray_session, small_cfg, small_world,
                                        tmp_path_factory):
    """PagesStore(partitioned=True) — shard=N parquet dirs loaded by one Ray
    task per shard, no driver materialization — must reproduce the in-memory
    table store exactly (trace, counters, seen set)."""
    from langscrape_ray.pipelines.crawl import PagesStore, RayCrawl
    from langscrape_ray.sources.pages_cache import (
        PAGES_SHARDS,
        build_pages_parquet,
    )
    from langscrape_ray.sources.fixtures_gen import field_rules

    pages, seeds, robots = small_world
    base = str(tmp_path_factory.mktemp("pages_cache"))
    path = build_pages_parquet(small_cfg, path=f"{base}/pages")
    policy = CrawlPolicy(max_rounds=3)

    def run(store):
        crawl = RayCrawl(
            store, robots_dict(robots), field_rules(small_cfg), None, policy
        )
        return crawl.run(seeds)

    r_tbl = run(PagesStore(table=pages))
    r_part = run(
        PagesStore(path=path, partitioned=True, num_shards=PAGES_SHARDS)
    )
    assert r_part["trace_fetched"] == r_tbl["trace_fetched"]
    assert r_part["counters"] == r_tbl["counters"]
    assert r_part["seen_size"] == r_tbl["seen_size"]


def test_crawl_distributed_ordering_parity(ray_session, small_cfg, small_world):
    """dist_order_threshold=0 forces the distributed ordering path
    (Dataset.sort + per-block prefix-sum seq assign + part-file trace +
    multi-shard lookup) — must equal the driver-ordered run exactly."""
    pages, seeds, robots = small_world
    policy = CrawlPolicy(max_rounds=3)
    base = _make_crawl(small_cfg, pages, robots, policy).run(seeds)
    dist = _make_crawl(
        small_cfg, pages, robots, policy, dist_order_threshold=0
    ).run(seeds)
    assert dist["trace_fetched"] == base["trace_fetched"]
    assert dist["counters"] == base["counters"]
    assert dist["seen_size"] == base["seen_size"]


def test_crawl_distributed_ordering_resume(ray_session, small_cfg, small_world,
                                           tmp_path_factory):
    """Kill-after-round-0 + resume, with BOTH phases on the distributed
    ordering path: identical to the uninterrupted distributed run."""
    pages, seeds, robots = small_world
    full = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=3),
        dist_order_threshold=0,
    ).run(seeds)

    ck = str(tmp_path_factory.mktemp("crawl_ckpt_dist"))
    _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=1),
        ckpt_dir=ck, dist_order_threshold=0,
    ).run(seeds)
    resumed = _make_crawl(
        small_cfg, pages, robots, CrawlPolicy(max_rounds=3),
        ckpt_dir=ck, dist_order_threshold=0,
    ).run(seeds, resume=True)
    assert resumed["trace_fetched"] == full["trace_fetched"]
    assert resumed["counters"] == full["counters"]
    assert resumed["seen_size"] == full["seen_size"]


def test_crawl_nonresident_store_parity(ray_session, small_cfg, small_world,
                                        tmp_path_factory):
    """resident=False: no shard pinned in plasma — every lookup is a
    predicate-pushdown read of its shard directory (the pages >> cluster
    RAM configuration).  Must equal the in-memory run exactly."""
    from langscrape_ray.pipelines.crawl import PagesStore, RayCrawl
    from langscrape_ray.sources.pages_cache import (
        PAGES_SHARDS,
        build_pages_parquet,
    )
    from langscrape_ray.sources.fixtures_gen import field_rules

    pages, seeds, robots = small_world
    base_dir = str(tmp_path_factory.mktemp("pages_cache_nr"))
    path = build_pages_parquet(small_cfg, path=f"{base_dir}/pages")
    policy = CrawlPolicy(max_rounds=3)

    def run(store):
        return RayCrawl(
            store, robots_dict(robots), field_rules(small_cfg), None, policy
        ).run(seeds)

    base = run(PagesStore(table=pages))
    nr = run(
        PagesStore(path=path, partitioned=True, num_shards=PAGES_SHARDS,
                   resident=False)
    )
    assert nr["trace_fetched"] == base["trace_fetched"]
    assert nr["counters"] == base["counters"]
    assert nr["seen_size"] == base["seen_size"]


def test_pages_store_shard_count_mismatch_raises(tmp_path):
    """partitioned=True with a num_shards smaller than the cache's on-disk
    shard=N layout would silently drop every lookup as fetch_miss — it must
    raise instead (round-2 advisory).  Larger K is fine (small caches leave
    top shards empty)."""
    import os

    import pytest as _pytest

    from langscrape_ray.pipelines.crawl import PagesStore

    path = tmp_path / "pages"
    for s in range(4):
        os.makedirs(path / f"shard={s}")
    with _pytest.raises(ValueError):
        PagesStore(path=str(path), partitioned=True, num_shards=2)
    PagesStore(path=str(path), partitioned=True, num_shards=4)
    PagesStore(path=str(path), partitioned=True, num_shards=8)


def test_crawl_hot_host_skew_parity(ray_session):
    """EXTREME hot-host skew (one host holds 70% of all pages — the
    north-rule's 10^10-frontier failure mode): the distributed crawl must
    still reproduce the oracle exactly, AND the politeness budget must
    bound the hot host's per-round fetch share — the mechanism that
    breaks skew at scale (hash(host) spreads hosts across shards; within
    a shard the per-host queue caps work, so no worker drowns)."""
    from langscrape_ray.sources.fixtures_gen import (
        FixtureConfig,
        build_pages_table,
        build_robots_table,
        build_seeds_table,
    )

    cfg = FixtureConfig(
        n_pages=400, n_hosts=8, n_seeds=24, hot_host_share=0.7, seed=17
    )
    pages = build_pages_table(cfg)
    seeds = build_seeds_table(cfg)
    robots = build_robots_table(cfg)
    policy = CrawlPolicy(max_rounds=3)

    otrace, oseen = oracle_crawl(
        _seedlist(seeds), pages_dict(pages), robots_dict(robots), policy
    )
    crawl = _make_crawl(cfg, pages, robots, policy)
    res = crawl.run(seeds)

    ofetched = [(r["seq"], r["url"]) for r in otrace if r["status"] == "fetched"]
    assert [(r["seq"], r["url"]) for r in res["trace_fetched"]] == ofetched
    assert res["seen_size"] == len(oseen)
    oc = collections.Counter(r["status"] for r in otrace)
    for key in ("rejected", "deduped", "fetched", "deferred"):
        assert res["counters"].get(key, 0) == oc.get(key, 0), key

    # the skew-breaking property: per round, the hot host fetches at most
    # the politeness budget, regardless of owning 70% of the frontier
    hot = host_name(cfg, 0)
    per_round = collections.Counter()
    for r in res["trace_fetched"]:
        if f"//{hot}/" in r["url"]:
            per_round[r["round"]] += 1
    assert per_round, "hot host never fetched — fixture drifted"
    assert all(v <= policy.max_per_host_per_round for v in per_round.values())
    # and the skew actually exists in the world: the hot host dominates
    hot_pages = sum(1 for u in pages["url"].to_pylist() if f"//{hot}/" in u)
    assert hot_pages >= int(0.6 * pages.num_rows)
