"""Single-process oracle crawler — the correctness reference for the
distributed frontier (FIXTURES.md §6 oracle_crawl).

Implements exactly the semantics the Ray pipeline must reproduce:
canonicalize -> reject invalid/robots-disallowed -> dedup against the seen
set -> per-host politeness scheduling (politeness.py contract) -> simulated
fetch from the pages table -> outlink discovery -> next round.  The
reference analog of "crawl order" is its sequential input-order loop
(/root/reference/scripts/run.py:63); here order is the computed virtual-time
schedule.

Status vocabulary (FIXTURES.md §6): fetched | deduped | deferred | rejected.
Deferred URLs re-enter the next round without re-dedup (they are already in
the seen set).  A fetched URL missing from the pages table still counts as
fetched (empty content, no outlinks).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from langscrape_ray.frontier.canonical import (
    canonicalize_url,
    outlink_order_key,
    url_hash64,
)
from langscrape_ray.frontier.politeness import CrawlPolicy, HostScheduler
from langscrape_ray.frontier.robots import RobotsRules, parse_robots


def oracle_crawl(
    seeds: Iterable[Tuple[str, int, int]],
    pages: Dict[str, bytes],
    robots: Optional[Dict[str, str]] = None,
    policy: Optional[CrawlPolicy] = None,
    outlink_fn=None,
) -> Tuple[List[dict], set]:
    """Run the full crawl in-process.

    seeds: iterable of (url, priority, seed_order).
    pages: canonical_url -> raw html bytes (the simulated web).
    robots: host -> robots.txt body.
    outlink_fn: canonical_url, html -> list[str] (defaults to the kernel's
        extract_outlinks over the raw DOM).

    Returns (trace_rows, seen_url_hash_set).  trace rows:
    {seq, url, host, round, status, fetch_ms, priority, order_key}; ``seq``
    is -1 for non-fetched statuses.
    """
    from langscrape_ray.kernel.dom import parse_html
    from langscrape_ray.kernel.extract import extract_outlinks

    policy = policy or CrawlPolicy()
    robots = robots or {}
    rules_cache: Dict[str, RobotsRules] = {}

    def host_rules(host: str) -> RobotsRules:
        if host not in rules_cache:
            rules_cache[host] = parse_robots(robots.get(host))
        return rules_cache[host]

    if outlink_fn is None:

        def outlink_fn(url: str, html: bytes) -> List[str]:
            return extract_outlinks(parse_html(html), url)

    sched = HostScheduler(policy)
    seen: set = set()
    trace: List[dict] = []
    seq = 0

    # (url, priority, order_key) in the NEW queue; carryover holds
    # already-admitted (host, canon, priority, order_key) rows.  Order keys
    # are seed_order for seeds and outlink_order_key(parent, pos) for
    # discovered links — per-row computable, identical in the engine.
    new_queue: List[Tuple[str, int, int]] = [
        (url, int(priority), int(seed_order)) for url, priority, seed_order in seeds
    ]
    carryover: List[Tuple[str, str, int, int]] = []

    for rnd in range(policy.max_rounds):
        if not new_queue and not carryover:
            break
        per_host: Dict[str, List[Tuple[str, int, int]]] = {}
        for host, canon, prio, okey in carryover:
            per_host.setdefault(host, []).append((canon, prio, okey))
        carryover = []

        # Admission, mirroring the engine exactly: validate/robots-filter each
        # candidate, then resolve within-round duplicates by MIN order_key
        # (groupby(url_hash).min semantics — order-independent), then check
        # the cross-round seen set.
        from urllib.parse import urlsplit

        kept: Dict[str, List[Tuple[int, int, str]]] = {}
        for url, prio, okey in new_queue:
            res = canonicalize_url(url)
            if res is None:
                trace.append(_row(-1, url, "", rnd, "rejected", -1, prio, okey))
                continue
            canon, host = res
            path = urlsplit(canon).path or "/"
            if not host_rules(host).allowed(path):
                trace.append(_row(-1, canon, host, rnd, "rejected", -1, prio, okey))
                continue
            kept.setdefault(canon, []).append((okey, prio, host))
        new_queue = []
        for canon, refs in kept.items():
            refs.sort()
            okey, prio, host = refs[0]
            h = url_hash64(canon)
            if h in seen:
                for l_okey, l_prio, l_host in refs:
                    trace.append(
                        _row(-1, canon, l_host, rnd, "deduped", -1, l_prio, l_okey)
                    )
                continue
            seen.add(h)
            per_host.setdefault(host, []).append((canon, prio, okey))
            for l_okey, l_prio, l_host in refs[1:]:
                trace.append(
                    _row(-1, canon, l_host, rnd, "deduped", -1, l_prio, l_okey)
                )

        fetched_all: List[Tuple[str, str, int, int, int]] = []
        for host in sorted(per_host):
            delay = host_rules(host).crawl_delay_ms
            fetched, deferred = sched.schedule(host, delay, per_host[host])
            for url, prio, okey, fetch_ms in fetched:
                fetched_all.append((host, url, prio, okey, fetch_ms))
            for url, prio, okey in deferred:
                trace.append(_row(-1, url, host, rnd, "deferred", -1, prio, okey))
                carryover.append((host, url, prio, okey))

        fetched_all.sort(key=lambda r: (r[4], -r[2], r[3]))
        for host, url, prio, okey, fetch_ms in fetched_all:
            trace.append(_row(seq, url, host, rnd, "fetched", fetch_ms, prio, okey))
            seq += 1
            html = pages.get(url)
            if html is None:
                continue
            for pos, link in enumerate(outlink_fn(url, html)):
                new_queue.append((link, 0, outlink_order_key(okey, pos)))

    return trace, seen


def _row(seq, url, host, rnd, status, fetch_ms, priority, order_key) -> dict:
    return {
        "seq": seq,
        "url": url,
        "host": host,
        "round": rnd,
        "status": status,
        "fetch_ms": fetch_ms,
        "priority": priority,
        "order_key": order_key,
    }
