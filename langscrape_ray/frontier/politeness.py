"""Per-host politeness scheduling — the crawl-ordering contract.

New design (SURVEY.md §2.3 T8 / §7, BASELINE.json north_star: "per-host
politeness priority queue (min-heap on next-fetch-time x priority)").  The
reference's ordering semantics are "input order, sequential"
(/root/reference/scripts/run.py:63); this module generalizes that to a
deterministic virtual-time schedule that the oracle and the distributed
engine compute identically — ordering is *computed*, never *observed* from
task finish order (SURVEY.md §7.3).

Contract (all times are VIRTUAL milliseconds — no wall clock anywhere):
  - Each host has ``next_free_ms`` (0 at crawl start) and a crawl delay from
    robots (default 1000 ms).
  - Within a host+round, candidates are ordered by the min-heap key
    ``(next_fetch_time, -priority, order_key)``: larger ``priority`` value
    dequeues first at equal times; ``order_key`` is the seed order for seeds
    and the global discovery counter for outlinks, so ties are total.
  - At most ``policy.max_per_host_per_round`` URLs are fetched per host per
    round (the politeness budget); the j-th fetch is stamped
    ``fetch_ms = next_free_ms + j * crawl_delay_ms`` and the host clock
    advances by ``n_fetched * crawl_delay_ms``.  Overflow candidates are
    DEFERRED to the next round keeping their keys.
  - Global crawl order = all fetched rows sorted by
    ``(fetch_ms, -priority, order_key)`` — unique because order_key is.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from langscrape_ray.frontier.robots import DEFAULT_CRAWL_DELAY_MS


@dataclass(frozen=True)
class CrawlPolicy:
    max_per_host_per_round: int = 8
    max_rounds: int = 10
    default_crawl_delay_ms: int = DEFAULT_CRAWL_DELAY_MS


# A frontier candidate: (canon_url, priority, order_key)
Candidate = Tuple[str, int, int]
# A scheduled fetch: (canon_url, priority, order_key, fetch_ms)
Scheduled = Tuple[str, int, int, int]


def order_host_candidates(cands: List[Candidate]) -> List[Candidate]:
    return sorted(cands, key=lambda c: (-c[1], c[2]))


def schedule_host_round(
    next_free_ms: int,
    crawl_delay_ms: int,
    cands: List[Candidate],
    policy: CrawlPolicy,
) -> Tuple[List[Scheduled], List[Candidate], int]:
    """Schedule one host for one round.

    Returns (fetched-with-times, deferred, new_next_free_ms).  Pure function:
    the oracle and the Ray per-host group stage both call exactly this.
    """
    ordered = order_host_candidates(cands)
    k = policy.max_per_host_per_round
    take, defer = ordered[:k], ordered[k:]
    fetched = [
        (url, prio, okey, next_free_ms + j * crawl_delay_ms)
        for j, (url, prio, okey) in enumerate(take)
    ]
    return fetched, defer, next_free_ms + len(take) * crawl_delay_ms


def global_order(fetched: List[Tuple[str, str, int, int, int]]) -> List[Tuple]:
    """Sort (host, url, priority, order_key, fetch_ms) rows into global crawl
    order: (fetch_ms, -priority, order_key)."""
    return sorted(fetched, key=lambda r: (r[4], -r[2], r[3]))


class HostScheduler:
    """Mutable per-host clock table (oracle / driver-side use)."""

    def __init__(self, policy: CrawlPolicy):
        self.policy = policy
        self.next_free_ms: Dict[str, int] = {}

    def schedule(
        self, host: str, crawl_delay_ms: int, cands: List[Candidate]
    ) -> Tuple[List[Scheduled], List[Candidate]]:
        free = self.next_free_ms.get(host, 0)
        fetched, deferred, new_free = schedule_host_round(
            free, crawl_delay_ms, cands, self.policy
        )
        self.next_free_ms[host] = new_free
        return fetched, deferred

    def state(self) -> Dict[str, int]:
        return dict(self.next_free_ms)

    def load_state(self, state: Dict[str, int]) -> None:
        self.next_free_ms = dict(state)
