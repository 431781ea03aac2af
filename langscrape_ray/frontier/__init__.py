"""Pure-Python frontier kernel (no Ray imports in this subpackage).

The reference has NO frontier machinery — its "frontier" is a flat xlsx list
processed sequentially (/root/reference/scripts/run.py:53-63), with no URL
dedup, robots handling, or politeness.  Everything here is new design mandated
by the BASELINE.json north rule: canonicalization, bloom + cuckoo URL-seen
filters, robots.txt parsing, a per-host politeness priority queue, and a
single-process oracle crawler whose output the distributed engine must match
row-for-row (ordering + final seen-set).
"""

from langscrape_ray.frontier.canonical import canonicalize_url, url_hash64, host_hash64
from langscrape_ray.frontier.bloom import BloomFilter
from langscrape_ray.frontier.cuckoo import CuckooFilter
from langscrape_ray.frontier.robots import parse_robots, RobotsRules
from langscrape_ray.frontier.politeness import HostScheduler, CrawlPolicy
from langscrape_ray.frontier.oracle import oracle_crawl

__all__ = [
    "canonicalize_url",
    "url_hash64",
    "host_hash64",
    "BloomFilter",
    "CuckooFilter",
    "parse_robots",
    "RobotsRules",
    "HostScheduler",
    "CrawlPolicy",
    "oracle_crawl",
]
