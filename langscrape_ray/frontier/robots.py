"""Minimal deterministic robots.txt parsing.

New design (SURVEY.md §2.3 T8): the reference has no robots handling (its
stealth browser bypasses robots entirely).  This parser implements the subset
the fixtures' robots table uses: ``User-agent: *`` groups, ``Disallow:``
path-prefix rules, ``Crawl-delay:`` seconds, and the group-independent ``Sitemap:``
directive (feeding the sitemap seed source).  Unknown directives are ignored;
an absent/empty robots.txt means allow-all with the default delay.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

DEFAULT_CRAWL_DELAY_MS = 1000


@dataclass(frozen=True)
class RobotsRules:
    disallow: tuple = field(default_factory=tuple)  # path prefixes
    crawl_delay_ms: int = DEFAULT_CRAWL_DELAY_MS
    sitemaps: tuple = field(default_factory=tuple)  # Sitemap: urls (global)

    def allowed(self, path: str) -> bool:
        return not any(p and path.startswith(p) for p in self.disallow)


def parse_robots(robots_txt: Optional[str]) -> RobotsRules:
    """Parse the ``User-agent: *`` group of a robots.txt body."""
    if not robots_txt:
        return RobotsRules()
    disallow: List[str] = []
    sitemaps: List[str] = []
    delay_ms = DEFAULT_CRAWL_DELAY_MS
    in_star_group = False
    seen_any_group = False
    for raw_line in robots_txt.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            # per the spec, Sitemap: is GLOBAL — valid outside any group
            if val:
                sitemaps.append(val)
            continue
        if key == "user-agent":
            if seen_any_group and in_star_group:
                # a new group after ours ends the * group
                in_star_group = val == "*" or in_star_group
            in_star_group = val == "*"
            seen_any_group = True
        elif in_star_group or not seen_any_group:
            if key == "disallow" and val:
                disallow.append(val)
            elif key == "crawl-delay":
                try:
                    delay_ms = max(0, int(float(val) * 1000))
                except ValueError:
                    pass
    return RobotsRules(
        disallow=tuple(disallow),
        crawl_delay_ms=delay_ms,
        sitemaps=tuple(sitemaps),
    )
