"""Deterministic robots.txt parsing with RFC 9309 rule matching.

New design (SURVEY.md §2.3 T8): the reference has no robots handling (its
stealth browser bypasses robots entirely).  This parser implements the
``User-agent: *`` group with the full RFC 9309 matching model real-web
robots.txt files rely on:

- ``Disallow:`` AND ``Allow:`` rules (Allow is how sites carve exceptions
  out of a broad Disallow — ``Disallow: /`` + ``Allow: /public`` is
  everywhere on the real web);
- ``*`` wildcards (match any octet sequence) and a trailing ``$``
  end-anchor inside rule paths;
- longest-match precedence: the most specific (longest, in octets)
  matching rule decides, an Allow wins ties (RFC 9309 §2.2.2);
- ``Crawl-delay:`` seconds and the group-independent ``Sitemap:``
  directive (feeding the sitemap seed source).

Unknown directives are ignored; an absent/empty robots.txt means
allow-all with the default delay.  Hot-path note: ``allowed()`` runs per
canonicalized URL inside the propose kernel, so plain-prefix rules (the
overwhelming majority, and everything the fixtures emit) keep the
``startswith`` fast path — only rules containing ``*`` or a trailing
``$`` compile to (module-cached, picklable) regexes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional, Tuple

DEFAULT_CRAWL_DELAY_MS = 1000


def _is_plain(pattern: str) -> bool:
    return "*" not in pattern and not pattern.endswith("$")


@lru_cache(maxsize=4096)
def _compile(pattern: str) -> "re.Pattern":
    """Rule path -> anchored regex: ``*`` -> ``.*``; ONE trailing ``$``
    end-anchors (an interior ``$`` is a literal octet per the RFC's
    special-characters note)."""
    anchor_end = pattern.endswith("$")
    body = pattern[:-1] if anchor_end else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(rx + (r"\Z" if anchor_end else ""))


def _matches(pattern: str, path: str) -> bool:
    if _is_plain(pattern):
        return path.startswith(pattern)
    return _compile(pattern).match(path) is not None


@dataclass(frozen=True)
class RobotsRules:
    disallow: tuple = field(default_factory=tuple)  # rule paths
    allow: tuple = field(default_factory=tuple)     # rule paths
    crawl_delay_ms: int = DEFAULT_CRAWL_DELAY_MS
    sitemaps: tuple = field(default_factory=tuple)  # Sitemap: urls (global)

    def allowed(self, path: str) -> bool:
        """RFC 9309 §2.2.2 longest-match evaluation: collect every
        matching rule, the longest rule path wins, Allow wins a length
        tie; no match means allowed."""
        if not self.disallow:
            return True  # Allow rules alone can never forbid
        best_len = -1
        best_allow = True
        for pat in self.disallow:
            if len(pat) > best_len and _matches(pat, path):
                best_len = len(pat)
                best_allow = False
        for pat in self.allow:
            # >= : an Allow of equal length outranks the Disallow
            if len(pat) >= best_len and _matches(pat, path):
                if len(pat) > best_len or not best_allow:
                    best_len = len(pat)
                    best_allow = True
        return best_allow


def parse_robots(robots_txt: Optional[str]) -> RobotsRules:
    """Parse the ``User-agent: *`` group of a robots.txt body."""
    if not robots_txt:
        return RobotsRules()
    disallow: List[str] = []
    allow: List[str] = []
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
            # an EMPTY Disallow/Allow value is the RFC's explicit
            # "no rule" form — skipped, not a match-everything rule
            if key == "disallow" and val:
                disallow.append(val)
            elif key == "allow" and val:
                allow.append(val)
            elif key == "crawl-delay":
                try:
                    delay_ms = max(0, int(float(val) * 1000))
                except ValueError:
                    pass
    return RobotsRules(
        disallow=tuple(disallow),
        allow=tuple(allow),
        crawl_delay_ms=delay_ms,
        sitemaps=tuple(sitemaps),
    )
