"""Sitemap seed source (crawl-tier S-surface): parse sitemap.xml /
sitemap-index XML into the crawl's seed table, optionally harvesting the
files over the real HTTP stage.

Reference parity: langscrape seeds from a spreadsheet frontier
(/root/reference/scripts/run.py:63 reads an xlsx of (url, id) rows); a
web-scale crawl seeds from sitemaps, so this engine supports both.  The
parser is a small stdlib ElementTree reader of the sitemaps.org 0.9
schema: <urlset><url><loc>/<lastmod>/<priority>, and <sitemapindex>
nesting one level of child sitemaps.

Ray shape: parsing is a stateless per-payload function; harvesting many
sitemap files is a map_batches over (host, path) rows through the
HttpFetcher actor pool (connection reuse per host), then one flat_map to
seed rows.  Seed priority = round(sitemap priority * 100) (int64), seed
order = position within the concatenated sitemap stream — deterministic,
like every other ordering in the engine.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml_bytes: bytes) -> Tuple[List[dict], List[str]]:
    """Returns (url_entries, child_sitemap_urls).

    url_entries: dicts with url / lastmod (str or None) / priority
    (float, default 0.5 per the sitemaps.org spec).  Gzipped payloads
    (sitemap.xml.gz — the dominant real-web form; the spec allows it and
    Google's own sitemaps ship gzipped) are sniffed by magic bytes and
    inflated transparently.  Malformed XML raises ValueError (callers
    decide whether a bad sitemap is fatal)."""
    if xml_bytes[:2] == b"\x1f\x8b":
        import gzip

        try:
            xml_bytes = gzip.decompress(xml_bytes)
        except OSError as exc:
            raise ValueError(f"bad gzip sitemap: {exc}") from exc
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        raise ValueError(f"not a sitemap: {exc}") from exc
    kind = _strip(root.tag)
    urls: List[dict] = []
    children: List[str] = []
    if kind == "urlset":
        for el in root:
            if _strip(el.tag) != "url":
                continue
            loc = lastmod = prio = None
            for f in el:
                t = _strip(f.tag)
                if t == "loc":
                    loc = (f.text or "").strip()
                elif t == "lastmod":
                    lastmod = (f.text or "").strip()
                elif t == "priority":
                    try:
                        prio = float((f.text or "").strip())
                    except ValueError:
                        prio = None
            if loc:
                urls.append(
                    {
                        "url": loc,
                        "lastmod": lastmod,
                        "priority": prio if prio is not None else 0.5,
                    }
                )
    elif kind == "sitemapindex":
        for el in root:
            if _strip(el.tag) != "sitemap":
                continue
            for f in el:
                if _strip(f.tag) == "loc" and f.text:
                    children.append(f.text.strip())
    else:
        raise ValueError(f"not a sitemap root: {kind}")
    return urls, children


def seeds_from_sitemaps(payloads: List[bytes]) -> pa.Table:
    """Flatten parsed sitemap payloads into the crawl seed table
    (url, seed_order, priority).  seed_order is the position in the
    concatenated stream; priority is the sitemap priority scaled to an
    int64 percent (the crawl's priority domain)."""
    urls: List[str] = []
    prios: List[int] = []
    for payload in payloads:
        entries, _children = parse_sitemap(payload)
        for e in entries:
            urls.append(e["url"])
            prios.append(int(round(e["priority"] * 100)))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "seed_order": pa.array(range(len(urls)), pa.int64()),
            "priority": pa.array(prios, pa.int64()),
        }
    )


def harvest_sitemap_seeds(
    sitemap_urls: List[str],
    connect_to: Optional[Tuple[str, int]] = None,
    max_depth: int = 1,
    concurrency=(1, 4),
    **fetcher_kwargs,
) -> pa.Table:
    """Fetch sitemap files over the HttpFetcher actor pool (one level of
    sitemapindex nesting followed by default), flatten to the seed table.
    The sitemap LIST is driver-resident — sitemap counts are ~hosts, not
    ~URLs — while fetches and parses run distributed."""
    import ray.data as rd

    from langscrape_ray.stages.fetchers import HttpFetcher

    class FetchParse:
        """Emits tagged rows: kind="url" (a seed, with priority) or
        kind="child" (a nested sitemap to fetch next round)."""

        def __init__(self):
            fetcher_kwargs.setdefault("min_html_len", 0)
            self.f = HttpFetcher(connect_to=connect_to, **fetcher_kwargs)

        def __call__(self, t: pa.Table) -> pa.Table:
            kinds, urls, prios = [], [], []
            for sm_url in t["sm_url"].to_pylist():
                got = self.f._fetch(sm_url, self.f.ua_fallback)
                if got is None:
                    continue
                try:
                    entries, children = parse_sitemap(got[0])
                except ValueError:
                    continue
                for e in entries:
                    kinds.append("url")
                    urls.append(e["url"])
                    prios.append(int(round(e["priority"] * 100)))
                for c in children:
                    kinds.append("child")
                    urls.append(c)
                    prios.append(0)
            return pa.table(
                {
                    "kind": pa.array(kinds, pa.string()),
                    "url": pa.array(urls, pa.string()),
                    "priority": pa.array(prios, pa.int64()),
                }
            )

    # depth-0 fetch; children fetched up to max_depth more levels
    frontier = list(dict.fromkeys(sitemap_urls))
    all_urls: List[str] = []
    all_prios: List[int] = []
    for _depth in range(max_depth + 1):
        if not frontier:
            break
        got = (
            rd.from_arrow(pa.table({"sm_url": pa.array(frontier, pa.string())}))
            .map_batches(
                FetchParse,
                batch_format="pyarrow",
                batch_size=16,
                concurrency=concurrency,
            )
            .to_pandas()
        )
        if not len(got):
            break
        is_url = got["kind"] == "url"
        all_urls.extend(got.loc[is_url, "url"].tolist())
        all_prios.extend(int(x) for x in got.loc[is_url, "priority"])
        frontier = list(dict.fromkeys(got.loc[~is_url, "url"].tolist()))
    return pa.table(
        {
            "url": pa.array(all_urls, pa.string()),
            "seed_order": pa.array(range(len(all_urls)), pa.int64()),
            "priority": pa.array(all_prios, pa.int64()),
        }
    )


def sitemaps_from_robots(robots_bodies) -> List[str]:
    """Sitemap discovery: collect the group-independent ``Sitemap:`` urls
    from robots.txt bodies (first-seen order, deduped) — the standard
    crawl bootstrap chain robots.txt -> sitemap -> seeds, feeding
    ``harvest_sitemap_seeds``."""
    from langscrape_ray.frontier.robots import parse_robots

    seen = set()
    out: List[str] = []
    for body in robots_bodies:
        for sm in parse_robots(body).sitemaps:
            if sm not in seen:
                seen.add(sm)
                out.append(sm)
    return out
