"""Deterministic synthetic Common-Crawl-style fixture generator (FIXTURES.md).

Generates the authoritative input shape from BASELINE.json input_hint:
pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string), plus seeds, robots, and the field->xpath rules map (the frozen
output of the reference's agentic loop,
/root/reference/config/default_config.yaml:23-31).

Determinism rules (FIXTURES.md): one integer seed; all choice via
blake2b(seed, host, i); no wall clock (warc_ts from a fixed base epoch); no
RNG state threading.  The ``text`` column is computed by the kernel's
page_text — the frozen per-row invariant.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Dict, List, Tuple

import pyarrow as pa

from langscrape_ray.kernel.extract import page_text

_BASE_EPOCH = datetime(2024, 1, 1)

_VOCAB = (
    "crawl frontier parquet arrow batch stream shuffle block actor host "
    "politeness robots fetch extract clean xpath text token schedule queue "
    "bloom cuckoo filter shard partition skew salt checkpoint manifest "
    "lineage counter round seed link anchor article headline byline"
).split()

_LANGS = ("en", "en", "en", "en", "en", "en", "he", "fr", "ar", "es")


def _h(seed: int, *parts) -> int:
    data = ("|".join(str(p) for p in parts)).encode()
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8, key=seed.to_bytes(8, "little")).digest(),
        "little",
    )


@dataclass(frozen=True)
class FixtureConfig:
    seed: int = 42
    n_hosts: int = 50
    n_pages: int = 5000
    hot_host_share: float = 0.2  # host 0 holds ~20% of pages (skew tests)
    short_page_every: int = 17  # every k-th page is < 3000 chars cleaned
    weird_bytes_every: int = 31  # every k-th page gets latin-1 + control chars
    n_seeds: int = 100
    outlinks_per_page: int = 6
    body_scale: float = 1.0  # multiplies paragraph count+length (bench knob)


def host_name(cfg: FixtureConfig, h: int) -> str:
    return f"host-{h:03d}.example"


def page_counts(cfg: FixtureConfig) -> List[int]:
    """Pages per host: host 0 hot, the rest near-uniform."""
    hot = int(cfg.n_pages * cfg.hot_host_share)
    rest = cfg.n_pages - hot
    base = rest // (cfg.n_hosts - 1)
    counts = [hot] + [base] * (cfg.n_hosts - 1)
    leftover = cfg.n_pages - sum(counts)
    for i in range(leftover):
        counts[1 + (i % (cfg.n_hosts - 1))] += 1
    return counts


def page_url(cfg: FixtureConfig, h: int, i: int) -> str:
    cat = ("news", "blog", "wiki", "shop")[_h(cfg.seed, "cat", h, i) % 4]
    return f"https://{host_name(cfg, h)}/{cat}/{i}"


def _words(cfg: FixtureConfig, h: int, i: int, tag: str, n: int) -> str:
    return " ".join(
        _VOCAB[_h(cfg.seed, tag, h, i, j) % len(_VOCAB)] for j in range(n)
    )


def _all_urls(cfg: FixtureConfig) -> List[Tuple[int, int, str]]:
    out = []
    for h, cnt in enumerate(page_counts(cfg)):
        for i in range(cnt):
            out.append((h, i, page_url(cfg, h, i)))
    return out


def build_page_html(cfg: FixtureConfig, h: int, i: int, urls: List[str]) -> bytes:
    """One deterministic page exercising the cleaner/extractor paths."""
    r = _h(cfg.seed, "page", h, i)
    url = page_url(cfg, h, i)
    title = _words(cfg, h, i, "title", 5).title()
    author = f"{_words(cfg, h, i, 'author', 2).title()}"
    date = (_BASE_EPOCH + timedelta(days=r % 365)).strftime("%Y-%m-%d")
    short = (i % cfg.short_page_every) == cfg.short_page_every - 1
    n_paras = 2 if short else int((6 + r % 6) * cfg.body_scale)
    para_len = 8 if short else int((40 + r % 30) * cfg.body_scale)

    paras = "".join(
        f"<p>{_words(cfg, h, i, f'p{j}', para_len)} &amp; more &nbsp; "
        f"{_words(cfg, h, i, f'q{j}', 6)}.</p>"
        for j in range(n_paras)
    )

    # deterministic outlinks: same-host neighbours + cross-host + a dup + a seen seed
    links = []
    for j in range(cfg.outlinks_per_page):
        target = urls[_h(cfg.seed, "link", h, i, j) % len(urls)]
        links.append(f'<li><a href="{target}">{_words(cfg, h, i, f"l{j}", 2)}</a></li>')
    if links:
        links.append(links[0])  # duplicate link (dedup path)

    nav_items = "".join(
        f'<li class="nav-item"><a href="/{k}">{_VOCAB[k]}</a></li>' for k in range(5)
    )
    table = (
        "<table><caption>Stats</caption>"
        + "".join(
            f"<tr><td>{_VOCAB[(r + k) % len(_VOCAB)]}</td><td>{k}</td></tr>"
            for k in range(3)
        )
        + "</table>"
        if r % 3 == 0
        else ""
    )

    html = f"""<!DOCTYPE html>
<html><head>
<title>{title} &ndash; {host_name(cfg, h)}</title>
<meta charset="utf-8">
<meta name="author" content="{author}">
<meta property="article:published_time" content="{date}T0{r % 10}:00:00">
<script>var tracking = {r % 100};</script>
<style>.hidden {{ display: none; }}</style>
</head>
<body data-junk="drop-me" onload="init()">
<!-- build {r} -->
<nav><ul>{nav_items}</ul></nav>
<h1 class="headline" data-test="x">{title}</h1>
<span class="author">By {author}</span>
<time datetime="{date}">{date}</time>
<div></div>
<a href="javascript:void(0)">share</a>
<section class="article-body">{paras}</section>
{table}
<ul class="outlinks">{''.join(links)}</ul>
<footer><span>&copy; 2024 {host_name(cfg, h)}</span></footer>
</body></html>"""
    raw = html.encode("utf-8")
    if (i % cfg.weird_bytes_every) == cfg.weird_bytes_every - 1:
        # latin-1 bytes + XML-illegal control chars (exercises
        # remove_control_characters + decode fallback)
        raw = raw.replace(b"</body>", b"caf\xe9 \x00\x08\x0b control</body>")
    return raw


def build_pages_table(cfg: FixtureConfig) -> pa.Table:
    """The pages table: (url, warc_ts, html, text, lang)."""
    triples = _all_urls(cfg)
    urls = [u for _, _, u in triples]
    return build_pages_batch(cfg, triples, urls)


def build_pages_batch(cfg: FixtureConfig, triples, urls) -> pa.Table:
    """Generate a slice of the pages table (for parallel generation in Ray)."""
    rows_url, rows_ts, rows_html, rows_text, rows_lang = [], [], [], [], []
    for h, i, url in triples:
        html = build_page_html(cfg, h, i, urls)
        rows_url.append(url)
        rows_ts.append(_BASE_EPOCH + timedelta(seconds=h * 86_400 + i * 7))
        rows_html.append(html)
        rows_text.append(page_text(html))
        rows_lang.append(_LANGS[_h(cfg.seed, "lang", h, i) % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(rows_url, pa.string()),
            "warc_ts": pa.array(rows_ts, pa.timestamp("us")),
            "html": pa.array(rows_html, pa.binary()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
        }
    )


def build_seeds_table(cfg: FixtureConfig) -> pa.Table:
    """Seed list: mostly real URLs with canonicalization noise, plus a few
    missing-from-pages and invalid URLs (FIXTURES.md §2)."""
    triples = _all_urls(cfg)
    urls = [u for _, _, u in triples]
    seeds: List[str] = []
    for s in range(cfg.n_seeds):
        r = _h(cfg.seed, "seedpick", s)
        if s % 19 == 18:
            seeds.append(f"ftp://invalid-{s}")  # invalid scheme -> rejected
        elif s % 13 == 12:
            seeds.append(f"https://host-999.example/missing/{s}")  # fetch miss
        else:
            u = urls[r % len(urls)]
            variant = r % 5
            if variant == 1:
                u = u.replace("https://host", "https://HOST") + "/"
            elif variant == 2:
                u = u + "#frag"
            elif variant == 3:
                u = u + "?utm_source=feed&utm_campaign=x"
            elif variant == 4:
                u = u.replace(".example/", ".example:443/")
            seeds.append(u)
    return pa.table(
        {
            "url": pa.array(seeds, pa.string()),
            "seed_order": pa.array(range(len(seeds)), pa.int64()),
            "priority": pa.array(
                [_h(cfg.seed, "prio", s) % 4 for s in range(len(seeds))], pa.int32()
            ),
        }
    )


def build_robots_table(cfg: FixtureConfig) -> pa.Table:
    """Per-host robots: some disallow prefixes, varied crawl delays, some
    hosts absent (default allow, FIXTURES.md §3)."""
    hosts, bodies, delays = [], [], []
    for h in range(cfg.n_hosts):
        r = _h(cfg.seed, "robots", h)
        if r % 7 == 0:
            continue  # no robots.txt for this host
        lines = ["User-agent: *"]
        delay_ms = 500 + (r % 4) * 500
        lines.append(f"Crawl-delay: {delay_ms / 1000}")
        if r % 5 == 0:
            lines.append("Disallow: /shop/")
        if r % 11 == 0:
            lines.append("Disallow: /wiki/")
        hosts.append(host_name(cfg, h))
        bodies.append("\n".join(lines) + "\n")
        delays.append(delay_ms)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(bodies, pa.string()),
            "crawl_delay_ms": pa.array(delays, pa.int32()),
        }
    )


def field_rules(cfg: FixtureConfig, host: str | None = None) -> Dict[str, dict]:
    """The frozen field->xpath map (reference
    /root/reference/config/default_config.yaml:23-31 shape).  A couple of
    host buckets get degenerate rules to pin the sentinel + fallback paths
    (FIXTURES.md §4)."""
    rules = {
        "article_body": {
            "strategy": "xpath_extractor",
            "xpath": "//section[@class='article-body']/p",
        },
        "title": {"strategy": "xpath_extractor", "xpath": "//h1"},
        "author": {"strategy": "xpath_extractor", "xpath": "//span[@class='author']"},
        "datetime": {"strategy": "xpath_extractor", "xpath": "//time"},
    }
    if host is not None:
        hb = _h(cfg.seed, "rulehost", host) % 17
        if hb == 0:
            rules = dict(rules)
            rules["author"] = {"strategy": "xpath_extractor", "xpath": "//@@bad["}
        elif hb == 1:
            rules = dict(rules)
            rules["datetime"] = {"strategy": "xpath_extractor"}  # no xpath
        elif hb == 2:
            rules = dict(rules)
            rules["title"] = {
                "strategy": "lm_capabilities",
                "value": ["Stored Title"],
            }
    return rules


def pages_dict(table: pa.Table) -> Dict[str, bytes]:
    """canonical url -> html bytes lookup for the oracle."""
    return {
        u.as_py(): h.as_py() for u, h in zip(table["url"], table["html"])
    }


def robots_dict(table: pa.Table) -> Dict[str, str]:
    return {h.as_py(): b.as_py() for h, b in zip(table["host"], table["robots_txt"])}
