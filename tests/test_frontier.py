"""Frontier-kernel unit tests: canonicalization, bloom, cuckoo, robots,
politeness contract, oracle determinism (SURVEY.md §5 rebuild test plan)."""

import numpy as np

from langscrape_ray.frontier import (
    BloomFilter,
    CrawlPolicy,
    CuckooFilter,
    canonicalize_url,
    host_hash64,
    oracle_crawl,
    parse_robots,
    url_hash64,
)
from langscrape_ray.frontier.politeness import schedule_host_round


def test_canonicalize_variants_collapse():
    base = canonicalize_url("https://host-001.example/news/5")
    assert base == ("https://host-001.example/news/5", "host-001.example")
    variants = [
        "https://HOST-001.example/news/5/",
        "https://host-001.example/news/5#frag",
        "https://host-001.example/news/5?utm_source=x&utm_campaign=y",
        "https://host-001.example:443/news/5",
        "https://host-001.example./news/5",
    ]
    for v in variants:
        assert canonicalize_url(v) == base, v


def test_canonicalize_query_sorted_and_kept():
    c, _ = canonicalize_url("http://a.example/p?b=2&a=1&utm_x=9")
    assert c == "http://a.example/p?a=1&b=2"


def test_canonicalize_invalid():
    for bad in ["", "notaurl", "ftp://x.example/a", "https://", "//host/x", None]:
        assert canonicalize_url(bad) is None


def test_hashes_stable():
    assert url_hash64("https://a.example/") == url_hash64("https://a.example/")
    assert url_hash64("https://a.example/") != host_hash64("a.example")


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    keys = np.arange(1, 5001, dtype=np.uint64) * np.uint64(0x9E3779B9)
    bf.add(keys)
    assert bf.contains(keys).all()
    other = np.arange(10_001, 20_001, dtype=np.uint64) * np.uint64(0x85EBCA6B)
    fp = bf.contains(other).mean()
    assert fp < 0.05  # ~1% design point
    # serialization round-trip
    bf2 = BloomFilter.from_state(bf.state())
    assert bf2.contains(keys).all()


def test_cuckoo_membership_and_delete():
    cf = CuckooFilter(capacity=4096)
    keys = [url_hash64(f"https://h{i}.example/p") for i in range(3000)]
    for k in keys:
        assert not cf.check_and_add(k)
    for k in keys:
        assert cf.contains(k)
    assert not cf.saturated
    assert cf.delete(keys[0])
    assert not cf.contains(keys[0])
    cf2 = CuckooFilter.from_state(cf.state())
    assert cf2.contains(keys[1]) and not cf2.contains(keys[0])


def test_cuckoo_deterministic_rebuild():
    a, b = CuckooFilter(capacity=1024), CuckooFilter(capacity=1024)
    keys = [url_hash64(f"u{i}") for i in range(900)]
    for k in keys:
        a.check_and_add(k)
        b.check_and_add(k)
    assert (a.table == b.table).all()


def test_robots_parse():
    r = parse_robots("User-agent: *\nCrawl-delay: 1.5\nDisallow: /shop/\n# c\n")
    assert r.crawl_delay_ms == 1500
    assert not r.allowed("/shop/x")
    assert r.allowed("/news/x")
    assert parse_robots(None).allowed("/anything")
    assert parse_robots("").crawl_delay_ms == 1000


def test_schedule_host_round_contract():
    cands = [("u1", 0, 5), ("u2", 3, 7), ("u3", 3, 2), ("u4", 1, 1)]
    fetched, deferred, free = schedule_host_round(
        1000, 500, cands, CrawlPolicy(max_per_host_per_round=3)
    )
    # order: priority desc then order_key asc -> u3, u2, u4; u1 deferred
    assert [f[0] for f in fetched] == ["u3", "u2", "u4"]
    assert [f[3] for f in fetched] == [1000, 1500, 2000]
    assert deferred == [("u1", 0, 5)]
    assert free == 2500


def _tiny_world():
    pages = {
        "https://a.example/1": b'<html><body><p>one</p><a href="https://a.example/2">n</a>'
        b'<a href="https://b.example/1">c</a></body></html>',
        "https://a.example/2": b"<html><body><p>two</p>"
        b'<a href="https://a.example/1">back</a></body></html>',
        "https://b.example/1": b"<html><body><p>bee</p></body></html>",
    }
    seeds = [("https://A.example/1/", 1, 0), ("https://a.example/1#f", 0, 1), ("bad", 0, 2)]
    return seeds, pages


def test_oracle_crawl_dedup_and_follow():
    seeds, pages = _tiny_world()
    trace, seen = oracle_crawl(seeds, pages, {}, CrawlPolicy(max_rounds=5))
    fetched = [r["url"] for r in trace if r["status"] == "fetched"]
    # round 1: a.example's clock is already at 1000ms after round 0, so the
    # cross-host outlink on b.example (clock 0) fetches first.
    assert fetched == [
        "https://a.example/1",
        "https://b.example/1",
        "https://a.example/2",
    ]
    statuses = {r["status"] for r in trace}
    assert "rejected" in statuses and "deduped" in statuses
    assert len(seen) == 3


def test_oracle_deterministic():
    seeds, pages = _tiny_world()
    t1, s1 = oracle_crawl(seeds, pages, {}, CrawlPolicy(max_rounds=5))
    t2, s2 = oracle_crawl(seeds, pages, {}, CrawlPolicy(max_rounds=5))
    assert t1 == t2 and s1 == s2


def test_oracle_politeness_budget_defers():
    pages = {f"https://a.example/{i}": b"<html><body><p>x</p></body></html>" for i in range(10)}
    seeds = [(f"https://a.example/{i}", 0, i) for i in range(10)]
    trace, _ = oracle_crawl(
        seeds, pages, {}, CrawlPolicy(max_per_host_per_round=4, max_rounds=1)
    )
    assert sum(r["status"] == "fetched" for r in trace) == 4
    assert sum(r["status"] == "deferred" for r in trace) == 6


def test_canonical_fast_path_identity():
    """The regex fast path in canonicalize_url must be EXACTLY the general
    path's output wherever it fires — differential check over adversarial
    URL shapes plus the fixture-world shapes (where it must mostly fire)."""
    import re

    from langscrape_ray.frontier import canonical as C

    def general(url):
        # re-run the general path by making the fast regex never match
        orig = C._FAST_RE
        C._FAST_RE = re.compile(r"(?!)")
        try:
            return C.canonicalize_url(url)
        finally:
            C._FAST_RE = orig

    cases = [
        "http://host-001.example/page/7",
        "https://a.b.c/x/y/z",
        "http://host.example",          # empty path -> '/'
        "http://host.example/",
        "http://host.example//double//slash",
        "http://host.example/trailing/",
        "http://HOST.example/Upper",
        "http://host.example./dot",
        "http://host.example:80/port",
        "http://host.example:8080/port",
        "https://host.example:443/x",
        "http://user@host.example/x",
        "http://host.example/x?b=2&a=1",
        "http://host.example/x?utm_source=t&a=1",
        "http://host.example/x#frag",
        "  http://host.example/pad  ",
        "http://host.example/%41%2f",
        "http://host.example/a b",      # space in path: fast must not fire
        "ftp://host.example/x",
        "http:///nopath",
        "not a url",
        "",
        "http://host.example/a?",       # bare '?' (advisory edge)
        "http://host.example/a#",
        "http://host.example/a/./b",
        "http://host.example/a/../b",
        "http://xn--nxasmq6b.example/x",
        "http://host.example/comma,colon:semi;",
        "http://host.example/~tilde+plus'quote'",
    ]
    # fixture-world shapes: the fast path must fire and agree
    for i in range(2000):
        cases.append(f"http://host-{i % 37:03d}.example/page/{i}")
        cases.append(f"http://host-{i % 37:03d}.example/page/{i}?q={i}&p=1")
    hits = 0
    for url in cases:
        full = general(url)
        fast_or_full = C.canonicalize_url(url)
        assert fast_or_full == full, url
        m = C._FAST_RE.match(url) if isinstance(url, str) else None
        if m:
            hits += 1
    assert hits > 2000  # the plain fixture shapes all took the fast lane


def test_robots_rfc9309_matching():
    """RFC 9309 §2.2.2: Allow/Disallow longest-match precedence, ``*``
    wildcards, trailing ``$`` end-anchor, Allow wins length ties."""
    r = parse_robots(
        "User-agent: *\n"
        "Disallow: /\n"
        "Allow: /public/\n"
    )
    assert not r.allowed("/private/x")
    assert r.allowed("/public/page")     # longer Allow carves exception
    assert not r.allowed("/publicity")   # /public/ does not match this

    # wildcard disallow
    r = parse_robots("User-agent: *\nDisallow: /*.pdf\n")
    assert not r.allowed("/docs/file.pdf")
    assert not r.allowed("/a.pdfx")      # no anchor: prefix-of-path match
    assert r.allowed("/docs/file.html")

    # $ end-anchor
    r = parse_robots("User-agent: *\nDisallow: /*.php$\n")
    assert not r.allowed("/index.php")
    assert r.allowed("/index.php5")

    # Allow wins the exact-length tie (RFC example family)
    r = parse_robots("User-agent: *\nAllow: /page\nDisallow: /page\n")
    assert r.allowed("/page")

    # longest rule wins regardless of order
    r = parse_robots(
        "User-agent: *\nAllow: /folder/\nDisallow: /folder/private/\n"
    )
    assert r.allowed("/folder/a")
    assert not r.allowed("/folder/private/a")

    # interior $ is a literal octet; only the trailing $ anchors
    r = parse_robots("User-agent: *\nDisallow: /a$b\n")
    assert not r.allowed("/a$b/c")
    assert r.allowed("/ab")

    # Allow alone can never forbid; empty values are no-rules
    r = parse_robots("User-agent: *\nAllow: /only\nDisallow:\n")
    assert r.allowed("/anything")


def test_robots_plain_prefix_unchanged():
    """The fixtures' prefix-only rules must behave exactly as before the
    RFC upgrade (crawl-order oracle parity depends on it)."""
    r = parse_robots("User-agent: *\nDisallow: /shop/\nDisallow: /admin\n")
    assert not r.allowed("/shop/item")
    assert not r.allowed("/admin")
    assert not r.allowed("/administrator")  # prefix semantics
    assert r.allowed("/blog/post")
