"""Sitemap seed source (sources/sitemap.py): parser, seed-table builder,
and the HTTP harvest path (sitemapindex nesting) against the in-process
server."""
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from langscrape_ray.sources.sitemap import (
    harvest_sitemap_seeds,
    parse_sitemap,
    seeds_from_sitemaps,
)

_URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p1</loc><lastmod>2024-01-01</lastmod>
       <priority>0.8</priority></url>
  <url><loc>https://a.example/p2</loc></url>
  <url><loc>https://a.example/p3</loc><priority>bogus</priority></url>
  <url><priority>0.9</priority></url>
</urlset>"""

_INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sm1.xml</loc></sitemap>
  <sitemap><loc>https://a.example/sm2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset():
    urls, children = parse_sitemap(_URLSET)
    assert children == []
    assert [u["url"] for u in urls] == [
        "https://a.example/p1", "https://a.example/p2", "https://a.example/p3"
    ]  # the loc-less entry is dropped
    assert urls[0]["priority"] == 0.8
    assert urls[0]["lastmod"] == "2024-01-01"
    assert urls[1]["priority"] == 0.5  # sitemaps.org default
    assert urls[2]["priority"] == 0.5  # bogus value -> default


def test_parse_index_and_errors():
    urls, children = parse_sitemap(_INDEX)
    assert urls == []
    assert children == [
        "https://a.example/sm1.xml", "https://a.example/sm2.xml"
    ]
    with pytest.raises(ValueError):
        parse_sitemap(b"not xml at all <<<")
    with pytest.raises(ValueError):
        parse_sitemap(b"<html><body>soft 404</body></html>")


def test_seeds_from_sitemaps():
    t = seeds_from_sitemaps([_URLSET, _URLSET])
    assert t.column_names == ["url", "seed_order", "priority"]
    assert t.num_rows == 6
    assert t["seed_order"].to_pylist() == list(range(6))
    assert t["priority"].to_pylist()[:3] == [80, 50, 50]


@pytest.fixture()
def sitemap_server():
    files = {
        "/sitemap.xml": _INDEX,
        "/sm1.xml": _URLSET,
        "/sm2.xml": (
            b'<?xml version="1.0"?><urlset xmlns='
            b'"http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><loc>https://b.example/q1</loc>"
            b"<priority>0.2</priority></url></urlset>"
        ),
    }

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            body = files.get(self.path)
            status = 200 if body is not None else 404
            body = body if body is not None else b"nope"
            self.send_response(status)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield httpd.server_address[1]
    httpd.shutdown()
    httpd.server_close()


def test_harvest_sitemap_seeds(ray_session, sitemap_server):
    seeds = harvest_sitemap_seeds(
        ["https://a.example/sitemap.xml"],
        connect_to=("127.0.0.1", sitemap_server),
        concurrency=(1, 2),
    )
    assert seeds.column_names == ["url", "seed_order", "priority"]
    got = dict(zip(seeds["url"].to_pylist(), seeds["priority"].to_pylist()))
    assert got == {
        "https://a.example/p1": 80,
        "https://a.example/p2": 50,
        "https://a.example/p3": 50,
        "https://b.example/q1": 20,
    }
    assert seeds["seed_order"].to_pylist() == list(range(4))


def test_harvested_seeds_drive_the_crawl(ray_session, sitemap_server,
                                         small_cfg, small_world):
    """The harvested table is schema-compatible with RayCrawl.run: seed a
    tiny crawl with it (urls won't match the sim world => all misses, but
    the frontier machinery accepts the table end-to-end)."""
    from langscrape_ray.frontier.politeness import CrawlPolicy
    from langscrape_ray.pipelines.crawl import PagesStore, RayCrawl
    from langscrape_ray.sources.fixtures_gen import field_rules, robots_dict

    pages, _seeds, robots = small_world
    seeds = harvest_sitemap_seeds(
        ["https://a.example/sitemap.xml"],
        connect_to=("127.0.0.1", sitemap_server),
        concurrency=(1, 2),
    )
    crawl = RayCrawl(
        PagesStore(table=pages), robots_dict(robots),
        field_rules(small_cfg), None, CrawlPolicy(max_rounds=1),
    )
    res = crawl.run(seeds)
    assert res["counters"]["fetched"] == 4  # scheduled (then all miss)
    assert res["counters"]["fetch_miss"] == 4


def test_sitemaps_from_robots_chain():
    """robots.txt -> Sitemap: discovery -> harvest input, deduped in
    first-seen order; Sitemap: is group-independent per the spec."""
    from langscrape_ray.sources.sitemap import sitemaps_from_robots

    bodies = [
        "User-agent: *\nDisallow: /x\nSitemap: https://a.ex/sm.xml\n",
        # inside a foreign group — still valid (global directive)
        "User-agent: bot\nDisallow: /\nSitemap: https://b.ex/sm.xml\n",
        "Sitemap: https://a.ex/sm.xml\n",  # duplicate
        "User-agent: *\nDisallow:\n",      # none
    ]
    assert sitemaps_from_robots(bodies) == [
        "https://a.ex/sm.xml",
        "https://b.ex/sm.xml",
    ]


def test_parse_gzipped_sitemap():
    """sitemap.xml.gz magic-byte sniff: the same document parses
    identically raw and gzipped; corrupt gzip raises the parser's
    ValueError (not a raw OSError)."""
    import gzip

    import pytest as _pytest

    from langscrape_ray.sources.sitemap import parse_sitemap

    xml = (
        b'<?xml version="1.0"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>http://h0.example/a</loc><priority>0.8</priority></url>"
        b"<url><loc>http://h0.example/b</loc></url>"
        b"</urlset>"
    )
    raw_urls, raw_children = parse_sitemap(xml)
    gz_urls, gz_children = parse_sitemap(gzip.compress(xml))
    assert gz_urls == raw_urls and gz_children == raw_children
    assert len(gz_urls) == 2 and gz_urls[0]["priority"] == 0.8
    with _pytest.raises(ValueError):
        parse_sitemap(b"\x1f\x8b" + b"garbage-not-gzip")
