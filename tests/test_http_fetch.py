"""Real-HTTP fetch stage (stages/fetchers.py) against an in-process
stdlib http.server: session reuse, timeout/retry, the M3 too-short ->
S4 fallback branch, and end-to-end crawl parity with the simulated
PagesStore path (round-3 verdict item 4)."""
import threading
import time
from datetime import timezone
from email.utils import format_datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

import pyarrow as pa
import pytest

from langscrape_ray.frontier.politeness import CrawlPolicy
from langscrape_ray.sources.fixtures_gen import (
    field_rules,
    host_name,
    robots_dict,
)
from langscrape_ray.stages.fetchers import HttpFetcher, HttpPagesStore


class _WorldServer:
    """Serves a pages table over HTTP/1.1 keep-alive: key = (Host header,
    path); Date header = the page's warc_ts so the HTTP fetch path
    reproduces the parquet sim bit-for-bit.  Also exposes fault hooks:
    flaky paths (one 500 then OK), slow paths (one slow response then
    OK), and short-for-browser paths (the M3 gate: primary UA gets a
    stub, the fallback UA gets the real page)."""

    def __init__(self, pages: pa.Table):
        self.pages = {}
        for url, ts, html in zip(
            pages["url"].to_pylist(),
            pages["warc_ts"].to_pylist(),
            pages["html"].to_pylist(),
        ):
            sp = urlsplit(url)
            path = sp.path or "/"
            if sp.query:
                path += "?" + sp.query
            self.pages[(sp.hostname, path)] = (html, ts)
        self.flaky_failures = {}     # (host, path) -> remaining 500s
        self.slow_once = {}          # (host, path) -> remaining slow (s)
        self.short_for_browser = set()
        self.redirects = {}          # (host, path) -> Location value
        self.gzip_paths = set()      # (host, path) served gzip-encoded
        self.etags = {}              # (host, path) -> ETag value
        self.robots = {}             # host -> robots.txt text
        self.n_connections = 0
        self.n_requests = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def setup(self):  # count TCP connections for reuse assertions
                outer.n_connections += 1
                super().setup()

            def log_message(self, *a):
                pass

            def do_GET(self):
                outer.n_requests += 1
                key = (self.headers.get("Host", "").split(":")[0], self.path)
                if outer.flaky_failures.get(key, 0) > 0:
                    outer.flaky_failures[key] -= 1
                    body = b"transient"
                    self.send_response(500)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                slow = outer.slow_once.get(key)
                if slow:
                    outer.slow_once.pop(key)
                    time.sleep(slow)
                if key in outer.redirects:
                    self.send_response(302)
                    self.send_header("Location", outer.redirects[key])
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                if key[1] == "/robots.txt":
                    txt = outer.robots.get(key[0])
                    if txt is None:
                        body = b"no robots"
                        self.send_response(404)
                    else:
                        body = txt.encode()
                        self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                page = outer.pages.get(key)
                if page is None:
                    body = b"not found"
                    self.send_response(404)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                html, ts = page
                ua = self.headers.get("User-Agent", "")
                if key in outer.short_for_browser and "browser" in ua:
                    html = b"<html></html>"  # under the M3 length gate
                self._page_date = ts  # emitted via date_time_string below
                etag = outer.etags.get(key)
                if (etag is not None
                        and self.headers.get("If-None-Match") == etag):
                    self.send_response(304)
                    self.send_header("ETag", etag)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                if etag is not None:
                    self.send_header("ETag", etag)
                self.send_header("Content-Type", "text/html")
                if key in outer.gzip_paths:
                    import gzip as _gz

                    html = _gz.compress(html)
                    self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(html)))
                self.end_headers()
                self.wfile.write(html)

            def date_time_string(self, timestamp=None):
                # send_response()'s automatic Date header carries the
                # page's warc_ts so the fetch path round-trips it exactly
                ts = getattr(self, "_page_date", None)
                if ts is None:
                    return super().date_time_string(timestamp)
                return format_datetime(
                    ts.replace(tzinfo=timezone.utc), usegmt=True
                )

        class Server(ThreadingHTTPServer):
            def handle_error(self, request, client_address):
                pass  # broken pipes from timed-out clients are expected

        self.httpd = Server(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture(scope="module")
def world_server(small_world):
    pages, _seeds, _robots = small_world
    srv = _WorldServer(pages)
    yield srv
    srv.close()


def _meta_tbl(urls):
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "seq": pa.array(range(n), pa.int64()),
            "round": pa.array([0] * n, pa.int64()),
            "priority": pa.array([0] * n, pa.int64()),
            "order_key": pa.array(range(n), pa.int64()),
            "fetch_ms": pa.array([0] * n, pa.int64()),
        }
    )


def test_fetch_batch_hits_and_misses(world_server, small_world):
    pages, _s, _r = small_world
    urls = pages["url"].to_pylist()[:5] + ["http://nosuch.example/x"]
    f = HttpFetcher(connect_to=("127.0.0.1", world_server.port))
    out = f(_meta_tbl(urls))
    assert out.num_rows == 5  # the 404 row dropped, like a store miss
    want_html = dict(
        zip(pages["url"].to_pylist(), pages["html"].to_pylist())
    )
    want_ts = dict(
        zip(pages["url"].to_pylist(), pages["warc_ts"].to_pylist())
    )
    for u, h, ts in zip(
        out["url"].to_pylist(),
        out["html"].to_pylist(),
        out["warc_ts"].to_pylist(),
    ):
        assert h == want_html[u]
        assert ts == want_ts[u]  # Date header round-trips warc_ts exactly


def test_session_reuse_across_batches(world_server, small_world):
    pages, _s, _r = small_world
    urls = pages["url"].to_pylist()[:20]
    f = HttpFetcher(connect_to=("127.0.0.1", world_server.port))
    c0, r0 = world_server.n_connections, world_server.n_requests
    f(_meta_tbl(urls[:10]))
    f(_meta_tbl(urls[10:]))  # second batch, same actor instance
    made_conns = world_server.n_connections - c0
    made_reqs = world_server.n_requests - r0
    assert made_reqs == 20
    # one persistent keep-alive connection serves all 20 requests
    assert made_conns == 1


def test_retry_on_transient_500(world_server, small_world):
    pages, _s, _r = small_world
    url = pages["url"].to_pylist()[0]
    sp = urlsplit(url)
    world_server.flaky_failures[(sp.hostname, sp.path or "/")] = 1
    f = HttpFetcher(connect_to=("127.0.0.1", world_server.port), retries=2)
    got = f.fetch_one(url)
    assert got is not None  # retried past the 500
    assert got[0] == dict(
        zip(pages["url"].to_pylist(), pages["html"].to_pylist())
    )[url]


def test_retry_on_timeout(world_server, small_world):
    pages, _s, _r = small_world
    url = pages["url"].to_pylist()[1]
    sp = urlsplit(url)
    world_server.slow_once[(sp.hostname, sp.path or "/")] = 1.2
    f = HttpFetcher(
        connect_to=("127.0.0.1", world_server.port),
        timeout_s=0.4, retries=2,
    )
    got = f.fetch_one(url)
    assert got is not None  # first attempt timed out, retry succeeded


def test_m3_too_short_fallback(world_server, small_world):
    """The reference's browser->requests branch: primary UA body under
    the length gate triggers ONE fallback request with the fallback UA."""
    pages, _s, _r = small_world
    url = pages["url"].to_pylist()[2]
    sp = urlsplit(url)
    world_server.short_for_browser.add((sp.hostname, sp.path or "/"))
    f = HttpFetcher(
        connect_to=("127.0.0.1", world_server.port), min_html_len=64,
    )
    body, _date, via = f.fetch_one(url)[:3]
    assert via == "fallback"
    assert body == dict(
        zip(pages["url"].to_pylist(), pages["html"].to_pylist())
    )[url]
    # a URL not under the gate stays on the primary path
    url_ok = pages["url"].to_pylist()[3]
    assert f.fetch_one(url_ok)[2] == "primary"


def test_redirect_followed(world_server, small_world):
    """301/302 chains are followed up to max_redirects; loops miss."""
    pages, _s, _r = small_world
    urls = pages["url"].to_pylist()
    target = urlsplit(urls[4])
    host = target.hostname
    world_server.redirects[(host, "/moved")] = target.path
    world_server.redirects[(host, "/hop1")] = "/hop2"
    world_server.redirects[(host, "/hop2")] = target.path
    world_server.redirects[(host, "/loop")] = "/loop"
    f = HttpFetcher(connect_to=("127.0.0.1", world_server.port))
    want = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))[urls[4]]
    assert f.fetch_one(f"https://{host}/moved")[0] == want
    assert f.fetch_one(f"https://{host}/hop1")[0] == want
    assert f.fetch_one(f"https://{host}/loop") is None  # bounded hops


def test_gzip_content_encoding(world_server, small_world):
    """Content-Encoding: gzip bodies decode to the original page."""
    pages, _s, _r = small_world
    url = pages["url"].to_pylist()[5]
    sp = urlsplit(url)
    world_server.gzip_paths.add((sp.hostname, sp.path or "/"))
    f = HttpFetcher(connect_to=("127.0.0.1", world_server.port))
    want = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))[url]
    assert f.fetch_one(url)[0] == want


def test_fetch_robots_table(ray_session, world_server, small_world):
    """Distributed robots.txt harvest: RFC-9309 allow-all empty string on
    missing robots; fetched text round-trips exactly."""
    from langscrape_ray.stages.fetchers import fetch_robots_table

    pages, _s, _r = small_world
    hosts = sorted({urlsplit(u).hostname for u in pages["url"].to_pylist()})
    world_server.robots[hosts[0]] = "User-agent: *\nDisallow: /shop/\n"
    world_server.robots[hosts[1]] = "User-agent: *\nCrawl-delay: 2\n"
    got = fetch_robots_table(
        hosts[:3] + ["unknown.example"],
        connect_to=("127.0.0.1", world_server.port),
        concurrency=(1, 2),
    )
    assert got[hosts[0]] == "User-agent: *\nDisallow: /shop/\n"
    assert got[hosts[1]] == "User-agent: *\nCrawl-delay: 2\n"
    assert got[hosts[2]] == ""            # 404 -> allow-all
    assert got["unknown.example"] == ""   # host exists (same server), no robots


def test_crawl_end_to_end_http_parity(
    ray_session, world_server, small_cfg, small_world
):
    """Full crawl with fetcher=http against the local server: counters,
    crawl order, and seen set identical to the simulated-store run."""
    from langscrape_ray.pipelines.crawl import PagesStore, RayCrawl

    pages, seeds, robots = small_world
    rules_by_host = {
        host_name(small_cfg, h): field_rules(small_cfg, host_name(small_cfg, h))
        for h in range(small_cfg.n_hosts)
    }

    def run(store):
        crawl = RayCrawl(
            store, robots_dict(robots), field_rules(small_cfg),
            rules_by_host, CrawlPolicy(max_rounds=3),
        )
        return crawl.run(seeds)

    sim = run(PagesStore(table=pages))
    http = run(
        HttpPagesStore(
            connect_to=("127.0.0.1", world_server.port),
            concurrency=(1, 2), batch_size=64,
        )
    )
    assert http["counters"] == sim["counters"]
    assert http["trace_fetched"] == sim["trace_fetched"]
    assert http["seen_size"] == sim["seen_size"]


def test_crawl_fetcher_agnostic_three_way(
    ray_session, world_server, small_cfg, small_world
):
    """The PagesAdapter plug-point contract (stages/fetchers.py): the
    SAME crawl over three fetcher adapters — simulated parquet store,
    real HTTP against the local server, and a fake 'renders JS' browser
    pool (BrowserPagesStore with an injected render_fn) — must produce
    identical counters, crawl order, and seen set."""
    from langscrape_ray.pipelines.crawl import PagesStore, RayCrawl
    from langscrape_ray.stages.fetchers import BrowserPagesStore

    pages, seeds, robots = small_world
    rules_by_host = {
        host_name(small_cfg, h): field_rules(small_cfg, host_name(small_cfg, h))
        for h in range(small_cfg.n_hosts)
    }

    # the fake browser: a per-actor 'context' (plain dict) looked up per
    # url — the renderer returns what the dom would be post-JS; here the
    # world is static so render == page bytes, and warc_ts rides as
    # epoch-us exactly like the HTTP Date header does
    world = {
        url: (html, ts.timestamp() * 1_000_000 if hasattr(ts, "timestamp") else ts)
        for url, html, ts in zip(
            pages["url"].to_pylist(),
            pages["html"].to_pylist(),
            pages["warc_ts"].to_pylist(),
        )
    }

    def render_fn(url):
        got = world.get(url)
        if got is None:
            return None
        html, ts_us = got
        return html, int(ts_us)

    def run(store):
        crawl = RayCrawl(
            store, robots_dict(robots), field_rules(small_cfg),
            rules_by_host, CrawlPolicy(max_rounds=3),
        )
        return crawl.run(seeds)

    sim = run(PagesStore(table=pages))
    http = run(
        HttpPagesStore(
            connect_to=("127.0.0.1", world_server.port),
            concurrency=(1, 2), batch_size=64,
        )
    )
    browser = run(
        BrowserPagesStore(render_fn=render_fn, concurrency=(1, 2),
                          batch_size=64)
    )
    for got, name in ((http, "http"), (browser, "browser")):
        assert got["counters"] == sim["counters"], name
        assert got["trace_fetched"] == sim["trace_fetched"], name
        assert got["seen_size"] == sim["seen_size"], name


def test_browser_fetcher_loud_gate_without_runtime():
    """BrowserFetcher with no render_fn must gate LOUDLY (Chromium is
    not installable here), never silently stub."""
    from langscrape_ray.stages.fetchers import BrowserFetcher

    with pytest.raises(NotImplementedError, match="Playwright|render_fn"):
        BrowserFetcher()


def test_conditional_revalidation(world_server, small_world):
    """ETag revalidation cycle: first crawl captures validators, the
    recrawl sends If-None-Match and gets 304 rows (not_modified=1,
    empty body, NO body transfer) for unchanged pages, a fresh 200 with
    new validators for changed ones — the bandwidth path the adaptive-
    recrawl scheduler (X57) drives at scale."""
    pages, _s, _r = small_world
    urls = pages["url"].to_pylist()[:3]
    keys = []
    for u in urls:
        sp = urlsplit(u)
        keys.append((sp.hostname, sp.path or "/"))
    world_server.etags[keys[0]] = 'W/"v1-a"'
    world_server.etags[keys[1]] = 'W/"v1-b"'
    # keys[2]: no ETag — always refetched in full

    f = HttpFetcher(
        connect_to=("127.0.0.1", world_server.port), revalidate=True,
    )
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "etag": pa.array([""] * 3, pa.string()),
            "last_modified": pa.array([""] * 3, pa.string()),
        }
    )
    first = f(batch)
    assert first["not_modified"].to_pylist() == [0, 0, 0]
    etags1 = first["etag"].to_pylist()
    assert etags1[0] == 'W/"v1-a"' and etags1[1] == 'W/"v1-b"'
    assert etags1[2] == ""
    want = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
    assert first["html"].to_pylist() == [want[u] for u in urls]

    # recrawl: send the captured validators back
    recrawl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "etag": pa.array(etags1, pa.string()),
            "last_modified": pa.array([""] * 3, pa.string()),
        }
    )
    second = f(recrawl)
    assert second["not_modified"].to_pylist() == [1, 1, 0]
    htmls2 = second["html"].to_pylist()
    assert htmls2[0] == b"" and htmls2[1] == b""   # no body transferred
    assert htmls2[2] == want[urls[2]]              # full refetch
    assert second["etag"].to_pylist()[0] == 'W/"v1-a"'  # validator kept

    # content changed on the server: new ETag -> full 200 + new validator
    world_server.etags[keys[0]] = 'W/"v2-a"'
    third = f(recrawl)
    assert third["not_modified"].to_pylist() == [0, 1, 0]
    assert third["html"].to_pylist()[0] == want[urls[0]]
    assert third["etag"].to_pylist()[0] == 'W/"v2-a"'
