"""Graph analytics: crawl-graph PageRank must equal a single-process
pure-Python replay of the identical integer recurrence (no Ray) on the
same fixture world; the lineitem-graph tiers are covered in
tests/test_queries.py."""

import pandas as pd
import pytest


def _reference_pagerank(pages, iters, level):
    """Dict-based replay: same kernel outlink parse, same integer math."""
    from langscrape_ray.frontier.canonical import canonicalize_url as canonicalize
    from langscrape_ray.kernel.dom import parse_html
    from langscrape_ray.kernel.extract import extract_outlinks
    from langscrape_ray.pipelines.graph import BASE_NUM, DAMP_NUM, DEN, SCALE

    key = (lambda c: c[1]) if level == "host" else (lambda c: c[0])
    edges = set()
    for url, html in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        c = canonicalize(url)
        if c is None:
            continue
        src = key(c)
        for link in extract_outlinks(parse_html(html), url):
            lc = canonicalize(link)
            if lc is not None and key(lc) != src:
                edges.add((src, key(lc)))
    nodes = sorted({h for e in edges for h in e})
    out_deg = {h: 0 for h in nodes}
    in_deg = {h: 0 for h in nodes}
    for s, d in edges:
        out_deg[s] += 1
        in_deg[d] += 1
    rank = {h: SCALE for h in nodes}
    for _ in range(iters):
        agg = {h: 0 for h in nodes}
        for s, d in edges:
            agg[d] += rank[s] // out_deg[s]
        rank = {h: (BASE_NUM * SCALE + DAMP_NUM * agg[h]) // DEN for h in nodes}
    return pd.DataFrame(
        {
            "node": nodes,
            "out_deg": [out_deg[h] for h in nodes],
            "in_deg": [in_deg[h] for h in nodes],
            "rank_e9": [rank[h] for h in nodes],
        }
    )


@pytest.mark.parametrize("level", ["host", "url"])
def test_crawl_pagerank_matches_replay(ray_session, level):
    from langscrape_ray.pipelines.graph import ITERS, host_pagerank
    from langscrape_ray.sources.fixtures_gen import (
        FixtureConfig,
        build_pages_table,
    )

    pages = build_pages_table(FixtureConfig(n_pages=300, n_hosts=10, n_seeds=30))
    got = host_pagerank(pages, level=level).reset_index(drop=True)
    want = _reference_pagerank(pages, ITERS, level)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    if level == "url":
        # URL-level ranks differentiate (the 10-host fixture world's
        # HOST graph is complete, so host ranks are legitimately uniform)
        assert got["rank_e9"].nunique() > 1


def test_anchor_text_matches_replay(ray_session):
    """Distributed anchor-text table == dict-based single-process replay
    with the same kernel parse/canonicalize/normalize chain."""
    from collections import Counter, defaultdict

    from langscrape_ray.frontier.canonical import canonicalize_url
    from langscrape_ray.kernel.dom import parse_html
    from langscrape_ray.kernel.extract import extract_outlinks_with_text
    from langscrape_ray.pipelines.graph import anchor_text_table
    from langscrape_ray.sources.fixtures_gen import (
        FixtureConfig,
        build_pages_table,
    )

    pages = build_pages_table(FixtureConfig(n_pages=300, n_hosts=10, n_seeds=30))
    got = anchor_text_table(pages)

    per_dst = defaultdict(Counter)
    for url, html in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        for href, anchor in extract_outlinks_with_text(parse_html(html), url):
            c = canonicalize_url(href)
            if c is not None:
                per_dst[c[0]][anchor] += 1
    rows = []
    for dst in sorted(per_dst):
        cnt = per_dst[dst]
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        rows.append((dst, sum(cnt.values()), len(cnt), top))
    want = pd.DataFrame(
        rows, columns=["dst_url", "n_links", "n_unique_anchors", "top_anchor"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0
    # anchors with text exist in the fixture world (links carry labels)
    assert (got["top_anchor"] != "").any()
