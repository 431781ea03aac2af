"""Tests for the summary/collation tail and the tree-operator family."""

from langscrape_ray.kernel.dom import parse_html
from langscrape_ray.kernel.summary import (
    SCHEME_KEYS,
    build_summary,
    clean_tags,
    collate_record,
    extract_json_block,
    validate_scheme,
)
from langscrape_ray.kernel.treeops import (
    deduplicate_to_prune,
    default_token_count,
    find_most_repeated_subsequence,
    gen_xpath_by_text,
    get_xpath,
    keep_unique_structure,
    prune_by_tokens,
    prune_by_xpath,
    prune_to_text,
    remove_by_xpath,
)
from langscrape_ray.kernel.xpath import xpath_eval


def test_extract_json_block_ladder():
    assert extract_json_block('```json\n{"a": 1}\n```') == {"a": 1}
    assert extract_json_block('noise {"b": 2} trailing') == {"b": 2}
    assert extract_json_block('{"c": 3}') == {"c": 3}
    assert extract_json_block("not json at all") == {}
    assert extract_json_block(None) == {}


def test_clean_tags_semi_join():
    out = clean_tags(
        {"theme_tags": ["Crawl", "NotAllowed", "Robots"], "location_tags": "bad"}
    )
    assert out["theme_tags"] == ["Crawl", "Robots"]
    assert out["location_tags"] == []  # non-list coerced to empty


def test_validate_scheme_keysets():
    good = {k: "" for k in SCHEME_KEYS}
    ok, report = validate_scheme(good)
    assert ok and report["keys_missing"] == [] and report["keys_to_remove"] == []
    bad = dict(good)
    bad.pop("title")
    bad["extra"] = 1
    ok, report = validate_scheme(bad)
    assert not ok
    assert report["keys_missing"] == ["title"]
    assert report["keys_to_remove"] == ["extra"]


def test_build_summary_and_collate():
    fields = {
        "title": ["Big News"],
        "author": ["(Empty Result)", "Jane"],
        "datetime": ["2024-03-04"],
        "article_body": ["Crawl frontier text."],
    }
    s = build_summary(
        "https://h.example/a", "h.example", fields, "Crawl frontier text.\nmore", "en"
    )
    assert set(s.keys()) == set(SCHEME_KEYS)
    assert s["title"] == "Big News"
    assert s["author"] == "Jane"  # sentinel values skipped
    assert s["publication_date"] == "2024-03-04"
    assert s["platform"] == "h.example"
    assert "Crawl" in s["theme_tags"] and "Frontier" in s["theme_tags"]
    rec = collate_record("https://h.example/a", "id1", fields, s, ["author"])
    assert rec["meta_data"]["is_valid_scheme"]
    assert rec["extraction"]["title"] == ["Big News"]


HTML = (
    "<html><body><div id='a'><p>one two three</p><p>four five</p></div>"
    "<div><ul><li class='x'><a href='/1'>l1</a></li><li class='x'><a href='/2'>l2</a></li>"
    "<li class='x'><a href='/3'>l3</a></li><li class='x'><a href='/4'>l4</a></li></ul></div>"
    "<table><tr><td><b>cell</b></td></tr></table></body></html>"
)


def test_get_xpath_roundtrip():
    root = parse_html(HTML)
    p2 = xpath_eval(root, "//div[1]/p[2]")[0]
    xp = get_xpath(p2)
    assert xp == "/html/body/div[1]/p[2]"
    assert xpath_eval(root, xp) == [p2]


def test_gen_xpath_by_text():
    root = parse_html(HTML)
    xps = gen_xpath_by_text(root, "four five")
    assert xps and xps[0] == "/html/body/div[1]/p[2]"


def test_prune_by_tokens():
    root = parse_html(HTML)
    prune_by_tokens(root, 5)
    total = default_token_count(root.text_content())
    assert total <= 5
    assert "one two three" in root.text_content()  # leftmost kept


def test_prune_by_xpath_keeps_subtree_and_elides():
    root = parse_html(HTML)
    prune_by_xpath(root, ["//div[@id='a']"])
    assert "one two three" in root.text_content()
    assert "l1" not in root.text_content()
    assert "..." in root.text_content()


def test_remove_by_xpath():
    root = parse_html(HTML)
    remove_by_xpath(root, ["//ul"])
    assert "l1" not in root.text_content()


def test_prune_to_text_preserves_table_shape():
    root = parse_html(HTML)
    body = xpath_eval(root, "//body")[0]
    prune_to_text(body)
    assert xpath_eval(root, "//table//td")  # skeleton kept
    assert not xpath_eval(root, "//b")  # inner markup collapsed
    assert "cell" in root.text_content()


def test_deduplicate_to_prune():
    xps = ["/a/b", "/a/b/c", "/a/b[2]", "/a/x", "/a/xy"]
    assert deduplicate_to_prune(xps) == ["/a/b", "/a/x", "/a/xy"]


def test_repeated_subsequence_and_unique_structure():
    assert find_most_repeated_subsequence(["a", "b", "a", "b", "c"])[2] >= 2
    root = parse_html(HTML)
    keep_unique_structure(root)
    lis = xpath_eval(root, "//li")
    assert len(lis) == 1  # repeated card structure collapsed to first


def test_css_selectors():
    from langscrape_ray.kernel.css import CssError, extract_text_by_css, select

    root = parse_html(
        "<div id='main' class='wrap outer'><p class='lead big'>Hello</p>"
        "<p>world</p></div><div class='wrap'><span class='lead'>x</span></div>"
    )
    assert [n.text_content() for n in select(root, "p")] == ["Hello", "world"]
    assert [n.text_content() for n in select(root, ".lead")] == ["Hello", "x"]
    assert [n.text_content() for n in select(root, "p.lead")] == ["Hello"]
    assert [n.text_content() for n in select(root, "#main p")] == ["Hello", "world"]
    assert [n.text_content() for n in select(root, "div.wrap span.lead")] == ["x"]
    assert select(root, "#nope") == []
    assert extract_text_by_css(root, "#main") == ["Hello\nworld"]
    # child combinator (supported since round 2)
    assert [n.text_content() for n in select(root, "div.wrap > span")] == ["x"]
    import pytest as _pytest

    with _pytest.raises(CssError):
        select(root, "p::first-line")  # pseudo-elements unsupported


def test_clean_tree_deep_variant():
    from langscrape_ray.kernel.clean import clean_tree_deep

    html = (
        "<html><head><title>T</title></head><body>"
        "<div style='display: none'>hidden</div>"
        "<p class='x' data-z='1' id='p1'>keep</p><img src='x' alt='a'>"
        "<div></div></body></html>"
    )
    root = parse_html(html)
    clean_tree_deep(root)
    assert "hidden" not in root.text_content()
    assert "T" not in root.text_content()  # head/title removed (etree variant)
    p = xpath_eval(root, "//p")[0]
    assert set(p.attrs) == {"class", "id"}  # narrowed whitelist
    assert xpath_eval(root, "//img")  # img kept when deep=False

    root2 = parse_html(html)
    clean_tree_deep(root2, deep=True)
    assert not xpath_eval(root2, "//img")
    assert xpath_eval(root2, "//p")[0].attrs == {}


def test_token_tree_fragment_mining():
    from langscrape_ray.kernel.treeops import (
        build_token_tree,
        extract_fragments_by_weight,
    )

    html = (
        "<html><body>"
        "<nav><a href='/'>home</a></nav>"
        "<section class='article-body'>"
        + "".join(f"<p>{'word ' * 30}p{i}</p>" for i in range(4))
        + "</section>"
        "<ul class='cards'>" + "".join(f"<li>item {i} text here</li>" for i in range(6))
        + "</ul>"
        "<footer><span>tiny</span></footer>"
        "</body></html>"
    )
    root = parse_html(html)
    tree = build_token_tree(root)
    assert tree.text_tokens > 100
    frags = extract_fragments_by_weight(root, max_fragments=2, max_tokens=200,
                                        min_tokens=10)
    assert 1 <= len(frags) <= 2
    # the heavy classed container (article body) should be mined first
    assert any("section" in f or "ul" in f for f in frags)
    # fragments must not nest inside each other
    for i, a in enumerate(frags):
        for b in frags[i + 1 :]:
            assert not b.startswith(a) and not a.startswith(b)
