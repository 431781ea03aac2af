"""Extraction-kernel unit tests: reference semantics
(/root/reference/langscrape/html/xpath_extractor.py:47-87,
/root/reference/feilian/soup_tools.py:26-74,
/root/reference/feilian/text_tools.py:20-48)."""

from langscrape_ray.kernel import (
    SENTINEL_EMPTY,
    SENTINEL_NO_STORED_VALUE,
    SENTINEL_NO_XPATH,
    clean_html_for_extraction,
    collapse_dots,
    collapse_whitespace,
    extract_by_xpath_map,
    normalize_text,
    page_text,
    parse_html,
    remove_control_characters,
    xpath_eval,
)
from langscrape_ray.kernel.extract import extract_outlinks, fallback_fields

HTML = """<html><head><title>T &amp; t</title>
<meta name="author" content="Meta Author"><script>bad()</script></head>
<body><!-- c -->
<h1 class="headline" data-x="1">Big <em>News</em></h1>
<span class="author">By Bob</span>
<time datetime="2024-01-02">2024-01-02</time>
<div></div><a href="javascript:void(0)">x</a>
<section class="article-body"><p>One &nbsp; two.</p><p>Three.</p></section>
</body></html>"""


def test_normalize_text_entity_table():
    assert normalize_text("a &amp; b &nbsp; c  d &eacute;") == "a & b c d é"
    assert normalize_text("&#8226; x &ndash; y") == "• x – y"
    # double-escaped entity resolved by the unescape pass
    assert normalize_text("&amp;amp;") == "&"


def test_normalize_text_single_pass_matches_sequential():
    """The one-regex entity pass must equal the reference's SEQUENTIAL
    table replaces (/root/reference/feilian/text_tools.py:20-48) after
    the full normalize chain — fuzzed over adversarial entity fragments
    (overlaps, replacement outputs seeding later entities, truncations)."""
    import random
    import html as _htmllib
    from langscrape_ray.kernel.textops import _ENTITY_TABLE, _MULTI_SPACE_RE

    def reference_normalize(text):
        for src, dst in _ENTITY_TABLE:
            if src in text:
                text = text.replace(src, dst)
        if "&" in text:
            text = _htmllib.unescape(text)
        if "\xa0" in text:
            text = text.replace("\xa0", " ")
        if "  " in text:
            text = _MULTI_SPACE_RE.sub(" ", text)
        return text.strip()

    frags = [s for s, _ in _ENTITY_TABLE] + [s[:-1] for s, _ in _ENTITY_TABLE] + [
        "&", ";", "#", "amp", "lt", "gt", "x27", "39", "0", "&amp;", "&&",
        " ", "  ", "\xa0", "a", "Z", "9", "&not", "&notin;", "&#", "&#x",
        "&frac", "12;", "&e", "acute;", "&amp;amp;", "&amp;lt;",
        "&amp;#150;", "&#16", "0;", "&#15", "&nb", "sp;", "&quo", "t;",
    ]
    rng = random.Random(1234)
    for _ in range(20000):
        s = "".join(rng.choice(frags) for _ in range(rng.randint(0, 8)))
        assert normalize_text(s) == reference_normalize(s), repr(s)


def test_ws_change_only_pattern_matches_ws_run():
    """clean._WS_RUN_RE (change-only form) must collapse identically to
    the plain r'\\s+' it replaces, including across the NUL joiner."""
    import re
    import random
    from langscrape_ray.kernel.clean import _WS_RUN_RE

    plain = re.compile(r"\s+")
    rng = random.Random(7)
    chars = [" ", "\t", "\n", "\xa0", "\r", "\x0c", "\v", "a", ".", "\x00"]
    for _ in range(20000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 14)))
        assert _WS_RUN_RE.sub(" ", s) == plain.sub(" ", s), repr(s)


def test_normalize_lines_matches_per_line():
    """normalize_lines(t) must equal [normalize_text(ln) for ln in
    t.split('\\n')] — the batched page-level pass used by extract_one."""
    from langscrape_ray.kernel.textops import normalize_lines

    cases = [
        "a &amp; b\n  two  spaces  \n&nbsp;lead\ttab\n",
        "&amp\nx\n&notin y\n&not\nin",  # semicolon-less entities at line edges
        "\n\n",
        "",
        "no-op line",
        "&eacute;\n&#8226;\n\xa0\xa0\n&amp;amp;\nend  ",
        "trail &\n& lead\nmid & amp\n  \x0b keep-vertical-tab \x0b  ",
    ]
    # plus fixture-page texts for realistic coverage
    from langscrape_ray.kernel.extract import html_to_text
    from langscrape_ray.kernel.clean import cleaned_tree
    from langscrape_ray.sources.fixtures_gen import (
        FixtureConfig, build_page_html,
    )

    cfg = FixtureConfig(seed=7, n_pages=40, n_hosts=4, n_seeds=8)
    for h in range(2):
        for i in range(6):
            cases.append(html_to_text(cleaned_tree(
                build_page_html(cfg, h, i, ["https://h0.example/p0"]))))
    for t in cases:
        assert normalize_lines(t) == [
            normalize_text(ln) for ln in t.split("\n")
        ]


def test_remove_control_characters():
    s = "ok\x00\x0b\x1f&#11;&#x0b;&#x1F496;emoji"
    out = remove_control_characters(s)
    assert "\x00" not in out and "&#11;" not in out and "&#x0b;" not in out
    assert "&#x1F496;" in out  # emoji char-ref survives


def test_collapse_helpers():
    assert collapse_whitespace(" a\n\t b ") == "a b"
    assert collapse_dots("a....b   c") == "a.b c"


def test_clean_removes_junk():
    cleaned = clean_html_for_extraction(HTML)
    assert "script" not in cleaned and "<!--" not in cleaned
    assert "data-x" not in cleaned  # attr whitelist
    assert 'href="javascript' not in cleaned
    assert "<div></div>" not in cleaned  # empty element dropped
    assert 'class="headline"' in cleaned  # kept attr
    assert "  " not in cleaned  # whitespace collapsed


def test_extract_sentinels_and_values():
    cleaned = clean_html_for_extraction(HTML)
    rules = {
        "title": {"strategy": "xpath_extractor", "xpath": "//h1"},
        "author": {"strategy": "xpath_extractor", "xpath": "//span[@class='author']"},
        "body": {"strategy": "xpath_extractor", "xpath": "//section[@class='article-body']/p"},
        "none": {"strategy": "xpath_extractor", "xpath": "//article"},
        "noxp": {"strategy": "xpath_extractor"},
        "lm_empty": {"strategy": "lm_capabilities"},
        "lm_vals": {"strategy": "lm_capabilities", "value": [" a ", "", None, "b"]},
        "bad": {"strategy": "xpath_extractor", "xpath": "//["},
    }
    out = extract_by_xpath_map(cleaned, rules)
    assert out["title"] == ["Big News"]
    assert out["author"] == ["By Bob"]
    assert out["body"] == ["One two.", "Three."]
    assert out["none"] == [SENTINEL_EMPTY]
    assert out["noxp"] == [SENTINEL_NO_XPATH]
    assert out["lm_empty"] == [SENTINEL_NO_STORED_VALUE]
    assert out["lm_vals"] == ["a", "b"]
    assert out["bad"][0].startswith("Error: ")


def test_xpath_features():
    root = parse_html(
        "<div><p id='a'>one</p><p class='x y'>two</p><p>three</p></div>"
        "<div><p>only</p></div>"
    )
    assert [n.text_content() for n in xpath_eval(root, "//div/p[1]")] == ["one", "only"]
    assert [n.text_content() for n in xpath_eval(root, "//p[@class='x y']")] == ["two"]
    assert [n.text_content() for n in xpath_eval(root, "//p[contains(@class,'x')]")] == ["two"]
    assert [n.text_content() for n in xpath_eval(root, "//p[last()]")] == ["three", "only"]
    assert xpath_eval(root, "//p[@id]")[0].text_content() == "one"
    assert xpath_eval(root, "//p/@id") == ["a"]
    assert xpath_eval(root, "//div[2]/p/text()") == ["only"]
    assert [n.text_content() for n in xpath_eval(root, "//p[contains(text(),'thr')]")] == ["three"]


def test_page_text_deterministic():
    t1, t2 = page_text(HTML), page_text(HTML)
    assert t1 == t2
    assert "Big News" in t1 and "One two." in t1.replace("\n", " ")


def test_outlinks():
    root = parse_html(
        '<a href="/rel">r</a><a href="https://x.example/a">a</a>'
        '<a href="javascript:f()">j</a><a href="#top">t</a><a href="mailto:x@y">m</a>'
    )
    assert extract_outlinks(root, "https://base.example/dir/page") == [
        "https://base.example/rel",
        "https://x.example/a",
    ]


def test_fallback_fields():
    raw = parse_html(HTML)
    extracted = {
        "article_body": [SENTINEL_EMPTY],
        "title": [],
        "author": ["Error: boom"],
        "datetime": [SENTINEL_NO_XPATH],
    }
    out, flags = fallback_fields(raw, extracted)
    assert set(flags) == {"article_body", "title", "author", "datetime"}
    assert out["title"] == ["T & t"]
    assert out["author"] == ["Meta Author"]
    assert out["datetime"] == ["2024-01-02"]
    assert "two." in out["article_body"][0]


def test_weird_bytes_roundtrip():
    raw = "<html><body><p>caf\xe9 ok</p></body></html>".encode("latin-1")
    text = page_text(raw)
    assert "café ok" in text


def test_serialized_len_matches_serialize():
    """serialized_len() must equal len(serialize()) — the M3 length gate
    relies on this invariant — across the fixture corpus and an
    escape-heavy adversarial case."""
    from langscrape_ray.kernel.clean import cleaned_tree
    from langscrape_ray.sources.fixtures_gen import FixtureConfig, build_pages_table

    nasty = (
        "<html><body><!-- c&o<m -->"
        '<div class="a&amp;b &quot;q&quot; x<y" data-k>'
        "t&amp;x < y > z</div><br/><img src='u?a=1&b=2'/>"
        "<p>&lt;escaped&gt; &amp; raw & < ></p></body></html>"
    )
    trees = [parse_html(nasty), cleaned_tree(parse_html(nasty))]
    cfg = FixtureConfig(n_pages=60, n_hosts=6, n_seeds=6)
    pages = build_pages_table(cfg)
    for html in pages["html"].to_pylist()[:40]:
        root = parse_html(html)
        trees.append(root)
        trees.append(cleaned_tree(root))
    for t in trees:
        assert t.serialized_len() == len(t.serialize())


def test_outlinks_absolute_fastpath_equiv():
    """The absolute-URL fast path must equal urljoin byte-for-byte,
    including non-normalized dot segments (urljoin leaves absolute refs
    verbatim)."""
    from urllib.parse import urljoin

    hrefs = [
        "http://x/y", "https://x:8080/y?q=1#f", "http://x",
        "http://x/../y", "http://x/y//z/./w",
    ]
    base = "https://base.example/dir/page"
    root = parse_html(
        "".join(f'<a href="{h}">l</a>' for h in hrefs)
    )
    assert extract_outlinks(root, base) == [urljoin(base, h) for h in hrefs]


def test_fast_tokenizer_differential():
    """The fast tokenizer must either reject a page (stdlib fallback) or
    produce a DOM deep-equal to the stdlib parser's — over hand cases,
    adversarial markup, the fixture corpus, and a seeded fuzz."""
    import random

    from langscrape_ray.kernel.dom import (
        Node,
        _fast_tokenize,
        _TreeBuilder,
        decode_html_bytes,
    )
    from langscrape_ray.kernel.textops import remove_control_characters
    from langscrape_ray.sources.fixtures_gen import FixtureConfig, build_pages_table

    def stdlib_parse(s):
        b = _TreeBuilder()
        b.feed(s)
        b.close()
        return b.root

    def fast_or_none(s):
        ev = _fast_tokenize(s)
        if ev is None:
            return None
        b = _TreeBuilder()
        for e in ev:
            k = e[0]
            if k == "data":
                b.handle_data(e[1])
            elif k == "start":
                b.handle_starttag(e[1], e[2])
            elif k == "end":
                b.handle_endtag(e[1])
            elif k == "startend":
                b.handle_startendtag(e[1], e[2])
            else:
                b.handle_comment(e[1])
        return b.root

    def deep_eq(a, b):
        if isinstance(a, Node) != isinstance(b, Node):
            return False
        if not isinstance(a, Node):
            return type(a) == type(b) and str(a) == str(b)
        if a.tag != b.tag or a.attrs != b.attrs or len(a.children) != len(b.children):
            return False
        return all(deep_eq(x, y) for x, y in zip(a.children, b.children))

    cases = [
        '<html><body><p>a &amp; b</p></body></html>',
        '<div class="x" id=\'y\' data-z=unq checked><br/><img src="u?a=1&amp;b=2"/></div>',
        '<!DOCTYPE html><html><!-- c -- ment --><script>if (a<b && c>d) x();</script></html>',
        '<p>one<p>two</p><ul><li>a<li>b</ul>',
        '<a href="/x">t</a>text & &lt;tag&gt; &#65; &bogus; trailing &',
        '<SCRIPT TYPE="t">var x=1;</SCRIPT><style>a{b:"c"}</style>',
        '<?xml?><div\nclass="a"\n>multi</div>', '<td>x</td><div/>', '',
        # adversarial (fallback or equal — both acceptable)
        '<div', '</', 'a < b', '<1tag>', '<div class=">">b</div>',
        '<!--unclosed', '<script>no close', '<script></scriptx></script>',
        '<!doctype html [ <!ENTITY x "y"> ]><p>t</p>', '<![CDATA[x]]>',
        '<div class="a"id="b">t</div>', '<div / >x</div>',
        '<p>&#x48;&#X49;&#72;</p>', '<em>unclosed <b>nested',
        '<script>x("</div>");</script>',
    ]
    pages = build_pages_table(FixtureConfig(n_pages=80, n_hosts=8, n_seeds=8))
    corpus = [decode_html_bytes(h) for h in pages["html"].to_pylist()]
    rng = random.Random(7)
    frags = ['<div>', '</div>', '<p class="a">', 'text', ' & ', '&amp;', '&#65;',
             '<br/>', '<img src=x>', '<', '>', '<!-- c -->', '<!--', '-->',
             '<script>', '</script>', '<a href="/x?a=1&b=2">', '</a>',
             '&bogus;', '=', '/>', '<!doctype html>', '<?pi?>', '\n',
             '<em a=b c>', '</em >', '&amp', '"', "'"]
    fuzz = ["".join(rng.choices(frags, k=rng.randint(1, 10))) for _ in range(800)]

    n_fast = 0
    for s in cases + corpus + fuzz:
        s = remove_control_characters(s)
        f = fast_or_none(s)
        if f is None:
            continue
        n_fast += 1
        assert deep_eq(f, stdlib_parse(s)), f"fast/stdlib divergence on {s!r}"
    assert n_fast >= len(corpus)  # the well-formed corpus takes the fast path


def test_outlinks_degenerate_delimiters_take_urljoin_path():
    """Absolute hrefs with EMPTY query/fragment delimiters must not take
    the verbatim fast path: the urlsplit round-trip drops the bare '?'/'#'
    and the outlink key must stay identical to the urljoin behavior."""
    from urllib.parse import urljoin

    hrefs = ["http://x/y?", "http://x/y#", "https://x/a?#frag", "http://x/?"]
    base = "https://base.example/dir/page"
    root = parse_html("".join(f'<a href="{h}">l</a>' for h in hrefs))
    assert extract_outlinks(root, base) == [urljoin(base, h) for h in hrefs]


def test_sniff_charset_cases():
    """BOMs, WHATWG meta prescan (both forms), lying declarations, and
    unknown labels — the html:binary ingestion contract."""
    from langscrape_ray.kernel.dom import decode_html_bytes, sniff_charset

    assert sniff_charset(b"\xef\xbb\xbf<html>") == ("utf-8-sig", "bom")
    assert sniff_charset("x".encode("utf-16")) == ("utf-16", "bom")
    assert sniff_charset(b'<meta charset="windows-1251">') == (
        "cp1251", "meta")
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=Shift_JIS">'
    ) == ("shift_jis", "meta")
    assert sniff_charset(b'<meta charset="no-such-label">x') == (
        "utf-8", "default")
    assert sniff_charset(b"plain") == ("utf-8", "default")

    # declared codecs decode; BOMs are stripped
    assert decode_html_bytes(
        b'<meta charset="windows-1251">' + "Привет".encode("cp1251")
    ).endswith("Привет")
    assert decode_html_bytes("<html>Привет</html>".encode("utf-16")) == (
        "<html>Привет</html>")
    assert decode_html_bytes(b"\xef\xbb\xbfhi") == "hi"

    # the lying-declaration page keeps the OLD utf-8-else-latin-1 result
    # (golden-output compatibility: fixture weird-bytes pages)
    lying = b'<meta charset="utf-8"><body>caf\xe9</body>'
    assert decode_html_bytes(lying) == lying.decode("latin-1")
    # a declared codec that fails strict decode falls down the chain
    bad = b'<meta charset="shift_jis">\x81'  # truncated sjis lead byte
    assert decode_html_bytes(bad) == bad.decode("latin-1")
