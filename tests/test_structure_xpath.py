"""Round-2 coverage: widened mini-XPath grammar, F6 operator plans,
F8 structure skeletons, F9 table extraction + stats, and the rule_eval
operator-plan replay."""

import pyarrow as pa
import pytest

from langscrape_ray.kernel.clean import clean_tree
from langscrape_ray.kernel.dom import parse_html
from langscrape_ray.kernel.structure import (
    clear_node,
    collapse_repeated,
    extract_structure_skeleton,
    extract_tables,
    extract_tables_recursive,
    get_structure,
    get_table_title,
    get_tables_count,
    get_tables_depth,
    get_tables_max_width,
    get_tables_width,
    prune_by_structure,
    run_operators,
)
from langscrape_ray.kernel.xpath import XPathError, xpath_eval

HTML = """<html><body>
<div id="a"><p class="x y" id="p1">one</p><p>two</p><p>three</p></div>
<div id="b"><p>only</p><a href="/shop/item?q=1">buy</a><span>Price: $42.99</span></div>
<h1>Big Title</h1><h2>Sub</h2>
</body></html>"""


@pytest.fixture()
def root():
    return parse_html(HTML)


def _texts(hits):
    return [n.text_content() if hasattr(n, "text_content") else n for n in hits]


# ---------------------------------------------------------------------------
# widened mini-XPath
# ---------------------------------------------------------------------------

def test_xpath_union_document_order(root):
    assert _texts(xpath_eval(root, "//h1|//h2")) == ["Big Title", "Sub"]
    # branch order does not matter: results merge in document order
    assert _texts(xpath_eval(root, "//h2 | //h1")) == ["Big Title", "Sub"]


def test_xpath_retest_exslt(root):
    assert _texts(xpath_eval(root, r"//span[re:test(., '\$[0-9]+\.[0-9]{2}')]")) == [
        "Price: $42.99"
    ]
    # flags arg ('i') and text() target
    assert _texts(xpath_eval(root, "//p[re:test(text(), '^ON', 'i')]")) == [
        "one", "only",
    ]
    assert _texts(xpath_eval(root, "//a[re:test(@href, '^/shop/')]")) == ["buy"]
    # char class brackets inside the predicate parse correctly
    assert _texts(xpath_eval(root, "//span[re:test(., '[0-9]+')]")) == [
        "Price: $42.99"
    ]


def test_xpath_starts_with_and_contains(root):
    assert _texts(xpath_eval(root, "//p[starts-with(text(), 'thr')]")) == ["three"]
    assert _texts(xpath_eval(root, "//a[starts-with(@href, '/shop')]")) == ["buy"]
    # slash inside the quoted string must not split the path
    assert _texts(xpath_eval(root, "//a[contains(@href,'/shop/')]")) == ["buy"]
    # contains on the element string-value ('.')
    hits = xpath_eval(root, "//div[contains(., '42.99')]")
    assert [n.attrs.get("id") for n in hits] == ["b"]


def test_xpath_position_and_last(root):
    assert _texts(xpath_eval(root, "//div[1]/p[position()>1]")) == ["two", "three"]
    assert _texts(xpath_eval(root, "//div[1]/p[position()<=2]")) == ["one", "two"]
    assert _texts(xpath_eval(root, "//div[1]/p[last()-1]")) == ["two"]


def test_xpath_parent_self_not(root):
    assert xpath_eval(root, "//p[@id='p1']/..")[0].attrs.get("id") == "a"
    assert _texts(xpath_eval(root, "//div[1]/p[not(@class)]")) == ["two", "three"]
    same = xpath_eval(root, "//div[2]/.")
    assert [n.attrs.get("id") for n in same] == ["b"]


def test_xpath_errors_still_sentinel():
    r = parse_html(HTML)
    for bad in ["//p[foo()]", "", "//p[position()=x]", "//p[re:test(., '[')]"]:
        with pytest.raises(XPathError):
            xpath_eval(r, bad)


DL_HTML = """<html><body>
<dl><dt>Author</dt><dd>Jane</dd><dt>Date</dt><dd>2020</dd></dl>
<div class="a" id="x"><p class="m n">one</p><p>two</p></div>
<div class="b"><p>three</p></div>
</body></html>"""


def test_xpath_sibling_axes():
    """The classic label->value extraction shape mined xpaths rely on:
    //dt[text()='L']/following-sibling::dd[1] (reference analog:
    lxml XPath 1.0 axes through feilian/etree_tools.py:437-457)."""
    r = parse_html(DL_HTML)
    assert _texts(xpath_eval(r, "//dt[text()='Author']/following-sibling::dd[1]")) == ["Jane"]
    assert _texts(xpath_eval(r, "//dt[text()='Date']/following-sibling::dd[1]")) == ["2020"]
    # preceding axis order = proximity, so [1] is the NEAREST preceding
    assert _texts(xpath_eval(r, "//dd[.='2020']/preceding-sibling::dt[1]")) == ["Date"]
    # unpredicated preceding siblings come back in document order
    assert _texts(xpath_eval(r, "//dd[2]/preceding-sibling::dt")) == ["Author", "Date"]
    # terminal text() after a named axis
    assert xpath_eval(r, "//dt[text()='Author']/following-sibling::dd[1]/text()") == ["Jane"]
    with pytest.raises(XPathError):
        xpath_eval(r, "//x//following-sibling::y")


def test_xpath_boolean_predicates_and_equality():
    r = parse_html(DL_HTML)
    assert _texts(xpath_eval(r, "//div[@class='a' and @id='x']/p[1]")) == ["one"]
    assert _texts(xpath_eval(r, "//div[@class='a' or @class='b']/p[last()]")) == ["two", "three"]
    assert _texts(xpath_eval(r, "//p[contains(@class,'m') and contains(@class,'n')]")) == ["one"]
    # '!=' requires the attribute to exist (XPath node-set rule): the
    # class-less <p> rows don't match
    assert _texts(xpath_eval(r, "//div[@class!='a']/p")) == ["three"]
    assert _texts(xpath_eval(r, "//p[not(@class) and contains(text(),'t')]")) == ["two", "three"]
    assert _texts(xpath_eval(r, "//p[text()!='one']")) == ["two", "three"]
    with pytest.raises(XPathError):
        xpath_eval(r, "//p[position()<2 and @class]")


# ---------------------------------------------------------------------------
# F6: run_operators
# ---------------------------------------------------------------------------

def test_run_operators_prune_clears_in_place():
    r = parse_html(HTML)
    run_operators(r, [{"xpath": "//div[@id='a']", "operator_type": "prune"}])
    div = xpath_eval(r, "//div")[0]
    assert div.children == [] and div.attrs == {}
    assert _texts(xpath_eval(r, "//h1")) == ["Big Title"]  # untouched


def test_run_operators_prune_then_extract():
    r = parse_html(HTML)
    run_operators(
        r,
        [
            {"xpath": "//div[@id='a']", "operator_type": "prune"},
            {"xpath": "//span", "operator_type": "extract"},
        ],
    )
    assert _texts(xpath_eval(r, "//span")) == ["Price: $42.99"]
    assert not xpath_eval(r, "//h1")  # pruned by extract-keep


def test_clear_node():
    r = parse_html("<div class='z'><p>x</p>tail</div>")
    d = xpath_eval(r, "//div")[0]
    clear_node(d)
    assert d.children == [] and d.attrs == {} and d.tag == "div"


# ---------------------------------------------------------------------------
# F8: skeleton + structure-guided pruning
# ---------------------------------------------------------------------------

REPEATED = (
    '<html><body><div class="w">'
    + "".join(
        f'<div class="card"><h4>t{i}</h4><p>b{i}</p></div>' for i in range(5)
    )
    + '<div class="other"><p>x</p></div></div></body></html>'
)


def test_skeleton_strips_inline_text_and_attrs():
    r = parse_html(
        '<html><body><div class="k" id="i"><span>s</span><b>b</b>text</div>'
        "</body></html>"
    )
    extract_structure_skeleton(r)
    s = r.serialize()
    assert s == '<html><body><div class="k"></div></body></html>'


def test_get_structure_collapses_repeats():
    sk = get_structure(REPEATED)
    # backward-scan keeps the first occurrence (+ untouched index 0)
    assert len(xpath_eval(sk, "//div[@class='card']")) == 2
    assert len(xpath_eval(sk, "//div[@class='other']")) == 1
    assert "t0" not in sk.serialize()  # no text in a skeleton


def test_get_structure_ul_li_collapse():
    html = (
        '<html><body><ul class="l"><li class="i">1</li><li class="i">2</li>'
        '<li class="i">3</li></ul></body></html>'
    )
    sk = get_structure(html)
    assert len(xpath_eval(sk, "//li")) == 1


def test_prune_by_structure_aligns():
    sk = get_structure(REPEATED)
    origin = parse_html(REPEATED)
    clean_tree(origin)
    prune_by_structure(origin, sk)
    assert len(xpath_eval(origin, "//div[@class='card']")) == 2
    # origin keeps its text (structure pruning drops shape, not content)
    assert "t0" in origin.serialize()


def test_collapse_repeated_keeps_table_row_shape():
    html = (
        "<html><body><table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table></body></html>"
    )
    r = parse_html(html)
    extract_structure_skeleton(r)
    collapse_repeated(r)
    # table keeps only first tr; tr keeps its td children (reference rule)
    assert len(xpath_eval(r, "//tr")) == 1
    assert len(xpath_eval(r, "//td")) == 2


# ---------------------------------------------------------------------------
# F9: table extraction + shape stats
# ---------------------------------------------------------------------------

TABLES = (
    "<html><body><h3>Numbers</h3>"
    "<table><caption>Main</caption><tr><td>a</td><td>"
    "<table><tr><td>inner</td></tr></table></td></tr></table>"
    "<p>tail</p><table><tr><td>flat</td></tr></table>"
    "</body></html>"
)


def test_extract_tables_one_layer():
    tabs = extract_tables(parse_html(TABLES))
    assert len(tabs) == 2
    assert all(t["children"] == [] for t in tabs)
    assert tabs[0]["title"] == "Main"  # caption wins
    assert tabs[1]["title"] == "tail"  # previous-sibling fallback


def test_extract_tables_recursive_and_stats():
    tabs = extract_tables_recursive(parse_html(TABLES))
    assert len(tabs) == 2
    assert len(tabs[0]["children"]) == 1
    assert tabs[0]["children"][0]["title"] is None  # td has no prev sibling
    assert get_tables_depth(tabs) == 2
    assert get_tables_count(tabs) == 2  # leaves: inner + flat
    assert get_tables_width(tabs) == 2
    assert get_tables_max_width(tabs) == 1


def test_get_table_title_none_without_siblings():
    r = parse_html("<html><body><table><tr><td>x</td></tr></table></body></html>")
    t = xpath_eval(r, "//table")[0]
    assert get_table_title(t) is None


def test_table_stats_pipeline_matches_closed_form(ray_session):
    from langscrape_ray.pipelines.tables import table_stats

    df = table_stats("/root/testdata/sf0.001")
    assert len(df) == 500
    # spot-check closed form for a few ids
    for _, row in df.head(20).iterrows():
        d = int(row["doc_id"])
        n_top = 1 + d % 3
        cs = [2 * ((d + j) % 2) for j in range(n_top)]
        assert row["n_top"] == n_top
        assert row["n_nested"] == sum(cs)
        assert row["depth"] == (2 if any(cs) else 1)
        assert row["n_leaves"] == sum(c if c else 1 for c in cs)
        assert row["n_caps"] == sum(1 for j in range(n_top) if (d + j) % 3 != 0)


# ---------------------------------------------------------------------------
# rule_eval replays an operator plan (F6 wiring)
# ---------------------------------------------------------------------------

def test_rule_eval_with_operator_plan(ray_session):
    import ray.data as rd

    from langscrape_ray.pipelines.rule_eval import (
        evaluate_candidates,
        rank_best_xpath,
    )

    pages = []
    for i in range(8):
        pages.append(
            {
                "html": (
                    f"<html><body><div class='ad'><p>SPAM</p></div>"
                    f"<article><p class='t'>val{i}</p></article></body></html>"
                ).encode(),
                "truth_title": [f"val{i}"],
            }
        )
    ds = rd.from_arrow(
        pa.Table.from_pylist(pages)
    )
    cands = {"title": ["//p", "//p[@class='t']"]}
    # without the plan, //p also extracts SPAM -> lower precision
    scored_raw = evaluate_candidates(ds, cands, {"title": "truth_title"})
    raw_p = scored_raw[scored_raw["xpath"] == "//p"].iloc[0]
    assert raw_p["fp"] == 8
    # with a PRUNE op removing the ad block, //p becomes exact
    plan = [{"xpath": "//div[@class='ad']", "operator_type": "prune"}]
    scored = evaluate_candidates(
        ds, cands, {"title": "truth_title"}, operator_plan=plan
    )
    p_row = scored[scored["xpath"] == "//p"].iloc[0]
    assert p_row["fp"] == 0 and p_row["f1"] == 1.0
    best = rank_best_xpath(scored)
    assert best.iloc[0]["f1"] == 1.0


# ---------------------------------------------------------------------------
# M11 widened CSS selectors + tolerant JSON repair
# ---------------------------------------------------------------------------

CSS_HTML = """<html><body>
<div id="main" class="wrap outer" data-x="alpha beta">
  <p class="lead big">one</p>
  <p>two</p>
  <span class="lead">three</span>
  <div><p class="deep">four</p></div>
</div>
<a href="https://example.com/page.pdf">doc</a>
<a href="/local">loc</a>
</body></html>"""


def _css(sel):
    from langscrape_ray.kernel.css import select

    r = parse_html(CSS_HTML)
    return [n.text_content().strip() for n in select(r, sel)]


def test_css_child_combinator():
    assert _css("#main > p") == ["one", "two"]
    assert _css("div > div > p") == ["four"]


def test_css_adjacent_sibling():
    assert _css("p.lead + p") == ["two"]


def test_css_attribute_selectors():
    assert _css('a[href^="https://"]') == ["doc"]
    assert _css('a[href$=".pdf"]') == ["doc"]
    assert _css('a[href*="example"]') == ["doc"]
    assert _css('[href="/local"]') == ["loc"]
    assert _css('[data-x~="beta"]') != []


def test_css_comma_groups_document_order():
    assert _css("p.lead, span.lead, a") == ["one", "three", "doc", "loc"]
    assert _css("h1, p.big") == ["one"]


def test_css_errors():
    from langscrape_ray.kernel.css import CssError, select

    r = parse_html(CSS_HTML)
    for bad in ["", "> p", "p[", "p::first"]:
        with pytest.raises(CssError):
            select(r, bad)


def test_repair_json_tolerance():
    from langscrape_ray.kernel.summary import extract_json_block

    assert extract_json_block('{"a": 1, "b": [1,2,],}') == {"a": 1, "b": [1, 2]}
    assert extract_json_block("{'t': 'It\\'s', 'n': 3}") == {"t": "It's", "n": 3}
    assert extract_json_block('{a: 1, b-c: "x"}') == {"a": 1, "b-c": "x"}
    assert extract_json_block('{"ok": True, "no": None}') == {"ok": True, "no": None}
    assert extract_json_block("plain text") == {}


# ---------------------------------------------------------------------------
# §2.11 UDF registration surface
# ---------------------------------------------------------------------------

def test_udf_registry_and_extract_stage():
    import pyarrow as pa

    from langscrape_ray.stages.extract import ExtractPages
    from langscrape_ray.stages.udf import (
        apply_udfs,
        get_udf,
        list_udfs,
        register_udf,
        resolve_udfs,
    )

    def add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "text_len", pa.array([len(x) for x in t["text"].to_pylist()], pa.int32())
        )

    register_udf("add_len", add_len)
    assert "add_len" in list_udfs()
    assert get_udf("add_len") is add_len
    assert resolve_udfs(["add_len", add_len]) == [add_len, add_len]
    with pytest.raises(KeyError):
        get_udf("nope")

    stage = ExtractPages(
        {"title": {"strategy": "xpath_extractor", "xpath": "//h1"}},
        post_udfs=["add_len"],
    )
    batch = pa.table(
        {
            "url": ["https://h.example/a" + "x" * 40],
            "html": [b"<html><body><h1>T</h1><p>" + b"w " * 1600 + b"</p></body></html>"],
        }
    )
    out = stage(batch)
    assert "text_len" in out.column_names
    assert out["text_len"][0].as_py() == len(out["text"][0].as_py())
    assert apply_udfs(batch, []) is batch


def test_xpath_leading_named_axis_raises():
    """A named axis in the FIRST step rides an implied descendant axis
    ('//axis::x', or a relative 'axis::x') which the evaluator cannot
    honor — it must raise per the module contract, never silently return
    [] (round-2 advisory)."""
    r = parse_html(DL_HTML)
    for expr in ("//following-sibling::dd", "following-sibling::dd",
                 "preceding-sibling::dt"):
        with pytest.raises(XPathError):
            xpath_eval(r, expr)
    # a named axis after a direct '/' is still fine
    assert _texts(
        xpath_eval(r, "//dt[text()='Author']/following-sibling::dd[1]")
    ) == ["Jane"]
