"""Field extraction + html->text with the reference's sentinel semantics.

Reference:
- /root/reference/langscrape/html/xpath_extractor.py:47-87
  (extract_by_xpath_map_from_html: per-field strategy switch, sentinels).
- /root/reference/feilian/text_tools.py:6-17 (convert_html_to_text).
- /root/reference/langscrape/nodes/feature_binder.py:23-67 +
  /root/reference/notebooks/meta_data_extractor.ipynb (deterministic
  fallback field extraction — re-expressed without newspaper4k).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence

from langscrape_ray.kernel.clean import clean_html_for_extraction
from langscrape_ray.kernel.dom import Comment, Node, parse_html
from langscrape_ray.kernel.textops import normalize_text
from langscrape_ray.kernel.xpath import xpath_eval

SENTINEL_NO_STORED_VALUE = "(No stored value)"
SENTINEL_NO_XPATH = "Skipped: No XPath"
SENTINEL_EMPTY = "(Empty Result)"

# Block-level elements that force a line break in html->text conversion
# (inscriptis-like display:block handling for convert_html_to_text,
# /root/reference/feilian/text_tools.py:6-17).
_BLOCK_ELEMENTS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "caption", "dd",
        "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
        "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
        "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
        "td", "tfoot", "th", "thead", "title", "tr", "ul",
    }
)


def _coerce_values(value: Any) -> List[str]:
    """Stored-value normalization: list of stripped, non-empty strings.

    Semantics of /root/reference/langscrape/html/xpath_extractor.py:10-27.
    """
    if value is None:
        return []
    if isinstance(value, str):
        items: Sequence[Any] = [value]
    elif isinstance(value, Sequence) and not isinstance(value, (bytes, bytearray)):
        items = list(value)
    else:
        items = [value]
    out: List[str] = []
    for item in items:
        if item is None:
            continue
        text = str(item).strip()
        if text:
            out.append(text)
    return out


def extract_by_xpath_map(
    html_content: str | bytes | Node, field_state: Mapping[str, Any]
) -> Dict[str, List[str]]:
    """Per-field extraction with the reference's sentinel contract.

    For each field entry {strategy, xpath?, value?}
    (/root/reference/langscrape/html/xpath_extractor.py:47-87):
      - strategy == "lm_capabilities": return stored values, else
        ``["(No stored value)"]``;
      - no/blank xpath: ``["Skipped: No XPath"]``;
      - xpath hits: element -> text_content().strip(), string -> str.strip()
        (empties KEPT, exactly as the reference list comprehension does);
      - no hits: ``["(Empty Result)"]``;
      - evaluation error: ``["Error: {e}"]``.

    ``html_content`` may be a pre-parsed Node to amortize parsing across
    fields/batches.
    """
    result: Dict[str, List[str]] = {}
    tree: Optional[Node] = html_content if isinstance(html_content, Node) else None
    # read-only burst: all field xpaths evaluate against one frozen tree,
    # so the descendant scans are shared across rules (kernel/xpath.py)
    desc_cache: Dict[int, list] = {}

    for key, entry in field_state.items():
        strategy = (
            str(entry.get("strategy", "xpath_extractor"))
            if isinstance(entry, Mapping)
            else "xpath_extractor"
        )
        if strategy == "lm_capabilities":
            values = _coerce_values(entry.get("value")) if isinstance(entry, Mapping) else []
            result[key] = values or [SENTINEL_NO_STORED_VALUE]
            continue

        xpath = entry.get("xpath") if isinstance(entry, Mapping) else entry
        xpath = xpath.strip() if isinstance(xpath, str) else None
        if not xpath:
            result[key] = [SENTINEL_NO_XPATH]
            continue

        if tree is None:
            tree = parse_html(html_content)
        try:
            hits = xpath_eval(tree, xpath, desc_cache)
            values = [
                v.text_content().strip() if isinstance(v, Node) else str(v).strip()
                for v in hits
            ]
            result[key] = values or [SENTINEL_EMPTY]
        except Exception as exc:  # noqa: BLE001 — sentinel contract
            result[key] = [f"Error: {exc}"]
    return result


def html_to_text(html_content: str | bytes | Node) -> str:
    """Render visible text, one line per block element run.

    Semantics of /root/reference/feilian/text_tools.py:6-17: block-level
    layout produces newlines, lines are stripped, blank lines dropped, joined
    with a single ``\\n``.  <script>/<style> etc. are expected to be already
    removed by the cleaner; stray ones are skipped defensively.
    """
    root = html_content if isinstance(html_content, Node) else parse_html(html_content)
    parts: List[str] = []
    _render(root, parts)
    lines = [ln.strip() for ln in "".join(parts).split("\n")]
    return "\n".join(ln for ln in lines if ln)


_SKIP_TEXT = frozenset({"script", "style", "noscript", "svg", "iframe", "head"})


def _render(node: Node, parts: List[str]) -> None:
    for c in node.children:
        if isinstance(c, Comment):
            continue
        if isinstance(c, Node):
            if c.tag in _SKIP_TEXT:
                continue
            if c.tag == "br":
                parts.append("\n")
                continue
            block = c.tag in _BLOCK_ELEMENTS
            if block:
                parts.append("\n")
            _render(c, parts)
            if block:
                parts.append("\n")
        else:
            parts.append(c)


def page_text(html_content: str | bytes) -> str:
    """The pages-table ``text`` column contract (the per-row invariant).

    clean (M4/M5, in-tree whitespace collapse) -> html->text (M12) ->
    normalize per line (M13), newlines preserved.  Byte-identical output is
    asserted by golden tests; both the Ray engine and the oracle call this
    exact function.
    """
    from langscrape_ray.kernel.clean import cleaned_tree

    text = html_to_text(cleaned_tree(html_content))
    lines = [normalize_text(ln) for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _abs_href(href: str, base_url: str) -> Optional[str]:
    """Shared outlink absolutization: strip, drop javascript:/mailto:/#,
    fast-path clean absolute http(s) refs (urljoin returns those verbatim
    and skipping it saves ~6% of extract time; degenerate empty
    query/fragment delimiters are excluded because the urlsplit round-trip
    DROPS those — 'http://a/b?' must keep taking the urljoin path for
    outlink-key stability), else urljoin against base_url."""
    from urllib.parse import urljoin

    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "#")):
        return None
    if href.startswith(("http://", "https://")) and not (
        href.endswith(("?", "#")) or "?#" in href
    ):
        return href
    try:
        return urljoin(base_url, href)
    except ValueError:
        return None


def extract_outlinks(root: Node, base_url: str) -> List[str]:
    """All <a href> targets in document order, absolutized against base_url.

    New design (the reference crawls a fixed list and never follows links);
    this feeds the frontier-update stage (SURVEY.md §7.1 R6).  javascript:
    and mailto: links are dropped; duplicates are kept (dedup is the
    frontier's job).
    """
    out: List[str] = []
    for node in root.iter():
        if node.tag != "a":
            continue
        href = node.attrs.get("href")
        if not href:
            continue
        a = _abs_href(href, base_url)
        if a is not None:
            out.append(a)
    return out


def extract_outlinks_with_text(
    root: Node, base_url: str
) -> List[tuple]:
    """(absolute_href, anchor_text) pairs in document order — the
    anchor-text harvesting pass of a web-graph pipeline.  Same href
    semantics as :func:`extract_outlinks`; ``anchor_text`` is the
    normalized concatenation of the <a> subtree's string children
    (whitespace-collapsed via normalize_text, Comments excluded), ''
    when the anchor has no text."""

    def _subtree_text(node: Node, parts: List[str]) -> None:
        for c in node.children:
            if isinstance(c, Node):
                _subtree_text(c, parts)
            elif isinstance(c, str) and not isinstance(c, Comment):
                parts.append(c)

    out: List[tuple] = []
    for node in root.iter():
        if node.tag != "a":
            continue
        href = node.attrs.get("href")
        if not href:
            continue
        a = _abs_href(href, base_url)
        if a is None:
            continue
        parts: List[str] = []
        _subtree_text(node, parts)
        out.append((a, normalize_text(" ".join(parts))))
    return out


# ---------------------------------------------------------------------------
# Deterministic fallback extractors (reference M18/M19 semantics without
# newspaper4k: meta tags / <title> / <time> / body-candidate scoring).
# ---------------------------------------------------------------------------

MIN_ARTICLE_BODY = 100  # /root/reference/config/default_config.yaml:38-39
MIN_HTML_LENGTH = 3000  # /root/reference/config/default_config.yaml:35-37


def _meta_content(root: Node, names: Sequence[tuple]) -> Optional[str]:
    for node in root.iter():
        if node.tag != "meta":
            continue
        for attr, val in names:
            if node.attrs.get(attr) == val:
                content = (node.attrs.get("content") or "").strip()
                if content:
                    return content
    return None


def _best_body_candidate(root: Node) -> Optional[str]:
    """Candidate-selector scoring: most text, rewarded for <p> children,
    penalized for link density (semantics of the reference's traditional
    article-body extractor, notebooks/meta_data_extractor.ipynb cell 2)."""
    best_score = 0.0
    best_text: Optional[str] = None
    for node in root.iter():
        if node.tag not in ("article", "section", "div", "main", "td"):
            continue
        text = node.text_content()
        tlen = len(text.strip())
        if tlen == 0:
            continue
        n_p = sum(1 for c in node.element_children() if c.tag == "p")
        link_len = sum(
            len(d.text_content()) for d in node.iter() if d.tag == "a"
        )
        link_density = link_len / max(1, tlen)
        score = tlen * (1.0 + 0.1 * n_p) * (1.0 - min(1.0, link_density))
        if score > best_score:
            best_score = score
            best_text = text
    return best_text


def fallback_fields(raw_root: Node, extracted: Dict[str, List[str]]) -> tuple:
    """Fill weak/empty fields from raw-DOM heuristics; return (fields, flags).

    Semantics of /root/reference/langscrape/nodes/feature_binder.py:32-67:
    article_body joined length < 100 -> replace from candidate scoring;
    empty title/author/datetime -> fill from <title>/meta/<time>; the names
    of fallback-filled fields are recorded in ``traditional_flag``.
    A field value is "empty" when it is only sentinels/blank.
    """
    flags: List[str] = []
    out = dict(extracted)

    def effective(vals: List[str]) -> str:
        real = [
            v
            for v in vals
            if v
            and v not in (SENTINEL_NO_STORED_VALUE, SENTINEL_NO_XPATH, SENTINEL_EMPTY)
            and not v.startswith("Error: ")
        ]
        return " ".join(real)

    body = effective(out.get("article_body", []))
    if len(body) < MIN_ARTICLE_BODY:
        cand = _best_body_candidate(raw_root)
        if cand is not None:
            out["article_body"] = [normalize_text(cand)]
            flags.append("article_body")

    if not effective(out.get("title", [])):
        title = _meta_content(
            raw_root, [("property", "og:title"), ("name", "title")]
        )
        if title is None:
            hits = xpath_eval(raw_root, "//title")
            if hits:
                title = hits[0].text_content().strip()
        if title:
            out["title"] = [normalize_text(title)]
            flags.append("title")

    if not effective(out.get("author", [])):
        author = _meta_content(
            raw_root, [("name", "author"), ("property", "article:author")]
        )
        if author:
            out["author"] = [normalize_text(author)]
            flags.append("author")

    if not effective(out.get("datetime", [])):
        dt = _meta_content(
            raw_root,
            [("property", "article:published_time"), ("name", "date")],
        )
        if dt is None:
            for node in raw_root.iter():
                if node.tag == "time" and node.attrs.get("datetime"):
                    dt = node.attrs["datetime"].strip()
                    break
        if dt:
            out["datetime"] = [dt]
            flags.append("datetime")

    return out, flags
