"""HTML cleaning with the reference's data-plane semantics.

Reference: /root/reference/feilian/soup_tools.py:26-74 (post-order soup clean)
called from /root/reference/langscrape/html/utils.py:91-103
(clean_html_for_extraction3: parse -> feilian clean -> serialize -> collapse
whitespace -> strip).  Element sets from
/root/reference/feilian/html_constants.py:1-40.
"""

from __future__ import annotations

from urllib.parse import unquote

import re as _re

from langscrape_ray.kernel.dom import Comment, Node, parse_html
from langscrape_ray.kernel.textops import collapse_whitespace

# change-only form of r"\s+" -> " ": matches exactly the maximal
# whitespace runs whose replacement differs from themselves (2+ chars, or
# a single non-space whitespace char), so single spaces — the vast
# majority of matches in page text — are skipped instead of rewritten.
# sub-for-sub equivalent to r"\s+" (fuzz-pinned in tests/test_kernel.py).
_WS_RUN_RE = _re.compile(r"\s\s+|[^\S ]")
_WS_NEEDS_RE = _re.compile(r"\s{2,}|[^\S ]")

# /root/reference/feilian/html_constants.py:1-40 — non-content ("interactive")
# elements removed wholesale by the cleaner.
INTERACTIVE_ELEMENTS = frozenset(
    {
        "script", "style", "noscript", "svg", "iframe", "video", "audio",
        "source", "track", "link", "meta", "object", "param",
        # form elements
        "input", "label", "select", "textarea", "button", "fieldset",
        "legend", "datalist", "output", "option", "optgroup",
        # table layout elements
        "col", "colgroup",
        # other
        "map", "area", "base",
        # deprecated
        "embed",
    }
)

# /root/reference/feilian/soup_tools.py:56-61 — attribute whitelist.
KEPT_ATTRS = ("class", "id", "title", "alt", "href", "src")


def clean_tree(root: Node) -> Node:
    """In-place post-order clean of a parsed tree.

    Semantics (/root/reference/feilian/soup_tools.py:26-74), applied children
    first so emptied parents cascade:
      1. drop comments;
      2. drop INTERACTIVE_ELEMENTS subtrees;
      3. drop elements (except <img>) whose descendant text is empty/blank;
      4. keep only attrs in {class,id,title,alt,href,src} (in that order);
      5. drop ``href="javascript:..."``;
      6. drop ``src`` from <img>.
    """
    _clean(root)
    return root


def _clean(node: Node) -> bool:
    """Returns whether the SURVIVING subtree contains non-whitespace text
    — computed bottom-up so the rule-3 emptiness check
    (``text_content().strip() == ""`` over the already-cleaned subtree) is
    O(n) overall instead of O(n x depth) of repeated text_content walks.
    Detached children (comments, interactive, emptied) contribute nothing,
    exactly as they would not appear in a post-clean text_content."""
    has_text = False
    for child in list(node.children):
        if isinstance(child, Comment):
            node.remove_child(child)
        elif isinstance(child, Node):
            child_has = _clean(child)
            if child.parent is node and child_has:  # survived the clean
                has_text = True
        elif child and not child.isspace():
            has_text = True
    if node.tag == "#document":
        return has_text
    if node.tag in INTERACTIVE_ELEMENTS:
        node.detach()
        return False
    if node.tag != "img" and not has_text:
        node.detach()
        return False
    if node.attrs:
        node.attrs = {k: node.attrs[k] for k in KEPT_ATTRS if k in node.attrs}
        href = node.attrs.get("href")
        if href is not None and href.startswith("javascript:"):
            del node.attrs["href"]
        if node.tag == "img" and "src" in node.attrs:
            del node.attrs["src"]
    return has_text


def clean_tree_deep(root: Node, deep: bool = False) -> Node:
    """The etree-variant cleaner (SURVEY.md §2.2 M6,
    /root/reference/feilian/etree_tools.py:174-236): in addition to the
    soup-variant rules it removes <head>/<title> wholesale and any element
    whose inline style contains display:none; the attr whitelist narrows to
    {class, id}.  With ``deep=True`` it also drops <img> elements, empty
    nodes, and ALL attributes.  In-place."""
    for node in list(root.iter_post()):
        if node.tag == "#document":
            continue
        if node.tag in INTERACTIVE_ELEMENTS or node.tag in ("head", "title"):
            node.detach()
            continue
        style = node.attrs.get("style") or ""
        if "display:none" in style.replace(" ", ""):
            node.detach()
            continue
        if deep and node.tag == "img":
            node.detach()
            continue
        if node.tag != "img" and node.text_content().strip() == "":
            node.detach()
            continue
        if deep:
            node.attrs = {}
        elif node.attrs:
            node.attrs = {k: node.attrs[k] for k in ("class", "id") if k in node.attrs}
    # comments
    for node in root.iter():
        for child in list(node.children):
            if isinstance(child, Comment):
                node.remove_child(child)
    return root


def decode_url_attrs(root: Node) -> Node:
    """Percent-decode href/src attributes over the whole tree.

    Semantics of /root/reference/feilian/soup_tools.py:13-23 (decode_url).
    """
    for node in root.iter():
        for key in ("href", "src"):
            val = node.attrs.get(key)
            if val is not None:
                node.attrs[key] = unquote(val)
    return root


def collapse_tree_whitespace(root: Node) -> Node:
    """In-place: collapse every text node's whitespace runs to single
    spaces.  Equivalent to the reference's serialize -> re.sub(r"\\s+", " ")
    -> re-parse round trip (/root/reference/langscrape/html/utils.py:100-103)
    for every observable (text_content / xpath / html_to_text) — text nodes
    end up identically single-space-normalized — but ~3x cheaper (skips one
    serialize and one pure-Python parse per page)."""
    # BATCHED: one regex pass over all of a page's text nodes joined with
    # NUL (never produced by the parser — illegal XML chars are stripped
    # upstream — and not whitespace, so \s+ runs cannot span the joiner,
    # and the join count survives the sub).  ~100 tiny re.sub calls per
    # page collapse to one big one: this stage profiled at 30% of the
    # extraction kernel before, ~7% after.
    slots = []
    texts = []
    for node in root.iter():
        for i, c in enumerate(node.children):
            if isinstance(c, str) and not isinstance(c, Comment):
                slots.append((node, i))
                texts.append(c)
    if not texts:
        return root
    blob = "\x00".join(texts)
    # only rewrite when needed: a run of 2+ whitespace, or any whitespace
    # character that isn't a plain space
    if _WS_NEEDS_RE.search(blob) is None:
        return root
    new = _WS_RUN_RE.sub(" ", blob).split("\x00")
    for (node, i), old, repl in zip(slots, texts, new):
        if repl is not old and repl != old:
            node.children[i] = repl
    return root


def cleaned_tree(html_content: str | bytes | Node) -> Node:
    """parse (or copy) -> clean -> in-tree whitespace collapse.

    The tree the extractor and html_to_text operate on.  Pass a pre-parsed
    Node to amortize parsing (it is deep-copied, not mutated)."""
    root = (
        html_content.copy_tree()
        if isinstance(html_content, Node)
        else parse_html(html_content)
    )
    clean_tree(root)
    return collapse_tree_whitespace(root)


def clean_html_for_extraction(html_content: str | bytes) -> str:
    """parse -> clean -> collapse whitespace -> serialized string.

    The effective cleaner of the reference
    (/root/reference/langscrape/html/utils.py:91-103, the third and live
    definition of clean_html_for_extraction3). Returns the cleaned,
    single-space-normalized HTML string that the XPath extractor operates on.
    """
    return collapse_whitespace(cleaned_tree(html_content).serialize())
