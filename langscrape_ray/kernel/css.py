"""Mini CSS-selector evaluator (SURVEY.md §2.2 M11).

The reference's extract_text_by_css_selector compiles a CSSSelector and
renders the hits to text (/root/reference/feilian/etree_tools.py:460-474).
Supported grammar here (everything the engine's config uses; anything else
raises CssError):

    selector  := compound (WS compound)*        # descendant combinator
    compound  := [tag]('#'id | '.'class)*
    tag       := NAME | '*'

Evaluation maps onto the kernel DOM directly; ``select`` returns element
Nodes in document order, ``extract_text_by_css`` mirrors the reference's
text pipeline (html->text per hit, normalize, strip, drop empties).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from langscrape_ray.kernel.dom import Node
from langscrape_ray.kernel.textops import normalize_text

__all__ = ["CssError", "select", "extract_text_by_css"]


class CssError(ValueError):
    pass


_COMPOUND_RE = re.compile(
    r"^(?P<tag>[A-Za-z][\w-]*|\*)?(?P<quals>(?:[.#][\w-]+)*)$"
)
_QUAL_RE = re.compile(r"([.#])([\w-]+)")


def _parse(selector: str) -> List[Tuple[str, List[Tuple[str, str]]]]:
    if not isinstance(selector, str) or not selector.strip():
        raise CssError("empty selector")
    parts = []
    for token in selector.strip().split():
        m = _COMPOUND_RE.match(token)
        if not m or (not m.group("tag") and not m.group("quals")):
            raise CssError(f"unsupported selector token: {token!r}")
        quals = _QUAL_RE.findall(m.group("quals") or "")
        parts.append((m.group("tag") or "*", quals))
    return parts


def _matches(node: Node, tag: str, quals: List[Tuple[str, str]]) -> bool:
    if tag != "*" and node.tag != tag:
        return False
    for kind, name in quals:
        if kind == "#":
            if node.attrs.get("id") != name:
                return False
        else:  # class: whitespace-separated token list
            classes = (node.attrs.get("class") or "").split()
            if name not in classes:
                return False
    return True


def select(root: Node, selector: str) -> List[Node]:
    """All elements matching the selector, document order, deduplicated."""
    parts = _parse(selector)
    ctx = [root]
    for tag, quals in parts:
        nxt: List[Node] = []
        seen = set()
        for node in ctx:
            for c in node.element_children():
                for d in c.iter():
                    if _matches(d, tag, quals) and id(d) not in seen:
                        seen.add(id(d))
                        nxt.append(d)
        ctx = nxt
        if not ctx:
            return []
    return ctx


def extract_text_by_css(root: Node, selector: str) -> List[str]:
    """Text of each hit: html->text -> normalize -> strip, empties dropped
    (reference extract_text_by_css_selector semantics)."""
    from langscrape_ray.kernel.extract import html_to_text

    out: List[str] = []
    for node in select(root, selector):
        text = normalize_text(html_to_text(node)).strip()
        if text:
            out.append(text)
    return out
