"""Mini CSS-selector evaluator (SURVEY.md §2.2 M11).

The reference's extract_text_by_css_selector compiles an lxml CSSSelector
and renders the hits to text (/root/reference/feilian/etree_tools.py:
460-474).  Supported grammar here (anything else raises CssError):

    group     := selector (',' selector)*       # comma groups
    selector  := compound ((WS | '>' | '+') compound)*
                 # descendant, child, adjacent-sibling combinators
    compound  := [tag]('#'id | '.'class | '[' attr [OP value] ']')*
    tag       := NAME | '*'
    OP        := '=' | '~=' | '^=' | '$=' | '*='

Evaluation maps onto the kernel DOM directly; ``select`` returns element
Nodes in document order deduplicated (CSSSelector/xpath union behavior),
``extract_text_by_css`` mirrors the reference's text pipeline (html->text
per hit, normalize, strip, drop empties).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from langscrape_ray.kernel.dom import Node
from langscrape_ray.kernel.textops import normalize_text

__all__ = ["CssError", "select", "extract_text_by_css"]


class CssError(ValueError):
    pass


_TAG_RE = re.compile(r"[A-Za-z][\w-]*|\*")
_QUAL_RE = re.compile(
    r"\.(?P<cls>[\w-]+)"
    r"|#(?P<id>[\w-]+)"
    r"|\[(?P<attr>[\w-]+)\s*(?:(?P<op>[~^$*]?=)\s*"
    r"(?:'(?P<v1>[^']*)'|\"(?P<v2>[^\"]*)\"|(?P<v3>[^\]\s]+))\s*)?\]"
)

# a qualifier: ("class", name) | ("id", name) | ("attr", (name, op, value))
Qual = Tuple[str, object]
# a step: (combinator, tag, [quals]); combinator: " " (descendant), ">", "+"
Step = Tuple[str, str, List[Qual]]


def _split_commas(src: str) -> List[str]:
    parts, depth, quote, start = [], 0, "", 0
    for i, ch in enumerate(src):
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(src[start:i])
            start = i + 1
    if quote or depth:
        raise CssError(f"unbalanced selector: {src!r}")
    parts.append(src[start:])
    return parts


def _parse_compound(token: str) -> Tuple[str, List[Qual]]:
    pos = 0
    tag = "*"
    m = _TAG_RE.match(token)
    if m:
        tag = m.group(0)
        pos = m.end()
    quals: List[Qual] = []
    while pos < len(token):
        m = _QUAL_RE.match(token, pos)
        if not m:
            raise CssError(f"unsupported selector token: {token!r}")
        if m.group("cls"):
            quals.append(("class", m.group("cls")))
        elif m.group("id"):
            quals.append(("id", m.group("id")))
        else:
            val = None
            for g in ("v1", "v2", "v3"):
                if m.group(g) is not None:
                    val = m.group(g)
                    break
            quals.append(("attr", (m.group("attr"), m.group("op"), val)))
        pos = m.end()
    if tag == "*" and not quals and token != "*":
        raise CssError(f"unsupported selector token: {token!r}")
    return tag, quals


def _parse_selector(src: str) -> List[Step]:
    # normalize combinator spacing, then walk tokens
    tokens = re.split(r"\s*(>|\+)\s*|\s+", src.strip())
    steps: List[Step] = []
    comb = " "
    for tok in tokens:
        if tok is None or tok == "":
            continue
        if tok in (">", "+"):
            if not steps:
                raise CssError(f"selector cannot start with {tok!r}")
            comb = tok
            continue
        tag, quals = _parse_compound(tok)
        steps.append((comb, tag, quals))
        comb = " "
    if not steps:
        raise CssError(f"empty selector: {src!r}")
    return steps


def _matches(node: Node, tag: str, quals: List[Qual]) -> bool:
    if tag != "*" and node.tag != tag:
        return False
    for kind, payload in quals:
        if kind == "id":
            if node.attrs.get("id") != payload:
                return False
        elif kind == "class":
            classes = (node.attrs.get("class") or "").split()
            if payload not in classes:
                return False
        else:
            name, op, val = payload
            v = node.attrs.get(name)
            if v is None:
                return False
            if op is None:
                continue
            if op == "=":
                if v != val:
                    return False
            elif op == "~=":
                if val not in v.split():
                    return False
            elif op == "^=":
                if not v.startswith(val):
                    return False
            elif op == "$=":
                if not v.endswith(val):
                    return False
            elif op == "*=":
                if val not in v:
                    return False
            else:  # pragma: no cover - parser restricts ops
                raise CssError(f"unsupported attribute op: {op}")
    return True


def _next_element_sibling(node: Node) -> Optional[Node]:
    parent = node.parent
    if parent is None:
        return None
    sibs = parent.element_children()
    i = sibs.index(node)
    return sibs[i + 1] if i + 1 < len(sibs) else None


def _select_one(root: Node, steps: List[Step]) -> List[Node]:
    ctx = [root]
    for comb, tag, quals in steps:
        nxt: List[Node] = []
        seen = set()

        def push(n: Node) -> None:
            if id(n) not in seen:
                seen.add(id(n))
                nxt.append(n)

        for node in ctx:
            if comb == " ":
                for c in node.element_children():
                    for d in c.iter():
                        if _matches(d, tag, quals):
                            push(d)
            elif comb == ">":
                for c in node.element_children():
                    if _matches(c, tag, quals):
                        push(c)
            else:  # '+'
                sib = _next_element_sibling(node)
                if sib is not None and _matches(sib, tag, quals):
                    push(sib)
        ctx = nxt
        if not ctx:
            return []
    return ctx


def select(root: Node, selector: str) -> List[Node]:
    """All elements matching the selector (comma groups unioned),
    document order, deduplicated."""
    if not isinstance(selector, str) or not selector.strip():
        raise CssError("empty selector")
    groups = [_parse_selector(part) for part in _split_commas(selector)]
    results = [_select_one(root, steps) for steps in groups]
    if len(results) == 1:
        return results[0]
    seen, merged = set(), []
    for r in results:
        for n in r:
            if id(n) not in seen:
                seen.add(id(n))
                merged.append(n)
    order = {id(n): i for i, n in enumerate(root.iter())}
    merged.sort(key=lambda n: order.get(id(n), 1 << 60))
    return merged


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
