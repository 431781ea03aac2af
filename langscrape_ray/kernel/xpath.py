"""Mini-XPath evaluator over the kernel DOM.

Stands in for lxml's ``tree.xpath(...)`` used by the reference extractor
(/root/reference/langscrape/html/xpath_extractor.py:78) and by
extract_text_by_xpath (/root/reference/feilian/etree_tools.py:437-457).

Supported grammar (the subset the engine's field->xpath maps use; anything
else raises XPathError, which the extractor maps to the reference's
``"Error: ..."`` sentinel):

    path      := ('/' | '//')? step (('/' | '//') step)*
    step      := nodetest predicate*  |  '@' NAME  |  'text()'
    nodetest  := NAME | '*'
    predicate := '[' INT ']' | '[last()]'
               | '[@' NAME ']' | '[@' NAME '=' STRING ']'
               | '[contains(@' NAME ',' STRING ')]'
               | '[contains(text(),' STRING ')]'

Position predicates follow XPath semantics: they apply to the node-set
produced from EACH context node separately (``//div/p[1]`` = first <p> child
of every <div>).  ``@attr`` / ``text()`` steps are terminal and yield strings
in document order (duplicates kept, as lxml does).
"""

from __future__ import annotations

import re
from typing import List, Tuple, Union

from langscrape_ray.kernel.dom import Comment, Node

__all__ = ["XPathError", "xpath_eval", "compile_xpath"]


class XPathError(ValueError):
    pass


_NAME = r"[A-Za-z_][\w.-]*"
_STRING = r"'([^']*)'|\"([^\"]*)\""
_PRED_HASATTR_RE = re.compile(rf"^@({_NAME})$")
_PRED_ATTR_EQ_RE = re.compile(rf"^@({_NAME})\s*=\s*(?:{_STRING})$")
_PRED_CONTAINS_ATTR_RE = re.compile(rf"^contains\(\s*@({_NAME})\s*,\s*(?:{_STRING})\s*\)$")
_PRED_CONTAINS_TEXT_RE = re.compile(rf"^contains\(\s*text\(\)\s*,\s*(?:{_STRING})\s*\)$")
_ELEMENT_STEP_RE = re.compile(rf"^({_NAME}|\*)((?:\[[^\]]*\])*)$")
_PRED_EXTRACT_RE = re.compile(r"\[([^\]]*)\]")
_PATH_TOKEN_RE = re.compile(r"(//|/)([^/]+)")


def _qstr(m: re.Match, a: int, b: int) -> str:
    return m.group(a) if m.group(a) is not None else m.group(b)


def _parse_predicate(src: str) -> Tuple[str, object]:
    src = src.strip()
    if src.isdigit():
        return ("index", int(src))
    if src == "last()":
        return ("last", None)
    m = _PRED_HASATTR_RE.match(src)
    if m:
        return ("hasattr", m.group(1))
    m = _PRED_ATTR_EQ_RE.match(src)
    if m:
        return ("attreq", (m.group(1), _qstr(m, 2, 3)))
    m = _PRED_CONTAINS_ATTR_RE.match(src)
    if m:
        return ("attrcontains", (m.group(1), _qstr(m, 2, 3)))
    m = _PRED_CONTAINS_TEXT_RE.match(src)
    if m:
        return ("textcontains", _qstr(m, 1, 2))
    raise XPathError(f"unsupported predicate: [{src}]")


# A step is (axis, kind, name, preds):
#   axis: "child" | "descendant";  kind: "element" | "attr" | "text"
Step = Tuple[str, str, str, list]


def compile_xpath(expr: str) -> List[Step]:
    """Parse an xpath into steps.  Memoized (hot stages evaluate the same
    four field xpaths for every page)."""
    if not isinstance(expr, str) or not expr.strip():
        raise XPathError("empty xpath")
    return _compile_cached(expr)


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=4096)
def _compile_cached(expr: str) -> List[Step]:
    src = expr.strip()
    if not src.startswith("/"):
        src = "//" + src  # relative path == search from root (lxml-on-fragment analog)
    pos = 0
    steps: List[Step] = []
    for m in _PATH_TOKEN_RE.finditer(src):
        if m.start() != pos:
            raise XPathError(f"bad xpath: {expr!r}")
        pos = m.end()
        axis = "descendant" if m.group(1) == "//" else "child"
        tok = m.group(2).strip()
        if tok.startswith("@"):
            if not re.fullmatch(_NAME, tok[1:]):
                raise XPathError(f"bad attribute step: {tok}")
            steps.append((axis, "attr", tok[1:], []))
        elif tok == "text()":
            steps.append((axis, "text", "", []))
        else:
            em = _ELEMENT_STEP_RE.match(tok)
            if not em:
                raise XPathError(f"bad step: {tok!r}")
            preds = [_parse_predicate(p) for p in _PRED_EXTRACT_RE.findall(em.group(2) or "")]
            steps.append((axis, "element", em.group(1), preds))
    if pos != len(src) or not steps:
        raise XPathError(f"bad xpath: {expr!r}")
    for axis, kind, _n, _p in steps[:-1]:
        if kind in ("attr", "text"):
            raise XPathError("@attr / text() steps must be terminal")
    return steps


def _descendants(ctx: Node) -> List[Node]:
    out: List[Node] = []
    for c in ctx.element_children():
        out.extend(c.iter())
    return out


def _pred_match(node: Node, kind: str, payload) -> bool:
    if kind == "hasattr":
        return payload in node.attrs
    if kind == "attreq":
        name, val = payload
        return node.attrs.get(name) == val
    if kind == "attrcontains":
        name, val = payload
        v = node.attrs.get(name)
        return v is not None and val in v
    if kind == "textcontains":
        return payload in node.text_content()
    raise XPathError(f"unknown predicate {kind}")


def _apply_preds(nodes: List[Node], preds) -> List[Node]:
    for kind, payload in preds:
        if kind == "index":
            nodes = [nodes[payload - 1]] if 0 < payload <= len(nodes) else []
        elif kind == "last":
            nodes = nodes[-1:]
        else:
            nodes = [n for n in nodes if _pred_match(n, kind, payload)]
    return nodes


def _direct_text(node: Node) -> List[str]:
    return [c for c in node.children if isinstance(c, str) and not isinstance(c, Comment)]


def xpath_eval(root: Node, expr: str) -> List[Union[Node, str]]:
    """Evaluate ``expr`` against ``root``. Element results are Nodes;
    ``@attr`` / ``text()`` results are strings (document order, dups kept)."""
    steps = compile_xpath(expr)
    ctx: List[Node] = [root]
    for axis, kind, name, preds in steps:
        if kind == "attr":
            pool: List[Node] = []
            seen = set()
            for node in ctx:
                cands = node.element_children() if axis == "child" else _descendants(node)
                for n in cands:
                    if id(n) not in seen:
                        seen.add(id(n))
                        pool.append(n)
            # '@attr' as a child step reads the attr of the *context* nodes'
            # children in XPath; but 'node/@attr' reads attrs OF the context
            # node itself. Model: child axis -> attr of ctx nodes.
            if axis == "child":
                return [n.attrs[name] for n in ctx if name in n.attrs]
            return [n.attrs[name] for n in pool if name in n.attrs]
        if kind == "text":
            out: List[str] = []
            if axis == "child":
                for node in ctx:
                    out.extend(_direct_text(node))
            else:
                for node in ctx:
                    for n in [node] + _descendants(node):
                        out.extend(_direct_text(n))
            return out
        nxt: List[Node] = []
        seen = set()
        has_positional = any(k in ("index", "last") for k, _ in preds)
        for node in ctx:
            cands = node.element_children() if axis == "child" else _descendants(node)
            if name != "*":
                cands = [n for n in cands if n.tag == name]
            if has_positional and axis == "descendant":
                # XPath: positional predicates bind per parent node-set
                # (`//div/p[1]` == first <p> of EACH parent), so group the
                # descendant candidates by parent before applying predicates.
                groups: dict = {}
                for n in cands:
                    groups.setdefault(id(n.parent), []).append(n)
                cands = [m for g in groups.values() for m in _apply_preds(g, preds)]
            else:
                cands = _apply_preds(cands, preds)
            for n in cands:
                if id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        ctx = nxt
        if not ctx:
            return []
    return list(ctx)
