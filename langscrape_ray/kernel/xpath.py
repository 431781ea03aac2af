"""Mini-XPath evaluator over the kernel DOM.

Stands in for lxml's ``tree.xpath(...)`` used by the reference extractor
(/root/reference/langscrape/html/xpath_extractor.py:78), by
extract_text_by_xpath (/root/reference/feilian/etree_tools.py:437-457) and
by the EXSLT-namespaced trim rules (/root/reference/feilian/
etree_tools.py:409-415,429-434 — ``re:test`` with the
http://exslt.org/regular-expressions namespace).  The reference's mined
xpaths routinely use contains()/starts-with()/re:test()/unions/positional
exprs (feilian/prompts.py:96,129), so the grammar covers those forms.

Supported grammar (anything else raises XPathError, which the extractor
maps to the reference's ``"Error: ..."`` sentinel):

    union     := path ('|' path)*
    path      := ('/' | '//')? step (('/' | '//') step)*
    step      := nodetest predicate*  |  '@' NAME  |  'text()' | '.' | '..'
               | ('following-sibling' | 'preceding-sibling') '::' nodetest
                 predicate*        (named axes take a single '/' separator)
    nodetest  := NAME | '*'
    predicate := '[' INT ']' | '[last()]' | '[last()-INT]'
               | '[position() OP INT]'           OP in = != < <= > >=
               | '[@' NAME ']' | '[@' NAME '=' STRING ']'
               | '[@' NAME '!=' STRING ']'     (attr must exist, XPath rule)
               | '[text() = STRING]' | '[. = STRING]'  (also '!=')
               | '[contains(TARGET, STRING)]'
               | '[starts-with(TARGET, STRING)]'
               | '[re:test(TARGET, STRING [, FLAGS])]'   FLAGS: i, s
               | '[not( predicate-body )]'
               | '[ predicate ('and'|'or') predicate ... ]'
                 ('or' binds looser than 'and'; positional forms are not
                  allowed inside and/or/not)
    TARGET    := '@' NAME | 'text()' | '.'

The tokenizer is quote- and bracket-aware, so '/' inside predicate strings
(``[contains(@href,'/shop/')]``) and '[]' inside regexes
(``[re:test(., '[0-9]+')]``) parse correctly.

Semantics notes (deliberate, documented deviations):
- Position predicates bind per parent node-set like real XPath
  (``//div/p[1]`` = first <p> child of EACH <div>).
- ``@attr`` / ``text()`` steps are terminal and yield strings in document
  order (duplicates kept, as lxml does).
- The string-value of an element for contains/starts-with/re:test targets
  ``text()`` and ``.`` is its ``text_content()`` (descendant text) — an
  approximation of lxml's first-text-node string() coercion that is
  byte-stable within this engine and pinned by goldens.
- Unions return element results deduplicated in document order (as lxml
  does); string-result branches concatenate in branch order.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional, Tuple, Union

from langscrape_ray.kernel.dom import Comment, Node

__all__ = ["XPathError", "xpath_eval", "compile_xpath"]


class XPathError(ValueError):
    pass


_NAME = r"[A-Za-z_][\w.-]*"
_STRING = r"'([^']*)'|\"([^\"]*)\""
_PRED_HASATTR_RE = re.compile(rf"^@({_NAME})$")
_PRED_ATTR_EQ_RE = re.compile(rf"^@({_NAME})\s*(!?=)\s*(?:{_STRING})$")
_PRED_TEXT_EQ_RE = re.compile(rf"^(?:text\(\)|\.)\s*(!?=)\s*(?:{_STRING})$")
_AXIS_STEP_RE = re.compile(r"^(following-sibling|preceding-sibling)::(.+)$", re.S)
_PRED_LAST_RE = re.compile(r"^last\(\)(?:\s*-\s*(\d+))?$")
_PRED_POS_RE = re.compile(r"^position\(\)\s*(=|!=|<=|>=|<|>)\s*(\d+)$")
_PRED_FN_RE = re.compile(
    rf"^(contains|starts-with|re:test)\(\s*(@{_NAME}|text\(\)|\.)\s*,\s*"
    rf"(?:{_STRING})\s*(?:,\s*(?:'([a-z]*)'|\"([a-z]*)\")\s*)?\)$"
)
_PRED_NOT_RE = re.compile(r"^not\(\s*(.*)\s*\)$", re.S)


def _qstr(m: re.Match, a: int, b: int) -> str:
    return m.group(a) if m.group(a) is not None else m.group(b)


# A step is (axis, kind, name, preds):
#   axis: "child" | "descendant"
#   kind: "element" | "attr" | "text" | "self" | "parent"
Step = Tuple[str, str, str, list]


def _split_top_word(src: str, word: str) -> List[str]:
    """Split on `` word `` (space-delimited) at bracket depth 0 outside
    quoted strings — the boolean-combinator splitter for predicates."""
    parts, depth, quote, start = [], 0, "", 0
    pat = f" {word} "
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and src.startswith(pat, i):
            parts.append(src[start:i])
            start = i + len(pat)
            i = start
            continue
        i += 1
    parts.append(src[start:])
    return parts


def _parse_bool_operand(src: str):
    inner = _parse_predicate(src)
    if inner[0] in _POSITIONAL:
        raise XPathError("positional predicates inside and/or unsupported")
    return inner


def _parse_predicate(src: str):
    src = src.strip()
    # boolean combinators first ('or' binds looser than 'and', per XPath);
    # quoted strings and nested parens/brackets are opaque to the split
    ors = _split_top_word(src, "or")
    if len(ors) > 1:
        return ("or", [_parse_bool_operand(p) for p in ors])
    ands = _split_top_word(src, "and")
    if len(ands) > 1:
        return ("and", [_parse_bool_operand(p) for p in ands])
    if src.isdigit():
        return ("index", int(src))
    m = _PRED_LAST_RE.match(src)
    if m:
        return ("last", int(m.group(1) or 0))
    m = _PRED_POS_RE.match(src)
    if m:
        return ("poscmp", (m.group(1), int(m.group(2))))
    m = _PRED_HASATTR_RE.match(src)
    if m:
        return ("hasattr", m.group(1))
    m = _PRED_ATTR_EQ_RE.match(src)
    if m:
        if m.group(2) == "=":
            return ("attreq", (m.group(1), _qstr(m, 3, 4)))
        return ("attrne", (m.group(1), _qstr(m, 3, 4)))
    m = _PRED_TEXT_EQ_RE.match(src)
    if m:
        return ("texteq", (m.group(1), _qstr(m, 2, 3)))
    m = _PRED_FN_RE.match(src)
    if m:
        fn, target = m.group(1), m.group(2)
        val = _qstr(m, 3, 4)
        if target.startswith("@"):
            tgt = ("attr", target[1:])
        else:
            tgt = ("text",)  # text() and '.' share the string-value rule
        if fn == "contains":
            return ("contains", (tgt, val))
        if fn == "starts-with":
            return ("startswith", (tgt, val))
        flags_s = m.group(5) if m.group(5) is not None else (m.group(6) or "")
        flags = 0
        for ch in flags_s:
            if ch == "i":
                flags |= re.I
            elif ch == "s":
                flags |= re.S
            else:
                raise XPathError(f"unsupported re:test flag: {ch!r}")
        try:
            rx = re.compile(val, flags)
        except re.error as e:
            raise XPathError(f"bad regex in re:test: {e}")
        return ("retest", (tgt, rx))
    m = _PRED_NOT_RE.match(src)
    if m:
        inner = _parse_predicate(m.group(1))
        if inner[0] in ("index", "last", "poscmp"):
            raise XPathError("not() over positional predicates unsupported")
        return ("not", inner)
    raise XPathError(f"unsupported predicate: [{src}]")


def _split_top(src: str, sep: str) -> List[str]:
    """Split on ``sep`` at bracket depth 0 outside quoted strings."""
    parts, depth, quote, start = [], 0, "", 0
    for i, ch in enumerate(src):
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(src[start:i])
            start = i + 1
    if quote or depth:
        raise XPathError(f"unbalanced quotes/brackets in {src!r}")
    parts.append(src[start:])
    return parts


def _tokenize_path(src: str) -> List[Tuple[str, str]]:
    """Yield (axis, step-token) pairs; '/' splits only at depth 0 outside
    quotes, so predicate strings may contain slashes."""
    out: List[Tuple[str, str]] = []
    i, n = 0, len(src)
    while i < n:
        axis = "child"
        if src.startswith("//", i):
            axis, i = "descendant", i + 2
        elif src[i] == "/":
            i += 1
        elif i == 0:
            axis = "descendant"  # relative path == search from root
        else:
            raise XPathError(f"bad xpath near {src[i:]!r}")
        j, depth, quote = i, 0, ""
        while j < n:
            ch = src[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "'\"":
                quote = ch
            elif ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "/" and depth == 0:
                break
            j += 1
        tok = src[i:j].strip()
        if not tok:
            raise XPathError(f"empty step in {src!r}")
        out.append((axis, tok))
        i = j
    return out


def _split_preds(tok: str) -> Tuple[str, List[str]]:
    """Split 'name[p1][p2]' into (name, [p1, p2]) with balanced brackets."""
    i = tok.find("[")
    if i < 0:
        return tok, []
    name, preds = tok[:i], []
    while i < len(tok):
        if tok[i] != "[":
            raise XPathError(f"bad step: {tok!r}")
        depth, quote, j = 0, "", i
        while j < len(tok):
            ch = tok[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "'\"":
                quote = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= len(tok):
            raise XPathError(f"unbalanced predicate in {tok!r}")
        preds.append(tok[i + 1 : j])
        i = j + 1
    return name, preds


def compile_xpath(expr: str) -> List[List[Step]]:
    """Parse an xpath into union branches of steps.  Memoized (hot stages
    evaluate the same few field xpaths for every page)."""
    if not isinstance(expr, str) or not expr.strip():
        raise XPathError("empty xpath")
    return _compile_cached(expr)


@lru_cache(maxsize=4096)
def _compile_cached(expr: str) -> List[List[Step]]:
    branches: List[List[Step]] = []
    for part in _split_top(expr.strip(), "|"):
        part = part.strip()
        if not part:
            raise XPathError(f"empty union branch in {expr!r}")
        steps: List[Step] = []
        for si, (axis, tok) in enumerate(_tokenize_path(part)):
            m = _AXIS_STEP_RE.match(tok)
            if m:
                # a named-axis step can only follow a direct '/': with a
                # descendant axis (leading '//', a relative first step, or
                # '//' mid-path) the implied descendant hop would silently
                # be dropped and the step would evaluate relative to the
                # wrong node — fail loudly per the module contract
                if axis == "descendant":
                    raise XPathError("'//' before a named axis is unsupported")
                name, pred_srcs = _split_preds(m.group(2))
                if not re.fullmatch(rf"{_NAME}|\*", name):
                    raise XPathError(f"bad step: {tok!r}")
                preds = [_parse_predicate(p) for p in pred_srcs]
                steps.append((m.group(1), "element", name, preds))
                continue
            if tok.startswith("@"):
                if not re.fullmatch(_NAME, tok[1:]):
                    raise XPathError(f"bad attribute step: {tok}")
                steps.append((axis, "attr", tok[1:], []))
            elif tok == "text()":
                steps.append((axis, "text", "", []))
            elif tok == ".":
                steps.append((axis, "self", "", []))
            elif tok == "..":
                steps.append((axis, "parent", "", []))
            else:
                name, pred_srcs = _split_preds(tok)
                if not re.fullmatch(rf"{_NAME}|\*", name):
                    raise XPathError(f"bad step: {tok!r}")
                preds = [_parse_predicate(p) for p in pred_srcs]
                steps.append((axis, "element", name, preds))
        if not steps:
            raise XPathError(f"bad xpath: {expr!r}")
        for axis, kind, _n, _p in steps[:-1]:
            if kind in ("attr", "text"):
                raise XPathError("@attr / text() steps must be terminal")
        branches.append(steps)
    return branches


def _descendants(ctx: Node, cache: Optional[dict] = None) -> List[Node]:
    """Descendant element list of ``ctx``.  ``cache`` (id(node) -> list) is
    a caller-scoped memo for read-only evaluation bursts — e.g. one page's
    field-rule map evaluates several xpaths against the same root, and the
    root scan dominates.  Callers must not pass a cache across tree
    mutations; returned lists are never mutated by the evaluator."""
    if cache is not None:
        hit = cache.get(id(ctx))
        if hit is not None:
            return hit
    out: List[Node] = []
    for c in ctx.element_children():
        out.extend(c.iter())
    if cache is not None:
        cache[id(ctx)] = out
    return out


def _target_value(node: Node, tgt) -> Optional[str]:
    if tgt[0] == "attr":
        return node.attrs.get(tgt[1])
    return node.text_content()


def _pred_match(node: Node, kind: str, payload) -> bool:
    if kind == "hasattr":
        return payload in node.attrs
    if kind == "attreq":
        name, val = payload
        return node.attrs.get(name) == val
    if kind == "attrne":
        # XPath node-set '!=': the attribute must EXIST and differ
        name, val = payload
        v = node.attrs.get(name)
        return v is not None and v != val
    if kind == "texteq":
        # string-value rule matches contains()/re:test(): text_content()
        # (documented deviation from lxml's first-text-node coercion)
        op, val = payload
        v = node.text_content()
        return v == val if op == "=" else v != val
    if kind == "and":
        return all(_pred_match(node, k, p) for k, p in payload)
    if kind == "or":
        return any(_pred_match(node, k, p) for k, p in payload)
    if kind == "contains":
        tgt, val = payload
        v = _target_value(node, tgt)
        return v is not None and val in v
    if kind == "startswith":
        tgt, val = payload
        v = _target_value(node, tgt)
        return v is not None and v.startswith(val)
    if kind == "retest":
        tgt, rx = payload
        v = _target_value(node, tgt)
        return v is not None and rx.search(v) is not None
    if kind == "not":
        return not _pred_match(node, payload[0], payload[1])
    raise XPathError(f"unknown predicate {kind}")


_POSITIONAL = ("index", "last", "poscmp")

_POS_OPS = {
    "=": lambda p, n: p == n,
    "!=": lambda p, n: p != n,
    "<": lambda p, n: p < n,
    "<=": lambda p, n: p <= n,
    ">": lambda p, n: p > n,
    ">=": lambda p, n: p >= n,
}


def _apply_preds(nodes: List[Node], preds) -> List[Node]:
    for kind, payload in preds:
        if kind == "index":
            nodes = [nodes[payload - 1]] if 0 < payload <= len(nodes) else []
        elif kind == "last":
            i = len(nodes) - 1 - payload
            nodes = [nodes[i]] if i >= 0 else []
        elif kind == "poscmp":
            op, n = payload
            f = _POS_OPS[op]
            nodes = [m for p, m in enumerate(nodes, 1) if f(p, n)]
        else:
            nodes = [n for n in nodes if _pred_match(n, kind, payload)]
    return nodes


def _direct_text(node: Node) -> List[str]:
    return [c for c in node.children if isinstance(c, str) and not isinstance(c, Comment)]


def _eval_steps(root: Node, steps: List[Step],
                cache: Optional[dict] = None) -> List[Union[Node, str]]:
    ctx: List[Node] = [root]
    for axis, kind, name, preds in steps:
        if kind == "attr":
            if axis == "child":
                # 'node/@attr' reads attrs OF the context nodes themselves
                return [n.attrs[name] for n in ctx if name in n.attrs]
            pool: List[Node] = []
            seen = set()
            for node in ctx:
                for n in _descendants(node, cache):
                    if id(n) not in seen:
                        seen.add(id(n))
                        pool.append(n)
            return [n.attrs[name] for n in pool if name in n.attrs]
        if kind == "text":
            out: List[str] = []
            if axis == "child":
                for node in ctx:
                    out.extend(_direct_text(node))
            else:
                for node in ctx:
                    for n in [node] + _descendants(node, cache):
                        out.extend(_direct_text(n))
            return out
        if kind == "self":
            continue
        if kind == "parent":
            nxt, seen = [], set()
            for node in ctx:
                p = node.parent
                if p is not None and id(p) not in seen:
                    seen.add(id(p))
                    nxt.append(p)
            ctx = nxt
            if not ctx:
                return []
            continue
        nxt: List[Node] = []
        seen = set()
        has_positional = any(k in _POSITIONAL for k, _ in preds)
        for node in ctx:
            if axis in ("following-sibling", "preceding-sibling"):
                sibs = (
                    node.parent.element_children()
                    if node.parent is not None
                    else []
                )
                k = next((i for i, s in enumerate(sibs) if s is node), -1)
                if axis == "following-sibling":
                    cands = sibs[k + 1 :] if k >= 0 else []
                else:
                    # axis order = proximity (reverse document order), so
                    # positional predicates pick the NEAREST preceding node
                    cands = list(reversed(sibs[:k])) if k >= 0 else []
                if name != "*":
                    cands = [n for n in cands if n.tag == name]
                cands = _apply_preds(cands, preds)
                if axis == "preceding-sibling":
                    cands = list(reversed(cands))  # back to document order
                for n in cands:
                    if id(n) not in seen:
                        seen.add(id(n))
                        nxt.append(n)
                continue
            cands = (
                node.element_children()
                if axis == "child"
                else _descendants(node, cache)
            )
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


def xpath_eval(root: Node, expr: str,
               cache: Optional[dict] = None) -> List[Union[Node, str]]:
    """Evaluate ``expr`` against ``root``. Element results are Nodes;
    ``@attr`` / ``text()`` results are strings (document order, dups kept).
    Union branches merge element results in document order, deduplicated.
    ``cache``: optional read-only-burst descendants memo (see
    ``_descendants``); pass a fresh dict per page, never across tree
    mutations."""
    branches = compile_xpath(expr)
    if len(branches) == 1:
        return _eval_steps(root, branches[0], cache)
    results = [_eval_steps(root, b, cache) for b in branches]
    if all(all(isinstance(x, Node) for x in r) for r in results):
        seen, merged = set(), []
        for r in results:
            for n in r:
                if id(n) not in seen:
                    seen.add(id(n))
                    merged.append(n)
        order = {id(n): i for i, n in enumerate(root.iter())}
        merged.sort(key=lambda n: order.get(id(n), 1 << 60))
        return merged
    out: List[Union[Node, str]] = []
    for r in results:
        out.extend(r)
    return out
