"""Lightweight DOM built on stdlib ``html.parser``.

Stands in for the reference's html5lib/BeautifulSoup/lxml trees
(/root/reference/feilian/etree_tools.py:71-73 parse_html,
/root/reference/langscrape/html/utils.py:96 BeautifulSoup(html,"html5lib")).
Those libraries are unavailable in this environment; the kernel defines its own
deterministic parse + serialize contract, pinned by golden files.

Design notes:
- Node is a tiny tree: tag, attrs (insertion-ordered dict), children list of
  Node | str (text) | Comment. Parsing uses ``convert_charrefs=True`` so
  entities arrive decoded as text (like html5lib's text nodes).
- Void elements never take children. Unknown/stray end tags are ignored;
  unclosed elements are auto-closed at EOF or when an ancestor closes
  (a pragmatic subset of HTML5 tree-building adequacy for crawl data).
- Serialization escapes ``& < >`` in text and ``& " <`` in attribute values,
  renders void elements as ``<tag .../>`` (BeautifulSoup-style).
"""

from __future__ import annotations

import html as _htmllib
import re
from html.parser import HTMLParser
from typing import Iterator, List, Optional, Union

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Elements that implicitly close an open <p> (subset of the HTML5 spec list).
_P_CLOSERS = frozenset(
    {
        "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
        "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
        "main", "nav", "ol", "p", "pre", "section", "table", "ul",
    }
)


class Comment(str):
    """A comment node; subclass of str carrying the comment text."""

    __slots__ = ()


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Optional[dict] = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: List[Union["Node", str]] = []
        self.parent: Optional["Node"] = None

    # -- tree ops -------------------------------------------------------
    def append(self, child: Union["Node", str]) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def remove_child(self, child: Union["Node", str]) -> None:
        self.children.remove(child)
        if isinstance(child, Node):
            child.parent = None

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.remove_child(self)

    def element_children(self) -> List["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def iter(self) -> Iterator["Node"]:
        """Pre-order element iteration including self (iterative: recursion
        via generators showed up in kernel profiles)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(
                c for c in reversed(node.children) if isinstance(c, Node)
            )

    def iter_post(self) -> Iterator["Node"]:
        """Post-order element iteration including self (children first).

        Matches the traversal order of the reference cleaner
        (/root/reference/feilian/soup_tools.py:97-104 deep_first_travel).
        """
        for c in list(self.children):
            if isinstance(c, Node):
                yield from c.iter_post()
        yield self

    # -- text -----------------------------------------------------------
    def text_content(self) -> str:
        """Concatenated descendant text (lxml ``text_content()`` semantics,
        used at /root/reference/langscrape/html/xpath_extractor.py:80).
        Iterative: this is the kernel's hottest call."""
        parts: List[str] = []
        stack: List[object] = [self]
        while stack:
            item = stack.pop()
            if isinstance(item, str):
                if not isinstance(item, Comment):
                    parts.append(item)
                continue
            # Node: push children reversed so pops come in document order
            stack.extend(reversed(item.children))
        return "".join(parts)

    def get(self, attr: str) -> Optional[str]:
        return self.attrs.get(attr)

    def copy_tree(self) -> "Node":
        """Deep copy of this subtree (~10x cheaper than re-parsing the
        serialized HTML with the pure-Python parser)."""
        clone = Node(self.tag, dict(self.attrs))
        for c in self.children:
            if isinstance(c, Node):
                clone.append(c.copy_tree())
            else:
                clone.children.append(c)  # str/Comment are immutable
        return clone

    # -- serialize ------------------------------------------------------
    def serialize(self) -> str:
        out: List[str] = []
        self._serialize(out)
        return "".join(out)

    def _serialize(self, out: List[str]) -> None:
        if self.tag == "#document":
            for c in self.children:
                _serialize_child(c, out)
            return
        attrs = "".join(
            f' {k}="{_escape_attr(v)}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS and not self.children:
            out.append(f"<{self.tag}{attrs}/>")
            return
        out.append(f"<{self.tag}{attrs}>")
        for c in self.children:
            _serialize_child(c, out)
        out.append(f"</{self.tag}>")

    def serialized_len(self) -> int:
        """``len(self.serialize())`` without building the string — the M3
        length gate needs only the length.  Escape growth is arithmetic on
        the ORIGINAL text (each ``&`` +4, ``<``/``>`` +3; attr ``"`` +5),
        exact because the escapers substitute disjoint original chars.
        Invariant ``serialized_len() == len(serialize())`` is pinned by
        tests over the fixture corpus.  Iterative (explicit stack, order
        irrelevant for a sum) — same shape as ``text_content``; per-page
        this is one of the kernel's hottest calls and the stack form is
        ~1.4x the recursive one."""
        total = 0
        stack: List[object] = [self]
        push = stack.extend
        pop = stack.pop
        while stack:
            item = pop()
            cls = item.__class__
            if cls is str:
                total += (
                    len(item)
                    + 4 * item.count("&")
                    + 3 * item.count("<")
                    + 3 * item.count(">")
                )
            elif cls is Comment:
                total += 7 + len(item)
            else:
                tag = item.tag
                if tag == "#document":
                    push(item.children)
                    continue
                if item.attrs:
                    for k, v in item.attrs.items():
                        if v is None:
                            total += 1 + len(k)
                        else:
                            total += (
                                4
                                + len(k)
                                + len(v)
                                + 4 * v.count("&")
                                + 5 * v.count('"')
                                + 3 * v.count("<")
                            )
                ch = item.children
                if not ch and tag in VOID_ELEMENTS:
                    total += 3 + len(tag)
                else:
                    total += 2 * len(tag) + 5
                    push(ch)
        return total

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} attrs={self.attrs} children={len(self.children)}>"


def _serialize_child(c: Union[Node, str], out: List[str]) -> None:
    if isinstance(c, Comment):
        out.append(f"<!--{c}-->")
    elif isinstance(c, Node):
        c._serialize(out)
    else:
        out.append(_escape_text(c))


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;").replace("<", "&lt;")


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack: List[Node] = [self.root]

    # current open element
    @property
    def top(self) -> Node:
        return self.stack[-1]

    def handle_starttag(self, tag, attrs):
        # stdlib path: attrs is a list of pairs; dict() keeps the last
        # duplicate, matching the fast tokenizer's dict assignment
        self._start(tag, dict(attrs) if attrs else None)

    def _start(self, tag, attrs):
        if tag == "p" or tag in _P_CLOSERS:
            # implicit </p>
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
                if self.stack[i].tag in ("div", "section", "article", "td", "th", "li"):
                    break
        node = Node(tag, attrs)
        self.top.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.top.append(Node(tag, dict(attrs) if attrs else None))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored

    def handle_data(self, data):
        if data:
            self.top.append(data)

    def handle_comment(self, data):
        self.top.append(Comment(data))

    # declarations / PIs / unknown: dropped (html5lib also drops doctype into
    # a non-content node)
    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


# WHATWG-ish label -> python codec map (the labels that actually occur on
# the public web; unknown labels fall through to the utf-8 default path).
_CHARSET_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "us-ascii": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "windows-1251": "cp1251", "cp1251": "cp1251", "koi8-r": "koi8-r",
    "iso-8859-2": "iso8859-2", "iso-8859-15": "iso8859-15",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-jp": "euc_jp",
    "gb2312": "gbk", "gbk": "gbk", "gb18030": "gb18030", "big5": "big5",
    "utf-16": "utf-16", "utf-16le": "utf-16", "utf-16be": "utf-16",
}

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]+)",
    re.IGNORECASE,
)


def sniff_charset(raw: Union[bytes, bytearray, memoryview]) -> "tuple[str, str]":
    """(python codec, source) charset sniff for an ``html: binary`` cell —
    the deterministic stand-in for requests/BeautifulSoup sniffing:

      1. BOM (utf-8-sig / utf-16 LE / BE) — source ``"bom"``;
      2. WHATWG meta prescan: ``<meta charset=...>`` or
         ``<meta http-equiv="Content-Type" content="...charset=...">``
         within the first 1024 bytes — source ``"meta"``;
      3. otherwise utf-8 — source ``"default"``.

    The caller still strict-validates: a declared codec that fails to
    decode falls back down the chain, so a page DECLARING utf-8 while
    carrying latin-1 bytes (a real and common crawl artifact, exercised
    by the fixture weird-bytes pages) decodes exactly as the old
    utf-8-else-latin-1 rule did.
    """
    b = bytes(raw)
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if b[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16", "bom"  # the utf-16 codec reads + strips the BOM
    m = _META_CHARSET_RE.search(b[:1024])
    if m:
        codec = _CHARSET_LABELS.get(m.group(1).decode("ascii").lower())
        if codec:
            return codec, "meta"
    return "utf-8", "default"


def decode_html_bytes(raw: Union[bytes, bytearray, memoryview, str]) -> str:
    """Decode an ``html: binary`` cell deterministically.

    BOM / meta-declared charset (strict, via :func:`sniff_charset`), else
    strict UTF-8, else latin-1 (which cannot fail).  The reference relies
    on BeautifulSoup/requests encoding sniffing; this kernel pins a
    deterministic rule with the same observable behavior on well-formed
    pages, and the old utf-8-else-latin-1 behavior on undeclared or
    lying-declaration pages (golden outputs unchanged).
    """
    if isinstance(raw, str):
        return raw
    b = bytes(raw)
    codec, src = sniff_charset(b)
    if src != "default" and codec not in ("utf-8", "utf-8-sig"):
        try:
            return b.decode(codec)
        except UnicodeDecodeError:
            pass
    elif codec == "utf-8-sig":
        try:
            return b.decode("utf-8-sig")
        except UnicodeDecodeError:
            pass
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


# ---------------------------------------------------------------------------
# Fast tokenizer: a STRICT subset of html.parser's grammar.  Well-formed
# markup (the overwhelmingly common case) tokenizes ~3x faster than the
# stdlib parser; ANYTHING outside the strict subset rejects the whole page
# and parse_html falls back to html.parser, so behavior is identical by
# construction.  Equivalence on accepted input is pinned by a differential
# test (tests/test_kernel.py) over the fixture corpus, goldens, and
# adversarial cases.  Event semantics matched to CPython 3.11 html.parser
# with convert_charrefs=True:
#   - text runs go to the next '<' and are html.unescape()d as one data
#     event;
#   - tag/attr names lowercase; attr values are unescaped; valueless attrs
#     map to None; '<x/>' emits startendtag;
#   - <script>/<style> content is raw (no unescape) up to a strict
#     '</script\s*>' close — any earlier '</' inside rejects;
#   - comments stop at the first '-->'; only '<!doctype...>' declarations
#     and '<?...>' PIs are accepted (both dropped, as the builder does).
# ---------------------------------------------------------------------------

_F_STARTTAG = re.compile(r"<([a-zA-Z][-.a-zA-Z0-9:_]*)")
_F_ATTR = re.compile(
    r"\s+([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'=<>`]+)))?"
)
_F_TAGEND = re.compile(r"\s*(/?)>")
_F_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_F_COMMENT = re.compile(r"<!--(.*?)-->", re.S)
# no '[' — a doctype-internal subset may contain '>' and needs the stdlib
# declaration parser
_F_DOCTYPE = re.compile(r"<!doctype[^>\[]*>", re.I)
_F_PI = re.compile(r"<\?[^>]*>", re.S)
_F_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}


def _fast_tokenize(s: str):
    """Tokenize ``s`` into builder events, or return None if any construct
    falls outside the strict subset (caller then uses html.parser)."""
    from html import unescape

    events = []
    i, n = 0, len(s)
    while i < n:
        j = s.find("<", i)
        if j < 0:
            run = s[i:]
            events.append(("data", unescape(run) if "&" in run else run))
            break
        if j > i:
            run = s[i:j]
            events.append(("data", unescape(run) if "&" in run else run))
            i = j
        nxt = s[i + 1] if i + 1 < n else ""
        if nxt == "/":
            m = _F_ENDTAG.match(s, i)
            if not m:
                return None
            events.append(("end", m.group(1).lower()))
            i = m.end()
        elif nxt == "!":
            if s.startswith("<!--", i):
                m = _F_COMMENT.match(s, i)
                if not m:
                    return None
                events.append(("comment", m.group(1)))
                i = m.end()
            else:
                m = _F_DOCTYPE.match(s, i)
                if not m:
                    return None
                i = m.end()  # dropped (builder.handle_decl is a no-op)
        elif nxt == "?":
            m = _F_PI.match(s, i)
            if not m:
                return None
            i = m.end()  # dropped
        elif nxt.isascii() and nxt.isalpha():
            m = _F_STARTTAG.match(s, i)
            if not m:
                return None
            tag = m.group(1).lower()
            i = m.end()
            # attrs build as a dict directly (last occurrence wins — same
            # as the stdlib path's dict(attr_list)); the common attr-less
            # '>' ending skips both the attr and tag-end regexes
            if i < n and s[i] == ">":
                attrs: dict = {}
                i += 1
                em_selfclose = ""
            else:
                attrs = {}
                while True:
                    am = _F_ATTR.match(s, i)
                    if not am:
                        break
                    name = am.group(1).lower()
                    val = am.group(2)
                    if val is None:
                        val = am.group(3)
                    if val is None:
                        val = am.group(4)
                    if val is not None and "&" in val:
                        val = unescape(val)
                    attrs[name] = val
                    i = am.end()
                em = _F_TAGEND.match(s, i)
                if not em:
                    return None
                i = em.end()
                em_selfclose = em.group(1)
            if em_selfclose:
                events.append(("startend", tag, attrs))
            elif tag in ("script", "style"):
                events.append(("start", tag, attrs))
                # cdata mode: raw content up to a strict full close; any
                # earlier '</' is ambiguous tolerant-parser territory
                k = s.find("</", i)
                if k < 0:
                    return None
                cm = _F_CDATA_CLOSE[tag].match(s, k)
                if not cm:
                    return None
                if k > i:
                    events.append(("data", s[i:k]))  # raw, no unescape
                events.append(("end", tag))
                i = cm.end()
            else:
                events.append(("start", tag, attrs))
        else:
            return None  # '<' not opening a construct: tolerant-parser path
    return events


def parse_html(html_str: Union[str, bytes]) -> Node:
    """Parse HTML into a Node tree (control chars stripped first).

    Mirrors /root/reference/feilian/etree_tools.py:71-73 (parse after
    remove_control_characters) without the html5lib implied-element insertion:
    the returned root is a ``#document`` node whose children mirror the input
    markup structure.  Well-formed markup takes the fast tokenizer; anything
    unusual falls back to the stdlib parser (identical events by contract —
    see _fast_tokenize)."""
    from langscrape_ray.kernel.textops import remove_control_characters

    if isinstance(html_str, (bytes, bytearray, memoryview)):
        html_str = decode_html_bytes(html_str)
    html_str = remove_control_characters(html_str)
    builder = _TreeBuilder()
    events = _fast_tokenize(html_str)
    if events is not None:
        # fast-path events carry attrs as ready dicts (no per-node
        # dict(list) conversion; `or None` normalizes empties so both
        # paths hand Node.__init__ the same argument shapes)
        for ev in events:
            kind = ev[0]
            if kind == "data":
                builder.handle_data(ev[1])
            elif kind == "start":
                builder._start(ev[1], ev[2] or None)
            elif kind == "end":
                builder.handle_endtag(ev[1])
            elif kind == "startend":
                builder.top.append(Node(ev[1], ev[2] or None))
            else:
                builder.handle_comment(ev[1])
        return builder.root
    builder.feed(html_str)
    builder.close()
    return builder.root
