"""Structure-level tree operators: F6 operator plans, F8 skeletons,
F9 table extraction (SURVEY.md §2.9).

Reference semantics (citations into /root/reference/):
- F6 run_operators: apply PRUNE ops (clear node to an empty element) then
  EXTRACT ops (keep-only-included pruning) to one DOM
  (feilian/agents/fragments_detection.py:73-92; table variant
  feilian/agents/table_agent.py:90-122).
- F8 structure skeleton: strip to block-element shape — inline elements
  removed, only the ``class`` attribute kept, text nodes dropped
  (feilian/soup_tools.py:77-94 extract_html_structure); get_structure =
  clean + skeleton + keep-first-of-repeated-structures
  (soup_tools.py:295-304); prune_by_structure aligns an original tree
  against a skeleton and drops the unmatched children
  (soup_tools.py:307-358).
- F9 table extraction: breadth-first scan that stops at each <table>
  (one-layer variant) or recurses through table children (recursive
  variant), capturing xpath / serialized content / caption-or-previous-
  sibling title (soup_tools.py:121-177); shape stats depth / width /
  max-width / count over the nested result (soup_tools.py:180-231 — note
  the reference's width and count are both leaf counts; replicated as-is).

All are pure per-row functions over the kernel DOM — in pipelines they run
inside stateless ``map_batches`` UDFs.  ``content`` uses the kernel's
deterministic ``serialize()`` where the reference uses soup ``prettify()``
(indentation differs; structure and text are equivalent and pinned by this
repo's goldens).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from langscrape_ray.kernel.dom import Comment, Node, parse_html
from langscrape_ray.kernel.treeops import (
    deduplicate_to_prune,
    get_xpath,
    prune_by_xpath,
)
from langscrape_ray.kernel.xpath import xpath_eval

__all__ = [
    "INLINE_ELEMENTS",
    "clear_node",
    "run_operators",
    "extract_structure_skeleton",
    "get_structure",
    "is_same_element",
    "prune_by_structure",
    "get_table_title",
    "extract_tables",
    "extract_tables_recursive",
    "get_tables_depth",
    "get_tables_width",
    "get_tables_max_width",
    "get_tables_count",
]

# feilian/html_constants.py:42-76 (the constants ARE the semantics)
INLINE_ELEMENTS = frozenset(
    {
        "a", "abbr", "acronym", "b", "bdo", "big", "br", "button", "cite",
        "code", "dfn", "em", "i", "img", "input", "kbd", "label", "map",
        "object", "output", "q", "samp", "script", "select", "small", "span",
        "strong", "sub", "sup", "textarea", "time", "tt", "var",
    }
)


# ---------------------------------------------------------------------------
# F6: PRUNE/EXTRACT operator plans
# ---------------------------------------------------------------------------

def clear_node(node: Node) -> None:
    """lxml ``node.clear(); node.text = ''`` analog: drop children and
    attributes, keep the element itself."""
    for c in list(node.children):
        if isinstance(c, Node):
            c.parent = None
    node.children = []
    node.attrs = {}


def run_operators(root: Node, ops: Sequence[Dict]) -> Node:
    """Apply an operator plan to one DOM (reference
    fragments_detection.py:73-92): PRUNE ops first — their xpaths are
    prefix-deduplicated, each hit cleared to an empty element — then the
    EXTRACT ops' xpaths drive keep-only-included pruning (F5).  Operator
    dicts: {"xpath": str, "operator_type": "prune"|"extract", ...}.
    In-place; returns root."""
    prune_xps = deduplicate_to_prune(
        [o["xpath"] for o in ops if o.get("operator_type") == "prune"]
    )
    for xp in prune_xps:
        try:
            hits = xpath_eval(root, xp)
        except Exception:
            continue
        for hit in hits:
            if isinstance(hit, Node):
                clear_node(hit)
    extract_xps = [o["xpath"] for o in ops if o.get("operator_type") == "extract"]
    if extract_xps:
        prune_by_xpath(root, extract_xps)
    return root


# ---------------------------------------------------------------------------
# F8: structure skeleton + structure-guided pruning
# ---------------------------------------------------------------------------

def extract_structure_skeleton(root: Node) -> Node:
    """Strip a (cleaned) tree to its block-structure skeleton
    (soup_tools.py:77-94): inline elements removed wholesale, remaining
    elements keep only their ``class`` attribute, all text dropped.
    In-place; returns root."""
    for child in list(root.children):
        if isinstance(child, Node):
            if child.tag in INLINE_ELEMENTS:
                child.detach()
            else:
                cls = child.attrs.get("class")
                child.attrs = {"class": cls} if cls is not None else {}
                extract_structure_skeleton(child)
        else:
            root.children.remove(child)
    return root


def find_most_repeated_ranges(serialized: List[str]) -> Optional[List[tuple]]:
    """Most-repeated contiguous subsequence of serialized siblings, as the
    list of its occurrence ranges [(start, end), ...] — requires at least
    one class-attributed element in the pattern (feilian/tools.py:6-45:
    the subsequence is searched backwards from each (i, j) window)."""
    import re as _re

    n_items = len(serialized)
    max_repeated = 0
    most_repeats: Optional[List[tuple]] = None
    for i in range(n_items):
        for j in range(i + 1, n_items + 1):
            window = serialized[i:j]
            if not any(_re.match(r"^<\w+\s+class=", s) for s in window):
                continue
            n = len(window)
            count = 0
            repeats = [(i, j)]
            for k in range(i - n, 0, -n):
                if serialized[k : k + n] == window:
                    count += 1
                    repeats.insert(0, (k, k + n))
                else:
                    break
            if count > max_repeated:
                max_repeated = count
                most_repeats = repeats
    if most_repeats is None or len(most_repeats) < 2:
        return None
    return most_repeats


def _keep_unique_structure_node(element: Node) -> None:
    """One element's repeated-structure collapse (soup_tools.py:234-292
    _keep_unique_structure, applied post-order by collapse_repeated)."""
    children = list(element.children)
    if not children or len(children) == 1:
        return
    if element.tag == "li":
        return
    first = children[0]
    first_tag = first.tag if isinstance(first, Node) else None
    if element.tag == "tr" and first_tag in ("td", "th"):
        return
    if element.tag in ("table", "tbody") and first_tag == "tr":
        _set_children(element, children[:1])
        return
    if element.tag in ("ul", "ol") and first_tag == "li":
        _set_children(element, children[:1])
        return
    serialized = [_child_str(c) for c in children]
    import re as _re

    for i in range(len(serialized) - 1):
        if not _re.match(r"^<\w+\s+class=", serialized[i]):
            continue
        current = serialized[i]
        if all(current == s for s in serialized[i + 1 :]):
            _set_children(element, children[: i + 1])
            return
    repeats = find_most_repeated_ranges(serialized)
    if repeats:
        remove = set()
        for start, end in repeats[1:]:
            remove.update(range(start, end))
        keep = [c for idx, c in enumerate(children) if idx not in remove]
        _set_children(element, keep)


def _child_str(c: object) -> str:
    return c.serialize() if isinstance(c, Node) else str(c)


def _set_children(element: Node, keep: List) -> None:
    for c in element.children:
        if isinstance(c, Node):
            c.parent = None
    element.children = []
    for c in keep:
        if isinstance(c, Node):
            element.append(c)
        else:
            element.children.append(c)


def collapse_repeated(root: Node) -> Node:
    """Post-order repeated-structure collapse over the whole tree (the
    deep_first_travel(_keep_unique_structure) pass of get_structure,
    soup_tools.py:295-304).  In-place; returns root."""
    for node in list(root.iter_post()):
        _keep_unique_structure_node(node)
    return root


def get_structure(html: str, unique: bool = True) -> Node:
    """Parse + clean + skeleton [+ keep-first-of-repeated-structures]
    (soup_tools.py:295-304 get_structure)."""
    from langscrape_ray.kernel.clean import clean_tree

    root = parse_html(html)
    clean_tree(root)
    extract_structure_skeleton(root)
    if unique:
        collapse_repeated(root)
    return root


def is_same_element(e1: object, e2: object) -> bool:
    """Same tag + same class attr (soup_tools.py:306-323)."""
    if not isinstance(e1, Node) or not isinstance(e2, Node):
        return False
    if e1.tag != e2.tag:
        return False
    if e1.attrs or e2.attrs:
        return e1.attrs.get("class") == e2.attrs.get("class")
    return True


def prune_by_structure(origin: Node, structure: Node) -> None:
    """Prune ``origin`` so its element shape matches ``structure``
    (soup_tools.py:326-358): children are aligned front-to-back by
    (tag, class); unmatched origin children (including text nodes) are
    removed, trailing extras truncated.  In-place."""
    if not (origin.tag == "#document" and structure.tag == "#document"):
        assert is_same_element(origin, structure), (
            "The structure is not the same as the origin."
        )
    if not origin.children or not structure.children:
        return
    o_i, s_i = 0, 0
    while o_i < len(origin.children) and s_i < len(structure.children):
        o_child = origin.children[o_i]
        s_child = structure.children[s_i]
        if is_same_element(o_child, s_child):
            prune_by_structure(o_child, s_child)
            o_i += 1
            s_i += 1
            continue
        # non-matching origin child (element or text): drop, do not advance
        if isinstance(o_child, Node):
            o_child.detach()
        else:
            origin.children.pop(o_i)
    for extra in list(origin.children[o_i:]):
        if isinstance(extra, Node):
            extra.detach()
        else:
            origin.children.remove(extra)


# ---------------------------------------------------------------------------
# F9: table extraction + shape stats
# ---------------------------------------------------------------------------

def _find_first(node: Node, tag: str) -> Optional[Node]:
    for n in node.iter():
        if n is not node and n.tag == tag:
            return n
    return None


def get_table_title(node: Node) -> Optional[str]:
    """Caption text for tables, else the previous sibling's text
    (soup_tools.py:121-131)."""
    if node.tag == "table":
        cap = _find_first(node, "caption")
        if cap is not None:
            return cap.text_content().strip()
    parent = node.parent
    if parent is not None:
        idx = parent.children.index(node)
        if idx > 0:
            prev = parent.children[idx - 1]
            if isinstance(prev, Comment):
                return str(prev).strip()
            if isinstance(prev, Node):
                return prev.text_content().strip()
            return str(prev).strip()
    return None


def _bfs_tables(node: Node, on_table) -> None:
    """Breadth-first walk that does NOT descend into matched tables
    (soup_tools.py:105-117 breadth_first_travel with interruption)."""
    queue: List[Node] = [node]
    while queue:
        cur = queue.pop(0)
        if cur.tag == "table":
            on_table(cur)
            continue
        queue.extend(cur.element_children())


def extract_tables(node: Node) -> List[Dict]:
    """One-layer table extraction (soup_tools.py:134-152): each table found
    breadth-first, nested tables NOT expanded."""
    tables: List[Dict] = []

    def on_table(el: Node) -> None:
        tables.append(
            {
                "xpath": get_xpath(el),
                "content": el.serialize().strip(),
                "title": get_table_title(el),
                "children": [],
            }
        )

    _bfs_tables(node, on_table)
    return tables


def extract_tables_recursive(node: Node) -> List[Dict]:
    """Recursive table extraction (soup_tools.py:155-177): nested tables
    collected into the parent table's ``children``."""
    tables: List[Dict] = []

    def on_table(el: Node) -> None:
        child_tables: List[Dict] = []
        for child in el.element_children():
            child_tables += extract_tables_recursive(child)
        tables.append(
            {
                "xpath": get_xpath(el),
                "content": el.serialize().strip(),
                "title": get_table_title(el),
                "children": child_tables,
            }
        )

    _bfs_tables(node, on_table)
    return tables


def get_tables_depth(tables: List[Dict]) -> int:
    """Max nesting depth (soup_tools.py:180-190)."""
    if not tables:
        return 0

    def depth(t: Dict, d: int) -> int:
        if not t["children"]:
            return d
        return max(depth(c, d + 1) for c in t["children"])

    return max(depth(t, 1) for t in tables)


def _leaf_sum(tables: List[Dict]) -> int:
    total = 0
    for t in tables:
        total += _leaf_sum(t["children"]) if t["children"] else 1
    return total


def get_tables_width(tables: List[Dict]) -> int:
    """Sum of leaf-table counts (soup_tools.py:193-203 — the reference's
    width is a leaf count; replicated)."""
    return _leaf_sum(tables)


def get_tables_max_width(tables: List[Dict]) -> int:
    """Max per-top-level-table leaf count (soup_tools.py:206-216)."""
    if not tables:
        return 0

    def width(t: Dict) -> int:
        if not t["children"]:
            return 1
        return max(width(c) for c in t["children"])

    return max(width(t) for t in tables)


def get_tables_count(tables: List[Dict]) -> int:
    """Leaf-table count (soup_tools.py:219-231 — identical recursion to
    width in the reference; replicated as-is)."""
    return _leaf_sum(tables)
