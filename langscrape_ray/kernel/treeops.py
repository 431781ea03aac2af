"""Per-DOM tree/fragment operators (SURVEY.md §2.9 F-family + §2.7 D2/D3).

The reference implements these over BeautifulSoup/lxml trees; here they run
on the kernel DOM.  All are pure per-row functions — in pipelines they live
inside stateless ``map_batches`` UDFs.

Reference semantics (citations into /root/reference/):
- F2 get_xpath: absolute, sibling-indexed (feilian/soup_tools.py:420-439;
  feilian/etree_tools.py:477-523)
- F3 gen_xpath_by_text: inverse extraction — find nodes containing target
  text, min length-diff tie-break (feilian/etree_tools.py:526-594)
- F4 prune_by_tokens: keep the leftmost subtree within a token budget
  (feilian/etree_tools.py:254-296)
- F5 prune_by_xpath / extraction_based_pruning: keep only subtrees on
  include-paths, elide the rest to "..." (feilian/etree_tools.py:359-382)
- F10 prune_to_text: collapse elements to text, preserving table/list shape
  (feilian/etree_tools.py:312-340)
- F11 remove_by_xpath / apply_trim_rules (feilian/etree_tools.py:409-434)
- D2 deduplicate_to_prune: drop xpaths that extend an earlier one
  (feilian/etree_tools.py:343-356)
- D3 find_most_repeated_sub_sequence: most-repeated contiguous sibling
  subsequence by structure hash, keep first occurrence
  (feilian/tools.py:6-45; applied in soup_tools.py:234-292)
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, List, Optional, Sequence, Tuple

from langscrape_ray.kernel.dom import Comment, Node
from langscrape_ray.kernel.textops import normalize_text
from langscrape_ray.kernel.xpath import xpath_eval

_WS_TOKEN_RE = re.compile(r"\S+")


def default_token_count(text: str) -> int:
    """Whitespace tokenizer (stand-in for the reference's tiktoken counter,
    feilian/fragments_detection.py:29 — tiktoken is unavailable here)."""
    return len(_WS_TOKEN_RE.findall(text))


# ---------------------------------------------------------------------------
# F2: absolute xpath generation
# ---------------------------------------------------------------------------

def get_xpath(node: Node) -> str:
    """Absolute sibling-indexed xpath, e.g. ``/html/body/div[2]/p``.

    Index is emitted only when the node has same-tag siblings (matching the
    reference's get_xpath output shape)."""
    parts: List[str] = []
    cur: Optional[Node] = node
    while cur is not None and cur.tag != "#document":
        parent = cur.parent
        if parent is None:
            parts.append(f"/{cur.tag}")
            break
        same = [c for c in parent.element_children() if c.tag == cur.tag]
        if len(same) > 1:
            parts.append(f"/{cur.tag}[{same.index(cur) + 1}]")
        else:
            parts.append(f"/{cur.tag}")
        cur = parent
    return "".join(reversed(parts))


# ---------------------------------------------------------------------------
# F3: inverse extraction — xpaths for nodes containing a target text
# ---------------------------------------------------------------------------

def gen_xpath_by_text(root: Node, target: str, max_results: int = 4) -> List[str]:
    """Find the deepest nodes whose normalized text CONTAINS the target
    (normalized); tie-break by smallest length difference, i.e. the
    tightest containing node (feilian/etree_tools.py:526-594 semantics)."""
    want = normalize_text(target)
    if not want:
        return []
    hits: List[Tuple[int, Node]] = []
    for node in root.iter():
        if node.tag == "#document":
            continue
        text = normalize_text(node.text_content())
        if want in text:
            # keep only deepest containers: skip if some child also contains
            if any(
                want in normalize_text(c.text_content())
                for c in node.element_children()
            ):
                continue
            hits.append((len(text) - len(want), node))
    hits.sort(key=lambda h: h[0])
    return [get_xpath(n) for _d, n in hits[:max_results]]


# ---------------------------------------------------------------------------
# F4: token-budget pruning (keep leftmost content)
# ---------------------------------------------------------------------------

def prune_by_tokens(
    root: Node,
    max_tokens: int,
    token_count: Callable[[str], int] = default_token_count,
) -> Node:
    """Trim the tree front-to-back: keep children while the running token
    total fits the budget; the child that crosses the budget is recursed
    into; everything after it is dropped (feilian/etree_tools.py:254-296
    "extract left subtree" semantics).  In-place; returns root."""

    def prune(node: Node, budget: int) -> int:
        """Returns tokens consumed under ``node`` after pruning."""
        used = 0
        for child in list(node.children):
            if isinstance(child, Comment):
                node.remove_child(child)
                continue
            if isinstance(child, str):
                n = token_count(child)
                if used + n <= budget:
                    used += n
                else:
                    node.remove_child(child)
                continue
            n = token_count(child.text_content())
            if used + n <= budget:
                used += n
                continue
            if used >= budget:
                node.remove_child(child)
                continue
            used += prune(child, budget - used)
        return used

    prune(root, max_tokens)
    return root


# ---------------------------------------------------------------------------
# F5: keep-only-included-subtrees pruning
# ---------------------------------------------------------------------------

def prune_by_xpath(root: Node, include_xpaths: Sequence[str]) -> Node:
    """Keep only nodes on a path to/from the include-xpath hits; other
    subtrees are elided to a ``...`` text marker
    (feilian/etree_tools.py:359-382 extraction_based_pruning).  In-place."""
    keep: set = set()
    for xp in include_xpaths:
        try:
            hits = xpath_eval(root, xp)
        except Exception:
            continue
        for hit in hits:
            if not isinstance(hit, Node):
                continue
            for d in hit.iter():  # the whole matched subtree
                keep.add(id(d))
            cur = hit.parent  # and the ancestor chain
            while cur is not None:
                keep.add(id(cur))
                cur = cur.parent

    def walk(node: Node) -> None:
        elided = False
        for child in list(node.children):
            if not isinstance(child, Node):
                continue
            if id(child) in keep:
                walk(child)
            else:
                node.remove_child(child)
                if not elided:
                    node.append("...")
                    elided = True

    keep.add(id(root))
    walk(root)
    return root


# ---------------------------------------------------------------------------
# F10: collapse to text preserving table/list shape
# ---------------------------------------------------------------------------

_SHAPE_TAGS = frozenset({"table", "tr", "td", "th", "ul", "ol", "li"})


def prune_to_text(node: Node) -> None:
    """Collapse element subtrees to their text, preserving the tr/td and
    ul/li skeleton (feilian/etree_tools.py:312-340).  In-place."""
    for child in list(node.children):
        if not isinstance(child, Node):
            continue
        if child.tag in _SHAPE_TAGS:
            prune_to_text(child)
        else:
            text = child.text_content()
            node.children[node.children.index(child)] = text
            child.parent = None


# ---------------------------------------------------------------------------
# F11: config-driven trim rules
# ---------------------------------------------------------------------------

def remove_by_xpath(root: Node, trim_xpaths: Sequence[str]) -> Node:
    """Drop every node matching any configured xpath
    (feilian/etree_tools.py:409-434 apply_trim_rules).  In-place."""
    for xp in trim_xpaths:
        try:
            hits = xpath_eval(root, xp)
        except Exception:
            continue
        for hit in hits:
            if isinstance(hit, Node):
                hit.detach()
    return root


# ---------------------------------------------------------------------------
# D2: xpath prefix dedup
# ---------------------------------------------------------------------------

def deduplicate_to_prune(xpaths: Sequence[str]) -> List[str]:
    """Sort, then drop any xpath that path-extends an earlier kept one
    (feilian/etree_tools.py:343-356)."""
    out: List[str] = []
    for xp in sorted(xpaths):
        if any(xp == k or xp.startswith(k + "/") or xp.startswith(k + "[") for k in out):
            continue
        out.append(xp)
    return out


# ---------------------------------------------------------------------------
# D3: repeated sibling-structure dedup
# ---------------------------------------------------------------------------

def _structure_hash(node: Node) -> str:
    """Structure fingerprint: tag + class + child structure (md5), the
    reference hashes serialized structure rows (feilian/tools.py:14)."""
    parts = [node.tag, node.attrs.get("class") or ""]
    for c in node.element_children():
        parts.append(_structure_hash(c))
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def find_most_repeated_subsequence(hashes: Sequence[str]) -> Tuple[int, int, int]:
    """Most-repeated contiguous subsequence of the hash list; returns
    (start, length, count) of the winning pattern (count of non-overlapping
    repeats).  O(n^3) like the reference (feilian/tools.py:6-45) — fine for
    sibling lists."""
    n = len(hashes)
    best = (0, 0, 0)  # start, length, count
    for length in range(1, n // 2 + 1):
        for start in range(0, n - length + 1):
            pat = tuple(hashes[start : start + length])
            count = 0
            i = start
            while i + length <= n:
                if tuple(hashes[i : i + length]) == pat:
                    count += 1
                    i += length
                else:
                    break
            score = count * length
            if count > 1 and score > best[1] * best[2]:
                best = (start, length, count)
    return best


def keep_unique_structure(node: Node) -> Node:
    """Within each element's children, find the most-repeated contiguous
    structural pattern and keep only its FIRST occurrence
    (feilian/soup_tools.py:234-292 _keep_unique_structure).  In-place."""
    kids = node.element_children()
    if len(kids) >= 4:
        hashes = [_structure_hash(c) for c in kids]
        start, length, count = find_most_repeated_subsequence(hashes)
        if count > 1 and length >= 1:
            for idx in range(start + length, start + length * count):
                kids[idx].detach()
    for c in node.element_children():
        keep_unique_structure(c)
    return node


# ---------------------------------------------------------------------------
# F7: token-tree weighted fragment mining
# ---------------------------------------------------------------------------

_F7_CONTAINER = frozenset({"table", "ul", "ol", "section", "article"})
_F7_INLINE = frozenset(
    {
        "a", "abbr", "b", "bdo", "big", "br", "button", "cite", "code", "dfn",
        "em", "i", "img", "input", "kbd", "label", "q", "samp", "small",
        "span", "strong", "sub", "sup", "textarea", "time", "tt", "var",
    }
)


class TokenTreeNode:
    """Per-element token stats (SURVEY.md §2.9 F7; semantics of the
    reference's token tree, /root/reference/feilian/etree_token_stats.py:
    build_token_tree:177-192, reweighing:83-123).

    weight = depth/max_depth + tanh(tokens/total_tokens) + width/max_width
             + element_weight(tag-class rules); zeroed outside the
             [min_tokens, max_tokens] band."""

    __slots__ = ("node", "depth", "text_tokens", "width", "weight", "children")

    def __init__(self, node: Node, depth: int,
                 token_count: Callable[[str], int] = default_token_count):
        self.node = node
        self.depth = depth
        self.width = len(node.element_children())
        self.text_tokens = token_count(node.text_content())
        self.weight = 0.0
        self.children = [
            TokenTreeNode(c, depth + 1, token_count)
            for c in node.element_children()
        ]

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def reweigh(self, max_depth: int, max_width: int, total_tokens: int,
                max_tokens: int, min_tokens: int) -> None:
        import math

        tag = self.node.tag.lower()
        has_class = bool(self.node.attrs.get("class"))
        element_weight = 0.6
        if tag in _F7_INLINE:
            element_weight = 0.7 if has_class else 0.4
        elif tag in _F7_CONTAINER:
            element_weight = 1.0 if has_class else 0.9
        elif tag == "div" and has_class:
            element_weight = 0.8
        weight = (
            self.depth / max(1, max_depth)
            + math.tanh(self.text_tokens / max(1, total_tokens))
            + self.width / max(1, max_width)
            + element_weight
        )
        if self.text_tokens < min_tokens or self.text_tokens > max_tokens:
            weight = 0.0
        self.weight = weight
        for c in self.children:
            c.reweigh(max_depth, max_width, total_tokens, max_tokens, min_tokens)


def build_token_tree(root: Node,
                     token_count: Callable[[str], int] = default_token_count
                     ) -> TokenTreeNode:
    return TokenTreeNode(root, 0, token_count)


def extract_fragments_by_weight(
    root: Node,
    max_fragments: int = 4,
    max_tokens: int = 512,
    min_tokens: int = 16,
    token_count: Callable[[str], int] = default_token_count,
) -> List[str]:
    """Iterative heaviest-fragment extraction (reference
    extract_fragments_by_weight:238-268): reweigh, take the heaviest node's
    xpath, zero its subtree (and ancestors' token credit), repeat.  Returns
    fragment xpaths in extraction order."""
    tree = build_token_tree(root, token_count)
    nodes = list(tree.iter())
    if not nodes:
        return []
    max_depth = max(n.depth for n in nodes)
    max_width = max(n.width for n in nodes)
    total = max(1, tree.text_tokens)
    tree.reweigh(max_depth, max_width, total, max_tokens, min_tokens)

    taken: List[str] = []
    taken_ids: set = set()
    for _ in range(max_fragments):
        best = None
        for n in tree.iter():
            if id(n.node) in taken_ids or n.weight <= 0:
                continue
            # skip nodes inside an already-taken fragment
            cur = n.node.parent
            inside = False
            while cur is not None:
                if id(cur) in taken_ids:
                    inside = True
                    break
                cur = cur.parent
            if inside:
                continue
            if best is None or n.weight > best.weight:
                best = n
        if best is None:
            break
        taken.append(get_xpath(best.node))
        taken_ids.add(id(best.node))
    return taken
