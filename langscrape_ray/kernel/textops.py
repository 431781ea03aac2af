"""Scalar text operations with reference semantics.

Reference: /root/reference/feilian/text_tools.py:20-48 (normalize_text),
/root/reference/feilian/etree_tools.py:19-68 (remove_control_characters),
/root/reference/langscrape/html/utils.py:102 (whitespace collapse),
/root/reference/langscrape/pdf/pdf_utils.py:7-14 (collapse_dots / normalizer).

All functions are pure, deterministic, and safe to call from inside
vectorized ``map_batches`` UDFs (compile regexes at module import).
"""

from __future__ import annotations

import html as _htmllib
import re

# Explicit entity replacements applied BEFORE the generic html.unescape pass.
# Semantics of /root/reference/feilian/text_tools.py:20-44: a fixed table of
# common (and some malformed, e.g. "&#035;") entities seen in the wild.
_ENTITY_TABLE: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#150;", "–"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&#039;", "'"),
    ("&#34;", '"'),
    ("&reg;", "®"),
    ("&rsquo;", "’"),
    ("&#8226;", "•"),
    ("&ndash;", "–"),
    ("&#x27;", "'"),
    ("&#40;", "("),
    ("&#41;", ")"),
    ("&#47;", "/"),
    ("&#43;", "+"),
    ("&#035;", "#"),
    ("&#38;", "&"),
    ("&eacute;", "é"),
    ("&frac12;", "½"),
)

# single-pass form of the table: one alternation scan instead of 24
# sequential scans (~4x on page text).  Observably identical to the
# sequential replaces because (a) no table entry is a prefix of another,
# so leftmost-first == leftmost-longest == the sequential match set over
# the original string, and (b) the only replacement output that can seed
# a later table match is "&", and every entity it can complete is
# converted identically by the mandatory html.unescape pass that follows
# whenever "&" survives (&nbsp;/&#160; -> \xa0 there, -> " " one step
# later).  Equivalence is fuzz-pinned in tests/test_kernel.py.
_ENTITY_RE = re.compile("|".join(re.escape(s) for s, _ in _ENTITY_TABLE))
_ENTITY_MAP = dict(_ENTITY_TABLE)


def _entity_repl(m: "re.Match[str]") -> str:
    return _ENTITY_MAP[m.group(0)]


_MULTI_SPACE_RE = re.compile(r"  +")
_ANY_WS_RE = re.compile(r"\s+")
_MULTI_DOT_RE = re.compile(r"\.\.+")

# XML 1.0 invalid character ranges (semantics of
# /root/reference/feilian/etree_tools.py:19-34):
#   0x0-0x8, 0xB, 0xC, 0xE-0x1F, 0xD800-0xDFFF, 0xFFFE, 0xFFFF
_ILLEGAL_XML_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")
_DEC_REF_RE = re.compile(r"&#(\d+);?")
_HEX_REF_RE = re.compile(r"&#[xX]([0-9a-fA-F]+);?")


def _is_illegal_codepoint(n: int) -> bool:
    return (
        n <= 0x8
        or n in (0xB, 0xC, 0xFFFE, 0xFFFF)
        or 0xE <= n <= 0x1F
        or 0xD800 <= n <= 0xDFFF
    )


def remove_control_characters(html_str: str) -> str:
    """Strip XML-illegal characters, including ones hidden in numeric char refs.

    Mirrors /root/reference/feilian/etree_tools.py:37-68: non-ASCII characters
    are first escaped to numeric char-refs (so emojis survive), char-refs that
    denote illegal codepoints are dropped, then raw illegal characters are
    stripped.  NOTE: like the reference, the output is pure ASCII with
    ``&#...;`` references for everything non-ASCII.
    """
    html_str = html_str.encode("ascii", "xmlcharrefreplace").decode("ascii")
    html_str = _DEC_REF_RE.sub(
        lambda m: "" if _is_illegal_codepoint(int(m.group(1))) else m.group(0), html_str
    )
    html_str = _HEX_REF_RE.sub(
        lambda m: "" if _is_illegal_codepoint(int(m.group(1), 16)) else m.group(0),
        html_str,
    )
    return _ILLEGAL_XML_RE.sub("", html_str)


def normalize_text(text: str) -> str:
    """Entity-table normalize + unescape + NBSP/space collapse + strip.

    Semantics of /root/reference/feilian/text_tools.py:20-48: explicit table
    first, then a generic ``html.unescape``, NBSP to space, runs of 2+ spaces
    collapsed to one, and a final strip.  The table is applied as ONE
    alternation pass (see ``_ENTITY_RE``), equivalence fuzz-pinned.
    """
    # guards are exact identities: the table and unescape only act on '&',
    # the NBSP replace on '\xa0', the 2+-space collapse on a literal '  '
    if "&" in text:
        text = _ENTITY_RE.sub(_entity_repl, text)
        if "&" in text:
            text = _htmllib.unescape(text)
    if "\xa0" in text:
        text = text.replace("\xa0", " ")
    if "  " in text:
        text = _MULTI_SPACE_RE.sub(" ", text)
    return text.strip()


def normalize_lines(text: str) -> list[str]:
    """``[normalize_text(ln) for ln in text.split("\\n")]``, batched.

    Exact: every normalize_text operation is newline-local — entity
    strings contain no ``\\n``, ``html.unescape``'s entity pattern
    excludes ``\\n`` from its char class, NBSP is a single char, and the
    2+-space collapse matches spaces only — so running them ONCE over the
    whole page and splitting after is observably identical to per-line
    application (pinned by a differential test), while collapsing ~40
    Python calls + regex invocations per page into one pass."""
    if "&" in text:
        text = _ENTITY_RE.sub(_entity_repl, text)
        if "&" in text:
            text = _htmllib.unescape(text)
    if "\xa0" in text:
        text = text.replace("\xa0", " ")
    if "  " in text:
        text = _MULTI_SPACE_RE.sub(" ", text)
    return [ln.strip() for ln in text.split("\n")]


def collapse_whitespace(text: str) -> str:
    """Collapse ALL whitespace runs to single spaces and strip.

    Semantics of /root/reference/langscrape/html/utils.py:102-103: applied to
    the serialized cleaned HTML before extraction, so the extractor sees
    single-space-normalized markup.
    """
    return _ANY_WS_RE.sub(" ", text).strip()


def collapse_dots(text: str) -> str:
    """Collapse runs of dots and whitespace; strip.

    Semantics of /root/reference/langscrape/pdf/pdf_utils.py:7-14 (PDF branch
    text normalizer).
    """
    text = _MULTI_DOT_RE.sub(".", text)
    return _ANY_WS_RE.sub(" ", text).strip()
