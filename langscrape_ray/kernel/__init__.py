"""Pure-Python extraction kernel (no Ray imports allowed in this subpackage).

This kernel is the single source of truth for the per-row invariant
("byte-identical extracted text per url"): both the distributed engine and the
single-process oracle call these functions, and committed golden files pin the
bytes across refactors (see tests/test_golden_extraction.py).

The reference implements this data plane with html5lib/BeautifulSoup/lxml
(/root/reference/langscrape/html/utils.py:91-103,
/root/reference/feilian/soup_tools.py:26-74,
/root/reference/langscrape/html/xpath_extractor.py:47-87). Those libraries are
not available here, so the kernel re-implements the same *semantics* on a
lightweight stdlib-based DOM.
"""

from langscrape_ray.kernel.textops import (
    normalize_text,
    remove_control_characters,
    collapse_whitespace,
    collapse_dots,
)
from langscrape_ray.kernel.dom import parse_html, Node, decode_html_bytes
from langscrape_ray.kernel.clean import clean_html_for_extraction, clean_tree
from langscrape_ray.kernel.xpath import xpath_eval, XPathError
from langscrape_ray.kernel.extract import (
    extract_by_xpath_map,
    html_to_text,
    page_text,
    SENTINEL_NO_STORED_VALUE,
    SENTINEL_NO_XPATH,
    SENTINEL_EMPTY,
)

__all__ = [
    "normalize_text",
    "remove_control_characters",
    "collapse_whitespace",
    "collapse_dots",
    "parse_html",
    "decode_html_bytes",
    "Node",
    "clean_html_for_extraction",
    "clean_tree",
    "xpath_eval",
    "XPathError",
    "extract_by_xpath_map",
    "html_to_text",
    "page_text",
    "SENTINEL_NO_STORED_VALUE",
    "SENTINEL_NO_XPATH",
    "SENTINEL_EMPTY",
]
