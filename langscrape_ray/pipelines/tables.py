"""F9 table-extraction pipeline (SURVEY.md §2.9 F9) over the documents table.

The reference extracts tables (with caption/previous-sibling titles) and
computes shape stats over scraped HTML
(/root/reference/feilian/soup_tools.py:121-231).  Here each document id
deterministically renders a page with planted nested tables, the REAL
kernel (parse -> breadth-first table scan -> recursive nesting -> caption
title capture) extracts them, and the emitted shape stats are compared to
a closed-form DuckDB oracle over the same planting rule:

    n_top    = 1 + doc_id % 3          top-level tables
    c_j      = 2 * ((doc_id + j) % 2)  nested tables inside top table j
    caption planted iff (doc_id + j) % 3 != 0

Scale shape: stateless Arrow ``map_batches`` (parse + extract per row is
pure CPU), column-pruned read (only doc_id leaves storage), no shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def render_doc_page(doc_id: int) -> str:
    """Deterministic page with planted nested tables for ``doc_id``."""
    n_top = 1 + doc_id % 3
    parts = ["<html><body><p>doc %d</p>" % doc_id]
    for j in range(n_top):
        c = 2 * ((doc_id + j) % 2)
        inner = "".join(
            f"<table><tr><td>n{j}-{k}</td></tr></table>" for k in range(c)
        )
        cap = (
            f"<caption>cap-{doc_id}-{j}</caption>"
            if (doc_id + j) % 3 != 0
            else ""
        )
        # separator <p> so an uncaptioned table's previous-sibling title
        # fallback resolves to the marker, not the prior table's caption
        parts.append(
            f"<p>sep{j}</p>"
            f"<table>{cap}<tr><td>cell{j}</td><td>{inner}</td></tr></table>"
        )
    parts.append("</body></html>")
    return "".join(parts)


def table_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document table shape stats via the F9 operators.

    Columns (all int64): doc_id, n_top, n_nested, depth, n_leaves, n_caps.
    n_leaves is the reference's width/count leaf-sum; n_caps counts tables
    whose title came from a <caption> (vs the previous-sibling fallback).
    """

    def stats(t: pa.Table) -> pa.Table:
        from langscrape_ray.kernel.dom import parse_html
        from langscrape_ray.kernel.structure import (
            extract_tables_recursive,
            get_tables_count,
            get_tables_depth,
        )

        ids, n_top, n_nested, depth, n_leaves, n_caps = [], [], [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            root = parse_html(render_doc_page(doc_id))
            tabs = extract_tables_recursive(root)
            ids.append(doc_id)
            n_top.append(len(tabs))
            n_nested.append(sum(len(tb["children"]) for tb in tabs))
            depth.append(get_tables_depth(tabs))
            n_leaves.append(get_tables_count(tabs))
            n_caps.append(
                sum(1 for tb in tabs if (tb["title"] or "").startswith("cap-"))
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_top": pa.array(n_top, pa.int64()),
                "n_nested": pa.array(n_nested, pa.int64()),
                "depth": pa.array(depth, pa.int64()),
                "n_leaves": pa.array(n_leaves, pa.int64()),
                "n_caps": pa.array(n_caps, pa.int64()),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(stats, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# widened-XPath extraction under oracle (M9 + the round-2 grammar)
# ---------------------------------------------------------------------------

# The field map exercises the widened grammar end-to-end THROUGH the M9
# sentinel contract: a union of two re:test branches (EXSLT regex,
# /root/reference/feilian/etree_tools.py:411-414), starts-with + position()
# on the string-value, and a no-hit field that must yield the reference's
# "(Empty Result)" sentinel.
XPATH_EXTRACT_RULES = {
    "price": {
        "strategy": "xpath_extractor",
        "xpath": (
            r"//span[@class='price'][re:test(., 'USD [0-9]+\.[0-9]{2}')]"
            r" | //div[@class='cost'][re:test(., 'USD [0-9]+')]"
        ),
    },
    "author": {
        "strategy": "xpath_extractor",
        "xpath": "//p[starts-with(., 'By ')][position()=1]",
    },
    "missing": {
        "strategy": "xpath_extractor",
        "xpath": "//article[@id='nope']",
    },
}


def render_extract_page(doc_id: int) -> str:
    """Deterministic page: the price lives in span.price (even ids) or
    div.cost (odd ids) so only the union xpath finds both; decoys fail
    the regex / starts-with predicates."""
    price = f"USD {doc_id % 500}.{doc_id % 100:02d}"
    author = f"By author{doc_id % 7}"
    carrier = (
        f"<span class='price'>{price}</span>"
        if doc_id % 2 == 0
        else f"<div class='cost'>{price}</div>"
    )
    return (
        "<html><body>"
        f"<p>{author}</p>"
        "<p>By the way, not an author line start? no: it is —"
        " but position()=1 keeps the first</p>"
        "<span class='price'>EUR 9.99</span>"  # fails the USD regex
        f"{carrier}"
        "</body></html>"
    )


def xpath_extract(sf_dir: str) -> pd.DataFrame:
    """Extract (price, author, missing-sentinel) per document with the
    widened-grammar field map — stateless Arrow map_batches, no shuffle."""

    def extract(t: pa.Table) -> pa.Table:
        from langscrape_ray.kernel.dom import parse_html
        from langscrape_ray.kernel.extract import extract_by_xpath_map

        ids, prices, authors, missings = [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            root = parse_html(render_extract_page(doc_id))
            out = extract_by_xpath_map(root, XPATH_EXTRACT_RULES)
            ids.append(doc_id)
            prices.append("|".join(out["price"]))
            authors.append("|".join(out["author"]))
            missings.append("|".join(out["missing"]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "price": pa.array(prices, pa.string()),
                "author": pa.array(authors, pa.string()),
                "missing": pa.array(missings, pa.string()),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(extract, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)
