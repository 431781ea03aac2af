"""Byte-identical extraction golden tests (SURVEY.md §5 item 1: the
north-rule per-row invariant, asserted against committed golden data)."""

import os

import pyarrow.parquet as pq

from langscrape_ray.sources.make_goldens import (
    GOLDEN_CFG,
    GOLDEN_PATH,
    build_golden_table,
)

GOLDEN = os.path.abspath(GOLDEN_PATH)


def test_extraction_matches_committed_goldens():
    expected = pq.read_table(GOLDEN)
    actual = build_golden_table(GOLDEN_CFG)
    assert actual.num_rows == expected.num_rows
    for col in expected.column_names:
        a, e = actual[col].to_pylist(), expected[col].to_pylist()
        mismatches = [(i, x, y) for i, (x, y) in enumerate(zip(a, e)) if x != y]
        assert not mismatches, f"column {col}: {mismatches[:3]}"


def test_lossless_cleaning_property():
    """Port of the reference's semantic-pruning check
    (/root/reference/feilian/statistical_analysis.py:145-183): every planted
    field value must survive cleaning — i.e. appear in the extraction
    output or the page text."""
    tbl = build_golden_table(GOLDEN_CFG)
    for row in tbl.to_pylist():
        # every page plants a title and an author; they must be recoverable
        title = (row["title"] or [""])[0]
        assert title and not title.startswith("("), row["url"]
        joined = " ".join(row["article_body"])
        assert len(joined) > 0, row["url"]
