"""Tests: minimal PDF text-object extractor + fixture writer (S5).

Reference semantics: /root/reference/langscrape/pdf/pdf_utils.py:7-34
(page texts joined with " ", dot runs + whitespace collapsed, stripped).
"""

import zlib

import pytest

from langscrape_ray.kernel.pdf import (
    build_minimal_pdf,
    extract_pdf_text,
    normalize_pdf_text,
)


def test_roundtrip_multipage_flate():
    pdf = build_minimal_pdf(
        [["Doc 5 page 0", "body.. 35"], ["Doc 5 page 1", "body.. 42"]]
    )
    assert pdf.startswith(b"%PDF-1.4")
    assert b"/FlateDecode" in pdf
    assert extract_pdf_text(pdf) == "Doc 5 page 0 body. 35 Doc 5 page 1 body. 42"
    # un-normalized keeps the per-op newlines and the raw dot run
    assert extract_pdf_text(pdf, normalize=False) == (
        "Doc 5 page 0\nbody.. 35 Doc 5 page 1\nbody.. 42"
    )


def test_roundtrip_uncompressed_and_escapes():
    pdf = build_minimal_pdf([["paren (x) and \\ slash"]], compress=False)
    assert b"/FlateDecode" not in pdf
    assert extract_pdf_text(pdf) == "paren (x) and \\ slash"


def test_tj_array_hex_and_quote_ops():
    # TJ array pieces concatenate with no separator (kerned fragments);
    # ' shows a string; <hex> decodes latin-1
    content = b"BT /F1 10 Tf [(Hel) -20 (lo)] TJ (wor) Tj (ld) ' <4142> Tj ET"
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n" + body + b"\nendobj\n%%EOF"
    )
    assert extract_pdf_text(doc) == "Hello wor ld AB"


def test_octal_escape_and_line_continuation():
    content = b"BT (A\\101\\ \nB) Tj ET"  # \101 = 'A'; \<newline> = continuation
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    doc = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 1 >>\nendobj\n2 0 obj\n"
        + body + b"\nendobj\n"
    )
    # no catalog -> document-order fallback over text-bearing streams
    assert extract_pdf_text(doc) == "AA B"


def test_page_order_follows_kids_not_object_order():
    # build two content streams; Kids lists page B (object 5) before
    # page A (object 3), so B's text must come first
    def stream_obj(text: bytes) -> bytes:
        c = b"BT (%s) Tj ET" % text
        return b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c), c)

    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n" + stream_obj(b"second") + b"\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Contents 6 0 R >>\nendobj\n"
        b"6 0 obj\n" + stream_obj(b"first") + b"\nendobj\n%%EOF"
    )
    assert extract_pdf_text(doc) == "first second"


def test_garbage_and_empty_inputs_never_raise():
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(b"not a pdf at all") == ""
    assert extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< broken") == ""
    # corrupt flate stream is skipped, not fatal
    bad = b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /FlateDecode >>\nstream\nXXXX\nendstream\nendobj\n"
    assert extract_pdf_text(bad) == ""


def test_length_aware_slicing_survives_endobj_bytes_in_stream():
    # a compressed payload engineered to contain b"endobj" must not
    # truncate the stream: /Length slicing is binary-safe
    raw = b"BT (safe) Tj ET" + b"\x00endobj\x00" * 3
    comp = zlib.compress(raw)
    # only valid if compression kept the marker; if not, embed raw
    payload, filt = (comp, b" /Filter /FlateDecode") if b"endobj" in comp else (
        raw, b"")
    body = b"<< /Length %d%s >>\nstream\n%s\nendstream" % (
        len(payload), filt, payload)
    doc = b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
    assert extract_pdf_text(doc) == "safe"


def test_normalize_pdf_text():
    assert normalize_pdf_text("  a....b   c\n\nd  ") == "a.b c d"


def test_extract_stage_pdf_branch_uses_real_parser():
    from langscrape_ray.stages.extract import extract_one_pdf

    pdf = build_minimal_pdf([["Real.. report", "line two"]])
    out = extract_one_pdf("https://x.example/a.pdf", pdf)
    assert out["text"] == "Real. report line two"
    assert out["fields"]["article_body"] == ["Real. report line two"]
    assert out["traditional_flag"] == ["pdf"]
    # legacy loose-text payloads still fall back to the plain decode
    out2 = extract_one_pdf(
        "https://x.example/b.pdf", b"%PDF-1.4\nSome   report.... text"
    )
    assert out2["text"] == "Some report. text"


def test_pdf_extract_query_matches_closed_form(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    rdf = entrymod.queries()["pdf_extract"](sf).to_pandas()
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    odf = con.execute(entrymod.oracle_sql()["pdf_extract"]).df()
    import pandas as pd

    a = rdf[sorted(rdf.columns)].sort_values("doc_id").reset_index(drop=True)
    b = odf[sorted(odf.columns)].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
