"""Minimal deterministic PDF text extraction (S5).

Reference semantics: /root/reference/langscrape/pdf/pdf_utils.py:7-34 —
open the byte stream with pymupdf, join page texts with " ", then
normalize (collapse dot runs, collapse whitespace, strip).  pymupdf is not
installed in this container, so ``extract_pdf_text`` implements a minimal
text-object parser over the PDF COS structure itself:

  objects (``N 0 obj … endobj``, /Length-aware stream slicing)
    -> page order from the catalog's /Pages -> /Kids tree
    -> per-page /Contents streams (FlateDecode via stdlib zlib, or raw)
    -> text-showing operators inside the stream: ``(s) Tj``, ``(s) '``,
       ``(s) "``, ``[(a) -250 (b)] TJ`` — literal strings with the full
       escape set (\\n \\r \\t \\b \\f \\( \\) \\\\ \\ddd, line
       continuations, balanced parens) and <hex> strings.

When pymupdf IS importable it is preferred (import-guarded), matching the
reference path bit-for-bit on the fixture corpus (plain Latin text, one
font).  Scope: simple text PDFs — no CID/Type0 composite-font decoding, no
encryption; out-of-scope inputs yield whatever plain strings their streams
carry (never an exception).

``build_minimal_pdf`` is the deterministic fixture writer (real xref +
FlateDecode content streams) used by the oracled ``pdf_extract`` query and
the kernel tests.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional

from langscrape_ray.kernel.textops import collapse_dots

try:  # optional dependency, absent in this container
    import pymupdf as _pymupdf  # type: ignore
except ImportError:
    try:
        import fitz as _pymupdf  # type: ignore
    except ImportError:
        _pymupdf = None

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)+)\s*\])")


def normalize_pdf_text(text: str) -> str:
    """The reference's text_normalizer (pdf_utils.py:11-14): collapse dot
    runs, then any whitespace run to one space, then strip — exactly what
    kernel/textops.collapse_dots already implements."""
    return collapse_dots(text)


def _split_objects(data: bytes) -> Dict[int, bytes]:
    """object number -> object body (between ``obj`` and ``endobj``).

    Stream payloads are sliced by /Length when present (binary-safe: a
    compressed stream may contain ``endobj`` bytes), else up to the next
    ``endstream``."""
    objs: Dict[int, bytes] = {}
    for m in _OBJ_HEAD_RE.finditer(data):
        num = int(m.group(1))
        if num in objs:
            continue
        start = m.end()
        stream_at = data.find(b"stream", start)
        endobj_at = data.find(b"endobj", start)
        if endobj_at == -1:
            endobj_at = len(data)
        if stream_at != -1 and stream_at < endobj_at:
            lm = _LENGTH_RE.search(data, start, stream_at)
            body_start = stream_at + len(b"stream")
            if data[body_start : body_start + 2] == b"\r\n":
                body_start += 2
            elif data[body_start : body_start + 1] == b"\n":
                body_start += 1
            if lm:
                body_end = body_start + int(lm.group(1))
            else:
                body_end = data.find(b"endstream", body_start)
                if body_end == -1:
                    body_end = len(data)
            endobj_at = data.find(b"endobj", body_end)
            if endobj_at == -1:
                endobj_at = len(data)
            objs[num] = data[start:endobj_at]
        else:
            objs[num] = data[start:endobj_at]
    return objs


def _stream_payload(body: bytes) -> Optional[bytes]:
    """Decoded stream bytes of an object body, or None if no stream."""
    at = body.find(b"stream")
    if at == -1:
        return None
    start = at + len(b"stream")
    if body[start : start + 2] == b"\r\n":
        start += 2
    elif body[start : start + 1] == b"\n":
        start += 1
    lm = _LENGTH_RE.search(body, 0, at)
    if lm:
        payload = body[start : start + int(lm.group(1))]
    else:
        end = body.find(b"endstream", start)
        payload = body[start : end if end != -1 else len(body)]
    if b"/FlateDecode" in body[:at]:
        try:
            return zlib.decompress(payload)
        except zlib.error:
            return None
    return payload


_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _read_literal(data: bytes, i: int):
    """Parse a ``(...)`` literal string starting at index i (the '(').
    Returns (decoded_str, index past the closing paren)."""
    depth = 1
    i += 1
    out: List[str] = []
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                digits = chr(e)
                i += 1
                while i < n and len(digits) < 3 and 0x30 <= data[i] <= 0x37:
                    digits += chr(data[i])
                    i += 1
                out.append(chr(int(digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _read_hex(data: bytes, i: int):
    """Parse a ``<...>`` hex string at index i (the '<')."""
    end = data.find(b">", i + 1)
    if end == -1:
        end = len(data)
    hx = re.sub(rb"\s+", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), end + 1
    except ValueError:
        return "", end + 1


def _content_texts(stream: bytes) -> List[str]:
    """Text runs shown by one content stream, in operator order.

    One output element per show op (Tj / ' / "); a TJ array's string
    pieces concatenate with no separator (they are kerned fragments of
    one run).  Positioning ops are ignored — the reference normalizer
    collapses all whitespace anyway."""
    out: List[str] = []
    pending: List[str] = []       # strings since the last operator
    in_array = False
    array_buf: List[str] = []
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            s, i = _read_literal(stream, i)
            (array_buf if in_array else pending).append(s)
        elif c == 0x3C and not (i + 1 < n and stream[i + 1] == 0x3C):  # < not <<
            s, i = _read_hex(stream, i)
            (array_buf if in_array else pending).append(s)
        elif c == 0x5B:  # [
            in_array = True
            array_buf = []
            i += 1
        elif c == 0x5D:  # ]
            in_array = False
            pending.append("".join(array_buf))
            i += 1
        elif c == 0x27:  # ' operator
            if pending:
                out.append(pending[-1])
            pending = []
            i += 1
        elif c == 0x22:  # " operator (two numeric args precede the string)
            if pending:
                out.append(pending[-1])
            pending = []
            i += 1
        elif 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A:  # operator token
            j = i
            while j < n and (0x41 <= stream[j] <= 0x5A or 0x61 <= stream[j] <= 0x7A
                             or stream[j] == 0x2A):
                j += 1
            op = stream[i:j]
            if op in (b"Tj", b"TJ"):
                if pending:
                    out.append(pending[-1])
            pending = [] if op not in (b"Tf",) else pending
            i = j
        else:
            i += 1
    return out


def _page_stream_order(data: bytes, objs: Dict[int, bytes]) -> List[bytes]:
    """Content streams in page-tree order; document order as fallback."""
    streams: List[bytes] = []
    catalog = next(
        (b for b in objs.values() if re.search(rb"/Type\s*/Catalog", b)), None
    )
    if catalog is not None:
        pm = _PAGES_REF_RE.search(catalog)
        pages = objs.get(int(pm.group(1))) if pm else None
        if pages is not None:
            km = _KIDS_RE.search(pages)
            if km:
                for ref in _REF_RE.finditer(km.group(1)):
                    page = objs.get(int(ref.group(1)))
                    if page is None:
                        continue
                    cm = _CONTENTS_RE.search(page)
                    if not cm:
                        continue
                    content_refs = (
                        [cm.group(1)] if cm.group(1)
                        else [r.group(1) for r in _REF_RE.finditer(cm.group(2))]
                    )
                    for cr in content_refs:
                        body = objs.get(int(cr))
                        payload = _stream_payload(body) if body else None
                        if payload is not None:
                            streams.append(payload)
                if streams:
                    return streams
    # fallback: every stream that shows text, in document order
    for _num, body in sorted(objs.items()):
        payload = _stream_payload(body)
        if payload is not None and (b"Tj" in payload or b"TJ" in payload):
            streams.append(payload)
    return streams


def extract_pdf_text(data: bytes, normalize: bool = True) -> str:
    """PDF bytes -> extracted text (reference pdfurl_to_text semantics:
    page texts joined with " ", then normalized)."""
    raw = bytes(data or b"")
    if _pymupdf is not None:
        try:
            doc = _pymupdf.open(stream=raw, filetype="pdf")
            text = " ".join(p.get_text() for p in doc)
            return normalize_pdf_text(text) if normalize else text
        except Exception:
            pass  # fall through to the minimal parser
    objs = _split_objects(raw)
    page_texts: List[str] = []
    for stream in _page_stream_order(raw, objs):
        page_texts.append("\n".join(_content_texts(stream)))
    text = " ".join(page_texts)
    return normalize_pdf_text(text) if normalize else text


def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_minimal_pdf(pages: List[List[str]], compress: bool = True) -> bytes:
    """Deterministic single-font PDF writer: one content stream per page,
    one ``Tj`` show op per line, real xref + trailer.  ``pages`` is a list
    of line lists.  Fixture-grade but structurally valid — pdf.js/pymupdf
    open it; ``extract_pdf_text`` round-trips it exactly."""
    objects: List[bytes] = []
    n_pages = len(pages)
    page_obj_first = 3  # 1=catalog, 2=pages, then page/content pairs, last=font
    font_obj = page_obj_first + 2 * n_pages
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{page_obj_first + 2 * p} 0 R" for p in range(n_pages))
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for p, lines in enumerate(pages):
        page_num = page_obj_first + 2 * p
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for k, line in enumerate(lines):
            if k:
                ops.append("0 -14 Td")
            ops.append(f"({_escape_literal(line)}) Tj")
        ops.append("ET")
        content = "\n".join(ops).encode("latin-1")
        if compress:
            content = zlib.compress(content, 6)
            head = f"<< /Length {len(content)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(content)} >>"
        objects.append(head.encode() + b"\nstream\n" + content + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for idx, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{idx} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)
