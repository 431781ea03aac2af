"""S11: nested-JSON <-> flat-column ETL over record tables.

Reference analog: the xlsx<->json notebooks
(/root/reference/notebooks/json_to_xlsx.ipynb, xlsx_to_jsonl.ipynb) map the
nested final-record shape ``{meta_data: {...}, summary: {...}}``
(/root/reference/langscrape/nodes/data_collator.py:46-62) to flat
spreadsheet columns (``meta_data.id``, ``summary.title``, ...) and back.
The mapping semantics — dotted-path flattening and its inverse — are the
real ETL; round 3 adds the real BINARY format too: ``xlsx_roundtrip``
pushes every flat batch through genuine xlsx bytes (stdlib zip+XML codec
in ``sources/xlsx.py`` — no openpyxl needed) and parses them back.

All stages are stateless ``map_batches``: per-row json loads/dumps is the
unavoidable per-record work (the reference does the same row-wise in
pandas); nothing shuffles and nothing lands on the driver.
"""

from __future__ import annotations

import json
from typing import Dict, List

import pyarrow as pa
import ray.data as rd


def _read_docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def build_records(sf_dir: str) -> rd.Dataset:
    """(doc_id, rec_json): serialize each document row into the reference's
    nested record shape — the 'collated record' a crawl emits."""

    def fn(t: pa.Table) -> pa.Table:
        recs = []
        for did, lang, source, n_chars in zip(
            t["doc_id"].to_pylist(),
            t["lang"].to_pylist(),
            t["source"].to_pylist(),
            t["n_chars"].to_pylist(),
        ):
            recs.append(
                json.dumps(
                    {
                        "meta_data": {
                            "id": str(did),
                            "lang": lang,
                            "source": source,
                        },
                        "summary": {
                            "title": f"Doc {did}",
                            "n_chars": int(n_chars),
                        },
                    },
                    sort_keys=True,
                )
            )
        return pa.table(
            {"doc_id": t["doc_id"], "rec_json": pa.array(recs, pa.string())}
        )

    return _read_docs(sf_dir, ["doc_id", "lang", "source", "n_chars"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _flatten(obj: Dict, prefix: str = "") -> Dict[str, object]:
    out: Dict[str, object] = {}
    for k, v in obj.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


# the fixed record schema: dotted JSON path -> flat column name (dots are
# SQL-hostile, so flat columns use underscores like the reference
# spreadsheets' header row)
RECORD_COLUMNS = {
    "meta_data.id": "meta_id",
    "meta_data.lang": "meta_lang",
    "meta_data.source": "meta_source",
    "summary.title": "sum_title",
    "summary.n_chars": "sum_n_chars",
}


def json_etl_flatten(sf_dir: str) -> rd.Dataset:
    """The json->xlsx direction: parse each nested record and emit one flat
    column per dotted path.  Output column order is stable (doc_id first,
    then RECORD_COLUMNS order)."""

    def fn(t: pa.Table) -> pa.Table:
        cols: Dict[str, List] = {c: [] for c in RECORD_COLUMNS.values()}
        for s in t["rec_json"].to_pylist():
            flat = _flatten(json.loads(s))
            for path, col in RECORD_COLUMNS.items():
                cols[col].append(flat.get(path))
        arrays = {"doc_id": t["doc_id"]}
        for path, col in RECORD_COLUMNS.items():
            typ = pa.int64() if col == "sum_n_chars" else pa.string()
            arrays[col] = pa.array(cols[col], typ)
        return pa.table(arrays)

    return build_records(sf_dir).map_batches(fn, batch_format="pyarrow")


def xlsx_roundtrip(sf_dir: str) -> rd.Dataset:
    """The FULL spreadsheet ETL with the real binary format: nested JSON
    records -> flat columns -> genuine xlsx bytes (zip of OOXML parts,
    stdlib codec) -> parsed back to flat columns.  Output is identical to
    ``json_etl_flatten`` (same SQL oracle), so the driver hash proves the
    xlsx encode/decode is lossless for the record schema.

    Scale notes: each batch becomes ONE in-memory workbook on a worker —
    the spreadsheet stage is embarrassingly parallel and never touches the
    driver; batch_size bounds workbook size (xlsx XML is ~10x the cell
    payload before deflate)."""
    from langscrape_ray.sources.xlsx import read_xlsx_bytes, xlsx_bytes

    def via_xlsx(t: pa.Table) -> pa.Table:
        out = read_xlsx_bytes(xlsx_bytes(t))
        # xlsx numerics are untyped: re-pin the record schema's int columns
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "meta_id": out["meta_id"].cast(pa.string()),
                "meta_lang": out["meta_lang"].cast(pa.string()),
                "meta_source": out["meta_source"].cast(pa.string()),
                "sum_title": out["sum_title"].cast(pa.string()),
                "sum_n_chars": out["sum_n_chars"].cast(pa.int64()),
            }
        )

    return json_etl_flatten(sf_dir).map_batches(
        via_xlsx, batch_format="pyarrow", batch_size=512
    )


def json_etl_nest(flat: rd.Dataset) -> rd.Dataset:
    """The xlsx->jsonl direction: rebuild the nested record from flat
    columns.  Inverse of json_etl_flatten (round-trip asserted in tests)."""

    def fn(t: pa.Table) -> pa.Table:
        recs = []
        rows = t.to_pylist()
        for row in rows:
            obj: Dict = {}
            for path, col in RECORD_COLUMNS.items():
                cur = obj
                parts = path.split(".")
                for p in parts[:-1]:
                    cur = cur.setdefault(p, {})
                cur[parts[-1]] = row[col]
            recs.append(json.dumps(obj, sort_keys=True))
        return pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "rec_json": pa.array(recs, pa.string()),
            }
        )

    return flat.map_batches(fn, batch_format="pyarrow")


def warc_roundtrip(sf_dir: str) -> rd.Dataset:
    """Pages through the REAL archive format: each batch of documents
    becomes Common-Crawl-layout WARC bytes (one gzip member per response
    record, ``sources/warc.py``) and is parsed straight back; output is
    closed-form over the documents table, so the driver hash proves the
    WARC encode/decode lossless for (url, timestamp, payload bytes).

    Row rule (deterministic, SQL-mirrorable): url =
    ``https://w{doc_id % 97}.example.com/doc/{doc_id}``, warc_ts =
    2024-01-01T00:00:00Z + doc_id seconds (WARC dates have second
    granularity — the contract timestamp unit), payload = the document
    text utf-8 encoded.  Output (url, warc_ts, n_bytes, payload_md5).

    Scale notes: each batch is ONE in-memory WARC blob on a worker —
    embarrassingly parallel, never on the driver; gzip member framing
    means a real corpus written this way is byte-compatible with Common
    Crawl tooling.  Reference analog: none (input-format surface)."""
    import hashlib
    from datetime import datetime, timezone

    from langscrape_ray.sources.warc import read_warc_bytes, warc_bytes

    epoch_us = int(
        datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000
    )

    def via_warc(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        pages = pa.table(
            {
                "url": pa.array(
                    [
                        f"https://w{d % 97}.example.com/doc/{d}"
                        for d in doc_ids
                    ],
                    pa.string(),
                ),
                "warc_ts": pa.array(
                    [epoch_us + d * 1_000_000 for d in doc_ids],
                    pa.timestamp("us"),
                ),
                "html": pa.array(
                    [x.encode("utf-8") for x in texts], pa.binary()
                ),
            }
        )
        back = read_warc_bytes(warc_bytes(pages))
        payloads = back["html"].to_pylist()
        return pa.table(
            {
                "url": back["url"],
                "warc_ts": back["warc_ts"],
                "n_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads],
                    pa.string(),
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        via_warc, batch_format="pyarrow", batch_size=512
    )


def charset_roundtrip(sf_dir: str) -> rd.Dataset:
    """Documents through the REAL charset-sniffing decode path: each row
    is rendered to html BYTES in one of six deterministic encodings (meta
    declarations, BOMs, and an undeclared-latin-1 "lying page"), then
    decoded by the actual kernel (``sniff_charset`` +
    ``decode_html_bytes`` — the html:binary ingestion contract).  Output
    is closed-form over documents, so the driver hash proves the
    distributed sniff+decode recovered every page byte-exactly.

    Case rule (doc_id % 6): 0 = meta utf-8; 1 = meta windows-1251 with a
    Cyrillic marker; 2 = meta Shift_JIS with a katakana marker; 3 =
    utf-16 BOM (no declaration); 4 = utf-8 BOM; 5 = undeclared latin-1
    bytes with an accented marker (invalid utf-8 -> fallback path).
    Output (doc_id, enc_case, codec, src, decoded_md5) where codec/src
    are the sniff result and decoded_md5 = md5(utf-8(decoded html)) —
    reconstructible in SQL because decode is lossless in every case.

    Scale notes: stateless vectorized-enough map_batches (the per-row
    encode IS the workload being proven), no shuffle, embarrassingly
    parallel.  Reference analog: requests/BeautifulSoup implicit
    sniffing (langscrape/browser/request.py) — here pinned deterministic
    and distributed."""
    import hashlib

    from langscrape_ray.kernel.dom import decode_html_bytes, sniff_charset

    META = {
        0: '<meta charset="utf-8">',
        1: '<meta charset="windows-1251">',
        2: '<meta http-equiv="Content-Type" '
           'content="text/html; charset=Shift_JIS">',
        3: "", 4: "", 5: "",
    }
    MARK = {0: "", 1: " Привет", 2: " テスト", 3: " Привет", 4: " café",
            5: " café"}
    CODEC = {0: "utf-8", 1: "cp1251", 2: "shift_jis", 3: "utf-16",
             4: "utf-8-sig", 5: "latin-1"}

    def via_bytes(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        cases, codecs, srcs, md5s = [], [], [], []
        for d, x in zip(doc_ids, texts):
            c = d % 6
            html = (f"<html><head>{META[c]}</head>"
                    f"<body>{x}{MARK[c]}</body></html>")
            if c == 4:
                raw = b"\xef\xbb\xbf" + html.encode("utf-8")
            else:
                raw = html.encode(CODEC[c])
            codec, src = sniff_charset(raw)
            decoded = decode_html_bytes(raw)
            cases.append(c)
            codecs.append(codec)
            srcs.append(src)
            md5s.append(hashlib.md5(decoded.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "enc_case": pa.array(cases, pa.int64()),
                "codec": pa.array(codecs, pa.string()),
                "src": pa.array(srcs, pa.string()),
                "decoded_md5": pa.array(md5s, pa.string()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,  # fan out the six-codec encode/decode
    ).map_batches(via_bytes, batch_format="pyarrow", batch_size=512)
