"""The extraction stage: (url, html) Arrow batches -> text/fields/outlinks.

Replaces the reference's per-URL sequential url_handler -> extraction ->
feature_binder chain (/root/reference/langscrape/nodes/url_handler.py:28-46,
feature_binder.py:32-67) with one vectorized Ray Data stage.  Used as a
callable CLASS in ``map_batches(ExtractPages, concurrency=N)`` so per-host
rule lookups and compiled state are built once per actor, per the actor-pool
pattern (SURVEY.md §2.3).

Output schema (html column is dropped — project early, SURVEY.md §7.3
"keep raw html out of post-extract stages"):
  url, host, text, article_body/title/author/datetime: list<string>,
  traditional_flag: list<string>, used_fallback: bool, n_outlinks: int32,
  outlinks: list<string>, cleaned_len: int32, too_short: bool
plus any pass-through metadata columns present in the input batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from langscrape_ray.frontier.canonical import canonicalize_url
from langscrape_ray.kernel.clean import cleaned_tree
from langscrape_ray.kernel.dom import parse_html
from langscrape_ray.kernel.extract import (
    MIN_HTML_LENGTH,
    extract_by_xpath_map,
    extract_outlinks,
    fallback_fields,
    html_to_text,
)
from langscrape_ray.kernel.textops import normalize_lines

FIELDS = ("article_body", "title", "author", "datetime")


def is_pdf_url(url: str) -> bool:
    """Reference M2 predicate (/root/reference/langscrape/nodes/
    url_handler.py:25-26): suffix test on the lowered url."""
    return url.lower().endswith(".pdf")


def extract_one_pdf(url: str, data: bytes) -> dict:
    """PDF branch (S5/M14): the reference downloads bytes and extracts page
    text with pymupdf, then normalizes (collapse dots + whitespace,
    /root/reference/langscrape/pdf/pdf_utils.py:7-34).  Structured PDFs
    (COS objects present) go through the REAL text-object extractor
    (kernel/pdf.py: page tree -> FlateDecode streams -> Tj/TJ ops; pymupdf
    preferred when importable).  Payloads that merely carry a %PDF magic
    with loose text after it (legacy test fixtures, truncated fetches)
    fall back to the plain-text decode so the branch still yields the
    normalized body instead of nothing.
    """
    from langscrape_ray.kernel.dom import decode_html_bytes
    from langscrape_ray.kernel.pdf import extract_pdf_text
    from langscrape_ray.kernel.textops import collapse_dots

    raw = bytes(data or b"")
    if b" obj" in raw or b"\nobj" in raw or b"stream" in raw:
        text = extract_pdf_text(raw)
    else:
        if raw.startswith(b"%PDF"):
            raw = raw.split(b"\n", 1)[1] if b"\n" in raw else b""
        text = collapse_dots(decode_html_bytes(raw))
    fields = {f: ["(Empty Result)"] for f in FIELDS}
    if text:
        fields["article_body"] = [text]
    return {
        "text": text,
        "fields": fields,
        "traditional_flag": ["pdf"],
        "outlinks": [],
        "cleaned_len": len(text),
        "too_short": len(text) < MIN_HTML_LENGTH,
    }


def extract_one(url: str, html: bytes, rules: Dict[str, dict]) -> dict:
    """Full per-page extraction (kernel-only; shared by stage and oracle).

    Pipeline per the reference lifecycle (SURVEY.md §3.1 steps 2-4):
    parse raw DOM (outlinks + fallback source) -> clean -> serialize ->
    collapse whitespace -> re-parse -> xpath-map extract -> fallbacks ->
    html-to-text + per-line normalize (the byte-identical ``text``).
    """
    raw_root = parse_html(html)
    outlinks = extract_outlinks(raw_root, url)

    # ONE parse per page: the cleaned tree is a deep copy of the raw DOM
    # with in-tree whitespace collapse (kernel/clean.py:cleaned_tree) —
    # observably identical to the reference's serialize/collapse/re-parse
    # round trip, ~2x faster.
    cleaned_root = cleaned_tree(raw_root)
    # length-only serialization: the M3 gate needs len(serialize()), not
    # the string (invariant pinned in tests/test_kernel.py)
    cleaned_len = cleaned_root.serialized_len()
    too_short = cleaned_len < MIN_HTML_LENGTH

    fields = extract_by_xpath_map(cleaned_root, rules)
    fields, flags = fallback_fields(raw_root, fields)

    # batched per-page normalize (== per-line normalize_text; newline-local
    # ops, differential-tested in tests/test_kernel.py)
    text_lines = normalize_lines(html_to_text(cleaned_root))
    text = "\n".join(ln for ln in text_lines if ln)

    return {
        "text": text,
        "fields": {f: fields.get(f, []) for f in FIELDS},
        "traditional_flag": flags,
        "outlinks": outlinks,
        "cleaned_len": cleaned_len,
        "too_short": too_short,
    }


class ExtractPages:
    """Actor-pool batch UDF.  ``rules_by_host`` maps host -> field_state;
    ``default_rules`` covers unknown hosts.  Both are plain dicts captured in
    the closure (broadcast-once semantics: Ray serializes the class args once
    per actor, not per batch)."""

    def __init__(
        self,
        default_rules: Dict[str, dict],
        rules_by_host: Optional[Dict[str, Dict[str, dict]]] = None,
        keep_html: bool = False,
        post_udfs: Optional[list] = None,
    ):
        self.default_rules = default_rules
        self.rules_by_host = rules_by_host or {}
        self.keep_html = keep_html
        # §2.11 extension surface: registered-by-name (or direct callable)
        # batch UDFs applied to each extracted batch — resolved ONCE per
        # actor here, not per batch
        if post_udfs:
            from langscrape_ray.stages.udf import resolve_udfs

            self.post_udfs = resolve_udfs(post_udfs)
        else:
            self.post_udfs = []

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        hosts: List[str] = []
        texts, flags_col, outlinks_col = [], [], []
        cleaned_lens, too_shorts = [], []
        field_cols: Dict[str, List[List[str]]] = {f: [] for f in FIELDS}
        for url, html in zip(urls, htmls):
            res = canonicalize_url(url)
            host = res[1] if res else ""
            hosts.append(host)
            if is_pdf_url(url):
                out = extract_one_pdf(url, html)
            else:
                rules = self.rules_by_host.get(host, self.default_rules)
                out = extract_one(url, html, rules)
            texts.append(out["text"])
            for f in FIELDS:
                field_cols[f].append(out["fields"][f])
            flags_col.append(out["traditional_flag"])
            outlinks_col.append(out["outlinks"])
            cleaned_lens.append(out["cleaned_len"])
            too_shorts.append(out["too_short"])

        cols = {name: batch[name] for name in batch.column_names if name != "html"}
        if self.keep_html:
            cols["html"] = batch["html"]
        cols["host"] = pa.array(hosts, pa.string())
        cols["text"] = pa.array(texts, pa.string())
        for f in FIELDS:
            cols[f] = pa.array(field_cols[f], pa.list_(pa.string()))
        cols["traditional_flag"] = pa.array(flags_col, pa.list_(pa.string()))
        cols["used_fallback"] = pa.array(
            [len(f) > 0 for f in flags_col], pa.bool_()
        )
        cols["n_outlinks"] = pa.array([len(o) for o in outlinks_col], pa.int32())
        cols["outlinks"] = pa.array(outlinks_col, pa.list_(pa.string()))
        cols["cleaned_len"] = pa.array(cleaned_lens, pa.int32())
        cols["too_short"] = pa.array(too_shorts, pa.bool_())
        out = pa.table(cols)
        for fn in self.post_udfs:
            out = fn(out)
        return out


class SummarizeRecords:
    """Stage: extracted rows -> final nested document records.

    The reference tail (summarizer -> data_collator -> post_processor,
    SURVEY.md §3.1 steps 5-7) with the LLM summarizer replaced by the
    deterministic kernel summary (kernel/summary.py).  Output adds:
    summary_json (the 16-key scheme as JSON), record_json (the full
    {meta_data, extraction, summary} document), is_valid_scheme.
    Nested structs are serialized to JSON strings for parquet/driver
    friendliness (pa.struct columns work too; strings keep the driver's
    value-hash simple)."""

    def __init__(self, vocabs: Optional[Dict[str, frozenset]] = None):
        self.vocabs = vocabs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import json as _json

        from langscrape_ray.kernel.summary import build_summary, collate_record

        summaries, records, valids = [], [], []
        for i in range(batch.num_rows):
            url = batch["url"][i].as_py()
            host = batch["host"][i].as_py() if "host" in batch.column_names else ""
            fields = {f: batch[f][i].as_py() for f in FIELDS}
            text = batch["text"][i].as_py()
            flags = (
                batch["traditional_flag"][i].as_py()
                if "traditional_flag" in batch.column_names
                else []
            )
            summary = build_summary(url, host, fields, text, vocabs=self.vocabs)
            doc_id = hashlib.md5(url.encode()).hexdigest()
            record = collate_record(url, doc_id, fields, summary, flags)
            summaries.append(_json.dumps(summary, sort_keys=True))
            records.append(_json.dumps(record, sort_keys=True))
            valids.append(bool(record["meta_data"]["is_valid_scheme"]))
        cols = {n: batch[n] for n in batch.column_names}
        cols["summary_json"] = pa.array(summaries, pa.string())
        cols["record_json"] = pa.array(records, pa.string())
        cols["is_valid_scheme"] = pa.array(valids, pa.bool_())
        return pa.table(cols)
