"""Deterministic summary/collation/validation stage — the data-plane of the
reference's summarizer -> data_collator -> post_processor tail.

Reference semantics:
- 16-key JSON scheme (/root/reference/langscrape/json.py:58-75): title,
  author, publication_date, language, type, media, platform, source,
  reference, summary, event_start_date, event_end_date + 4 tag arrays.
- extract_json_block (/root/reference/langscrape/nodes/data_collator.py:10-43):
  fenced ```json``` block, else first bare {...}, else whole string; {} on
  failure.
- clean_tags (/root/reference/langscrape/nodes/post_processor.py:11-36):
  per tag key, keep only members of the controlled vocabulary (broadcast
  semi-join).
- SchemeValidator (/root/reference/langscrape/json.py:1-56): key-set
  validation both ways, no type checking.
- final record (/root/reference/langscrape/nodes/data_collator.py:46-62):
  {meta_data: {id,url,...}, extraction: {...}, summary: {16 keys}}.

The reference's summarizer is an LLM; this rebuild replaces it with a
deterministic field-derived summary (north rule: deterministic data plane).
The tag vocabularies are pipeline CONFIG (the reference ships ~900 fixed
strings in tags.py; users supply their own) — defaults here are small
deterministic sets used by fixtures and tests.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

SCHEME_KEYS: Tuple[str, ...] = (
    "title",
    "author",
    "publication_date",
    "language",
    "type",
    "media",
    "platform",
    "source",
    "reference",
    "summary",
    "event_start_date",
    "event_end_date",
    "theme_tags",
    "countries_and_organizations_tags",
    "location_tags",
    "figures_tags",
)

TAG_KEYS: Tuple[str, ...] = (
    "theme_tags",
    "countries_and_organizations_tags",
    "location_tags",
    "figures_tags",
)

# default controlled vocabularies (config; fixtures plant these terms)
DEFAULT_VOCABS: Dict[str, frozenset] = {
    "theme_tags": frozenset(
        {"Crawl", "Frontier", "Politeness", "Robots", "Checkpoint", "Shuffle"}
    ),
    "countries_and_organizations_tags": frozenset({"Example Org", "Test Agency"}),
    "location_tags": frozenset({"Example City", "Test Town"}),
    "figures_tags": frozenset({"Jane Crawler", "Bob Spider"}),
}

_FENCED_JSON_RE = re.compile(r"```json\s*(\{.*?\})\s*```", re.DOTALL)
_BARE_JSON_RE = re.compile(r"\{.*\}", re.DOTALL)
_DATE_RE = re.compile(r"\b(\d{4}-\d{2}-\d{2})\b")


_TRAILING_COMMA_RE = re.compile(r",\s*([\]}])")
_SINGLE_QUOTED_RE = re.compile(r"'((?:[^'\\]|\\.)*)'")
_UNQUOTED_KEY_RE = re.compile(r"([{,]\s*)([A-Za-z_][\w-]*)(\s*:)")


def repair_json(src: str) -> str:
    """json_repair-grade tolerance for the common LLM-output defects the
    reference routes through the json_repair package
    (/root/reference/feilian/chains/information_extraction_chain.py:11-23,
    table_agent.py:223,259): trailing commas, single-quoted strings,
    unquoted object keys, Python literal constants.  Purely syntactic
    rewrites — applied only after strict parsing fails."""
    out = _TRAILING_COMMA_RE.sub(r"\1", src)
    out = _UNQUOTED_KEY_RE.sub(lambda m: f'{m.group(1)}"{m.group(2)}"{m.group(3)}', out)

    def _requote(m: re.Match) -> str:
        inner = m.group(1).replace('\\"', '"').replace('"', '\\"')
        inner = inner.replace("\\'", "'")
        return f'"{inner}"'

    out = _SINGLE_QUOTED_RE.sub(_requote, out)
    out = re.sub(r"\bTrue\b", "true", out)
    out = re.sub(r"\bFalse\b", "false", out)
    out = re.sub(r"\bNone\b", "null", out)
    return out


def extract_json_block(text: str) -> dict:
    """Tolerant JSON extraction with the reference's fallback ladder
    (/root/reference/langscrape/nodes/data_collator.py:10-43): fenced
    ```json``` block -> first bare {...} -> whole string -> {}; each
    candidate is retried through repair_json before moving on."""
    if not isinstance(text, str):
        return {}
    m = _FENCED_JSON_RE.search(text)
    candidates = []
    if m:
        candidates.append(m.group(1))
    m = _BARE_JSON_RE.search(text)
    if m:
        candidates.append(m.group(0))
    candidates.append(text)
    for cand in candidates:
        for attempt in (cand, repair_json(cand)):
            try:
                out = json.loads(attempt)
                if isinstance(out, dict):
                    return out
            except (json.JSONDecodeError, ValueError):
                continue
    return {}


def clean_tags(
    summary: Dict[str, Any], vocabs: Optional[Mapping[str, frozenset]] = None
) -> Dict[str, Any]:
    """Per tag-array key, keep only members of the controlled vocabulary
    (/root/reference/langscrape/nodes/post_processor.py:11-36 semantics —
    a broadcast semi-join against a frozenset)."""
    vocabs = vocabs or DEFAULT_VOCABS
    out = dict(summary)
    for key in TAG_KEYS:
        allowed = vocabs.get(key, frozenset())
        vals = out.get(key)
        if isinstance(vals, list):
            out[key] = [t for t in vals if t in allowed]
        else:
            out[key] = []
    return out


def validate_scheme(data: Mapping[str, Any]) -> Tuple[bool, Dict[str, Any]]:
    """Key-set validation both ways — no type checking, exactly like the
    reference (/root/reference/langscrape/json.py:21-56)."""
    data_keys = set(data.keys())
    scheme_keys = set(SCHEME_KEYS)
    report = {
        "all_data_keys_in_scheme": data_keys.issubset(scheme_keys),
        "all_scheme_keys_in_data": scheme_keys.issubset(data_keys),
        "keys_to_remove": sorted(data_keys - scheme_keys),
        "keys_missing": sorted(scheme_keys - data_keys),
    }
    is_valid = report["all_data_keys_in_scheme"] and report["all_scheme_keys_in_data"]
    return is_valid, report


def _first(values: List[str]) -> str:
    for v in values:
        if v and not v.startswith("(") and not v.startswith(("Error:", "Skipped:")):
            return v
    return ""


def build_summary(
    url: str,
    host: str,
    fields: Mapping[str, List[str]],
    text: str,
    lang: str = "",
    vocabs: Optional[Mapping[str, frozenset]] = None,
) -> Dict[str, Any]:
    """Deterministic 16-key summary from extracted fields (replaces the
    reference's LLM summarizer; same output schema).

    - summary = first sentence-ish slice of the article text
    - publication/event dates parsed from the datetime field (YYYY-MM-DD)
    - platform = host; source defaults to platform (json.py scheme note)
    - tag arrays = vocabulary terms that literally appear in the text
      (deterministic stand-in for the model's tagging, then clean_tags)
    """
    vocabs = vocabs or DEFAULT_VOCABS
    title = _first(fields.get("title", []))
    author = _first(fields.get("author", []))
    dt = _first(fields.get("datetime", []))
    m = _DATE_RE.search(dt or "")
    date = m.group(1) if m else ""
    first_line = text.split("\n", 1)[0] if text else ""
    summary_sentence = first_line[:200]

    candidate_tags = {
        key: sorted(t for t in vocabs.get(key, frozenset()) if t.lower() in text.lower())
        for key in TAG_KEYS
    }
    out: Dict[str, Any] = {
        "title": title,
        "author": author,
        "publication_date": date,
        "language": lang or "",
        "type": "article",
        "media": "text",
        "platform": host,
        "source": host,
        "reference": url,
        "summary": summary_sentence,
        "event_start_date": date,
        "event_end_date": date,
        **candidate_tags,
    }
    return clean_tags(out, vocabs)


def collate_record(
    url: str,
    doc_id: str,
    fields: Mapping[str, List[str]],
    summary: Mapping[str, Any],
    traditional_flag: List[str],
) -> Dict[str, Any]:
    """Assemble the final nested document record
    (/root/reference/langscrape/nodes/data_collator.py:46-62 +
    post_processor.py:95-103 shape)."""
    is_valid, report = validate_scheme(summary)
    return {
        "meta_data": {
            "id": doc_id,
            "url": url,
            "is_valid_scheme": is_valid,
            "validation_report": report,
            "traditional_flag": list(traditional_flag),
        },
        "extraction": {k: list(v) for k, v in fields.items()},
        "summary": dict(summary),
    }
