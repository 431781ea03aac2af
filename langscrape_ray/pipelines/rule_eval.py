"""Offline rule evaluation + ranking (SURVEY.md §2.5 A2/A3) — the data-plane
of feilian's xpath-rule mining feedback loop, Ray-Data-first.

Reference semantics:
- eval_array membership TP/FP/FN with unescape+strip normalization
  (/root/reference/feilian/agents/fragments_agent.py:145-184): predicted
  and ground-truth value LISTS compared as multisets of normalized strings.
- per-field P/R/F1 accumulated over pages then ranked per candidate xpath:
  sort by (f1, n_extracted) desc, take top-1 per field
  (/root/reference/feilian/agents/fragments_agent.py:187-236).

Ray shape: per-page counts are computed vectorized in map_batches (partial
aggregation), then ONE small groupby((field, xpath)).sum -> finalize P/R/F1
-> grouped top-1.  The shuffle carries only count rows, never page data.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from langscrape_ray.kernel.extract import extract_by_xpath_map
from langscrape_ray.kernel.textops import normalize_text


def eval_array(predicted: Sequence[str], truth: Sequence[str]) -> Dict[str, int]:
    """Multiset membership TP/FP/FN with normalization (reference
    eval_array semantics)."""
    p = Counter(normalize_text(x) for x in predicted if x is not None)
    t = Counter(normalize_text(x) for x in truth if x is not None)
    p.pop("", None)
    t.pop("", None)
    tp = sum(min(p[k], t[k]) for k in p.keys() & t.keys())
    fp = sum(p.values()) - tp
    fn = sum(t.values()) - tp
    return {"tp": tp, "fp": fp, "fn": fn}


def _prf(tp: int, fp: int, fn: int) -> Dict[str, float]:
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (
        2 * precision * recall / (precision + recall) if precision + recall else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1}


def evaluate_candidates(
    pages: rd.Dataset,
    candidates: Dict[str, List[str]],
    truth_col_of: Dict[str, str],
    operator_plan: List[Dict] | None = None,
) -> pd.DataFrame:
    """Score every (field, candidate_xpath) against ground-truth columns.

    pages: Dataset with columns ``html`` (binary) plus one truth column per
    field (list<string>).  candidates: field -> list of candidate xpaths.
    operator_plan: optional F6 PRUNE/EXTRACT plan replayed on each page's
    DOM before scoring — the reference applies mined operator plans to
    snippets ahead of extraction (/root/reference/feilian/agents/
    fragments_detection.py:73-92 run_operators).
    Returns per-(field, xpath) summed tp/fp/fn + n_extracted + P/R/F1.
    """
    cand_items = [
        (field, xp) for field, xps in sorted(candidates.items()) for xp in xps
    ]

    def score_batch(batch: pa.Table) -> pa.Table:
        from langscrape_ray.kernel.dom import parse_html
        from langscrape_ray.kernel.structure import run_operators

        rows = {"field_name": [], "xpath": [], "tp": [], "fp": [], "fn": [],
                "n_extracted": []}
        for i in range(batch.num_rows):
            root = parse_html(batch["html"][i].as_py())
            if operator_plan:
                run_operators(root, operator_plan)
            for field, xp in cand_items:
                pred = extract_by_xpath_map(
                    root, {field: {"strategy": "xpath_extractor", "xpath": xp}}
                )[field]
                pred = [
                    v for v in pred
                    if not v.startswith(("(", "Error:", "Skipped:"))
                ]
                truth = batch[truth_col_of[field]][i].as_py() or []
                c = eval_array(pred, truth)
                rows["field_name"].append(field)
                rows["xpath"].append(xp)
                rows["tp"].append(c["tp"])
                rows["fp"].append(c["fp"])
                rows["fn"].append(c["fn"])
                rows["n_extracted"].append(len(pred))
        return pa.table(
            {
                "field_name": pa.array(rows["field_name"], pa.string()),
                "xpath": pa.array(rows["xpath"], pa.string()),
                "tp": pa.array(rows["tp"], pa.int64()),
                "fp": pa.array(rows["fp"], pa.int64()),
                "fn": pa.array(rows["fn"], pa.int64()),
                "n_extracted": pa.array(rows["n_extracted"], pa.int64()),
            }
        )

    agg = (
        pages.map_batches(score_batch, batch_format="pyarrow", batch_size=32)
        .groupby(["field_name", "xpath"])
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
            Sum("n_extracted", alias_name="n_extracted"),
        )
        .to_pandas()
    )
    scores = agg.apply(
        lambda r: pd.Series(_prf(int(r["tp"]), int(r["fp"]), int(r["fn"]))), axis=1
    )
    return pd.concat([agg, scores], axis=1)


def rank_best_xpath(scored: pd.DataFrame) -> pd.DataFrame:
    """Top-1 xpath per field by (f1, n_extracted) desc with xpath as the
    deterministic tie-break (reference A3 ranking,
    fragments_agent.py:225-229)."""
    ordered = scored.sort_values(
        ["field_name", "f1", "n_extracted", "xpath"],
        ascending=[True, False, False, True],
    )
    return ordered.groupby("field_name", as_index=False).head(1).reset_index(drop=True)


def rule_eval_scores(sf_dir: str) -> pd.DataFrame:
    """Driver-visible rule-evaluation query: score candidate xpaths against
    ground truth over pages planted deterministically from ``doc_id``
    (title always present; an author div only on even ids), so every
    tp/fp/fn/n_extracted cell — and the P/R/F1 floats computed from them
    with the exact ``_prf`` formula — has a closed form the DuckDB oracle
    reproduces.  Exercises the full A2/A3 path: per-page multiset
    eval_array counts in map_batches -> ONE (field, xpath) groupby-sum ->
    finalize."""

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        htmls, tt, ta = [], [], []
        for did in t["doc_id"].to_pylist():
            h = f"<html><body><h1>T{did}</h1>"
            if did % 2 == 0:
                h += f'<div class="a">A{did}</div>'
            h += "</body></html>"
            htmls.append(h.encode("utf-8"))
            tt.append([f"T{did}"])
            ta.append([f"A{did}"])
        return pa.table(
            {
                "html": pa.array(htmls, pa.binary()),
                "truth_title": pa.array(tt, pa.list_(pa.string())),
                "truth_author": pa.array(ta, pa.list_(pa.string())),
            }
        )

    pages = docs.map_batches(build, batch_format="pyarrow")
    scored = evaluate_candidates(
        pages,
        {
            "title": ["/html/body/h1", "//div[@class='a']"],
            "author": ["//div[@class='a']"],
        },
        {"title": "truth_title", "author": "truth_author"},
    )
    return scored.sort_values(["field_name", "xpath"]).reset_index(drop=True)
