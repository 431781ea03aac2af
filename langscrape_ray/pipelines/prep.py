"""End-to-end training-data prep pipeline over the documents table.

The composite flagship for the LLM-data-pipeline operator family (task
brief): language-ID -> quality gate -> canopy dedup -> per-language token
accounting, expressed as ONE streaming Ray Data flow.  Each stage reuses
the semantics of its standalone, individually-SQL-oracled operator
(`textstats.lang_id`, `textstats.quality_score`, `dedup.exact_dedup`'s
shuffle-agg shape), so the composition itself is what this query proves:
no stage materializes, the only exchanges are the dedup groupby (canopy
key) and a <=4-group final aggregate fed by per-block combiners.

Scale notes:
- stage 1 is one fused stateless map_batches (single text pass computes
  pred_lang + token/alpha stats + the canopy fingerprint; the quality
  gate filters INSIDE the stage so rejected rows never enter the shuffle)
- the dedup keeper (min doc_id per canopy group) must carry its own
  n_tokens/lang through the aggregate; Ray's aggregate has no arg_min,
  so the stage packs (doc_id, n_tokens, lang_code) into one int64 and
  takes Min — min-by-leading-field == arg_min(doc_id) because doc_id
  occupies the high bits (DuckDB side uses arg_min directly)
- the final per-language rollup pre-aggregates per block (pyarrow
  group_by combiner) before a <=4-row groupby-sum
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from langscrape_ray.pipelines.textstats import _LANG_STOPWORDS, _read_docs

_TOKEN_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[^a-zA-Z]")

MIN_TOKENS = 24
MIN_ALPHA_PER_10K = 8000
CANOPY_TOKENS = 5

# fixed code table (sorted lang keys, 'und' excluded by the gate)
_LANG_CODES = {lang: i for i, lang in enumerate(sorted(_LANG_STOPWORDS))}
_CODE_LANGS = {i: lang for lang, i in _LANG_CODES.items()}

# packing: doc_id in the high bits so Min(packed) == row of min doc_id
_PACK_TOKENS_BITS = 20  # n_tokens < 2^20
_PACK_LANG_BITS = 4     # lang_code < 16


class PrepStage:
    """Fused lang-ID + quality + canopy-fingerprint + gate (actor pool:
    stopword sets built once)."""

    def __init__(self):
        self.langs = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        out_packed, out_fp = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            n_tokens = len(_TOKEN_RE.findall(text))
            if n_tokens < MIN_TOKENS:
                continue
            alpha = (len(_ALPHA_RE.sub("", text)) * 10000) // len(text) if text else 0
            if alpha < MIN_ALPHA_PER_10K:
                continue
            toks = set(w.lower() for w in _TOKEN_RE.findall(text)[:200])
            best, best_n = "und", 0
            for lang, stops in sorted(self.langs.items()):
                n = len(toks & stops)
                if n > best_n:
                    best, best_n = lang, n
            if best == "und":
                continue
            low = _TOKEN_RE.findall(text.lower().strip())[:CANOPY_TOKENS]
            # loud overflow guard (mirrors dedup._with_pair_key): a value
            # past its field width would silently corrupt the neighboring
            # fields and the Min-keeper arg_min invariant
            if n_tokens >= (1 << _PACK_TOKENS_BITS):
                raise ValueError(
                    f"n_tokens={n_tokens} exceeds the {_PACK_TOKENS_BITS}-bit "
                    "pack field; widen _PACK_TOKENS_BITS"
                )
            if int(doc_id) >= (1 << (63 - _PACK_TOKENS_BITS - _PACK_LANG_BITS)) \
                    or int(doc_id) < 0:
                raise ValueError(
                    f"doc_id={doc_id} exceeds the packed int64 id range; "
                    "shard the id space before packing"
                )
            packed = (
                (int(doc_id) << (_PACK_TOKENS_BITS + _PACK_LANG_BITS))
                | (n_tokens << _PACK_LANG_BITS)
                | _LANG_CODES[best]
            )
            out_packed.append(packed)
            out_fp.append(" ".join(low))
        return pa.table(
            {
                "fp": pa.array(out_fp, pa.string()),
                "packed": pa.array(out_packed, pa.int64()),
            }
        )


def prep_corpus(sf_dir: str) -> pd.DataFrame:
    """(pred_lang, n_docs, n_dups_removed, total_tokens) for the corpus
    that survives the gate, one keeper per canopy group."""
    kept = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        PrepStage, batch_format="pyarrow", concurrency=(2, 8)
    )
    dedup = kept.groupby("fp").aggregate(
        Min("packed", alias_name="keeper"), Count(alias_name="n_group")
    )

    def unpack_and_combine(t: pa.Table) -> pa.Table:
        import numpy as np

        keeper = np.asarray(t["keeper"], dtype=np.int64)
        n_group = np.asarray(t["n_group"], dtype=np.int64)
        lang_code = keeper & ((1 << _PACK_LANG_BITS) - 1)
        n_tokens = (keeper >> _PACK_LANG_BITS) & ((1 << _PACK_TOKENS_BITS) - 1)
        part = pa.table(
            {
                "lang_code": pa.array(lang_code),
                "token_bin": pa.array(n_tokens // 32 * 32),
                "n_docs": pa.array(np.ones_like(lang_code)),
                "n_dups_removed": pa.array(n_group - 1),
                "total_tokens": pa.array(n_tokens),
            }
        )
        # per-block combiner: the final exchange carries a handful of
        # (lang, bin) rows per block instead of one per keeper
        part = part.group_by(["lang_code", "token_bin"]).aggregate(
            [("n_docs", "sum"), ("n_dups_removed", "sum"), ("total_tokens", "sum")]
        )
        return part.rename_columns(
            ["lang_code", "token_bin", "n_docs", "n_dups_removed", "total_tokens"]
        )

    out = (
        dedup.map_batches(unpack_and_combine, batch_format="pyarrow")
        .groupby(["lang_code", "token_bin"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_dups_removed", alias_name="n_dups_removed"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
        .to_pandas()
    )
    out["pred_lang"] = out["lang_code"].map(_CODE_LANGS)
    out = out[
        ["pred_lang", "token_bin", "n_docs", "n_dups_removed", "total_tokens"]
    ]
    out = out.astype(
        {
            "token_bin": "int64",
            "n_docs": "int64",
            "n_dups_removed": "int64",
            "total_tokens": "int64",
        }
    )
    return out.sort_values(["pred_lang", "token_bin"]).reset_index(drop=True)
