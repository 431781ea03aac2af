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


# crawl_corpus packing: seq in the high bits so Min(packed) is the
# earliest-crawled copy; host id + token count ride along in the low bits
_CC_SEQ_BITS = 26    # seq < 2^26 (~67M fetches per run)
_CC_HOST_BITS = 13   # host_id < 8192
_CC_TOK_BITS = 20    # n_tokens < 2^20


def crawl_corpus_rollup(
    extracted: "pa.Table", min_tokens: int = 5
) -> pd.DataFrame:
    """(host, n_pages, n_kept, n_unique, uniq_tokens): the crawl->corpus
    composite — take the crawl's extracted-records table, gate on token
    count, exact-dedup the gated texts corpus-wide (earliest crawl seq
    wins), and roll the result up per host.  ``n_pages`` counts extracted
    pages, ``n_kept`` the gate survivors, ``n_unique`` the kept pages
    that are the corpus-wide FIRST copy of their text, ``uniq_tokens``
    the token total over those keepers — the "how much novel text did
    each host contribute" table a crawl operator reads before widening a
    host's budget.

    Ray shape — two small shuffles, NO broadcast and NO corpus-sized
    driver state:

    1. one stateless pass computes (text_hash, packed, host_id) where
       ``packed = seq << (H+T) | host_id << T | n_tokens`` (loud overflow
       guards, the prep_corpus/_with_pair_key idiom) plus per-batch
       (host, n_pages, n_kept) partials;
    2. ``groupby(text_hash).Min(packed)`` — min seq IS the keeper, and
       the keeper's host and token count unpack from the winning value,
       so no join back to the corpus is needed;
    3. keeper rows pre-aggregate per host and meet the pass-1 partials in
       one final host-cardinality groupby.

    Rows-only query (no SQL analog of the crawl); exactness is asserted
    against an independent pandas recomputation in tests/test_curation.py.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    hosts = sorted(set(extracted["host"].to_pylist()))
    host_id = {h: i for i, h in enumerate(hosts)}
    if len(hosts) >= (1 << _CC_HOST_BITS):
        raise ValueError(
            f"{len(hosts)} hosts exceed the {_CC_HOST_BITS}-bit pack "
            "field; widen _CC_HOST_BITS"
        )

    chunks = [
        extracted.slice(off, 2048)
        for off in range(0, extracted.num_rows, 2048)
    ] or [extracted]
    ds = rd.from_arrow(chunks)

    def fold(t: pa.Table) -> pa.Table:
        import hashlib

        hs, packed = [], []
        for host, seq, text in zip(
            t["host"].to_pylist(),
            t["seq"].to_pylist(),
            t["text"].to_pylist(),
        ):
            n_tok = len(_TOKEN_RE.findall(text))
            if n_tok >= min_tokens:
                if seq >= (1 << _CC_SEQ_BITS) or seq < 0:
                    raise ValueError(
                        f"seq={seq} exceeds the {_CC_SEQ_BITS}-bit pack "
                        "field; widen _CC_SEQ_BITS"
                    )
                if n_tok >= (1 << _CC_TOK_BITS):
                    raise ValueError(
                        f"n_tokens={n_tok} exceeds the {_CC_TOK_BITS}-bit "
                        "pack field; widen _CC_TOK_BITS"
                    )
                h = int.from_bytes(
                    hashlib.md5(text.encode("utf-8")).digest()[:8], "big"
                ) >> 1
                hs.append(h)
                packed.append(
                    (seq << (_CC_HOST_BITS + _CC_TOK_BITS))
                    | (host_id[host] << _CC_TOK_BITS)
                    | n_tok
                )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    def page_partials(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for host, text in zip(t["host"].to_pylist(), t["text"].to_pylist()):
            p, k = agg.get(host, (0, 0))
            n_tok = len(_TOKEN_RE.findall(text))
            agg[host] = (p + 1, k + (1 if n_tok >= min_tokens else 0))
        items = sorted(agg.items())
        return pa.table(
            {
                "host": pa.array([h for h, _ in items], pa.string()),
                "n_pages": pa.array([v[0] for _, v in items], pa.int64()),
                "n_kept": pa.array([v[1] for _, v in items], pa.int64()),
            }
        )

    def keeper_partials(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for packed in t["packed"].to_pylist():
            hid = (packed >> _CC_TOK_BITS) & ((1 << _CC_HOST_BITS) - 1)
            n_tok = packed & ((1 << _CC_TOK_BITS) - 1)
            u, s = agg.get(hid, (0, 0))
            agg[hid] = (u + 1, s + n_tok)
        items = sorted(agg.items())
        return pa.table(
            {
                "host": pa.array([hosts[i] for i, _ in items], pa.string()),
                "n_unique": pa.array([v[0] for _, v in items], pa.int64()),
                "uniq_tokens": pa.array(
                    [v[1] for _, v in items], pa.int64()
                ),
            }
        )

    pages = (
        ds.map_batches(page_partials, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_kept", alias_name="n_kept"),
        )
        .to_pandas()
    )
    keepers = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(keeper_partials, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_unique", alias_name="n_unique"),
            Sum("uniq_tokens", alias_name="uniq_tokens"),
        )
        .to_pandas()
    )
    out = pages.merge(keepers, on="host", how="left")
    for c in ("n_unique", "uniq_tokens"):
        out[c] = out[c].fillna(0).astype("int64")
    return out.sort_values("host").reset_index(drop=True)
