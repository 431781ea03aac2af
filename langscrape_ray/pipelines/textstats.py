"""Text-analysis pipelines over the ``documents`` table.

Training-data-pipeline operators the engine adds beyond the reference
(task brief): token counting, quality scoring, document fingerprinting,
language-ID.  All are stateless vectorized ``map_batches`` stages; compiled
regexes live at module import (reference analog: the per-page token/byte
stats of /root/reference/feilian/statistical_analysis.py:31-79).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_TOKEN_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[^a-zA-Z]")
# BPE-ish piece pattern: letter runs / digit runs / single symbols — the
# subword-budget counter a tokenizer-less pipeline uses (task brief M22
# "whitespace + a BPE-ish regex"); identical under Python re and RE2
_BPE_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")

# tiny per-language stopword inventories for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "del"},
    "fr": {"le", "la", "de", "et", "un", "une", "les", "des", "du", "est"},
    "de": {"der", "die", "das", "und", "ein", "eine", "zu", "den", "von", "mit"},
}


def _read_docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_tokens): whitespace tokenization, oracle-matched to
    DuckDB's regexp split."""

    def fn(t: pa.Table) -> pa.Table:
        n = [len(_TOKEN_RE.findall(x)) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pa.array(n, pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def token_count_bpe(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_tokens, n_pieces): whitespace tokens plus BPE-ish regex
    pieces (letter runs / digit runs / single symbols over lowercased
    text) — the cheap subword-budget proxy when no tokenizer model ships
    with the pipeline.  SQL-oracled: regexp_extract_all with the same
    pattern."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = [len(_TOKEN_RE.findall(x)) for x in texts]
        n_bpe = [len(_BPE_RE.findall(x.lower())) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_pieces": pa.array(n_bpe, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def fingerprint(sf_dir: str) -> "rd.Dataset":
    """(doc_id, fp): md5 content fingerprint — matches DuckDB md5()."""

    def fn(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def quality_score(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_chars, n_tokens, alpha_per_10k): cheap quality signals for
    corpus filtering.  alpha_per_10k uses integer arithmetic
    (n_alpha*10000 // n_chars) so the SQL oracle matches bit-exactly —
    float round() is rounding-mode-ambiguous across engines."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_chars = [len(x) for x in texts]
        n_tokens = [len(_TOKEN_RE.findall(x)) for x in texts]
        alpha = [
            (len(_ALPHA_RE.sub("", x)) * 10000) // len(x) if x else 0 for x in texts
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "alpha_per_10k": pa.array(alpha, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


class LangId:
    """Stopword-overlap language-ID (actor-pool stage: sets built once).

    No SQL oracle (heuristic scoring) — driver records rows-only."""

    def __init__(self):
        self.langs = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = []
        for text in t["text"].to_pylist():
            toks = set(w.lower() for w in _TOKEN_RE.findall(text)[:200])
            best, best_n = "und", 0
            for lang, stops in sorted(self.langs.items()):
                n = len(toks & stops)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "pred_lang": pa.array(preds, pa.string()),
            }
        )


def lang_id(sf_dir: str) -> "rd.Dataset":
    return _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(2, 8)
    )


class _BPECount:
    """Actor-pool counter: the vendored BPE encoder (kernel/bpe.py) is
    built ONCE per actor in __init__ — merge-table parse + word memo
    warmup never happen per batch."""

    def __init__(self):
        from langscrape_ray.kernel.bpe import vendored_encoder

        self.enc = vendored_encoder()

    def __call__(self, t: pa.Table) -> pa.Table:
        n = [self.enc.count_tokens(x) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": pa.array(n, pa.int64())}
        )


def token_count_vendored(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_bpe_tokens): subword count under the COMMITTED BPE merge
    table — the tiktoken-parity counter for M22 (reference
    feilian/fragments_detection.py:29 counts with tiktoken; the table here
    is trained by the repo's own Sennrich trainer, see kernel/bpe.py).
    Rows-only: BPE encoding has no SQL analog; exactness vs a
    single-process replay is asserted in tests/test_bpe.py."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _BPECount, batch_format="pyarrow", concurrency=(1, 4)
    )


def token_histogram(sf_dir: str, bin_size: int = 32,
                    counter: str = "ws") -> pd.DataFrame:
    """Binned token-count histogram (reference A5 shape,
    /root/reference/feilian/statistical_analysis.py:55-79: bin = n//k*k,
    then grouped aggregation).  ``counter="ws"`` (default, SQL-oracled)
    counts whitespace tokens; ``counter="bpe"`` counts subwords under the
    vendored BPE table (reference parity with the tiktoken histogram —
    rows-only semantics, replay-tested in tests/test_bpe.py)."""
    from ray.data.aggregate import Count, Sum

    if counter == "bpe":
        from langscrape_ray.kernel.bpe import vendored_encoder

        class BinFn:
            def __init__(self):
                self.enc = vendored_encoder()

            def __call__(self, t: pa.Table) -> pa.Table:
                n = [self.enc.count_tokens(x) for x in t["text"].to_pylist()]
                bins = [x // bin_size * bin_size for x in n]
                return pa.table(
                    {
                        "token_bin": pa.array(bins, pa.int64()),
                        "n_tokens": pa.array(n, pa.int64()),
                    }
                )

        mapped = _read_docs(sf_dir, ["text"]).map_batches(
            BinFn, batch_format="pyarrow", concurrency=(1, 4)
        )
    else:
        def fn(t: pa.Table) -> pa.Table:
            n = [len(_TOKEN_RE.findall(x)) for x in t["text"].to_pylist()]
            bins = [x // bin_size * bin_size for x in n]
            return pa.table(
                {
                    "token_bin": pa.array(bins, pa.int64()),
                    "n_tokens": pa.array(n, pa.int64()),
                }
            )

        mapped = _read_docs(sf_dir, ["text"]).map_batches(
            fn, batch_format="pyarrow"
        )

    out = (
        mapped
        .groupby("token_bin")
        .aggregate(Count(alias_name="n_docs"), Sum("n_tokens", alias_name="sum_tokens"))
        .sort("token_bin")
        .to_pandas()
    )
    # integer mean (x100) — exact across engines, unlike float round()
    out["avg_tokens_e2"] = (out["sum_tokens"] * 100) // out["n_docs"]
    return out[["token_bin", "n_docs", "avg_tokens_e2"]]


def repetition_stats(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_words, n_uniq_words, top_word_n, n_bigrams, dup_bigrams):
    Gopher-style repetition signals for corpus quality filtering — the
    fraction of the document that is its most frequent word
    (top_word_n / n_words) and its duplicate-bigram mass
    (dup_bigrams / n_bigrams) flag template/spam pages.  All columns are
    raw integer counts so the SQL oracle is bit-exact; thresholding is a
    downstream integer-arithmetic filter (e.g. keep when
    ``dup_bigrams * 10 < n_bigrams``), never a float compare.

    Tokenization is a plain split on a single space (matching DuckDB's
    ``string_split(text, ' ')``); per-doc counting is a Counter pass —
    embarrassingly parallel, no shuffle, streams at any corpus size.
    """
    from collections import Counter

    def fn(t: pa.Table) -> pa.Table:
        n_words, n_uniq, top_n_, n_bi, dup_bi = [], [], [], [], []
        for text in t["text"].to_pylist():
            words = text.split(" ")
            wc = Counter(words)
            grams = Counter(
                words[i] + " " + words[i + 1] for i in range(len(words) - 1)
            )
            ng = max(len(words) - 1, 0)
            n_words.append(len(words))
            n_uniq.append(len(wc))
            top_n_.append(max(wc.values()))
            n_bi.append(ng)
            dup_bi.append(ng - len(grams))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_uniq_words": pa.array(n_uniq, pa.int64()),
                "top_word_n": pa.array(top_n_, pa.int64()),
                "n_bigrams": pa.array(n_bi, pa.int64()),
                "dup_bigrams": pa.array(dup_bi, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def split_assign(sf_dir: str) -> "rd.Dataset":
    """(doc_id, bucket, split): deterministic content-independent
    train/valid/test assignment — bucket = first 32 bits of
    md5('split:' || doc_id) mod 100, split = train (<90) / valid (<95) /
    test.  Hash-seeded (no RNG state), so the split is reproducible
    across runs, resumes, and engines — the DuckDB oracle recomputes the
    identical md5 fold.  Stateless map_batches; no shuffle.
    """

    def fn(t: pa.Table) -> pa.Table:
        buckets, splits = [], []
        for did in t["doc_id"].to_pylist():
            h = hashlib.md5(f"split:{did}".encode("utf-8")).hexdigest()
            b = int(h[:8], 16) % 100
            buckets.append(b)
            splits.append("train" if b < 90 else ("valid" if b < 95 else "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


def split_by_group(sf_dir: str) -> "rd.Dataset":
    """(doc_id, source, bucket, split): LEAKAGE-SAFE train/valid/test
    assignment — the split decision hashes the GROUP (``source``), not
    the document, so every document of a site lands in the same split
    and near-duplicates within a source can never straddle train/test
    (the contamination mode a doc-level split like ``split_assign``
    cannot prevent; the standard practice for web corpora is to split by
    registered domain).  Same md5 fold and 90/5/5 thresholds as
    split_assign, keyed 'gsplit:' || source.  Stateless map_batches with
    a per-batch group-hash memo; no shuffle.
    """

    def fn(t: pa.Table) -> pa.Table:
        memo: dict = {}
        buckets, splits = [], []
        for src in t["source"].to_pylist():
            got = memo.get(src)
            if got is None:
                h = hashlib.md5(f"gsplit:{src}".encode("utf-8")).hexdigest()
                b = int(h[:8], 16) % 100
                got = memo[src] = (
                    b,
                    "train" if b < 90 else ("valid" if b < 95 else "test"),
                )
            buckets.append(got[0])
            splits.append(got[1])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow"
    )


def decontaminate(sf_dir: str, n: int = 3, bench_mod: int = 29) -> "rd.Dataset":
    """(doc_id, n_hits): benchmark-decontamination check — for every
    candidate training document, the number of DISTINCT word n-grams it
    shares with a held-out "benchmark" set (here the deterministic subset
    ``doc_id % bench_mod == 0``; in production, the eval suites the model
    must not train on).  Downstream filters drop or flag docs with
    ``n_hits > 0`` — the standard n-gram-overlap decontamination step of
    an LLM training-data pipeline.

    Ray shape: benchmark n-gram sets are tiny relative to the corpus
    (eval suites are MBs; the corpus is TBs), so the benchmark side
    reduces to per-batch DISTINCT gram partials, is unioned on the
    driver, and broadcast once via ``ray.put``; the corpus pass is then
    a stateless membership-count ``map_batches`` — no shuffle at all.
    Tokenization is a plain single-space split (DuckDB
    ``string_split(text, ' ')``), grams joined with one space, so the
    SQL oracle (list-slice gram generation + semi-join + count DISTINCT)
    is bit-exact."""
    import ray

    def _grams(text: str):
        words = text.split(" ")
        return (
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )

    def bench_partial(t: pa.Table) -> pa.Table:
        seen = set()
        ids = t["doc_id"].to_pylist()
        for did, text in zip(ids, t["text"].to_pylist()):
            if did % bench_mod == 0:
                seen.update(_grams(text))
        return pa.table({"g": pa.array(sorted(seen), pa.string())})

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bench_set: set = set()
    for part in docs.map_batches(
        bench_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        bench_set.update(part["g"].to_pylist())
    bench_ref = ray.put(frozenset(bench_set))

    class CountHits:
        def __init__(self, ref):
            self.bench = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_id, out_n = [], []
            for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                if did % bench_mod == 0:
                    continue  # benchmark rows are not candidates
                out_id.append(did)
                out_n.append(sum(1 for g in set(_grams(text)) if g in self.bench))
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "n_hits": pa.array(out_n, pa.int64()),
                }
            )

    return docs.map_batches(
        CountHits,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_IPV4_RE = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")


def pii_scan(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_emails, n_ips, redacted_md5): PII detection + redaction —
    count email / IPv4 occurrences and fingerprint the text after
    replacing them with ``<EMAIL>`` / ``<IP>`` placeholders (emails
    first, then IPs; the md5 proves the redacted bytes, not just the
    counts, match).

    The synthetic corpus contains no PII-shaped strings, so the scan
    input is the document text plus a deterministic doc_id-derived
    contact tail built IDENTICALLY here and in the SQL oracle — the
    correctness check exercises the regex + redaction machinery on
    non-trivial matches.  Patterns are chosen to behave the same under
    Python ``re`` and RE2 (DuckDB's engine).  Stateless vectorized
    map_batches; compiled patterns at module import; no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        n_em, n_ip, fps = [], [], []
        ids = t["doc_id"].to_pylist()
        for did, text in zip(ids, t["text"].to_pylist()):
            aug = f"{text} contact user{did}@example.com from 10.1.{did % 250}.7"
            if did % 2 == 0:  # vary counts so the oracle isn't constant
                aug += f" cc admin{did}@test.org via 192.168.0.{did % 200}"
            n_em.append(len(_EMAIL_RE.findall(aug)))
            red = _EMAIL_RE.sub("<EMAIL>", aug)
            n_ip.append(len(_IPV4_RE.findall(red)))
            red = _IPV4_RE.sub("<IP>", red)
            fps.append(hashlib.md5(red.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_emails": pa.array(n_em, pa.int64()),
                "n_ips": pa.array(n_ip, pa.int64()),
                "redacted_md5": pa.array(fps, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def tfidf_topk(sf_dir: str, k: int = 5) -> "rd.Dataset":
    """(doc_id, term, rank): top-``k`` characteristic terms per document by
    an integer TF-IDF proxy — score = tf * n_docs // df (term frequency
    scaled by inverse document frequency without float log, so the SQL
    oracle is bit-exact; ranking ties break by term ascending).  The
    keyword-extraction step of a corpus-indexing pipeline.

    Ray shape: document frequency is a combiner-pattern aggregate
    (per-batch distinct-per-doc partials -> ONE groupby(term) sum);
    vocabularies are tiny relative to corpora, so the {term: df} map is
    broadcast once via ``ray.put`` and the per-doc top-k is a stateless
    second corpus pass — the same two-pass broadcast shape as
    ``decontaminate``, no row-level shuffle."""
    import heapq

    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def partial_df(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(set(re.split(r"[^a-z0-9]+", text.lower())) - {""})
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    df_pd = (
        docs.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    df_ref = ray.put(dict(zip(df_pd["term"], df_pd["df"].astype(int))))

    class TopK:
        def __init__(self, ref):
            self.df = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_id, out_term, out_rank = [], [], []
            for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                tf = Counter(re.split(r"[^a-z0-9]+", text.lower()))
                tf.pop("", None)
                scored = [
                    (-(cnt * n_docs // self.df[w]), w) for w, cnt in tf.items()
                ]
                for r, (_neg, w) in enumerate(heapq.nsmallest(k, scored), 1):
                    out_id.append(did)
                    out_term.append(w)
                    out_rank.append(r)
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "term": pa.array(out_term, pa.string()),
                    "rank": pa.array(out_rank, pa.int64()),
                }
            )

    return docs.map_batches(
        TopK,
        fn_constructor_args=(df_ref,),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


def embed_docs(sf_dir: str, dim: int = 64) -> "rd.Dataset":
    """(doc_id, dim_idx, weight): feature-hashing document embeddings —
    each token maps to bucket ``int(md5(tok)[:8], 16) % dim`` with sign
    from the 9th hex digit, weights summed per bucket (the classic
    hashing-vectorizer / signed feature hashing method).  Long-format
    nonzero output keeps every column scalar, so the DuckDB oracle
    (md5 + hex-cast + group-sum) is bit-exact — integer weights, no
    float drift.

    Ray shape: an actor-pool stage whose per-actor state is the token ->
    (bucket, sign) memo cache — the batched-inference pattern (the
    'model' loads/warms once per actor, batches stream through).  Pure
    map-side; no shuffle."""

    class Embed:
        def __init__(self):
            self.memo: dict = {}

        def _tok(self, tok: str):
            v = self.memo.get(tok)
            if v is None:
                h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                v = (int(h[:8], 16) % dim, 1 if int(h[8], 16) % 2 == 0 else -1)
                self.memo[tok] = v
            return v

        def __call__(self, t: pa.Table) -> pa.Table:
            out_id, out_dim, out_w = [], [], []
            for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                acc: dict = {}
                for tok in text.split(" "):
                    if not tok:
                        continue
                    b, s = self._tok(tok)
                    acc[b] = acc.get(b, 0) + s
                for b in sorted(acc):
                    if acc[b] != 0:
                        out_id.append(did)
                        out_dim.append(b)
                        out_w.append(acc[b])
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "dim_idx": pa.array(out_dim, pa.int64()),
                    "weight": pa.array(out_w, pa.int64()),
                }
            )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Embed, batch_format="pyarrow", concurrency=(2, 8)
    )


def doc_term_df(sf_dir: str, top_n: int = 50) -> pd.DataFrame:
    """Document frequency: the ``top_n`` terms by number of documents
    containing them (lowercased, split on non-alphanumeric runs), ties
    broken by term ascending — the vocabulary-building step of a
    TF-IDF / corpus-statistics pipeline.

    Ray shape: df is distinct-per-doc, which is LOCAL to a row — each
    batch emits per-term partial counts of docs-containing (a set() per
    doc, Counter per batch), so the only shuffle is the final
    groupby(term) integer-sum over pre-aggregated (term, count) partials —
    the combiner-before-shuffle pattern.  The driver sees only the
    term-level aggregate, never exploded tokens.

    Oracle: unnest(list_distinct(regexp_split_to_array(lower(text)))) +
    count(*) group by term.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial_df(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(set(re.split(r"[^a-z0-9]+", text.lower())) - {""})
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    out = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
        .astype({"df": "int64"})
        .sort_values(["df", "term"], ascending=[False, True])
        .head(top_n)
        .reset_index(drop=True)
    )
    return out[["term", "df"]]


def pack_sequences(
    sf_dir: str, seq_len: int = 2048, bucket_width: int = 4096
) -> "rd.Dataset":
    """(doc_id, n_tokens, tok_start, seq_first, seq_last): concat-then-split
    sequence packing — the LLM-training step that lays every document's
    tokens end-to-end in doc_id order and cuts the stream into fixed
    ``seq_len`` training sequences.  ``tok_start`` is the document's global
    token offset; ``seq_first``/``seq_last`` are the first/last sequence
    ids the document lands in (documents span boundaries, as in GPT-style
    packing).  Empty documents occupy their boundary sequence
    (``GREATEST(n_tokens, 1)`` on both sides).

    Ray shape — a two-level distributed prefix scan (no reference analog;
    the windowed-cumsum ask of the task brief's training-data ops):

    1. one vectorized pass computes ``n_tokens`` and a coarse
       ``bucket = doc_id // bucket_width``; the text column is dropped and
       the narrow (doc_id, n_tokens, bucket) table is materialized — 24
       B/doc, so the token counting over a 100 TB corpus runs ONCE and the
       two consumers below re-read only the 0.25%-sized intermediate;
    2. per-bucket token totals via ``groupby(bucket)`` (n/bucket_width
       rows cross the wire — ~2.4 M rows at 10^10 docs), the driver runs
       an exclusive cumsum over that tiny frame and broadcasts the
       bucket→offset map once via ``ray.put``;
    3. ``groupby(bucket).map_groups`` sorts each ≤bucket_width group by
       doc_id and adds a numpy exclusive cumsum to the bucket's offset —
       ONE hash shuffle of the narrow table, vectorized per group.

    At >10^10 docs the driver scan generalizes to a 3-level tree (scan the
    bucket totals with a second groupby on ``bucket // K``); the per-doc
    work never changes.  All columns int64: the DuckDB oracle is the
    standard ``SUM() OVER (ORDER BY doc_id ROWS ... 1 PRECEDING)`` window
    cumsum, bit-exact because integer sums are order-independent.
    """
    import numpy as np
    import ray

    def count_fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = [len(_TOKEN_RE.findall(x)) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
                "bucket": pa.array(ids // bucket_width, pa.int64()),
            }
        )

    counted = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(count_fn, batch_format="pyarrow")
        .materialize()  # narrow; avoids re-tokenizing for the two consumers
    )

    from ray.data.aggregate import Sum

    totals = (
        counted.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="bucket_tokens"))
        .to_pandas()
        .sort_values("bucket")
    )
    csum = totals["bucket_tokens"].astype("int64").cumsum()
    excl = (csum - totals["bucket_tokens"]).to_numpy()
    offsets = {int(b): int(o) for b, o in zip(totals["bucket"], excl)}
    off_ref = ray.put(offsets)

    def scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "tok_start": pa.array([], pa.int64()),
                    "seq_first": pa.array([], pa.int64()),
                    "seq_last": pa.array([], pa.int64()),
                }
            )
        g = group.sort_by([("doc_id", "ascending")])
        n = g["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ray.get(off_ref)[int(g["bucket"][0].as_py())]
        start = base + np.concatenate(
            ([0], np.cumsum(n[:-1], dtype=np.int64))
        )
        span = np.maximum(n, 1)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "tok_start": pa.array(start, pa.int64()),
                "seq_first": pa.array(start // seq_len, pa.int64()),
                "seq_last": pa.array(
                    (start + span - 1) // seq_len, pa.int64()
                ),
            }
        )

    return counted.groupby("bucket").map_groups(scan, batch_format="pyarrow")


def boilerplate_prune(
    sf_dir: str, n: int = 3, min_docs: int = 5
) -> "rd.Dataset":
    """(doc_id, clean_text, n_removed): corpus-frequency boilerplate
    removal — the C4/RefinedWeb cleaning step that deletes every word
    ``n``-gram occurring in >= ``min_docs`` DISTINCT documents (nav bars,
    footers, cookie banners at web scale).  A token is removed when ANY
    hot n-gram window covers it; survivors re-join with single spaces.

    Ray shape — two streaming passes over the corpus, one small shuffle:

    1. per-batch DISTINCT-gram partials (each doc lives in exactly one
       batch, so batch-level distinct-doc counts per gram sum exactly) →
       ``groupby(g).sum`` over the reduced partials → filter to the hot
       set.  Boilerplate is rare by definition (~1% of gram space here),
       so the hot set is KB–MB sized and broadcasts once via ``ray.put``
       — the same small-side pattern as ``decontaminate``;
    2. a stateless ``map_batches`` rebuild pass marks covered token
       positions against the broadcast set — no shuffle.

    At 100 TB the gram partials are the only exchanged data (distinct
    grams per block, already deduped), and the hot set stays driver-safe
    because raising ``min_docs`` shrinks it monotonically.  Tokenization
    is a single-space split for DuckDB ``string_split`` parity; the SQL
    oracle rebuilds documents with a window anti-join + ordered
    ``string_agg`` and hash-matches bit-exact.
    """
    import ray

    def gram_partials(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t["text"].to_pylist():
            w = text.split(" ")
            for g in {
                " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
            }:
                counts[g] = counts.get(g, 0) + 1
        return pa.table(
            {
                "g": pa.array(list(counts.keys()), pa.string()),
                "nd": pa.array(list(counts.values()), pa.int64()),
            }
        )

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    from ray.data.aggregate import Sum

    def keep_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["nd"], min_docs))

    hot: set = set()
    for part in (
        docs.map_batches(gram_partials, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("nd", alias_name="nd"))
        .map_batches(keep_hot, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        hot.update(part["g"].to_pylist())
    hot_ref = ray.put(frozenset(hot))

    class Prune:
        def __init__(self, ref):
            self.hot = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_text, out_n = [], []
            for text in t["text"].to_pylist():
                w = text.split(" ")
                drop = bytearray(len(w))
                for i in range(len(w) - n + 1):
                    if " ".join(w[i : i + n]) in self.hot:
                        drop[i : i + n] = b"\x01" * n
                kept = [tok for tok, d in zip(w, drop) if not d]
                out_text.append(" ".join(kept))
                out_n.append(len(w) - len(kept))
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "clean_text": pa.array(out_text, pa.string()),
                    "n_removed": pa.array(out_n, pa.int64()),
                }
            )

    return docs.map_batches(
        Prune,
        fn_constructor_args=(hot_ref,),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


def source_mix_weights(
    sf_dir: str, cap_pct: int = 8, scale: int = 1_000_000
) -> pd.DataFrame:
    """(source, n_docs, n_tokens, capped_tokens, weight_ppm): training-mix
    sampling weights per source — proportional-to-tokens sampling with a
    per-source cap (no single domain may exceed ``cap_pct``% of the
    sampled mix), the standard web-corpus mixing rule.  ``weight_ppm`` is
    the integer parts-per-million share of ``capped_tokens``.

    Ray shape: ONE ``groupby(source)`` over per-batch pre-aggregated
    (source, n_docs, n_tokens) partials — the only exchange is
    n_sources-cardinality (thousands of domains at web scale), and the
    cap+normalize arithmetic runs on that tiny frame driver-side in
    exact int64 (floor division; order-independent, so the DuckDB window
    oracle hash-matches)."""
    docs = _read_docs(sf_dir, ["source", "text"])

    def partials(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        agg: dict = {}
        for s, text in zip(src, t["text"].to_pylist()):
            d, tk = agg.get(s, (0, 0))
            agg[s] = (d + 1, tk + len(_TOKEN_RE.findall(text)))
        keys = list(agg.keys())
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_tokens": pa.array([agg[k][1] for k in keys], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    df = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .to_pandas()
    )
    total = int(df["n_tokens"].sum())
    cap = total * cap_pct // 100
    df["capped_tokens"] = df["n_tokens"].clip(upper=cap).astype("int64")
    denom = int(df["capped_tokens"].sum())
    df["weight_ppm"] = (df["capped_tokens"] * scale // denom).astype("int64")
    return (
        df[["source", "n_docs", "n_tokens", "capped_tokens", "weight_ppm"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def compression_ratio(sf_dir: str, level: int = 6) -> "rd.Dataset":
    """(doc_id, raw_len, zlib_len, ratio_e4): DEFLATE compressibility — the
    CCNet/Gopher-family quality heuristic (machine-generated / repetitive
    text compresses far better than natural prose; pipelines gate on the
    ratio).  ``ratio_e4 = zlib_len * 10000 // max(raw_len, 1)`` in integer
    space.  Stateless vectorized ``map_batches``; the per-row zlib call
    dominates, as it should.  No SQL analog (DuckDB has no DEFLATE) —
    rows-only at the driver; pytest replays zlib single-process and
    asserts frame equality, plus the discriminative property (a repetitive
    doc scores materially below a unique-text doc)."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        raw = [len(x.encode("utf-8")) for x in texts]
        comp = [len(zlib.compress(x.encode("utf-8"), level)) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "raw_len": pa.array(raw, pa.int64()),
                "zlib_len": pa.array(comp, pa.int64()),
                "ratio_e4": pa.array(
                    [c * 10000 // max(r, 1) for r, c in zip(raw, comp)],
                    pa.int64(),
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def mix_sample(
    sf_dir: str, cap_pct: int = 8, scale: int = 1_000_000
) -> "rd.Dataset":
    """(doc_id, source, bucket_e6, frac_e6): APPLY the capped training mix
    — deterministically down-sample each over-cap source to its
    ``source_mix_weights`` allowance and pass under-cap sources through.
    Keep rule: ``bucket_e6 < frac_e6[source]`` where ``bucket_e6`` is the
    first 32 bits of md5('mix:' || doc_id) mod 1e6 (hash-seeded like
    split_assign: reproducible across runs, resumes, engines) and
    ``frac_e6 = capped_tokens * 1e6 // n_tokens`` per source.  Returns
    only the kept rows — the sampled corpus manifest.

    Ray shape: the per-source fraction table is the output of ONE
    source-cardinality groupby (see source_mix_weights), broadcast via
    ``ray.put``; the keep pass is a stateless ``map_batches`` filter —
    no second shuffle.  SQL oracle: the same md5 fold + window-total CTE.
    """
    import ray

    frac = source_mix_weights(sf_dir, cap_pct=cap_pct, scale=scale)
    frac_map = {
        s: int(c) * scale // int(n)
        for s, c, n in zip(
            frac["source"], frac["capped_tokens"], frac["n_tokens"]
        )
    }
    frac_ref = ray.put(frac_map)

    class Keep:
        def __init__(self, ref):
            self.frac = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_pylist()
            srcs = t["source"].to_pylist()
            keep_idx, buckets, fracs = [], [], []
            for i, (did, s) in enumerate(zip(ids, srcs)):
                h = hashlib.md5(f"mix:{did}".encode("utf-8")).hexdigest()
                b = int(h[:8], 16) % scale
                f = self.frac[s]
                if b < f:
                    keep_idx.append(i)
                    buckets.append(b)
                    fracs.append(f)
            out = t.select(["doc_id", "source"]).take(keep_idx)
            return out.append_column(
                "bucket_e6", pa.array(buckets, pa.int64())
            ).append_column("frac_e6", pa.array(fracs, pa.int64()))

    return _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
        Keep,
        fn_constructor_args=(frac_ref,),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


_GOPHER_STOPS = frozenset(
    ["the", "be", "to", "of", "and", "that", "have", "with"]
)
# ASCII-only whitespace, NOT str.split(): the DuckDB oracle tokenizes
# with RE2 '\s+' which is ASCII-only, while Python str.split() also
# splits on U+00A0/U+2028/etc. — the two must agree byte-for-byte
_ASCII_WS = re.compile(r"[ \t\n\r\f\v]+")


def gopher_quality(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_words, sum_word_chars, n_lines, n_bullet_lines,
    n_ellipsis_lines, n_symbols, n_stop, keep): the published Gopher
    document-quality rules (Rae et al. 2021, Table A1) in exact integer
    form — the industry-standard pre-training gate alongside C4's.

    Signals: whitespace word count and summed word length (mean word
    length via cross-multiplication, no float), bullet-started and
    ellipsis-ended line fractions, symbol-to-word ratio (# and ...),
    and the 8-stop-word requirement.  ``keep`` applies the published
    thresholds: 50 <= words <= 100k, 3 <= mean word len <= 10, <=90%
    bullet lines, <=30% ellipsis lines, symbol ratio <= 0.1, >= 2
    distinct stop words — every comparison done as int64
    cross-multiplication so the SQL oracle is hash-exact.

    Ray shape: stateless map_batches, no shuffle.  Reference analog:
    none (the reference has no corpus-quality gate) — engine surface
    for the training-pipeline requirement, same family as
    quality_score / lang_id."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        rows = {k: [] for k in (
            "n_words", "sum_word_chars", "n_lines", "n_bullet_lines",
            "n_ellipsis_lines", "n_symbols", "n_stop", "keep")}
        for x in texts:
            words = [w for w in _ASCII_WS.split(x) if w]
            nw = len(words)
            swc = sum(len(w) for w in words)
            lines = x.split("\n")
            nl = len(lines)
            nb = sum(1 for ln in lines if ln.startswith(("- ", "* ")))
            ne = sum(1 for ln in lines if ln.endswith("..."))
            nsym = x.count("#") + x.count("...")
            nstop = len({w.lower() for w in words} & _GOPHER_STOPS)
            keep = (
                50 <= nw <= 100_000
                and 3 * nw <= swc <= 10 * nw
                and nb * 10 <= 9 * nl
                and ne * 10 <= 3 * nl
                and nsym * 10 <= nw
                and nstop >= 2
            )
            for k, v in (
                ("n_words", nw), ("sum_word_chars", swc), ("n_lines", nl),
                ("n_bullet_lines", nb), ("n_ellipsis_lines", ne),
                ("n_symbols", nsym), ("n_stop", nstop),
                ("keep", int(keep)),
            ):
                rows[k].append(v)
        cols = {"doc_id": t["doc_id"]}
        cols.update({k: pa.array(v, pa.int64()) for k, v in rows.items()})
        return pa.table(cols)

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
