"""Corpus-curation operators: shard shuffling, LM-familiarity scoring,
global quantile gating, cross-source overlap audit.

Training-data-pipeline operators beyond the reference (task brief):
the steps between a cleaned web corpus and a training mix — lay the
kept documents into deterministically shuffled shards, score each
document against a corpus n-gram LM (the CCNet/KenLM quality signal),
gate on a global length quantile, and audit n-gram overlap between
sources before mixing.  All are SQL-oracled with exact integer
arithmetic; hash folds reuse the md5 idiom of ``split_assign``
(textstats.py:230) so results are reproducible across runs, resumes
and engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .util import list_col_matrix

from .textstats import _TOKEN_RE, _read_docs

# coarse hash-order buckets for the shuffle_shards prefix scan: h is a
# 32-bit md5 fold, so h >> (32 - _HB_BITS) yields 2^_HB_BITS contiguous
# ranges of the within-shard sort order
_HB_BITS = 6


def _md5_fold32(s: str) -> int:
    """First 32 bits of md5(s) — the split_assign/mix_sample hash fold."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def shuffle_shards(sf_dir: str, n_shards: int = 16) -> "rd.Dataset":
    """(doc_id, shard, h, pos): deterministic global shuffle of the corpus
    into ``n_shards`` training shards — the write-side step before
    sequence packing.  ``shard = md5_32('shuf:'||doc_id) % n_shards``;
    ``pos`` is the document's 0-based position within its shard under the
    shuffled order ``(h, doc_id)``.  Hash-seeded like ``split_assign``:
    no RNG state, so a resumed or re-run job lands every document in the
    same shard slot.

    Ray shape — the pack_sequences two-level prefix scan transposed onto
    hash order (textstats.py:542):

    1. one stateless pass computes the narrow (doc_id, h, shard, hb)
       table, where ``hb = h >> (32-_HB_BITS)`` is a coarse bucket of the
       within-shard sort order (md5 is uniform, so buckets are balanced);
    2. ``groupby(shard*2^B + hb)`` row counts — n_shards * 2^B rows cross
       the wire, KBs at any corpus size — and the driver cumsums them in
       (shard, hb) order into exclusive offsets, broadcast once;
    3. ``groupby(key).map_groups`` sorts each bucket by (h, doc_id) and
       adds ``offset + arange`` — ONE hash shuffle of the narrow table.

    At 10^10+ docs widen _HB_BITS so buckets stay under block size; the
    offset table grows only with 2^B.  Oracle: ``row_number() OVER
    (PARTITION BY shard ORDER BY h, doc_id) - 1``.
    """
    import ray

    def fold(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h = np.fromiter(
            (_md5_fold32(f"shuf:{d}") for d in ids), np.int64, len(ids)
        )
        shard = h % n_shards
        hb = h >> (32 - _HB_BITS)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(h, pa.int64()),
                "shard": pa.array(shard, pa.int64()),
                "key": pa.array(shard * (1 << _HB_BITS) + hb, pa.int64()),
            }
        )

    narrow = (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(fold, batch_format="pyarrow")
        .materialize()  # 32 B/doc; scanned twice (counts, then rank pass)
    )

    from ray.data.aggregate import Count

    counts = (
        narrow.groupby("key")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("key")  # key order == (shard, hb) order
    )
    csum = counts["n"].astype("int64").cumsum()
    excl = (csum - counts["n"]).to_numpy()
    # per-shard exclusive offsets: subtract each shard's first cumsum base
    keys = counts["key"].to_numpy()
    shard_of = keys >> _HB_BITS
    shard_base = {}
    offsets = {}
    for k, off, s in zip(keys, excl, shard_of):
        if s not in shard_base:
            shard_base[s] = off
        offsets[int(k)] = int(off - shard_base[s])
    off_ref = ray.put(offsets)

    def rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        g = group.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        base = ray.get(off_ref)[int(g["key"][0].as_py())]
        pos = base + np.arange(g.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "shard": g["shard"],
                "h": g["h"],
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return narrow.groupby("key").map_groups(rank, batch_format="pyarrow")


def lm_familiarity(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_bigrams, sum_bg_freq, n_hapax): corpus bigram-LM
    familiarity scoring — the CCNet/KenLM-style quality signal that ranks
    documents by how typical their word transitions are of the corpus.
    For each document, over its word bigrams (single-space split for SQL
    parity): ``sum_bg_freq`` is the sum of corpus-wide occurrence counts
    of each bigram, ``n_hapax`` counts bigrams whose corpus count is 1
    (seen nowhere else — gibberish indicator).  Integer totals, so the
    oracle hash-matches regardless of summation order.

    Ray shape — train-then-broadcast, the standard LM-scoring pattern:

    1. per-batch bigram-count partials → ``groupby(g).sum`` — the only
       shuffle, over (gram, count) partials already combined per block;
    2. the model table streams to the driver and broadcasts ONCE via
       ``ray.put`` (at 100 TB the model is pruned/quantized before
       broadcast exactly as KenLM binaries are; the no-broadcast
       alternative — explode doc bigrams and co-partition-join against
       the count table — trades one more corpus-sized shuffle for zero
       driver state);
    3. a stateless scoring pass reads the broadcast dict per actor.
    """
    import ray

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bigram_partials(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t["text"].to_pylist():
            w = text.split(" ")
            for i in range(len(w) - 1):
                g = w[i] + " " + w[i + 1]
                counts[g] = counts.get(g, 0) + 1
        return pa.table(
            {
                "g": pa.array(list(counts.keys()), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    model: dict = {}
    for part in (
        docs.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("c", alias_name="c"))
        .iter_batches(batch_format="pyarrow")
    ):
        model.update(zip(part["g"].to_pylist(), part["c"].to_pylist()))
    model_ref = ray.put(model)

    class Score:
        def __init__(self, ref):
            self.model = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self.model
            nb, freq, hap = [], [], []
            for text in t["text"].to_pylist():
                w = text.split(" ")
                s = h = 0
                for i in range(len(w) - 1):
                    c = m[w[i] + " " + w[i + 1]]
                    s += c
                    if c == 1:
                        h += 1
                nb.append(max(len(w) - 1, 0))
                freq.append(s)
                hap.append(h)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_bigrams": pa.array(nb, pa.int64()),
                    "sum_bg_freq": pa.array(freq, pa.int64()),
                    "n_hapax": pa.array(hap, pa.int64()),
                }
            )

    return docs.map_batches(
        Score,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


def quantile_gate(sf_dir: str, q_pct: int = 25) -> "rd.Dataset":
    """(doc_id, n_tokens): global length-quantile gate — keep documents
    whose whitespace token count is at or above the corpus ``q_pct``-th
    percentile.  The threshold is defined constructively (smallest v with
    ``100 * count(n_tokens <= v) >= q_pct * total``, i.e. quantile_disc
    semantics) so Ray and SQL agree exactly.

    Ray shape — exact global quantile WITHOUT a global sort: token counts
    have a bounded value domain, so a ``groupby(n_tokens).count``
    value-histogram (domain-cardinality rows cross the wire, not corpus
    rows) feeds a driver-side cumsum that picks the threshold; the gate
    itself is a stateless filter over the materialized narrow
    (doc_id, n_tokens) table.  At 100 TB with long-tail lengths, bucket
    the histogram (n_tokens // W) and refine within the winning bucket —
    two histogram passes, still no sort.
    """

    def count_fn(t: pa.Table) -> pa.Table:
        n = [len(_TOKEN_RE.findall(x)) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pa.array(n, pa.int64())}
        )

    narrow = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(count_fn, batch_format="pyarrow")
        .materialize()  # 16 B/doc; tokenization runs once
    )

    from ray.data.aggregate import Count

    hist = (
        narrow.groupby("n_tokens")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("n_tokens")
    )
    cum = hist["c"].astype("int64").cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    idx = np.searchsorted(cum * 100, q_pct * total, side="left")
    threshold = int(hist["n_tokens"].iloc[int(idx)]) if total else 0

    return narrow.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"], threshold)),
        batch_format="pyarrow",
    )


def inverted_index(sf_dir: str) -> "rd.Dataset":
    """(term, df, postings): full-text inverted index over the corpus —
    each whitespace term with its document frequency and its posting list
    (comma-joined sorted doc_ids, the exact-parity encoding; a production
    sink would delta-encode ints).  The retrieval-side artifact a corpus
    engine emits next to the training shards.

    Ray shape: per-batch DISTINCT (term, doc_id) partials →
    ``groupby(term).map_groups`` sorting each group's doc_ids — ONE hash
    shuffle, term-partitioned output (the natural index layout: a term's
    posting list lives in exactly one partition).  At 100 TB posting
    lists for stop-terms get long — cap or tier them (store df only past
    a length bound) exactly as web indexes do; the shuffle itself is on
    (term, doc_id) pairs, never full documents.
    """
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def term_doc(t: pa.Table) -> pa.Table:
        seen = set()
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in set(text.split(" ")):
                seen.add((w, did))
        items = sorted(seen)
        return pa.table(
            {
                "term": pa.array([w for w, _ in items], pa.string()),
                "doc_id": pa.array([d for _, d in items], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        ids = sorted(set(group["doc_id"].to_pylist()))
        return pa.table(
            {
                "term": pa.array([group["term"][0].as_py()], pa.string()),
                "df": pa.array([len(ids)], pa.int64()),
                "postings": pa.array(
                    [",".join(str(i) for i in ids)], pa.string()
                ),
            }
        )

    return (
        docs.map_batches(term_doc, batch_format="pyarrow")
        .groupby("term")
        .map_groups(fold, batch_format="pyarrow")
    )


def bpe_merges(sf_dir: str, n_merges: int = 8) -> pd.DataFrame:
    """(rank, left, right, pair_count): distributed BPE tokenizer-vocab
    induction — the Sennrich byte-pair-encoding trainer run as an
    iterative Ray Data job.  Words become symbol sequences (chars +
    ``</w>``); each round counts adjacent symbol pairs weighted by word
    frequency (overlapping occurrences count, as in the reference
    algorithm), merges the globally most frequent pair (ties: smallest
    (left, right) lexicographically — deterministic across partitions and
    engines), and rewrites the vocabulary left-to-right non-overlapping.

    Ray shape — the word-frequency table is the working set, NOT the
    corpus: one corpus-sized ``groupby(word).sum`` builds it (the only
    corpus-volume exchange), then every merge round runs over the
    vocab-sized table: per-batch pair-count partials → ``groupby(pair)
    .sum`` → per-block argmax → a driver fold over n_blocks candidates →
    ``ray.put`` the winning pair → a stateless rewrite pass, materialized
    per round so lineage stays one round deep (the PageRank BSP pattern,
    graph.py).  At web scale the vocab table is millions of rows — the
    per-round shuffles move (pair, count) partials only, and the corpus
    is never touched again after round 0.

    Rows-only query (iterative argmax has no SQL analog); exactness is
    asserted against an independent single-process reference in
    tests/test_curation.py.
    """
    import ray

    docs = _read_docs(sf_dir, ["text"])

    def word_partials(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t["text"].to_pylist():
            for w in text.split(" "):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "freq": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    def to_syms(t: pa.Table) -> pa.Table:
        syms = [
            " ".join(list(w) + ["</w>"]) for w in t["word"].to_pylist()
        ]
        return pa.table(
            {"syms": pa.array(syms, pa.string()), "freq": t["freq"]}
        )

    vocab = (
        docs.map_batches(word_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
        .map_batches(to_syms, batch_format="pyarrow")
        .materialize()
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for syms, f in zip(t["syms"].to_pylist(), t["freq"].to_pylist()):
            s = syms.split(" ")
            for i in range(len(s) - 1):
                p = s[i] + "\x1f" + s[i + 1]
                counts[p] = counts.get(p, 0) + f
        return pa.table(
            {
                "p": pa.array(list(counts.keys()), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def local_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        # max count; ties by SMALLEST pair string (codepoint order)
        best = min(
            zip(t["c"].to_pylist(), t["p"].to_pylist()),
            key=lambda x: (-x[0], x[1]),
        )
        return pa.table(
            {
                "p": pa.array([best[1]], pa.string()),
                "c": pa.array([best[0]], pa.int64()),
            }
        )

    merges = []
    for rank in range(n_merges):
        cand = (
            vocab.map_batches(pair_partials, batch_format="pyarrow")
            .groupby("p")
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(local_best, batch_format="pyarrow")
            .to_pandas()
        )
        if cand.empty:
            break
        cand = cand.sort_values(
            ["c", "p"], ascending=[False, True]
        ).iloc[0]
        left, right = cand["p"].split("\x1f")
        count = int(cand["c"])
        merges.append((rank, left, right, count))
        pair_ref = ray.put((left, right))

        def rewrite(t: pa.Table, _ref=pair_ref) -> pa.Table:
            lft, rgt = ray.get(_ref)
            merged = lft + rgt
            out = []
            for syms in t["syms"].to_pylist():
                s = syms.split(" ")
                res, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == lft
                        and s[i + 1] == rgt
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(" ".join(res))
            return pa.table(
                {
                    "syms": pa.array(out, pa.string()),
                    "freq": t["freq"],
                }
            )

        vocab = vocab.map_batches(
            rewrite, batch_format="pyarrow"
        ).materialize()

    return pd.DataFrame(
        {
            "rank": pd.array([m[0] for m in merges], dtype="int64"),
            "left": [m[1] for m in merges],
            "right": [m[2] for m in merges],
            "pair_count": pd.array([m[3] for m in merges], dtype="int64"),
        }
    )


def source_overlap(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """(src_a, src_b, shared_grams): cross-source contamination audit —
    for every unordered pair of sources, the number of DISTINCT word
    ``n``-grams appearing in both.  High overlap between two sources
    means mixing weights double-count the same content (the audit run
    before ``source_mix_weights``).

    Ray shape — bitmask sum-aggregation, NO per-group Python:

    1. per-batch DISTINCT (gram, source_id) partials (sources get dense
       ids from one tiny pre-scan of the source column);
    2. ``groupby(gram||sep||src)`` count — the global dedupe, one hash
       shuffle, vectorized;
    3. unpack to (gram, 1 << src_id) and ``groupby(gram).Sum`` — because
       step 2 made rows unique, the SUM of single-bit masks IS the
       bitwise OR: each gram reduces to one int64 source bitmask;
    4. a stateless pass expands set-bit pairs per DISTINCT mask value
       (memoized — the number of distinct masks is bounded by observed
       source combinations, not grams) into per-batch pair-count
       partials; the final pair frame is <= S^2/2 rows and folds on the
       driver.

    Requires <= 63 sources per bitmask word (loud guard); at a wider
    source taxonomy the mask becomes a fixed-length list of words and
    step 3 sums each word — same shape.  Gram strings in the step-2/3
    shuffles pack to md5-int64 at 100 TB (the _with_pair_key trick);
    string keys here keep sf-scale SQL parity readable.
    """
    docs = _read_docs(sf_dir, ["source", "text"])

    srcs = sorted(docs.select_columns(["source"]).unique("source"))
    if len(srcs) > 63:
        raise ValueError(
            f"{len(srcs)} sources exceed the 63-bit mask word; extend "
            "source_overlap to multi-word bitmasks"
        )
    sid = {s: i for i, s in enumerate(srcs)}

    def gram_src(t: pa.Table) -> pa.Table:
        seen = set()
        for s, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            i = sid[s]
            w = text.split(" ")
            for j in range(len(w) - n + 1):
                seen.add((" ".join(w[j : j + n]), i))
        return pa.table(
            {
                "k": pa.array(
                    [f"{g}\x1f{i}" for g, i in seen], pa.string()
                ),
            }
        )

    from ray.data.aggregate import Count, Sum

    uniq = (
        docs.map_batches(gram_src, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="_"))
    )

    def unpack(t: pa.Table) -> pa.Table:
        ks = t["k"].to_pylist()
        g, m = [], []
        for k in ks:
            gram, _, i = k.rpartition("\x1f")
            g.append(gram)
            m.append(1 << int(i))
        return pa.table(
            {
                "g": pa.array(g, pa.string()),
                "mask": pa.array(m, pa.int64()),
            }
        )

    masks = (
        uniq.map_batches(unpack, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("mask", alias_name="mask"))
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        memo: dict = {}
        agg: dict = {}
        for mask in t["mask"].to_pylist():
            pairs = memo.get(mask)
            if pairs is None:
                bits = [b for b in range(64) if mask >> b & 1]
                pairs = [
                    (a, b)
                    for ai, a in enumerate(bits)
                    for b in bits[ai + 1 :]
                ]
                memo[mask] = pairs
            for p in pairs:
                agg[p] = agg.get(p, 0) + 1
        items = list(agg.items())
        return pa.table(
            {
                "a": pa.array([p[0] for p, _ in items], pa.int64()),
                "b": pa.array([p[1] for p, _ in items], pa.int64()),
                "n": pa.array([c for _, c in items], pa.int64()),
            }
        )

    out: dict = {}
    for part in masks.map_batches(
        pair_partials, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for a, b, c in zip(
            part["a"].to_pylist(), part["b"].to_pylist(), part["n"].to_pylist()
        ):
            out[(a, b)] = out.get((a, b), 0) + c
    rows = sorted((srcs[a], srcs[b], c) for (a, b), c in out.items())
    return pd.DataFrame(
        {
            "src_a": [r[0] for r in rows],
            "src_b": [r[1] for r in rows],
            "shared_grams": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def _md5_int63(s: bytes) -> int:
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big") >> 1


def snapshot_diff(a: "rd.Dataset", b: "rd.Dataset") -> pd.DataFrame:
    """(host, n_added, n_removed, n_changed, n_same): recrawl snapshot
    diff — compare two crawls' pages tables (url, html) and roll the
    per-URL verdicts up per host: present only in B (added), only in A
    (removed), in both with different content hash (changed) or the same
    (same).  The table a recrawl scheduler reads to set per-host revisit
    rates.

    Ray shape — the side-flag fold (same trick as q_anti_join): each
    side streams (url, host, in_a, in_b, ha, hb) rows with -1 sentinels
    for the absent side; ONE ``groupby(url)`` of Max aggregates merges
    the two snapshots without a join operator or broadcast (content
    hashes ride the fold, full pages never shuffle); verdicts
    pre-aggregate per host per block and meet in a host-cardinality
    groupby.
    """
    import ray.data as rd  # noqa: F811  (kept local for clarity)
    from ray.data.aggregate import Max, Sum

    def side(in_a: int):
        def fn(t: pa.Table) -> pa.Table:
            urls = t["url"].to_pylist()
            hs = [_md5_int63(x) for x in t["html"].to_pylist()]
            hosts = [u.split("/", 3)[2] for u in urls]
            n = len(urls)
            return pa.table(
                {
                    "url": t["url"],
                    "host": pa.array(hosts, pa.string()),
                    "in_a": pa.array([in_a] * n, pa.int64()),
                    "in_b": pa.array([1 - in_a] * n, pa.int64()),
                    "ha": pa.array(
                        hs if in_a else [-1] * n, pa.int64()
                    ),
                    "hb": pa.array(
                        hs if not in_a else [-1] * n, pa.int64()
                    ),
                }
            )

        return fn

    both = a.map_batches(side(1), batch_format="pyarrow").union(
        b.map_batches(side(0), batch_format="pyarrow")
    )
    folded = both.groupby("url").aggregate(
        Max("in_a", alias_name="in_a"),
        Max("in_b", alias_name="in_b"),
        Max("ha", alias_name="ha"),
        Max("hb", alias_name="hb"),
        Max("host", alias_name="host"),
    )

    def verdict_partial(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for host, ia, ib, ha, hb in zip(
            t["host"].to_pylist(),
            t["in_a"].to_pylist(),
            t["in_b"].to_pylist(),
            t["ha"].to_pylist(),
            t["hb"].to_pylist(),
        ):
            v = agg.setdefault(host, [0, 0, 0, 0])
            if ia and ib:
                if ha == hb:
                    v[3] += 1
                else:
                    v[2] += 1
            elif ib:
                v[0] += 1
            else:
                v[1] += 1
        items = sorted(agg.items())
        return pa.table(
            {
                "host": pa.array([h for h, _ in items], pa.string()),
                "n_added": pa.array([v[0] for _, v in items], pa.int64()),
                "n_removed": pa.array([v[1] for _, v in items], pa.int64()),
                "n_changed": pa.array([v[2] for _, v in items], pa.int64()),
                "n_same": pa.array([v[3] for _, v in items], pa.int64()),
            }
        )

    out = (
        folded.map_batches(verdict_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_added", alias_name="n_added"),
            Sum("n_removed", alias_name="n_removed"),
            Sum("n_changed", alias_name="n_changed"),
            Sum("n_same", alias_name="n_same"),
        )
        .to_pandas()
    )
    for c in ("n_added", "n_removed", "n_changed", "n_same"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


_DIGIT_RE = None  # compiled lazily so the module import stays light


def url_patterns(pages: "rd.Dataset") -> pd.DataFrame:
    """(host, n_urls, n_patterns, max_urls_per_pattern): crawl-trap
    detection — fold every URL to its template (digit runs → 'D', so
    /2024/01/05/ and /2023/12/31/ collapse to /D/D/D/) and count URLs vs
    distinct templates per host.  A host whose max_urls_per_pattern
    explodes is a calendar/session-id trap: infinitely many URLs, one
    template — the frontier should cap it.

    Ray shape: per-batch (host, pattern) pair counts → ONE
    ``groupby(host||sep||pattern)`` sum (vectorized; pattern cardinality
    per host is tiny by construction — that is the point of the fold) →
    per-batch host partials (n_urls, n_patterns, max) → a
    host-cardinality groupby.  Max of per-pattern counts is associative
    AFTER the global pattern sum, which the first groupby guarantees.
    """
    import re

    import ray.data as rd  # noqa: F811
    from ray.data.aggregate import Max, Sum

    global _DIGIT_RE
    if _DIGIT_RE is None:
        _DIGIT_RE = re.compile(r"[0-9]+")

    def pair_partials(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for u in t["url"].to_pylist():
            host = u.split("/", 3)[2]
            path = u.split("/", 3)[3] if u.count("/") >= 3 else ""
            pat = _DIGIT_RE.sub("D", path)
            k = host + "\x1f" + pat
            agg[k] = agg.get(k, 0) + 1
        items = list(agg.items())
        return pa.table(
            {
                "k": pa.array([k for k, _ in items], pa.string()),
                "n": pa.array([c for _, c in items], pa.int64()),
            }
        )

    def host_partials(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for k, n in zip(t["k"].to_pylist(), t["n"].to_pylist()):
            host = k.split("\x1f", 1)[0]
            u, p, m = agg.get(host, (0, 0, 0))
            agg[host] = (u + n, p + 1, max(m, n))
        items = sorted(agg.items())
        return pa.table(
            {
                "host": pa.array([h for h, _ in items], pa.string()),
                "n_urls": pa.array([v[0] for _, v in items], pa.int64()),
                "n_patterns": pa.array([v[1] for _, v in items], pa.int64()),
                "max_urls_per_pattern": pa.array(
                    [v[2] for _, v in items], pa.int64()
                ),
            }
        )

    out = (
        pages.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(host_partials, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_urls", alias_name="n_urls"),
            Sum("n_patterns", alias_name="n_patterns"),
            Max("max_urls_per_pattern", alias_name="max_urls_per_pattern"),
        )
        .to_pandas()
    )
    for c in ("n_urls", "n_patterns", "max_urls_per_pattern"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def embedding_centroids(sf_dir: str, dim: int = 64) -> pd.DataFrame:
    """(label, dim, n_vecs, sum_e6, centroid): per-label mean embedding —
    the k-means E-step / IVF-training building block, as an exact
    distributed aggregate.  Vector components quantize to e6 integers
    with FLOOR (float32 x 1e6 is exact in double — 44 mantissa bits — so
    floor is unambiguous, unlike round's half-tie modes); integer sums
    are associative, and ``centroid`` is one double division of
    identical integers on both sides.

    Ray shape: per-batch numpy accumulation — vectors stack to an (n, d)
    matrix, labels bucket via ``np.add.at`` — emitting (label, dim,
    n, sum) partials; ONE ``groupby(label*d + dim)`` Sum over
    labels x d rows per block.  The corpus never shuffles; only
    centroid-sized partials do.  SQL oracle: generate_series unnest +
    GROUP BY (label, dim).
    """
    import ray.data as rd  # noqa: F811
    from ray.data.aggregate import Sum

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partials(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_col_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(mat * 1_000_000).astype(np.int64)
        uniq = np.unique(labels)
        rows_k, rows_n, rows_s = [], [], []
        for lb in uniq:
            mask = labels == lb
            s = q[mask].sum(axis=0)
            n = int(mask.sum())
            for d in range(q.shape[1]):
                rows_k.append(int(lb) * dim + d)
                rows_n.append(n)
                rows_s.append(int(s[d]))
        return pa.table(
            {
                "k": pa.array(rows_k, pa.int64()),
                "n_vecs": pa.array(rows_n, pa.int64()),
                "sum_e6": pa.array(rows_s, pa.int64()),
            }
        )

    out = (
        emb.map_batches(partials, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("sum_e6", alias_name="sum_e6"),
        )
        .to_pandas()
    )
    out["label"] = (out["k"] // dim).astype("int64")
    out["dim"] = (out["k"] % dim).astype("int64")
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["sum_e6"] = out["sum_e6"].astype("int64")
    out["centroid"] = out["sum_e6"].astype("float64") / (
        out["n_vecs"] * 1_000_000.0
    )
    return (
        out[["label", "dim", "n_vecs", "sum_e6", "centroid"]]
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )


def dsir_select(
    sf_dir: str,
    n_buckets: int = 1024,
    top_n: int = 200,
    target_mod: int = 7,
) -> pd.DataFrame:
    """(doc_id, dsir_score): DSIR data selection — rank raw documents by
    hashed-n-gram importance weights against a target domain and keep the
    ``top_n`` (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling": fit bag-of-hashed-bigrams unigram models over
    the target and raw sets, score each raw doc by its importance
    log-ratio, resample by weight).  The target domain here is the
    deterministic pseudo-domain ``doc_id % target_mod == 0``; selection
    is exact top-k by weight (the paper's Gumbel noise is an injected-
    randomness knob, omitted so the result is reproducible and
    SQL-oracled).

    Per-bucket log-ratio, in e6 fixed point so the DuckDB oracle is
    bit-exact (``ln`` lowers to the same libm on both engines — verified
    property, and floor of an identical double is exact):

        lr_b = floor(1e6 * (ln((t_b+1)/(T+K)) - ln((r_b+1)/(R+K))))

    with t_b/r_b the bucket's bigram-occurrence counts in target/raw, T/R
    the totals, K = ``n_buckets`` (add-one smoothing over the hashed
    vocabulary).  ``dsir_score = sum(lr_bucket(g) for g in doc bigrams)``
    — an int64 sum, order-independent.  Bigrams/buckets use the repo-wide
    md5 idiom (``int(md5(g)[:8],16) % K``, embed_docs/textstats.py:499)
    and lm_familiarity's single-space tokenization for SQL parity.

    Ray shape — the standard fit-then-broadcast two-pass:

      1. FIT: per-block (bucket, t_cnt, r_cnt) partials (dict-combined
         per batch, ≤K rows each) → ``groupby(bucket).sum`` — the only
         shuffle, K-bounded;
      2. the K-row model folds to a driver int64 array (8 KB at K=1024)
         and broadcasts ONCE via ``ray.put`` — at 100 TB the model stays
         K-sized: it never grows with the corpus;
      3. SCORE: stateless actor-pool pass, per-actor bigram→bucket memo
         (same warm-cache pattern as embed_docs), int64 gather-sum;
      4. SELECT: per-batch ``select_k_unstable`` partial top-k, tiny
         driver merge — top_n × n_blocks rows, never the corpus.
    """
    import math

    import ray
    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bucket_partials(t: pa.Table) -> pa.Table:
        tc: dict = {}
        rc: dict = {}
        memo: dict = {}
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            is_target = did % target_mod == 0
            w = text.split(" ")
            for i in range(len(w) - 1):
                g = w[i] + " " + w[i + 1]
                b = memo.get(g)
                if b is None:
                    b = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % n_buckets
                    memo[g] = b
                rc[b] = rc.get(b, 0) + 1
                if is_target:
                    tc[b] = tc.get(b, 0) + 1
        buckets = sorted(rc)
        return pa.table(
            {
                "b": pa.array(buckets, pa.int64()),
                "t_cnt": pa.array([tc.get(b, 0) for b in buckets], pa.int64()),
                "r_cnt": pa.array([rc[b] for b in buckets], pa.int64()),
            }
        )

    model = (
        docs.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("t_cnt", alias_name="t_cnt"), Sum("r_cnt", alias_name="r_cnt"))
        .to_pandas()
    )
    T = int(model["t_cnt"].sum())
    R = int(model["r_cnt"].sum())
    lr = np.zeros(n_buckets, dtype=np.int64)
    for b, t_cnt, r_cnt in zip(model["b"], model["t_cnt"], model["r_cnt"]):
        lr[int(b)] = math.floor(
            1e6
            * (
                math.log((int(t_cnt) + 1.0) / (T + n_buckets * 1.0))
                - math.log((int(r_cnt) + 1.0) / (R + n_buckets * 1.0))
            )
        )
    # buckets never observed keep lr=0: no document contains them, so the
    # value is unread — zero only so the array is total
    lr_ref = ray.put(lr)

    class Score:
        def __init__(self, ref):
            self.lr = ray.get(ref)
            self.memo: dict = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            lr_arr = self.lr
            memo = self.memo
            scores = []
            for text in t["text"].to_pylist():
                w = text.split(" ")
                s = 0
                for i in range(len(w) - 1):
                    g = w[i] + " " + w[i + 1]
                    b = memo.get(g)
                    if b is None:
                        b = (
                            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                            % n_buckets
                        )
                        memo[g] = b
                    s += int(lr_arr[b])
                scores.append(s)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "dsir_score": pa.array(scores, pa.int64()),
                }
            )

    scored = docs.map_batches(
        Score,
        fn_constructor_args=(lr_ref,),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )

    def batch_topn(t: pa.Table) -> pa.Table:
        n = min(top_n, t.num_rows)
        idx = pc.select_k_unstable(
            t, n, [("dsir_score", "descending"), ("doc_id", "ascending")]
        )
        return t.take(idx)

    return (
        scored.map_batches(batch_topn, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["dsir_score", "doc_id"], ascending=[False, True])
        .head(top_n)
        .reset_index(drop=True)
    )


def _quantize_embeddings(t: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
    """(vec_ids, Q) — e6-FLOOR-quantized int64 embedding matrix (the
    embedding_centroids contract: float32 x 1e6 is exact in double, so
    floor is unambiguous on both engines)."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_col_matrix(t["embedding"]).astype(np.float64)
    return ids, np.floor(mat * 1_000_000).astype(np.int64)


def _assign_clusters(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c sum_d (q - c)^2 in exact int64; ties -> lowest cluster id
    (np.argmin returns the first minimum, clusters ordered 0..k-1)."""
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int64)


def _min_k_vectors(emb_path: str, k: int) -> np.ndarray:
    """(k, dim) e6-quantized init matrix of the k smallest vec_ids, in
    ONE streaming pass: each block contributes its own k smallest rows
    (ids AND vectors), the driver keeps the global k — k x n_blocks rows
    ever leave the scan, never the corpus."""
    def min_k_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        take = np.argsort(ids)[:k]
        return t.take(pa.array(take))

    tbl = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(min_k_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .head(k)
    )
    ids0, q0 = _quantize_embeddings(pa.Table.from_pandas(tbl))
    return q0[np.argsort(ids0)]


def semdedup_select(sf_dir: str, k: int = 8, tau2_num: int = 16,
                    tau2_den: int = 100, cluster_cap: int = 8192,
                    dim: int = 64) -> pd.DataFrame:
    """(vec_id, cluster, n_dups, kept): SEMANTIC dedup (SemDeDup, Abbas
    et al. 2023): k-means-cluster the embedding space, then inside each
    cluster drop every vector that is near-duplicate (cosine^2 >
    tau2_num/tau2_den AND cosine positive, i.e. cos > 0.4 for 16/100 --
    the embedding_neardup_pairs threshold convention) of an earlier-id
    member — the keep-first-by-id variant of the paper's within-cluster
    epsilon-ball pruning, chosen because it is deterministic and
    SQL-mirrorable (the paper keeps the member farthest from the
    centroid; the clustering-then-local-prune structure is identical).

    EXACT end to end, so the DuckDB oracle hash-matches:
      - embeddings quantize to e6 ints with FLOOR (embedding_centroids
        contract); all distances/dots are int64 integer sums.
      - init centroids = the k smallest vec_ids' vectors (cluster id =
        vec_id rank); ONE Lloyd update (assign -> per-cluster floored
        integer mean, empty cluster keeps its init centroid); final
        assignment under the updated centroids.
      - near-dup test cross-multiplies integers -- tau2_den * dot^2 >
        tau2_num * |a|^2 * |b|^2 and dot > 0 -- evaluated with a float64
        prefilter plus arbitrary-precision recheck inside the float
        error band (the SQL side uses HUGEINT).

    Ray shape (nothing corpus-sized on the driver):
      1. min-k partials per block -> driver merges k ids -> pushdown
         point-read of the k init vectors.
      2. Lloyd pass: map_batches emits per-cluster (count, sum-blob)
         partials -- k rows per block, merged on the driver (k x dim x 8
         bytes; the corpus itself never moves).
      3. final pass emits (cluster, vec_id, q-blob); ONE
         groupby(cluster) exchange; per-cluster vectorized int64 matmul
         against at most ``cluster_cap`` earliest-id referees, so a hot
         cluster costs O(m * cap * dim), never O(m^2 * dim).
    At 10^9 vectors k scales ~sqrt(n) so clusters stay cap-bounded; the
    centroid table (k x dim x 8 B) broadcasts inside the task closure.
    Reference analog: none (training-data curation surface)."""
    emb_path = f"{sf_dir}/embeddings.parquet"

    cents0 = _min_k_vectors(emb_path, k)  # cluster id = vec_id rank

    def lloyd_partial(t: pa.Table) -> pa.Table:
        _, q = _quantize_embeddings(t)
        a = _assign_clusters(q, cents0)
        rows_c, rows_n, rows_s = [], [], []
        for c in np.unique(a):
            mask = a == c
            rows_c.append(int(c))
            rows_n.append(int(mask.sum()))
            rows_s.append(q[mask].sum(axis=0).tobytes())
        return pa.table(
            {
                "cluster": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array(rows_s, pa.binary()),
            }
        )

    parts = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(lloyd_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cents1 = cents0.copy()
    for c in range(k):
        sub = parts[parts["cluster"] == c]
        n = int(sub["n"].sum())
        if n > 0:
            s = np.zeros(dim, dtype=np.int64)
            for blob in sub["s"]:
                s += np.frombuffer(blob, dtype=np.int64)
            cents1[c] = np.floor_divide(s, n)

    def final_assign(t: pa.Table) -> pa.Table:
        ids, q = _quantize_embeddings(t)
        a = _assign_clusters(q, cents1)
        return pa.table(
            {
                "cluster": pa.array(a),
                "vec_id": pa.array(ids),
                "qblob": pa.array([row.tobytes() for row in q], pa.binary()),
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        q = np.stack([np.frombuffer(b, dtype=np.int64) for b in g["qblob"]])
        m = len(g)
        n2 = (q * q).sum(axis=1)  # <= 64 * (1.06e6)^2 ~ 7e13: int64-exact
        r = min(m, cluster_cap)
        dot = q @ q[:r].T  # int64-exact (|dot| <= 1.8e13 < 2^53)
        # strict lower-triangle vs referee rank: referee j qualifies for
        # member i iff vec_id_j < vec_id_i (ids sorted, so j < i)
        lhs = float(tau2_den) * dot.astype(np.float64) ** 2
        rhs = float(tau2_num) * np.outer(
            n2.astype(np.float64), n2[:r].astype(np.float64)
        )
        band = 1e14  # >> float64 abs error at 3e28 (~3e12)
        sure = (dot > 0) & (lhs > rhs + band)
        amb = (dot > 0) & (np.abs(lhs - rhs) <= band)
        cond = sure
        for i, j in zip(*np.nonzero(amb)):
            di, ni, nj = int(dot[i, j]), int(n2[i]), int(n2[j])
            cond[i, j] = tau2_den * di * di > tau2_num * ni * nj
        tri = np.tri(m, r, -1, dtype=bool)  # j < i only
        n_dups = (cond & tri).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].to_numpy(dtype=np.int64),
                "cluster": g["cluster"].to_numpy(dtype=np.int64),
                "n_dups": n_dups,
                "kept": (n_dups == 0).astype(np.int64),
            }
        )

    out = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(final_assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("vec_id").reset_index(drop=True)


def recrawl_priority(sf_dir: str) -> pd.DataFrame:
    """(page_id, n_obs, n_changes, span_us, staleness_us, lambda_e6,
    score): ADAPTIVE RECRAWL scheduling (Cho & Garcia-Molina 2003) — fit
    a per-page Poisson change rate from fetch-observation history and
    rank pages by expected staleness, the policy a 10^10-URL frontier
    uses to decide what to refetch next.

    Observation model over the events table: each event row is one fetch
    observation of page ``user_id``; the page had changed since the
    previous fetch iff ``event_type <> 'view'``.  The classic
    repeated-access estimator with add-half smoothing:

        lambda = -ln((n - X + 0.5) / (n + 0.5)) / (span / day)

    (n observations, X detected changes, span = last-first observation).
    ``lambda_e6 = floor(1e6 * lambda)`` rides the dsir_select ln-parity
    contract (libm ``math.log`` per value; identical IEEE op sequence in
    the DuckDB oracle), and ``score = lambda_e6 * staleness_seconds`` is
    a pure int64 product (<= 2e7 * 3e6), so the driver hash is exact.
    Pages observed once (span 0) get lambda_e6 = 0: no evidence, lowest
    refresh priority.

    Ray shape: per-block pandas groupby partials (page, n, x, min_ts,
    max_ts) -> ONE pre-reduced groupby(page_id) exchange (4 int64 cols,
    never the event payload) -> the final per-page frame IS the query
    result; t_now = max(max_ts) folds from the same frame.  At 10^10
    URLs the output is written partitioned by hash(page_id) instead of
    collected.  Reference analog: none (frontier-policy surface)."""
    import math

    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "page_id": t["user_id"].to_numpy(zero_copy_only=False),
                "us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                "chg": (
                    pc.not_equal(t["event_type"], "view")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )
        g = df.groupby("page_id", sort=False).agg(
            n=("us", "size"), x=("chg", "sum"),
            min_us=("us", "min"), max_us=("us", "max"),
        )
        return pa.Table.from_pandas(g.reset_index())

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("page_id")
        .aggregate(
            Sum("n", alias_name="n_obs"),
            Sum("x", alias_name="n_changes"),
            Min("min_us", alias_name="min_us"),
            Max("max_us", alias_name="max_us"),
        )
        .to_pandas()
    )
    for c in ("n_obs", "n_changes", "min_us", "max_us"):
        out[c] = out[c].astype("int64")
    t_now = int(out["max_us"].max())
    out["span_us"] = out["max_us"] - out["min_us"]
    out["staleness_us"] = t_now - out["max_us"]
    lam = []
    for n, x, span in zip(out["n_obs"], out["n_changes"], out["span_us"]):
        if span == 0:
            lam.append(0)
        else:
            r = (int(n) - int(x) + 0.5) / (int(n) + 0.5)
            lam.append(
                int(math.floor(
                    1000000.0 * (-math.log(r) / (span / 86400000000.0))
                ))
            )
    out["lambda_e6"] = pd.Series(lam, dtype="int64")
    out["score"] = out["lambda_e6"] * (out["staleness_us"] // 1_000_000)
    return (
        out[["page_id", "n_obs", "n_changes", "span_us", "staleness_us",
             "lambda_e6", "score"]]
        .sort_values("page_id")
        .reset_index(drop=True)
    )


def pq_encode(sf_dir: str, n_sub: int = 8, k: int = 16,
              dim: int = 64) -> pd.DataFrame:
    """(vec_id, subspace, code): PRODUCT QUANTIZATION encoding (Jegou et
    al. 2011) — the vector-compression path that lets a 10^9-vector ANN
    index hold 8 bytes/vector instead of 256: split each embedding into
    ``n_sub`` subvectors and quantize each against a per-subspace
    ``k``-entry codebook trained by the same fixed-point distributed
    k-means as ``semdedup_select``.

    EXACT end to end (the DuckDB oracle hash-matches): e6-FLOOR
    quantization, init codebooks = the ``k`` smallest vec_ids' subvectors
    (codeword id = vec_id rank), ONE Lloyd update with floored integer
    means (empty codeword keeps its init), final per-subspace argmin
    assignment in int64 with ties to the lowest codeword.

    Ray shape: all ``n_sub`` codebooks train in the SAME two streaming
    passes (per-block partials are (subspace, codeword, count, sum-blob)
    rows — n_sub*k rows per block, merged on the driver; the corpus
    never shuffles), and encoding is one stateless map — PQ needs NO
    exchange at all.  Long-form output keeps the SQL mirror one query;
    the binary row-major code matrix for an index shard is a trivial
    pivot of it.  Reference analog: none (ANN-scale surface; exact/IVF
    tiers live in pipelines/similarity.py)."""
    emb_path = f"{sf_dir}/embeddings.parquet"
    sub_d = dim // n_sub
    assert sub_d * n_sub == dim

    # (n_sub, k, sub_d) codebook tensor; codeword id = vec_id rank
    cb0 = _min_k_vectors(emb_path, k).reshape(
        k, n_sub, sub_d
    ).transpose(1, 0, 2)

    def assign_all(q: np.ndarray, cb: np.ndarray) -> np.ndarray:
        """(n, n_sub) codes: per-subspace exact int64 argmin (first-min
        tie-break = lowest codeword id)."""
        sub = q.reshape(len(q), n_sub, sub_d)
        # (n, n_sub, k) distances
        d2 = ((sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        return np.argmin(d2, axis=2).astype(np.int64)

    def lloyd_partial(t: pa.Table) -> pa.Table:
        _, q = _quantize_embeddings(t)
        codes = assign_all(q, cb0)
        sub = q.reshape(len(q), n_sub, sub_d)
        rows_s, rows_c, rows_n, rows_b = [], [], [], []
        for s in range(n_sub):
            for c in np.unique(codes[:, s]):
                mask = codes[:, s] == c
                rows_s.append(s)
                rows_c.append(int(c))
                rows_n.append(int(mask.sum()))
                rows_b.append(sub[mask, s, :].sum(axis=0).tobytes())
        return pa.table(
            {
                "s": pa.array(rows_s, pa.int64()),
                "c": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "b": pa.array(rows_b, pa.binary()),
            }
        )

    parts = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(lloyd_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cb1 = cb0.copy()
    for s in range(n_sub):
        for c in range(k):
            sub = parts[(parts["s"] == s) & (parts["c"] == c)]
            n = int(sub["n"].sum())
            if n > 0:
                acc = np.zeros(sub_d, dtype=np.int64)
                for blob in sub["b"]:
                    acc += np.frombuffer(blob, dtype=np.int64)
                cb1[s, c] = np.floor_divide(acc, n)

    def encode(t: pa.Table) -> pa.Table:
        ids, q = _quantize_embeddings(t)
        codes = assign_all(q, cb1)
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, n_sub)),
                "subspace": pa.array(
                    np.tile(np.arange(n_sub, dtype=np.int64), n)
                ),
                "code": pa.array(codes.ravel()),
            }
        )

    out = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(encode, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.sort_values(["vec_id", "subspace"]).reset_index(drop=True)
    )


def weighted_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """(rank, doc_id, source, n_chars): deterministic WEIGHTED sampling
    without replacement — Efraimidis & Spirakis 2006 A-Res, the standard
    one-pass distributed weighted sampler (used for quality-weighted
    training-mix draws where mix_sample's per-source caps are too
    coarse).

    Per row: u = (first-32-md5-bits('ws:' || doc_id) + 1) / 2^32 — the
    split_assign/mix_sample hash-uniform contract, so the draw is
    reproducible across runs, resumes, and engines — and the reservoir
    key is ln(u) / n_chars; the k LARGEST keys win (heavier docs get
    keys nearer 0).  ln() bit-matches DuckDB's (the dsir_select parity
    property: both lower to the platform libm double), u and the
    division are exact/IEEE-deterministic, so the selected set and its
    ordering hash-match the SQL oracle with no fixed-point detour.

    Ray shape: stateless map_batches computes keys and emits per-block
    top-k PARTIALS (argpartition, k rows per block); the driver merges
    k x n_blocks rows and takes the global top k — one streaming pass,
    no shuffle, nothing corpus-sized anywhere.  At 10^9 docs this is
    the textbook distributed-reservoir plan (merge of per-partition
    reservoirs).
    """
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        # zero-weight docs never win (ln(u)/0 -> -inf, nan at u==1):
        # filtered on BOTH engines (oracle carries WHERE n_chars > 0)
        t = t.filter(pc.greater(t["n_chars"], 0))
        ids = t["doc_id"].to_pylist()
        w = np.asarray(t["n_chars"], dtype=np.float64)
        u = np.array(
            [
                (int(hashlib.md5(f"ws:{d}".encode()).hexdigest()[:8], 16)
                 + 1.0)
                for d in ids
            ],
            dtype=np.float64,
        ) / 4294967296.0
        key = np.log(u) / w
        take = min(k, len(ids))
        # lexsort, not argpartition: a key tie crossing the k boundary
        # must keep the doc_id-ascending row the oracle's ORDER BY keeps
        if take:
            order = np.lexsort((np.asarray(ids, dtype=np.int64), -key))
            top = order[:take]
        else:
            top = np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array([ids[i] for i in top], pa.int64()),
                "source": t["source"].take(pa.array(top, pa.int64())),
                "n_chars": t["n_chars"].take(pa.array(top, pa.int64())),
                "key": pa.array(key[top], pa.float64()),
            }
        )

    def refold(t: pa.Table) -> pa.Table:
        # second-level reservoir merge: top-k of a union of per-block
        # top-ks IS the global top-k, so folding k x blocks down to k per
        # coalesced partition keeps the driver merge k x 8 even at 10^10
        # docs / 10^5 blocks
        keys = np.asarray(t["key"], dtype=np.float64)
        take = min(k, len(keys))
        if take == 0:
            return t
        order = np.lexsort(
            (np.asarray(t["doc_id"], dtype=np.int64), -keys)
        )
        return t.take(pa.array(np.sort(order[:take]), pa.int64()))

    cand = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(8)
        .map_batches(refold, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    cand = cand.sort_values(
        ["key", "doc_id"], ascending=[False, True]
    ).head(k)
    out = cand.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "source", "n_chars"]]
