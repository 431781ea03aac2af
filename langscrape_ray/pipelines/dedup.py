"""Deduplication family over the ``documents`` table.

The reference only has exact drop_duplicates on small frames
(SURVEY.md §2.7 D1); a 100 TB training-data pipeline needs the full family
(task brief): exact (hash-partitioned), MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Scale pattern for every variant: per-batch vectorized signature computation
(map_batches) -> explode to (bucket_key, doc_id) rows -> ONE groupby shuffle
on the bucket key -> per-group candidate pairs -> verification.  Candidate
volume is controlled by band width; no stage materializes the corpus.
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .util import list_col_matrix

_TOKEN_RE = re.compile(r"\S+")
_MERSENNE = (1 << 61) - 1


def _read_docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _with_pair_key(t: pa.Table, a_col: str, b_col: str) -> pa.Table:
    """Append an int64 ``pair_key`` packing (a, b): Ray's sort-based
    groupby shuffle is ~3-5x faster on ONE int64 key than on a two-column
    key, and pair-aggregation is the hottest shuffle in every dedup tail.
    Pack range: a < 2^31, b < 2^32 (raises loudly beyond) — at 10^10-doc
    scale the similarity joins run per id-shard, where per-shard ids fit
    comfortably; re-spread the shards before packing if they don't."""
    a = np.asarray(t[a_col], dtype=np.int64)
    b = np.asarray(t[b_col], dtype=np.int64)
    if len(a) and (
        a.max() >= (1 << 31) or b.max() >= (1 << 32) or a.min() < 0 or b.min() < 0
    ):
        raise ValueError(
            "pair ids exceed the 31/32-bit pack range; shard the id space "
            "before the pair aggregation"
        )
    return t.append_column("pair_key", pa.array((a << np.int64(32)) | b))


# order-aware shingle mixing constants (odd -> bijective mod 2^64) and a
# splitmix64 finalizer; shingle identity only needs distinctness, so a
# vectorized mix of C-speed per-token hashes replaces per-shingle blake2b
# (which cost ~10M Python hashlib calls per 50k-doc corpus)
_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                 0xD6E8FEB86659FD93, 0xA5CB9243D45BD7A1], dtype=np.uint64)


def _avalanche64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _token_hash_array(tokens: List[str]) -> np.ndarray:
    """Deterministic uint64 token hashes, vectorized (pandas siphash with
    its fixed default key — C speed, stable across processes)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(
        np.asarray(tokens, dtype=object), categorize=False
    ).astype(np.uint64)


def _shingle_hash_array(tokens: List[str], k: int) -> np.ndarray:
    """uint64 hash per k-token shingle: order-aware vectorized mix of the
    token hashes (h[i]*M0 ^ h[i+1]*M1 ^ ... -> avalanche)."""
    h = _token_hash_array(tokens)
    n = len(h)
    if n == 0:
        return h
    if n < k:
        acc = np.uint64(0)
        for j in range(n):
            acc ^= h[j] * _MIX[j % len(_MIX)]
        return _avalanche64(np.array([acc], dtype=np.uint64))
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc ^= h[j : j + m] * _MIX[j % len(_MIX)]
    return _avalanche64(acc)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Representative per exact-text group: (doc_id=min, n_dups) —
    hash-partition on content hash + vectorized shuffle aggregate
    (SURVEY.md §2.7 D1).  SQL oracle: GROUP BY text.

    Scale note: ``groupby(hash).aggregate(Min, Count)`` — NOT map_groups —
    because at corpus scale every distinct document is its own group and
    per-group Python callbacks dominate; Min/Count combine inside each
    block before the shuffle, so only (hash, min, count) partials move."""
    from ray.data.aggregate import Count, Min

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "text_hash": pa.array(hs, pa.string())}
        )

    out = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(
            Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
        )
        .to_pandas()
    )
    return (
        out[["doc_id", "n_dups"]]
        .astype({"doc_id": "int64", "n_dups": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashSignatures:
    """k-permutation MinHash over word shingles (actor-pool stage: the
    permutation seeds are built once per actor).

    Permutation i is a fixed 64-bit mixing function (splitmix-style avalanche
    seeded per i) instead of the classical (a*h+b) mod prime — identical
    collision behaviour for LSH purposes and fully vectorizable in uint64
    (one (k, n_shingles) matrix min per doc; no Python bigint math).
    Bands of ``num_perm // bands`` rows hash to one bucket key each
    (Broder's minhash / banding LSH, standard construction)."""

    def __init__(self, num_perm: int = 64, shingle_len: int = 3, bands: int = 16):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.shingle_len = shingle_len
        self.bands = bands
        rng = np.random.RandomState(0xC0FFEE)  # fixed — deterministic engine
        self.seeds = rng.randint(1, 2**63 - 1, size=num_perm).astype(np.uint64)

    def shingles(self, text: str) -> np.ndarray:
        toks = _TOKEN_RE.findall(text.lower())
        return _shingle_hash_array(toks, self.shingle_len)

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if sh.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = sh[None, :] + self.seeds[:, None]  # (k, n) — uint64 wraps mod 2^64
        return _avalanche64(x).min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        """Emit (band_id, band_hash, doc_id) rows — the LSH explode.
        Band hashes for the whole batch are one vectorized mix over the
        (docs x bands x rows_per_band) signature tensor; band_hash is an
        int64 bit-view of the uint64 mix (groupby keys only need equality)."""
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        n = len(doc_ids)
        rpb = self.num_perm // self.bands
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        sigs = np.stack([self.signature(x) for x in texts])  # (n, num_perm)
        bandview = sigs.reshape(n, self.bands, rpb)
        acc = np.zeros((n, self.bands), dtype=np.uint64)
        for j in range(rpb):
            acc ^= bandview[:, :, j] * _MIX[j % len(_MIX)]
        band_hash = _avalanche64(acc).view(np.int64).reshape(-1)
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(band_hash),
                "doc_id": pa.array(
                    np.repeat(np.asarray(doc_ids, dtype=np.int64), self.bands)
                ),
            }
        )


from functools import lru_cache


@lru_cache(maxsize=8)
def _shingler(shingle_len: int) -> MinHashSignatures:
    """Cached shingler: MinHashSignatures.__init__ seeds a RandomState —
    per-CALL construction (the round-3 ngram_jaccard) costs more than the
    set math it feeds when a verify pass runs per pair."""
    return MinHashSignatures(shingle_len=shingle_len)


def _shingle_set(text: str, shingle_len: int = 3) -> np.ndarray:
    """Sorted unique shingle hashes — the per-doc verify representation
    (compute ONCE per doc, intersect per pair)."""
    return np.unique(_shingler(shingle_len).shingles(text))


def ngram_jaccard(text_a: str, text_b: str, shingle_len: int = 3) -> float:
    """Exact word-shingle Jaccard (the verification metric)."""
    sa = _shingle_set(text_a, shingle_len)
    sb = _shingle_set(text_b, shingle_len)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def minhash_candidate_pairs_ds(sf_dir: str, num_perm: int = 64, bands: int = 16,
                               n_parts: int = 64,
                               dedup_pairs: bool = False,
                               bucket_cap: int = 512) -> rd.Dataset:
    """LSH candidate pairs as a Dataset: shingle -> minhash -> band ->
    bucket-hash partition -> within-bucket pairs.

    Buckets are co-located by ``hash(band) % n_parts`` so the shuffle has
    n_parts coarse groups (one vectorized pandas groupby each) instead of
    one task per bucket — Ray's per-group map_groups overhead dominates
    otherwise.  The signature stage runs as plain TASKS (the state is a
    512-byte seed array captured in the callable instance — an actor pool
    pays ~2 s of spin-up to hold state this cheap).  Cross-band duplicate
    pairs (two bands colliding for the same pair) survive unless
    ``dedup_pairs``: consumers that pull the (collision-bounded, small)
    pair set to the driver dedupe there for free; the at-scale join tail
    passes dedup_pairs=True for the vectorized groupby-count dedup shuffle
    so the pair set still never lands on the driver.

    ``bucket_cap`` is the hot-bucket guard: a bucket of b co-hashing docs
    normally emits b·(b−1)/2 pairs, which for the degenerate buckets a real
    crawl produces (thousands of near-identical template pages hashing to
    ONE band bucket) is quadratic in the hot-bucket size.  Buckets larger
    than the cap emit the O(b) star to the bucket-minimum doc instead:
    connectivity — and therefore keep-one-per-cluster dedup via the
    connected-components consumer — is preserved, while direct pairs
    between non-min members of the oversized bucket are dropped (the same
    cap/sample trade RefinedWeb makes at 10^9-doc scale).  Pair emission
    is vectorized (``np.triu_indices`` over the sorted-unique id array),
    never a per-pair Python loop.
    Rows: (doc_a, doc_b) with doc_a < doc_b."""
    def add_part(t: pa.Table) -> pa.Table:
        h = np.asarray(t["band_hash"], dtype=np.int64).view(np.uint64)
        parts = (h % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("bucket_part", pa.array(parts))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_bid, _bh), grp in g.groupby(["band_id", "band_hash"], sort=False):
            ids = np.unique(grp["doc_id"].to_numpy(dtype=np.int64))
            m = int(ids.size)
            if m < 2:
                continue
            if m > bucket_cap:
                # degenerate LSH bucket: star to the min id, O(b) not O(b^2)
                a = np.full(m - 1, ids[0], dtype=np.int64)
                b = ids[1:]
            else:
                iu, ju = np.triu_indices(m, k=1)
                a, b = ids[iu], ids[ju]
            out_a.append(a)
            out_b.append(b)
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
            }
        )

    from langscrape_ray.pipelines.util import ensure_schema

    cand = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            MinHashSignatures(num_perm=num_perm, bands=bands),
            batch_format="pyarrow",
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(pairs, batch_format="pandas")
    )
    if dedup_pairs:
        from ray.data.aggregate import Count, Min

        cand = (
            cand.map_batches(
                lambda t: _with_pair_key(t, "doc_a", "doc_b"),
                batch_format="pyarrow",
            )
            .groupby("pair_key")  # single-int64 key: see _with_pair_key
            .aggregate(
                Min("doc_a", alias_name="doc_a"),
                Min("doc_b", alias_name="doc_b"),
                Count(alias_name="_n"),
            )
        )
    return ensure_schema(
        cand, pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    )


def minhash_candidate_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                            n_parts: int = 64) -> pd.DataFrame:
    """Driver-side view of the deduped candidate pairs (small result)."""
    cand = minhash_candidate_pairs_ds(sf_dir, num_perm, bands, n_parts).to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return (
        cand.astype({"doc_a": "int64", "doc_b": "int64"})
        .drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def _join_parts(requested: int = 16, n_rows: Optional[int] = None) -> int:
    """Join partition count bounded by cluster CPUs AND data volume: each
    hash-join partition is an aggregator actor, so more actors than CPUs
    deadlocks small clusters, and spinning 16 actors for a few thousand
    rows is pure startup overhead.  With ``n_rows`` (the smaller side's
    count, when cheaply known) partitions scale at ~50k rows/partition."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(2, min(requested, cpus // 2))
    if n_rows is not None:
        cap = max(2, min(cap, n_rows // 50_000 + 2))
    return cap


def minhash_dedup(sf_dir: str, threshold: float = 0.5,
                  n_parts: Optional[int] = None) -> pd.DataFrame:
    """Near-dup pairs verified by exact n-gram Jaccard >= threshold.

    Scale shape end-to-end: candidate generation is the banded-LSH shuffle;
    verification is a SEMI-JOIN pushdown — only texts whose doc_id appears
    in a candidate pair are read back (predicate-pushdown parquet scan),
    and that candidate-bounded slice (O(duplicates), NOT O(corpus) — the
    round-1 sin was broadcasting the whole corpus) broadcasts once to a
    distributed verify pass over the pairs.  Above ``JOIN_TAIL_PAIRS``
    candidates the broadcast no longer fits and verification switches to
    two co-partitioned hash joins on doc_id (``_verify_pairs_join``)."""
    empty_result = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )
    # Pairs are the reduced intermediate (bounded by LSH collision volume),
    # small enough to land on the driver — the function's own return value
    # is the same order of size.
    pairs = minhash_candidate_pairs_ds(sf_dir).to_pandas()
    if pairs.empty:
        return empty_result
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
    if len(pairs) > JOIN_TAIL_PAIRS:
        out = _verify_pairs_join(sf_dir, pairs, threshold, n_parts)
    else:
        out = _verify_pairs_semijoin(sf_dir, pairs, threshold)
    if out.empty:
        return empty_result
    return (
        out.astype({"doc_a": "int64", "doc_b": "int64"})
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def minhash_dedup_ds(sf_dir: str, threshold: float = 0.5,
                     n_parts: Optional[int] = None) -> "Optional[rd.Dataset]":
    """Fully-distributed sibling of ``minhash_dedup``: the candidate set
    is pair-deduped IN the Dataset (single-int64 pair-key aggregate) and
    verified through the co-partitioned join tail, so the edge set NEVER
    lands on the driver — at web-crawl dup rates (30-50 % near-dup) the
    LSH pair volume is corpus-order and the driver collect in
    ``minhash_dedup`` (its documented small-tier trade) stops being
    bounded.  Feeds the distributed CC tier directly at 100 TB.  Same
    threshold contract (filter on the 4-decimal-rounded Jaccard);
    returns None when there are no candidates.  Parity with
    minhash_dedup is pytest-pinned."""
    cands = minhash_candidate_pairs_ds(sf_dir, dedup_pairs=True)
    return _verify_pairs_join_ds(
        cands, sf_dir, threshold,
        _join_parts(n_parts or 16), round_first=True,
    )


# above this many candidate pairs the candidate-text slice stops being
# broadcastable and the verify tail switches to co-partitioned hash joins
JOIN_TAIL_PAIRS = 2_000_000


def _verify_pairs_semijoin(sf_dir: str, pairs: pd.DataFrame,
                           threshold: float, shingle_len: int = 3,
                           round_first: bool = True) -> pd.DataFrame:
    """Candidate-bounded verify: filtered scan of ONLY the pair texts
    (isin pushdown), broadcast that small slice, verify pairs distributed.

    ``round_first`` picks which side of the 4-decimal rounding the
    threshold compares against: True is the minhash_dedup contract
    (filter on the rounded value); False is the jaccard_similarity_join
    / SQL-oracle contract (filter on the raw ratio, round for output)."""
    import pyarrow.compute as pc

    ids = pd.unique(pd.concat([pairs["doc_a"], pairs["doc_b"]],
                              ignore_index=True))
    texts_tbl = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(ids.tolist()),
    ).to_pandas()
    texts_ref = ray.put(dict(zip(texts_tbl["doc_id"], texts_tbl["text"])))

    class Verify:
        def __init__(self, ref):
            # hold only the (plasma-resident) ref; shingling happens
            # lazily INSIDE the first __call__ so it runs on the worker,
            # not the driver.  Each doc still shingles once per task and
            # pairs then cost one sorted intersect each (the round-3
            # per-pair re-shingle dominated verify at 10^5 candidates).
            self.ref = ref
            self.sets = None
            self._empty = np.empty(0, dtype=np.uint64)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self.sets is None:
                self.sets = {
                    k: _shingle_set(v, shingle_len)
                    for k, v in ray.get(self.ref).items()
                }
            raw = np.array(
                [_pair_jaccard(self.sets.get(a, self._empty),
                               self.sets.get(b, self._empty))
                 for a, b in zip(batch["doc_a"], batch["doc_b"])],
                dtype=np.float64,
            )
            out = batch[["doc_a", "doc_b"]].copy()
            out["jaccard"] = np.round(raw, 4)
            if round_first:
                return out[out["jaccard"] >= threshold]
            return out[raw >= threshold]

    # split the driver-resident pair list into blocks so verification
    # parallelizes (from_pandas on one frame = ONE block = one task);
    # each task re-shingles the candidate-bounded slice once — cheaper
    # than a single task intersecting 10^5 pairs serially
    n_chunks = max(1, min(16, len(pairs) // 8192))
    chunks = np.array_split(pairs, n_chunks)
    return (
        rd.from_pandas(chunks)
        .map_batches(Verify(texts_ref), batch_format="pandas")
        .to_pandas()
    )


def _pair_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def _verify_pairs_join(sf_dir: str, pairs_pd: pd.DataFrame, threshold: float,
                       n_parts: Optional[int], shingle_len: int = 3,
                       round_first: bool = True) -> pd.DataFrame:
    """Join-tail verify for candidate sets too big to broadcast —
    driver-resident wrapper of ``_verify_pairs_join_ds``."""
    out = _verify_pairs_join_ds(
        rd.from_pandas(pairs_pd), sf_dir, threshold,
        n_parts if n_parts is not None else _join_parts(n_rows=len(pairs_pd)),
        shingle_len, round_first,
    )
    if out is None:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.to_pandas()


def _verify_pairs_join_ds(pairs_ds: "rd.Dataset", sf_dir: str,
                          threshold: float, n_parts: int,
                          shingle_len: int = 3,
                          round_first: bool = True) -> "Optional[rd.Dataset]":
    """Dataset-returning core of the join-tail verify: each candidate
    pair's two texts arrive via co-partitioned hash joins on doc_id, the
    exact shingle Jaccard filters, and the verified edge set STAYS a
    Dataset — the 100-TB path feeds it straight into the distributed CC
    tier without ever collecting edges on the driver.  Returns None when
    the candidate set is empty (callers pick their empty shape).
    ``round_first`` as in ``_verify_pairs_semijoin``."""
    from langscrape_ray.pipelines.util import compact_for_join

    # compact so no empty block reaches the join (empty first blocks break
    # Ray's join schema broadcast — see compact_for_join)
    pairs = compact_for_join(pairs_ds)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return None
    # the pair count is known (compact materialized) — re-bound the join
    # partition count by it: every partition is an aggregator ACTOR, and
    # spinning 16 of them per join for a few hundred pairs is pure
    # startup overhead (the 100-TB pair volumes keep the requested width)
    n_parts = _join_parts(n_parts, n_rows=n_pairs)
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    agg_args = {"num_cpus": 0.25}

    joined = pairs.join(
        docs, join_type="inner", num_partitions=n_parts,
        on=("doc_a",), right_on=("doc_id",),
        aggregator_ray_remote_args=agg_args,
    ).rename_columns({"text": "text_a"})
    # re-compact between the two joins for the same empty-block reason
    joined = compact_for_join(joined)
    if joined.count() == 0:
        return None
    joined = joined.join(
        docs, join_type="inner", num_partitions=n_parts,
        on=("doc_b",), right_on=("doc_id",),
        aggregator_ray_remote_args=agg_args,
    ).rename_columns({"text": "text_b"})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        # per-batch doc->shingle-set memo: a doc in k pairs shingles once
        memo: dict = {}

        def sset(doc_id, text):
            s = memo.get(doc_id)
            if s is None:
                s = memo[doc_id] = _shingle_set(text, shingle_len)
            return s

        raw = np.array(
            [
                _pair_jaccard(sset(da, a), sset(db, b))
                for da, db, a, b in zip(
                    batch["doc_a"], batch["doc_b"],
                    batch["text_a"], batch["text_b"],
                )
            ],
            dtype=np.float64,
        )
        out = batch[["doc_a", "doc_b"]].copy()
        out["jaccard"] = np.round(raw, 4)
        if round_first:
            return out[out["jaccard"] >= threshold]
        return out[raw >= threshold]

    return joined.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashSignatures:
    """64-bit SimHash over word features (Charikar 2002): sum of +-1 per
    bit weighted by token hash, sign -> bit.  Near-dup candidates bucket on
    4 x 16-bit bands (Hamming distance <= 3 guarantee)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        shifts = np.arange(64, dtype=np.uint64)
        sigs = []
        for text in t["text"].to_pylist():
            toks = _TOKEN_RE.findall(text.lower())
            if not toks:
                sigs.append(0)
                continue
            hs = _token_hash_array(toks)
            # (n_toks, 64) bit matrix -> per-bit +-1 sums, fully vectorized
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            sig = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            sigs.append(sig)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(
                    [s - (1 << 64) if s >= (1 << 63) else s for s in sigs], pa.int64()
                ),
            }
        )
        return out


def simhash_signatures(sf_dir: str) -> "rd.Dataset":
    # stateless -> plain tasks: an actor pool pays spin-up for nothing here
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashSignatures(), batch_format="pyarrow"
    )


def simhash_neardup_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via 4-band bucketing
    (pigeonhole: <=3 differing bits leave one 16-bit band intact)."""

    n_parts = 32

    def explode(t: pa.Table) -> pa.Table:
        band_ids, band_vals, doc_ids, sims, parts = [], [], [], [], []
        for doc_id, sig in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            u = sig & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                v = (u >> (16 * b)) & 0xFFFF
                band_ids.append(b)
                band_vals.append(v)
                doc_ids.append(doc_id)
                sims.append(sig)
                parts.append((b * 65536 + v) % n_parts)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_val": pa.array(band_vals, pa.int32()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(sims, pa.int64()),
                "bucket_part": pa.array(parts, pa.int32()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair emission: triu indices over the sorted-unique
        # (doc_id, simhash) rows, XOR popcount via a byte-view unpackbits
        # (numpy<2 has no bitwise_count) — no per-pair Python loop
        out_a, out_b, out_d = [], [], []
        for (_bid, _bv), grp in g.groupby(["band_id", "band_val"], sort=False):
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            m = len(grp)
            if m < 2:
                continue
            ids = grp["doc_id"].to_numpy(dtype=np.int64)
            sigs = grp["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            iu, ju = np.triu_indices(m, k=1)
            x = (sigs[iu] ^ sigs[ju]).view(np.uint8).reshape(-1, 8)
            d = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
            hit = d <= max_hamming
            out_a.append(ids[iu[hit]])
            out_b.append(ids[ju[hit]])
            out_d.append(d[hit])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a),
             "doc_b": np.concatenate(out_b),
             "hamming": np.concatenate(out_d)}
        )

    out = (
        simhash_signatures(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
    return out.drop_duplicates().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Pairs with cosine >= threshold over the embeddings table.

    Blocked matmul: each batch of vectors multiplies against the full
    (broadcast, L2-normalized) matrix — O(n*d) per batch row, no shuffle.
    At 10^9-vector scale the broadcast side becomes an IVF/LSH index; this
    brute-force stage is the exactness baseline. SQL oracle: self-join with
    list_cosine_similarity."""
    import ray

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full = emb.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put((ids, mat))

    class Block:
        def __init__(self, ref):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = np.asarray(t["vec_id"])
            vecs = list_col_matrix(t["embedding"], np.float64)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = vecs @ self.mat.T  # (batch, n)
            out_a, out_b, out_s = [], [], []
            for row, vid in enumerate(vids):
                hits = np.nonzero(sims[row] >= threshold)[0]
                for j in hits:
                    other = int(self.ids[j])
                    if other > int(vid):  # emit each pair once, a < b
                        out_a.append(int(vid))
                        out_b.append(other)
                        out_s.append(round(float(sims[row, j]), 4))
            return pa.table(
                {
                    "vec_a": pa.array(out_a, pa.int64()),
                    "vec_b": pa.array(out_b, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    out = emb.map_batches(Block(mat_ref), batch_format="pyarrow").to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _cc_union_find(pairs: pd.DataFrame) -> dict:
    """Min-label connected components over a driver-resident edge list.

    Classic union-find with path halving; after the unions each root's
    label is the MIN vec_id seen in its component, so lookup(v) returns
    the canonical cluster representative.  O(E * alpha(V)) — the right
    tool whenever the edge set fits on one node, which near-dup edge
    sets do far longer than the corpus does (dup rate << 100%)."""
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["vec_a"].to_numpy(), pairs["vec_b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min: smaller id becomes the root, so the root IS
            # the component's min label (ids only enter via edges).
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in list(parent)}


def _cc_labels_distributed(pairs_ds: "rd.Dataset", a_col: str = "vec_a",
                           b_col: str = "vec_b", max_iters: int = 25,
                           iter_log: Optional[list] = None) -> "rd.Dataset":
    """Distributed min-label connected components over an EDGE DATASET —
    the above-one-node tier of ``_cc_union_find`` (which stays the local
    finish while the near-dup edge list fits on a single node).

    Algorithm: iterated neighbor-min label propagation WITH a per-round
    POINTER-DOUBLING shortcut (label := label(label)), the shortcutting
    idea of the MapReduce-CC literature (Rastogi et al. 2013 Hash-to-Min;
    Kiveris et al. 2014 large-star/small-star).  Plain neighbor-min alone
    needs O(component diameter) rounds — an adversarial chain-shaped
    near-dup cluster (paginated series, boilerplate chains) turns that
    into hundreds; with doubling the label's hop-distance to the
    component min at least halves per round, so convergence is
    O(log diameter) and ``max_iters=25`` covers diameters beyond 10^7.

    Per-iteration exchange is bounded by O(|E| + |touched V|): ONE
    edges⋈labels hash join (propagate), ONE groupby-min (merge), ONE
    labels⋈labels self-join (shortcut).  Labels only ever decrease and
    label(u) <= u invariantly (init self, min-merges), so every label
    value is itself a touched vertex and the shortcut join is total —
    replacement needs no extra min-merge.  The driver sees one int64
    checksum per round (monotone fixpoint detection), never the edges.

    Returns (vec_id, label) for TOUCHED vertices (edge endpoints) only;
    callers fill untouched corpus ids with label := vec_id via ONE
    left-outer join (see ``embedding_cc_clusters``).  ``iter_log``, when
    given, records one entry per executed round (tests bound round count
    to prove the log-diameter behavior)."""
    from ray.data.aggregate import Min

    from langscrape_ray.pipelines.util import compact_for_join, ensure_schema

    label_schema = pa.schema([("vec_id", pa.int64()), ("label", pa.int64())])
    agg_args = {"num_cpus": 0.25}

    def sym(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col], dtype=np.int64)
        b = np.asarray(t[b_col], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    # compact: aggregate-derived edge sources can carry zero-row blocks,
    # which break the hash-join schema broadcast (see compact_for_join);
    # 64 blocks keeps each near-dup-sized edge shard worker-resident
    edges = compact_for_join(
        pairs_ds.map_batches(sym, batch_format="pyarrow"), max_blocks=64
    )

    # touched vertices: distinct edge endpoints, labeled self.  Derived
    # from the edge set itself (groupby-distinct) — tiny vs the corpus.
    labels = compact_for_join(
        ensure_schema(
            edges.map_batches(
                lambda t: pa.table({"vec_id": t["src"], "label": t["src"]}),
                batch_format="pyarrow",
            )
            .groupby("vec_id")
            .aggregate(Min("label", alias_name="label")),
            label_schema,
        )
    )
    n_parts = _join_parts(4, n_rows=labels.count())

    prev_sum = None
    for _ in range(max_iters):
        # 1) propagate: each edge sends src's current label to dst
        prop = edges.join(
            labels, join_type="inner", num_partitions=n_parts,
            on=("src",), right_on=("vec_id",),
            aggregator_ray_remote_args=agg_args,
        ).map_batches(
            lambda t: pa.table({"vec_id": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        # 2) merge: min over (self, all neighbor proposals)
        labels = compact_for_join(
            ensure_schema(
                labels.union(prop)
                .groupby("vec_id")
                .aggregate(Min("label", alias_name="label")),
                label_schema,
            )
        )
        # 3) shortcut: label := label(label) — halves hop-distance
        reps = labels.map_batches(
            lambda t: pa.table(
                {"rep_id": t["vec_id"], "rep_label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        labels = compact_for_join(
            ensure_schema(
                labels.join(
                    reps, join_type="inner", num_partitions=n_parts,
                    on=("label",), right_on=("rep_id",),
                    aggregator_ray_remote_args=agg_args,
                ).map_batches(
                    lambda t: pa.table(
                        {"vec_id": t["vec_id"], "label": t["rep_label"]}
                    ),
                    batch_format="pyarrow",
                ),
                label_schema,
            )
        )
        cur_sum = labels.sum("label")
        if iter_log is not None:
            iter_log.append(int(cur_sum))
        if cur_sum == prev_sum:  # min-labels are monotone: fixpoint
            break
        prev_sum = cur_sum
    return labels


def embedding_cc_clusters(sf_dir: str, threshold: float = 0.4,
                          max_iters: int = 25,
                          local_edge_limit: int = 2_000_000,
                          pairs_fn=None) -> pd.DataFrame:
    """Connected-components dedup clustering: every vector labeled with the
    MIN vec_id of its near-duplicate component (edges = cosine >= threshold
    pairs).  This is the step after pair generation in a real dedup
    pipeline — pairs alone can't drop rows; components pick one keeper per
    duplicate cluster.

    ``pairs_fn`` is the edge source — (sf_dir, threshold=...) -> edge
    DATASET or DataFrame with (vec_a, vec_b, ...) columns.  The DEFAULT
    is the bucketed LSH generator's Dataset form
    (``embedding_neardup_lsh_ds``): no corpus broadcast, no full-matrix
    matmul, and above ``local_edge_limit`` the edges feed the
    distributed CC tier without ever touching the driver.  Pass
    ``embedding_neardup_pairs`` (exact all-pairs) for the exactness
    baseline; ``embedding_cc_clusters_exact`` wraps that and backs the
    SQL-oracled ``dedup_cc`` query, while the LSH default is rows-only
    with a cluster-recall test vs the exact labels.

    Hybrid shape: the edge set after near-dup detection is orders of
    magnitude smaller than the corpus, so when it fits on one node
    (<= ``local_edge_limit`` edges) components come from a driver-side
    union-find and the corpus is labeled in ONE broadcast map_batches
    pass — no iteration, no shuffle (the standard local-phase finish in
    distributed CC implementations).  Above the limit,
    ``_cc_labels_distributed`` iterates only over the TOUCHED vertex set
    (edge endpoints) — hash-to-min propagation plus a pointer-doubling
    shortcut per round, so convergence is O(log diameter) with O(|E|)
    exchange per round (driver sees one scalar checksum; edges never
    leave the workers).  Untouched vertices join back
    once at the end via a left-outer join with label := vec_id fill —
    one corpus-sized pass total instead of one per iteration.  SQL
    oracle: recursive transitive closure + min per node."""
    import ray

    emb_ids = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    if pairs_fn is None:
        pairs_fn = embedding_neardup_lsh_ds
    pairs = pairs_fn(sf_dir, threshold=threshold)
    # the edge source may be a DATASET (default scale path — the edge list
    # never lands on the driver) or a DataFrame (exactness baselines)
    if isinstance(pairs, rd.Dataset):
        pairs = pairs.materialize()
        n_edges = pairs.count()
    else:
        n_edges = len(pairs)

    if 0 < n_edges <= local_edge_limit:
        pairs_pd = (
            pairs.to_pandas() if isinstance(pairs, rd.Dataset) else pairs
        )
        rep_ref = ray.put(_cc_union_find(pairs_pd))

        class LabelLookup:
            def __init__(self, ref):
                self.rep = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                vids = t["vec_id"].to_pylist()
                g = self.rep.get
                return pa.table(
                    {
                        "vec_id": pa.array(vids, pa.int64()),
                        "cluster_rep": pa.array(
                            [g(v, v) for v in vids], pa.int64()
                        ),
                    }
                )

        out = emb_ids.map_batches(
            LabelLookup(rep_ref), batch_format="pyarrow"
        ).to_pandas()
        out = out.astype({"vec_id": "int64", "cluster_rep": "int64"})
        return out.sort_values("vec_id").reset_index(drop=True)

    def self_labels(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t["vec_id"], "label": t["vec_id"]})

    if n_edges == 0:
        out = emb_ids.map_batches(self_labels, batch_format="pyarrow").to_pandas()
        out = out.astype({"vec_id": "int64", "label": "int64"})
        out = out.rename(columns={"label": "cluster_rep"})
        return out.sort_values("vec_id").reset_index(drop=True)

    # distributed tier: hash-to-min + pointer doubling over the edge
    # Dataset — the edge list never lands on the driver
    pairs_ds = (
        pairs if isinstance(pairs, rd.Dataset)
        else rd.from_pandas(pairs[["vec_a", "vec_b"]])
    )
    labels = _cc_labels_distributed(
        pairs_ds, "vec_a", "vec_b", max_iters=max_iters
    )
    n_parts = _join_parts(4, n_rows=labels.count())

    # single corpus-sized pass: untouched ids label themselves (right side
    # key renamed so the outer join never carries two `vec_id` columns)
    touched = labels.map_batches(
        lambda t: pa.table({"t_vid": t["vec_id"], "label": t["label"]}),
        batch_format="pyarrow",
    )
    full = emb_ids.join(
        touched, join_type="left_outer", num_partitions=n_parts,
        on=("vec_id",), right_on=("t_vid",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    ).map_batches(
        lambda t: pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pc.coalesce(t["label"], t["vec_id"]),
            }
        ),
        batch_format="pyarrow",
    )
    out = full.to_pandas().astype({"vec_id": "int64", "label": "int64"})
    out = out.rename(columns={"label": "cluster_rep"})
    return out.sort_values("vec_id").reset_index(drop=True)


def embedding_cc_clusters_exact(sf_dir: str, threshold: float = 0.4,
                                **kw) -> pd.DataFrame:
    """CC clustering over the EXACT all-pairs edge source — the oracle /
    test baseline (broadcast matmul; see embedding_neardup_pairs).  The
    default ``embedding_cc_clusters`` uses the LSH edge source and is the
    at-scale shape."""
    return embedding_cc_clusters(
        sf_dir, threshold=threshold, pairs_fn=embedding_neardup_pairs, **kw
    )


def embedding_neardup_lsh_ds(
    sf_dir: str, threshold: float = 0.4, bands: int = 16, bits_per_band: int = 4,
    seed: int = 1337, n_parts: int = 32,
) -> "rd.Dataset":
    """Bucketed (scale-path) embedding near-dup: random-hyperplane LSH.

    ``bands`` independent signatures of ``bits_per_band`` hyperplane sign
    bits each; a pair collides in a band with prob (1 - theta/pi)^bits, so
    multiple narrow bands give high recall at cosine >= threshold while
    bucketing keeps every comparison local: vectors explode to (band,
    bucket) keys, ONE groupby shuffle co-locates each bucket, the
    within-bucket exact-cosine verify is a small matmul, and cross-band
    duplicate pairs are removed by a vectorized pair-key aggregate.  The
    corpus matrix is never broadcast or driver-materialized — this is the
    10^9-vector shape; ``embedding_neardup_pairs`` stays as the exactness
    oracle at test scale.  Same output schema as the exact variant;
    recall < 1.0 by construction (rows-only; recall asserted in tests)."""
    from ray.data.aggregate import Count, Min

    rng = np.random.RandomState(seed)
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # plane count fixed by config; dim discovered from the first row only.
    dim = len(emb.take(1)[0]["embedding"])
    planes = rng.standard_normal((bands * bits_per_band, dim))

    def explode(t: pa.Table) -> pa.Table:
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        vecs = list_col_matrix(t["embedding"], np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        bits = (vecs @ planes.T) > 0  # (n, bands*bits)
        weights = 1 << np.arange(bits_per_band)
        out_band, out_bucket, out_vid, out_part, out_vec = [], [], [], [], []
        for b in range(bands):
            seg = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            buckets = (seg * weights).sum(axis=1).astype(np.int64)
            out_band.extend([b] * len(vids))
            out_bucket.extend(buckets.tolist())
            out_vid.extend(vids.tolist())
            out_part.extend(((b * (1 << bits_per_band) + buckets) % n_parts).tolist())
            out_vec.extend(vecs.tolist())
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "vec_id": pa.array(out_vid, pa.int64()),
                "bucket_part": pa.array(out_part, pa.int32()),
                "nvec": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for (_b, _bk), grp in g.groupby(["band_id", "bucket"]):
            if len(grp) < 2:
                continue
            grp = grp.drop_duplicates("vec_id").sort_values("vec_id")
            ids = grp["vec_id"].to_numpy()
            mat = np.stack(grp["nvec"].to_numpy())
            sims = mat @ mat.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= threshold
            out_a.extend(ids[iu[hit]].tolist())
            out_b.extend(ids[ju[hit]].tolist())
            out_s.extend(
                [int(round(s * 10000)) for s in sims[iu[hit], ju[hit]]]
            )
        return pd.DataFrame(
            {
                "vec_a": pd.Series(out_a, dtype="int64"),
                "vec_b": pd.Series(out_b, dtype="int64"),
                "cos_e4": pd.Series(out_s, dtype="int64"),
            }
        )

    from langscrape_ray.pipelines.util import ensure_schema

    return ensure_schema(
        emb.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(
            lambda t: _with_pair_key(t, "vec_a", "vec_b"), batch_format="pyarrow"
        )
        .groupby("pair_key")  # single-int64 key: see _with_pair_key
        .aggregate(
            Min("vec_a", alias_name="vec_a"),
            Min("vec_b", alias_name="vec_b"),
            Min("cos_e4", alias_name="cos_e4"),
            Count(alias_name="_n"),
        ),
        pa.schema(
            [("vec_a", pa.int64()), ("vec_b", pa.int64()),
             ("cos_e4", pa.int64())]
        ),
    )


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = 0.4, bands: int = 16, bits_per_band: int = 4,
    seed: int = 1337, n_parts: int = 32,
) -> pd.DataFrame:
    """Driver-resident wrapper of ``embedding_neardup_lsh_ds`` (float
    cosine, sorted) — the inspection/test surface; the CC clustering
    default consumes the Dataset variant so edges never hit the driver."""
    out = embedding_neardup_lsh_ds(
        sf_dir, threshold, bands, bits_per_band, seed, n_parts
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"),
             "vec_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    out = out.astype({"vec_a": "int64", "vec_b": "int64"})
    out["cosine"] = out["cos_e4"] / 10000.0
    return (
        out[["vec_a", "vec_b", "cosine"]]
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 1 << 16
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_rows(sh_u64: np.ndarray) -> np.ndarray:
    """(depth, n) row indices of each shingle hash in the DF sketch."""
    return np.stack(
        [
            (_avalanche64(sh_u64 + _CMS_SEEDS[d]) % np.uint64(_CMS_WIDTH))
            .astype(np.int64)
            for d in range(_CMS_DEPTH)
        ]
    )


def _cms_estimate(cms: np.ndarray, sh_u64: np.ndarray) -> np.ndarray:
    rows = _cms_rows(sh_u64)
    est = cms[0, rows[0]]
    for d in range(1, _CMS_DEPTH):
        est = np.minimum(est, cms[d, rows[d]])
    return est


def jaccard_df_sketch(sf_dir: str, shingle_len: int = 3) -> np.ndarray:
    """Count-min sketch of shingle document frequency: per-block (4 x
    65536) int64 partials (1 MB each, vectorized np.add.at over each
    block's distinct-shingle arrays) merged by addition on the driver —
    a KB/MB-scale reduction, never a row-level shuffle.  Deterministic
    (fixed seeds + commutative adds), so the (estimate, shingle) order it
    induces is a fixed GLOBAL total order — which is all the prefix
    filter's completeness proof needs; over-estimates only cost a little
    selectivity, never correctness."""
    def partial(t: pa.Table) -> pa.Table:
        # per-doc distinct shingles concatenated, then ONE bincount per
        # depth over the whole batch (np.add.at per doc is ~5x slower)
        mh = _shingler(shingle_len)
        uniq = [np.unique(mh.shingles(text)) for text in t["text"].to_pylist()]
        uniq = [u for u in uniq if u.size]
        counts = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
        if uniq:
            rows = _cms_rows(np.concatenate(uniq))
            for d in range(_CMS_DEPTH):
                counts[d] = np.bincount(rows[d], minlength=_CMS_WIDTH)
        return pa.table({"cms": pa.array([counts.tobytes()], pa.binary())})

    parts = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cms = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    for raw in parts["cms"]:
        cms += np.frombuffer(raw, dtype=np.int64).reshape(
            _CMS_DEPTH, _CMS_WIDTH
        )
    return cms


def jaccard_candidate_pairs_ds(sf_dir: str, threshold: float = 0.5,
                               shingle_len: int = 3,
                               n_parts: int = 32,
                               df_cap: Optional[int] = None,
                               dedup_pairs: bool = True) -> rd.Dataset:
    """Candidate (doc_a, doc_b) pairs for the exact Jaccard join, pruned
    by the DF-ordered POSITIONAL PREFIX FILTER (PPJoin, Xiao et al. WWW'08)
    plus the length filter — this is the stop-shingle guard that keeps the
    hot-shingle self-merge from going quadratic on a real web corpus.

    The completeness theorem (so the downstream join stays EXACT): order
    every doc's shingle set by one global total order and index only each
    doc's first ``p = n − ceil(t·n) + 1`` shingles — any pair with
    Jaccard ≥ t must collide inside these prefixes.  The order used is
    (count-min-estimated DF ASC, shingle hash ASC): ANY fixed global
    order is complete, so estimating DF from a broadcast 2 MB sketch
    (``jaccard_df_sketch``) instead of an exact per-shingle count removes
    two corpus-volume shuffles (the round-4 first cut paid a
    groupby(shingle) DF-attach AND a groupby(doc) regroup; the sketch
    folds prefix selection INTO the explode pass).  Boilerplate shingles
    (DF in the millions on a crawl) sort last and effectively never enter
    a prefix — a doc only indexes a hot shingle when nearly all its
    shingles are even hotter, i.e. near-pure template pages, for which
    pair volume is output-bound (identical docs are genuinely all-pairs
    in the EXACT result).  ``df_cap`` additionally drops shingles with
    estimated DF > cap — an explicitly approximate emergency valve
    (default None = exact).

    Stages:
      1. driver: build + ray.put the DF sketch (one cheap corpus pass,
         KB-scale merge).
      2. map_batches explode-prefix: per doc, distinct shingle hashes
         ordered by (est_df, shingle); emit ONLY the prefix rows.
      3. groupby(bucket_part) over prefix rows: vectorized self-merge on
         shingle + length filter (J ≥ t ⟹ min(na,nb) ≥ t·max(na,nb)) +
         within-bucket pair distinct.
      4. (``dedup_pairs=True``) groupby(pair_key): global pair dedup,
         never on the driver.  Consumers that pull the (collision-
         bounded, small) candidate set to the driver anyway pass False
         and drop_duplicates there — saving one all-to-all exchange,
         the same trade ``minhash_candidate_pairs_ds`` makes.
    Rows: (doc_a, doc_b) with doc_a < doc_b; globally distinct iff
    ``dedup_pairs`` (else distinct within bucket only)."""
    from ray.data.aggregate import Count, Min

    from langscrape_ray.pipelines.util import ensure_schema

    cms = jaccard_df_sketch(sf_dir, shingle_len)

    class ExplodePrefix:
        """Plain-TASK stage (no actor pool): the state is the 2 MB sketch
        captured in the callable — Ray serializes the fn ONCE to the
        object store and every warm worker reuses it, so there is no
        per-stage actor spin-up (the same trade the minhash signature
        stage makes; an actor pool pays ~2 s to hold 2 MB of state)."""

        def __init__(self, cms_arr):
            self.cms = cms_arr
            self.mh = _shingler(shingle_len)

        def __call__(self, t: pa.Table) -> pa.Table:
            # shingle per doc (Python regex is per-string), then estimate
            # DF for the WHOLE batch in one CMS probe and slice per doc
            docs_in = t["doc_id"].to_pylist()
            uniq = [np.unique(self.mh.shingles(text))
                    for text in t["text"].to_pylist()]
            lens = np.array([u.size for u in uniq], dtype=np.int64)
            est_all = (_cms_estimate(self.cms, np.concatenate(uniq))
                       if lens.sum() else np.empty(0, dtype=np.int64))
            offs = np.concatenate(([0], np.cumsum(lens)))
            sh_parts, doc_parts, size_parts, pos_parts = [], [], [], []
            for i, s in enumerate(uniq):
                n = int(lens[i])
                if n == 0:
                    continue
                est = est_all[offs[i]:offs[i + 1]]
                # global (est_df, shingle) order; stable prefix epsilon:
                # a too-SHORT prefix breaks completeness, one longer is
                # merely a superset
                order = np.lexsort((s, est))
                p = n - int(np.ceil(threshold * n - 1e-9)) + 1
                pick = order[:p]
                pos = np.arange(p, dtype=np.int64)
                if df_cap is not None:
                    keep = est[pick] <= df_cap
                    pick, pos = pick[keep], pos[keep]
                v = (s[pick] & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
                sh_parts.append(v)
                doc_parts.append(np.full(len(v), docs_in[i], dtype=np.int64))
                size_parts.append(np.full(len(v), n, dtype=np.int64))
                pos_parts.append(pos)
            sh = (np.concatenate(sh_parts) if sh_parts
                  else np.empty(0, dtype=np.int64))
            docs = (np.concatenate(doc_parts) if doc_parts
                    else np.empty(0, dtype=np.int64))
            sizes = (np.concatenate(size_parts) if size_parts
                     else np.empty(0, dtype=np.int64))
            poss = (np.concatenate(pos_parts) if pos_parts
                    else np.empty(0, dtype=np.int64))
            return pa.table(
                {
                    "shingle": pa.array(sh),
                    "doc_id": pa.array(docs),
                    "n_sh": pa.array(sizes),
                    "pos": pa.array(poss),
                    "bucket_part": pa.array((sh % n_parts).astype(np.int32)),
                }
            )

    def bucket_candidates(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized self-merge on shingle over PREFIX rows only, then
        # the length filter, the POSITIONAL filter and a within-bucket
        # pair distinct
        m = g.merge(g, on="shingle", suffixes=("_a", "_b"))
        na = m["n_sh_a"].to_numpy(dtype=np.int64)
        nb = m["n_sh_b"].to_numpy(dtype=np.int64)
        mask = m["doc_id_a"].to_numpy() < m["doc_id_b"].to_numpy()
        mask &= np.minimum(na, nb) >= threshold * np.maximum(na, nb) - 1e-9
        # PPJoin positional filter: a qualifying pair's FIRST common
        # element (under the global order) at 0-based positions (i, j)
        # has all overlap at positions >= i in A and >= j in B, so
        # |A∩B| <= min(na-i, nb-j) must reach the equivalent-overlap
        # bound α = t/(1+t)·(na+nb).  Keeping every co-occurrence that
        # passes is complete (the first common element of a qualifying
        # pair always passes); non-first co-occurrences that also pass
        # are removed by the pair distinct.
        pa_ = m["pos_a"].to_numpy(dtype=np.int64)
        pb_ = m["pos_b"].to_numpy(dtype=np.int64)
        alpha = threshold / (1.0 + threshold) * (na + nb)
        mask &= np.minimum(na - pa_, nb - pb_) >= alpha - 1e-9
        m = m.loc[mask, ["doc_id_a", "doc_id_b"]].drop_duplicates()
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_a"].to_numpy(dtype=np.int64),
                "doc_b": m["doc_id_b"].to_numpy(dtype=np.int64),
            }
        )

    cand = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(ExplodePrefix(cms), batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(bucket_candidates, batch_format="pandas")
    )
    if dedup_pairs:
        cand = (
            cand.map_batches(
                lambda t: _with_pair_key(t, "doc_a", "doc_b"),
                batch_format="pyarrow",
            )
            .groupby("pair_key")  # single-int64 key: see _with_pair_key
            .aggregate(
                Min("doc_a", alias_name="doc_a"),
                Min("doc_b", alias_name="doc_b"),
                Count(alias_name="_n"),
            )
        )
    return ensure_schema(
        cand, pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    )


def jaccard_similarity_join(sf_dir: str, threshold: float = 0.5,
                            shingle_len: int = 3,
                            n_parts: int = 32,
                            df_cap: Optional[int] = None) -> pd.DataFrame:
    """EXACT word-shingle Jaccard similarity join over the documents table
    (pairs with Jaccard >= threshold) — the deterministic sibling of the
    minhash pipeline, SQL-oracleable because no approximation is involved
    in the *result* (shingle identity uses the same 64-bit hash as
    MinHash; collisions are ~2^-64 and do not affect the test corpora).

    Scale shape: candidates come from ``jaccard_candidate_pairs_ds`` —
    the DF-ordered positional prefix filter (the stop-shingle guard that
    replaced the round-3 unguarded O(DF²) hot-shingle self-merge) — and
    are then verified with the exact shingle Jaccard.  The candidate set
    is bounded by the prefix-collision volume (≈ near-dup output size),
    so it lands on the driver like the function's own return value does;
    above ``JOIN_TAIL_PAIRS`` verification switches from the broadcast
    semi-join to two co-partitioned hash joins, same as minhash_dedup.
    The threshold compares the RAW ratio (rounding only for output),
    matching the SQL oracle.

    Reference parity: the verification metric of the reference's dedup
    story (SURVEY §2 training-data ops); tokenization identical to
    ``MinHashSignatures.shingles`` (\\S+ on lowercased text).
    """
    empty_result = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )
    pairs = jaccard_candidate_pairs_ds(
        sf_dir, threshold, shingle_len, n_parts, df_cap, dedup_pairs=False
    ).to_pandas()
    if pairs.empty:
        return empty_result
    # cross-bucket duplicate candidates dedup HERE on the already-driver-
    # resident set (one exchange saved; see jaccard_candidate_pairs_ds)
    pairs = (
        pairs.drop_duplicates(["doc_a", "doc_b"])
        .astype({"doc_a": "int64", "doc_b": "int64"})
    )
    if len(pairs) > JOIN_TAIL_PAIRS:
        out = _verify_pairs_join(sf_dir, pairs, threshold, None,
                                 shingle_len, round_first=False)
    else:
        out = _verify_pairs_semijoin(sf_dir, pairs, threshold,
                                     shingle_len, round_first=False)
    if out.empty:
        return empty_result
    return (
        out.astype({"doc_a": "int64", "doc_b": "int64"})
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def _pair_dedup_ds(cands: "rd.Dataset") -> "rd.Dataset":
    """Cross-bucket candidate dedup IN the Dataset (single-int64 pair-key
    groupby, see ``_with_pair_key``) — the distributed sibling of the
    driver-side ``drop_duplicates`` the small tier uses."""
    from ray.data.aggregate import Count, Min

    from langscrape_ray.pipelines.util import ensure_schema

    return ensure_schema(
        cands.map_batches(
            lambda t: _with_pair_key(t, "doc_a", "doc_b"),
            batch_format="pyarrow",
        )
        .groupby("pair_key")
        .aggregate(
            Min("doc_a", alias_name="doc_a"),
            Min("doc_b", alias_name="doc_b"),
            Count(alias_name="_n"),
        ),
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]),
    )


def jaccard_similarity_join_ds(sf_dir: str, threshold: float = 0.5,
                               shingle_len: int = 3,
                               n_parts: int = 32,
                               df_cap: Optional[int] = None,
                               _cands: "Optional[rd.Dataset]" = None,
                               ) -> "Optional[rd.Dataset]":
    """Dataset-returning exact Jaccard join — same semantics as
    ``jaccard_similarity_join`` but the edge set NEVER lands on the
    driver: candidates are pair-deduped in the Dataset (pair-key
    aggregate) and verified through the co-partitioned join tail
    (``_verify_pairs_join_ds``).  This is the edge source of
    ``fuzzy_dedup_keep_best``'s distributed tier; returns None when
    there are no candidates.  ``_cands`` lets a caller that already
    materialized the candidate Dataset (to count it for tiering) pass
    it in instead of re-running the corpus shingle pass."""
    cands = _cands
    if cands is None:
        cands = jaccard_candidate_pairs_ds(
            sf_dir, threshold, shingle_len, n_parts, df_cap,
            dedup_pairs=False,
        ).materialize()
    n_cand = cands.count()
    if n_cand == 0:
        return None
    return _verify_pairs_join_ds(
        _pair_dedup_ds(cands), sf_dir, threshold,
        _join_parts(n_rows=n_cand), shingle_len, round_first=False,
    )


def dedup_incremental(sf_dir: str, n_bits: int = 1 << 20) -> pd.DataFrame:
    """(doc_id, is_new): incremental ingestion dedup — which docs of an
    incoming batch (doc_id % 3 == 0) are NOT already in the kept corpus
    (doc_id % 3 != 0), by exact text hash.  This is how a 100 TB pipeline
    actually dedups: the corpus is already on disk; each new crawl batch
    checks against it, not against itself.

    Ray shape (fully out-of-driver exactness — the round-2 driver-resident
    exact hash set is gone):
      1. ONE pass over the existing side folds md5-hash partials into a
         bloom filter (OR-merge of fixed ``n_bits/8``-byte blobs on the
         driver — a few MB regardless of corpus size; at 10^10 docs the
         OR-merge itself runs as a tree reduce, still KB/s of driver work).
      2. The incoming side checks the broadcast bloom inside map_batches:
         bloom misses are DEFINITELY new (no false negatives) and finish
         right there.
      3. Only the bloom-HIT survivors (true dups + the ~1% false-positive
         tail) pay an exact check: a hash-partitioned LEFT OUTER join of
         survivor hashes against the distinct existing-key table — the
         anti-join's probe side is O(survivors), its build side shuffles
         by key hash, and NOTHING corpus-sized ever lands on the driver.
    The keys are 64-bit md5 prefixes (collision odds ~n^2/2^65 — switch
    to the full digest beyond ~10^8 docs).  The dedup key is the
    leading-2-token fingerprint (title-style near-exact key) because the
    synthetic corpus contains no exact duplicate texts — full-text md5
    would mark every incoming doc new and test nothing; swap ``_key`` for
    the whole text in production.  SQL oracle: md5 anti-join on the same
    key."""
    import hashlib

    import ray

    from langscrape_ray.pipelines.util import compact_for_join, ensure_schema

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def _key(text: str) -> str:
        return " ".join(text.split(" ")[:2])

    def _h(text: str) -> int:
        return int.from_bytes(
            hashlib.md5(_key(text).encode("utf-8")).digest()[:8], "little"
        )

    def existing_bloom_partial(t: pa.Table) -> pa.Table:
        hs = [
            _h(x)
            for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
            if did % 3 != 0
        ]
        bits = np.zeros(n_bits, dtype=bool)
        arr = np.asarray(hs, dtype=np.uint64)
        if len(arr):
            bits[(arr % np.uint64(n_bits)).astype(np.int64)] = True
            bits[((arr >> np.uint64(32)) % np.uint64(n_bits)).astype(np.int64)] = True
        return pa.table(
            {"bits": pa.array([np.packbits(bits).tobytes()], pa.binary())}
        )

    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for b in docs.map_batches(
        existing_bloom_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for blob in b["bits"].to_pylist():
            np.bitwise_or(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    bloom = np.unpackbits(merged).astype(bool)
    bloom_ref = ray.put(bloom)  # the ONLY broadcast: fixed-size bloom bits

    class BloomCheck:
        """Incoming-side gate: (doc_id, h, bloom_hit) — int64 bit-view of
        the uint64 key hash (join keys only need equality)."""

        def __init__(self, ref):
            self.bloom = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_id, out_h, out_hit = [], [], []
            for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                if did % 3 != 0:
                    continue
                h = _h(text)
                out_id.append(did)
                out_h.append(h - (1 << 64) if h >= (1 << 63) else h)
                out_hit.append(
                    bool(self.bloom[h % n_bits] and self.bloom[(h >> 32) % n_bits])
                )
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "h": pa.array(out_h, pa.int64()),
                    "bloom_hit": pa.array(out_hit, pa.bool_()),
                }
            )

    incoming = docs.map_batches(
        BloomCheck, fn_constructor_args=(bloom_ref,),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=0.5,
    ).materialize()

    # bloom misses need no further work: definitely new
    def miss_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.invert(t["bloom_hit"]))
        return pa.table(
            {
                "doc_id": f["doc_id"],
                "is_new": pa.array([True] * f.num_rows, pa.bool_()),
            }
        )

    misses = incoming.map_batches(miss_rows, batch_format="pyarrow").to_pandas()

    survivors_pd_parts = [misses]
    survivors = compact_for_join(
        ensure_schema(
            incoming.map_batches(
                lambda t: t.filter(t["bloom_hit"]).select(["doc_id", "h"]),
                batch_format="pyarrow",
            ),
            pa.schema([("doc_id", pa.int64()), ("h", pa.int64())]),
        )
    )
    n_survivors = survivors.count()
    if n_survivors > 0:
        def existing_keys(t: pa.Table) -> pa.Table:
            hs = [
                _h(x)
                for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
                if did % 3 != 0
            ]
            return pa.table(
                {
                    "h_ex": pa.array(
                        [h - (1 << 64) if h >= (1 << 63) else h for h in hs],
                        pa.int64(),
                    )
                }
            )

        from ray.data.aggregate import Count

        # distinct existing keys (groupby = the hash partitioning), with a
        # match marker the left-outer join turns into the anti-join bit
        keys = compact_for_join(
            ensure_schema(
                docs.map_batches(existing_keys, batch_format="pyarrow")
                .groupby("h_ex")
                .aggregate(Count(alias_name="_n"))
                .map_batches(
                    lambda t: pa.table(
                        {
                            "h_ex": t["h_ex"],
                            "hit": pa.array([1] * t.num_rows, pa.int32()),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                pa.schema([("h_ex", pa.int64()), ("hit", pa.int32())]),
            )
        )
        joined = survivors.join(
            keys, join_type="left_outer",
            num_partitions=_join_parts(n_rows=n_survivors),
            on=("h",), right_on=("h_ex",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        ).map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "is_new": pc.is_null(t["hit"]),
                }
            ),
            batch_format="pyarrow",
        )
        survivors_pd_parts.append(joined.to_pandas())

    out = pd.concat(survivors_pd_parts, ignore_index=True)
    out = out.astype({"doc_id": "int64", "is_new": "bool"})
    return out.sort_values("doc_id").reset_index(drop=True)


_SUBSTR_POS_BITS = 20  # token positions per doc < 2^20


def substring_dedup(sf_dir: str, n: int = 4) -> "rd.Dataset":
    """(doc_id, clean_text, n_removed): exact substring deduplication,
    first-occurrence-wins — the RefinedWeb/suffix-array-style cleaning
    step at word-``n``-gram granularity.  A token is removed when some
    ``n``-token window covering it is an exact repeat of a window that
    occurs EARLIER in the corpus (smaller doc_id, or smaller position in
    the same doc); the globally first occurrence of every span survives.
    Unlike boilerplate_prune (which removes ALL occurrences of hot grams
    past a frequency threshold), this keeps one canonical copy of every
    duplicated span — the dedup semantics, not the cleaning semantics.

    Ray shape:

    1. explode windows as (gram, k) with ONE packed int64 occurrence key
       ``k = doc_id << 20 | pos`` (loud overflow guards) — the key's
       integer order IS the corpus order, so "first occurrence" is a
       plain ``min``;
    2. ``groupby(gram).map_groups``: each group emits every key except
       its min — ONE shuffle of the narrow occurrence table, vectorized
       numpy per group (groups are occurrence lists, tiny);
    3. removed keys unpack to (doc_id, pos) and collapse per doc into a
       position list (int64-keyed groupby — removed spans only, a small
       fraction of the corpus);
    4. the corpus LEFT-OUTER joins the per-doc removal lists on doc_id
       (co-partitioned hash join, partitions bounded by _join_parts) and
       a stateless rebuild masks the covered positions.

    Nothing corpus-sized lands on the driver and no broadcast grows with
    duplication volume.  At 100 TB the gram strings in the step-2 shuffle
    pack to (md5-int64, k) pairs — same trick as _with_pair_key; the
    string key here keeps sf-scale SQL parity readable.  Oracle: window
    ``min() OVER`` is inexpressible per-gram, so the SQL uses the same
    grams CTE + groupby-min + self-join + anti-join string_agg rebuild —
    bit-exact.
    """
    from langscrape_ray.pipelines.util import compact_for_join

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        gs: List[str] = []
        ks: List[int] = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did >= (1 << (63 - _SUBSTR_POS_BITS)):
                raise ValueError(f"doc_id {did} overflows the pack key")
            w = text.split(" ")
            if len(w) >= (1 << _SUBSTR_POS_BITS):
                raise ValueError(
                    f"doc {did} has {len(w)} tokens >= 2^{_SUBSTR_POS_BITS}; "
                    "widen _SUBSTR_POS_BITS"
                )
            base = did << _SUBSTR_POS_BITS
            for i in range(len(w) - n + 1):
                gs.append(" ".join(w[i : i + n]))
                ks.append(base + i)
        return pa.table(
            {"g": pa.array(gs, pa.string()), "k": pa.array(ks, pa.int64())}
        )

    def emit_non_first(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        if len(k) < 2:
            return pa.table({"k": pa.array([], pa.int64())})
        return pa.table({"k": pa.array(k[k != k.min()], pa.int64())})

    removed_keys = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("g")
        .map_groups(emit_non_first, batch_format="pyarrow")
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(k >> _SUBSTR_POS_BITS, pa.int64()),
                "pos": pa.array(
                    k & ((1 << _SUBSTR_POS_BITS) - 1), pa.int64()
                ),
            }
        )

    def collapse(g: pa.Table) -> pa.Table:
        # positions pack into one little-endian int64 blob per doc: Arrow
        # hash joins reject list-typed non-key fields, binary is fine
        pos = np.unique(g["pos"].to_numpy(zero_copy_only=False))
        if len(pos) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rm_pos": pa.array([], pa.binary()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array([g["doc_id"][0].as_py()], pa.int64()),
                "rm_pos": pa.array(
                    [pos.astype("<i8").tobytes()], pa.binary()
                ),
            }
        )

    removal_lists = compact_for_join(
        removed_keys.map_batches(unpack, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(collapse, batch_format="pyarrow")
    )

    joined = docs.join(
        removal_lists,
        join_type="left_outer",
        num_partitions=_join_parts(),
        on=("doc_id",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def rebuild(t: pa.Table) -> pa.Table:
        out_id, out_text, out_n = [], [], []
        rm_col = t["rm_pos"].to_pylist()
        for did, text, rm in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(), rm_col
        ):
            w = text.split(" ")
            if not rm:
                out_id.append(did)
                out_text.append(text)
                out_n.append(0)
                continue
            drop = bytearray(len(w))
            for i in np.frombuffer(rm, "<i8"):
                drop[i : i + n] = b"\x01" * n
            kept = [tok for tok, d in zip(w, drop) if not d]
            out_id.append(did)
            out_text.append(" ".join(kept))
            out_n.append(len(w) - len(kept))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "clean_text": pa.array(out_text, pa.string()),
                "n_removed": pa.array(out_n, pa.int64()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")


def fuzzy_dedup_keep_best(
    sf_dir: str, threshold: float = 0.5, shingle_len: int = 3,
    local_edge_limit: int = 2_000_000, max_iters: int = 25,
) -> "rd.Dataset":
    """(doc_id, cluster_rep, kept): the production fuzzy-dedup composite
    (RefinedWeb/FineWeb shape) — near-duplicate clusters keep exactly one
    document each, chosen by QUALITY instead of arrival order: edges from
    the exact shingle-Jaccard join, connected components, then per-cluster
    argmax on (alpha_per_10k, n_chars) with doc_id ascending as the tie
    break.  Singleton documents are their own cluster and always kept.

    Ray shape — every stage is a piece that already carries its own scale
    story, composed without any new corpus-sized state:

      1. EDGES: ``jaccard_similarity_join`` (DF-ordered positional prefix
         filter; candidate volume ≈ near-dup output size).  Swap in the
         MinHash-LSH pair source for the approximate tier at 100 TB —
         the downstream stages are edge-source-agnostic.
      2. CC: TIERED on the candidate count (the cheap upper bound on the
         edge count, known before verification).  At or below
         ``local_edge_limit`` candidates, a driver union-find over the
         near-dup-sized edge list — the standard local-phase finish.
         ABOVE it, the fully distributed tail
         (``_fuzzy_keep_best_distributed``): the verified edge set stays
         a Dataset end-to-end and components come from
         ``_cc_labels_distributed`` (hash-to-min + pointer doubling,
         O(log diameter) rounds, O(|E|) exchange per round).
      3. KEEPER CHOICE: quality integers computed ONLY for touched docs
         (edge endpoints — near-dup-sized, never the corpus); small tier
         pulls them to the driver via a pushdown-filtered pass, the
         distributed tier computes them behind a docs⋈labels join and
         picks each cluster's argmax in a groupby.map_groups.
      4. LABEL: small tier broadcasts (rep, keeper) dicts into one
         stateless map_batches pass; the distributed tier labels via two
         left-outer joins (labels on doc_id, keepers on cluster_rep).
         Untouched docs short-circuit to kept=1 either way.

    Quality integers mirror ``textstats.quality_score`` exactly
    (alpha_per_10k = alpha_chars*10000 // n_chars, integer floor) so the
    SQL oracle is bit-exact — both tiers produce identical output
    (tier-parity tested).
    """
    import ray

    from .textstats import _ALPHA_RE, _read_docs

    # ONE corpus shingle pass: candidates materialized, counted for the
    # tier decision, then reused by whichever tier runs
    cands = jaccard_candidate_pairs_ds(
        sf_dir, threshold, shingle_len, dedup_pairs=False
    ).materialize()
    n_cand = cands.count()

    if n_cand > local_edge_limit:
        edges = jaccard_similarity_join_ds(
            sf_dir, threshold, shingle_len, _cands=cands
        )
        return _fuzzy_keep_best_distributed(
            sf_dir, edges, max_iters=max_iters
        )

    # ---- driver tier: candidate set fits on one node ----
    if n_cand == 0:
        pairs = pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64")}
        )
    else:
        pairs_pd = (
            cands.to_pandas()
            .drop_duplicates(["doc_a", "doc_b"])
            .astype({"doc_a": "int64", "doc_b": "int64"})
        )
        if len(pairs_pd) > JOIN_TAIL_PAIRS:
            pairs = _verify_pairs_join(sf_dir, pairs_pd, threshold, None,
                                       shingle_len, round_first=False)
        else:
            pairs = _verify_pairs_semijoin(sf_dir, pairs_pd, threshold,
                                           shingle_len, round_first=False)
    rep_uf = _cc_union_find(
        pairs.rename(columns={"doc_a": "vec_a", "doc_b": "vec_b"})
    )
    # _cc_union_find omits cluster roots (they never get a parent entry);
    # the keeper choice must consider EVERY edge endpoint incl. the root,
    # so widen to the full touched set with roots mapping to themselves
    touched = set(pairs["doc_a"]) | set(pairs["doc_b"])
    rep = {int(v): rep_uf.get(int(v), int(v)) for v in touched}
    touched = set(rep)

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def quality_touched(t: pa.Table) -> pa.Table:
        out_id, out_alpha, out_chars = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did in touched:
                n = len(text)
                out_id.append(did)
                out_chars.append(n)
                out_alpha.append(
                    (len(_ALPHA_RE.sub("", text)) * 10000) // n if n else 0
                )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "alpha": pa.array(out_alpha, pa.int64()),
                "n_chars": pa.array(out_chars, pa.int64()),
            }
        )

    qual = docs.map_batches(quality_touched, batch_format="pyarrow").to_pandas()
    keeper: dict = {}
    if not qual.empty:
        qual["rep"] = qual["doc_id"].map(lambda d: rep.get(d, d))
        best = qual.sort_values(
            ["rep", "alpha", "n_chars", "doc_id"],
            ascending=[True, False, False, True],
        ).drop_duplicates("rep")
        keeper = dict(zip(best["rep"], best["doc_id"]))

    state_ref = ray.put((rep, keeper))

    class Label:
        def __init__(self, ref):
            self.rep, self.keeper = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            rget = self.rep.get
            kget = self.keeper.get
            vids = t["doc_id"].to_pylist()
            reps, kept = [], []
            for d in vids:
                r = rget(d)
                if r is None:
                    reps.append(d)
                    kept.append(1)
                else:
                    reps.append(r)
                    kept.append(1 if kget(r) == d else 0)
            return pa.table(
                {
                    "doc_id": pa.array(vids, pa.int64()),
                    "cluster_rep": pa.array(reps, pa.int64()),
                    "kept": pa.array(kept, pa.int64()),
                }
            )

    return (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(
            Label,
            fn_constructor_args=(state_ref,),
            batch_format="pyarrow",
            concurrency=(2, 8),
        )
        .sort("doc_id")
    )


def _fuzzy_keep_best_distributed(sf_dir: str, edges: "Optional[rd.Dataset]",
                                 max_iters: int = 25) -> "rd.Dataset":
    """Fully distributed tail of ``fuzzy_dedup_keep_best`` — nothing
    corpus- or edge-sized ever lands on the driver:

      CC        ``_cc_labels_distributed`` over the verified edge Dataset
                (hash-to-min + pointer doubling).
      QUALITY   docs ⋈ labels inner join pulls text ONLY for touched
                docs; alpha/n_chars integers computed per batch.
      KEEPER    groupby(cluster).map_groups argmax on
                (alpha DESC, n_chars DESC, doc_id ASC).
      LABEL     corpus ids ⟕ labels (cluster_rep := coalesce(label,
                doc_id)), then ⟕ keepers on cluster_rep; kept :=
                coalesce(keeper, doc_id) == doc_id — untouched docs have
                no keeper row and short-circuit to kept=1.

    Output identical to the driver tier (tier-parity tested)."""
    from .textstats import _ALPHA_RE, _read_docs
    from langscrape_ray.pipelines.util import compact_for_join, ensure_schema

    ids = _read_docs(sf_dir, ["doc_id"])
    agg_args = {"num_cpus": 0.25}

    def self_label(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "cluster_rep": t["doc_id"].cast(pa.int64()),
                "kept": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    if edges is None:  # no candidates at all: everything is a singleton
        return ids.map_batches(
            self_label, batch_format="pyarrow"
        ).sort("doc_id")

    labels = _cc_labels_distributed(
        edges, "doc_a", "doc_b", max_iters=max_iters
    ).materialize()
    n_touched = labels.count()
    if n_touched == 0:  # candidates existed but none verified
        return ids.map_batches(
            self_label, batch_format="pyarrow"
        ).sort("doc_id")
    n_parts = _join_parts(n_rows=n_touched)

    # quality integers for TOUCHED docs only (mirror quality_score)
    touched_k = labels.map_batches(
        lambda t: pa.table({"t_vid": t["vec_id"], "rep": t["label"]}),
        batch_format="pyarrow",
    )
    qual = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .join(
            compact_for_join(touched_k), join_type="inner",
            num_partitions=n_parts, on=("doc_id",), right_on=("t_vid",),
            aggregator_ray_remote_args=agg_args,
        )
    )

    def quality(t: pa.Table) -> pa.Table:
        out_a, out_c = [], []
        for text in t["text"].to_pylist():
            n = len(text)
            out_c.append(n)
            out_a.append(
                (len(_ALPHA_RE.sub("", text)) * 10000) // n if n else 0
            )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "rep": t["rep"].cast(pa.int64()),
                "alpha": pa.array(out_a, pa.int64()),
                "n_chars": pa.array(out_c, pa.int64()),
            }
        )

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["alpha", "n_chars", "doc_id"], ascending=[False, False, True]
        )
        return pd.DataFrame(
            {
                "k_rep": [int(g["rep"].iloc[0])],
                "keeper": [int(g["doc_id"].iloc[0])],
            }
        )

    keepers = compact_for_join(
        ensure_schema(
            qual.map_batches(quality, batch_format="pyarrow")
            .groupby("rep")
            .map_groups(best, batch_format="pandas"),
            pa.schema([("k_rep", pa.int64()), ("keeper", pa.int64())]),
        )
    )

    # label the corpus: two left-outer joins, one corpus-sized pass each
    lab = ids.join(
        touched_k, join_type="left_outer", num_partitions=n_parts,
        on=("doc_id",), right_on=("t_vid",),
        aggregator_ray_remote_args=agg_args,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "cluster_rep": pc.coalesce(
                    t["rep"], t["doc_id"].cast(pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )
    # corpus-sized left side: compact only to drop empty join-output
    # blocks (schema-broadcast bug), with block count scaled to the data
    # so this never funnels 100 TB into 8 blocks
    out = compact_for_join(lab, max_blocks=max(8, n_parts * 8)).join(
        keepers, join_type="left_outer", num_partitions=n_parts,
        on=("cluster_rep",), right_on=("k_rep",),
        aggregator_ray_remote_args=agg_args,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_rep": t["cluster_rep"],
                "kept": pc.equal(
                    pc.coalesce(t["keeper"], t["doc_id"]), t["doc_id"]
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return out.sort("doc_id")
