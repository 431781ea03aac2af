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
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_TOKEN_RE = re.compile(r"\S+")
_MERSENNE = (1 << 61) - 1


def _read_docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Representative per exact-text group: (doc_id=min, n_dups) —
    hash-partition on content hash + per-group first (SURVEY.md §2.7 D1 →
    groupby(hash).first).  SQL oracle: GROUP BY text."""

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "text_hash": pa.array(hs, pa.string())}
        )

    def rep(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].min())], "n_dups": [int(len(g))]}
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(rep, batch_format="pandas")
        .sort("doc_id")
        .to_pandas()
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

    def shingles(self, text: str) -> List[int]:
        toks = _TOKEN_RE.findall(text.lower())
        k = self.shingle_len
        if len(toks) < k:
            return [_h64(" ".join(toks))] if toks else []
        return [_h64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        hs = np.asarray(sh, dtype=np.uint64)[None, :]  # (1, n)
        x = hs + self.seeds[:, None]  # (k, n) — uint64 wraps mod 2^64
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        """Emit (band_id, band_hash, doc_id) rows — the LSH explode."""
        rows_band, rows_hash, rows_doc = [], [], []
        rpb = self.num_perm // self.bands
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = self.signature(text)
            for b in range(self.bands):
                band = sig[b * rpb : (b + 1) * rpb]
                bh = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                rows_band.append(b)
                rows_hash.append(bh)
                rows_doc.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(rows_band, pa.int32()),
                "band_hash": pa.array(rows_hash, pa.string()),
                "doc_id": pa.array(rows_doc, pa.int64()),
            }
        )


def ngram_jaccard(text_a: str, text_b: str, shingle_len: int = 3) -> float:
    """Exact word-shingle Jaccard (the verification metric)."""
    mh = MinHashSignatures(shingle_len=shingle_len)
    sa, sb = set(mh.shingles(text_a)), set(mh.shingles(text_b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                            n_parts: int = 64) -> pd.DataFrame:
    """LSH candidate pairs: shingle -> minhash -> band -> bucket-hash
    partition -> within-bucket pairs, deduped.  Buckets are co-located by
    ``hash(band) % n_parts`` so the shuffle has n_parts coarse groups (one
    vectorized pandas groupby each) instead of one task per bucket — Ray's
    per-group map_groups overhead dominates otherwise.  Returns
    (doc_a, doc_b) with doc_a < doc_b."""

    def add_part(t: pa.Table) -> pa.Table:
        parts = [
            int(h, 16) % n_parts for h in t["band_hash"].to_pylist()
        ]
        return t.append_column("bucket_part", pa.array(parts, pa.int32()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_bid, _bh), grp in g.groupby(["band_id", "band_hash"]):
            ids = sorted(set(int(x) for x in grp["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            MinHashSignatures,
            fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
            batch_format="pyarrow",
            concurrency=2,
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return (
        cand.drop_duplicates().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def minhash_dedup(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Near-dup pairs verified by exact n-gram Jaccard >= threshold.

    Candidate generation is distributed; verification joins the candidate
    pairs (small) against the texts via a broadcast lookup — at larger
    candidate volume this becomes a bucketed self-join on doc_id."""
    import ray

    pairs = minhash_candidate_pairs(sf_dir)
    if pairs.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    texts = (
        _read_docs(sf_dir, ["doc_id", "text"]).to_pandas().set_index("doc_id")["text"]
    )
    texts_ref = ray.put(texts.to_dict())

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(texts_ref)
        jac = [
            round(ngram_jaccard(lut[a], lut[b]), 4)
            for a, b in zip(batch["doc_a"], batch["doc_b"])
        ]
        batch = batch.copy()
        batch["jaccard"] = jac
        return batch[batch["jaccard"] >= threshold]

    out = (
        rd.from_pandas(pairs)
        .map_batches(verify, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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
            hs = np.fromiter((_h64(tok) for tok in toks), dtype=np.uint64)
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
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashSignatures, batch_format="pyarrow", concurrency=2
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
        out_a, out_b, out_d = [], [], []
        for (_bid, _bv), grp in g.groupby(["band_id", "band_val"]):
            rows = sorted(
                set(zip((int(x) for x in grp["doc_id"]),
                        (int(s) for s in grp["simhash"])))
            )
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = bin((rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_hamming:
                        out_a.append(rows[i][0])
                        out_b.append(rows[j][0])
                        out_d.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_d})

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
            vecs = np.stack(
                [np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()]
            )
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
