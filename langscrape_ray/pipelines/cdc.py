"""Content-defined chunking (CDC) dedup — storage-grade chunk-level dedup.

The production shape: crawl snapshots of the same page differ by small
edits; fixed-size blocks lose all alignment after one insertion, while
content-defined boundaries (cut where a rolling window hash matches a
pattern — Muthitacharoen et al. 2001 LBFS, Xia et al. 2016 FastCDC)
re-synchronize immediately, so the unchanged tail dedups byte-for-byte.
The reference repo has no analog — this is engine surface for recrawl
storage and near-identical-page dedup (SURVEY §2.12 X76).

Chunking kernel (vectorized, no per-byte Python loop):
- window hash ``H[i] = Σ_{j<8} GEAR[b[i+j]] * M[j]`` (uint64 wraparound)
  computed for ALL positions with 8 shifted multiply-adds — a Rabin-style
  fixed-window hash; GEAR is an md5-derived 256×uint64 table (engine- and
  process-independent, no Python hash()).
- boundary candidates where ``H & mask == mask`` (avg chunk = 2^avg_bits);
  min/max enforcement walks only the sparse candidate list (~1/2^avg_bits
  of positions), with forced cuts at ``max_size``.
- chunk id = md5 of the chunk bytes.

Ray shape: chunking is a stateless ``map_batches`` explode (rows leave as
(source, chunk_hash, chunk_len) — chunk BYTES never enter the exchange);
dedup stats are two bounded groupbys (distinct-hash cardinality per
source).  At 100 TB the chunk-hash table is the only shuffled payload,
~24 B per chunk ≈ 0.01× the corpus.

Rows-only (chunk boundaries have no SQL analog); size-bound /
reconstruction / shift-resistance / CDC-beats-fixed properties are
pytest-gated in tests/test_cdc.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

_W = 8
_GEAR = np.array(
    [
        int.from_bytes(hashlib.md5(f"gear:{i}".encode()).digest()[:8], "big")
        for i in range(256)
    ],
    dtype=np.uint64,
)
# odd multipliers spread each window byte across the hash (md5-derived,
# forced odd so they are units mod 2^64)
_M = np.array(
    [
        int.from_bytes(hashlib.md5(f"mult:{j}".encode()).digest()[:8], "big")
        | 1
        for j in range(_W)
    ],
    dtype=np.uint64,
)


def cdc_boundaries(data: bytes, min_size: int = 64, avg_bits: int = 8,
                   max_size: int = 1024) -> list[int]:
    """Cut offsets (exclusive ends, ascending, last == len(data)).

    Every chunk except possibly the last is in [min_size, max_size]; a
    boundary depends only on the 8 bytes ending at it, so an edit
    re-synchronizes at the first content cut past the edited region."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, np.uint8)
    if n < _W or n <= min_size:
        cand = np.empty(0, dtype=np.int64)
    else:
        g = _GEAR[b]
        m = n - _W + 1
        h = np.zeros(m, dtype=np.uint64)
        for j in range(_W):
            h += g[j : j + m] * _M[j]
        mask = np.uint64((1 << avg_bits) - 1)
        # cut AFTER the window's last byte: candidate offset = i + _W
        cand = np.flatnonzero((h & mask) == mask) + _W

    cuts: list[int] = []
    start = 0
    for c in cand:
        c = int(c)
        if c - start < min_size:
            continue
        while c - start > max_size:
            cuts.append(start + max_size)
            start += max_size
        if c - start < min_size:
            continue
        cuts.append(c)
        start = c
    while n - start > max_size:
        cuts.append(start + max_size)
        start += max_size
    if start < n:
        cuts.append(n)
    return cuts


def cdc_chunks(data: bytes, min_size: int = 64, avg_bits: int = 8,
               max_size: int = 1024) -> list[tuple[str, int]]:
    """[(md5_hex, length), ...] for each chunk."""
    out = []
    start = 0
    for cut in cdc_boundaries(data, min_size, avg_bits, max_size):
        chunk = data[start:cut]
        out.append((hashlib.md5(chunk).hexdigest(), cut - start))
        start = cut
    return out


def fixed_chunks(data: bytes, size: int = 256) -> list[tuple[str, int]]:
    """Fixed-size baseline (what CDC beats after an insertion)."""
    return [
        (hashlib.md5(data[i : i + size]).hexdigest(),
         min(size, len(data) - i))
        for i in range(0, len(data), size)
    ]


def _edit(text: str, doc_id: int) -> str:
    """The deterministic recrawl edit: insert a 16-char doc_id-keyed
    marker at an md5-chosen offset (simulates a timestamp/counter change
    between two crawl snapshots of the same page)."""
    h = int(hashlib.md5(f"edit:{doc_id}".encode()).hexdigest()[:8], 16)
    pos = h % max(1, len(text))
    marker = f"[rev:{h % 100000:05d}...]"
    return text[:pos] + marker + text[pos:]


def cdc_dedup(sf_dir: str, chunker=None, min_size: int = 32,
              avg_bits: int = 6, max_size: int = 256) -> pd.DataFrame:
    """(source, n_chunks, n_unique_chunks, total_bytes, unique_bytes,
    dedup_ratio_e6): chunk-level dedup over TWO crawl snapshots of every
    document (v1 = text, v2 = text with the deterministic _edit) — the
    recrawl-storage workload.  Content-defined boundaries mean v2 shares
    almost every chunk with v1 despite the insertion, so unique_bytes ≈
    half of total_bytes plus one edited chunk per doc; the fixed-size
    baseline dedups almost nothing after the same edit (property-gated
    in tests/test_cdc.py).

    Exchange: (source, chunk_hash, chunk_len) rows — never chunk bytes —
    then ONE groupby(source, hash) distinct fold and ONE groupby(source)
    rollup.

    Default chunk parameters (min 32 / avg 64 / max 256) are sized to the
    testdata's short documents so each doc spans several chunks; real
    crawl pages use the kernel defaults (64/256/1024)."""
    if chunker is None:
        def chunker(b, _mn=min_size, _ab=avg_bits, _mx=max_size):
            return cdc_chunks(b, _mn, _ab, _mx)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def explode(t: pa.Table) -> pa.Table:
        srcs, hashes, lens = [], [], []
        for did, txt, src in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(),
            t["source"].to_pylist(),
        ):
            for version in (txt, _edit(txt, did)):
                for h, ln in chunker(version.encode("utf-8")):
                    srcs.append(src)
                    hashes.append(h)
                    lens.append(ln)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "chunk_hash": pa.array(hashes, pa.string()),
                "chunk_len": pa.array(lens, pa.int64()),
            }
        )

    per_hash = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["source", "chunk_hash"])
        .aggregate(
            Count(alias_name="n_copies"),
            Max("chunk_len", alias_name="chunk_len"),
        )
    )

    def rollup(t: pa.Table) -> pa.Table:
        n_copies = t["n_copies"].to_numpy(zero_copy_only=False)
        ln = t["chunk_len"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t["source"],
                "n_chunks": pa.array(n_copies, pa.int64()),
                "n_unique": pa.array(np.ones(len(t), np.int64)),
                "total_bytes": pa.array(n_copies * ln, pa.int64()),
                "unique_bytes": pa.array(ln, pa.int64()),
            }
        )

    agg = (
        per_hash.map_batches(rollup, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_unique", alias_name="n_unique_chunks"),
            Sum("total_bytes", alias_name="total_bytes"),
            Sum("unique_bytes", alias_name="unique_bytes"),
        )
        .to_pandas()
    )
    agg["dedup_ratio_e6"] = (
        (agg["total_bytes"] - agg["unique_bytes"]) * 1_000_000
        // agg["total_bytes"]
    ).astype("int64")
    return agg.sort_values("source").reset_index(drop=True)
