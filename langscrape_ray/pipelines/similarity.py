"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k: per-batch numpy matmul against a broadcast query
matrix (exactness baseline; the 10^9-vector scale path swaps the broadcast
matrix for an IVF/LSH-bucketed index — see lsh_bucketed_topk).  SQL oracle:
cross join + list_cosine_similarity + row_number window.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _load_queries(sf_dir: str, n_queries: int):
    q = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
        .sort_values("vec_id")
    )
    qids = q["vec_id"].to_numpy()
    qmat = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    return qids, qmat


def knn_cosine_topk(sf_dir: str, n_queries: int = 10, k: int = 5) -> pd.DataFrame:
    """Top-k cosine neighbors (excluding self) for the first ``n_queries``
    vectors.  Returns (query_id, neighbor_id, rank) — rank 1-based by
    descending cosine, neighbor_id ascending on exact ties.

    Pattern: broadcast the query matrix once (ray.put); every batch computes
    a (batch x n_queries) matmul and emits ONLY its per-batch top-k partial
    rows; a final small sort/head per query merges partials.  The corpus is
    never materialized."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((qids, qmat))

    class PartialTopK:
        def __init__(self, ref):
            self.qids, self.qmat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = np.asarray(t["vec_id"], dtype=np.int64)
            vecs = np.stack(
                [np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()]
            )
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = self.qmat @ vecs.T  # (n_queries, batch)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                row = sims[qi]
                mask = vids != qid  # exclude self
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                take = min(k, cand_idx.size)
                top = cand_idx[np.argpartition(-row[cand_idx], take - 1)[:take]]
                for j in top:
                    out_q.append(int(qid))
                    out_n.append(int(vids[j]))
                    out_s.append(float(row[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(PartialTopK(q_ref), batch_format="pyarrow")
        .to_pandas()
    )
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def lsh_bucketed_topk(
    sf_dir: str, n_queries: int = 10, k: int = 5, n_planes: int = 8,
    seed: int = 7, multiprobe: int = 1, dim: Optional[int] = None,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing — the scale
    path: vectors shuffle ONCE on their bucket key; each query only scans
    its own (multi-probed) buckets instead of the whole corpus.

    Returns the same (query_id, neighbor_id, rank) shape as the exact
    variant; recall < 1.0 by construction (no SQL oracle — rows-only)."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    if dim is None:
        dim = qmat.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes.T) > 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_buckets = bucket_of(qmat)
    # multiprobe: also probe buckets at Hamming distance 1
    probe_sets = []
    for b in q_buckets:
        probes = {int(b)}
        if multiprobe >= 1:
            probes |= {int(b) ^ (1 << i) for i in range(n_planes)}
        probe_sets.append(probes)
    wanted = set().union(*probe_sets) if probe_sets else set()
    q_ref = ray.put((qids, qmat, probe_sets))

    def tag(t: pa.Table) -> pa.Table:
        vecs = np.stack(
            [np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()]
        )
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        b = bucket_of(vecs)
        keep = np.array([int(x) in wanted for x in b])
        return pa.table(
            {
                "vec_id": pa.array(np.asarray(t["vec_id"])[keep].tolist(), pa.int64()),
                "bucket": pa.array(b[keep].tolist(), pa.int64()),
                "embedding": pa.array(
                    [t["embedding"][i].as_py() for i in np.nonzero(keep)[0]],
                    pa.list_(pa.float32()),
                ),
            }
        )

    cand = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(tag, batch_format="pyarrow")
        .to_pandas()
    )
    out_rows = []
    for qi, qid in enumerate(qids):
        sub = cand[cand["bucket"].isin(probe_sets[qi]) & (cand["vec_id"] != qid)]
        if sub.empty:
            continue
        vecs = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vecs @ qmat[qi]
        sub = sub.assign(cosine=sims).sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        )
        for rank, (_, row) in enumerate(sub.head(k).iterrows(), 1):
            out_rows.append(
                {"query_id": int(qid), "neighbor_id": int(row["vec_id"]), "rank": rank}
            )
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "rank"])
