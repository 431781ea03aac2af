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

from .util import list_col_matrix


def _load_queries(sf_dir: str, n_queries: int):
    import pyarrow.compute as pc

    # predicate pushdown: the filter prunes row groups at the parquet scan
    # instead of streaming every row through a Python predicate
    q = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
            filter=pc.field("vec_id") < n_queries,
        )
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
            vecs = list_col_matrix(t["embedding"], np.float64)
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


def ivf_topk(
    sf_dir: str, n_queries: int = 10, k: int = 5, n_centroids: int = 32,
    nprobe: int = 8, sample_stride: int = 7, sample_cap: int = 4096,
    kmeans_iters: int = 5,
) -> pd.DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer — the
    second scale path next to ``lsh_bucketed_topk``.

    Train: a deterministic corpus sample (every ``sample_stride``-th
    vec_id, capped) is pulled to the driver and run through a few Lloyd
    iterations seeded from the first ``n_centroids`` sample points — the
    centroid matrix is tiny and broadcast once via ``ray.put``.  At
    10^9-vector scale the sample read stays a projected, filtered scan;
    the training cost is independent of corpus size.

    Search: ONE fused map_batches stage assigns each batch row to its
    nearest centroid (batch x C matmul) and scores it against exactly the
    queries whose ``nprobe`` closest centroids contain that row's cell,
    emitting per-batch top-k partials; the driver merge sees only
    k x n_queries x n_blocks tiny rows.  The corpus is never broadcast or
    materialized.  Approximate by construction (recall < 1 when a true
    neighbor lives outside the probed cells) — rows-only, with a recall
    assertion vs ``knn_cosine_topk`` in tests."""
    qids, qmat = _load_queries(sf_dir, n_queries)

    def stride_mask(t: pa.Table) -> pa.Table:
        # modulo isn't pushdown-expressible; a vectorized numpy mask per
        # Arrow batch replaces the round-2 per-row Python predicate
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        return t.filter(pa.array(vids % sample_stride == 0))

    sample = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(stride_mask, batch_format="pyarrow")
        .limit(sample_cap)
        .to_pandas()
        .sort_values("vec_id")
    )
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    smat /= np.linalg.norm(smat, axis=1, keepdims=True)
    C = min(n_centroids, len(smat))
    centroids = smat[:C].copy()  # deterministic init: first C sample points
    for _ in range(kmeans_iters):
        assign = (smat @ centroids.T).argmax(axis=1)
        for c in range(C):
            members = smat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    # per-query probe set: the nprobe nearest centroids
    q_cells = np.argsort(-(qmat @ centroids.T), axis=1)[:, : min(nprobe, C)]
    q_ref = ray.put((qids, qmat, centroids, q_cells))

    class IVFPartialTopK:
        def __init__(self, ref):
            self.qids, self.qmat, self.centroids, q_cells = ray.get(ref)
            self.q_cells = [np.asarray(c, dtype=np.int64) for c in q_cells]

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = np.asarray(t["vec_id"], dtype=np.int64)
            vecs = list_col_matrix(t["embedding"], np.float64)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            cells = (vecs @ self.centroids.T).argmax(axis=1)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(cells, self.q_cells[qi]) & (vids != qid)
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                sims = vecs[cand_idx] @ self.qmat[qi]
                take = min(k, cand_idx.size)
                top = np.lexsort((vids[cand_idx], -sims))[:take]
                out_q.extend([int(qid)] * take)
                out_n.extend(vids[cand_idx[top]].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(IVFPartialTopK(q_ref), batch_format="pyarrow")
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def lsh_bucketed_topk(
    sf_dir: str, n_queries: int = 10, k: int = 5, n_planes: int = 6,
    n_tables: int = 8, seed: int = 7, multiprobe: int = 1,
    dim: Optional[int] = None,
) -> pd.DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH — the scale
    path: ``n_tables`` independent ``n_planes``-bit signatures; a vector is
    a candidate for a query if ANY table buckets them together (with
    Hamming-1 multiprobe per table).  Classic LSH union-of-tables: per-
    table collision prob for similar vectors is p^k, union over L tables
    drives recall toward 1 while each table's buckets stay selective.
    Each query scans only its probed buckets instead of the whole corpus.

    Returns the same (query_id, neighbor_id, rank) shape as the exact
    variant; recall < 1.0 by construction (no SQL oracle — rows-only)."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    if dim is None:
        dim = qmat.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    weights = 1 << np.arange(n_planes)

    def buckets_of(mat: np.ndarray) -> np.ndarray:
        """(n, n_tables) bucket ids."""
        bits = np.stack(
            [(mat @ planes[t].T) > 0 for t in range(n_tables)], axis=1
        )  # (n, L, k)
        return (bits * weights).sum(axis=2).astype(np.int64)

    q_buckets = buckets_of(qmat)  # (n_queries, L)
    # per (query, table) probe list: own bucket + Hamming-1 neighbors
    probe_lists = []
    for qi in range(len(qids)):
        per_table = []
        for t in range(n_tables):
            b = int(q_buckets[qi, t])
            probes = {b}
            if multiprobe >= 1:
                probes |= {b ^ (1 << i) for i in range(n_planes)}
            per_table.append(sorted(probes))
        probe_lists.append(per_table)
    q_ref = ray.put((qids, qmat, probe_lists))

    class BucketedPartialTopK:
        """One fused stage: bucket each batch row, and for every query
        compute cosine only against the rows landing in that query's probe
        set, emitting per-batch top-k partials.  The candidate set never
        leaves the workers (round 1 pulled it to the driver and ranked it
        in a pandas loop); the driver merge sees <= k x n_queries x
        n_blocks tiny rows — same tail shape as knn_cosine_topk."""

        def __init__(self, ref):
            self.qids, self.qmat, probe_lists = ray.get(ref)
            self.probes = [
                [np.asarray(p, dtype=np.int64) for p in per_table]
                for per_table in probe_lists
            ]

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = np.asarray(t["vec_id"], dtype=np.int64)
            vecs = list_col_matrix(t["embedding"], np.float64)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            buckets = buckets_of(vecs)  # (n, L)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.zeros(len(vids), dtype=bool)
                for tb in range(n_tables):
                    mask |= np.isin(buckets[:, tb], self.probes[qi][tb])
                mask &= vids != qid
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                sims = vecs[cand_idx] @ self.qmat[qi]
                take = min(k, cand_idx.size)
                # lexsort keeps the (cosine desc, vec_id asc) tie-break
                # exact at the partial boundary (argpartition would not)
                top = np.lexsort((vids[cand_idx], -sims))[:take]
                out_q.extend([int(qid)] * take)
                out_n.extend(vids[cand_idx[top]].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(BucketedPartialTopK(q_ref), batch_format="pyarrow")
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def pq_search_topk(sf_dir: str, n_queries: int = 10, k: int = 5,
                   n_sub: int = 8, n_codes: int = 16,
                   rerank: int = 20) -> pd.DataFrame:
    """Approximate top-k via PRODUCT-QUANTIZATION ADC (Jegou et al. 2011)
    with exact re-rank — the 8-bytes-per-vector scan tier between
    brute force (knn_cosine_topk) and the IVF/LSH bucketed tiers:

      1. train ``n_sub`` per-subspace ``n_codes``-entry codebooks over the
         L2-NORMALIZED corpus (two streaming Lloyd passes of per-block
         (count, sum) partials — the float sibling of curation.pq_encode's
         fixed-point trainer; approximate op, so no fixed point needed);
      2. ENCODE pass materializes the codes dataset: (vec_id, one
         ``n_sub``-byte uint8 blob) — this 8-byte-per-vector table is
         what a 10^9-vector deployment keeps hot; the raw vectors stay
         in cold parquet;
      3. ADC SCAN over codes only: the query-side distance tables
         (n_queries x n_sub x n_codes dot-product contributions) broadcast
         in the task closure (a few KB); each batch gather-sums its codes
         against the tables and emits per-query top-(k*rerank) partials;
      4. the candidate union (n_queries * k * rerank ids, driver-sized by
         construction) re-ranks EXACTLY via one pushdown point-read of the
         candidate embeddings — output ordering is true cosine within the
         ADC candidate set.

    Returns (query_id, neighbor_id, rank) like knn_cosine_topk; recall
    is pytest-gated against the exact baseline (approximate operator —
    rows-only at the driver, by design, like knn_lsh/knn_ivf)."""
    import pyarrow.compute as pc

    qids, qmat = _load_queries(sf_dir, n_queries)
    emb_path = f"{sf_dir}/embeddings.parquet"
    dim = qmat.shape[1]
    sub_d = dim // n_sub
    r_cand = k * rerank

    def _norm_batch(t: pa.Table):
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        vecs = list_col_matrix(t["embedding"], np.float64)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        return vids, vecs

    # --- codebook training: init = first n_codes ids, 2 Lloyd passes ---
    init = (
        rd.read_parquet(
            emb_path, columns=["vec_id", "embedding"],
            filter=pc.field("vec_id") < n_codes,
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    cmat = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    cb = cmat.reshape(len(init), n_sub, sub_d).transpose(1, 0, 2).copy()

    def assign(vecs: np.ndarray, cb_t: np.ndarray) -> np.ndarray:
        sub = vecs.reshape(len(vecs), n_sub, sub_d)
        d2 = ((sub[:, :, None, :] - cb_t[None, :, :, :]) ** 2).sum(axis=3)
        return np.argmin(d2, axis=2)

    for _ in range(2):
        cb_cur = cb

        def lloyd_partial(t: pa.Table) -> pa.Table:
            _, vecs = _norm_batch(t)
            codes = assign(vecs, cb_cur)
            sub = vecs.reshape(len(vecs), n_sub, sub_d)
            rs, rc, rn, rb = [], [], [], []
            for s in range(n_sub):
                for c in np.unique(codes[:, s]):
                    m = codes[:, s] == c
                    rs.append(s)
                    rc.append(int(c))
                    rn.append(int(m.sum()))
                    rb.append(sub[m, s, :].sum(axis=0).tobytes())
            return pa.table(
                {"s": pa.array(rs, pa.int64()), "c": pa.array(rc, pa.int64()),
                 "n": pa.array(rn, pa.int64()), "b": pa.array(rb, pa.binary())}
            )

        parts = (
            rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
            .map_batches(lloyd_partial, batch_format="pyarrow")
            .to_pandas()
        )
        nxt = cb.copy()
        for s in range(n_sub):
            for c in range(n_codes):
                rows = parts[(parts["s"] == s) & (parts["c"] == c)]
                n = int(rows["n"].sum())
                if n > 0:
                    acc = np.zeros(sub_d, dtype=np.float64)
                    for blob in rows["b"]:
                        acc += np.frombuffer(blob, dtype=np.float64)
                    nxt[s, c] = acc / n
        cb = nxt

    # --- encode pass: the codes-only table (n_sub bytes per vector) ---
    cb_final = cb

    def encode(t: pa.Table) -> pa.Table:
        vids, vecs = _norm_batch(t)
        codes = assign(vecs, cb_final).astype(np.uint8)
        # fixed-size-list<uint8> = exactly n_sub bytes/vector, no offsets
        # buffer, and both encode and scan stay loop-free.
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), n_sub
        )
        return pa.table({"vec_id": pa.array(vids), "codes": col})

    codes_ds = rd.read_parquet(
        emb_path, columns=["vec_id", "embedding"]
    ).map_batches(encode, batch_format="pyarrow")

    # --- ADC scan: query dot-contribution tables, gather-sum per batch ---
    qsub = qmat.reshape(n_queries, n_sub, sub_d)
    # tables[q, s, c] = qsub[q, s] . cb[s, c]  (cosine decomposes over
    # subspaces, so approx_cos = sum_s tables[q, s, code[v, s]])
    tables = np.einsum("qsd,scd->qsc", qsub, cb_final)

    def scan(t: pa.Table) -> pa.Table:
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        codes = list_col_matrix(t["codes"], np.int64)  # (n, n_sub)
        # (n_queries, n) approx cosine via table gather
        approx = np.zeros((n_queries, len(vids)))
        for s in range(n_sub):
            approx += tables[:, s, codes[:, s]]
        out_q, out_n, out_a = [], [], []
        for qi, qid in enumerate(qids):
            row = approx[qi]
            mask = vids != qid
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            take = min(r_cand, cand.size)
            top = cand[np.argpartition(-row[cand], take - 1)[:take]]
            out_q.extend([int(qid)] * len(top))
            out_n.extend(int(vids[j]) for j in top)
            out_a.extend(float(row[j]) for j in top)
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "neighbor_id": pa.array(out_n, pa.int64()),
             "approx": pa.array(out_a, pa.float64())}
        )

    partials = codes_ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    cand = (
        partials.sort_values(["query_id", "approx"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(r_cand)
    )

    # --- exact re-rank: one pushdown point-read of candidate vectors ---
    cand_ids = sorted(set(cand["neighbor_id"].tolist()))
    cv = (
        rd.read_parquet(
            emb_path, columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(cand_ids),
        )
        .to_pandas()
    )
    cmat2 = np.stack(cv["embedding"].to_numpy()).astype(np.float64)
    cmat2 /= np.linalg.norm(cmat2, axis=1, keepdims=True)
    exact = {int(v): cmat2[i] for i, v in enumerate(cv["vec_id"])}
    qvec = {int(q): qmat[i] for i, q in enumerate(qids)}
    cand = cand.copy()
    cand["cosine"] = [
        float(qvec[q] @ exact[n])
        for q, n in zip(cand["query_id"], cand["neighbor_id"])
    ]
    cand = cand.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    topk = cand.groupby("query_id", as_index=False).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
