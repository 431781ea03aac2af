"""Distributed sketch operators.

HyperLogLog distinct counting: the scale path for COUNT(DISTINCT key) when
the key cardinality itself is too large to shuffle (a 10^10-URL frontier's
"how many unique users/hosts have we seen" question).  Exact distinct
(`q_event_users` / `q_distinct_union`) stays as the oracle at test scale;
the sketch's error bound is asserted in tests (~1.04/sqrt(2^p) relative).

Ray shape: each batch folds into a 2^p-register partial (a few KB) inside
``map_batches`` — the combiner pattern — and the driver merges the
per-block partials with an elementwise max.  Nothing rowlike ever leaves
the map side; merge cost is O(blocks * 2^p) bytes, independent of row
count.  (Flat numpy register math, no per-row Python in the hash path.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche int64 keys to uniform uint64."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hll_partial(keys: np.ndarray, p: int) -> np.ndarray:
    """Fold a key array into a 2^p uint8 register array (vectorized)."""
    m = 1 << p
    h = _mix64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rho = leading zeros of `rest` + 1, in [1, 64-p+1]
    nlz = np.zeros(len(rest), dtype=np.uint8)
    mask = rest >> np.uint64(63) == 0
    cur = rest.copy()
    shift = 32
    while shift >= 1:
        can = mask & (cur >> np.uint64(64 - shift) == 0)
        nlz[can] += np.uint8(shift)
        cur[can] = cur[can] << np.uint64(shift)
        shift //= 2
    rho = nlz.astype(np.uint8) + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with linear-counting small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct(
    ds: "rd.Dataset", key: str, p: int = 12
) -> int:
    """Approximate COUNT(DISTINCT ds[key]) for an int64 key column."""
    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        regs = _hll_partial(keys, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return _hll_estimate(merged)


def hll_users(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """One-row (n_users_hll,) estimate of distinct event users.  Rows-only
    for the driver (approximation has no SQL analog); the error bound vs
    exact COUNT(DISTINCT user_id) is asserted in tests."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return pd.DataFrame({"n_users_hll": [hll_distinct(ev, "user_id", p)]})


# ---------------------------------------------------------------------------
# count-min heavy hitters
# ---------------------------------------------------------------------------

_CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _cms_partial(tokens: list, width: int) -> np.ndarray:
    """(depth, width) int64 count-min partial for a token list.  Rows use
    independent splitmix64 streams; partials merge by elementwise SUM
    (count-min is a linear sketch), so distributed merging is exact."""
    import hashlib

    depth = len(_CMS_SEEDS)
    regs = np.zeros((depth, width), dtype=np.int64)
    if not tokens:
        return regs
    # token -> stable 64-bit base hash (md5 fold), then per-row remix
    base = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )
    for row, seed in enumerate(_CMS_SEEDS):
        h = _mix64(base ^ np.uint64(seed))
        idx = (h % np.uint64(width)).astype(np.int64)
        np.add.at(regs[row], idx, 1)
    return regs


def _cms_query(regs: np.ndarray, token: str) -> int:
    import hashlib

    base = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")
    est = None
    width = regs.shape[1]
    for row, seed in enumerate(_CMS_SEEDS):
        h = int(_mix64(np.array([base ^ seed], dtype=np.uint64))[0])
        v = int(regs[row, h % width])
        est = v if est is None else min(est, v)
    return int(est)


def cms_heavy_terms(sf_dir: str, width: int = 8192, top_n: int = 20) -> pd.DataFrame:
    """(term, est): count-min estimates for candidate heavy-hitter terms.

    Two-pass heavy-hitters: pass 1 folds every token occurrence into a
    (3 x width) count-min partial per batch — a linear sketch, so the
    driver merge is an exact elementwise sum of a few KB per block, and
    no token ever shuffles.  Candidate terms come from per-batch local
    top lists (a superset of true heavy hitters at these skews); pass 2
    queries the merged sketch.  Guarantees: est >= true count always
    (one-sided error), est <= true + eps*N w.h.p. — both asserted in
    tests against exact counts."""
    from collections import Counter

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks: list = []
        local = Counter()
        for text in t["text"].to_pylist():
            ws = [w for w in text.split(" ") if w]
            toks.extend(ws)
            local.update(ws)
        regs = _cms_partial(toks, width)
        cand = [w for w, _ in local.most_common(top_n * 2)]
        return pa.table(
            {
                "regs": pa.array([regs.tobytes()], pa.binary()),
                "cands": pa.array([cand], pa.list_(pa.string())),
            }
        )

    depth = len(_CMS_SEEDS)
    merged = np.zeros((depth, width), dtype=np.int64)
    candidates: set = set()
    for b in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob, cand in zip(b["regs"].to_pylist(), b["cands"].to_pylist()):
            merged += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
            candidates.update(cand)

    rows = [(t, _cms_query(merged, t)) for t in candidates]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(rows[:top_n], columns=["term", "est"])


# ---------------------------------------------------------------------------
# approximate quantiles (weighted stride-sample sketch)
# ---------------------------------------------------------------------------

def _quantile_partial(values: np.ndarray, k: int):
    """(points, weights) sorted stride sample of one block: sort, take k
    evenly spaced elements, each carrying weight n/k (remainder spread
    deterministically).  Rank error of one block <= n/k; merged error is
    bounded by the max block stride — the standard per-block-sample
    construction behind distributed approxQuantile implementations."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64)
    s = np.sort(values.astype(np.float64))
    if n <= k:
        return s, np.ones(n, dtype=np.float64)
    idx = ((np.arange(k, dtype=np.float64) + 0.5) * n / k).astype(np.int64)
    w = np.full(k, n / k, dtype=np.float64)
    return s[idx], w


def _quantile_query(points: np.ndarray, weights: np.ndarray, q: float) -> float:
    order = np.argsort(points, kind="stable")
    p, w = points[order], weights[order]
    cum = np.cumsum(w)
    target = q * cum[-1]
    i = int(np.searchsorted(cum, target, side="left"))
    return float(p[min(i, len(p) - 1)])


def quantile_sketch(
    ds: "rd.Dataset", col: str, qs=(0.5, 0.9, 0.99), k: int = 256
) -> dict:
    """Approximate quantiles of ``ds[col]`` via mergeable per-block
    weighted samples: each block contributes k sorted points (a few KB),
    the driver merges by weighted rank — no global sort, no shuffle, and
    the exchange volume is blocks x k regardless of row count.  Completes
    the sketch family: HLL (distinct), count-min (frequency), this
    (distribution)."""
    def partial(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[col].to_numpy(zero_copy_only=False), dtype=np.float64)
        pts, w = _quantile_partial(vals, k)
        return pa.table(
            {
                "pts": pa.array([pts.tolist()], pa.list_(pa.float64())),
                "w": pa.array([w.tolist()], pa.list_(pa.float64())),
            }
        )

    all_p, all_w = [], []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for pts, w in zip(b["pts"].to_pylist(), b["w"].to_pylist()):
            all_p.extend(pts)
            all_w.extend(w)
    points = np.asarray(all_p, dtype=np.float64)
    weights = np.asarray(all_w, dtype=np.float64)
    if len(points) == 0:  # empty input dataset
        return {q: float("nan") for q in qs}
    return {q: _quantile_query(points, weights, q) for q in qs}


def orders_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """(quantile, est): sketched o_totalprice quantiles.  Rows-only for
    the driver (approximation); rank-error vs exact quantile_disc is
    asserted in tests."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    est = quantile_sketch(ds, "o_totalprice")
    return pd.DataFrame(
        {"quantile": list(est.keys()), "est": [est[q] for q in est]}
    )
