"""Relational analytics pipelines over the testdata tables.

These re-express the reference's offline pandas analytics
(/root/reference/feilian/statistical_analysis.py groupby/mean/sum patterns,
SURVEY.md §2.5 A2-A8) as Ray Data groupby/aggregate pipelines, and add the
standard join/sort/limit shapes a complete engine needs.  Every query here
has a DuckDB oracle in __ray_entry__.oracle_sql with IDENTICAL column names.

Numeric contract: money/decimal aggregates are computed in scaled INTEGER
space (cents / e4 / e6) and divided once at the end.  Floating-point sums
are order-dependent — a distributed engine and a sequential oracle would
disagree in the last ulp and fail exact value-hash comparison; integer sums
are associative, so both sides agree bit-for-bit.

Scale notes: aggregates shuffle only projected columns (column pruning at
the read); joins broadcast the small side via ray.put-captured dicts
instead of shuffling both sides (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filtered scan -> groupby 2 keys -> 6 aggregates,
    money math in integer cents (see module docstring).

    Map-side combine: only 6 (flag, status) combinations exist, so each
    block pre-aggregates to <= 6 partial rows before the exchange — the
    shuffle moves blocks x 6 rows, never the fact table.  Partial sums of
    integral doubles / int64 are exact and associative, so the global
    re-sum matches the sequential oracle bit-for-bit."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        disc_comp_c = pc.subtract(pa.scalar(100, pa.int64()), disc_c)
        tt = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["l_quantity"],
                "price_c": price_c,
                "disc_c": disc_c,
                "disc_e4": pc.multiply(price_c, disc_comp_c),
            }
        )
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("sum_qty", "sum"),
                ("price_c", "sum"),
                ("disc_c", "sum"),
                ("disc_e4", "sum"),
                ("sum_qty", "count"),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag", "l_linestatus",
                "sum_qty", "price_c", "disc_c", "disc_e4", "count_order",
            ]
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_e4", alias_name="disc_e4"),
            Sum("disc_c", alias_name="disc_c"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": agg["sum_qty"],  # integral doubles: exact sum
            "sum_base_price": agg["price_c"] / 100.0,
            "sum_disc_price": agg["disc_e4"] / 10000.0,
            "avg_qty": agg["sum_qty"] / agg["count_order"],
            "avg_disc": agg["disc_c"] / (100.0 * agg["count_order"]),
            "count_order": agg["count_order"],
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q3_top_orders(sf_dir: str, n_parts: Optional[int] = None) -> pd.DataFrame:
    """Top-10 orders by revenue — top-k pushdown through a key-preserving
    join.

    The oracle's ``lineitem JOIN orders`` is key-preserving (every
    l_orderkey exists in orders exactly once, and the join adds only the
    o_orderdate payload), so the top-10 is decided entirely by the
    lineitem aggregate — the classic optimizer rewrite pushes the LIMIT
    below the join.  Scale shape: per-block vectorized pyarrow combiner
    (collapses multi-lineitem orders BEFORE the shuffle) → ONE exchange
    keyed on a 256-value multiplicative-hash BUCKET of the orderkey (the
    shuffle sorts rows by a tiny bucket id instead of per-key-sorting the
    whole reduced table — measured ~2x cheaper than a direct key groupby)
    → per-bucket C++ hash-agg + top-10 (safe: bucket is a function of the
    key, so every orderkey's rows land in exactly one bucket) → global
    sort over <= 10 x n_buckets rows → the 10 winning keys fetch their
    o_orderdate via a predicate-pushdown point read of orders.  No
    full-table join, no broadcast, nothing order-cardinality ever lands
    on the driver (round 1 shipped the whole orders table via ray.put;
    round 2a paid a full hash-join actor spin-up just to attach one
    column to 10 rows)."""
    import numpy as np

    lineitem = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        rev_e4 = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        out = pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev_e4})
        out = out.group_by("l_orderkey").aggregate([("rev_e4", "sum")])
        out = out.rename_columns(["l_orderkey", "rev_e4"])
        k = out["l_orderkey"].to_numpy(zero_copy_only=False)
        b = ((k * 2654435761) & 0xFFFFFFFF) >> 24  # Knuth hash, 256 buckets
        return out.append_column(
            "bucket", pa.array(b.astype(np.int64), pa.int64())
        )

    def bucket_top(g: pa.Table) -> pa.Table:
        out = g.group_by("l_orderkey").aggregate([("rev_e4", "sum")])
        out = out.rename_columns(["l_orderkey", "rev_e4"])
        idx = pc.select_k_unstable(
            out, k=min(10, out.num_rows),
            sort_keys=[("rev_e4", "descending"), ("l_orderkey", "ascending")],
        )
        return out.take(idx)

    top = (
        lineitem.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_top, batch_format="pyarrow")
        .sort(["rev_e4", "l_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )

    # point lookup: 10 keys, predicate pushed into the parquet scan
    dates = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
            filter=pc.field("o_orderkey").isin(top["l_orderkey"].tolist()),
        )
        .to_pandas()
    )
    out = top.merge(dates, left_on="l_orderkey", right_on="o_orderkey")
    out = out.sort_values(["rev_e4", "l_orderkey"], ascending=[False, True])
    out["revenue"] = out["rev_e4"] / 10000.0
    return out[["l_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


def q_order_priority(sf_dir: str) -> pd.DataFrame:
    """groupby + count + order (reference A6 match-count aggregation shape,
    /root/reference/feilian/statistical_analysis.py:286-294).  Map-side
    combine: 5 priorities exist, so blocks pre-count before the exchange."""

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("o_orderpriority", "count")]
        )
        return g.rename_columns(["o_orderpriority", "n_orders"])

    out = (
        _read(sf_dir, "orders", columns=["o_orderpriority"])
        .map_batches(combine, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("o_orderpriority")
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (SURVEY.md §2.10: derived
    window-start column + groupby; oracle uses date_trunc).  sum over
    e6-quantized values (exact); max is order-independent (raw double)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        # map-side combine: pre-aggregate each block to its distinct
        # (type, window) rows before the exchange — count/int-sum/max are
        # all associative, so the global re-fold is exact
        tt = pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                "value_e6": pc.cast(
                    pc.round(pc.multiply(t["value"], pa.scalar(1e6))), pa.int64()
                ),
                "value": t["value"],
            }
        )
        g = tt.group_by(["event_type", "window_start"]).aggregate(
            [("value_e6", "count"), ("value_e6", "sum"), ("value", "max")]
        )
        return g.rename_columns(
            ["event_type", "window_start", "n_events", "value_e6", "value"]
        )

    agg = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_e6", alias_name="sum_e6"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    agg["n_events"] = agg["n_events"].astype("int64")
    agg["sum_value"] = agg["sum_e6"] / 1e6
    # floor_temporal keeps the source resolution but Ray's groupby can land
    # the key at [s]; the oracle's date_trunc is timestamp[us] — pin it
    agg["window_start"] = agg["window_start"].astype("datetime64[us]")
    out = agg[["event_type", "window_start", "n_events", "sum_value", "max_value"]]
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def q_region_customers(sf_dir: str) -> pd.DataFrame:
    """3-way dimension join via broadcast lookups (region/nation are tiny):
    count customers per region name."""
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({nk: r2name[rk] for nk, rk in n2r.items()})

    class Tag:
        def __init__(self, ref):
            self.lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            names = [self.lut.get(k) for k in t["c_nationkey"].to_pylist()]
            return pa.table({"r_name": pa.array(names, pa.string())})

    return (
        _read(sf_dir, "customer", columns=["c_nationkey"])
        .map_batches(Tag(lookup_ref), batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
        .sort("r_name")
        .to_pandas()
    )


def q_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows per user (30-min inactivity gap): per-key sorted
    map_groups — the streaming-shaped pattern (partition by key, order by
    ts within group)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        new_session = (ts.diff() > gap).cumsum()
        sizes = new_session.value_counts()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(sizes.shape[0])],
                "max_session_events": [int(sizes.max())],
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
        .sort("user_id")
        .to_pandas()
    )


def q_lineitem_stats(sf_dir: str) -> pd.DataFrame:
    """Global min/max/mean/count (reference A7 corpus means shape).
    avg over integer cents for exactness."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_quantity": t["l_quantity"],
                "price_c": _cents(t["l_extendedprice"]),
            }
        )

    row = (
        _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .aggregate(
            Min("l_quantity", alias_name="min_qty"),
            Max("l_quantity", alias_name="max_qty"),
            Sum("price_c", alias_name="price_c"),
            Count(alias_name="n_rows"),
        )
    )
    return pd.DataFrame(
        [
            {
                "min_qty": row["min_qty"],
                "max_qty": row["max_qty"],
                "avg_price": row["price_c"] / (100.0 * row["n_rows"]),
                "n_rows": row["n_rows"],
            }
        ]
    )


# re-exported for callers that want plain means on clean integral columns
__all__ = [
    "q1_pricing_summary", "q3_top_orders", "q_order_priority",
    "q_events_hourly", "q_region_customers", "q_sessionize",
    "q_lineitem_stats", "Mean",
]


def q_grouped_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-based grouped sampling (reference A4 shape,
    /root/reference/feilian/datasets/dataset.py:98-135 grouped .sample —
    but seeded by KEY HASH, not RNG state, so any engine reproduces it:
    keep rows whose md5(o_orderkey) hex starts below '28' (~15.6%))."""
    import hashlib

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def pick(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_pylist()
        keep = [
            hashlib.md5(str(k).encode()).hexdigest()[:2] < "28" for k in keys
        ]
        return t.filter(pa.array(keep))

    return (
        ds.map_batches(pick, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_sample"))
        .sort("o_orderpriority")
        .to_pandas()
    )


def q_distinct_union(sf_dir: str) -> pd.DataFrame:
    """Distinct + ordered union (reference A8/D6 shapes: drop_duplicates and
    dict.fromkeys ordered-unique merges): the union of orders priorities and
    lineitem return flags as one deduplicated value list."""
    a = _read(sf_dir, "orders", columns=["o_orderpriority"]).unique("o_orderpriority")
    b = _read(sf_dir, "lineitem", columns=["l_returnflag"]).unique("l_returnflag")
    vals = sorted(set(a) | set(b))
    return pd.DataFrame({"v": vals})


def q_supplier_balance_by_nation(sf_dir: str) -> pd.DataFrame:
    """Dimension join + integer-exact money mean: supplier account balance
    stats per nation name."""
    nation = _read(sf_dir, "nation").to_pandas()
    lut_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    class Tag:
        def __init__(self, ref):
            self.lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            names = [self.lut.get(k) for k in t["s_nationkey"].to_pylist()]
            return pa.table(
                {
                    "n_name": pa.array(names, pa.string()),
                    "bal_c": _cents(t["s_acctbal"]),
                }
            )

    agg = (
        _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
        .map_batches(Tag(lut_ref), batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("bal_c", alias_name="bal_c"), Count(alias_name="n_suppliers"))
        .sort("n_name")
        .to_pandas()
    )
    agg["total_acctbal"] = agg["bal_c"] / 100.0
    return agg[["n_name", "n_suppliers", "total_acctbal"]]


def q_event_users(sf_dir: str) -> pd.DataFrame:
    """Count-distinct shape: distinct users per event_type — implemented as
    two grouped passes (pair-dedup groupby, then count per type); Ray Data
    has no count-distinct aggregate, this IS the scale pattern."""
    pairs = (
        _read(sf_dir, "events", columns=["event_type", "user_id"])
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )
    return (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .sort("event_type")
        .to_pandas()
    )


def q_top_users_by_type(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k users by summed value per event_type — the HOT-KEY top-k shape
    (north_rule: skew handled explicitly).

    event_type has ~5 distinct values over the whole table, so a naive
    ``groupby(event_type).map_groups(top_k)`` funnels ~20% of the corpus
    through ONE task — the canonical skew failure.  The salted two-stage
    shape instead:

      1. per-block combiner + ONE shuffle on the COMPOSITE key
         (event_type, user_id) — the secondary key acts as the salt, so
         the hot type spreads across all partitions and every partial is
         an exact per-(type, user) sum;
      2. per-block top-k per type over the reduced sums (each block emits
         <= k x n_types rows), then a driver merge of the tiny partials.

    No partition ever holds more than its hash share; the driver sees
    O(k x n_types x n_blocks) rows.  SQL oracle: row_number() window."""
    events = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "event_type": t["event_type"],
                "user_id": t["user_id"],
                "value_e6": pc.cast(pc.round(pc.multiply(
                    t["value"], pa.scalar(1_000_000.0))), pa.int64()),
            }
        )
        out = out.group_by(["event_type", "user_id"]).aggregate(
            [("value_e6", "sum")]
        )
        return out.rename_columns(["event_type", "user_id", "value_e6"])

    sums = (
        events.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("value_e6", alias_name="total_value_e6"))
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.sort_values(
            ["event_type", "total_value_e6", "user_id"],
            ascending=[True, False, True],
        )
        return df.groupby("event_type", as_index=False).head(k)

    partials = (
        sums.map_batches(local_top, batch_format="pandas").to_pandas()
    )
    out = partials.sort_values(
        ["event_type", "total_value_e6", "user_id"], ascending=[True, False, True]
    )
    out = out.groupby("event_type", as_index=False).head(k).copy()
    out["rnk"] = out.groupby("event_type").cumcount() + 1
    out = out[["event_type", "user_id", "total_value_e6", "rnk"]]
    return out.astype(
        {"user_id": "int64", "total_value_e6": "int64", "rnk": "int64"}
    ).reset_index(drop=True)


def q_asof_join(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """AS-OF join: for every 'click' event, the most recent 'view' event by
    the SAME user at-or-before the click's timestamp (inner: clicks with no
    prior view are dropped).  Ray Data has no asof-join operator — this is
    the custom-operator composition the task brief calls for:

      1. ONE pass over events, filtered to the two roles, each row tagged
         with ``bucket = hash(user_id) % n_buckets``.
      2. ONE shuffle: groupby(bucket) co-locates every user's clicks and
         views; n_buckets coarse groups, one vectorized
         ``pd.merge_asof(by=user_id, on=ts)`` per group (a sort-merge over
         the bucket, NOT a per-user Python loop).
    Partitioning assumption (documented per the brief): a user's full
    history fits in one bucket's group.  At 100 TB with skewed users the
    refinement is time-range sub-bucketing per hot user with boundary
    rows replicated one sub-bucket forward — same merge kernel.

    Oracle: DuckDB ``ASOF JOIN`` (inner) on user_id, c.ts >= v.ts.
    """
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "view"]))
        t = t.filter(keep)
        uid = pc.cast(t["user_id"], pa.int64())
        bucket = pc.cast(
            pc.subtract(uid, pc.multiply(pc.divide(uid, n_buckets),
                                         n_buckets)),
            pa.int32(),
        )
        return t.append_column("bucket", bucket)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        clicks = (
            g[g["event_type"] == "click"]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        views = (
            g[g["event_type"] == "view"]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "view_event_id": pd.Series([], dtype="int64"),
                "view_ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
        if clicks.empty or views.empty:
            return empty
        m = pd.merge_asof(
            clicks[["ts", "user_id", "event_id"]],
            views[["ts", "user_id", "event_id"]].rename(
                columns={"event_id": "view_event_id", "ts": "view_ts"}
            ),
            left_on="ts", right_on="view_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        m = m.dropna(subset=["view_event_id"])
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "ts": m["ts"].astype("datetime64[us]"),
                "view_event_id": m["view_event_id"].astype("int64"),
                "view_ts": m["view_ts"].astype("datetime64[us]"),
            }
        )

    out = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def q_range_join(sf_dir: str, n_windows: int = 20,
                 window_hours: int = 6) -> pd.DataFrame:
    """Range (interval-containment) join: the ``n_windows`` highest-value
    events anchor half-open windows [ts, ts + window_hours); count and sum
    (in cents) every event falling inside each window.

    Ray shape — classic big-table x small-intervals range join:
      1. distributed partial top-k picks the anchors (per-batch top-n, tiny
         driver merge — same tail as knn_cosine_topk);
      2. the window table (tens of rows) is BROADCAST via ray.put; ONE pass
         over events compares each batch against all windows with a
         vectorized (batch x n_windows) interval mask and emits per-batch
         per-window partial (count, sum_cents);
      3. a groupby(window_id) integer-sum folds the partials.
    At 10^6+ windows the broadcast side no longer fits: bucket both sides
    by floor(ts / window_span) (intervals explode to every bucket they
    overlap) and hash-join on the bucket — same mask kernel per bucket.

    Oracle: inequality join in SQL (e.ts >= w_start AND e.ts < w_end).
    """
    import numpy as np

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    def batch_topn(t: pa.Table) -> pa.Table:
        n = min(n_windows, t.num_rows)
        idx = pc.select_k_unstable(
            t, n, [("value", "descending"), ("event_id", "ascending")]
        )
        return t.take(idx)

    anchors = (
        ev.map_batches(batch_topn, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["value", "event_id"], ascending=[False, True])
        .head(n_windows)
    )
    w_start = anchors["ts"].to_numpy("datetime64[us]")
    w_end = w_start + np.timedelta64(window_hours, "h")
    w_ids = anchors["event_id"].to_numpy("int64")
    w_ref = ray.put((w_ids, w_start.astype("int64"), w_end.astype("int64")))

    class WindowPartials:
        def __init__(self, ref):
            self.w_ids, self.w_start, self.w_end = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = np.asarray(
                pc.cast(t["ts"], pa.int64()), dtype=np.int64
            )  # us since epoch
            cents = np.asarray(_cents(t["value"]), dtype=np.int64)
            # (batch x n_windows) containment mask, folded per window
            inside = (ts[:, None] >= self.w_start[None, :]) & (
                ts[:, None] < self.w_end[None, :]
            )
            counts = inside.sum(axis=0)
            sums = (cents[:, None] * inside).sum(axis=0)
            keep = counts > 0
            return pa.table(
                {
                    "window_id": pa.array(self.w_ids[keep], pa.int64()),
                    "n_events": pa.array(counts[keep], pa.int64()),
                    "sum_value_c": pa.array(sums[keep], pa.int64()),
                }
            )

    out = (
        ev.map_batches(WindowPartials(w_ref), batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_c", alias_name="sum_value_c"),
        )
        .to_pandas()
        .astype({"window_id": "int64", "n_events": "int64",
                 "sum_value_c": "int64"})
    )
    return out.sort_values("window_id").reset_index(drop=True)


def q_rolling_revenue(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """Rolling-window aggregate: per order day, total revenue (cents) and
    the trailing ``window_days``-row rolling sum over the ordered day
    sequence (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW semantics).

    Ray shape: the wide input collapses FIRST (per-batch partial sums ->
    ONE groupby(day) integer-sum), and only the tiny day-level series
    (~thousands of rows for years of data) is pulled to the driver for the
    ordered rolling pass — the rolling window never sees the raw table.
    At finer granularity (per-second buckets) the rolling pass becomes a
    sorted map_batches with a carried prefix from the previous block
    (documented partitioning assumption: blocks ordered, boundary overlap
    = window_days rows).

    Oracle: SUM() OVER (ORDER BY day ROWS BETWEEN N-1 PRECEDING AND
    CURRENT ROW).
    """
    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def day_partials(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="day"),
                      pa.timestamp("us"))
        return pa.table({"day": day, "revenue_c": _cents(t["o_totalprice"])})

    daily = (
        orders.map_batches(day_partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
        .astype({"revenue_c": "int64"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    # Ray's sort-aggregate can downcast the day key to second resolution;
    # the oracle's date_trunc lands as timestamp[us] — pin it for the hash.
    daily["day"] = daily["day"].astype("datetime64[us]")
    daily["rolling_revenue_c"] = (
        daily["revenue_c"].rolling(window_days, min_periods=1).sum().astype("int64")
    )
    return daily[["day", "revenue_c", "rolling_revenue_c"]]


def q_order_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group discrete percentiles: median and p90 of order total
    (cents) per order priority.  quantile_disc semantics — the returned
    value IS an element of the group (index ceil(q*n)-1 of the sorted
    values), so integer exactness survives the oracle comparison.

    Ray shape: groupby(priority).map_groups with a numpy sort per group —
    exact per-group quantiles need the group's values together, and
    priority has tiny cardinality (5), so map_groups overhead is nil.  At
    100 TB the exact path is a per-group distributed sort + rank lookup;
    the approximate path is per-batch t-digest partials merged in a
    groupby — both documented, this implements the exact one.

    Oracle: quantile_disc(c, 0.5) / quantile_disc(c, 0.9) per priority.
    """
    import numpy as np

    orders = _read(sf_dir, "orders",
                   columns=["o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "price_c": _cents(t["o_totalprice"])})

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["price_c"].to_numpy("int64"))
        n = len(v)

        def qdisc(q: float) -> int:
            return int(v[max(0, int(np.ceil(q * n)) - 1)])

        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "n_orders": [n],
                "median_c": [qdisc(0.5)],
                "p90_c": [qdisc(0.9)],
            }
        )

    out = (
        orders.map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(quantiles, batch_format="pandas")
        .to_pandas()
        .astype({"n_orders": "int64", "median_c": "int64", "p90_c": "int64"})
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_bloom_semijoin(sf_dir: str, n_bits: int = 1 << 20, n_hashes: int = 4) -> pd.DataFrame:
    """Revenue of lineitems belonging to URGENT orders, via a bloom
    runtime-filter semi-join — per-priority revenue the oracle computes
    with a plain JOIN.

    Scale shape (runtime filter pushdown): the small side (urgent order
    keys, a predicate-pushdown parquet read) folds into per-batch bloom
    partials (bit arrays, a linear OR-mergeable sketch) that the driver
    ORs and broadcasts once; the big side (lineitem) drops non-member
    rows INSIDE map_batches with vectorized double hashing before any
    shuffle — ~4/5 of rows never leave the scan at this selectivity.
    Bloom false positives are removed by an exact membership check
    against the true key set on the pre-filtered survivors (broadcast
    here; co-partitioned join at cluster scale — the survivor set is
    already bloom-thinned either way), so the result is EXACT and
    SQL-oracled.  Output: single row (revenue_e4 int).
    """
    import numpy as np

    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )

    def _hash_mtx(keys: np.ndarray) -> np.ndarray:
        """(n_hashes, n) bit positions via splitmix64 streams."""
        from langscrape_ray.pipelines.sketches import _mix64

        out = np.empty((n_hashes, len(keys)), dtype=np.int64)
        for i in range(n_hashes):
            h = _mix64(keys.astype(np.uint64) ^ np.uint64(0x9E3779B9 * (i + 1)))
            out[i] = (h % np.uint64(n_bits)).astype(np.int64)
        return out

    def bloom_partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        bits = np.zeros(n_bits, dtype=bool)
        bits[_hash_mtx(keys).ravel()] = True
        return pa.table(
            {
                "bits": pa.array([np.packbits(bits).tobytes()], pa.binary()),
                "keys": pa.array([keys.tolist()], pa.list_(pa.int64())),
            }
        )

    # ONE pass over the small side builds both the bloom (OR of partials)
    # and the exact verification key set
    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    exact_keys: set = set()
    for b in urgent.map_batches(bloom_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob, keys in zip(b["bits"].to_pylist(), b["keys"].to_pylist()):
            np.bitwise_or(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
            exact_keys.update(keys)
    bloom_bits = np.unpackbits(merged).astype(bool)
    state = ray.put((bloom_bits, frozenset(exact_keys)))

    class FilterSum:
        def __init__(self, ref):
            self.bits, self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False))
            member = np.ones(len(keys), dtype=bool)
            for row in _hash_mtx(keys):
                member &= self.bits[row]
            if member.any():  # exact check only on bloom survivors
                surv = np.nonzero(member)[0]
                ok = np.fromiter(
                    (int(keys[i]) in self.keys for i in surv),
                    dtype=bool, count=len(surv),
                )
                member[surv] = ok
            sub = t.filter(pa.array(member))
            rev = pc.sum(
                pc.multiply(
                    _cents(sub["l_extendedprice"]),
                    pc.subtract(
                        pa.scalar(100, pa.int64()), _cents(sub["l_discount"])
                    ),
                )
            ).as_py() or 0
            return pa.table({"rev_e4": pa.array([rev], pa.int64())})

    parts = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(FilterSum, fn_constructor_args=(state,),
                     batch_format="pyarrow", concurrency=(1, 8), num_cpus=0.5)
        .to_pandas()
    )
    return pd.DataFrame({"revenue_e4": [int(parts["rev_e4"].sum())]})


def q5_nation_revenue(sf_dir: str, top_n: int = 5,
                      n_parts: Optional[int] = None) -> pd.DataFrame:
    """Top nations by lineitem revenue — a TPC-H Q5-style multi-hop join
    (lineitem ⋈ orders ⋈ customer ⋈ nation), every hop size-reduced first.

    Scale shape: revenue collapses to one row per ORDER before the first
    join (per-block pyarrow combiner + ONE groupby-sum, exactly q3's
    reduction), then to one row per CUSTOMER before the second — each
    ``ds.join`` therefore exchanges only the already-aggregated side
    against a projected key/fk table, never raw lineitems.  The final
    per-nation rollup is ~25 rows, and nation names attach driver-side
    (the broadcast-small-side analog).  SQL oracle: the plain 4-table
    join + GROUP BY."""
    from langscrape_ray.pipelines.dedup import _join_parts
    from langscrape_ray.pipelines.util import compact_for_join, ensure_schema

    if n_parts is None:
        # each hash-join partition is an aggregator ACTOR; bounding by
        # cluster CPUs keeps the join + its surrounding shuffle tasks
        # co-schedulable on tiny (4-CPU test) clusters
        n_parts = _join_parts(8)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev_e4 = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        out = pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev_e4})
        out = out.group_by("l_orderkey").aggregate([("rev_e4", "sum")])
        return out.rename_columns(["l_orderkey", "rev_e4"])

    sch_order = pa.schema([("l_orderkey", pa.int64()), ("rev_e4", pa.int64())])
    per_order = compact_for_join(ensure_schema(
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_e4", alias_name="rev_e4")),
        sch_order,
    ))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j1 = per_order.join(
        orders, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    sch_cust = pa.schema([("o_custkey", pa.int64()), ("rev_e4", pa.int64())])
    per_cust = compact_for_join(ensure_schema(
        j1.map_batches(
            lambda t: pa.table(
                {"o_custkey": t["o_custkey"], "rev_e4": t["rev_e4"]}
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("rev_e4", alias_name="rev_e4")),
        sch_cust,
    ))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j2 = per_cust.join(
        cust, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    per_nation = (
        j2.map_batches(
            lambda t: pa.table(
                {"c_nationkey": t["c_nationkey"], "rev_e4": t["rev_e4"]}
            ),
            batch_format="pyarrow",
        )
        .groupby("c_nationkey")
        .aggregate(Sum("rev_e4", alias_name="rev_e4"))
        .to_pandas()
    )

    names = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    out = per_nation.merge(names, left_on="c_nationkey", right_on="n_nationkey")
    out = out.sort_values(["rev_e4", "n_name"], ascending=[False, True]).head(top_n)
    out = out.rename(columns={"rev_e4": "revenue_e4"})
    out["revenue_e4"] = out["revenue_e4"].astype("int64")
    return out[["n_name", "revenue_e4"]].reset_index(drop=True)


def q_event_dedup_window(sf_dir: str, window_s: int = 3600) -> pd.DataFrame:
    """(event_id, is_dup): time-windowed event dedup — an event is a
    duplicate if the PREVIOUS event with the same (user_id, event_type)
    is within ``window_s`` seconds.  The streaming-dedup shape of a log
    ingestion pipeline (suppress retries/double-fires) expressed batch:
    per-key ordered scan, no global state.

    Ray shape: ``groupby((user, type)).map_groups`` with a vectorized
    pandas diff per group — key cardinality is users x types, orders of
    magnitude below event count, and each group is independently
    sortable, so the single shuffle co-locates keys and everything else
    is map-side.  (At 10^10 events, hash-partition by user and sort
    within partitions — same semantics, documented assumption.)  SQL
    oracle: lag() OVER (PARTITION BY ... ORDER BY ts, event_id)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        return pd.DataFrame(
            {"event_id": g["event_id"], "is_dup": (gap <= window_s).fillna(False)}
        )

    out = (
        ev.groupby(["user_id", "event_type"])
        .map_groups(mark, batch_format="pandas")
        .to_pandas()
        .astype({"event_id": "int64", "is_dup": "bool"})
    )
    return out.sort_values("event_id").reset_index(drop=True)


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view,
    purchase_cents): long→wide pivot of the events table — per-user
    event-type counts as columns plus the purchase-value total in exact
    cents.  The schema is FIXED by the known type vocabulary (a pivot
    over an unbounded key set is a different operator — that's
    doc_term_df's territory).

    Ray shape: the pivot happens map-side — each batch pre-aggregates a
    per-user row of indicator sums (vectorized pandas crosstab-style),
    so the ONE ``groupby(user_id)`` exchange moves already-wide partials
    (users × 7 ints), never the long event rows.  Skew-free: every
    user's partials combine associatively.  SQL oracle: count(*) FILTER
    (WHERE ...) per type.
    """
    ev = _read(
        sf_dir, "events", columns=["user_id", "event_type", "value"]
    )

    def pivot_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["value"] * 100).round().astype("int64")
        cols = {}
        for t in _PIVOT_TYPES:
            cols[f"n_{t}"] = (
                (df["event_type"] == t).astype("int64").groupby(df["user_id"]).sum()
            )
        cols["purchase_cents"] = (
            cents.where(df["event_type"] == "purchase", 0)
            .groupby(df["user_id"])
            .sum()
        )
        res = pd.DataFrame(cols).reset_index().rename(columns={"index": "user_id"})
        res["user_id"] = res["user_id"].astype("int64")
        return res

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES]
    aggs.append(Sum("purchase_cents", alias_name="purchase_cents"))
    out = (
        ev.map_batches(pivot_partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(*aggs)
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_rollup(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, l_linestatus, sum_qty, count_order): GROUP BY
    ROLLUP — the fine (flag, status) aggregate plus per-flag subtotals
    plus the grand total, with 'ALL' as the subtotal marker (COALESCEd on
    the SQL side too, so the hash ignores NULL-sorting differences).

    Ray shape: ONE shuffle at the finest grain (keys packed to a single
    string column); every coarser level is derived from the fine result,
    which is group-cardinality (a few rows here, still tiny at any corpus
    size) — the standard rollup optimization: never re-scan the fact
    table per level.  Integer sums make all levels order-independent.
    """
    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": pc.binary_join_element_wise(
                    t["l_returnflag"], t["l_linestatus"], "|"
                ).to_pandas(),
                "qty": t["l_quantity"].to_pandas(),
            }
        )
        g = df.groupby("k", sort=True).agg(
            sum_qty=("qty", "sum"), count_order=("qty", "size")
        )
        return pa.table(
            {
                "k": pa.array(g.index, pa.string()),
                "sum_qty": pa.array(g["sum_qty"].to_numpy(), pa.float64()),
                "count_order": pa.array(
                    g["count_order"].to_numpy(), pa.int64()
                ),
            }
        )

    fine = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    fine[["l_returnflag", "l_linestatus"]] = fine["k"].str.split(
        "|", expand=True
    )
    fine = fine[["l_returnflag", "l_linestatus", "sum_qty", "count_order"]]
    lvl1 = (
        fine.groupby("l_returnflag", as_index=False)[["sum_qty", "count_order"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "sum_qty": [fine["sum_qty"].sum()],
            "count_order": [fine["count_order"].sum()],
        }
    )
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].astype("int64")
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    ]


_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def q_funnel(sf_dir: str) -> pd.DataFrame:
    """(user_id, stages_completed): ordered conversion funnel — how far
    each user progressed through signup -> view -> click -> purchase,
    where each step must occur STRICTLY after the previous step's first
    qualifying event (min-ts semantics: the first qualifying event per
    stage is the one that gates the next).

    Ray shape: one ``groupby(user_id).map_groups`` — the sessionize
    pattern: a user's events land in one group, the walk over the
    ts-sorted group is vectorized-enough pandas (events per user are
    bounded by app behavior, not corpus size).  SQL oracle: a chain of
    CTEs, each taking min(ts) of events strictly after the previous
    stage's min.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        stage = 0
        t_prev = None
        types = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        for i in range(len(g)):
            if stage >= len(_FUNNEL_STEPS):
                break
            if types[i] == _FUNNEL_STEPS[stage] and (
                t_prev is None or ts[i] > t_prev
            ):
                t_prev = ts[i]
                stage += 1
        return pd.DataFrame(
            {"user_id": [int(g["user_id"].iloc[0])], "stages_completed": [stage]}
        )

    out = (
        ev.groupby("user_id")
        .map_groups(walk, batch_format="pandas")
        .to_pandas()
        .astype({"user_id": "int64", "stages_completed": "int64"})
    )
    return out.sort_values("user_id").reset_index(drop=True)


def q_anti_join(sf_dir: str) -> pd.DataFrame:
    """(c_nationkey, n_customers, acctbal_cents): customers with NO
    urgent-priority order, rolled up per nation (the TPC-H Q22 anti-join
    shape; the urgency predicate keeps the result non-trivial on data
    where every customer has some order).

    Ray shape — a distributed anti-join with NO broadcast and NO join
    operator: customer rows enter the exchange as (custkey, has_hit=0,
    acctbal_cents, nationkey) and filtered order rows as
    per-batch-distinct (custkey, has_hit=1, sentinel, sentinel); ONE
    ``groupby(custkey)`` with Max folds both sides (customer fields win
    the Max because the order side carries low sentinels), and survivors
    with has_hit == 0 pre-aggregate per nation.  Both inputs stream; the
    exchange carries one row per distinct key per side per block.  SQL
    oracle: NOT EXISTS.
    """
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def cust_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["c_custkey"],
                "has_hit": pa.array([0] * t.num_rows, pa.int64()),
                "acctbal_c": _cents(t["c_acctbal"]),
                "nation": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    def order_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        keys = pc.unique(t["o_custkey"])
        n = len(keys)
        return pa.table(
            {
                "k": keys,
                "has_hit": pa.array([1] * n, pa.int64()),
                # sentinels below any real value so the customer row's
                # fields win the Max fold
                "acctbal_c": pa.array([-(1 << 40)] * n, pa.int64()),
                "nation": pa.array([-1] * n, pa.int64()),
            }
        )

    both = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    folded = both.groupby("k").aggregate(
        Max("has_hit", alias_name="has_hit"),
        Max("acctbal_c", alias_name="acctbal_c"),
        Max("nation", alias_name="nation"),
    )

    def nation_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["has_hit"], 0))
        agg: dict = {}
        for nat, bal in zip(
            t["nation"].to_pylist(), t["acctbal_c"].to_pylist()
        ):
            n, s = agg.get(nat, (0, 0))
            agg[nat] = (n + 1, s + bal)
        items = sorted(agg.items())
        return pa.table(
            {
                "c_nationkey": pa.array([k for k, _ in items], pa.int64()),
                "n_customers": pa.array([v[0] for _, v in items], pa.int64()),
                "acctbal_cents": pa.array(
                    [v[1] for _, v in items], pa.int64()
                ),
            }
        )

    out = (
        folded.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()
    )
    if out.empty:  # aggregate of an empty stream drops the schema
        out = pd.DataFrame(
            columns=["c_nationkey", "n_customers", "acctbal_cents"]
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q_corr(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, n, sum_q, sum_d, sum_qd, sum_q2, sum_d2, corr):
    Pearson correlation between quantity and discount per return flag,
    computed from INTEGER sufficient statistics — the one-pass
    distributed-correlation shape.  The six integer sums are exact and
    associative; ``corr`` is then ONE fixed sequence of IEEE-double ops
    on identical integers (products < 2^53, sqrt/div correctly rounded),
    so the float column hash-matches the oracle, which spells out the
    same formula instead of calling corr().
    """
    li = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        d = _cents(t["l_discount"])
        tt = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "sum_q": q,
                "sum_d": d,
                "sum_qd": pc.multiply(q, d),
                "sum_q2": pc.multiply(q, q),
                "sum_d2": pc.multiply(d, d),
            }
        )
        return tt.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sum_q", "sum_d", "sum_qd", "sum_q2", "sum_d2")]
        ).rename_columns(
            ["l_returnflag", "n", "sum_q", "sum_d", "sum_qd", "sum_q2", "sum_d2"]
        )

    cols = ("n", "sum_q", "sum_d", "sum_qd", "sum_q2", "sum_d2")
    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    # fixed op sequence, mirrored verbatim in the SQL oracle
    num = (out["n"] * out["sum_qd"] - out["sum_q"] * out["sum_d"]).astype(
        "float64"
    )
    vq = (out["n"] * out["sum_q2"] - out["sum_q"] * out["sum_q"]).astype(
        "float64"
    )
    vd = (out["n"] * out["sum_d2"] - out["sum_d"] * out["sum_d"]).astype(
        "float64"
    )
    import numpy as np

    out["corr"] = num / (np.sqrt(vq) * np.sqrt(vd))
    return out.sort_values("l_returnflag").reset_index(drop=True)


_MELT_COLS = ("l_quantity", "l_discount", "l_tax")


def q_unpivot(sf_dir: str) -> pd.DataFrame:
    """(l_orderkey, l_linenumber, metric, value_e2): wide→long melt — the
    pivot inverse — of the three lineitem rate/quantity columns for the
    late-shipment tail (>= 2001-08-20, ~3% of rows), values quantized to exact e2 integers.

    Ray shape: the date predicate pushes into the parquet scan (only the
    matching row groups leave storage), then ONE stateless vectorized
    pass emits the three stacked projections per block — melt is
    embarrassingly parallel, no shuffle at all.  SQL oracle: UNION ALL of
    the three column selections.
    """
    cutoff = pd.Timestamp("2001-08-20")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate", *_MELT_COLS],
        filter=pc.field("l_shipdate") >= cutoff,
    )

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for col in _MELT_COLS:
            parts.append(
                pa.table(
                    {
                        "l_orderkey": t["l_orderkey"],
                        "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                        "metric": pa.array(
                            [col] * t.num_rows, pa.string()
                        ),
                        "value_e2": _cents(t[col]),
                    }
                )
            )
        return pa.concat_tables(parts)

    out = ds.map_batches(melt, batch_format="pyarrow").to_pandas()
    return out.sort_values(
        ["l_orderkey", "l_linenumber", "metric"]
    ).reset_index(drop=True)


def q_full_outer(sf_dir: str) -> pd.DataFrame:
    """(key, n_events, n_cust, acctbal_cents): FULL OUTER join between
    the per-user event rollup and the ``c_custkey % 7 == 0`` customer
    subset — the one join family the engine had not witnessed (inner /
    left / asof / range / semi / anti all exist).  The subset keeps both
    unmatched sides non-empty: event users off the 7-grid have
    ``n_cust = 0``, gridded customers without events have
    ``n_events = 0``.

    Ray shape — the q_anti_join side-flag fold, which IS a full outer
    join when nothing is filtered afterwards: each side pre-aggregates
    per key inside ``map_batches`` (events to per-block counts, the
    customer side to (1, cents)), the union makes ONE ``groupby(key)``
    Sum exchange, and every folded row survives with zero-filled absent
    sides.  No join operator, no broadcast, both inputs stream.  SQL
    oracle: FULL OUTER JOIN + COALESCE.
    """

    ev = _read(sf_dir, "events", columns=["user_id"])
    # the % 7 subset predicate is not pushdown-able (no modulo in parquet
    # filters); it evaluates vectorized inside cust_side on a pruned
    # 2-column read instead
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def ev_side(t: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        n = len(keys)
        return pa.table(
            {
                "key": pa.array(keys.astype(np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
                "n_cust": pa.array([0] * n, pa.int64()),
                "acctbal_cents": pa.array([0] * n, pa.int64()),
            }
        )

    def cust_side(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.array(t["c_custkey"].to_numpy(zero_copy_only=False) % 7 == 0)
        )
        return pa.table(
            {
                "key": pc.cast(t["c_custkey"], pa.int64()),
                "n_events": pa.array([0] * t.num_rows, pa.int64()),
                "n_cust": pa.array([1] * t.num_rows, pa.int64()),
                "acctbal_cents": _cents(t["c_acctbal"]),
            }
        )

    folded = (
        ev.map_batches(ev_side, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_cust", alias_name="n_cust"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()
    )
    for c in ("n_events", "n_cust", "acctbal_cents"):
        folded[c] = folded[c].astype("int64")
    return folded.sort_values("key").reset_index(drop=True)


def q_group_median(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, l_linestatus, p25, median, p75, n_rows): EXACT
    per-group percentiles (``percentile_cont`` 0.25/0.5/0.75 linear
    interpolation) without a global sort — the per-group twin of
    quantile_gate's corpus-wide trick.

    Ray shape: per-batch (group, value, cnt) histogram partials
    (np.unique over a packed int key — vectorized, no row loop) → ONE
    groupby Sum whose exchange is bounded by groups x distinct-values
    (6 x 50 here; a histogram, never the fact table) → driver cumsum +
    interpolation over that tiny table.  At 100 TB the same plan holds
    whenever the value domain is bounded (quantities, scores, bucketed
    floats); unbounded domains fall back to the per-group sketch tier
    ``q_group_median_sketch`` (rank-error-bounded, rows-only).

    Exactness: l_quantity values are small integers and the 0.25/0.5/
    0.75 fractions are exact binary doubles, so every interpolation
    intermediate is exact — any algebraically-equivalent op order (ours
    vs DuckDB's) yields bit-identical doubles and the value hash
    matches.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def hist(t: pa.Table) -> pa.Table:
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        stats = t["l_linestatus"].to_numpy(zero_copy_only=False)
        qty = np.asarray(t["l_quantity"], dtype=np.float64)
        # pack (flag, status) into small codes; values are 1..50 ints
        keys = np.char.add(np.char.add(flags.astype("U1"), "|"),
                           stats.astype("U1"))
        uk, inv = np.unique(keys, return_inverse=True)
        packed = inv.astype(np.int64) * 1024 + qty.astype(np.int64)
        up, cnt = np.unique(packed, return_counts=True)
        gi = (up // 1024).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": pa.array([uk[i][0] for i in gi]),
                "l_linestatus": pa.array([uk[i][2] for i in gi]),
                "l_quantity": pa.array((up % 1024).astype(np.float64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    hist_df = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus", "l_quantity"])
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )

    rows = []
    for (fl, st), g in hist_df.groupby(["l_returnflag", "l_linestatus"]):
        g = g.sort_values("l_quantity")
        vals = g["l_quantity"].to_numpy()
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])

        def pct(q: float) -> float:
            pos = q * (n - 1)
            k = int(np.floor(pos))
            frac = pos - k
            lo = float(vals[np.searchsorted(cum, k + 1)])
            if frac == 0.0:
                return lo
            hi = float(vals[np.searchsorted(cum, k + 2)])
            return lo + frac * (hi - lo)

        rows.append(
            {"l_returnflag": fl, "l_linestatus": st,
             "p25": pct(0.25), "median": pct(0.5), "p75": pct(0.75),
             "n_rows": n}
        )
    out = pd.DataFrame(rows).sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_group_median_sketch(sf_dir: str, k: int = 256) -> pd.DataFrame:
    """(l_returnflag, l_linestatus, p25, median, p75, n_rows): per-group
    quantiles over an UNBOUNDED float domain (l_extendedprice) — the
    documented fallback tier for ``q_group_median`` when the value
    domain isn't bounded-int and the (group, value) histogram would be
    corpus-sized.

    Ray shape (the sketches.py weighted-stride-sample construction, per
    group): each block emits, per group it touches, a sorted k-point
    weighted sample (``_quantile_partial``) → ONE ``groupby(group)``
    ``map_groups`` merges the per-block samples by weighted rank.  The
    exchange volume is blocks x groups x k floats regardless of row
    count — never the fact table — so the plan holds at 100 TB for any
    float column.  Per-block rank error <= n_block/k; the merged
    estimate's rank error is bounded by the sum of block strides
    (~N/k with uniform blocks) — the pytest gate asserts exactly that
    bound against the exact per-group quantiles.

    Rows-only for the driver (approximate by construction); the exact
    bounded-domain twin ``q_group_median`` keeps its SQL oracle."""
    from langscrape_ray.pipelines.sketches import (
        _quantile_partial,
        _quantile_query,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        stats = t["l_linestatus"].to_numpy(zero_copy_only=False)
        vals = np.asarray(t["l_extendedprice"], dtype=np.float64)
        keys = np.char.add(np.char.add(flags.astype("U1"), "|"),
                           stats.astype("U1"))
        uk, inv = np.unique(keys, return_inverse=True)
        gs, pts_l, w_l, n_l = [], [], [], []
        for gi, key in enumerate(uk):
            gv = vals[inv == gi]
            pts, w = _quantile_partial(gv, k)
            gs.append(str(key))
            pts_l.append(pts.tolist())
            w_l.append(w.tolist())
            n_l.append(len(gv))
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "pts": pa.array(pts_l, pa.list_(pa.float64())),
                "w": pa.array(w_l, pa.list_(pa.float64())),
                "n": pa.array(n_l, pa.int64()),
            }
        )

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df["g"].iloc[0]
        pts = np.concatenate([np.asarray(p) for p in df["pts"]])
        w = np.concatenate([np.asarray(x) for x in df["w"]])
        return pd.DataFrame(
            {
                "l_returnflag": [g[0]],
                "l_linestatus": [g[2]],
                "p25": [_quantile_query(pts, w, 0.25)],
                "median": [_quantile_query(pts, w, 0.5)],
                "p75": [_quantile_query(pts, w, 0.75)],
                "n_rows": [int(df["n"].sum())],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)


def q_intersect(sf_dir: str) -> pd.DataFrame:
    """(key,): distinct keys present on BOTH sides — event user_ids that
    are also customer keys (the INTERSECT set operation, completing the
    set family next to ordered-union and the anti-join EXCEPT shape).

    Ray shape: each side enters the exchange as per-batch-distinct
    (key, side_bit) rows with side_bit 1 or 2; ONE ``groupby(key)`` Max
    fold per bit — implemented as a single Sum over per-side-distinct
    bits is WRONG under multi-block duplicates, so the fold is
    Max(side1), Max(side2) — and survivors need both bits set.  Both
    inputs stream; the exchange carries one row per distinct key per
    side per block, never the fact tables.  SQL oracle: INTERSECT.
    """
    ev = _read(sf_dir, "events", columns=["user_id"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def side(col: str, bit: int):
        def fn(t: pa.Table) -> pa.Table:
            keys = pc.unique(pc.cast(t[col], pa.int64()))
            n = len(keys)
            return pa.table(
                {
                    "key": keys,
                    "s1": pa.array([1 if bit == 1 else 0] * n, pa.int64()),
                    "s2": pa.array([1 if bit == 2 else 0] * n, pa.int64()),
                }
            )

        return fn

    def both_sides(t: pa.Table) -> pa.Table:
        # filter ON THE WORKERS: only intersection rows reach the driver
        # (the fold output is distinct-key-sized; shipping the union would
        # be corpus-sized at 10^10 keys)
        mask = pc.and_(pc.equal(t["s1"], 1), pc.equal(t["s2"], 1))
        return t.filter(mask).select(["key"])

    folded = (
        ev.map_batches(side("user_id", 1), batch_format="pyarrow")
        .union(cust.map_batches(side("c_custkey", 2), batch_format="pyarrow"))
        .groupby("key")
        .aggregate(Max("s1", alias_name="s1"), Max("s2", alias_name="s2"))
        .map_batches(both_sides, batch_format="pyarrow")
        .to_pandas()
    )
    folded["key"] = folded["key"].astype("int64")
    return folded.sort_values("key").reset_index(drop=True)


def q_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event gap statistics — the LAG/LEAD member of the
    window-function family (sessionize covers gap-threshold windows,
    q_event_dedup_window covers dedup-within-window; this is the raw
    consecutive-row delta shape: LAG(ts) OVER (PARTITION BY user ORDER
    BY ts)).

    Exactness: gaps are computed in integer MICROSECONDS (the column's
    native unit) so every aggregate is an associative int64 sum — the
    distributed re-sum matches the sequential oracle bit-for-bit.  Tie
    safety: when two events share a timestamp the LAG order is
    engine-dependent, but the multiset of diffs of a sorted multiset is
    not — count/sum/min/max over the gaps are deterministic.

    Ray shape: ONE ``groupby(user_id).map_groups`` exchange carrying only
    (user_id, ts); per-group work is a vectorized sort+diff.  Memory is
    bounded by the largest single user's event count (the standard
    partition-by-key assumption; a hot user tiers to the sessionize-style
    pre-sorted chunk fold).  Users with a single event have no gap and
    are dropped on both sides (SQL: WHERE gap IS NOT NULL)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        us = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        if len(us) < 2:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64)}
            ).reindex(
                columns=["user_id", "n_gaps", "sum_gap_us",
                         "min_gap_us", "max_gap_us"]
            )
        d = np.diff(us)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_gaps": [int(d.size)],
                "sum_gap_us": [int(d.sum())],
                "min_gap_us": [int(d.min())],
                "max_gap_us": [int(d.max())],
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(gaps, batch_format="pandas")
        .sort("user_id")
        .to_pandas()
    )


def q_string_agg(sf_dir: str) -> pd.DataFrame:
    """Ordered per-group string aggregation — the user-journey "path"
    shape (string_agg(event_type, '>' ORDER BY ts, event_id)), the last
    missing aggregate family member next to the numeric folds.  Webtext
    analog: ordered anchor-text concatenation per target URL.

    Determinism: the ORDER BY carries the unique event_id as tie-break,
    so both engines produce the identical byte sequence even when
    timestamps collide.

    Ray shape: ONE ``groupby(user_id).map_groups`` exchange over the
    three projected columns; the per-group fold is a vectorized lexsort
    + join.  Output size is bounded by events-per-user; at corpus scale
    a runaway group tiers to truncated/top-k paths — the full
    concatenation is the oracle-checkable exact semantic."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def path(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["ts"].to_numpy())
        )
        types = g["event_type"].to_numpy()[order]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "path": [">".join(types.tolist())],
                "n_events": [int(len(types))],
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(path, batch_format="pandas")
        .sort("user_id")
        .to_pandas()
    )


def profile_table(sf_dir: str) -> pd.DataFrame:
    """(col, n_rows, n_nulls, n_distinct, min_str, max_str): column-level
    data profiling over the orders table — the Deequ / Great-Expectations
    data-quality shape (per-column null rate, EXACT distinct cardinality,
    bounds) a pipeline runs before trusting an input at scale.

    Ray shape: one stateless pass emits per-block-DISTINCT (col, value)
    rows — int columns carry the typed value (min/max must compare
    numerically, not lexicographically), string columns the bytes — so
    the exchange is bounded by per-block distinct cardinality, never the
    row count; ONE groupby(col, vi, vs) distinct fold, then a per-column
    map_groups computes count/min/max and renders bounds as strings
    (str(int) is injective, so distinct-over-renderings == distinct-over-
    values).  Row/null totals ride a separate 2-aggregate pass over
    per-block partials (cols x blocks rows).  Exact distinct is
    inherently a distinct-values exchange; the approximate tier at
    10^10 rows is the HLL sketch (hll_users).  SQL oracle: per-column
    UNION ALL with CAST(min(..) AS VARCHAR)."""
    cols_int = ["o_orderkey", "o_custkey"]
    cols_str = ["o_orderstatus", "o_orderpriority"]
    ds = _read(sf_dir, "orders", columns=cols_int + cols_str)
    return _profile_ds(ds, cols_int, cols_str)


def _profile_ds(ds: rd.Dataset, cols_int: list, cols_str: list
                ) -> pd.DataFrame:
    """profile_table core over any Dataset (null-table unit tests hit
    this directly).  Null contract matches SQL: count(DISTINCT) and
    min/max EXCLUDE nulls, n_nulls counts them."""

    def explode_distinct(t: pa.Table) -> pa.Table:
        names, vis, vss = [], [], []
        for c in cols_int:
            vals = pc.drop_null(pc.unique(t[c]))
            names += [c] * len(vals)
            vis += vals.to_pylist()
            vss += [""] * len(vals)
        for c in cols_str:
            vals = pc.drop_null(pc.unique(t[c]))
            names += [c] * len(vals)
            vis += [0] * len(vals)
            vss += vals.to_pylist()
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "vi": pa.array(vis, pa.int64()),
                "vs": pa.array(vss, pa.string()),
            }
        )

    def counts_partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        for c in cols_int + cols_str:
            names.append(c)
            ns.append(len(t))
            nulls.append(t[c].null_count)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
            }
        )

    totals = (
        ds.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("nulls", alias_name="n_nulls"))
        .to_pandas()
        .set_index("col")
    )

    def col_stats(g: pd.DataFrame) -> pd.DataFrame:
        c = g["col"].iloc[0]
        if c in cols_int:
            v = g["vi"].to_numpy()
            mn, mx = str(int(v.min())), str(int(v.max()))
        else:
            v = g["vs"]
            mn, mx = str(v.min()), str(v.max())
        return pd.DataFrame(
            {
                "col": [c],
                "n_distinct": [int(len(g))],
                "min_str": [mn],
                "max_str": [mx],
            }
        )

    dist = (
        ds.map_batches(explode_distinct, batch_format="pyarrow")
        .groupby(["col", "vi", "vs"])
        .aggregate(Count(alias_name="_n"))
        .groupby("col")
        .map_groups(col_stats, batch_format="pandas")
        .to_pandas()
        .set_index("col")
    )
    out = totals.join(dist).reset_index()
    # an all-null column has no distinct row at all: SQL gives distinct 0
    # and NULL bounds
    if out["n_distinct"].isna().any():
        out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
        out["min_str"] = out["min_str"].where(out["min_str"].notna(), None)
        out["max_str"] = out["max_str"].where(out["max_str"].notna(), None)
    out = out[["col", "n_rows", "n_nulls", "n_distinct", "min_str",
               "max_str"]]
    return out.sort_values("col").reset_index(drop=True)


class _WindowState:
    """Streaming window state for q_events_hourly_stream: per-(type,
    window) running (count, e6-sum, max) partials plus the event-time
    watermark.  The actor only ever holds WINDOW-cardinality state —
    each arrival wave is pre-aggregated to its distinct (type, window)
    partials by a Dataset pass before it reaches the actor (the corpus
    never enters actor memory), exactly how a Flink/Beam keyed window
    operator holds per-window accumulators, not events."""

    def __init__(self, lateness_us: int):
        self.lateness_us = int(lateness_us)
        self.state: dict = {}      # (type, window_us) -> [n, sum_e6, max]
        self.watermark = None      # max event ts seen - lateness
        self.emitted: dict = {}    # (type, window_us) -> wave finalized
        self.n_late = 0

    def merge_wave(self, wave_id: int, partials: "pd.DataFrame",
                   wave_max_ts_us: int) -> dict:
        import pandas as _pd

        for row in partials.itertuples(index=False):
            key = (row.event_type, int(row.window_us))
            if key in self.emitted:
                self.n_late += 1  # would re-open a finalized window
                continue
            s = self.state.get(key)
            if s is None:
                self.state[key] = [int(row.n), int(row.sum_e6),
                                   float(row.max_value)]
            else:
                s[0] += int(row.n)
                s[1] += int(row.sum_e6)
                s[2] = max(s[2], float(row.max_value))
        wm = int(wave_max_ts_us) - self.lateness_us
        self.watermark = wm if self.watermark is None else max(
            self.watermark, wm
        )
        hour_us = 3_600_000_000
        newly = [
            k for k in self.state
            if k not in self.emitted and k[1] + hour_us <= self.watermark
        ]
        for k in newly:
            self.emitted[k] = wave_id
        return {
            "wave": wave_id,
            "finalized": len(newly),
            "open": len(self.state) - len(self.emitted),
            "late_dropped": self.n_late,
        }

    def finalize(self):
        import pandas as _pd

        rows = [
            (t, w, s[0], s[1], s[2], self.emitted.get((t, w), -1))
            for (t, w), s in self.state.items()
        ]
        return _pd.DataFrame(
            rows,
            columns=["event_type", "window_us", "n_events", "sum_e6",
                     "max_value", "emit_wave"],
        ), self.n_late


def q_events_hourly_stream(sf_dir: str, n_waves: int = 5,
                           return_log: bool = False):
    """Streaming replay of q_events_hourly with WATERMARK semantics —
    the §2.10 streaming-window custom operator: events arrive in
    ``n_waves`` bounded-disorder waves (time-quintile placement ±1 wave
    of md5 jitter — the realistic "mostly in order, bounded lateness"
    arrival model), a keyed window-state actor accumulates per-window
    partials, and every window FINALIZES at the first wave whose
    watermark (max event time seen − allowed lateness) passes its end.
    Allowed lateness = one wave span + 1h, so the bounded disorder never
    drops an event and the final table is hash-exact against the BATCH
    oracle (same SQL as q_events_hourly) — while the emission log proves
    windows really did close incrementally (pytest-gated:
    zero late drops, monotone emission, most windows final before the
    last wave).

    Ray shape: each wave is ONE Dataset pass pre-aggregating to distinct
    (type, window) partials (map-side combine, same kernel as the batch
    query); the actor holds window-cardinality state only.  At 100 TB
    the single state actor shards by hash(type, window) — the state is
    already keyed — and waves become real arrival batches."""
    import hashlib as _hl

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type",
                                          "value"])
    # wave bounds from the global ts range (one cheap aggregate)
    rng = ev.aggregate(Min("ts", alias_name="lo"), Max("ts", alias_name="hi"))
    lo = pd.Timestamp(rng["lo"]).value // 1000  # ns -> us
    hi = pd.Timestamp(rng["hi"]).value // 1000
    span = max(1, hi - lo)
    wave_span_us = span // n_waves + 1
    # disorder bound: wave a holds time-quantiles a-1..a+1, so the max ts
    # seen by wave a can lead an event still to arrive (quantile a, landing
    # in wave a+1) by up to 3 wave spans; +1h covers the window-end
    # overhang.  Anything tighter late-drops real events and the final
    # table stops matching the batch oracle.
    lateness_us = 3 * wave_span_us + 3_600_000_000

    def wave_partials(t: pa.Table, wave: int) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        q = pc.cast(
            pc.divide(pc.subtract(ts_us, pa.scalar(lo, pa.int64())),
                      pa.scalar(wave_span_us, pa.int64())),
            pa.int64(),
        )
        jit = pa.array(
            [
                int(_hl.md5(f"arr:{e}".encode()).hexdigest()[:8], 16) % 3 - 1
                for e in t["event_id"].to_pylist()
            ],
            pa.int64(),
        )
        w = pc.max_element_wise(
            pc.min_element_wise(pc.add(q, jit),
                                pa.scalar(n_waves - 1, pa.int64())),
            pa.scalar(0, pa.int64()),
        )
        keep = pc.equal(w, pa.scalar(wave, pa.int64()))
        tt = t.filter(keep)
        if len(tt) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_us": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_e6": pa.array([], pa.int64()),
                    "max_value": pa.array([], pa.float64()),
                    "wave_max_ts": pa.array([], pa.int64()),
                }
            )
        ts2 = pc.cast(tt["ts"], pa.int64())
        hour_us = 3_600_000_000
        g = pa.table(
            {
                "event_type": tt["event_type"],
                "window_us": pc.multiply(
                    pc.divide(ts2, pa.scalar(hour_us, pa.int64())),
                    pa.scalar(hour_us, pa.int64()),
                ),
                "sum_e6": pc.cast(
                    pc.round(pc.multiply(tt["value"], pa.scalar(1e6))),
                    pa.int64(),
                ),
                "max_value": tt["value"],
            }
        ).group_by(["event_type", "window_us"]).aggregate(
            [("sum_e6", "count"), ("sum_e6", "sum"), ("max_value", "max")]
        ).rename_columns(
            ["event_type", "window_us", "n", "sum_e6", "max_value"]
        )
        wmax = int(pc.max(ts2).as_py())
        return g.append_column(
            "wave_max_ts", pa.array([wmax] * len(g), pa.int64())
        )

    state = ray.remote(_WindowState).options(num_cpus=0).remote(lateness_us)
    log = []
    for wave in range(n_waves):
        parts = ev.map_batches(
            lambda t, _w=wave: wave_partials(t, _w), batch_format="pyarrow"
        ).to_pandas()
        if parts.empty:
            continue
        wave_max = int(parts["wave_max_ts"].max())
        # fold cross-block partials before the RPC (window-cardinality)
        folded = (
            parts.groupby(["event_type", "window_us"], as_index=False)
            .agg(n=("n", "sum"), sum_e6=("sum_e6", "sum"),
                 max_value=("max_value", "max"))
        )
        log.append(ray.get(state.merge_wave.remote(wave, folded, wave_max)))
    final, n_late = ray.get(state.finalize.remote())
    ray.kill(state)

    final["window_start"] = pd.to_datetime(
        final["window_us"], unit="us"
    ).astype("datetime64[us]")
    final["sum_value"] = final["sum_e6"] / 1e6
    final["n_events"] = final["n_events"].astype("int64")
    out = final[["event_type", "window_start", "n_events", "sum_value",
                 "max_value"]].sort_values(
        ["event_type", "window_start"]
    ).reset_index(drop=True)
    if return_log:
        return out, log, final["emit_wave"], n_late
    return out
