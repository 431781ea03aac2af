"""Distributed iterative graph analytics over relational link tables.

The crawl tier's canonical graph workload is link analysis: the frontier
scheduler wants a per-node importance score (PageRank) computed over the
link graph the crawl itself discovers.  This module implements PageRank
as a bulk-synchronous-parallel loop of Ray Data primitives — ONE hash
join per superstep for the rank scatter, one ``groupby().sum()`` for the
gather — with ALL arithmetic in scaled int64 so the result is bit-exact
regardless of summation order (float PageRank is order-dependent and can
never be hash-verified against an independent engine; integer
contributions are associative, so Ray's shuffled partial sums and
DuckDB's single-threaded sums agree exactly).

Graph source for the oracled query: the bipartite supplier<->part link
graph induced by ``lineitem`` — one directed edge each way per DISTINCT
(l_suppkey, l_partkey) pair.  This is a real relational graph (no
synthetic hashing), and the whole computation — distinct edges, degrees,
three unrolled rank iterations — is expressible in ANSI SQL, which is
what makes the driver's value-hash check possible.

Scale notes (the 100 TB shape):
- Edges are distinct-ified by packing (suppkey, partkey) into ONE int64
  groupby key (same trick as dedup._with_pair_key) — a single-column
  shuffle, with a per-block numpy-unique combiner before it.
- Each BSP superstep is: edges ⋈ ranks on src (hash join: edge-sized
  left, node-sized right), contribution = rank // deg per edge
  (vectorized pyarrow), then the gather as ``union(contribs,
  node-zeros).groupby(node).sum()`` — the union of a zero row per node
  replaces a second (left-outer) join for re-attaching dangling/isolated
  nodes, halving the per-superstep shuffle count.  Only the NODE-sized
  rank table is materialized between supersteps (the BSP barrier); the
  edge table streams through each iteration.
- Final assembly is join-free: node_type / node_key are derivable from
  the node id encoding (part = 2k, supplier = 2k+1), and out/in degrees
  merge with the final ranks through one tagged-union groupby.
- Rank values are scaled by 1e9.  A loud guard rejects graphs where
  ``n_nodes * SCALE * DAMP_NUM`` could overflow int64 (~1e8 nodes at this
  scale; drop SCALE to 1e6 for 1e10-node webgraphs and the guard says so).
- Dangling nodes (no out-edges) simply leak their mass — the "weak
  PageRank" variant — which keeps every step a pure local gather with no
  global dangling-sum broadcast.  Documented, matched exactly by the SQL
  oracle.

Reference analog: none (the reference crawls sequentially and never
builds a link graph); this is part of the beyond-reference web-scale
operator surface, same family as the frontier priority scheduling in
``pipelines/crawl.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

SCALE = 1_000_000_000  # rank fixed-point scale (1e9)
DAMP_NUM = 85          # damping 0.85 as integer ratio
BASE_NUM = 15
DEN = 100
ITERS = 3

_PAIR_BITS = 32  # partkey packed in low 32 bits of the distinct-pair key


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _distinct_edges(sf_dir: str) -> rd.Dataset:
    """Distinct (supplier, part) pairs -> symmetric directed edges.

    Pack the pair into one int64 ((suppkey << 32) | partkey), groupby on
    that single column for the global distinct (one narrow shuffle), then
    unpack and emit both directions.  Node ids: part = partkey*2,
    supplier = suppkey*2 + 1.
    """
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pack(t: pa.Table) -> pa.Table:
        pk = pc.cast(t["l_partkey"], pa.int64())
        sk = pc.cast(t["l_suppkey"], pa.int64())
        if len(pk) and pc.max(pk).as_py() >= (1 << _PAIR_BITS):
            raise ValueError(
                f"l_partkey >= 2^{_PAIR_BITS}: widen the pair-pack layout"
            )
        pair = pc.bit_wise_or(pc.shift_left(sk, _PAIR_BITS), pk)
        # per-block local distinct before the shuffle (combiner)
        uniq = np.unique(pair.to_numpy(zero_copy_only=False))
        return pa.table({"pair": pa.array(uniq, pa.int64())})

    pairs = li.map_batches(pack, batch_format="pyarrow").groupby("pair").count()

    def unpack(t: pa.Table) -> pa.Table:
        pair = t["pair"]
        sk = pc.shift_right(pair, _PAIR_BITS)
        pk = pc.bit_wise_and(pair, (1 << _PAIR_BITS) - 1)
        supp_node = pc.add(pc.multiply(sk, 2), 1).combine_chunks()
        part_node = pc.multiply(pk, 2).combine_chunks()
        # both directions: supplier -> part and part -> supplier
        src = pa.concat_arrays([supp_node, part_node])
        dst = pa.concat_arrays([part_node, supp_node])
        return pa.table({"src": src, "dst": dst})

    return pairs.map_batches(unpack, batch_format="pyarrow")


def _node_ids(sf_dir: str) -> rd.Dataset:
    """Every node (parts U suppliers, including isolated ones) as one
    int64 ``node`` column."""
    parts = _read(sf_dir, "part", columns=["p_partkey"]).map_batches(
        lambda t: pa.table(
            {"node": pc.multiply(pc.cast(t["p_partkey"], pa.int64()), 2)}
        ),
        batch_format="pyarrow",
    )
    supps = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        lambda t: pa.table(
            {
                "node": pc.add(
                    pc.multiply(pc.cast(t["s_suppkey"], pa.int64()), 2), 1
                )
            }
        ),
        batch_format="pyarrow",
    )
    return parts.union(supps)


# below this node count the rank/degree vectors are broadcast (ray.put)
# and every superstep is a zero-shuffle streaming pass over the edges;
# above it the BSP join path runs (1.6 MB of vector per 200k nodes —
# the same tiered-threshold design as dedup's pair-verify join)
_BROADCAST_MAX_NODES = 200_000


def link_pagerank(sf_dir: str, iters: int = ITERS,
                  force_bsp: bool = False) -> "pd.DataFrame":
    """PageRank (damping .85, ``iters`` supersteps, scaled-int64 exact)
    over the lineitem supplier<->part link graph.

    Returns one row per node (every part and supplier, including isolated
    ones): ``node_id, node_type, node_key, out_deg, in_deg, rank_e9``,
    ordered by node_id.  ``rank_e9`` is the unnormalized fixed-point rank
    (init = 1e9 per node); dangling mass leaks (weak variant) — the SQL
    oracle reproduces the identical recurrence, so the driver hash is
    exact.

    Two execution tiers (both bit-identical, asserted in tests):
    - node count <= _BROADCAST_MAX_NODES: rank + degree vectors live in
      the object store (``ray.put``, node-sized), each superstep is one
      streaming ``map_batches`` over the edges emitting a per-block
      partial gather vector (np.add.at), merged on the driver — NO
      shuffle at all.
    - larger graphs: the BSP path — per superstep one edges⋈ranks hash
      join + one union-with-zeros groupby gather; only the node-sized
      rank table materializes between supersteps.
    """
    nodes_df = _node_ids(sf_dir).to_pandas()
    n_nodes = len(nodes_df)
    if n_nodes * SCALE * DAMP_NUM >= (1 << 63):
        raise ValueError(
            f"{n_nodes} nodes overflows the 1e9 fixed-point PageRank "
            "accumulator; lower SCALE (1e6 supports ~1e10 nodes)"
        )
    if force_bsp or n_nodes > _BROADCAST_MAX_NODES:
        return _link_pagerank_bsp(sf_dir, iters)

    node_sorted = np.sort(nodes_df["node"].to_numpy())
    edges = _distinct_edges(sf_dir).materialize()
    out_deg, in_deg, ranks = _pagerank_vectors(edges, node_sorted, iters)

    import pandas as pd

    return pd.DataFrame(
        {
            "node_id": node_sorted,
            "node_type": np.where(node_sorted & 1 == 1, "supplier", "part"),
            "node_key": node_sorted >> 1,
            "out_deg": out_deg,
            "in_deg": in_deg,
            "rank_e9": ranks,
        }
    )


def _link_pagerank_bsp(sf_dir: str, iters: int = ITERS) -> "pd.DataFrame":
    """The above-threshold BSP path: hash-join scatter + groupby gather
    per superstep (see module docstring)."""
    import pandas as pd  # noqa: F401  (return type)
    from langscrape_ray.pipelines.dedup import _join_parts

    n_parts = _join_parts(8)

    edges = _distinct_edges(sf_dir)
    outdeg = edges.groupby("src").count()  # (src, count())

    # static: every edge annotated with its source's out-degree (the only
    # join besides the per-superstep rank scatter)
    edges_deg = (
        edges.join(
            outdeg,
            join_type="inner",
            num_partitions=n_parts,
            on=("src",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "deg": pc.cast(t["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    nodes = _node_ids(sf_dir).materialize()
    n_nodes = nodes.count()
    # overflow guard (mirrors prep's pack guards): the gather sums at most
    # the whole rank mass, then multiplies by DAMP_NUM
    if n_nodes * SCALE * DAMP_NUM >= (1 << 63):
        raise ValueError(
            f"{n_nodes} nodes overflows the 1e9 fixed-point PageRank "
            "accumulator; lower SCALE (1e6 supports ~1e10 nodes)"
        )

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "rank": pa.array(np.full(t.num_rows, SCALE, np.int64)),
            }
        )

    zeros = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "contrib": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # scatter: rank[src] // deg per edge (hash join, then vectorized)
        contrib = edges_deg.join(
            ranks,
            join_type="inner",
            num_partitions=n_parts,
            on=("src",),
            right_on=("node",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        ).map_batches(
            lambda t: pa.table(
                {"node": t["dst"], "contrib": pc.divide(t["rank"], t["deg"])}
            ),
            batch_format="pyarrow",
        )

        def apply_rank(t: pa.Table) -> pa.Table:
            a = pc.cast(t["sum(contrib)"], pa.int64())
            rank = pc.divide(
                pc.add(BASE_NUM * SCALE, pc.multiply(DAMP_NUM, a)), DEN
            )
            return pa.table({"node": t["node"], "rank": rank})

        # gather: union a zero row per node (so dangling/isolated nodes
        # survive with agg=0) and ONE groupby-sum — no second join
        ranks = (
            contrib.union(zeros)
            .groupby("node")
            .sum("contrib")
            .map_batches(apply_rank, batch_format="pyarrow")
            .materialize()  # BSP barrier: node-sized only
        )

    # join-free final assembly: tagged union of (ranks, out-degrees,
    # in-degrees) -> one groupby-sum; node_type/node_key decode from the
    # node id parity
    def tag_rank(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table(
            {"node": t["node"], "out_deg": z, "in_deg": z,
             "rank_e9": t["rank"]}
        )

    def tag_out(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table(
            {"node": t["src"], "out_deg": pc.cast(t["count()"], pa.int64()),
             "in_deg": z, "rank_e9": z}
        )

    def tag_in(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table(
            {"node": t["dst"], "out_deg": z,
             "in_deg": pc.cast(t["count()"], pa.int64()), "rank_e9": z}
        )

    tagged = (
        ranks.map_batches(tag_rank, batch_format="pyarrow")
        .union(outdeg.map_batches(tag_out, batch_format="pyarrow"))
        .union(
            edges.groupby("dst")
            .count()
            .map_batches(tag_in, batch_format="pyarrow")
        )
    )
    merged = tagged.groupby("node").sum(["out_deg", "in_deg", "rank_e9"])

    def finalize(t: pa.Table) -> pa.Table:
        node = pc.cast(t["node"], pa.int64())
        is_supp = pc.equal(pc.bit_wise_and(node, 1), 1)
        return pa.table(
            {
                "node_id": node,
                "node_type": pc.if_else(is_supp, "supplier", "part"),
                "node_key": pc.shift_right(node, 1),
                "out_deg": pc.cast(t["sum(out_deg)"], pa.int64()),
                "in_deg": pc.cast(t["sum(in_deg)"], pa.int64()),
                "rank_e9": pc.cast(t["sum(rank_e9)"], pa.int64()),
            }
        )

    return (
        merged.map_batches(finalize, batch_format="pyarrow")
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# host-graph PageRank over crawled pages (frontier-priority input)
# ---------------------------------------------------------------------------

def _pagerank_vectors(edges: rd.Dataset, node_sorted: np.ndarray,
                      iters: int = ITERS):
    """Broadcast-tier PageRank core shared by link_pagerank and
    host_pagerank: streaming partial-gather passes over an int64
    (src, dst) edge Dataset against broadcast rank/degree vectors.
    Returns (out_deg, in_deg, ranks) int64 arrays aligned to
    ``node_sorted``."""
    import ray

    n = len(node_sorted)
    if n * SCALE * DAMP_NUM >= (1 << 63):
        raise ValueError(
            f"{n} nodes overflows the 1e9 fixed-point PageRank "
            "accumulator; lower SCALE (1e6 supports ~1e10 nodes)"
        )
    nodes_ref = ray.put(node_sorted)

    def deg_partial(t: pa.Table) -> pa.Table:
        ns = ray.get(nodes_ref)
        si = np.searchsorted(ns, t["src"].to_numpy())
        di = np.searchsorted(ns, t["dst"].to_numpy())
        out_v = np.zeros(len(ns), np.int64)
        in_v = np.zeros(len(ns), np.int64)
        np.add.at(out_v, si, 1)
        np.add.at(in_v, di, 1)
        return pa.table(
            {
                "out_vec": pa.array([out_v.tobytes()], pa.large_binary()),
                "in_vec": pa.array([in_v.tobytes()], pa.large_binary()),
            }
        )

    out_deg = np.zeros(n, np.int64)
    in_deg = np.zeros(n, np.int64)
    for row in edges.map_batches(deg_partial, batch_format="pyarrow").take_all():
        out_deg += np.frombuffer(row["out_vec"], np.int64)
        in_deg += np.frombuffer(row["in_vec"], np.int64)

    deg_ref = ray.put(out_deg)
    ranks = np.full(n, SCALE, np.int64)
    for _ in range(iters):
        rank_ref = ray.put(ranks)

        def gather_partial(t: pa.Table) -> pa.Table:
            ns = ray.get(nodes_ref)
            deg = ray.get(deg_ref)
            r = ray.get(rank_ref)
            si = np.searchsorted(ns, t["src"].to_numpy())
            di = np.searchsorted(ns, t["dst"].to_numpy())
            per_edge = r[si] // deg[si]
            vec = np.zeros(len(ns), np.int64)
            np.add.at(vec, di, per_edge)
            return pa.table(
                {"vec": pa.array([vec.tobytes()], pa.large_binary())}
            )

        agg = np.zeros(n, np.int64)
        for row in edges.map_batches(
            gather_partial, batch_format="pyarrow"
        ).take_all():
            agg += np.frombuffer(row["vec"], np.int64)
        ranks = (BASE_NUM * SCALE + DAMP_NUM * agg) // DEN
    return out_deg, in_deg, ranks


def host_pagerank(pages, iters: int = ITERS,
                  level: str = "host") -> "pd.DataFrame":
    """PageRank over the link graph a crawl discovers: parse every page's
    outlinks (the real extraction kernel), canonicalize, distinct edges
    (self-loops dropped), then the shared integer PageRank core.  This is
    the frontier-priority signal a production crawler feeds back into
    scheduling (crawl.py's priority hook).

    ``level``: 'host' aggregates the graph to host->host edges; 'url'
    ranks individual canonical URLs (the per-URL frontier priority).

    ``pages``: a Ray Dataset or pyarrow Table with (url, html) columns.
    Returns (node, out_deg, in_deg, rank_e9) sorted by node (the node
    column is the host or canonical URL).  Exactness: pure-integer
    recurrence — pytest replays it single-process on the same fixture
    world and asserts equality (tests/test_graph.py).

    Scale: outlink parse is an embarrassingly parallel map_batches; node
    ids come from ONE small groupby (hosts are ~1e7-1e8 even at 10^10
    pages; URL-level above the broadcast threshold needs the BSP tier —
    the guard says so), sorted once on the driver and broadcast; edges
    are distinct-ified via a packed-int64 groupby, then the
    broadcast-tier vector core streams them."""
    import pandas as pd

    from langscrape_ray.frontier.canonical import canonicalize_url as canonicalize
    from langscrape_ray.kernel.dom import parse_html
    from langscrape_ray.kernel.extract import extract_outlinks

    if level not in ("host", "url"):
        raise ValueError("level must be 'host' or 'url'")
    if isinstance(pages, pa.Table):
        pages = rd.from_arrow(pages)

    def page_host_edges(t: pa.Table) -> pa.Table:
        srcs: list = []
        dsts: list = []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            c = canonicalize(url)
            if c is None:
                continue
            src_key = c[1] if level == "host" else c[0]
            seen = set()
            for link in extract_outlinks(parse_html(html), url):
                lc = canonicalize(link)
                if lc is None:
                    continue
                dst_key = lc[1] if level == "host" else lc[0]
                if dst_key != src_key:
                    seen.add(dst_key)
            srcs.extend([src_key] * len(seen))
            dsts.extend(sorted(seen))
        return pa.table(
            {
                "src_host": pa.array(srcs, pa.string()),
                "dst_host": pa.array(dsts, pa.string()),
            }
        )

    raw_edges = pages.map_batches(
        page_host_edges, batch_format="pyarrow"
    ).materialize()

    # host id map: one small groupby over both endpoint columns
    hosts_ds = raw_edges.map_batches(
        lambda t: pa.table(
            {
                "host": pa.concat_arrays(
                    [
                        t["src_host"].combine_chunks(),
                        t["dst_host"].combine_chunks(),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
    )
    host_list = sorted(
        r["host"] for r in hosts_ds.groupby("host").count().take_all()
    )
    host_to_id = {h: i for i, h in enumerate(host_list)}
    n = len(host_list)
    if n > _BROADCAST_MAX_NODES:
        raise ValueError(
            "host graph exceeds the broadcast tier; wire the BSP path "
            "(link_pagerank's _link_pagerank_bsp shape) for this size"
        )

    import ray

    map_ref = ray.put(host_to_id)

    def to_int_pairs(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        src = np.fromiter(
            (m[h] for h in t["src_host"].to_pylist()), np.int64,
            count=t.num_rows,
        )
        dst = np.fromiter(
            (m[h] for h in t["dst_host"].to_pylist()), np.int64,
            count=t.num_rows,
        )
        pair = np.unique(src * np.int64(_BROADCAST_MAX_NODES + 1) + dst)
        return pa.table({"pair": pa.array(pair, pa.int64())})

    def unpack_pairs(t: pa.Table) -> pa.Table:
        src = pc.divide(t["pair"], _BROADCAST_MAX_NODES + 1)
        dst = pc.subtract(
            t["pair"], pc.multiply(src, _BROADCAST_MAX_NODES + 1)
        )
        return pa.table({"src": src, "dst": dst})

    edges = (
        raw_edges.map_batches(to_int_pairs, batch_format="pyarrow")
        .groupby("pair")
        .count()
        .map_batches(unpack_pairs, batch_format="pyarrow")
    )

    node_sorted = np.arange(n, dtype=np.int64)
    out_deg, in_deg, ranks = _pagerank_vectors(edges, node_sorted, iters)
    return pd.DataFrame(
        {
            "node": host_list,
            "out_deg": out_deg,
            "in_deg": in_deg,
            "rank_e9": ranks,
        }
    )


def anchor_text_table(pages, top_k: int = 1) -> "pd.DataFrame":
    """(dst_url, n_links, n_unique_anchors, top_anchor): the anchor-text
    table of the link graph — for every canonical target URL, how many
    links point at it, how many distinct (normalized) anchor strings those
    links carry, and the most common anchor (ties broken lexicographically
    smallest).  This is the classic web-corpus signal harvested for both
    ranking and training data ("what does the web call this page").

    ``pages``: Ray Dataset or pyarrow Table with (url, html) columns.

    Ray shape: parse+harvest is an embarrassingly parallel ``map_batches``
    over pages (the real extraction kernel, one parse per page); pairs
    collapse through ONE (dst_url, anchor)-keyed ``groupby().count()``
    whose per-block combine already dedups repeats (anchors repeat a lot —
    nav bars), then a second groupby on dst_url alone runs the vectorized
    per-group top-1/count fold.  Both exchanges carry (url, anchor, n)
    triples — bytes proportional to UNIQUE pairs, not links.  At 10^10
    pages the pair key would pack (url_hash64, anchor_hash64) into two
    int64s with the strings attached once per unique pair — the same
    single-int-key shuffle trick as _distinct_edges; the string-keyed
    groupby here keeps the sf-scale parity test readable.

    Parity: tests replay the same kernel single-process over the fixture
    world and assert frame equality (no SQL analog of the HTML parse).
    Reference analog: none (reference never follows or aggregates links);
    brief-driven web-graph operator.
    """
    import pandas as pd

    from langscrape_ray.frontier.canonical import canonicalize_url
    from langscrape_ray.kernel.dom import parse_html
    from langscrape_ray.kernel.extract import extract_outlinks_with_text

    if isinstance(pages, pa.Table):
        pages = rd.from_arrow(pages)

    def harvest(t: pa.Table) -> pa.Table:
        dsts: list = []
        anchors: list = []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for href, anchor in extract_outlinks_with_text(
                parse_html(html), url
            ):
                c = canonicalize_url(href)
                if c is None:
                    continue
                dsts.append(c[0])
                anchors.append(anchor)
        return pa.table(
            {
                "dst_url": pa.array(dsts, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )

    pair_counts = (
        pages.map_batches(harvest, batch_format="pyarrow")
        .groupby(["dst_url", "anchor"])
        .count()
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        n_links = int(g["count()"].sum())
        top = g.sort_values(
            ["count()", "anchor"], ascending=[False, True]
        ).iloc[0]["anchor"]
        return pd.DataFrame(
            {
                "dst_url": [g["dst_url"].iloc[0]],
                "n_links": [n_links],
                "n_unique_anchors": [len(g)],
                "top_anchor": [top],
            }
        )

    out = (
        pair_counts.groupby("dst_url")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values("dst_url")
        .reset_index(drop=True)
    )
    out["n_links"] = out["n_links"].astype("int64")
    out["n_unique_anchors"] = out["n_unique_anchors"].astype("int64")
    return out
