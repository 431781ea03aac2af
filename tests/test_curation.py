"""Curation-operator tests: BPE trainer vs an independent single-process
reference, shuffle_shards layout invariants, source_overlap guards.

The SQL-oracle parity of shuffle_shards / lm_familiarity / quantile_gate /
source_overlap / inverted_index runs in tests/test_queries.py; these tests
cover the properties an oracle can't express.
"""

import pyarrow.parquet as pq
import pytest

from langscrape_ray.pipelines import curation

SF = "/root/testdata/sf0.001"


def _reference_bpe(texts, n_merges):
    """Independent Sennrich-style BPE: dict-of-tuples vocabulary, pair
    stats weighted by word frequency, greedy left-to-right merge."""
    wf = {}
    for tx in texts:
        for w in tx.split(" "):
            wf[w] = wf.get(w, 0) + 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in wf.items()}
    out = []
    for rank in range(n_merges):
        stats = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                stats[k] = stats.get(k, 0) + f
        if not stats:
            break
        (left, right), count = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out.append((rank, left, right, count))
        new = {}
        for syms, f in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            k = tuple(res)
            new[k] = new.get(k, 0) + f
        vocab = new
    return out


def test_bpe_matches_single_process_reference(ray_session):
    dist = curation.bpe_merges(SF, n_merges=8)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    ref = _reference_bpe(texts, 8)
    got = list(
        zip(
            dist["rank"].tolist(),
            dist["left"].tolist(),
            dist["right"].tolist(),
            dist["pair_count"].tolist(),
        )
    )
    assert got == ref
    # merge table is a real vocabulary: merged symbols grow
    assert all(len(l) + len(r) >= 2 for _, l, r, _ in got)


def test_shuffle_shards_layout_invariants(ray_session):
    df = curation.shuffle_shards(SF).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(df) == n_docs
    assert df["doc_id"].is_unique
    for shard, g in df.groupby("shard"):
        # positions are dense 0..len-1 within each shard
        assert sorted(g["pos"].tolist()) == list(range(len(g)))
        # pos order == (h, doc_id) order
        ordered = g.sort_values(["h", "doc_id"])["pos"].tolist()
        assert ordered == list(range(len(g)))


def test_quantile_gate_threshold_is_quantile(ray_session):
    kept = curation.quantile_gate(SF, q_pct=25).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    # at least 75% of docs survive a P25 gate, and never all unless
    # the corpus is constant-length
    assert len(kept) >= 0.75 * n_docs
    assert kept["n_tokens"].min() >= 1


def test_source_overlap_guard_on_too_many_sources(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    t = pa.table(
        {
            "doc_id": pa.array(range(70), pa.int64()),
            "text": pa.array(["a b c"] * 70, pa.string()),
            "lang": pa.array(["en"] * 70, pa.string()),
            "source": pa.array([f"s{i}" for i in range(70)], pa.string()),
            "n_chars": pa.array([5] * 70, pa.int64()),
        }
    )
    pqw.write_table(t, tmp_path / "documents.parquet")
    with pytest.raises(ValueError, match="63-bit"):
        curation.source_overlap(str(tmp_path))


def test_crawl_corpus_rollup_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa

    from langscrape_ray.pipelines.prep import crawl_corpus_rollup

    # synthetic extracted table: dup texts across hosts, a too-short text,
    # and seq order that makes the keeper's host differ from doc order
    rows = [
        ("u0", "h-a", 5, "alpha beta gamma delta epsilon zeta"),
        ("u1", "h-b", 2, "alpha beta gamma delta epsilon zeta"),  # dup, earlier seq -> keeper
        ("u2", "h-a", 1, "tiny"),                                  # gated out (<5 tokens)
        ("u3", "h-c", 7, "one two three four five six seven"),
        ("u4", "h-c", 3, "one two three four five six seven"),     # dup, keeper
        ("u5", "h-b", 9, "unique text with exactly six tokens"),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    got = crawl_corpus_rollup(t, min_tokens=5)

    # independent recomputation
    df = t.to_pandas()
    df["n_tok"] = df["text"].str.split().str.len()
    kept = df[df["n_tok"] >= 5]
    keeper_seq = kept.groupby("text")["seq"].min()
    keepers = kept[kept["seq"] == kept["text"].map(keeper_seq)]
    exp = (
        df.groupby("host")
        .agg(n_pages=("url", "size"))
        .join(kept.groupby("host").agg(n_kept=("url", "size")))
        .join(
            keepers.groupby("host").agg(
                n_unique=("url", "size"), uniq_tokens=("n_tok", "sum")
            )
        )
        .fillna(0)
        .astype("int64")
        .reset_index()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.loc[got.host == "h-b", "n_unique"].item() == 2
    assert got.loc[got.host == "h-a", "n_unique"].item() == 0


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pqw.write_table(t, tmp_path / "documents.parquet")


def test_lm_familiarity_short_docs(ray_session, tmp_path):
    _write_docs(tmp_path, ["solo", "", "two words", "two words"])
    df = (
        curation.lm_familiarity(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # docs 0 and 1 have < 2 tokens -> all-zero scores
    assert df.loc[0, ["n_bigrams", "sum_bg_freq", "n_hapax"]].tolist() == [0, 0, 0]
    assert df.loc[1, ["n_bigrams", "sum_bg_freq", "n_hapax"]].tolist() == [0, 0, 0]
    # 'two words' bigram occurs twice corpus-wide: freq 2 each, no hapax
    assert df.loc[2, ["n_bigrams", "sum_bg_freq", "n_hapax"]].tolist() == [1, 2, 0]


def test_shuffle_shards_deterministic_across_runs(ray_session):
    a = curation.shuffle_shards(SF).to_pandas().sort_values("doc_id")
    b = curation.shuffle_shards(SF).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_anti_join_empty_result(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from langscrape_ray.pipelines.analytics import q_anti_join

    pqw.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["a", "b"], pa.string()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
                "c_acctbal": pa.array([10.0, 20.0], pa.float64()),
                "c_mktsegment": pa.array(["x", "x"], pa.string()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pqw.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "1-URGENT"], pa.string()
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = q_anti_join(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_nationkey", "n_customers", "acctbal_cents"]


def test_crawl_corpus_seq_overflow_guard(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from langscrape_ray.pipelines.prep import _CC_SEQ_BITS, crawl_corpus_rollup

    t = pa.table(
        {
            "url": pa.array(["u"], pa.string()),
            "host": pa.array(["h"], pa.string()),
            "seq": pa.array([1 << _CC_SEQ_BITS], pa.int64()),
            "text": pa.array(["one two three four five six"], pa.string()),
        }
    )
    with _pytest.raises(Exception, match="pack field"):
        crawl_corpus_rollup(t, min_tokens=5)


def test_snapshot_diff_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    a_rows = [
        ("http://h-a/p1", b"x1"),
        ("http://h-a/p2", b"x2"),
        ("http://h-b/p1", b"y1"),
        ("http://h-b/p2", b"y2"),
    ]
    b_rows = [
        ("http://h-a/p1", b"x1"),        # same
        ("http://h-a/p2", b"x2-new"),    # changed
        ("http://h-b/p2", b"y2"),        # same (h-b/p1 removed)
        ("http://h-b/p3", b"y3"),        # added
        ("http://h-c/p1", b"z1"),        # added (new host)
    ]

    def tab(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        )

    got = curation.snapshot_diff(rd.from_arrow(tab(a_rows)), rd.from_arrow(tab(b_rows)))

    # independent recomputation
    am = {u: h for u, h in a_rows}
    bm = {u: h for u, h in b_rows}
    agg = {}
    for u in set(am) | set(bm):
        host = u.split("/", 3)[2]
        v = agg.setdefault(host, [0, 0, 0, 0])
        if u in am and u in bm:
            v[3 if am[u] == bm[u] else 2] += 1
        elif u in bm:
            v[0] += 1
        else:
            v[1] += 1
    exp = pd.DataFrame(
        [
            {"host": h, "n_added": v[0], "n_removed": v[1],
             "n_changed": v[2], "n_same": v[3]}
            for h, v in sorted(agg.items())
        ]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.loc[got.host == "h-c", "n_added"].item() == 1
    assert got.loc[got.host == "h-b", "n_removed"].item() == 1


def test_url_patterns_matches_pandas(ray_session):
    import re
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    urls = [
        "http://h-a/2024/01/05/post",
        "http://h-a/2023/12/31/post",
        "http://h-a/about",
        "http://h-b/item?id=7",
        "http://h-b/item?id=8",
        "http://h-b/item?id=9",
        "http://h-c",
    ]
    t = pa.table({"url": pa.array(urls, pa.string())})
    got = curation.url_patterns(rd.from_arrow(t))

    pat = {}
    for u in urls:
        host = u.split("/", 3)[2]
        path = u.split("/", 3)[3] if u.count("/") >= 3 else ""
        p = re.sub(r"[0-9]+", "D", path)
        pat.setdefault(host, {}).setdefault(p, 0)
        pat[host][p] += 1
    exp = pd.DataFrame(
        [
            {
                "host": h,
                "n_urls": sum(d.values()),
                "n_patterns": len(d),
                "max_urls_per_pattern": max(d.values()),
            }
            for h, d in sorted(pat.items())
        ]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # h-a's two dated posts collapse to one template; h-b's ids collapse
    assert got.loc[got.host == "h-a", "n_patterns"].item() == 2
    assert got.loc[got.host == "h-b", "max_urls_per_pattern"].item() == 3


def test_snapshot_diff_randomized_bulk(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(7)
    hosts = [f"h{i}" for i in range(12)]
    urls = [
        f"http://{rng.choice(hosts)}/p{rng.integers(0, 80)}"
        for _ in range(300)
    ]
    urls = sorted(set(urls))

    def snap(drop_mod, flip_mod):
        rows = []
        for i, u in enumerate(urls):
            if i % drop_mod == 0:
                continue
            body = f"{u}|{'B' if i % flip_mod == 0 else 'A'}".encode()
            rows.append((u, body))
        return rows

    a_rows, b_rows = snap(13, 10**9), snap(11, 5)

    def tab(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        )

    got = curation.snapshot_diff(
        rd.from_arrow(tab(a_rows)), rd.from_arrow(tab(b_rows))
    )
    am, bm = dict(a_rows), dict(b_rows)
    agg = {}
    for u in set(am) | set(bm):
        host = u.split("/", 3)[2]
        v = agg.setdefault(host, [0, 0, 0, 0])
        if u in am and u in bm:
            v[3 if am[u] == bm[u] else 2] += 1
        elif u in bm:
            v[0] += 1
        else:
            v[1] += 1
    exp = pd.DataFrame(
        [
            {"host": h, "n_added": v[0], "n_removed": v[1],
             "n_changed": v[2], "n_same": v[3]}
            for h, v in sorted(agg.items())
        ]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_url_patterns_randomized_bulk(ray_session):
    import re
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(11)
    parts = ["item", "2024", "x9", "post", "7", "a1b2"]
    urls = [
        "http://h%d/%s/%s" % (
            rng.integers(0, 6),
            parts[rng.integers(0, len(parts))],
            parts[rng.integers(0, len(parts))],
        )
        for _ in range(400)
    ]
    t = pa.table({"url": pa.array(urls, pa.string())})
    got = curation.url_patterns(rd.from_arrow(t))

    pat = {}
    for u in urls:
        host = u.split("/", 3)[2]
        p = re.sub(r"[0-9]+", "D", u.split("/", 3)[3])
        pat.setdefault(host, {}).setdefault(p, 0)
        pat[host][p] += 1
    exp = pd.DataFrame(
        [
            {
                "host": h,
                "n_urls": sum(d.values()),
                "n_patterns": len(d),
                "max_urls_per_pattern": max(d.values()),
            }
            for h, d in sorted(pat.items())
        ]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dsir_select_matches_bruteforce(ray_session, tmp_path):
    """dsir_select must equal a sequential single-process DSIR: Counter
    bucket models over target (doc_id%7==0) and raw, e6 fixed-point
    log-ratio, per-doc sum, exact top-k."""
    import hashlib
    import math
    from collections import Counter

    from langscrape_ray.pipelines.curation import dsir_select

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quantum flux capacitors invert the tachyon stream",
        "the brown dog naps",
        "",  # no bigrams -> score 0
        "single",  # one token -> no bigrams
        "the the the the",  # repeated bigram
        "fox jumps over the moon tonight again and again",
        "lorem ipsum dolor sit amet consectetur",
        "tachyon stream alignment requires the flux",
        "dog days of summer bring the lazy fox",
        "a b c d e f g h",
        "h g f e d c b a",
        "the quick brown fox",  # near-dup of target doc
        "completely unrelated words here banana umbrella",
    ]
    _write_docs(tmp_path, texts)

    K, MOD, TOP = 1024, 7, 6

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % K

    tc, rc = Counter(), Counter()
    for did, text in enumerate(texts):
        w = text.split(" ")
        for i in range(len(w) - 1):
            b = bucket(w[i] + " " + w[i + 1])
            rc[b] += 1
            if did % MOD == 0:
                tc[b] += 1
    T, R = sum(tc.values()), sum(rc.values())
    lr = {
        b: math.floor(
            1e6
            * (
                math.log((tc.get(b, 0) + 1.0) / (T + K * 1.0))
                - math.log((rc[b] + 1.0) / (R + K * 1.0))
            )
        )
        for b in rc
    }
    scores = []
    for did, text in enumerate(texts):
        w = text.split(" ")
        s = sum(lr[bucket(w[i] + " " + w[i + 1])] for i in range(len(w) - 1))
        scores.append((did, s))
    expected = sorted(scores, key=lambda p: (-p[1], p[0]))[:TOP]

    got = dsir_select(str(tmp_path), n_buckets=K, top_n=TOP, target_mod=MOD)
    assert list(zip(got["doc_id"], got["dsir_score"])) == expected
    # the weighting must point toward the target domain: the target doc's
    # near-dup (12 shares doc 0's bigrams) outscores the unrelated doc 13
    # (note: docs with no bigrams score 0, which can top a mostly-negative
    # log-ratio field — the paper's weights are likewise unnormalized)
    s = dict(scores)
    assert s[12] > s[13]
    assert s[0] > s[13]


def _write_embeddings(tmp_path, vecs):
    import numpy as np
    import pyarrow as pa

    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_drops_planted_duplicates(ray_session, tmp_path):
    """Exact duplicate vectors land in one cluster and every later-id
    copy is dropped; orthogonal vectors all survive."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(6, 64).astype(np.float32)
    # vecs 0..5 distinct; 6 and 7 duplicate vec 2's direction (scaled --
    # cosine is scale-invariant)
    vecs = list(base) + [base[2] * 0.5, base[2] * 2.0]
    sf = _write_embeddings(tmp_path, vecs)

    out = curation.semdedup_select(sf, k=2, tau2_num=81, tau2_den=100)
    by_id = out.set_index("vec_id")
    assert by_id.loc[2, "kept"] == 1  # first occurrence wins
    assert by_id.loc[6, "kept"] == 0
    assert by_id.loc[7, "kept"] == 0
    # the three copies must share a cluster (identical direction)
    assert len({by_id.loc[i, "cluster"] for i in (2, 6, 7)}) == 1
    # unrelated random 64-dim vectors are far below cos 0.9
    assert by_id.loc[[0, 1, 3, 4, 5], "kept"].eq(1).all()


def test_semdedup_cluster_cap_bounds_referees(ray_session, tmp_path):
    """With cluster_cap=1 only the earliest-id member of each cluster can
    testify: a duplicate of a NON-minimal member must survive, and n_dups
    can never exceed the cap."""
    import numpy as np

    rng = np.random.RandomState(11)
    a, b, c = rng.randn(3, 64).astype(np.float32)
    # one cluster-ish world (k=1): ids 0=a, 1=b, 2=b-dup, 3=a-dup
    vecs = [a, b, b * 1.5, a * 0.25]
    sf = _write_embeddings(tmp_path, vecs)

    capped = curation.semdedup_select(
        sf, k=1, tau2_num=81, tau2_den=100, cluster_cap=1
    ).set_index("vec_id")
    full = curation.semdedup_select(
        sf, k=1, tau2_num=81, tau2_den=100
    ).set_index("vec_id")

    # full referee set: both dups die
    assert full.loc[2, "kept"] == 0 and full.loc[3, "kept"] == 0
    # cap=1: only vec 0 testifies -> b-dup (2) survives, a-dup (3) dies
    assert capped.loc[2, "kept"] == 1
    assert capped.loc[3, "kept"] == 0
    assert (capped["n_dups"] <= 1).all()


def test_pq_encode_improves_on_init_codebook(ray_session, tmp_path):
    """Lloyd invariant: quantization error under the trained codebook is
    <= error under the init codebook, codes lie in [0, k), and every
    (vec, subspace) pair appears exactly once."""
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 64).astype(np.float32)
    sf = _write_embeddings(tmp_path, vecs)

    out = curation.pq_encode(sf, n_sub=8, k=4)
    assert len(out) == 40 * 8
    assert out.code.between(0, 3).all()
    assert not out.duplicated(["vec_id", "subspace"]).any()

    # reconstruct both codebooks the same way the pipeline defines them
    q = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    sub = q.reshape(40, 8, 8)
    cb0 = q[:4].reshape(4, 8, 8).transpose(1, 0, 2)

    def err(cb, codes):
        e = 0
        for s in range(8):
            e += ((sub[:, s, :] - cb[s, codes[:, s]]) ** 2).sum()
        return e

    def assign(cb):
        d2 = ((sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        return np.argmin(d2, axis=2)

    c0 = assign(cb0)
    cb1 = cb0.copy()
    for s in range(8):
        for c in range(4):
            m = c0[:, s] == c
            if m.sum():
                cb1[s, c] = np.floor_divide(sub[m, s, :].sum(axis=0), m.sum())
    codes = (
        out.pivot(index="vec_id", columns="subspace", values="code")
        .to_numpy()
    )
    assert (codes == assign(cb1)).all()
    assert err(cb1, codes) <= err(cb0, c0)
