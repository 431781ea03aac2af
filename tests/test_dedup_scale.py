"""Hot-key guards for the dedup family (the round-3 verdict's two
scale-killers): the jaccard join's DF-ordered positional prefix filter
must keep a planted hot shingle from exploding candidate volume while
staying EXACT, and the minhash LSH bucket cap must bound a degenerate
bucket's pair emission while preserving cluster connectivity."""
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _brute_pairs(texts, threshold, shingle_len=3):
    from langscrape_ray.pipelines.dedup import ngram_jaccard

    out = []
    for a, b in itertools.combinations(range(len(texts)), 2):
        j = ngram_jaccard(texts[a], texts[b], shingle_len)
        if j >= threshold:
            out.append((a, b, round(j, 4)))
    return (
        pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])
        .astype({"doc_a": "int64", "doc_b": "int64"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _mk_corpus(rng, n_unrelated=200, boiler="terms of service apply all rights reserved"):
    """Docs sharing an 8-token boilerplate phrase (hot shingles, DF=n)
    but otherwise unique — the classic crawl hot-shingle shape."""
    texts = []
    for i in range(n_unrelated):
        uniq = " ".join(f"tok{i}x{j}" for j in range(30))
        texts.append(f"{boiler} {uniq}")
    return texts


def test_jaccard_hot_shingle_candidates_bounded(tmp_path, ray_session):
    """A DF=200 boilerplate shingle must NOT produce ~200^2/2 candidate
    pairs: under the DF-ascending prefix order the hot shingles never
    enter any doc's prefix, so candidate volume collapses to ~0."""
    from langscrape_ray.pipelines.dedup import jaccard_candidate_pairs_ds

    rng = np.random.RandomState(7)
    texts = _mk_corpus(rng, n_unrelated=200)
    sf = _write_docs(tmp_path, texts)

    n_cand = jaccard_candidate_pairs_ds(sf, threshold=0.5).count()
    # unguarded self-merge on the 6 hot shingles would emit ~119k pair
    # rows; the prefix filter must keep candidates output-bound
    assert n_cand <= 50, f"hot-shingle candidate blowup: {n_cand} pairs"

    brute = _brute_pairs(texts, 0.5)
    assert brute.empty  # sanity: no true near-dups planted


def test_jaccard_prefix_filter_exactness(tmp_path, ray_session):
    """The prefix filter is a pure pruning step: the join result must
    equal brute force exactly, including boundary-jaccard pairs."""
    from langscrape_ray.pipelines.dedup import jaccard_similarity_join

    rng = np.random.RandomState(42)
    vocab = [f"w{k}" for k in range(50)]
    texts = []
    # random docs + planted near-dup families with overlap straddling 0.5
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, size=20)))
    base = " ".join(f"dup{k}" for k in range(24))
    texts.append(base)
    texts.append(base)  # exact dup (jaccard 1.0)
    texts.append(base + " extra1 extra2 extra3")      # high overlap
    texts.append(" ".join(f"dup{k}" for k in range(12)) + " other "
                 + " ".join(f"z{k}" for k in range(12)))  # partial overlap
    sf = _write_docs(tmp_path, texts)

    got = jaccard_similarity_join(sf, threshold=0.5)
    want = _brute_pairs(texts, 0.5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    assert len(want) >= 2  # the planted family actually exercised the join


def test_jaccard_df_cap_valve(tmp_path, ray_session):
    """df_cap is the explicitly-approximate emergency valve: capping
    below the planted duplicates' shingle DF can only shrink the result
    (never error), and exactness is restored with the cap off."""
    from langscrape_ray.pipelines.dedup import jaccard_similarity_join

    base = " ".join(f"dup{k}" for k in range(20))
    texts = [base, base, base]  # every shingle has DF=3
    sf = _write_docs(tmp_path, texts)

    exact = jaccard_similarity_join(sf, threshold=0.5)
    assert len(exact) == 3  # all 3 pairs at jaccard 1.0
    capped = jaccard_similarity_join(sf, threshold=0.5, df_cap=2)
    assert len(capped) == 0  # all shingles dropped by the valve


def test_minhash_hot_bucket_star_cap(tmp_path, ray_session):
    """80 identical docs put all 80 in every band bucket: capped pair
    emission must be the O(b) star (79 pairs), not b*(b-1)/2 = 3160,
    while keeping the cluster connected for CC-based keep-one dedup."""
    from langscrape_ray.pipelines.dedup import minhash_candidate_pairs_ds

    text = " ".join(f"tpl{k}" for k in range(30))
    sf = _write_docs(tmp_path, [text] * 80)

    pairs = (
        minhash_candidate_pairs_ds(sf, dedup_pairs=True, bucket_cap=16)
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
    )
    assert len(pairs) == 79  # star to the min id, once per distinct pair
    assert (pairs["doc_a"] == 0).all()
    # connectivity: every doc reachable from doc 0
    assert set(pairs["doc_b"]) == set(range(1, 80))


def test_minhash_cap_inactive_below_threshold(tmp_path, ray_session):
    """Buckets at or below the cap still emit the full pair set (the
    cap must not change small-bucket semantics)."""
    from langscrape_ray.pipelines.dedup import minhash_candidate_pairs_ds

    text = " ".join(f"tpl{k}" for k in range(30))
    sf = _write_docs(tmp_path, [text] * 10)

    pairs = (
        minhash_candidate_pairs_ds(sf, dedup_pairs=True, bucket_cap=512)
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
    )
    assert len(pairs) == 45  # full 10*9/2 enumeration


def test_simhash_vectorized_pairs_parity(tmp_path, ray_session):
    """The triu/unpackbits rewrite of the simhash bucket pair loop must
    agree with a direct popcount replay."""
    from langscrape_ray.pipelines.dedup import (
        simhash_neardup_pairs,
        simhash_signatures,
    )

    rng = np.random.RandomState(3)
    vocab = [f"v{k}" for k in range(40)]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(30)]
    base = " ".join(vocab[:25])
    texts += [base, base + " v39", base]  # planted near-identical docs
    sf = _write_docs(tmp_path, texts)

    got = simhash_neardup_pairs(sf, max_hamming=3)
    sigs = simhash_signatures(sf).to_pandas().set_index("doc_id")["simhash"]
    for _, r in got.iterrows():
        d = bin((int(sigs[r["doc_a"]]) ^ int(sigs[r["doc_b"]]))
                & 0xFFFFFFFFFFFFFFFF).count("1")
        assert d == r["hamming"] and d <= 3
    planted = {(len(texts) - 3, len(texts) - 1)}
    assert planted <= set(zip(got["doc_a"], got["doc_b"]))


def test_fuzzy_dedup_keep_best_planted(ray_session, tmp_path):
    """Planted near-dup clusters: keep-best must pick the highest
    (alpha_per_10k, n_chars) member, tie-broken by doc_id; singletons
    always kept; cluster_rep is the component min."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [
        base,                                   # 0: cluster A
        base + " today",                        # 1: cluster A, longer
        base + " today 12345 67890 !!!",        # 2: cluster A, longer but
                                                #    digit-heavy (low alpha)
        "completely different text about quantum flux and tachyon streams",
        base + " today",                        # 4: exact dup of 1
        "another standalone document with its own words entirely here",
    ]
    sf = _write_docs(tmp_path, texts)

    from langscrape_ray.pipelines.dedup import fuzzy_dedup_keep_best

    out = fuzzy_dedup_keep_best(sf, threshold=0.5).to_pandas()
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4, 5]
    by = dict(zip(out["doc_id"], zip(out["cluster_rep"], out["kept"])))
    # docs 0/1/2/4 form one cluster with rep 0
    assert by[0][0] == by[1][0] == by[2][0] == by[4][0] == 0
    # singletons
    assert by[3] == (3, 1) and by[5] == (5, 1)
    # exactly one kept in the cluster
    kept_in_cluster = [d for d in (0, 1, 2, 4) if by[d][1] == 1]
    assert len(kept_in_cluster) == 1
    # alpha dominates: doc 1 (all-alpha, longer than 0, lower doc_id
    # than its exact dup 4) must be the keeper over the digit-heavy 2
    assert kept_in_cluster == [1]


def test_fuzzy_dedup_tier_parity(ray_session, tmp_path):
    """The driver union-find tier and the fully distributed tail
    (local_edge_limit=0 forces it) must emit IDENTICAL
    (doc_id, cluster_rep, kept) rows — the round-4 verdict's tier-parity
    requirement for the CC dedup family."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [
        base,
        base + " today",
        base + " today 12345 67890 !!!",
        "completely different text about quantum flux and tachyon streams",
        base + " today",
        "another standalone document with its own words entirely here",
        "yet another unrelated page about gardens and hedgerows in spring",
    ]
    sf = _write_docs(tmp_path, texts)

    from langscrape_ray.pipelines.dedup import fuzzy_dedup_keep_best

    driver = fuzzy_dedup_keep_best(sf, threshold=0.5).to_pandas()
    dist = fuzzy_dedup_keep_best(
        sf, threshold=0.5, local_edge_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        driver.reset_index(drop=True), dist.reset_index(drop=True)
    )


def test_cc_distributed_chain_log_rounds(ray_session):
    """Planted mega-cluster: a 300-node PATH (diameter 299) — the
    adversarial shape for min-label propagation.  Plain neighbor-min
    needs ~300 rounds; the pointer-doubling tier must (a) label every
    node with the component min and (b) converge in O(log diameter)
    rounds.  Per-round exchange is structurally bounded at O(|E|) (one
    edges-join + one groupby-min + one labels self-join)."""
    import ray.data as rd

    from langscrape_ray.pipelines.dedup import _cc_labels_distributed

    n = 300
    edges = pd.DataFrame(
        {
            "vec_a": np.arange(n - 1, dtype=np.int64),
            "vec_b": np.arange(1, n, dtype=np.int64),
        }
    ).sample(frac=1.0, random_state=7).reset_index(drop=True)
    iter_log = []
    labels = _cc_labels_distributed(
        rd.from_pandas(edges), max_iters=25, iter_log=iter_log
    ).to_pandas()
    assert len(labels) == n
    assert (labels["label"] == 0).all()
    # log-diameter convergence: ceil(log2(300)) == 9; allow fixpoint
    # detection + slack.  Plain propagation would need 299 rounds.
    assert len(iter_log) <= 14, iter_log


def test_minhash_dedup_ds_parity(ray_session, tmp_path):
    """minhash_dedup_ds (pairs never land on the driver: Dataset pair-key
    dedup + co-partitioned join verify) must emit exactly the rows of the
    small-tier minhash_dedup on the same corpus."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [
        base,
        base + " extra",
        base + " extra words on the end of it",
        "completely different text about quantum flux and tachyon streams",
        base + " extra",
        "another standalone document with its own words entirely here",
    ]
    sf = _write_docs(tmp_path, texts)

    from langscrape_ray.pipelines.dedup import minhash_dedup, minhash_dedup_ds

    small = minhash_dedup(sf, threshold=0.5)
    ds = minhash_dedup_ds(sf, threshold=0.5)
    dist = (
        ds.to_pandas()
        .astype({"doc_a": "int64", "doc_b": "int64"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)[["doc_a", "doc_b", "jaccard"]]
        if ds is not None
        else small.iloc[0:0]
    )
    assert len(small) > 0, "fixture produced no near-dup pairs"
    pd.testing.assert_frame_equal(small, dist)
