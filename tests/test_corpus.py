"""S8 SWDE-style corpus loader + round-2 dedup/ANN scale-path checks."""

import json

import pytest


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    from langscrape_ray.sources.corpus import write_fixture_corpus

    root = str(tmp_path_factory.mktemp("corpus"))
    write_fixture_corpus(root)
    return root


def test_discovery(corpus_root):
    from langscrape_ray.sources.corpus import list_categories, list_sites

    assert list_categories(corpus_root) == ["auto", "book"]
    sites = list_sites(corpus_root, "auto")
    assert [s for s, _ in sites] == ["autositea", "autositeb"]
    assert all(n == "6" for _, n in sites)


def test_ground_truth_parse_null_and_normalize(corpus_root):
    from langscrape_ray.sources.corpus import parse_site_ground_truth

    gt = parse_site_ground_truth(corpus_root, "auto", "autositea")
    assert len(gt) == 6
    assert gt["0000"]["model"] == ["model-autositea-0"]
    # <NULL> rows drop to empty lists (reference dataset.py:207 filter)
    assert gt["0002"]["price"] == []
    assert gt["0001"]["price"] == ["price-autositea-1"]


def test_load_corpus_join(ray_session, corpus_root):
    from langscrape_ray.sources.corpus import load_corpus

    df = load_corpus(corpus_root).to_pandas()
    assert len(df) == 24  # 2 categories x 2 sites x 6 pages
    assert sorted(df.columns) == [
        "category", "ground_truth", "html", "page_id", "site",
    ]
    row = df[(df.category == "book") & (df.page_id == "0003")].iloc[0]
    g = json.loads(row["ground_truth"])
    assert g["title"] == ["title-" + row["site"] + "-3"]
    assert b"<h2>" in bytes(row["html"])


def test_corpus_feeds_rule_eval(ray_session, corpus_root):
    from langscrape_ray.pipelines.rule_eval import (
        evaluate_candidates,
        rank_best_xpath,
    )
    from langscrape_ray.sources.corpus import load_corpus, with_truth_columns

    ds = load_corpus(corpus_root).filter(lambda r: r["category"] == "auto")
    ds = with_truth_columns(ds, ["model", "price"])
    scored = evaluate_candidates(
        ds,
        {"model": ["//h2", "//p"], "price": ["//span[@class='v2']", "//span"]},
        {"model": "truth_model", "price": "truth_price"},
    )
    best = rank_best_xpath(scored)
    by_field = best.set_index("field_name")
    assert by_field.loc["model", "xpath"] == "//h2"
    assert by_field.loc["model", "f1"] == 1.0
    # class-filtered span beats the bare span (decoy span adds FPs)
    assert by_field.loc["price", "xpath"] == "//span[@class='v2']"


# ---------------------------------------------------------------------------
# round-2 scale-path behaviors
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_embedding_lsh_recall_vs_exact(ray_session):
    from langscrape_ray.pipelines.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    exact = embedding_neardup_pairs(SF)
    approx = embedding_neardup_lsh(SF)
    ep = set(zip(exact.vec_a, exact.vec_b))
    ap = set(zip(approx.vec_a, approx.vec_b))
    assert ap <= ep  # within-bucket verify is exact: no false positives
    recall = len(ep & ap) / max(1, len(ep))
    assert recall >= 0.8, recall


def test_minhash_join_verify_matches_threshold(ray_session):
    from langscrape_ray.pipelines.dedup import minhash_dedup, ngram_jaccard
    import pyarrow.parquet as pq

    out = minhash_dedup(SF)
    assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    lut = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for _, r in out.head(10).iterrows():
        assert r["jaccard"] >= 0.5
        assert round(ngram_jaccard(lut[r["doc_a"]], lut[r["doc_b"]]), 4) == r["jaccard"]


def test_knn_lsh_distributed_tail_shape(ray_session):
    from langscrape_ray.pipelines.similarity import (
        knn_cosine_topk,
        lsh_bucketed_topk,
    )

    approx = lsh_bucketed_topk(SF)
    exact = knn_cosine_topk(SF)
    assert list(approx.columns) == ["query_id", "neighbor_id", "rank"]
    assert approx.groupby("query_id")["rank"].max().le(5).all()
    # multi-table LSH recall@5 against the exact result
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    assert len(e & a) / len(e) >= 0.8
