"""Gates for the fastText-style distributed quality classifier (X75).

Rows-only op (iterative float training has no SQL analog), so correctness
is pytest-gated: end-to-end accuracy on the planted-spam task, exact
gradient parity between the distributed fold and single-process numpy,
and bit-exact training determinism.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from langscrape_ray.pipelines.classifier import (
    DIM,
    _augment,
    _featurize,
    _grad_partial,
    _scores,
    quality_classifier,
    train_lr,
)

SF = "/root/testdata/sf0.001"


def _toy_table(n=120):
    texts = [
        ("alpha beta gamma " * 6 + "spamword junkword")
        if i % 3 == 0
        else ("delta epsilon zeta eta " * 5)
        for i in range(n)
    ]
    labels = [1.0 if i % 3 == 0 else 0.0 for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "label": pa.array(labels, pa.float64()),
        }
    )


def test_classifier_end_to_end(ray_session):
    df = quality_classifier(SF)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(df) == n_docs
    assert list(df.columns) == ["doc_id", "label", "score_e6", "pred"]
    acc = (df["pred"] == df["label"]).mean()
    assert acc >= 0.9, f"planted-spam accuracy {acc}"
    # both classes must actually be predicted (no always-one-class model)
    assert df["pred"].sum() > 0
    assert (df["pred"] == 0).sum() > 0


def test_planted_separable_trains_to_perfect(ray_session):
    ds = rd.from_arrow(_toy_table()).repartition(4)
    w = train_lr(ds, dim=DIM, epochs=20)
    t = _toy_table()
    feats = _featurize(t["text"].to_pylist(), DIM, {})
    y = np.asarray(t["label"].to_pylist())
    acc = ((_scores(feats, w) > 0).astype(float) == y).mean()
    assert acc == 1.0


def test_gradient_parity_distributed_vs_numpy(ray_session):
    """One distributed epoch from w=0 must equal the single-process
    full-batch numpy step: partials are float64 sums folded in sorted
    order, so parity holds to ulp-level tolerance."""
    t = _toy_table(80)
    ds = rd.from_arrow(t).repartition(5)
    lr, l2 = 4.0, 1e-6
    w_dist = train_lr(ds, dim=DIM, epochs=1, lr=lr, l2=l2)

    feats = _featurize(t["text"].to_pylist(), DIM, {})
    y = np.asarray(t["label"].to_pylist())
    g = _grad_partial(feats, y, np.zeros(DIM + 1))
    grad = g[: DIM + 1] / g[DIM + 1]
    w_ref = -lr * grad  # l2 term is zero at w=0
    np.testing.assert_allclose(w_dist, w_ref, rtol=0, atol=1e-12)


def test_training_determinism(ray_session):
    ds1 = rd.from_arrow(_toy_table()).repartition(4)
    ds2 = rd.from_arrow(_toy_table()).repartition(4)
    w1 = train_lr(ds1, dim=DIM, epochs=5)
    w2 = train_lr(ds2, dim=DIM, epochs=5)
    assert np.array_equal(w1, w2), "training must be bit-deterministic"


def test_augment_deterministic_and_balanced():
    t = pa.table(
        {
            "doc_id": pa.array(list(range(1000)), pa.int64()),
            "text": pa.array(["plain text"] * 1000, pa.string()),
        }
    )
    a1, a2 = _augment(t), _augment(t)
    assert a1.equals(a2)
    frac = np.mean(a1["label"].to_numpy(zero_copy_only=False))
    assert 0.1 < frac < 0.3  # md5 1/5 selection
    spam_rows = [
        txt for txt, lab in zip(a1["text"].to_pylist(),
                                a1["label"].to_pylist()) if lab == 1.0
    ]
    assert all("click" in s or "casino" in s or "buy" in s or "free" in s
               or "prize" in s or "deal" in s or "winner" in s
               or "bonus" in s or "offer" in s or "subscribe" in s
               or "here" in s or "now" in s for s in spam_rows)
