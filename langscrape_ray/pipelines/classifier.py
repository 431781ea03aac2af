"""fastText-style linear quality classifier, trained distributed.

The production shape this implements: the CCNet / LLaMA-1 pre-training
pipelines gate web documents with a linear classifier over hashed
bag-of-n-gram features (fastText; Joulin et al. 2016, "Bag of Tricks for
Efficient Text Classification") trained to separate a trusted corpus
(Wikipedia) from raw crawl.  The reference repo has no analog — this is
engine surface a training-data pipeline needs (SURVEY §2.12).

Design (everything derives from the public fastText / logistic-regression
formulation):

- **Features**: hashed unigram + bigram counts into ``dim`` buckets
  (hashing trick), md5-folded so every engine / process / run maps a token
  to the same bucket (no Python ``hash()``), L1-normalized per document.
- **Training**: full-batch logistic regression via gradient descent.  Each
  epoch is ONE ``map_batches`` pass: every block emits a mergeable partial
  (sum of per-doc gradients, float64[dim+1] blob) keyed by its min doc_id;
  partials pre-reduce through a bounded ``groupby(fold).map_groups`` sum
  (``n_folds`` rows reach the driver, 64 x (dim+1) x 8 B — NOT
  corpus-order, not even block-order), the driver folds them in sorted
  order and updates the broadcast weights.  The corpus itself never
  moves; the per-epoch exchange is blocks x (dim+1) x 8 B.
- **Scoring**: stateless ``map_batches`` with the final weights shipped
  once via ``ray.put`` and fetched in the actor ``__init__``.
- **Determinism**: md5 feature hashing + sorted partial folds give
  bit-identical weights for a fixed block partition (pytest-gated); the
  distributed per-epoch gradient equals the single-process numpy gradient
  to float64 ulp (parity-gated).

At 100 TB: the model is dim x 8 B (0.5 MB at 2^16) — broadcast-cheap;
epochs switch from full-batch to a deterministic md5-sampled minibatch per
epoch (the ``sample_mod`` knob) so each epoch reads a corpus fraction; the
fold pre-reduce keeps the driver merge at n_folds rows regardless of
block count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


DIM = 1 << 16
N_FOLDS = 64


def _bucket(token: str, dim: int) -> int:
    """md5-folded feature bucket — the split_assign determinism contract."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % dim


def _featurize(texts, dim: int, memo: dict):
    """Per-doc (bucket_idx, l1_count) sparse features: hashed unigrams +
    bigrams over ASCII-whitespace tokens (the gopher_quality tokenizer
    rule).  ``memo`` caches token->bucket across calls (per-actor)."""
    out = []
    for txt in texts:
        toks = txt.split()
        grams = toks + [a + "\x1f" + b for a, b in zip(toks, toks[1:])]
        if not grams:
            out.append((np.empty(0, np.int64), np.empty(0, np.float64)))
            continue
        idx = np.empty(len(grams), dtype=np.int64)
        for i, g in enumerate(grams):
            b = memo.get(g)
            if b is None:
                b = _bucket(g, dim)
                memo[g] = b
            idx[i] = b
        uniq = np.unique(idx)
        # binary presence features: a spam marker counts the same in a
        # 50-token doc and a 5,000-token doc (L1-normalized counts dilute
        # rare strong features by document length)
        out.append((uniq, np.ones(uniq.size, dtype=np.float64)))
    return out


def _scores(feats, w: np.ndarray) -> np.ndarray:
    s = np.full(len(feats), w[-1], dtype=np.float64)  # bias
    for i, (idx, val) in enumerate(feats):
        if idx.size:
            s[i] += float(w[idx] @ val)
    return s


def _grad_partial(feats, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Sum over docs of r_d * x_d (r = sigmoid(s) - y), plus d/d_bias and
    the doc count in the last two slots: float64[dim + 2]."""
    dim = w.size - 1
    g = np.zeros(dim + 2, dtype=np.float64)
    s = _scores(feats, w)
    r = 1.0 / (1.0 + np.exp(-s)) - y
    for i, (idx, val) in enumerate(feats):
        if idx.size:
            np.add.at(g, idx, r[i] * val)
    g[dim] = r.sum()  # bias gradient
    g[dim + 1] = len(feats)  # doc count
    return g


def _label_en(langs) -> np.ndarray:
    return np.array([1.0 if l == "en" else 0.0 for l in langs])


# deterministic spam-boilerplate augmentation (the pii_scan fixture
# pattern): the synthetic documents' language classes are near-
# indistinguishable by construction (all langs share one token pool), so
# the classifier's end-to-end gate instead detects PLANTED spam — the
# actual production task (fastText gates filter boilerplate/spam), made
# learnable and doc_id-deterministic so every run and engine agrees.
_SPAM = ["click", "here", "buy", "now", "free", "bonus", "casino",
         "winner", "prize", "subscribe", "deal", "offer"]


def _augment(t: pa.Table) -> pa.Table:
    texts, labels = [], []
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        h = int(hashlib.md5(f"spam:{did}".encode()).hexdigest()[:8], 16)
        if h % 5 == 0:
            rot = h % len(_SPAM)
            phrase = " ".join((_SPAM[rot:] + _SPAM[:rot])[:8])
            texts.append(txt + " " + phrase + " " + phrase)
            labels.append(1.0)
        else:
            texts.append(txt)
            labels.append(0.0)
    out = t.drop_columns(["text"])
    out = out.append_column("text", pa.array(texts, pa.string()))
    return out.append_column("label", pa.array(labels, pa.float64()))


@ray.remote(num_cpus=1)
class _GradShard:
    """Persistent gradient shard for iterative training: parses its
    feature slice ONCE in __init__ and answers one gradient RPC per
    epoch — no Dataset launch, no shuffle, no re-featurize inside the
    epoch loop (the data-parallel parameter-fold layout every
    distributed trainer uses on a static dataset)."""

    def __init__(self, shard_ds, label_col: str):
        t = shard_ds.to_arrow_refs()
        tables = [pa.concat_tables([ray.get(r) for r in t])] if t else []
        tbl = tables[0] if tables else None
        self.feats = []
        self.y = np.empty(0, dtype=np.float64)
        if tbl is not None and len(tbl):
            # fixed doc_id order: the per-shard float64 sum is then
            # bit-deterministic across runs
            order = np.argsort(
                np.asarray(tbl["doc_id"].to_pylist(), dtype=np.int64),
                kind="stable",
            )
            idx = tbl["idx"].to_pylist()
            val = tbl["val"].to_pylist()
            self.feats = [
                (np.frombuffer(idx[i], np.int64),
                 np.frombuffer(val[i], np.float64))
                for i in order
            ]
            self.y = np.asarray(
                tbl[label_col].to_pylist(), dtype=np.float64
            )[order]

    def grad(self, w_bytes: bytes) -> bytes:
        w = np.frombuffer(w_bytes, dtype=np.float64)
        return _grad_partial(self.feats, self.y, w).tobytes()


def train_lr(ds: rd.Dataset, dim: int = DIM, epochs: int = 8,
             lr: float = 4.0, l2: float = 1e-6,
             n_folds: int = N_FOLDS, label_col: str = "label") -> np.ndarray:
    """Distributed full-batch logistic regression over (doc_id, text,
    ``label_col``) rows; returns float64[dim + 1] weights (last = bias).

    Shape: featurize ONCE (the md5 gram hashing is ~10x the per-epoch
    gradient cost) into a materialized features dataset, split it across
    ``n_folds``-capped persistent shard actors, then each epoch is ONE
    broadcast + one gradient RPC per shard — no Dataset launch or
    shuffle inside the epoch loop.  Driver merge per epoch is
    n_shards x (dim+2) x 8 B, summed in shard order (bit-deterministic;
    see module docstring).  At memory scales where shards cannot hold
    their feature slice, the same epoch runs as a map_batches pass over
    the features dataset — the layout here is the in-memory
    data-parallel tier."""
    w = np.zeros(dim + 1, dtype=np.float64)

    def featurize_batch(t: pa.Table) -> pa.Table:
        feats = _featurize(t["text"].to_pylist(), dim, {})
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "idx": pa.array(
                    [f[0].tobytes() for f in feats], pa.binary()
                ),
                "val": pa.array(
                    [f[1].tobytes() for f in feats], pa.binary()
                ),
                label_col: t[label_col],
            }
        )

    feat_ds = ds.map_batches(
        featurize_batch, batch_format="pyarrow"
    ).materialize()
    n_rows = feat_ds.count()
    if n_rows == 0:
        return w

    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    n_shards = max(1, min(n_folds, cpus, n_rows))
    shards = feat_ds.split(n_shards)
    actors = [
        _GradShard.remote(s, label_col) for s in shards
    ]
    try:
        for _ in range(epochs):
            w_bytes = w.tobytes()
            blobs = _ray.get([a.grad.remote(w_bytes) for a in actors])
            acc = np.zeros(dim + 2, dtype=np.float64)
            for blob in blobs:  # fixed shard order: deterministic sum
                acc += np.frombuffer(blob, dtype=np.float64)
            n = acc[dim + 1]
            if n == 0:
                break
            grad = acc[: dim + 1] / n
            grad[:dim] += l2 * w[:dim]
            w = w - lr * grad
    finally:
        for a in actors:
            _ray.kill(a)
    return w


class _Scorer:
    """Actor-pool scoring stage: weights fetched ONCE in __init__."""

    def __init__(self, w_ref, dim: int):
        self.w = ray.get(w_ref)
        self.dim = dim
        self.memo: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = _featurize(t["text"].to_pylist(), self.dim, self.memo)
        s = _scores(feats, self.w)
        score_e6 = np.floor(s * 1e6).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "label": pa.compute.cast(t["label"], pa.int64()),
                "score_e6": pa.array(score_e6),
                "pred": pa.array((s > 0).astype(np.int64)),
            }
        )


def quality_classifier(sf_dir: str, dim: int = DIM,
                       epochs: int = 12) -> pd.DataFrame:
    """(doc_id, label, score_e6, pred): the CCNet/LLaMA-style fastText
    quality gate end to end — deterministically plant spam boilerplate on
    an md5-selected 1/5 of documents (see ``_augment``), train the
    hashed-n-gram classifier on the md5 train split (split_assign
    thresholds: fold < 90) to detect it, and score EVERY document.
    Rows-only by design (iterative float training has no SQL analog);
    accuracy, gradient-parity and determinism are pytest-gated
    (tests/test_classifier.py)."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_augment, batch_format="pyarrow")

    def train_split(t: pa.Table) -> pa.Table:
        keep = [
            int(
                hashlib.md5(f"split:{did}".encode()).hexdigest()[:8], 16
            ) % 100 < 90
            for did in t["doc_id"].to_pylist()
        ]
        return t.filter(pa.array(keep))

    w = train_lr(ds.map_batches(train_split, batch_format="pyarrow"),
                 dim=dim, epochs=epochs)
    w_ref = ray.put(w)
    out = (
        ds.map_batches(
            _Scorer,
            fn_constructor_args=(w_ref, dim),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)
