"""Edge-case brute-force replays for the round-3 training-data operators
(pack_sequences / boilerplate_prune / substring_dedup) on a crafted corpus
with empty documents, single tokens, whole-document duplicates, and
within-document repeats — shapes the synthetic sf fixtures don't contain."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edgedocs")
    texts = [
        "",  # empty doc
        "solo",  # single token
        "a b c d e f g h",  # unique content
        "a b c d e f g h",  # exact whole-doc duplicate of doc 2
        "x y z w x y z w x y z w",  # within-doc repeated span
        "p q r s t u v",  # partial overlap below
        "zz p q r s t yy",  # shares the 'p q r s' window with doc 5
        "one two",  # shorter than the gram width
        "hot gram here now",  # boilerplate candidates (repeated 6x below)
        "hot gram here now",
        "hot gram here now",
        "hot gram here now",
        "hot gram here now",
        "hot gram here now",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(
                [f"src{i % 3}" for i in range(len(texts))], pa.string()
            ),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _texts(edge_dir):
    return (
        pq.read_table(f"{edge_dir}/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")["text"]
        .tolist()
    )


def test_pack_sequences_edges(ray_session, edge_dir):
    from langscrape_ray.pipelines.textstats import pack_sequences

    out = (
        pack_sequences(edge_dir, seq_len=5, bucket_width=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = [len(re.findall(r"\S+", t)) for t in _texts(edge_dir)]
    start = np.concatenate(([0], np.cumsum(n[:-1]))).astype(int)
    assert out["n_tokens"].tolist() == n
    assert out["tok_start"].tolist() == start.tolist()
    # empty doc occupies exactly its boundary sequence
    span = np.maximum(n, 1)
    assert out["seq_first"].tolist() == (start // 5).tolist()
    assert out["seq_last"].tolist() == ((start + span - 1) // 5).tolist()
    empty = out[out["n_tokens"] == 0]
    assert (empty["seq_first"] == empty["seq_last"]).all()


def _brute_prune(texts, n, hot):
    """Reference masking: drop tokens covered by any window in `hot`."""
    cleans, removed = [], []
    for text in texts:
        w = text.split(" ")
        drop = [False] * len(w)
        for i in range(len(w) - n + 1):
            if " ".join(w[i : i + n]) in hot:
                for j in range(i, i + n):
                    drop[j] = True
        kept = [tok for tok, d in zip(w, drop) if not d]
        cleans.append(" ".join(kept))
        removed.append(len(w) - len(kept))
    return cleans, removed


def test_boilerplate_prune_edges(ray_session, edge_dir):
    from collections import Counter

    from langscrape_ray.pipelines.textstats import boilerplate_prune

    n, min_docs = 3, 5
    texts = _texts(edge_dir)
    df = Counter()
    for text in texts:
        w = text.split(" ")
        df.update({" ".join(w[i : i + n]) for i in range(len(w) - n + 1)})
    hot = {g for g, c in df.items() if c >= min_docs}
    assert hot  # the 6x-repeated doc guarantees hot grams
    want_clean, want_removed = _brute_prune(texts, n, hot)

    out = (
        boilerplate_prune(edge_dir, n=n, min_docs=min_docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"].tolist() == want_clean
    assert out["n_removed"].tolist() == want_removed
    # ALL copies of a hot gram are removed (cleaning, not dedup)
    assert out.loc[8, "clean_text"] == "" and out.loc[13, "clean_text"] == ""


def test_substring_dedup_edges(ray_session, edge_dir):
    from langscrape_ray.pipelines.dedup import substring_dedup

    n = 4
    texts = _texts(edge_dir)
    # brute force: first occurrence (min (doc, pos)) of each window wins
    first = {}
    for did, text in enumerate(texts):
        w = text.split(" ")
        for i in range(len(w) - n + 1):
            first.setdefault(" ".join(w[i : i + n]), (did, i))
    cleans, removed = [], []
    for did, text in enumerate(texts):
        w = text.split(" ")
        drop = [False] * len(w)
        for i in range(len(w) - n + 1):
            if first[" ".join(w[i : i + n])] != (did, i):
                for j in range(i, i + n):
                    drop[j] = True
        kept = [tok for tok, d in zip(w, drop) if not d]
        cleans.append(" ".join(kept))
        removed.append(len(w) - len(kept))

    out = (
        substring_dedup(edge_dir, n=n)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"].tolist() == cleans
    assert out["n_removed"].tolist() == removed
    # dedup semantics: the FIRST whole-doc copy survives, the second empties
    assert out.loc[2, "clean_text"] == texts[2]
    assert out.loc[3, "clean_text"] == ""
    # within-doc repeat: the first span stays, later repeats go
    assert out.loc[4, "n_removed"] > 0
    # docs shorter than the window are untouched
    assert out.loc[7, "clean_text"] == texts[7]
    assert out.loc[1, "clean_text"] == texts[1]
    # the 6x boilerplate doc keeps exactly ONE copy (dedup, not cleaning)
    kept_copies = [
        out.loc[i, "clean_text"] for i in range(8, 14) if out.loc[i, "clean_text"]
    ]
    assert kept_copies == ["hot gram here now"]


def test_compression_ratio_replay(ray_session, edge_dir):
    """Distributed output == single-process zlib replay; repetitive text
    compresses materially better than unique text."""
    import zlib

    from langscrape_ray.pipelines.textstats import compression_ratio

    out = (
        compression_ratio(edge_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    texts = _texts(edge_dir)
    raw = [len(t.encode()) for t in texts]
    comp = [len(zlib.compress(t.encode(), 6)) for t in texts]
    assert out["raw_len"].tolist() == raw
    assert out["zlib_len"].tolist() == comp
    assert out["ratio_e4"].tolist() == [
        c * 10000 // max(r, 1) for r, c in zip(raw, comp)
    ]
    # doc 4 is a 3x-repeated span; doc 2 is unique text of similar length
    assert out.loc[4, "ratio_e4"] < out.loc[2, "ratio_e4"]


def test_gopher_quality_keep_classes(ray_session, tmp_path):
    """Both keep classes of the Gopher gate on crafted docs: a passing
    document (enough words, 2+ stop words, sane ratios) and failures for
    each individual rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from langscrape_ray.pipelines.textstats import gopher_quality

    good = ("the quick brown fox jumps over lazy dogs and keeps " * 6).strip()
    docs = {
        0: good,                                    # keep
        1: "short of the",                          # < 50 words
        2: ("aaaaaaaaaaaaaaaaaaaaaa " * 60) + "the and",  # mean len > 10
        3: "\n".join(["- bullet the and word list item here ok"] * 50),  # bullets
        4: good.replace("dogs", "#dogs#"),          # symbols over 10%
        5: ("word " * 60) + "plain",                # no 2 stop words
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
            "n_chars": pa.array([len(docs[k]) for k in sorted(docs)], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        gopher_quality(str(tmp_path)).to_pandas().sort_values("doc_id")
    )
    assert out["keep"].tolist() == [1, 0, 0, 0, 0, 0]
    # rule attribution: doc 3 fails ONLY the bullet rule
    r3 = out[out.doc_id == 3].iloc[0]
    assert r3.n_bullet_lines == r3.n_lines
    assert r3.n_stop >= 2 and 50 <= r3.n_words <= 100000
