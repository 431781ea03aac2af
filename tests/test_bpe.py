"""Vendored-BPE token counter (kernel/bpe.py): encoder/trainer parity,
the committed table, and the M22/F7 wiring (token_count_vendored query,
token_histogram counter="bpe", fragment mining with the BPE counter)."""
import pyarrow.parquet as pq
import pytest

from langscrape_ray.kernel.bpe import (
    VENDORED_TABLE,
    BPEEncoder,
    bpe_token_count,
    load_merge_table,
    train_bpe_merges,
    vendored_encoder,
)

SF = "/root/testdata/sf0.001"


def _train_corpus():
    return [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a mat and a hat",
        "hats and mats for cats",
    ]


def test_encoder_is_trainer_inverse():
    """Applying the merge list sequentially (the trainer's own rewrite
    rule) must reproduce the trainer's final vocabulary exactly."""
    texts = _train_corpus()
    merges = train_bpe_merges(texts, 20)
    enc = BPEEncoder([(l, r) for _, l, r, _ in merges])

    # replay: run the trainer's rewrites over each distinct word directly
    for tx in texts:
        for w in tx.split(" "):
            syms = tuple(list(w) + ["</w>"])
            for _, left, right, _ in merges:
                res, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = tuple(res)
            assert enc.encode_word(w) == syms


def test_encode_roundtrip_and_monotone_counts():
    texts = _train_corpus()
    merges = train_bpe_merges(texts, 20)
    enc_full = BPEEncoder([(l, r) for _, l, r, _ in merges])
    enc_none = BPEEncoder([])
    for tx in texts:
        # lossless: concatenated pieces reconstruct the word + </w> marker
        for w in tx.split(" "):
            assert "".join(enc_full.encode_word(w)) == w + "</w>"
        # merges only ever shrink the piece count
        assert enc_full.count_tokens(tx) <= enc_none.count_tokens(tx)
        # zero merges degenerate to chars + one </w> per word
        n_chars = sum(len(w) + 1 for w in tx.split(" "))
        assert enc_none.count_tokens(tx) == n_chars


def test_vendored_table_loads_and_counts():
    merges = load_merge_table(VENDORED_TABLE)
    assert len(merges) >= 50  # committed table is non-trivial
    enc = vendored_encoder()
    sample = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()[:20]
    for tx in sample:
        n = bpe_token_count(tx)
        assert n == enc.count_tokens(tx) > 0
        # subword count is bounded by character count and at least the
        # word count (each word emits >= 1 piece)
        words = tx.split()
        assert len(words) <= n <= sum(len(w) + 1 for w in words)


def test_token_count_vendored_query_replay(ray_session):
    """The Ray query must equal a driver-side single-process replay."""
    from langscrape_ray.pipelines.textstats import token_count_vendored

    got = (
        token_count_vendored(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    enc = vendored_encoder()
    assert got["doc_id"].tolist() == docs["doc_id"].tolist()
    assert got["n_bpe_tokens"].tolist() == [
        enc.count_tokens(x) for x in docs["text"]
    ]


def test_token_histogram_bpe_counter(ray_session):
    """token_histogram(counter="bpe") must match the replayed histogram;
    the default ws histogram is unchanged (still the SQL-oracled shape)."""
    from langscrape_ray.pipelines.textstats import token_histogram

    got = token_histogram(SF, bin_size=32, counter="bpe")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    enc = vendored_encoder()
    bins: dict = {}
    for tx in docs:
        n = enc.count_tokens(tx)
        b = n // 32 * 32
        cnt, tot = bins.get(b, (0, 0))
        bins[b] = (cnt + 1, tot + n)
    want = sorted(
        (b, c, t * 100 // c) for b, (c, t) in bins.items()
    )
    assert list(
        zip(got["token_bin"], got["n_docs"], got["avg_tokens_e2"])
    ) == want


def test_fragment_mining_with_bpe_counter():
    """F7 fragment mining accepts the BPE counter and stays deterministic
    (reference counts fragments with tiktoken; same plumbing here)."""
    from langscrape_ray.kernel.dom import parse_html
    from langscrape_ray.kernel.treeops import extract_fragments_by_weight

    html = (
        "<html><body>"
        + "".join(
            f"<div class='c{i}'><p>{'word ' * (20 + i * 5)}</p></div>"
            for i in range(6)
        )
        + "</body></html>"
    )
    root = parse_html(html)
    frags_a = extract_fragments_by_weight(
        root, max_fragments=3, max_tokens=400, min_tokens=4,
        token_count=bpe_token_count,
    )
    root2 = parse_html(html)
    frags_b = extract_fragments_by_weight(
        root2, max_fragments=3, max_tokens=400, min_tokens=4,
        token_count=bpe_token_count,
    )
    assert frags_a == frags_b
    assert len(frags_a) >= 1
