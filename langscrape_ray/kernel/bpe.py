"""Vendored-table BPE tokenizer: the tiktoken-parity token counter for
M22 token budgeting and F7 fragment weighting (reference
feilian/fragments_detection.py:29, statistical_analysis.py:31 count with
tiktoken; that package and its model files are unavailable here, so the
engine ships its OWN committed merge table, trained by the repo's
Sennrich BPE trainer — pipelines/curation.py:bpe_merges — over the
deterministic sf0.001 documents corpus).

The encoder applies merges SEQUENTIALLY in rank order with left-to-right
non-overlapping rewrites — byte-for-byte the trainer's own rewrite rule,
so ``encode_word`` is the exact inverse view of training (asserted in
tests/test_bpe.py by replaying the trainer).  Per-word results are
memoized: web text repeats words heavily, so steady-state counting is a
dict lookup per word.
"""
from __future__ import annotations

import os
import re
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

_WORD_RE = re.compile(r"\S+")

VENDORED_TABLE = os.path.join(
    os.path.dirname(__file__), "data", "bpe_merges_vendored.tsv"
)


def train_bpe_merges(texts: Sequence[str],
                     n_merges: int) -> List[Tuple[int, str, str, int]]:
    """Single-process Sennrich trainer, semantics identical to the
    distributed ``pipelines/curation.py:bpe_merges`` (pair stats weighted
    by word frequency, ties to the lexicographically smallest pair,
    left-to-right non-overlapping rewrite).  Used to GENERATE the
    committed table (scripts/gen_bpe_table.py) and as the parity
    reference in tests."""
    wf: Dict[str, int] = {}
    for tx in texts:
        for w in tx.split(" "):
            wf[w] = wf.get(w, 0) + 1
    vocab: Dict[Tuple[str, ...], int] = {
        tuple(list(w) + ["</w>"]): f for w, f in wf.items()
    }
    out: List[Tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        stats: Dict[Tuple[str, str], int] = {}
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
        new: Dict[Tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            merged = _merge_once(syms, left, right)
            new[merged] = new.get(merged, 0) + f
        vocab = new
    return out


def _merge_once(syms: Tuple[str, ...], left: str,
                right: str) -> Tuple[str, ...]:
    """One left-to-right non-overlapping rewrite of (left, right) ->
    left+right — the trainer's rewrite rule."""
    res: List[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return tuple(res)


class BPEEncoder:
    """Applies a trained merge list; one instance per actor (stateful
    map_batches stages build it in ``__init__``, never per batch)."""

    def __init__(self, merges: Sequence[Tuple[str, str]]):
        self.merges: List[Tuple[str, str]] = [(l, r) for l, r in merges]
        # per-word memo: web text is Zipfian, the hot words hit the dict
        self._encode_word = lru_cache(maxsize=1 << 16)(self._encode_word_raw)

    def _encode_word_raw(self, word: str) -> Tuple[str, ...]:
        syms: Tuple[str, ...] = tuple(list(word) + ["</w>"])
        for left, right in self.merges:
            if len(syms) < 2:
                break
            # cheap pre-check: scan-rewrite only when both symbols occur
            if left in syms and right in syms:
                syms = _merge_once(syms, left, right)
        return syms

    def encode_word(self, word: str) -> Tuple[str, ...]:
        return self._encode_word(word)

    def encode(self, text: str) -> List[str]:
        out: List[str] = []
        for w in _WORD_RE.findall(text):
            out.extend(self._encode_word(w))
        return out

    def count_tokens(self, text: str) -> int:
        return sum(len(self._encode_word(w)) for w in _WORD_RE.findall(text))


def save_merge_table(merges: Sequence[Tuple[int, str, str, int]],
                     path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("# rank\tleft\tright\tpair_count — trained by "
                "scripts/gen_bpe_table.py (kernel.bpe.train_bpe_merges)\n")
        for rank, left, right, count in merges:
            f.write(f"{rank}\t{left}\t{right}\t{count}\n")


def load_merge_table(path: str) -> List[Tuple[str, str]]:
    merges: List[Tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            merges.append((parts[1], parts[2]))
    return merges


_VENDORED: List[BPEEncoder] = []


def vendored_encoder() -> BPEEncoder:
    """Process-wide singleton over the committed table (driver-side use;
    distributed stages should construct their own in actor __init__)."""
    if not _VENDORED:
        _VENDORED.append(BPEEncoder(load_merge_table(VENDORED_TABLE)))
    return _VENDORED[0]


def bpe_token_count(text: str) -> int:
    """Drop-in ``token_count`` callable for kernel/treeops.py (M22/F7):
    subword count under the vendored merge table."""
    return vendored_encoder().count_tokens(text)
