"""Regenerate the committed vendored BPE merge table
(langscrape_ray/kernel/data/bpe_merges_vendored.tsv) from the
deterministic sf0.001 documents corpus.

Usage: python scripts/gen_bpe_table.py [n_merges] [sf_dir]
"""
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langscrape_ray.kernel.bpe import (  # noqa: E402
    VENDORED_TABLE,
    save_merge_table,
    train_bpe_merges,
)

n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 192
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

texts = pq.read_table(
    f"{sf_dir}/documents.parquet", columns=["text"]
)["text"].to_pylist()
merges = train_bpe_merges(texts, n_merges)
os.makedirs(os.path.dirname(VENDORED_TABLE), exist_ok=True)
save_merge_table(merges, VENDORED_TABLE)
print(f"wrote {len(merges)} merges to {VENDORED_TABLE}")
