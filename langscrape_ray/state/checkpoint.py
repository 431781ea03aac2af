"""Per-round checkpoint manifests (SURVEY.md §4 "resumable output layout").

Replaces the reference's global read-modify-write log.json
(/root/reference/scripts/run.py:92-98,
/root/reference/langscrape/nodes/post_processor.py:75-94) — a serialization
point that cannot scale — with per-round directories written atomically:

    <ckpt_dir>/round=NNNN/
        manifest.json      counters, host clocks, lineage (seed hash, policy)
        carryover.parquet  deferred frontier rows entering the next round
        shards.pkl         seen-shard snapshots (bloom+cuckoo[+exact]) state
        _COMPLETE          sentinel written LAST -> round is resumable-from

Resume = load the highest round directory containing _COMPLETE and continue;
an interrupted round is simply re-run from the previous round's state (all
stages are deterministic and seen-set adds are idempotent).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def round_dir(ckpt_dir: str, rnd: int) -> str:
    return os.path.join(ckpt_dir, f"round={rnd:04d}")


def write_round_checkpoint(
    ckpt_dir: str,
    rnd: int,
    manifest: dict,
    carryover: Optional[pa.Table],
    shard_states: Optional[List[dict]],
) -> str:
    d = round_dir(ckpt_dir, rnd)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    if carryover is not None and carryover.num_rows:
        pq.write_table(carryover, os.path.join(tmp, "carryover.parquet"))
    if shard_states is not None:
        with open(os.path.join(tmp, "shards.pkl"), "wb") as f:
            pickle.dump(shard_states, f)
    open(os.path.join(tmp, "_COMPLETE"), "w").close()
    if os.path.isdir(d):
        import shutil

        shutil.rmtree(d)
    os.rename(tmp, d)
    return d


def last_complete_round(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("round="):
            continue
        d = os.path.join(ckpt_dir, name)
        if os.path.exists(os.path.join(d, "_COMPLETE")):
            rnd = int(name.split("=")[1])
            best = rnd if best is None else max(best, rnd)
    return best


def read_round_checkpoint(ckpt_dir: str, rnd: int):
    d = round_dir(ckpt_dir, rnd)
    with open(os.path.join(d, "manifest.json")) as f:
        manifest = json.load(f)
    carry_path = os.path.join(d, "carryover.parquet")
    carryover = pq.read_table(carry_path) if os.path.exists(carry_path) else None
    shards_path = os.path.join(d, "shards.pkl")
    shard_states = None
    if os.path.exists(shards_path):
        with open(shards_path, "rb") as f:
            shard_states = pickle.load(f)
    return manifest, carryover, shard_states
