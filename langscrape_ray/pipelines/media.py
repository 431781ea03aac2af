"""Multimodal metadata pipeline: binary payload -> resize -> decode, oracled.

The image/audio stage classes live in ``stages/multimodal.py``; this module
wires them into a driver-visible query.  Payloads are built deterministically
from ``doc_id`` (the synthetic corpus carries no real media), so the Ray
side exercises the REAL binary encode -> ResizeImageStub -> DecodeImageMeta
path while the DuckDB oracle computes the expected metadata in closed form
from the same doc_id rule — the exact oracle pattern ``table_stats`` uses
for planted tables.  Every arithmetic step (scale, truncation, body-length
cap) is reproduced with FLOOR/LEAST double math so the hash is bit-exact.

Scale notes: payload columns are binary and dominate block size — the
attach stage caps ``batch_size`` so batch x concurrency stays inside the
worker heap; resize/decode are actor pools (state once per actor)."""

from __future__ import annotations

from typing import List

import pyarrow as pa
import ray.data as rd

from langscrape_ray.stages.multimodal import (
    DecodeImageMeta,
    ResizeImageStub,
    make_image_payload,
)

_FMTS = ("png", "jpeg", "webp")


def _payload_params(doc_id: int):
    w = 100 + (doc_id * 7) % 900
    h = 80 + (doc_id * 13) % 700
    return w, h, _FMTS[doc_id % 3]


def attach_payloads(t: pa.Table) -> pa.Table:
    payloads: List[bytes] = []
    for did in t["doc_id"].to_pylist():
        w, h, fmt = _payload_params(did)
        payloads.append(make_image_payload(w, h, fmt, seed=did % 97))
    return pa.table(
        {"doc_id": t["doc_id"], "image": pa.array(payloads, pa.binary())}
    )


def media_meta(sf_dir: str, max_w: int = 256, max_h: int = 256) -> "rd.Dataset":
    """(doc_id, width, height, format, n_bytes, decode_ok): image metadata
    after a bounded-thumbnail resize — the standard normalize step of a
    multimodal ingest pipeline, run over real binary payloads."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        docs.map_batches(attach_payloads, batch_format="pyarrow", batch_size=256)
        .map_batches(
            ResizeImageStub,
            fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
            num_cpus=0.5,  # two light actor pools must co-schedule with the
            # upstream read even on a tiny (4-CPU test) cluster
        )
        .map_batches(
            DecodeImageMeta,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
            num_cpus=0.5,
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": t["width"].cast(pa.int64()),
                "height": t["height"].cast(pa.int64()),
                "format": t["format"],
                "n_bytes": t["n_bytes"].cast(pa.int64()),
                "decode_ok": t["decode_ok"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")
