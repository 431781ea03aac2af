"""Gates for content-defined chunking dedup (X76).

Rows-only op (chunk boundaries have no SQL analog), so correctness is
pytest-gated: size bounds, exact reconstruction, determinism, the
shift-resistance property that is CDC's whole reason to exist (an
insertion re-synchronizes at the next content cut, where fixed-size
blocks lose all downstream alignment), and the pipeline-level version
of the same differential.
"""

import numpy as np
import pytest

from langscrape_ray.pipelines.cdc import (
    cdc_boundaries,
    cdc_chunks,
    cdc_dedup,
    fixed_chunks,
)

SF = "/root/testdata/sf0.001"


def _rand_bytes(n, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, n, dtype=np.uint8
    ).tobytes()


def test_boundaries_size_bounds_and_reconstruction():
    data = _rand_bytes(20_000)
    cuts = cdc_boundaries(data)
    assert cuts[-1] == len(data)
    sizes = np.diff([0] + cuts)
    assert all(64 <= s <= 1024 for s in sizes[:-1])
    assert sizes[-1] <= 1024
    assert b"".join(
        data[a:b] for a, b in zip([0] + cuts[:-1], cuts)
    ) == data


def test_boundaries_edge_cases():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"abc") == [3]
    assert cdc_chunks(b"") == []
    # exactly max_size with no candidate: one forced full chunk
    flat = bytes(1024)
    cuts = cdc_boundaries(flat)
    assert cuts[-1] == 1024
    assert all(s <= 1024 for s in np.diff([0] + cuts))


def test_chunking_deterministic():
    data = _rand_bytes(10_000, seed=3)
    assert cdc_chunks(data) == cdc_chunks(data)


def test_shift_resistance_vs_fixed():
    """Insert 13 bytes mid-stream: CDC must retain almost every chunk
    hash; fixed-size chunking must lose most past the insertion."""
    data = _rand_bytes(50_000)
    edited = data[:20_000] + b"INSERTED_BYTES" + data[20_000:]
    h1 = {h for h, _ in cdc_chunks(data)}
    h2 = {h for h, _ in cdc_chunks(edited)}
    cdc_retained = len(h1 & h2) / len(h1)
    f1 = {h for h, _ in fixed_chunks(data)}
    f2 = {h for h, _ in fixed_chunks(edited)}
    fixed_retained = len(f1 & f2) / len(f1)
    assert cdc_retained > 0.9, cdc_retained
    assert fixed_retained < 0.5, fixed_retained
    assert cdc_retained > fixed_retained + 0.4


def test_min_size_suppresses_early_candidates():
    data = _rand_bytes(5_000, seed=11)
    cuts = cdc_boundaries(data, min_size=500, avg_bits=4, max_size=2000)
    sizes = np.diff([0] + cuts)
    assert all(s >= 500 for s in sizes[:-1])
    assert all(s <= 2000 for s in sizes)


def test_cdc_dedup_pipeline(ray_session):
    df = cdc_dedup(SF)
    assert list(df.columns) == [
        "source", "n_chunks", "n_unique_chunks", "total_bytes",
        "unique_bytes", "dedup_ratio_e6",
    ]
    assert (df["n_unique_chunks"] <= df["n_chunks"]).all()
    assert (df["unique_bytes"] <= df["total_bytes"]).all()
    # two snapshots with a small edit: substantial chunk-level dedup
    overall = (
        (df["total_bytes"].sum() - df["unique_bytes"].sum())
        / df["total_bytes"].sum()
    )
    assert overall > 0.15, overall
    # the same workload through fixed-size chunks dedups measurably less
    dff = cdc_dedup(SF, chunker=lambda b: fixed_chunks(b, 64))
    fixed_overall = (
        (dff["total_bytes"].sum() - dff["unique_bytes"].sum())
        / dff["total_bytes"].sum()
    )
    assert overall > fixed_overall, (overall, fixed_overall)


def test_cdc_dedup_deterministic(ray_session):
    a = cdc_dedup(SF)
    b = cdc_dedup(SF)
    assert a.equals(b)
