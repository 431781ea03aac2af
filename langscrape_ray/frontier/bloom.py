"""Vectorized Bloom filter over 64-bit keys (numpy bit array).

New design (SURVEY.md §2.3 T9 / §7): a cheap per-partition pre-filter in
front of the authoritative cuckoo-filter shards.  A bloom "no" is definitive
(definitely unseen); a bloom "maybe" falls through to the exact check.

Deterministic double hashing: position_i = (h1 + i*h2) mod m with h1/h2
derived from the key by fixed 64-bit mixers (no RNG, no wall clock), so a
filter rebuilt from the same key stream is bit-identical — required for
checkpoint/resume parity.
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(keys: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64-style avalanche over a uint64 array."""
    x = (keys + np.uint64(seed)) & _MASK
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """m-bit bloom with k probes; add/contains are vectorized over arrays."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, int(capacity))
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2))
        self.m = max(64, m)
        self.k = max(1, int(round((self.m / capacity) * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        h1 = _mix(keys, 0x9E3779B97F4A7C15)
        h2 = _mix(keys, 0xC2B2AE3D27D4EB4F) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)  # (k, n)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vector of bool: True = maybe seen, False = definitely unseen."""
        pos = self._positions(keys)  # (k, n)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    # -- serialization for checkpoint manifests ------------------------
    def state(self) -> dict:
        return {"m": self.m, "k": self.k, "bits": self.bits.copy()}

    @classmethod
    def from_state(cls, state: dict) -> "BloomFilter":
        obj = cls.__new__(cls)
        obj.m = int(state["m"])
        obj.k = int(state["k"])
        obj.bits = np.asarray(state["bits"], dtype=np.uint64).copy()
        return obj
