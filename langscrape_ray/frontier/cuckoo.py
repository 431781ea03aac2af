"""Cuckoo filter over 64-bit keys — the authoritative-ish URL-seen membership
structure (supports delete, unlike bloom), serializable for checkpoints.

New design (SURVEY.md §2.3 T9, BASELINE.json north_star: "sharded
cuckoo-filter URL-seen set (with bloom pre-filter) keyed by canonicalized URL
hash").  One CuckooFilter instance backs one shard actor; shard =
hash(host) % num_shards so a host's URLs always hit the same shard.

Standard 2-bucket cuckoo filter (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014): 16-bit fingerprints, 4 slots per bucket,
partner bucket = bucket XOR hash(fingerprint).  Deterministic eviction order
(slot 0 evicted first, no RNG) so rebuilds from the same insertion stream are
bit-identical.  On overflow the filter sets ``saturated`` and the caller
must fall back to exact dedup (groupby(url_hash).first) — never silently
drop membership info.
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


def _mix64(x: int, seed: int) -> int:
    x = (x + seed) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class CuckooFilter:
    def __init__(self, capacity: int):
        capacity = max(64, int(capacity))
        nb = 1
        while nb * _SLOTS < capacity * 1.06:  # ~95% max load factor headroom
            nb <<= 1
        self.num_buckets = nb
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.saturated = False

    def _fp_and_buckets(self, key: int):
        h = _mix64(int(key), 0x6C62272E07BB0142)
        fp = (h & 0xFFFF) or 1  # fingerprint 0 means empty slot
        b1 = (h >> 16) & (self.num_buckets - 1)
        b2 = (b1 ^ _mix64(fp, 0x27220A95FE2A96AF)) & (self.num_buckets - 1)
        return fp, b1, b2

    def contains(self, key: int) -> bool:
        fp, b1, b2 = self._fp_and_buckets(key)
        return bool((self.table[b1] == fp).any() or (self.table[b2] == fp).any())

    def add(self, key: int) -> bool:
        """Insert; True on success, False (and saturated=True) on overflow.
        Idempotence is the caller's job (check contains first) — cuckoo
        filters store duplicates otherwise."""
        fp, b1, b2 = self._fp_and_buckets(key)
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # deterministic eviction: always kick slot 0 of b1's chain
        b, cur = b1, fp
        for _ in range(_MAX_KICKS):
            row = self.table[b]
            cur, row[0] = int(row[0]), cur
            b = (b ^ _mix64(cur, 0x27220A95FE2A96AF)) & (self.num_buckets - 1)
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return True
        self.saturated = True
        return False

    def check_and_add(self, key: int) -> bool:
        """True if key was already present; else inserts and returns False."""
        if self.contains(key):
            return True
        self.add(key)
        return False

    def delete(self, key: int) -> bool:
        fp, b1, b2 = self._fp_and_buckets(key)
        for b in (b1, b2):
            idx = np.nonzero(self.table[b] == fp)[0]
            if idx.size:
                self.table[b][idx[0]] = 0
                self.count -= 1
                return True
        return False

    # -- serialization for checkpoint manifests ------------------------
    def state(self) -> dict:
        return {
            "num_buckets": self.num_buckets,
            "table": self.table.copy(),
            "count": self.count,
            "saturated": self.saturated,
        }

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.num_buckets = int(state["num_buckets"])
        obj.table = np.asarray(state["table"], dtype=np.uint16).copy()
        obj.count = int(state["count"])
        obj.saturated = bool(state["saturated"])
        return obj
