"""Cuckoo filter over uint64 keys — the approximate tier of the URL-seen set.

North rule: "bloom/cuckoo URL-seen". This is a standard cuckoo filter
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14,
public paper): 4-slot buckets, 16-bit fingerprints, partial-key cuckoo
hashing where the alternate bucket is ``i ^ hash(fp)``. All bulk
operations are vectorized numpy; the eviction walk is deterministic
(slot choice derived from the fingerprint and kick counter, no RNG), so
filter state is a pure function of the insertion sequence — required
for exact checkpoint/resume parity.

Used inside :class:`job_crawler_ray.stages.seen.SeenShard` as a
*negative cache*: a "definitely not present" answer skips the exact
set probe; a "maybe present" answer falls through to the exact tier, so
false positives never alter crawl semantics (the north rule demands the
reference's exact seen-set). At 10^10-URL scale the exact tier moves to
disk-backed partitions while this filter keeps the hot path in RAM.
"""

from __future__ import annotations

import numpy as np

_u64 = np.uint64
_SLOTS = 4
_MAX_KICKS = 500


def _fp_of(keys: np.ndarray) -> np.ndarray:
    """16-bit fingerprints in [1, 0xFFFF] (0 marks an empty slot)."""
    fp = ((keys >> _u64(48)) ^ (keys & _u64(0xFFFF))).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity * 1.05:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = _u64(n_buckets - 1)
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0

    # -- hashing ------------------------------------------------------------
    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo hashing: alt = i ^ H(fp); H = splitmix-style odd mult
        with np.errstate(over="ignore"):
            h = (fp.astype(_u64) * _u64(0x5BD1E9955BD1E995)) & self.mask
        return (idx.astype(_u64) ^ h).astype(np.int64)

    # -- queries ------------------------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array (may contain false positives)."""
        keys = keys.astype(_u64, copy=False)
        fp = _fp_of(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        return hit

    # -- inserts ------------------------------------------------------------
    def add(self, keys: np.ndarray) -> None:
        """Insert keys (idempotence is the caller's concern).

        Insertion is a scalar walk per key (cross-key bucket collisions
        inside one batch make scattered vector stores unsafe); that is
        fine because adds happen once per epoch over the *released*
        rows only (≤ hosts × budget), while the hot per-frontier-row
        path — :meth:`contains` — is fully vectorized.
        """
        keys = keys.astype(_u64, copy=False)
        fp = _fp_of(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fp)
        for j in range(len(keys)):
            self._insert_one(int(i1[j]), int(i2[j]), np.uint16(fp[j]))
        self.count += len(keys)

    def _insert_one(self, i1: int, i2: int, fp: np.uint16) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                return
        # deterministic eviction walk
        idx = i1 if (int(fp) & 1) == 0 else i2
        cur = fp
        for kick in range(_MAX_KICKS):
            slot = (int(cur) + kick) % _SLOTS
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(
                self._alt_index(np.asarray([idx], np.int64), np.asarray([cur], np.uint16))[0]
            )
            row = self.table[idx]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = cur
                return
        raise RuntimeError(
            f"cuckoo filter over capacity (buckets={self.n_buckets}, count={self.count})"
        )

    # -- snapshot -----------------------------------------------------------
    def state(self) -> dict:
        return {"table": self.table, "count": np.int64(self.count)}

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = np.asarray(state["table"], dtype=np.uint16)
        f.n_buckets = f.table.shape[0]
        f.mask = _u64(f.n_buckets - 1)
        f.count = int(state["count"])
        return f
