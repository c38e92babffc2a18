"""Sharded URL-seen set: cuckoo-filter negative cache + exact tier.

The crawl-scale analog of the reference's in-memory dedup ``set()``
(`/root/reference/src/claude_job_agent/main.py:518-524`) and its
``url TEXT UNIQUE`` constraint (`main.py:141`). N shard actors, keys
routed by ``url_key % N`` (url_key = xxh64(canonical_url), so the
route is uniform regardless of host skew).

Determinism contract (crawl-ordering parity): during an epoch the
shards are **read-only** — `contains_many` answers "seen in a previous
epoch?". Within-epoch duplicates are resolved by the shuffle-based
keep-first dedup in the frontier pipeline, so answers never depend on
batch arrival order. Adds happen once per epoch (the released keys),
after which each shard can snapshot to the checkpoint directory; both
tiers restore bit-exactly on resume.

At 10^10-URL scale: shards scale horizontally (`num_shards`), the
cuckoo tier answers the overwhelmingly common "never seen" case in
O(1) vectorized probes, and the exact tier — required here for the
north rule's exact seen-set parity — is ONE sorted uint64 array per
shard (8 B/key: 10^10 keys ≈ 80 GB across the cluster, ~10 GB per
8-shard node group; the same array pages to disk naturally since it
IS the snapshot format).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from job_crawler_ray.hashing import as_unsigned
from job_crawler_ray.state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set.

    Exact tier = ONE sorted uint64 array (8 B/key — the densest exact
    representation; ``contains`` is a vectorized ``np.searchsorted``,
    ``add`` a sorted merge; the array IS the snapshot format, so
    snapshot/restore are O(1) copies). Cuckoo tier = negative cache for
    the overwhelmingly common "never seen" case; if it saturates the
    shard degrades to exact-tier-only membership (the filter is only an
    optimization, skipping it is semantically safe) instead of killing
    the crawl mid-epoch.
    """

    def __init__(self, shard_id: int, capacity: int = 1 << 18):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity)
        self.keys = np.zeros(0, dtype=np.uint64)  # sorted, unique
        self.saturated = False

    def _member(self, keys: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.keys, keys)
        out = np.zeros(len(keys), dtype=bool)
        in_r = idx < self.keys.size
        out[in_r] = self.keys[idx[in_r]] == keys[in_r]
        return out

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = as_unsigned(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        if not self.saturated:
            maybe = self.filter.contains(keys)
            out = np.zeros(len(keys), dtype=bool)
            if maybe.any():
                out[maybe] = self._member(keys[maybe])
            return out
        return self._member(keys)

    def add_many(self, keys: np.ndarray) -> int:
        keys = np.unique(as_unsigned(keys))
        if keys.size == 0:
            return 0
        fresh = ~self._member(keys)
        new_keys = keys[fresh]
        if new_keys.size:
            if not self.saturated:
                try:
                    self.filter.add(new_keys)
                except RuntimeError:  # cuckoo full: degrade, don't crash
                    self.saturated = True
            merged = np.concatenate([self.keys, new_keys])
            merged.sort(kind="mergesort")  # two sorted runs
            self.keys = merged
        return int(new_keys.size)

    def size(self) -> int:
        return int(self.keys.size)

    def keys_sorted(self) -> np.ndarray:
        return self.keys

    def snapshot(self, path: str) -> str:
        """Atomic per-shard snapshot (tmp + rename): exact keys + cuckoo table."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.npz"
        st = self.filter.state()
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f, exact=self.keys, table=st["table"], count=st["count"],
                saturated=np.array([self.saturated]),
            )
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        with np.load(path) as z:
            self.filter = CuckooFilter.from_state(
                {"table": z["table"], "count": z["count"]}
            )
            self.keys = np.sort(np.asarray(z["exact"], dtype=np.uint64))
            self.saturated = (
                bool(z["saturated"][0]) if "saturated" in z.files else False
            )
        return int(self.keys.size)


class SeenSet:
    """Driver-side handle over the shard actor pool."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 18):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(i, capacity=capacity_per_shard) for i in range(num_shards)
        ]

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (as_unsigned(keys) % np.uint64(self.num_shards)).astype(np.int64)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized 'seen in a previous epoch?' across shards."""
        keys = np.asarray(keys, dtype=np.int64)
        out = np.zeros(len(keys), dtype=bool)
        if keys.size == 0:
            return out
        route = self._route(keys)
        futs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(route == s)[0]
            if idx.size:
                futs.append(self.shards[s].contains_many.remote(keys[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, keys: np.ndarray) -> int:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return 0
        route = self._route(keys)
        futs = [
            self.shards[s].add_many.remote(keys[route == s])
            for s in range(self.num_shards)
            if (route == s).any()
        ]
        return sum(ray.get(futs))

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def all_keys_sorted(self) -> np.ndarray:
        """Sorted int64 (signed-view) keys — comparable to frontier columns."""
        parts = ray.get([s.keys_sorted.remote() for s in self.shards])
        allk = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        return np.sort(allk.view(np.int64))

    def snapshot(self, directory: str) -> list[str]:
        paths = [
            os.path.join(directory, f"seen-shard-{i:04d}.npz")
            for i in range(self.num_shards)
        ]
        return ray.get(
            [s.snapshot.remote(p) for s, p in zip(self.shards, paths)]
        )

    def restore(self, directory: str) -> int:
        paths = [
            os.path.join(directory, f"seen-shard-{i:04d}.npz")
            for i in range(self.num_shards)
        ]
        return sum(ray.get([s.restore.remote(p) for s, p in zip(self.shards, paths)]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
