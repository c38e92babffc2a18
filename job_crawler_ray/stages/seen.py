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
north rule's exact seen-set parity — would page to per-shard sorted
key runs on disk (the snapshot format is already that sorted run).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from job_crawler_ray.hashing import as_unsigned
from job_crawler_ray.state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set (cuckoo + exact uint64 key set)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 18):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity)
        self.exact: set[int] = set()

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = as_unsigned(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.filter.contains(keys)
        out = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            exact = self.exact
            idx = np.nonzero(maybe)[0]
            out[idx] = [int(keys[i]) in exact for i in idx]
        return out

    def add_many(self, keys: np.ndarray) -> int:
        keys = as_unsigned(keys)
        fresh = np.fromiter(
            (int(k) not in self.exact for k in keys), dtype=bool, count=len(keys)
        )
        new_keys = keys[fresh]
        if new_keys.size:
            self.filter.add(new_keys)
            self.exact.update(int(k) for k in new_keys)
        return int(new_keys.size)

    def size(self) -> int:
        return len(self.exact)

    def keys_sorted(self) -> np.ndarray:
        return np.sort(np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact)))

    def snapshot(self, path: str) -> str:
        """Atomic per-shard snapshot (tmp + rename): exact keys + cuckoo table."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.npz"
        st = self.filter.state()
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f, exact=self.keys_sorted(), table=st["table"], count=st["count"]
            )
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        with np.load(path) as z:
            self.filter = CuckooFilter.from_state(
                {"table": z["table"], "count": z["count"]}
            )
            self.exact = {int(k) for k in z["exact"]}
        return len(self.exact)


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
