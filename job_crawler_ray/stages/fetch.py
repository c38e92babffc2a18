"""Fetch stage: actor-pool map_batches that resolves url → page bytes.

The reference fetches over HTTP with a per-call ``httpx.AsyncClient``
(`/root/reference/src/claude_job_agent/main.py:213-243`, 15 s timeout,
error → empty result, never an exception). The Ray-native shape is a
**stateful actor pool**: the expensive client/state is built once per
actor in ``__init__`` and reused across batches
(``map_batches(CorpusFetcher, concurrency=N, num_cpus=...)``).

No network exists in this sandbox, so the "web" is the pages corpus
laid out as host-bucketed Parquet (written once by
``write_corpus_store``). A fetch batch groups its URLs by host bucket,
reads only those buckets' fragments (column-pruned), and joins on
``url`` — the I/O pattern of a real fetcher talking to a
host-partitioned frontier. Per-row semantics mirror the reference:

- status 200 + bytes on success;
- deterministic pseudo-latency (seeded by url_key — stands in for
  network time, drives the metrics rollup A6);
- a deterministic ~1% failure tier (status 503, empty bytes) —
  row-level degradation, never a raised exception
  (`main.py:241-243, 545-548`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray

from job_crawler_ray.corpus import mix64
from job_crawler_ray.hashing import as_unsigned

NUM_CORPUS_BUCKETS = 32

_u64 = np.uint64


def host_bucket_of(url_keys: np.ndarray, num_buckets: int = NUM_CORPUS_BUCKETS) -> np.ndarray:
    return (mix64(as_unsigned(url_keys), 101) % _u64(num_buckets)).astype(np.int64)


def write_corpus_store(pages_ds, store_dir: str, num_buckets: int = NUM_CORPUS_BUCKETS):
    """One-time layout of the corpus as bucket-partitioned Parquet.

    Partition key = hash bucket of url_key — this is the "address
    space" the fetcher resolves against (hive layout ⇒ fragment pruning
    by bucket). Done as a Dataset write so it streams at any scale.
    """
    from job_crawler_ray.functions.urltools import add_url_key_columns

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = add_url_key_columns(batch)
        bucket = host_bucket_of(batch["url_key"].to_numpy(), num_buckets)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    (
        pages_ds.map_batches(add_bucket, batch_format="pyarrow")
        .select_columns(["url", "html", "bucket"])
        .write_parquet(store_dir, partition_cols=["bucket"])
    )
    return store_dir


def _fetch_semantics(urls, keys, html_map):
    """Shared per-row fetch semantics: status / latency / byte columns.

    Mirrors the reference's row-level degradation (`main.py:241-243,
    545-548`): deterministic ~1% failure tier (503), 404 for unknown
    urls, pseudo-latency seeded by url_key — never an exception.
    """
    found = urls.map(html_map)
    have = found.notna()
    h = mix64(as_unsigned(keys), 202)
    fail = (h % _u64(97) == 0) & have.to_numpy()
    latency_ms = 20.0 + (mix64(as_unsigned(keys), 203) % _u64(2000)).astype(
        np.float64
    ) / 10.0
    ok = have.to_numpy() & ~fail
    status = np.where(ok, 200, np.where(fail, 503, 404)).astype(np.int32)
    html = found.where(pd.Series(ok, index=found.index), None)
    nbytes = html.str.len().fillna(0).astype(np.int64)
    return html, status, latency_ms, nbytes


@ray.remote(num_cpus=0.5)
class FetchShard:
    """Persistent fetch service shard: owns the corpus buckets with
    ``bucket % num_shards == shard_id``; loads each fragment ONCE for
    the whole crawl (epochs reuse the warm shard — the analog of a
    fetcher's persistent HTTP client + connection pool, reference
    `main.py:214` builds a client per call and pays for it)."""

    def __init__(self, store_dir: str, shard_id: int, num_shards: int):
        self.store = pads.dataset(store_dir, partitioning="hive")
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._maps: dict[int, dict[str, bytes]] = {}

    def _bucket_map(self, b: int) -> dict[str, bytes]:
        m = self._maps.get(b)
        if m is None:
            frag = self.store.to_table(
                columns=["url", "html"], filter=pads.field("bucket") == int(b)
            )
            m = self._maps[b] = dict(
                zip(frag["url"].to_pylist(), frag["html"].to_pylist())
            )
        return m

    def fetch(self, urls: list[str], buckets: np.ndarray) -> list:
        out = []
        cur_b, cur_m = -1, None
        for u, b in zip(urls, buckets):
            if b != cur_b:
                cur_b, cur_m = b, self._bucket_map(int(b))
            out.append(cur_m.get(u))
        return out


def make_direct_fetch_fn(store_dir: str, num_buckets: int = NUM_CORPUS_BUCKETS):
    """Stateless fetch fn: each task reads the store fragments for the
    buckets present in ITS batch (whole-fragment read + dict lookup —
    cheaper and more parallel than predicate-filtered reads or a shared
    actor service, which head-of-line blocks under many tasks). With
    bucket-sorted released rows and whole-block batches, every epoch
    costs ≈ one fragment read per bucket, fanned across the cluster."""

    def fetch_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = batch.append_column("html", pa.array([], pa.binary()))
            out = out.append_column("status_code", pa.array([], pa.int32()))
            out = out.append_column("fetch_latency_ms", pa.array([], pa.float64()))
            return out.append_column("response_bytes", pa.array([], pa.int64()))
        store = pads.dataset(store_dir, partitioning="hive")
        urls = batch["url"].to_pandas()
        keys = batch["url_key"].to_numpy()
        buckets = host_bucket_of(keys, num_buckets)
        html_map: dict[str, bytes] = {}
        for b in np.unique(buckets):
            frag = store.to_table(
                columns=["url", "html"], filter=pads.field("bucket") == int(b)
            )
            want = set(urls[buckets == b])
            html_map.update(
                (u, h)
                for u, h in zip(frag["url"].to_pylist(), frag["html"].to_pylist())
                if u in want
            )
        html, status, latency_ms, nbytes = _fetch_semantics(urls, keys, html_map)
        out = batch.append_column(
            "html", pa.array(html, type=pa.binary(), from_pandas=True)
        )
        out = out.append_column("status_code", pa.array(status))
        out = out.append_column("fetch_latency_ms", pa.array(latency_ms))
        return out.append_column("response_bytes", pa.array(nbytes.to_numpy()))

    return fetch_batch


def make_fetch_shards(store_dir: str, num_shards: int):
    return [
        FetchShard.remote(store_dir, i, num_shards) for i in range(num_shards)
    ]


def make_shard_fetch_fn(shards, num_buckets: int = NUM_CORPUS_BUCKETS):
    """map_batches fn resolving html through the persistent shard pool.

    Routes each row to the shard owning its bucket; bucket-sorted
    batches touch one or two shards, so the per-batch RPC count is
    tiny. The stage itself stays a stateless task — all state lives in
    the long-lived shards."""
    num_shards = len(shards)

    def fetch_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            out = batch.append_column("html", pa.array([], pa.binary()))
            out = out.append_column("status_code", pa.array([], pa.int32()))
            out = out.append_column("fetch_latency_ms", pa.array([], pa.float64()))
            return out.append_column("response_bytes", pa.array([], pa.int64()))
        urls = batch["url"].to_pandas()
        url_arr = urls.to_numpy()
        keys = batch["url_key"].to_numpy()
        buckets = host_bucket_of(keys, num_buckets)
        sid = buckets % num_shards
        futs, idxs = [], []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futs.append(
                shards[int(s)].fetch.remote(url_arr[idx].tolist(), buckets[idx])
            )
            idxs.append(idx)
        html_map: dict[str, bytes] = {}
        for idx, res in zip(idxs, ray.get(futs)):
            for i, payload in zip(idx, res):
                if payload is not None:
                    html_map[url_arr[i]] = payload
        html, status, latency_ms, nbytes = _fetch_semantics(urls, keys, html_map)
        out = batch.append_column(
            "html", pa.array(html, type=pa.binary(), from_pandas=True)
        )
        out = out.append_column("status_code", pa.array(status))
        out = out.append_column("fetch_latency_ms", pa.array(latency_ms))
        return out.append_column("response_bytes", pa.array(nbytes.to_numpy()))

    return fetch_batch


class CorpusFetcher:
    """Actor: fetch html for released frontier rows from the corpus store."""

    def __init__(self, store_dir: str, num_buckets: int = NUM_CORPUS_BUCKETS):
        # once per actor: open the dataset, build the fragment index
        self.store = pads.dataset(store_dir, partitioning="hive")
        self.num_buckets = num_buckets
        # small LRU of loaded bucket fragments — the release stage sorts
        # its output by bucket, so consecutive batches hit the same one
        self._cache: dict[int, dict[str, bytes]] = {}
        self._cache_cap = 4

    def _bucket_map(self, b: int) -> dict[str, bytes]:
        m = self._cache.get(b)
        if m is None:
            frag = self.store.to_table(
                columns=["url", "html"], filter=pads.field("bucket") == int(b)
            )
            m = dict(zip(frag["url"].to_pylist(), frag["html"].to_pylist()))
            if len(self._cache) >= self._cache_cap:
                self._cache.pop(next(iter(self._cache)))
            self._cache[b] = m
        return m

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("html", pa.array([], pa.binary()))
        urls = batch["url"].to_pandas()
        keys = batch["url_key"].to_numpy()
        buckets = host_bucket_of(keys, self.num_buckets)

        html_map: dict[str, bytes] = {}
        for b in np.unique(buckets):
            bm = self._bucket_map(int(b))
            want = urls[buckets == b]
            html_map.update((u, bm[u]) for u in want if u in bm)

        html = urls.map(html_map)  # NaN where the fetch "404"s
        found = html.notna()

        # deterministic failure tier (~1%) + pseudo-latency in ms
        h = mix64(as_unsigned(keys), 202)
        fail = (h % _u64(97) == 0) & found.to_numpy()
        latency_ms = 20.0 + (mix64(as_unsigned(keys), 203) % _u64(2000)).astype(
            np.float64
        ) / 10.0
        ok = found.to_numpy() & ~fail
        status = np.where(ok, 200, np.where(fail, 503, 404)).astype(np.int32)
        html = html.where(pd.Series(ok, index=html.index), None)
        nbytes = html.str.len().fillna(0).astype(np.int64)

        out = batch.append_column("html", pa.array(html, type=pa.binary(), from_pandas=True))
        out = out.append_column("status_code", pa.array(status))
        out = out.append_column("fetch_latency_ms", pa.array(latency_ms))
        out = out.append_column("response_bytes", pa.array(nbytes.to_numpy()))
        return out
