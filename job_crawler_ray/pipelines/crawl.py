"""The flagship pipeline: Ray-Data-native URL-frontier crawl scheduler.

North-rule rebuild of the reference's fetch→parse→extract→dedup→store
loop (`/root/reference/src/claude_job_agent/main.py:479-566`) as an
epoch-driven frontier scheduler:

    seed pages ──┐ (url, warc_ts only — html never enters the frontier)
                 ▼
      canonicalize + xxh64 keys + host     map_batches, vectorized
                 ▼
      robots filter                        broadcast rules, map_batches
                 ▼
      exact dedup keep-first               groupby(url_key).map_groups
                 ▼
   ┌─ epoch loop (driver) ────────────────────────────────────────────┐
   │  seen-filter (previous epochs)        map_batches → shard actors │
   │  per-host budget release              groupby(host).map_groups   │
   │  released → fetch                     actor pool (corpus store)  │
   │           → parse + extract           map_batches, zero-copy     │
   │           → out/epoch=N/*.parquet     partitioned, resumable     │
   │  remaining → frontier/epoch=N+1       streaming write            │
   │  seen.add(released keys) → snapshot → manifest (commit point)    │
   └──────────────────────────────────────────────────────────────────┘

Determinism contract (crawl-ordering / seen-set parity vs the
sequential oracle in :mod:`job_crawler_ray.pipelines.oracle`):

- every per-row derivation is a pure function of the row;
- dedup keeps max-(warc_ts), tie min-(canonical_url, url) — "first
  arrival" under the reference's newest-first ordering
  (`main.py:210` sort_by date, `main.py:518-527` first-wins set);
- release order within a host is (warc_ts DESC, canonical_url ASC),
  rank recorded as ``host_rank``; the total crawl order is the tuple
  (epoch, host, host_rank) — no cross-partition counter needed;
- seen shards are read-only during an epoch (within-epoch dups are
  resolved by the shuffle dedup), so no answer depends on batch
  arrival order ⇒ identical output at any ``num_cpus``.

Scale notes: the frontier carries five narrow columns (never html);
the only all-to-all exchanges are the one-time dedup shuffle and the
per-epoch groupby(host) over the *shrinking* frontier; host-budget
release is itself the hot-host skew cap; fetch reads only the corpus
buckets its batch needs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray

from job_crawler_ray.util import read_parquet_clean, strip_meta

from job_crawler_ray.corpus import pages_dataset
from job_crawler_ray.functions.enrich import enrich_pages_batch
from job_crawler_ray.functions.html import parse_pages_batch
from job_crawler_ray.functions.urltools import add_url_key_columns
from job_crawler_ray.stages.fetch import (
    NUM_CORPUS_BUCKETS,
    make_direct_fetch_fn,
    write_corpus_store,
)
from job_crawler_ray.stages.politeness import (
    make_bounded_budget_release,
    robots_filter_batch,
)
from job_crawler_ray.stages.seen import SeenSet
from job_crawler_ray.state.checkpoint import latest_manifest, write_manifest

FRONTIER_COLS = ["url", "warc_ts", "canonical_url", "host", "url_key"]


@dataclass
class CrawlConfig:
    work_dir: str
    budget_per_host: int = 50
    num_seen_shards: int = 8
    seen_capacity_per_shard: int = 1 << 18  # cuckoo slots; saturation degrades
    max_epochs: int = 1000
    num_corpus_buckets: int = NUM_CORPUS_BUCKETS
    batch_size: int = 8192
    robots_rules: dict[str, str] = field(default_factory=dict)
    store_dir_override: str | None = None  # share a prebuilt corpus store
    # HTTP-shaped fetch (stages/httpfetch.py): set a base url to fetch
    # through the persistent-client actor pool instead of direct
    # fragment reads; output is bit-identical (tests pin this)
    http_fetch_base_url: str | None = None
    fetch_concurrency: int = 8  # max actors of the HTTP fetch pool
    # 429/backoff feedback (the A6-metrics → ST5-budget loop the
    # reference implies: error degradation at main.py:241-243, 5% max
    # error rate alert at monitoring/config.py:16): when enabled, a
    # host whose epoch error rate exceeds ``backoff_error_rate`` has
    # its next-epoch release budget HALVED (multiplicative decrease,
    # floored at ``backoff_min_budget``); a healthy epoch doubles it
    # back toward ``budget_per_host`` (AIMD-style recovery). The
    # override map is committed in each manifest, so resume replays
    # the identical schedule. Off by default: the schedule changes
    # released sets, and the bit-parity tests pin the unthrottled run.
    error_backoff: bool = False
    backoff_error_rate: float = 0.05
    backoff_min_budget: int = 1
    # opt-in frontier PRIORITY: name a numeric column of the pages
    # input; release order becomes (priority DESC, warc_ts DESC,
    # canonical_url ASC) — the SURVEY §2.9 total order
    # (priority, host, warc_ts, url) with priority realized. The
    # sequential oracle takes the same option, so ordering parity is
    # testable under prioritization too. None = reference order.
    priority_col: str | None = None

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.work_dir, "checkpoints")

    @property
    def out_dir(self) -> str:
        return os.path.join(self.work_dir, "out")

    @property
    def store_dir(self) -> str:
        return self.store_dir_override or os.path.join(self.work_dir, "corpus_store")

    @property
    def frontier_dir(self) -> str:
        return os.path.join(self.work_dir, "frontier")


def build_frontier(pages_ds, cfg: CrawlConfig):
    """pages → deduped, robots-filtered frontier (narrow columns only)."""
    from job_crawler_ray.stages.dedup import exact_dedup_first

    want = ["url", "warc_ts"] + ([cfg.priority_col] if cfg.priority_col else [])
    cols = pages_ds.columns()
    if set(cols) != set(want):
        pages_ds = pages_ds.select_columns(want)
    ds = pages_ds.map_batches(add_url_key_columns, batch_format="pyarrow")
    if cfg.robots_rules:
        rules = cfg.robots_rules
        ds = ds.map_batches(
            lambda b: robots_filter_batch(b, rules), batch_format="pyarrow"
        )
    return exact_dedup_first(ds, key="url_key")


def _seen_filter(ds, seen: SeenSet, batch_size: int):
    def drop_seen(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mask = seen.contains(batch["url_key"].to_numpy())
        return batch.filter(pa.array(~mask))

    return ds.map_batches(drop_seen, batch_format="pyarrow", batch_size=batch_size)


def run_crawl(
    cfg: CrawlConfig,
    pages_ds=None,
    sf_dir: str | None = None,
    pages_path: str | None = None,
    replicate: int = 1,
    resume: bool = False,
    reseed_epochs: dict[int, object] | None = None,
    return_seen_keys: bool = False,
):
    """Run the crawl to frontier exhaustion (or cfg.max_epochs).

    Input is one of: ``pages_path`` (a Parquet pages corpus per the
    input_hint schema — the authoritative form; frontier build reads
    ONLY (url, warc_ts) via column pruning), ``pages_ds`` (a Dataset),
    or ``sf_dir``+``replicate`` (synthesize on the fly).

    ``resume=True`` restarts from the last committed manifest: restores
    the seen shards from their snapshots and continues with the next
    frontier partition — exact replay, verified by tests.

    ``reseed_epochs`` maps epoch → Dataset of candidate pages ingested
    at the start of that epoch (a re-crawl wave); candidates that were
    already crawled are dropped by the seen-set, candidates already in
    the frontier merge through the dedup shuffle.
    """
    import ray.data as rd

    os.makedirs(cfg.work_dir, exist_ok=True)
    reseed_epochs = reseed_epochs or {}

    seen = SeenSet(
        num_shards=cfg.num_seen_shards,
        capacity_per_shard=cfg.seen_capacity_per_shard,
    )
    start_epoch = 0
    # per-host budget OVERRIDES from the backoff loop (empty = every
    # host at cfg.budget_per_host); only throttled/recovering hosts
    # appear, so the broadcast stays tiny
    host_budgets: dict[str, int] = {}
    if resume:
        m = latest_manifest(cfg.checkpoint_dir)
        if m is not None:
            snap_shards = m.get("num_seen_shards")
            if snap_shards is not None and snap_shards != cfg.num_seen_shards:
                raise ValueError(
                    f"resume with num_seen_shards={cfg.num_seen_shards} but the "
                    f"checkpoint was written with {snap_shards}: key%N routing "
                    "would silently drop seen keys"
                )
            seen.restore(m["seen_snapshot_dir"])
            start_epoch = m["epoch"] + 1
            host_budgets = {
                h: int(b) for h, b in m.get("host_budgets", {}).items()
            }

    import time as _time

    import shutil as _shutil

    setup_timings: dict[str, float] = {}
    prebuilt_frontier = None
    f0_writer = None
    _f0_err: list[BaseException] = []
    if start_epoch == 0:
        # one-time corpus store + initial frontier — committed ATOMICALLY
        # (write to a tmp dir, os.rename into place): a crash mid-write
        # must not leave a partial directory that a later run (or
        # resume=True before the first manifest) silently treats as
        # complete and crawls truncated input
        _t0 = _time.time()
        if not os.path.isdir(cfg.store_dir):
            store_src = (
                read_parquet_clean(pages_path, columns=["url", "html"])
                if pages_path
                else (pages_ds or pages_dataset(sf_dir, replicate=replicate))
            )
            tmp_store = cfg.store_dir + ".tmp"
            _shutil.rmtree(tmp_store, ignore_errors=True)
            write_corpus_store(
                store_src, tmp_store, num_buckets=cfg.num_corpus_buckets
            )
            os.rename(tmp_store, cfg.store_dir)
        setup_timings["corpus_store"] = round(_time.time() - _t0, 3)
        _t0 = _time.time()
        f0 = os.path.join(cfg.frontier_dir, "ep-00000")
        if not os.path.isdir(f0):
            frontier_src = (
                read_parquet_clean(pages_path, columns=["url", "warc_ts"])
                if pages_path
                else (pages_ds or pages_dataset(sf_dir, replicate=replicate))
            )
            tmp_f0 = f0 + ".tmp"
            _shutil.rmtree(tmp_f0, ignore_errors=True)
            # live handoff into epoch 0 (same as between epochs): the
            # parquet copy is the resume checkpoint, not the data path
            prebuilt_frontier = build_frontier(frontier_src, cfg).materialize()

            # The checkpoint copy is a RESUME-ONLY artifact: nothing in
            # this run reads ep-00000 (epoch 0 consumes the live
            # materialized frontier), and a resume needs it only when no
            # manifest was committed. So the write overlaps epoch-0
            # compute in a background thread and is joined before the
            # epoch-0 manifest commits; the tmp-dir + atomic-rename
            # protocol keeps a crashed half-write invisible to resume.
            import threading as _threading

            def _write_f0_checkpoint(
                ds=prebuilt_frontier, tmp=tmp_f0, dst=f0, err=_f0_err
            ):
                try:
                    ds.write_parquet(tmp)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.rename(tmp, dst)
                except BaseException as e:  # surfaced at join
                    err.append(e)

            f0_writer = _threading.Thread(
                target=_write_f0_checkpoint, daemon=True
            )
            f0_writer.start()
        setup_timings["frontier_build"] = round(_time.time() - _t0, 3)

    epoch = start_epoch
    manifests = []
    empty_cols = {
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("us")),
    }
    if cfg.priority_col:
        empty_cols[cfg.priority_col] = pa.array([], pa.float64())
    empty_cols.update(
        {
            "canonical_url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "url_key": pa.array([], pa.int64()),
        }
    )
    empty_frontier = pa.table(empty_cols)

    import shutil

    # The live frontier is handed across epochs as a MATERIALIZED
    # dataset (object store, spills under pressure); the per-epoch
    # parquet under frontier/ is the CHECKPOINT copy, read back only on
    # resume. Saves a write→read round trip per epoch.
    live_frontier = prebuilt_frontier

    fetch_fn = make_direct_fetch_fn(cfg.store_dir, cfg.num_corpus_buckets)

    while epoch < cfg.max_epochs:
        frontier_in = os.path.join(cfg.frontier_dir, f"ep-{epoch:05d}")
        # Exact replay after a mid-epoch crash: any outputs of THIS epoch
        # found on disk are uncommitted leftovers (the manifest commits
        # last) — remove them so the replay cannot double-write.
        for leftover in (
            os.path.join(cfg.out_dir, f"ep-{epoch:05d}"),
            os.path.join(cfg.checkpoint_dir, "metrics", f"ep-{epoch:05d}"),
            os.path.join(cfg.checkpoint_dir, "seen", f"ep-{epoch:05d}"),
            os.path.join(cfg.frontier_dir, f"ep-{epoch + 1:05d}"),
        ):
            shutil.rmtree(leftover, ignore_errors=True)
        if live_frontier is not None:
            frontier = live_frontier
        elif os.path.isdir(frontier_in):
            frontier = rd.read_parquet(frontier_in)
        else:  # drained earlier; only reseed waves can refill
            frontier = rd.from_arrow(empty_frontier)

        if epoch in reseed_epochs:
            from job_crawler_ray.stages.dedup import exact_dedup_first

            wave = build_frontier(reseed_epochs[epoch], cfg)
            frontier = exact_dedup_first(frontier.union(wave), key="url_key")

        import time as _time

        timings: dict[str, float] = {}
        _t0 = _time.time()

        frontier = _seen_filter(frontier, seen, cfg.batch_size)

        # per-host token-bucket release (budget = tokens per epoch),
        # bounded-memory: a per-block partial rank caps each host's
        # shuffle group at budget × blocks rows (the Zipf-head host's
        # group is otherwise the whole frontier share). Normalize the
        # map_groups output back to Arrow blocks — pandas blocks
        # flowing into the downstream sort trip Ray's schema dedup
        # ("Failed to hash the schemas") and batch-type unions
        partial_fn, release_fn = make_bounded_budget_release(
            cfg.budget_per_host, host_budgets=host_budgets or None,
            priority_col=cfg.priority_col,
        )
        flagged = (
            frontier.map_batches(partial_fn, batch_format="pyarrow")
            .groupby("rel_grp")
            .map_groups(release_fn, batch_format="pandas")
            .map_batches(strip_meta, batch_format="pyarrow")
        )
        flagged = flagged.materialize()  # consumed twice (released + remaining)
        timings["release"] = _time.time() - _t0

        import pyarrow.compute as pc

        from job_crawler_ray.stages.fetch import host_bucket_of

        def take_released(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["released"], True))
            bucket = host_bucket_of(
                b["url_key"].to_numpy(), cfg.num_corpus_buckets
            )
            return b.append_column("bucket", pa.array(bucket, type=pa.int64()))

        # sort released by store bucket so each fetch batch touches one
        # or two corpus fragments instead of all of them; then split
        # (order-preserving, no shuffle) — map_batches parallelism is per
        # BLOCK and the sort can collapse the released set into one or
        # two blocks, which would serialize the fetch→extract chain.
        # Block count is sized from the flagged count (metadata on the
        # materialized dataset — released ≤ flagged) so the whole chain
        # is ONE execution instead of materialize → count → repartition.
        _t0 = _time.time()
        n_flagged = flagged.count()  # metadata only
        n_rel_blocks = max(2, min(512, n_flagged // 1024 + 1))
        released = (
            flagged.map_batches(take_released, batch_format="pyarrow")
            .sort(["bucket", "url_key"])
            .repartition(n_rel_blocks)
            .materialize()
        )
        remaining = flagged.map_batches(
            lambda b: b.filter(pc.equal(b["released"], False)), batch_format="pyarrow"
        ).drop_columns(["released", "host_rank"])
        timings["split"] = _time.time() - _t0

        # fetch → parse → extract → partitioned output
        _t0 = _time.time()
        out_epoch = os.path.join(cfg.out_dir, f"ep-{epoch:05d}")
        if cfg.http_fetch_base_url:
            from job_crawler_ray.stages.httpfetch import HttpFetcher

            fetched = released.map_batches(
                HttpFetcher,
                fn_constructor_kwargs=dict(base_url=cfg.http_fetch_base_url),
                batch_format="pyarrow",
                batch_size=2048,
                concurrency=(1, cfg.fetch_concurrency),
            )
        else:
            fetched = released.map_batches(
                fetch_fn, batch_format="pyarrow", batch_size=2048
            )
        fetched = fetched.map_batches(parse_pages_batch, batch_format="pyarrow")
        fetched = fetched.map_batches(enrich_pages_batch, batch_format="pyarrow")
        fetched = fetched.drop_columns(["html", "bucket"])
        fetched = fetched.map_batches(
            lambda b, e=epoch: b.append_column(
                "epoch", pa.array(np.full(b.num_rows, e, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        fetched = fetched.materialize()  # consumed twice (write + metrics)
        fetched.write_parquet(out_epoch)
        timings["fetch_extract_write"] = _time.time() - _t0
        # per-stage wall/cpu/memory breakdown of the hot pipeline —
        # the observability feed for tuning batch/block sizes (ds.stats())
        stats_dir = os.path.join(cfg.checkpoint_dir, "stats")
        os.makedirs(stats_dir, exist_ok=True)
        with open(os.path.join(stats_dir, f"ep-{epoch:05d}.txt"), "w") as fh:
            fh.write(fetched.stats())

        # per-host fetch-metrics rollup (A6 shape) — partial per batch,
        # tiny final groupby
        _t0 = _time.time()

        def metrics_batch(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            # vectorized indicator columns BEFORE the groupby — no
            # per-group Python lambda in the hot aggregation
            df["_err"] = (df["status_code"] != 200).to_numpy(dtype=np.int64)
            df["_ok"] = (df["status_code"] == 200).to_numpy(dtype=np.int64)
            g = df.groupby("host", sort=True).agg(
                pages_fetched=("url", "size"),
                fetch_errors=("_err", "sum"),
                bytes_fetched=("response_bytes", "sum"),
                latency_ms_sum=("fetch_latency_ms", "sum"),
                pages_ok=("_ok", "sum"),
            )
            return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

        # partials shrink to ≤ hosts × blocks rows — final-reduce them on
        # the driver (a Ray groupby exchange costs seconds even on tiny
        # data) with the standard distributed fallback above the cap
        metric_cols = [
            "pages_fetched", "fetch_errors", "bytes_fetched",
            "latency_ms_sum", "pages_ok",
        ]
        partials = fetched.map_batches(metrics_batch, batch_format="pyarrow")
        metrics_path = os.path.join(cfg.checkpoint_dir, "metrics", f"ep-{epoch:05d}")
        part_df = None
        if n_flagged <= 2_000_000:  # partial rows ≤ flagged rows
            part_df = partials.to_pandas()
        if part_df is not None:
            if part_df.empty:  # drained epoch: empty ds → frame with no columns
                import pandas as _pd

                part_df = _pd.DataFrame(
                    {"host": _pd.Series([], dtype=str),
                     **{c: _pd.Series([], dtype="int64") for c in metric_cols}}
                )
            rolled = part_df.groupby("host", sort=True)[metric_cols].sum().reset_index()
            os.makedirs(metrics_path, exist_ok=True)
            import pyarrow.parquet as _pq

            _pq.write_table(
                pa.Table.from_pandas(rolled, preserve_index=False),
                os.path.join(metrics_path, "part-0.parquet"),
            )
        else:
            partials.groupby("host").sum(metric_cols).write_parquet(metrics_path)
        timings["metrics"] = _time.time() - _t0

        if cfg.error_backoff:
            # A6 → ST5 feedback: this epoch's per-host error rates set
            # next epoch's release budgets. Uses the already-reduced
            # metrics table (≤ |hosts| rows — read back from the sink
            # on the distributed path).
            if part_df is not None:
                met = rolled
            else:
                met = read_parquet_clean(metrics_path).to_pandas()
            next_budgets: dict[str, int] = {}
            seen_hosts = set()
            for host, fetched_n, errs in zip(
                met["host"], met["pages_fetched"], met["fetch_errors"]
            ):
                seen_hosts.add(host)
                cur = host_budgets.get(host, cfg.budget_per_host)
                if fetched_n > 0 and errs / fetched_n > cfg.backoff_error_rate:
                    nb = max(cfg.backoff_min_budget, cur // 2)
                else:
                    nb = min(cfg.budget_per_host, cur * 2)
                if nb != cfg.budget_per_host:
                    next_budgets[host] = nb
            # hosts not fetched this epoch keep their throttle (no
            # healthy evidence to recover on)
            for host, b in host_budgets.items():
                if host not in seen_hosts:
                    next_budgets[host] = b
            host_budgets = next_budgets

        n_released = released.count()  # metadata (materialized)
        n_fetched = fetched.count()

        # next frontier — materialized once: live handoff to the next
        # epoch AND checkpoint parquet for resume
        _t0 = _time.time()
        frontier_out = os.path.join(cfg.frontier_dir, f"ep-{epoch + 1:05d}")
        n_remaining = n_flagged - n_released
        if n_remaining > 0:
            live_frontier = remaining.materialize()
            live_frontier.write_parquet(frontier_out)
        else:
            live_frontier = None
        timings["frontier_out"] = _time.time() - _t0

        # seen-set update + snapshot + manifest commit. Keys go from the
        # tasks holding the released blocks STRAIGHT to the shard actors
        # (batch → route → add_many) — the released key column never
        # converges on the driver. Adds are a set union, so per-task
        # arrival order cannot affect state; shards were read-only for
        # this epoch's contains phase, which completed at the flagged
        # materialize above.
        _t0 = _time.time()
        shard_handles = seen.shards
        nsh = seen.num_shards

        def send_keys_to_shards(t: pa.Table) -> pa.Table:
            from job_crawler_ray.hashing import as_unsigned as _as_u

            keys = t["url_key"].to_numpy()
            if len(keys):
                route = (_as_u(keys) % np.uint64(nsh)).astype(np.int64)
                ray.get(
                    [
                        shard_handles[s].add_many.remote(keys[route == s])
                        for s in np.unique(route)
                    ]
                )
            return pa.table({"sent": pa.array([len(keys)], pa.int64())})

        released.select_columns(["url_key"]).map_batches(
            send_keys_to_shards, batch_format="pyarrow", batch_size=cfg.batch_size
        ).count()
        snap_dir = os.path.join(cfg.checkpoint_dir, "seen", f"ep-{epoch:05d}")
        seen.snapshot(snap_dir)
        timings["seen_snapshot"] = _time.time() - _t0

        # the epoch-0 frontier checkpoint (written in the background,
        # overlapped with this epoch's compute) must exist before the
        # first manifest commits — a resume landing between commit and
        # write completion would otherwise see a manifest but no
        # checkpoint chain origin
        if f0_writer is not None:
            _t0 = _time.time()
            f0_writer.join()
            f0_writer = None
            if _f0_err:
                raise _f0_err[0]
            timings["f0_checkpoint_join"] = _time.time() - _t0

        out_files = sorted(os.listdir(out_epoch)) if os.path.isdir(out_epoch) else []
        manifests.append(
            write_manifest(
                cfg.checkpoint_dir,
                epoch,
                {
                    "frontier_in": frontier_in,
                    "frontier_out": frontier_out if n_remaining else None,
                    "released": int(n_released),
                    "fetched": int(n_fetched),
                    "remaining": int(n_remaining),
                    "seen_total": int(seen.size()),
                    "num_seen_shards": cfg.num_seen_shards,
                    "seen_snapshot_dir": snap_dir,
                    "metrics_path": metrics_path,
                    "output_dir": out_epoch,
                    "output_files": out_files,
                    # NEXT epoch's per-host budget overrides (backoff
                    # loop state — resume replays the same schedule)
                    "host_budgets": dict(host_budgets),
                    "timings_sec": {k: round(v, 3) for k, v in timings.items()},
                },
            )
        )

        epoch += 1
        if n_remaining == 0 and not any(e >= epoch for e in reseed_epochs):
            break

    if f0_writer is not None:  # max_epochs == 0: no manifest joined it
        f0_writer.join()
        if _f0_err:
            raise _f0_err[0]

    result = {
        "setup_timings": setup_timings,
        "epochs": epoch - start_epoch,
        "out_dir": cfg.out_dir,
        "manifests": manifests,
        "seen_total": seen.size(),
    }
    if return_seen_keys:
        # parity tests only: concatenates EVERY seen key on the driver
        # (8 B/key ⇒ 80 GB at a 10^10-URL frontier) — never part of the
        # production return contract
        result["seen_keys"] = seen.all_keys_sorted()
    seen.shutdown()
    return result


def crawl_output_dataset(cfg: CrawlConfig):
    """All crawled pages, with the total-order columns (epoch, host, host_rank)."""
    import ray.data as rd

    return rd.read_parquet(cfg.out_dir)
