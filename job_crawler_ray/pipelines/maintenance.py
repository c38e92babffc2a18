"""Periodic maintenance-service analog (reference
`monitoring/monitoring_service.py:42-60, 66-101`): the reference runs
a daemon that, on a fixed cadence, executes health checks, backs up
the database, prunes old backups and expires old metrics, backing off
on errors. This module re-expresses that loop driver-side over Ray
Data — each "epoch" is one cadence tick — with the same commit
discipline as the crawl engine (atomic manifest LAST, so a crash
mid-epoch replays that epoch exactly and finished epochs are skipped):

1. health rollup — error-rate + event volume over the events table
   (distributed partial aggregation, the a6/a7 shapes), judged
   against the reference's max-error-rate alert semantics
   (`monitoring/config.py:16`, scaled to this corpus);
2. retention — rows at or after ``RETENTION_CUTOFF`` survive, older
   rows are counted as expired (the a8 boundary);
3. backup — the epoch's health table is written as a parquet backup
   partition, then backups are pruned to ``BACKUP_KEEP_LAST``
   (reference: 7-day backup retention, `monitoring/config.py:19-22`);
4. commit — ``write_manifest`` (tmp + rename, written last).

`s17_maintenance_report` runs ``MAINT_EPOCHS`` ticks and returns the
per-epoch report — every column SQL-derivable, so the DuckDB twin pins
health math, retention counts AND the on-disk backup-prune behavior.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as papq

from job_crawler_ray.state.checkpoint import load_manifests, write_manifest
from job_crawler_ray.util import read_parquet_clean, strip_meta

MAINT_EPOCHS = 3
BACKUP_KEEP_LAST = 2  # small enough that the 3-epoch report exercises pruning
# reference alert is 5% API error rate (monitoring/config.py:16); this
# synthetic event stream carries ~25% 'error' events by construction,
# so the corpus-scaled alert threshold is 30%
MAINT_MAX_ERROR_RATE = 0.30
RETENTION_CUTOFF = "2024-01-10"  # the a8 boundary (relational.py)


def _health_rollup(sf_dir: str) -> tuple[int, int, int]:
    """(events_total, events_error, events_retained) in ONE pass over
    the events table: per-batch partials (three int64s per batch), one
    tiny driver sum — no shuffle, no second read for retention."""
    cutoff = pd.Timestamp(RETENTION_CUTOFF)
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        err = pc.sum(
            pc.equal(pc.fill_null(t["event_type"], ""), "error").cast(pa.int64())
        ).as_py() or 0
        kept = pc.sum(
            pc.greater_equal(t["ts"], pa.scalar(cutoff)).cast(pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "err": pa.array([err], pa.int64()),
                "kept": pa.array([kept], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(strip_meta, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        int(parts["n"].sum()),
        int(parts["err"].sum()),
        int(parts["kept"].sum()),
    )


def _backup_dirs(work_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(work_dir, "backups", "epoch=*")))


def run_maintenance_epochs(
    sf_dir: str,
    work_dir: str,
    n_epochs: int = MAINT_EPOCHS,
    crash_after_epoch: int | None = None,
) -> pd.DataFrame:
    """Run (or exactly RESUME) ``n_epochs`` maintenance ticks.

    Epochs with a committed manifest are skipped untouched (their
    backup partitions are not rewritten — pinned by the inode test);
    the first uncommitted epoch replays from scratch. A crash between
    the backup write and the manifest commit just replays that epoch:
    the backup write is an idempotent overwrite of its own partition
    and the prune is idempotent, so replay is exact.

    ``crash_after_epoch`` (tests): raise AFTER epoch i's backup +
    prune but BEFORE its manifest commit — the worst-case crash point.
    """
    done = {m["epoch"] for m in load_manifests(work_dir)}
    for epoch in range(n_epochs):
        if epoch in done:
            continue
        total, err, kept = _health_rollup(sf_dir)
        err_rate = round(err / total, 6) if total else 0.0
        healthy = err_rate <= MAINT_MAX_ERROR_RATE
        # backup: this epoch's health table, one partition per epoch
        # (idempotent overwrite — safe to replay)
        bdir = os.path.join(work_dir, "backups", f"epoch={epoch:05d}")
        shutil.rmtree(bdir, ignore_errors=True)
        os.makedirs(bdir, exist_ok=True)
        papq.write_table(
            pa.table(
                {
                    "epoch": pa.array([epoch], pa.int64()),
                    "events_total": pa.array([total], pa.int64()),
                    "events_error": pa.array([err], pa.int64()),
                    "events_retained": pa.array([kept], pa.int64()),
                }
            ),
            os.path.join(bdir, "health.parquet"),
        )
        # prune: keep the newest BACKUP_KEEP_LAST backup partitions
        # (manifests are lineage and are never pruned)
        stale = _backup_dirs(work_dir)[:-BACKUP_KEEP_LAST]
        for path in stale:
            shutil.rmtree(path, ignore_errors=True)
        if crash_after_epoch is not None and epoch == crash_after_epoch:
            raise RuntimeError(f"injected crash after epoch {epoch}")
        write_manifest(
            work_dir,
            epoch,
            {
                "events_total": total,
                "events_error": err,
                "events_retained": kept,
                "error_rate": err_rate,
                "healthy": bool(healthy),
                "backups_on_disk": len(_backup_dirs(work_dir)),
            },
        )
    rows = [m for m in load_manifests(work_dir) if m["epoch"] < n_epochs]
    return pd.DataFrame(
        {
            "epoch": np.array([m["epoch"] for m in rows], np.int64),
            "events_total": np.array(
                [m["events_total"] for m in rows], np.int64
            ),
            "events_error": np.array(
                [m["events_error"] for m in rows], np.int64
            ),
            "events_retained": np.array(
                [m["events_retained"] for m in rows], np.int64
            ),
            "events_expired": np.array(
                [m["events_total"] - m["events_retained"] for m in rows],
                np.int64,
            ),
            "error_rate": np.array([m["error_rate"] for m in rows], np.float64),
            "healthy": np.array([m["healthy"] for m in rows], bool),
            "backups_on_disk": np.array(
                [m["backups_on_disk"] for m in rows], np.int64
            ),
        }
    ).sort_values("epoch").reset_index(drop=True)


def maintenance_report(sf_dir: str, work_dir: str | None = None) -> pa.Table:
    """The s17 query: a fresh MAINT_EPOCHS-tick maintenance run; every
    output column is recomputable by the DuckDB twin (backups_on_disk
    = min(epoch + 1, BACKUP_KEEP_LAST) pins the pruning)."""
    from job_crawler_ray.util import scratch_dir

    own = work_dir is None
    if own:
        work_dir = scratch_dir("jcr_maint_")
    try:
        df = run_maintenance_epochs(sf_dir, work_dir)
    finally:
        if own:
            shutil.rmtree(work_dir, ignore_errors=True)
    return pa.Table.from_pandas(df, preserve_index=False)


MAINT_ORACLE_SQL = f"""
    WITH base AS (
        SELECT CAST(count(*) AS BIGINT) AS events_total,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
                   AS events_error,
               CAST(count(*) FILTER (
                   WHERE ts >= TIMESTAMP '{RETENTION_CUTOFF}') AS BIGINT)
                   AS events_retained
        FROM events
    )
    SELECT CAST(e.i AS BIGINT) AS epoch,
           b.events_total, b.events_error, b.events_retained,
           b.events_total - b.events_retained AS events_expired,
           round_even(b.events_error * 1.0 / b.events_total, 6)
               AS error_rate,
           round_even(b.events_error * 1.0 / b.events_total, 6)
               <= {MAINT_MAX_ERROR_RATE} AS healthy,
           CAST(least(e.i + 1, {BACKUP_KEEP_LAST}) AS BIGINT)
               AS backups_on_disk
    FROM base b, range(0, {MAINT_EPOCHS}) e(i)
    ORDER BY epoch
"""
