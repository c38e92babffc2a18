"""Per-epoch checkpoint manifests: lineage + exact-resume commit points.

Crawl-scale replacement for the reference's durable-SQLite-plus-gzip
backup scheme (`/root/reference/src/claude_job_agent/monitoring/
backup_manager.py:23-101`): instead of copying a monolithic DB file,
every epoch commits a small JSON manifest naming

- the frontier partition it consumed and the one it produced,
- the output parquet files it wrote (per-partition lineage),
- the seen-set shard snapshots,
- the metrics file,
- row counts (released / fetched / errors) for audit.

The manifest is written atomically (tmp + rename) and LAST, so a crash
anywhere inside an epoch leaves the previous manifest as the resume
point and the half-written epoch is simply replayed — all epoch inputs
are immutable and all epoch steps are deterministic, so replay is
exact (north rule: "resumable from checkpoint with per-partition
lineage + metrics").
"""

from __future__ import annotations

import json
import os
from typing import Any


def manifest_path(checkpoint_dir: str, epoch: int) -> str:
    return os.path.join(checkpoint_dir, "manifests", f"epoch={epoch:05d}.json")


def write_manifest(checkpoint_dir: str, epoch: int, payload: dict[str, Any]) -> str:
    path = manifest_path(checkpoint_dir, epoch)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, **payload}, f, indent=2, sort_keys=True)
    os.replace(tmp, path)
    return path


def latest_manifest(checkpoint_dir: str) -> dict[str, Any] | None:
    d = os.path.join(checkpoint_dir, "manifests")
    if not os.path.isdir(d):
        return None
    files = sorted(f for f in os.listdir(d) if f.endswith(".json"))
    if not files:
        return None
    with open(os.path.join(d, files[-1])) as f:
        return json.load(f)


def load_manifests(checkpoint_dir: str) -> list[dict[str, Any]]:
    d = os.path.join(checkpoint_dir, "manifests")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def prune_checkpoints(checkpoint_dir: str, keep_last: int = 7) -> list[str]:
    """Retention expiry for crawl state (reference semantics: gzip
    backups pruned after 7 days, `/root/reference/src/claude_job_agent/
    monitoring/backup_manager.py:77-101`, retention windows
    `monitoring/config.py:19-22`): keep the last ``keep_last`` epochs'
    seen-set snapshots and metrics, delete older ones. Manifests are
    never pruned (they are the lineage record and are tiny); the
    newest retained snapshot is always a valid resume point.
    """
    import shutil

    removed: list[str] = []
    for sub in ("seen", "metrics"):
        d = os.path.join(checkpoint_dir, sub)
        if not os.path.isdir(d):
            continue
        epochs = sorted(e for e in os.listdir(d) if e.startswith("ep-"))
        for stale in epochs[:-keep_last] if keep_last > 0 else []:
            path = os.path.join(d, stale)
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed
