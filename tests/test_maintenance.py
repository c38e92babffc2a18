"""Maintenance-service analog: per-epoch health/retention/backup loop
with exact crash-resume (reference monitoring_service.py:42-60 —
periodic maintenance with error backoff; here the commit discipline is
the crawl engine's: atomic manifest LAST)."""

import os

import pandas as pd
import pytest

from job_crawler_ray.pipelines.maintenance import (
    BACKUP_KEEP_LAST,
    MAINT_EPOCHS,
    run_maintenance_epochs,
)


def test_crashed_epoch_resumes_exactly(sf_small, ray_session, tmp_path):
    """Crash injected at the worst point (after epoch 1's backup +
    prune, before its manifest): the resumed run must (a) not rewrite
    epoch 0's committed MANIFEST (same inode — the backup itself is
    later pruned by design), (b) replay epoch 1 and finish 2, and (c)
    produce the byte-identical report and on-disk backup set of an
    uninterrupted run."""
    from job_crawler_ray.pipelines.maintenance import _backup_dirs
    from job_crawler_ray.state.checkpoint import manifest_path

    clean = str(tmp_path / "clean")
    crashy = str(tmp_path / "crashy")
    want = run_maintenance_epochs(sf_small, clean)

    with pytest.raises(RuntimeError, match="injected crash"):
        run_maintenance_epochs(sf_small, crashy, crash_after_epoch=1)
    # epoch 0 committed (manifest + backup); epoch 1 backed up, no manifest
    m0 = manifest_path(crashy, 0)
    assert os.path.exists(m0) and not os.path.exists(manifest_path(crashy, 1))
    m0_ino = os.stat(m0).st_ino
    assert any("epoch=00000" in d for d in _backup_dirs(crashy))
    got = run_maintenance_epochs(sf_small, crashy)  # resume
    assert os.stat(m0).st_ino == m0_ino, "committed manifest rewritten"
    pd.testing.assert_frame_equal(got, want)
    assert list(got["epoch"]) == list(range(MAINT_EPOCHS))
    assert [os.path.basename(d) for d in _backup_dirs(crashy)] == [
        os.path.basename(d) for d in _backup_dirs(clean)
    ]


def test_backup_pruning_bounded(sf_small, ray_session, tmp_path):
    """On-disk backups never exceed BACKUP_KEEP_LAST and the report's
    backups_on_disk column records the min(epoch+1, keep) trajectory."""
    work = str(tmp_path / "w")
    df = run_maintenance_epochs(sf_small, work)
    assert list(df["backups_on_disk"]) == [
        min(e + 1, BACKUP_KEEP_LAST) for e in range(MAINT_EPOCHS)
    ]
    on_disk = [
        d for d in os.listdir(os.path.join(work, "backups"))
    ]
    assert len(on_disk) == BACKUP_KEEP_LAST
