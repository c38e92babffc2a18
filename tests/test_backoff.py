"""429/error backoff feedback: the A6-metrics → ST5-budget loop.

A host whose epoch error rate exceeds the alert threshold (reference
monitoring/config.py:16) must have its next-epoch release budget
halved, floored at 1; healthy hosts keep their full budget. The
schedule is committed per-manifest so resume replays it exactly."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from job_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from job_crawler_ray.state.checkpoint import load_manifests

BUDGET = 4


@pytest.fixture
def backoff_result(ray_session, tmp_path):
    """Two hosts x 12 urls: good.x pages exist in the corpus store,
    bad.x pages have no html (-> every fetch degrades to 404)."""
    rows = []
    for host, has_html in (("good.x", True), ("bad.x", False)):
        for i in range(12):
            rows.append(
                {
                    "url": f"https://{host}/jobs/{i}",
                    "warc_ts": pd.Timestamp("2024-01-01")
                    + pd.Timedelta(days=i),
                    "html": (
                        f"<html><body>page {i} of {host}</body></html>"
                        if has_html
                        else None
                    ),
                }
            )
    pages = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows)))
    cfg = CrawlConfig(
        work_dir=str(tmp_path / "w"),
        budget_per_host=BUDGET,
        max_epochs=3,
        error_backoff=True,
    )
    run_crawl(cfg, pages_ds=pages)
    return cfg


def _fetched_per_host(cfg: CrawlConfig, epoch: int) -> dict[str, int]:
    files = sorted(
        glob.glob(
            os.path.join(
                cfg.checkpoint_dir, "metrics", f"ep-{epoch:05d}", "*.parquet"
            )
        )
    )
    t = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    g = t.groupby("host")["pages_fetched"].sum()
    return {h: int(v) for h, v in g.items()}


def test_erroring_host_release_shrinks(backoff_result):
    cfg = backoff_result
    ep0 = _fetched_per_host(cfg, 0)
    ep1 = _fetched_per_host(cfg, 1)
    ep2 = _fetched_per_host(cfg, 2)
    # epoch 0: both hosts at the full budget
    assert ep0["bad.x"] == BUDGET
    assert ep0["good.x"] == BUDGET
    # bad.x 404s 100% -> halved, then halved again
    assert ep1["bad.x"] == BUDGET // 2
    assert ep2["bad.x"] == BUDGET // 4
    # good.x keeps the full budget while its frontier lasts
    assert ep1["good.x"] == BUDGET


def test_backoff_schedule_committed_in_manifests(backoff_result):
    cfg = backoff_result
    ms = load_manifests(cfg.checkpoint_dir)
    assert ms[0]["host_budgets"] == {"bad.x": BUDGET // 2}
    assert ms[1]["host_budgets"] == {"bad.x": BUDGET // 4}


def test_backoff_schedule_survives_resume(ray_session, tmp_path):
    """Interrupt after epoch 0 (max_epochs=1), resume to completion:
    the resumed run must restore the committed host_budgets and
    produce the identical per-epoch release schedule as an
    uninterrupted run."""
    rows = []
    for host, has_html in (("good.x", True), ("bad.x", False)):
        for i in range(12):
            rows.append(
                {
                    "url": f"https://{host}/jobs/{i}",
                    "warc_ts": pd.Timestamp("2024-01-01")
                    + pd.Timedelta(days=i),
                    "html": (
                        f"<html><body>page {i} of {host}</body></html>"
                        if has_html
                        else None
                    ),
                }
            )
    pages = pa.Table.from_pandas(pd.DataFrame(rows))
    kw = dict(budget_per_host=BUDGET, error_backoff=True)

    clean_cfg = CrawlConfig(work_dir=str(tmp_path / "clean"), max_epochs=3, **kw)
    run_crawl(clean_cfg, pages_ds=rd.from_arrow(pages))

    work = str(tmp_path / "resumed")
    run_crawl(
        CrawlConfig(work_dir=work, max_epochs=1, **kw),
        pages_ds=rd.from_arrow(pages),
    )
    resumed_cfg = CrawlConfig(work_dir=work, max_epochs=3, **kw)
    run_crawl(resumed_cfg, pages_ds=rd.from_arrow(pages), resume=True)

    for ep in range(3):
        assert _fetched_per_host(resumed_cfg, ep) == _fetched_per_host(
            clean_cfg, ep
        ), f"epoch {ep} schedule diverged on resume"
    assert [
        m["host_budgets"] for m in load_manifests(resumed_cfg.checkpoint_dir)
    ] == [
        m["host_budgets"] for m in load_manifests(clean_cfg.checkpoint_dir)
    ]
