"""Opt-in frontier priority: release order becomes (priority DESC,
warc_ts DESC, canonical ASC) — the SURVEY §2.9 total order with
priority realized — and the distributed engine must still match the
sequential oracle exactly under it."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from job_crawler_ray.pipelines.crawl import (
    CrawlConfig,
    crawl_output_dataset,
    run_crawl,
)
from job_crawler_ray.pipelines.oracle import crawl_oracle

BUDGET = 3


def _pages() -> pd.DataFrame:
    rows = []
    for h in ("a.x", "b.x"):
        for i in range(9):
            rows.append(
                {
                    "url": f"https://{h}/p/{i}",
                    "warc_ts": pd.Timestamp("2024-01-01")
                    + pd.Timedelta(days=i),
                    # priority INVERTS the newest-first order (old pages
                    # hottest) with planted ties so the warc_ts
                    # tie-break inside equal priorities is exercised
                    "priority": float(8 - i) // 2,
                    "html": f"<html><body>page {i} {h}</body></html>",
                }
            )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def prio_result(ray_session, tmp_path_factory):
    df = _pages()
    cfg = CrawlConfig(
        work_dir=str(tmp_path_factory.mktemp("prio")),
        budget_per_host=BUDGET,
        priority_col="priority",
    )
    run_crawl(cfg, pages_ds=rd.from_arrow(pa.Table.from_pandas(df)))
    got = (
        crawl_output_dataset(cfg)
        .to_pandas()
        .sort_values(["epoch", "host", "host_rank"])
        .reset_index(drop=True)
    )
    want = crawl_oracle(
        pa.Table.from_pandas(df[["url", "warc_ts", "priority"]]),
        budget_per_host=BUDGET,
        priority_col="priority",
    )["order"].reset_index(drop=True)
    return got, want


def test_priority_order_matches_oracle(prio_result):
    got, want = prio_result
    assert len(got) == len(want)
    assert (got["url"].to_numpy() == want["url"].to_numpy()).all()
    assert (got["epoch"].to_numpy() == want["epoch"].to_numpy()).all()
    assert (got["host_rank"].to_numpy() == want["host_rank"].to_numpy()).all()


def test_high_priority_crawled_first(prio_result):
    got, _ = prio_result
    # epoch 0, each host: the BUDGET highest-priority pages (oldest
    # here — the inverse of the default newest-first order)
    ep0 = got[got["epoch"] == 0]
    for _h, g in ep0.groupby("host"):
        ids = sorted(int(u.rsplit("/", 1)[1]) for u in g["url"])
        assert ids == [0, 1, 2]  # priority 4,3,3 — not the newest pages


def test_default_order_unchanged(ray_session, tmp_path):
    """priority_col=None keeps the reference newest-first order (the
    bit-parity contract the rest of the suite pins)."""
    df = _pages()
    cfg = CrawlConfig(
        work_dir=str(tmp_path / "w"), budget_per_host=BUDGET
    )
    run_crawl(
        cfg,
        pages_ds=rd.from_arrow(
            pa.Table.from_pandas(df[["url", "warc_ts", "html"]])
        ),
    )
    got = (
        crawl_output_dataset(cfg)
        .to_pandas()
        .sort_values(["epoch", "host", "host_rank"])
        .reset_index(drop=True)
    )
    ep0 = got[got["epoch"] == 0]
    for _h, g in ep0.groupby("host"):
        ids = sorted(int(u.rsplit("/", 1)[1]) for u in g["url"])
        assert ids == [6, 7, 8]  # newest-first
