"""Sequential reference oracle for the crawl scheduler.

A deliberately single-threaded, order-explicit simulation of the
reference crawler's semantics (first-wins dedup over newest-first
arrival `/root/reference/src/claude_job_agent/main.py:210, 518-527`;
per-host budget; robots; accumulate seen set). The distributed engine
in :mod:`job_crawler_ray.pipelines.crawl` must reproduce this oracle's

- released URL set per epoch,
- total crawl order (epoch, host, host_rank),
- final seen-key set,

at every parallelism level. Tests compare them directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from job_crawler_ray.functions.urltools import canonicalize_urls, hosts_of
from job_crawler_ray.hashing import as_signed, xxh64_array


def _candidates(pages: pa.Table, robots_rules: dict[str, str],
                priority_col: str | None = None) -> pd.DataFrame:
    cols = ["url", "warc_ts"] + ([priority_col] if priority_col else [])
    df = pages.select(cols).to_pandas()
    df["canonical_url"] = canonicalize_urls(df["url"])
    df["host"] = hosts_of(df["url"])
    df["url_key"] = as_signed(xxh64_array(df["canonical_url"].to_numpy()))
    if robots_rules:
        pre = df["host"].map(robots_rules)
        path = df["canonical_url"].str.partition("://")[2]
        path = "/" + path.str.partition("/")[2]
        drop = np.zeros(len(df), dtype=bool)
        for p in pre.dropna().unique():
            sel = (pre == p).to_numpy()
            drop[sel] = path[sel].str.startswith(p).to_numpy()
        df = df[~drop]
    return df


def _dedup_first(df: pd.DataFrame) -> pd.DataFrame:
    g = df.sort_values(
        ["warc_ts", "canonical_url", "url"],
        ascending=[False, True, True],
        kind="mergesort",
    )
    return g.drop_duplicates("url_key", keep="first")


def crawl_oracle(
    pages: pa.Table,
    budget_per_host: int,
    robots_rules: dict[str, str] | None = None,
    reseed_epochs: dict[int, pa.Table] | None = None,
    max_epochs: int = 1000,
    priority_col: str | None = None,
) -> dict:
    """Run the sequential crawl; return order + seen set.

    Returns ``{"order": DataFrame[epoch, host, host_rank, url,
    canonical_url, url_key], "seen_keys": sorted uint64 ndarray,
    "epochs": int}``.
    """
    robots_rules = robots_rules or {}
    reseed_epochs = reseed_epochs or {}

    frontier = _dedup_first(_candidates(pages, robots_rules, priority_col))
    seen: set[int] = set()
    order_parts: list[pd.DataFrame] = []

    epoch = 0
    while epoch < max_epochs:
        if epoch in reseed_epochs:
            wave = _dedup_first(
                _candidates(reseed_epochs[epoch], robots_rules, priority_col)
            )
            frontier = _dedup_first(pd.concat([frontier, wave], ignore_index=True))

        frontier = frontier[~frontier["url_key"].map(lambda k: int(k) in seen)]

        released_parts = []
        remaining_parts = []
        sort_keys = ["warc_ts", "canonical_url"]
        sort_asc = [False, True]
        if priority_col:
            sort_keys = [priority_col] + sort_keys
            sort_asc = [False] + sort_asc
        for host, g in frontier.groupby("host", sort=True):
            g = g.sort_values(sort_keys, ascending=sort_asc, kind="mergesort")
            rel = g.head(budget_per_host).copy()
            rel["epoch"] = epoch
            rel["host_rank"] = np.arange(len(rel), dtype=np.int64)
            released_parts.append(rel)
            remaining_parts.append(g.iloc[budget_per_host:])

        released = (
            pd.concat(released_parts, ignore_index=True)
            if released_parts
            else pd.DataFrame(columns=list(frontier.columns) + ["epoch", "host_rank"])
        )
        order_parts.append(released)
        seen.update(int(k) for k in released["url_key"])
        frontier = (
            pd.concat(remaining_parts, ignore_index=True)
            if remaining_parts
            else frontier.iloc[0:0]
        )

        epoch += 1
        if len(frontier) == 0 and not any(e >= epoch for e in reseed_epochs):
            break

    order = pd.concat(order_parts, ignore_index=True)
    order = order.sort_values(["epoch", "host", "host_rank"], kind="mergesort")
    return {
        "order": order.reset_index(drop=True),
        "seen_keys": np.sort(np.asarray(sorted(seen), dtype=np.int64)),
        "epochs": epoch,
    }
