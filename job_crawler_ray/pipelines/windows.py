"""Stream-shaped operators: windows, sessions, as-of and range joins.

The reference's streaming semantics are trailing-window WHERE
predicates over server-assigned timestamps (`/root/reference/src/
claude_job_agent/main.py:1171,1188,1204`; SURVEY.md §2.9) — no
tumbling windows or watermarks exist there. These operators add the
windowing tier a Ray Data engine needs for event streams, following
the partition-then-order pattern: partition by key (`user_id`), order
by `ts` inside the group, window with pandas. Ordering assumption:
event time is the `ts` column; late data is simply sorted into place
(batch re-processing, no watermark needed).

- tumbling window: event-time bucket = floor(ts / width) — expressed
  as a derived column + groupby, no map_groups at all (scales as a
  plain hash aggregation).
- sessionization: per-user gap > timeout starts a new session
  (classic sessionize; map_groups per user).
- as-of join: for each purchase, the user's most recent click at or
  before it (sorted backward search per group; at table scale this is
  pd.merge_asof inside co-partitioned groups).
- range join: (purchase, error) pairs of the same user within ±1 h —
  per-user group cross-filter; the partitioning assumption is that a
  single key-group fits in memory (salt hot users into sub-groups if
  not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from job_crawler_ray.util import strip_meta

SESSION_GAP_MIN = 30
RANGE_JOIN_HOURS = 1


def _events(sf_dir: str, columns=None):
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)
    return ds.map_batches(strip_meta, batch_format="pyarrow").repartition(8)


def w1_tumbling_daily(sf_dir: str) -> pa.Table:
    """Daily tumbling window per event_type: count + mean value."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        day = t["ts"].to_pandas().dt.floor("D").dt.strftime("%Y-%m-%d")
        return t.append_column("day", pa.array(day, type=pa.string()))

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="cnt"), Mean("value", alias_name="avg_value"))
        .to_pandas()
    )
    out["avg_value"] = out["avg_value"].astype(float).round(6)
    out = out.sort_values(["day", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def w3_sliding_7d(sf_dir: str) -> pa.Table:
    """7-day SLIDING window: per observed day, the trailing count and
    value sum over (day-6 … day]. Daily partials aggregate distributed
    (the only shuffle is over ~distinct-days rows); the trailing-range
    combine runs on the tiny daily table via one cumsum + two
    searchsorted passes — day gaps handled exactly like SQL's
    RANGE INTERVAL frame (calendar days, not row offsets)."""
    ds = _events(sf_dir, ["ts", "value"])

    def daily_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["ts"].dt.floor("D")
        g = df.groupby(day)["value"].agg(["size", "sum"])
        return pa.table(
            {
                "day": pa.array(g.index),
                "cnt": pa.array(g["size"].to_numpy(dtype=np.int64)),
                "value_sum": pa.array(g["sum"].to_numpy(dtype=np.float64)),
            }
        )

    from ray.data.aggregate import Sum

    daily = (
        ds.map_batches(daily_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"),
                   Sum("value_sum", alias_name="value_sum"))
        .to_pandas()
        .sort_values("day")
    )
    days = daily["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
    cnt_cum = np.concatenate(([0], np.cumsum(daily["cnt"].to_numpy())))
    val_cum = np.concatenate(([0.0], np.cumsum(daily["value_sum"].to_numpy())))
    hi = np.searchsorted(days, days, side="right")
    lo = np.searchsorted(days, days - 6, side="left")
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(daily["day"].to_numpy()).strftime("%Y-%m-%d"),
            "cnt_7d": (cnt_cum[hi] - cnt_cum[lo]).astype(np.int64),
            "value_sum_7d": np.round(val_cum[hi] - val_cum[lo], 6),
        }
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def w2_sessionize(sf_dir: str) -> pa.Table:
    """Sessions per user (gap > 30 min ⇒ new session): count + longest
    session length in events."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        sid = gap.cumsum()
        sizes = sid.groupby(sid).size()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(sizes.size)],
                "max_session_events": [int(sizes.max())],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("user_id")
    )
    return out


def j4_asof_join(sf_dir: str) -> pa.Table:
    """As-of join: each purchase event ⟵ the same user's most recent
    click at or before it (backward merge_asof within the user group)."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        p = g[g["event_type"] == "purchase"]
        c = g[g["event_type"] == "click"]
        if p.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "purchase_ts": pd.Series([], dtype="object"),
                    "last_click_ts": pd.Series([], dtype="object"),
                }
            )
        merged = pd.merge_asof(
            p[["event_id", "user_id", "ts"]].rename(columns={"ts": "purchase_ts"}),
            c[["ts"]].rename(columns={"ts": "click_ts"}),
            left_on="purchase_ts",
            right_on="click_ts",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "purchase_id": merged["event_id"].astype("int64"),
                "user_id": merged["user_id"].astype("int64"),
                "purchase_ts": merged["purchase_ts"].dt.strftime(
                    "%Y-%m-%d %H:%M:%S.%f"
                ),
                "last_click_ts": merged["click_ts"]
                .dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                .fillna(""),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(asof, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("purchase_id")
    )
    return out


def r1_range_join(sf_dir: str) -> pa.Table:
    """Range join: (purchase, error) event pairs of the same user with
    |ts_p − ts_e| ≤ 1 h. Per-user group cross-filter (documented
    partitioning assumption: a user's events fit in one group)."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"]
        e = g[g["event_type"] == "error"]
        if p.empty or e.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype="int64"),
                    "error_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                }
            )
        pt = p["ts"].to_numpy()
        et = e["ts"].to_numpy()
        d = np.abs(pt[:, None] - et[None, :])
        pi, ei = np.nonzero(d <= np.timedelta64(RANGE_JOIN_HOURS, "h"))
        return pd.DataFrame(
            {
                "purchase_id": p["event_id"].to_numpy()[pi],
                "error_id": e["event_id"].to_numpy()[ei],
                "user_id": np.full(len(pi), g["user_id"].iloc[0], dtype=np.int64),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(pairs, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort(["purchase_id", "error_id"])
    )
    return out


def w4_running_total(sf_dir: str) -> pa.Table:
    """Cumulative (UNBOUNDED-PRECEDING) running totals per day: the
    third window frame shape alongside w1's tumbling buckets and w3's
    sliding RANGE. Daily partials aggregate distributed; the prefix
    sum runs over the tiny post-agg daily table (≤ distinct days rows),
    never over raw events."""
    ds = _events(sf_dir, ["ts", "value"])

    def daily_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.assign(day=df["ts"].dt.floor("D").dt.strftime("%Y-%m-%d"))
            .groupby("day", as_index=False)
            .agg(cnt=("value", "size"), value_sum=("value", "sum"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    daily = (
        ds.map_batches(daily_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("value_sum", alias_name="value_sum"),
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    daily["cum_cnt"] = daily["cnt"].cumsum().astype("int64")
    daily["cum_value"] = daily["value_sum"].cumsum().astype(float).round(6)
    daily["cnt"] = daily["cnt"].astype("int64")
    out = daily[["day", "cnt", "cum_cnt", "cum_value"]]
    return pa.Table.from_pandas(out, preserve_index=False)


WINDOW_SQL = {
    "w4_running_total": """
        WITH daily AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS cnt,
                   sum(value) AS value_sum
            FROM events GROUP BY 1
        )
        SELECT day, cnt,
               CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
               round(sum(value_sum) OVER w, 6) AS cum_value
        FROM daily
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
        ORDER BY day
    """,
    "w3_sliding_7d": """
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, count(*) AS cnt,
                   sum(value) AS value_sum
            FROM events GROUP BY 1
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(sum(cnt) OVER w AS BIGINT) AS cnt_7d,
               round(sum(value_sum) OVER w, 6) AS value_sum_7d
        FROM daily
        WINDOW w AS (ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "w1_tumbling_daily": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type, count(*) AS cnt,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
    "w2_sessionize": f"""
        SELECT user_id,
               CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions,
               CAST(max(sess_events) AS BIGINT) AS max_session_events
        FROM (
            SELECT user_id, sid, count(*) AS sess_events
            FROM (
                SELECT user_id,
                       sum(CASE WHEN gap THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
                FROM (
                    SELECT user_id, ts,
                           coalesce(ts - lag(ts) OVER (PARTITION BY user_id
                                                       ORDER BY ts)
                                    > INTERVAL {SESSION_GAP_MIN} MINUTE,
                                    FALSE) AS gap
                    FROM events
                )
            ) GROUP BY user_id, sid
        ) GROUP BY user_id ORDER BY user_id
    """,
    "j4_asof_join": """
        SELECT p.event_id AS purchase_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               coalesce(strftime(
                   (SELECT max(c.ts) FROM events c
                    WHERE c.user_id = p.user_id AND c.event_type = 'click'
                      AND c.ts <= p.ts),
                   '%Y-%m-%d %H:%M:%S.%f'), '') AS last_click_ts
        FROM events p WHERE p.event_type = 'purchase'
        ORDER BY purchase_id
    """,
    "r1_range_join": f"""
        SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id
        FROM events p JOIN events e
          ON p.user_id = e.user_id
         AND p.event_type = 'purchase' AND e.event_type = 'error'
         AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= CAST({RANGE_JOIN_HOURS} AS BIGINT) * 3600 * 1000000
        ORDER BY purchase_id, error_id
    """,
}
