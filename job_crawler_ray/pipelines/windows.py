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
  before it — two-level (user, time-bucket) plan: in-bucket
  merge_asof, then a per-user prefix-max over bucket summaries fills
  the rest. No whole-user group ever forms (hot-key bounded).
- range join: (purchase, error) pairs of the same user within ±1 h —
  errors replicated to ±1 adjacent (user, bucket) groups, in-group
  sort + double-searchsorted sweep (output-linear, no cross product).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from job_crawler_ray.util import strip_meta, time_bucket_strings

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
        day = time_bucket_strings(t["ts"].to_pandas())
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
    session length in events.

    Two-level, HOT-KEY-BOUNDED plan (same shape as ``j4_asof_join`` /
    ``w20_time_in_state`` — a Zipf-head user owning half the stream
    never lands in one pandas group):

    1. group by (user, 24 h bucket): sort in-bucket, find the session
       runs (gap > 30 min splits), and emit ONE summary row per group:
       run count ``k``, first/last run length, the max length among
       interior runs (which can never merge across buckets), and the
       boundary timestamps.
    2. group by user over summaries only — ≤ #buckets rows per user,
       independent of raw event volume. A session can only span the
       bucket boundary via the last run of bucket i and the first run
       of bucket j (the next non-empty bucket), merged iff the
       boundary gap ≤ 30 min; a tiny per-user scan over the ordered
       summaries stitches those chains exactly.
    """
    ds = _events(sf_dir, ["user_id", "ts"])
    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000
    gap_ns = SESSION_GAP_MIN * 60_000_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["ts"].cast(pa.int64()).to_numpy() // bucket_ns
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def bucket_summary(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64))
        brk = np.flatnonzero(np.diff(ts) > gap_ns)
        bounds = np.concatenate(([0], brk + 1, [len(ts)]))
        lens = np.diff(bounds)  # k in-bucket run lengths, in time order
        k = len(lens)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "_bucket": [int(g["_bucket"].iloc[0])],
                "first_ts": [int(ts[0])],
                "last_ts": [int(ts[-1])],
                "k": [k],
                "first_len": [int(lens[0])],
                "last_len": [int(lens[-1])],
                "interior_max": [int(lens[1:-1].max()) if k >= 3 else 0],
            }
        )

    def merge_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_bucket")
        n_sessions = 0
        max_len = 0
        carry = 0  # open run length flowing in from the previous bucket
        prev_last = None
        for row in g.itertuples(index=False):
            if carry and prev_last is not None and row.first_ts - prev_last <= gap_ns:
                first = carry + row.first_len
            else:
                if carry:
                    n_sessions += 1
                    max_len = max(max_len, carry)
                first = row.first_len
            if row.k == 1:
                carry = first  # single run stays open into the next bucket
            else:
                n_sessions += row.k - 1  # first + interior runs all close here
                max_len = max(max_len, first, row.interior_max)
                carry = row.last_len
            prev_last = row.last_ts
        if carry:
            n_sessions += 1
            max_len = max(max_len, carry)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [n_sessions],
                "max_session_events": [max_len],
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(bucket_summary, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge_user, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("user_id")
    )
    return out


ASOF_BUCKET_HOURS = 24


def _fmt_asof(df: pd.DataFrame) -> pd.DataFrame:
    # an all-NaT block round-trips Arrow as a null-typed column →
    # object dtype in pandas; coerce before using the .dt accessor
    p_ts = pd.to_datetime(df["purchase_ts"])
    c_ts = pd.to_datetime(df["last_click_ts"])
    return pd.DataFrame(
        {
            "purchase_id": df["purchase_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "purchase_ts": p_ts.dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "last_click_ts": c_ts.dt.strftime("%Y-%m-%d %H:%M:%S.%f").fillna(""),
        }
    )


def j4_asof_join(sf_dir: str) -> pa.Table:
    """As-of join: each purchase event ⟵ the same user's most recent
    click at or before it.

    Two-level, HOT-KEY-BOUNDED plan (no whole-user pandas group — a
    Zipf-head user owning half the event stream never lands in one
    task):

    1. group by (user, 24 h bucket): local backward merge_asof.
       Purchases resolved by a same-bucket click are finished; each
       group also emits ONE summary row (its max click ts).
    2. group by user over SUMMARIES + UNRESOLVED purchases only — rows
       per group ≤ #buckets + unresolved count, independent of the
       user's raw event volume. A click in any earlier bucket is ≤
       every ts in later buckets, so the prefix-max of bucket click
       maxima IS the as-of answer for purchases unresolved in-bucket
       (searchsorted over the per-user cummax arrays).
    """
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["ts"].cast(pa.int64()).to_numpy() // bucket_ns
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "_bucket": pd.Series([], dtype="int64"),
        "_kind": pd.Series([], dtype="int64"),  # 0 summary, 1 resolved, 2 open
        "purchase_id": pd.Series([], dtype="int64"),
        "purchase_ts": pd.Series([], dtype="datetime64[ns]"),
        "last_click_ts": pd.Series([], dtype="datetime64[ns]"),
    }

    def local_asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        p = g[g["event_type"] == "purchase"]
        c = g[g["event_type"] == "click"]
        parts = []
        if not c.empty:
            parts.append(
                pd.DataFrame(
                    {
                        "user_id": [uid],
                        "_bucket": [bkt],
                        "_kind": [0],
                        "purchase_id": [0],
                        "purchase_ts": [pd.NaT],
                        "last_click_ts": [c["ts"].iloc[-1]],
                    }
                )
            )
        if not p.empty:
            merged = pd.merge_asof(
                p[["event_id", "ts"]].rename(columns={"ts": "purchase_ts"}),
                c[["ts"]].rename(columns={"ts": "click_ts"}),
                left_on="purchase_ts",
                right_on="click_ts",
                direction="backward",
            )
            parts.append(
                pd.DataFrame(
                    {
                        "user_id": uid,
                        "_bucket": bkt,
                        "_kind": np.where(merged["click_ts"].isna(), 2, 1),
                        "purchase_id": merged["event_id"].astype("int64"),
                        "purchase_ts": merged["purchase_ts"],
                        "last_click_ts": merged["click_ts"],
                    }
                )
            )
        if not parts:
            return pd.DataFrame(_empty)
        return pd.concat(parts, ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local_asof, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()  # split below reads cached narrow blocks once
    )
    resolved = level1.map_batches(
        lambda t: t.filter(pa.compute.equal(t["_kind"], 1)),
        batch_format="pyarrow",
    )

    def fill_open(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["_kind"] == 0].sort_values("_bucket")
        o = g[g["_kind"] == 2]
        if o.empty:
            return pd.DataFrame(_empty)
        filled = np.full(len(o), np.datetime64("NaT", "ns"))
        if not s.empty:
            sb = s["_bucket"].to_numpy()
            runmax = np.maximum.accumulate(
                pd.to_datetime(s["last_click_ts"]).to_numpy()
            )
            idx = np.searchsorted(sb, o["_bucket"].to_numpy(), side="left") - 1
            has = idx >= 0
            filled[has] = runmax[idx[has]]
        return pd.DataFrame(
            {
                "user_id": o["user_id"].astype("int64").to_numpy(),
                "_bucket": o["_bucket"].astype("int64").to_numpy(),
                "_kind": np.ones(len(o), dtype=np.int64),
                "purchase_id": o["purchase_id"].astype("int64").to_numpy(),
                "purchase_ts": pd.to_datetime(o["purchase_ts"]).to_numpy(),
                "last_click_ts": filled,
            }
        )

    filled = (
        level1.map_batches(
            lambda t: t.filter(
                pa.compute.not_equal(t["_kind"], 1)
            ),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(fill_open, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
    )
    out = (
        resolved.union(filled)
        .map_batches(
            lambda df: _fmt_asof(df),
            batch_format="pandas",
        )
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("purchase_id")
    )
    return out


def j17_asof_forward(sf_dir: str) -> pa.Table:
    """FORWARD as-of join: each purchase ⟵ the same user's EARLIEST
    click at or after it (next-touch attribution) — j4's mirror, same
    hot-key-bounded two-level plan. In-bucket ``merge_asof
    direction='forward'`` resolves same-bucket purchases; each bucket
    emits ONE summary row carrying its MIN click ts, and the open
    purchases are filled from the per-user SUFFIX-min of bucket
    minima (a click in any LATER bucket is ≥ every ts in earlier
    buckets). Group sizes stay ≤ #buckets + open count at any skew."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["ts"].cast(pa.int64()).to_numpy() // bucket_ns
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "_bucket": pd.Series([], dtype="int64"),
        "_kind": pd.Series([], dtype="int64"),  # 0 summary, 1 resolved, 2 open
        "purchase_id": pd.Series([], dtype="int64"),
        "purchase_ts": pd.Series([], dtype="datetime64[ns]"),
        "next_click_ts": pd.Series([], dtype="datetime64[ns]"),
    }

    def local_fwd(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        p = g[g["event_type"] == "purchase"]
        c = g[g["event_type"] == "click"]
        parts = []
        if not c.empty:
            parts.append(
                pd.DataFrame(
                    {"user_id": [uid], "_bucket": [bkt], "_kind": [0],
                     "purchase_id": [0], "purchase_ts": [pd.NaT],
                     "next_click_ts": [c["ts"].iloc[0]]}
                )
            )
        if not p.empty:
            merged = pd.merge_asof(
                p[["event_id", "ts"]].rename(columns={"ts": "purchase_ts"}),
                c[["ts"]].rename(columns={"ts": "click_ts"}),
                left_on="purchase_ts",
                right_on="click_ts",
                direction="forward",
            )
            parts.append(
                pd.DataFrame(
                    {"user_id": uid, "_bucket": bkt,
                     "_kind": np.where(merged["click_ts"].isna(), 2, 1),
                     "purchase_id": merged["event_id"].astype("int64"),
                     "purchase_ts": merged["purchase_ts"],
                     "next_click_ts": merged["click_ts"]}
                )
            )
        if not parts:
            return pd.DataFrame(_empty)
        return pd.concat(parts, ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local_fwd, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    resolved = level1.map_batches(
        lambda t: t.filter(pa.compute.equal(t["_kind"], 1)),
        batch_format="pyarrow",
    )

    def fill_open(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["_kind"] == 0].sort_values("_bucket")
        o = g[g["_kind"] == 2]
        if o.empty:
            return pd.DataFrame(_empty)
        filled = np.full(len(o), np.datetime64("NaT", "ns"))
        if not s.empty:
            sb = s["_bucket"].to_numpy()
            mins = pd.to_datetime(s["next_click_ts"]).to_numpy()
            sufmin = np.minimum.accumulate(mins[::-1])[::-1]
            idx = np.searchsorted(sb, o["_bucket"].to_numpy(), side="right")
            has = idx < len(sb)
            filled[has] = sufmin[idx[has]]
        return pd.DataFrame(
            {"user_id": o["user_id"].astype("int64").to_numpy(),
             "_bucket": o["_bucket"].astype("int64").to_numpy(),
             "_kind": np.ones(len(o), dtype=np.int64),
             "purchase_id": o["purchase_id"].astype("int64").to_numpy(),
             "purchase_ts": pd.to_datetime(o["purchase_ts"]).to_numpy(),
             "next_click_ts": filled}
        )

    filled = (
        level1.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["_kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(fill_open, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
    )

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        p_ts = pd.to_datetime(df["purchase_ts"])
        c_ts = pd.to_datetime(df["next_click_ts"])
        return pd.DataFrame(
            {"purchase_id": df["purchase_id"].astype("int64"),
             "user_id": df["user_id"].astype("int64"),
             "purchase_ts": p_ts.dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
             "next_click_ts": c_ts.dt.strftime(
                 "%Y-%m-%d %H:%M:%S.%f").fillna("")}
        )

    return (
        resolved.union(filled)
        .map_batches(fmt, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("purchase_id")
    )


RANGE_BUCKET_HOURS = 6  # must be ≥ RANGE_JOIN_HOURS for ±1-bucket overlap


def r1_range_join(sf_dir: str) -> pa.Table:
    """Range join: (purchase, error) event pairs of the same user with
    |ts_p − ts_e| ≤ 1 h.

    HOT-KEY-BOUNDED interval-overlap plan: purchases keep their home
    (user, 6 h bucket); errors are replicated to the ±1 adjacent
    buckets (any pair within 1 h < bucket width is co-grouped; each
    pair is emitted once because the purchase lives in exactly one
    group). In-group matching is a sort + double-searchsorted window
    sweep — O((p+e)·log e + output), never the old O(p×e) cross
    product, and group size is bounded by per-bucket density, not by
    the user's total event volume."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    bucket_ns = RANGE_BUCKET_HOURS * 3_600_000_000_000

    def explode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        b = df["ts"].astype("int64").to_numpy() // bucket_ns
        isp = (df["event_type"] == "purchase").to_numpy()
        ise = (df["event_type"] == "error").to_numpy()
        p = df[isp].assign(_bucket=b[isp])
        e = df[ise]
        eb = b[ise]
        reps = [e.assign(_bucket=eb + off) for off in (-1, 0, 1)]
        out = pd.concat([p, *reps], ignore_index=True)[
            ["event_id", "user_id", "event_type", "ts", "_bucket"]
        ]
        return strip_meta(pa.Table.from_pandas(out, preserve_index=False))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"]
        e = g[g["event_type"] == "error"].sort_values("ts", kind="mergesort")
        if p.empty or e.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype="int64"),
                    "error_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                }
            )
        pt = p["ts"].to_numpy().astype("datetime64[ns]").view("int64")
        et = e["ts"].to_numpy().astype("datetime64[ns]").view("int64")
        w = RANGE_JOIN_HOURS * 3_600_000_000_000
        lo = np.searchsorted(et, pt - w, side="left")
        hi = np.searchsorted(et, pt + w, side="right")
        counts = hi - lo
        total = int(counts.sum())
        pi = np.repeat(np.arange(len(pt)), counts)
        starts = np.repeat(lo, counts)
        ei = starts + (
            np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        return pd.DataFrame(
            {
                "purchase_id": p["event_id"].to_numpy()[pi],
                "error_id": e["event_id"].to_numpy()[ei],
                "user_id": np.full(total, g["user_id"].iloc[0], dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
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
            df.assign(day=time_bucket_strings(df["ts"]))
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


def w5_lead_lag(sf_dir: str) -> pa.Table:
    """LAG: seconds since the same user's previous event (any type) —
    the window-function projection shape (feature: inter-event gap).

    Same two-level hot-key-bounded plan as j4: group by (user, 24 h
    bucket) and diff in-bucket; the FIRST event of each bucket needs
    the user's max ts over earlier buckets, which is the per-user
    prefix-max of one summary row per (user, bucket) — never the
    user's raw history in one task. Ties broken by event_id, matching
    the SQL twin's ORDER BY ts, event_id."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["ts"].cast(pa.int64()).to_numpy() // bucket_ns
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "_bucket": pd.Series([], dtype="int64"),
        "_kind": pd.Series([], dtype="int64"),  # 0 summary, 1 done, 2 first
        "event_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[ns]"),
        "prev_ts": pd.Series([], dtype="datetime64[ns]"),
    }

    def local_lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        prev = g["ts"].shift(1)
        out = pd.DataFrame(
            {
                "user_id": uid,
                "_bucket": bkt,
                "_kind": np.where(prev.isna(), 2, 1),
                "event_id": g["event_id"].astype("int64").to_numpy(),
                "ts": g["ts"].to_numpy(),
                "prev_ts": prev.to_numpy(),
            }
        )
        summary = pd.DataFrame(
            {
                "user_id": [uid],
                "_bucket": [bkt],
                "_kind": [0],
                "event_id": [0],
                "ts": [g["ts"].iloc[-1]],
                "prev_ts": [pd.NaT],
            }
        )
        return pd.concat([out, summary], ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local_lag, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    done = level1.map_batches(
        lambda t: t.filter(pa.compute.equal(t["_kind"], 1)),
        batch_format="pyarrow",
    )

    def fill_first(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["_kind"] == 0].sort_values("_bucket")
        o = g[g["_kind"] == 2]
        if o.empty:
            return pd.DataFrame(_empty)
        prev = np.full(len(o), np.datetime64("NaT", "ns"))
        if not s.empty:
            sb = s["_bucket"].to_numpy()
            runmax = np.maximum.accumulate(pd.to_datetime(s["ts"]).to_numpy())
            idx = np.searchsorted(sb, o["_bucket"].to_numpy(), side="left") - 1
            has = idx >= 0
            prev[has] = runmax[idx[has]]
        return pd.DataFrame(
            {
                "user_id": o["user_id"].astype("int64").to_numpy(),
                "_bucket": o["_bucket"].astype("int64").to_numpy(),
                "_kind": np.ones(len(o), dtype=np.int64),
                "event_id": o["event_id"].astype("int64").to_numpy(),
                "ts": pd.to_datetime(o["ts"]).to_numpy(),
                "prev_ts": prev,
            }
        )

    filled = (
        level1.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["_kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(fill_first, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
    )

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df["ts"])
        prev = pd.to_datetime(df["prev_ts"])
        gap = (ts - prev).dt.total_seconds().round(6)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "gap_s": gap,
            }
        )

    return (
        done.union(filled)
        .map_batches(fmt, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("event_id")
    )


WINDOW_SQL = {
    "w5_lead_lag": """
        SELECT event_id, user_id,
               round(epoch_us(ts - lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id))
                   / 1000000.0, 6) AS gap_s
        FROM events ORDER BY event_id
    """,
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
    "j17_asof_forward": """
        SELECT p.event_id AS purchase_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               coalesce(strftime(
                   (SELECT min(c.ts) FROM events c
                    WHERE c.user_id = p.user_id AND c.event_type = 'click'
                      AND c.ts >= p.ts),
                   '%Y-%m-%d %H:%M:%S.%f'), '') AS next_click_ts
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
