"""Relational operator suite (SURVEY.md §2) over the driver testdata.

Each function takes ``sf_dir`` and returns a small pyarrow Table /
Dataset; each has a DuckDB twin in ``job_crawler_ray.pipelines.sql``
(driver correctness gate). Mapping to the reference:

- A1 `status_breakdown`    main.py:937-945   groupby-count
- A2 `popular_top`         main.py:1166-1181 windowed grouped top-k
- A3 `top_hosts`           main.py:1183-1197 top-k by count (hot-host shape)
- A4 `by_segment`          main.py:980-983   distinct + per-key count
- A5 `success_metrics`     main.py:953-973   global conditional aggregates
- A6 `api_performance`     performance_monitor.py:64-90 windowed grouped
                           conditional sum + derived rate w/ zero-guard
- A7 `health_counts`       health_checker.py:105-116 table counts
- A8 `retention_expiry`    monitoring_service.py:82-106 cutoff filter
- J1 `left_join_summary`   main.py:901-927   LEFT JOIN + null coalesce
- J2 `anti_join_idle`      main.py:1446-1451 anti-join
- O1 `sort_recent`         main.py:907       ORDER BY date DESC (+limit)
- M1 `extract_features`    main.py:246-358   flagship extractor
- M2 `framework_truncate`  main.py:361-437   800-char truncation
- M6 `derived_dates`       main.py:813-870,916-932 temporal derivations
- M7 `benefit_classes`     main.py:1026-1041 keyword classes
- D1 `dedup_first_per_source` / `dedup_exact_text` main.py:518-527
- D2 `upsert_last_wins`    main.py:141,771-786
- D3 `distinct_pairs`      main.py:983

Conventions for oracle parity: float aggregate columns are rounded to
6 dp on BOTH sides (summation-order last-bit noise would break the
value hash); date/timestamp outputs are ISO strings; top-k sorts carry
an explicit unique tie-break key.

Scale notes: all heavy work is Dataset-native (groupby/aggregate =
shuffle; dimension joins broadcast the small side; anti-join
broadcasts the key set); only final k-row results are collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from job_crawler_ray.functions.extract import (
    extract_benefit_classes_batch,
    extract_features_batch,
)
from job_crawler_ray.util import time_bucket_strings

NOW = pd.Timestamp("2002-01-01")  # deterministic "now" for M6 (orders end 2001-08)
EVENTS_WINDOW = "2024-01-20"      # trailing-window cutoff for A2
EVENTS_WINDOW_1H = "2024-01-30"   # "last hour"-shaped cutoff for A6
RETENTION_CUTOFF = "2024-01-10"   # A8 retention boundary
ERROR_VALUE = 300.0               # conditional threshold (A5/A6)
RESPONDED_VALUE = 100.0


def _read(sf_dir: str, table: str, columns=None, blocks: int | None = None):
    """Column-pruned read; `blocks` fans single-row-group files out.
    Schema metadata is stripped (pandas-written parquet carries
    unhashable metadata that spams Ray's schema dedup on reduces)."""
    from job_crawler_ray.util import strip_meta

    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)
    ds = ds.map_batches(strip_meta, batch_format="pyarrow")
    return ds.repartition(blocks) if blocks else ds


def _round_floats(df: pd.DataFrame, cols, nd: int = 6) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype(float).round(nd)
    return df


# --- aggregations -----------------------------------------------------------


def a1_status_breakdown(sf_dir: str) -> pa.Table:
    out = (
        _read(sf_dir, "events", ["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    return pa.Table.from_pandas(out.sort_values("event_type"), preserve_index=False)


def a2_popular_top(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    cutoff = pd.Timestamp(EVENTS_WINDOW)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater(t["ts"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    out = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="cnt"), Mean("value", alias_name="avg_value"))
        .to_pandas()
    )
    out = out.sort_values(["cnt", "event_type"], ascending=[False, True]).head(3)
    return pa.Table.from_pandas(
        _round_floats(out, ["avg_value"]), preserve_index=False
    )


def a3_top_hosts(sf_dir: str) -> pa.Table:
    out = (
        _read(sf_dir, "lineitem", ["l_suppkey"])
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    out = out.sort_values(["cnt", "l_suppkey"], ascending=[False, True]).head(5)
    return pa.Table.from_pandas(out, preserve_index=False)


def a4_by_segment(sf_dir: str) -> pa.Table:
    out = (
        _read(sf_dir, "customer", ["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    return pa.Table.from_pandas(out.sort_values("c_mktsegment"), preserve_index=False)


def a5_success_metrics(sf_dir: str) -> pa.Table:
    """Global conditional aggregates, single row (A5). Partial per batch
    inside map_batches, one tiny final reduce — no groupby shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        purchase = pa.compute.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        resp = v > RESPONDED_VALUE
        return pa.table(
            {
                "total": [len(v)],
                "responded": [int(resp.sum())],
                "purchases": [int(purchase.sum())],
                "resp_value_sum": [float(v[resp].sum())],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(parts["total"].sum())
    responded = int(parts["responded"].sum())
    avg_resp = parts["resp_value_sum"].sum() / responded if responded else 0.0
    return pa.table(
        {
            "total_events": [total],
            "responded": [responded],
            "purchases": [int(parts["purchases"].sum())],
            "avg_responded_value": [round(float(avg_resp), 6)],
        }
    )


def a6_api_performance(sf_dir: str) -> pa.Table:
    """Windowed grouped conditional rollup + derived rates (A6)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    cutoff = pd.Timestamp(EVENTS_WINDOW_1H)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.greater(t["ts"], pa.scalar(cutoff)))
        df = t.to_pandas()
        df["is_err"] = (df["value"] > ERROR_VALUE).astype("int64")
        g = df.groupby("event_type", sort=True).agg(
            cnt=("value", "size"),
            value_sum=("value", "sum"),
            errors=("is_err", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("value_sum", alias_name="value_sum"),
            Sum("errors", alias_name="errors"),
        )
        .to_pandas()
    )
    rolled["avg_value"] = rolled["value_sum"] / rolled["cnt"].where(rolled["cnt"] > 0, 1)
    rolled["error_rate"] = rolled["errors"] / rolled["cnt"].where(rolled["cnt"] > 0, 1)
    rolled = rolled.drop(columns=["value_sum"])
    rolled = _round_floats(rolled, ["avg_value", "error_rate"])
    rolled[["cnt", "errors"]] = rolled[["cnt", "errors"]].astype("int64")
    return pa.Table.from_pandas(
        rolled.sort_values("event_type"), preserve_index=False
    )


def a7_health_counts(sf_dir: str) -> pa.Table:
    n_orders = _read(sf_dir, "orders", ["o_orderkey"]).count()
    n_lineitem = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    return pa.table({"orders_cnt": [n_orders], "lineitem_cnt": [n_lineitem]})


def a8_retention_expiry(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    cutoff = pd.Timestamp(RETENTION_CUTOFF)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["ts"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    out = ds.groupby("event_type").aggregate(Count(alias_name="cnt")).to_pandas()
    return pa.Table.from_pandas(out.sort_values("event_type"), preserve_index=False)


# --- joins / sorts ----------------------------------------------------------


def j1_left_join_summary(sf_dir: str):
    """orders ⟕ customer with null-side coalesce (J1, main.py:925-927).

    customer is the dimension side → broadcast via ray.put, map-side
    merge per batch (no shuffle)."""
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
        .to_pandas()
    )
    ref = ray.put(cust)

    def join(t: pa.Table) -> pa.Table:
        small = ray.get(ref)
        df = t.to_pandas()
        out = df.merge(small, left_on="o_custkey", right_on="c_custkey", how="left")
        out["customer_name"] = out["c_name"].fillna("Unknown Customer")
        out["mktsegment"] = out["c_mktsegment"].fillna("UNKNOWN")
        out["order_date"] = time_bucket_strings(out["o_orderdate"])
        return pa.Table.from_pandas(
            out[["o_orderkey", "customer_name", "mktsegment", "o_totalprice", "order_date"]],
            preserve_index=False,
        )

    return _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).map_batches(join, batch_format="pyarrow")


HIGH_VALUE = 300000.0


def j2_anti_join_idle(sf_dir: str):
    """Customers with no high-value orders (J2 anti-join): broadcast the
    key set, filter map-side — the semi/anti-join pattern for a small
    key side (reference skill anti-join, main.py:1446-1451)."""
    keys = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(
                pa.compute.greater(t["o_totalprice"], HIGH_VALUE)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    key_arr = np.sort(np.asarray(keys, dtype=np.int64))
    ref = ray.put(key_arr)

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        c = t["c_custkey"].to_numpy()
        idx = np.searchsorted(ks, c)
        present = np.zeros(len(c), dtype=bool)
        in_range = idx < ks.size
        present[in_range] = ks[idx[in_range]] == c[in_range]
        return t.filter(pa.array(~present))

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        anti, batch_format="pyarrow"
    )


def o1_sort_recent(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    out = ds.sort(["o_orderdate", "o_orderkey"], descending=[True, False]).limit(100)
    df = out.to_pandas()
    df["order_date"] = time_bucket_strings(df["o_orderdate"])
    return pa.Table.from_pandas(
        df[["o_orderkey", "order_date"]], preserve_index=False
    )


# --- per-record maps --------------------------------------------------------


def m1_extract_features(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"], blocks=16)

    def fx(t: pa.Table) -> pa.Table:
        t = extract_features_batch(
            t, description_col="text", title_col=None, salary_min_col=None
        )
        csv = pa.compute.binary_join(t["tech_stack"], ",")
        keep = t.select(
            ["doc_id", "experience_level", "remote_policy", "has_benefits", "description_length"]
        )
        return keep.append_column("tech_stack_csv", csv)

    return ds.map_batches(fx, batch_format="pyarrow")


def m2_framework_truncate(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fx(t: pa.Table) -> pa.Table:
        desc = t["text"].to_pandas().fillna("").str.slice(0, 800)
        out = t.select(["doc_id"])
        out = out.append_column("desc800", pa.array(desc, type=pa.string()))
        out = out.append_column(
            "desc800_len", pa.array(desc.str.len().to_numpy(dtype=np.int64))
        )
        return out

    return ds.map_batches(fx, batch_format="pyarrow")


def m6_derived_dates(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"])

    def fx(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        d = df["o_orderdate"]
        df["follow_up_date"] = time_bucket_strings(d + pd.Timedelta(days=7))
        df["move_on_date"] = time_bucket_strings(d + pd.Timedelta(days=30))
        df["days_since"] = (NOW - d).dt.days.astype("int64")
        df["needs_follow_up"] = (df["days_since"] >= 7) & (df["o_orderstatus"] == "O")
        return pa.Table.from_pandas(
            df[["o_orderkey", "follow_up_date", "move_on_date", "days_since", "needs_follow_up"]],
            preserve_index=False,
        )

    return ds.map_batches(fx, batch_format="pyarrow")


def m7_benefit_classes(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fx(t: pa.Table) -> pa.Table:
        t = extract_benefit_classes_batch(t, description_col="text")
        csv = pa.compute.binary_join(t["benefit_classes"], ",")
        return t.select(["doc_id"]).append_column("benefit_classes_csv", csv)

    return ds.map_batches(fx, batch_format="pyarrow")


# --- dedup / distinct -------------------------------------------------------


def d1_dedup_first_per_source(sf_dir: str):
    """First-wins dedup per source key, arrival order = doc_id (D1)."""
    from job_crawler_ray.stages.dedup import exact_dedup_first

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = exact_dedup_first(
        ds, key="source", order={"by": ["doc_id"], "ascending": [True]}
    )
    return out.sort("source")


def d1_dedup_exact_text(sf_dir: str):
    """Exact-text dedup over a corpus with real duplicates (documents
    unioned with itself), min doc_id wins — D1 at content granularity."""
    from job_crawler_ray.stages.dedup import dedup_exact_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    doubled = ds.union(_read(sf_dir, "documents", ["doc_id", "text"], blocks=8))
    out = dedup_exact_text(doubled, text_col="text", id_col="doc_id")
    return out.select_columns(["doc_id"]).sort("doc_id")


def d2_upsert_last_wins(sf_dir: str):
    """Last-writer-wins upsert per user (D2): newest ts (tie: max
    event_id) survives."""
    from job_crawler_ray.stages.dedup import exact_dedup_first

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = exact_dedup_first(
        ds,
        key="user_id",
        order={"by": ["ts", "event_id"], "ascending": [False, False]},
    )

    def fmt(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ts_str"] = df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return pa.Table.from_pandas(
            df[["user_id", "event_id", "ts_str"]], preserve_index=False
        )

    return out.map_batches(fmt, batch_format="pyarrow").sort("user_id")


def d3_distinct_pairs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def distinct_batch(t: pa.Table) -> pa.Table:
        return t.group_by(["lang", "source"]).aggregate([])

    # partial distinct per batch, then one global distinct (tiny)
    part = ds.map_batches(distinct_batch, batch_format="pyarrow")
    out = part.groupby(["lang", "source"]).aggregate(Count(alias_name="_c"))
    return out.drop_columns(["_c"]).sort(["lang", "source"])


# --- routing / broadcast-constant / limit (M8, M11, O3) ---------------------


def m8_role_classifier(sf_dir: str):
    """String-contains routing (M8, main.py:1412-1440): classify part
    types into family/tier via ordered substring checks."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def fx(t: pa.Table) -> pa.Table:
        ptype = t["p_type"].to_pandas().str.lower()
        fam = np.select(
            [
                ptype.str.contains("brass", regex=False).to_numpy(),
                ptype.str.contains("steel", regex=False).to_numpy(),
                ptype.str.contains("copper", regex=False).to_numpy(),
            ],
            ["brass", "steel", "copper"],
            default="other",
        )
        tier = np.select(
            [
                ptype.str.contains("anodized", regex=False).to_numpy(),
                ptype.str.contains("polished", regex=False).to_numpy(),
            ],
            ["senior", "mid"],
            default="junior",
        )
        out = t.select(["p_partkey"])
        out = out.append_column("family", pa.array(fam, type=pa.string()))
        return out.append_column("tier", pa.array(tier, type=pa.string()))

    return ds.map_batches(fx, batch_format="pyarrow")


MARKET_BANDS = {  # M11-style constant insight table (main.py:1211-1254)
    "AUTOMOBILE": 55000.0,
    "BUILDING": 62000.0,
    "FURNITURE": 58000.0,
    "HOUSEHOLD": 51000.0,
    "MACHINERY": 65000.0,
}


def m11_broadcast_attach(sf_dir: str):
    """Broadcast-constant attach (M11): merge a static lookup into every
    row map-side — ray.put once, dict lookup per batch, no shuffle."""
    ref = ray.put(MARKET_BANDS)

    def fx(t: pa.Table) -> pa.Table:
        bands = ray.get(ref)
        seg = t["c_mktsegment"].to_pandas()
        band = seg.map(bands).fillna(0.0)
        return t.append_column("salary_band", pa.array(band, type=pa.float64()))

    return _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        fx, batch_format="pyarrow"
    )


def o3_limit_after_dedup(sf_dir: str) -> pa.Table:
    """Order-preserving head-k after dedup (O3, main.py:527): first-
    wins per source, then first 10 in arrival (doc_id) order."""
    from job_crawler_ray.stages.dedup import exact_dedup_first

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    out = exact_dedup_first(
        ds, key="source", order={"by": ["doc_id"], "ascending": [True]}
    )
    return out.sort("doc_id").limit(10)


def m10_templates(sf_dir: str):
    """Template generator (M10, main.py:1044-1140): per-row document
    construction by string interpolation — wide derived text columns."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def fx(t: pa.Table) -> pa.Table:
        name = t["c_name"].to_pandas().fillna("")
        seg = t["c_mktsegment"].to_pandas().fillna("")
        cover = (
            "Dear " + name + ", thank you for your interest in the "
            + seg + " segment."
        )
        cv_head = name + " | segment: " + seg
        out = t.select(["c_custkey"])
        out = out.append_column("cover_letter", pa.array(cover, type=pa.string()))
        return out.append_column("cv_header", pa.array(cv_head, type=pa.string()))

    return ds.map_batches(fx, batch_format="pyarrow")


def s1_stratified_split(sf_dir: str) -> pa.Table:
    """Deterministic train/val carve of a training corpus: split =
    'val' iff doc_id % 10 == 0 (pure function of the row — stable under
    any re-partitioning, no RNG state), reported as per-(lang, source,
    split) counts. Partial counts per batch, tiny final groupby — the
    shuffle moves strata rows, not documents."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"], blocks=8)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["split"] = np.where(df["doc_id"] % 10 == 0, "val", "train")
        g = df.groupby(["lang", "source", "split"], sort=True).size()
        out = g.reset_index(name="cnt")
        return pa.Table.from_pandas(out, preserve_index=False)

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source", "split"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    rolled["cnt"] = rolled["cnt"].astype("int64")
    rolled = rolled.sort_values(["lang", "source", "split"]).reset_index(drop=True)
    return pa.Table.from_pandas(rolled, preserve_index=False)


def u1_multi_source_union(sf_dir: str):
    """Multi-source fan-in (reference: per-source try/except extend,
    main.py:507-515, second source anticipated by its tests): two
    "sources" (documents split by parity) unioned, then first-wins
    dedup per source key — Dataset.union + the dedup shuffle."""
    from job_crawler_ray.stages.dedup import exact_dedup_first

    a = _read(sf_dir, "documents", ["doc_id", "source"], blocks=4).map_batches(
        lambda t: t.filter(pa.compute.equal(pa.compute.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow",
    )
    b = _read(sf_dir, "documents", ["doc_id", "source"], blocks=4).map_batches(
        lambda t: t.filter(pa.compute.equal(pa.compute.bit_wise_and(t["doc_id"], 1), 1)),
        batch_format="pyarrow",
    )
    merged = a.union(b)
    out = exact_dedup_first(
        merged, key="source", order={"by": ["doc_id"], "ascending": [True]}
    )
    return out.sort("source")
