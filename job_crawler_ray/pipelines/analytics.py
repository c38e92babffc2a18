"""Second-wave analytics operators: Bloom anti-join, exact two-pass
heavy hitters, pivot/crosstab, ROLLUP aggregates, deterministic
per-group sampling.

Each op follows the house pattern: vectorized partials inside
``map_batches`` (the per-batch state is O(capacity), never O(rows)),
one tiny driver or groupby reduce, DuckDB twin in
:func:`analytics_oracle_sql` with identical column names / rounding /
tie-breaks.

Scale design notes (what each op ships at 100 TB):

- ``j5_bloom_anti_join``: the build side is folded into a FIXED-SIZE
  bit array (128 KiB) by per-batch partial bitmaps OR-merged on the
  driver — the broadcast cost is independent of build cardinality,
  unlike J2's sorted key array. Bloom-negative probe rows (the bulk,
  for a selective anti-join) are exact non-members and stream straight
  through; only bloom-positive candidates pay the exact membership
  check (broadcast keys under a cap, id-bucketed fragment store +
  actor pool above it — the `_IdSetFilter` machinery from textops).
- ``a12_heavy_hitters``: per-batch truncated count sketches (top-C by
  count, C fixed) with a per-batch dropped-count bound; candidates =
  ids whose summed lower bound + total bound reach the k-th count;
  pass 2 re-counts ONLY the candidates exactly. The driver sketch is
  itself MG-compressed whenever it exceeds 4C, so driver state is
  O(C), never O(distinct ids) or O(blocks).
- ``a11_pivot`` / ``a13_rollup``: per-batch pandas pivots shrink each
  block to |days × types| rows before the groupby shuffle; ROLLUP's
  coarser levels are derived from the already-aggregated finest level
  (≤ |days × types| rows) on the driver, not from a second pass.
- ``s6_group_sample``: deterministic reservoir-style per-group sample
  — per-batch top-n by md5(id) per group, then a driver merge over
  ≤ blocks × groups × n rows. The md5 order makes the sample exactly
  reproducible across engines (DuckDB twin sorts by the same digest).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from job_crawler_ray.corpus import mix64
from job_crawler_ray.pipelines.relational import _read, _round_floats
from job_crawler_ray.util import (
    driver_row_cap,
    scratch_dir,
    strip_meta,
    time_bucket_strings,
)

_u64 = np.uint64

# --- J5: Bloom-prefiltered anti-join ----------------------------------------

# rows a driver-built broadcast lookup (dimension / cohort / count
# attach) may hold before the op must switch to its documented
# partitioned alternative — guarded LOUDLY (the _collect_vocab
# contract), never silently exceeded
ATTACH_BROADCAST_LIMIT = 50_000_000

BLOOM_BITS = 1 << 20          # 128 KiB bitmap — fixed broadcast cost
BLOOM_K = 4                   # hash probes per key
BLOOM_SALTS = (101, 202, 303, 404)
# candidates above this go through the fragment-store membership check
# instead of a broadcast key array (same tiering as textops cascades)
ANTI_KEY_BROADCAST_LIMIT = 20_000_000


def _bloom_word_bit(keys: np.ndarray, salt: int) -> tuple[np.ndarray, np.ndarray]:
    pos = mix64(keys.astype(np.int64).view(_u64), salt) % _u64(BLOOM_BITS)
    return (pos >> _u64(6)).astype(np.int64), (pos & _u64(63))


def _partial_bloom(keys: np.ndarray) -> np.ndarray:
    """Per-batch bloom bitmap as a uint64 word array (BLOOM_BITS/64)."""
    words = np.zeros(BLOOM_BITS >> 6, dtype=_u64)
    for salt in BLOOM_SALTS:
        w, b = _bloom_word_bit(keys, salt)
        np.bitwise_or.at(words, w, _u64(1) << b)
    return words


def _bloom_maybe_member(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """True where ALL k probed bits are set (possible member)."""
    m = np.ones(len(keys), dtype=bool)
    for salt in BLOOM_SALTS:
        w, b = _bloom_word_bit(keys, salt)
        m &= (words[w] >> b) & _u64(1) != 0
    return m


def bloom_anti_join(
    probe_ds,
    build_ds,
    probe_key: str,
    build_key: str,
):
    """Rows of ``probe_ds`` whose ``probe_key`` does NOT appear in
    ``build_ds[build_key]`` — exact result, bloom-accelerated.

    Stage 1 folds the build side into per-batch 128 KiB bitmaps merged
    with a driver OR (cost independent of build rows). Stage 2 streams
    the probe side: bloom-negatives are definite keeps; positives are
    candidates. Stage 3 exact-checks candidates only — broadcast
    sorted distinct keys under ``ANTI_KEY_BROADCAST_LIMIT``, else an
    id-bucketed fragment store read by an actor pool.

    The build lineage executes EXACTLY ONCE: the key column is
    materialized up front (keys only — the narrow side), the bloom
    partials carry per-batch row counts so the tier decision needs no
    separate ``count()`` pass, and both exact-check tiers read the
    materialized keys (round-3 ran the filtered build chain 2-3×:
    partials, count(), then unique()/fragment write)."""
    build_keys = build_ds.select_columns([build_key]).materialize()
    parts = build_keys.map_batches(
        lambda t: pa.table(
            {
                "words": [_partial_bloom(t[build_key].to_numpy()).tobytes()],
                "n": [len(t)],
            }
        ),
        batch_format="pyarrow",
    )
    words = np.zeros(BLOOM_BITS >> 6, dtype=_u64)
    build_rows = 0
    for tb in parts.iter_batches(batch_format="pyarrow", batch_size=64):
        for buf in tb["words"]:
            words |= np.frombuffer(buf.as_py(), dtype=_u64)
        build_rows += int(pa.compute.sum(tb["n"]).as_py() or 0)
    words_ref = ray.put(words)

    def split(t: pa.Table) -> pa.Table:
        w = ray.get(words_ref)
        cand = _bloom_maybe_member(w, t[probe_key].to_numpy())
        return t.append_column("_bloom_cand", pa.array(cand))

    flagged = probe_ds.map_batches(split, batch_format="pyarrow")
    keeps = flagged.map_batches(
        lambda t: t.filter(pa.compute.invert(t["_bloom_cand"])).drop_columns(
            ["_bloom_cand"]
        ),
        batch_format="pyarrow",
    )
    cands = flagged.map_batches(
        lambda t: t.filter(t["_bloom_cand"]).drop_columns(["_bloom_cand"]),
        batch_format="pyarrow",
    )

    # exact check for candidates: tiered like the textops cascades.
    # The tier is decided on the CHEAP row count (an upper bound on
    # distinct keys) so the above-cap path never collects the key set
    # on the driver — build rows flow batch-unique → hash-bucketed
    # fragment store, and duplicate drop_ids across batches are
    # harmless to the sorted-membership check.
    if build_rows <= ANTI_KEY_BROADCAST_LIMIT:
        distinct = build_keys.unique(build_key)
        # empty/NULL-keyed build rows match nothing (unique() returns
        # None for an empty Dataset and surfaces NULL keys as None)
        key_arr = np.sort(
            np.asarray(
                [v for v in (distinct or []) if v is not None],
                dtype=np.int64,
            )
        )
        ref = ray.put(key_arr)

        def verify(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            c = t[probe_key].to_numpy()
            idx = np.searchsorted(ks, c)
            present = np.zeros(len(c), dtype=bool)
            in_r = idx < ks.size
            present[in_r] = ks[idx[in_r]] == c[in_r]
            return t.filter(pa.array(~present))

        survivors = cands.map_batches(verify, batch_format="pyarrow")
    else:
        import shutil

        from job_crawler_ray.pipelines import textops as T

        frag_dir = scratch_dir("jcr_bloom_anti_")

        def add_dbucket(t: pa.Table) -> pa.Table:
            keys = np.unique(t[build_key].to_numpy())
            db = (
                mix64(keys.view(_u64), 505) % _u64(T.SIM_FRAGS)
            ).astype(np.int64)
            return pa.table(
                {
                    "drop_id": pa.array(keys, pa.int64()),
                    "dbucket": pa.array(db),
                }
            )

        build_keys.map_batches(
            add_dbucket, batch_format="pyarrow"
        ).write_parquet(frag_dir, partition_cols=["dbucket"])
        survivors = cands.map_batches(
            T._IdSetFilter,
            fn_constructor_kwargs=dict(frag_dir=frag_dir, id_col=probe_key),
            batch_format="pyarrow",
            concurrency=(1, 8),
            max_restarts=0,
        ).materialize()
        shutil.rmtree(frag_dir, ignore_errors=True)
    return keeps.union(survivors)


def j5_bloom_anti_join(sf_dir: str) -> pa.Table:
    """Customers with no high-value orders (J2's anti-join semantics,
    J5's bloom-prefiltered mechanism — results pinned equal to the
    NOT IN oracle and to j2 itself)."""
    from job_crawler_ray.pipelines.relational import HIGH_VALUE

    probe = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    build = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(
            pa.compute.greater(t["o_totalprice"], HIGH_VALUE)
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    out = bloom_anti_join(probe, build, "c_custkey", "o_custkey")
    df = out.to_pandas()
    if df.empty:  # empty unions drop the schema entirely
        df = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                           "c_name": pd.Series(dtype=object)})
    df = df.sort_values("c_custkey").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# --- A12: exact two-pass heavy hitters --------------------------------------

HH_CAPACITY = 512   # per-batch summary rows kept (fixed, not O(distinct))


def heavy_hitters(ds, key_col: str, k: int, capacity: int = HH_CAPACITY):
    """Exact top-k most frequent values of ``key_col``.

    Pass 1: per-batch Misra-Gries summaries — exact in-batch counts,
    then the MG decrement (subtract the (C+1)-th largest count δ_b from
    every counter, drop non-positive ones). The per-batch underestimate
    is ≤ δ_b ≤ n_b/(C+1), so the summed sketch underestimates any value
    by at most bound = Σ δ_b ≤ n/(C+1) — INDEPENDENT of batch count,
    unlike naive per-batch top-C truncation. Candidates = retained
    values whose sketch count + bound reaches the current k-th sketch
    count (any value dropped everywhere has true count ≤ bound, so it
    cannot displace a certified k-th place). Pass 2 re-counts the
    candidates exactly (broadcast candidate array) and takes the true
    top-k with a deterministic id tie-break.

    The result is certified exact when the k-th exact count > bound
    (always true when batches have ≤ capacity distinct values, since
    then δ_b = 0 everywhere). ``a12_heavy_hitters``'s capacity of 512
    certifies at every test scale; callers pushing capacity below
    n/f_k get a ValueError instead of a silently-approximate answer."""

    def partial(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(t[key_col].to_numpy(), return_counts=True)
        delta = 0
        if vals.size > capacity:
            order = np.argsort(-counts, kind="stable")
            delta = int(counts[order[capacity]])
            counts = counts - delta
            keep = counts > 0
            vals, counts = vals[keep], counts[keep]
        # one marker row per source batch carries δ_b (is_bound=True);
        # marker rows survive any downstream re-batching
        return pa.table(
            {
                "hh_key": pa.array(
                    np.concatenate([vals, np.zeros(1, dtype=np.int64)]),
                    type=pa.int64(),
                ),
                "cnt": pa.array(
                    np.concatenate([counts.astype(np.int64), [np.int64(delta)]]),
                    type=pa.int64(),
                ),
                "is_bound": pa.array(
                    np.concatenate([np.zeros(vals.size, bool), [True]])
                ),
            }
        )

    def mg_compress(sums: dict[int, int]) -> int:
        """Decrement the merged sketch back to ``capacity`` entries;
        returns the δ added to the error bound (0 if under capacity)."""
        if len(sums) <= capacity:
            return 0
        counts = np.fromiter(sums.values(), dtype=np.int64, count=len(sums))
        delta = int(np.partition(counts, -capacity - 1)[-capacity - 1])
        for key in [k for k, c in sums.items() if c <= delta]:
            del sums[key]
        for key in sums:
            sums[key] -= delta
        return delta

    sums: dict[int, int] = {}
    bound = 0
    for tb in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 16
    ):
        is_b = tb["is_bound"].to_numpy(zero_copy_only=False)
        ks = tb["hh_key"].to_numpy()
        cs = tb["cnt"].to_numpy()
        bound += int(cs[is_b].sum())
        for key, c in zip(ks[~is_b].tolist(), cs[~is_b].tolist()):
            sums[key] = sums.get(key, 0) + c
        # keep the driver sketch O(capacity), not O(blocks × capacity):
        # the MG decrement on the MERGED sketch adds its δ to the bound
        if len(sums) > 4 * capacity:
            bound += mg_compress(sums)
    if not sums:
        return pa.table({key_col: pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
    keys = np.fromiter(sums.keys(), dtype=np.int64, count=len(sums))
    cnts = np.fromiter(sums.values(), dtype=np.int64, count=len(sums))
    order = np.lexsort((keys, -cnts))
    kth = cnts[order[min(k, len(order)) - 1]]
    cand = keys[cnts + bound >= kth]
    cand.sort()
    ref = ray.put(cand)

    def exact_partial(t: pa.Table) -> pa.Table:
        cs = ray.get(ref)
        v = t[key_col].to_numpy()
        idx = np.searchsorted(cs, v)
        ok = np.zeros(len(v), dtype=bool)
        in_r = idx < cs.size
        ok[in_r] = cs[idx[in_r]] == v[in_r]
        vals, counts = np.unique(v[ok], return_counts=True)
        return pa.table(
            {
                "hh_key": pa.array(vals, type=pa.int64()),
                "cnt": pa.array(counts, type=pa.int64()),
            }
        )

    exact: dict[int, int] = {}
    for tb in ds.map_batches(exact_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 16
    ):
        for key, c in zip(tb["hh_key"].to_numpy().tolist(), tb["cnt"].to_numpy().tolist()):
            exact[key] = exact.get(key, 0) + c
    ek = np.fromiter(exact.keys(), dtype=np.int64, count=len(exact))
    ec = np.fromiter(exact.values(), dtype=np.int64, count=len(exact))
    order = np.lexsort((ek, -ec))[:k]
    kth = int(ec[order[k - 1]]) if len(order) >= k else 0
    if bound > 0 and kth <= bound:
        # fewer than k candidates, or a k-th place a dropped value could
        # still beat: the answer would be silently approximate — refuse
        raise ValueError(
            f"heavy_hitters cannot certify exactness: k-th count "
            f"{kth} <= error bound {bound}; raise capacity "
            f"(needs > n / f_k)"
        )
    return pa.table(
        {key_col: pa.array(ek[order]), "cnt": pa.array(ec[order])}
    )


def a12_heavy_hitters(sf_dir: str) -> pa.Table:
    """Top-20 most active users by event count (exact, two-pass)."""
    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", k=20)


# --- A11: pivot / crosstab ---------------------------------------------------

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def a11_pivot(sf_dir: str) -> pa.Table:
    """Daily event counts pivoted to one column per event type.

    Per-batch pandas crosstab shrinks each block to |days| rows before
    the groupby shuffle; unseen types materialize as zero columns so
    the schema is fixed."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = time_bucket_strings(df["ts"])
        x = pd.crosstab(df["day"], df["event_type"])
        for ty in PIVOT_TYPES:
            if ty not in x.columns:
                x[ty] = 0
        x = x[PIVOT_TYPES].astype("int64").reset_index()
        # stripped: pandas-metadata blocks entering the groupby shuffle
        # trip Ray's schema-dedup hashing on reduce tasks
        return strip_meta(pa.Table.from_pandas(x, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(*[Sum(ty, alias_name=ty) for ty in PIVOT_TYPES])
        .to_pandas()
    )
    out[PIVOT_TYPES] = out[PIVOT_TYPES].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("day").reset_index(drop=True), preserve_index=False
    )


# --- A13: ROLLUP levels -------------------------------------------------------


def a13_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP(event_type, day) counts and value sums: finest level via
    partial-agg + groupby, coarser levels derived from the (tiny)
    aggregated finest frame on the driver — no second corpus pass."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = time_bucket_strings(df["ts"])
        g = (
            df.groupby(["event_type", "day"], sort=False)
            .agg(cnt=("value", "size"), value_sum=("value", "sum"))
            .reset_index()
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(
            Sum("cnt", alias_name="cnt"), Sum("value_sum", alias_name="value_sum")
        )
        .to_pandas()
    )
    lvl1 = (
        finest.groupby("event_type", as_index=False)
        .agg(cnt=("cnt", "sum"), value_sum=("value_sum", "sum"))
    )
    lvl1["day"] = None
    lvl0 = pd.DataFrame(
        {
            "event_type": [None],
            "day": [None],
            "cnt": [finest["cnt"].sum()],
            "value_sum": [finest["value_sum"].sum()],
        }
    )
    out = pd.concat(
        [lvl0, lvl1[["event_type", "day", "cnt", "value_sum"]], finest],
        ignore_index=True,
    )
    out["cnt"] = out["cnt"].astype("int64")
    out = _round_floats(out, ["value_sum"])
    out = out.sort_values(
        ["event_type", "day"], na_position="first"
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- S6: deterministic per-group sample --------------------------------------

GROUP_SAMPLE_N = 5


def s6_group_sample(sf_dir: str, n: int = GROUP_SAMPLE_N) -> pa.Table:
    """Deterministic per-language sample of ``n`` documents: order by
    md5(doc_id) within each lang (an engine-independent coin), keep the
    first n. Per-batch partial top-n bounds the merge at
    blocks × langs × n rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["md5"] = [
            hashlib.md5(str(v).encode()).hexdigest() for v in df["doc_id"]
        ]
        df = df.sort_values(["lang", "md5", "doc_id"])
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(n), preserve_index=False
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["lang", "md5", "doc_id"])
    out = parts.groupby("lang", sort=True).head(n).copy()
    out["sample_rank"] = out.groupby("lang").cumcount() + 1
    out = out[["lang", "doc_id", "sample_rank"]].reset_index(drop=True)
    out["sample_rank"] = out["sample_rank"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- G2: per-group top-n -------------------------------------------------------

TOP_PER_GROUP_N = 3


def top_n_per_group(ds, group_col: str, order_col: str, tie_col: str, n: int):
    """Top-``n`` rows per group by ``order_col`` DESC (``tie_col`` ASC
    breaks ties deterministically).

    Per-batch partial top-n caps every group's shuffle contribution at
    blocks × n rows — the final ``map_groups`` never sees a whole
    group, no matter how skewed ``group_col`` is (contrast a naive
    groupby().map_groups over raw rows, which materializes the hottest
    group in one task)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            [group_col, order_col, tie_col], ascending=[True, False, True]
        )
        return strip_meta(
            pa.Table.from_pandas(
                df.groupby(group_col, sort=False).head(n), preserve_index=False
            )
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, tie_col], ascending=[False, True]).head(n)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finalize, batch_format="pandas")
    )


def g2_top_per_group(sf_dir: str) -> pa.Table:
    """Top-3 events per user by value (grouped rank / windowed top-n)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    out = top_n_per_group(
        ds, "user_id", "value", "event_id", TOP_PER_GROUP_N
    ).to_pandas()
    out = _round_floats(out, ["value"])
    out = out[["user_id", "event_id", "value", "rnk"]].sort_values(
        ["user_id", "rnk"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- J6: big-big shuffle hash join ---------------------------------------------

HASH_JOIN_PARTITIONS = 16


def j6_hash_join(sf_dir: str) -> pa.Table:
    """Revenue per order priority via a SHUFFLE hash join of two large
    tables (lineitem ⋈ orders on orderkey) — the big-big join path
    that broadcast joins (J1/J3) can't cover. Both sides hash-partition
    on the key into ``HASH_JOIN_PARTITIONS`` independent joins (Ray
    Data's native `Dataset.join`); the post-join rollup shrinks each
    block to |priorities| rows before the tiny final groupby.

    Sums reach ~6e8 at sf0.01, where float64 summation-order noise is
    ~1e-3 — revenue is rounded to 2 dp (not the house 6) so the value
    hash is order-insensitive."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        od,
        "inner",
        num_partitions=HASH_JOIN_PARTITIONS,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # exact int64 ten-thousandths (the j11 rule): a float SUM lands
        # exactly on .xx5 cells and flips a cent on summation order
        df["revenue_e4"] = np.rint(
            df["l_extendedprice"].to_numpy() * 100
        ).astype(np.int64) * np.rint(
            (1.0 - df["l_discount"].to_numpy()) * 100
        ).astype(np.int64)
        g = df.groupby("o_orderpriority", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"), cnt=("revenue_e4", "size")
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out["revenue"] = out.pop("revenue_e4") / 10000.0
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("o_orderpriority").reset_index(drop=True),
        preserve_index=False,
    )


# --- A14: per-key count-distinct -----------------------------------------------


def a14_daily_distinct(sf_dir: str) -> pa.Table:
    """Distinct users per day (grouped count-distinct).

    Per-batch pair dedup → pair-level groupby (the only full shuffle,
    over ALREADY-DEDUPED pairs) → per-batch day counts → tiny day
    groupby. No stage ever holds a whole day's users in one task."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pair_distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = time_bucket_strings(df["ts"])
        return strip_meta(
            pa.Table.from_pandas(
                df[["day", "user_id"]].drop_duplicates(), preserve_index=False
            )
        )

    pairs = (
        ds.map_batches(pair_distinct, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )

    def day_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("day", as_index=False).agg(n_users=("user_id", "size"))
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        pairs.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("day").reset_index(drop=True), preserve_index=False
    )


# --- D6: incremental corpus ingest dedup ----------------------------------------


def d6_incremental_ingest(sf_dir: str) -> pa.Table:
    """Incremental exact-text dedup of a NEW batch against an EXISTING
    corpus — the daily-ingest step of a production pipeline. Existing =
    doc_id % 3 == 0, new = the rest; survivors are new docs whose text
    never appeared in the existing corpus.

    Both sides key on an int64 content hash (blake2b-64 — collision
    odds negligible, see hashing.content_keys), then reuse
    :func:`bloom_anti_join`: the existing corpus folds to a fixed
    128 KiB bitmap however big it is, and only bloom-positive new docs
    pay the exact key check."""
    from job_crawler_ray.hashing import content_keys

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        texts = pa.compute.fill_null(t["text"], "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "_ckey": pa.array(content_keys(texts).view(np.int64)),
            }
        )

    def keyed_tagged(t: pa.Table) -> pa.Table:
        k = keyed(t)
        return k.append_column(
            "_existing", pa.array(k["doc_id"].to_numpy() % 3 == 0)
        )

    # hash once: both split sides filter the same materialized narrow
    # (doc_id, _ckey, _existing) dataset instead of re-running
    # content_keys over the full text in two separate executions
    keyed_ds = docs.map_batches(keyed_tagged, batch_format="pyarrow").materialize()
    existing = keyed_ds.map_batches(
        lambda t: t.filter(t["_existing"]).drop_columns(["_existing"]),
        batch_format="pyarrow",
    )
    new = keyed_ds.map_batches(
        lambda t: t.filter(pa.compute.invert(t["_existing"])).drop_columns(
            ["_existing"]
        ),
        batch_format="pyarrow",
    )
    out = bloom_anti_join(new, existing, "_ckey", "_ckey")
    df = out.to_pandas()
    if df.empty:
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    df = df[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# --- G3: iterative PageRank ------------------------------------------------------

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 2
PAGERANK_EDGE_MULTS = ((31, 7), (57, 13), (91, 23))
# floor for the width-derived join fan-out (pagerank defaults to
# cpus // 2; fixed per-partition aggregator cost dominates tiny inputs,
# so the floor keeps the 500-node test graph from over-partitioning)
PAGERANK_PARTITIONS = 2
# edge rows per join partition: partitions scale with DATA first
# (edges / this), then cap at 4× cluster width — a width-derived
# fan-out alone made the sf0.01 dry run pay 16 partitions × 4 joins of
# pure per-partition aggregator setup (29 s for 1,500 edges)
PAGERANK_ROWS_PER_PARTITION = 2_000_000
# node count under which the rank vector is broadcast (ray.put of two
# n-length arrays, ~80 MB at the cap) and each iteration is ONE
# map_batches over edges + a shrunken dst-groupby — no hash join.
# Above it, rank state never leaves the object store and each
# iteration pays the two shuffle joins (the 10^9-node tier).
PAGERANK_BROADCAST_NODES = 5_000_000
# edge count under which the whole graph fits the driver and the
# iteration loop is pure numpy (no per-iteration distributed fixed
# costs at all — the minhash-style whole-cascade fast path)
PAGERANK_DRIVER_EDGES = 2_000_000


def pagerank(nodes, edges, n: int, out_degree: int, n_iter: int,
             damping: float = PAGERANK_DAMPING,
             num_partitions: int | None = None):
    """Iterative PageRank as distributed dataflow: each iteration is
    one big-big hash join (ranks onto edges by src — ranks are O(nodes)
    and never broadcast), a per-batch partial contribution rollup, a
    dst groupby, and a left-outer join back onto the node set so
    zero-in-degree nodes keep the teleport mass. The driver holds
    nothing but loop control — rank state lives in the object store
    between iterations.

    Ranks are MATERIALIZED once per iteration: the lazy plan would
    otherwise deepen by two joins + a groupby every round (recompute
    risk on block eviction, unbounded optimizer input at n_iter=50).
    Each iteration's wall time is therefore flat. ``num_partitions``
    defaults to the cluster CPU width (capped at test scale by
    PAGERANK_PARTITIONS when the cluster is tiny)."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        by_data = -(-(n * out_degree) // PAGERANK_ROWS_PER_PARTITION)
        num_partitions = int(
            min(max(PAGERANK_PARTITIONS, by_data), max(2, 4 * cpus))
        )
    nodes = nodes.materialize()  # joined against every iteration
    edges = edges.materialize()  # likewise; never re-derive per round
    if n * out_degree <= PAGERANK_DRIVER_EDGES:
        return _pagerank_driver(nodes, edges, n, out_degree, n_iter, damping)
    if n <= PAGERANK_BROADCAST_NODES:
        return _pagerank_broadcast(nodes, edges, n, out_degree, n_iter,
                                   damping)
    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "rank": pa.array(np.full(t.num_rows, 1.0 / n)),
            }
        ),
        batch_format="pyarrow",
    )
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contribs = edges.join(
            ranks,
            "inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("doc_id",),
        )

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["c"] = df["rank"] / out_degree
            g = df.groupby("dst", as_index=False).agg(s=("c", "sum"))
            return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

        sums = (
            contribs.map_batches(partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("s", alias_name="s"))
        )
        merged = nodes.join(
            sums,
            "left_outer",
            num_partitions=num_partitions,
            on=("doc_id",),
            right_on=("dst",),
        )

        def apply_rank(t: pa.Table) -> pa.Table:
            s = t["s"].to_pandas().fillna(0.0).to_numpy()
            return pa.table(
                {"doc_id": t["doc_id"], "rank": pa.array(base + damping * s)}
            )

        ranks = merged.map_batches(apply_rank, batch_format="pyarrow").materialize()
    return ranks


def _pagerank_driver(nodes, edges, n: int, out_degree: int, n_iter: int,
                     damping: float):
    """Whole-graph driver tier (edges ≤ PAGERANK_DRIVER_EDGES): one
    collect of the edge list, then the iteration loop is two numpy
    gathers per round — zero per-iteration distributed fixed cost.
    Tier equality with the distributed paths is pinned by test."""
    node_ids = np.sort(nodes.to_pandas()["doc_id"].to_numpy())
    edf = edges.to_pandas()
    src = edf["src"].to_numpy()
    dst = edf["dst"].to_numpy()
    spos = np.clip(np.searchsorted(node_ids, src), 0, n - 1)
    dpos = np.clip(np.searchsorted(node_ids, dst), 0, n - 1)
    s_ok = node_ids[spos] == src
    ok = s_ok & (node_ids[dpos] == dst)
    spos, dpos = spos[ok], dpos[ok]
    rank_vec = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        s = np.zeros(n)
        np.add.at(s, dpos, rank_vec[spos] / out_degree)
        rank_vec = base + damping * s
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(node_ids, pa.int64()),
                  "rank": pa.array(rank_vec)})
    )


def _pagerank_broadcast(nodes, edges, n: int, out_degree: int, n_iter: int,
                        damping: float):
    """Broadcast-rank tier (n ≤ PAGERANK_BROADCAST_NODES): the rank
    vector is two sorted n-length arrays shipped once per iteration
    via ``ray.put``; each iteration is one vectorized map_batches over
    the edge set (searchsorted src → rank, per-batch dst rollup) plus
    a dst groupby of the SHRUNKEN partials, merged onto the node ids
    on the driver. No hash join — at tiny and mid scale the join
    fixed costs dominate the actual compute (sf0.01: 15 s → <2 s).
    Edges whose src is not a known node contribute nothing (mask, not
    misindex)."""
    node_ids = np.sort(nodes.to_pandas()["doc_id"].to_numpy())
    rank_vec = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        ref = ray.put((node_ids, rank_vec))

        def contrib(t: pa.Table) -> pa.Table:
            ids, rk = ray.get(ref)
            src = t["src"].to_numpy()
            pos = np.clip(np.searchsorted(ids, src), 0, ids.size - 1)
            ok = ids[pos] == src
            c = np.where(ok, rk[pos] / out_degree, 0.0)
            g = (
                pd.DataFrame({"dst": t["dst"].to_numpy(), "s": c})
                .groupby("dst", as_index=False)
                .agg(s=("s", "sum"))
            )
            return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

        sums = (
            edges.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("s", alias_name="s"))
            .to_pandas()
        )
        s = np.zeros(n)
        dst = sums["dst"].to_numpy()
        pos = np.clip(np.searchsorted(node_ids, dst), 0, n - 1)
        ok = node_ids[pos] == dst
        np.add.at(s, pos[ok], sums["s"].to_numpy()[ok])
        rank_vec = base + damping * s
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(node_ids, pa.int64()),
                  "rank": pa.array(rank_vec)})
    )


def g3_pagerank(sf_dir: str) -> pa.Table:
    """2-iteration PageRank over a deterministic synthetic link graph
    (3 modular-arithmetic out-links per doc — derivable identically in
    SQL, so the unrolled-CTE twin hash-checks the whole iteration)."""
    nodes = _read(sf_dir, "documents", ["doc_id"]).materialize()
    n = nodes.count()  # free on the materialized node set

    def gen_edges(t: pa.Table) -> pa.Table:
        s = t["doc_id"].to_numpy()
        src = np.concatenate([s] * len(PAGERANK_EDGE_MULTS))
        dst = np.concatenate([(s * a + b) % n for a, b in PAGERANK_EDGE_MULTS])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    edges = nodes.map_batches(gen_edges, batch_format="pyarrow")
    out = pagerank(
        nodes, edges, n, out_degree=len(PAGERANK_EDGE_MULTS),
        n_iter=PAGERANK_ITERS,
    ).to_pandas()
    out = _round_floats(out, ["rank"])
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


# --- G4: triangle counting -------------------------------------------------------

# independent mult set from PageRank's so the two graph queries don't
# share structure; chosen so the synthetic graph actually has
# triangles (24 at every tested SF)
TRIANGLE_EDGE_MULTS = ((3, 1), (5, 2), (17, 5))
# node-degree broadcast guard: the degree table is node-sized (≪ edge
# count). Above this, replace the broadcast with a deg⋈edges hash
# join (two shuffles) — same orientation, no driver table.
DEG_BROADCAST_LIMIT = 50_000_000
# distinct (u, v) edge rows processed in one driver pass below this
# (16 B/row ⇒ ~320 MB at the limit); above it the four-shuffle
# distributed wedge join runs
TRI_STREAM_DRIVER_LIMIT = 20_000_000


def triangle_counts(edges):
    """Per-node triangle counts over an undirected graph given as a
    (src, dst) edge dataset, by DEGREE-ORIENTED wedge join (the
    MapReduce triangle algorithm of Suri & Vassilvitskii, WWW'11):

    1. canonicalize + distinct the edges (pair groupby — the only
       edge-sized shuffle),
    2. orient each edge from its lower-(degree, id) endpoint to the
       higher one, so every node's OUT-degree is O(√m) regardless of
       hub skew — the bound that makes step 3 safe at scale,
    3. per-source wedge generation (pairs of out-neighbors; group size
       is the bounded out-degree, never a hub's full neighborhood),
    4. hash-join wedges against the oriented edge set — each match is
       exactly one triangle (a < b < c in orientation order),
    5. explode the 3 corners and count per node.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t["src"].to_numpy(), t["dst"].to_numpy()
        m = s != d
        return pa.table({
            "u": pa.array(np.minimum(s[m], d[m]), pa.int64()),
            "v": pa.array(np.maximum(s[m], d[m]), pa.int64()),
        })

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["u", "v"])
        .materialize()
    )

    if und.count() <= TRI_STREAM_DRIVER_LIMIT:
        # driver tier: the distinct edge list fits (16 B/row) — run
        # orientation + wedge expansion + closure check as one
        # in-process vectorized pass. The distributed path below costs
        # four all-to-alls whose FIXED cost (aggregator pools sized to
        # the cluster) dwarfs small graphs; same algorithm either way.
        u_parts, v_parts = [], []
        for tb in und.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            u_parts.append(tb["u"].to_numpy())
            v_parts.append(tb["v"].to_numpy())
        u = np.concatenate(u_parts) if u_parts else np.zeros(0, np.int64)
        v = np.concatenate(v_parts) if v_parts else np.zeros(0, np.int64)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_triangles": pa.array([], pa.int64())})
        if u.size == 0:
            return rd.from_arrow(empty)
        nodes_s, deg_s = np.unique(np.concatenate([u, v]),
                                   return_counts=True)
        du = deg_s[np.searchsorted(nodes_s, u)]
        dv = deg_s[np.searchsorted(nodes_s, v)]
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        order = np.lexsort((dst, src))
        ss, sd = src[order], dst[order]
        new = np.empty(len(ss), dtype=bool)
        new[0] = True
        new[1:] = ss[1:] != ss[:-1]
        starts = np.nonzero(new)[0]
        grp = np.cumsum(new) - 1
        pos = np.arange(len(ss)) - starts[grp]
        total = int(pos.sum())
        if total == 0:
            return rd.from_arrow(empty)
        rights = np.repeat(np.arange(len(ss)), pos)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(pos)[:-1])), pos
        )
        lefts = np.repeat(starts[grp], pos) + within
        apex = ss[rights]
        wa = np.minimum(sd[lefts], sd[rights])
        wb = np.maximum(sd[lefts], sd[rights])
        ekey = np.sort(mix64(u.view(_u64), 101) ^ mix64(v.view(_u64), 202))
        wkey = mix64(wa.view(_u64), 101) ^ mix64(wb.view(_u64), 202)
        idx = np.searchsorted(ekey, wkey)
        idx_c = np.minimum(idx, ekey.size - 1)
        closed = ekey[idx_c] == wkey
        corners = np.concatenate([apex[closed], wa[closed], wb[closed]])
        if corners.size == 0:
            return rd.from_arrow(empty)
        ids, cnt = np.unique(corners, return_counts=True)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_triangles": pa.array(cnt.astype(np.int64)),
        }))

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64))})

    deg = (
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("deg", alias_name="deg"))
    )
    deg_nodes, deg_cnt, nrows = [], [], 0
    for tb in deg.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        deg_nodes.append(tb["node"].to_numpy())
        deg_cnt.append(tb["deg"].to_numpy())
        nrows += len(tb)
        if nrows > DEG_BROADCAST_LIMIT:
            raise ValueError(
                f"degree table exceeds DEG_BROADCAST_LIMIT={DEG_BROADCAST_LIMIT}; "
                "orient via a deg ⋈ edges hash join instead of broadcasting"
            )
    if nrows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_triangles": pa.array([], pa.int64())})
    dn = np.concatenate(deg_nodes)
    dc = np.concatenate(deg_cnt)
    order = np.argsort(dn)
    deg_ref = ray.put((dn[order], dc[order]))

    def orient(t: pa.Table) -> pa.Table:
        u, v = t["u"].to_numpy(), t["v"].to_numpy()
        nodes_s, degs_s = ray.get(deg_ref)
        du = degs_s[np.searchsorted(nodes_s, u)]
        dv = degs_s[np.searchsorted(nodes_s, v)]
        # (deg, id) lexicographic orientation: low endpoint → high
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "src": pa.array(np.where(u_first, u, v), pa.int64()),
            "dst": pa.array(np.where(u_first, v, u), pa.int64()),
        })

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = np.sort(df["dst"].to_numpy())
        k = len(outs)
        if k < 2:
            return pd.DataFrame({"apex": [], "u": [], "v": []}).astype("int64")
        iu, iv = np.triu_indices(k, k=1)
        return pd.DataFrame({
            "apex": np.repeat(df["src"].iloc[0], len(iu)),
            "u": outs[iu], "v": outs[iv],
        }).astype("int64")

    wedge_ds = (
        oriented.groupby("src")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    if wedge_ds.count() == 0:  # e.g. bipartite graph: no wedges above
        # any apex — also sidesteps joining an all-empty-block dataset
        # whose schema Arrow's hash join can't resolve
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_triangles": pa.array([], pa.int64())})
        )
    # a wedge (apex; u, v) closes into a triangle iff (u, v) — both
    # oriented ABOVE the apex — is itself an edge, in either
    # orientation (deg-orientation of (u, v) is independent of apex)
    tri = wedge_ds.join(
        oriented.map_batches(
            lambda t: pa.table({
                "eu": pa.array(
                    np.minimum(t["src"].to_numpy(), t["dst"].to_numpy()),
                    pa.int64()),
                "ev": pa.array(
                    np.maximum(t["src"].to_numpy(), t["dst"].to_numpy()),
                    pa.int64()),
            }),
            batch_format="pyarrow",
        ),
        "inner",
        num_partitions=HASH_JOIN_PARTITIONS,
        on=("u", "v"),
        right_on=("eu", "ev"),
    )

    def corners(t: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            t["apex"].to_numpy(), t["u"].to_numpy(), t["v"].to_numpy()
        ])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "n_triangles": pa.array(cnt.astype(np.int64))})

    return (
        tri.map_batches(corners, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_triangles", alias_name="n_triangles"))
    )


def g4_triangles(sf_dir: str) -> pa.Table:
    """Per-node triangle counts over the deterministic synthetic link
    graph (3 modular out-links per doc — SQL-derivable, so the twin
    counts the identical triangles)."""
    nodes = _read(sf_dir, "documents", ["doc_id"]).materialize()
    n = nodes.count()  # free on the materialized node set

    def gen_edges(t: pa.Table) -> pa.Table:
        s = t["doc_id"].to_numpy()
        src = np.concatenate([s] * len(TRIANGLE_EDGE_MULTS))
        dst = np.concatenate([(s * a + b) % n for a, b in TRIANGLE_EDGE_MULTS])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = nodes.map_batches(gen_edges, batch_format="pyarrow")
    out = triangle_counts(edges).to_pandas()
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


# --- G5: connected components ----------------------------------------------------


KCORE_K = 6
KCORE_MAX_ROUNDS = 12  # unrolled in the SQL twin; the engine asserts
KCORE_EDGE_DRIVER_LIMIT = 20_000_000
# the base modular graph is near-6-regular (every k is all-or-nothing);
# a planted ring-with-chords block over the first n//10 docs (each
# block node linked to (id±1, ±2, ±3) mod block) has internal degree
# exactly 6, so peeling at k=6 strips the irregular bulk and keeps the
# dense block (+ whatever bulk survives embedded) — a real core
KCORE_BLOCK_DIV = 10
KCORE_BLOCK_DS = (1, 2, 3)


def g16_kcore(sf_dir: str) -> pa.Table:
    """k-CORE membership (k={KCORE_K}) over the deterministic link
    graph — ITERATIVE PEELING, the degeneracy primitive triangle/motif
    engines order by: repeatedly drop nodes with < k alive neighbors
    until a fixpoint. Structurally distinct from the other graph ops
    (an iterative node-REMOVAL loop, not label propagation).

    Tiers: the deduped undirected edge list streams to the driver
    under the memory-budgeted cap (two bincounts per round); above it,
    per-round ``map_batches`` partial degrees over a BROADCAST alive
    bitmap with a driver accumulate into the |nodes| degree array —
    driver state is O(|nodes|) either way (the bitmap), never edges.
    The DuckDB twin UNROLLS ``KCORE_MAX_ROUNDS`` peeling rounds
    (rounds past the fixpoint are no-ops); the engine asserts it
    converged within the same bound, so the unrolled twin can never
    silently diverge — it either matches or the query raises."""
    nodes = _read(sf_dir, "documents", ["doc_id"]).materialize()
    n = nodes.count()

    blk = max(1, n // KCORE_BLOCK_DIV)

    def gen_edges(t: pa.Table) -> pa.Table:
        s = t["doc_id"].to_numpy()
        src = np.concatenate([s] * len(TRIANGLE_EDGE_MULTS))
        dst = np.concatenate(
            [(s * a + b) % n for a, b in TRIANGLE_EDGE_MULTS]
        )
        sb = s[s < blk]  # planted dense block: ring + chords
        for d in KCORE_BLOCK_DS:
            src = np.concatenate([src, sb])
            dst = np.concatenate([dst, (sb + d) % blk])
        keep = src != dst
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        key = u * np.int64(n) + v
        uq = np.unique(key)  # in-batch dedup; global dedup below
        return pa.table(
            {
                "u": pa.array((uq // n).astype(np.int64)),
                "v": pa.array((uq % n).astype(np.int64)),
            }
        )

    edges_ds = nodes.map_batches(gen_edges, batch_format="pyarrow")
    alive = np.ones(n, dtype=bool)

    if 3 * n <= driver_row_cap(KCORE_EDGE_DRIVER_LIMIT, 32):
        parts_u, parts_v = [], []
        for tb in edges_ds.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            parts_u.append(tb["u"].to_numpy())
            parts_v.append(tb["v"].to_numpy())
        key = np.unique(
            np.concatenate(parts_u) * np.int64(n) + np.concatenate(parts_v)
        )
        u, v = (key // n).astype(np.int64), (key % n).astype(np.int64)
        converged = False
        for _ in range(KCORE_MAX_ROUNDS + 1):
            m = alive[u] & alive[v]
            deg = np.bincount(u[m], minlength=n) + np.bincount(
                v[m], minlength=n
            )
            new_alive = alive & (deg >= KCORE_K)
            if (new_alive == alive).all():
                converged = True
                break
            alive = new_alive
    else:
        # distributed tier: global edge dedup once, then one pass per
        # round with the alive bitmap broadcast and ≤|batch-nodes|
        # partial rows accumulated into the driver degree array
        edges_ds = (
            edges_ds.groupby(["u", "v"]).count().select_columns(["u", "v"])
            .materialize()
        )
        converged = False
        for _ in range(KCORE_MAX_ROUNDS + 1):
            aref = ray.put(alive)

            def deg_partial(t: pa.Table) -> pa.Table:
                al = ray.get(aref)
                uu = t["u"].to_numpy()
                vv = t["v"].to_numpy()
                m = al[uu] & al[vv]
                cat = np.concatenate([uu[m], vv[m]])
                node, cnt = np.unique(cat, return_counts=True)
                return pa.table(
                    {
                        "node": pa.array(node.astype(np.int64)),
                        "deg": pa.array(cnt.astype(np.int64)),
                    }
                )

            deg = np.zeros(n, dtype=np.int64)
            for tb in edges_ds.map_batches(
                deg_partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
                np.add.at(
                    deg, tb["node"].to_numpy(), tb["deg"].to_numpy()
                )
            new_alive = alive & (deg >= KCORE_K)
            if (new_alive == alive).all():
                converged = True
                break
            alive = new_alive
    if not converged:
        raise RuntimeError(
            f"k-core did not converge in {KCORE_MAX_ROUNDS} rounds — "
            "raise KCORE_MAX_ROUNDS (and the unrolled SQL twin) together"
        )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "in_kcore": pa.array(alive),
        }
    )


def _kcore_unrolled_sql() -> str:
    """Unrolled peeling twin for g16: each round keeps nodes with >= k
    alive neighbors; rounds past the engine-asserted fixpoint are
    no-ops, so KCORE_MAX_ROUNDS rounds are exact."""
    # AS MATERIALIZED: each round references the previous one twice,
    # so plain CTE inlining doubles per round (2^12 scans of the base
    # table — "too many open files"); materialization makes each round
    # compute once
    rounds = ""
    for i in range(1, KCORE_MAX_ROUNDS + 1):
        rounds += f""",
            a{i} AS MATERIALIZED (
                SELECT x.doc_id FROM a{i - 1} x
                JOIN sym e ON e.u = x.doc_id
                JOIN a{i - 1} y ON y.doc_id = e.v
                GROUP BY x.doc_id HAVING count(*) >= {KCORE_K})"""
    edge_union = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {a} + {b}) % "
        f"(SELECT count(*) FROM documents) AS dst FROM documents"
        for a, b in TRIANGLE_EDGE_MULTS
    )
    block_union = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id + {d}) % "
        f"(SELECT count(*) // {KCORE_BLOCK_DIV} FROM documents) AS dst "
        f"FROM documents WHERE doc_id < "
        f"(SELECT count(*) // {KCORE_BLOCK_DIV} FROM documents)"
        for d in KCORE_BLOCK_DS
    )
    return f"""
            WITH e0 AS ({edge_union} UNION ALL {block_union}),
            und AS MATERIALIZED (
                SELECT least(src, dst) AS u, greatest(src, dst) AS v
                FROM e0 WHERE src <> dst GROUP BY 1, 2),
            sym AS MATERIALIZED (
                SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
            a0 AS MATERIALIZED (SELECT doc_id FROM documents){rounds}
            SELECT d.doc_id,
                   d.doc_id IN (SELECT doc_id FROM a{KCORE_MAX_ROUNDS})
                       AS in_kcore
            FROM documents d ORDER BY d.doc_id
        """


def g5_components(sf_dir: str) -> pa.Table:
    """Per-node connected-component labels (component = min node id)
    over a deterministic sparse chain graph — doc i links to i+1
    unless i % 4 == 3 or i % 20 == 10, giving size-1..4 components the
    recursive-CTE twin can chase exactly. The labels come from the
    shared CC machinery (vectorized hash-to-min on the driver under
    PAIR_DRIVER_LIMIT, Kiveris star contraction above it)."""
    from job_crawler_ray.pipelines.textops import connected_component_labels

    nodes = _read(sf_dir, "documents", ["doc_id"]).materialize()
    n = nodes.count()  # free on the materialized node set

    def gen_edges(t: pa.Table) -> pa.Table:
        s = t["doc_id"].to_numpy()
        m = (s % 4 != 3) & (s % 20 != 10) & (s + 1 < n)
        return pa.table({"id_a": pa.array(s[m], pa.int64()),
                         "id_b": pa.array(s[m] + 1, pa.int64())})

    pairs = nodes.map_batches(gen_edges, batch_format="pyarrow")
    out = connected_component_labels(nodes, pairs).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


# --- J9: fuzzy record-linkage join -----------------------------------------------

FUZZY_MAX_DIST = 2  # Levenshtein threshold of the name-linkage join


def _levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance, row-DP with the min-plus prefix
    scan (`minimum.accumulate(cand - k) + k`) resolving the
    insertion dependency — numpy kernels only, no per-cell Python."""
    if a == b:
        return 0
    av = np.array([ord(c) for c in a], dtype=np.int64)
    bv = np.array([ord(c) for c in b], dtype=np.int64)
    lb = len(bv)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(len(av)):
        sub = prev[:-1] + (bv != av[i])
        cand = np.concatenate(
            ([i + 1], np.minimum(prev[1:] + 1, sub))
        )
        prev = np.minimum.accumulate(cand - idx) + idx
    return int(prev[-1])


def fuzzy_link_pairs(ds, col: str, max_dist: int = FUZZY_MAX_DIST):
    """Fuzzy record linkage: all DISTINCT-value pairs of ``col`` with
    Levenshtein distance ≤ ``max_dist``, by character-bigram blocking.

    Recall 1.0: each edit destroys at most 2 of a string's distinct
    bigrams, so strings with > 2·max_dist distinct bigrams must still
    share one after ≤ max_dist edits — they meet in a bigram block.
    Strings with ≤ 2·max_dist distinct bigrams (too short to carry a
    guaranteed survivor) all go to one catch-all block, which is
    finite by the same length bound.

    Scale shape: the value-DISTINCT step is the only corpus-sized
    shuffle (and it ships one column); everything after is
    vocabulary-sized — blocks of (bigram, value) rows, per-block pair
    generation, then the exact DP verify over candidate pairs only."""
    distinct = (
        ds.map_batches(
            lambda t: pa.table(
                {col: pc_unique_str(t[col])}
            ),
            batch_format="pyarrow",
        )
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .select_columns([col])
    )

    def explode(t: pa.Table) -> pa.Table:
        names, grams = [], []
        for v in t[col].to_pylist():
            if v is None:
                continue
            gs = {v[i:i + 2] for i in range(len(v) - 1)}
            keys = (
                [hash_bigram(g) for g in gs]
                if len(gs) > 2 * max_dist else [0]  # catch-all block
            )
            names.extend([v] * len(keys))
            grams.extend(keys)
        return pa.table({"gram": pa.array(grams, pa.int64()),
                         col: pa.array(names, pa.string())})

    def hash_bigram(g: str) -> int:
        h = mix64(
            np.frombuffer(
                g.encode("utf-8").ljust(8, b"\0"), dtype=np.uint64
            ),
            811,
        )
        return int(h[0] & np.uint64(0x7FFFFFFFFFFFFFFF)) or 1

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.merge(df, on="gram", suffixes=("_a", "_b"))
        out = out[out[f"{col}_a"] < out[f"{col}_b"]]
        return out[[f"{col}_a", f"{col}_b"]].drop_duplicates()

    def verify(t: pa.Table) -> pa.Table:
        a = t[f"{col}_a"].to_pylist()
        b = t[f"{col}_b"].to_pylist()
        d = np.array(
            [_levenshtein(x, y) for x, y in zip(a, b)], dtype=np.int64
        )
        keep = d <= max_dist
        return pa.table({
            "name_a": pa.array(np.asarray(a, object)[keep], pa.string()),
            "name_b": pa.array(np.asarray(b, object)[keep], pa.string()),
            "dist": pa.array(d[keep]),
        })

    pairs = (
        distinct.map_batches(explode, batch_format="pyarrow")
        .groupby("gram")
        .map_groups(gen_pairs, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .groupby([f"{col}_a", f"{col}_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns([f"{col}_a", f"{col}_b"])
        .map_batches(verify, batch_format="pyarrow")
    )
    return pairs.sort(["name_a", "name_b"])


def pc_unique_str(arr) -> pa.Array:
    import pyarrow.compute as _pc

    u = _pc.unique(arr)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    return u


def j9_fuzzy_link(sf_dir: str) -> pa.Table:
    """Near-identical part-name pairs (Levenshtein ≤ 2) — the
    blocking + verify record-linkage pattern over a dirty dimension
    column."""
    ds = _read(sf_dir, "part", ["p_name"])
    out = fuzzy_link_pairs(ds, "p_name").to_pandas()
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


# --- D8: fuzzy canonicalization (linkage apply) -----------------------------------


def d8_fuzzy_canonical(sf_dir: str) -> pa.Table:
    """Apply step of the fuzzy linkage: collapse each connected
    component of the Levenshtein-pair graph (:func:`fuzzy_link_pairs`)
    to its alphabetically-least member and rewrite every part row with
    its canonical name — the standard dirty-dimension cleanup.

    The pair graph and name mapping are vocabulary-sized (distinct
    names ≪ rows); only the final attach streams the table, via the
    broadcast (name → canonical) lookup."""
    from job_crawler_ray.pipelines.textops import _cc_labels_vectorized

    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    pairs = fuzzy_link_pairs(ds, "p_name").to_pandas()
    if len(pairs):
        # dense int ids in sorted-name order ⇒ component-min id IS the
        # alphabetically-least name (matches SQL least() semantics)
        names = np.unique(
            np.concatenate([pairs["name_a"].to_numpy(),
                            pairs["name_b"].to_numpy()])
        )
        ia = np.searchsorted(names, pairs["name_a"].to_numpy())
        ib = np.searchsorted(names, pairs["name_b"].to_numpy())
        lbl = _cc_labels_vectorized(ia, ib, len(names))
        ref = ray.put((names, names[lbl]))
    else:
        z = np.zeros(0, dtype=object)
        ref = ray.put((z, z))

    def attach(t: pa.Table) -> pa.Table:
        nm, canon = ray.get(ref)
        vals = np.asarray(t["p_name"].to_pylist(), dtype=object)
        out = vals.copy()
        if nm.size:
            idx = np.searchsorted(nm, vals)
            in_r = idx < nm.size
            hit = np.zeros(len(vals), dtype=bool)
            hit[in_r] = nm[idx[in_r]] == vals[in_r]
            out[hit] = canon[idx[hit]]
        return pa.table({
            "p_partkey": t["p_partkey"],
            "p_name": t["p_name"],
            "canonical_name": pa.array(out, pa.string()),
        })

    out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("p_partkey").reset_index(drop=True),
        preserve_index=False,
    )


# --- A15: distributed correlation ------------------------------------------------


def a15_correlation(sf_dir: str) -> pa.Table:
    """Pearson correlation of event value vs hour-of-day in one pass:
    per-batch co-moment partials (n, Σx, Σy, Σxx, Σyy, Σxy — six
    numbers per block regardless of rows), one driver combine. The
    shape every distributed descriptive statistic takes at 100 TB."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        x = df["ts"].dt.hour.to_numpy(dtype=np.float64)
        y = df["value"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "n": [float(len(x))],
                "sx": [float(x.sum())],
                "sy": [float(y.sum())],
                "sxx": [float((x * x).sum())],
                "syy": [float((y * y).sum())],
                "sxy": [float((x * y).sum())],
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n, sx, sy, sxx, syy, sxy = (
        p["n"], p["sx"], p["sy"], p["sxx"], p["syy"], p["sxy"]
    )
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) ** 2
    vy = syy / n - (sy / n) ** 2
    corr = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    return pa.table(
        {
            "n_events": pa.array([int(n)], pa.int64()),
            "corr_hour_value": pa.array([round(float(corr), 6)]),
        }
    )


# --- T8: text normalization -------------------------------------------------------


# the one shared whitespace definition for t_normalize and its twin
ASCII_WS_RE = r"[ \t\n\r\f\v]+"


def t_normalize(sf_dir: str) -> pa.Table:
    """C4-style text cleaning as a pure vectorized batch kernel:
    unicode NFC, lowercase, whitespace-run collapse, edge trim. Stateless
    per row — the stage fuses with any upstream read and never
    shuffles.

    Whitespace is the EXPLICIT ASCII class on both sides of the oracle
    pair (Python's ``\\s`` is Unicode-aware — NBSP, U+2028 — while
    RE2's is ASCII-only, and SQL trim() strips only spaces; one shared
    definition or the twins diverge on any non-ASCII whitespace)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("")
        s = (
            s.str.normalize("NFC")
            .str.lower()
            .str.replace(ASCII_WS_RE, " ", regex=True)
            .str.strip(" ")
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": pa.array(s, pa.string()),
                "n_chars_norm": pa.array(
                    s.str.len().to_numpy(dtype=np.int64)
                ),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow").sort("doc_id")


# --- A16: exact distributed grouped quantile (histogram selection) ----------

SELECT_BINS = 4096
SELECT_COLLECT_LIMIT = 2_000_000  # rows a final in-bin collect may pull


def grouped_kth_exact(ds, key: str, val: str, q: float = 0.5):
    """EXACT per-group discrete quantile (``quantile_disc`` semantics:
    0-based index ceil(q·n)−1 of the sorted group, i.e. the smallest
    element whose rank fraction reaches q — verified against DuckDB
    across n/q combinations) WITHOUT sorting the data — distributed
    histogram selection:

    1. one partial-agg pass → per-group (n, min, max);
    2. per refinement round, one pass building per-group 4096-bin
       equi-width histograms (partials combine in a groupby), after
       which the driver walks the cumulative counts to the bin holding
       the k-th element — the candidate range shrinks 4096× per round
       (driver state: #groups × 4096 counts, never values);
    3. when the target bin holds ≤ SELECT_COLLECT_LIMIT rows (or one
       distinct value), one filtered collect of JUST that bin picks
       the element exactly.

    At 100 TB this is 2-3 full passes of narrow columns versus a
    global sort's all-to-all shuffle; selection state on the driver is
    KBs. Bin membership is decided by the same float arithmetic on
    every pass (refinement rounds re-select by parent-bin membership,
    never by a derived float range), so the filter and the histogram
    agree through two levels; deeper nesting (needs > bins ×
    COLLECT_LIMIT ≈ 8G rows in ONE group) could drift one ulp at the
    grandparent boundary — the identical-value shortcut bounds the
    recursion in the degenerate-skew case that would get there."""
    stats = (
        ds.map_batches(
            lambda t: strip_meta(
                pa.Table.from_pandas(
                    t.to_pandas()
                    .dropna(subset=[val])
                    .groupby(key, sort=False)[val]
                    .agg(n="size", lo="min", hi="max")
                    .reset_index(),
                    preserve_index=False,
                )
            ),
            batch_format="pyarrow",
        )
        .groupby(key)
        .aggregate(
            Sum("n", alias_name="n"),
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
        )
        .to_pandas()
    )
    # selection state per group: remaining k within [lo, hi]
    state = {
        r[key]: {
            "k": max(0, int(np.ceil(q * r["n"])) - 1),
            "lo": float(r["lo"]),
            "hi": float(r["hi"]),
            "n_range": int(r["n"]),
        }
        for _, r in stats.iterrows()
    }
    result: dict = {}
    for g, st in list(state.items()):
        if st["lo"] == st["hi"]:
            result[g] = st["lo"]
            del state[g]

    def bin_of(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
        w = (hi - lo) / SELECT_BINS
        return np.clip(((v - lo) / w).astype(np.int64), 0, SELECT_BINS - 1)

    # explicit Arrow key type so empty partial blocks keep the schema
    # (an empty pandas object column would round-trip as null type)
    key_pa_type = pa.Schema.from_pandas(stats[[key]]).field(key).type

    while state:
        live = dict(state)  # bounds snapshot shipped to this pass
        live_ref = ray.put(live)

        def hist_partial(t: pa.Table) -> pa.Table:
            # ONE vectorized pass over the batch: rows map to their
            # group's bounds by index (no O(groups × batch) per-group
            # masking — the r4 VERDICT wrong-#3). Per-row arithmetic is
            # element-for-element the same float math as the scalar
            # bin_of (w broadcast per row), so bin assignment — and the
            # parent-bin membership check on refinement rounds — is
            # bit-identical to the per-group version.
            bounds = ray.get(live_ref)
            df = t.to_pandas().dropna(subset=[val])
            glist = list(bounds)
            gi_s = df[key].map({g: i for i, g in enumerate(glist)})
            m = gi_s.notna().to_numpy()
            empty = pa.table(
                {key: pa.array([], key_pa_type),
                 "bin": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
            if not m.any():
                return empty
            gi = gi_s.to_numpy()[m].astype(np.int64)
            v = df[val].to_numpy(dtype=np.float64)[m]
            lo = np.array([bounds[g]["lo"] for g in glist], np.float64)[gi]
            hi = np.array([bounds[g]["hi"] for g in glist], np.float64)[gi]
            hb = np.array(["bin" in bounds[g] for g in glist], bool)[gi]
            # defaults (0, SELECT_BINS) keep w=1 for non-refinement
            # groups — their parent-bin result is discarded anyway
            plo = np.array(
                [bounds[g].get("plo", 0.0) for g in glist], np.float64
            )[gi]
            phi = np.array(
                [bounds[g].get("phi", float(SELECT_BINS)) for g in glist],
                np.float64,
            )[gi]
            pbin = np.array(
                [bounds[g].get("bin", 0) for g in glist], np.int64
            )[gi]
            wp = (phi - plo) / SELECT_BINS
            pb = np.clip(((v - plo) / wp).astype(np.int64), 0, SELECT_BINS - 1)
            sel = np.where(
                hb,
                (v >= plo) & (v <= phi) & (pb == pbin),
                (v >= lo) & (v <= hi),
            )
            if not sel.any():
                return empty
            gi, v, lo, hi = gi[sel], v[sel], lo[sel], hi[sel]
            w = (hi - lo) / SELECT_BINS
            b = np.clip(((v - lo) / w).astype(np.int64), 0, SELECT_BINS - 1)
            flat, cnt = np.unique(gi * SELECT_BINS + b, return_counts=True)
            keys_arr = np.asarray(glist, dtype=object)[flat // SELECT_BINS]
            return pa.table(
                {
                    key: pa.array(keys_arr.tolist(), key_pa_type),
                    "bin": pa.array(flat % SELECT_BINS, pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64)),
                }
            )

        partials = ds.map_batches(hist_partial, batch_format="pyarrow")
        if len(live) * SELECT_BINS <= 1_000_000:
            # driver final-reduce: partial rows ≤ blocks × groups ×
            # bins; the Ray groupby exchange costs ~1 s even on tiny
            # data (same fix as the a24 region reduce)
            hist = (
                partials.to_pandas()
                .groupby([key, "bin"], as_index=False)["cnt"].sum()
            )
        else:
            hist = (
                partials.groupby([key, "bin"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas()
            )
        collect = {}
        for g, st in list(state.items()):
            h = hist[hist[key] == g].sort_values("bin")
            cum = h["cnt"].cumsum().to_numpy()
            i = int(np.searchsorted(cum, st["k"] + 1, side="left"))
            b = int(h["bin"].iloc[i])
            before = int(cum[i - 1]) if i else 0
            in_bin = int(h["cnt"].iloc[i])
            w = (st["hi"] - st["lo"]) / SELECT_BINS
            blo = st["lo"] + b * w
            bhi = st["hi"] if b == SELECT_BINS - 1 else st["lo"] + (b + 1) * w
            st2 = {"k": st["k"] - before, "lo": blo, "hi": bhi,
                   "n_range": in_bin, "bin": b,
                   "plo": st["lo"], "phi": st["hi"]}
            if in_bin <= SELECT_COLLECT_LIMIT or blo == bhi:
                collect[g] = st2
                del state[g]
            else:
                state[g] = st2

        if collect:
            col_ref = ray.put(collect)

            def in_bin_vals(t: pa.Table) -> pa.Table:
                bounds = ray.get(col_ref)
                df = t.to_pandas().dropna(subset=[val])
                parts = []
                for g, st in bounds.items():
                    v = df.loc[df[key] == g, val].to_numpy(dtype=np.float64)
                    v = v[(v >= st["plo"]) & (v <= st["phi"])]
                    if not len(v):
                        continue
                    v = v[bin_of(v, st["plo"], st["phi"]) == st["bin"]]
                    if len(v):
                        parts.append(pd.DataFrame({key: g, "v": v}))
                if not parts:
                    return pa.table({key: pa.array([], key_pa_type),
                                     "v": pa.array([], pa.float64())})
                return strip_meta(
                    pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                         preserve_index=False)
                )

            got = ds.map_batches(in_bin_vals, batch_format="pyarrow").to_pandas()
            for g, st in collect.items():
                v = np.sort(got.loc[got[key] == g, "v"].to_numpy())
                result[g] = float(v[st["k"]])

    out = pd.DataFrame(
        {key: list(result), "median_val": [result[g] for g in result]}
    ).sort_values(key).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def a16_grouped_median(sf_dir: str) -> pa.Table:
    """Exact median order price per order priority — the distributed
    selection operator (no global sort) with a quantile_disc twin."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return grouped_kth_exact(ds, "o_orderpriority", "o_totalprice", q=0.5)


# --- A17: CUBE over (event_type, day) ---------------------------------------


def a17_cube(sf_dir: str) -> pa.Table:
    """CUBE(event_type, day): all four grouping sets. Finest level via
    partial-agg + groupby; the other three derived from the tiny
    finest frame on the driver — one corpus pass total (a13's rollup
    plus the day-only grouping)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = time_bucket_strings(df["ts"])
        g = (
            df.groupby(["event_type", "day"], sort=False)
            .agg(cnt=("value", "size"), value_sum=("value", "sum"))
            .reset_index()
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(
            Sum("cnt", alias_name="cnt"), Sum("value_sum", alias_name="value_sum")
        )
        .to_pandas()
    )
    by_type = finest.groupby("event_type", as_index=False).agg(
        cnt=("cnt", "sum"), value_sum=("value_sum", "sum")
    )
    by_type["day"] = None
    by_day = finest.groupby("day", as_index=False).agg(
        cnt=("cnt", "sum"), value_sum=("value_sum", "sum")
    )
    by_day["event_type"] = None
    grand = pd.DataFrame(
        {
            "event_type": [None],
            "day": [None],
            "cnt": [finest["cnt"].sum()],
            "value_sum": [finest["value_sum"].sum()],
        }
    )
    cols = ["event_type", "day", "cnt", "value_sum"]
    out = pd.concat(
        [grand[cols], by_type[cols], by_day[cols], finest[cols]],
        ignore_index=True,
    )
    out["cnt"] = out["cnt"].astype("int64")
    out = _round_floats(out, ["value_sum"])
    out = out.sort_values(
        ["event_type", "day"], na_position="first"
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- J7: semi-join -----------------------------------------------------------


def j7_semi_join(sf_dir: str) -> pa.Table:
    """Customers WITH at least one high-value order (EXISTS semi-join)
    — the positive complement of j2/j5, same broadcast-key-set
    mechanism: build side reduced to distinct keys, probe side
    filtered map-side, no shuffle."""
    from job_crawler_ray.pipelines.relational import HIGH_VALUE, _read as _r

    keys = (
        _r(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pa.compute.unique(
                        t.filter(
                            pa.compute.greater(t["o_totalprice"], HIGH_VALUE)
                        )["o_custkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    key_arr = np.sort(np.asarray([k for k in (keys or []) if k is not None],
                                 dtype=np.int64))
    ref = ray.put(key_arr)

    def semi(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        c = t["c_custkey"].to_numpy()
        idx = np.searchsorted(ks, c)
        present = np.zeros(len(c), dtype=bool)
        in_r = idx < ks.size
        present[in_r] = ks[idx[in_r]] == c[in_r]
        return t.filter(pa.array(present))

    out = (
        _r(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- J11: star join (fact × N broadcast dimensions, one pass) ----------------


def j11_star_join(sf_dir: str) -> pa.Table:
    """OLAP star schema in ONE fact pass: lineitem resolved against
    THREE broadcast dimensions (part → brand, supplier → nationkey,
    nation → name) inside a single map_batches, partial-aggregated per
    batch to (brand, nation) cells, then a tiny groupby. The fact
    table is never shuffled and each dimension ships once per actor —
    the shape every revenue-rollup-by-dimension query wants at
    100 TB (dims are MBs, facts are the 100 TB)."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    pref = ray.put(
        (
            parts.set_index("p_partkey")["p_brand"],
            dim.set_index("s_suppkey")["n_name"],
        )
    )

    def star(t: pa.Table) -> pa.Table:
        brand_of, nation_of = ray.get(pref)
        df = t.to_pandas()
        df["brand"] = brand_of.reindex(df["l_partkey"]).to_numpy()
        df["nation"] = nation_of.reindex(df["l_suppkey"]).to_numpy()
        # Exact integer arithmetic: price has 2 decimals, discount has
        # 2 decimals, so price·(1-disc) is exact in units of 1e-4.
        # Summing int64 ten-thousandths is order-independent, unlike a
        # float SUM at 1e8+ magnitude where even 2-dp rounding flips on
        # summation order when a cell lands on a .xx5 boundary (the
        # driver r5 j11 flake).
        df["revenue_e4"] = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        ) * np.rint((1.0 - df["l_discount"].to_numpy()) * 100).astype(np.int64)
        g = (
            df.groupby(["brand", "nation"], sort=False)
            .agg(revenue_e4=("revenue_e4", "sum"), cnt=("revenue_e4", "size"))
            .reset_index()
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(star, batch_format="pyarrow")
        .groupby(["brand", "nation"])
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out["cnt"] = out["cnt"].astype("int64")
    # No rounding: the int64 sum is exact, so /1e4 is bit-identical in
    # both twins; a 2-dp round would re-introduce the half-even (pandas)
    # vs half-away (DuckDB) split on exact .xx5 boundaries.
    out["revenue"] = out.pop("revenue_e4") / 10000.0
    out = out.sort_values(["brand", "nation"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- J10: broadcast interval (point-in-range) join ---------------------------

# Non-overlapping, sorted price bands with a deliberate [920, 930) gap
# so the LEFT semantics (unmatched probe rows keep a NULL band) are
# exercised. The dim side of a production interval join (IP→geo,
# salary bands, time buckets) is exactly this shape: tiny, static,
# broadcast once.
PRICE_BANDS = (
    ("low", 900.0, 920.0),
    ("mid", 930.0, 960.0),
    ("high", 960.0, 1000.0),
)


def j10_interval_join(sf_dir: str) -> pa.Table:
    """LEFT point-in-interval join: part.p_retailprice against a
    broadcast band table (lo ≤ price < hi). The probe is one
    ``np.searchsorted`` per batch against the sorted interval starts —
    O(rows · log bands), no shuffle, dim side shipped once via the
    task closure (bytes, not a Ray object). Requires non-overlapping
    intervals (asserted); overlapping dims need the r1 replication
    plan instead."""
    names = np.asarray([b[0] for b in PRICE_BANDS], dtype=object)
    los = np.asarray([b[1] for b in PRICE_BANDS], dtype=np.float64)
    his = np.asarray([b[2] for b in PRICE_BANDS], dtype=np.float64)
    assert np.all(los[1:] >= his[:-1]), "intervals must be disjoint+sorted"

    def probe(t: pa.Table) -> pa.Table:
        p = t["p_retailprice"].to_numpy(zero_copy_only=False)
        slot = np.searchsorted(los, p, side="right") - 1
        ok = (slot >= 0) & (p < his[np.clip(slot, 0, len(his) - 1)])
        band = np.where(ok, names[np.clip(slot, 0, len(names) - 1)], None)
        return t.append_column("band", pa.array(band, type=pa.string()))

    out = (
        _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
        .map_batches(probe, batch_format="pyarrow")
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    out = _round_floats(out, ["p_retailprice"])
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W6: windowed dedup (first event per user per hour) ----------------------


def w6_window_dedup(sf_dir: str) -> pa.Table:
    """First event per (user_id, tumbling 1 h window) by (ts,
    event_id). Per-batch partial keeps one candidate row per key
    (blocks shrink to ≤ distinct keys before the shuffle); the global
    winner is a plain Min aggregate over a zero-padded sortable
    ``ts_us:event_id`` string — (min ts, then min event_id) as ONE
    lexicographic reduction, no map_groups and no whole-group state."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hour = time_bucket_strings(df["ts"], "h")
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        key = np.char.add(
            np.char.add(np.char.zfill(ts_us.astype("U20"), 20), ":"),
            np.char.zfill(df["event_id"].to_numpy().astype("U12"), 12),
        ).astype(object)
        g = pd.DataFrame(
            {"user_id": df["user_id"], "hour": hour, "best": key}
        ).groupby(["user_id", "hour"], sort=False, as_index=False).min()
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    win = (
        _read(sf_dir, "events", ["event_id", "ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Min("best", alias_name="best"))
        .to_pandas()
    )
    win["first_event_id"] = (
        win["best"].str.split(":").str[1].astype("int64")
    )
    out = (
        win[["user_id", "hour", "first_event_id"]]
        .sort_values(["user_id", "hour"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A18: grouped HLL distinct (bound-checked like a9) ------------------------


def a18_grouped_hll(sf_dir: str) -> pa.Table:
    """Per-lang approximate COUNT(DISTINCT text) via grouped HLL:
    per-batch one 4 KB register vector PER GROUP (groups-per-batch ×
    4 KB partials, never the values), merged by a groupby over ≤
    blocks rows per lang with an elementwise-max kernel. Like a9, the
    estimate is ORACLE-BOUND-CHECKED: the exact grouped distinct is
    computed distributedly next to it and the twin pins the within-5%
    flag TRUE."""
    import pyarrow.compute as pc

    from job_crawler_ray.hashing import xxh64_array
    from job_crawler_ray.pipelines import textops as T

    m = 1 << T.HLL_P

    def partial(t: pa.Table) -> pa.Table:
        df_lang = pc.fill_null(t["lang"], "").to_numpy(zero_copy_only=False)
        h = xxh64_array(pc.fill_null(t["text"], ""), seed=4242)
        idx = (h >> _u64(64 - T.HLL_P)).astype(np.int64)
        w = h << _u64(T.HLL_P)
        rank = np.where(
            w == 0, 64 - T.HLL_P + 1, 64 - T._bit_length_u64(w) + 1
        ).astype(np.uint8)
        langs, inv = np.unique(df_lang, return_inverse=True)
        regs = np.zeros((len(langs), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, idx), rank)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(regs.reshape(-1)), m
                ),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.asarray(r, dtype=np.uint8) for r in group["regs"]])
        est = T.hll_merge_estimate(regs.max(axis=0))
        return pd.DataFrame(
            {"lang": [group["lang"].iloc[0]], "est": [est]}
        )

    docs = _read(sf_dir, "documents", ["lang", "text"])
    est_df = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    exact_df = (
        docs.map_batches(
            lambda t: strip_meta(
                pa.table(
                    {
                        "lang": pc.fill_null(t["lang"], ""),
                        # int64 VIEW of the u64 hash: Ray's shuffle
                        # round-trips blocks through Python ints and
                        # errors on values above 2^63-1
                        "h": pa.array(
                            xxh64_array(
                                pc.fill_null(t["text"], ""), seed=99
                            ).view(np.int64)
                        ),
                    }
                ).group_by(["lang", "h"]).aggregate([])
            ),
            batch_format="pyarrow",
        )
        .groupby(["lang", "h"])
        .count()
        .to_pandas()
        .groupby("lang", as_index=False)
        .size()
        .rename(columns={"size": "exact_distinct_texts"})
    )
    out = exact_df.merge(est_df, on="lang", how="left")
    out["within_bound"] = (
        (out["est"] - out["exact_distinct_texts"]).abs()
        / out["exact_distinct_texts"].clip(lower=1)
    ) <= HLL_GROUPED_REL_ERR_BOUND
    out = (
        out[["lang", "exact_distinct_texts", "within_bound"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["exact_distinct_texts"] = out["exact_distinct_texts"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


HLL_GROUPED_REL_ERR_BOUND = 0.05  # ~3σ for 2^12 registers


# --- J12: full outer join of two aggregates ----------------------------------


def j12_full_outer(sf_dir: str) -> pa.Table:
    """Per-minute error counts FULL OUTER JOIN per-minute purchase
    counts — the reconciliation shape (two metric feeds, either side
    may miss a minute; ~half the minutes are one-sided on the test
    corpus). Each side pre-aggregates per batch, so the native hash
    join (`Dataset.join(join_type="full_outer")`) moves only
    |minutes|-sized tables, never raw events. Absent sides surface as
    0 (count semantics: no rows observed), keeping the int64 columns
    null-free for the value-hash compare.

    Tiered like the other join ops (native join setup costs seconds
    at any input size — BASELINE.md round-4 notes): both sides are
    |minutes|-sized aggregates, so under ``J12_DRIVER_MINUTE_LIMIT``
    the outer-merge happens on the driver; above it (years of minutes,
    or a finer bucket) the native full-outer hash join runs. Tiers
    pinned equal by forcing the limit to 0 in tests."""
    from job_crawler_ray.pipelines.windows import _events

    def side(ty: str, alias: str):
        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["event_type"] == ty]
            if df.empty:
                return pa.table(
                    {"minute": pa.array([], pa.string()),
                     alias: pa.array([], pa.int64())}
                )
            df["minute"] = time_bucket_strings(df["ts"], unit="m")
            g = df.groupby("minute", as_index=False).agg(**{alias: ("ts", "size")})
            return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

        return (
            _events(sf_dir, ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("minute")
            .aggregate(Sum(alias, alias_name=alias))
        )

    err = side("error", "err_cnt").materialize()
    pur = side("purchase", "pur_cnt").materialize()
    if max(err.count(), pur.count()) <= J12_DRIVER_MINUTE_LIMIT:
        joined = err.to_pandas().merge(
            pur.to_pandas(), on="minute", how="outer"
        )
    else:
        joined = err.join(
            pur.map_batches(
                lambda t: t.rename_columns(["minute_p", "pur_cnt"]),
                batch_format="pyarrow",
            ),
            "full_outer",
            num_partitions=4,
            on=("minute",),
            right_on=("minute_p",),
        ).to_pandas()
        # Ray's join coalesces the key pair into the left name
    out = pd.DataFrame(
        {
            "minute": joined["minute"],
            "err_cnt": joined["err_cnt"].fillna(0).astype("int64"),
            "pur_cnt": joined["pur_cnt"].fillna(0).astype("int64"),
        }
    ).sort_values("minute").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


J12_DRIVER_MINUTE_LIMIT = 500_000  # ~1 year of minutes; ≈12 MB on the driver


# --- U2/U3: INTERSECT / EXCEPT set operators ----------------------------------


def _set_op_pairs(sf_dir: str, mode: str) -> pa.Table:
    """Shared machinery for distinct-set INTERSECT/EXCEPT over
    (user, day) pairs: which user-days saw a purchase AND an error
    (u2) / a purchase but NO error (u3). Per-batch dedup emits ≤ one
    (pair, side-flags) row per batch, the single shuffle moves only
    already-deduped pairs, and per-group state is two bits (Max of
    each flag) — never a group's rows. Set ops at 100 TB are exactly
    this shape: dedup locally, shuffle the key space once."""
    from job_crawler_ray.pipelines.windows import _events

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(("purchase", "error"))]
        if df.empty:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "day": pa.array([], pa.string()),
                 "in_a": pa.array([], pa.int64()),
                 "in_b": pa.array([], pa.int64())}
            )
        df["day"] = time_bucket_strings(df["ts"])
        df["in_a"] = (df["event_type"] == "purchase").astype("int64")
        df["in_b"] = (df["event_type"] == "error").astype("int64")
        g = df.groupby(["user_id", "day"], as_index=False).agg(
            in_a=("in_a", "max"), in_b=("in_b", "max")
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    tagged = (
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))
    )
    keep = (
        (lambda t: pc.and_(pc.equal(t["in_a"], 1), pc.equal(t["in_b"], 1)))
        if mode == "intersect"
        else (lambda t: pc.and_(pc.equal(t["in_a"], 1), pc.equal(t["in_b"], 0)))
    )
    out = (
        tagged.map_batches(
            lambda t: t.filter(keep(t)).select(["user_id", "day"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    out["user_id"] = out["user_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def u2_intersect(sf_dir: str) -> pa.Table:
    """Distinct (user, day) pairs present in BOTH event streams."""
    return _set_op_pairs(sf_dir, "intersect")


def u3_except(sf_dir: str) -> pa.Table:
    """Distinct (user, day) pairs in the purchase stream and NOT the
    error stream (EXCEPT / set difference)."""
    return _set_op_pairs(sf_dir, "except")


# --- W7: per-user row_number (hot-key-bounded) --------------------------------


def w7_row_number(sf_dir: str) -> pa.Table:
    """ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
    without ever holding one user's history in one task: the w5
    two-level plan. Level 1 groups by (user, 24 h bucket) — bounded by
    the event rate × bucket — and emits in-bucket row numbers plus ONE
    summary row (bucket count). Level 2 prefix-sums the per-user
    summary rows (≤ #buckets rows per user, never raw events) into
    per-bucket offsets, and a native hash join attaches offsets back.
    seq = in-bucket rn + earlier-bucket offset."""
    from job_crawler_ray.pipelines.windows import ASOF_BUCKET_HOURS, _events

    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["ts"].cast(pa.int64()).to_numpy() // bucket_ns
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def local_rn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        rows = pd.DataFrame(
            {
                "user_id": uid,
                "_bucket": bkt,
                "_kind": 1,
                "event_id": g["event_id"].astype("int64").to_numpy(),
                "rn": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )
        summary = pd.DataFrame(
            {"user_id": [uid], "_bucket": [bkt], "_kind": [0],
             "event_id": [0], "rn": [len(g)]}
        )
        return pd.concat([rows, summary], ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local_rn, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_bucket")
        off = np.concatenate(([0], np.cumsum(g["rn"].to_numpy())[:-1]))
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64").to_numpy(),
                "_bucket_o": g["_bucket"].astype("int64").to_numpy(),
                "offset": off.astype("int64"),
            }
        )

    off_ds = (
        level1.map_batches(
            lambda t: t.filter(pc.equal(t["_kind"], 0)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(offsets, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .map_batches(
            lambda t: t.rename_columns(["user_id_o", "_bucket_o", "offset"]),
            batch_format="pyarrow",
        )
    )
    rows = level1.map_batches(
        lambda t: t.filter(pc.equal(t["_kind"], 1)).select(
            ["user_id", "_bucket", "event_id", "rn"]
        ),
        batch_format="pyarrow",
    )
    # offsets are ONE row per (user, bucket) — broadcast-attach under
    # the memory-budgeted cap (sorted-key searchsorted per batch, no
    # join), native hash join above it (the multi-node big-|users|
    # tier). House tiering: the small side ships once either way.
    n_off = off_ds.count()
    if n_off <= driver_row_cap(5_000_000, 32):
        odf = off_ds.to_pandas()
        okey = (
            odf["user_id_o"].to_numpy(np.int64) << np.int64(20)
        ) ^ odf["_bucket_o"].to_numpy(np.int64)
        order = np.argsort(okey, kind="stable")
        off_ref = ray.put((okey[order], odf["offset"].to_numpy(np.int64)[order]))

        def attach(t: pa.Table) -> pa.Table:
            ok, ov = ray.get(off_ref)
            key = (
                t["user_id"].to_numpy().astype(np.int64) << np.int64(20)
            ) ^ t["_bucket"].to_numpy().astype(np.int64)
            idx = np.searchsorted(ok, key)
            return pa.table(
                {
                    "event_id": t["event_id"],
                    "user_id": t["user_id"],
                    "seq": pa.array(
                        t["rn"].to_numpy() + ov[idx], pa.int64()
                    ),
                }
            )

        joined = rows.map_batches(attach, batch_format="pyarrow").to_pandas()
    else:
        j = rows.join(
            off_ds,
            "inner",
            num_partitions=4,
            on=("user_id", "_bucket"),
            right_on=("user_id_o", "_bucket_o"),
        ).to_pandas()
        joined = pd.DataFrame(
            {
                "event_id": j["event_id"],
                "user_id": j["user_id"],
                "seq": j["rn"] + j["offset"],
            }
        )
    out = pd.DataFrame(
        {
            "event_id": joined["event_id"].astype("int64"),
            "user_id": joined["user_id"].astype("int64"),
            "seq": joined["seq"].astype("int64"),
        }
    ).sort_values(["user_id", "seq"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- E1: explode / unnest list column -----------------------------------------


def e1_explode_words(sf_dir: str) -> pa.Table:
    """Unnest each sampled document's text into (doc_id, pos, word)
    rows — the flat_map/explode operator, done zero-copy inside one
    Arrow batch: split_pattern → ListArray, doc_id repeated by value
    lengths, 1-based position from a global arange minus repeated
    list offsets. No Python loop; output fan-out is per-batch so the
    streaming executor re-blocks as it goes."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.array(t["doc_id"].to_numpy() % EXPLODE_SAMPLE_MOD == 0)
        )
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64()),
                 "word": pa.array([], pa.string())}
            )
        words = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        words = words.combine_chunks()
        offsets = words.offsets.to_numpy()
        lengths = np.diff(offsets)
        doc_ids = np.repeat(t["doc_id"].to_numpy(), lengths)
        pos = np.arange(offsets[-1] - offsets[0], dtype=np.int64) - np.repeat(
            offsets[:-1] - offsets[0], lengths
        ) + 1
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "pos": pa.array(pos, pa.int64()),
             "word": words.values}
        )

    out = (
        docs.map_batches(explode, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


EXPLODE_SAMPLE_MOD = 25  # bound the exploded output in the query contract


# --- A19: ordered string_agg per group -----------------------------------------


def a19_string_agg(sf_dir: str) -> pa.Table:
    """Per-nation alphabetical comma-join of supplier names
    (string_agg with ORDER BY inside the group). The group payload is
    the whole point of the op, so the per-group bound is the contract:
    it targets DIMENSION domains (names per nation), never fact
    tables — the projection shuffles only (nation, name) pairs and
    each group's task holds one nation's names."""
    nat_df = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(nat_df["n_nationkey"].astype(int), nat_df["n_name"])))

    def project(t: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        names = pa.array(
            [lut[int(k)] for k in t["s_nationkey"].to_pylist()], pa.string()
        )
        return pa.table({"n_name": names, "s_name": t["s_name"]})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        names = sorted(g["s_name"].tolist())
        return pd.DataFrame(
            {"n_name": [g["n_name"].iloc[0]],
             "suppliers": [",".join(names)],
             "n_suppliers": [np.int64(len(names))]}
        )

    out = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_name"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(agg, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A20: fixed-width histogram -------------------------------------------------


HIST_WIDTH = 50_000.0


def a20_histogram(sf_dir: str) -> pa.Table:
    """Fixed-width histogram of order totals: per-batch np counts over
    floor(price/width) shrink each block to |buckets| rows before the
    tiny bucket groupby — the width_bucket profile an engine runs
    before choosing band joins or quantile cuts. Driver never sees a
    row, only |buckets| partials."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.floor(t["o_totalprice"].to_numpy() / HIST_WIDTH).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uniq, pa.int64()),
             "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["bucket"] = out["bucket"].astype("int64")
    out["lo"] = out["bucket"].astype(float) * HIST_WIDTH
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(
        out[["bucket", "lo", "cnt"]], preserve_index=False
    )


# --- W8: conversion funnel ------------------------------------------------------

_TS_MAX = np.iinfo(np.int64).max
_TS_MIN = np.iinfo(np.int64).min


def w8_funnel(sf_dir: str) -> pa.Table:
    """Per-day view→purchase conversion funnel: of the (user, day)
    pairs that saw a view, how many later purchased that day. The
    whole op is two mergeable aggregates — per-batch partials reduce
    each block to its (user, day) pairs carrying (min view ts, max
    purchase ts) as int64 sentinels, one groupby merges them with
    Min/Max, and the day rollup is another partial+Sum pair. No
    sessionization state, no ordered scan, hot users cost nothing
    special: this is the funnel shape that stays an aggregation."""
    from job_crawler_ray.pipelines.windows import _events

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(("view", "purchase"))]
        if df.empty:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "day": pa.array([], pa.string()),
                 "first_view": pa.array([], pa.int64()),
                 "last_purchase": pa.array([], pa.int64())}
            )
        df["day"] = time_bucket_strings(df["ts"])
        ns = df["ts"].astype("int64")
        df["first_view"] = np.where(df["event_type"] == "view", ns, _TS_MAX)
        df["last_purchase"] = np.where(
            df["event_type"] == "purchase", ns, _TS_MIN
        )
        g = df.groupby(["user_id", "day"], as_index=False).agg(
            first_view=("first_view", "min"),
            last_purchase=("last_purchase", "max"),
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    pairs = (
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(
            Min("first_view", alias_name="first_view"),
            Max("last_purchase", alias_name="last_purchase"),
        )
    )

    def day_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["first_view"] != _TS_MAX]  # funnel base: saw a view
        if df.empty:
            return pa.table(
                {"day": pa.array([], pa.string()),
                 "with_view": pa.array([], pa.int64()),
                 "converted": pa.array([], pa.int64())}
            )
        df["converted"] = (df["last_purchase"] > df["first_view"]).astype(
            "int64"
        )
        g = df.groupby("day", as_index=False).agg(
            with_view=("converted", "size"), converted=("converted", "sum")
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        pairs.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("with_view", alias_name="with_view"),
            Sum("converted", alias_name="converted"),
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["with_view"] = out["with_view"].astype("int64")
    out["converted"] = out["converted"].astype("int64")
    out["rate"] = (out["converted"] / out["with_view"]).round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W9: moving average over a ROWS frame --------------------------------------

W9_WINDOW = 3  # preceding rows in the frame


def w9_moving_avg(sf_dir: str) -> pa.Table:
    """AVG(value) OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    BETWEEN 3 PRECEDING AND CURRENT ROW) — the rows-frame window, on
    the w5 hot-key-bounded plan. Level 1 groups by (user, 24 h
    bucket): rows with ≥3 in-bucket predecessors finish there
    (cumsum-window, vectorized); each bucket's first ≤3 rows become
    `pending` and its last ≤3 values a `tail` summary. Level 2 walks
    ONE user's (tail + pending) rows — ≤6 per bucket, never raw
    history — carrying the last-3 deque across buckets to fill the
    pendings. No task ever holds a user's full stream."""
    from job_crawler_ray.pipelines.windows import ASOF_BUCKET_HOURS, _events

    w = W9_WINDOW
    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["ts"].cast(pa.int64()).to_numpy() // bucket_ns
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        v = g["value"].to_numpy(dtype=np.float64)
        eid = g["event_id"].astype("int64").to_numpy()
        n = len(v)
        idx = np.arange(n)
        lo = np.maximum(0, idx - w)
        s = np.concatenate(([0.0], np.cumsum(v)))
        mavg = (s[idx + 1] - s[lo]) / (idx + 1 - lo)
        parts = []
        if n > w:
            parts.append(
                pd.DataFrame(
                    {"user_id": uid, "_bucket": bkt, "_kind": 1,
                     "event_id": eid[w:], "pos": idx[w:],
                     "value": v[w:], "mavg": mavg[w:]}
                )
            )
        head = min(w, n)
        parts.append(
            pd.DataFrame(
                {"user_id": uid, "_bucket": bkt, "_kind": 2,
                 "event_id": eid[:head], "pos": idx[:head],
                 "value": v[:head], "mavg": np.nan}
            )
        )
        tail = min(w, n)
        parts.append(
            pd.DataFrame(
                {"user_id": uid, "_bucket": bkt, "_kind": 0,
                 "event_id": 0, "pos": np.arange(tail),
                 "value": v[n - tail:], "mavg": np.nan}
            )
        )
        return pd.concat(parts, ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_bucket", "_kind", "pos"])  # kind0 before kind2
        out_eid, out_uid, out_mavg = [], [], []
        carry: list[float] = []  # last ≤w values BEFORE the current bucket
        uid = int(g["user_id"].iloc[0])
        for _, bg in g.groupby("_bucket", sort=True):
            pend = bg[bg["_kind"] == 2]
            seen: list[float] = []  # this bucket's pendings so far
            for _, r in pend.iterrows():
                win = (carry + seen)[-w:] + [r["value"]]
                out_eid.append(int(r["event_id"]))
                out_uid.append(uid)
                out_mavg.append(float(np.mean(win)))
                seen.append(float(r["value"]))
            # tail = the bucket's last ≤w rows; a short bucket must
            # NOT truncate the carry — the rest of the next window
            # still comes from earlier buckets
            tails = bg[bg["_kind"] == 0]
            carry = (carry + [float(x) for x in tails["value"].to_numpy()])[-w:]
        return pd.DataFrame(
            {"event_id": np.array(out_eid, dtype=np.int64),
             "user_id": np.array(out_uid, dtype=np.int64),
             "mavg": np.array(out_mavg, dtype=np.float64)}
        )

    filled = (
        level1.map_batches(
            lambda t: t.filter(pc.not_equal(t["_kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(fill, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
    )
    done = level1.map_batches(
        lambda t: t.filter(pc.equal(t["_kind"], 1)).select(
            ["event_id", "user_id", "mavg"]
        ),
        batch_format="pyarrow",
    )
    out = done.union(filled).to_pandas().sort_values("event_id")
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    out["mavg"] = out["mavg"].round(6)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# --- J13: time-spine gap fill ----------------------------------------------------


def j13_gapfill(sf_dir: str) -> pa.Table:
    """Hourly purchase counts on a COMPLETE hour spine between the
    corpus min/max (missing hours explicit as 0) — the gap-fill join
    every time-series rollup needs before charting or diffing. The
    counts are per-batch partials + one groupby; the spine is
    generated on the driver from two scalar aggregates (|hours| rows:
    a decade is <90 K) and outer-merged with the |hours|-sized count
    table. Nothing event-sized leaves the workers."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sub = df[df["event_type"] == "purchase"]
        hours = (
            pd.DataFrame({"hour": time_bucket_strings(sub["ts"], unit="h")})
            .groupby("hour", as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        if len(df):
            # carry the batch min/max hours (cnt 0) so the spine
            # bounds come from THIS pass, not a second scan
            bounds = pd.DataFrame(
                {"hour": time_bucket_strings(
                    pd.Series([df["ts"].min(), df["ts"].max()]), unit="h"
                ), "cnt": [0, 0]}
            )
            hours = pd.concat([hours, bounds], ignore_index=True)
            hours = hours.groupby("hour", as_index=False).agg(cnt=("cnt", "sum"))
        return strip_meta(pa.Table.from_pandas(hours, preserve_index=False))

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    lo = pd.to_datetime(counts["hour"].min(), format="%Y-%m-%d %H")
    hi = pd.to_datetime(counts["hour"].max(), format="%Y-%m-%d %H")
    spine = pd.DataFrame(
        {"hour": pd.date_range(lo, hi, freq="h").strftime("%Y-%m-%d %H")}
    )
    out = spine.merge(counts, on="hour", how="left")
    out["cnt"] = out["cnt"].fillna(0).astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("hour").reset_index(drop=True), preserve_index=False
    )


# --- A21: unpivot / melt ---------------------------------------------------------


def a21_unpivot(sf_dir: str) -> pa.Table:
    """Melt the a11 day×type pivot back to long (day, event_type,
    cnt) rows — the unpivot operator, zero-filled cells preserved.
    The wide input is |days|×|types|; melt happens per batch (pandas
    C kernel), so the op composes with any wide source at scale."""
    wide = a11_pivot(sf_dir)
    long_ = (
        rd.from_arrow(wide)
        .map_batches(
            lambda t: strip_meta(
                pa.Table.from_pandas(
                    t.to_pandas().melt(
                        id_vars=["day"], var_name="event_type",
                        value_name="cnt",
                    ),
                    preserve_index=False,
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    long_["cnt"] = long_["cnt"].astype("int64")
    return pa.Table.from_pandas(long_, preserve_index=False)


# --- T: JSON property extraction --------------------------------------------------


def t_json_extract(sf_dir: str) -> pa.Table:
    """Parse the semi-structured `props` JSON column ('{"k": N}') and
    roll up k per event type — the schema-on-read projection every
    log pipeline runs. Extraction is one vectorized regex per batch
    (C, no json.loads-per-row); the rollup is partial+Sum."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = (
            df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        df["k"] = k
        g = df.dropna(subset=["k"]).groupby("event_type", as_index=False).agg(
            k_sum=("k", "sum"), cnt=("k", "size")
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k_sum", alias_name="k_sum"), Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["cnt"] = out["cnt"].astype("int64")
    out["avg_k"] = (out["k_sum"] / out["cnt"]).round(6)
    return pa.Table.from_pandas(
        out[["event_type", "cnt", "avg_k"]], preserve_index=False
    )


# --- D9: dedup keeping the BEST replica --------------------------------------------

D9_MIRROR_MOD = 7  # which docs get a second, mirrored copy
D9_SRC_PAD = 24    # fixed-width source field in the lexicographic key


def d9_keep_best(sf_dir: str) -> pa.Table:
    """Exact-text dedup that keeps the PREFERRED replica — ordered by
    (source, doc_id) — instead of first-arrival (d1's rule): replica
    selection by source priority, the canonical-copy step of a
    multi-source ingest. The corpus is documents plus a deterministic
    'mirror' copy of every doc_id %% 7 == 0 row (doc_id + 10000), so
    dup groups genuinely exist; 'mirror' sorts before 'src*' and must
    win them. One lexicographic Min over zero-padded (source, doc_id)
    keys per text-hash group — the w6 trick: no map_groups, per-group
    state is one key + one count."""
    from job_crawler_ray.hashing import xxh64_array
    from job_crawler_ray.util import read_parquet_clean

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).repartition(8)

    def mirror(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy() % D9_MIRROR_MOD == 0
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pa.array(
                    sub["doc_id"].to_numpy() + 10_000, pa.int64()
                ),
                "text": sub["text"],
                "source": pa.array(["mirror"] * sub.num_rows, pa.string()),
            }
        )

    corpus = base.union(base.map_batches(mirror, batch_format="pyarrow"))

    def keyed(t: pa.Table) -> pa.Table:
        h = xxh64_array(pc.fill_null(t["text"], ""), seed=7).view(np.int64)
        src = t["source"].to_pylist()
        did = t["doc_id"].to_numpy()
        key = pa.array(
            [f"{s:<{D9_SRC_PAD}}{d:012d}" for s, d in zip(src, did)],
            pa.string(),
        )
        return pa.table(
            {"h": pa.array(h, pa.int64()), "key": key,
             "n": pa.array(np.ones(len(did), np.int64), pa.int64())}
        )

    g = (
        corpus.map_batches(keyed, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("key", alias_name="key"), Sum("n", alias_name="n_copies"))
        .to_pandas()
    )
    g["source"] = g["key"].str[:D9_SRC_PAD].str.rstrip()
    g["doc_id"] = g["key"].str[D9_SRC_PAD:].astype("int64")
    g["n_copies"] = g["n_copies"].astype("int64")
    out = (
        g[["doc_id", "source", "n_copies"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W10: watermark / late-data classification -----------------------------------

W10_DELAY_DAYS = 7
W10_BUCKET_HEX = 2   # md5-prefix arrival buckets (16^2 = 256, uniform)
_NS_DAY = 86_400_000_000_000


def w10_late_data(sf_dir: str) -> pa.Table:
    """Streaming watermark semantics over a deterministic arrival
    order: events "arrive" in md5(event_id) order (the house s3
    reproducible-shuffle key — the corpus is stored time-ordered, so
    event time and arrival order must be decoupled for the op to mean
    anything). The high watermark before an event is the max event
    time seen strictly earlier in arrival order; an event is LATE iff
    its ts < watermark − 7 days — the classification a streaming sink
    runs to route updates into already-closed windows. Output: per
    event-time day, late vs on-time counts.

    Plan (two-level prefix-max over ARRIVAL order, the w5 pattern):
    md5-prefix bucket (256 uniform buckets, skew-free by
    construction) → in-bucket sort + exclusive prefix-max emits
    per-row in-bucket watermarks plus ONE summary row per bucket; the
    driver cum-maxes the 256 summaries into exclusive per-bucket
    carries (broadcast back); a final map_batches resolves each row's
    watermark = max(carry, in-bucket prefix) and rolls the late flag
    up per day (partial + Sum). No global sort; no task holds more
    than corpus/256 rows; driver state is 256 summary rows."""
    from job_crawler_ray.pipelines.trainprep import _md5_hex
    from job_crawler_ray.pipelines.windows import _events

    delay_ns = W10_DELAY_DAYS * _NS_DAY
    ds = _events(sf_dir, ["event_id", "ts"])

    def key(t: pa.Table) -> pa.Table:
        hexes = _md5_hex(t["event_id"].to_numpy().astype(str))
        t = t.append_column("k", pa.array(hexes, pa.string()))
        return t.append_column(
            "bucket",
            pa.array([h[:W10_BUCKET_HEX] for h in hexes], pa.string()),
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "event_id"], kind="mergesort")
        ns = g["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        pm = np.maximum.accumulate(ns)
        excl = np.concatenate(([_TS_MIN], pm[:-1]))
        bkt = g["bucket"].iloc[0]
        rows = pd.DataFrame(
            {"bucket": bkt, "_kind": 1, "ts": ns, "wm_in": excl}
        )
        summary = pd.DataFrame(
            {"bucket": [bkt], "_kind": [0], "ts": [int(pm[-1])],
             "wm_in": [_TS_MIN]}
        )
        return pd.concat([rows, summary], ignore_index=True)

    level1 = (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(local, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )

    summaries = (
        level1.map_batches(
            lambda t: t.filter(pc.equal(t["_kind"], 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # exclusive cross-bucket carry: max ts over all STRICTLY earlier buckets
    cum = np.concatenate(
        ([_TS_MIN], np.maximum.accumulate(summaries["ts"].to_numpy())[:-1])
    )
    carry_ref = ray.put(dict(zip(summaries["bucket"], cum.tolist())))

    def day_partial(t: pa.Table) -> pa.Table:
        carry = ray.get(carry_ref)
        df = t.to_pandas()
        df = df[df["_kind"] == 1]
        if df.empty:
            return pa.table(
                {"day": pa.array([], pa.string()),
                 "late": pa.array([], pa.int64()),
                 "ontime": pa.array([], pa.int64())}
            )
        ts = df["ts"].to_numpy(dtype=np.int64)
        wm = np.maximum(
            df["wm_in"].to_numpy(dtype=np.int64),
            np.asarray([carry[b] for b in df["bucket"]], dtype=np.int64),
        )
        late = np.zeros(len(ts), dtype=bool)
        m = wm > _TS_MIN  # sentinel: nothing arrived earlier → on-time
        late[m] = ts[m] < wm[m] - delay_ns
        g = (
            pd.DataFrame(
                {"day": time_bucket_strings(ts.astype("datetime64[ns]")),
                 "late": late.astype("int64"),
                 "ontime": (~late).astype("int64")}
            )
            .groupby("day", as_index=False)
            .agg(late=("late", "sum"), ontime=("ontime", "sum"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        level1.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("late", alias_name="late"),
                   Sum("ontime", alias_name="ontime"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["late"] = out["late"].astype("int64")
    out["ontime"] = out["ontime"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A22: exact interpolated percentiles (PERCENTILE_CONT) ------------------------

A22_QS = (0.25, 0.5, 0.75, 0.9)


def a22_percentile_cont(sf_dir: str) -> pa.Table:
    """Exact PERCENTILE_CONT / quantile_cont for four q's AT ONCE:
    linear interpolation between the floor/ceil order statistics at
    h = (n−1)·q — multi-rank histogram selection on the a16
    machinery, generalized from one rank per group to a rank SET over
    one distribution. One stats pass (n, lo, hi), one 4096-bin
    histogram pass serving ALL eight needed ranks, then a single
    filtered collect of the union of target bins (≈ ranks × n/4096
    rows) picks the order statistics exactly; refinement rounds only
    when a bin exceeds the collect cap (needs ~8G rows in one bin).
    Versus a global sort: two narrow passes + a KB-sized collect."""
    # materialized: stats + hist + collect passes rescan one narrow
    # column — read once, serve later passes from the object store
    ds = _read(sf_dir, "orders", ["o_totalprice"]).materialize()
    val = "o_totalprice"

    def stat_partial(t: pa.Table) -> pa.Table:
        v = t[val].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": [len(v)], "lo": [float(v.min())],
                         "hi": [float(v.max())]})

    st = ds.map_batches(stat_partial, batch_format="pyarrow").to_pandas()
    n = int(st["n"].sum())
    glo, ghi = float(st["lo"].min()), float(st["hi"].max())

    # ranks (0-based order statistics) needed by the interpolation
    hs = {q: (n - 1) * q for q in A22_QS}
    ks = sorted({int(np.floor(h)) for h in hs.values()}
                | {int(np.ceil(h)) for h in hs.values()})
    result: dict[int, float] = {}
    states: dict[int, dict] = {}
    for k in ks:
        if glo == ghi:
            result[k] = glo
        else:
            states[k] = {"k": k, "lo": glo, "hi": ghi}

    def bin_of(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
        w = (hi - lo) / SELECT_BINS
        return np.clip(((v - lo) / w).astype(np.int64), 0, SELECT_BINS - 1)

    while states:
        live_ref = ray.put(dict(states))

        def hist_partial(t: pa.Table) -> pa.Table:
            bounds = ray.get(live_ref)
            raw = t[val].to_numpy(zero_copy_only=False)
            raw = raw[~np.isnan(raw)]
            parts = []
            # distinct (range, parent-bin) regions shared by many
            # ranks get ONE bincount, not one per rank
            seen: dict[tuple, np.ndarray] = {}
            for rk, s in bounds.items():
                region = (s["lo"], s["hi"], s.get("bin"),
                          s.get("plo"), s.get("phi"))
                if region not in seen:
                    v = raw
                    if "bin" in s:
                        v = v[(v >= s["plo"]) & (v <= s["phi"])]
                        v = v[bin_of(v, s["plo"], s["phi"]) == s["bin"]]
                    else:
                        v = v[(v >= s["lo"]) & (v <= s["hi"])]
                    seen[region] = (
                        np.bincount(bin_of(v, s["lo"], s["hi"]),
                                    minlength=SELECT_BINS)
                        if len(v) else np.zeros(SELECT_BINS, np.int64)
                    )
                cnt = seen[region]
                nz = np.nonzero(cnt)[0]
                if len(nz):
                    parts.append(pd.DataFrame(
                        {"rk": rk, "bin": nz, "cnt": cnt[nz]}))
            if not parts:
                return pa.table({"rk": pa.array([], pa.int64()),
                                 "bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return strip_meta(pa.Table.from_pandas(
                pd.concat(parts, ignore_index=True), preserve_index=False))

        partials = ds.map_batches(hist_partial, batch_format="pyarrow")
        if len(states) * SELECT_BINS <= 1_000_000:
            # driver final-reduce (partial rows ≤ blocks × ranks ×
            # bins): the Ray groupby exchange costs ~1 s even on tiny
            # data — same fix as the a16/a24 hist reduce
            hist = (
                partials.to_pandas()
                .groupby(["rk", "bin"], as_index=False)["cnt"].sum()
            )
        else:
            hist = (
                partials.groupby(["rk", "bin"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas()
            )
        collect = {}
        for rk, s in list(states.items()):
            h = hist[hist["rk"] == rk].sort_values("bin")
            cum = h["cnt"].cumsum().to_numpy()
            i = int(np.searchsorted(cum, s["k"] + 1, side="left"))
            b = int(h["bin"].iloc[i])
            before = int(cum[i - 1]) if i else 0
            in_bin = int(h["cnt"].iloc[i])
            w = (s["hi"] - s["lo"]) / SELECT_BINS
            blo = s["lo"] + b * w
            bhi = s["hi"] if b == SELECT_BINS - 1 else s["lo"] + (b + 1) * w
            s2 = {"k": s["k"] - before, "lo": blo, "hi": bhi,
                  "bin": b, "plo": s["lo"], "phi": s["hi"]}
            if in_bin <= SELECT_COLLECT_LIMIT or blo == bhi:
                collect[rk] = s2
                del states[rk]
            else:
                states[rk] = s2

        if collect:
            col_ref = ray.put(collect)

            def in_bin_vals(t: pa.Table) -> pa.Table:
                bounds = ray.get(col_ref)
                raw = t[val].to_numpy(zero_copy_only=False)
                raw = raw[~np.isnan(raw)]
                parts = []
                for rk, s in bounds.items():
                    v = raw[(raw >= s["plo"]) & (raw <= s["phi"])]
                    if len(v):
                        v = v[bin_of(v, s["plo"], s["phi"]) == s["bin"]]
                    if len(v):
                        parts.append(pd.DataFrame({"rk": rk, "v": v}))
                if not parts:
                    return pa.table({"rk": pa.array([], pa.int64()),
                                     "v": pa.array([], pa.float64())})
                return strip_meta(pa.Table.from_pandas(
                    pd.concat(parts, ignore_index=True),
                    preserve_index=False))

            got = ds.map_batches(in_bin_vals, batch_format="pyarrow").to_pandas()
            for rk, s in collect.items():
                v = np.sort(got.loc[got["rk"] == rk, "v"].to_numpy())
                result[rk] = float(v[s["k"]])

    pct = []
    for q in A22_QS:
        h = hs[q]
        lo_k, hi_k = int(np.floor(h)), int(np.ceil(h))
        frac = h - lo_k
        pct.append(result[lo_k] + frac * (result[hi_k] - result[lo_k]))
    out = pd.DataFrame({"q": np.asarray(A22_QS, dtype=np.float64),
                        "pct": np.round(np.asarray(pct), 6)})
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A23: per-entity mode (most frequent value) -----------------------------------

_MODE_PAD = 10**12 - 1  # cnt pad: counts per (entity, value) fit 12 digits


def a23_mode(sf_dir: str) -> pa.Table:
    """Per-user MODAL event type (most frequent; ties → smallest
    type) — the categorical mode aggregate. Two mergeable groupbys,
    no map_groups: (user, type) partial counts Sum-merge, then the
    d9/w6 lexicographic-Min trick turns argmax-with-tie-break into
    one Min over ``pad(MAX−cnt)|type`` keys per user — per-group
    state is one string, the driver only sees |users| result rows."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id", "event_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def encode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        inv = (_MODE_PAD - df["cnt"].to_numpy(np.int64)).astype("U12")
        key = np.char.add(np.char.zfill(inv, 12),
                          np.char.add("|", df["event_type"].to_numpy("U")))
        return pa.table({"user_id": pa.array(df["user_id"], pa.int64()),
                         "key": pa.array(key.astype(object), pa.string())})

    g = (
        pairs.map_batches(encode, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("key", alias_name="key"))
        .to_pandas()
    )
    g["modal_type"] = g["key"].str[13:]
    g["cnt"] = (_MODE_PAD - g["key"].str[:12].astype("int64")).astype("int64")
    out = (
        g[["user_id", "modal_type", "cnt"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out["user_id"] = out["user_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W11: FIRST_VALUE / LAST_VALUE per partition -----------------------------------


def w11_first_last(sf_dir: str) -> pa.Table:
    """FIRST_VALUE and LAST_VALUE of `value` per user over (ts,
    event_id) order — the deterministic arg_min/arg_max window pair.
    The carried value is ENCODED INTO the order key (zero-padded ts
    ns | event_id | %.17g value — fixed-width prefixes make string
    order ≡ numeric order, and %.17g round-trips float64 exactly), so
    one Min + one Max groupby aggregate replaces any per-user ordered
    scan: mergeable, hot-key-immune, per-group state two strings."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def encode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ns = df["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        eid = df["event_id"].to_numpy(np.int64)
        # vectorized C printf/zfill kernels — no per-row f-strings
        k1 = np.char.zfill(ns.astype("U20"), 19)
        k2 = np.char.zfill(eid.astype("U12"), 12)
        k3 = np.char.mod("%.17g", df["value"].to_numpy(np.float64))
        key = np.char.add(
            np.char.add(np.char.add(k1, "|"), np.char.add(k2, "|")), k3
        )
        return pa.table({"user_id": pa.array(df["user_id"], pa.int64()),
                         "key": pa.array(key.astype(object), pa.string())})

    g = (
        ds.map_batches(encode, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("key", alias_name="kmin"),
                   Max("key", alias_name="kmax"))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    g["first_value"] = (
        g["kmin"].str.split("|").str[2].astype("float64").round(6)
    )
    g["last_value"] = (
        g["kmax"].str.split("|").str[2].astype("float64").round(6)
    )
    g["user_id"] = g["user_id"].astype("int64")
    return pa.Table.from_pandas(
        g[["user_id", "first_value", "last_value"]], preserve_index=False
    )


# --- A25: grouped sample stddev / variance -----------------------------------------


def a25_grouped_stddev(sf_dir: str) -> pa.Table:
    """Sample stddev + variance of `value` per event type in one
    pass: per-batch (n, Σx, Σxx) partials — three numbers per (block,
    group) — Sum-merged by one groupby, moments finished on the
    driver (a15's co-moment shape, grouped)."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        v = df["value"].to_numpy(np.float64)
        g = (
            pd.DataFrame({"event_type": df["event_type"], "x": v,
                          "xx": v * v})
            .groupby("event_type", as_index=False)
            .agg(n=("x", "size"), sx=("x", "sum"), sxx=("xx", "sum"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxx", alias_name="sxx"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    n = g["n"].to_numpy(np.float64)
    var = (g["sxx"].to_numpy() - g["sx"].to_numpy() ** 2 / n) / (n - 1)
    g["n"] = g["n"].astype("int64")
    g["var_samp"] = np.round(var, 6)
    g["stddev_samp"] = np.round(np.sqrt(var), 6)
    return pa.Table.from_pandas(
        g[["event_type", "n", "var_samp", "stddev_samp"]],
        preserve_index=False,
    )


# --- J15: SCD2 point-in-time dimension join ----------------------------------------

SCD2_EPOCH = "1995-01-01"
SCD2_SPREAD_DAYS = 2400  # cutover dates span the order-date range


def j15_scd2_pit(sf_dir: str) -> pa.Table:
    """Point-in-time join against a slowly-changing (SCD type-2)
    dimension: each customer's market segment has two versions —
    seg_a before a per-customer cutover date, seg_b (the next
    distinct segment in sorted order, wrapped) after — and every
    order resolves the version VALID AT ITS ORDER DATE, then rolls up
    revenue per effective segment. The dimension (custkey → seg_a,
    seg_b, cutover) is built in one pass and broadcast via ray.put
    (j1's map-side pattern; above a broadcast cap the id-bucketed
    fragment-store tier applies, analytics.py:169); the fact pass
    resolves validity vectorized (searchsorted custkey lookup + one
    np.where on the date) and pre-aggregates per batch, so the only
    shuffle is |segments| partial rows."""
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    if len(cust) > ATTACH_BROADCAST_LIMIT:
        raise ValueError(
            f"{len(cust)} dimension rows exceed ATTACH_BROADCAST_LIMIT="
            f"{ATTACH_BROADCAST_LIMIT}; use the id-bucketed fragment-store "
            "dimension (analytics.py:169 pattern) instead of a broadcast"
        )
    segs = sorted(cust["c_mktsegment"].unique())
    nxt = {s: segs[(i + 1) % len(segs)] for i, s in enumerate(segs)}
    ck = cust["c_custkey"].to_numpy(np.int64)
    seg_a = cust["c_mktsegment"].to_numpy()
    seg_b = np.asarray([nxt[s] for s in seg_a], dtype=object)
    epoch_ns = np.datetime64(SCD2_EPOCH, "ns").astype("int64")
    cut_ns = epoch_ns + (ck % SCD2_SPREAD_DAYS) * _NS_DAY
    dim_ref = ray.put((ck, seg_a, seg_b, cut_ns))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def resolve(t: pa.Table) -> pa.Table:
        ck_, seg_a_, seg_b_, cut_ = ray.get(dim_ref)
        df = t.to_pandas()
        idx = np.searchsorted(ck_, df["o_custkey"].to_numpy(np.int64))
        od = df["o_orderdate"].to_numpy().astype("datetime64[ns]").astype("int64")
        eff = np.where(od >= cut_[idx], seg_b_[idx], seg_a_[idx])
        # exact int64 cents (o_totalprice has 2 decimals) — the j11
        # rule: float sums land on .xx5 cells and flip on order
        cents = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = (
            pd.DataFrame({"segment": eff, "revenue_e2": cents})
            .groupby("segment", as_index=False)
            .agg(n_orders=("revenue_e2", "size"),
                 revenue_e2=("revenue_e2", "sum"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(resolve, batch_format="pyarrow")
        .groupby("segment")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue_e2", alias_name="revenue_e2"))
        .to_pandas()
        .sort_values("segment")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue"] = out.pop("revenue_e2") / 100.0
    return pa.Table.from_pandas(out, preserve_index=False)


# --- T: overlapping text chunking (RAG / context-window prep) ----------------------

CHUNK_WIDTH = 200
CHUNK_STRIDE = 150
P3_LEN_LO, P3_LEN_HI = 100, 450  # p3 composite's length-window gate


def chunk_batch(t: pa.Table) -> pa.Table:
    """(doc_id, text) batch → overlapping (doc_id, chunk_id,
    chunk_len, head) chunk rows. Chunk k of every doc shares the same
    (start, stop) offsets, so the loop is over CHUNK INDICES (≤
    maxlen/stride), each one vectorized pandas str.slice."""
    df = t.to_pandas()
    txt = df["text"].fillna("")
    ln = txt.str.len().to_numpy(np.int64)
    n_chunks = np.where(
        ln <= CHUNK_WIDTH,
        1,
        1 + np.ceil((ln - CHUNK_WIDTH) / CHUNK_STRIDE).astype(np.int64),
    )
    parts = []
    for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
        m = n_chunks > k
        sub = txt[m].str.slice(k * CHUNK_STRIDE,
                               k * CHUNK_STRIDE + CHUNK_WIDTH)
        parts.append(pd.DataFrame(
            {"doc_id": df.loc[m, "doc_id"].to_numpy(np.int64),
             "chunk_id": np.int64(k),
             "chunk_len": sub.str.len().to_numpy(np.int64),
             "head": sub.str.slice(0, 16)}))
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk_len": pa.array([], pa.int64()),
                         "head": pa.array([], pa.string())})
    return strip_meta(pa.Table.from_pandas(
        pd.concat(parts, ignore_index=True), preserve_index=False))


def t_chunk_overlap(sf_dir: str) -> pa.Table:
    """Overlapping fixed-width character chunks per document (width
    200, stride 150) — the context-window / RAG chunking pass.
    Chunk k of every doc shares the same (start, stop) offsets, so
    the kernel loops over CHUNK INDICES (≤ maxlen/stride, a handful),
    not rows: one vectorized pandas str.slice over the docs that
    reach chunk k. Emits (doc_id, chunk_id, chunk_len, head); chunk
    count = 1 if len ≤ width else 1 + ceil((len − width)/stride)."""
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(strip_meta, batch_format="pyarrow").repartition(8)

    out = (
        ds.map_batches(chunk_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- T: sentence statistics ---------------------------------------------------------

# ASCII-only boundary (shared definition with the RE2 twin — see
# ASCII_WS_RE note): one-or-more terminators followed by spaces
SENT_SPLIT_RE = r"[.!?]+[ ]+"


def t_sentence_stats(sf_dir: str) -> pa.Table:
    """Per-document sentence segmentation stats (count + mean
    sentence length) — the mean-sentence-length quality signal
    (Gopher-style rules). Fully vectorized: n_sent = regex match
    count + 1; total sentence chars = len(text) with separators
    regex-replaced away — no per-row split lists. Both sides of the
    oracle derive the mean from the SAME two totals."""
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(strip_meta, batch_format="pyarrow").repartition(8)

    def stats(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        txt = df["text"].fillna("")
        n_sent = txt.str.count(SENT_SPLIT_RE).to_numpy(np.int64) + 1
        part_chars = (
            txt.str.replace(SENT_SPLIT_RE, "", regex=True)
            .str.len()
            .to_numpy(np.int64)
        )
        return pa.table(
            {"doc_id": pa.array(df["doc_id"], pa.int64()),
             "n_sent": pa.array(n_sent, pa.int64()),
             "avg_sent_len": pa.array(
                 np.round(part_chars / n_sent, 6), pa.float64())}
        )

    out = (
        ds.map_batches(stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- G7: bounded multi-source BFS -------------------------------------------------

BFS_EDGE_MULTS = ((7, 3), (13, 11), (29, 17))  # independent of g3/g4/g5
BFS_SEED_MOD = 16
BFS_MAX_HOPS = 4
# whole-edge-list driver tier below this; broadcast-frontier tier above
BFS_DRIVER_EDGES = 2_000_000


def _bfs_edges(sf_dir: str):
    nodes = _read(sf_dir, "documents", ["doc_id"]).materialize()
    n = nodes.count()

    def gen(t: pa.Table) -> pa.Table:
        s = t["doc_id"].to_numpy()
        src = np.concatenate([s] * len(BFS_EDGE_MULTS))
        dst = np.concatenate([(s * a + b) % n for a, b in BFS_EDGE_MULTS])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return nodes, nodes.map_batches(gen, batch_format="pyarrow"), n


def g7_bfs(sf_dir: str) -> pa.Table:
    """Multi-source BFS hop counts (≤ 4 hops) from the seed set
    doc_id % 16 == 0 over a deterministic synthetic link graph — the
    frontier-expansion traversal (crawl reachability, account-link
    rings). Recursive-CTE min-hop twin.

    Tiers (the pagerank pattern): below BFS_DRIVER_EDGES the edge
    list BFS's in numpy on the driver; above it each round is one
    map_batches over the EDGE dataset with the frontier+visited
    broadcast as sorted node arrays (node-sized state, never
    edge-sized; ray.put once per round) producing the next frontier
    via searchsorted membership — K rounds = K edge passes, no joins,
    no driver edge materialization."""
    nodes, edges, n = _bfs_edges(sf_dir)
    seeds = np.arange(0, n, BFS_SEED_MOD, dtype=np.int64)
    n_edges = n * len(BFS_EDGE_MULTS)

    if n_edges <= BFS_DRIVER_EDGES:
        edf = edges.to_pandas()
        src = edf["src"].to_numpy()
        dst = edf["dst"].to_numpy()
        order = np.argsort(src, kind="stable")
        src_s, dst_s = src[order], dst[order]
        hop_of = {int(s): 0 for s in seeds}
        frontier = seeds
        for hop in range(1, BFS_MAX_HOPS + 1):
            lo = np.searchsorted(src_s, frontier, side="left")
            hi = np.searchsorted(src_s, frontier, side="right")
            nxt = np.unique(np.concatenate(
                [dst_s[a:b] for a, b in zip(lo, hi)] or
                [np.array([], np.int64)]))
            fresh = np.asarray(
                [v for v in nxt if int(v) not in hop_of], np.int64)
            for v in fresh:
                hop_of[int(v)] = hop
            if not len(fresh):
                break
            frontier = fresh
    else:
        visited = np.sort(seeds)
        hop_of = {int(s): 0 for s in seeds}
        frontier = np.sort(seeds)
        for hop in range(1, BFS_MAX_HOPS + 1):
            fr_ref = ray.put(frontier)

            def expand(t: pa.Table) -> pa.Table:
                fr = ray.get(fr_ref)
                s = t["src"].to_numpy()
                d = t["dst"].to_numpy()
                i = np.searchsorted(fr, s)
                m = (i < len(fr)) & (fr[np.minimum(i, len(fr) - 1)] == s)
                return pa.table({"dst": pa.array(np.unique(d[m]), pa.int64())})

            nxt = (
                edges.map_batches(expand, batch_format="pyarrow")
                .unique("dst")
            )
            nxt = np.asarray(sorted(nxt), np.int64)
            fresh = nxt[~np.isin(nxt, visited)]
            for v in fresh:
                hop_of[int(v)] = hop
            if not len(fresh):
                break
            visited = np.sort(np.concatenate([visited, fresh]))
            frontier = np.sort(fresh)

    out = pd.DataFrame(
        {"doc_id": sorted(hop_of),
         "hop": [hop_of[k] for k in sorted(hop_of)]}
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["hop"] = out["hop"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- G8: common-neighbor similarity (link prediction) -------------------------------

G8_MIN_COMMON = 2


def g8_common_neighbors(sf_dir: str) -> pa.Table:
    """Out-neighbor overlap between node pairs — the link-prediction
    feature (common neighbors + Jaccard over fixed out-degree-3
    neighborhoods). Wedge enumeration on the REVERSE edge direction:
    group distinct edges by dst, emit the C(in-degree, 2) source
    pairs per group (in-degree is exactly |mults| here; real graphs
    need the g4 degree-orientation bound), then one (u, v) groupby
    counts common neighbors. Only wedge pairs shuffle — never
    neighborhoods."""
    _, edges, n = _bfs_edges(sf_dir)
    deg = len(BFS_EDGE_MULTS)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        srcs = np.unique(g["src"].to_numpy())
        if len(srcs) < 2:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        iu, iv = np.triu_indices(len(srcs), k=1)
        return pd.DataFrame({"u": srcs[iu], "v": srcs[iv],
                             "cnt": np.ones(len(iu), np.int64)})

    # distinct (src, dst) first: mult collisions must not double-count
    distinct = (
        edges.groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
    )
    common = (
        distinct.groupby("dst")
        .map_groups(pairs, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("cnt", alias_name="common"))
        .to_pandas()
    )
    common = common[common["common"] >= G8_MIN_COMMON].copy()
    common["common"] = common["common"].astype("int64")
    # distinct out-neighbors per node is deg here (bijective mults);
    # a collision (u has <deg distinct dsts) only shrinks the union
    common["jaccard"] = (
        common["common"] / (2 * deg - common["common"])
    ).round(6)
    out = (
        common[["u", "v", "common", "jaccard"]]
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    out["u"] = out["u"].astype("int64")
    out["v"] = out["v"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W12: cohort retention ----------------------------------------------------------


def w12_cohort_retention(sf_dir: str) -> pa.Table:
    """Cohort retention: users grouped by FIRST-ACTIVE day, distinct
    active users per (cohort day, day offset) — the product-analytics
    triangle. Three mergeable steps: per-batch distinct (user, day)
    partials → one groupby dedups the pairs; a Min groupby reduces
    them to per-user cohorts (user-sized, broadcast via ray.put —
    above a cap this becomes a key-partitioned join, j5's tiering);
    a final pass maps offsets and Sum-rolls the |cohorts × offsets|
    cells. Raw events never shuffle; the distinct-pair table is the
    largest exchanged object."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id", "ts"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = (
            df["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            // _NS_DAY
        )
        g = (
            pd.DataFrame({"user_id": df["user_id"], "day": day})
            .drop_duplicates()
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    cohort = (
        pairs.groupby("user_id")
        .aggregate(Min("day", alias_name="cohort"))
        .to_pandas()
    )
    if len(cohort) > ATTACH_BROADCAST_LIMIT:
        raise ValueError(
            f"{len(cohort)} users exceed ATTACH_BROADCAST_LIMIT="
            f"{ATTACH_BROADCAST_LIMIT}; replace the broadcast with a "
            "key-partitioned join of pairs onto cohorts (j5's tiering)"
        )
    co_ref = ray.put(dict(zip(cohort["user_id"].astype("int64"),
                              cohort["cohort"].astype("int64"))))

    def cell_partial(t: pa.Table) -> pa.Table:
        co = ray.get(co_ref)
        df = t.to_pandas()
        c = df["user_id"].map(co).to_numpy(np.int64)
        g = (
            pd.DataFrame(
                {"cohort_day": time_bucket_strings(
                    (c * _NS_DAY).astype("datetime64[ns]")),
                 "offset_days": df["day"].to_numpy(np.int64) - c}
            )
            .groupby(["cohort_day", "offset_days"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        pairs.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cohort_day", "offset_days"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
        .sort_values(["cohort_day", "offset_days"])
        .reset_index(drop=True)
    )
    out["offset_days"] = out["offset_days"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W13: incremental aggregate maintenance ----------------------------------------

W13_DELTA_MOD = 10  # event_id % 10 == 0 rows arrive as the late micro-batch


def w13_incremental_update(sf_dir: str) -> pa.Table:
    """Incremental aggregate maintenance: the daily (cnt, value_sum)
    table is built from the BASE stream (event_id % 10 != 0), then a
    late-arriving micro-batch (the % 10 == 0 rows) is folded in by
    union-merging the two PARTIAL aggregate tables and re-reducing —
    never re-reading the base data. The oracle is a full recompute
    over everything, so the hash check pins delta-merge ≡ recompute:
    the correctness property every incremental pipeline rests on.
    Both sides are partial+Sum shapes; the merge shuffles only
    |days| rows."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["event_id", "ts", "value"])

    def split_partial(keep_delta: bool):
        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            m = (df["event_id"].to_numpy(np.int64) % W13_DELTA_MOD == 0)
            df = df[m] if keep_delta else df[~m]
            if df.empty:
                return pa.table(
                    {"day": pa.array([], pa.string()),
                     "cnt": pa.array([], pa.int64()),
                     "value_sum": pa.array([], pa.float64())}
                )
            g = (
                df.assign(day=time_bucket_strings(df["ts"]))
                .groupby("day", as_index=False)
                .agg(cnt=("value", "size"), value_sum=("value", "sum"))
            )
            return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

        return partial

    def agg(part):
        return (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("day")
            .aggregate(Sum("cnt", alias_name="cnt"),
                       Sum("value_sum", alias_name="value_sum"))
        )

    # base state materialized once (the standing aggregate table);
    # the delta folds into it WITHOUT touching base rows again
    base_state = agg(split_partial(False)).materialize()
    delta = agg(split_partial(True))
    out = (
        base_state.union(delta)
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"),
                   Sum("value_sum", alias_name="value_sum"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["cnt"] = out["cnt"].astype("int64")
    out["value_sum"] = out["value_sum"].astype(float).round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- J16: spatial grid radius join ---------------------------------------------------

J16_EPS = 0.05
_J16_OFF = 1 << 20  # cell-coordinate offset so packed keys stay positive


def j16_spatial_grid_join(sf_dir: str) -> pa.Table:
    """All point pairs within L2 distance ε over the first two
    embedding dims — the radius self-join (geo joins, collision
    checks, cluster seeding), gridded: ε-sized cells, each point a
    HOME row in its own cell and a GHOST row in the 8 neighbors, so
    any qualifying pair co-locates in ≥1 cell. Dedup rule: a pair is
    emitted only in the LEXICOGRAPHICALLY SMALLEST of its two home
    cells (ghost rows carry their home-cell key), so cross-cell pairs
    appear exactly once. Per-cell work is a numpy broadcast over
    O(points-per-cell²) — bounded by the grid, never corpus-sized;
    output is linear in qualifying pairs. The oracle is the naive
    O(n²) cross join. Coordinates are f32 widened to f64 on BOTH
    sides (exact), so distances are bit-identical to the twin's."""
    from job_crawler_ray.util import read_parquet_clean

    eps = J16_EPS
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).repartition(8)

    def replicate(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks() if isinstance(
            t["embedding"], pa.ChunkedArray) else t["embedding"]
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        width = len(flat) // max(t.num_rows, 1) if t.num_rows else 0
        xy = flat.reshape(t.num_rows, width)[:, :2].astype(np.float64) \
            if t.num_rows else np.zeros((0, 2))
        ids = t["vec_id"].to_numpy()
        cx = np.floor(xy[:, 0] / eps).astype(np.int64) + _J16_OFF
        cy = np.floor(xy[:, 1] / eps).astype(np.int64) + _J16_OFF
        home = (cx << 21) | cy
        rows = {"cell": [], "home": [], "vec_id": [], "x": [], "y": [],
                "is_home": []}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = ((cx + dx) << 21) | (cy + dy)
                rows["cell"].append(cell)
                rows["home"].append(home)
                rows["vec_id"].append(ids)
                rows["x"].append(xy[:, 0])
                rows["y"].append(xy[:, 1])
                rows["is_home"].append(
                    np.full(len(ids), dx == 0 and dy == 0))
        return pa.table(
            {"cell": pa.array(np.concatenate(rows["cell"]), pa.int64()),
             "home": pa.array(np.concatenate(rows["home"]), pa.int64()),
             "vec_id": pa.array(np.concatenate(rows["vec_id"]), pa.int64()),
             "x": pa.array(np.concatenate(rows["x"]), pa.float64()),
             "y": pa.array(np.concatenate(rows["y"]), pa.float64()),
             "is_home": pa.array(np.concatenate(rows["is_home"]),
                                 pa.bool_())}
        )

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        h = g[g["is_home"]]
        if h.empty:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="float64")})
        hx = h["x"].to_numpy(); hy = h["y"].to_numpy()
        hid = h["vec_id"].to_numpy(np.int64)
        ax = g["x"].to_numpy(); ay = g["y"].to_numpy()
        aid = g["vec_id"].to_numpy(np.int64)
        ahome = g["home"].to_numpy(np.int64)
        d2 = (hx[:, None] - ax[None, :]) ** 2 + (hy[:, None] - ay[None, :]) ** 2
        ok = d2 < J16_EPS * J16_EPS
        # same-cell pairs once (id order); cross-cell pairs only in the
        # smaller home cell (ghost home > this cell)
        same = ahome[None, :] == cell
        ok &= np.where(same, hid[:, None] < aid[None, :],
                       ahome[None, :] > cell)
        ii, jj = np.nonzero(ok)
        a = np.minimum(hid[ii], aid[jj])
        b = np.maximum(hid[ii], aid[jj])
        return pd.DataFrame(
            {"a": a, "b": b, "dist": np.sqrt(d2[ii, jj])})

    out = (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    out["dist"] = out["dist"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- U4: schema-evolution union (by name) --------------------------------------------


def union_by_name(ds_a, ds_b):
    """UNION two Datasets whose schemas differ in column ORDER and
    PRESENCE (schema evolution across table generations): the union
    schema is a's columns then b's novel ones; each side fills its
    missing columns with typed nulls (types taken from the side that
    has them) and reorders — per-batch Arrow ops, zero-copy for the
    columns that exist. Ray's Dataset.union requires identical
    schemas; this is the by-name adapter every multi-generation lake
    read needs."""
    sa, sb = ds_a.schema(), ds_b.schema()
    ta = dict(zip(sa.names, sa.types))
    tb = dict(zip(sb.names, sb.types))
    cols = list(ta) + [c for c in tb if c not in ta]
    types = {**tb, **ta}  # a wins where both have the column

    def conform(t: pa.Table) -> pa.Table:
        arrays = []
        for c in cols:
            if c in t.column_names:
                arrays.append(t[c].cast(types[c]))
            else:
                arrays.append(pa.nulls(t.num_rows, type=types[c]))
        return pa.table(dict(zip(cols, arrays)))

    return ds_a.map_batches(conform, batch_format="pyarrow").union(
        ds_b.map_batches(conform, batch_format="pyarrow")
    )


def u4_union_by_name(sf_dir: str) -> pa.Table:
    """Two 'generations' of the documents table — gen1 (doc_id, text,
    lang, source) for even ids, gen2 a REORDERED SUBSET (source,
    doc_id, n_chars) for odd ids — unioned by name with typed-null
    fill; the UNION ALL BY NAME twin pins the semantics."""
    from job_crawler_ray.util import read_parquet_clean

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).repartition(8)
    gen1 = base.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
        ).select(["doc_id", "text", "lang", "source"]),
        batch_format="pyarrow",
    )
    gen2 = base.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)
        ).select(["source", "doc_id", "n_chars"]),
        batch_format="pyarrow",
    )
    out = (
        union_by_name(gen1, gen2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W20: time-in-state accounting -----------------------------------------------------


def w20_time_in_state(sf_dir: str) -> pa.Table:
    """Total seconds each event TYPE is the user's current state
    (state = latest event; an event holds the state until the user's
    next event) — temporal state-machine accounting. Two-level
    hot-key-bounded plan: per (user, 24 h bucket), in-bucket LEAD
    resolves every interval except the bucket's last event, which
    joins to the NEXT bucket's first-ts via the per-user bucket
    summary table (≤ #buckets rows per user, never raw history).
    Durations accumulate as exact int64 nanoseconds; one division at
    the end — float creep can't drift the twin comparison."""
    from job_crawler_ray.pipelines.windows import ASOF_BUCKET_HOURS, _events

    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        ns = t["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        t = t.append_column("ns", pa.array(ns, pa.int64()))
        return t.append_column(
            "_bucket", pa.array(ns // bucket_ns, pa.int64())
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ns", "event_id"], kind="mergesort")
        ns = g["ns"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        parts = []
        if len(g) > 1:
            dur = ns[1:] - ns[:-1]
            agg = (
                pd.DataFrame({"event_type": et[:-1], "dur": dur})
                .groupby("event_type", as_index=False)
                .agg(total_ns=("dur", "sum"), n=("dur", "size"))
            )
            agg["user_id"] = uid
            agg["_bucket"] = bkt
            agg["_kind"] = 1
            agg["ns"] = 0
            parts.append(agg)
        # summary: bucket's first ts (kind 0) + open last event (kind 2)
        parts.append(pd.DataFrame(
            {"event_type": ["", et[-1]], "total_ns": [0, 0], "n": [0, 0],
             "user_id": uid, "_bucket": bkt, "_kind": [0, 2],
             "ns": [int(ns[0]), int(ns[-1])]}
        ))
        return pd.concat(parts, ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    resolved = level1.map_batches(
        lambda t: t.filter(pc.equal(t["_kind"], 1)).select(
            ["event_type", "total_ns", "n"]),
        batch_format="pyarrow",
    )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["_kind"] == 0].sort_values("_bucket")
        o = g[g["_kind"] == 2].sort_values("_bucket")
        sb = s["_bucket"].to_numpy()
        sn = s["ns"].to_numpy(np.int64)
        idx = np.searchsorted(sb, o["_bucket"].to_numpy(), side="right")
        has = idx < len(sb)
        if not has.any():
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "total_ns": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        dur = sn[idx[has]] - o["ns"].to_numpy(np.int64)[has]
        return (
            pd.DataFrame({"event_type": o["event_type"].to_numpy()[has],
                          "dur": dur})
            .groupby("event_type", as_index=False)
            .agg(total_ns=("dur", "sum"), n=("dur", "size"))
        )

    filled = (
        level1.map_batches(
            lambda t: t.filter(pc.not_equal(t["_kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(fill, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
    )
    out = (
        resolved.union(filled)
        .groupby("event_type")
        .aggregate(Sum("total_ns", alias_name="total_ns"),
                   Sum("n", alias_name="n_intervals"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_intervals"] = out["n_intervals"].astype("int64")
    out["total_seconds"] = (out["total_ns"].astype("int64") / 1e9).round(6)
    return pa.Table.from_pandas(
        out[["event_type", "n_intervals", "total_seconds"]],
        preserve_index=False,
    )


# --- W21: event-transition matrix (Markov counts) --------------------------------------


def w21_transition_matrix(sf_dir: str) -> pa.Table:
    """Per-user event-type transition counts (state_i → state_i+1 in
    (ts, event_id) order), summed corpus-wide — the Markov/sequence-
    mining profile. Same two-level plan as w20: in-bucket consecutive
    pairs resolve locally and pre-aggregate to ≤ |types|² rows per
    group; each bucket's LAST event pairs with the NEXT bucket's
    FIRST event type via the per-user summary table."""
    from job_crawler_ray.pipelines.windows import ASOF_BUCKET_HOURS, _events

    bucket_ns = ASOF_BUCKET_HOURS * 3_600_000_000_000
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        ns = t["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        t = t.append_column("ns", pa.array(ns, pa.int64()))
        return t.append_column(
            "_bucket", pa.array(ns // bucket_ns, pa.int64())
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ns", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        uid = int(g["user_id"].iloc[0])
        bkt = int(g["_bucket"].iloc[0])
        parts = []
        if len(g) > 1:
            agg = (
                pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
                .groupby(["from_type", "to_type"], as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            )
            agg["user_id"] = uid
            agg["_bucket"] = bkt
            agg["_kind"] = 1
            parts.append(agg)
        parts.append(pd.DataFrame(
            {"from_type": [et[-1], ""], "to_type": ["", et[0]],
             "cnt": [0, 0], "user_id": uid, "_bucket": bkt,
             "_kind": [2, 0]}  # 2 = open last, 0 = first-type summary
        ))
        return pd.concat(parts, ignore_index=True)

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "_bucket"])
        .map_groups(local, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    resolved = level1.map_batches(
        lambda t: t.filter(pc.equal(t["_kind"], 1)).select(
            ["from_type", "to_type", "cnt"]),
        batch_format="pyarrow",
    )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["_kind"] == 0].sort_values("_bucket")
        o = g[g["_kind"] == 2].sort_values("_bucket")
        sb = s["_bucket"].to_numpy()
        first_ty = s["to_type"].to_numpy()
        idx = np.searchsorted(sb, o["_bucket"].to_numpy(), side="right")
        has = idx < len(sb)
        if not has.any():
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
        return (
            pd.DataFrame({"from_type": o["from_type"].to_numpy()[has],
                          "to_type": first_ty[idx[has]]})
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    filled = (
        level1.map_batches(
            lambda t: t.filter(pc.not_equal(t["_kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(fill, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
    )
    out = (
        resolved.union(filled)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    out = out[out["cnt"] > 0]
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(
        out.reset_index(drop=True), preserve_index=False
    )


# --- A39: day-of-week seasonality profile -------------------------------------------------------


def a39_dow_profile(sf_dir: str) -> pa.Table:
    """Event count and mean value per ISO weekday — the seasonality
    profile behind any staffing/capacity chart. One partial+Sum pass;
    weekday extraction is vectorized datetime math."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            pd.DataFrame(
                {"dow": df["ts"].dt.dayofweek.to_numpy(np.int64) + 1,
                 "value": df["value"]}
            )
            .groupby("dow", as_index=False)
            .agg(cnt=("value", "size"), value_sum=("value", "sum"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(Sum("cnt", alias_name="cnt"),
                   Sum("value_sum", alias_name="value_sum"))
        .to_pandas()
        .sort_values("dow")
        .reset_index(drop=True)
    )
    out["dow"] = out["dow"].astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    out["avg_value"] = (out["value_sum"] / out["cnt"]).round(6)
    return pa.Table.from_pandas(
        out[["dow", "cnt", "avg_value"]], preserve_index=False
    )


# --- S16: referential-integrity (FK) audit ------------------------------------------------------


def s16_fk_audit(sf_dir: str) -> pa.Table:
    """Foreign-key audit between orders and lineitem: orders with no
    line items, line items whose order key doesn't exist, and the
    healthy-intersection count — the referential-integrity report an
    ingest runs before joins are trusted. Both key sets reduce to
    DISTINCT keys map-side (batch-unique partials + one groupby
    each); the set algebra runs on the two key tables via a sorted
    merge, never touching fact rows twice."""
    orders_keys = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(
            lambda t: pa.table({"k": pc.unique(t["o_orderkey"])}),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .to_pandas()["k"]
        .to_numpy(np.int64)
    )
    li_keys = (
        _read(sf_dir, "lineitem", ["l_orderkey"])
        .map_batches(
            lambda t: pa.table({"k": pc.unique(t["l_orderkey"])}),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .to_pandas()["k"]
        .to_numpy(np.int64)
    )
    o = np.sort(orders_keys)
    l = np.sort(li_keys)
    childless = int((~np.isin(o, l)).sum())
    orphans = int((~np.isin(l, o)).sum())
    both = int(len(o) - childless)
    return pa.table(
        {"n_orders": pa.array([len(o)], pa.int64()),
         "n_li_orders": pa.array([len(l)], pa.int64()),
         "childless_orders": pa.array([childless], pa.int64()),
         "orphan_li_orders": pa.array([orphans], pa.int64()),
         "linked": pa.array([both], pa.int64())}
    )


# --- A38: cumulative distinct (running uniques) ------------------------------------------------


def a38_cumulative_uniques(sf_dir: str) -> pa.Table:
    """Cumulative distinct CUSTOMERS through each order month — the
    growth-chart query, which naively is a per-period COUNT(DISTINCT)
    over an expanding window (quadratic re-scan). Reformulated
    exactly: a customer increments the curve only in their FIRST
    order month, so one per-customer Min groupby + a |months| cumsum
    IS the running-uniques curve. Nothing expanding is ever
    re-scanned."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        month = (
            df["o_orderdate"].to_numpy().astype("datetime64[M]")
            .astype("int64")
        )
        g = (
            pd.DataFrame({"o_custkey": df["o_custkey"], "m": month})
            .groupby("o_custkey", as_index=False)
            .agg(first_m=("m", "min"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    first = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Min("first_m", alias_name="first_m"))
        .to_pandas()
    )
    monthly = (
        first.groupby("first_m", as_index=False)
        .size()
        .rename(columns={"size": "new_customers"})
        .sort_values("first_m")
        .reset_index(drop=True)
    )
    monthly["cum_customers"] = monthly["new_customers"].cumsum()
    ms = monthly["first_m"].to_numpy(np.int64).astype("datetime64[M]")
    monthly["month"] = np.datetime_as_string(ms).astype(object)
    out = monthly[["month", "new_customers", "cum_customers"]].astype(
        {"new_customers": "int64", "cum_customers": "int64"}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- S15: column null/empty profile -----------------------------------------------------------

S15_COLS = ("text", "lang", "source")


def s15_null_profile(sf_dir: str) -> pa.Table:
    """Per-column data-quality profile of the documents table: NULL
    count, empty-string count, and null ppm — the completeness report
    an ingest job emits before anything downstream trusts the data.
    One pass, one fixed-size (|columns|) partial per batch."""
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", *S15_COLS]
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in S15_COLS:
            col = t[c]
            n_null = int(col.null_count)
            n_empty = int(
                pc.sum(pc.equal(pc.fill_null(col, "__null__"), "")).as_py()
                or 0
            )
            rows.append((c, t.num_rows, n_null, n_empty))
        df = pd.DataFrame(
            rows, columns=["col_name", "n_rows", "n_null", "n_empty"]
        )
        return strip_meta(pa.Table.from_pandas(df, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_null", alias_name="n_null"),
                   Sum("n_empty", alias_name="n_empty"))
        .to_pandas()
        .sort_values("col_name")
        .reset_index(drop=True)
    )
    for c in ("n_rows", "n_null", "n_empty"):
        out[c] = out[c].astype("int64")
    out["null_ppm"] = (
        out["n_null"] * 1_000_000 // out["n_rows"]
    ).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- D11: normalization-aware (casefold) dedup -----------------------------------------------

D11_MIRROR_MOD = 5  # every 5th doc gets an UPPERCASED mirror copy


def d11_casefold_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup under CASE NORMALIZATION: keys are xxh64(lower(
    text)), so case-variant copies collapse (the canonicalize-then-
    dedup step real pipelines run before byte-exact dedup would miss
    them). The corpus adds an UPPERCASED mirror of every doc_id %% 5
    == 0 row so casefold groups genuinely exist; min-id wins. One
    hash groupby (16-byte rows) — duplicates-proportional shuffle."""
    from job_crawler_ray.hashing import xxh64_array
    from job_crawler_ray.util import read_parquet_clean

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(8)

    def corpus(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy() % D11_MIRROR_MOD == 0
        sub = t.filter(pa.array(keep))
        return pa.table(
            {"doc_id": pa.concat_arrays(
                [t["doc_id"].combine_chunks(),
                 pc.add(sub["doc_id"].combine_chunks(), 20000)]),
             "text": pa.concat_arrays(
                 [pc.fill_null(t["text"].combine_chunks(), ""),
                  pc.utf8_upper(
                      pc.fill_null(sub["text"].combine_chunks(), ""))])}
        )

    def keyed(t: pa.Table) -> pa.Table:
        h = xxh64_array(pc.utf8_lower(t["text"])).view(np.int64)
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "doc_id": t["doc_id"].cast(pa.int64()),
             "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}
        )

    out = (
        base.map_batches(corpus, batch_format="pyarrow")
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Sum("one", alias_name="n_variants"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_variants"] = out["n_variants"].astype("int64")
    return pa.Table.from_pandas(
        out[["doc_id", "n_variants"]], preserve_index=False
    )


# --- A35: TPC-H-Q6-shaped selective revenue --------------------------------------------------

A35_Y0, A35_Y1 = "1996-01-01", "1997-01-01"
A35_D_LO, A35_D_HI = 0.03, 0.07
A35_QTY = 24.0


def a35_q6_revenue(sf_dir: str) -> pa.Table:
    """The TPC-H Q6 shape: revenue effect of a discount band over one
    shipment year with a quantity cap — the selective-scan benchmark,
    with EVERY predicate pushed into the parquet fragment scan
    (pyarrow dataset expression → row-group statistics skip) and only
    the two needed columns decoded. What survives is one scalar
    (sum, n) partial per block."""
    import pyarrow.dataset as pads

    from ray.data import read_parquet

    expr = (
        (pads.field("l_shipdate") >= np.datetime64(A35_Y0, "us"))
        & (pads.field("l_shipdate") < np.datetime64(A35_Y1, "us"))
        & (pads.field("l_discount") >= A35_D_LO)
        & (pads.field("l_discount") <= A35_D_HI)
        & (pads.field("l_quantity") < A35_QTY)
    )
    ds = read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=expr,
    )

    def partial(t: pa.Table) -> pa.Table:
        # exact int64 ten-thousandths (price and discount each carry 2
        # decimals) — order-independent sum, the j11 rule
        rev_e4 = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64) * np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"revenue_e4": [int(rev_e4.sum())],
                         "n": [int(t.num_rows)]})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    return pa.table(
        {"revenue": pa.array([int(p["revenue_e4"]) / 10000.0], pa.float64()),
         "n_lineitems": pa.array([int(p["n"])], pa.int64())}
    )


# --- A34: TPC-H-Q1-shaped pricing summary ---------------------------------------------------

A34_CUTOFF = "1998-09-02"


def a34_pricing_summary(sf_dir: str) -> pa.Table:
    """The TPC-H Q1 shape over lineitem: per (returnflag, linestatus),
    sums/averages of quantity, base price, discounted price, and
    discounted+taxed price for rows shipped on or before the cutoff —
    the canonical columnar-scan + partial-agg benchmark query. Every
    aggregate is a mergeable (sum, count) pair; averages divide once
    at the end. Money sums at 1e8+ round to 2 dp (the j6 rule)."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax", "l_shipdate"],
    )
    cutoff = np.datetime64(A34_CUTOFF, "ns").astype("int64")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ns = df["l_shipdate"].to_numpy().astype("datetime64[ns]").astype(
            "int64")
        df = df[ns <= cutoff]
        if df.empty:
            return pa.table(
                {c: pa.array([], ty) for c, ty in
                 [("l_returnflag", pa.string()),
                  ("l_linestatus", pa.string()),
                  ("sum_qty", pa.float64()), ("base_e2", pa.int64()),
                  ("disc_e4", pa.int64()), ("charge_e6", pa.int64()),
                  ("discount_e2", pa.int64()), ("n", pa.int64())]}
            )
        # exact integer units (price/discount/tax all have 2 decimals):
        # cents, ten-thousandths and millionths sum order-independently
        # in int64 — a float SUM at 1e7+ magnitude flips the last cent
        # on summation order at .xx5 cells (the j11 rule; this query
        # flaked exactly that way at sf0.001)
        price_e2 = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
            np.int64)
        disc_fac_e2 = np.rint((1.0 - df["l_discount"].to_numpy()) * 100
                              ).astype(np.int64)
        tax_fac_e2 = np.rint((1.0 + df["l_tax"].to_numpy()) * 100).astype(
            np.int64)
        disc_e2 = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        g = (
            pd.DataFrame(
                {"l_returnflag": df["l_returnflag"],
                 "l_linestatus": df["l_linestatus"],
                 "sum_qty": df["l_quantity"],
                 "base_e2": price_e2,
                 "disc_e4": price_e2 * disc_fac_e2,
                 "charge_e6": price_e2 * disc_fac_e2 * tax_fac_e2,
                 "discount_e2": disc_e2}
            )
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("sum_qty", "sum"), base_e2=("base_e2", "sum"),
                 disc_e4=("disc_e4", "sum"),
                 charge_e6=("charge_e6", "sum"),
                 discount_e2=("discount_e2", "sum"),
                 n=("sum_qty", "size"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("base_e2", alias_name="base_e2"),
                   Sum("disc_e4", alias_name="disc_e4"),
                   Sum("charge_e6", alias_name="charge_e6"),
                   Sum("discount_e2", alias_name="discount_e2"),
                   Sum("n", alias_name="count_order"))
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    out["count_order"] = out["count_order"].astype("int64")
    # exact int64 sums / power-of-ten scale: bit-identical doubles in
    # both twins, no final rounding needed on the sums. int64 headroom:
    # charge_e6 ≈ 1e11/row peaks ⇒ safe to ~9e7 rows per group; beyond
    # that split into two accumulators (hi/lo) or move to e4 + a
    # residual column — the 100 TB note.
    out["sum_base"] = out.pop("base_e2") / 100.0
    out["sum_disc"] = out.pop("disc_e4") / 10000.0
    out["sum_charge"] = out.pop("charge_e6") / 1000000.0
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(6)
    out["avg_price"] = (out["sum_base"] / out["count_order"]).round(6)
    out["avg_disc"] = (
        out.pop("discount_e2") / 100.0 / out["count_order"]
    ).round(6)
    return pa.Table.from_pandas(
        out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base",
             "sum_disc", "sum_charge", "avg_qty", "avg_price", "avg_disc",
             "count_order"]],
        preserve_index=False,
    )


# --- J19: 1-D nearest-neighbor self-join ---------------------------------------------------

J19_BUCKET_W = 10_000.0


def j19_nearest_price(sf_dir: str) -> pa.Table:
    """For every order, the distance to the NEAREST other order's
    total price — the 1-D nearest-neighbor self-join (sorted
    adjacency: the nearest other value is always a sorted neighbor),
    WITHOUT a global sort: price-range buckets sort locally and
    resolve interior rows; each bucket's first/last rows consult the
    previous/next non-empty bucket's max/min from the |buckets|
    driver summary (broadcast). The j16 idea in one dimension, exact
    over duplicates (equal prices ⇒ distance 0)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.floor(
            t["o_totalprice"].to_numpy() / J19_BUCKET_W
        ).astype(np.int64)
        return t.append_column("_b", pa.array(b, pa.int64()))

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        p = g["o_totalprice"].to_numpy(np.float64)
        k = g["o_orderkey"].to_numpy(np.int64)
        n = len(p)
        cand = np.full(n, np.inf)
        if n > 1:
            d_prev = np.concatenate(([np.inf], p[1:] - p[:-1]))
            d_next = np.concatenate((p[1:] - p[:-1], [np.inf]))
            cand = np.minimum(d_prev, d_next)
        return pd.DataFrame(
            {"o_orderkey": k, "price": p, "cand": cand,
             "_b": int(g["_b"].iloc[0]),
             "pos": np.arange(n, dtype=np.int64),
             "last_pos": np.int64(n - 1)}
        )

    level1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(local, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    summ = (
        level1.map_batches(
            lambda t: strip_meta(pa.Table.from_pandas(
                t.to_pandas().groupby("_b", as_index=False).agg(
                    lo=("price", "min"), hi=("price", "max")),
                preserve_index=False)),
            batch_format="pyarrow",
        )
        .groupby("_b")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .to_pandas()
        .sort_values("_b")
        .reset_index(drop=True)
    )
    sb = summ["_b"].to_numpy(np.int64)
    lo = summ["lo"].to_numpy(np.float64)
    hi = summ["hi"].to_numpy(np.float64)
    sum_ref = ray.put((sb, lo, hi))

    def resolve(t: pa.Table) -> pa.Table:
        sb_, lo_, hi_ = ray.get(sum_ref)
        df = t.to_pandas()
        cand = df["cand"].to_numpy(np.float64).copy()
        p = df["price"].to_numpy(np.float64)
        b = df["_b"].to_numpy(np.int64)
        i = np.searchsorted(sb_, b)
        first = df["pos"].to_numpy() == 0
        if first.any():
            has_prev = i[first] > 0
            d = np.full(first.sum(), np.inf)
            d[has_prev] = p[first][has_prev] - hi_[i[first][has_prev] - 1]
            cand[first] = np.minimum(cand[first], d)
        last = df["pos"].to_numpy() == df["last_pos"].to_numpy()
        if last.any():
            has_next = i[last] < len(sb_) - 1
            d = np.full(last.sum(), np.inf)
            d[has_next] = lo_[i[last][has_next] + 1] - p[last][has_next]
            cand[last] = np.minimum(cand[last], d)
        return pa.table(
            {"o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
             "nearest_diff": pa.array(np.round(cand, 6), pa.float64())}
        )

    out = (
        level1.map_batches(resolve, batch_format="pyarrow")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W23: forward fill (LOCF) over the day spine ------------------------------------------

W23_SPARSE_MOD = 3  # only every 3rd day "reports" → real gaps to fill


def w23_forward_fill(sf_dir: str) -> pa.Table:
    """Last-observation-carried-forward imputation over a COMPLETE
    day spine: a sparse daily metric (only days where day-int %% 3 ==
    0 report, so gaps genuinely exist) forward-fills missing days
    from the most recent observation — the LOCF step every
    time-series consumer runs before modeling. The corpus pass is one
    daily partial+Sum; spine + fill run on the |days| driver frame
    (prefix semantics, the w4 shape). Leading unfilled days stay
    NULL."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = (
            df["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            // _NS_DAY
        )
        g = (
            pd.DataFrame({"day": day, "value": df["value"]})
            .groupby("day", as_index=False)
            .agg(value_sum=("value", "sum"), cnt=("value", "size"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("value_sum", alias_name="value_sum"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    daily["avg_value"] = daily["value_sum"] / daily["cnt"]
    daily.loc[daily["day"] % W23_SPARSE_MOD != 0, "avg_value"] = np.nan
    spine = pd.DataFrame(
        {"day": np.arange(daily["day"].min(), daily["day"].max() + 1)}
    )
    out = spine.merge(daily[["day", "avg_value"]], on="day", how="left")
    out["observed"] = out["avg_value"].notna()
    out["avg_value"] = out["avg_value"].ffill().round(6)
    out["day_str"] = time_bucket_strings(
        (out["day"].to_numpy(np.int64) * _NS_DAY).astype("datetime64[ns]")
    )
    res = out[["day_str", "observed", "avg_value"]].rename(
        columns={"day_str": "day"}
    )
    return pa.Table.from_pandas(res, preserve_index=False)


# --- G15: degree assortativity -----------------------------------------------------------


def g15_degree_assortativity(sf_dir: str) -> pa.Table:
    """Pearson correlation of (src out-degree, dst out-degree) over
    the distinct directed edges — degree assortativity, the
    hub-connects-to-hub summary that predicts shuffle skew in graph
    ops. Degrees come from one groupby (node-sized); the per-edge
    degree attach is a broadcast searchsorted (guarded by
    ATTACH_BROADCAST_LIMIT); the correlation is a15's six co-moment
    partials."""
    _, edges, n = _bfs_edges(sf_dir)
    distinct = (
        edges.groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    deg = (
        distinct.map_batches(
            lambda t: pa.table(
                {"node": t["src"],
                 "d": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()
        .sort_values("node")
    )
    if len(deg) > ATTACH_BROADCAST_LIMIT:
        raise ValueError(
            f"{len(deg)} nodes exceed ATTACH_BROADCAST_LIMIT="
            f"{ATTACH_BROADCAST_LIMIT}; attach degrees with two hash "
            "joins (deg onto edges by src, then dst) instead"
        )
    deg_ref = ray.put((deg["node"].to_numpy(np.int64),
                       deg["d"].to_numpy(np.int64)))

    def moments(t: pa.Table) -> pa.Table:
        nodes, d = ray.get(deg_ref)

        def look(col):
            v = col.to_numpy()
            i = np.searchsorted(nodes, v)
            ok = (i < len(nodes)) & (nodes[np.minimum(i, len(nodes) - 1)] == v)
            out = np.zeros(len(v), np.float64)
            out[ok] = d[i[ok]]
            return out

        x, y = look(t["src"]), look(t["dst"])
        return pa.table(
            {"n": [float(len(x))], "sx": [float(x.sum())],
             "sy": [float(y.sum())], "sxx": [float((x * x).sum())],
             "syy": [float((y * y).sum())], "sxy": [float((x * y).sum())]}
        )

    p = distinct.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    nn = p["n"]
    cov = p["sxy"] / nn - (p["sx"] / nn) * (p["sy"] / nn)
    vx = p["sxx"] / nn - (p["sx"] / nn) ** 2
    vy = p["syy"] / nn - (p["sy"] / nn) ** 2
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    return pa.table(
        {"n_edges": pa.array([int(nn)], pa.int64()),
         "assortativity": pa.array([round(float(r), 6)], pa.float64())}
    )


# --- A33: top-k with OTHERS bucket ------------------------------------------------------

A33_K = 3


def a33_topk_others(sf_dir: str) -> pa.Table:
    """Top-3 busiest days by event count plus one OTHERS row rolling
    up the rest — the chart-legend aggregation (every dashboard's
    long-tail fold). One daily partial+Sum; the top-k split and
    OTHERS fold run on the |days| driver frame. Ties break to the
    earlier day."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            pd.DataFrame({"day": time_bucket_strings(df["ts"])})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(["cnt", "day"], ascending=[False, True])
        .reset_index(drop=True)
    )
    top = daily.iloc[:A33_K].copy()
    top["bucket"] = top["day"]
    others = pd.DataFrame(
        {"bucket": ["OTHERS"], "cnt": [daily["cnt"].iloc[A33_K:].sum()]}
    )
    out = pd.concat([top[["bucket", "cnt"]], others], ignore_index=True)
    out["cnt"] = out["cnt"].astype("int64")
    out = out.sort_values("bucket").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- G14: reciprocal (mutual) links -----------------------------------------------------


def g14_reciprocal_links(sf_dir: str) -> pa.Table:
    """Mutual-edge pairs (u→v AND v→u) in the directed synthetic
    graph — the reciprocity detector (follow-back analysis, symmetric
    relation mining). No join: every directed edge maps to its
    unordered (min, max) key; a pair is mutual iff its key has BOTH
    orientations, i.e. 2 distinct directed edges — one groupby over
    16-byte rows."""
    _, edges, n = _bfs_edges(sf_dir)

    def orient(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        m = s != d  # self-loops can't be mutual
        s, d = s[m], d[m]
        g = (
            pd.DataFrame({"u": np.minimum(s, d), "v": np.maximum(s, d),
                          "fwd": (s < d).astype(np.int64),
                          "rev": (s > d).astype(np.int64)})
            .groupby(["u", "v"], as_index=False)
            .agg(fwd=("fwd", "max"), rev=("rev", "max"))
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        edges.map_batches(orient, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Max("fwd", alias_name="fwd"), Max("rev", alias_name="rev"))
        .to_pandas()
    )
    out = out[(out["fwd"] > 0) & (out["rev"] > 0)]
    out = (
        out[["u", "v"]].sort_values(["u", "v"]).reset_index(drop=True)
    )
    out["u"] = out["u"].astype("int64")
    out["v"] = out["v"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- T: character-bigram entropy -------------------------------------------------------


def t_char_entropy(sf_dir: str) -> pa.Table:
    """Per-doc character-BIGRAM Shannon entropy (log2) — the
    gibberish/boilerplate signal complementing t_compress_ratio
    (low entropy = repetitive templates, near-max = keyboard mash).
    Kernel: one byte-view per doc, bigrams as uint16 words, bincount
    — C throughout, no Python string slicing. ASCII corpus contract
    (multi-byte UTF-8 would count byte-bigrams; documented)."""
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(strip_meta, batch_format="pyarrow").repartition(8)

    def ent(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = np.zeros(len(texts), np.float64)
        n_bg = np.zeros(len(texts), np.int64)
        for i, tx in enumerate(texts):
            b = np.frombuffer((tx or "").encode(), dtype=np.uint8)
            if len(b) < 2:
                continue
            bg = b[:-1].astype(np.uint16) * 256 + b[1:]
            cnt = np.bincount(bg)
            cnt = cnt[cnt > 0]
            p = cnt / cnt.sum()
            out[i] = round(float(-(p * np.log2(p)).sum()), 6)
            n_bg[i] = len(b) - 1
        return pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()),
             "n_bigrams": pa.array(n_bg, pa.int64()),
             "bigram_entropy": pa.array(out, pa.float64())}
        )

    out = (
        ds.map_batches(ent, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- J18: nearest-centroid assignment (1-NN classifier eval) ---------------------------


def j18_centroid_assign(sf_dir: str) -> pa.Table:
    """Assign every embedding its max-cosine LABEL CENTROID and emit
    the (true_label, assigned_label) confusion counts — the
    centroid-classifier eval loop (and the assignment step of
    semantic dedup / clustering audits). Centroids come from the a32
    machinery; the assignment pass broadcasts the |labels|×dim
    centroid matrix via ray.put and argmaxes one numpy matmul per
    batch; the confusion rollup is a |labels|² partial+Sum. Ties
    break to the smaller label on BOTH sides."""
    from job_crawler_ray.util import read_parquet_clean

    cents = a32_label_centroids(sf_dir).to_pandas()
    labels = np.sort(cents["label"].unique())
    width = cents["dim"].max() + 1
    mat = np.zeros((len(labels), width), dtype=np.float64)
    for i, lb in enumerate(labels):
        sub = cents[cents["label"] == lb].sort_values("dim")
        mat[i] = sub["mean_v"].to_numpy(np.float64)
    cnorm = np.sqrt((mat * mat).sum(axis=1))
    cent_ref = ray.put((labels.astype(np.int64), mat, cnorm))

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label",
                                                 "embedding"]
    ).repartition(8)

    def assign(t: pa.Table) -> pa.Table:
        labs, m, cn = ray.get(cent_ref)
        emb = t["embedding"].combine_chunks() if isinstance(
            t["embedding"], pa.ChunkedArray) else t["embedding"]
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        w = len(flat) // max(t.num_rows, 1) if t.num_rows else 0
        x = flat.reshape(t.num_rows, w).astype(np.float64) \
            if t.num_rows else np.zeros((0, 0))
        xn = np.sqrt((x * x).sum(axis=1))
        cos = (x @ m.T) / np.maximum(xn[:, None] * cn[None, :], 1e-300)
        best = labs[np.argmax(cos, axis=1)]  # argmax: first (smallest) wins
        g = (
            pd.DataFrame({"true_label": t["label"].to_numpy().astype(np.int64),
                          "assigned_label": best})
            .groupby(["true_label", "assigned_label"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["true_label", "assigned_label"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(["true_label", "assigned_label"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A32: label centroids (vector mean-pool aggregate) ---------------------------------


def a32_label_centroids(sf_dir: str) -> pa.Table:
    """Element-wise MEAN of the embedding vector per label — the
    vector aggregate (centroid / mean-pool) shape: each batch reduces
    its rows to |labels| (sum-vector, n) partials, flattened to
    (label, dim, s, n) rows so the groupby Sum stays scalar; the
    division happens once per output cell. Long-form output so the
    unnest-with-subscripts twin hashes it."""
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks() if isinstance(
            t["embedding"], pa.ChunkedArray) else t["embedding"]
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        width = len(flat) // max(t.num_rows, 1) if t.num_rows else 0
        mat = flat.reshape(t.num_rows, width).astype(np.float64) \
            if t.num_rows else np.zeros((0, 0))
        lab = t["label"].to_numpy()
        parts = []
        for lb in np.unique(lab):
            sub = mat[lab == lb]
            parts.append(pd.DataFrame(
                {"label": int(lb), "dim": np.arange(width, dtype=np.int64),
                 "s": sub.sum(axis=0), "n": np.int64(len(sub))}))
        if not parts:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return strip_meta(pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    out["label"] = out["label"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    out["mean_v"] = (out["s"] / out["n"]).round(6)
    return pa.Table.from_pandas(
        out[["label", "dim", "mean_v"]], preserve_index=False
    )


# --- A31: pairwise correlation matrix --------------------------------------------------

A31_FEATS = ("value", "hour", "dow")


def a31_corr_matrix(sf_dir: str) -> pa.Table:
    """Pearson correlation MATRIX over three event features (value,
    hour-of-day, day-of-week) in ONE pass — a15's co-moment shape
    extended to all pairs at once: each block reduces to n + 3 sums +
    6 cross-sums (10 numbers regardless of rows), the driver finishes
    every pairwise moment from the same partial table. The feature-
    matrix profile step of any model-prep pipeline."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts", "value"])
    feats = A31_FEATS

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cols = {
            "value": df["value"].to_numpy(np.float64),
            "hour": df["ts"].dt.hour.to_numpy(np.float64),
            "dow": df["ts"].dt.dayofweek.to_numpy(np.float64),
        }
        out = {"n": [float(len(df))]}
        for i, a in enumerate(feats):
            out[f"s_{a}"] = [float(cols[a].sum())]
            for b in feats[i:]:
                out[f"s_{a}_{b}"] = [float((cols[a] * cols[b]).sum())]
        return pa.table(out)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = p["n"]
    rows = []
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            cov = p[f"s_{a}_{b}"] / n - (p[f"s_{a}"] / n) * (p[f"s_{b}"] / n)
            va = p[f"s_{a}_{a}"] / n - (p[f"s_{a}"] / n) ** 2
            vb = p[f"s_{b}_{b}"] / n - (p[f"s_{b}"] / n) ** 2
            corr = cov / np.sqrt(va * vb) if va > 0 and vb > 0 else 0.0
            rows.append((a, b, round(float(corr), 6)))
    out = pd.DataFrame(rows, columns=["feat_a", "feat_b", "corr"])
    return pa.Table.from_pandas(
        out.sort_values(["feat_a", "feat_b"]).reset_index(drop=True),
        preserve_index=False,
    )


# --- W19: gaps-and-islands (longest streak) -------------------------------------------


def w19_streaks(sf_dir: str) -> pa.Table:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern (day − rank is constant within an
    island). The corpus reduces to distinct (user, day-int) pairs in
    one groupby; the island scan runs per user over ≤ |distinct days|
    rows (bounded by the calendar domain, not user volume — a hot
    user has at most one row per day by construction)."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id", "ts"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = (
            df["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            // _NS_DAY
        )
        g = pd.DataFrame({"user_id": df["user_id"],
                          "day": day}).drop_duplicates()
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
    )

    def longest(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["day"].to_numpy(np.int64))
        island = d - np.arange(len(d))  # constant within a streak
        _, counts = np.unique(island, return_counts=True)
        return pd.DataFrame(
            {"user_id": [int(g["user_id"].iloc[0])],
             "active_days": [len(d)],
             "longest_streak": [int(counts.max())]}
        )

    out = (
        pairs.groupby("user_id")
        .map_groups(longest, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W18: conversion latency percentile ----------------------------------------------


def w18_conversion_latency(sf_dir: str) -> pa.Table:
    """Median seconds from a user's first view to their last purchase
    that day, per day — the conversion-LATENCY metric on top of w8's
    conversion-RATE machinery: the same two mergeable (user, day)
    sentinel aggregates, then an exact per-day quantile_disc median
    over the converted pairs via `grouped_kth_exact` (histogram
    selection — the |users × days| pair table never sorts
    globally)."""
    from job_crawler_ray.pipelines.windows import _events

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(("view", "purchase"))]
        if df.empty:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "day": pa.array([], pa.string()),
                 "first_view": pa.array([], pa.int64()),
                 "last_purchase": pa.array([], pa.int64())}
            )
        df["day"] = time_bucket_strings(df["ts"])
        ns = df["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        df["first_view"] = np.where(df["event_type"] == "view", ns, _TS_MAX)
        df["last_purchase"] = np.where(
            df["event_type"] == "purchase", ns, _TS_MIN
        )
        g = df.groupby(["user_id", "day"], as_index=False).agg(
            first_view=("first_view", "min"),
            last_purchase=("last_purchase", "max"),
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    pairs = (
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(
            Min("first_view", alias_name="first_view"),
            Max("last_purchase", alias_name="last_purchase"),
        )
    )

    def latency(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[(df["first_view"] != _TS_MAX)
                & (df["last_purchase"] > df["first_view"])]
        if df.empty:
            return pa.table({"day": pa.array([], pa.string()),
                             "lat_s": pa.array([], pa.float64())})
        lat = (df["last_purchase"] - df["first_view"]) / 1e9
        return pa.table({"day": pa.array(df["day"], pa.string()),
                         "lat_s": pa.array(lat.to_numpy(), pa.float64())})

    # materialize: grouped_kth_exact makes 2-3 passes over its input,
    # and this lineage contains a shuffle — re-executing it per pass
    # is the bloom-anti-join multi-execution bug (VERDICT r3 wrong #4)
    lat_ds = pairs.map_batches(latency, batch_format="pyarrow").materialize()
    out = grouped_kth_exact(lat_ds, "day", "lat_s", q=0.5).to_pandas()
    out = out.rename(columns={"median_val": "median_latency_s"})
    out["median_latency_s"] = out["median_latency_s"].round(6)
    return pa.Table.from_pandas(
        out.sort_values("day").reset_index(drop=True), preserve_index=False
    )


# --- A30: median absolute deviation ---------------------------------------------------


def a30_mad(sf_dir: str) -> pa.Table:
    """Median absolute deviation of order totals — the robust-scale
    statistic, as TWO chained selection passes: quantile_disc median
    of the values, then quantile_disc median of |x − med| (a derived
    per-batch column, never materialized) — each pass the same
    no-global-sort histogram selection. Completes the robust-stats
    family next to a25's moments and a22/a24's percentiles."""
    val = "o_totalprice"
    ds = _read(sf_dir, "orders", [val])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(["all"] * t.num_rows,
                                             pa.string()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    med = float(
        grouped_kth_exact(tagged, "g", val, q=0.5)
        .to_pandas()["median_val"].iloc[0]
    )

    def dev(t: pa.Table) -> pa.Table:
        d = np.abs(t[val].to_numpy(zero_copy_only=False) - med)
        return pa.table(
            {"g": pa.array(["all"] * t.num_rows, pa.string()),
             "dev": pa.array(d, pa.float64())}
        )

    mad = float(
        grouped_kth_exact(
            ds.map_batches(dev, batch_format="pyarrow"), "g", "dev", q=0.5
        ).to_pandas()["median_val"].iloc[0]
    )
    return pa.table(
        {"median_val": pa.array([round(med, 6)], pa.float64()),
         "mad": pa.array([round(mad, 6)], pa.float64())}
    )


# --- A29: Gini concentration coefficient ----------------------------------------------


def a29_gini(sf_dir: str) -> pa.Table:
    """Gini coefficient of per-user event-volume concentration — the
    skew metric itself as an operator (how Zipf-headed is the
    workload the engine must shuffle?). One (user → count) groupby
    reduces the corpus to a user-bounded frame; the Gini formula
    (2·Σ i·xᵢ / (n·Σx) − (n+1)/n over ascending counts) runs on that
    frame. Exact integer arithmetic until the final division."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby("user_id", as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    x = np.sort(counts["cnt"].to_numpy(np.int64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    gini = 2.0 * float((i * x).sum()) / (n * float(x.sum())) - (n + 1) / n
    return pa.table(
        {"n_users": pa.array([n], pa.int64()),
         "total_events": pa.array([int(x.sum())], pa.int64()),
         "gini": pa.array([round(gini, 6)], pa.float64())}
    )


# --- A28: per-entity distribution entropy ---------------------------------------------


def a28_group_entropy(sf_dir: str) -> pa.Table:
    """Shannon entropy (log2) of each user's event-type distribution —
    the behavioral-diversity feature. (user, type) partial counts
    Sum-merge (the only corpus shuffle); the entropy reduce runs per
    user over ≤ |event types| rows — group size is bounded by the
    type-domain, not by user volume, so hot users cost nothing."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id", "event_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = g["cnt"].to_numpy(np.float64)
        p = c / c.sum()
        h = float(-(p * np.log2(p)).sum())
        return pd.DataFrame({"user_id": [int(g["user_id"].iloc[0])],
                             "h": [round(h, 6)]})

    out = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("user_id")
        .map_groups(entropy, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out["user_id"] = out["user_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- D10: soft dedup (repetition-discounted weights) ---------------------------------


def d10_soft_dedup(sf_dir: str) -> pa.Table:
    """SOFT dedup: instead of dropping duplicate texts, every copy
    gets sample weight 1/copies (repetition down-weighting, the
    keep-everything alternative when exact drops are too blunt). The
    corpus is documents plus the d9 mirror copies so dup groups
    exist. One (hash → count) groupby moves 16-byte rows; the weight
    attach is a broadcast dict of the |distinct texts| counts
    (fragment-store tier above the cap, analytics.py:169)."""
    from job_crawler_ray.hashing import xxh64_array
    from job_crawler_ray.util import read_parquet_clean

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(8)

    def corpus(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy() % D9_MIRROR_MOD == 0
        sub = t.filter(pa.array(keep))
        return pa.table(
            {"doc_id": pa.concat_arrays(
                [t["doc_id"].combine_chunks(),
                 pc.add(sub["doc_id"].combine_chunks(), 10000)]),
             "text": pa.concat_arrays(
                 [pc.fill_null(t["text"].combine_chunks(), ""),
                  pc.fill_null(sub["text"].combine_chunks(), "")])}
        )

    docs = base.map_batches(corpus, batch_format="pyarrow").materialize()

    def keyed(t: pa.Table) -> pa.Table:
        h = xxh64_array(t["text"]).view(np.int64)
        g = (
            pd.DataFrame({"h": h})
            .groupby("h", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    counts = (
        docs.map_batches(keyed, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(counts) > ATTACH_BROADCAST_LIMIT:
        raise ValueError(
            f"{len(counts)} distinct texts exceed ATTACH_BROADCAST_LIMIT="
            f"{ATTACH_BROADCAST_LIMIT}; use the id-bucketed fragment-store "
            "attach (textops._IdSetFilter machinery) instead of a broadcast"
        )
    counts = counts.sort_values("h")
    cnt_ref = ray.put((counts["h"].to_numpy(np.int64),
                       counts["n"].to_numpy(np.int64)))

    def attach(t: pa.Table) -> pa.Table:
        hk, hn = ray.get(cnt_ref)
        h = xxh64_array(t["text"]).view(np.int64)
        copies = hn[np.searchsorted(hk, h)]
        return pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()),
             "copies": pa.array(copies, pa.int64()),
             "weight": pa.array(np.round(1.0 / copies, 6), pa.float64())}
        )

    out = (
        docs.map_batches(attach, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A27: rolling sketch union (mergeable HLL over windows) --------------------------

A27_WINDOW_DAYS = 7


def a27_rolling_hll(sf_dir: str) -> pa.Table:
    """Rolling 7-day distinct users per day via MERGEABLE HLL
    sketches: one register vector per day (per-batch partials,
    elementwise-max merge), then each day's rolling estimate is the
    max-union of ≤7 day vectors — sketch mergeability is the property
    that makes windowed distinct counts free at 100 TB (re-scanning 7
    days of raw data per window is the alternative). Oracle-bound-
    checked like a9: the exact rolling distinct count is computed
    from the deduped (user, day) pairs and emitted with a within-5%
    flag the twin pins TRUE."""
    from job_crawler_ray.pipelines.textops import (
        HLL_P, hll_merge_estimate, hll_partial_batch,
    )
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["user_id", "ts"]).materialize()
    m = 1 << HLL_P

    def day_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = time_bucket_strings(df["ts"])
        parts = []
        for day, sub in df.groupby("day"):
            regs = hll_partial_batch(
                pa.table({"user_id": pa.array(sub["user_id"], pa.int64())}),
                "user_id",
            )
            parts.append(
                pa.table({"day": pa.array([day], pa.string()),
                          "regs": regs["regs"]})
            )
        if not parts:
            return pa.table({"day": pa.array([], pa.string()),
                             "regs": pa.array([], pa.list_(pa.uint8(), m))})
        return pa.concat_tables(parts)

    per_day: dict[str, np.ndarray] = {}
    for tb in ds.map_batches(day_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=256
    ):
        days = tb["day"].to_pylist()
        regs = np.asarray(tb["regs"].combine_chunks().flatten()).reshape(
            len(days), m
        )
        for d, r in zip(days, regs):
            per_day[d] = np.maximum(per_day[d], r) if d in per_day else r.copy()

    # exact side: deduped (user, day) pairs, rolling distinct on the
    # |users × days|-bounded driver frame
    pairs = (
        ds.map_batches(
            lambda t: strip_meta(pa.Table.from_pandas(
                pd.DataFrame(
                    {"user_id": t["user_id"].to_numpy(),
                     "day": time_bucket_strings(t["ts"].to_pandas())}
                ).drop_duplicates(),
                preserve_index=False,
            )),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_m"))
        .to_pandas()
    )
    days = sorted(per_day)
    day_idx = {d: i for i, d in enumerate(days)}
    rows = []
    for i, d in enumerate(days):
        window = [dd for dd in days if 0 <= i - day_idx[dd] < A27_WINDOW_DAYS]
        regs = np.zeros(m, dtype=np.uint8)
        for dd in window:
            regs = np.maximum(regs, per_day[dd])
        est = hll_merge_estimate(regs)
        exact = pairs.loc[pairs["day"].isin(window), "user_id"].nunique()
        ok = abs(est - exact) / max(exact, 1) <= 0.05
        rows.append((d, int(exact), bool(ok)))
    out = pd.DataFrame(
        rows, columns=["day", "exact_rolling_distinct", "within_bound"]
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- W16: trailing-window anomaly score ----------------------------------------------

W16_WINDOW = 7
W16_Z = 2.0


def w16_anomaly_zscore(sf_dir: str) -> pa.Table:
    """Daily-count anomaly flags: z-score of each day vs the TRAILING
    7-day window (excluding the day itself) — the monitoring gate a
    pipeline runs on its own metrics stream. One partial+Sum corpus
    rollup; the rolling mean/stddev and flags run on the |days|
    driver frame (same shape as a26). Days with <2 prior observations
    have undefined stddev → NULL z, not-anomalous."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            pd.DataFrame({"day": time_bucket_strings(df["ts"])})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["cnt"] = out["cnt"].astype("int64")
    prior = out["cnt"].shift(1)
    mean = prior.rolling(W16_WINDOW, min_periods=1).mean()
    std = prior.rolling(W16_WINDOW, min_periods=2).std(ddof=1)
    z = (out["cnt"] - mean) / std
    out["z"] = z.round(6)
    out["is_anomaly"] = z.abs().gt(W16_Z).fillna(False).astype(bool)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A26: period-over-period change --------------------------------------------------


def a26_period_over_period(sf_dir: str) -> pa.Table:
    """Day-over-day percent change of event counts — the BI delta
    report. The corpus pass is the usual partial+Sum daily rollup;
    lag/pct-change run on the |days| driver table (window functions
    over post-agg frames are driver-cheap by construction)."""
    from job_crawler_ray.pipelines.windows import _events

    ds = _events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            pd.DataFrame({"day": time_bucket_strings(df["ts"])})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return strip_meta(pa.Table.from_pandas(g, preserve_index=False))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["cnt"] = out["cnt"].astype("int64")
    prev = out["cnt"].shift(1)
    out["prev_cnt"] = prev.fillna(0).astype("int64")
    out["pct_change"] = ((out["cnt"] - prev) / prev).round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- O4: keyset (seek) pagination -----------------------------------------------------

O4_PAGE_SIZE = 100
O4_PAGE = 2  # zero-indexed → rows 200..299 of the global order


def o4_keyset_pagination(sf_dir: str) -> pa.Table:
    """Page 3 of orders by (totalprice DESC, orderkey) via KEYSET
    pagination: the boundary row (the previous page's last row — here
    recomputed as sort+limit's tail) becomes a SEEK predicate, so the
    page read filters map-side BEFORE any sort: rows-after-boundary
    only, then top-page_size of that remnant. At 100 TB this is the
    difference between a global OFFSET skip (sorts everything every
    page) and a pruned scan; the twin is the naive LIMIT/OFFSET."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    prior = O4_PAGE * O4_PAGE_SIZE
    boundary = (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(prior)
        .to_pandas()
        .iloc[-1]
    )
    bp, bk = float(boundary["o_totalprice"]), int(boundary["o_orderkey"])

    def seek(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy()
        k = t["o_orderkey"].to_numpy()
        return t.filter(pa.array((p < bp) | ((p == bp) & (k > bk))))

    out = (
        ds.map_batches(seek, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(O4_PAGE_SIZE)
        .to_pandas()
    )
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["o_totalprice"] = out["o_totalprice"].round(6)
    return pa.Table.from_pandas(
        out[["o_orderkey", "o_totalprice"]], preserve_index=False
    )


# --- W15: interval-overlap concurrency (sweep line) ---------------------------------

W15_SESSION_MIN = 30  # each event opens a 30-minute interval
_NS_HOUR = 3_600_000_000_000


def w15_max_concurrency(sf_dir: str) -> pa.Table:
    """Peak concurrent sessions per day — the sweep-line operator:
    every event opens a half-open 30-min interval; +1/−1 marks sorted
    by (t, delta) (−1 first on ties, so back-to-back sessions don't
    overlap) and prefix-summed give instantaneous concurrency; the
    answer is the per-day max. Two-level exactly like w10: hour
    buckets compute in-bucket sorted prefix sums and emit ONE (sum,
    max-prefix) summary row each; the driver exclusive-prefix-sums
    the |hours| summaries (tiny) and takes per-day max of carry +
    in-bucket max. Within-tie order is irrelevant to the max (equal
    (t, d) runs are monotone), so the result is deterministic."""
    from job_crawler_ray.pipelines.windows import _events

    dur_ns = W15_SESSION_MIN * 60_000_000_000
    ds = _events(sf_dir, ["ts"])

    def marks(t: pa.Table) -> pa.Table:
        ns = t["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        tt = np.concatenate([ns, ns + dur_ns])
        dd = np.concatenate([np.ones(len(ns), np.int64),
                             -np.ones(len(ns), np.int64)])
        return pa.table(
            {"t": pa.array(tt, pa.int64()),
             "d": pa.array(dd, pa.int64()),
             "hour": pa.array(tt // _NS_HOUR, pa.int64())}
        )

    def bucket_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "d"], kind="mergesort")  # -1 before +1
        pref = g["d"].cumsum().to_numpy()
        return pd.DataFrame(
            {"hour": [int(g["hour"].iloc[0])],
             "total": [int(pref[-1])],
             "max_pref": [int(pref.max())]}
        )

    summ = (
        ds.map_batches(marks, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(bucket_scan, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    carry = np.concatenate(
        ([0], np.cumsum(summ["total"].to_numpy())[:-1])
    )
    summ["day_peak"] = carry + summ["max_pref"].to_numpy()
    day = time_bucket_strings(
        (summ["hour"].to_numpy() * _NS_HOUR).astype("datetime64[ns]")
    )
    out = (
        pd.DataFrame({"day": day, "max_concurrent": summ["day_peak"]})
        .groupby("day", as_index=False)
        .agg(max_concurrent=("max_concurrent", "max"))
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["max_concurrent"] = out["max_concurrent"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- A24: grouped interpolated percentiles ------------------------------------------


def a24_grouped_percentile_cont(sf_dir: str) -> pa.Table:
    """PERCENTILE_CONT over GROUPS for a q-set — the full
    generalization of the selection machinery (a16: grouped, one
    discrete rank; a22: global, rank set; here: |groups| × |ranks|
    order statistics at once). Selection state is keyed (group,
    rank); every pass is ONE corpus scan serving all live states,
    with per-batch work deduped per distinct (group, range, bin)
    region. Same guarantees: no global sort, driver state is
    KB-sized, refinement only when a bin exceeds the collect cap."""
    key, val = "o_orderpriority", "o_totalprice"
    # materialized: the stats + per-round hist + collect passes rescan
    # these two narrow columns — read once, serve later passes from
    # the object store
    ds = _read(sf_dir, "orders", [key, val]).materialize()

    stats = (
        ds.map_batches(
            lambda t: strip_meta(
                pa.Table.from_pandas(
                    t.to_pandas().dropna(subset=[val])
                    .groupby(key, sort=False)[val]
                    .agg(n="size", lo="min", hi="max").reset_index(),
                    preserve_index=False,
                )
            ),
            batch_format="pyarrow",
        )
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"), Min("lo", alias_name="lo"),
                   Max("hi", alias_name="hi"))
        .to_pandas()
    )
    hs: dict[tuple, float] = {}
    states: dict[tuple, dict] = {}
    result: dict[tuple, float] = {}
    group_n: dict = {}
    for _, r in stats.iterrows():
        g, n = r[key], int(r["n"])
        group_n[g] = n
        lo, hi = float(r["lo"]), float(r["hi"])
        ks = set()
        for q in A22_QS:
            h = (n - 1) * q
            hs[(g, q)] = h
            ks |= {int(np.floor(h)), int(np.ceil(h))}
        for k in sorted(ks):
            if lo == hi:
                result[(g, k)] = lo
            else:
                states[(g, k)] = {"k": k, "lo": lo, "hi": hi}

    def bin_of(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
        w = (hi - lo) / SELECT_BINS
        return np.clip(((v - lo) / w).astype(np.int64), 0, SELECT_BINS - 1)

    while states:
        # shuffle volume scales with DISTINCT REGIONS (≤ |groups| in
        # round 1), not ranks: adjacent floor/ceil ranks share a
        # region, so per-rank emission would multiply partial rows 8×
        regions: dict[tuple, int] = {}
        rank_region: dict[tuple, int] = {}
        for (g, rk), s in states.items():
            rkey = (g, s["lo"], s["hi"], s.get("bin"),
                    s.get("plo"), s.get("phi"))
            rank_region[(g, rk)] = regions.setdefault(rkey, len(regions))
        region_list = [k for k, _ in sorted(regions.items(),
                                            key=lambda kv: kv[1])]
        live_ref = ray.put(region_list)

        def hist_partial(t: pa.Table) -> pa.Table:
            regs = ray.get(live_ref)
            df = t.to_pandas().dropna(subset=[val])
            parts = []
            for ri, (g, lo_, hi_, bin_, plo, phi) in enumerate(regs):
                v = df.loc[df[key] == g, val].to_numpy(np.float64)
                if bin_ is not None:
                    v = v[(v >= plo) & (v <= phi)]
                    v = v[bin_of(v, plo, phi) == bin_]
                else:
                    v = v[(v >= lo_) & (v <= hi_)]
                if not len(v):
                    continue
                cnt = np.bincount(bin_of(v, lo_, hi_),
                                  minlength=SELECT_BINS)
                nz = np.nonzero(cnt)[0]
                parts.append(pd.DataFrame(
                    {"ri": ri, "bin": nz, "cnt": cnt[nz]}))
            if not parts:
                return pa.table({"ri": pa.array([], pa.int64()),
                                 "bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return strip_meta(pa.Table.from_pandas(
                pd.concat(parts, ignore_index=True), preserve_index=False))

        partials = ds.map_batches(hist_partial, batch_format="pyarrow")
        if len(region_list) * SELECT_BINS <= 1_000_000:
            # partial rows ≤ blocks × regions × bins (KB-MB scale) —
            # final-reduce on the driver: a Ray groupby exchange costs
            # ~1 s even on tiny data (the g3 lesson; this was the
            # dominant cost of the whole query at sf0.1)
            hist = (
                partials.to_pandas()
                .groupby(["ri", "bin"], as_index=False)["cnt"].sum()
            )
        else:  # huge region set: keep the distributed reduce
            hist = (
                partials.groupby(["ri", "bin"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas()
            )
        collect = {}
        for (g, rk), s in list(states.items()):
            h = hist[hist["ri"] == rank_region[(g, rk)]].sort_values("bin")
            cum = h["cnt"].cumsum().to_numpy()
            i = int(np.searchsorted(cum, s["k"] + 1, side="left"))
            b = int(h["bin"].iloc[i])
            before = int(cum[i - 1]) if i else 0
            in_bin = int(h["cnt"].iloc[i])
            w = (s["hi"] - s["lo"]) / SELECT_BINS
            blo = s["lo"] + b * w
            bhi = s["hi"] if b == SELECT_BINS - 1 else s["lo"] + (b + 1) * w
            s2 = {"k": s["k"] - before, "lo": blo, "hi": bhi,
                  "bin": b, "plo": s["lo"], "phi": s["hi"]}
            if in_bin <= SELECT_COLLECT_LIMIT or blo == bhi:
                collect[(g, rk)] = s2
                del states[(g, rk)]
            else:
                states[(g, rk)] = s2

        if collect:
            # collect too is per-REGION: floor/ceil ranks of the same
            # q usually land in the same bin — ship its values once
            cregions: dict[tuple, int] = {}
            crank_region: dict[tuple, int] = {}
            for (g, rk), s in collect.items():
                ckey = (g, s["plo"], s["phi"], s["bin"])
                crank_region[(g, rk)] = cregions.setdefault(
                    ckey, len(cregions))
            cregion_list = [k for k, _ in sorted(cregions.items(),
                                                 key=lambda kv: kv[1])]
            col_ref = ray.put(cregion_list)

            def in_bin_vals(t: pa.Table) -> pa.Table:
                regs = ray.get(col_ref)
                df = t.to_pandas().dropna(subset=[val])
                parts = []
                for ri, (g, plo, phi, bin_) in enumerate(regs):
                    v = df.loc[df[key] == g, val].to_numpy(np.float64)
                    v = v[(v >= plo) & (v <= phi)]
                    if len(v):
                        v = v[bin_of(v, plo, phi) == bin_]
                    if len(v):
                        parts.append(pd.DataFrame({"ri": ri, "v": v}))
                if not parts:
                    return pa.table({"ri": pa.array([], pa.int64()),
                                     "v": pa.array([], pa.float64())})
                return strip_meta(pa.Table.from_pandas(
                    pd.concat(parts, ignore_index=True),
                    preserve_index=False))

            got = ds.map_batches(in_bin_vals, batch_format="pyarrow").to_pandas()
            sorted_cache: dict[int, np.ndarray] = {}
            for (g, rk), s in collect.items():
                ri = crank_region[(g, rk)]
                if ri not in sorted_cache:
                    sorted_cache[ri] = np.sort(
                        got.loc[got["ri"] == ri, "v"].to_numpy()
                    )
                result[(g, rk)] = float(sorted_cache[ri][s["k"]])

    rows = []
    for g in sorted(group_n):
        for q in A22_QS:
            h = hs[(g, q)]
            lo_k, hi_k = int(np.floor(h)), int(np.ceil(h))
            frac = h - lo_k
            pct = result[(g, lo_k)] + frac * (
                result[(g, hi_k)] - result[(g, lo_k)]
            )
            rows.append((g, float(q), round(pct, 6)))
    out = pd.DataFrame(rows, columns=[key, "q", "pct"])
    return pa.Table.from_pandas(out, preserve_index=False)


# --- S14: dataset card --------------------------------------------------------------


def s14_dataset_card(sf_dir: str) -> pa.Table:
    """One-row corpus summary card — the stats block a dataset release
    ships (docs, whitespace tokens, exact-distinct texts, languages,
    median/p90 length, duplicate ppm). Three bounded passes:

    1. scalar partials (docs, tokens) + a LENGTH HISTOGRAM as (len,
       cnt) rows — lengths are bounded, so exact quantile_disc
       order statistics read straight off the merged bincount (no
       selection rounds, no sort);
    2. distinct texts exactly, via per-batch unique xxh64 partials →
       one hash groupby (the a18/d1 64-bit-collision-free claim);
    3. distinct langs (a ≤ |langs| unique).

    Duplicate rate is exact integer ppm of (docs − unique)/docs."""
    from job_crawler_ray.hashing import xxh64_array
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(strip_meta, batch_format="pyarrow").repartition(8)

    def scalar_partial(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pandas().fillna("")
        ln = txt.str.len().to_numpy(np.int64)
        ntok = txt.str.split().str.len().fillna(0).astype("int64").sum()
        uniq, cnt = np.unique(ln, return_counts=True)
        out = pd.DataFrame(
            {"len": np.concatenate(([-1], uniq)),
             "cnt": np.concatenate(([len(ln)], cnt)),
             "tok": np.concatenate(([int(ntok)], np.zeros(len(uniq),
                                                          np.int64)))}
        )
        return strip_meta(pa.Table.from_pandas(out, preserve_index=False))

    hist = (
        ds.map_batches(scalar_partial, batch_format="pyarrow")
        .groupby("len")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("tok", alias_name="tok"))
        .to_pandas()
        .sort_values("len")
        .reset_index(drop=True)
    )
    n_docs = int(hist.loc[hist["len"] == -1, "cnt"].iloc[0])
    n_tokens = int(hist["tok"].sum())
    lens = hist[hist["len"] >= 0]
    cum = lens["cnt"].cumsum().to_numpy()

    def qdisc(q: float) -> int:
        k = max(0, int(np.ceil(q * n_docs)) - 1)
        return int(lens["len"].to_numpy()[np.searchsorted(cum, k + 1)])

    uniq_texts = (
        ds.map_batches(
            lambda t: pa.table(
                {"h": pc.unique(pa.array(
                    xxh64_array(t["text"].to_pandas().fillna("")).view(
                        np.int64)))}
            ),
            batch_format="pyarrow",
        )
        .groupby("h")
        .aggregate(Count(alias_name="_m"))
        .count()
    )
    n_langs = len(
        ds.map_batches(
            lambda t: pa.table(
                {"lang": pc.unique(pc.fill_null(t["lang"], ""))}
            ),
            batch_format="pyarrow",
        ).unique("lang")
    )
    dup_ppm = int((n_docs - uniq_texts) * 1_000_000 // max(n_docs, 1))
    return pa.table(
        {"n_docs": pa.array([n_docs], pa.int64()),
         "n_tokens": pa.array([n_tokens], pa.int64()),
         "n_unique_texts": pa.array([int(uniq_texts)], pa.int64()),
         "n_langs": pa.array([n_langs], pa.int64()),
         "median_len": pa.array([qdisc(0.5)], pa.int64()),
         "p90_len": pa.array([qdisc(0.9)], pa.int64()),
         "dup_ppm": pa.array([dup_ppm], pa.int64())}
    )


# --- oracle twins -------------------------------------------------------------


def analytics_oracle_sql() -> dict[str, str]:
    pivot_cols = ",\n                   ".join(
        f"CAST(sum(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END) AS BIGINT) AS {ty}"
        for ty in PIVOT_TYPES
    )
    return {
        "a39_dow_profile": """
            SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(count(*) AS BIGINT) AS cnt,
                   round(sum(value) / count(*), 6) AS avg_value
            FROM events GROUP BY dow ORDER BY dow
        """,
        "s16_fk_audit": """
            WITH ok AS (SELECT DISTINCT o_orderkey AS k FROM orders),
            lk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM ok) AS n_orders,
                   (SELECT CAST(count(*) AS BIGINT) FROM lk) AS n_li_orders,
                   (SELECT CAST(count(*) AS BIGINT) FROM ok
                    WHERE k NOT IN (SELECT k FROM lk)) AS childless_orders,
                   (SELECT CAST(count(*) AS BIGINT) FROM lk
                    WHERE k NOT IN (SELECT k FROM ok)) AS orphan_li_orders,
                   (SELECT CAST(count(*) AS BIGINT) FROM ok
                    WHERE k IN (SELECT k FROM lk)) AS linked
        """,
        "a38_cumulative_uniques": """
            WITH fa AS (
                SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS m
                FROM orders GROUP BY o_custkey
            ), monthly AS (
                SELECT strftime(m, '%Y-%m') AS month,
                       CAST(count(*) AS BIGINT) AS new_customers
                FROM fa GROUP BY month
            )
            SELECT month, new_customers,
                   CAST(sum(new_customers) OVER (
                       ORDER BY month ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_customers
            FROM monthly ORDER BY month
        """,
        "s15_null_profile": "\nUNION ALL\n".join(
            f"""SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_null,
                       CAST(sum(CASE WHEN {c} = '' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_empty,
                       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                            * 1000000 // count(*) AS BIGINT) AS null_ppm
                FROM documents"""
            for c in S15_COLS
        ) + "\nORDER BY col_name",
        "d11_casefold_dedup": f"""
            WITH corpus AS (
              SELECT doc_id, coalesce(text, '') AS text FROM documents
              UNION ALL
              SELECT doc_id + 20000, upper(coalesce(text, ''))
              FROM documents WHERE doc_id % {D11_MIRROR_MOD} = 0)
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_variants
            FROM corpus GROUP BY lower(text) ORDER BY doc_id
        """,
        "a35_q6_revenue": f"""
            SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT))
                       / 10000.0 AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lineitems
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{A35_Y0}'
              AND l_shipdate < TIMESTAMP '{A35_Y1}'
              AND l_discount BETWEEN {A35_D_LO} AND {A35_D_HI}
              AND l_quantity < {A35_QTY}
        """,
        "a34_pricing_summary": f"""
            -- exact int64 units (price/discount/tax each have 2
            -- decimals): sums are order-independent and the /10^k
            -- doubles bit-match the Ray twin; round_even matches
            -- numpy's half-to-even on the averages
            WITH b AS (
                SELECT l_returnflag, l_linestatus,
                       sum(l_quantity) AS sum_qty,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                           AS base_e2,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * CAST(round((1 - l_discount) * 100) AS BIGINT))
                           AS disc_e4,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * CAST(round((1 - l_discount) * 100) AS BIGINT)
                           * CAST(round((1 + l_tax) * 100) AS BIGINT))
                           AS charge_e6,
                       sum(CAST(round(l_discount * 100) AS BIGINT))
                           AS discount_e2,
                       count(*) AS n
                FROM lineitem
                WHERE l_shipdate <= TIMESTAMP '{A34_CUTOFF}'
                GROUP BY l_returnflag, l_linestatus
            )
            SELECT l_returnflag, l_linestatus, sum_qty,
                   base_e2 / 100.0 AS sum_base,
                   disc_e4 / 10000.0 AS sum_disc,
                   charge_e6 / 1000000.0 AS sum_charge,
                   round_even(sum_qty / n, 6) AS avg_qty,
                   round_even(base_e2 / 100.0 / n, 6) AS avg_price,
                   round_even(discount_e2 / 100.0 / n, 6) AS avg_disc,
                   CAST(n AS BIGINT) AS count_order
            FROM b ORDER BY l_returnflag, l_linestatus
        """,
        "j19_nearest_price": """
            WITH s AS (
                SELECT o_orderkey, o_totalprice,
                       lag(o_totalprice) OVER (
                           ORDER BY o_totalprice, o_orderkey) AS prv,
                       lead(o_totalprice) OVER (
                           ORDER BY o_totalprice, o_orderkey) AS nxt
                FROM orders
            )
            SELECT o_orderkey,
                   round(least(coalesce(o_totalprice - prv, 1e308),
                               coalesce(nxt - o_totalprice, 1e308)), 6)
                       AS nearest_diff
            FROM s ORDER BY o_orderkey
        """,
        "w23_forward_fill": f"""
            WITH daily AS (
                SELECT CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT)
                           AS day,
                       sum(value) / count(*) AS raw_avg
                FROM events GROUP BY day
            ), sparse AS (
                SELECT day,
                       CASE WHEN day % {W23_SPARSE_MOD} = 0
                            THEN raw_avg END AS avg_value
                FROM daily
            ), spine AS (
                SELECT unnest(generate_series(
                    (SELECT min(day) FROM daily),
                    (SELECT max(day) FROM daily))) AS day
            ), j AS (
                SELECT s.day, sp.avg_value,
                       sp.avg_value IS NOT NULL AS observed
                FROM spine s LEFT JOIN sparse sp USING (day)
            )
            SELECT strftime(CAST(to_timestamp(day * 86400) AS TIMESTAMP),
                            '%Y-%m-%d') AS day,
                   observed,
                   round(last_value(avg_value IGNORE NULLS) OVER (
                       ORDER BY day ROWS UNBOUNDED PRECEDING), 6)
                       AS avg_value
            FROM j ORDER BY day
        """,
        "g15_degree_assortativity": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e AS (SELECT DISTINCT src, dst FROM ({" UNION ALL ".join(
                f"SELECT doc_id AS src, (doc_id * {a} + {b}) % nn.n AS dst "
                "FROM documents, nn"
                for a, b in BFS_EDGE_MULTS)})),
            deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
                    FROM e GROUP BY src)
            SELECT CAST(count(*) AS BIGINT) AS n_edges,
                   round(corr(coalesce(ds.d, 0) * 1.0,
                              coalesce(dd.d, 0) * 1.0), 6)
                       AS assortativity
            FROM e LEFT JOIN deg ds ON ds.node = e.src
                   LEFT JOIN deg dd ON dd.node = e.dst
        """,
        "a33_topk_others": f"""
            WITH daily AS (
                SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY day
            ), ranked AS (
                SELECT day, cnt, row_number() OVER (
                    ORDER BY cnt DESC, day) AS rn
                FROM daily
            )
            SELECT CASE WHEN rn <= {A33_K} THEN day ELSE 'OTHERS' END
                       AS bucket,
                   CAST(sum(cnt) AS BIGINT) AS cnt
            FROM ranked GROUP BY bucket ORDER BY bucket
        """,
        "g14_reciprocal_links": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e AS (SELECT DISTINCT src, dst FROM ({" UNION ALL ".join(
                f"SELECT doc_id AS src, (doc_id * {a} + {b}) % nn.n AS dst "
                "FROM documents, nn"
                for a, b in BFS_EDGE_MULTS)}) WHERE src <> dst)
            SELECT e1.src AS u, e1.dst AS v
            FROM e e1 JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src
            WHERE e1.src < e1.dst
            ORDER BY u, v
        """,
        "t_char_entropy": """
            WITH bg AS (
                SELECT doc_id,
                       substr(coalesce(text, ''), CAST(t.i AS INT), 2) AS b
                FROM documents,
                     UNNEST(generate_series(1,
                         greatest(length(coalesce(text, '')) - 1, 0)))
                         AS t(i)
            ), e AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                       round(entropy(b), 6) AS bigram_entropy
                FROM bg GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(e.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   coalesce(e.bigram_entropy, 0.0) AS bigram_entropy
            FROM documents d LEFT JOIN e USING (doc_id)
            ORDER BY d.doc_id
        """,
        "j18_centroid_assign": """
            WITH u AS (
                SELECT vec_id, label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings
            ), cent AS (
                SELECT label AS clabel, dim,
                       round(sum(CAST(v AS DOUBLE)) / count(*), 6) AS mean_v
                FROM u GROUP BY clabel, dim
            ), cn AS (
                SELECT clabel, sqrt(sum(mean_v * mean_v)) AS nrm
                FROM cent GROUP BY clabel
            ), xn AS (
                SELECT vec_id,
                       sqrt(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
                           AS nrm
                FROM u GROUP BY vec_id
            ), dots AS (
                SELECT u.vec_id, c.clabel,
                       sum(CAST(u.v AS DOUBLE) * c.mean_v) AS dot
                FROM u JOIN cent c ON c.dim = u.dim
                GROUP BY u.vec_id, c.clabel
            ), cs AS (
                SELECT d.vec_id, d.clabel,
                       d.dot / greatest(x.nrm * n.nrm, 1e-300) AS cos
                FROM dots d JOIN xn x USING (vec_id)
                            JOIN cn n USING (clabel)
            ), pick AS (
                SELECT vec_id, clabel,
                       row_number() OVER (PARTITION BY vec_id
                           ORDER BY cos DESC, clabel) AS rn
                FROM cs
            )
            SELECT CAST(e.label AS BIGINT) AS true_label,
                   CAST(p.clabel AS BIGINT) AS assigned_label,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM pick p JOIN embeddings e USING (vec_id)
            WHERE p.rn = 1
            GROUP BY true_label, assigned_label
            ORDER BY true_label, assigned_label
        """,
        "w21_transition_matrix": """
            WITH s AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS to_type
                FROM events
            )
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
            FROM s WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type ORDER BY from_type, to_type
        """,
        "a32_label_centroids": """
            WITH u AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   round(sum(CAST(v AS DOUBLE)) / count(*), 6) AS mean_v
            FROM u GROUP BY label, dim ORDER BY label, dim
        """,
        "w20_time_in_state": """
            WITH s AS (
                SELECT user_id, event_type, ts,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
                FROM events
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_intervals,
                   round(sum(epoch_us(nxt - ts)) * 1000 / 1e9, 6)
                       AS total_seconds
            FROM s WHERE nxt IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "a31_corr_matrix": """
            WITH f AS (
                SELECT value,
                       CAST(hour(ts) AS DOUBLE) AS hour,
                       CAST(isodow(ts) - 1 AS DOUBLE) AS dow
                FROM events
            )
            SELECT 'hour' AS feat_a, 'dow' AS feat_b,
                   round(corr(hour, dow), 6) AS corr FROM f
            UNION ALL
            SELECT 'value', 'dow', round(corr(value, dow), 6) FROM f
            UNION ALL
            SELECT 'value', 'hour', round(corr(value, hour), 6) FROM f
            ORDER BY feat_a, feat_b
        """,
        "w19_streaks": """
            WITH act AS (
                SELECT DISTINCT user_id,
                       CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT)
                           AS day
                FROM events
            ), isl AS (
                SELECT user_id, day,
                       day - row_number() OVER (
                           PARTITION BY user_id ORDER BY day) AS island
                FROM act
            ), runs AS (
                SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
                FROM isl GROUP BY user_id, island
            )
            SELECT r.user_id,
                   CAST(a.n AS BIGINT) AS active_days,
                   CAST(max(r.len) AS BIGINT) AS longest_streak
            FROM runs r
            JOIN (SELECT user_id, count(*) AS n FROM act
                  GROUP BY user_id) a USING (user_id)
            GROUP BY r.user_id, a.n ORDER BY r.user_id
        """,
        "w18_conversion_latency": """
            WITH pairs AS (
                SELECT user_id, strftime(date_trunc('day', ts),
                                         '%Y-%m-%d') AS day,
                       min(CASE WHEN event_type = 'view' THEN ts END)
                           AS first_view,
                       max(CASE WHEN event_type = 'purchase' THEN ts END)
                           AS last_purchase
                FROM events WHERE event_type IN ('view', 'purchase')
                GROUP BY user_id, day
            )
            SELECT day,
                   round(quantile_disc(
                       epoch_us(last_purchase - first_view) / 1e6 * 1.0,
                       0.5), 6) AS median_latency_s
            FROM pairs
            WHERE first_view IS NOT NULL AND last_purchase > first_view
            GROUP BY day ORDER BY day
        """,
        "a30_mad": """
            SELECT round(quantile_disc(o_totalprice, 0.5), 6) AS median_val,
                   round(quantile_disc(abs(o_totalprice -
                       (SELECT quantile_disc(o_totalprice, 0.5)
                        FROM orders)), 0.5), 6) AS mad
            FROM orders
        """,
        "a29_gini": """
            WITH c AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY user_id
            ), r AS (
                SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS i
                FROM c
            )
            SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(cnt) AS BIGINT) AS total_events,
                   round(2.0 * sum(i * cnt) / (count(*) * sum(cnt))
                         - (count(*) + 1.0) / count(*), 6) AS gini
            FROM r
        """,
        "a28_group_entropy": """
            SELECT user_id, round(entropy(event_type), 6) AS h
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "d10_soft_dedup": f"""
            WITH corpus AS (
              SELECT doc_id, coalesce(text, '') AS text FROM documents
              UNION ALL
              SELECT doc_id + 10000, coalesce(text, '')
              FROM documents WHERE doc_id % {D9_MIRROR_MOD} = 0)
            SELECT doc_id,
                   CAST(count(*) OVER (PARTITION BY text) AS BIGINT)
                       AS copies,
                   round(1.0 / count(*) OVER (PARTITION BY text), 6)
                       AS weight
            FROM corpus ORDER BY doc_id
        """,
        "a27_rolling_hll": f"""
            WITH act AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                FROM events
            ), days AS (SELECT DISTINCT d FROM act)
            SELECT strftime(days.d, '%Y-%m-%d') AS day,
                   CAST(count(DISTINCT a.user_id) AS BIGINT)
                       AS exact_rolling_distinct,
                   TRUE AS within_bound
            FROM days JOIN act a
              ON a.d BETWEEN days.d - INTERVAL {A27_WINDOW_DAYS - 1} DAY
                         AND days.d
            GROUP BY days.d ORDER BY day
        """,
        "w16_anomaly_zscore": f"""
            WITH daily AS (
                SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY day
            ), win AS (
                SELECT day, cnt,
                       avg(cnt) OVER (ORDER BY day
                           ROWS BETWEEN {W16_WINDOW} PRECEDING
                                    AND 1 PRECEDING) AS m,
                       stddev_samp(cnt) OVER (ORDER BY day
                           ROWS BETWEEN {W16_WINDOW} PRECEDING
                                    AND 1 PRECEDING) AS s
                FROM daily
            )
            SELECT day, cnt, round((cnt - m) / s, 6) AS z,
                   CASE WHEN s IS NULL OR s = 0 THEN FALSE
                        ELSE abs((cnt - m) / s) > {W16_Z} END AS is_anomaly
            FROM win ORDER BY day
        """,
        "a26_period_over_period": """
            WITH daily AS (
                SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY day
            )
            SELECT day, cnt,
                   CAST(coalesce(lag(cnt) OVER (ORDER BY day), 0) AS BIGINT)
                       AS prev_cnt,
                   round((cnt - lag(cnt) OVER (ORDER BY day))
                         / CAST(lag(cnt) OVER (ORDER BY day) AS DOUBLE), 6)
                       AS pct_change
            FROM daily ORDER BY day
        """,
        "o4_keyset_pagination": f"""
            SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT {O4_PAGE_SIZE} OFFSET {O4_PAGE * O4_PAGE_SIZE}
        """,
        "w15_max_concurrency": f"""
            WITH marks AS (
                SELECT ts AS t, 1 AS d FROM events
                UNION ALL
                SELECT ts + INTERVAL {W15_SESSION_MIN} MINUTE, -1
                FROM events
            ), run AS (
                SELECT t, sum(d) OVER (
                    ORDER BY t, d
                    ROWS UNBOUNDED PRECEDING) AS conc
                FROM marks
            )
            SELECT strftime(date_trunc('day', t), '%Y-%m-%d') AS day,
                   CAST(max(conc) AS BIGINT) AS max_concurrent
            FROM run GROUP BY day ORDER BY day
        """,
        "a24_grouped_percentile_cont": "\nUNION ALL\n".join(
            f"""SELECT o_orderpriority, CAST({q} AS DOUBLE) AS q,
                       round(quantile_cont(o_totalprice, {q}), 6) AS pct
                FROM orders GROUP BY o_orderpriority"""
            for q in A22_QS
        ) + "\nORDER BY o_orderpriority, q",
        "s14_dataset_card": r"""
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(list_filter(
                       regexp_split_to_array(text, '\s+'),
                       x -> x <> ''))) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT coalesce(text, '')) AS BIGINT)
                       AS n_unique_texts,
                   CAST(count(DISTINCT coalesce(lang, '')) AS BIGINT)
                       AS n_langs,
                   CAST(quantile_disc(length(coalesce(text, '')), 0.5)
                        AS BIGINT) AS median_len,
                   CAST(quantile_disc(length(coalesce(text, '')), 0.9)
                        AS BIGINT) AS p90_len,
                   CAST((count(*) - count(DISTINCT coalesce(text, '')))
                        * 1000000 // count(*) AS BIGINT) AS dup_ppm
            FROM documents
        """,
        "u4_union_by_name": """
            SELECT doc_id, text, lang, source, n_chars FROM (
                SELECT doc_id, text, lang, source FROM documents
                WHERE doc_id % 2 = 0
                UNION ALL BY NAME
                SELECT source, doc_id, n_chars FROM documents
                WHERE doc_id % 2 = 1
            ) ORDER BY doc_id
        """,
        "j16_spatial_grid_join": f"""
            WITH p AS (
                SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                       CAST(embedding[2] AS DOUBLE) AS y
                FROM embeddings
            )
            SELECT p1.vec_id AS a, p2.vec_id AS b,
                   round(sqrt((p1.x - p2.x) * (p1.x - p2.x)
                              + (p1.y - p2.y) * (p1.y - p2.y)), 6) AS dist
            FROM p p1 JOIN p p2
              ON p1.vec_id < p2.vec_id
             AND (p1.x - p2.x) * (p1.x - p2.x)
                 + (p1.y - p2.y) * (p1.y - p2.y)
                 < {J16_EPS} * {J16_EPS}
            ORDER BY a, b
        """,
        "p3_rag_chunk_prep": f"""
            WITH dedup AS (
              SELECT doc_id, coalesce(text, '') AS txt FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY coalesce(text, '')
                                          ORDER BY doc_id) AS rnk
                FROM documents) WHERE rnk = 1
            ), g AS (
              SELECT doc_id, txt FROM dedup
              WHERE length(txt) BETWEEN {P3_LEN_LO} AND {P3_LEN_HI}
            ), ch AS (
              SELECT doc_id, txt,
                     unnest(generate_series(0, greatest(0, CAST(ceil(
                         (length(txt) - {CHUNK_WIDTH})
                         / {CHUNK_STRIDE}.0) AS BIGINT)))) AS chunk_id
              FROM g
            )
            SELECT doc_id, chunk_id,
                   length(substr(txt,
                                 1 + CAST(chunk_id AS INT) * {CHUNK_STRIDE},
                                 {CHUNK_WIDTH})) AS chunk_len,
                   substr(txt, 1 + CAST(chunk_id AS INT) * {CHUNK_STRIDE},
                          16) AS head,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                        || CAST(chunk_id AS VARCHAR)), 1, 8)
                             < 'cccccccc'
                        THEN 'train' ELSE 'val' END AS split
            FROM ch ORDER BY doc_id, chunk_id
        """,
        "w13_incremental_update": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS cnt,
                   round(sum(value), 6) AS value_sum
            FROM events GROUP BY day ORDER BY day
        """,
        "g7_bfs": f"""
            WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
            e AS ({" UNION ALL ".join(
                f"SELECT doc_id AS src, (doc_id * {a} + {b}) % nn.n AS dst "
                "FROM documents, nn"
                for a, b in BFS_EDGE_MULTS)}),
            bfs(node, hop) AS (
                SELECT doc_id, 0 FROM documents
                WHERE doc_id % {BFS_SEED_MOD} = 0
                UNION ALL
                SELECT e.dst, b.hop + 1
                FROM bfs b JOIN e ON e.src = b.node
                WHERE b.hop < {BFS_MAX_HOPS}
            )
            SELECT node AS doc_id, CAST(min(hop) AS BIGINT) AS hop
            FROM bfs GROUP BY node ORDER BY doc_id
        """,
        "g8_common_neighbors": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e AS (SELECT DISTINCT src, dst FROM ({" UNION ALL ".join(
                f"SELECT doc_id AS src, (doc_id * {a} + {b}) % nn.n AS dst "
                "FROM documents, nn"
                for a, b in BFS_EDGE_MULTS)}))
            SELECT e1.src AS u, e2.src AS v,
                   CAST(count(*) AS BIGINT) AS common,
                   round(count(*) / (2.0 * {len(BFS_EDGE_MULTS)} - count(*)),
                         6) AS jaccard
            FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
            GROUP BY u, v HAVING count(*) >= {G8_MIN_COMMON}
            ORDER BY u, v
        """,
        "w12_cohort_retention": """
            WITH act AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                FROM events
            ), fa AS (
                SELECT user_id, min(d) AS c FROM act GROUP BY user_id
            )
            SELECT strftime(fa.c, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', fa.c, act.d) AS BIGINT)
                       AS offset_days,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM act JOIN fa USING (user_id)
            GROUP BY cohort_day, offset_days
            ORDER BY cohort_day, offset_days
        """,
        "a23_mode": """
            WITH c AS (
                SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY user_id, event_type
            )
            SELECT user_id, event_type AS modal_type, cnt
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY cnt DESC, event_type) AS rn
                  FROM c)
            WHERE rn = 1 ORDER BY user_id
        """,
        "w11_first_last": """
            WITH r AS (
                SELECT user_id, value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events
            )
            SELECT user_id,
                   round(max(CASE WHEN rn_a = 1 THEN value END), 6)
                       AS first_value,
                   round(max(CASE WHEN rn_d = 1 THEN value END), 6)
                       AS last_value
            FROM r GROUP BY user_id ORDER BY user_id
        """,
        "a25_grouped_stddev": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(var_samp(value), 6) AS var_samp,
                   round(stddev_samp(value), 6) AS stddev_samp
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "j15_scd2_pit": f"""
            WITH segl AS (
                SELECT s, row_number() OVER (ORDER BY s) - 1 AS i
                FROM (SELECT DISTINCT c_mktsegment AS s FROM customer)
            ), nn AS (SELECT count(*) AS n FROM segl),
            dim AS (
                SELECT c.c_custkey, c.c_mktsegment AS seg_a, s2.s AS seg_b,
                       TIMESTAMP '{SCD2_EPOCH}'
                           + INTERVAL ((c.c_custkey % {SCD2_SPREAD_DAYS})) DAY
                           AS cut
                FROM customer c
                JOIN segl s1 ON s1.s = c.c_mktsegment
                CROSS JOIN nn
                JOIN segl s2 ON s2.i = (s1.i + 1) % nn.n
            )
            SELECT CASE WHEN o.o_orderdate >= d.cut THEN d.seg_b
                        ELSE d.seg_a END AS segment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                       / 100.0 AS revenue
            FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
            GROUP BY segment ORDER BY segment
        """,
        "t_chunk_overlap": f"""
            WITH ch AS (
                SELECT doc_id, coalesce(text, '') AS txt,
                       unnest(generate_series(0, greatest(0, CAST(ceil(
                           (length(coalesce(text, '')) - {CHUNK_WIDTH})
                           / {CHUNK_STRIDE}.0) AS BIGINT)))) AS chunk_id
                FROM documents
            )
            SELECT doc_id, chunk_id,
                   length(substr(txt,
                                 1 + CAST(chunk_id AS INT) * {CHUNK_STRIDE},
                                 {CHUNK_WIDTH})) AS chunk_len,
                   substr(txt, 1 + CAST(chunk_id AS INT) * {CHUNK_STRIDE},
                          16) AS head
            FROM ch ORDER BY doc_id, chunk_id
        """,
        "t_sentence_stats": f"""
            SELECT doc_id,
                   CAST(len(string_split_regex(coalesce(text, ''),
                        '{SENT_SPLIT_RE}')) AS BIGINT) AS n_sent,
                   round(length(regexp_replace(coalesce(text, ''),
                             '{SENT_SPLIT_RE}', '', 'g'))
                         / len(string_split_regex(coalesce(text, ''),
                               '{SENT_SPLIT_RE}')), 6) AS avg_sent_len
            FROM documents ORDER BY doc_id
        """,
        "w10_late_data": f"""
            WITH arr AS (
                SELECT ts, md5(CAST(event_id AS VARCHAR)) AS k, event_id
                FROM events
            ), wm AS (
                SELECT ts,
                       max(ts) OVER (
                           ORDER BY k, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS m
                FROM arr
            )
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(sum(CASE WHEN m IS NOT NULL
                                  AND ts < m - INTERVAL {W10_DELAY_DAYS} DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS late,
                   CAST(sum(CASE WHEN m IS NULL
                                  OR ts >= m - INTERVAL {W10_DELAY_DAYS} DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS ontime
            FROM wm GROUP BY day ORDER BY day
        """,
        "a22_percentile_cont": "\nUNION ALL\n".join(
            f"""SELECT CAST({q} AS DOUBLE) AS q,
                       round(quantile_cont(o_totalprice, {q}), 6) AS pct
                FROM orders"""
            for q in A22_QS
        ) + "\nORDER BY q",
        "j11_star_join": """
            -- exact int64 ten-thousandths (price and discount each
            -- have 2 decimals) so the SUM is order-independent and
            -- bit-matches the Ray twin regardless of summation order
            SELECT p.p_brand AS brand, n.n_name AS nation,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT))
                       / 10000.0 AS revenue,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY brand, nation ORDER BY brand, nation
        """,
        "j10_interval_join": f"""
            WITH bands(band, lo, hi) AS (VALUES {", ".join(
                f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)})
            SELECT p.p_partkey, round(p.p_retailprice, 6) AS p_retailprice,
                   b.band
            FROM part p LEFT JOIN bands b
              ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
            ORDER BY p_partkey
        """,
        "w6_window_dedup": """
            SELECT user_id, hour, first_event_id
            FROM (SELECT user_id,
                         strftime(ts, '%Y-%m-%d %H') AS hour,
                         event_id AS first_event_id,
                         row_number() OVER (
                             PARTITION BY user_id,
                                          strftime(ts, '%Y-%m-%d %H')
                             ORDER BY ts, event_id
                         ) AS rn
                  FROM events)
            WHERE rn = 1 ORDER BY user_id, hour
        """,
        # exact side only (the HLL estimate is approximate by design);
        # the within-bound flag is pinned TRUE like a9. The Ray side
        # counts distinct xxh64(text) — a 64-bit-collision-free proxy
        # at any realistic corpus size (documented, like d1's keys)
        "a18_grouped_hll": """
            SELECT coalesce(lang, '') AS lang,
                   CAST(count(DISTINCT coalesce(text, '')) AS BIGINT)
                       AS exact_distinct_texts,
                   TRUE AS within_bound
            FROM documents GROUP BY coalesce(lang, '') ORDER BY lang
        """,
        "a16_grouped_median": """
            SELECT o_orderpriority,
                   quantile_disc(o_totalprice, 0.5) AS median_val
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "a17_cube": """
            SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS cnt,
                   round(sum(value), 6) AS value_sum
            FROM events
            GROUP BY CUBE (event_type, day)
            ORDER BY event_type NULLS FIRST, day NULLS FIRST
        """,
        "j7_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
            ORDER BY c_custkey
        """,
        "j5_bloom_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
            ORDER BY c_custkey
        """,
        "a12_heavy_hitters": """
            SELECT user_id, count(*) AS cnt
            FROM events GROUP BY user_id
            ORDER BY cnt DESC, user_id ASC LIMIT 20
        """,
        "a11_pivot": f"""
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   {pivot_cols}
            FROM events GROUP BY day ORDER BY day
        """,
        "w9_moving_avg": f"""
            SELECT event_id, user_id,
                   round(avg(value) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {W9_WINDOW} PRECEDING AND CURRENT ROW
                   ), 6) AS mavg
            FROM events ORDER BY event_id
        """,
        "j13_gapfill": """
            WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                              date_trunc('hour', max(ts)) AS hi FROM events),
            s AS (SELECT unnest(generate_series((SELECT lo FROM b),
                         (SELECT hi FROM b), INTERVAL 1 HOUR)) AS h),
            c AS (SELECT date_trunc('hour', ts) AS h,
                         CAST(count(*) AS BIGINT) AS cnt
                  FROM events WHERE event_type = 'purchase' GROUP BY h)
            SELECT strftime(s.h, '%Y-%m-%d %H') AS hour,
                   coalesce(c.cnt, 0) AS cnt
            FROM s LEFT JOIN c USING (h) ORDER BY hour
        """,
        "a21_unpivot": f"""
            WITH p AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                              {pivot_cols}
                       FROM events GROUP BY day)
            {" UNION ALL ".join(
                f"SELECT day, '{ty}' AS event_type, {ty} AS cnt FROM p"
                for ty in PIVOT_TYPES)}
            ORDER BY day, event_type
        """,
        "t_json_extract": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                   round(avg(CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)), 6) AS avg_k
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "d9_keep_best": f"""
            WITH corpus AS (
              SELECT doc_id, coalesce(text, '') AS text, source
              FROM documents
              UNION ALL
              SELECT doc_id + 10000, coalesce(text, ''), 'mirror'
              FROM documents WHERE doc_id % {D9_MIRROR_MOD} = 0),
            ranked AS (
              SELECT doc_id, source,
                     CAST(count(*) OVER (PARTITION BY text) AS BIGINT)
                         AS n_copies,
                     row_number() OVER (
                         PARTITION BY text ORDER BY source, doc_id) AS rn
              FROM corpus)
            SELECT doc_id, source, n_copies
            FROM ranked WHERE rn = 1 ORDER BY doc_id
        """,
        "a13_rollup": """
            SELECT event_type, day, CAST(count(*) AS BIGINT) AS cnt,
                   round(sum(value), 6) AS value_sum
            FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
                  FROM events)
            GROUP BY ROLLUP(event_type, day)
            ORDER BY event_type NULLS FIRST, day NULLS FIRST
        """,
        "g3_pagerank": f"""
            WITH nodes AS (SELECT doc_id FROM documents),
            c AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         count(*) AS ni FROM nodes),
            edges AS (
                {" UNION ALL ".join(
                    f"SELECT doc_id AS src, (doc_id * {a} + {b}) % "
                    f"(SELECT ni FROM c) AS dst FROM nodes"
                    for a, b in PAGERANK_EDGE_MULTS
                )}
            ),
            r0 AS (SELECT doc_id, 1.0 / (SELECT n FROM c) AS rank FROM nodes),
            s1 AS (SELECT e.dst AS doc_id,
                          sum(r.rank / {len(PAGERANK_EDGE_MULTS)}.0) AS s
                   FROM edges e JOIN r0 r ON e.src = r.doc_id GROUP BY e.dst),
            r1 AS (SELECT n.doc_id,
                          {1.0 - PAGERANK_DAMPING} / (SELECT n FROM c)
                          + {PAGERANK_DAMPING} * coalesce(s1.s, 0) AS rank
                   FROM nodes n LEFT JOIN s1 ON n.doc_id = s1.doc_id),
            s2 AS (SELECT e.dst AS doc_id,
                          sum(r.rank / {len(PAGERANK_EDGE_MULTS)}.0) AS s
                   FROM edges e JOIN r1 r ON e.src = r.doc_id GROUP BY e.dst),
            r2 AS (SELECT n.doc_id,
                          {1.0 - PAGERANK_DAMPING} / (SELECT n FROM c)
                          + {PAGERANK_DAMPING} * coalesce(s2.s, 0) AS rank
                   FROM nodes n LEFT JOIN s2 ON n.doc_id = s2.doc_id)
            SELECT doc_id, round(rank, 6) AS rank FROM r2 ORDER BY doc_id
        """,
        "d8_fuzzy_canonical": f"""
            WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part
                                 WHERE p_name IS NOT NULL),
            prs AS (SELECT a.p_name AS na, b.p_name AS nb
                    FROM n a JOIN n b ON a.p_name < b.p_name
                    WHERE levenshtein(a.p_name, b.p_name)
                          <= {FUZZY_MAX_DIST}),
            edges AS (SELECT na AS u, nb AS v FROM prs
                      UNION ALL SELECT nb, na FROM prs),
            reach(u, v) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
                WHERE e.v <> r.u
            ),
            comp AS (SELECT u AS name, least(min(v), u) AS canon
                     FROM reach GROUP BY u)
            SELECT p.p_partkey, p.p_name,
                   coalesce(c.canon, p.p_name) AS canonical_name
            FROM part p LEFT JOIN comp c ON p.p_name = c.name
            ORDER BY p_partkey
        """,
        "g5_components": """
            WITH RECURSIVE nodes AS (SELECT doc_id FROM documents),
            e0 AS (SELECT doc_id AS u, doc_id + 1 AS v FROM nodes
                   WHERE doc_id % 4 <> 3 AND doc_id % 20 <> 10
                     AND doc_id + 1 < (SELECT count(*) FROM documents)),
            edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
            reach(u, v) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
                WHERE e.v <> r.u
            ),
            comp AS (SELECT u AS doc_id, least(min(v), u) AS component
                     FROM reach GROUP BY u)
            SELECT n.doc_id,
                   CAST(coalesce(c.component, n.doc_id) AS BIGINT) AS component
            FROM nodes n LEFT JOIN comp c ON n.doc_id = c.doc_id
            ORDER BY n.doc_id
        """,
        "j9_fuzzy_link": f"""
            WITH n AS (SELECT DISTINCT p_name FROM part
                       WHERE p_name IS NOT NULL)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
            ORDER BY name_a, name_b
        """,
        "g16_kcore": _kcore_unrolled_sql(),
        "g4_triangles": f"""
            WITH e0 AS (
                {" UNION ALL ".join(
                    f"SELECT doc_id AS src, (doc_id * {a} + {b}) % "
                    f"(SELECT count(*) FROM documents) AS dst FROM documents"
                    for a, b in TRIANGLE_EDGE_MULTS
                )}
            ),
            und AS (SELECT least(src, dst) AS u, greatest(src, dst) AS v
                    FROM e0 WHERE src <> dst GROUP BY 1, 2),
            tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
                    FROM und ab
                    JOIN und bc ON bc.u = ab.v
                    JOIN und ac ON ac.u = ab.u AND ac.v = bc.v),
            corners AS (SELECT a AS doc_id FROM tri
                        UNION ALL SELECT b FROM tri
                        UNION ALL SELECT c FROM tri)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
            FROM corners GROUP BY doc_id ORDER BY doc_id
        """,
        # whitespace class shared with the Python kernel (ASCII_WS_RE):
        # RE2's \s is ASCII-only but excludes \v, Python's is Unicode —
        # the explicit class is the one definition both sides run
        "t_normalize": r"""
            SELECT doc_id,
                   trim(regexp_replace(lower(nfc_normalize(
                       coalesce(text, ''))), '[ \t\n\r\f\v]+', ' ', 'g'),
                       ' ') AS norm_text,
                   CAST(length(trim(regexp_replace(lower(nfc_normalize(
                       coalesce(text, ''))), '[ \t\n\r\f\v]+', ' ', 'g'),
                       ' ')) AS BIGINT)
                       AS n_chars_norm
            FROM documents ORDER BY doc_id
        """,
        "a15_correlation": """
            SELECT CAST(count(*) AS BIGINT) AS n_events,
                   round(corr(value, CAST(hour(ts) AS DOUBLE)), 6)
                       AS corr_hour_value
            FROM events
        """,
        "a14_daily_distinct": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY day ORDER BY day
        """,
        "j12_full_outer": """
            WITH e AS (SELECT strftime(date_trunc('minute', ts),
                                       '%Y-%m-%d %H:%M') AS minute,
                              CAST(count(*) AS BIGINT) AS err_cnt
                       FROM events WHERE event_type = 'error' GROUP BY minute),
                 p AS (SELECT strftime(date_trunc('minute', ts),
                                       '%Y-%m-%d %H:%M') AS minute,
                              CAST(count(*) AS BIGINT) AS pur_cnt
                       FROM events WHERE event_type = 'purchase' GROUP BY minute)
            SELECT coalesce(e.minute, p.minute) AS minute,
                   coalesce(e.err_cnt, 0) AS err_cnt,
                   coalesce(p.pur_cnt, 0) AS pur_cnt
            FROM e FULL OUTER JOIN p ON e.minute = p.minute
            ORDER BY minute
        """,
        "u2_intersect": """
            SELECT user_id, day FROM (
                SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
                FROM events WHERE event_type = 'purchase'
                INTERSECT
                SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
                FROM events WHERE event_type = 'error')
            ORDER BY user_id, day
        """,
        "u3_except": """
            SELECT user_id, day FROM (
                SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
                FROM events WHERE event_type = 'purchase'
                EXCEPT
                SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
                FROM events WHERE event_type = 'error')
            ORDER BY user_id, day
        """,
        "w8_funnel": """
            WITH ud AS (
              SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                     min(CASE WHEN event_type = 'view' THEN ts END)
                         AS first_view,
                     max(CASE WHEN event_type = 'purchase' THEN ts END)
                         AS last_purchase
              FROM events GROUP BY user_id, day)
            SELECT day,
                   CAST(count(*) AS BIGINT) AS with_view,
                   CAST(count(*) FILTER (last_purchase > first_view)
                        AS BIGINT) AS converted,
                   round(count(*) FILTER (last_purchase > first_view)
                         * 1.0 / count(*), 6) AS rate
            FROM ud WHERE first_view IS NOT NULL
            GROUP BY day ORDER BY day
        """,
        "w7_row_number": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS seq
            FROM events ORDER BY user_id, seq
        """,
        # 1-based pos matches the Ray side's offset arithmetic; the
        # indexed list_transform lambda is DuckDB's unnest-with-
        # ordinality idiom (plain nested unnest(generate_subscripts)
        # is rejected by the binder)
        "e1_explode_words": f"""
            SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.word
            FROM (SELECT doc_id,
                         unnest(list_transform(
                             string_split(coalesce(text, ''), ' '),
                             (x, i) -> struct_pack(word := x, pos := i))) AS u
                  FROM documents
                  WHERE doc_id % {EXPLODE_SAMPLE_MOD} = 0)
            ORDER BY doc_id, pos
        """,
        "a19_string_agg": """
            SELECT n.n_name,
                   string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
                   CAST(count(*) AS BIGINT) AS n_suppliers
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "a20_histogram": f"""
            SELECT CAST(floor(o_totalprice / {HIST_WIDTH}) AS BIGINT) AS bucket,
                   CAST(floor(o_totalprice / {HIST_WIDTH}) AS BIGINT)
                       * {HIST_WIDTH} AS lo,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY bucket ORDER BY bucket
        """,
        "d6_incremental_ingest": """
            SELECT doc_id FROM documents
            WHERE doc_id % 3 <> 0
              AND coalesce(text, '') NOT IN
                  (SELECT coalesce(text, '') FROM documents
                   WHERE doc_id % 3 = 0)
            ORDER BY doc_id
        """,
        "j6_hash_join": """
            SELECT o_orderpriority,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1.0 - l_discount) * 100) AS BIGINT))
                       / 10000.0 AS revenue,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "g2_top_per_group": f"""
            SELECT user_id, event_id, round(value, 6) AS value, rnk
            FROM (SELECT user_id, event_id, value,
                         CAST(row_number() OVER (
                             PARTITION BY user_id
                             ORDER BY value DESC, event_id
                         ) AS BIGINT) AS rnk
                  FROM events)
            WHERE rnk <= {TOP_PER_GROUP_N}
            ORDER BY user_id, rnk
        """,
        "s6_group_sample": f"""
            SELECT lang, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS sample_rank
            FROM documents
            QUALIFY sample_rank <= {GROUP_SAMPLE_N}
            ORDER BY lang, sample_rank
        """,
    }
