"""Hot-key (Zipf-head) tests for the bounded window joins.

One user owns HALF the event stream; the (user, time-bucket) plans in
j4_asof_join / r1_range_join must return exactly the SQL-twin answer
while never materializing that user's full history in one pandas group
(the group key includes the bucket, so group size is bounded by
per-bucket density — verified here by correctness at a skew the old
whole-user plan was never tested at, plus a bucket-width sweep)."""

import numpy as np
import pandas as pd
import pytest

import job_crawler_ray.pipelines.windows as W


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """Events table: user 1 = 50% of all events, spread over 20 days."""
    rng = np.random.RandomState(7)
    n = 6000
    hot = n // 2
    user = np.concatenate(
        [np.ones(hot, dtype=np.int64), rng.randint(2, 120, size=n - hot)]
    )
    base = np.datetime64("2024-03-01T00:00:00", "ns")
    span_ns = 20 * 24 * 3600 * 10**9
    ts = base + rng.randint(0, span_ns, size=n).astype("timedelta64[ns]")
    etype = rng.choice(
        ["click", "purchase", "error", "view"], size=n, p=[0.4, 0.25, 0.25, 0.1]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": user,
            "event_type": etype,
            "ts": pd.to_datetime(ts),
            "value": np.round(rng.uniform(0, 100, size=n), 2),
        }
    ).sample(frac=1.0, random_state=3).reset_index(drop=True)
    d = tmp_path_factory.mktemp("skew_events")
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _oracle(skew_dir: str, name: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    return con.execute(W.WINDOW_SQL[name]).df()


def test_j4_asof_hot_user_matches_oracle(skew_dir, ray_session):
    got = W.j4_asof_join(skew_dir).to_pandas()
    want = _oracle(skew_dir, "j4_asof_join")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_r1_range_hot_user_matches_oracle(skew_dir, ray_session):
    got = W.r1_range_join(skew_dir).to_pandas()
    want = _oracle(skew_dir, "r1_range_join")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    assert len(got) > 0  # the skew corpus must actually exercise pairs


def test_bucket_width_invariance(skew_dir, ray_session):
    """Shrinking the buckets (more groups, more cross-bucket fills /
    replication) must not change either answer — pins the two-level
    merge logic independent of the bucket parameter."""
    base_j4 = W.j4_asof_join(skew_dir).to_pandas()
    base_r1 = W.r1_range_join(skew_dir).to_pandas()
    old_a, old_r = W.ASOF_BUCKET_HOURS, W.RANGE_BUCKET_HOURS
    W.ASOF_BUCKET_HOURS, W.RANGE_BUCKET_HOURS = 2, 1
    try:
        j4 = W.j4_asof_join(skew_dir).to_pandas()
        r1 = W.r1_range_join(skew_dir).to_pandas()
    finally:
        W.ASOF_BUCKET_HOURS, W.RANGE_BUCKET_HOURS = old_a, old_r
    pd.testing.assert_frame_equal(j4, base_j4)
    pd.testing.assert_frame_equal(r1, base_r1)


def test_w7_row_number_hot_user_matches_oracle(skew_dir, ray_session):
    """ROW_NUMBER under the same Zipf head: the two-level plan must
    match the SQL twin without one task holding the hot user's 3000
    events (group key includes the 24 h bucket)."""
    import duckdb

    from job_crawler_ray.pipelines import analytics as A

    got = A.w7_row_number(skew_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    want = con.execute(A.analytics_oracle_sql()["w7_row_number"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_w9_moving_avg_hot_user_matches_oracle(skew_dir, ray_session):
    """ROWS-frame moving average under the Zipf head: level-2 state is
    ≤6 rows per (user, bucket), never the hot user's 3000 events."""
    import duckdb

    from job_crawler_ray.pipelines import analytics as A

    got = A.w9_moving_avg(skew_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    want = con.execute(A.analytics_oracle_sql()["w9_moving_avg"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_j17_asof_forward_hot_user_matches_oracle(skew_dir, ray_session):
    got = W.j17_asof_forward(skew_dir).to_pandas()
    want = _oracle(skew_dir, "j17_asof_forward")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_w20_time_in_state_hot_user_matches_oracle(skew_dir, ray_session):
    import duckdb

    from job_crawler_ray.pipelines import analytics as A

    got = A.w20_time_in_state(skew_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    want = con.execute(A.analytics_oracle_sql()["w20_time_in_state"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_w21_transition_matrix_hot_user_matches_oracle(skew_dir, ray_session):
    import duckdb

    from job_crawler_ray.pipelines import analytics as A

    got = A.w21_transition_matrix(skew_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    want = con.execute(A.analytics_oracle_sql()["w21_transition_matrix"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_w2_sessionize_hot_user_matches_oracle(skew_dir, ray_session):
    """Sessionize under the Zipf head (one user = half the stream):
    the (user, 24 h bucket) two-level plan must match the SQL twin
    while level-1 groups hold only in-bucket events and level-2 holds
    one summary row per non-empty bucket — never the hot user's 3000
    events in a single pandas group."""
    got = W.w2_sessionize(skew_dir).to_pandas()
    want = _oracle(skew_dir, "w2_sessionize")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_w2_sessionize_bucket_width_invariance(skew_dir, ray_session):
    """Session stitching across bucket boundaries is exact at any
    bucket width — shrinking the bucket to 1 h (many more boundary
    merges, incl. multi-bucket chains through single-run buckets)
    must not change a single output row."""
    base = W.w2_sessionize(skew_dir).to_pandas()
    old = W.ASOF_BUCKET_HOURS
    try:
        W.ASOF_BUCKET_HOURS = 1
        narrow = W.w2_sessionize(skew_dir).to_pandas()
    finally:
        W.ASOF_BUCKET_HOURS = old
    pd.testing.assert_frame_equal(narrow, base)
