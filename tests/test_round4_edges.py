"""Planted edge-case fixtures for the round-4 continuation ops: the
corpus rarely exercises tie-breaks and boundary predicates, so these
build tiny tables where the edge IS the data and compare against the
same DuckDB twins the gate uses."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from job_crawler_ray.pipelines import analytics as A


def _oracle(dir_: str, name: str, tables=("events",)) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dir_}/{t}.parquet')"
        )
    return con.execute(A.analytics_oracle_sql()[name]).df()


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    """Events with deliberate a23 count-ties and w11 timestamp-ties."""
    rows = []
    # user 1: 'click' and 'view' tie at 2 each → modal must be 'click'
    ts0 = pd.Timestamp("2024-05-01 12:00:00")
    for i, et in enumerate(["click", "view", "view", "click"]):
        rows.append((i, 1, et, ts0 + pd.Timedelta(minutes=i), 10.0 + i))
    # user 2: two events at the IDENTICAL ts → event_id must break the
    # tie for FIRST_VALUE/LAST_VALUE
    rows.append((10, 2, "click", ts0, 111.0))
    rows.append((11, 2, "view", ts0, 222.0))
    # user 3: single event
    rows.append((20, 3, "error", ts0, 7.0))
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    )
    d = tmp_path_factory.mktemp("tie_events")
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_a23_mode_tie_breaks_to_smallest_type(tie_dir, ray_session):
    got = A.a23_mode(tie_dir).to_pandas()
    want = _oracle(tie_dir, "a23_mode")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.set_index("user_id").loc[1, "modal_type"] == "click"


def test_w11_first_last_ts_tie_breaks_by_event_id(tie_dir, ray_session):
    got = A.w11_first_last(tie_dir).to_pandas()
    want = _oracle(tie_dir, "w11_first_last")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.set_index("user_id").loc[2]
    assert r["first_value"] == 111.0 and r["last_value"] == 222.0


def test_w10_late_boundary_is_strict(tmp_path, ray_session):
    """An event EXACTLY delay-days older than the watermark is
    on-time (strict <), one microsecond older is late. Arrival order
    is md5(event_id); ids are chosen so the max-ts event arrives
    before both probes."""
    import hashlib

    base = pd.Timestamp("2024-06-30 00:00:00")
    # find an id whose md5 sorts FIRST among candidates (it carries
    # the high watermark), then two probe ids that arrive after it
    ids = list(range(200))
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    wm_id, exact_id, late_id = order[0], order[1], order[2]
    delay = pd.Timedelta(days=A.W10_DELAY_DAYS)
    df = pd.DataFrame(
        {
            "event_id": [wm_id, exact_id, late_id],
            "user_id": [1, 1, 1],
            "event_type": ["view"] * 3,
            "ts": [base, base - delay, base - delay - pd.Timedelta(microseconds=1)],
            "value": [1.0, 1.0, 1.0],
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = A.w10_late_data(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), "w10_late_data")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(got["late"].sum()) == 1  # only the 1-µs-older probe


def test_j16_pairs_exactly_at_eps_excluded(tmp_path, ray_session):
    """Distance == ε must NOT pair (strict <); just-inside must."""
    eps = A.J16_EPS
    pts = np.array(
        [[0.0, 0.0],
         [eps, 0.0],          # exactly ε away from p0 → excluded
         [eps * 0.99, 0.0],   # inside → pairs with p0 (and maybe p1)
         [10.0, 10.0]],       # far away
        dtype=np.float32,
    )
    emb = [np.concatenate([p, np.zeros(6, np.float32)]).tolist()
           for p in pts]
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64),
                       "embedding": emb,
                       "label": np.zeros(4, np.int32)})
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = A.j16_spatial_grid_join(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), "j16_spatial_grid_join",
                   tables=("embeddings",))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 2) in pairs and (0, 1) not in pairs
