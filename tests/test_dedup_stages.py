"""Unit tests: exact dedup operators, politeness release, robots filter."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from job_crawler_ray.stages.dedup import (
    dedup_exact_text,
    exact_dedup_first,
    upsert_last_wins,
)
from job_crawler_ray.stages.politeness import (
    make_budget_release,
    robots_filter_batch,
)


@pytest.fixture
def frontier_ds(ray_session):
    rows = {
        "url": [f"https://h{i%3}.x/p{i}" for i in range(30)],
        "warc_ts": pd.to_datetime(
            [f"2024-01-{(i % 28) + 1:02d}" for i in range(30)]
        ),
        "canonical_url": [f"https://h{i%3}.x/p{i}" for i in range(30)],
        "url_key": np.arange(30, dtype=np.int64) % 10,  # 10 keys, 3 rows each
    }
    return rd.from_arrow(pa.table(rows))


class TestExactDedup:
    def test_keep_first_newest_wins(self, frontier_ds):
        out = exact_dedup_first(frontier_ds, key="url_key").to_pandas()
        assert len(out) == 10
        assert out["url_key"].nunique() == 10
        # winner per key = max warc_ts (tie: min canonical, min url)
        full = frontier_ds.to_pandas()
        for k, grp in full.groupby("url_key"):
            want = grp.sort_values(
                ["warc_ts", "canonical_url", "url"], ascending=[False, True, True]
            ).iloc[0]
            got = out[out["url_key"] == k].iloc[0]
            assert got["url"] == want["url"]

    def test_forced_distributed_count_matches_driver_path(self, frontier_ds):
        """driver_key_limit=0 forces the distributed groupby collide
        count (the multi-node / memory-exhausted tier); it must return
        the exact same winners as the driver-stream path."""
        base = (
            exact_dedup_first(frontier_ds, key="url_key")
            .to_pandas().sort_values("url_key").reset_index(drop=True)
        )
        forced = (
            exact_dedup_first(frontier_ds, key="url_key", driver_key_limit=0)
            .to_pandas().sort_values("url_key").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(forced, base)

    def test_driver_key_limit_budget(self):
        """The computed limit is memory-budgeted: positive, capped at
        the fixed-cost crossover, and scaled to available RAM."""
        from job_crawler_ray.stages.dedup import (
            DRIVER_KEY_LIMIT_CAP,
            _driver_key_limit,
        )

        lim = _driver_key_limit()
        assert 0 < lim <= DRIVER_KEY_LIMIT_CAP

    def test_no_dups_passthrough(self, ray_session):
        ds = rd.from_arrow(
            pa.table({"url_key": np.arange(50, dtype=np.int64), "v": np.arange(50)})
        )
        out = exact_dedup_first(
            ds, key="url_key", order={"by": ["v"], "ascending": [True]}
        )
        assert out.count() == 50

    def test_upsert_last_wins(self, ray_session):
        ds = rd.from_arrow(
            pa.table(
                {
                    "url_key": pa.array([1, 1, 2], pa.int64()),
                    "warc_ts": pd.to_datetime(
                        ["2024-01-01", "2024-02-01", "2024-01-15"]
                    ),
                    "v": ["old", "new", "only"],
                }
            )
        )
        out = upsert_last_wins(ds, key="url_key").to_pandas()
        got = dict(zip(out["url_key"], out["v"]))
        assert got == {1: "new", 2: "only"}

    def test_dedup_exact_text_min_id(self, ray_session):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([5, 3, 9, 7], pa.int64()),
                    "text": ["same", "same", "diff", "same"],
                }
            )
        )
        out = dedup_exact_text(ds).to_pandas()
        assert sorted(out["doc_id"]) == [3, 9]


class TestPoliteness:
    def test_budget_release_caps_and_ranks(self):
        g = pd.DataFrame(
            {
                "host": ["h"] * 5,
                "warc_ts": pd.to_datetime(
                    ["2024-01-05", "2024-01-01", "2024-01-03", "2024-01-04", "2024-01-02"]
                ),
                "canonical_url": [f"u{i}" for i in range(5)],
            }
        )
        out = make_budget_release(2)(g)
        rel = out[out["released"]].sort_values("host_rank")
        assert len(rel) == 2
        # newest first
        assert rel.iloc[0]["warc_ts"] == pd.Timestamp("2024-01-05")
        assert rel.iloc[1]["warc_ts"] == pd.Timestamp("2024-01-04")
        assert (~out[out["host_rank"] >= 2]["released"]).all()

    def test_budget_release_tiebreak_canonical(self):
        g = pd.DataFrame(
            {
                "host": ["h"] * 3,
                "warc_ts": pd.to_datetime(["2024-01-01"] * 3),
                "canonical_url": ["c", "a", "b"],
            }
        )
        out = make_budget_release(1)(g)
        assert out[out["released"]].iloc[0]["canonical_url"] == "a"

    def test_bounded_release_matches_unbounded(self):
        """Two-level bounded release == one-level release on the
        released set, for every block split of a skewed frontier."""
        import numpy as np

        from job_crawler_ray.stages.politeness import make_bounded_budget_release

        rng = np.random.default_rng(7)
        n = 300
        frontier = pd.DataFrame(
            {
                "host": np.where(rng.random(n) < 0.7, "hot.x",
                                 np.where(rng.random(n) < 0.5, "b.x", "c.x")),
                "warc_ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.permutation(n), unit="h"),
                "canonical_url": [f"https://x/{i}" for i in range(n)],
            }
        )
        for budget in (1, 7, 50):
            want = (
                frontier.groupby("host", group_keys=False)[frontier.columns.tolist()]
                .apply(make_budget_release(budget))
            )
            want_rel = want[want["released"]].sort_values(
                ["host", "host_rank"]).reset_index(drop=True)
            for nblocks in (1, 3, 8):
                partial_fn, release_fn = make_bounded_budget_release(budget)
                blocks = [
                    partial_fn(
                        pa.Table.from_pandas(
                            frontier.iloc[i::nblocks], preserve_index=False
                        )
                    ).to_pandas()
                    for i in range(nblocks)
                ]
                cat = pd.concat(blocks)
                # every shuffle group is bounded by budget × blocks
                assert cat.groupby("rel_grp").size().max() <= budget * nblocks
                got = pd.concat(
                    [release_fn(g) for _, g in cat.groupby("rel_grp")]
                )
                got_rel = got[got["released"]].sort_values(
                    ["host", "host_rank"]).reset_index(drop=True)
                pd.testing.assert_frame_equal(
                    got_rel[["host", "warc_ts", "canonical_url", "host_rank"]],
                    want_rel[["host", "warc_ts", "canonical_url", "host_rank"]],
                )

    def test_robots_filter(self):
        batch = pa.table(
            {
                "host": ["a.x", "a.x", "b.x"],
                "canonical_url": [
                    "https://a.x/jobs/1",
                    "https://a.x/other/1",
                    "https://b.x/jobs/1",
                ],
            }
        )
        out = robots_filter_batch(batch, {"a.x": "/jobs/"})
        urls = out["canonical_url"].to_pylist()
        assert urls == ["https://a.x/other/1", "https://b.x/jobs/1"]

    def test_robots_empty_rules_noop(self):
        batch = pa.table({"host": ["a.x"], "canonical_url": ["https://a.x/1"]})
        assert robots_filter_batch(batch, {}).num_rows == 1


class TestConfigNormalizers:
    def test_search_params(self):
        from job_crawler_ray.functions.config import normalize_search_params

        p = normalize_search_params("  python dev  ", "", 500)
        assert p == {"query": "python dev", "location": "London", "max_results": 50}
        with pytest.raises(ValueError):
            normalize_search_params("   ")

    def test_profile_params(self):
        from job_crawler_ray.functions.config import normalize_profile_params

        p = normalize_profile_params(-3, "REMOTE ", 500)
        assert p == {
            "experience_years": 0,
            "remote_preference": "remote",
            "timeline_months": 120,
        }
        assert normalize_profile_params(1, "weird", 1)["remote_preference"] == "hybrid"
        assert normalize_profile_params(1, "weird", 1)["timeline_months"] == 6


class TestRobotsParser:
    """RFC 9309 / REP corner cases for the real robots.txt parser."""

    FIXTURE = "\n".join([
        "# comment line",
        "User-agent: googlebot",
        "Disallow: /google-only/",
        "",
        "User-agent: jobcrawler",
        "User-agent: otherbot",
        "Disallow: /private/",
        "Allow: /private/listing",
        "Disallow: /*.pdf$",
        "",
        "User-agent: *",
        "Disallow: /",
    ])

    def test_group_selection_most_specific(self):
        from job_crawler_ray.stages.politeness import parse_robots_txt

        rules = parse_robots_txt(self.FIXTURE, user_agent="jobcrawler/1.0")
        assert (False, "/private/") in rules
        assert (True, "/private/listing") in rules
        assert all(p != "/google-only/" for _a, p in rules)
        # unknown agent falls back to the * group
        star = parse_robots_txt(self.FIXTURE, user_agent="randombot")
        assert star == [(False, "/")]

    def test_longest_match_and_allow_tiebreak(self):
        from job_crawler_ray.stages.politeness import (
            _robots_allowed_mask,
            parse_robots_txt,
        )

        rules = parse_robots_txt(self.FIXTURE, user_agent="jobcrawler")
        paths = pd.Series([
            "/private/secret",      # Disallow /private/ wins (len 9 > 0)
            "/private/listing/42",  # Allow /private/listing wins (len 16)
            "/public/page",         # no rule -> allowed
            "/files/report.pdf",    # /*.pdf$ wildcard disallow
            "/files/report.pdfx",   # $ anchor: NOT blocked
        ])
        got = _robots_allowed_mask(paths, rules).tolist()
        assert got == [False, True, True, False, True]
        # allow wins an exact length tie
        tie = [(False, "/dir"), (True, "/dir")]
        assert _robots_allowed_mask(pd.Series(["/dir/x"]), tie).tolist() == [True]

    def test_empty_disallow_allows_all(self):
        from job_crawler_ray.stages.politeness import parse_robots_txt

        txt = "User-agent: *\nDisallow:\n"
        assert parse_robots_txt(txt, user_agent="jobcrawler") == []

    def test_filter_batch_mixes_parsed_and_synth_rules(self):
        from job_crawler_ray.stages.politeness import (
            parse_robots_txt,
            robots_filter_batch,
        )

        batch = pa.table({
            "host": ["a.x", "a.x", "b.x", "b.x", "c.x"],
            "canonical_url": [
                "https://a.x/private/1",
                "https://a.x/private/listing/2",
                "https://b.x/jobs/3",
                "https://b.x/other",
                "https://c.x/anything",
            ],
        })
        rules = {
            "a.x": parse_robots_txt(self.FIXTURE, user_agent="jobcrawler"),
            "b.x": "/jobs/",  # legacy synth shape: single disallow prefix
        }
        out = robots_filter_batch(batch, rules)
        assert out["canonical_url"].to_pylist() == [
            "https://a.x/private/listing/2",
            "https://b.x/other",
            "https://c.x/anything",
        ]


class TestDriverRowCap:
    def test_memory_budget_clamps(self):
        """driver_row_cap returns min(cap, mem budget): the static cap
        wins on this roomy host, a huge cap gets memory-clamped, and a
        zeroed cap (the forced-tier test hook) stays zero."""
        from job_crawler_ray.util import available_memory_bytes, driver_row_cap

        assert driver_row_cap(0, 8) == 0
        avail = available_memory_bytes()
        assert avail is None or avail > 0
        if avail is not None:
            assert driver_row_cap(10**18, 8) < 10**18  # memory-clamped
            small = driver_row_cap(1000, 8)
            assert small == 1000  # static cap wins when memory is ample


class TestWarcParser:
    def test_roundtrip_and_degradation(self):
        """Record build → parse roundtrip; leading garbage skipped,
        non-response records dropped, truncated tail degrades to the
        records parsed so far (row-level, never an exception)."""
        from job_crawler_ray.stages.warcio import (
            build_warc_record,
            parse_warc_stream,
        )

        r1 = build_warc_record("https://a.x/1", b"hello\r\nworld", "urn:1")
        r2 = build_warc_record("https://a.x/2", b"", "urn:2")
        meta = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\n"
            b"abc\r\n\r\n"
        )
        blob = b"garbage-bytes" + r1 + meta + r2 + r1[: len(r1) // 2]
        got = list(parse_warc_stream(blob))
        assert got == [
            ("https://a.x/1", b"hello\r\nworld"),
            ("https://a.x/2", b""),
        ]

    def test_payload_containing_warc_magic(self):
        """Content-Length framing must win over content scanning: a
        payload that CONTAINS 'WARC/1.0' header bytes is returned
        verbatim and does not desync the stream."""
        from job_crawler_ray.stages.warcio import (
            build_warc_record,
            parse_warc_stream,
        )

        evil = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n"
        r1 = build_warc_record("https://a.x/evil", evil, "urn:e")
        r2 = build_warc_record("https://a.x/after", b"ok", "urn:a")
        got = list(parse_warc_stream(r1 + r2))
        assert got == [("https://a.x/evil", evil), ("https://a.x/after", b"ok")]
