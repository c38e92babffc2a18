"""Crawl-engine parity vs the sequential oracle (north-rule gates):

- released set, crawl ORDER, and final SEEN-KEY set identical to the
  sequential reference-semantics oracle under the same seed list +
  politeness budget;
- seen-set actors + reseed wave actually deduplicate a re-crawl;
- exact resume from the last committed manifest;
- execution-shape invariance (different batch sizes / fetch pool sizes
  give byte-identical crawl results).
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from job_crawler_ray.corpus import HOSTS, pages_table
from job_crawler_ray.pipelines.crawl import (
    CrawlConfig,
    crawl_output_dataset,
    run_crawl,
)
from job_crawler_ray.pipelines.oracle import crawl_oracle
from job_crawler_ray.stages.politeness import synth_robots
from job_crawler_ray.state.checkpoint import load_manifests

BUDGET = 60


def _order_df(cfg) -> pd.DataFrame:
    df = crawl_output_dataset(cfg).to_pandas()
    return df.sort_values(["epoch", "host", "host_rank"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def robots():
    return synth_robots(HOSTS)


@pytest.fixture(scope="module")
def oracle_result(sf_small, robots):
    pages = pages_table(sf_small, replicate=2)
    return crawl_oracle(pages, budget_per_host=BUDGET, robots_rules=robots)


@pytest.fixture(scope="module")
def engine_result(ray_session, sf_small, robots, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("crawl"))
    cfg = CrawlConfig(
        work_dir=work,
        budget_per_host=BUDGET,
        num_seen_shards=4,
        robots_rules=robots,
    )
    res = run_crawl(cfg, sf_dir=sf_small, replicate=2, return_seen_keys=True)
    return cfg, res


class TestOracleParity:
    def test_seen_sets_identical(self, engine_result, oracle_result):
        _, res = engine_result
        assert np.array_equal(res["seen_keys"], oracle_result["seen_keys"])

    def test_crawl_order_identical(self, engine_result, oracle_result):
        cfg, _ = engine_result
        got = _order_df(cfg)
        want = oracle_result["order"].reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["url"].to_numpy() == want["url"].to_numpy()).all()
        assert (got["epoch"].to_numpy() == want["epoch"].to_numpy()).all()
        assert (got["host_rank"].to_numpy() == want["host_rank"].to_numpy()).all()

    def test_epoch_count(self, engine_result, oracle_result):
        _, res = engine_result
        assert res["epochs"] == oracle_result["epochs"]

    def test_politeness_budget_respected(self, engine_result):
        cfg, _ = engine_result
        df = _order_df(cfg)
        per = df.groupby(["epoch", "host"]).size()
        assert (per <= BUDGET).all()

    def test_robots_respected(self, engine_result, robots):
        cfg, _ = engine_result
        df = _order_df(cfg)
        for host, prefix in robots.items():
            sub = df[df["host"] == host]
            paths = sub["canonical_url"].str.partition("://")[2]
            paths = "/" + paths.str.partition("/")[2]
            assert not paths.str.startswith(prefix).any()

    def test_byte_identical_extracted_text(self, engine_result, sf_small):
        """North-rule invariant: text extracted from the fetched html is
        byte-identical to the corpus golden text for that url."""
        cfg, _ = engine_result
        df = _order_df(cfg)
        ok = df[df["status_code"] == 200]
        assert len(ok) > 0
        pages = pages_table(sf_small, replicate=2)
        golden = dict(
            zip(pages["url"].to_pylist(), pages["text"].to_pylist())
        )
        want = ok["url"].map(golden)
        assert want.notna().all()
        assert (ok["extracted_text"].to_numpy() == want.to_numpy()).all()

    def test_lineage_manifests(self, engine_result):
        cfg, res = engine_result
        ms = load_manifests(cfg.checkpoint_dir)
        assert len(ms) == res["epochs"]
        assert sum(m["released"] for m in ms) == res["seen_total"]
        for m in ms:
            assert os.path.isdir(m["seen_snapshot_dir"])
            assert os.path.isdir(m["metrics_path"])
            if m["released"]:
                assert m["output_files"]


class TestReseedWave:
    def test_recrawl_wave_fully_deduplicated(
        self, ray_session, sf_small, robots, tmp_path_factory, oracle_result
    ):
        """Re-ingesting the same seed list mid-crawl must not refetch
        anything: the seen-set + frontier dedup absorb the whole wave."""
        from job_crawler_ray.corpus import pages_dataset

        work = str(tmp_path_factory.mktemp("crawl_reseed"))
        cfg = CrawlConfig(
            work_dir=work,
            budget_per_host=BUDGET,
            num_seen_shards=4,
                robots_rules=robots,
        )
        wave = pages_dataset(sf_small, replicate=2)
        res = run_crawl(
            cfg, sf_dir=sf_small, replicate=2, reseed_epochs={2: wave},
            return_seen_keys=True,
        )
        assert np.array_equal(res["seen_keys"], oracle_result["seen_keys"])
        got = _order_df(cfg)
        want = oracle_result["order"]
        assert (got["url"].to_numpy() == want["url"].to_numpy()).all()


class TestResume:
    def test_exact_resume_from_checkpoint(
        self, ray_session, sf_small, robots, tmp_path_factory, oracle_result
    ):
        work = str(tmp_path_factory.mktemp("crawl_resume"))
        kw = dict(
            budget_per_host=BUDGET,
            num_seen_shards=4,
                robots_rules=robots,
        )
        cfg_a = CrawlConfig(work_dir=work, max_epochs=3, **kw)
        run_crawl(cfg_a, sf_dir=sf_small, replicate=2)

        # simulate a crash mid-epoch-3: leave a partial uncommitted output
        partial = os.path.join(cfg_a.out_dir, "ep-00003")
        os.makedirs(partial, exist_ok=True)
        with open(os.path.join(partial, "garbage.parquet"), "wb") as f:
            f.write(b"partial")

        cfg_b = CrawlConfig(work_dir=work, max_epochs=1000, **kw)
        res = run_crawl(cfg_b, sf_dir=sf_small, replicate=2, resume=True,
                        return_seen_keys=True)

        assert np.array_equal(res["seen_keys"], oracle_result["seen_keys"])
        got = _order_df(cfg_b)
        want = oracle_result["order"]
        assert len(got) == len(want)
        assert (got["url"].to_numpy() == want["url"].to_numpy()).all()


class TestExecutionShapeInvariance:
    def test_batch_and_pool_shape_do_not_change_results(
        self, ray_session, sf_small, robots, tmp_path_factory, oracle_result
    ):
        work = str(tmp_path_factory.mktemp("crawl_shape"))
        cfg = CrawlConfig(
            work_dir=work,
            budget_per_host=BUDGET,
            num_seen_shards=2,       # different sharding
            batch_size=257,          # pathological batch size
            robots_rules=robots,
        )
        res = run_crawl(cfg, sf_dir=sf_small, replicate=2, return_seen_keys=True)
        assert np.array_equal(res["seen_keys"], oracle_result["seen_keys"])
        got = _order_df(cfg)
        assert (got["url"].to_numpy() == oracle_result["order"]["url"].to_numpy()).all()


class TestRetention:
    def test_prune_checkpoints_keeps_resume_point(
        self, ray_session, sf_small, robots, tmp_path_factory
    ):
        from job_crawler_ray.state.checkpoint import load_manifests, prune_checkpoints

        work = str(tmp_path_factory.mktemp("crawl_prune"))
        cfg = CrawlConfig(
            work_dir=work,
            budget_per_host=BUDGET,
            num_seen_shards=2,
            robots_rules=robots,
        )
        res = run_crawl(cfg, sf_dir=sf_small, replicate=2, return_seen_keys=True)
        n_epochs = res["epochs"]
        assert n_epochs >= 3
        removed = prune_checkpoints(cfg.checkpoint_dir, keep_last=2)
        assert removed  # old epochs actually deleted
        # manifests intact (lineage never pruned)
        assert len(load_manifests(cfg.checkpoint_dir)) == n_epochs
        # newest snapshot still valid: a fresh SeenSet can restore it
        from job_crawler_ray.stages.seen import SeenSet

        latest = os.path.join(
            cfg.checkpoint_dir, "seen", f"ep-{n_epochs - 1:05d}"
        )
        s = SeenSet(num_shards=2)
        assert s.restore(latest) == res["seen_total"]
        s.shutdown()


class TestDriverScaleParity:
    def test_sf001_parity_with_oracle(
        self, ray_session, sf_mid, robots, tmp_path_factory
    ):
        """Same gate at the driver's correctness scale (sf0.01)."""
        work = str(tmp_path_factory.mktemp("crawl_mid"))
        cfg = CrawlConfig(
            work_dir=work,
            budget_per_host=300,
            num_seen_shards=4,
            robots_rules=robots,
        )
        res = run_crawl(cfg, sf_dir=sf_mid, replicate=1, return_seen_keys=True)
        orc = crawl_oracle(
            pages_table(sf_mid, replicate=1),
            budget_per_host=300,
            robots_rules=robots,
        )
        assert np.array_equal(res["seen_keys"], orc["seen_keys"])
        got = _order_df(cfg)
        want = orc["order"].reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["url"].to_numpy() == want["url"].to_numpy()).all()
