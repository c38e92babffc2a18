"""HTTP-shaped fetch variant: bit-parity with the direct-fragment path.

The reference fetches over HTTP with a persistent client and degrades
errors to empty results (`main.py:213-243`). These tests pin that the
HTTP transport (local in-process server) produces BIT-IDENTICAL fetch
output to the direct-fragment path, and that transport failures degrade
row-level (404-shaped) instead of raising.
"""

import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pytest

from job_crawler_ray.corpus import pages_dataset
from job_crawler_ray.functions.urltools import add_url_key_columns
from job_crawler_ray.stages.fetch import (
    host_bucket_of,
    make_direct_fetch_fn,
    write_corpus_store,
)
from job_crawler_ray.stages.httpfetch import CorpusHTTPServer, HttpFetcher


@pytest.fixture(scope="module")
def store(ray_session, sf_small):
    d = os.path.join(tempfile.gettempdir(), "jcr_httpfetch_store")
    shutil.rmtree(d, ignore_errors=True)
    write_corpus_store(pages_dataset(sf_small, replicate=1), d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def server(store):
    s = CorpusHTTPServer(store)
    yield s
    s.shutdown()


def _released_batch(store, n=64) -> pa.Table:
    import pyarrow.dataset as pads

    urls = pads.dataset(store, partitioning="hive").to_table(columns=["url"])
    order = pa.compute.sort_indices(urls["url"])  # deterministic subset
    batch = pa.table({"url": urls["url"].take(order.slice(0, n))})
    batch = add_url_key_columns(batch)
    bucket = host_bucket_of(batch["url_key"].to_numpy())
    return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))


class TestHttpFetchParity:
    def test_bit_identical_with_direct_fetch(self, store, server, sf_small):
        batch = _released_batch(store)
        direct = make_direct_fetch_fn(store)(batch)
        http = HttpFetcher(server.base_url)(batch)
        pd.testing.assert_frame_equal(direct.to_pandas(), http.to_pandas())
        df = http.to_pandas()
        assert (df["status_code"] == 200).sum() > 0

    def test_unknown_urls_degrade_to_404(self, store, server, sf_small):
        batch = _released_batch(store, n=8)
        fake = pa.table({"url": pa.array(["https://nowhere.example/x"] * 3)})
        fake = add_url_key_columns(fake)
        fake = fake.append_column(
            "bucket",
            pa.array(host_bucket_of(fake["url_key"].to_numpy()), type=pa.int64()),
        )
        merged = pa.concat_tables([batch, fake])
        out = HttpFetcher(server.base_url)(merged).to_pandas()
        assert (out.tail(3)["status_code"] == 404).all()
        assert out.tail(3)["html"].isna().all()

    def test_crawl_parity_direct_vs_http(self, store, server, sf_small):
        """The WHOLE crawl output is bit-identical under either fetch
        transport (same rows, same order, same enrichment)."""
        from job_crawler_ray.pipelines.crawl import (
            CrawlConfig,
            crawl_output_dataset,
            run_crawl,
        )

        outs = []
        for base_url in (None, "http"):
            work = tempfile.mkdtemp(prefix="jcr_httpcrawl_")
            cfg = CrawlConfig(
                work_dir=work,
                budget_per_host=100,
                num_seen_shards=2,
                store_dir_override=store,
                http_fetch_base_url=server.base_url if base_url else None,
                fetch_concurrency=2,
            )
            run_crawl(cfg, sf_dir=sf_small, replicate=1)
            df = (
                crawl_output_dataset(cfg)
                .to_pandas()
                .sort_values(["epoch", "host", "host_rank"])
                .reset_index(drop=True)
            )
            outs.append(df[sorted(df.columns)])
            shutil.rmtree(work, ignore_errors=True)
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_server_down_degrades_not_raises(self, store, sf_small):
        dead = CorpusHTTPServer(store)
        base = dead.base_url
        dead.shutdown()  # port now closed
        batch = _released_batch(store, n=8)
        out = HttpFetcher(base, timeout_s=0.5)(batch).to_pandas()
        assert (out["status_code"] == 404).all()  # degraded, no exception
