"""URL canonicalization / host extraction / key determinism."""

import numpy as np
import pandas as pd

from job_crawler_ray.corpus import pages_table
from job_crawler_ray.functions.urltools import (
    canonicalize_urls,
    hosts_of,
    url_keys,
)


def test_canonicalization_rules():
    urls = pd.Series(
        [
            "https://www.Example.com:443/a/b/?utm_source=x&b=2&a=1#frag",
            "https://example.com/a/b?a=1&b=2",
            "http://example.com:80/a",
            "http://EXAMPLE.com/a",
            "https://example.com/a/",
            "https://example.com/a",
            "example.com/path",  # schemeless
            "https://example.com",  # bare host
        ]
    )
    canon = canonicalize_urls(urls).tolist()
    assert canon[0] == canon[1] == "https://example.com/a/b?a=1&b=2"
    assert canon[2] == canon[3] == "http://example.com/a"
    assert canon[4] == canon[5] == "https://example.com/a"
    assert canon[6] == "http://example.com/path"
    assert canon[7] == "https://example.com"


def test_hosts():
    urls = pd.Series(
        ["https://www.Big.Example.COM:8443/x", "http://a.b.c/y?z=1", "bare.host"]
    )
    assert hosts_of(urls).tolist() == ["big.example.com", "a.b.c", "bare.host"]


def test_keys_depend_only_on_canonical_form():
    a = url_keys(pd.Series(["https://www.example.com/j/?utm_x=1"]))
    b = url_keys(pd.Series(["https://example.com/j"]))
    assert a[0] == b[0]


def test_corpus_dup_fraction_and_skew(sf_small):
    t = pages_table(sf_small, replicate=2)
    urls = t["url"].to_pandas()
    canon = canonicalize_urls(urls)
    dup_frac = 1 - canon.nunique() / len(canon)
    assert 0.01 < dup_frac < 0.10  # controlled duplicate-after-canonicalization
    counts = hosts_of(urls).value_counts()
    assert counts.iloc[0] > 3 * counts.iloc[4]  # Zipf skew: a dominant host


def test_corpus_determinism_under_batching(sf_small):
    """Pages are a pure function of (doc_id, rep): batch size must not matter."""
    import pyarrow.parquet as pq
    from job_crawler_ray.corpus import PageSynth

    docs = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    whole = PageSynth(replicate=2)(docs)
    import pyarrow as pa

    parts = [
        PageSynth(replicate=2)(docs.slice(off, 113))
        for off in range(0, docs.num_rows, 113)
    ]
    stitched = pa.concat_tables(parts)
    assert whole.equals(stitched.cast(whole.schema))
