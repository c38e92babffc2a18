"""Property-based invariants (hypothesis) for the core kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from job_crawler_ray.functions.urltools import canonicalize_urls, hosts_of
from job_crawler_ray.hashing import as_signed, as_unsigned, xxh64, xxh64_array


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_xxh64_vectorized_matches_scalar(data):
    assert int(xxh64_array([data])[0]) == xxh64(data)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=20))
def test_xxh64_array_elementwise(texts):
    got = xxh64_array(texts)
    want = np.array([xxh64(t.encode()) for t in texts], dtype=np.uint64)
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_signed_view_roundtrip(v):
    arr = np.array([v], dtype=np.uint64)
    assert int(as_unsigned(as_signed(arr))[0]) == v


_url_st = st.builds(
    lambda scheme, host, path, q, frag: f"{scheme}://{host}{path}{q}{frag}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.from_regex(r"[A-Za-z0-9\-]{1,10}(\.[A-Za-z0-9\-]{1,8}){1,3}", fullmatch=True),
    st.from_regex(r"(/[A-Za-z0-9\-_.]{0,12}){0,4}/?", fullmatch=True),
    st.sampled_from(["", "?a=1", "?utm_source=x", "?b=2&a=1", "?utm_a=1&z=9"]),
    st.sampled_from(["", "#frag", "#x/y"]),
)


@settings(max_examples=200, deadline=None)
@given(_url_st)
def test_canonicalize_idempotent(url):
    once = canonicalize_urls([url]).iloc[0]
    twice = canonicalize_urls([once]).iloc[0]
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(_url_st)
def test_canonical_drops_fragments_and_utm(url):
    canon = canonicalize_urls([url]).iloc[0]
    assert "#" not in canon
    assert "utm_" not in canon


@settings(max_examples=100, deadline=None)
@given(_url_st)
def test_host_is_substring_of_canonical(url):
    canon = canonicalize_urls([url]).iloc[0]
    host = hosts_of([url]).iloc[0]
    assert host in canon
    assert host == host.lower()
