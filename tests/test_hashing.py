"""xxh64 correctness: published vectors + scalar/vectorized parity."""

import numpy as np
import random

from job_crawler_ray.hashing import xxh64, xxh64_array

# Published XXH64 test vectors (xxHash spec / library docs), seed 0.
VECTORS = {
    b"": 0xEF46DB3751D8E999,
    b"abc": 0x44BC2CF5AD770999,
    b"The quick brown fox jumps over the lazy dog": 0x0B242D361FDA71BC,
}


def test_known_vectors():
    for data, want in VECTORS.items():
        assert xxh64(data) == want


def test_seed_changes_hash():
    assert xxh64(b"abc", seed=1) != xxh64(b"abc", seed=0)


def test_vectorized_matches_scalar_all_length_classes():
    rng = random.Random(7)
    lens = [0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 40, 63, 64, 65, 100, 257, 1000]
    samples = [bytes(rng.randrange(256) for _ in range(n)) for n in lens]
    # plus repeated lengths to exercise the length-grouping path
    samples += [f"https://h{i}.example.com/x/{i}".encode() for i in range(500)]
    got = xxh64_array(samples)
    want = np.array([xxh64(s) for s in samples], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_accepts_strings_and_arrow():
    import pyarrow as pa

    vals = ["a", "bb", "", "ccc"]
    a = xxh64_array(vals)
    b = xxh64_array(pa.array(vals))
    assert np.array_equal(a, b)
    assert a[2] == xxh64(b"")
