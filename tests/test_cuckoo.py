"""Cuckoo filter: no false negatives, bounded FP rate, exact snapshot."""

import numpy as np

from job_crawler_ray.state.cuckoo import CuckooFilter


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives():
    f = CuckooFilter(capacity=1 << 14)
    keys = np.unique(_keys(8000, 1))
    f.add(keys)
    assert f.contains(keys).all()


def test_false_positive_rate_bounded():
    f = CuckooFilter(capacity=1 << 14)
    f.add(np.unique(_keys(8000, 2)))
    probe = np.unique(_keys(20000, 3))
    fp = f.contains(probe).mean()
    assert fp < 0.02  # 16-bit fingerprints, 4-slot buckets


def test_snapshot_roundtrip_bit_exact():
    f = CuckooFilter(capacity=1 << 12)
    keys = np.unique(_keys(2000, 4))
    f.add(keys)
    g = CuckooFilter.from_state(f.state())
    assert np.array_equal(f.table, g.table)
    probe = np.unique(_keys(5000, 5))
    assert np.array_equal(f.contains(probe), g.contains(probe))


def test_deterministic_given_insertion_order():
    keys = np.unique(_keys(4000, 6))
    a, b = CuckooFilter(1 << 13), CuckooFilter(1 << 13)
    a.add(keys)
    b.add(keys)
    assert np.array_equal(a.table, b.table)
