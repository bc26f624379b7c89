"""Tests for the exact radix-permutation emulation.

Byte-compatibility depends on reproducing the reference's unstable in-place
MSD radix sort permutation on tie keys (ksort.h).  The Python implementation
was validated against the reference's radix_sort_128x via a C harness; these
tests lock in behavior and cross-check the native C++ fast path.
"""

import numpy as np
import pytest

from mm2_gb_tpu.utils import ksort, native


def _is_sorted(keys, perm):
    s = keys[perm]
    return bool(np.all(s[:-1] <= s[1:]))


def test_small_is_insertion_stable():
    # n <= 64 uses insertion sort → stable
    keys = np.array([5, 3, 5, 3, 1] * 10, dtype=np.uint64)[:50]
    perm = ksort.radix_perm64(keys)
    assert _is_sorted(keys, perm)
    # stability: equal keys keep original relative order
    for v in np.unique(keys):
        idx = perm[keys[perm] == v]
        assert list(idx) == sorted(idx)


def test_large_sorted_output():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    perm = ksort.radix_perm64(keys)
    assert _is_sorted(keys, perm)
    assert sorted(perm) == list(range(5000))


def test_tie_heavy_deterministic():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 8, 1000, dtype=np.int64).astype(np.uint64)
    p1 = ksort.radix_perm64(keys)
    p2 = ksort.radix_perm64(keys.copy())
    assert np.array_equal(p1, p2)
    assert _is_sorted(keys, p1)


@pytest.mark.skipif(not native.available(), reason="native hostkit not built")
def test_native_matches_python():
    rng = np.random.default_rng(3)
    for n in (10, 64, 65, 100, 1000, 20000):
        for hi in (8, 2**16, 2**63):
            keys = rng.integers(0, hi, n, dtype=np.int64).astype(np.uint64)
            assert np.array_equal(ksort.radix_perm64(keys),
                                  native.radix_perm64(keys)), (n, hi)


def test_ksmall():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 1000, 777, dtype=np.int64).astype(np.uint32)
    for kk in (0, 10, 500, 776):
        assert ksort.ksmall_u32(a.copy(), kk) == int(np.sort(a)[kk])
