"""Native (C++) CSR graph-construction kernels vs numpy reference
(sparse_matrix.cpp create_graph parity)."""

import numpy as np

from goma_tpu.native import searchsorted_native, sort_unique


def test_sort_unique_matches_numpy():
    rng = np.random.RandomState(1)
    for n in (0, 1, 7, 5000, 300_000):
        keys = rng.randint(0, max(n // 3, 2), size=n).astype(np.int64)
        np.testing.assert_array_equal(sort_unique(keys), np.unique(keys))


def test_searchsorted_matches_numpy():
    rng = np.random.RandomState(2)
    s = np.unique(rng.randint(0, 10_000, size=5000).astype(np.int64))
    q = rng.randint(-5, 10_005, size=20_000).astype(np.int64)
    np.testing.assert_array_equal(searchsorted_native(s, q), np.searchsorted(s, q))


def test_pattern_build_uses_native_and_matches():
    from goma_tpu.fem.sparsity import build_pattern

    rng = np.random.RandomState(3)
    g = rng.randint(0, 200, size=(60, 9)).astype(np.int64)
    pat = build_pattern(200, [g])
    # reference construction
    keys = [np.arange(200, dtype=np.int64) * 200 + np.arange(200)]
    rows = np.repeat(g, 9, axis=1)
    cols = np.tile(g, (1, 9))
    keys.append((rows * 200 + cols).ravel())
    expect = np.unique(np.concatenate(keys))
    np.testing.assert_array_equal(pat.keys, expect)
    p = pat.find(g[:, 0], g[:, 1])
    assert np.all(p >= 0)
    assert np.all(pat.keys[p] == g[:, 0] * 200 + g[:, 1])
