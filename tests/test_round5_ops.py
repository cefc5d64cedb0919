"""Round-5 operator tests: vectorized DTW kernel, detector invariant
oracles, and the driver-sim backlog gate helpers."""

from __future__ import annotations

import numpy as np
import pytest

from anomaly_detection_spark.operators.dtw import (
    dtw_cents_kernel,
    dtw_cents_naive,
)


class TestDTWKernel:
    def test_fuzz_bit_equal_to_naive(self):
        rng = np.random.default_rng(42)
        for _ in range(300):
            n, m = rng.integers(1, 50, 2)
            a = rng.integers(-(10**6), 10**6, n)
            b = rng.integers(-(10**6), 10**6, m)
            assert dtw_cents_kernel(a, b) == dtw_cents_naive(a, b)

    def test_edges(self):
        assert dtw_cents_kernel([7], [9]) == 2
        assert dtw_cents_kernel([5], [1, 2, 3]) == dtw_cents_naive([5], [1, 2, 3])
        assert dtw_cents_kernel([1, 2, 3], [5]) == dtw_cents_naive([1, 2, 3], [5])
        assert dtw_cents_kernel([], [1, 2]) == 0
        assert dtw_cents_kernel([1], []) == 0
        # identical series -> zero distance
        s = list(range(100))
        assert dtw_cents_kernel(s, s) == 0

    def test_long_series_stays_vectorized(self):
        # the 1000-day synthetic series the r04 verdict asked about:
        # must agree with the naive DP and complete in well under a
        # second (the interpreted loop took ~1 s here)
        import time

        rng = np.random.default_rng(7)
        a = rng.integers(-(10**6), 10**6, 1000)
        b = rng.integers(-(10**6), 10**6, 1000)
        t0 = time.time()
        v = dtw_cents_kernel(a, b)
        elapsed = time.time() - t0
        assert v == dtw_cents_naive(a, b)
        assert elapsed < 0.5, f"kernel regressed to interpreted speed: {elapsed:.2f}s"

    def test_no_overflow_at_extreme_cents(self):
        # path cost ~ 2^40 per step x 2000 steps stays far below 2^61
        a = np.full(100, 2**39, dtype=np.int64)
        b = np.full(100, -(2**39), dtype=np.int64)
        assert dtw_cents_kernel(a, b) == 100 * 2**40
