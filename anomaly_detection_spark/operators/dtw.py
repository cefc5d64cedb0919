"""Dynamic-time-warping kernel (integer-exact, anti-diagonal vectorized).

DTW is genuinely non-SQL (a 2-D dynamic program), so it runs inside an
Arrow-batched pandas UDF — but the DP itself must not be an interpreted
double loop: at a multi-year corpus (n ≈ m ≈ 10³ days per user) that is
~10⁶ interpreted steps per user.  This kernel sweeps the DP matrix by
anti-diagonals — every cell on diagonal ``k = i + j`` depends only on
diagonals ``k-1`` (up/left) and ``k-2`` (diag), so each sweep is one
vectorized ``numpy.minimum`` chain over the whole diagonal: O(n+m)
Python iterations instead of O(n·m).  Same recurrence the registry
oracle's recursive-CTE wavefront unrolls (``dtw_distance_users``),
bit-identical results on the int64 cents grid.

Reference parity: the reference has no DTW; this is part of the
time-series analytics extension surface (SURVEY.md §2.14 T11).
"""

from __future__ import annotations

import numpy as np

# Sentinel for "no predecessor" — far above any reachable path cost
# (|cents| diffs × path length ≤ ~2^40 on real data) yet small enough
# that ``cost + _BIG`` cannot wrap int64.
_BIG = np.int64(1) << np.int64(61)


def dtw_cents_kernel(a, b) -> int:
    """Exact DTW distance between two int64 series (unit step costs
    ``|a_i - b_j|``, moves right/down/diag, no window constraint).

    Equivalent to the classic O(n·m) double loop::

        dp[i, j] = cost[i, j] + min(dp[i-1, j], dp[i, j-1], dp[i-1, j-1])

    but evaluated one anti-diagonal at a time so the inner work is
    vectorized numpy.  Borders fall out of the same recurrence via the
    ``_BIG`` sentinel (at ``i == 0`` only the left predecessor is
    finite, etc.), so no special-cased first row/column.
    """
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0
    # Rolling diagonal buffers indexed by row: slot ``i + 1`` holds the
    # dp value at cell ``(i, k - i)`` of that diagonal; slot 0 and any
    # row off the diagonal stay at the sentinel.  On diagonal ``k`` the
    # three predecessors of row ``i`` are prev1[i] (up, row i-1),
    # prev1[i+1] (left, row i) and prev2[i] (diag, row i-1) — all
    # contiguous slices, no fancy indexing, O(n) memory.
    prev2 = np.full(n + 1, _BIG, dtype=np.int64)
    prev1 = np.full(n + 1, _BIG, dtype=np.int64)
    prev1[1] = abs(int(a[0]) - int(b[0]))
    if n + m == 2:
        return int(prev1[1])
    cur = np.full(n + 1, _BIG, dtype=np.int64)
    for k in range(1, n + m - 1):
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        # |a_i - b_{k-i}| for i = lo..hi (j descends as i ascends)
        cdiag = np.abs(a[lo:hi + 1] - b[k - hi:k - lo + 1][::-1])
        best = np.minimum(
            np.minimum(prev1[lo:hi + 1], prev1[lo + 1:hi + 2]),
            prev2[lo:hi + 1],
        )
        cur.fill(_BIG)
        cur[lo + 1:hi + 2] = cdiag + best
        prev2, prev1, cur = prev1, cur, prev2
    return int(prev1[n])


def dtw_cents_naive(a, b) -> int:
    """The textbook interpreted double loop — kept as the differential
    reference for tests only (never on the query hot path)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0
    cost = np.abs(a[:, None] - b[None, :])
    dp = np.zeros((n, m), dtype=np.int64)
    dp[0, 0] = cost[0, 0]
    for j in range(1, m):
        dp[0, j] = cost[0, j] + dp[0, j - 1]
    for i in range(1, n):
        dp[i, 0] = cost[i, 0] + dp[i - 1, 0]
        for j in range(1, m):
            dp[i, j] = cost[i, j] + min(
                dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
            )
    return int(dp[n - 1, m - 1])
