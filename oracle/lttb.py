"""Independent LTTB oracle: same spec as kernels/lttb.py, structured as a
scalar per-candidate loop instead of vectorized argmax.

Shares only the PINNED parts of the contract (integer bucket boundaries,
series-relative abscissae, np.sum bucket averages, literal area op order,
first-max ties) — the selection logic itself is re-derived from the
Steinarsson 2013 spec.
"""

from __future__ import annotations

import numpy as np


def lttb_indices(t, y, threshold: int) -> list[int]:
    t = np.asarray(t, dtype=np.int64)
    n = len(t)
    if n <= threshold:
        return list(range(n))
    if threshold < 3:
        raise ValueError("threshold must be >= 3")
    tf = (t - t[0]).astype(np.float64)
    yf = np.asarray(y, dtype=np.float64)
    k = threshold

    def bound(i: int) -> int:
        return 1 + (i * (n - 2)) // (k - 2)

    out = [0]
    prev = 0
    for i in range(k - 2):
        lo, hi = bound(i), bound(i + 1)
        if i + 1 < k - 2:
            nlo, nhi = bound(i + 1), bound(i + 2)
            ax = float(np.sum(tf[nlo:nhi])) / (nhi - nlo)
            ay = float(np.sum(yf[nlo:nhi])) / (nhi - nlo)
        else:
            ax, ay = float(tf[n - 1]), float(yf[n - 1])
        px, py = float(tf[prev]), float(yf[prev])
        best, best_area = lo, -1.0
        for c in range(lo, hi):
            area = abs((px - ax) * (float(yf[c]) - py) - (px - float(tf[c])) * (ay - py))
            if area > best_area:  # strict: first maximum wins
                best, best_area = c, area
        out.append(best)
        prev = best
    out.append(n - 1)
    return out
