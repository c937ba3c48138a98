"""Largest-Triangle-Three-Buckets downsampling kernel (Steinarsson 2013;
the TimescaleDB ``lttb`` hyperfunction face).

Selects ``threshold`` of ``n`` points preserving visual shape: first and
last points always kept, the ``n−2`` interior points split into
``threshold−2`` equal buckets, and each bucket contributes the point
forming the largest triangle with the previously selected point and the
NEXT bucket's average.

Determinism contract (mirrored by oracle/lttb.py, which implements the
same spec as a scalar loop):

* bucket boundaries are exact integer floor division —
  ``1 + i·(n−2) // (k−2)`` — not float multiply-then-floor;
* abscissae are series-relative (``t − t[0]``) BEFORE the float64 cast, so
  epoch-µs magnitudes (> 2⁵³) never lose precision differently between
  implementations;
* bucket averages are pinned ``np.sum(slice) / len`` (the package's pinned
  summation rule);
* triangle area is ``|(px−ax)(cy−py) − (px−cx)(ay−py)|`` evaluated in that
  literal op order, and ties take the FIRST maximum (np.argmax semantics).

The per-bucket loop is O(threshold) iterations — bounded by the OUTPUT
size, not the input — with each bucket's argmax fully vectorized, so the
kernel stays on the no-per-row-Python path.
"""

from __future__ import annotations

import numpy as np


def lttb_select(t: np.ndarray, y: np.ndarray, threshold: int) -> np.ndarray:
    """Indices (sorted, unique) of the selected points.

    ``t`` int64 (any monotonic abscissa, e.g. epoch µs), ``y`` numeric.
    ``threshold >= 3``; series with ``n <= threshold`` are returned whole.
    """
    n = len(t)
    if n <= threshold:
        return np.arange(n, dtype=np.int64)
    if threshold < 3:
        raise ValueError(f"threshold must be >= 3, got {threshold}")
    k = threshold
    tf = (t - t[0]).astype(np.float64)
    yf = np.asarray(y, dtype=np.float64)
    # k-1 boundaries for the k-2 interior buckets; bounds[k-2] == n-1
    bounds = 1 + (np.arange(k - 1, dtype=np.int64) * (n - 2)) // (k - 2)
    sel = np.empty(k, dtype=np.int64)
    sel[0], sel[-1] = 0, n - 1
    prev = 0
    for i in range(k - 2):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if i + 1 < k - 2:
            nlo, nhi = int(bounds[i + 1]), int(bounds[i + 2])
            ax = np.sum(tf[nlo:nhi]) / (nhi - nlo)
            ay = np.sum(yf[nlo:nhi]) / (nhi - nlo)
        else:
            ax, ay = tf[n - 1], yf[n - 1]
        px, py = tf[prev], yf[prev]
        area = np.abs((px - ax) * (yf[lo:hi] - py) - (px - tf[lo:hi]) * (ay - py))
        prev = lo + int(np.argmax(area))
        sel[i + 1] = prev
    return sel
