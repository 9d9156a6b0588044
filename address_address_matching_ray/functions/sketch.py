"""Mergeable distinct-count sketch (KMV / bottom-k).

A KMV sketch keeps the ``k`` smallest distinct 64-bit hashes of the
values seen.  Partials from different batches merge by unioning and
re-taking the k smallest — associative and commutative, so it composes
with any shuffle/aggregation order.  With fewer than ``k`` distinct
values the sketch degenerates to an exact distinct count; above ``k``
the estimator is ``(k - 1) / kth_smallest_normalized`` with relative
standard error ~ ``1/sqrt(k - 2)`` (Bar-Yossef et al. 2002; same
estimator family as HyperLogLog's precursor).

All kernels are vectorized numpy over uint64 arrays — a sketch partial
for a 10k-row batch is one hash pass + one ``np.partition``.
"""

from __future__ import annotations

import numpy as np

_FULL = np.float64(2.0 ** 64)


def hash_values(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) of an integer
    array; strings should be hashed upstream (e.g. pandas
    ``hash_array``) before entering the sketch."""
    x = np.ascontiguousarray(values).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def kmv_partial(hashes: np.ndarray, k: int) -> np.ndarray:
    """k smallest DISTINCT hashes of one batch (ascending uint64)."""
    u = np.unique(hashes.astype(np.uint64))     # unique() sorts
    return u[:k]


def kmv_merge(partials: np.ndarray, k: int) -> np.ndarray:
    """Union of partial sketches → one sketch (k smallest distinct)."""
    return kmv_partial(partials, k)


def kmv_estimate(sketch: np.ndarray, k: int) -> int:
    """Distinct-count estimate from a merged sketch.  Exact when the
    stream held fewer than ``k`` distinct values."""
    if len(sketch) < k:
        return int(len(sketch))
    kth = np.float64(sketch[k - 1]) + 1.0       # normalize to (0, 1]
    return int(round((k - 1) * _FULL / kth))
