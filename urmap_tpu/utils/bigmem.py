"""Huge-allocation helper for GRCh38-scale host arrays.

On this environment's VM class, first-touch page faults on fresh
anonymous-private memory (what malloc/np.empty produce) cost ~5-20 s per
GB, while MAP_SHARED|MAP_ANONYMOUS pages with MADV_HUGEPAGE fault ~5-10x
faster (measured: 2.3 s vs 21-42 s per 2 GB). The reference mapper never
sees this — it builds its tables once into malloc'd memory — but our
index build/prep pipeline allocates tens of GB of one-shot outputs, so
the fault path is a first-order cost (BASELINE.md round-2 cont.-3).

``big_empty`` returns a numpy array backed by a shared anonymous mmap
with hugepages advised. Small requests fall through to np.empty (the
glibc arena reuses those pages across calls, so they are cheap).
"""

from __future__ import annotations

import mmap

import numpy as np

# Below this many bytes np.empty is used: the allocation comes from the
# (reused, already-faulted) malloc arena rather than a fresh mmap.
BIG_THRESHOLD = 64 << 20


def big_empty(shape, dtype) -> np.ndarray:
    """np.empty twin for multi-GB one-shot arrays (fast first touch)."""
    shape = (shape,) if np.isscalar(shape) else tuple(shape)
    dtype = np.dtype(dtype)
    n = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if n < BIG_THRESHOLD:
        return np.empty(shape, dtype)
    m = mmap.mmap(-1, n)
    if hasattr(m, "madvise") and hasattr(mmap, "MADV_HUGEPAGE"):
        try:
            m.madvise(mmap.MADV_HUGEPAGE)
        except OSError:
            pass
    # frombuffer keeps the mmap object referenced via arr.base
    return np.frombuffer(m, dtype).reshape(shape)


def big_full(shape, fill, dtype) -> np.ndarray:
    """np.full twin on big_empty storage."""
    a = big_empty(shape, dtype)
    a[...] = fill
    return a
