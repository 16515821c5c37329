"""utils/bigmem: shared-mmap array allocator used by the index build."""

import gc

import numpy as np

from urmap_tpu.utils.bigmem import BIG_THRESHOLD, big_empty, big_full


def test_big_empty_small_falls_through():
    a = big_empty(100, np.int32)
    assert a.shape == (100,) and a.dtype == np.int32
    a[:] = 7
    assert (a == 7).all()


def test_big_empty_large_is_writable_and_survives_gc():
    n = BIG_THRESHOLD // 4 + 1024           # force the mmap path (int32)
    a = big_empty(n, np.int32)
    assert a.base is not None               # mmap-backed
    a[::4096] = -5
    gc.collect()                            # the mmap must stay alive
    assert a[0] == -5 and a[4096] == -5
    view = a[: n // 2]
    del a
    gc.collect()
    assert view[0] == -5                    # base chain keeps it mapped


def test_big_full_and_shapes():
    a = big_full((3, 50), 9, np.uint32)
    assert a.shape == (3, 50) and (a == 9).all()
    b = big_empty((BIG_THRESHOLD // 8 + 7, 2), np.uint32)
    assert b.shape[1] == 2
    b[-1, -1] = 3
    assert b[-1, -1] == 3
