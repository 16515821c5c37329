"""utils/stream.run_stream: ordering, overlap, error propagation."""

import threading
import time

import pytest

from urmap_tpu.utils.stream import run_stream


def _run(n, *, inflight=1, workers=2, fail_at=None):
    order = []
    lock = threading.Lock()

    def start(i):
        return ("h", i)

    def sync(i, h):
        assert h == ("h", i)
        return i * 10

    def fmt(i, res):
        if fail_at is not None and i == fail_at:
            raise RuntimeError(f"boom {i}")
        time.sleep(0.001 * ((i * 7) % 3))   # jitter: stress ordering
        return (i, res)

    def write(out):
        with lock:
            order.append(out)

    run_stream(range(n), start, sync, fmt, write,
               inflight=inflight, workers=workers)
    return order


@pytest.mark.parametrize("inflight,workers", [(1, 2), (2, 3), (1, 0), (3, 1)])
def test_ordering(inflight, workers):
    got = _run(23, inflight=inflight, workers=workers)
    assert got == [(i, i * 10) for i in range(23)]


def test_error_propagates():
    with pytest.raises(RuntimeError, match="boom"):
        _run(20, fail_at=7)


def test_write_error_propagates():
    def bad_write(out):
        raise OSError("disk full")

    with pytest.raises(OSError, match="disk full"):
        run_stream(range(5), lambda i: i, lambda i, h: h,
                   lambda i, r: r, bad_write, workers=2)
