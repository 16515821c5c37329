"""Overlapped map-loop drain (host/device pipelining).

Round-1 profile: device step ~100 ms/batch but e2e ~250 ms/batch — the
host drain (D2H sync, CIGAR/NM, SAM formatting, file write) ran serially
on the dispatch thread. This module splits the loop into four stages and
overlaps them:

    start_fn(item) -> handle      async device dispatch (enqueue only)
    sync_fn(item, handle) -> res  blocks until device results are on host
    format_fn(item, res) -> out   CPU-heavy (CIGAR/NM/SAM bytes): worker pool
    write_fn(out)                 ordered writer thread (file IO, metrics)

The dispatch thread only dispatches and syncs (so device-queue depth
stays bounded and deterministic); formatting runs in a thread pool (the
heavy ops are numpy/ctypes and release the GIL); writes happen on a
single writer thread strictly in dispatch order — required by the resume
watermark (dist/multihost.ShardWriter counts committed batches in order).

``inflight`` bounds device batches outstanding beyond the one being
synced: 1 = dispatch i+1, then sync i (the maximum the axon relay
tolerates); ≥2 for standard TPU runtimes.

The reference overlaps IO and mapping with its per-read thread fan-out
(SURVEY.md §2.13); this is the batch-pipeline equivalent.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor


def run_stream(batches, start_fn, sync_fn, format_fn, write_fn, *,
               inflight: int = 1, workers: int = 2) -> None:
    """Drive the map loop with host/device overlap. See module docstring.

    Exceptions from any stage propagate to the caller; in-flight work is
    drained first (pools shut down cleanly).
    """
    if workers < 1:
        # fully synchronous (debug / -threads 0)
        for item in batches:
            write_fn(format_fn(item, sync_fn(item, start_fn(item))))
        return

    pool = ThreadPoolExecutor(max_workers=workers)
    writer = ThreadPoolExecutor(max_workers=1)
    pending = collections.deque()      # (item, handle) awaiting sync
    fmt_q = collections.deque()        # format futures, dispatch order
    write_q = collections.deque()      # write futures, dispatch order
    try:
        def advance(block: bool = False) -> None:
            """Move finished format results to the writer (in order)."""
            while fmt_q and (block or fmt_q[0].done()):
                out = fmt_q.popleft().result()
                write_q.append(writer.submit(write_fn, out))
            while write_q and write_q[0].done():
                write_q.popleft().result()   # surface writer errors

        def drain_oldest() -> None:
            item, handle = pending.popleft()
            res = sync_fn(item, handle)
            fmt_q.append(pool.submit(format_fn, item, res))
            advance()

        for item in batches:
            pending.append((item, start_fn(item)))
            if len(pending) > inflight:
                drain_oldest()
        while pending:
            drain_oldest()
        advance(block=True)
    finally:
        pool.shutdown(wait=True)
        writer.shutdown(wait=True)
    while write_q:
        write_q.popleft().result()
