"""Fetch-forced micro-bench: row_gather_window vs lax.gather-with-slices.

Round-2 finding (tools/bench_step.py): the CSR/verify gathers cost
~(take_ops x rows) + elements, so rw=16 (2 takes, width+16 words) beat
both rw=32 (2x elements) and rw=8 (3 takes). The next candidate is a
single XLA gather op with slice_sizes=(width,) at the EXACT unaligned
start: one op, exact element count, and no funnel selects at all. If
TPU lowers it at the same ~1 element/cycle this is a straight ~2x on
both hot stages.

Timing is fetch-forced over distinct inputs (block_until_ready never
waits on the axon relay — tools/bench_relay.py) with a sum-reduced
scalar output so fetch bytes are negligible.

Usage: python tools/bench_gather2.py [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--table-mwords", type=int, default=64)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from urmap_tpu.genome_pack import row_gather_window

    rng = np.random.default_rng(0)
    M = args.table_mwords * (1 << 20)
    table = jnp.asarray(rng.integers(0, 1 << 30, size=M).astype(np.uint32))

    def slice_gather(table, starts, width):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        return jax.lax.gather(
            table, starts[:, None], dn, slice_sizes=(width,),
            mode=jax.lax.GatherScatterMode.CLIP)

    # shapes: (label, n_rows, width)  — CSR positions and verify windows
    shapes = [("csr  [852k x 16]", 13 * 2 * 32768, 16),
              ("vrfy [524k x 22]", 8 * 2 * 32768, 22)]

    for label, n, width in shapes:
        batches = [jnp.asarray(rng.integers(0, M - 4096, size=n)
                               .astype(np.int32)) for _ in range(args.reps)]

        # table must be an ARGUMENT: closure-captured arrays are inlined
        # into the HLO as literals and blow the remote-compile payload
        @jax.jit
        def f_row(t, s, width=width):
            return row_gather_window(t, s, width).sum(dtype=jnp.uint32)

        @jax.jit
        def f_slice(t, s, width=width):
            return slice_gather(t, s, width).sum(dtype=jnp.uint32)

        for name, fn in (("row_gather(rw=16)", f_row),
                         ("lax.gather slices", f_slice)):
            # warm + fetch-forced wall over distinct inputs
            np.asarray(fn(table, batches[1]))
            t0 = time.perf_counter()
            prev = None
            for b in batches:
                h = fn(table, b)
                if prev is not None:
                    np.asarray(prev)
                prev = h
            np.asarray(prev)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"{label} {name:20s} {dt * 1e3:8.2f} ms "
                  f"({n * width / dt / 1e9:.2f} Gelem/s)", flush=True)
        # equality of the two variants (row path clips identically for
        # in-range starts)
        a = np.asarray(jax.jit(lambda t, s: row_gather_window(
            t, s, width))(table, batches[0][:4096]))
        b = np.asarray(jax.jit(lambda t, s: slice_gather(
            t, s, width))(table, batches[0][:4096]))
        print(f"{label} equal: {np.array_equal(a, b)}", flush=True)


if __name__ == "__main__":
    main()
