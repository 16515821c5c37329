"""Where does the 10x-off-roofline go? Decisive micro-benchmark.

profile_prefix deltas put every jnp stage ~10x above its VPU roofline
(e.g. seed extraction: ~1 ms of uint32 shift/or work measured at 16 ms),
while the round-1 Pallas DP kernel ran 10x FASTER than its jnp twin on
the same platform. Three programs, one process, fetch-forced timing:

  null    — upload the same operands, return one scalar (fixed cost)
  jnp     — P passes of u32 mul/xor/shift over [N, W] (roofline ~0.2 ms)
  pallas  — the identical passes as one Pallas VMEM kernel

If (jnp - null) >> (pallas - null), XLA's elementwise codegen (not the
relay, not HBM) is the pipeline's bottleneck and the hot stages should
move into Pallas kernels.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

PASSES = 24


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.integers(0, 1 << 32, size=(args.n, args.w),
                                   dtype=np.uint32))
          for _ in range(4)]

    def body(x):
        h = x
        for i in range(PASSES):
            h = h * jnp.uint32(0x9E3779B1 + 2 * i + 1)
            h = h ^ (h >> jnp.uint32(15))
            h = h + jnp.uint32(0x85EBCA6B)
        return h

    @jax.jit
    def f_null(x):
        return x[0, 0].astype(jnp.uint32) + jnp.uint32(1)

    @jax.jit
    def f_jnp(x):
        return jnp.sum(body(x), dtype=jnp.uint32)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    @jax.jit
    def f_pallas(x):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            grid=(x.shape[0] // 2048,),
            in_specs=[pl.BlockSpec((2048, x.shape[1]),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2048, x.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)
        return jnp.sum(out, dtype=jnp.uint32)

    def timeit(fn, label):
        np.asarray(fn(xs[0]))  # compile + warm
        np.asarray(fn(xs[1]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            np.asarray(fn(xs[i % len(xs)]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {label:8s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    elems = args.n * args.w
    print(f"[{args.n}x{args.w}] u32, {PASSES} passes of mul/xor/add "
          f"({3 * PASSES * elems / 1e6:.0f} M vector ops)")
    t_null = timeit(f_null, "null")
    t_jnp = timeit(f_jnp, "jnp")
    t_pal = timeit(f_pallas, "pallas")
    print(f"marginal: jnp {1e3 * (t_jnp - t_null):.2f} ms, "
          f"pallas {1e3 * (t_pal - t_null):.2f} ms "
          f"(roofline ~{3 * PASSES * elems / 963e9 * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
