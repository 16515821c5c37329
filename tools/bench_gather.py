"""Micro-bench: CSR/window gather variants on the current backend.

The map pipeline's top cost is the CSR position gather + the verify
window gather (tools/profile_map.py). Hypothesis from the round-2
profile: XLA's TPU gather is ~1 element/cycle, so cost tracks GATHERED
ELEMENTS (span * row_words), not HBM transactions — smaller row
granularity should win despite more rows. This times the variants.

Usage: python tools/bench_gather.py [--n 524288] [--cpu]
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


def timeit(fn, *args, n=5):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524288)  # 2B*Q at batch 32k
    ap.add_argument("--table-mwords", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from urmap_tpu.genome_pack import row_gather_window

    rng = np.random.default_rng(0)
    M = args.table_mwords * (1 << 20)
    table = jnp.asarray(rng.integers(0, 1 << 30, size=M).astype(np.uint32))
    starts = jnp.asarray(
        rng.integers(0, M - 4096, size=args.n).astype(np.int32))
    N = args.n

    variants = []
    for w in (16, 22):
        for rw in (32, 16, 8):
            variants.append((f"row_gather w={w} rw={rw}",
                             jax.jit(lambda t, s, w=w, rw=rw:
                                     row_gather_window(t, s, w,
                                                       row_words=rw))))

    # exact element gather [N, 16]: one flat take of N*16 elements
    def elem16(t, s):
        idx = s[:, None] + jnp.arange(16, dtype=jnp.int32)[None, :]
        return jnp.take(t, jnp.clip(idx, 0, M - 1).reshape(-1)) \
            .reshape(N, 16)

    variants.append(("elem take w=16", jax.jit(elem16)))

    # dynamic_slice via vmap (XLA may batch these better than gather)
    def dslice16(t, s):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(t, (st,), (16,)))(
                jnp.clip(s, 0, M - 16))

    variants.append(("vmap dynamic_slice w=16", jax.jit(dslice16)))

    for name, fn in variants:
        dt = timeit(fn, table, starts)
        print(f"  {name:28s} {dt * 1e3:8.2f} ms")

    # --- suspects from the pipeline's gather_candidates stage ---------
    nslots = 1 << 26
    offsets = jnp.asarray(
        np.sort(rng.integers(0, M, size=nslots + 1)).astype(np.uint32))
    slots = jnp.asarray(
        rng.integers(0, nslots, size=N).astype(np.uint32))

    def offs_take(o, sl):
        sli = sl.astype(jnp.int32)
        st = jnp.take(o, sli)
        cnt = (jnp.take(o, sli + 1) - st).astype(jnp.int32)
        return st, cnt

    def rgw_u32(t, s):
        return row_gather_window(t, s.astype(jnp.uint32), 16)

    def full_gather(o, t, sl):
        from urmap_tpu.map.seed import gather_candidates

        q = 8
        sl2 = sl.reshape(-1, q)
        so = jnp.zeros(sl2.shape, jnp.int32)
        va = jnp.ones(sl2.shape, jnp.bool_)
        return gather_candidates(o, t, sl2, so, va, p=16)

    for name, fn, a in (
        ("offsets take x2", jax.jit(offs_take), (offsets, slots)),
        ("row_gather uint32 starts", jax.jit(rgw_u32), (table, starts)),
        ("gather_candidates full", jax.jit(full_gather),
         (offsets, table, slots)),
    ):
        dt = timeit(fn, *a)
        print(f"  {name:28s} {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
