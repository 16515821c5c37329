"""Fetch-forced sweep of the FULL map step (the only honest timing mode
on the axon relay — see tools/bench_relay.py: block_until_ready never
waits, so every config here is timed by np.asarray walls over distinct
input batches through a software pipeline).

Sweeps, in one process (compiles are ~3 min each on this platform):
  * inflight depth (same compiled program — free)
  * GATHER_ROW_WORDS 32/16/8 (row granularity of the CSR/verify gathers)
  * batch size

Usage: python tools/bench_step.py [--n 12]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--skip-batch-sweep", action="store_true")
    ap.add_argument("--skip-rw-sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synth_reads
    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import make_map_batch_fn

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    db = SeqDB.from_seqs(["chr1"],
                         [rng.integers(0, 4, size=glen).astype(np.uint8)])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    index = build_index(db, icfg, backend="host")
    n = args.n
    max_batch = 65536
    codes, _, _ = synth_reads(rng, db, max_batch * 2 + 32768 * n,
                              args.read_len)

    def run(batch, rw, inflight, label, upload_in_loop=False):
        gpk.GATHER_ROW_WORDS = rw
        mcfg = MapConfig(max_read_len=args.read_len, batch_size=batch)
        tables = index.device_tables(cap=mcfg.positions_per_seed)
        full = make_map_batch_fn(icfg, mcfg)
        lens = jnp.asarray(np.full(batch, args.read_len, np.int32))
        nb = min(n, codes.shape[0] // batch)
        if upload_in_loop:
            host = [np.ascontiguousarray(codes[i * batch:(i + 1) * batch])
                    for i in range(nb)]
            batches = [None] * nb

            def get(i):
                return jnp.asarray(host[i])
        else:
            batches = [jnp.asarray(codes[i * batch:(i + 1) * batch])
                       for i in range(nb)]

            def get(i):
                return batches[i]
        jax.block_until_ready([b for b in batches if b is not None])
        t0 = time.perf_counter()
        np.asarray(full(tables, get(0), lens))
        compile_s = time.perf_counter() - t0
        np.asarray(full(tables, get(1), lens))  # warm

        pend = collections.deque()
        walls = []
        t0 = time.perf_counter()
        for i in range(nb):
            pend.append(full(tables, get(i), lens))
            if len(pend) > inflight:
                np.asarray(pend.popleft())
                walls.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
        while pend:
            np.asarray(pend.popleft())
            walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
        med = sorted(walls)[len(walls) // 2] * 1e3
        tot = sum(walls)
        print(f"  {label:34s} med {med:7.1f} ms/call  "
              f"avg {tot / nb * 1e3:7.1f}  ({nb * batch / tot:,.0f} "
              f"reads/s)  [compile {compile_s:.0f}s]", flush=True)
        del tables
        return full

    # inflight sweep (one compile)
    run(32768, 32, 1, "batch=32k rw=32 inflight=1")
    run(32768, 32, 2, "batch=32k rw=32 inflight=2")
    run(32768, 32, 3, "batch=32k rw=32 inflight=3")
    run(32768, 32, 1, "32k rw=32 if=1 upload-in-loop", upload_in_loop=True)
    run(32768, 32, 2, "32k rw=32 if=2 upload-in-loop", upload_in_loop=True)

    if not args.skip_rw_sweep:
        run(32768, 16, 1, "batch=32k rw=16 inflight=1")
        run(32768, 16, 2, "batch=32k rw=16 inflight=2")
        run(32768, 8, 1, "batch=32k rw=8  inflight=1")
        run(32768, 8, 2, "batch=32k rw=8  inflight=2")

    if not args.skip_batch_sweep:
        run(16384, 32, 2, "batch=16k rw=32 inflight=2")
        run(65536, 32, 2, "batch=65k rw=32 inflight=2")


if __name__ == "__main__":
    main()
