"""Decisive timing-semantics experiment for the axon relay.

Round-2 finding (first version of this tool): on the axon relay
``block_until_ready`` does NOT wait for execution — enqueued executes
only run when a fetch (np.asarray) forces them. Every timing loop that
blocks without fetching measures ~0.1 ms/call regardless of the program
(tools/profile_prefix.py, tools/bench_gather.py are fake-fast in that
mode). Only fetch-forced walls are real.

This version warms with REAL fetches, then times:
  D1. distinct inputs, np.asarray each call (production sync path)
  D2. identical inputs, np.asarray each call (relay dedup check)
  E.  inflight-1 software pipeline: dispatch i+1, fetch i
Per-call walls are printed so ramp/jitter are visible.

Usage: python tools/bench_relay.py [--batch 32768] [--n 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synth_reads
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
    mcfg = MapConfig(max_read_len=args.read_len, batch_size=args.batch)
    tables = index.device_tables(cap=mcfg.positions_per_seed)
    full = make_map_batch_fn(icfg, mcfg)

    n = args.n
    codes, _, _ = synth_reads(rng, db, args.batch * n, args.read_len)
    lengths = np.full(args.batch, args.read_len, np.int32)
    lens = jnp.asarray(lengths)
    batches = [jnp.asarray(codes[i * args.batch:(i + 1) * args.batch])
               for i in range(n)]
    jax.block_until_ready(batches)

    # compile + warm with REAL fetches (the only true sync on this relay)
    t0 = time.perf_counter()
    np.asarray(full(tables, batches[0], lens))
    print(f"first call (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(full(tables, batches[1], lens))
        print(f"warm call: {(time.perf_counter() - t0) * 1e3:.1f} ms",
              flush=True)

    def loop(name, idx_fn):
        walls = []
        for i in range(n):
            t0 = time.perf_counter()
            np.asarray(full(tables, batches[idx_fn(i)], lens))
            walls.append((time.perf_counter() - t0) * 1e3)
        print(f"  {name:34s} " + " ".join(f"{w:7.1f}" for w in walls)
              + f"   med {sorted(walls)[n // 2]:.1f} ms", flush=True)

    loop("D1 distinct inputs, fetch each", lambda i: i)
    loop("D2 identical inputs, fetch each", lambda i: 2)

    # E: software pipeline, inflight 1 (dispatch i+1 before fetching i)
    t0 = time.perf_counter()
    prev = full(tables, batches[0], lens)
    for i in range(1, n):
        cur = full(tables, batches[i], lens)
        np.asarray(prev)
        prev = cur
    np.asarray(prev)
    dt = (time.perf_counter() - t0) / n
    print(f"  E inflight-1 pipeline              avg {dt * 1e3:7.1f} ms/call"
          f"  ({args.batch / dt:,.0f} reads/s)", flush=True)


if __name__ == "__main__":
    main()
