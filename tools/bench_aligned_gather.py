"""Fetch-forced FULL-step comparison: row-ALIGNED CSR gather vs classic.

Same honest-timing pattern as tools/bench_step.py (np.asarray forces
each call; distinct input batches; dispatch-ahead pipeline). Two
compiles in one process (aligned map program + classic map program),
interleaved reps so relay drift hits both.

Usage: python tools/bench_aligned_gather.py [--n 12] [--reps 3]
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
    ap.add_argument("--batch", type=int, default=32_768)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inflight", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import make_map_batch_fn
    from urmap_tpu.map.seed import align_row_words

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    db = SeqDB.from_seqs(["chr1"],
                         [rng.integers(0, 4, size=glen).astype(np.uint8)])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    index = build_index(db, icfg, backend="host")
    batch = args.batch
    mcfg = MapConfig(max_read_len=args.read_len, batch_size=batch)
    p = mcfg.positions_per_seed
    n = args.n
    codes, _, _ = synth_reads(rng, db, batch * n, args.read_len)
    lens = jnp.asarray(np.full(batch, args.read_len, np.int32))
    batches = [jnp.asarray(codes[i * batch:(i + 1) * batch])
               for i in range(n)]
    jax.block_until_ready(batches)

    t_al = index.device_tables(cap=p, row_align=align_row_words(p))
    t_cl = index.device_tables(cap=p)
    fn_al = make_map_batch_fn(icfg, mcfg, csr_aligned=True)
    fn_cl = make_map_batch_fn(icfg, mcfg, csr_aligned=False)
    print(f"aligned positions table: {t_al['positions'].shape[0]:,} words "
          f"vs classic {t_cl['positions'].shape[0]:,} "
          f"(+{t_al['positions'].shape[0] / t_cl['positions'].shape[0] - 1:.1%} pad)",
          flush=True)

    variants = [("aligned", fn_al, t_al), ("classic", fn_cl, t_cl)]
    for name, fn, tb in variants:
        t0 = time.perf_counter()
        out0 = np.asarray(fn(tb, batches[0], lens))
        print(f"{name}: compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)

    # equality spot-check on one batch
    o_al = np.asarray(fn_al(t_al, batches[1], lens))
    o_cl = np.asarray(fn_cl(t_cl, batches[1], lens))
    if not np.array_equal(o_al, o_cl):
        diff = int((o_al != o_cl).any(axis=1).sum())
        print(f"WARNING: outputs differ on {diff}/{batch} reads", flush=True)
    else:
        print("outputs bit-identical on spot batch", flush=True)

    for rep in range(args.reps):
        for name, fn, tb in variants:
            np.asarray(fn(tb, batches[0], lens))  # warm
            pend = collections.deque()
            walls = []
            t0 = time.perf_counter()
            for i in range(n):
                pend.append(fn(tb, batches[i], lens))
                if len(pend) > args.inflight:
                    np.asarray(pend.popleft())
                    walls.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
            while pend:
                np.asarray(pend.popleft())
                walls.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
            med = sorted(walls)[len(walls) // 2] * 1e3
            tot = sum(walls)
            print(f"rep={rep} {name:8s} med {med:7.1f} ms/call  "
                  f"avg {tot / n * 1e3:7.1f}  ({n * batch / tot:,.0f} "
                  f"reads/s)", flush=True)


if __name__ == "__main__":
    main()
