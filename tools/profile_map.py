"""Stage-by-stage timing of the device map pipeline on the current backend.

Usage: python tools/profile_map.py [--batch 8192] [--genome-mbp 4]
Times each pipeline stage in isolation (jitted, after warmup) so the hot
op is obvious. Optionally dumps an XLA profile with --trace.
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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--genome-mbp", type=float, default=4.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map import seed as seedmod
    from urmap_tpu.map.dp import banded_packed
    from urmap_tpu.map.pipeline import make_map_batch_fn, revcomp_batch

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    db = SeqDB.from_seqs(["chr1"], [rng.integers(0, 4, size=glen).astype(np.uint8)])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    t0 = time.monotonic()
    index = build_index(db, icfg, backend="host")
    print(f"index build (host): {time.monotonic() - t0:.1f}s")
    mcfg = MapConfig(max_read_len=args.read_len, batch_size=args.batch)
    sc = ScoreConfig()

    codes, _, _ = synth_reads(rng, db, args.batch, args.read_len)
    lengths = np.full(args.batch, args.read_len, np.int32)
    tables = index.device_tables()
    reads = jnp.asarray(codes)
    lens = jnp.asarray(lengths)
    B = args.batch
    q, p, v = mcfg.seeds_per_read, mcfg.positions_per_seed, mcfg.top_candidates

    # stage fns (jitted separately)
    @jax.jit
    def s_rc(reads, lens):
        rc = revcomp_batch(reads, lens)
        return jnp.concatenate([reads, rc]), jnp.concatenate([lens, lens])

    reads2, lens2 = s_rc(reads, lens)

    @jax.jit
    def s_seed(reads2, lens2):
        return seedmod.extract_seed_slots(reads2, lens2, k=icfg.k, q=q,
                                          slot_bits=icfg.slot_bits)

    slots, offs, valid = s_seed(reads2, lens2)

    @jax.jit
    def s_gather(slots, offs, valid):
        return seedmod.gather_candidates(tables["offsets"],
                                         tables["positions"], slots, offs,
                                         valid, p=p)

    cand = s_gather(slots, offs, valid)

    @jax.jit
    def s_vote(cand):
        return seedmod.vote_top_candidates(cand, v=v)

    top_cand, votes = s_vote(cand)

    from urmap_tpu import genome_pack as gpk

    nwords = -(-args.read_len // gpk.BASES_PER_WORD)

    @jax.jit
    def s_ung(top_cand, reads2, lens2):
        rp, rn = gpk.pack_reads(reads2, lens2, nwords)
        flat_cand = top_cand.reshape(-1)
        flat_lens = jnp.repeat(lens2, v, axis=0)
        mm = gpk.mismatch_counts(
            tables["ginter"], tables["base_off"],
            jnp.where(flat_cand == seedmod.SENTINEL, 0, flat_cand),
            jnp.repeat(rp, v, axis=0), jnp.repeat(rn, v, axis=0),
            flat_lens)
        return ((flat_lens - mm) * sc.match + mm * sc.mismatch)

    ung = s_ung(top_cand, reads2, lens2)

    D = max(B // mcfg.dp_capacity_frac, 1)

    def s_dp(top_cand, reads2, lens2):
        rp, rn = gpk.pack_reads(reads2[:2 * D], lens2[:2 * D], nwords)
        flat_cand = top_cand[:2 * D].reshape(-1)
        flat_reads = jnp.repeat(reads2[:2 * D], v, axis=0)
        flat_lens = jnp.repeat(lens2[:2 * D], v, axis=0)
        return banded_packed(
            tables["ginter"], tables["base_off"],
            jnp.where(flat_cand == seedmod.SENTINEL, 0, flat_cand),
            flat_reads, flat_lens, jnp.repeat(rp, v, axis=0),
            jnp.repeat(rn, v, axis=0), hw=mcfg.band_halfwidth, sc=sc)

    s_dp = jax.jit(s_dp)
    dp_out = s_dp(top_cand, reads2, lens2)

    full = make_map_batch_fn(icfg, mcfg, sc)
    full_out = full(tables, reads, lens)

    stages = {
        "revcomp+concat": lambda: s_rc(reads, lens),
        "seed extract": lambda: s_seed(reads2, lens2),
        "csr gather": lambda: s_gather(slots, offs, valid),
        "vote top-V": lambda: s_vote(cand),
        "ungapped verify": lambda: s_ung(top_cand, reads2, lens2),
        "DP bucket(1rnd)": lambda: s_dp(top_cand, reads2, lens2),
        "FULL step": lambda: full(tables, reads, lens),
    }
    print(f"batch={B} reads, 2 strands, q={q} p={p} v={v} "
          f"hw={mcfg.band_halfwidth} L={args.read_len}")
    for name, fn in stages.items():
        dt = timeit(fn)
        print(f"  {name:15s} {dt * 1e3:8.2f} ms   "
              f"({B / dt:,.0f} reads/s)")

    if args.trace:
        import jax.profiler

        with jax.profiler.trace("/tmp/urmap_trace"):
            for _ in range(3):
                jax.block_until_ready(full(tables, reads, lens))
        print("trace written to /tmp/urmap_trace")


if __name__ == "__main__":
    main()
