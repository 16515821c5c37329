"""Cumulative-prefix profile of the FULL jitted map step.

Stage-isolated timings (tools/profile_map.py) disagree with micro-bench
timings of the same ops by 100× on the axon relay, so neither is a
trustworthy decomposition of the fused program. This times jitted
PREFIXES of the real pipeline — each truncated after stage k and
reduced to one scalar (so D2H fetch is constant) with tables passed as
arguments (so residency is identical to production). Successive deltas
are the true fused cost of each stage.

Usage: python tools/profile_prefix.py [--batch 32768] [--genome-mbp 16]
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


def timeit(fn, tables, read_batches, lens, n=5):
    """Fetch-forced over DISTINCT read batches: on the axon relay,
    block_until_ready never waits and identical (program, inputs) calls
    may dedup (tools/bench_relay.py), so each call fetches its scalar
    and cycles through different batches."""
    np.asarray(fn(tables, read_batches[0], lens))   # compile + warm
    np.asarray(fn(tables, read_batches[1 % len(read_batches)], lens))
    t0 = time.perf_counter()
    for i in range(n):
        np.asarray(fn(tables, read_batches[i % len(read_batches)], lens))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--positions-per-seed", type=int, default=0,
                    help="override MapConfig.positions_per_seed (must "
                         "match the prepared_p<p> cache with "
                         "--index-cache; the GRCh38 caches are p=8)")
    ap.add_argument("--index-cache", default="",
                    help="profile against an EXISTING index directory "
                         "(e.g. the 3.1 Gbp bits29 cache) with its "
                         "prepared row128 + packed-offsets tables — the "
                         "honest GRCh38-scale stage decomposition")
    ap.add_argument("--stages", default="",
                    help="comma list to run (default all); each stage "
                         "is its own remote compile (~minutes at GRCh38 "
                         "scale), so cherry-pick when chip time matters")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import synth_reads
    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map import seed as seedmod
    from urmap_tpu.map.pipeline import make_map_batch_fn

    rng = np.random.default_rng(0)
    mkw = dict(max_read_len=args.read_len, batch_size=args.batch)
    if args.positions_per_seed:
        mkw["positions_per_seed"] = args.positions_per_seed
    mcfg = MapConfig(**mkw)
    sc = ScoreConfig()
    p = mcfg.positions_per_seed
    row128 = False
    off_bits = None
    if args.index_cache:
        from urmap_tpu.index import UfiIndex
        from urmap_tpu.index.store import (load_prepared,
                                           tables_to_device)

        index = UfiIndex.load(args.index_cache)
        db = index.seqdb
        icfg = index.config
        prep = load_prepared(index, p)
        assert prep is not None, "no prepared_p{p} cache in the index dir"
        ht, meta = prep
        csr_aligned = bool(meta["csr_aligned"])
        from urmap_tpu.index.store import effective_gather_tier

        gather_tier = effective_gather_tier(meta)
        row128 = meta.get("layout") == "row128"
        off_bits = (tuple(meta["off_bits"])
                    if row128 and ht.get("opacked") is not None
                    and os.environ.get("URMAP_NO_PACKED_OFFSETS") != "1"
                    else None)
        t0 = time.monotonic()
        tables = tables_to_device(ht, use_packed_offsets=off_bits
                                  is not None)
        print(f"tables uploaded in {time.monotonic() - t0:.0f}s "
              f"(layout={meta.get('layout')}, off_bits={off_bits})")
    else:
        glen = int(args.genome_mbp * 1e6)
        db = SeqDB.from_seqs(["chr1"],
                             [rng.integers(0, 4, size=glen).astype(np.uint8)])
        icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
        t0 = time.monotonic()
        index = build_index(db, icfg, backend="host")
        print(f"index build (host): {time.monotonic() - t0:.1f}s")
        # tables exactly as pipeline.Mapper builds them (recapped + row-
        # aligned CSR when the pad is affordable) — the classic layout here
        # used to mis-model the production gather
        from urmap_tpu.index.store import align_runs
        from urmap_tpu.map.seed import align_row_words

        capped = index.recapped(p)
        rw = align_row_words(p)
        counts = np.diff(capped.offsets.astype(np.int64))
        starts, total = align_runs(counts, rw)
        csr_aligned = total <= 1.15 * max(capped.num_positions, 1)
        gather_tier = None
        if csr_aligned and os.environ.get("URMAP_TIER_GATHER") == "1":
            # match production: the tier is opt-in since the round-3 sweep
            # (store.effective_gather_tier)
            from urmap_tpu.map.pipeline import pick_gather_tier

            gather_tier = pick_gather_tier(
                np.diff(np.concatenate([starts, [total]])))
        tables = capped.device_tables(row_align=rw if csr_aligned else None)
    codes, _, _ = synth_reads(rng, db, args.batch * 6, args.read_len)
    lengths = np.full(args.batch, args.read_len, np.int32)
    print(f"csr_aligned={csr_aligned} gather_tier={gather_tier} "
          f"row128={row128}")
    reads = [jnp.asarray(codes[i * args.batch:(i + 1) * args.batch])
             for i in range(6)]
    lens = jnp.asarray(lengths)
    q, v = mcfg.seeds_per_read, mcfg.top_candidates

    L = args.read_len
    NW = -(-L // 16)

    def upto(stage):
        def fn(tables, reads, lengths):
            if stage == "null":
                # fixed relay cost: same operands uploaded, no compute
                return (jnp.sum(reads[:, 0].astype(jnp.int32))
                        + tables["offsets"][0].astype(jnp.int32))
            # word-native front end, as in candidates_batch_device
            rp1, rn1 = gpk.pack_reads(reads, lengths, NW)
            rp_rc, rn_rc = gpk.revcomp_words(rp1, rn1, lengths, L)
            rp2 = jnp.concatenate([rp1, rp_rc], axis=0)
            rn2 = jnp.concatenate([rn1, rn_rc], axis=0)
            lengths2 = jnp.concatenate([lengths, lengths], axis=0)
            if stage == "words":
                return jnp.sum(rp2.astype(jnp.int32)) \
                    + jnp.sum(rn2.astype(jnp.int32))
            slots, offs, valid = seedmod.extract_seed_slots_words_dispatch(
                rp2, rn2, lengths2, L, k=icfg.k, q=q,
                slot_bits=icfg.slot_bits)
            if stage == "seed":
                return jnp.sum(slots.astype(jnp.int32))
            if stage in ("decode", "fetch"):
                # gather decomposition (row128 layouts): "decode" = the
                # offsets/obase start+count derivation only; "fetch" =
                # + the positions row take, WITHOUT the rotate/narrow
                slots_i = slots.astype(jnp.int32)
                if off_bits is not None:
                    w = jnp.take(tables["offsets"], slots_i >> 1, axis=0)
                    u = jnp.where((slots_i & 1) == 1,
                                  w >> jnp.uint32(16), w) & jnp.uint32(0xFFFF)
                    b = jnp.take(tables["obase"],
                                 slots_i >> off_bits[1], axis=0)
                    start = b + (u >> jnp.uint32(off_bits[0]))
                else:
                    start = jnp.take(tables["offsets"], slots_i, axis=0)
                if stage == "decode":
                    return jnp.sum(start.astype(jnp.int32))
                pos2d = tables["positions"]
                s = start.reshape(-1).astype(jnp.uint32)
                r0 = (s // jnp.uint32(128)).astype(jnp.int32)
                rows = jnp.take(pos2d, jnp.clip(r0, 0, pos2d.shape[0] - 1),
                                axis=0)
                # sum ALL lanes: a [:, :8] slice would let XLA narrow
                # the gather to 8 lanes and undercount the row fetch
                return jnp.sum(rows)
            cand = seedmod.gather_candidates(
                tables["offsets"], tables["positions"], slots, offs,
                valid, p=p, csr_aligned=csr_aligned, tier=gather_tier,
                row128=row128, obase=tables.get("obase"),
                off_cnt_bits=off_bits[0] if off_bits else 0,
                off_block_bits=off_bits[1] if off_bits else 0)
            if stage == "gather":
                return jnp.sum(cand)
            top_cand, votes = seedmod.vote_top_candidates_dispatch(cand, v=v)
            return jnp.sum(top_cand) + jnp.sum(votes)   # stage == "vote"

        return jax.jit(fn)

    from urmap_tpu.map.pipeline import candidates_batch_device, map_batch_device

    def upto_cands(tables, reads, lengths):
        c = candidates_batch_device(tables, reads, lengths, icfg=icfg,
                                    mcfg=mcfg, sc=sc,
                                    csr_aligned=csr_aligned,
                                    gather_tier=gather_tier,
                                    row128=row128, off_bits=off_bits)
        return (jnp.sum(c["score"]) + jnp.sum(c["pos"])
                + jnp.sum(c["ungapped"]))

    def upto_select(tables, reads, lengths):
        # full step reduced to one scalar: FULL minus this = pack_out
        # stack + the [B, 6] D2H fetch
        out = map_batch_device(tables, reads, lengths, icfg=icfg,
                               mcfg=mcfg, sc=sc, csr_aligned=csr_aligned,
                               gather_tier=gather_tier,
                               row128=row128, off_bits=off_bits)
        return (jnp.sum(out["pos"]) + jnp.sum(out["score"])
                + jnp.sum(out["mapq"]) + jnp.sum(out["second"]))

    wanted = set(args.stages.split(",")) if args.stages else None
    results = []
    for stage in ("null", "words", "seed", "decode", "fetch", "gather",
                  "vote"):
        if wanted and stage not in wanted:
            continue
        dt = timeit(upto(stage), tables, reads, lens)
        results.append((stage, dt))
        print(f"  upto {stage:10s} {dt * 1e3:8.2f} ms", flush=True)
    for name, f in (("cands", upto_cands), ("select", upto_select)):
        if wanted and name not in wanted:
            continue
        dt = timeit(jax.jit(f), tables, reads, lens)
        results.append((name, dt))
        print(f"  upto {name:10s} {dt * 1e3:8.2f} ms", flush=True)

    if not wanted or "FULL" in wanted:
        full = make_map_batch_fn(icfg, mcfg, sc, csr_aligned=csr_aligned,
                                 gather_tier=gather_tier,
                                 row128=row128, off_bits=off_bits)
        dt = timeit(full, tables, reads, lens)
        results.append(("FULL", dt))
        print(f"  FULL (packed)   {dt * 1e3:8.2f} ms")
    prev = 0.0
    print("deltas:")
    for stage, dt in results:
        print(f"  {stage:10s} +{(dt - prev) * 1e3:7.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
