"""a2a overflow-round accounting under repeat-skewed slot loads.

The sharded a2a route (dist/sharded._a2a_gather_runner) serves at most
K = slack*M/S queries per destination shard per while_loop round; hot
shards (low-diversity repeat families concentrate their entire query
mass on whichever shard owns their slots) overflow K and cost extra
all_to_all rounds EVERY batch. The loop is deterministic — each round
serves the first K unserved queries per destination, so

    rounds(device) = ceil(max_dest_count / K),  global = max over devices

is exact, not an estimate (equality with a step-level simulation of the
loop body: tests/unit/test_sharded.py::test_a2a_round_model). This tool samples
read batches from a genome (optionally repeat-laden), extracts their
REAL seed slots, and reports the per-batch round distribution at the
adaptive slack (dist/sharded.a2a_slack_from_index) vs the former 2.0
constant — the sizing evidence the round-3 verdict asked for.

Usage:
  python tools/a2a_rounds.py [--genome-mbp 64] [--repeat-frac 0.25]
      [--index-cache DIR] [--shards 8] [--batches 16] [--batch 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def rounds_for_batch(slots: np.ndarray, valid: np.ndarray, *, sps: int,
                     n_shards: int, rows_per_dev: int, K: int) -> int:
    """Exact round count of the fixed-capacity a2a loop for one batch.

    slots/valid [m, q] are the batch's seed queries in device row order
    (m = 2B rows, fwd then rc — matching the [2B] strand layout the
    runner sees); reads shard contiguously over devices (data*index
    axes), ``rows_per_dev`` rows each. Each device needs
    ceil(max over destinations of its query count / K) rounds; the
    while_loop's psum condition runs every device to the global max."""
    m = slots.shape[0]
    worst = 1
    for d0 in range(0, m, rows_per_dev):
        s = slots[d0 : d0 + rows_per_dev].reshape(-1)
        v = valid[d0 : d0 + rows_per_dev].reshape(-1)
        owner = np.clip(s[v].astype(np.int64) // sps, 0, n_shards - 1)
        if owner.size == 0:
            continue
        hist = np.bincount(owner, minlength=n_shards)
        worst = max(worst, int(-(-hist.max() // K)))
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=64.0)
    ap.add_argument("--repeat-frac", type=float, default=0.25)
    ap.add_argument("--index-cache", default="",
                    help="use an existing index (e.g. the at-scale "
                         "repeat cache) instead of building one")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--data-axis", type=int, default=1)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--read-len", type=int, default=150)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.dist.sharded import a2a_slack_from_index
    from urmap_tpu.map.seed import extract_seed_slots

    rng = np.random.default_rng(0)
    if args.index_cache:
        from urmap_tpu.index import UfiIndex

        index = UfiIndex.load(args.index_cache)
        db = index.seqdb
    else:
        from tools.accuracy import plant_repeat_families
        from urmap_tpu.index.build import build_index
        from urmap_tpu.io.fasta import SeqDB

        seq = rng.integers(0, 4, size=int(args.genome_mbp * 1e6)) \
            .astype(np.uint8)
        if args.repeat_frac > 0:
            plant_repeat_families(rng, seq, args.repeat_frac)
        db = SeqDB.from_seqs(["chr1"], [seq])
        index = build_index(
            db, IndexConfig(slot_bits=IndexConfig.auto_slot_bits(
                db.total_len)), backend="host")
    icfg = index.config
    mcfg = MapConfig()
    S = args.shards
    sps = -(-icfg.num_slots // S)
    slack_ad = a2a_slack_from_index(index.offsets, S, sps)

    from urmap_tpu.map.pipeline import revcomp_batch

    B = args.batch
    rows_per_dev = max(1, 2 * B // (S * args.data_axis))
    lengths = np.full(B, args.read_len, np.int32)

    def batch_slots(codes):
        fwd = jnp.asarray(codes)
        rc = revcomp_batch(fwd, jnp.asarray(lengths))
        both = jnp.concatenate([fwd, rc], axis=0)
        s, _, v = extract_seed_slots(
            both, jnp.asarray(np.tile(lengths, 2)), k=icfg.k,
            q=mcfg.seeds_per_read, slot_bits=icfg.slot_bits)
        return np.asarray(s), np.asarray(v)

    results = {}
    for name, slack in (("adaptive", slack_ad), ("const2", 2.0)):
        M = rows_per_dev * mcfg.seeds_per_read
        K = max(1, int(slack * M / S))
        rounds = []
        for b in range(args.batches):
            codes, _, _ = synth_reads(rng, db, B, args.read_len)
            s, v = batch_slots(codes)
            rounds.append(rounds_for_batch(s, v, sps=sps, n_shards=S,
                                           rows_per_dev=rows_per_dev, K=K))
        r = np.asarray(rounds)
        results[name] = {"slack": round(float(slack), 3), "K": K,
                         "rounds_p50": int(np.percentile(r, 50)),
                         "rounds_max": int(r.max())}
        print(f"{name:9s} slack={slack:5.2f} K={K:5d} rounds: "
              f"p50={np.percentile(r, 50):.0f} max={r.max()}")
    print(json.dumps({"metric": "a2a_rounds", "shards": S,
                      "repeat_frac": args.repeat_frac, **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
