"""Suspect-gate threshold sensitivity (round-4 verdict weak item 5).

One mapping pass with the DEVICE cap disabled (suspect_deficit huge)
exports, per read, everything needed to re-apply the gate at any
threshold T >= suspect_remap_deficit on the host:

    deficit  = L*match - score           (host-computable)
    sat_flag = res.suspect               (sat-evidence & deficit > remap
                                          tier — the device's raw signal)
    capped_T = sat_flag & (deficit > T)  -> mapq := min(mapq, cap)

so a full threshold sweep costs ONE run per corpus, and corpora vary
read length / SNP rate / repeat divergence across runs. Reports
precision/recall@MAPQ>=1 and >=10 per T, including the derived default
(ScoreConfig.mismatch_equiv(6)) — the claim under test is that the
ROC is FLAT for T within +-mismatch_equiv(2) of the derived value.

Usage (small fresh corpus):
  python tools/suspect_sweep.py --genome-mbp 64 --reads 40000 --cpu
At-scale cached corpus (round-4's 1 Gbp / 25%-repeat cache):
  python tools/suspect_sweep.py --index-cache /tmp/acc1g_r25 \
      --genome-mbp 1000 --repeat-frac 0.25 --reads 100000 --cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=40_000)
    ap.add_argument("--genome-mbp", type=float, default=64.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--snp-rate", type=float, default=0.01)
    ap.add_argument("--indel-rate", type=float, default=0.10)
    ap.add_argument("--repeat-frac", type=float, default=0.25)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--slop", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--positions-per-seed", type=int, default=8)
    ap.add_argument("--index-cache", default="")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tools.accuracy import plant_repeat_families, simulate
    from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import Mapper

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    cache = args.index_cache
    if cache and os.path.exists(os.path.join(cache, "header.json")):
        from urmap_tpu.index import UfiIndex

        index = UfiIndex.load(cache)
        db = index.seqdb
        assert int(db.lengths[0]) == glen
        print(f"# cached index {cache}")
    else:
        seq = rng.integers(0, 4, size=glen).astype(np.uint8)
        if args.repeat_frac > 0:
            plant_repeat_families(rng, seq, args.repeat_frac)
        db = SeqDB.from_seqs(["chr1"], [seq])
        index = build_index(
            db, IndexConfig(slot_bits=IndexConfig.auto_slot_bits(
                db.total_len)), backend="host")

    sc = ScoreConfig()
    # device cap OFF (deficit gate unreachable), remap tier at its
    # default so res.suspect carries the raw sat & deficit>remap signal
    mcfg = MapConfig(max_read_len=args.read_len, batch_size=args.batch,
                     positions_per_seed=args.positions_per_seed,
                     suspect_deficit=1 << 20)
    mapper = Mapper(index, mcfg)

    rng_reads = np.random.default_rng(1)
    codes, tpos, tstrand = simulate(rng_reads, db, args.reads,
                                    args.read_len, args.snp_rate,
                                    args.indel_rate)
    lengths = np.full(args.reads, args.read_len, np.int32)
    t0 = time.monotonic()
    res = mapper.map_codes(codes, lengths)
    print(f"# mapped in {time.monotonic() - t0:.0f}s  "
          f"(read-len {args.read_len}, snp {args.snp_rate:.0%}, "
          f"repeat {args.repeat_frac:.0%})")

    correct = (res.mapped & (np.abs(res.pos - tpos) <= args.slop)
               & (res.strand == tstrand))
    deficit = lengths * sc.match - res.score
    sat = np.asarray(res.suspect, bool)          # raw gate signal
    derived = sc.mismatch_equiv(6)
    print(f"# derived suspect_deficit = mismatch_equiv(6) = {derived}; "
          f"remap tier = {sc.mismatch_equiv(3)}")
    print(f"{'T':>4} {'cap_n':>7} "
          f"{'prec@1':>8} {'rec@1':>8} {'prec@10':>8} {'rec@10':>8}")
    for T in sorted({derived - 6, derived - 3, derived, derived + 3,
                     derived + 6}):
        capped = sat & (deficit > T) & res.mapped
        mq = np.where(capped, np.minimum(res.mapq, mcfg.suspect_mapq_cap),
                      res.mapq)
        row = [f"{T:>4} {int(capped.sum()):>7}"]
        for q in (1, 10):
            called = res.mapped & (mq >= q)
            prec = (correct & called).sum() / max(called.sum(), 1)
            rec = (correct & called).sum() / args.reads
            row.append(f"{prec:>8.4f} {rec:>8.4f}")
        print(" ".join(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
