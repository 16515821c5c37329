"""GRCh38-scale validation: build + map a multi-Gbp synthetic genome.

Proves the round-2 scale goals (VERDICT.md item 2):
  - streaming radix-spill index build in bounded RAM (reports peak RSS
    vs table size),
  - biased-int32 device coordinates: planted reads at global positions
    beyond 2^31 map back to their exact planted coordinates,
  - no overflow anywhere in the CSR (uint32 offsets).

Runs on CPU by default (no TPU needed for correctness; pass --tpu on a
chip with ≥16 GB HBM to exercise the device path). A full 3.1 Gbp run
needs ~35 GB RAM and ~25 GB scratch disk.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=3.1)
    ap.add_argument("--reads", type=int, default=20_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--spill-dir", default="/tmp")
    ap.add_argument("--slot-bits", type=int, default=0,
                    help="override auto slot_bits (28 keeps a 3.1 Gbp "
                         "table + offsets within a 16 GB v5e HBM; auto "
                         "30 needs 4.3 GB of offsets alone)")
    ap.add_argument("--positions-per-seed", type=int, default=0,
                    help="override MapConfig.positions_per_seed (8 "
                         "shrinks the capped table ~30% at slot-bits 28)")
    ap.add_argument("--index-cache", default="",
                    help="directory to save/load the built index (the "
                         "3.1 Gbp host build is ~1 h — pay it once)")
    ap.add_argument("--second-pass", type=int, default=0,
                    help="MapConfig.second_pass_p: host-CPU wide-gather "
                         "recovery of device-unmapped reads (recall "
                         "ladder fix for HBM-fit configs)")
    ap.add_argument("--paired", action="store_true",
                    help="also map --reads/2 planted FR pairs through "
                         "the paired-end step (rescue included) and "
                         "report PE throughput + proper rate")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import Mapper

    from urmap_tpu.index import UfiIndex

    rng = np.random.default_rng(7)
    glen = int(args.gbp * 1e9)
    cache = args.index_cache
    if cache and os.path.exists(os.path.join(cache, "header.json")):
        print(f"# loading cached index from {cache}", flush=True)
        t0 = time.monotonic()
        index = UfiIndex.load(cache)
        db = index.seqdb
        icfg = index.config
        assert int(db.lengths[0]) == glen, (db.lengths[0], glen)
        t_synth = 0.0
        t_build = time.monotonic() - t0
    else:
        print(f"# synthesizing {glen:,} bp genome", flush=True)
        t0 = time.monotonic()
        # chunked synthesis: one big rng call would transiently need int64s
        gseq = np.empty(glen, np.uint8)
        for s in range(0, glen, 1 << 28):
            e = min(s + (1 << 28), glen)
            gseq[s:e] = rng.integers(0, 4, size=e - s, dtype=np.int64) \
                .astype(np.uint8)
        db = SeqDB.from_seqs(["chr1"], [gseq])
        del gseq
        t_synth = time.monotonic() - t0

        t0 = time.monotonic()
        sbits = args.slot_bits or IndexConfig.auto_slot_bits(db.total_len)
        icfg = IndexConfig(slot_bits=sbits)
        index = build_index(db, icfg, backend="host",
                            spill_dir=args.spill_dir)
        t_build = time.monotonic() - t0
        if cache:
            print(f"# saving index to {cache}", flush=True)
            index.save(cache)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    table_gb = (index.positions.nbytes + index.offsets.nbytes) / 1e9
    print(json.dumps({
        "stage": "build", "genome_bp": glen,
        "synth_s": round(t_synth, 1), "build_s": round(t_build, 1),
        "positions": index.num_positions,
        "table_gb": round(table_gb, 2), "peak_rss_gb": round(rss_gb, 2),
        "rss_vs_table": round(rss_gb / max(table_gb, 1e-9), 2),
        "slot_bits": icfg.slot_bits}), flush=True)
    assert index.offsets.dtype == np.uint32
    assert int(index.offsets[-1]) == index.num_positions

    # plant reads; force at least half beyond 2^31
    print("# map phase: building device tables", flush=True)
    mkw = dict(max_read_len=args.read_len, batch_size=args.batch)
    if args.positions_per_seed:
        mkw["positions_per_seed"] = args.positions_per_seed
    if args.second_pass:
        mkw["second_pass_p"] = args.second_pass
    mcfg = MapConfig(**mkw)
    if cache:
        from urmap_tpu.index.store import load_prepared, save_prepared

        pp = mkw.get("positions_per_seed", MapConfig.positions_per_seed)
        want_p = [pp] + ([args.second_pass] if args.second_pass else [])
        for p_ in want_p:
            if load_prepared(index, p_) is None:
                print(f"# map phase: caching prepared tables p={p_}",
                      flush=True)
                t0 = time.monotonic()
                save_prepared(index, cache, p_)
                print(f"# prepared p={p_} cached in "
                      f"{time.monotonic() - t0:.0f}s", flush=True)
    t0 = time.monotonic()
    mapper = Mapper(index, mcfg)
    layout = ("row128" if getattr(mapper, "row128", False)
              else "aligned" if mapper.csr_aligned else "classic")
    print(f"# map phase: tables ready in {time.monotonic() - t0:.0f}s "
          f"(layout={layout})", flush=True)
    print("# map phase: tables ready, mapping", flush=True)
    codes, truth, strand = synth_reads(rng, db, args.reads, args.read_len)
    hi = truth > (1 << 31)
    test_hi = db.total_len > (1 << 31)   # smoke runs stay below 2^31
    print(f"# {int(hi.sum())}/{args.reads} reads planted past 2^31",
          flush=True)
    if test_hi:
        assert hi.sum() > args.reads // 4, "genome too small to test 2^31+"
    lengths = np.full(args.reads, args.read_len, np.int32)
    t0 = time.monotonic()
    res = mapper.map_codes(codes, lengths)
    t_map = time.monotonic() - t0
    correct = (res.pos == truth) & res.mapped
    prec = float(correct[res.mapped].mean()) if res.mapped.any() else 0.0
    prec_hi = (float(correct[hi & res.mapped].mean())
               if (hi & res.mapped).any() else 0.0)
    print(json.dumps({
        "stage": "map", "reads": args.reads,
        "map_s": round(t_map, 1),
        "reads_per_sec": round(args.reads / max(t_map, 1e-9), 1),
        "mapped_frac": round(float(res.mapped.mean()), 4),
        "correct_frac": round(float(correct.mean()), 4),
        "correct_of_mapped": round(prec, 4),
        "correct_of_mapped_past_2_31": round(prec_hi, 4),
        "max_pos_seen": int(res.pos[res.mapped].max()),
    }), flush=True)

    # steady-state SE throughput: the first pass pays the (uncached on
    # this platform) remote compile; re-time on a FRESH read sample (the
    # relay dedups identical executions — bench.py docstring)
    codes2, truth2, _ = synth_reads(rng, db, args.reads, args.read_len)
    t0 = time.monotonic()
    res2 = mapper.map_codes(codes2, lengths)
    t2 = time.monotonic() - t0
    c2 = (res2.pos == truth2) & res2.mapped
    print(json.dumps({
        "stage": "map_steady", "reads": args.reads,
        "map_s": round(t2, 1),
        "reads_per_sec": round(args.reads / max(t2, 1e-9), 1),
        "mapped_frac": round(float(res2.mapped.mean()), 4),
        "correct_of_mapped": round(
            float(c2[res2.mapped].mean()) if res2.mapped.any() else 0.0,
            4),
    }), flush=True)

    if args.paired:
        from bench import synth_pairs
        from urmap_tpu.map.pair import PairedMapper

        n_pairs = args.reads // 2
        r1, r2, t1, t2 = synth_pairs(rng, db, n_pairs, args.read_len)
        ln = np.full(n_pairs, args.read_len, np.int32)
        pm = PairedMapper(mapper)
        t0 = time.monotonic()
        pres = pm.map_pair_codes(r1, ln, r2, ln)
        t_pe = time.monotonic() - t0
        c1 = (pres.m1.pos == t1) & pres.m1.mapped
        c2 = (pres.m2.pos == t2) & pres.m2.mapped
        pe_mapped = (int(pres.m1.mapped.sum())
                     + int(pres.m2.mapped.sum())) / (2 * n_pairs)
        pe_correct = (int(c1.sum()) + int(c2.sum())) / (2 * n_pairs)
        print(json.dumps({
            "stage": "map_pe", "reads": 2 * n_pairs,
            "map_s": round(t_pe, 1),
            "reads_per_sec": round(2 * n_pairs / max(t_pe, 1e-9), 1),
            "mapped_frac": round(pe_mapped, 4),
            "correct_frac": round(pe_correct, 4),
            "proper_frac": round(float(pres.proper.mean()), 4),
        }), flush=True)
        assert pe_correct / max(pe_mapped, 1e-9) > 0.99
        # steady-state PE (fresh sample; first pass paid the compile)
        r1b, r2b, _, _ = synth_pairs(rng, db, n_pairs, args.read_len)
        t0 = time.monotonic()
        p2 = pm.map_pair_codes(r1b, ln, r2b, ln)
        t2 = time.monotonic() - t0
        print(json.dumps({
            "stage": "map_pe_steady", "reads": 2 * n_pairs,
            "map_s": round(t2, 1),
            "reads_per_sec": round(2 * n_pairs / max(t2, 1e-9), 1),
            "proper_frac": round(float(p2.proper.mean()), 4),
        }), flush=True)
    # what this tool PROVES is coordinate correctness (biased int32
    # device coords round-trip exactly, incl. past 2^31). Recall is a
    # config tradeoff: HBM-fit settings (--slot-bits 28
    # --positions-per-seed 8) run ~0.97 where the defaults run 0.999+.
    assert prec > 0.999, prec
    if test_hi:
        assert prec_hi > 0.999, prec_hi
    assert res.mapped.mean() > 0.95
    print("# scale check OK", flush=True)


if __name__ == "__main__":
    main()
