"""Batch-size scaling on the axon relay: how much of the per-batch wall
is fixed (dispatch/fetch/relay) vs per-read compute. One process, one
compile per batch size."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=524_288)
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[32_768, 65_536, 131_072])
    args = ap.parse_args()

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import Mapper

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    gseq = rng.integers(0, 4, size=glen).astype(np.uint8)
    db = SeqDB.from_seqs(["chr1"], [gseq])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    index = build_index(db, icfg, backend="host")
    codes, truth_pos, _ = synth_reads(rng, db, args.reads, args.read_len)
    lengths = np.full(args.reads, args.read_len, np.int32)

    for B in args.batches:
        mcfg = MapConfig(max_read_len=args.read_len, batch_size=B)
        mapper = Mapper(index, mcfg)
        t0 = time.monotonic()
        res = mapper.map_codes(codes[:B], lengths[:B])
        t_compile = time.monotonic() - t0
        nb = args.reads // B
        t0 = time.monotonic()
        ok = 0
        for i in range(nb):
            h = mapper.start_batch(codes[i * B:(i + 1) * B],
                                   lengths[i * B:(i + 1) * B])
            r = mapper.finish_batch(h, lengths[i * B:(i + 1) * B])
            ok += int((r.pos == truth_pos[i * B:(i + 1) * B])[r.mapped].sum())
        el = time.monotonic() - t0
        print(json.dumps({
            "batch": B, "reads_per_sec": round(nb * B / el, 1),
            "ms_per_batch": round(1000 * el / nb, 1),
            "compile_s": round(t_compile, 1),
            "correct_frac": round(ok / (nb * B), 4)}), flush=True)


if __name__ == "__main__":
    main()
