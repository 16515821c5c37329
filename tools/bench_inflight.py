"""Sweep run_stream inflight depth on the EXACT bench SE loop.

One process / one compile (axon remote compiles are never cached across
processes — NOTES_NEXT_ROUND.md platform fact 5): build mapper once,
then time full FASTQ→map→SAM passes at each requested inflight depth,
repeated, so the ±20% relay jitter can be seen per setting.

Usage: python tools/bench_inflight.py [--reads 524288] [--inflight 1 2 3]
       [--repeats 2]
"""

from __future__ import annotations

import argparse
import io
import itertools
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
    ap.add_argument("--batch", type=int, default=32_768)
    ap.add_argument("--inflight", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args()

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io import sam_native
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.io.fastq import FastqReader, PrefetchIterator
    from urmap_tpu.map.cigar import cigars_nm_blob
    from urmap_tpu.map.pipeline import Mapper
    from urmap_tpu.utils.stream import run_stream

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    gseq = rng.integers(0, 4, size=glen).astype(np.uint8)
    db = SeqDB.from_seqs(["chr1"], [gseq])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    index = build_index(db, icfg, backend="host")
    mcfg = MapConfig(max_read_len=args.read_len, batch_size=args.batch)
    mapper = Mapper(index, mcfg)

    codes, truth_pos, _ = synth_reads(rng, db, args.reads, args.read_len)
    lengths = np.full(args.reads, args.read_len, np.int32)
    mapper.map_codes(codes[: args.batch], lengths[: args.batch])  # compile

    fq_path = "/tmp/urmap_inflight_bench.fq"
    code_to_char = np.frombuffer(b"ACGTNN", np.uint8)
    qual_row = b"I" * args.read_len
    with open(fq_path, "wb") as f:
        chunk = []
        for i in range(args.reads):
            chunk.append(b"@r%d\n%s\n+\n%s\n"
                         % (i, code_to_char[codes[i]].tobytes(), qual_row))
            if len(chunk) == 50000:
                f.write(b"".join(chunk)); chunk = []
        f.write(b"".join(chunk))

    sink = io.BytesIO()
    stats = {"mapped": 0, "correct": 0}

    def start(item):
        _s, batch, pk = item
        return mapper.start_batch(batch.codes, batch.lengths, prepacked=pk)

    def sync(item, handle):
        _s, batch, _pk = item
        return mapper.finish_batch(handle, batch.lengths)

    def fmt(item, res):
        s, batch, _pk = item
        st = (int(res.mapped.sum()),
              int(((res.pos == truth_pos[s : s + len(batch)])
                   & res.mapped).sum()))
        blob, off, nm, _sp = cigars_nm_blob(db.codes, batch.codes, res,
                                            mapper.sc)
        return sam_native.format_single_end(batch, res, (blob, off), nm,
                                            db), st

    def write(out):
        data, (m, c) = out
        stats["mapped"] += m; stats["correct"] += c
        sink.write(data)

    def items():
        s = 0
        reader = FastqReader(fq_path, batch_size=args.batch,
                             max_read_len=args.read_len)
        pf = PrefetchIterator(
            reader, transform=lambda b: (b, mapper.prepack(b.codes,
                                                           b.lengths)))
        for batch, pk in pf:
            yield s, batch, pk
            s += len(batch)

    # warm pass (relay ramp)
    run_stream(itertools.islice(items(), 4), start, sync, fmt,
               lambda out: None, inflight=args.inflight[0],
               workers=args.workers)

    for rep in range(args.repeats):
        for infl in args.inflight:
            sink.seek(0); sink.truncate()
            stats["mapped"] = stats["correct"] = 0
            t0 = time.monotonic()
            run_stream(items(), start, sync, fmt, write,
                       inflight=infl, workers=args.workers)
            wall = time.monotonic() - t0
            print(f"inflight={infl} rep={rep} rate={args.reads / wall:,.0f}"
                  f" reads/s wall={wall:.2f}s"
                  f" mapped={stats['mapped'] / args.reads:.4f}"
                  f" correct={stats['correct'] / args.reads:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
