"""Attribute e2e wall time to pipeline phases on the dispatch thread.

bench.py's steady SE rate (~170-210k reads/s = ~160-195 ms/batch) sits
well below the fetch-forced FULL-step pipeline (~80 ms/batch, tools/
bench_step.py). This tool runs the EXACT bench SE loop (FASTQ parse →
pack upload → device step → fetch → CIGAR blob → native SAM) with
wall-clock timers around each dispatch-thread stage plus the format /
write pool stages, and prints per-batch means so the missing time has a
name. Timers are monotonic walls, so overlapped stages double-count —
read the dispatch-thread rows (gen/start/sync) as the critical path and
fmt/write as overlap pressure.

Usage: python tools/bench_e2e_phases.py [--reads 262144] [--workers 1]
"""

from __future__ import annotations

import argparse
import collections
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=262_144)
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32_768)
    ap.add_argument("--inflight", type=int, default=1)
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

    fq_path = "/tmp/urmap_phase_bench.fq"
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

    acc = collections.defaultdict(list)
    sink = io.BytesIO()

    # finer-grained start: pad / pack / upload+dispatch
    from urmap_tpu import alphabet, genome_pack as gpk
    import jax.numpy as jnp

    def start(item):
        _s, batch = item
        t0 = time.perf_counter()
        codes_b, lens_b = mapper._pad_full(batch.codes, batch.lengths)
        t1 = time.perf_counter()
        pk, nm = gpk.pack_read_codes_host(codes_b)
        t2 = time.perf_counter()
        out = mapper._fn(mapper.tables, jnp.asarray(pk), jnp.asarray(nm),
                         jnp.asarray(lens_b))
        t3 = time.perf_counter()
        acc["start.pad"].append(t1 - t0)
        acc["start.pack"].append(t2 - t1)
        acc["start.dispatch"].append(t3 - t2)
        return (out, len(batch))

    def sync(item, handle):
        _s, batch = item
        out, B = handle
        t0 = time.perf_counter()
        raw = np.asarray(out)
        t1 = time.perf_counter()
        from urmap_tpu.map.pipeline import unpack_out
        from urmap_tpu.map.pipeline import MapResult
        merged = {k: v[:B] for k, v in unpack_out(raw).items()}
        res = MapResult.from_device(merged, np.asarray(batch.lengths)[:B])
        t2 = time.perf_counter()
        acc["sync.fetch"].append(t1 - t0)
        acc["sync.unpack"].append(t2 - t1)
        return res

    def fmt(item, res):
        s, batch = item
        t0 = time.perf_counter()
        blob, off, nmv, _sp = cigars_nm_blob(db.codes, batch.codes, res,
                                             mapper.sc)
        t1 = time.perf_counter()
        data = sam_native.format_single_end(batch, res, (blob, off), nmv, db)
        t2 = time.perf_counter()
        acc["fmt.cigar"].append(t1 - t0)
        acc["fmt.sam"].append(t2 - t1)
        return data

    def write(data):
        t0 = time.perf_counter()
        sink.write(data)
        acc["write"].append(time.perf_counter() - t0)

    def items():
        s = 0
        reader = FastqReader(fq_path, batch_size=args.batch,
                             max_read_len=args.read_len)
        it = iter(PrefetchIterator(reader))
        while True:
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                return
            acc["gen.next"].append(time.perf_counter() - t0)
            yield s, batch
            s += len(batch)

    # warm pass (relay ramp) — then clear and time
    import itertools
    run_stream(itertools.islice(items(), 4), start, sync, fmt,
               lambda out: None, inflight=args.inflight,
               workers=args.workers)
    acc.clear()
    t0 = time.monotonic()
    run_stream(items(), start, sync, fmt, write,
               inflight=args.inflight, workers=args.workers)
    wall = time.monotonic() - t0
    nb = len(acc["sync.fetch"])
    print(f"reads={args.reads} batches={nb} wall={wall:.3f}s "
          f"rate={args.reads / wall:,.0f} reads/s "
          f"({wall / nb * 1e3:.1f} ms/batch)")
    dispatch_keys = ["gen.next", "start.pad", "start.pack", "start.dispatch",
                     "sync.fetch", "sync.unpack"]
    overlap_keys = ["fmt.cigar", "fmt.sam", "write"]
    tot = 0.0
    for k in dispatch_keys:
        v = acc.get(k, [])
        m = np.mean(v) * 1e3 if v else 0.0
        tot += m
        print(f"  [dispatch] {k:16s} {m:8.2f} ms/batch")
    print(f"  [dispatch] {'TOTAL':16s} {tot:8.2f} ms/batch")
    for k in overlap_keys:
        v = acc.get(k, [])
        m = np.mean(v) * 1e3 if v else 0.0
        print(f"  [overlap ] {k:16s} {m:8.2f} ms/batch")


if __name__ == "__main__":
    main()
