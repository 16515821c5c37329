"""Single-process TPU drain-configuration sweep.

The axon platform pays a remote compile per distinct program, so every
experiment that shares the map program must run in ONE process: build
index, warm up once, then time several host-drain configurations and a
device-only loop. Prints one JSON line per experiment plus per-phase
wall-clock so host vs device vs transfer cost is unambiguous.
"""

from __future__ import annotations

import argparse
import io
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
    ap.add_argument("--reads", type=int, default=262_144)
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32_768)
    ap.add_argument("--try-inflight2", action="store_true")
    args = ap.parse_args()

    import jax

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io import sam_native
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.cigar import cigars_nm_fast
    from urmap_tpu.map.pipeline import Mapper, revcomp_strand_codes

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    t0 = time.monotonic()
    gseq = rng.integers(0, 4, size=glen).astype(np.uint8)
    db = SeqDB.from_seqs(["chr1"], [gseq])
    t_synth = time.monotonic() - t0
    t0 = time.monotonic()
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    index = build_index(db, icfg, backend="host")
    t_build = time.monotonic() - t0
    print(f"# synth {t_synth:.1f}s  host-build {t_build:.1f}s", flush=True)

    mcfg = MapConfig(max_read_len=args.read_len, batch_size=args.batch)
    t0 = time.monotonic()
    mapper = Mapper(index, mcfg)
    print(f"# tables+jit setup {time.monotonic() - t0:.1f}s", flush=True)

    codes, truth_pos, _ = synth_reads(rng, db, args.reads, args.read_len)
    lengths = np.full(args.reads, args.read_len, np.int32)

    t0 = time.monotonic()
    res = mapper.map_codes(codes[: args.batch], lengths[: args.batch])
    print(f"# warmup(compile) {time.monotonic() - t0:.1f}s  "
          f"mapped {res.mapped.mean():.4f}", flush=True)

    B = args.batch
    nb = args.reads // B

    def report(name, elapsed, extra=None):
        rps = args.reads / elapsed
        d = {"exp": name, "reads_per_sec": round(rps, 1),
             "ms_per_batch": round(1000 * elapsed / nb, 1)}
        if extra:
            d.update(extra)
        print(json.dumps(d), flush=True)

    # ---- A: device dispatch+sync only, serial (no host work) ----
    t0 = time.monotonic()
    t_disp = t_sync = 0.0
    for i in range(nb):
        td = time.monotonic()
        h = mapper.start_batch(codes[i * B:(i + 1) * B],
                               lengths[i * B:(i + 1) * B])
        t_disp += time.monotonic() - td
        td = time.monotonic()
        mapper.finish_batch(h, lengths[i * B:(i + 1) * B])
        t_sync += time.monotonic() - td
    report("A_serial_device_only", time.monotonic() - t0,
           {"dispatch_ms": round(1000 * t_disp / nb, 1),
            "sync_ms": round(1000 * t_sync / nb, 1)})

    # ---- B: depth-1 overlap (dispatch i+1 before syncing i), no format ----
    t0 = time.monotonic()
    pend = None
    for i in range(nb):
        h = mapper.start_batch(codes[i * B:(i + 1) * B],
                               lengths[i * B:(i + 1) * B])
        if pend is not None:
            mapper.finish_batch(*pend)
        pend = (h, lengths[:B])
    mapper.finish_batch(*pend)
    report("B_depth1_device_only", time.monotonic() - t0)

    # ---- C: full e2e serial (sync then format inline) ----
    sink = io.BytesIO()
    t0 = time.monotonic()
    t_fmt = 0.0
    for i in range(nb):
        h = mapper.start_batch(codes[i * B:(i + 1) * B],
                               lengths[i * B:(i + 1) * B])
        res = mapper.finish_batch(h, lengths[i * B:(i + 1) * B])
        tf = time.monotonic()
        sc_codes = revcomp_strand_codes(codes[i * B:(i + 1) * B], res)
        cig, nm, _sp = cigars_nm_fast(db.codes, sc_codes, res, mapper.sc)

        class _B:  # minimal batch shim for the formatter
            pass
        t_fmt += time.monotonic() - tf
    report("C_serial_sync_plus_cigars", time.monotonic() - t0,
           {"cigar_ms": round(1000 * t_fmt / nb, 1)})

    # ---- D: run_stream e2e with real batches (native reader + SAM) ----
    from urmap_tpu.io.fastq import FastqReader, PrefetchIterator
    from urmap_tpu.utils.stream import run_stream

    fq = "/tmp/sweep.fq"
    c2c = np.frombuffer(b"ACGTNN", np.uint8)
    qual = b"I" * args.read_len
    with open(fq, "wb") as f:
        f.write(b"".join(b"@r%d\n%s\n+\n%s\n"
                         % (i, c2c[codes[i]].tobytes(), qual)
                         for i in range(args.reads)))

    def run_e2e(workers, inflight):
        sink = io.BytesIO()

        def start(item):
            s, batch = item
            return mapper.start_batch(batch.codes, batch.lengths)

        def sync(item, h):
            return mapper.finish_batch(h, item[1].lengths)

        def fmt(item, res):
            s, batch = item
            sc_codes = revcomp_strand_codes(batch.codes, res)
            cig, nm, _sp = cigars_nm_fast(db.codes, sc_codes, res, mapper.sc)
            return sam_native.format_single_end(batch, res, cig, nm, db)

        def write(data):
            sink.write(data)

        def items():
            s = 0
            for b in PrefetchIterator(FastqReader(
                    fq, batch_size=B, max_read_len=args.read_len)):
                yield s, b
                s += len(b)

        t0 = time.monotonic()
        run_stream(items(), start, sync, fmt, write,
                   inflight=inflight, workers=workers)
        report(f"E2E_w{workers}_if{inflight}", time.monotonic() - t0,
               {"sam_mb": round(sink.tell() / 1e6, 1)})

    run_e2e(0, 1)
    run_e2e(2, 1)
    run_e2e(3, 1)
    if args.try_inflight2:
        run_e2e(2, 2)


if __name__ == "__main__":
    main()
