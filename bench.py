"""Headline benchmark: single-chip mapping throughput (reads/s).

No genome data exists in this environment (SURVEY.md §4.2), so the bench
synthesizes a random genome, builds the UFI index, plants 150 bp reads
(with SNPs) and measures end-to-end mapping throughput — device pipeline
(seed→vote→DP→select) plus host CIGAR + SAM record formatting, i.e. the
same work the reference's ``-map`` command does per read.

Default invocation runs BOTH the SE and PE benchmarks and prints one JSON
line per mode, PE LAST (BASELINE.json's north-star metric is PE reads/s;
the driver parses the final line). Each mode times ``--passes`` (default
3) full passes over the read set and reports the MEDIAN — the axon relay
has ±2x noisy days (BASELINE.md round-2-cont-2) and a single pass is a
coin flip. Diagnostics recorded per mode so a flat capture is
attributable post hoc:

  - ``kernel_preflight``: numerics outcome of the seed/vote/DP Pallas
    kernels vs their jnp twins ON THIS DEVICE (kernels/preflight.py —
    runs at Mapper init on every TPU run, catching the silent-wrong-
    lowering class of 9a0c76c);
  - ``kernels_active``: which Pallas kernels actually dispatched;
  - ``pass_rps``: every pass's rate (spread == relay noise);
  - ``batch_ms_p10/p50/p90``: steady-state per-batch completion deltas
    within the median pass (host-bound vs device-bound signature);
  - ``warmup_rps``: the untimed warm pass's rate (relay ramp visibility).

``vs_baseline`` is measured against 1.0e6 reads/s — the order of URMAP's
published multi-core host throughput (Edgar 2020, PeerJ 8:e9338 reports
~10× BWA-MEM; exact table TODO in BASELINE.md since the reference mount
is empty).
"""

from __future__ import annotations

import argparse
import io
import itertools
import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: first-ever compile of the sort/map
# programs is minutes on the experimental axon platform; subsequent runs
# must not pay it again.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

BASELINE_READS_PER_SEC = 1.0e6

# Set in main() when the TPU probe fails and the bench runs on CPU.
CPU_FALLBACK = False


def plant_indels(rng, codes, pos, db, length, frac, max_sz=8):
    """Replace ~``frac`` of rows IN PLACE with reads carrying one 1 to
    ``max_sz`` bp insertion or deletion (tools/accuracy.py's profile),
    so the bench exercises the DP bucket + gapped-CIGAR path under load
    (round-3 verdict weak item 5: SNP-only reads never left the
    ungapped lane). The truth coordinate — the LEFTMOST aligned genome
    base — is unchanged by construction: reads keep genome bases
    [pos, pos+m) before the event, then either skip ``s`` genome bases
    (deletion) or carry ``s`` random inserted bases."""
    n, start = codes.shape[0], int(db.starts[0])
    ref_end = start + int(db.lengths[0])
    ok = pos <= ref_end - length - max_sz - 1   # deletion tail in range
    sel = np.nonzero((rng.random(n) < frac) & ok)[0]
    if sel.size == 0:
        return
    k = sel.size
    m = rng.integers(24, length - 24 - max_sz, size=k)[:, None]
    s = rng.integers(1, max_sz + 1, size=k)[:, None]
    isdel = rng.random(k)[:, None] < 0.5
    j = np.arange(length)[None, :]
    p = pos[sel, None]
    didx = p + j + np.where(j >= m, s, 0)          # skip s genome bases
    iidx = p + j - np.clip(j - m, 0, s)            # repeat frame after m
    new = db.codes[np.where(isdel, didx, iidx)]
    insmask = ~isdel & (j >= m) & (j < m + s)
    rnd = rng.integers(0, 4, size=new.shape).astype(new.dtype)
    codes[sel] = np.where(insmask, rnd, new)


def synth_reads(rng, db, n, length, snp_rate=0.01, indel_frac=0.0):
    """Vectorized planted reads: codes uint8[n, length], truth positions."""
    from urmap_tpu import alphabet

    ref_len = int(db.lengths[0])
    start = int(db.starts[0])
    pos = rng.integers(0, ref_len - length, size=n).astype(np.int64) + start
    idx = pos[:, None] + np.arange(length)[None, :]
    codes = db.codes[idx].copy()
    if indel_frac > 0:
        plant_indels(rng, codes, pos, db, length, indel_frac)
    # SNPs
    mask = rng.random(codes.shape) < snp_rate
    codes[mask] = (codes[mask] + rng.integers(1, 4, size=int(mask.sum()))) % 4
    # strands
    strand = rng.integers(0, 2, size=n).astype(np.int8)
    rc = alphabet.COMP_CODE[codes[:, ::-1]]
    codes = np.where(strand[:, None] == 1, rc, codes)
    return codes.astype(np.uint8), pos, strand


def synth_pairs(rng, db, n_pairs, length, snp_rate=0.01,
                frag_lo=200, frag_hi=800, indel_frac=0.0):
    """Vectorized FR pairs: (r1 codes, r2 codes, truth pos per mate)."""
    from urmap_tpu import alphabet

    ref_len = int(db.lengths[0])
    start = int(db.starts[0])
    frag = rng.integers(frag_lo, frag_hi, size=n_pairs).astype(np.int64)
    p = rng.integers(0, ref_len - frag_hi - 8, size=n_pairs).astype(np.int64) \
        + start
    li = p[:, None] + np.arange(length)[None, :]
    ri = (p + frag - length)[:, None] + np.arange(length)[None, :]
    left = db.codes[li].copy()
    right = db.codes[ri].copy()
    if indel_frac > 0:
        plant_indels(rng, left, p, db, length, indel_frac)
        plant_indels(rng, right, p + frag - length, db, length, indel_frac)
    for c in (left, right):
        mask = rng.random(c.shape) < snp_rate
        c[mask] = (c[mask] + rng.integers(1, 4, size=int(mask.sum()))) % 4
    # R1 = fwd fragment start, R2 = rc of fragment end (FR), half swapped
    r1_fwd = rng.integers(0, 2, size=n_pairs).astype(bool)
    right_rc = alphabet.COMP_CODE[right[:, ::-1]]
    r1 = np.where(r1_fwd[:, None], left, right_rc).astype(np.uint8)
    r2 = np.where(r1_fwd[:, None], right_rc, left).astype(np.uint8)
    t1 = np.where(r1_fwd, p, p + frag - length)
    t2 = np.where(r1_fwd, p + frag - length, p)
    return r1, r2, t1, t2


def write_fastq(path, codes, read_len, name_prefix=b"r"):
    code_to_char = np.frombuffer(b"ACGTNN", np.uint8)
    qual_row = b"I" * read_len
    with open(path, "wb") as f:
        chunk = []
        for i in range(len(codes)):
            chunk.append(b"@%s%d\n%s\n+\n%s\n"
                         % (name_prefix, i, code_to_char[codes[i]].tobytes(),
                            qual_row))
            if len(chunk) == 50000:
                f.write(b"".join(chunk)); chunk = []
        f.write(b"".join(chunk))


def kernel_diag():
    """Preflight outcome + which Pallas kernels are active (post-hatch)."""
    from urmap_tpu.kernels.preflight import last_result

    active = {n: os.environ.get(f"URMAP_NO_{n.upper()}_KERNEL") != "1"
              for n in ("seed", "vote", "dp")}
    return {"kernel_preflight": last_result(), "kernels_active": active}


def timed_passes(make_items, start, sync, fmt, write, *, passes, inflight,
                 workers, warm_batches=8):
    """Warm pass (untimed rate recorded) + N timed passes.

    Returns (per-pass elapsed list, warmup stats, batch completion
    timestamp list for each pass). ``write`` must reset its own counters
    when called with None (pass boundary marker).
    """
    from urmap_tpu.utils.stream import run_stream

    tw0 = time.monotonic()
    n_warm = 0

    def _warm_write(out):
        nonlocal n_warm
        n_warm += 1

    run_stream(itertools.islice(make_items(), warm_batches), start, sync,
               fmt, _warm_write, inflight=inflight, workers=workers)
    warm_s = time.monotonic() - tw0

    elapsed, stamps_all = [], []
    for _ in range(passes):
        write(None)  # reset counters
        stamps = []

        def _write(out, _stamps=stamps):
            write(out)
            _stamps.append(time.monotonic())

        t0 = time.monotonic()
        run_stream(make_items(), start, sync, fmt, _write,
                   inflight=inflight, workers=workers)
        elapsed.append(time.monotonic() - t0)
        stamps_all.append(stamps)
    return elapsed, (warm_s, n_warm), stamps_all


def stall_diag(diag):
    """Per-batch sync-wait vs feed-gap percentiles across ALL passes —
    attributes a mid-pass rate dip (round-3 PE weak item: 317.7k pass
    with batch p90 254.5 ms) to the device/relay (sync spikes) or the
    host feed path (feed spikes without sync spikes)."""
    out = {}
    for k, v in diag.items():
        if len(v) >= 3:
            a = np.asarray(v)
            out[f"{k}_p50"] = round(float(np.percentile(a, 50)), 1)
            out[f"{k}_p90"] = round(float(np.percentile(a, 90)), 1)
            out[f"{k}_max"] = round(float(a.max()), 1)
    return out


def batch_percentiles(stamps):
    """Steady-state per-batch ms p10/p50/p90 from completion stamps."""
    if len(stamps) < 3:
        return None
    d = np.diff(np.asarray(stamps)) * 1e3
    return {"batch_ms_p10": round(float(np.percentile(d, 10)), 1),
            "batch_ms_p50": round(float(np.percentile(d, 50)), 1),
            "batch_ms_p90": round(float(np.percentile(d, 90)), 1)}


def emit(metric, total_reads, elapsed_list, warm, stamps_all, extra, args,
         dev):
    med = float(np.median(elapsed_list))
    rps = total_reads / med
    warm_s, n_warm = warm
    warm_reads = min(8 * args.batch, total_reads)
    rec = {
        "metric": metric + ("_CPU_FALLBACK" if CPU_FALLBACK else ""),
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 4),
        "device": str(dev),
        "cpu_fallback": CPU_FALLBACK,
        "reads": total_reads,
        "genome_mbp": args.genome_mbp,
        "passes": len(elapsed_list),
        "pass_rps": [round(total_reads / e, 1) for e in elapsed_list],
        "warmup_rps": round(warm_reads / warm_s, 1) if warm_s > 0 else None,
        "map_s": round(med, 2),
        "sam_formatting": not args.no_sam,
        "read_seed": getattr(args, "read_seed", None),
    }
    med_i = int(np.argsort(elapsed_list)[len(elapsed_list) // 2])
    pct = batch_percentiles(stamps_all[med_i])
    if pct:
        rec.update(pct)
    # per-pass p50/p90 pairs: a pass-to-pass rate spread with FLAT p50s
    # and moving p90s = a few relay/host spikes, not a workload shift
    # (the PE-spread attribution, round-4 verdict weak item 4)
    rec["pass_batch_ms"] = [
        [p["batch_ms_p50"], p["batch_ms_p90"]]
        for p in (batch_percentiles(s) for s in stamps_all) if p]
    rec.update(extra)
    rec.update(kernel_diag())
    print(json.dumps(rec))
    return rec


def run_single(args, db, mapper, rng, t_index, dev):
    """SE bench → JSON record.

    Every pass maps a DIFFERENT permutation of the read set from its own
    FASTQ file: the axon relay deduplicates identical (program, input)
    re-executions, so re-timing the same batches would read fake-fast
    (.claude/skills/verify gotchas). The permutations keep the work
    identical while making every batch's bytes unique."""
    from urmap_tpu.io import sam as samio
    from urmap_tpu.io import sam_native
    from urmap_tpu.io.fastq import FastqReader, PrefetchIterator
    from urmap_tpu.map.cigar import cigars_for_result, cigars_nm_blob
    from urmap_tpu.map.pipeline import revcomp_strand_codes

    codes, truth_pos, _ = synth_reads(rng, db, args.reads, args.read_len,
                                      indel_frac=args.indel_frac)
    lengths = np.full(args.reads, args.read_len, np.int32)

    # warmup / compile
    wb = min(args.batch, args.reads)
    mapper.map_codes(codes[:wb], lengths[:wb])

    use_native = sam_native.available()
    # materialize real FASTQs (untimed) — the timed loop drives the
    # actual product path: native parser → device map → native SAM.
    # File 0 feeds the warm pass; files 1..passes feed the timed passes
    # (each a distinct permutation — see docstring).
    n_files = args.passes + 1
    fq_paths, truths = [], []
    for i in range(n_files):
        perm = rng.permutation(args.reads)
        path = f"/tmp/urmap_bench_se{i}.fq"
        write_fastq(path, codes[perm], args.read_len)
        fq_paths.append(path)
        truths.append(truth_pos[perm])
    cur = {"truth": truths[0]}

    sink = io.BytesIO()
    stats = {"mapped": 0, "correct": 0}

    diag = {"sync_ms": [], "feed_ms": []}

    def start(item):
        _s, batch, pk = item
        return mapper.start_batch(batch.codes, batch.lengths, prepacked=pk)

    def sync(item, handle):
        _s, batch, _pk = item
        t0 = time.monotonic()
        r = mapper.finish_batch(handle, batch.lengths)
        diag["sync_ms"].append((time.monotonic() - t0) * 1e3)
        return r

    def fmt(item, res):
        s, batch, _pk = item
        st = (int(res.mapped.sum()),
              int(((res.pos == cur["truth"][s : s + len(batch)])
                   & res.mapped).sum()))
        if args.no_sam:
            return None, st
        if use_native:
            blob, off, nm, _sp = cigars_nm_blob(db.codes, batch.codes,
                                                res, mapper.sc,
                                                clip_rows=res.clipped)
            return sam_native.format_single_end(batch, res, (blob, off),
                                                nm, db), st
        strand_codes = revcomp_strand_codes(batch.codes, res)
        cigars, nms = cigars_for_result(db.codes, strand_codes, res,
                                        mapper.sc)
        return ("\n".join(samio.records_single_end(
            batch, res, cigars, nms, db)) + "\n").encode(), st

    def write(out):
        if out is None:  # pass boundary: reset
            stats["mapped"] = stats["correct"] = 0
            sink.seek(0); sink.truncate()
            return
        data, (m, c) = out
        stats["mapped"] += m; stats["correct"] += c
        if data is not None:
            sink.write(data)

    pass_no = {"i": 0}

    def items():
        i = pass_no["i"]
        pass_no["i"] = min(i + 1, n_files - 1)
        cur["truth"] = truths[i]
        s = 0
        # upload prep (pad + pack) rides the prefetch thread, off the
        # dispatch critical path (tools/bench_e2e_phases.py)
        reader = FastqReader(fq_paths[i], batch_size=args.batch,
                             max_read_len=args.read_len)
        pf = PrefetchIterator(
            reader, transform=lambda b: (b, mapper.prepack(b.codes,
                                                           b.lengths)))
        t0 = time.monotonic()
        for batch, pk in pf:
            # gap between our yield returning and the next item pull =
            # drain-loop body + prefetch-queue wait; spikes here WITHOUT
            # matching sync_ms spikes = host/feed stall, not the device
            diag["feed_ms"].append((time.monotonic() - t0) * 1e3)
            yield s, batch, pk
            t0 = time.monotonic()
            s += len(batch)

    elapsed, warm, stamps = timed_passes(
        items, start, sync, fmt, write, passes=args.passes,
        inflight=args.inflight, workers=args.workers)
    return emit(
        "map_reads_per_sec_150bp_se", args.reads, elapsed, warm, stamps,
        {"mapped_frac": round(stats["mapped"] / args.reads, 4),
         "correct_frac": round(stats["correct"] / args.reads, 4),
         "index_build_s": round(t_index, 2), **stall_diag(diag)},
        args, dev)


def run_paired(args, db, mapper, rng, t_index, dev, se_rec=None):
    """PE bench → JSON record (printed LAST: the north-star metric)."""
    from urmap_tpu.io import sam_native
    from urmap_tpu.io.fastq import FastqReader, PrefetchIterator
    from urmap_tpu.map.cigar import cigars_nm_blob
    from urmap_tpu.map.pair import PairedMapper

    n_pairs = args.reads // 2
    r1, r2, t1, t2 = synth_pairs(rng, db, n_pairs, args.read_len,
                                 indel_frac=args.indel_frac)
    # one permutation of the pair set per pass — the relay dedups
    # identical re-executions (see run_single docstring)
    n_files = args.passes + 1
    paths, truths = [], []
    for i in range(n_files):
        perm = rng.permutation(n_pairs)
        pa = (f"/tmp/urmap_bench_r1_{i}.fq", f"/tmp/urmap_bench_r2_{i}.fq")
        write_fastq(pa[0], r1[perm], args.read_len, b"p")
        write_fastq(pa[1], r2[perm], args.read_len, b"p")
        paths.append(pa)
        truths.append((t1[perm], t2[perm]))
    cur = {"t": truths[0]}

    pm = PairedMapper(mapper)
    # warmup / compile (pair batches are half the read batch)
    wb = min(pm.pair_batch, n_pairs)
    ln = np.full(wb, args.read_len, np.int32)
    pm.finish_batch(pm.start_batch(r1[:wb], ln, r2[:wb], ln), ln, ln)

    sink = io.BytesIO()
    stats = {"mapped": 0, "correct": 0, "proper": 0}

    diag = {"sync_ms": [], "feed_ms": []}

    def start(item):
        _s, b1, b2, pk = item
        return pm.start_batch(b1.codes, b1.lengths, b2.codes, b2.lengths,
                              prepacked=pk)

    def sync(item, handle):
        _s, b1, b2, _pk = item
        t0 = time.monotonic()
        r = pm.finish_batch(handle, b1.lengths, b2.lengths)
        diag["sync_ms"].append((time.monotonic() - t0) * 1e3)
        return r

    def fmt(item, res):
        s, b1, b2, _pk = item
        n = len(b1)
        ct1, ct2 = cur["t"]
        st = (
            int(res.m1.mapped.sum()) + int(res.m2.mapped.sum()),
            int(res.proper.sum()),
            int(((res.m1.pos == ct1[s:s + n]) & res.m1.mapped).sum())
            + int(((res.m2.pos == ct2[s:s + n]) & res.m2.mapped).sum()))
        if args.no_sam:
            return None, st
        b1b, o1, e1, sp1 = cigars_nm_blob(db.codes, b1.codes, res.m1,
                                          pm.sc, clip_rows=res.m1.clipped)
        b2b, o2, e2, sp2 = cigars_nm_blob(db.codes, b2.codes, res.m2,
                                          pm.sc, clip_rows=res.m2.clipped)
        return sam_native.format_paired(
            b1, b2, res, (b1b, o1), e1, sp1, (b2b, o2), e2, sp2, db), st

    def write(out):
        if out is None:
            stats["mapped"] = stats["correct"] = stats["proper"] = 0
            sink.seek(0); sink.truncate()
            return
        data, (m, p, c) = out
        stats["mapped"] += m; stats["proper"] += p; stats["correct"] += c
        if data is not None:
            sink.write(data)

    pass_no = {"i": 0}

    def items():
        i = pass_no["i"]
        pass_no["i"] = min(i + 1, n_files - 1)
        cur["t"] = truths[i]
        s = 0
        reader = FastqReader(paths[i][0], paths[i][1],
                             batch_size=max(args.batch // 2, 1),
                             max_read_len=args.read_len)
        pf = PrefetchIterator(
            reader,
            transform=lambda p: (p, pm.prepack(p[0].codes, p[0].lengths,
                                               p[1].codes, p[1].lengths)))
        t0 = time.monotonic()
        for (b1, b2), pk in pf:
            diag["feed_ms"].append((time.monotonic() - t0) * 1e3)
            yield s, b1, b2, pk
            t0 = time.monotonic()
            s += len(b1)

    elapsed, warm, stamps = timed_passes(
        items, start, sync, fmt, write, passes=args.passes,
        inflight=args.inflight, workers=args.workers)
    total_reads = 2 * n_pairs
    extra = {"mapped_frac": round(stats["mapped"] / total_reads, 4),
             "correct_frac": round(stats["correct"] / total_reads, 4),
             "proper_frac": round(stats["proper"] / n_pairs, 4),
             "index_build_s": round(t_index, 2), **stall_diag(diag)}
    if se_rec is not None:
        extra["se_reads_per_sec"] = se_rec["value"]
        extra["se_correct_frac"] = se_rec["correct_frac"]
    return emit("map_reads_per_sec_150bp_pe", total_reads, elapsed, warm,
                stamps, extra, args, dev)


def check_kernel_full(args, mcfg, icfg, dev):
    """Opt-in: production-shape Pallas-vs-jnp parity on device (the
    always-on preflight covers tiny shapes; this covers read_len/band)."""
    import jax.numpy as jnp

    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.config import ScoreConfig
    from urmap_tpu.kernels.banded_dp import pallas_from_windows
    from urmap_tpu.kernels.seed_slots import seed_slots_words_pallas
    from urmap_tpu.kernels.vote import vote_pallas
    from urmap_tpu.map.dp import banded_from_windows
    from urmap_tpu.map.seed import (SENTINEL, extract_seed_slots_words,
                                    vote_top_candidates)

    sc = ScoreConfig()
    hw = mcfg.band_halfwidth
    ck_rng = np.random.default_rng(1)
    wlen = args.read_len + 2 * hw
    kw = ck_rng.integers(0, 5, size=(2048, wlen)).astype(np.uint8)
    kr = ck_rng.integers(0, 4, size=(2048, args.read_len)).astype(np.uint8)
    kr[:512] = kw[:512, hw : hw + args.read_len]  # planted matches
    kl = ck_rng.integers(30, args.read_len + 1, size=2048).astype(np.int32)
    for clip in (None, sc.clip_open):
        s_p, d_p, e_p, _u = pallas_from_windows(
            jnp.asarray(kw), jnp.asarray(kr), jnp.asarray(kl),
            hw=hw, sc=sc, clip_open=clip)
        s_j, d_j, e_j = banded_from_windows(
            jnp.asarray(kw), jnp.asarray(kr), jnp.asarray(kl),
            hw=hw, sc=sc, clip_open=clip)
        if not (np.array_equal(np.asarray(s_p), np.asarray(s_j))
                and np.array_equal(np.asarray(d_p), np.asarray(d_j))
                and np.array_equal(np.asarray(e_p), np.asarray(e_j))):
            print(json.dumps({"metric": "kernel_parity",
                              "value": 0, "clip": clip is not None}))
            return False

    sreads = ck_rng.integers(0, 4, size=(2048, args.read_len)) \
        .astype(np.uint8)
    sreads[ck_rng.random(sreads.shape) < 0.02] = 5
    slens = ck_rng.integers(0, args.read_len + 1, size=2048).astype(np.int32)
    sreads[np.arange(args.read_len)[None, :] >= slens[:, None]] = 5
    s_nw = -(-args.read_len // 16)
    s_rp, s_rn = gpk.pack_reads(jnp.asarray(sreads), jnp.asarray(slens),
                                s_nw)
    s_k, o_k, v_k = seed_slots_words_pallas(
        s_rp, s_rn, jnp.asarray(slens), args.read_len, k=icfg.k, q=8,
        slot_bits=icfg.slot_bits)
    s_j2, o_j2, v_j2 = extract_seed_slots_words(
        s_rp, s_rn, jnp.asarray(slens), args.read_len, k=icfg.k, q=8,
        slot_bits=icfg.slot_bits)
    vm = np.asarray(v_j2)
    cands = ck_rng.integers(-(1 << 30), 1 << 28, size=(2048, 128)) \
        .astype(np.int32)
    cands[ck_rng.random(cands.shape) < 0.5] = SENTINEL
    tc_k, tv_k = vote_pallas(jnp.asarray(cands), v=8)
    tc_j, tv_j = vote_top_candidates(jnp.asarray(cands), v=8)
    if not (np.array_equal(vm, np.asarray(v_k))
            and np.array_equal(np.asarray(o_j2), np.asarray(o_k))
            and np.array_equal(np.asarray(s_j2)[vm], np.asarray(s_k)[vm])
            and np.array_equal(np.asarray(tc_j), np.asarray(tc_k))
            and np.array_equal(np.asarray(tv_j), np.asarray(tv_k))):
        print(json.dumps({"metric": "kernel_parity", "value": 0,
                          "which": "seed/vote"}))
        return False
    print(f"# kernel parity ok on {dev} (dp/seed/vote)", file=sys.stderr)
    return True


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_048_576)
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=65_536,
                    help="read batch per device step. 65k measured "
                         "382.8k vs 356.6k reads/s at 32k on v5e "
                         "(round-3: the round-2 65k e2e collapse was "
                         "host-side and is fixed; per-batch p50 scales "
                         "near-linearly, 155.7 vs 87.1 ms)")
    ap.add_argument("--passes", type=int, default=3,
                    help="timed full passes per mode; the MEDIAN is "
                         "reported (relay noise is ±2x on bad days)")
    ap.add_argument("--seed", type=int, default=-1,
                    help="read-sampling seed; -1 (default) salts from "
                         "the clock so repeated bench runs never re-send "
                         "identical batches (the axon relay DEDUPLICATES "
                         "identical executions — a fixed seed would read "
                         "fake-fast on the second run). The genome/index "
                         "stay seed-0 (compile/prepared caches keyed on "
                         "them).")
    ap.add_argument("--mode", choices=("both", "se", "pe"), default="both",
                    help="both (default) prints SE then PE (the driver "
                         "parses the LAST line; BASELINE.json's metric "
                         "is PE)")
    ap.add_argument("--indel-frac", type=float, default=0.08,
                    help="fraction of reads carrying one 1-8 bp "
                         "insertion or deletion (accuracy.py's profile) "
                         "so the headline number exercises the DP "
                         "bucket + gapped-CIGAR path and correct_frac "
                         "verifies positions under gaps (round-3 "
                         "verdict weak item 5)")
    ap.add_argument("--no-sam", action="store_true",
                    help="skip host CIGAR/SAM formatting (device-only rate)")
    ap.add_argument("--paired", action="store_true",
                    help="alias for --mode pe (back-compat)")
    ap.add_argument("--inflight", type=int, default=2,
                    help="device batches outstanding beyond the one "
                         "being synced. 2 measured SE 430.1k vs 366.0k "
                         "(+17%%) and PE 404.4k vs 396.6k reads/s in "
                         "round 3, stable across 3-pass runs in rounds "
                         "2 and 3; the one inflight>1 hang on record "
                         "(round 1) never reproduced. The CLI keeps "
                         "its conservative default of 1.")
    ap.add_argument("--check-kernel", action="store_true",
                    help="production-shape Pallas==jnp device parity "
                         "before timing (the always-on preflight already "
                         "verifies numerics on tiny shapes; this adds "
                         "read-len/band-shape coverage at extra compile "
                         "cost)")
    ap.add_argument("--workers", type=int, default=1,
                    help="host formatting worker threads (1 lets the "
                         "next execute overlap host formatting: 110k -> "
                         "~190k reads/s on the axon relay with the "
                         "all-native CIGAR path; 0 = inline)")
    args = ap.parse_args(argv)
    if args.paired:
        args.mode = "pe"

    # The axon relay can wedge so that EVERY client (even bare
    # jax.devices()) hangs forever in recv (round-2 incident, NOTES_NEXT
    # _ROUND.md). Probe device acquisition in a child with a timeout so
    # a driver-run bench records an honest CPU-fallback number instead
    # of hanging the round.
    if os.environ.get("JAX_PLATFORMS", "").lower() not in ("cpu",):
        import subprocess

        probe_s = float(os.environ.get("URMAP_BENCH_PROBE_TIMEOUT", "300"))
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_s, check=True, capture_output=True)
            tpu_ok = True
        except (subprocess.SubprocessError, OSError) as e:
            tpu_ok = False
            print(f"bench: device probe failed ({type(e).__name__}); "
                  "falling back to CPU — numbers are NOT chip numbers",
                  file=sys.stderr)
    else:
        tpu_ok = True

    import jax

    if not tpu_ok:
        global CPU_FALLBACK
        CPU_FALLBACK = True
        jax.config.update("jax_platforms", "cpu")

    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import Mapper

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)           # genome/index: stable
    read_seed = (args.seed if args.seed >= 0
                 else time.time_ns() % (1 << 62))
    args.read_seed = read_seed   # recorded in the JSON for repro
    read_rng = np.random.default_rng(read_seed)
    glen = int(args.genome_mbp * 1e6)

    t0 = time.monotonic()
    gseq = rng.integers(0, 4, size=glen).astype(np.uint8)
    db = SeqDB.from_seqs(["chr1"], [gseq])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    # host build: bit-identical to the device build, and this platform's
    # remote XLA compiles are uncached — don't pay the sort compile on
    # every bench run (the map program is the headline)
    index = build_index(db, icfg, backend="host")
    t_index = time.monotonic() - t0

    mcfg = MapConfig(max_read_len=args.read_len, batch_size=args.batch)
    mapper = Mapper(index, mcfg)  # runs the kernel preflight on TPU

    if args.check_kernel and not check_kernel_full(args, mcfg, icfg, dev):
        return 1

    se_rec = None
    if args.mode in ("both", "se"):
        se_rec = run_single(args, db, mapper, read_rng, t_index, dev)
    if args.mode in ("both", "pe"):
        run_paired(args, db, mapper, read_rng, t_index, dev, se_rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
