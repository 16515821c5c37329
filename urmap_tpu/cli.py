"""Command-line interface, mirroring the reference mapper's flag surface.

Reference CLI (SURVEY.md §2.1, [RECALL] — single-dash declarative flags):

    urmap -make_ufi genome.fa -output genome.ufi [-wordlength 24] [-veryfast]
    urmap -map R1.fq -ufi genome.ufi -samout out.sam [-reverse R2.fq]
          [-threads N] [-log file]

We accept the same single-dash spelling:

    python -m urmap_tpu -make_ufi genome.fa -output genome.ufi
    python -m urmap_tpu -map R1.fq -ufi genome.ufi -samout out.sam

-threads is accepted for script compatibility; device batching replaces
host thread fan-out (the TPU pipeline is data-parallel by construction),
so it only sizes the host IO prefetch.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from urmap_tpu import __version__
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.utils import MetricsLogger, Progress

USAGE = """urmap-tpu v{v} — TPU-native short-read mapper

Index build:
  python -m urmap_tpu -make_ufi <genome.fa> -output <genome.ufi>
      [-wordlength K] [-slot_bits B] [-maxpos N] [-veryfast]
      [-device_build]  (XLA sort pipeline instead of the C++ host build)

Mapping:
  python -m urmap_tpu -map <reads.fq> -ufi <genome.ufi> -samout <out.sam>
      (.gz input and .sam.gz output supported)
      [-reverse <reads2.fq>] [-threads N] [-batch B] [-maxreadlen L]
      [-inflight D] [-endclip] [-selfcheck] [-log <file>]
      [-metrics <file.jsonl>] [-quiet] [-resume] [-profile <dir>]
      [-mesh DxI|auto] [-route a2a|psum] [-secondpass P]

-mesh shards the UFI tables by hash-slot range over a DATAxINDEX device
mesh (dist/sharded.py) — for indexes larger than one chip's HBM, or to
scale the map step over a multi-chip host. "-mesh auto" engages all
local devices when the prepared tables exceed the per-device memory
budget (URMAP_DEVICE_MEM_GB, default 16). -route picks the cross-shard
seed-lookup collective (a2a = all_to_all query routing, default).

Multi-host: launch the same -map command on every host of the slice
(JAX_COORDINATOR_ADDRESS set). Without -mesh, batches round-robin by
rank (data parallel); with -mesh, the mesh spans the GLOBAL device set
— the index shards across all hosts' devices and each host writes the
rows its devices own. Shards merge deterministically on rank 0.
-resume restarts a run from the last durable batch watermark.

Index inspection:
  python -m urmap_tpu -ufistats <genome.ufi>

Other: -version, -help
"""

# flag → (has_value, description)
_FLAGS = {
    "make_ufi": True, "output": True, "wordlength": True, "slot_bits": True,
    "maxpos": True, "veryfast": False, "device_build": False,
    "ufistats": True,
    "map": True, "ufi": True, "samout": True, "reverse": True,
    "threads": True, "batch": True, "maxreadlen": True, "resume": False,
    "inflight": True, "endclip": False, "selfcheck": False,
    "mesh": True, "route": True, "secondpass": True,
    "log": True, "metrics": True, "quiet": False, "profile": True,
    "version": False, "help": False,
}


def parse_args(argv: list[str]) -> dict:
    opts: dict[str, object] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("-"):
            raise SystemExit(f"unexpected argument {tok!r} (see -help)")
        name = tok.lstrip("-")
        if name not in _FLAGS:
            raise SystemExit(f"unknown option {tok!r} (see -help)")
        if _FLAGS[name]:
            if i + 1 >= len(argv):
                raise SystemExit(f"option {tok} requires a value")
            opts[name] = argv[i + 1]
            i += 2
        else:
            opts[name] = True
            i += 1
    return opts


def cmd_make_ufi(opts: dict) -> int:
    from urmap_tpu.index import build_index
    from urmap_tpu.io import SeqDB

    fasta = str(opts["make_ufi"])
    out = opts.get("output")
    if not out:
        raise SystemExit("-make_ufi requires -output <index dir>")
    t0 = time.monotonic()
    print(f"urmap-tpu v{__version__}: building index for {fasta}", file=sys.stderr)
    db = SeqDB.from_fasta(fasta)
    kw = {}
    if "wordlength" in opts:
        kw["k"] = int(str(opts["wordlength"]))
    if "slot_bits" in opts:
        kw["slot_bits"] = int(str(opts["slot_bits"]))
    else:
        kw["slot_bits"] = IndexConfig.auto_slot_bits(db.total_len)
        if opts.get("veryfast"):
            # -veryfast in the reference trades index size for speed
            # [RECALL]; here: 4x the slot space (shorter collision
            # chains) + a header flag cmd_map reads to narrow the
            # gathers (config.VERYFAST_MAP_OVERRIDES)
            kw["slot_bits"] = min(kw["slot_bits"] + 2, 30)
            kw["veryfast"] = True
    if "maxpos" in opts:
        kw["max_positions_per_slot"] = int(str(opts["maxpos"]))
    cfg = IndexConfig(**kw)
    # host backend by default: the multithreaded C++ build (3.1 Gbp in
    # ~5 min, BASELINE.md) beats shipping chunks through the device —
    # the reference also builds on the host CPU. -device_build opts in
    # to the XLA sort pipeline (bit-identical output).
    backend = "device" if opts.get("device_build") else "host"
    idx = build_index(db, cfg, backend=backend)
    idx.save(str(out))
    # map-ready tables alongside the raw CSR (reference parity: its
    # .ufi is load-and-go; without this a GRCh38-scale -map pays tens
    # of minutes of recap/align/pack prep at startup)
    from urmap_tpu.config import VERYFAST_MAP_OVERRIDES, MapConfig
    from urmap_tpu.index.store import save_prepared

    p_map = (VERYFAST_MAP_OVERRIDES["positions_per_seed"]
             if cfg.veryfast else MapConfig.positions_per_seed)
    save_prepared(idx, str(out), p_map)
    el = time.monotonic() - t0
    print(f"indexed {db.total_len:,} bases ({db.num_seqs} seqs) → "
          f"{idx.num_positions:,} positions, 2^{cfg.slot_bits} slots, "
          f"k={cfg.k} in {el:.1f}s", file=sys.stderr)
    return 0


def cmd_ufistats(opts: dict) -> int:
    """Index statistics: size, slot occupancy histogram, repeat load."""
    import numpy as np

    from urmap_tpu.index import UfiIndex

    index = UfiIndex.load(str(opts["ufistats"]))
    cfg = index.config
    counts = np.diff(index.offsets.astype(np.int64))
    occupied = int((counts > 0).sum())
    print(f"k={cfg.k} slots=2^{cfg.slot_bits} "
          f"cap={cfg.max_positions_per_slot}"
          + (" veryfast" if cfg.veryfast else ""))
    print(f"genome: {index.seqdb.total_len:,} bases, "
          f"{index.seqdb.num_seqs} sequences")
    print(f"positions: {index.num_positions:,} "
          f"({index.num_positions * 4 / 1e6:.1f} MB)")
    print(f"occupied slots: {occupied:,}/{cfg.num_slots:,} "
          f"({100.0 * occupied / cfg.num_slots:.1f}%)")
    print(f"mean load (occupied): {counts.sum() / max(occupied, 1):.2f}  "
          f"max load: {int(counts.max())}")
    print("load histogram:")
    for lo, hi in ((1, 1), (2, 3), (4, 7), (8, 15), (16, 63),
                   (64, 255), (256, 1 << 30)):
        n = int(((counts >= lo) & (counts <= hi)).sum())
        if n:
            label = f"{lo}" if lo == hi else f"{lo}-{hi if hi < 1 << 29 else 'inf'}"
            print(f"  {label:>9}: {n:,}")
    return 0


def _cig3(r):
    """cigars_nm_blob result → ((blob, offsets), nm, span) for the
    native formatter (available() guarantees r is not None)."""
    blob, off, nm, span = r
    return (blob, off), nm, span


def _table_bytes(index) -> int:
    """Approximate prepared-table footprint: positions (4 B) + offsets
    + the 2-bit packed genome planes. Huge tables take the row128
    layout whose offsets ride PACKED (2 B/slot —
    store.pack_offsets_row128), so the offsets term halves there."""
    import os

    budget = int(os.environ.get("URMAP_ROW128_BYTES", str(2 << 30)))
    row128 = (index.num_positions * 4 > budget
              and os.environ.get("URMAP_NO_PACKED_OFFSETS") != "1")
    return (index.num_positions * 4
            + index.config.num_slots * (2 if row128 else 4)
            + index.seqdb.total_len // 2)


def _auto_batch(opts: dict, index, mcfg, quiet: bool):
    """HBM-fit batch sizing: the per-batch relay fixed charge (~34 ms)
    makes bigger batches strictly better until the program temps
    (~11 KB/read after the round-5 lane_rotate aliasing fix — before
    it, the rotate kernel's tile-padding waste was 24 KB/read and
    GRCh38 PE 65536 overflowed by 98 MB) overflow HBM, so pick the
    LARGEST 8192-multiple that fits next to the tables. Measured at
    GRCh38/bits29 (14.3 GiB resident): PE batch 65536 runs 408k
    reads/s vs 364k at 49152 vs 282k at 32768, same relay session. An
    explicit -batch always wins; callers must use the RETURNED config
    (cmd_map re-reads mapper.mcfg for reader sizing)."""
    import os

    if "batch" in opts:
        return mcfg
    # XLA's usable HBM on a 16 GiB part is ~15.75 GiB; tables_to_device
    # adds ~0.7 GiB of runtime overhead beyond _table_bytes — keep a
    # 0.9 GiB margin off the nominal device size
    budget = ((float(os.environ.get("URMAP_DEVICE_MEM_GB", "16")) - 0.9)
              * 2**30)
    tbytes = _table_bytes(index)
    bs = mcfg.batch_size
    while bs > 8192 and tbytes + bs * 11_000 > budget:
        bs -= 8192
    if bs != mcfg.batch_size:
        import dataclasses

        if not quiet:
            print(f"auto batch {mcfg.batch_size} → {bs}: largest "
                  f"8192-multiple fitting next to {tbytes / 2**30:.1f} "
                  f"GiB of tables (-batch overrides)", file=sys.stderr)
        mcfg = dataclasses.replace(mcfg, batch_size=bs)
    return mcfg


def _make_mapper(opts: dict, index, mcfg, quiet: bool):
    """Single-device Mapper, or ShardedMapper when -mesh asks for (or
    "auto" decides on) hash-range index sharding over the local devices
    (SURVEY.md §2.13/§5.7: the model-parallel analog — indexes larger
    than one chip's HBM span the mesh). cmd_map re-reads mapper.mcfg
    (the auto-batch shrink may have replaced it)."""
    import os

    from urmap_tpu.map import Mapper

    spec = opts.get("mesh")
    if not spec:
        return Mapper(index, _auto_batch(opts, index, mcfg, quiet))
    import jax

    from urmap_tpu.dist import multihost as mh
    from urmap_tpu.dist.sharded import ShardedMapper, make_mesh

    # multi-host: the mesh spans the GLOBAL device set (every process
    # runs this same command); each process feeds the same replicated
    # batches and formats/writes only the rows its devices own
    # (ShardedMapper.finish_batch_local) — the rank-ordered shard merge
    # reassembles the complete SAM.
    spec = str(spec)
    ndev = len(jax.devices())
    mesh = None
    if spec == "auto":
        # prepared tables (positions + offsets, ~4 B each) + packed
        # genome vs a conservative fraction of per-device memory
        budget = (float(os.environ.get("URMAP_DEVICE_MEM_GB", "16"))
                  * 0.6 * 2**30)
        tbytes = _table_bytes(index)
        if ndev > 1 and tbytes > budget:
            mesh = make_mesh(ndev)
        elif not quiet:
            print(f"-mesh auto: single device "
                  f"({tbytes / 2**30:.1f} GiB tables, {ndev} devices)",
                  file=sys.stderr)
    elif "x" in spec:
        d, i = (int(t) for t in spec.split("x", 1))
        if d * i > ndev:
            raise SystemExit(f"-mesh {spec} needs {d * i} devices; "
                             f"{ndev} visible (CPU runs: set XLA_FLAGS="
                             f"--xla_force_host_platform_device_count=N)")
        if mh.process_count() > 1 and d * i != ndev:
            # a sub-global mesh would exclude some processes' devices
            # entirely — those ranks own zero output shards and
            # make_array_from_callback can't cover non-local devices
            # (round-3 advisor finding). Require a full-span mesh.
            raise SystemExit(
                f"-mesh {spec}: multi-host runs need the mesh to span "
                f"all {ndev} global devices (got {d * i})")
        mesh = make_mesh(d * i, data=d, index=i)
    else:
        n = int(spec)
        if n > ndev:
            raise SystemExit(f"-mesh {spec} needs {n} devices; "
                             f"{ndev} visible")
        if mh.process_count() > 1 and n != ndev:
            raise SystemExit(
                f"-mesh {spec}: multi-host runs need the mesh to span "
                f"all {ndev} global devices (got {n})")
        mesh = make_mesh(n)
    if mesh is None:
        # the single-device fallback needs the same HBM batch shrink
        return Mapper(index, _auto_batch(opts, index, mcfg, quiet))
    route = str(opts.get("route", "a2a"))
    if not quiet:
        print(f"sharded mesh: data={mesh.shape['data']} x "
              f"index={mesh.shape['index']} devices, route={route}",
              file=sys.stderr)
    return ShardedMapper(index, mesh, mcfg, route=route)


def cmd_map(opts: dict) -> int:
    # distributed init must precede ANY backend-initializing JAX call
    from urmap_tpu.dist import multihost as mh

    mh.maybe_init_distributed()

    from urmap_tpu.index import UfiIndex
    from urmap_tpu.io import FastqReader
    from urmap_tpu.io import sam as samio
    from urmap_tpu.io import sam_native
    from urmap_tpu.map import Mapper
    from urmap_tpu.map.cigar import cigars_for_result, cigars_nm_blob
    from urmap_tpu.map.pipeline import revcomp_strand_codes

    fq = str(opts["map"])
    ufi = opts.get("ufi")
    samout = opts.get("samout")
    if not ufi:
        raise SystemExit("-map requires -ufi <index dir>")
    if not samout:
        raise SystemExit("-map requires -samout <out.sam>")
    reverse = opts.get("reverse")
    quiet = bool(opts.get("quiet"))

    mkw = {}
    if "batch" in opts:
        mkw["batch_size"] = int(str(opts["batch"]))
    else:
        # production default: the relay charges ~34 ms FIXED per batch,
        # so the 2048-row library default caps e2e at ~70k reads/s;
        # 65536 amortizes it best (GRCh38 PE 408k vs 364k at 49152 vs
        # 282k at 32768, post lane_rotate-aliasing) and the HBM
        # auto-fit in _make_mapper steps down in 8192-multiples when
        # huge tables leave no headroom
        mkw["batch_size"] = 65536
    if "maxreadlen" in opts:
        mkw["max_read_len"] = int(str(opts["maxreadlen"]))
    if opts.get("endclip"):
        mkw["end_clip"] = True
    if "secondpass" in opts:
        # host-CPU wide-gather recovery of device-unmapped reads
        # (MapConfig.second_pass_p): recovers the recall an HBM-
        # constrained gather width sacrifices at GRCh38 scale
        mkw["second_pass_p"] = int(str(opts["secondpass"]))

    t0 = time.monotonic()
    index = UfiIndex.load(str(ufi))
    if index.config.veryfast:
        # -veryfast index: narrower gathers reach the same loci
        # (config.VERYFAST_MAP_OVERRIDES); explicit flags still win
        from urmap_tpu.config import VERYFAST_MAP_OVERRIDES

        for k_, v_ in VERYFAST_MAP_OVERRIDES.items():
            mkw.setdefault(k_, v_)
    mcfg = MapConfig(**mkw)
    if not quiet:
        print(f"urmap-tpu v{__version__}: loaded index "
              f"({index.num_positions:,} positions, k={index.config.k}) "
              f"in {time.monotonic() - t0:.1f}s", file=sys.stderr)

    mapper = _make_mapper(opts, index, mcfg, quiet)
    mcfg = mapper.mcfg   # the auto-batch shrink may have replaced it
    from urmap_tpu.dist.sharded import ShardedMapper as _SM
    # multi-host + -mesh: global mesh, replicated feeding, local-rows
    # finish (each rank writes only the rows its devices own)
    mesh_local_rows = isinstance(mapper, _SM) and mh.process_count() > 1
    metrics = MetricsLogger(str(opts["metrics"]) if "metrics" in opts else None)
    progress = Progress("reads") if not quiet else None
    cmdline = "urmap-tpu " + " ".join(sys.argv[1:])

    # Multi-host SPMD: every process runs this same command; batches are
    # round-robined by rank, each rank appends to its own watermarked
    # shard, and rank 0 merges in rank order (dist/multihost.py).
    rank, nproc = mh.process_index(), mh.process_count()
    resume = bool(opts.get("resume"))

    genome = index.seqdb.codes
    clip_open = mapper.sc.clip_open if mcfg.end_clip else None
    selfcheck = bool(opts.get("selfcheck"))

    def _selfcheck_batch(codes, res):
        """Debug-mode consistency audit (SURVEY.md §5.2): re-derive a
        sample of M-only calls on the host genome and compare with the
        device's bit-parallel ungapped scores. (Gapped calls are already
        audited on EVERY batch: the traceback asserts score equality.)"""
        from urmap_tpu.map.cigar import strand_codes_subset

        rows = np.nonzero(res.mapped & ~res.gapped)[0][:8]
        if rows.size == 0:
            return
        sub = strand_codes_subset(codes[rows],
                                  np.asarray(res.strand)[rows],
                                  np.asarray(res.lengths)[rows])
        for k, i in enumerate(rows):
            li = int(res.lengths[i])
            seg = genome[int(res.pos[i]) : int(res.pos[i]) + li]
            mm = int(np.sum(seg != sub[k][:li]))
            want = ((li - mm) * mapper.sc.match
                    + mm * mapper.sc.mismatch)
            got = int(res.ungapped[i])
            if got != want:
                raise AssertionError(
                    f"selfcheck: device ungapped {got} != host {want} "
                    f"(read row {i}, pos {int(res.pos[i])})")
    n_reads = n_mapped = 0
    t_map0 = time.monotonic()
    writer = mh.ShardWriter(str(samout), rank, resume=resume)
    if writer.skip_batches and not quiet:
        print(f"resuming: shard {rank} already has "
              f"{writer.skip_batches} batches ({writer.wm.reads:,} reads)",
              file=sys.stderr)
    from urmap_tpu.io.fastq import PrefetchIterator

    # multi-host input sharding: uncompressed inputs are split into
    # record-aligned byte ranges so each host parses ONLY its own slice.
    # Paired files are cut at the SAME records by mate-name search
    # (paired_fastq_byte_ranges); gzip can't seek, and an unlocatable
    # mate cut falls back to round-robin batches (every host parses all)
    byte_range = rev_byte_range = None
    if nproc > 1 and mesh_local_rows:
        pass   # every rank feeds every batch; rows split on the mesh
    elif nproc > 1 and not str(fq).endswith(".gz"):
        if reverse and not str(reverse).endswith(".gz"):
            pr = mh.paired_fastq_byte_ranges(fq, str(reverse), nproc)
            if pr is not None:
                byte_range, rev_byte_range = pr[0][rank], pr[1][rank]
        elif not reverse:
            byte_range = mh.fastq_byte_ranges(fq, nproc)[rank]
    # paired mode: half the pairs per batch — the paired device step
    # carries 2x the rows per pair (PairedMapper docstring)
    reader = FastqReader(fq, str(reverse) if reverse else None,
                         batch_size=(mcfg.batch_size // 2 if reverse
                                     else mcfg.batch_size),
                         max_read_len=mcfg.max_read_len,
                         byte_range=byte_range,
                         reverse_byte_range=rev_byte_range)
    native = reader.native and sam_native.available()
    # -threads N: host worker threads for the drain pool (reference
    # compat — its N maps threads over reads; our device does that part).
    # 0 = fully synchronous debug mode (no prefetch, no pool).
    n_threads = int(str(opts.get("threads", 2)))
    pmapper = None
    if reader.paired:
        from urmap_tpu.dist.sharded import (ShardedMapper,
                                            ShardedPairedMapper)
        from urmap_tpu.map.pair import PairedMapper
        pmapper = (ShardedPairedMapper(mapper)
                   if isinstance(mapper, ShardedMapper)
                   else PairedMapper(mapper))

    # upload prep (pad + 2-bit pack) runs on the PREFETCH thread — it is
    # pure host CPU and the dispatch thread is the e2e critical path
    # (tools/bench_e2e_phases.py). Items become (batch_item, prepacked).
    def _prepack(item):
        if pmapper is not None:
            fwd, rev = item
            return item, pmapper.prepack(fwd.codes, fwd.lengths,
                                         rev.codes, rev.lengths)
        return item, mapper.prepack(item.codes, item.lengths)

    batches = (PrefetchIterator(reader, transform=_prepack)
               if n_threads != 0 else ((it, None) for it in reader))

    def start_one(entry):
        """Async-dispatch one batch (or batch pair) to the device."""
        item, pk = entry
        if pmapper is not None:
            fwd, rev = item
            return pmapper.start_batch(fwd.codes, fwd.lengths,
                                       rev.codes, rev.lengths,
                                       prepacked=pk)
        return mapper.start_batch(item.codes, item.lengths, prepacked=pk)

    def sync_one(entry, handle):
        """Block until the device results for one batch are on host.
        Multi-host mesh: only this process's addressable rows come back,
        as (result, global row indices)."""
        item = entry[0]
        if pmapper is not None:
            fwd, rev = item
            if mesh_local_rows:
                return pmapper.finish_batch_local(handle, fwd.lengths,
                                                  rev.lengths)
            return pmapper.finish_batch(handle, fwd.lengths, rev.lengths)
        if mesh_local_rows:
            return mapper.finish_batch_local(handle, item.lengths)
        return mapper.finish_batch(handle, item.lengths)

    def format_one(entry, res):
        """Host formatting (CPU only) → (SAM bytes, stats). Worker pool
        (the second-pass recovery also rides here, overlapping the next
        device batch)."""
        item = entry[0]
        if mesh_local_rows:
            res, rows = res
            if pmapper is not None:
                fwd, rev = item
                item = (fwd.take(rows), rev.take(rows))
            else:
                item = item.take(rows)
        if pmapper is not None:
            fwd, rev = item
            sp2 = getattr(pmapper, "second_pass", None)
            if sp2 is not None:
                res = sp2(fwd.codes, fwd.lengths, rev.codes, rev.lengths,
                          res)
            if selfcheck:
                _selfcheck_batch(fwd.codes, res.m1)
                _selfcheck_batch(rev.codes, res.m2)
            stats = {"reads": 2 * len(fwd),
                     "mapped": int(res.m1.mapped.sum())
                     + int(res.m2.mapped.sum()),
                     "proper_pairs": int(res.proper.sum()),
                     "gapped": int(res.m1.gapped.sum())
                     + int(res.m2.gapped.sum())}
            if native:
                c1, e1, sp1 = _cig3(cigars_nm_blob(
                    genome, fwd.codes, res.m1, mapper.sc,
                    raw_lengths=fwd.seq_len, clip_open=clip_open,
                    clip_rows=res.m1.clipped))
                c2, e2, sp2 = _cig3(cigars_nm_blob(
                    genome, rev.codes, res.m2, mapper.sc,
                    raw_lengths=rev.seq_len, clip_open=clip_open,
                    clip_rows=res.m2.clipped))
                data = sam_native.format_paired(
                    fwd, rev, res, c1, e1, sp1, c2, e2, sp2, index.seqdb)
            else:
                recs = pmapper.format_py(fwd, rev, res)
                data = ("\n".join(recs) + "\n").encode("ascii")
            return data, stats
        batch = item
        sp1 = getattr(mapper, "second_pass", None)
        if sp1 is not None:
            res = sp1(batch.codes, batch.lengths, res)
        if selfcheck:
            _selfcheck_batch(batch.codes, res)
        stats = {"reads": len(batch), "mapped": int(res.mapped.sum()),
                 "gapped": int(res.gapped.sum()),
                 "mapq_ge20": int((res.mapq >= 20).sum())}
        if native:
            cig, nm, _span = _cig3(cigars_nm_blob(
                genome, batch.codes, res, mapper.sc,
                raw_lengths=batch.seq_len, clip_open=clip_open,
                clip_rows=res.clipped))
            data = sam_native.format_single_end(batch, res, cig, nm,
                                                index.seqdb)
        else:
            strand_codes = revcomp_strand_codes(batch.codes, res)
            cigars, nms = cigars_for_result(
                genome, strand_codes, res, mapper.sc,
                raw_lengths=[len(sq) for sq in batch.seqs],
                clip_open=clip_open, clip_rows=res.clipped)
            recs = samio.records_single_end(batch, res, cigars, nms,
                                            index.seqdb)
            data = ("\n".join(recs) + "\n").encode("ascii")
        return data, stats

    def write_one(out):
        data, stats = out
        writer.append_batch(data, stats["reads"])
        nonlocal_state["reads"] += stats["reads"]
        nonlocal_state["mapped"] += stats["mapped"]
        if progress:
            progress.update(stats["reads"])
        metrics.log(**stats)

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if "profile" in opts:
        import jax.profiler

        profile_ctx = jax.profiler.trace(str(opts["profile"]))

    nonlocal_state = {"reads": 0, "mapped": 0}

    def my_batches():
        my_no = 0
        for batch_no, item in enumerate(batches):
            if byte_range is None and nproc > 1 and not mesh_local_rows \
                    and batch_no % nproc != rank:
                continue   # round-robin fallback (gzip / paired input)
            my_no += 1
            if my_no <= writer.skip_batches:
                continue
            yield item

    # pipelined drain: device computes batch i+1 while workers format
    # batch i and the writer commits batch i-1 (utils/stream.py).
    # inflight default 2: overlaps the relay's fixed per-batch charge
    # with the previous batch's D2H+format (round-5: GRCh38 PE 341k
    # reads/s at 49152/inflight-2). Drop to -inflight 1 if a relay
    # build wedges on outstanding executes (the round-2-era failure
    # mode — not reproduced since).
    from urmap_tpu.utils.stream import run_stream

    inflight = int(str(opts.get("inflight", 2)))
    with profile_ctx:
        run_stream(my_batches(), start_one, sync_one, format_one, write_one,
                   inflight=inflight, workers=n_threads)
    n_reads = nonlocal_state["reads"]
    n_mapped = nonlocal_state["mapped"]
    writer.close()

    mh.barrier("map-done")
    if rank == 0:
        mh.merge_shards(str(samout), nproc,
                        samio.sam_header(index.seqdb, cmdline).encode("ascii"))
    mh.barrier("merge-done")

    el = time.monotonic() - t_map0
    pct = 100.0 * n_mapped / max(n_reads, 1)
    if progress:
        progress.done()
    summary = (f"{n_reads:,} reads, {n_mapped:,} mapped ({pct:.2f}%), "
               f"{el:.1f}s ({n_reads / max(el, 1e-9):,.0f} reads/s)")
    print(summary, file=sys.stderr)
    if "log" in opts:
        with open(str(opts["log"]), "a") as lf:
            lf.write(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] "
                     f"{cmdline}\n{summary}\n")
    metrics.close()
    return 0


def main(argv: list[str] | None = None) -> int:
    opts = parse_args(sys.argv[1:] if argv is None else argv)
    if opts.get("help") or not opts:
        print(USAGE.format(v=__version__))
        return 0
    if opts.get("version"):
        print(f"urmap-tpu v{__version__}")
        return 0
    if "make_ufi" in opts:
        return cmd_make_ufi(opts)
    if "ufistats" in opts:
        return cmd_ufistats(opts)
    if "map" in opts:
        return cmd_map(opts)
    raise SystemExit("nothing to do: need -make_ufi or -map (see -help)")
