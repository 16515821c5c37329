"""UFI index container + on-disk format.

The reference serializes one binary ``.ufi`` blob (SURVEY.md §2.7). File
format carries no parity requirement (parity is on SAM output), so ours is
a directory:

    <name>.ufi/
      header.json   — format version, k, slot_bits, cap, counts
      offsets.npy   — uint32[num_slots+1] CSR offsets (mmap'd at load)
      positions.npy — uint32[P] positions (mmap'd at load)
      seqdb.npz/    — genome codes.npy + meta.json (io/fasta.py; the
                      historical .npz name, a directory since round 3)
      prepared_p<p>/ — optional map-ready tables (save_prepared)

    (pre-round-3 indexes stored offsets+positions as tables.npz and the
    seqdb as a real npz file; load() still reads both layouts)

CSR semantics: positions[offsets[s] : offsets[s+1]] are the global genome
start positions (ascending) of every indexed k-mer whose hash slot is s.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from urmap_tpu.config import IndexConfig
from urmap_tpu.io.fasta import SeqDB

FORMAT_VERSION = 1


def evenly_cap_runs(counts: np.ndarray, cap: int,
                    chunk_entries: int = 1 << 26) -> np.ndarray:
    """Per-entry bool keep-mask capping each CSR run to ≤ ``cap`` entries,
    sampled EVENLY across the run rather than keeping the lowest genome
    coordinates — truncation of repeat-heavy slots must not be position-
    biased (round-1 advisor finding). Runs with ≤ cap entries keep all.

    For a run of length c > cap the kept ranks are ceil(m*c/cap) for
    m in [0, cap): exactly cap entries, uniformly strided.

    Processed in whole-run chunks of ≈``chunk_entries`` so peak memory
    stays bounded on GRCh38-scale indexes (the naive per-entry repeats
    were ~40 bytes/entry → >100 GB at 3.1e9 entries)."""
    counts = counts.astype(np.int64)
    ends = np.cumsum(counts)
    n = int(ends[-1]) if counts.size else 0
    keep = np.empty(n, bool)
    S = counts.shape[0]
    s = 0
    pos = 0
    while s < S:
        e = int(np.searchsorted(ends, pos + chunk_entries, side="left"))
        e = max(e, s)                                  # ≥ 1 run per chunk
        sub = counts[s : e + 1]
        m = int(sub.sum())
        if m:
            cnt_e = np.repeat(sub, sub)                # run length per entry
            starts = np.cumsum(sub) - sub
            rank = np.arange(m, dtype=np.int64) - np.repeat(starts, sub)
            mark = (rank * cap) // cnt_e
            keep[pos : pos + m] = mark != ((rank - 1) * cap) // cnt_e
        pos += m
        s = e + 1
    return keep


def counts_i64(offsets: np.ndarray) -> np.ndarray:
    """CSR run lengths (diff of offsets) as int64. Routed through u32
    math + bigmem storage: `np.diff(offsets.astype(int64))` allocates
    ~3 fresh anon GB at GRCh38 scale, which costs ~10 s/GB of page
    faults on this VM class (BASELINE.md round-2 cont.-3)."""
    from urmap_tpu.utils.bigmem import big_empty

    n = offsets.shape[0] - 1
    if offsets.dtype != np.uint32:      # tests/external callers may pass
        return np.diff(offsets.astype(np.int64))  # other integer dtypes
    c32 = big_empty(n, np.uint32)
    np.subtract(offsets[1:], offsets[:-1], out=c32)
    counts = big_empty(n, np.int64)
    counts[...] = c32
    return counts


def align_runs_fixed(counts: np.ndarray, g: int) -> tuple[np.ndarray, int]:
    """Greedy placement with a FIXED no-crossing granularity: each run
    (≤ g entries) is placed so it never crosses a g-word boundary — no
    pow2 nesting, so pad is only ~(mean_run−1)/g (a few % at g=128).
    This is the "row128" huge-table layout: the TPU map step views the
    positions table as dense [R, g] rows (g=128 ⇒ the native 8×128 tile
    lane width, ZERO layout padding) and fetches ONE row per seed. The
    pow2-nested align_runs layout would instead be materialized by XLA
    with 128/rw-fold tile padding — 8× HBM at rw=16, ~95 GB for a
    GRCh38-scale table (the round-3 single-chip blocker)."""
    from urmap_tpu.utils.bigmem import big_empty

    counts = np.ascontiguousarray(counts, np.int64)
    n = counts.shape[0]
    starts = big_empty(n, np.int64)
    if n == 0:
        return starts, 0
    assert g & (g - 1) == 0, "g must be a power of two"
    assert int(counts.max()) <= g, "runs must be capped to <= g"
    from urmap_tpu.io import native as _native

    nlib = _native.lib()
    if nlib is not None:
        import ctypes

        p64 = ctypes.POINTER(ctypes.c_int64)
        total = nlib.urmap_align_runs_fixed(
            counts.ctypes.data_as(p64), n, g, starts.ctypes.data_as(p64))
        return starts, int(total)
    cur = 0
    for i, c in enumerate(counts.tolist()):
        rem = g - (cur & (g - 1))
        if c > rem:
            cur += rem
        starts[i] = cur
        cur += c
    return starts, cur


ROW128 = 128  # dense-row layout width == the TPU tile lane count


def align_runs(counts: np.ndarray, rw: int) -> tuple[np.ndarray, int]:
    """Greedy no-straddle placement of CSR runs: each run of ``c``
    entries (≤ rw) is placed so it never crosses a g-word boundary,
    g = next_pow2(c). Returns (starts int64[S], padded_total).

    Power-of-two granularities nest (g | rw), so every run also stays
    inside one rw-word row (the span-1 full-width gather), AND a run
    with c ≤ T stays inside one T-word block for any power-of-two
    T ≥ c — which is what lets seed.gather_candidates fetch short runs
    with a narrow ``tier``-word gather instead of a whole rw row.

    Native C when available (the decision is a sequential recurrence on
    the running fill level); Python loop fallback for tiny/test indexes.
    """
    from urmap_tpu.utils.bigmem import big_empty

    counts = np.ascontiguousarray(counts, np.int64)
    n = counts.shape[0]
    starts = big_empty(n, np.int64)
    if n == 0:
        return starts, 0
    assert rw & (rw - 1) == 0, "rw must be a power of two"
    assert int(counts.max()) <= rw, "runs must be capped to <= rw"
    from urmap_tpu.io import native as _native

    nlib = _native.lib()
    if nlib is not None:
        import ctypes

        p64 = ctypes.POINTER(ctypes.c_int64)
        total = nlib.urmap_align_runs(
            counts.ctypes.data_as(p64), n, rw, starts.ctypes.data_as(p64))
        return starts, int(total)
    cur = 0
    cl = counts.tolist()
    for i, c in enumerate(cl):
        g = 1
        while g < c:
            g <<= 1
        rem = g - (cur & (g - 1))
        if c > rem:
            cur += rem
        starts[i] = cur
        cur += c
    return starts, cur


@dataclass
class UfiIndex:
    config: IndexConfig
    offsets: np.ndarray    # uint32[num_slots + 1] (CSR; >2^31 legal)
    positions: np.ndarray  # uint32[total_positions] global coordinates
    seqdb: SeqDB
    # directory this index was loaded from / saved to (None if in-memory
    # only); lets Mapper auto-discover prepared_p*/ map-ready caches
    path: str | None = None

    @property
    def num_positions(self) -> int:
        return int(self.positions.shape[0])

    def slot_positions(self, slot: int) -> np.ndarray:
        return self.positions[self.offsets[slot] : self.offsets[slot + 1]]

    def recapped(self, cap: int) -> "UfiIndex":
        """A view of this index with every slot capped to ≤ ``cap``
        positions, subsampled evenly across the run (evenly_cap_runs).
        Used at map time so the gather width (MapConfig.positions_per_seed)
        is an EXPLICIT, position-unbiased cap instead of a silent
        first-N truncation inside the CSR gather."""
        if cap <= 0:
            return self
        from urmap_tpu.io import native as _native

        nlib = None if os.environ.get("URMAP_NO_NATIVE_BUILD") \
            else _native.lib()
        n_slots = self.offsets.shape[0] - 1
        if nlib is not None:
            import ctypes

            from urmap_tpu.utils.bigmem import big_empty

            p_u32 = ctypes.POINTER(ctypes.c_uint32)
            offsets = np.ascontiguousarray(self.offsets, np.uint32)
            off32 = big_empty(n_slots + 1, np.uint32)
            mx = nlib.urmap_cap_offsets(
                offsets.ctypes.data_as(p_u32), n_slots, cap,
                os.cpu_count() or 4, off32.ctypes.data_as(p_u32))
            if mx <= cap:
                return self
            positions = np.ascontiguousarray(self.positions, np.uint32)
            new_pos = big_empty(int(off32[-1]), np.uint32)
            nlib.urmap_recap(
                offsets.ctypes.data_as(p_u32), n_slots,
                positions.ctypes.data_as(p_u32), cap,
                os.cpu_count() or 4, off32.ctypes.data_as(p_u32),
                new_pos.ctypes.data_as(p_u32))
            return UfiIndex(config=self.config, offsets=off32,
                            positions=new_pos, seqdb=self.seqdb)
        counts = np.diff(self.offsets.astype(np.int64))
        if int(counts.max(initial=0)) <= cap:
            return self
        off = np.zeros(n_slots + 1, np.int64)
        np.cumsum(np.minimum(counts, cap), out=off[1:])
        keep = evenly_cap_runs(counts, cap)
        return UfiIndex(config=self.config, offsets=off.astype(np.uint32),
                        positions=self.positions[keep], seqdb=self.seqdb)

    def host_tables(self, cap: int | None = None,
                    row_align: int | None = None,
                    row_fixed: int | None = None) -> dict:
        """Numpy twin of device_tables (same keys; arrays stay host-side
        so they can be persisted/mmapped — see prepare_tables).
        ``row_fixed``: the fixed-granularity "row128" layout instead
        (align_runs_fixed — huge tables)."""
        return self._tables_np(cap=cap, row_align=row_align,
                               row_fixed=row_fixed)

    def device_tables(self, cap: int | None = None,
                      row_align: int | None = None):
        """The HBM-resident mapping state: jnp arrays consumed by the
        jitted map step. The genome rides as bit-packed 2-bit planes
        (genome_pack.py) — 4× smaller than byte codes and 16× cheaper
        to gather from. ``cap``: gather-width cap applied via recapped().

        ``row_align``: row width (power of two ≥ every run length, see
        map.seed.align_row_words) for the NO-STRADDLE layout: runs are
        re-placed (align_runs) so none crosses a row_align-word row
        boundary, pad entries hold seed.SENTINEL, and ``offsets`` become
        the PADDED-CSR convention — offsets[s] is the run start,
        offsets[s+1]-offsets[s] counts run + trailing pad, and entries
        are validated per-lane by ``!= SENTINEL`` (seed.gather_candidates
        csr_aligned=True). The positions gather then fetches exactly
        ceil(p/rw) aligned rows per seed instead of one extra straddle
        row — the CSR gather was the map step's largest stage.

        Coordinates: positions are uploaded BIASED (seed.POS_BIAS) so
        int32 device math covers GRCh38-scale genomes; the bias rides
        into ``base_off`` (POS_BIAS is a multiple of BASES_PER_WORD) so
        every packed-genome gather unbiases for free. CSR offsets ride
        as uint32 (>2^31 total positions are legal)."""
        ht = self._tables_np(cap=cap, row_align=row_align)
        return tables_to_device(ht)

    def _tables_np(self, cap: int | None = None,
                   row_align: int | None = None,
                   row_fixed: int | None = None) -> dict:
        from urmap_tpu import genome_pack as gpk
        from urmap_tpu.map.seed import POS_BIAS, SENTINEL

        if cap is not None:
            return self.recapped(cap)._tables_np(row_align=row_align,
                                                 row_fixed=row_fixed)
        glen = self.seqdb.total_len
        if glen >= SENTINEL + POS_BIAS - (1 << 16):
            raise ValueError(
                f"genome of {glen:,} bases exceeds the biased-int32 "
                "device coordinate range (~4.29 Gbp); shard the genome")
        from urmap_tpu.utils.bigmem import big_empty

        ginter, base_off = gpk.pack_genome(self.seqdb.codes)
        offsets = self.offsets
        npos = self.positions.shape[0]
        layout = "classic"
        if row_fixed is not None:
            layout = "row128"
        elif row_align is not None:
            layout = "aligned"
        if row_align is None and row_fixed is None:
            pad = 2 * gpk.ROW_WORDS + ((-npos) % gpk.ROW_WORDS)
            positions = big_empty(npos + pad, np.int32)
            # uint32 wraparound == two's-complement int32 bias (biased
            # coords are in int32 range by the glen guard above); one
            # pass into the final padded table, no int64 widening and no
            # concatenate copy at GRCh38 scale
            np.subtract(np.asarray(self.positions, np.uint32),
                        np.uint32(POS_BIAS),
                        out=positions[:npos].view(np.uint32))
            positions[npos:] = 0
        else:
            counts = counts_i64(offsets)
            if row_fixed is not None:
                rw = int(row_fixed)
                starts, total = align_runs_fixed(counts, rw)
                # pad to whole rows + one guard row (the row fetch
                # clips row indexes; entries are SENTINEL)
                pad = rw + ((-total) % rw)
            else:
                rw = int(row_align)
                starts, total = align_runs(counts, rw)
                # pad to a 128-word multiple (not just ROW_WORDS): the
                # pow2-nested placement means runs never cross 128-word
                # boundaries either, so a 128-divisible table lets the
                # TPU gather ride the [M/128, 128] dense-row view + the
                # lane-rotate kernel (seed.gather_candidates aligned
                # branch) instead of the rw-row funnel. Old caches
                # without the pad fall back at trace time. The guard
                # words themselves must be INSIDE the 128-multiple:
                # padding total alone leaves the final length at 64
                # (mod 128) and the aligned dispatch guard never fires
                # (round-4 advisor finding).
                pad = (2 * gpk.ROW_WORDS
                       + ((-(total + 2 * gpk.ROW_WORDS)) % 128))
            if total + pad >= 1 << 32:
                raise ValueError("row-aligned positions table exceeds "
                                 "uint32 offsets; raise the cap filter")
            positions = big_empty(total + pad, np.int32)
            from urmap_tpu.io import native as _native

            nlib = None if os.environ.get("URMAP_NO_NATIVE_BUILD") \
                else _native.lib()
            if nlib is not None:
                import ctypes

                positions[...] = SENTINEL
                pos_b = positions[:total]
                p_u32 = ctypes.POINTER(ctypes.c_uint32)
                off_c = np.ascontiguousarray(offsets, np.uint32)
                pos_c = np.ascontiguousarray(self.positions, np.uint32)
                starts_c = np.ascontiguousarray(starts, np.int64)
                nlib.urmap_place_runs(
                    off_c.ctypes.data_as(p_u32), counts.shape[0],
                    pos_c.ctypes.data_as(p_u32),
                    starts_c.ctypes.data_as(_native.p_i64), POS_BIAS,
                    os.cpu_count() or 4,
                    pos_b.ctypes.data_as(_native.p_i32))
            else:
                positions[...] = SENTINEL
                pos_b = positions[:total]
                # chunked scatter (transient index arrays are 8 B/entry —
                # bounded so GRCh38-scale tables don't spike tens of GB)
                CH = 1 << 26
                ends = np.cumsum(counts)
                old_starts = ends - counts
                s = 0
                S = counts.shape[0]
                while s < S:
                    e = int(np.searchsorted(ends,
                                            int(old_starts[s]) + CH,
                                            side="left"))
                    e = max(e, s + 1)
                    cs = counts[s:e]
                    m = int(cs.sum())
                    if m:
                        rank = (np.arange(m, dtype=np.int64)
                                - np.repeat(
                                    old_starts[s:e] - old_starts[s], cs))
                        idx = np.repeat(starts[s:e], cs) + rank
                        src = self.positions[
                            old_starts[s] : old_starts[s] + m]
                        pos_b[idx] = ((src.astype(np.int64) - POS_BIAS)
                                      .astype(np.int32))
                    s = e
            off_al = big_empty(counts.shape[0] + 1, np.uint32)
            off_al[:-1] = starts
            off_al[-1] = total
            offsets = off_al
        # positions were padded to a ROW_WORDS multiple + guard rows for
        # the row-slice gather (dead lanes are masked by the CSR counts /
        # SENTINEL pads in aligned mode)
        return {
            "offsets": np.asarray(offsets, np.uint32),  # no-copy when u32
            "positions": positions,
            "ginter": ginter,
            # "classic" (dense CSR, straddle-row gather), "aligned"
            # (pow2-nested no-straddle + tier), or "row128" (fixed
            # 128-word rows, dense [R,128] device view — huge tables)
            "layout": layout,
            # static word offset: genome guard pad + the coordinate bias
            "base_off": base_off + POS_BIAS // gpk.BASES_PER_WORD,
            # last valid biased coordinate (= glen - 1 - POS_BIAS):
            # always int32 (genomes cap at ~4.29 Gbp above), unlike the
            # raw genome length, which overflows the int32 jit-argument
            # parse at > 2^31 bases
            "genome_max_biased": np.int32(glen - 1 - POS_BIAS),
        }

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        header = {
            "format_version": FORMAT_VERSION,
            "k": self.config.k,
            "slot_bits": self.config.slot_bits,
            "max_positions_per_slot": self.config.max_positions_per_slot,
            "veryfast": self.config.veryfast,
            "num_positions": self.num_positions,
            "genome_total_len": self.seqdb.total_len,
            "num_seqs": self.seqdb.num_seqs,
        }
        with open(os.path.join(path, "header.json"), "w") as f:
            json.dump(header, f, indent=2)
        # raw .npy tables: mmap back in at -map startup (load-and-go,
        # like the reference's .ufi) instead of an npz CRC+copy pass
        # that costs minutes at GRCh38 scale. Written to a temp name +
        # os.replace: self.offsets/positions may BE mmaps of these very
        # files (re-save of a loaded index) and an in-place truncate
        # would SIGBUS mid-write; replace leaves the mapped inode alive.
        for name, arr in (("offsets", self.offsets),
                          ("positions", self.positions)):
            tmp = os.path.join(path, f".{name}.{os.getpid()}.tmp.npy")
            np.save(tmp, arr)
            os.replace(tmp, os.path.join(path, f"{name}.npy"))
        stale = os.path.join(path, "tables.npz")
        if os.path.exists(stale):
            os.remove(stale)        # pre-round-3 layout shadows .npy at load
        self.seqdb.save(os.path.join(path, "seqdb.npz"))
        self.path = path

    @classmethod
    def load(cls, path: str) -> "UfiIndex":
        with open(os.path.join(path, "header.json")) as f:
            header = json.load(f)
        if header["format_version"] != FORMAT_VERSION:
            raise ValueError(f"unsupported index format {header['format_version']}")
        npz = os.path.join(path, "tables.npz")
        if os.path.exists(npz):                   # pre-round-3 layout
            with np.load(npz) as z:
                offsets = z["offsets"].astype(np.uint32)
                positions = z["positions"]
        else:
            offsets = np.load(os.path.join(path, "offsets.npy"),
                              mmap_mode="r")
            positions = np.load(os.path.join(path, "positions.npy"),
                                mmap_mode="r")
        seqdb = SeqDB.load(os.path.join(path, "seqdb.npz"))
        cfg = IndexConfig(
            k=header["k"],
            slot_bits=header["slot_bits"],
            max_positions_per_slot=header["max_positions_per_slot"],
            veryfast=header.get("veryfast", False),
        )
        return cls(config=cfg, offsets=offsets, positions=positions,
                   seqdb=seqdb, path=path)


def ginter_rows(ginter) -> np.ndarray:
    """Interleaved genome planes → dense [R, 128] rows for the row128
    layout (genome_pack.row128_window_fetch). Pads stale caches whose
    length predates the %128 pack_genome guarantee with all-N guard
    pairs (code 0, nplane 0x5555_5555)."""
    g = np.asarray(ginter)
    rem = int((-g.shape[0]) % 128)
    if rem:
        pad = np.empty(rem, np.uint32)
        pad[0::2] = 0
        pad[1::2] = 0x5555_5555
        g = np.concatenate([g, pad])
    return g.reshape(-1, 128)


def packed_offsets_bits(p: int) -> tuple[int, int]:
    """(cnt_bits, block_bits) for the packed row128 offsets encoding.

    In the row128 layout every slot's padded run length (diff of
    offsets) is ≤ 2p−1: the run itself is capped at p entries and the
    pad inserted before the NEXT run (align_runs_fixed only pads when a
    run would cross a 128-word boundary) is ≤ that run's length − 1
    ≤ p−1. So a single uint16 per slot can carry
        (start − block_base) << cnt_bits | padded_count
    with cnt_bits = bit_length(2p−1) and the block size chosen so the
    worst-case within-block span, block·(2p−1), fits the remaining
    16−cnt_bits bits. This halves the offsets table (2.15 GB → 1.08 GB
    at slot_bits 29) AND halves the gather bytes per seed — the HBM
    freed is what lets GRCh38-scale bits29 tables run batch 32768+
    (round-3 verdict item 1 lever b)."""
    cnt_bits = int(2 * p - 1).bit_length()
    delta_bits = 16 - cnt_bits
    span = 2 * p - 1
    block_bits = 0
    while (1 << (block_bits + 1)) * span <= (1 << delta_bits):
        block_bits += 1
    return cnt_bits, block_bits


def pack_offsets_row128(offsets: np.ndarray, p: int):
    """row128-layout CSR offsets uint32[S+1] → packed device encoding:
    dict(opacked uint32[ceil(S/2)] — two uint16 slot entries per word,
    obase uint32[ceil(S/2^block_bits)], cnt_bits, block_bits), or None
    when the encoding's invariants don't hold (caller falls back to the
    plain uint32 table). Host-side numpy only — a few passes over the
    table (~seconds at GRCh38 scale)."""
    from urmap_tpu.utils.bigmem import big_empty

    cnt_bits, block_bits = packed_offsets_bits(p)
    S = offsets.shape[0] - 1
    if S <= 0:
        return None
    off = np.asarray(offsets[:-1], np.uint32)
    diff = np.asarray(offsets[1:], np.uint32) - off
    if int(diff.max(initial=0)) >= (1 << cnt_bits):
        return None                       # not a row128-shaped table
    nb = -(-S // (1 << block_bits))
    base = np.ascontiguousarray(off[:: 1 << block_bits], np.uint32)
    assert base.shape[0] == nb
    delta = off - np.repeat(base, 1 << block_bits)[:S]
    if int(delta.max(initial=0)) >= (1 << (16 - cnt_bits)):
        return None
    u16 = big_empty(S + (S & 1), np.uint16)
    u16[:S] = (delta.astype(np.uint16) << np.uint16(cnt_bits)) \
        | diff.astype(np.uint16)
    if S & 1:
        u16[S] = 0
    return {"opacked": u16.view(np.uint32), "obase": base,
            "cnt_bits": cnt_bits, "block_bits": block_bits}


def effective_gather_tier(meta: dict):
    """The gather tier the map step should actually use.

    Round-3 on-chip measurement (tools → /tmp/tier_sweep.log, v5e,
    16 Mbp, batch 32k): tier=4 134.9 ms/batch vs tier=None 112.1 —
    the narrow first pass saves nothing (TPU row gathers bill per ROW
    touched, not per nominal element) and its overflow while_loop adds
    ~23 ms. Default: ignore the prepared tier. URMAP_TIER_GATHER=1
    re-enables it (the mechanism stays bit-identical and tested for
    platforms where element count does dominate)."""
    if os.environ.get("URMAP_TIER_GATHER") == "1":
        return meta.get("gather_tier")
    return None


def tables_to_device(ht: dict, *, use_packed_offsets: bool = False):
    """Host numpy tables (host_tables / load_prepared) → jnp arrays.

    row128 layout: the positions table is uploaded ALREADY SHAPED
    [R, 128] — a dense (pad-free) TPU tile layout. Reshaping a 1-D
    parameter inside the program instead materializes an XLA copy with
    tile padding: 128/minor-dim-fold HBM bloat (8× at rw=16 — ~95 GB
    for a GRCh38-scale table).

    ``use_packed_offsets``: upload ht["opacked"]/["obase"] (pack_
    offsets_row128) AS the offsets tables — half the offsets HBM; the
    map fn must then be built with the matching meta["off_bits"]."""
    import jax.numpy as jnp

    pos = ht["positions"]
    gin = ht["ginter"]
    if ht.get("layout") == "row128":
        pos = np.asarray(pos).reshape(-1, ROW128)
        gin = ginter_rows(gin)   # the genome view pads 8x too (same fix)
    out = {
        "positions": jnp.asarray(pos),
        "ginter": jnp.asarray(gin),
        "base_off": int(ht["base_off"]),
        "genome_max_biased": np.int32(ht["genome_max_biased"]),
    }
    if use_packed_offsets:
        assert ht.get("opacked") is not None
        out["offsets"] = jnp.asarray(ht["opacked"], jnp.uint32)
        out["obase"] = jnp.asarray(ht["obase"], jnp.uint32)
    else:
        out["offsets"] = jnp.asarray(ht["offsets"], jnp.uint32)
    return out


def prepare_tables(index: UfiIndex, p: int) -> tuple[dict, dict]:
    """The expensive map-time prep (recap → aligned layout decision →
    gather tier → packed genome) as plain numpy + metadata. At GRCh38
    scale this is ~tens of minutes of host work — pay it once at
    -make_ufi time (save_prepared) and mmap it at -map startup, the way
    the reference's .ufi is load-and-go."""
    from urmap_tpu.map.pipeline import pick_gather_tier
    from urmap_tpu.map.seed import align_row_words

    capped = index.recapped(p)
    rw = align_row_words(p)
    counts = counts_i64(capped.offsets)
    starts, total = align_runs(counts, rw)
    csr_aligned = bool(total <= 1.15 * max(capped.num_positions, 1))
    # Huge tables must take the row128 layout: the classic/aligned
    # gathers view the table as rw-wide rows, which XLA materializes
    # with (128/rw)-fold tile padding — an 8× HBM copy at rw=16 that
    # cannot fit for GRCh38-scale tables. Threshold = padded-view bytes
    # (default 2 GiB; URMAP_ROW128_BYTES overrides).
    budget = int(os.environ.get("URMAP_ROW128_BYTES", str(2 << 30)))
    view_bytes = (total if csr_aligned
                  else capped.num_positions) * 4 * (128 // min(rw, 128))
    row128 = p <= ROW128 and view_bytes > budget
    tier = None
    if row128:
        csr_aligned = False
        ht = capped.host_tables(row_fixed=ROW128)
        pk = pack_offsets_row128(ht["offsets"], p)
        if pk is not None:
            ht["opacked"], ht["obase"] = pk["opacked"], pk["obase"]
    else:
        if csr_aligned:
            tier = pick_gather_tier(
                np.diff(np.concatenate([starts, [total]])))
        ht = capped.host_tables(row_align=rw if csr_aligned else None)
    meta = {
        "p": p,
        "layout": ht["layout"],
        "csr_aligned": csr_aligned,
        "gather_tier": tier,
        "off_bits": (list(packed_offsets_bits(p))
                     if ht.get("opacked") is not None else None),
        "k": index.config.k,
        "slot_bits": index.config.slot_bits,
        "veryfast": index.config.veryfast,
        "genome_total_len": index.seqdb.total_len,
        "base_off": int(ht["base_off"]),
        "genome_max_biased": int(ht["genome_max_biased"]),
    }
    return ht, meta


def _prepared_dir(path: str, p: int) -> str:
    return os.path.join(path, f"prepared_p{p}")


def save_prepared(index: UfiIndex, path: str, p: int) -> str:
    """Persist map-ready tables under <index dir>/prepared_p<p>/ as raw
    .npy files (mmap-able — npz members are not) + meta.json."""
    ht, meta = prepare_tables(index, p)
    d = _prepared_dir(path, p)
    os.makedirs(d, exist_ok=True)
    keys = ["offsets", "positions", "ginter"]
    if ht.get("opacked") is not None:
        keys += ["opacked", "obase"]
    for key in keys:
        np.save(os.path.join(d, f"{key}.npy"), ht[key])
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return d


def load_prepared(index: UfiIndex, p: int) -> tuple[dict, dict] | None:
    """Load the prepared tables matching this index + gather width, or
    None (missing or stale — keyed on k/slot_bits/veryfast/genome_len).
    Arrays are memory-mapped; jnp.asarray streams them to the device."""
    if index.path is None:
        return None
    d = _prepared_dir(index.path, p)
    mf = os.path.join(d, "meta.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        meta = json.load(f)
    cfg = index.config
    if (meta.get("p") != p or meta.get("k") != cfg.k
            or meta.get("slot_bits") != cfg.slot_bits
            or meta.get("veryfast") != cfg.veryfast
            or meta.get("genome_total_len") != index.seqdb.total_len):
        return None
    ht = {key: np.load(os.path.join(d, f"{key}.npy"), mmap_mode="r")
          for key in ("offsets", "positions", "ginter")}
    ht["base_off"] = meta["base_off"]
    ht["genome_max_biased"] = meta["genome_max_biased"]
    # pre-row128 caches lack "layout" — derive it (they were written as
    # aligned or classic, never row128)
    ht["layout"] = meta.get(
        "layout", "aligned" if meta.get("csr_aligned") else "classic")
    meta.setdefault("layout", ht["layout"])
    if ht["layout"] != "row128":
        # stale-cache guard: a classic/aligned cache whose rw-wide
        # device view would exceed the row128 budget (XLA materializes
        # it with 128/rw-fold tile padding) must be re-prepared
        from urmap_tpu.map.seed import align_row_words

        budget = int(os.environ.get("URMAP_ROW128_BYTES", str(2 << 30)))
        rw_ = align_row_words(p)
        if (p <= ROW128 and ht["positions"].shape[0] * 4
                * (128 // min(rw_, 128)) > budget):
            return None
    else:
        opf = os.path.join(d, "opacked.npy")
        if os.path.exists(opf):
            ht["opacked"] = np.load(opf, mmap_mode="r")
            ht["obase"] = np.load(os.path.join(d, "obase.npy"),
                                  mmap_mode="r")
            meta.setdefault("off_bits", list(packed_offsets_bits(p)))
        elif meta.get("off_bits") is None:
            # pre-round-4 row128 cache: derive the packed encoding once
            # (host numpy, ~tens of seconds at GRCh38 scale) and save it
            # back so later loads mmap it
            pk = pack_offsets_row128(np.asarray(ht["offsets"]), p)
            if pk is not None:
                ht["opacked"], ht["obase"] = pk["opacked"], pk["obase"]
                meta["off_bits"] = [pk["cnt_bits"], pk["block_bits"]]
                try:
                    for key in ("opacked", "obase"):
                        tmp = os.path.join(d, f".{key}.{os.getpid()}.npy")
                        np.save(tmp, ht[key])
                        os.replace(tmp, os.path.join(d, f"{key}.npy"))
                    with open(mf) as f:
                        m2 = json.load(f)
                    m2["off_bits"] = meta["off_bits"]
                    tmpm = mf + f".{os.getpid()}.tmp"
                    with open(tmpm, "w") as f:
                        json.dump(m2, f, indent=2)
                    os.replace(tmpm, mf)
                except OSError:
                    pass   # read-only cache dir: packed stays in-memory
    return ht, meta
