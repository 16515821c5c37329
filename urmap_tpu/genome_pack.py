"""Bit-parallel packed genome: 16 bases per uint32 word.

The map pipeline's cost on TPU is XLA element-gather volume (stage
profile: ungapped verify + DP window gathers dominate). Packing the
genome 2 bits/base — plus a parallel 2-bit "is-N" plane with the SAME
layout — cuts gather volume 16× and turns mismatch counting into
XOR + popcount on the VPU:

    mism+N bits = ((a^b) | ((a^b)>>1) | nA | nB) & 0x55555555
    count       = popcount(bits & tail_mask)

Layout: base g lives in bits [2*(g%16), 2*(g%16)+1] of word g//16
(little-endian within the word), so a window starting at base s is
aligned with one funnel shift from words s//16 ... The packed arrays are
padded with WORD_PAD all-N words so clipped word indices past either
end read as N (mismatch) — exactly what the byte path reads there,
because SeqDB pads the code array with ≥64 N separators on both ends.

Equality contract: for candidate starts in [0, G-1], packed mismatch
counts are bit-identical to the byte-path _ungapped_scores (tested in
tests/unit/test_genome_pack.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BASES_PER_WORD = 16
WORD_PAD = 16  # all-N guard words at each end
ROW_WORDS = 32  # table PADDING granularity (guard rows, shard pads)
# row granularity actually used by the hot gathers (CSR positions,
# verify windows). Must divide ROW_WORDS. Read at trace time — swept
# fetch-forced on v5e by tools/bench_step.py (batch 32k, P=16):
# rw=32 411k, rw=16 476k, rw=8 328k reads/s device pipeline → 16.
GATHER_ROW_WORDS = 16
# window-gather implementation: "slice" = one XLA gather op with
# slice_sizes at the exact (unaligned) start — one op, exact element
# count, no funnel selects; "row" = aligned row gathers + log2(rw)
# conditional shifts. Bit-identical (unit-tested). Fetch-forced numbers
# (tools/bench_gather2.py): TPU lowers small-slice gathers ~24× SLOWER
# than the row path (1703 vs 71 ms on the CSR shape), while CPU runs
# them ~7× FASTER (167 vs 1140 ms) → "auto" picks per backend.
GATHER_MODE = "auto"
_EVEN = np.uint32(0x5555_5555)


def slice_gather_window(table, starts, width: int):
    """table_1d[starts[i] : starts[i]+width] per row via ONE XLA gather
    op with slice_sizes=(width,) — arbitrary (unaligned) starts, exact
    element count, no alignment selects. CLIP mode pins out-of-range
    starts to M-width (callers pad tables with guard words, same
    contract as row_gather_window). starts may be uint32 (> 2^31 CSR
    offsets on GRCh38-scale indexes)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    return jax.lax.gather(
        table, starts[:, None], dn, slice_sizes=(width,),
        mode=jax.lax.GatherScatterMode.CLIP)


def gather_window(table, starts, width: int, *,
                  row_words: int = GATHER_ROW_WORDS):
    """Dispatch to the configured window-gather implementation (module
    knob GATHER_MODE, read at trace time)."""
    mode = GATHER_MODE
    if mode == "auto":
        mode = "slice" if jax.default_backend() == "cpu" else "row"
    if mode == "slice":
        return slice_gather_window(table, starts, width)
    from urmap_tpu.kernels import lane_rotate

    if (lane_rotate.enabled() and table.shape[0] % 128 == 0
            and table.shape[0] - 1 <= np.iinfo(np.int32).max):
        # dense 128-row view + in-VMEM rotate (kernels/lane_rotate.py):
        # same [starts : +width] semantics as the narrow-row path below
        # without its per-step shrink-funnel temps. Requires a
        # 128-divisible table (pack_genome guarantees it; undersized
        # stale caches fall back here at trace time).
        return row128_window_fetch(table.reshape(-1, 128), starts, width)
    return row_gather_window(table, starts, width, row_words=row_words)


def row_gather_window(table, starts, width: int, *,
                      row_words: int = ROW_WORDS):
    """table_1d[starts[i] : starts[i]+width] for every row, via ROW-slice
    gathers of a [M/row_words, row_words] view. XLA's TPU gather runs at
    ~1 element/cycle regardless of row contiguity (measured: 36 ms for
    34M words at batch 32k), so the win is gathering FEWER ELEMENTS:
    span rows of ``row_words`` quantize the fetch, and a small row size
    (8–16) fetches ~width+row_words words instead of 64 for width 16.
    The unaligned offset within the first row is resolved with
    log2(row_words) conditional static shifts — one `where` per offset
    bit (a one-hot select or take_along_axis here was the dominant cost
    of the gather AND verify stages).

    Requirements: 0 <= starts (clipped), and the table padded so reads
    beyond len(table) land in caller-provided guard rows (indexes here
    are clipped to the last row). ``row_words`` must be a power of two
    dividing the caller's table padding granularity.
    """
    M = table.shape[0]
    nrows = M // row_words
    t2 = table[: nrows * row_words].reshape(nrows, row_words)
    if M - 1 > np.iinfo(np.int32).max:
        # >2^31-entry tables (GRCh38-scale CSR positions): the clip
        # bound must stay in uint32 — as a weak int it overflows the
        # int32 jit-argument parse. Row indexes (M/row_words < 2^31)
        # drop back to int32 for the takes.
        # clamp negatives BEFORE the uint32 cast: a negative start would
        # wrap to ~4e9 and clip to the table TAIL, whereas the int32
        # branch clips to the HEAD — both branches must agree (round-3
        # advisor finding).
        s = jnp.minimum(jnp.maximum(starts, 0).astype(jnp.uint32),
                        jnp.uint32(M - 1))
        r0 = (s // jnp.uint32(row_words)).astype(jnp.int32)
        off32 = (s - r0.astype(jnp.uint32)
                 * jnp.uint32(row_words)).astype(jnp.int32)
    else:
        s = jnp.clip(starts, 0, M - 1)
        r0 = s // row_words
        off32 = (s - r0 * row_words).astype(jnp.int32)
    span = -(-width // row_words) + 1
    rows = [jnp.take(t2, jnp.clip(r0 + i, 0, nrows - 1), axis=0)
            for i in range(span)]
    cur = jnp.concatenate(rows, axis=1)              # [N, row_words*span]
    off = off32
    bit = row_words.bit_length() - 2                 # log2(row_words) - 1
    while bit >= 0:
        sh = 1 << bit
        cur = jnp.where(
            (((off >> bit) & 1) == 1)[:, None],
            cur[:, sh:], cur[:, :-sh])               # [N, curW - sh] both
        bit -= 1
    return cur[:, :width]


def row128_window_fetch(table2d, starts, width: int):
    """Window fetch from a DENSE [R, 128] table view (the row128 huge-
    table layout): two consecutive 128-lane row gathers + a 7-bit lane
    funnel yield table.flat[starts[i] : +width] for width ≤ 129.

    Why: any rw-wide (rw < 128) row view of a multi-GB table is
    materialized by XLA with (128/rw)-fold tile padding — 11.6 GB for
    the 1.45 GB GRCh38 interleaved genome at rw=16 (this round's OOM).
    A [R, 128] PARAMETER is pad-free, so the fetch costs ceil(width/128)
    + 1 dense row gathers and zero extra HBM. starts int32 ≥ 0 (genome
    word offsets stay < 2^31 for ≤4.29 Gbp genomes)."""
    R = table2d.shape[0]
    M = R * 128
    s = jnp.clip(starts, 0, M - width)
    r0 = s // 128
    span = -(-width // 128) + 1
    rows = [jnp.take(table2d, jnp.clip(r0 + i, 0, R - 1), axis=0)
            for i in range(span)]
    cur = jnp.concatenate(rows, axis=1)              # [N, span*128]
    off = (s - r0 * 128).astype(jnp.int32)
    from urmap_tpu.kernels import lane_rotate

    def funnel(cur, off):
        bit = 6
        while bit >= 0:
            sh = 1 << bit
            cur = jnp.where((((off >> bit) & 1) == 1)[:, None],
                            cur[:, sh:], cur[:, :-sh])
            bit -= 1
        return cur[:, :width]

    # in-VMEM funnel on TPU lowerings (kernels/lane_rotate.py):
    # off + width <= 256 always holds here (off < 128, width <= 129),
    # so the circular roll never wraps a used lane — bit-identical to
    # the jnp funnel on every output lane
    return lane_rotate.rotate_dispatch(cur, off, width, funnel)


def pack_genome(codes: np.ndarray):
    """uint8[G] codes → (packed uint32[W], nplane uint32[W], base_offset).

    base_offset: index of the word holding base 0 (= WORD_PAD); callers
    pass starts relative to the original genome and the gather helpers
    add it.
    """
    import os

    G = codes.shape[0]
    W = -(-G // BASES_PER_WORD)
    nlib = None
    if not os.environ.get("URMAP_NO_NATIVE_BUILD"):
        from urmap_tpu.io import native as _native

        nlib = _native.lib()
    if nlib is not None:
        # native path: write the planes straight into the interleaved
        # table (no multi-GB concatenate/interleave copies; the table
        # itself rides on bigmem shared-hugepage storage)
        import ctypes

        from urmap_tpu.io import native as _native
        from urmap_tpu.utils.bigmem import big_empty

        back = 6 * ROW_WORDS
        total = WORD_PAD + W + back
        # pad to 64 words so the INTERLEAVED table (2 words/genome word)
        # is a multiple of 128 — the row128 [R, 128] genome view then
        # reshapes pad-free (ROW_WORDS still divides 64)
        back += (-total) % 64
        total = WORD_PAD + W + back
        inter = big_empty(2 * total, np.uint32)
        inter[: 2 * WORD_PAD : 2] = 0
        inter[1 : 2 * WORD_PAD : 2] = 0x5555_5555
        inter[2 * (WORD_PAD + W) :: 2] = 0
        inter[2 * (WORD_PAD + W) + 1 :: 2] = 0x5555_5555
        p_u32 = ctypes.POINTER(ctypes.c_uint32)
        codes_c = np.ascontiguousarray(codes)
        base = inter.ctypes.data + 8 * WORD_PAD
        nlib.urmap_pack_genome(
            codes_c.ctypes.data_as(_native.p_u8), G,
            os.cpu_count() or 4, ctypes.cast(base, p_u32),
            ctypes.cast(base + 4, p_u32), 2)
        return inter, WORD_PAD
    packed = np.empty(W, np.uint32)
    nplane = np.empty(W, np.uint32)
    shifts = (np.arange(BASES_PER_WORD, dtype=np.uint32) * 2)
    # chunked packing: the uint32 widening transients are 8 bytes/base —
    # bounded so GRCh38-scale genomes don't spike ~25 GB
    CW = 1 << 26                                   # words per chunk
    for w0 in range(0, W, CW):
        w1 = min(w0 + CW, W)
        seg = codes[w0 * BASES_PER_WORD : w1 * BASES_PER_WORD]
        if seg.shape[0] < (w1 - w0) * BASES_PER_WORD:
            seg = np.concatenate(
                [seg, np.full((w1 - w0) * BASES_PER_WORD - seg.shape[0],
                              4, np.uint8)])
        c = seg.astype(np.uint32)
        isn = (c >= 4).astype(np.uint32)
        c &= 3
        cw = c.reshape(w1 - w0, BASES_PER_WORD)
        nw = isn.reshape(w1 - w0, BASES_PER_WORD)
        packed[w0:w1] = np.bitwise_or.reduce(cw << shifts[None, :], axis=1)
        # N plane: 01 in the base's 2-bit lane when N
        nplane[w0:w1] = np.bitwise_or.reduce(nw << shifts[None, :], axis=1)
    # guards: front WORD_PAD all-N words; back enough all-N words that
    # any in-range window (largest client: the rescue scan, ~80 words,
    # plus the row-gather's extra rows) stays inside the table; total
    # padded to a multiple of ROW_WORDS
    back = 6 * ROW_WORDS
    total = WORD_PAD + W + back
    back += (-total) % 64   # interleaved length % 128 == 0 (see above)
    packed = np.concatenate([np.zeros(WORD_PAD, np.uint32), packed,
                             np.zeros(back, np.uint32)])
    nplane = np.concatenate([np.full(WORD_PAD, 0x5555_5555, np.uint32),
                             nplane,
                             np.full(back, 0x5555_5555, np.uint32)])
    # interleave (code word, N word) pairs: every window then needs ONE
    # row-gather of 2*(n_words+1) from an even offset instead of two
    # separate plane gathers — the gathers are the pipeline's cost floor
    inter = np.empty(2 * packed.shape[0], np.uint32)
    inter[0::2] = packed
    inter[1::2] = nplane
    return inter, WORD_PAD


def pack_read_codes_host(codes: np.ndarray):
    """Host-side 4-bases/byte packing of read codes for the H2D upload.

    The axon relay upload is the e2e bottleneck (tools/bench_upload.py);
    packing shrinks the [B, L] uint8 batch ~3.2×: 2-bit base codes
    (4/byte) plus a 1-bit N plane (8/byte). Read codes are in
    {0,1,2,3,5} (alphabet.py: reads never carry genome-N 4), so
    (code & 3) + N-bit round-trips exactly: N ⇒ code 5.

    Returns (packed uint8[B, ceil(L/4)], nmask uint8[B, ceil(L/8)]).
    unpack_read_codes_device inverts on device.

    The hot path is the C++ single-pass packer (io/native/codecs.cpp
    urmap_pack_reads, GIL released) — the numpy fallback below costs
    ~60 ms per 32k batch on the GIL-contended dispatch thread
    (tools/bench_e2e_phases.py) vs ~2 ms native.
    """
    B, L = codes.shape
    from urmap_tpu.io import native as _native

    nlib = _native.lib()
    if nlib is not None:
        codes = np.ascontiguousarray(codes)
        packed = np.empty((B, -(-L // 4)), np.uint8)
        nmask = np.empty((B, -(-L // 8)), np.uint8)
        import ctypes

        u8p = ctypes.POINTER(ctypes.c_uint8)
        nlib.urmap_pack_reads(
            codes.ctypes.data_as(u8p), B, L,
            packed.ctypes.data_as(u8p), nmask.ctypes.data_as(u8p))
        return packed, nmask
    return _pack_read_codes_numpy(codes)


def _pack_read_codes_numpy(codes: np.ndarray):
    """Pure-numpy twin of urmap_pack_reads (fallback + parity oracle)."""
    B, L = codes.shape
    L4 = -(-L // 4) * 4
    L8 = -(-L // 8) * 8
    c = np.pad(codes, ((0, 0), (0, L4 - L)), constant_values=0)
    two = (c & 3).reshape(B, L4 // 4, 4)
    sh = np.array([0, 2, 4, 6], np.uint8)
    packed = np.bitwise_or.reduce(
        (two << sh[None, None, :]).astype(np.uint8), axis=2)
    isn = (np.pad(codes, ((0, 0), (0, L8 - L)), constant_values=0)
           >= 4).astype(np.uint8).reshape(B, L8 // 8, 8)
    shn = np.arange(8, dtype=np.uint8)
    nmask = np.bitwise_or.reduce(
        (isn << shn[None, None, :]).astype(np.uint8), axis=2)
    return packed, nmask


def unpack_read_codes_device(packed, nmask, L: int):
    """Device inverse of pack_read_codes_host → uint8[B, L] read codes
    (N restored as code 5)."""
    import jax.numpy as jnp

    B = packed.shape[0]
    sh = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    code = ((packed[:, :, None] >> sh) & jnp.uint8(3)) \
        .reshape(B, packed.shape[1] * 4)[:, :L]
    shn = jnp.arange(8, dtype=jnp.uint8)[None, None, :]
    isn = ((nmask[:, :, None] >> shn) & jnp.uint8(1)) \
        .reshape(B, nmask.shape[1] * 8)[:, :L]
    return jnp.where(isn == 1, jnp.uint8(5), code)


def _tail_n_mask(lengths, n_words: int):
    """uint32[N, n_words] with 01 in every 2-bit lane at base index
    >= lengths (the pack_reads pad-is-N convention)."""
    base_idx = (jnp.arange(n_words, dtype=jnp.int32)
                * BASES_PER_WORD)[None, :]
    rem = jnp.clip(lengths[:, None] - base_idx, 0, BASES_PER_WORD)
    full = jnp.uint32(0x5555_5555)
    kept = jnp.where(
        rem >= BASES_PER_WORD, jnp.uint32(0xFFFF_FFFF),
        (jnp.uint32(1) << (2 * rem).astype(jnp.uint32)) - jnp.uint32(1))
    return full & ~kept


def read_words_from_upload(packed, nmask, lengths, n_words: int):
    """(packed uint8[N, ceil(L/4)], nmask uint8[N, ceil(L/8)]) from
    pack_read_codes_host → (rpacked, rnplane) uint32[N, n_words],
    bit-identical to pack_reads(unpack_read_codes_device(...), ...).

    The 4-base upload bytes ARE the word bytes little-endian (base j
    sits at bits 2*(j%4) of byte j//4, word bits 2*(j%16) of word
    j//16), so code words are a byte regroup; the 1-bit N plane spreads
    to the 2-bit lanes with a Morton expand. Lanes past ``lengths`` are
    forced to N (pack_reads' pad convention).
    """
    N = packed.shape[0]
    nb = 4 * n_words
    if packed.shape[1] < nb:
        packed = jnp.pad(packed, ((0, 0), (0, nb - packed.shape[1])))
    b = packed[:, :nb].astype(jnp.uint32).reshape(N, n_words, 4)
    rpacked = (b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
               | (b[:, :, 3] << 24))
    hb = 2 * n_words
    if nmask.shape[1] < hb:
        nmask = jnp.pad(nmask, ((0, 0), (0, hb - nmask.shape[1])))
    h = nmask[:, :hb].astype(jnp.uint32).reshape(N, n_words, 2)
    x = h[:, :, 0] | (h[:, :, 1] << 8)           # 16 N-bits per word
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)  # Morton spread to evens
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x3333_3333)
    x = (x | (x << 1)) & jnp.uint32(0x5555_5555)
    rnplane = x | _tail_n_mask(lengths, n_words)
    return rpacked.astype(jnp.uint32), rnplane.astype(jnp.uint32)


def _rev2bit(x):
    """Reverse the sixteen 2-bit lanes of each uint32."""
    x = ((x & jnp.uint32(0x3333_3333)) << 2) \
        | ((x >> 2) & jnp.uint32(0x3333_3333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) \
        | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) \
        | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def revcomp_words(rpacked, rnplane, lengths, L: int | None = None):
    """Word-space reverse complement: bit-identical to
    pack_reads(revcomp_batch(codes), lengths, nw) given
    (rpacked, rnplane) = pack_reads(codes, lengths, nw) with
    L = codes.shape[1] (lanes ≥ L carry pack_reads' pad: code 00,
    N-bit 01; defaults to every lane in the words).

    rc word u covers rc bases 16u..16u+15 = comp(fwd bases
    len-1-16u .. len-16(u+1)): one per-row word gather + a funnel shift
    by the row-constant 2*(len mod 16), a 2-bit-lane reversal, and the
    complement (XOR on ACGT lanes; N lanes forced to the pad pattern
    01, matching alphabet.COMP_CODE[5] == 5 → packed 01)."""
    N, nw = rpacked.shape
    lengths = lengths.astype(jnp.int32)
    # fw[0] = guard zero word; fw[1 + w] = word w; fw[nw + 1] = guard
    def padded(a):
        z = jnp.zeros((N, 1), jnp.uint32)
        return jnp.concatenate([z, a, z], axis=1)

    fp, fn = padded(rpacked), padded(rnplane)
    u = jnp.arange(nw, dtype=jnp.int32)[None, :]
    s = lengths[:, None] - 16 * (u + 1)          # fwd base of rc word u
    w0 = jnp.clip(jnp.floor_divide(s, 16) + 1, 0, nw)  # guard-offset idx
    rem = (lengths % 16).astype(jnp.uint32)[:, None]
    sh = 2 * rem

    def vword(a):
        lo = jnp.take_along_axis(a, w0, axis=1)
        hi = jnp.take_along_axis(a, w0 + 1, axis=1)
        return jnp.where(
            sh == 0, lo,
            (lo >> sh) | (hi << ((jnp.uint32(32) - sh) % 32)))

    code = _rev2bit(vword(fp))
    nbit = _rev2bit(vword(fn))
    comp = code ^ jnp.uint32(0xFFFF_FFFF)
    # N lanes (and the tail pad) carry code 01 / nbit 01, exactly the
    # byte path's COMP_CODE[5] = 5 → (5 & 3) = 1 packing
    tail = _tail_n_mask(lengths, nw)
    nmask2 = nbit | tail
    rc_code = (comp & ~(jnp.uint32(3) * nmask2)) | nmask2
    if L is not None and L < 16 * nw:
        # lanes >= L (past the byte block): pack_reads pads code 00
        lane = np.arange(16 * nw) < L
        lmask = np.zeros(nw, np.uint32)
        for w in range(nw):
            bits = np.uint32(0)
            for t in range(16):
                if lane[16 * w + t]:
                    bits |= np.uint32(3) << np.uint32(2 * t)
            lmask[w] = bits
        rc_code = rc_code & jnp.asarray(lmask)[None, :]
    return rc_code.astype(jnp.uint32), nmask2.astype(jnp.uint32)


def unpack_words_to_codes(rpacked, rnplane, L: int):
    """(rpacked, rnplane) uint32[N, nw] → uint8[N, L] read codes with
    N restored as code 5 (the read-code convention — genome-N 4 never
    occurs in reads). Inverse of pack_reads for valid read codes."""
    sh = (jnp.arange(BASES_PER_WORD, dtype=jnp.uint32) * 2)[None, None, :]
    code = ((rpacked[:, :, None] >> sh) & jnp.uint32(3))
    isn = ((rnplane[:, :, None] >> sh) & jnp.uint32(1))
    out = jnp.where(isn == 1, jnp.uint32(5), code)
    N, nw = rpacked.shape
    return out.reshape(N, nw * BASES_PER_WORD)[:, :L].astype(jnp.uint8)


def pack_reads(codes, lengths, n_words: int):
    """uint8[N, L] read codes → (packed uint32[N, n_words], nplane ...).

    Bases past ``lengths`` are packed as N (callers additionally mask
    tail words). L must be ≤ 16 * n_words.
    """
    N, L = codes.shape
    c = codes.astype(jnp.uint32)
    isn = (c >= 4).astype(jnp.uint32)
    c = c & 3
    pad = n_words * BASES_PER_WORD - L
    if pad:
        c = jnp.pad(c, ((0, 0), (0, pad)))
        isn = jnp.pad(isn, ((0, 0), (0, pad)), constant_values=1)
    shifts = (jnp.arange(BASES_PER_WORD, dtype=jnp.uint32) * 2)[None, None, :]
    cw = c.reshape(N, n_words, BASES_PER_WORD)
    nw = isn.reshape(N, n_words, BASES_PER_WORD)
    packed = jnp.bitwise_or.reduce(cw << shifts, axis=2)
    nplane = jnp.bitwise_or.reduce(nw << shifts, axis=2)
    return packed.astype(jnp.uint32), nplane.astype(jnp.uint32)


def _gather_aligned(ginter, starts, n_words: int, base_off: int):
    """ONE row-gather from the interleaved table, funnel-aligned:
    returns (code_words uint32[N, n_words], n_words uint32[N, n_words])
    for windows beginning at base ``starts[i]`` (clipped reads land in
    the all-N guard words)."""
    w0 = jnp.floor_divide(starts, BASES_PER_WORD) + base_off
    r = (starts - (w0 - base_off) * BASES_PER_WORD).astype(jnp.uint32)  # 0..15
    if ginter.ndim == 2:
        # row128 layout (huge genomes): dense [R, 128] view, 2-row fetch
        both = row128_window_fetch(ginter, 2 * w0, 2 * (n_words + 1))
    else:
        both = gather_window(ginter, 2 * w0, 2 * (n_words + 1),
                             row_words=GATHER_ROW_WORDS)
    both = both.reshape(both.shape[0], n_words + 1, 2)

    def funnel(words):
        sh = (2 * r)[:, None]
        lo = words[:, :-1] >> sh
        hi_shift = (32 - 2 * r)[:, None].astype(jnp.uint32)
        hi = jnp.where(sh == 0, jnp.uint32(0),
                       words[:, 1:] << (hi_shift % 32))
        return (lo | hi).astype(jnp.uint32)

    return funnel(both[:, :, 0]), funnel(both[:, :, 1])


def mismatch_counts(ginter, base_off: int, starts, rpacked,
                    rnplane, lengths):
    """Bit-parallel ungapped mismatch count per row.

    starts int32[N] (window start, genome coords, any value — guard
    words make out-of-range read as N), rpacked/rnplane uint32[N, nw],
    lengths int32[N]. Returns int32[N] mismatches over the first
    ``lengths`` bases (bases past length contribute 0).
    """
    N, nw = rpacked.shape
    ga, na = _gather_aligned(ginter, starts, nw, base_off)
    x = ga ^ rpacked
    bits = ((x | (x >> jnp.uint32(1))) | na | rnplane) & jnp.uint32(_EVEN)
    # tail mask per word: bases beyond length excluded
    base_idx = (jnp.arange(nw, dtype=jnp.int32) * BASES_PER_WORD)[None, :]
    rem = jnp.clip(lengths[:, None] - base_idx, 0, BASES_PER_WORD)
    full = jnp.uint32(0xFFFF_FFFF)
    tail = jnp.where(
        rem >= BASES_PER_WORD, full,
        (jnp.uint32(1) << (2 * rem).astype(jnp.uint32)) - jnp.uint32(1))
    bits = bits & tail
    return jnp.sum(jax_popcount(bits), axis=1).astype(jnp.int32)


def jax_popcount(x):
    import jax

    return jax.lax.population_count(x)


def gather_codes(ginter, base_off: int, starts, length: int):
    """Unpack a byte-code window per row from the packed planes:
    uint8[N, length] with N → code 4. Gathers length/16 words instead of
    ``length`` bytes (the DP window feed)."""
    nw = -(-length // BASES_PER_WORD)
    ga, na = _gather_aligned(ginter, starts, nw, base_off)  # [N, nw] ×2
    # unpack without gathers: word j expands to 16 consecutive base lanes
    sh = (jnp.arange(BASES_PER_WORD, dtype=jnp.uint32) * 2)[None, None, :]
    code = (ga[:, :, None] >> sh) & jnp.uint32(3)          # [N, nw, 16]
    isn = (na[:, :, None] >> sh) & jnp.uint32(1)
    out = jnp.where(isn == 1, jnp.uint32(4), code)
    return out.reshape(ga.shape[0], nw * BASES_PER_WORD)[:, :length] \
        .astype(jnp.uint8)
