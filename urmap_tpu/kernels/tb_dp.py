"""Traceback-bits banded DP: re-DP the gapped WINNERS with per-cell
direction bits, so CIGARs decode from an O(L) bit-walk instead of a
host O(L·(L+pad)) DP re-run.

SURVEY.md §7 Phase 2 specified this design ("2-bit traceback matrix in
VMEM → packed traceback words D2H → host CIGAR decode"); the round-4
bench measured its absence as THE system bottleneck (~190 ms/batch of
host banded-DP recompute at 8% gapped reads — 417k → 163k reads/s SE).

Semantics: same banded semi-global affine recurrence as map/dp.py
banded_from_windows, with the start FORCED at the band center — the
pass re-anchors at the already-selected winner POS, so the alignment
must begin exactly there, mirroring the host traceback contract
(map/cigar.py traceback: "alignment starts exactly at POS, no leading
deletion"). The free end stays: first-max band cell of the final row.

Per-cell 4-bit code, matching the host walk's tie-break order exactly:
  bits 0-1  hc: how H[i][b] was reached — 0 diag (M/X), 1 E (I),
            2 F (D); priority diag > E > F on value ties
  bit  2    ee: E stays in the gap (extend strictly beats the H+open
            entry — the host walk leaves E when H[i-1,j]+open == E)
  bit  3    fe: F stays in the gap (same rule against H[i,j-1]+open)

Packing: within each group of 8 read rows, acc = acc*16 + code per
step — so step i of group g (rows [8g, min(8g+8, L))) sits at nibble
(hi-1-i) where hi = min(8g+8, L). Words for band cell b of group g
live at row g*Wp + b of the [NWORDS, N] output (Wp = W padded to 8 so
every per-group store is sublane-aligned). Decoders: map/cigar.py
decode_tb_bits (host reference) and the C++ batch twin.

A winner whose optimal path leaves the re-anchored band (net indel
drift beyond ±hw of POS) comes back with a score BELOW the device
winner score; callers compare and fall back to the host DP for exactly
those rows (map/cigar.py cigars_nm_blob).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urmap_tpu.config import ScoreConfig
from urmap_tpu.map.dp import NEG, _exclusive_runmax, _shift_left, _shift_right

DEFAULT_BLOCK_R = 128


def tb_layout(L: int, hw: int) -> tuple[int, int, int]:
    """(W, Wp, GROUPS) for the bits layout; NWORDS = GROUPS * Wp."""
    W = 2 * hw + 1
    Wp = -(-W // 8) * 8
    return W, Wp, -(-L // 8)


def tb_words(L: int, hw: int) -> int:
    _, Wp, groups = tb_layout(L, hw)
    return groups * Wp


def dops_words(L: int) -> int:
    """Padded row count of the per-row (d, op) record matrix: one byte
    per read row (4 rows/int32 word), padded to a sublane tile."""
    return -(-(-(-L // 4)) // 8) * 8


def tb_from_windows(windows, reads, lengths, *, hw: int, sc: ScoreConfig):
    """jnp twin → (score int32[N], bend int32[N], bits int32[NWORDS, N]).

    windows uint8[N, L+2hw] = genome[pos-hw : pos+L+hw] per row; start
    forced at band center (alignment begins exactly at pos). A
    lax.scan over the 8-step nibble groups (a fully unrolled L-step
    graph made XLA:CPU compiles explode); steps past L inside the last
    group are masked no-ops, so the packing matches the kernel's exact
    fori bounds."""
    N, L = reads.shape
    W, Wp, groups = tb_layout(L, hw)
    NEGV = jnp.int32(NEG)
    open_ = jnp.int32(sc.gap_open)
    ext = jnp.int32(sc.gap_extend)
    match = jnp.int32(sc.match)
    mis = jnp.int32(sc.mismatch)

    b_idx = jnp.arange(W, dtype=jnp.int32)
    f_pre = (b_idx + 1) * ext
    f_post = open_ + b_idx * ext
    lengths_col = lengths[:, None]

    H0 = jnp.broadcast_to(jnp.where(b_idx == hw, 0, NEGV),
                          (N, W)).astype(jnp.int32)
    E0 = jnp.full((N, W), NEGV, jnp.int32)

    def group_step(carry, g):
        H, E, final = carry
        acc = jnp.zeros((N, W), jnp.int32)
        for j in range(8):
            i = g * 8 + j
            live = i < L                      # traced scalar, last group
            ic = jnp.minimum(i, L - 1)
            win = jax.lax.dynamic_slice_in_dim(windows, ic, W, axis=1)
            rd = jax.lax.dynamic_slice_in_dim(reads, ic, 1, axis=1)
            sub = jnp.where(win == rd, match, mis)
            diag = H + sub
            eopen = _shift_left(H, 1, NEGV) + open_
            En = jnp.maximum(eopen, _shift_left(E, 1, NEGV) + ext)
            ee = (eopen != En).astype(jnp.int32)
            T = jnp.maximum(diag, En)
            F = _exclusive_runmax(T - f_pre, NEGV) + f_post
            Hn = jnp.maximum(T, F)
            fe = (_shift_right(Hn, 1, NEGV) + open_ != F).astype(jnp.int32)
            hc = jnp.where(Hn == diag, 0, jnp.where(Hn == En, 1, 2))
            acc = jnp.where(live, acc * 16 + (hc | (ee << 2) | (fe << 3)),
                            acc)
            final = jnp.where(i + 1 == lengths_col, Hn, final)
            H = jnp.where(live, Hn, H)
            E = jnp.where(live, En, E)
        return (H, E, final), acc

    (_, _, final), accs = jax.lax.scan(
        group_step, (H0, E0, H0), jnp.arange(groups, dtype=jnp.int32))
    best = jnp.max(final, axis=-1)
    bend = jnp.min(jnp.where(final == best[:, None], b_idx, W), axis=-1)
    bits = jnp.pad(accs, ((0, 0), (0, 0), (0, Wp - W))) \
        .transpose(1, 0, 2).reshape(N, groups * Wp)
    return best, bend, bits.T


def _make_tb_kernel(L: int, hw: int, sc: ScoreConfig, block_r: int,
                    wp: int, lp: int):
    """Pallas twin of tb_from_windows — same layout/roll tricks as
    kernels/banded_dp.py (band on sublanes, candidates on lanes, static
    slab rotate), plus the bits accumulator with per-group stores at
    STATIC sublane offsets (g*Wp, Wp multiple of 8)."""
    W, Wp, groups = tb_layout(L, hw)
    NEGV = NEG
    open_ = sc.gap_open
    ext = sc.gap_extend
    match = sc.match
    mis = sc.mismatch

    def _up(x, b_idx, fill):
        rolled = pltpu.roll(x, shift=W - 1, axis=0)
        return jnp.where(b_idx == W - 1, fill, rolled)

    def _down(x, s, b_idx, fill):
        rolled = pltpu.roll(x, shift=s, axis=0)
        return jnp.where(b_idx < s, fill, rolled)

    def kernel(win_ref, read_ref, len_ref, out_ref, bits_ref):
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (W, block_r), 0)
        f_pre = (b_idx + 1) * ext
        f_post = open_ + b_idx * ext
        lens = len_ref[0:1, :]

        H = jnp.where(b_idx == hw, 0, NEGV)
        E = jnp.full((W, block_r), NEGV, jnp.int32)
        final = H
        wslab = win_ref[:].astype(jnp.int32)
        rslab = read_ref[:].astype(jnp.int32)

        def step(i, carry):
            H, E, final, acc, wslab, rslab = carry
            win = wslab[0:W, :]
            rd = rslab[0:1, :]
            sub = jnp.where(win == rd, match, mis)
            diag = H + sub
            eopen = _up(H, b_idx, NEGV) + open_
            E = jnp.maximum(eopen, _up(E, b_idx, NEGV) + ext)
            ee = (eopen != E).astype(jnp.int32)
            T = jnp.maximum(diag, E)
            y = _down(T - f_pre, 1, b_idx, NEGV)
            s = 1
            while s < W:
                y = jnp.maximum(y, _down(y, s, b_idx, NEGV))
                s <<= 1
            F = y + f_post
            H = jnp.maximum(T, F)
            fe = (_down(H, 1, b_idx, NEGV) + open_ != F).astype(jnp.int32)
            hc = jnp.where(H == diag, 0, jnp.where(H == E, 1, 2))
            acc = acc * 16 + (hc | (ee << 2) | (fe << 3))
            final = jnp.where(i + 1 == lens, H, final)
            wslab = pltpu.roll(wslab, wp - 1, axis=0)
            rslab = pltpu.roll(rslab, lp - 1, axis=0)
            return H, E, final, acc, wslab, rslab

        carry = (H, E, final, jnp.zeros((W, block_r), jnp.int32),
                 wslab, rslab)
        for g in range(groups):
            carry = (carry[0], carry[1], carry[2],
                     jnp.zeros((W, block_r), jnp.int32), carry[4], carry[5])
            carry = jax.lax.fori_loop(g * 8, min(g * 8 + 8, L), step, carry)
            acc = carry[3]
            bits_ref[g * Wp : (g + 1) * Wp, :] = jnp.pad(
                acc, ((0, Wp - W), (0, 0)))
        final = carry[2]
        best = jnp.max(final, axis=0)
        bend = jnp.min(jnp.where(final == best[None, :], b_idx, W), axis=0)
        out_ref[0, :] = best
        out_ref[1, :] = bend

    return kernel, W, Wp, groups


@functools.partial(jax.jit, static_argnames=("hw", "sc", "block_r",
                                             "interpret"))
def tb_from_windows_pallas(windows, reads, lengths, *, hw: int,
                           sc: ScoreConfig,
                           block_r: int = DEFAULT_BLOCK_R,
                           interpret: bool = False):
    """Kernel twin of tb_from_windows → (score, bend, bits[NWORDS, N])."""
    N, L = reads.shape
    wlen = L + 2 * hw
    assert windows.shape == (N, wlen)
    R = block_r
    npad = -(-N // R) * R
    wp = -(-wlen // 32) * 32
    lp = -(-L // 32) * 32
    win_t = jnp.pad(windows, ((0, npad - N), (0, wp - wlen))).T
    reads_t = jnp.pad(reads, ((0, npad - N), (0, lp - L))).T
    lens_p = jnp.pad(lengths, (0, npad - N)).reshape(1, npad)

    kernel, W, Wp, groups = _make_tb_kernel(L, hw, sc, R, wp, lp)
    nwords = groups * Wp
    out, bits = pl.pallas_call(
        kernel,
        grid=(npad // R,),
        in_specs=[
            pl.BlockSpec((wp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nwords, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, npad), jnp.int32),
            jax.ShapeDtypeStruct((nwords, npad), jnp.int32),
        ],
        interpret=interpret,
    )(win_t, reads_t, lens_p)
    return out[0, :N], out[1, :N], bits[:, :N]


def tb_dispatch(windows, reads, lengths, *, hw: int, sc: ScoreConfig,
                use_pallas: bool = True):
    """tb_from_windows via the Pallas kernel on TPU backends
    (URMAP_NO_TB_KERNEL=1 escape hatch, flipped by kernels/preflight.py
    on a numerics mismatch)."""
    import os

    from urmap_tpu.map.dp import on_tpu

    if (use_pallas and on_tpu()
            and os.environ.get("URMAP_NO_TB_KERNEL") != "1"):
        return tb_from_windows_pallas(windows, reads, lengths, hw=hw, sc=sc)
    return tb_from_windows(windows, reads, lengths, hw=hw, sc=sc)


# ---- device backward walk → per-row (d, op) records ("dops") ----
#
# Shipping the raw bits D2H costs ~3 KB/read, and this platform's relay
# moves device→host bytes at ~25-40 MB/s (measured round 5: the bits
# matrix alone added ~590 ms/batch — 193k → 72k reads/s SE). So the
# kernel walks its OWN bits while they are still in VMEM and emits one
# byte per read row:
#
#   rec_i = d | (op << 6)    d  = deletion-run length AFTER read row
#                                 i's op (0..W-1, fits 6 bits)
#                            op = 0 diag (M/X: host compares genome),
#                                 1 insertion (I)
#
# Forward CIGAR = for i ascending: op_i, then d_i 'D's — exactly the
# reversed order of the host bit-walk (map/cigar.py decode_tb_row,
# which remains the tested reference: dops replay == bit-walk decode,
# byte-for-byte). Four records pack per int32 word
# (rec_i at byte i%4 of word i//4) → ~40 words/read D2H at L=150, 19x
# less than the bits. A per-lane walk_ok bit (walk ended at the band
# center in state H) guards structural validity; the host score/pos
# compare still gates semantic staleness.
#
# The per-row walk math, vectorized over the band (no per-lane scalar
# loop): from incoming state H at band b, the walk descends through a
# deletion chain whose length is 1 + run-of-ones of
#   link(b) = fe(b) | (hc(b-1) == 2)
# starting at b and going down (fe continues the F gap; a fresh hc==2
# re-enters it) — a log2(W) doubling scan; the landing cell's hc picks
# M vs I. Incoming state E just emits I and moves up one diagonal.


def _runlen_down(link, shift_down_fn, W: int):
    """c(b) = link(b) ? 1 + c(b-1) : 0 (length of the consecutive-ones
    run starting at b going down), in log2(W) doubling steps."""
    c = link
    s = 1
    while s < W:
        c = jnp.where(c == s, c + shift_down_fn(c, s), c)
        s <<= 1
    return c


def dops_from_bits(bits, bend, lengths, *, hw: int, L: int):
    """jnp backward walk over a bits matrix (tb_from_windows layout)
    → (dops int32[DWp, N], walk_ok bool[N]). Reference twin of the
    in-kernel walk; also the CPU production path."""
    W, Wp, _groups = tb_layout(L, hw)
    nwords, N = bits.shape
    DW = -(-L // 4)
    b_ax = jnp.arange(W, dtype=jnp.int32)[None, :]           # [1, W]

    def down(x, s):
        return _shift_right(x, s, 0)

    def body(t, state):
        b_cur, st, recs = state
        i = jnp.int32(L - 1) - t
        g = i // 8
        hi = jnp.minimum(g * 8 + 8, L)
        row = jax.lax.dynamic_slice(bits, (g * Wp, 0), (W, N)).T  # [N, W]
        code = (row >> (4 * (hi - 1 - i))) & 0xF
        act = i == lengths - 1
        b_cur = jnp.where(act, bend, b_cur)
        st = jnp.where(act, 0, st)
        live = i < lengths

        hc = code & 3
        ee = (code >> 2) & 1
        fe = (code >> 3) & 1
        hc2 = (hc == 2).astype(jnp.int32)
        onehot = (b_ax == b_cur[:, None])

        def sel(m):
            return jnp.sum(jnp.where(onehot, m, 0), axis=1)

        link = fe | down(hc2, 1)
        c = _runlen_down(link, down, W)
        start_f = sel(hc2)
        d_h = jnp.where(start_f == 1, 1 + sel(c), 0)
        b_land = b_cur - d_h
        oneland = (b_ax == b_land[:, None])

        def sell(m):
            return jnp.sum(jnp.where(oneland, m, 0), axis=1)

        hc_land = sell(hc)
        op_h = (hc_land == 1).astype(jnp.int32)
        ee_h = sell(ee)
        is_e = (st == 1)
        ee_e = sel(ee)
        d_out = jnp.where(is_e, 0, d_h)
        op_out = jnp.where(is_e, 1, op_h)
        st_next = jnp.where(is_e, ee_e,
                            jnp.where(op_h == 1, ee_h, 0))
        b_next = jnp.where(is_e, b_cur + 1,
                           jnp.where(op_h == 1, b_land + 1, b_land))
        st = jnp.where(live, st_next, st)
        b_cur = jnp.where(live, b_next, b_cur)
        rec = jnp.where(live, d_out | (op_out << 6), 0)
        recs = jax.lax.dynamic_update_slice(recs, rec[None, :], (i, 0))
        return b_cur, st, recs

    b0 = jnp.zeros((N,), jnp.int32)
    st0 = jnp.zeros((N,), jnp.int32)
    recs0 = jnp.zeros((L, N), jnp.int32)
    b_cur, st, recs = jax.lax.fori_loop(0, L, body, (b0, st0, recs0))
    walk_ok = (b_cur == hw) & (st == 0) & (lengths > 0)
    pad = DW * 4 - L
    recs = jnp.pad(recs, ((0, pad), (0, 0))).reshape(DW, 4, N)
    sh = (jnp.arange(4, dtype=jnp.int32) * 8)[None, :, None]
    words = jnp.sum(recs << sh, axis=1)                       # [DW, N]
    DWp = dops_words(L)
    return jnp.pad(words, ((0, DWp - DW), (0, 0))), walk_ok


def tb_dops_from_windows(windows, reads, lengths, *, hw: int,
                         sc: ScoreConfig):
    """jnp production path → (score, dops[DWp, N], walk_ok)."""
    score, bend, bits = tb_from_windows(windows, reads, lengths,
                                        hw=hw, sc=sc)
    dops, walk_ok = dops_from_bits(bits, bend, lengths, hw=hw,
                                   L=reads.shape[1])
    return score, dops, walk_ok


def _make_dops_kernel(L: int, hw: int, sc: ScoreConfig, block_r: int,
                      wp: int, lp: int):
    """Forward DP + in-VMEM backward walk in one kernel. Outputs
    out_ref [8, R] (rows: score, walk_ok) and dops_ref [DWp, R]."""
    W, Wp, groups = tb_layout(L, hw)
    DW = -(-L // 4)
    DWp = dops_words(L)
    NEGV = NEG
    open_ = sc.gap_open
    ext = sc.gap_extend
    match = sc.match
    mis = sc.mismatch

    def _up(x, b_idx, fill):
        rolled = pltpu.roll(x, shift=W - 1, axis=0)
        return jnp.where(b_idx == W - 1, fill, rolled)

    def _down(x, s, b_idx, fill):
        rolled = pltpu.roll(x, shift=s, axis=0)
        return jnp.where(b_idx < s, fill, rolled)

    def kernel(win_ref, read_ref, len_ref, out_ref, dops_ref):
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (W, block_r), 0)
        f_pre = (b_idx + 1) * ext
        f_post = open_ + b_idx * ext
        lens = len_ref[0:1, :]

        H = jnp.where(b_idx == hw, 0, NEGV)
        E = jnp.full((W, block_r), NEGV, jnp.int32)
        final = H
        wslab = win_ref[:].astype(jnp.int32)
        rslab = read_ref[:].astype(jnp.int32)

        def step(i, carry):
            H, E, final, acc, wslab, rslab = carry
            win = wslab[0:W, :]
            rd = rslab[0:1, :]
            sub = jnp.where(win == rd, match, mis)
            diag = H + sub
            eopen = _up(H, b_idx, NEGV) + open_
            E = jnp.maximum(eopen, _up(E, b_idx, NEGV) + ext)
            ee = (eopen != E).astype(jnp.int32)
            T = jnp.maximum(diag, E)
            y = _down(T - f_pre, 1, b_idx, NEGV)
            s = 1
            while s < W:
                y = jnp.maximum(y, _down(y, s, b_idx, NEGV))
                s <<= 1
            F = y + f_post
            H = jnp.maximum(T, F)
            fe = (_down(H, 1, b_idx, NEGV) + open_ != F).astype(jnp.int32)
            hc = jnp.where(H == diag, 0, jnp.where(H == E, 1, 2))
            acc = acc * 16 + (hc | (ee << 2) | (fe << 3))
            final = jnp.where(i + 1 == lens, H, final)
            wslab = pltpu.roll(wslab, wp - 1, axis=0)
            rslab = pltpu.roll(rslab, lp - 1, axis=0)
            return H, E, final, acc, wslab, rslab

        accs = []
        carry = (H, E, final, jnp.zeros((W, block_r), jnp.int32),
                 wslab, rslab)
        for g in range(groups):
            carry = (carry[0], carry[1], carry[2],
                     jnp.zeros((W, block_r), jnp.int32),
                     carry[4], carry[5])
            carry = jax.lax.fori_loop(g * 8, min(g * 8 + 8, L), step,
                                      carry)
            accs.append(carry[3])
        final = carry[2]
        best = jnp.max(final, axis=0)
        bend = jnp.min(jnp.where(final == best[None, :], b_idx, W),
                       axis=0)

        # ---- backward walk over the in-VMEM bits ----
        b_cur = jnp.zeros((1, block_r), jnp.int32)
        st = jnp.zeros((1, block_r), jnp.int32)
        recw = jnp.zeros((1, block_r), jnp.int32)
        words = {}
        for g in range(groups - 1, -1, -1):
            lo, hi = g * 8, min(g * 8 + 8, L)
            acc = accs[g]
            for i in range(hi - 1, lo - 1, -1):
                code = acc & 15
                acc = jax.lax.shift_right_logical(acc, 4)
                act = (i == lens - 1)
                b_cur = jnp.where(act, bend[None, :], b_cur)
                st = jnp.where(act, 0, st)
                live = i < lens

                hc = code & 3
                ee = (code >> 2) & 1
                fe = (code >> 3) & 1
                hc2 = (hc == 2).astype(jnp.int32)
                onehot = b_idx == b_cur

                def sel(m, oh=onehot):
                    return jnp.sum(jnp.where(oh, m, 0), axis=0,
                                   keepdims=True)

                link = fe | _down(hc2, 1, b_idx, 0)
                c = link
                s = 1
                while s < W:
                    c = jnp.where(c == s, c + _down(c, s, b_idx, 0), c)
                    s <<= 1
                start_f = sel(hc2)
                d_h = jnp.where(start_f == 1, 1 + sel(c), 0)
                b_land = b_cur - d_h
                oneland = b_idx == b_land
                hc_land = sel(hc, oneland)
                op_h = (hc_land == 1).astype(jnp.int32)
                ee_h = sel(ee, oneland)
                is_e = st == 1
                ee_e = sel(ee)
                d_out = jnp.where(is_e, 0, d_h)
                op_out = jnp.where(is_e, 1, op_h)
                st_next = jnp.where(is_e, ee_e,
                                    jnp.where(op_h == 1, ee_h, 0))
                b_next = jnp.where(is_e, b_cur + 1,
                                   jnp.where(op_h == 1, b_land + 1,
                                             b_land))
                st = jnp.where(live, st_next, st)
                b_cur = jnp.where(live, b_next, b_cur)
                rec = jnp.where(live, d_out | (op_out << 6), 0)
                recw = recw * 256 + rec
                if i % 4 == 0:
                    words[i // 4] = recw
                    recw = jnp.zeros((1, block_r), jnp.int32)
        walk_ok = ((b_cur == hw) & (st == 0)
                   & (lens > 0)).astype(jnp.int32)
        out_ref[0, :] = best
        out_ref[1, :] = walk_ok[0, :]
        zero = jnp.zeros((1, block_r), jnp.int32)
        dops_ref[...] = jnp.concatenate(
            [words.get(w, zero) for w in range(DW)]
            + [zero] * (DWp - DW), axis=0)

    return kernel, DWp


@functools.partial(jax.jit, static_argnames=("hw", "sc", "block_r",
                                             "interpret"))
def tb_dops_from_windows_pallas(windows, reads, lengths, *, hw: int,
                                sc: ScoreConfig,
                                block_r: int = DEFAULT_BLOCK_R,
                                interpret: bool = False):
    """Kernel twin of tb_dops_from_windows → (score, dops, walk_ok)."""
    N, L = reads.shape
    wlen = L + 2 * hw
    assert windows.shape == (N, wlen)
    R = block_r
    npad = -(-N // R) * R
    wp = -(-wlen // 32) * 32
    lp = -(-L // 32) * 32
    win_t = jnp.pad(windows, ((0, npad - N), (0, wp - wlen))).T
    reads_t = jnp.pad(reads, ((0, npad - N), (0, lp - L))).T
    lens_p = jnp.pad(lengths, (0, npad - N)).reshape(1, npad)

    kernel, DWp = _make_dops_kernel(L, hw, sc, R, wp, lp)
    out, dops = pl.pallas_call(
        kernel,
        grid=(npad // R,),
        in_specs=[
            pl.BlockSpec((wp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((DWp, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, npad), jnp.int32),
            jax.ShapeDtypeStruct((DWp, npad), jnp.int32),
        ],
        interpret=interpret,
    )(win_t, reads_t, lens_p)
    return out[0, :N], dops[:, :N], out[1, :N].astype(bool)


def tb_dops_dispatch(windows, reads, lengths, *, hw: int, sc: ScoreConfig,
                     use_pallas: bool = True):
    """tb_dops_from_windows via the Pallas kernel on TPU backends
    (URMAP_NO_TB_KERNEL=1 escape hatch)."""
    import os

    from urmap_tpu.map.dp import on_tpu

    if (use_pallas and on_tpu()
            and os.environ.get("URMAP_NO_TB_KERNEL") != "1"):
        return tb_dops_from_windows_pallas(windows, reads, lengths,
                                           hw=hw, sc=sc)
    return tb_dops_from_windows(windows, reads, lengths, hw=hw, sc=sc)
