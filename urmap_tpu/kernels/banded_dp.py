"""Pallas TPU kernel: batched banded semi-global affine DP.

The flagship compute kernel (SURVEY.md §2.9 / BASELINE north-star:
"banded X-drop extension DP as a Pallas wavefront kernel over VMEM
tiles"). Bit-identical semantics to map/dp.py's jnp reference — same
(score, d0) int32 packing, same tie-breaks — verified by
tests/unit/test_pallas_dp.py against the jnp version and the oracle.

Layout: the band (W = 2·hw+1 positions) lives on the SUBLANE axis and
candidates on the LANE axis, so each DP step is a handful of VPU ops on
[W, R] tiles entirely in VMEM; the L-step recurrence never touches HBM.
The genome windows are pre-gathered by XLA ([N, L+2hw] uint8 — a few MB
for a DP bucket) and streamed in per grid block; the jnp version's
per-step HBM round-trip of the whole carry (the reason it was ~40× off
roofline) disappears.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urmap_tpu.config import ScoreConfig
from urmap_tpu.map.dp import NEG

DEFAULT_BLOCK_R = 256


def _shift_up(x, w, b_idx, fill):
    """y[b] = x[b+1] (y[w-1] = fill) along the sublane (band) axis."""
    rolled = pltpu.roll(x, shift=w - 1, axis=0)   # circular: == shift by -1
    return jnp.where(b_idx == w - 1, fill, rolled)


def _shift_down(x, s, b_idx, fill):
    """y[b] = x[b-s] (y[:s] = fill) along the sublane (band) axis."""
    rolled = pltpu.roll(x, shift=s, axis=0)
    return jnp.where(b_idx < s, fill, rolled)


def _make_kernel(L: int, hw: int, sc: ScoreConfig, block_r: int,
                 wp: int, lp: int, clip_open: int | None):
    """wp/lp: sublane-padded row counts of the window / read slabs.

    Mosaic requires sublane slice starts to be 8-aligned, so the moving
    genome window is kept as a loop-carried slab rotated by a STATIC
    shift of 1 per step; the kernel always reads rows [0:W) / [0:1).

    ``clip_open``: end-clipped mode (map/dp.py banded_from_windows) —
    fresh-start lanes max'd into H each row, early-exit running best in
    the carry; identical packing/semantics to the jnp twin."""
    W = 2 * hw + 1
    S = (L + 2 * hw + 1) if clip_open is not None else (W + 1)
    # plain Python ints: embedded as literals (captured jnp scalars are
    # rejected by pallas_call)
    NEGP = NEG * S
    open_s = sc.gap_open * S
    ext_s = sc.gap_extend * S
    match_s = sc.match * S
    mis_s = sc.mismatch * S
    clip_s = (clip_open or 0) * S

    def kernel(win_ref, read_ref, len_ref, out_ref):
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (W, block_r), 0)
        f_pre = (b_idx + 1) * ext_s
        f_post = open_s + b_idx * ext_s
        lens = len_ref[0:1, :]                       # [1, R]

        H0 = b_idx                                   # packed (0, d0=b-hw)
        E0 = jnp.full((W, block_r), NEGP, jnp.int32)
        early0 = jnp.full((1, block_r), NEGP, jnp.int32)
        U0 = jnp.zeros((W, block_r), jnp.int32)

        def step(i, carry):
            H, E, final, early, U, wslab, rslab = carry
            if clip_open is not None:
                fresh = jnp.where(i == 0, H0, clip_s + b_idx + i)
                H = jnp.maximum(H, jnp.where(i < lens, fresh, NEGP))
            win = wslab[0:W, :]                      # [W, R] uint8
            rd = rslab[0:1, :]                       # [1, R]
            sub = jnp.where(win == rd, match_s, mis_s)
            # straight-diagonal (ungapped) score per band offset: U[b]
            # = S * ungapped score of the M-only placement at
            # cand + (b - hw) — replaces banded_packed's post-DP
            # mismatch_counts re-gather (one VPU add here vs a 3-row
            # window gather + popcount per lane out there)
            U = U + jnp.where(i < lens, sub, 0)
            diag = H + sub
            E = jnp.maximum(_shift_up(H, W, b_idx, NEGP) + open_s,
                            _shift_up(E, W, b_idx, NEGP) + ext_s)
            T = jnp.maximum(diag, E)
            # exclusive running max along the band (deletion chain)
            y = _shift_down(T - f_pre, 1, b_idx, NEGP)
            s = 1
            while s < W:
                y = jnp.maximum(y, _shift_down(y, s, b_idx, NEGP))
                s <<= 1
            H = jnp.maximum(T, y + f_post)
            final = jnp.where(i + 1 == lens, H, final)
            if clip_open is not None:
                row_best = jnp.max(jnp.where(i + 1 < lens, H, NEGP),
                                   axis=0, keepdims=True)
                early = jnp.maximum(early, row_best + clip_s)
            wslab = pltpu.roll(wslab, wp - 1, axis=0)   # row r+1 → row r
            rslab = pltpu.roll(rslab, lp - 1, axis=0)
            return H, E, final, early, U, wslab, rslab

        # int32 slabs: Mosaic's sublane rotate doesn't lower for int8
        _, _, final, early, U, _, _ = jax.lax.fori_loop(
            0, L, step, (H0, E0, H0, early0, U0,
                         win_ref[:].astype(jnp.int32),
                         read_ref[:].astype(jnp.int32)))
        best = jnp.max(final, axis=0)
        # end band offset: FIRST cell holding the last-row max (matches
        # the jnp twin's argmax tie-break)
        b_end = jnp.min(jnp.where(final == best[None, :], b_idx, W), axis=0)
        if clip_open is not None:
            best = jnp.maximum(best, early[0, :])
        # winner's START band offset b0 = best mod S, extracted with an
        # f32 DIVISION (no integer div in Mosaic): exact because |best|
        # ≤ ~max_read_len·|mismatch|·S ≪ 2^23, so operands are exact,
        # an integer quotient is returned exactly (one IEEE rounding of
        # an exactly-representable value), and a fractional one sits
        # ≥ 1/S from the next integer — far beyond the ~2^-12 division
        # error at these magnitudes. (A reciprocal-MULTIPLY here would
        # misfloor exact multiples.) In clip mode b0 may exceed W-1
        # (clipped start rows live outside the band) — the one-hot
        # select then yields 0 and callers must not consume row 2
        # (banded_packed keeps the mismatch_counts path under clip).
        q = jnp.floor(best.astype(jnp.float32)
                      / jnp.float32(S)).astype(jnp.int32)
        b0 = best - q * S
        out_ref[0, :] = best
        out_ref[1, :] = b_end
        out_ref[2, :] = jnp.sum(
            jnp.where(b_idx == b0[None, :], U, 0), axis=0)

    return kernel, W, S


@functools.partial(jax.jit, static_argnames=("hw", "sc", "block_r",
                                             "interpret", "clip_open"))
def pallas_from_windows(windows, reads, lengths, *, hw: int,
                        sc: ScoreConfig, block_r: int = DEFAULT_BLOCK_R,
                        interpret: bool = False,
                        clip_open: int | None = None):
    """Kernel twin of map.dp.banded_from_windows →
    (scores, d0, d1, ungapped).

    ``ungapped`` (the 4th return, which the jnp twin does not produce)
    is the straight-diagonal M-only score at POS = cand + d0, equal by
    construction to banded_packed's mismatch_counts rescore there —
    accumulated in-kernel so the caller skips that whole window
    re-gather. Meaningless under ``clip_open`` (see _make_kernel)."""
    N, L = reads.shape
    wlen = L + 2 * hw
    assert windows.shape == (N, wlen)

    R = block_r
    npad = -(-N // R) * R
    wp = -(-wlen // 32) * 32   # int8 sublane tile alignment
    lp = -(-L // 32) * 32
    win_t = jnp.pad(windows, ((0, npad - N), (0, wp - wlen))).T  # [wp, Np]
    reads_t = jnp.pad(reads, ((0, npad - N), (0, lp - L))).T     # [lp, Np]
    lens_p = jnp.pad(lengths, (0, npad - N)).reshape(1, npad)    # [1, Np]

    kernel, W, S = _make_kernel(L, hw, sc, R, wp, lp, clip_open)
    packed = pl.pallas_call(
        kernel,
        grid=(npad // R,),
        in_specs=[
            pl.BlockSpec((wp, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.int32),
        interpret=interpret,
    )(win_t, reads_t, lens_p)
    d1 = packed[1, :N] - hw
    # U = S·ungapped exactly (every sub term is a multiple of S)
    ung = jnp.floor_divide(packed[2, :N], S).astype(jnp.int32)
    packed = packed[0, :N]

    scores = jnp.floor_divide(packed, S)
    b0 = packed - scores * S
    d0 = b0.astype(jnp.int32) - hw
    return scores.astype(jnp.int32), d0, d1, ung


@functools.partial(jax.jit, static_argnames=("hw", "sc", "block_r",
                                             "interpret", "clip_open"))
def banded_semiglobal_pallas(genome, cand_starts, reads, lengths, *,
                             hw: int, sc: ScoreConfig,
                             block_r: int = DEFAULT_BLOCK_R,
                             interpret: bool = False,
                             clip_open: int | None = None):
    """Drop-in twin of map.dp.banded_semiglobal (same signature/returns)."""
    N, L = reads.shape
    G = genome.shape[0]
    wlen = L + 2 * hw
    widx = cand_starts[:, None] - hw + jnp.arange(wlen, dtype=jnp.int32)[None, :]
    windows = jnp.take(genome, jnp.clip(widx, 0, G - 1).astype(jnp.int32),
                       axis=0)                                  # [N, wlen]
    scores, d0, d1, _kung = pallas_from_windows(windows, reads, lengths,
                                                hw=hw, sc=sc,
                                                block_r=block_r,
                                                interpret=interpret,
                                                clip_open=clip_open)

    # ungapped rescore at POS = cand + d0 (M-only CIGAR fast path), same
    # as the jnp version. NOT _kung: this twin's per-element window
    # clamp can repeat boundary codes for out-of-range candidates, and
    # the equality contract here is with banded_semiglobal's explicit
    # re-gather (banded_packed is the production path that consumes the
    # in-kernel rescore).
    pos = cand_starts + d0
    gidx = pos[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    gcodes = jnp.take(genome, jnp.clip(gidx, 0, G - 1).astype(jnp.int32),
                      axis=0)
    in_read = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    ungapped = jnp.sum(
        jnp.where(in_read,
                  jnp.where(gcodes == reads, sc.match, sc.mismatch),
                  0).astype(jnp.int32), axis=-1)
    return scores, d0, ungapped, lengths + d1 - d0
