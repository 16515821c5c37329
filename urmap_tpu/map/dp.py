"""Banded semi-global affine-gap DP, batched over candidates (jnp).

This is the verification/extension stage (reference's banded X-drop DP,
SURVEY.md §2.9) re-designed for TPU: instead of one scalar DP per read with
early exit, thousands of independent (read, candidate-window) DPs run as one
fixed-shape vectorized computation — rows advance with `lax.scan`, the band
lives on the last (lane) axis, and the within-row deletion chain is a
max-plus prefix scan in log2(W) shift/max steps.

Semantics (must exactly match tests/oracle/oracle.semiglobal_scan):
  - the read is aligned in full (semi-global); gaps are affine
    (open = first base, extend = each further base);
  - the alignment may start at any offset d0 ∈ [-hw, +hw] from the
    candidate start (free start within band) and end freely;
  - the true start offset is tracked through the DP by packing
    (score, d0) into one int32: packed = score * S + (d0 + hw), S = W + 1.
    All max() choices then tie-break toward larger d0, deterministically.

Scores are returned per candidate; CIGARs are recomputed host-side only
for the winning gapped alignments (map/cigar.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from urmap_tpu.config import ScoreConfig

NEG = -(1 << 20)

_ON_TPU: bool | None = None


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. the axon PJRT
    plugin, whose platform name differs but whose device_kind is TPU)."""
    global _ON_TPU
    if _ON_TPU is None:
        dev = jax.devices()[0]
        _ON_TPU = ("tpu" in dev.platform.lower()
                   or "TPU" in getattr(dev, "device_kind", ""))
    return _ON_TPU


def banded_dispatch(genome, cand_starts, reads, lengths, *, hw: int,
                    sc: ScoreConfig, use_pallas: bool = True,
                    clip_open: int | None = None):
    """banded_semiglobal, via the Pallas kernel on TPU backends.

    URMAP_NO_DP_KERNEL=1 forces the jnp path (Mosaic escape hatch,
    flipped by kernels/preflight.py on a numerics mismatch)."""
    if (use_pallas and on_tpu()
            and os.environ.get("URMAP_NO_DP_KERNEL") != "1"):
        from urmap_tpu.kernels.banded_dp import banded_semiglobal_pallas

        return banded_semiglobal_pallas(genome, cand_starts, reads,
                                        lengths, hw=hw, sc=sc,
                                        clip_open=clip_open)
    return banded_semiglobal(genome, cand_starts, reads, lengths,
                             hw=hw, sc=sc, clip_open=clip_open)


def _shift_right(x, s, fill):
    pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def _shift_left(x, s, fill):
    pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def _exclusive_runmax(x, fill):
    """y[..., b] = max(x[..., :b]) (fill for b=0), in log2 steps."""
    y = _shift_right(x, 1, fill)
    s = 1
    while s < x.shape[-1]:
        y = jnp.maximum(y, _shift_right(y, s, fill))
        s <<= 1
    return y


def banded_from_windows(windows, reads, lengths, *, hw: int,
                        sc: ScoreConfig, clip_open: int | None = None):
    """Core banded DP over pre-gathered genome windows.

    windows uint8[N, L + 2*hw] (row n = genome[cand_n - hw : +L + hw],
    out-of-range cells = any N code), reads uint8[N, L], lengths
    int32[N]. Returns (scores int32[N], d0 int32[N], d1 int32[N]).

    ``d1`` is the END diagonal offset of the winning full-read
    alignment: the aligned reference span is ``lengths + d1 - d0``
    (pure-M alignments have d1 == d0). Ties across band cells with the
    same packed (score, d0) break toward the LOWEST band index — the
    Pallas kernel reproduces this exactly. In clip mode d1 still refers
    to the LAST-ROW maximum, so it is meaningless when the early-exit
    lane wins; clip-mode callers must not consume it (map/pair.py keeps
    the read-length TLEN proxy under -endclip).

    ``clip_open`` (TPU-friendly X-drop analog, SURVEY.md §2.9): when
    set, the alignment may ENTER at any read row (bases before it
    soft-clipped) and EXIT at any read row (bases after it clipped),
    each clipped side charged ``clip_open`` once. Implemented with no
    data-dependent control flow: a fresh-start lane is max'd into H
    every row, and a running best-early-exit rides the scan carry. The
    (score, start) packing widens so d0 covers [-hw, len-1+hw]:
    POS = cand + d0 exactly as in the unclipped case.
    """
    N, L = reads.shape
    W = 2 * hw + 1
    # packing stride: d0 + hw ∈ [0, W-1] unclipped, [0, L-1+2*hw] clipped
    S = (L + 2 * hw + 1) if clip_open is not None else (W + 1)
    NEGP = jnp.int32(NEG * S)
    open_s = jnp.int32(sc.gap_open * S)
    ext_s = jnp.int32(sc.gap_extend * S)
    match_s = jnp.int32(sc.match * S)
    mis_s = jnp.int32(sc.mismatch * S)

    b_idx = jnp.arange(W, dtype=jnp.int32)
    # F-scan constants: F[b] = runmax_{k<b}(T[k] - (k+1)*ext) + open + b*ext
    f_pre = (b_idx + 1) * ext_s
    f_post = open_s + b_idx * ext_s

    H0 = jnp.broadcast_to(b_idx, (N, W)).astype(jnp.int32)  # score 0, d0 = b - hw
    E0 = jnp.full((N, W), NEGP, jnp.int32)
    lengths_col = lengths[:, None]

    def row(carry, i):
        H, E, final, early = carry
        if clip_open is not None and i is not None:
            # fresh start: first aligned base = read base i (i clipped),
            # d0 = b - hw + i, packed d-term = b + i; no penalty at i=0
            fresh = jnp.where(
                i == 0, H0,
                jnp.int32(clip_open) * jnp.int32(S) + b_idx[None, :] + i)
            H = jnp.maximum(H, jnp.where(i < lengths_col, fresh, NEGP))
        sub = jnp.where(
            jax.lax.dynamic_slice_in_dim(windows, i, W, axis=1)
            == reads[:, i][:, None],
            match_s, mis_s,
        )
        diag = H + sub
        E = jnp.maximum(_shift_left(H, 1, NEGP) + open_s,
                        _shift_left(E, 1, NEGP) + ext_s)
        T = jnp.maximum(diag, E)
        F = _exclusive_runmax(T - f_pre, NEGP) + f_post
        H = jnp.maximum(T, F)
        final = jnp.where(i + 1 == lengths_col, H, final)
        if clip_open is not None:
            # early exit after row i (+clip penalty), rows within length
            row_best = jnp.max(jnp.where(i + 1 < lengths_col, H, NEGP),
                               axis=-1)
            early = jnp.maximum(early,
                                row_best + jnp.int32(clip_open) * jnp.int32(S))
        return (H, E, final, early), None

    # scan over read rows; `windows` row slice moves with i so the band
    # stays centered on the candidate diagonal
    def row_fn(carry, i):
        return row(carry, i)

    early0 = jnp.full((N,), NEG * S, jnp.int32)
    (H, E, final, early), _ = jax.lax.scan(
        row_fn, (H0, E0, H0, early0), jnp.arange(L, dtype=jnp.int32))

    packed = jnp.max(final, axis=-1)
    # end diagonal offset: first band cell holding the last-row max
    # (argmax ties → lowest index; kernel twin matches)
    d1 = jnp.argmax(final, axis=-1).astype(jnp.int32) - hw
    if clip_open is not None:
        packed = jnp.maximum(packed, early)
    scores = jnp.floor_divide(packed, S)
    b0 = packed - scores * S
    d0 = b0.astype(jnp.int32) - hw
    return scores.astype(jnp.int32), d0, d1


@functools.partial(jax.jit, static_argnames=("hw", "sc", "clip_open"))
def banded_semiglobal(genome, cand_starts, reads, lengths, *,
                      hw: int, sc: ScoreConfig,
                      clip_open: int | None = None):
    """Batched banded DP (byte-genome reference path).

    Args:
      genome: uint8[G] genome codes (HBM-resident).
      cand_starts: int32[N] global candidate start positions (where read
        base 0 is expected). Invalid candidates may hold any value — the
        caller masks their scores.
      reads: uint8[N, L] strand-applied read codes (padded).
      lengths: int32[N] true read lengths.
      hw: band half-width (static).
      sc: ScoreConfig (static).

    Returns:
      scores: int32[N] best alignment score (full read, len==0 → 0).
      d0: int32[N] alignment start offset in [-hw, hw]; POS = cand + d0.
      ungapped: int32[N] ungapped score at that POS (match/mismatch only);
        ungapped == score ⇒ an M-only CIGAR is co-optimal.
      span: int32[N] aligned reference span (= lengths + d1 - d0;
        meaningless under clip_open — see banded_from_windows).
    """
    N, L = reads.shape
    G = genome.shape[0]
    wlen = L + 2 * hw
    # windows[n, :] = genome[cand - hw : cand + L + hw], clipped into range
    # (clipped cells read boundary codes — separators are N, auto-mismatch)
    widx = cand_starts[:, None] - hw + jnp.arange(wlen, dtype=jnp.int32)[None, :]
    windows = jnp.take(genome, jnp.clip(widx, 0, G - 1).astype(jnp.int32), axis=0)
    scores, d0, d1 = banded_from_windows(windows, reads, lengths, hw=hw,
                                         sc=sc, clip_open=clip_open)

    # ungapped rescore at POS = cand + d0 (for the M-only CIGAR fast path)
    pos = cand_starts + d0
    gidx = pos[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    gcodes = jnp.take(genome, jnp.clip(gidx, 0, G - 1).astype(jnp.int32), axis=0)
    in_read = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    ungapped = jnp.sum(
        jnp.where(in_read,
                  jnp.where(gcodes == reads, sc.match, sc.mismatch),
                  0).astype(jnp.int32),
        axis=-1)
    return scores, d0, ungapped, lengths + d1 - d0


def banded_packed(ginter, base_off: int, cand_starts, reads,
                  lengths, rpacked, rnplane, *, hw: int, sc: ScoreConfig,
                  use_pallas: bool = True, clip_open: int | None = None):
    """Banded DP fed from the bit-packed genome planes (genome_pack.py).

    Gathers L/16-word windows instead of L bytes and rescores ungapped
    via XOR+popcount — same results as banded_semiglobal for valid read
    codes (no code 4 in reads; alphabet.py invariant).
    Returns (scores, d0, ungapped, span) like banded_semiglobal."""
    from urmap_tpu import genome_pack as gpk

    N, L = reads.shape
    wlen = L + 2 * hw
    windows = gpk.gather_codes(ginter, base_off, cand_starts - hw, wlen)
    if (use_pallas and on_tpu()
            and os.environ.get("URMAP_NO_DP_KERNEL") != "1"):
        from urmap_tpu.kernels.banded_dp import pallas_from_windows

        scores, d0, d1, kung = pallas_from_windows(windows, reads, lengths,
                                                   hw=hw, sc=sc,
                                                   clip_open=clip_open)
        if clip_open is None:
            # in-kernel straight-diagonal rescore (same value as the
            # mismatch_counts path below by construction — preflight and
            # tests/unit/test_pallas_dp.py compare them): skips a whole
            # 3-row window re-gather + popcount per DP lane. Under clip
            # the winner's start may sit outside the band rows, so the
            # kernel's U select is meaningless there — re-gather.
            return scores, d0, kung, lengths + d1 - d0
    else:
        scores, d0, d1 = banded_from_windows(windows, reads, lengths,
                                             hw=hw, sc=sc,
                                             clip_open=clip_open)
    mm = gpk.mismatch_counts(ginter, base_off, cand_starts + d0,
                             rpacked, rnplane, lengths)
    ungapped = ((lengths - mm) * sc.match + mm * sc.mismatch).astype(jnp.int32)
    return scores, d0, ungapped, lengths + d1 - d0
