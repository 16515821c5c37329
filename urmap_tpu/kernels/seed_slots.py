"""Pallas TPU kernel: fused seed-word extraction + hash + offset select,
fed from the 2-bit word planes.

Kernel twin of map.seed.extract_seed_slots_words (bit-identical outputs,
tested in tests/unit/test_pallas_seed.py). The jnp twin is ~1 ms of u32
funnel/hash work that XLA executes at ~16 ms per 32k batch on the
target platform; like the banded-DP kernel this keeps the whole stage
in VMEM registers.

Layout follows the DP kernel: dense read offsets ride the SUBLANE axis,
reads the LANE axis. The word→offset upsample (dense row j needs word
j//16, j//16+1, j//16+2) is THREE tiny MXU matmuls per plane against
static 0/1 expansion matrices, done in two 16-bit halves so float32
stays exact — Mosaic has no sublane repeat, but it has a systolic
array. The per-read seed-offset select is a log2 funnel of conditional
sublane rolls (as in the DP kernel); validity rides bit 31 of the slot
word so one funnel serves both.

Hash is int32 two's-complement (logical right shifts), bit-identical to
hashing.hash_words. Works for any k ≤ 32 (the byte-path kernel's
k % 4 restriction is gone) and slot_bits ≤ 30 (bit 31 = validity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_R = 512


def supports(k: int, slot_bits: int) -> bool:
    """Shapes the kernel handles; callers fall back to the jnp twin
    otherwise (map.seed.extract_seed_slots_words_dispatch)."""
    return 1 <= k <= 32 and slot_bits <= 30


def _i32(u: int) -> int:
    """uint32 literal -> the int32 with the same bit pattern."""
    return u - (1 << 32) if u >= (1 << 31) else u


def _hash_i32(lo, hi, slot_bits: int):
    """hashing.hash_words in int32 two's-complement (bit-identical:
    mul/add/xor wrap the same; right shifts are logical)."""
    srl = jax.lax.shift_right_logical
    h = lo * jnp.int32(_i32(0x9E3779B1))
    h = h ^ (hi * jnp.int32(_i32(0x85EBCA6B)))
    h = h ^ srl(h, jnp.int32(16))
    h = h * jnp.int32(_i32(0x7FEB352D))
    h = h ^ srl(h, jnp.int32(15))
    h = h * jnp.int32(_i32(0x846CA68B))
    h = h ^ srl(h, jnp.int32(16))
    return h & jnp.int32((1 << slot_bits) - 1)


def _rev2bit_i32(x):
    """Reverse the sixteen 2-bit lanes of each int32 (u32 semantics)."""
    srl = jax.lax.shift_right_logical
    m1, m2, m3 = 0x33333333, 0x0F0F0F0F, 0x00FF00FF
    x = ((x & m1) << 2) | (srl(x, jnp.int32(2)) & m1)
    x = ((x & m2) << 4) | (srl(x, jnp.int32(4)) & m2)
    x = ((x & m3) << 8) | (srl(x, jnp.int32(8)) & m3)
    return (x << 16) | srl(x, jnp.int32(16))


def _make_kernel(L: int, k: int, q: int, slot_bits: int, nwp: int,
                 mp: int, qp: int, block_r: int):
    m = L - k + 1
    # plain Python ints: embedded as literals (captured jnp scalars are
    # rejected by pallas_call — same rule as kernels/banded_dp.py)
    OKBIT = -2147483648                      # bit 31

    def kernel(code_ref, nref, off_ref, e_ref, out_ref):
        srl = jax.lax.shift_right_logical
        sh_row = jax.lax.broadcasted_iota(jnp.int32, (mp, block_r), 0)
        sh = 2 * (sh_row % 16)               # funnel shift per dense row
        e = e_ref[...]                       # [3*mp, nwp] f32 expansion

        def expand(slab):
            # [nwp, R] i32 -> (M1, M2, M3) [mp, R], Mi[j] = word j//16+i
            lo16 = (slab & 0xFFFF).astype(jnp.float32)
            hi16 = srl(slab, jnp.int32(16)).astype(jnp.float32)
            # HIGHEST: default MXU precision rounds f32 operands through
            # bf16 (exact only to 2^8) — the 16-bit halves need the
            # multi-pass exact decomposition (interpret mode can't catch
            # this; tools/check_kernels.py on-chip does).
            mlo = jax.lax.dot(e, lo16,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            mhi = jax.lax.dot(e, hi16,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            full = mlo.astype(jnp.int32) | (mhi.astype(jnp.int32) << 16)
            return full[0:mp], full[mp : 2 * mp], full[2 * mp : 3 * mp]

        def funnel(w0, w1):
            hi_sh = (32 - sh) % 32
            return jnp.where(sh == 0, w0,
                             srl(w0, sh) | (w1 << hi_sh))

        cw = code_ref[:].astype(jnp.int32)   # [nwp, R]
        nw_ = nref[:].astype(jnp.int32)
        c1, c2, c3 = expand(cw)
        n1, n2, n3 = expand(nw_)
        A = funnel(c1, c2)                   # bases j..j+15, LSB-first
        nA = funnel(n1, n2)
        if k > 16:
            Bw = funnel(c2, c3)
            nB = funnel(n2, n3)
        if k <= 16:
            lo = srl(_rev2bit_i32(A), jnp.int32(32 - 2 * k))
            hi = jnp.zeros_like(lo)
            okbits = nA & _i32((1 << (2 * k)) - 1)
        elif k == 32:
            hi, lo = _rev2bit_i32(A), _rev2bit_i32(Bw)
            okbits = nA | nB
        else:
            ra, rb = _rev2bit_i32(A), _rev2bit_i32(Bw)
            hb = 2 * (k - 16)
            hi = srl(ra, jnp.int32(32 - hb))
            lo = (ra << hb) | srl(rb, jnp.int32(32 - hb))
            okbits = nA | (nB & ((1 << hb) - 1))
        slots = _hash_i32(lo, hi, slot_bits)             # rows [0:m)
        slotflag = jnp.where(okbits == 0, slots | OKBIT, slots)

        # per-read (lane) offset select: log2 funnel of conditional rolls
        out = jnp.zeros((qp, block_r), jnp.int32)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (qp, block_r), 0)
        oslab = off_ref[:].astype(jnp.int32)             # [qp, R]
        for qq in range(q):
            if qq:
                oslab = pltpu.roll(oslab, qp - 1, axis=0)
            off = oslab[0:1, :]                          # [1, R]
            cur = slotflag
            b = 0
            while (1 << b) <= m - 1:
                d = 1 << b
                cur = jnp.where((srl(off, jnp.int32(b)) & 1) == 1,
                                pltpu.roll(cur, mp - d, axis=0), cur)
                b += 1
            out = jnp.where(q_idx == qq, cur[0:1, :], out)
        out_ref[...] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("L", "k", "q", "slot_bits",
                                             "block_r", "interpret"))
def seed_slots_words_pallas(rpacked, rnplane, lengths, L: int, *, k: int,
                            q: int, slot_bits: int,
                            block_r: int = DEFAULT_BLOCK_R,
                            interpret: bool = False):
    """Kernel twin of map.seed.extract_seed_slots_words — identical
    returns: (slots uint32[N, Q], offs int32[N, Q], valid bool[N, Q])."""
    from urmap_tpu.map.seed import seed_offsets

    N, nw = rpacked.shape
    if L < k:
        raise ValueError(f"read block width {L} < word length {k}")
    assert supports(k, slot_bits)
    m = L - k + 1
    offs = seed_offsets(lengths, k, q)
    offs_c = jnp.clip(offs, 0, m - 1)

    R = block_r
    npad = -(-N // R) * R
    nwp = -(-(nw + 2) // 8) * 8       # +2 guard words, 8-row sublane tile
    mp = -(-m // 8) * 8
    qp = -(-q // 8) * 8
    cw = jnp.pad(rpacked, ((0, npad - N), (0, nwp - nw))).T
    # guard N-plane words read as all-N (pads beyond the block are N)
    nw_t = jnp.pad(rnplane, ((0, npad - N), (0, nwp - nw)),
                   constant_values=0x5555_5555).T
    offs_t = jnp.pad(offs_c, ((0, npad - N), (0, qp - q))).T

    # expansion matrices: E[i*mp + j, w] = 1 iff w == j//16 + i
    e = np.zeros((3 * mp, nwp), np.float32)
    for i in range(3):
        for j in range(mp):
            w = j // 16 + i
            if w < nwp:
                e[i * mp + j, w] = 1.0
    e_j = jnp.asarray(e)

    kernel = _make_kernel(L, k, q, slot_bits, nwp, mp, qp, R)
    out = pl.pallas_call(
        kernel,
        grid=(npad // R,),
        in_specs=[
            pl.BlockSpec((nwp, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nwp, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * mp, nwp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qp, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, npad), jnp.int32),
        interpret=interpret,
    )(cw.astype(jnp.int32), nw_t.astype(jnp.int32), offs_t, e_j)

    flags = out[:q, :N].T                                  # [N, Q] i32
    slots = (flags & jnp.int32((1 << slot_bits) - 1)).astype(jnp.uint32)
    valid = (flags < 0) & (lengths >= k)[:, None]
    return slots, offs, valid
