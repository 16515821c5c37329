"""Pallas TPU kernel: fused seed-word extraction + hash + offset select.

Kernel twin of map.seed.extract_seed_slots (bit-identical outputs,
tested in tests/unit/test_pallas_seed.py). The jnp version is ~1 ms of
u32 shift/or/hash work that XLA executes at ~16 ms per 32k batch on the
target platform (tools/profile_prefix.py); like the banded-DP kernel
(kernels/banded_dp.py) this keeps the whole stage in VMEM registers.

Layout follows the DP kernel: read positions ride the SUBLANE axis,
reads the LANE axis, so every dense pass is one VPU op on a [Lp, R]
tile. Mosaic's 8-aligned sublane-slice rule is sidestepped the same way
too — static `pltpu.roll`s stand in for misaligned slices:

  * b4 grouping (4 consecutive bases -> one byte) uses rolls by 1;
  * group accumulation (k/4 byte groups -> (hi, lo) words) rolls by 4;
  * the per-read offset select is a log2 funnel of conditional rolls
    (off is per-READ, i.e. per lane, so the roll is static and the
    lane-mask picks which lanes take it);
  * output row q is accumulated via a row-iota select and written once.

Validity (all-ACGT window) rides bit 31 of the slot word through the
funnel (slot_bits <= 30 leaves it free), so only one funnel runs.

All arithmetic is int32 (two's-complement mul/add/xor match uint32
wraparound; right shifts use lax.shift_right_logical) — the wrapper
reinterprets to uint32, making the hash bit-identical to
hashing.hash_words.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_R = 512


def supports(k: int, slot_bits: int) -> bool:
    """Shapes the kernel handles; callers fall back to the jnp twin
    otherwise (map.seed.extract_seed_slots_dispatch)."""
    lo_bases = min(k, 16)
    return (k % 4 == 0 and (k - lo_bases) % 4 == 0 and k >= 4
            and slot_bits <= 30)


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


def _make_kernel(L: int, k: int, q: int, slot_bits: int, lp: int, qp: int,
                 block_r: int):
    m = L - k + 1
    mg = L - 3                   # 4-base group count
    lo_bases = min(k, 16)
    ng = k // 4
    ng_hi = (k - lo_bases) // 4
    # plain Python int: embedded as a literal (captured jnp scalars are
    # rejected by pallas_call — same rule as kernels/banded_dp.py)
    OKBIT = -2147483648                      # bit 31

    def kernel(read_ref, off_ref, out_ref):
        codes = read_ref[:].astype(jnp.int32)            # [lp, R]

        def up(x, d):
            # y[j] = x[j + d] (rows wrap circularly; rows >= m are
            # garbage and never selected — off <= m-1)
            return pltpu.roll(x, lp - d, axis=0)

        c3 = codes & 3
        # 4-base byte groups at every position j: b4[j] = bases j..j+3
        b4 = ((c3 << 6) | (up(c3, 1) << 4) | (up(c3, 2) << 2) | up(c3, 3))
        # 0/1 int32 validity (bool slabs don't sublane-rotate in Mosaic)
        ok4 = jnp.where(
            (codes | up(codes, 1) | up(codes, 2) | up(codes, 3)) < 4, 1, 0)

        hi = jnp.zeros((lp, block_r), jnp.int32)
        lo = jnp.zeros((lp, block_r), jnp.int32)
        okw = jnp.ones((lp, block_r), jnp.int32)
        gslab = b4
        oslab = ok4
        for g in range(ng):
            if g:
                gslab = up(gslab, 4)
                oslab = up(oslab, 4)
            okw = okw & oslab
            if g < ng_hi:
                hi = (hi << 8) | gslab
            else:
                lo = (lo << 8) | gslab
        slots = _hash_i32(lo, hi, slot_bits)             # [lp, R], rows [0:m)
        slotflag = jnp.where(okw == 1, slots | OKBIT, slots)

        # per-read (lane) offset select: log2 funnel of conditional rolls
        out = jnp.zeros((qp, block_r), jnp.int32)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (qp, block_r), 0)
        offs = off_ref[:].astype(jnp.int32)              # [qp, R]
        oslab2 = offs
        for qq in range(q):
            if qq:
                oslab2 = pltpu.roll(oslab2, qp - 1, axis=0)
            off = oslab2[0:1, :]                         # [1, R]
            cur = slotflag
            b = 0
            while (1 << b) <= m - 1:
                d = 1 << b
                cur = jnp.where((jax.lax.shift_right_logical(
                    off, jnp.int32(b)) & 1) == 1, up(cur, d), cur)
                b += 1
            out = jnp.where(q_idx == qq, cur[0:1, :], out)
        out_ref[...] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "q", "slot_bits",
                                             "block_r", "interpret"))
def seed_slots_pallas(reads, lengths, *, k: int, q: int, slot_bits: int,
                      block_r: int = DEFAULT_BLOCK_R,
                      interpret: bool = False):
    """Kernel twin of map.seed.extract_seed_slots — same signature
    semantics: (slots uint32[N, Q], offs int32[N, Q], valid bool[N, Q])."""
    from urmap_tpu.map.seed import seed_offsets

    N, L = reads.shape
    if L < k:
        raise ValueError(f"read block width {L} < word length {k}")
    assert supports(k, slot_bits)
    m = L - k + 1
    offs = seed_offsets(lengths, k, q)
    offs_c = jnp.clip(offs, 0, m - 1)

    R = block_r
    npad = -(-N // R) * R
    lp = -(-L // 32) * 32        # int8 sublane tile alignment
    qp = -(-q // 8) * 8
    reads_t = jnp.pad(reads, ((0, npad - N), (0, lp - L)),
                      constant_values=5).T                 # [lp, Np] u8
    offs_t = jnp.pad(offs_c, ((0, npad - N), (0, qp - q))).T  # [qp, Np]

    kernel = _make_kernel(L, k, q, slot_bits, lp, qp, R)
    out = pl.pallas_call(
        kernel,
        grid=(npad // R,),
        in_specs=[
            pl.BlockSpec((lp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qp, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, npad), jnp.int32),
        interpret=interpret,
    )(reads_t, offs_t)

    flags = out[:q, :N].T                                  # [N, Q] i32
    slots = (flags & jnp.int32((1 << slot_bits) - 1)).astype(jnp.uint32)
    valid = (flags < 0) & (lengths >= k)[:, None]
    return slots, offs, valid
