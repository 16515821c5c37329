"""Pallas TPU kernel: candidate diagonal voting (sort + run-length + top-V).

Kernel twin of map.seed.vote_top_candidates (bit-identical, tested in
tests/unit/test_pallas_vote.py). The jnp version is one jnp.sort over
[2B, Q*P] plus two log-scans and a top_k — XLA's TPU sort alone ran
~8 ms/32k batch (tools/profile_prefix.py). Here the Q*P = 128 candidate
lanes land exactly on the vector lane axis, so the whole stage is an
in-register bitonic network (28 compare-exchange stages of lane rotates)
followed by the same scans and an iterative top-V — no HBM round-trips,
no generic sort machinery.

Layout: reads on SUBLANES (block_n rows), candidates on LANES (M must be
a power of two ≤ 128; smaller M is padded to 128 with SENTINEL, which
sorts to the tail and carries vote key 0 exactly like invalid lanes).

Tie-break parity with the jnp twin:
  * jnp.sort ascending — value-identical (stability invisible on ints);
  * lax.top_k picks equal keys lowest-index-first — the iterative
    argmax here selects the lowest lane among maxima each round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urmap_tpu.map.seed import SENTINEL

DEFAULT_BLOCK_N = 256
LANES = 128


def supports(m: int) -> bool:
    """Candidate widths the kernel handles (Q*P a power of two ≤ 128)."""
    return m >= 2 and (m & (m - 1)) == 0 and m <= LANES


def _make_kernel(v: int, vp: int, block_n: int):
    M = LANES

    def kernel(cand_ref, outc_ref, outv_ref):
        x = cand_ref[...]                                    # [R, M] i32
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_n, M), 1)

        def lroll(a, s):
            # y[l] = a[(l - s) mod M] (lane-axis rotate, static s)
            return pltpu.roll(a, s, axis=1)

        # ---- bitonic sort, ascending along lanes ----
        size = 2
        while size <= M:
            stride = size // 2
            while stride >= 1:
                up = lroll(x, M - stride)        # y[l] = x[l + stride]
                dn = lroll(x, stride)            # y[l] = x[l - stride]
                partner = jnp.where((lane & stride) == 0, up, dn)
                lo = jnp.minimum(x, partner)
                hi = jnp.maximum(x, partner)
                asc = (lane & size) == 0         # block sort direction
                first = (lane & stride) == 0     # lower half of the pair
                x = jnp.where(asc == first, lo, hi)
                stride //= 2
            size *= 2

        # ---- run-length votes at run heads ----
        prev = lroll(x, 1)
        is_head = (lane == 0) | (x != prev)
        headpos = jnp.where(is_head, lane, M)
        # next_head[l] = min headpos over lanes > l (reverse scan)
        y = jnp.where(lane >= M - 1, M, lroll(headpos, M - 1))
        s = 1
        while s < M:
            y = jnp.minimum(y, jnp.where(lane >= M - s, M,
                                         lroll(y, M - s)))
            s <<= 1
        votes = y - lane
        key = jnp.where(is_head & (x != SENTINEL), votes, 0)

        # ---- top-V by iterative argmax (ties -> lowest lane) ----
        outc = jnp.zeros((vp, block_n), jnp.int32)
        outv = jnp.zeros((vp, block_n), jnp.int32)
        v_idx = jax.lax.broadcasted_iota(jnp.int32, (vp, block_n), 0)
        for j in range(v):
            m = jnp.max(key, axis=1, keepdims=True)          # [R, 1]
            sel_lane = jnp.min(jnp.where(key == m, lane, M), axis=1,
                               keepdims=True)
            sel = lane == sel_lane
            cand_j = jnp.sum(jnp.where(sel, x, 0), axis=1)   # [R]
            vote_j = m[:, 0]
            # votes == 0 marks empty lanes; cand -> SENTINEL there
            cand_j = jnp.where(vote_j > 0, cand_j, SENTINEL)
            outc = jnp.where(v_idx == j, cand_j[None, :], outc)
            outv = jnp.where(v_idx == j, vote_j[None, :], outv)
            key = jnp.where(sel, 0, key)
        outc_ref[...] = outc
        outv_ref[...] = outv

    return kernel


@functools.partial(jax.jit, static_argnames=("v", "block_n", "interpret"))
def vote_pallas(cand, *, v: int, block_n: int = DEFAULT_BLOCK_N,
                interpret: bool = False):
    """Kernel twin of map.seed.vote_top_candidates:
    cand int32[N, M] → (top_cand int32[N, V], votes int32[N, V])."""
    N, M = cand.shape
    assert supports(M)
    # output blocks are [vp, R] over [vp, npad]: compiled mode needs R
    # to satisfy the Mosaic lane rule (divisible by 128); interpret mode
    # has no such constraint (unit tests use small blocks there)
    assert interpret or block_n % LANES == 0, block_n
    R = block_n
    npad = -(-N // R) * R
    vp = -(-v // 8) * 8
    x = jnp.pad(cand, ((0, npad - N), (0, LANES - M)),
                constant_values=SENTINEL)

    kernel = _make_kernel(v, vp, R)
    outc, outv = pl.pallas_call(
        kernel,
        grid=(npad // R,),
        in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((vp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((vp, npad), jnp.int32),
            jax.ShapeDtypeStruct((vp, npad), jnp.int32),
        ],
        interpret=interpret,
    )(x)
    return outc[:v, :N].T, outv[:v, :N].T
