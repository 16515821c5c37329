"""Seed extraction, index gather, and diagonal voting (jnp, fixed shapes).

The reference's per-read scalar loop (word extract → hash → fetch position
list → vote diagonals, SURVEY.md §2.8) becomes three batched stages:

  1. extract_seed_slots: Q seed words per read at evenly spaced offsets
     covering [0, len-k], hashed to index slots — one gather-free pass of
     shift/or ops over the padded read block.
  2. gather_candidates: CSR gather — positions[offsets[slot] : +P] per
     seed, converted to candidate alignment starts (pos − seed_offset).
  3. vote_top_candidates: per read, sort all Q·P candidate starts, count
     exact-diagonal votes via batched binary search, keep the top-V
     distinct candidates by vote count.

Everything is masked rather than ragged: invalid seeds/candidates carry
SENTINEL and lose every comparison downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from urmap_tpu.hashing import words_to_slots

SENTINEL = 0x7FFFFFF0  # invalid candidate start (sorts last); plain int
# (a jnp scalar here would initialize the backend at import time,
# breaking jax.distributed.initialize in multi-host processes)

# ---- biased device coordinates (GRCh38-scale genomes) -------------------
# Device-side global genome positions are carried as BIASED int32:
#     b = p - POS_BIAS,   POS_BIAS = 2^31 - 2^16
# This is order-preserving (so sorts/votes/dedup work unchanged), keeps
# SENTINEL the maximum value, and leaves 2^16 of headroom below INT32_MIN
# so small subtractions near genome position 0 (seed offsets, band/rescue
# windows ≤ max_read_len + rescue_window ≪ 2^16) never underflow. The
# packed-genome gathers unbias for free: POS_BIAS is a multiple of 16, so
# adding POS_BIAS // 16 to the static word base offset (device_tables)
# maps biased starts to the right genome words. Host code converts back
# via pipeline.unpack_out (+POS_BIAS, int64). Max genome: SENTINEL +
# POS_BIAS ≈ 4.295 Gbp (device_tables asserts).
POS_BIAS = (1 << 31) - (1 << 16)


def seed_offsets(lengths, k: int, q: int):
    """int32[N, Q] seed start offsets: floor(i*(len-k)/(Q-1)), 0 if len<k."""
    span = jnp.maximum(lengths.astype(jnp.int32) - k, 0)
    qi = jnp.arange(q, dtype=jnp.int32)
    if q == 1:
        return jnp.zeros((lengths.shape[0], 1), jnp.int32)
    return (qi[None, :] * span[:, None]) // (q - 1)


def extract_seed_slots(reads, lengths, *, k: int, q: int, slot_bits: int):
    """reads uint8[N, L], lengths int32[N] →
    (slots uint32[N, Q], offs int32[N, Q], valid bool[N, Q]).

    Words are computed DENSELY at every read position with k fused
    shift/or passes (pure vector ops), then the Q seed offsets gather
    one word each — k× fewer gathered elements than gathering each
    seed's k bases."""
    n, L = reads.shape
    if L < k:
        raise ValueError(f"read block width {L} < word length {k}")
    m = L - k + 1
    offs = seed_offsets(lengths, k, q)

    lo_bases = min(k, 16)
    if k % 4 == 0 and (k - lo_bases) % 4 == 0:
        # grouped extraction: pre-pack 4-base bytes (4 passes), then
        # combine k/4 groups with 8-bit shifts — ~half the passes of
        # the per-base loop (same trick as hashing.extract_words_np)
        mg = L - 3
        c3 = (reads & jnp.uint8(3)).astype(jnp.uint32)
        b4 = ((c3[:, 0:mg] << 6) | (c3[:, 1 : mg + 1] << 4)
              | (c3[:, 2 : mg + 2] << 2) | c3[:, 3 : mg + 3])
        v4 = ((reads[:, 0:mg] | reads[:, 1 : mg + 1]
               | reads[:, 2 : mg + 2] | reads[:, 3 : mg + 3]) < 4)
        hi = jnp.zeros((n, m), jnp.uint32)
        lo = jnp.zeros((n, m), jnp.uint32)
        ok = jnp.ones((n, m), jnp.bool_)
        ng_hi = (k - lo_bases) // 4
        for g in range(k // 4):
            grp = b4[:, 4 * g : 4 * g + m]
            ok = ok & v4[:, 4 * g : 4 * g + m]
            if g < ng_hi:
                hi = (hi << 8) | grp
            else:
                lo = (lo << 8) | grp
    else:
        lo = jnp.zeros((n, m), jnp.uint32)
        hi = jnp.zeros((n, m), jnp.uint32)
        ok = jnp.ones((n, m), jnp.bool_)
        for i in range(k):
            c = reads[:, i : i + m]
            ok = ok & (c < 4)
            c32 = (c & 3).astype(jnp.uint32)
            if i < k - lo_bases:
                hi = (hi << 2) | c32
            else:
                lo = (lo << 2) | c32
    slots_dense = words_to_slots(lo, hi, slot_bits)         # [N, m]

    offs_c = jnp.clip(offs, 0, m - 1)
    slots = jnp.take_along_axis(slots_dense, offs_c, axis=1)
    valid = jnp.take_along_axis(ok, offs_c, axis=1) & (lengths >= k)[:, None]
    return slots, offs, valid


def extract_seed_slots_words(rpacked, rnplane, lengths, L: int, *,
                             k: int, q: int, slot_bits: int):
    """extract_seed_slots fed from the 2-bit word planes
    (genome_pack.pack_reads layout) instead of byte codes —
    bit-identical outputs (tests/unit/test_seed_words.py).

    Dense (lo, hi) words at every offset come from two word funnels
    (A = bases j..j+15, B = j+16..j+31, LSB-first) plus one 2-bit-lane
    reversal each to restore the first-base-most-significant order the
    hash expects; validity is a zero-test on the same funnels of the
    N plane. k ≤ 32."""
    from urmap_tpu import genome_pack as gpk

    n, nw = rpacked.shape
    if L < k:
        raise ValueError(f"read block width {L} < word length {k}")
    m = L - k + 1
    offs = seed_offsets(lengths, k, q)

    def pad2(a, fill):
        f = jnp.full((n, 2), fill, jnp.uint32)
        return jnp.concatenate([a, f], axis=1)

    cw = pad2(rpacked, 0)
    nwp = pad2(rnplane, 0x5555_5555)
    j = np.arange(m)
    sh = jnp.asarray((2 * (j % 16)).astype(np.uint32))[None, :]

    def dense(words, lane0):
        # D(j) = bases j+lane0 .. j+lane0+15, LSB-first
        lo = jnp.repeat(words, 16, axis=1)[:, lane0 : lane0 + m]
        hi = jnp.repeat(words[:, 1:], 16, axis=1)[:, lane0 : lane0 + m]
        return jnp.where(sh == 0, lo,
                         (lo >> sh) | (hi << ((jnp.uint32(32) - sh) % 32)))

    A, B = dense(cw, 0), dense(cw, 16)
    nA, nB = dense(nwp, 0), dense(nwp, 16)
    if k <= 16:
        lo = gpk._rev2bit(A) >> jnp.uint32(32 - 2 * k)
        hi = jnp.zeros_like(lo)
        okbits = nA & jnp.uint32((1 << (2 * k)) - 1)
    elif k == 32:
        hi, lo = gpk._rev2bit(A), gpk._rev2bit(B)
        okbits = nA | nB
    else:
        ra, rb = gpk._rev2bit(A), gpk._rev2bit(B)
        hb = 2 * (k - 16)
        hi = ra >> jnp.uint32(32 - hb)
        lo = (ra << jnp.uint32(hb)) | (rb >> jnp.uint32(32 - hb))
        okbits = nA | (nB & jnp.uint32((1 << hb) - 1))
    ok = okbits == 0
    slots_dense = words_to_slots(lo, hi, slot_bits)         # [N, m]

    offs_c = jnp.clip(offs, 0, m - 1)
    slots = jnp.take_along_axis(slots_dense, offs_c, axis=1)
    valid = jnp.take_along_axis(ok, offs_c, axis=1) & (lengths >= k)[:, None]
    return slots, offs, valid


def extract_seed_slots_words_dispatch(rpacked, rnplane, lengths, L: int, *,
                                      k: int, q: int, slot_bits: int,
                                      use_pallas: bool = True):
    """extract_seed_slots_words, via the fused Pallas kernel on TPU
    backends (kernels/seed_slots.py — bit-identical, ~10× the XLA
    elementwise throughput on the target platform).
    URMAP_NO_SEED_KERNEL=1 forces the jnp path (Mosaic escape hatch)."""
    import os

    from urmap_tpu.map.dp import on_tpu

    if (use_pallas and on_tpu()
            and os.environ.get("URMAP_NO_SEED_KERNEL") != "1"):
        from urmap_tpu.kernels import seed_slots

        if seed_slots.supports(k, slot_bits):
            return seed_slots.seed_slots_words_pallas(
                rpacked, rnplane, lengths, L, k=k, q=q,
                slot_bits=slot_bits)
    return extract_seed_slots_words(rpacked, rnplane, lengths, L,
                                    k=k, q=q, slot_bits=slot_bits)


def vote_top_candidates_dispatch(cand, *, v: int, use_pallas: bool = True):
    """vote_top_candidates, via the Pallas bitonic kernel on TPU backends
    (kernels/vote.py — bit-identical; the jnp path's XLA sort alone cost
    ~8 ms/32k batch). URMAP_NO_VOTE_KERNEL=1 forces the jnp path."""
    import os

    from urmap_tpu.map.dp import on_tpu

    if (use_pallas and on_tpu()
            and os.environ.get("URMAP_NO_VOTE_KERNEL") != "1"):
        from urmap_tpu.kernels import vote

        if vote.supports(cand.shape[1]):
            return vote.vote_pallas(cand, v=v)
    return vote_top_candidates(cand, v=v)


def align_row_words(p: int) -> int:
    """Row width for the no-straddle positions layout (store.device_tables
    row_align): the smallest power of two ≥ max(GATHER_ROW_WORDS, p), so
    every capped run (≤ p entries) fits between row boundaries."""
    from urmap_tpu import genome_pack as gpk

    rw = gpk.GATHER_ROW_WORDS
    while rw < p:
        rw *= 2
    return rw


def _aligned_rows_fetch(positions, flat_starts, width: int, rw: int):
    """Fetch ``width`` entries beginning at each (row-contained) CSR
    offset from the aligned layout: ONE rw-word row per start + a log2
    funnel (SENTINEL fill). Requires every run to live inside one
    rw-word row (store.align_runs). Returns int32-ish [len, width]."""
    M = positions.shape[0]
    nrows = M // rw
    t2 = positions[: nrows * rw].reshape(nrows, rw)
    r0 = (flat_starts // jnp.uint32(rw)).astype(jnp.int32)
    cur = jnp.take(t2, jnp.clip(r0, 0, nrows - 1), axis=0)
    off = (flat_starts % jnp.uint32(rw)).astype(jnp.int32)
    bit = rw.bit_length() - 2
    while bit >= 0:
        sh = 1 << bit
        shifted = jnp.concatenate(
            [cur[:, sh:], jnp.full_like(cur[:, :sh], SENTINEL)], axis=1)
        cur = jnp.where((((off >> bit) & 1) == 1)[:, None], shifted, cur)
        bit -= 1
    return cur[:, :width]


def _row128_fetch(positions2d, flat_starts, width: int):
    """Dense-row fetch for the "row128" layout (store.align_runs_fixed):
    positions2d is the table ALREADY SHAPED [R, 128] (pad-free native
    tile layout — see store.tables_to_device), every run lives inside
    one 128-word row, so ONE row gather + a 7-bit lane funnel yields
    the first ``width`` entries at each CSR offset. uint32-safe for
    >2^31-entry tables (GRCh38 scale). SENTINEL fill."""
    R = positions2d.shape[0]
    s = flat_starts.astype(jnp.uint32)
    r0 = (s // jnp.uint32(128)).astype(jnp.int32)
    cur = jnp.take(positions2d, jnp.clip(r0, 0, R - 1), axis=0)
    off = (s & jnp.uint32(127)).astype(jnp.int32)
    from urmap_tpu.kernels import lane_rotate

    def funnel(cur, off):
        bit = 6
        while bit >= 0:
            sh = 1 << bit
            shifted = jnp.concatenate(
                [cur[:, sh:], jnp.full_like(cur[:, :sh], SENTINEL)],
                axis=1)
            cur = jnp.where((((off >> bit) & 1) == 1)[:, None], shifted,
                            cur)
            bit -= 1
        return cur[:, :width]

    # in-VMEM funnel on TPU lowerings: the jnp funnel materializes a
    # full [N, 128] temp per step — 45 ms vs 1.5 ms for the row take
    # itself at GRCh38 scale (kernels/lane_rotate.py). Wrapped lanes
    # differ from the SENTINEL fill but only past each run's count,
    # which every caller masks (gather_candidates ok mask).
    return lane_rotate.rotate_dispatch(cur, off, width, funnel)


def gather_candidates(offsets, positions, slots, seed_offs, valid, *,
                      p: int, csr_aligned: bool = False,
                      tier: int | None = None,
                      tier_overflow_frac: int = 16,
                      row128: bool = False,
                      obase=None, off_cnt_bits: int = 0,
                      off_block_bits: int = 0):
    """CSR gather: per (read, seed), up to P genome positions → candidate
    alignment starts. Returns cand int32[N, Q*P] (SENTINEL where invalid).

    The position fetch is a row-slice gather (genome_pack.
    row_gather_window): each seed's positions are CONTIGUOUS in the CSR,
    so fetching 128-byte rows beats per-element gathering ~1.6× on TPU.
    ``positions`` must carry ≥ 2*ROW_WORDS zero padding (store/shard
    builders do).

    ``csr_aligned``: the table was built with store.device_tables
    row_align (no run crosses its next_pow2(count)-word block; pad
    entries are SENTINEL; offsets follow the padded-CSR convention).
    The gather then fetches exactly ONE aligned row per seed — no
    straddle row. Entry validity = (entry != SENTINEL) & (lane < count).

    ``tier`` (aligned layout only, power of two < p): XLA's TPU gather
    costs ~1 element/cycle, so fetch cost is the ELEMENT COUNT — and on
    lightly-loaded indexes most runs are far shorter than p. Pass 1
    fetches only ``tier`` words per seed (runs ≤ tier live inside one
    tier-word block by the align_runs granularity rule); the few seeds
    with count > tier are re-fetched at full width in capacity-bounded
    while_loop rounds (tier_overflow_frac — full coverage, any load).
    Bit-identical output to the untiered path. Pick the tier from index
    statistics (pipeline.pick_gather_tier).
    """
    from urmap_tpu import genome_pack as gpk

    n, q = slots.shape
    slots_i = slots.astype(jnp.int32)
    if obase is not None:
        # packed row128 offsets (store.pack_offsets_row128): one uint32
        # word carries TWO uint16 slot entries, each
        # (start − block_base) << cnt_bits | padded_count — half the
        # offsets HBM and half the gather bytes of the plain table.
        # Little-endian u16 pairing: even slot = low half.
        w = jnp.take(offsets, slots_i >> 1, axis=0)
        u = jnp.where((slots_i & 1) == 1, w >> jnp.uint32(16), w) \
            & jnp.uint32(0xFFFF)
        b = jnp.take(obase, slots_i >> off_block_bits, axis=0)
        start = b + (u >> jnp.uint32(off_cnt_bits))
        cnt = (u & jnp.uint32((1 << off_cnt_bits) - 1)).astype(jnp.int32)
    else:
        start = jnp.take(offsets, slots_i, axis=0)
        # offsets may be uint32 (>2^31 positions on GRCh38-scale
        # indexes); per-slot counts are small (≤ the gather cap
        # [+ row pad]) → int32
        cnt = (jnp.take(offsets, slots_i + 1, axis=0)
               - start).astype(jnp.int32)
    j = jnp.arange(p, dtype=jnp.int32)
    if row128:
        # huge-table layout: positions is [R, 128]; one dense row per
        # seed (runs never cross a row — store.align_runs_fixed), pads
        # between runs are SENTINEL
        pos = _row128_fetch(positions, start.reshape(-1), p) \
            .reshape(n, q, p)
        ok = ((j[None, None, :] < cnt[:, :, None])
              & (pos != SENTINEL) & valid[:, :, None])
        cand = pos.astype(jnp.int32) - seed_offs[:, :, None]
        return jnp.where(ok, cand, SENTINEL).reshape(n, q * p)
    if csr_aligned and tier is not None and tier < p:
        assert tier & (tier - 1) == 0, "tier must be a power of two"
        flat = start.reshape(-1)                               # [n*q]
        cnt_f = cnt.reshape(-1)
        valid_f = valid.reshape(-1)
        soff_f = seed_offs.reshape(-1)
        narrow = _aligned_rows_fetch(positions, flat, tier, tier)
        pos1 = jnp.concatenate(
            [narrow, jnp.full((narrow.shape[0], p - tier), SENTINEL,
                              narrow.dtype)], axis=1)          # [n*q, p]
        ok1 = ((j[None, :] < cnt_f[:, None]) & (pos1 != SENTINEL)
               & valid_f[:, None])
        cand_f = jnp.where(ok1, pos1.astype(jnp.int32) - soff_f[:, None],
                           SENTINEL)

        rw = align_row_words(p)
        ov = valid_f & (cnt_f > tier)                          # overflow
        cap2 = min(max((n * q) // tier_overflow_frac, 128), n * q)

        def ocond(st):
            return jnp.any(ov & ~st[1])

        def obody(st):
            cf, done = st
            rem = ov & ~done
            idx, = jnp.nonzero(rem, size=cap2, fill_value=0)
            do = rem[idx]
            full = _aligned_rows_fetch(positions, flat[idx], p, rw)
            okk = ((j[None, :] < cnt_f[idx][:, None])
                   & (full != SENTINEL))
            c2 = jnp.where(okk, full.astype(jnp.int32)
                           - soff_f[idx][:, None], SENTINEL)
            cf = cf.at[idx].set(jnp.where(do[:, None], c2, cf[idx]))
            done = done.at[idx].set(done[idx] | do)
            return cf, done

        cand_f, _ = jax.lax.while_loop(
            ocond, obody, (cand_f, jnp.zeros(n * q, jnp.bool_)))
        return cand_f.reshape(n, q * p)
    if csr_aligned:
        rw = align_row_words(p)
        from urmap_tpu.kernels import lane_rotate

        if (lane_rotate.enabled() and rw <= 128
                and positions.shape[0] % 128 == 0):
            # dense 128-row view + lane-rotate kernel: the pow2-nested
            # placement (store.align_runs) keeps every run inside its
            # next_pow2(count)-block, hence inside one 128-word row, so
            # the row128 fetch is exact on this layout too. Gathers 8x
            # the bytes of an rw=16 row but skips the per-step [N, rw]
            # funnel temps (which XLA tile-pads to 128 lanes anyway) —
            # net win on TPU; CPU keeps the narrow-row path.
            pos = _row128_fetch(positions.reshape(-1, 128),
                                start.reshape(-1), p).reshape(n, q, p)
        else:
            pos = _aligned_rows_fetch(positions, start.reshape(-1), p, rw) \
                .reshape(n, q, p)
        ok = ((j[None, None, :] < cnt[:, :, None])
              & (pos != SENTINEL) & valid[:, :, None])
    else:
        pos = gpk.gather_window(positions, start.reshape(-1), p,
                                row_words=gpk.GATHER_ROW_WORDS) \
            .reshape(n, q, p)
        ok = (j[None, None, :] < cnt[:, :, None]) & valid[:, :, None]
    cand = pos.astype(jnp.int32) - seed_offs[:, :, None]
    cand = jnp.where(ok, cand, SENTINEL)
    return cand.reshape(n, q * p)


def vote_top_candidates(cand, *, v: int):
    """cand int32[N, M] → (top_cand int32[N, V], votes int32[N, V]).

    Votes = number of seeds that proposed the exact same candidate start.
    Only run heads (first occurrence) are eligible, so the top-V are
    distinct. votes == 0 marks empty lanes (cand == SENTINEL there).

    Run lengths come from one sort + two O(log M) cumulative scans (no
    per-element binary search — a vmapped searchsorted here was ~30× the
    cost of the whole rest of the pipeline on TPU).
    """
    n, m = cand.shape
    sorted_c = jnp.sort(cand, axis=-1)
    idx = jnp.arange(m, dtype=jnp.int32)[None, :]
    is_head = jnp.concatenate(
        [jnp.ones((n, 1), jnp.bool_),
         sorted_c[:, 1:] != sorted_c[:, :-1]], axis=-1)
    # next_head[i] = position of the first head strictly after i
    headpos = jnp.where(is_head, idx, m)
    next_head = jax.lax.cummin(
        jnp.concatenate([headpos[:, 1:], jnp.full((n, 1), m, jnp.int32)],
                        axis=-1),
        axis=1, reverse=True)
    votes = (next_head - idx).astype(jnp.int32)  # run length, at heads
    key = jnp.where(is_head & (sorted_c != SENTINEL), votes, 0)
    top_votes, top_idx = jax.lax.top_k(key, v)
    top_cand = jnp.take_along_axis(sorted_c, top_idx, axis=-1)
    top_cand = jnp.where(top_votes > 0, top_cand, SENTINEL)
    return top_cand, top_votes
