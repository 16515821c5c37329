"""The jitted per-batch mapping pipeline (single-end core).

One fixed-shape XLA program per batch (SURVEY.md §3.3):

    reads uint8[B, L] ──┬─ fwd ─┐
                        └─ rc ──┴→ seeds → CSR gather → vote → top-V cands
                                  → banded DP (scores + start offsets)
                                  → select (best/second, MAPQ)

Both strands ride one [2B] batch. The index tables and genome stay
HBM-resident across batches (donated nothing; pure function of inputs).
Paired-end pairing/rescue composes on top in map/pair.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.map.dp import NEG, banded_packed
from urmap_tpu.map.seed import (POS_BIAS, SENTINEL,
                                extract_seed_slots_words_dispatch,
                                gather_candidates,
                                vote_top_candidates_dispatch)
from urmap_tpu.map.select import select_hits

_COMP = np.asarray(alphabet.COMP_CODE)


def revcomp_batch(reads, lengths):
    """Per-row reverse complement of the first len codes.

    Gather-free: complement + full reverse (vector ops), then rotate
    each row left by (L − len) via log2(L) conditional static rolls —
    a per-row variable gather here cost more than the seed stage.
    Requires the pad beyond ``len`` to be uniform READ_N (alphabet.py /
    parser invariant), since rotation relocates pad lanes.
    """
    B, L = reads.shape
    comp = jnp.take(jnp.asarray(_COMP), reads.astype(jnp.int32), axis=0)
    out = comp[:, ::-1]
    shift = (L - lengths).astype(jnp.int32)
    b = 0
    while (1 << b) < L:
        s = 1 << b
        rolled = jnp.concatenate([out[:, s:], out[:, :s]], axis=1)
        out = jnp.where((((shift >> b) & 1) == 1)[:, None], rolled, out)
        b += 1
    return out


@dataclass
class MapResult:
    """Host-side mapping results for one batch (numpy arrays, length B)."""

    mapped: np.ndarray   # bool
    pos: np.ndarray      # int64 global alignment start
    strand: np.ndarray   # int32, 0 fwd / 1 rc
    score: np.ndarray    # int32
    second: np.ndarray   # int32 (NEG-ish if none)
    mapq: np.ndarray     # int32
    gapped: np.ndarray   # bool: CIGAR needs traceback (else all-M)
    lengths: np.ndarray  # int32
    ungapped: np.ndarray | None = None  # int32 M-only rescore at pos
    clipped: np.ndarray | None = None   # bool: clip-rescued row — host
    #                                     traceback must use clip mode
    suspect: np.ndarray | None = None   # bool: saturated-evidence poor-
    #                                     score winner (MAPQ capped); the
    #                                     second pass re-maps these rows
    tb: dict | None = None              # device traceback bits for the
    #                                     gapped winners (unpack_tb) —
    #                                     consumed by map/cigar.py;
    #                                     rows missing/stale fall back
    #                                     to the host DP traceback

    @classmethod
    def from_device(cls, out: dict, lengths) -> "MapResult":
        return cls(
            mapped=np.asarray(out["mapped"]),
            pos=np.asarray(out["pos"], dtype=np.int64),
            strand=np.asarray(out["strand"]),
            score=np.asarray(out["score"]),
            second=np.asarray(out["second"]),
            mapq=np.asarray(out["mapq"]),
            gapped=np.asarray(out["gapped"]),
            lengths=np.asarray(lengths),
            ungapped=(np.asarray(out["ungapped"])
                      if "ungapped" in out else None),
            clipped=(np.asarray(out["clipped"])
                     if "clipped" in out else None),
            suspect=(np.asarray(out["suspect"])
                     if "suspect" in out else None),
        )


def _ungapped_scores(genome, cand, reads, lengths, sc: ScoreConfig):
    """Ungapped match/mismatch score of each read placed at its candidate
    start. cand int32[N], reads uint8[N, L], lengths int32[N] → int32[N]."""
    G = genome.shape[0]
    N, L = reads.shape
    gidx = cand[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    g = jnp.take(genome, jnp.clip(gidx, 0, G - 1).astype(jnp.int32), axis=0)
    in_read = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    return jnp.sum(
        jnp.where(in_read,
                  jnp.where(g == reads, sc.match, sc.mismatch),
                  0).astype(jnp.int32), axis=-1)


def pick_gather_tier(aligned_counts: np.ndarray,
                     max_overflow: float = 0.04) -> int | None:
    """Tiered-gather width from the aligned layout's padded-count
    distribution (seed.gather_candidates tier): the smallest power of
    two whose overflow fraction stays under ``max_overflow``, or None
    when only the full width qualifies. Lightly-loaded indexes (the
    common case: ~0.5 positions/slot at auto slot_bits) fetch 4 words
    per seed instead of 16."""
    if aligned_counts.size == 0:
        return None
    for t in (4, 8):
        if float((aligned_counts > t).mean()) <= max_overflow:
            return t
    return None


def candidates_batch_device(tables, reads, lengths, *, icfg: IndexConfig,
                            mcfg: MapConfig, sc: ScoreConfig,
                            dp_runner=None, gather_runner=None,
                            csr_aligned: bool = False,
                            gather_tier: int | None = None,
                            row128: bool = False,
                            use_pallas: bool = True,
                            packed_reads=None,
                            off_bits: tuple[int, int] | None = None):
    """Seed → vote → ungapped verify → (bucketed) banded DP; both strands.

    The reference verifies candidates ungapped first and only runs the
    gapped DP when the diagonal has too many mismatches (SURVEY.md §3.2);
    here that becomes a fixed-capacity bucket: the top
    ``B // dp_capacity_frac`` reads flagged by the trigger run the banded
    DP on all their candidates, everyone else keeps the (identical when
    gap-free) ungapped score. Kills ~95% of DP work on typical data.

    The front end is WORD-NATIVE: the 2-bit word planes (fwd from the
    upload bytes or pack_reads; rc via genome_pack.revcomp_words) are
    the primary representation — the byte-path revcomp + re-pack are
    gone — and byte codes are restored once (unpack_words_to_codes) for
    the stages that still consume bytes (seed kernel input, DP window
    compare). Bit-identical to the byte front end for valid read codes.

    ``packed_reads``: optional (packed, nmask) upload blocks
    (genome_pack.pack_read_codes_host layout); when given, ``reads``
    may be None and L comes from mcfg.max_read_len.

    Returns a dict of per-read candidate arrays [B, 2V] (fwd candidates
    in columns [:V], rc in [V:]): pos, score, strand, valid, ungapped,
    plus per-read dp_ran [B]. ``dp_runner``/``gather_runner`` let the
    sharded path split DP lanes / own only its hash range
    (dist/sharded.py).
    """
    from urmap_tpu import genome_pack as gpk

    B = lengths.shape[0]
    L = mcfg.max_read_len if reads is None else reads.shape[1]
    nw = -(-L // gpk.BASES_PER_WORD)
    q, p, v = mcfg.seeds_per_read, mcfg.positions_per_seed, mcfg.top_candidates
    neg = jnp.int32(NEG)

    if packed_reads is not None:
        pk, nm = packed_reads
        rp1, rn1 = gpk.read_words_from_upload(pk, nm, lengths, nw)
    else:
        rp1, rn1 = gpk.pack_reads(reads, lengths, nw)
    rp_rc, rn_rc = gpk.revcomp_words(rp1, rn1, lengths, L)
    rpacked2 = jnp.concatenate([rp1, rp_rc], axis=0)        # [2B, nw]
    rnplane2 = jnp.concatenate([rn1, rn_rc], axis=0)
    lengths2 = jnp.concatenate([lengths, lengths], axis=0)  # [2B]

    slots, offs, valid = extract_seed_slots_words_dispatch(
        rpacked2, rnplane2, lengths2, L, k=icfg.k, q=q,
        slot_bits=icfg.slot_bits, use_pallas=use_pallas)
    # packed-offsets coherence: the tables dict and the traced decode
    # MUST agree, or every candidate is garbage and everything reads
    # unmapped (caught loudly here instead — round-4 PE regression)
    assert (tables.get("obase") is not None) == (off_bits is not None), \
        "tables carry packed offsets but off_bits not threaded (or vice versa)"
    if gather_runner is None:
        cand = gather_candidates(
            tables["offsets"], tables["positions"], slots, offs, valid,
            p=p, csr_aligned=csr_aligned, tier=gather_tier,
            row128=row128, obase=tables.get("obase"),
            off_cnt_bits=off_bits[0] if off_bits else 0,
            off_block_bits=off_bits[1] if off_bits else 0)
    else:
        cand = gather_runner(slots, offs, valid)
    top_cand, votes = vote_top_candidates_dispatch(
        cand, v=v, use_pallas=use_pallas)                      # [2B, V]
    if mcfg.min_votes > 1:
        # vote floor with per-READ fallback: a candidate needs >=
        # min_votes seeds behind it unless neither strand of its read
        # produced one that strong (config.MapConfig.min_votes)
        mv = jnp.int32(mcfg.min_votes)
        pair_max = jnp.max(votes.reshape(2, B, v), axis=(0, 2))   # [B]
        no_floor = pair_max < mv                                  # [B]
        weak_read = jnp.tile(no_floor, 2)[:, None]                # [2B, 1]
        top_cand = jnp.where((votes >= mv) | weak_read, top_cand,
                             SENTINEL)
        # "weak" = fallback fired AND ANY seed is SATURATED (all p
        # gather lanes valid ⇒ that slot was recap-subsampled ⇒ unseen
        # equal-scoring siblings likely): tandem/satellite reads —
        # including run-BOUNDARY reads whose unique flank keeps most
        # seeds unsaturated but whose true diagonal was subsampled away
        # — get their MAPQ capped downstream. Mutation-riddled unique
        # reads stay uncapped: at auto slot_bits (~0.5 positions/slot)
        # a saturated slot essentially cannot occur on non-repetitive
        # sequence, so this costs no clean-genome recall (the plain
        # no_floor cap cost 0.2% recall@MAPQ>=1 for nothing).
        # "saturated" = slot load >= min(p, suspect_slot_load): all
        # lanes full at narrow gathers, absolute-load at wide ones
        # (config.MapConfig.suspect_slot_load — a slot can flood the
        # vote lanes long before it fills a 64-wide gather)
        load = (cand.reshape(2 * B, q, p) != SENTINEL).sum(axis=2)
        sat = load >= jnp.int32(min(p, mcfg.suspect_slot_load))
        nsat = sat.sum(axis=1).reshape(2, B).sum(axis=0)
        nval = valid.sum(axis=1).reshape(2, B).sum(axis=0)
        # the second term catches tandem-INTERIOR reads that defeat the
        # vote floor by periodic coincidence (positions spaced exactly
        # two seed-offsets apart give one candidate 2 votes): when most
        # seeds are saturated, the candidate set is a subsample however
        # the votes fell.
        weak = (no_floor & (nsat > 0)) \
            | ((2 * nsat >= nval) & (nval > 0))
    else:
        weak = jnp.zeros((B,), jnp.bool_)
        nsat = jnp.zeros((B,), jnp.int32)
    # genome range in biased device coordinates (seed.POS_BIAS)
    top_cand = jnp.where(
        top_cand == SENTINEL, SENTINEL,
        jnp.clip(top_cand, -POS_BIAS, tables["genome_max_biased"]))

    # ---- ungapped verification of every candidate (bit-parallel) ----
    # (rpacked2/rnplane2 already ARE the primary representation)
    flat_cand = top_cand.reshape(-1)                           # [2B*V]
    flat_lens = jnp.repeat(lengths2, v, axis=0)
    valid_flat = flat_cand != SENTINEL
    nv = 2 * B * v
    cap = min(max(nv // mcfg.verify_capacity_frac, 128), nv)
    if cap < nv:
        # capacity-compacted verify: with the vote floor most lanes are
        # SENTINEL, so each round serves the first ``cap`` unserved
        # valid lanes and the loop runs until none remain — the window
        # gathers (the stage's dominant cost) then run on ~nv/frac rows
        # instead of nv. Lane selection is jnp.nonzero(size=cap)
        # (cumsum + scatter — a valid-first argsort here was a full TPU
        # sort of all nv lanes per round)
        starts_all = jnp.where(valid_flat, flat_cand, 0)

        def vcond(st):
            _, done = st
            return jnp.any(valid_flat & ~done)

        def vbody(st):
            mm_all, done = st
            rem = valid_flat & ~done
            idx, = jnp.nonzero(rem, size=cap, fill_value=0)    # [cap]
            do = rem[idx]
            rrow = idx // v                                    # read row
            mm_sub = gpk.mismatch_counts(
                tables["ginter"], tables["base_off"], starts_all[idx],
                rpacked2[rrow], rnplane2[rrow], lengths2[rrow])
            mm_all = mm_all.at[idx].set(
                jnp.where(do, mm_sub, mm_all[idx]))
            done = done.at[idx].set(done[idx] | do)
            return mm_all, done

        # init = all-mismatch; SENTINEL lanes are masked downstream
        mm, _ = jax.lax.while_loop(
            vcond, vbody, (flat_lens, jnp.zeros(nv, jnp.bool_)))
    else:
        flat_rp = jnp.repeat(rpacked2, v, axis=0)
        flat_rn = jnp.repeat(rnplane2, v, axis=0)
        mm = gpk.mismatch_counts(
            tables["ginter"], tables["base_off"],
            jnp.where(valid_flat, flat_cand, 0),
            flat_rp, flat_rn, flat_lens)
    ung = ((flat_lens - mm) * sc.match
           + mm * sc.mismatch).astype(jnp.int32).reshape(2 * B, v)

    def fold(x):
        x = x.reshape(2, B, v)
        return jnp.concatenate([x[0], x[1]], axis=1)        # [B, 2V]

    cand_f = fold(top_cand)
    ung_f = fold(ung)
    valid_c = cand_f != SENTINEL
    strands = jnp.concatenate([
        jnp.zeros((B, v), jnp.int32), jnp.ones((B, v), jnp.int32)], axis=1)

    ung_masked = jnp.where(valid_c, ung_f, neg)
    best_ung = jnp.max(ung_masked, axis=-1)

    # ---- gapped-DP bucket rounds ----
    # A while_loop serves D = B/dp_capacity_frac flagged reads per round
    # until none remain: clean batches pay one small DP, pathological
    # batches still get full coverage (static shapes throughout; the
    # round count is the only runtime-variable quantity, and it is
    # identical on every "index" mesh shard — the inputs to ``need_dp``
    # are psum-combined and replicated — so collectives inside dp_runner
    # stay in lockstep).
    trigger = (lengths * sc.match
               - mcfg.dp_trigger_mismatches * (sc.match - sc.mismatch))
    need_dp = (best_ung > neg) & (best_ung < trigger) & (lengths >= icfg.k)
    D = max(B // mcfg.dp_capacity_frac, 1)
    clip = sc.clip_open if mcfg.end_clip else None
    if dp_runner is None:
        def dp_runner(c, r, ln, rp, rn):
            return banded_packed(
                tables["ginter"], tables["base_off"],
                c, r, ln, rp, rn, hw=mcfg.band_halfwidth, sc=sc,
                use_pallas=use_pallas, clip_open=clip)

    def unfold(x):                                           # [2D*V] → [D, 2V]
        x = x.reshape(2, D, v)
        return jnp.concatenate([x[0], x[1]], axis=1)

    def round_cond(state):
        served = state[4]
        return jnp.any(need_dp & ~served)

    def round_body(state):
        scores_f, pos_f, ungapped_f, spans_f, served = state
        rem = need_dp & ~served
        idx, = jnp.nonzero(rem, size=D, fill_value=0)        # read rows
        do = rem[idx]                                        # [D]

        sub_cand = cand_f[idx]                               # [D, 2V]
        sub_rp = jnp.concatenate([rpacked2[idx], rpacked2[B + idx]], axis=0)
        sub_rn = jnp.concatenate([rnplane2[idx], rnplane2[B + idx]], axis=0)
        # byte codes only for the DP bucket rows (the window compare):
        # the full-batch byte block never materializes
        sub_reads2 = gpk.unpack_words_to_codes(sub_rp, sub_rn, L)
        sub_lens = lengths[idx]
        sub_lens2 = jnp.concatenate([sub_lens, sub_lens], axis=0)
        sub_cand2 = jnp.concatenate(
            [sub_cand[:, :v], sub_cand[:, v:]], axis=0)      # [2D, V]
        dflat_cand = sub_cand2.reshape(-1)                   # [2D*V]
        dflat_reads = jnp.repeat(sub_reads2, v, axis=0)
        dflat_lens = jnp.repeat(sub_lens2, v, axis=0)
        dp_s, dp_d0, dp_ung, dp_sp = dp_runner(
            jnp.where(dflat_cand == SENTINEL, 0, dflat_cand),
            dflat_reads, dflat_lens,
            jnp.repeat(sub_rp, v, axis=0), jnp.repeat(sub_rn, v, axis=0))
        dp_s = unfold(dp_s)
        dp_d0 = unfold(dp_d0)
        dp_ung = unfold(dp_ung)
        dp_sp = unfold(dp_sp)

        sub_valid = sub_cand != SENTINEL
        upd = do[:, None] & sub_valid
        scores_f = scores_f.at[idx].set(
            jnp.where(upd, dp_s, scores_f[idx]))
        pos_f = pos_f.at[idx].set(
            jnp.where(upd, sub_cand + dp_d0, pos_f[idx]))
        ungapped_f = ungapped_f.at[idx].set(
            jnp.where(upd, dp_ung, ungapped_f[idx]))
        spans_f = spans_f.at[idx].set(
            jnp.where(upd, dp_sp, spans_f[idx]))
        served = served.at[idx].set(served[idx] | do)
        return scores_f, pos_f, ungapped_f, spans_f, served

    # span init = read length: non-DP candidates are M-only placements
    # (their emitted CIGAR is all-M), so length IS their exact ref span.
    # DP rounds overwrite with lengths + d1 - d0. Under -endclip the DP
    # span is meaningless (dp.banded_from_windows) — map/pair.py falls
    # back to the length proxy there.
    spans0 = jnp.broadcast_to(lengths[:, None], (B, 2 * v))
    scores_f, pos_f, ungapped_f, spans_f, served = jax.lax.while_loop(
        round_cond, round_body,
        (ung_masked, cand_f, ung_masked, spans0, jnp.zeros((B,), jnp.bool_)))

    # ---- clip RESCUE lane (config.MapConfig.clip_rescue) ----
    # Reads whose best candidate is still below the mapping threshold
    # (adapter/chimeric tails: the full-read semi-global DP charges the
    # bad tail) get one more bucketed DP round in END-CLIP mode. The
    # lane can only touch reads that would otherwise be UNMAPPED, so
    # normally-mapping reads stay bit-identical to the no-clip
    # semantics; zero while_loop rounds when no read needs it. Clip
    # spans are meaningless (dp.banded_from_windows d1) — rescued
    # candidates keep the read-length span proxy. Always the LOCAL DP
    # (tables["ginter"] is replicated on every mesh shard; the lane is
    # too rare to be worth compute-sharding).
    clipped_read = jnp.zeros((B,), jnp.bool_)
    if mcfg.clip_rescue and not mcfg.end_clip:
        min_sc = jnp.ceil(mcfg.min_score_frac
                          * lengths.astype(jnp.float32)).astype(jnp.int32)
        best_now = jnp.max(jnp.where(valid_c, scores_f, neg), axis=-1)
        need_clip = (jnp.any(valid_c, axis=-1) & (best_now < min_sc)
                     & (lengths >= icfg.k))
        Dc = max(B // mcfg.clip_rescue_capacity_frac, 1)

        def clip_dp(c, r, ln, rp, rn):
            return banded_packed(
                tables["ginter"], tables["base_off"], c, r, ln, rp, rn,
                hw=mcfg.band_halfwidth, sc=sc, use_pallas=use_pallas,
                clip_open=sc.clip_open)

        def cunfold(x):
            x = x.reshape(2, Dc, v)
            return jnp.concatenate([x[0], x[1]], axis=1)

        def clip_cond(state):
            return jnp.any(need_clip & ~state[4])

        def clip_body(state):
            c_scores, c_pos, c_ung, c_read, cserved = state
            rem = need_clip & ~cserved
            idx, = jnp.nonzero(rem, size=Dc, fill_value=0)
            do = rem[idx]
            sub_cand = cand_f[idx]
            sub_rp = jnp.concatenate([rpacked2[idx], rpacked2[B + idx]],
                                     axis=0)
            sub_rn = jnp.concatenate([rnplane2[idx], rnplane2[B + idx]],
                                     axis=0)
            sub_reads2 = gpk.unpack_words_to_codes(sub_rp, sub_rn, L)
            sub_lens2 = jnp.concatenate([lengths[idx], lengths[idx]],
                                        axis=0)
            sub_cand2 = jnp.concatenate(
                [sub_cand[:, :v], sub_cand[:, v:]], axis=0)
            dfc = sub_cand2.reshape(-1)
            dp_s, dp_d0, dp_ung, _sp = clip_dp(
                jnp.where(dfc == SENTINEL, 0, dfc),
                jnp.repeat(sub_reads2, v, axis=0),
                jnp.repeat(sub_lens2, v, axis=0),
                jnp.repeat(sub_rp, v, axis=0),
                jnp.repeat(sub_rn, v, axis=0))
            dp_s, dp_d0, dp_ung = (cunfold(x) for x in (dp_s, dp_d0,
                                                        dp_ung))
            upd = do[:, None] & (sub_cand != SENTINEL)
            c_scores = c_scores.at[idx].set(
                jnp.where(upd, dp_s, c_scores[idx]))
            c_pos = c_pos.at[idx].set(
                jnp.where(upd, sub_cand + dp_d0, c_pos[idx]))
            c_ung = c_ung.at[idx].set(jnp.where(upd, dp_ung, c_ung[idx]))
            c_read = c_read.at[idx].set(c_read[idx] | do)
            cserved = cserved.at[idx].set(cserved[idx] | do)
            return c_scores, c_pos, c_ung, c_read, cserved

        scores_f, pos_f, ungapped_f, clipped_read, _cs = \
            jax.lax.while_loop(
                clip_cond, clip_body,
                (scores_f, pos_f, ungapped_f, clipped_read,
                 jnp.zeros((B,), jnp.bool_)))
        # rescued candidates: spans fall back to the length proxy
        spans_f = jnp.where(clipped_read[:, None], spans0, spans_f)

    return {
        "pos": pos_f,
        "score": scores_f,
        "strand": strands,
        "valid": valid_c,
        "ungapped": ungapped_f,
        "span": spans_f,
        "dp_ran": served,
        "clipped": clipped_read,
        # no candidate on either strand reached the vote floor: the
        # winner exists only through the weak-read fallback, i.e. its
        # placement rests on ONE uncorroborated seed from a saturated
        # (subsampled) slot — tandem/satellite territory. MAPQ is
        # capped for these reads (select/map_batch_device): on a 25%-
        # repeat genome the uncapped pipeline reported 1.5% of calls
        # confidently WRONG, all from tandem runs, because the top-V
        # vote subset missed the equal-scoring siblings and the MAPQ
        # gap formula saw no second.
        "weak": weak,
        # per-read count of saturated seed slots (both strands): the
        # suspect gate (MapConfig.suspect_deficit) needs "any evidence
        # from a subsampled slot", not just the weak-fallback signal
        "nsat": nsat,
    }


def map_batch_device(tables, reads, lengths, *, icfg: IndexConfig,
                     mcfg: MapConfig, sc: ScoreConfig, dp_runner=None,
                     gather_runner=None, csr_aligned: bool = False,
                     gather_tier: int | None = None, row128: bool = False,
                     use_pallas: bool = True, packed_reads=None,
                     off_bits: tuple[int, int] | None = None,
                     tb: bool = False):
    """Pure jnp mapping step. tables: dict(offsets, positions, genome).
    ``tb``: append the traceback-bits matrix as out["_tb"]
    (tb_pass_device)."""
    c = candidates_batch_device(tables, reads, lengths, icfg=icfg,
                                mcfg=mcfg, sc=sc, dp_runner=dp_runner,
                                gather_runner=gather_runner,
                                csr_aligned=csr_aligned,
                                gather_tier=gather_tier, row128=row128,
                                use_pallas=use_pallas,
                                packed_reads=packed_reads,
                                off_bits=off_bits)
    out = select_hits(c["pos"], c["score"], c["strand"], c["valid"],
                      lengths, c["ungapped"], mc=mcfg, k=icfg.k)
    out["dp_ran"] = c["dp_ran"]
    out["clipped"] = c["clipped"] & out["mapped"]
    # weak-fallback winners (candidates_batch_device "weak" note): the
    # placement is subsample luck in saturated-slot territory — cap
    # MAPQ so tandem/satellite reads are contained, never confident
    out["mapq"] = jnp.where(c["weak"] & out["mapped"],
                            jnp.minimum(out["mapq"],
                                        jnp.int32(mcfg.weak_mapq_cap)),
                            out["mapq"])
    # suspect winners (config.MapConfig.suspect_deficit): evidence
    # touches a saturated slot AND the best score trails perfect by
    # more than the gate — the dispersed-repeat signature of "the true
    # copy was subsampled out; a diverged sibling won unopposed". Cap
    # MAPQ; export the flag so the host second pass re-maps these rows
    # at the wide gather (WideSecondPass), which usually surfaces the
    # true copy and restores an honest confident call.
    # clip-rescued winners are excluded: an honest adapter-clipped read
    # legitimately trails the full-length perfect score by ~clip_len +
    # clip_open, so the deficit gate would cap/flag every such read that
    # touches one saturated slot — and the host second pass applies the
    # same gate, so it could never recover (round-4 advisor finding)
    from urmap_tpu.config import resolve_suspect_deficits

    sus_d, remap_d = resolve_suspect_deficits(mcfg, sc)
    deficit = lengths * jnp.int32(sc.match) - out["score"]
    sat = out["mapped"] & (c["nsat"] > 0) & ~out["clipped"]
    cap = sat & (deficit > jnp.int32(sus_d))
    out["mapq"] = jnp.where(cap,
                            jnp.minimum(out["mapq"],
                                        jnp.int32(mcfg.suspect_mapq_cap)),
                            out["mapq"])
    # the exported flag uses the LOWER remap tier (config
    # suspect_remap_deficit): close-sibling winners keep their MAPQ on
    # device but get re-adjudicated by the wide second pass
    out["suspect"] = sat & (deficit > jnp.int32(remap_d))
    if tb:
        from urmap_tpu import genome_pack as gpk

        L = mcfg.max_read_len if reads is None else reads.shape[1]
        nw = -(-L // gpk.BASES_PER_WORD)
        # forward word planes (trivially CSE'd with the identical call
        # inside candidates_batch_device — one computation in the
        # compiled program)
        if packed_reads is not None:
            pk, nm = packed_reads
            rp1, rn1 = gpk.read_words_from_upload(pk, nm, lengths, nw)
        else:
            rp1, rn1 = gpk.pack_reads(reads, lengths, nw)
        # clip-rescued rows keep the host clip-mode traceback (rare)
        gsel = out["mapped"] & out["gapped"] & ~out["clipped"]
        out["_tb"] = tb_pass_device(tables, out["pos"], out["strand"],
                                    lengths, gsel, rp1, rn1, L=L,
                                    mcfg=mcfg, sc=sc,
                                    use_pallas=use_pallas)
    return out


# ---- device traceback pass (config.MapConfig.tb_bits) ----
# Gapped winners are re-DP'd at their selected POS with per-cell
# direction bits, and the kernel WALKS those bits in VMEM, emitting one
# (deletion-run, op) byte per read row (kernels/tb_dp.py dops design —
# the raw bits were ~3 KB/read and this platform's relay moves D2H
# bytes at ~25-40 MB/s, a measured 193k → 72k reads/s regression). The
# host replays the records in O(L) (map/cigar.py). One matrix rides
# the batch D2H, flattened into the SAME array as the packed output
# (each extra relay fetch costs ~40 ms fixed):
#   rows 0-3 = meta (winner row index; walk_ok<<17 | do<<16; tb score;
#   tb anchor pos, biased), rows 4.. = packed dops words, columns =
#   the C compacted gapped-winner lanes.
TB_META_ROWS = 4


def tb_enabled(mcfg: MapConfig) -> bool:
    """THE tb-pass enable predicate — every mapper wrapper must use
    this one (a drifted copy desynchronizes the host split/reshape of
    the flattened output from the device program). Off under -endclip
    (every gapped winner needs the clip-mode host traceback), under
    URMAP_NO_TB_BITS=1, and for band_halfwidth > 31 (the dops record
    packs the deletion-run length in 6 bits, d <= 2*hw must fit —
    kernels/tb_dp.py)."""
    import os as _os

    return bool(mcfg.tb_bits and not mcfg.end_clip
                and mcfg.band_halfwidth <= 31
                and _os.environ.get("URMAP_NO_TB_BITS") != "1")


def tb_cols(nrows: int, mcfg: MapConfig) -> int:
    return min(max(nrows // mcfg.tb_capacity_frac, 128), nrows)


def tb_rows(mcfg: MapConfig) -> int:
    from urmap_tpu.kernels.tb_dp import dops_words

    return TB_META_ROWS + dops_words(mcfg.max_read_len)


def tb_pass_device(tables, pos, strand, lengths_rows, gsel, rp_fwd,
                   rn_fwd, *, L: int, mcfg: MapConfig, sc: ScoreConfig,
                   use_pallas: bool = True):
    """Compact gapped winners → windows at POS-hw → dops kernel → one
    int32 matrix [TB_META_ROWS + DWp, C].

    pos: biased int32 winner positions (row-aligned with gsel);
    rp_fwd/rn_fwd: FORWARD-strand word planes for the same rows (rc is
    taken here for the compacted subset only)."""
    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.kernels.tb_dp import tb_dops_dispatch

    nrows = gsel.shape[0]
    C = tb_cols(nrows, mcfg)
    idx, = jnp.nonzero(gsel, size=C, fill_value=0)
    # live-lane mask by COUNT, not gsel[idx]: fill lanes alias row 0,
    # whose gsel bit may genuinely be set
    do = jnp.arange(C, dtype=jnp.int32) < gsel.sum()
    lens = lengths_rows[idx]
    rp = rp_fwd[idx]
    rn = rn_fwd[idx]
    rp_rc, rn_rc = gpk.revcomp_words(rp, rn, lens, L)
    st1 = (strand[idx] == 1)[:, None]
    rp = jnp.where(st1, rp_rc, rp)
    rn = jnp.where(st1, rn_rc, rn)
    codes = gpk.unpack_words_to_codes(rp, rn, L)
    hw = mcfg.band_halfwidth
    p = jnp.where(do, pos[idx], 0)
    windows = gpk.gather_codes(tables["ginter"], tables["base_off"],
                               p - hw, L + 2 * hw)
    assert mcfg.band_halfwidth <= 31, \
        "dops d-field is 6 bits; gate tb off for wider bands (tb_enabled)"
    score, dops, walk_ok = tb_dops_dispatch(windows, codes, lens, hw=hw,
                                            sc=sc, use_pallas=use_pallas)
    # strand rides the meta so a second-pass patch that flips
    # orientation at an equal pos/score (inverted repeats) cannot
    # replay stale records (cigar._tb_select compares it)
    meta = jnp.stack([idx.astype(jnp.int32),
                      (do.astype(jnp.int32) << 16)
                      | (walk_ok.astype(jnp.int32) << 17)
                      | (strand[idx].astype(jnp.int32) << 18),
                      score, p], axis=0)
    return jnp.concatenate([meta, dops], axis=0)


def merge_tb_batches(tbs: list, row_offsets) -> dict | None:
    """Per-batch tb dicts → one dict over the concatenated result:
    rows re-based by each batch's starting row, dops matrices
    concatenated along columns (None if any batch lacks tb — the whole
    merge then falls back to the host DP rather than mixing)."""
    if not tbs or any(t is None for t in tbs):
        return None
    if len(tbs) == 1:
        return tbs[0]
    col_off = np.cumsum([0] + [t["dops"].shape[1] for t in tbs])

    def cat(key, offs):
        return np.concatenate([t[key] + o for t, o in zip(tbs, offs)])

    zero = [0] * len(tbs)
    return {
        "rows": cat("rows", list(row_offsets)),
        "score": cat("score", zero),
        "pos": cat("pos", zero),
        "strand": cat("strand", zero),
        "cols": cat("cols", col_off),
        "dops": np.concatenate([t["dops"] for t in tbs], axis=1),
        "hw": tbs[0]["hw"], "L": tbs[0]["L"],
    }


def unpack_tb(arr: np.ndarray, hw: int, L: int) -> dict:
    """Host twin of tb_pass_device's packing → dict consumed by
    map/cigar.py (rows/score/pos are filtered to the live lanes whose
    device walk was structurally valid)."""
    meta = arr[:TB_META_ROWS]
    do = ((meta[1] >> 16) & 1).astype(bool) \
        & ((meta[1] >> 17) & 1).astype(bool)
    return {
        "rows": meta[0][do].astype(np.int64),
        "score": meta[2][do].astype(np.int32),
        "pos": meta[3][do].astype(np.int64) + POS_BIAS,
        "strand": ((meta[1] >> 18) & 1)[do].astype(np.int32),
        "cols": np.nonzero(do)[0].astype(np.int32),
        "dops": arr[TB_META_ROWS:],
        "hw": hw,
        "L": L,
    }


# Single-array output packing: the D2H fetch through this platform's
# relay has a large FIXED per-array latency plus per-byte cost, so the
# jit boundary returns ONE int32 matrix per batch with the small fields
# bit-packed. Columns:
#   0 = pos (biased int32)
#   1 = (score int16 << 16) | (second int16 & 0xFFFF)
#   2 = (ungapped int16 << 16) | (mapq uint8 << 8)
#       | flag bits (1 mapped, 2 gapped, 4 dp_ran, 8 strand,
#         16 clipped — winning alignment is end-clip-rescued: host
#         traceback must run in clip mode for this row,
#         32 suspect — saturated-evidence poor-score winner
#         (MapConfig.suspect_deficit): MAPQ capped; the second pass
#         re-maps these rows at the wide gather)
# Scores/second/ungapped are saturated at I16_FLOOR on device; the floor
# round-trips back to dp.NEG on unpack. Exact for every real value: true
# alignment scores lie in [-2*max_read_len, max_read_len], and the only
# sub-floor values are NEG-derived invalid-lane fillers (all ≤ floor,
# all semantically "no alignment").
PACKED_COLS = 3
I16_FLOOR = -(1 << 15)


def _sat16(x):
    return jnp.maximum(x, jnp.int32(I16_FLOOR))


def pack_out(out) -> "jnp.ndarray":
    dp_ran = out.get("dp_ran")  # per-mate pair dicts don't carry it
    if dp_ran is None:
        dp_ran = jnp.zeros_like(out["mapped"])
    clipped = out.get("clipped")
    if clipped is None:
        clipped = jnp.zeros_like(out["mapped"])
    suspect = out.get("suspect")
    if suspect is None:
        suspect = jnp.zeros_like(out["mapped"])
    flags = (out["mapped"].astype(jnp.int32)
             | (out["gapped"].astype(jnp.int32) << 1)
             | (dp_ran.astype(jnp.int32) << 2)
             | (out["strand"].astype(jnp.int32) << 3)
             | (clipped.astype(jnp.int32) << 4)
             | (suspect.astype(jnp.int32) << 5))
    col1 = (_sat16(out["score"]) << 16) | (_sat16(out["second"]) & 0xFFFF)
    col2 = ((_sat16(out["ungapped"]) << 16)
            | (out["mapq"].astype(jnp.int32) << 8) | flags)
    return jnp.stack([out["pos"].astype(jnp.int32), col1, col2], axis=1)


def _unsat16(x: np.ndarray) -> np.ndarray:
    return np.where(x == I16_FLOOR, np.int32(NEG), x.astype(np.int32))


def unpack_out(arr: np.ndarray) -> dict:
    col1 = arr[:, 1]
    col2 = arr[:, 2]
    flags = col2 & 0xFF
    second = ((col1 & 0xFFFF) ^ 0x8000) - 0x8000      # sign-extend i16
    return {
        "mapped": (flags & 1).astype(bool),
        "gapped": ((flags >> 1) & 1).astype(bool),
        "dp_ran": ((flags >> 2) & 1).astype(bool),
        "strand": ((flags >> 3) & 1).astype(np.int32),
        "clipped": ((flags >> 4) & 1).astype(bool),
        "suspect": ((flags >> 5) & 1).astype(bool),
        # device positions are biased int32 → real int64 coordinates
        "pos": arr[:, 0].astype(np.int64) + POS_BIAS,
        "score": _unsat16(col1 >> 16),
        "second": _unsat16(second),
        "mapq": (col2 >> 8) & 0xFF,
        "ungapped": _unsat16(col2 >> 16),
    }


def make_map_batch_fn(icfg: IndexConfig, mcfg: MapConfig,
                      sc: ScoreConfig | None = None, *, packed: bool = True,
                      packed_input: bool = False,
                      csr_aligned: bool = False,
                      gather_tier: int | None = None,
                      row128: bool = False,
                      use_pallas: bool = True,
                      off_bits: tuple[int, int] | None = None,
                      tb: bool = False):
    """Returns jitted fn(tables, reads, lengths) → packed int32[B, 6]
    (or the raw output dict with packed=False). With ``tb`` the packed
    forms return (packed, tb_matrix) — pipeline.tb_pass_device.

    ``packed_input``: fn takes (tables, rpacked, nmask, lengths) with the
    read block packed 4 bases/byte + N plane (genome_pack.
    pack_read_codes_host) and unpacks on device — the H2D batch upload
    is the e2e bottleneck on the axon relay (tools/bench_upload.py:
    407k vs 176k reads/s), and 3.2× fewer uploaded bytes hide it in the
    pipeline bubble. Bit-identical to the unpacked path.

    ``off_bits``: (cnt_bits, block_bits) when tables carry packed row128
    offsets (store.pack_offsets_row128; tables["obase"] present)."""
    sc = sc or ScoreConfig()
    fn = functools.partial(map_batch_device, icfg=icfg, mcfg=mcfg, sc=sc,
                          csr_aligned=csr_aligned, gather_tier=gather_tier,
                          row128=row128, use_pallas=use_pallas,
                          off_bits=off_bits, tb=tb)
    if not packed:
        return jax.jit(fn)

    def _emit(out):
        # tb matrix FLATTENED into the same array as the packed output:
        # the relay charges ~40 ms FIXED per fetched array (see
        # tb_pass_device note); hosts split by known static sizes
        if tb:
            return jnp.concatenate([pack_out(out).reshape(-1),
                                    out["_tb"].reshape(-1)])
        return pack_out(out)

    if packed_input:
        def packed_in_fn(tables, rpk, rnm, lengths):
            # word-native front door: the upload bytes feed the word
            # planes directly (no byte unpack -> re-pack round trip)
            return _emit(fn(tables, None, lengths,
                            packed_reads=(rpk, rnm)))

        return jax.jit(packed_in_fn)

    def packed_fn(tables, reads, lengths):
        return _emit(fn(tables, reads, lengths))

    return jax.jit(packed_fn)


def revcomp_strand_codes(codes: np.ndarray, result: MapResult) -> np.ndarray:
    """Host helper: strand-applied read codes (rc rows reversed-complemented
    in place of the original) for CIGAR recomputation / verification."""
    sel = np.asarray(result.mapped & (result.strand == 1))
    if not sel.any():
        return codes
    out = codes.copy()
    sub = codes[sel]
    lens = np.asarray(result.lengths)[sel]
    L = codes.shape[1]
    if (lens == L).all():
        # uniform full-length rows (the common Illumina case): plain
        # complement + reverse, no per-row index matrix
        out[sel] = _COMP[sub[:, ::-1]]
        return out
    idx = np.where(np.arange(L)[None, :] < lens[:, None],
                   lens[:, None] - 1 - np.arange(L)[None, :],
                   np.arange(L)[None, :])
    out[sel] = _COMP[np.take_along_axis(sub, idx, axis=1)]
    return out


class WideSecondPass:
    """Host-CPU wide-gather recovery pass (MapConfig.second_pass_p): a
    second copy of the map program, jitted for the CPU backend, over a
    table recapped at the WIDER cap — host RAM instead of HBM. Reads the
    device pass leaves unmapped (true locus subsampled out of the narrow
    recap) are re-mapped there; everything else keeps the device result.
    Shared by the single-device Mapper and the sharded mapper."""

    def __init__(self, index, mcfg: MapConfig, sc: ScoreConfig):
        import dataclasses

        import jax

        from urmap_tpu.index.store import load_prepared, prepare_tables

        sp = mcfg.second_pass_p
        assert sp >= mcfg.positions_per_seed, (
            f"second_pass_p {sp} narrower than the first pass "
            f"({mcfg.positions_per_seed})")
        self.icfg = index.config
        self.mcfg = mcfg
        self._dev = jax.devices("cpu")[0]
        prep = load_prepared(index, sp)
        if prep is None:
            prep = prepare_tables(index, sp)
        ht2, meta2 = prep

        def put(x):
            return jax.device_put(np.asarray(x), self._dev)

        pos2 = ht2["positions"]
        gin2 = ht2["ginter"]
        if meta2.get("layout") == "row128":
            from urmap_tpu.index.store import ginter_rows

            pos2 = np.asarray(pos2).reshape(-1, 128)
            gin2 = ginter_rows(gin2)
        self._tables = {
            "offsets": put(ht2["offsets"]),
            "positions": put(pos2),
            "ginter": put(gin2),
            "base_off": int(ht2["base_off"]),
            "genome_max_biased": np.int32(ht2["genome_max_biased"]),
        }
        self._batch = 512
        spcfg = dataclasses.replace(mcfg, positions_per_seed=sp,
                                    batch_size=self._batch,
                                    second_pass_p=0)
        from urmap_tpu.index.store import effective_gather_tier

        # use_pallas=False: this program runs on the CPU backend while
        # the process's DEFAULT backend is the TPU, so the dispatches'
        # on_tpu() check would wrongly pick Mosaic kernels (caught by
        # the round-3 GRCh38 capstone run: 'Only interpret mode is
        # supported on CPU backend')
        self._fn = make_map_batch_fn(
            self.icfg, spcfg, sc, packed_input=False,
            csr_aligned=bool(meta2["csr_aligned"]),
            gather_tier=effective_gather_tier(meta2),
            row128=meta2.get("layout") == "row128",
            use_pallas=False)

    def __call__(self, codes: np.ndarray, lengths,
                 result: MapResult) -> MapResult:
        import jax

        lengths = np.asarray(lengths)
        sel = ~result.mapped
        if result.suspect is not None:
            # suspect rows (MapConfig.suspect_deficit): device winner is
            # a poor-scoring call on subsampled evidence — the wide
            # gather here usually surfaces the subsampled-out true copy
            # and replaces the call with an honest confident one
            sel = sel | result.suspect
        rows = np.nonzero(sel & (lengths[: len(result.mapped)]
                                 >= self.icfg.k))[0]
        if rows.size == 0:
            return result
        L, SPB = self.mcfg.max_read_len, self._batch
        for s in range(0, rows.size, SPB):
            r = rows[s : s + SPB]
            c = np.full((SPB, L), alphabet.READ_N, np.uint8)
            c[: r.size, : codes.shape[1]] = codes[r]
            ln = np.zeros(SPB, np.int32)
            ln[: r.size] = lengths[r]
            out = unpack_out(np.asarray(self._fn(
                self._tables, jax.device_put(c, self._dev),
                jax.device_put(ln, self._dev))))
            got = out["mapped"][: r.size]
            pr = r[got]
            if pr.size == 0:
                continue
            src = np.nonzero(got)[0]
            result.mapped[pr] = True
            result.pos[pr] = out["pos"][src]
            result.strand[pr] = out["strand"][src]
            result.score[pr] = out["score"][src]
            result.second[pr] = out["second"][src]
            result.mapq[pr] = out["mapq"][src]
            result.gapped[pr] = out["gapped"][src]
            if result.ungapped is not None:
                result.ungapped[pr] = out["ungapped"][src]
            # clip-rescued recoveries need clip-mode host traceback
            # too — dropping this flag aborts cigars_nm_blob on the
            # score-consistency check (round-3 review finding)
            if result.clipped is not None:
                result.clipped[pr] = out["clipped"][src]
            if result.suspect is not None:
                # a row still suspect at the wide gather keeps its flag
                # (and its capped MAPQ from the host program); resolved
                # rows clear it
                result.suspect[pr] = out["suspect"][src]
        return result


class Mapper:
    """Convenience host wrapper: holds device tables + jitted step, maps
    host batches. (The CLI and tests drive this; dist/ wraps the sharded
    version.)"""

    def __init__(self, index, mcfg: MapConfig | None = None,
                 sc: ScoreConfig | None = None, *,
                 packed_upload: bool = True):
        self.index = index
        self.icfg = index.config
        self.mcfg = mcfg or MapConfig()
        self.sc = sc or ScoreConfig()
        self.packed_upload = packed_upload
        # gather width = explicit unbiased cap (slots with more positions
        # than the per-seed gather budget are evenly subsampled on host);
        # the table rides row-ALIGNED (store.device_tables row_align) so
        # the CSR gather fetches one aligned row per seed — UNLESS the
        # no-straddle pad would bloat HBM (mid-loaded slots, e.g. a
        # GRCh38-scale index at auto slot_bits, pad ~35%): then classic
        # CSR + straddle-row gather keeps the table dense.
        from urmap_tpu.index.store import (load_prepared, prepare_tables,
                                           tables_to_device)
        from urmap_tpu.kernels.preflight import ensure_kernels

        # seed/vote kernel lowering probe: one tiny compile on TPU
        # backends; flips the jnp-fallback env hatches on failure so a
        # Mosaic regression degrades to slow-but-correct (kernels/
        # preflight.py)
        ensure_kernels()
        p = self.mcfg.positions_per_seed
        # map-ready tables: the prepared_p<p>/ cache next to the index
        # (written by -make_ufi / save_prepared) skips the recap/align/
        # pack prep — ~tens of minutes at GRCh38 scale
        prep = load_prepared(index, p)
        if prep is None:
            prep = prepare_tables(index, p)
        ht, meta = prep
        from urmap_tpu.index.store import effective_gather_tier

        self.csr_aligned = meta["csr_aligned"]
        self.gather_tier = effective_gather_tier(meta)
        self.row128 = meta.get("layout") == "row128"
        # packed row128 offsets: half the offsets HBM + gather bytes
        # (store.pack_offsets_row128). URMAP_NO_PACKED_OFFSETS=1 is the
        # escape hatch back to the plain uint32 table.
        import os as _os

        self.off_bits = None
        if (self.row128 and ht.get("opacked") is not None
                and _os.environ.get("URMAP_NO_PACKED_OFFSETS") != "1"):
            self.off_bits = tuple(meta["off_bits"])
        self.tables = tables_to_device(
            ht, use_packed_offsets=self.off_bits is not None)
        # device traceback records — ONE shared predicate (tb_enabled;
        # the URMAP_NO_TB_KERNEL hatch only swaps kernel -> jnp twin)
        self.tb = tb_enabled(self.mcfg)
        self._fn = make_map_batch_fn(self.icfg, self.mcfg, self.sc,
                                     packed_input=packed_upload,
                                     csr_aligned=self.csr_aligned,
                                     gather_tier=self.gather_tier,
                                     row128=self.row128,
                                     off_bits=self.off_bits,
                                     tb=self.tb)
        self.second = (WideSecondPass(index, self.mcfg, self.sc)
                       if self.mcfg.second_pass_p else None)

    def second_pass(self, codes: np.ndarray, lengths,
                    result: MapResult) -> MapResult:
        """Re-map ``result``'s unmapped rows through the CPU wide-gather
        pass and patch the recovered calls in place (no-op when
        second_pass_p is 0). Thread-safe — callable from the formatting
        worker pool so the host pass overlaps the next device batch."""
        if self.second is None:
            return result
        return self.second(codes, lengths, result)

    def _pad_full(self, codes: np.ndarray, lengths: np.ndarray):
        """Pad to the full [batch_size, max_read_len] block (rows with
        zero-length READ_N reads, columns with READ_N — semantics-free:
        lengths mask everything and revcomp requires uniform pad)."""
        B = codes.shape[0]
        bs, Lm = self.mcfg.batch_size, self.mcfg.max_read_len
        assert B <= bs, f"batch {B} > configured batch_size {bs}"
        assert codes.shape[1] <= Lm, \
            f"read block width {codes.shape[1]} > max_read_len {Lm}"
        if B < bs or codes.shape[1] < Lm:
            block = np.full((bs, Lm), alphabet.READ_N, np.uint8)
            block[:B, : codes.shape[1]] = codes
            codes = block
            lengths = np.concatenate(
                [lengths, np.zeros(bs - B, np.int32)])
        return codes, lengths.astype(np.int32)

    def prepack(self, codes: np.ndarray, lengths: np.ndarray):
        """Host-side upload prep (pad + 2-bit pack) for start_batch's
        ``prepacked``. Call OFF the dispatch thread (e.g. via
        PrefetchIterator's transform) — pad+pack is ~15 ms/32k batch of
        dispatch-thread time otherwise (tools/bench_e2e_phases.py)."""
        B = codes.shape[0]
        codes, lengths = self._pad_full(codes, lengths)
        if not self.packed_upload:
            return codes, None, lengths, B
        from urmap_tpu import genome_pack as gpk

        pk, nm = gpk.pack_read_codes_host(codes)
        return pk, nm, lengths, B

    def start_batch(self, codes: np.ndarray, lengths: np.ndarray, *,
                    prepacked=None):
        """Dispatch one (≤batch_size) batch; returns an async handle.
        JAX dispatch is asynchronous — the device computes while the
        host formats the previous batch (double buffering, SURVEY.md
        Phase 5). With packed_upload (default) the read block rides the
        wire packed 4 bases/byte + N plane and unpacks on device.
        ``prepacked`` (from .prepack) skips the host-side prep here."""
        pk, nm, lengths, B = (prepacked if prepacked is not None
                              else self.prepack(codes, lengths))
        if self.packed_upload:
            out = self._fn(self.tables, jnp.asarray(pk), jnp.asarray(nm),
                           jnp.asarray(lengths))
        else:
            out = self._fn(self.tables, jnp.asarray(pk),
                           jnp.asarray(lengths))
        return out, B

    def finish_batch(self, handle, lengths) -> MapResult:
        out, B = handle
        arr = np.asarray(out)
        tbmat = None
        if self.tb:
            bs = self.mcfg.batch_size
            split = bs * PACKED_COLS
            tbmat = arr[split:].reshape(tb_rows(self.mcfg),
                                        tb_cols(bs, self.mcfg))
            arr = arr[:split].reshape(bs, PACKED_COLS)
        merged = {k: v[:B] for k, v in unpack_out(arr).items()}
        res = MapResult.from_device(merged, np.asarray(lengths)[:B])
        if tbmat is not None:
            res.tb = unpack_tb(tbmat, self.mcfg.band_halfwidth,
                               self.mcfg.max_read_len)
        return res

    def map_codes(self, codes: np.ndarray, lengths: np.ndarray) -> MapResult:
        B = codes.shape[0]
        bs = self.mcfg.batch_size
        outs = []
        for s in range(0, B, bs):
            h = self.start_batch(codes[s : s + bs], lengths[s : s + bs])
            outs.append(self.second_pass(
                codes[s : s + bs], lengths[s : s + bs],
                self.finish_batch(h, lengths[s : s + bs])))
        if len(outs) == 1:
            return outs[0]
        merged = {}
        first = outs[0]
        for f in ("mapped", "pos", "strand", "score", "second", "mapq",
                  "gapped", "ungapped", "clipped", "suspect"):
            merged[f] = np.concatenate([getattr(o, f) for o in outs])
        res = MapResult(lengths=np.asarray(lengths)[:B], **merged)
        # keep the device traceback across the multi-batch merge, or
        # every gapped winner here silently pays the host DP again
        res.tb = merge_tb_batches([o.tb for o in outs],
                                  range(0, B, bs))
        return res
