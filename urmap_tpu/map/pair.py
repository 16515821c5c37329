"""Paired-end pairing + mate rescue (SURVEY.md §2.11).

The reference pairs mates inside its per-read scalar loop; here pairing is
one fixed-shape batched stage on top of the shared candidate pipeline:

  1. Both mates of the whole batch ride one candidates_batch_device call
     (reads concatenated, [2B] rows).
  2. Concordance scoring over the V1×V2 candidate cross-product: FR
     orientation, fragment length (TLEN) inside the configured window,
     pair score = s1 + s2. Best and distinct-locus second-best pair are
     selected with vectorized argmax.
  3. Mate rescue for pairs with exactly one confidently mapped mate and
     no concordant pair: the expected mate window (rescue_window bases,
     derived from the anchor's strand and the fragment window) is scanned
     for the best ungapped offset by an integer sliding-window match
     accumulation (a fori_loop of L vectorized compares — loop-safe on
     TPU, unlike the bf16 grouped conv it replaced, which produced
     garbage when traced inside lax.while_loop on real chips), then the
     winning offset is verified by the same banded affine DP as every
     other candidate.

MAPQ for proper pairs uses the pair-score gap (best vs distinct-locus
second pair); discordant/single mates keep the single-end formula.
PARITY-TODO (config.py): the reference's exact pairing/rescue/MAPQ
constants are unverified (empty reference mount, SURVEY.md §0).
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
from urmap_tpu.map.pipeline import (MapResult, candidates_batch_device,
                                    revcomp_batch)
from urmap_tpu.map.seed import POS_BIAS
from urmap_tpu.map.select import select_hits

# Rescued mates get at most this MAPQ (their placement is inferred from
# the anchor, not independently seeded). PARITY-TODO.
RESCUE_MAPQ_CAP = 30


def _take(x, idx):
    return jnp.take_along_axis(x, idx[:, None], axis=-1)[:, 0]


def _pair_cross(c1, c2, l1, l2, mc: MapConfig):
    """Concordant-pair scoring over the candidate cross-product.

    c1/c2: candidate dicts (pos/score/strand/valid [B, C]).
    Returns dict with best pair indices/scores and distinct-second score.
    """
    B, C = c1["pos"].shape
    neg = jnp.int32(NEG)
    s1 = jnp.where(c1["valid"], c1["score"], neg)[:, :, None]   # [B, C, 1]
    s2 = jnp.where(c2["valid"], c2["score"], neg)[:, None, :]   # [B, 1, C]
    p1 = c1["pos"][:, :, None]
    p2 = c2["pos"][:, None, :]
    st1 = c1["strand"][:, :, None]
    st2 = c2["strand"][:, None, :]
    L1 = l1[:, None, None]
    L2 = l2[:, None, None]

    fwd1 = st1 == 0
    pf = jnp.where(fwd1, p1, p2)
    pr = jnp.where(fwd1, p2, p1)
    if mc.end_clip or "span" not in c1:
        # clip-mode DP spans are meaningless (dp.banded_from_windows d1
        # note) → read-length proxy. PARITY-TODO once a reference exists.
        Lr = jnp.where(fwd1, L2, L1)
    else:
        # exact aligned ref span of the rightmost mate (DP candidates:
        # lengths + d1 - d0; M-only candidates: read length) — the
        # concordance TLEN now agrees with the emitted SAM TLEN's CIGAR
        # ref span (round-1 verdict weak item 4).
        sp1 = c1["span"][:, :, None]
        sp2 = c2["span"][:, None, :]
        Lr = jnp.where(fwd1, sp2, sp1)
    # (pr - pf) first: positions are biased int32 (seed.POS_BIAS) and
    # may sit near INT32_MAX on large genomes — adding Lr before the
    # subtraction could overflow; the difference is always small.
    tlen = (pr - pf) + Lr
    ok = ((st1 != st2) & c1["valid"][:, :, None] & c2["valid"][:, None, :]
          & (pf <= pr) & (tlen >= mc.min_fragment_len)
          & (tlen <= mc.max_fragment_len))
    pscore = jnp.where(ok, s1 + s2, neg)

    flat = pscore.reshape(B, C * C)
    flat_pf = pf.reshape(B, C * C)
    best_idx = jnp.argmax(flat, axis=-1)
    best = _take(flat, best_idx)
    best_pf = _take(flat_pf, best_idx)
    i1 = best_idx // C
    i2 = best_idx % C

    radius = jnp.int32(mc.max_read_len)
    distinct = (jnp.abs(flat_pf - best_pf[:, None]) > radius) & (flat > neg)
    second = jnp.max(jnp.where(distinct, flat, neg), axis=-1)
    return {"i1": i1, "i2": i2, "score": best, "second": second,
            "has": best > neg // 2}


def _rescue_scan(tables, anchor_pos, anchor_strand, anchor_len, other_codes,
                 other_len, *, mc: MapConfig, sc: ScoreConfig):
    """Windowed rescue: best ungapped offset by an integer sliding-window
    match accumulation (fori_loop of vectorized compares), verified by
    banded DP. other_codes must already be strand-applied to the EXPECTED
    mate orientation (revcomp of the as-sequenced read when the anchor is
    forward)."""
    from urmap_tpu import genome_pack as gpk

    B, L = other_codes.shape
    W = mc.rescue_window
    O = W - L + 1

    slack = mc.band_halfwidth + 8
    # anchor fwd → mate (rc) right of it; anchor rc → mate (fwd) left of it
    win_start = jnp.where(
        anchor_strand == 0,
        anchor_pos + mc.min_fragment_len - other_len - slack,
        anchor_pos + anchor_len - mc.max_fragment_len - slack,
    ).astype(jnp.int32)
    win = gpk.gather_codes(tables["ginter"], tables["base_off"],
                           win_start, W)                         # [B, W]

    # counts[b, o] = #{l : win[b, o+l] == read[b, l]} by an integer
    # sliding-window accumulation. Read pads are READ_N (5) and genome
    # N is 4, so pads/Ns never match — same semantics as the one-hot
    # correlation this replaces. (The previous grouped bf16
    # conv_general_dilated silently produced garbage when traced INSIDE
    # a lax.while_loop on real TPU — caught by the /tmp/verify_e2e
    # corpus, reproduced in isolation; integer adds are loop-safe.)
    def _acc(l, acc):
        seg = jax.lax.dynamic_slice_in_dim(win, l, O, axis=1)
        rl = jax.lax.dynamic_slice_in_dim(other_codes, l, 1, axis=1)
        return acc + (seg == rl).astype(jnp.int32)
    counts = jax.lax.fori_loop(0, L, _acc,
                               jnp.zeros((B, O), jnp.int32))       # [B, O]
    best_off = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    # genome range in biased device coordinates (seed.POS_BIAS)
    cand = jnp.clip(win_start + best_off, -POS_BIAS,
                    tables["genome_max_biased"])

    rp, rn = gpk.pack_reads(other_codes, other_len,
                            -(-L // gpk.BASES_PER_WORD))
    score, d0, ungapped, _span = banded_packed(
        tables["ginter"], tables["base_off"],
        cand, other_codes, other_len, rp, rn,
        hw=mc.band_halfwidth, sc=sc,
        clip_open=sc.clip_open if mc.end_clip else None)
    return {"pos": cand + d0, "score": score, "ungapped": ungapped}


def map_pairs_device(tables, r1, l1, r2, l2, *, icfg: IndexConfig,
                     mcfg: MapConfig, sc: ScoreConfig,
                     csr_aligned: bool = False,
                     gather_tier: int | None = None,
                     row128: bool = False,
                     gather_runner=None, dp_runner=None,
                     off_bits: tuple[int, int] | None = None,
                     tb: bool = False):
    """Full paired-end device step → per-mate output dicts + pair flags.

    ``gather_runner``/``dp_runner``: mesh-aware stage overrides for the
    sharded path (dist/sharded.py) — pairing, concordance and mate
    rescue all run on whatever device holds the pair (the rescue window
    scan reads the replicated packed genome, not the CSR), so only the
    candidate stage needs to know about the mesh."""
    B, L = r1.shape
    reads = jnp.concatenate([r1, r2], axis=0)
    lens = jnp.concatenate([l1, l2], axis=0)
    c = candidates_batch_device(tables, reads, lens, icfg=icfg, mcfg=mcfg,
                                sc=sc, csr_aligned=csr_aligned,
                                gather_tier=gather_tier, row128=row128,
                                gather_runner=gather_runner,
                                dp_runner=dp_runner, off_bits=off_bits)
    c1 = {k: v[:B] for k, v in c.items()}
    c2 = {k: v[B:] for k, v in c.items()}

    # single-end selection per mate (fallback + anchors)
    se1 = select_hits(c1["pos"], c1["score"], c1["strand"], c1["valid"],
                      l1, c1["ungapped"], mc=mcfg, k=icfg.k)
    se2 = select_hits(c2["pos"], c2["score"], c2["strand"], c2["valid"],
                      l2, c2["ungapped"], mc=mcfg, k=icfg.k)

    pair = _pair_cross(c1, c2, l1, l2, mcfg)
    neg = jnp.int32(NEG)

    def min_score(lengths):
        return jnp.ceil(mcfg.min_score_frac
                        * lengths.astype(jnp.float32)).astype(jnp.int32)

    p_s1 = _take(c1["score"], pair["i1"])
    p_s2 = _take(c2["score"], pair["i2"])
    proper = (pair["has"] & (p_s1 >= min_score(l1)) & (p_s2 >= min_score(l2))
              & (l1 >= icfg.k) & (l2 >= icfg.k))

    pair_gap = (pair["score"] - pair["second"]).astype(jnp.float32)
    pair_mapq = jnp.clip(jnp.round(mcfg.mapq_scale * pair_gap),
                         0, mcfg.max_mapq).astype(jnp.int32)
    pair_mapq = jnp.where(pair["second"] <= neg // 2, mcfg.max_mapq,
                          pair_mapq)

    # ---- mate rescue (anchored on the better-mapped single-end mate) ----
    a1 = se1["mapped"] & ~se2["mapped"] & ~proper      # mate1 anchors mate2
    a2 = se2["mapped"] & ~se1["mapped"] & ~proper      # mate2 anchors mate1
    any_anchor = a1 | a2
    anchor_pos = jnp.where(a1, se1["pos"], se2["pos"])
    anchor_strand = jnp.where(a1, se1["strand"], se2["strand"])
    anchor_len = jnp.where(a1, l1, l2)
    other_len = jnp.where(a1, l2, l1)
    # expected orientation of the rescued mate = opposite of the anchor;
    # build the strand-applied (genome-forward) codes for the scan
    r2rc = revcomp_batch(r2, l2)
    r1rc = revcomp_batch(r1, l1)
    other_as_seq = jnp.where(a1[:, None], r2, r1)
    other_rc = jnp.where(a1[:, None], r2rc, r1rc)
    exp_strand = 1 - anchor_strand
    other_codes = jnp.where((exp_strand == 1)[:, None], other_rc,
                            other_as_seq)
    # Bucketed rescue rounds (config.rescue_capacity_frac): gather the
    # pairs that actually need a rescue into fixed-size lanes, run the
    # window scan + DP there, scatter back. while_loop ⇒ zero rounds on
    # batches with nothing to rescue, full coverage otherwise.
    Dr = max(B // mcfg.rescue_capacity_frac, 1)

    def resc_cond(state):
        return jnp.any(any_anchor & ~state[3])

    def resc_body(state):
        r_pos, r_score, r_ung, served = state
        rem = any_anchor & ~served
        idx, = jnp.nonzero(rem, size=Dr, fill_value=0)
        do = rem[idx]
        sub = _rescue_scan(
            tables,
            jnp.where(do, anchor_pos[idx], 0),
            anchor_strand[idx], anchor_len[idx],
            other_codes[idx], other_len[idx], mc=mcfg, sc=sc)
        r_pos = r_pos.at[idx].set(jnp.where(do, sub["pos"], r_pos[idx]))
        r_score = r_score.at[idx].set(
            jnp.where(do, sub["score"], r_score[idx]))
        r_ung = r_ung.at[idx].set(
            jnp.where(do, sub["ungapped"], r_ung[idx]))
        served = served.at[idx].set(served[idx] | do)
        return r_pos, r_score, r_ung, served

    r_pos0 = jnp.zeros((B,), jnp.int32)
    r_neg = jnp.full((B,), NEG, jnp.int32)
    r_pos, r_score, r_ung, _served = jax.lax.while_loop(
        resc_cond, resc_body,
        (r_pos0, r_neg, r_neg, jnp.zeros((B,), jnp.bool_)))
    resc = {"pos": r_pos, "score": r_score, "ungapped": r_ung}
    resc_ok = any_anchor & (resc["score"] >= min_score(other_len)) \
        & (other_len >= icfg.k)
    anchor_mapq = jnp.where(a1, se1["mapq"], se2["mapq"])
    resc_mapq = jnp.minimum(anchor_mapq, RESCUE_MAPQ_CAP)

    # ---- final per-mate fields ----
    def mate_out(se, cm, idx, is_first):
        """Choose paired candidate when proper, else rescue, else single."""
        p_pos = _take(cm["pos"], idx)
        p_strand = _take(cm["strand"], idx)
        p_score = _take(cm["score"], idx)
        p_ung = _take(cm["ungapped"], idx)
        my_weak = c1["weak"] if is_first else c2["weak"]
        other_weak = c2["weak"] if is_first else c1["weak"]
        rescued = resc_ok & (a1 if not is_first else a2)
        mapped = proper | se["mapped"] | rescued
        pos = jnp.where(proper, p_pos,
                        jnp.where(rescued, resc["pos"], se["pos"]))
        strand = jnp.where(proper, p_strand,
                           jnp.where(rescued, exp_strand, se["strand"]))
        score = jnp.where(proper, p_score,
                          jnp.where(rescued, resc["score"], se["score"]))
        gapped = jnp.where(proper, p_ung < p_score,
                           jnp.where(rescued,
                                     resc["ungapped"] < resc["score"],
                                     se["gapped"]))
        ung = jnp.where(proper, p_ung,
                        jnp.where(rescued, resc["ungapped"],
                                  se["ungapped"]))
        mapq = jnp.where(proper, jnp.maximum(se["mapq"], pair_mapq),
                         jnp.where(rescued, resc_mapq, se["mapq"]))
        # weak-fallback mate (no candidate reached the vote floor —
        # pipeline "weak" note): its own placement is subsample luck in
        # saturated-slot (tandem/satellite) territory. Concordant with
        # a CORROBORATED anchor the fragment constraint restores
        # rescue-grade confidence (RESCUE_MAPQ_CAP); otherwise cap hard
        # — the pair-gap formula cannot see the equal-scoring siblings.
        wcap = jnp.where(proper & ~other_weak,
                         jnp.int32(RESCUE_MAPQ_CAP),
                         jnp.int32(mcfg.weak_mapq_cap))
        mapq = jnp.where(my_weak, jnp.minimum(mapq, wcap), mapq)
        mapq = jnp.where(mapped, mapq, 0)
        # clip-rescue flag (candidates_batch_device): proper/single
        # winners of a clip-rescued read carry clip-mode scores (host
        # traceback must clip); window-rescued mates use the plain DP
        return {
            "mapped": mapped,
            "pos": pos,
            "strand": strand,
            "score": score,
            "second": se["second"],
            "mapq": mapq,
            "gapped": mapped & gapped,
            "ungapped": ung,
            "clipped": mapped & cm["clipped"] & ~rescued,
        }

    out1 = mate_out(se1, c1, pair["i1"], is_first=True)
    out2 = mate_out(se2, c2, pair["i2"], is_first=False)

    # ---- suspect gate, per mate (pipeline.map_batch_device note) ----
    # raw suspicion = saturated evidence AND the FINAL chosen score
    # trails perfect by more than the gate. A window-RESCUED mate has
    # no seed evidence of its own — it inherits the anchor's suspicion.
    # A suspect mate riding a proper pair with a CLEAN other mate keeps
    # rescue-grade confidence (fragment-corroborated, like the weak
    # cap) and is NOT flagged for the second pass — re-mapping a
    # corroborated mate could only break a good pair. Everything else
    # is capped hard and exported for the wide re-map.
    m = jnp.int32(sc.match)
    def1 = l1 * m - out1["score"]
    def2 = l2 * m - out2["score"]
    sat1 = c1["nsat"] > 0
    sat2 = c2["nsat"] > 0
    from urmap_tpu.config import resolve_suspect_deficits

    sus_d, remap_d = resolve_suspect_deficits(mcfg, sc)
    sd = jnp.int32(sus_d)
    rd = jnp.int32(remap_d)
    raw1, rm1 = sat1 & (def1 > sd), sat1 & (def1 > rd)
    raw2, rm2 = sat2 & (def2 > sd), sat2 & (def2 > rd)
    resc1 = resc_ok & a2          # mate1 was rescued off mate2's anchor
    resc2 = resc_ok & a1
    eff1 = jnp.where(resc1, raw2, raw1)
    eff2 = jnp.where(resc2, raw1, raw2)
    effr1 = jnp.where(resc1, rm2, rm1)
    effr2 = jnp.where(resc2, rm1, rm2)
    for out, eff, other_eff, effr, other_effr in (
            (out1, eff1, eff2, effr1, effr2),
            (out2, eff2, eff1, effr2, effr1)):
        # clip-rescued mates are excluded like the SE gate
        # (pipeline.map_batch_device): their score legitimately trails
        # perfect by the clipped tail, not by repeat divergence
        sus = out["mapped"] & eff & ~out["clipped"]
        corrob = proper & ~other_eff
        cap = jnp.where(corrob, jnp.int32(RESCUE_MAPQ_CAP),
                        jnp.int32(mcfg.suspect_mapq_cap))
        out["mapq"] = jnp.where(sus, jnp.minimum(out["mapq"], cap),
                                out["mapq"])
        # exported remap flag (lower tier, pipeline note) — still
        # excluding fragment-corroborated mates, whose re-map could
        # only break a good pair
        out["suspect"] = (out["mapped"] & effr & ~out["clipped"]
                          & ~(proper & ~other_effr))

    prop = proper | resc_ok
    res = {"m1": out1, "m2": out2, "proper": prop}
    if tb:
        # device traceback bits over BOTH mates' final winners (rows
        # [0,B) = mate1, [B,2B) = mate2 — matching the candidates
        # stacking) — covers proper-pair, rescue and single-end
        # winners uniformly, since the pass re-anchors at whatever POS
        # won (pipeline.tb_pass_device)
        from urmap_tpu import genome_pack as gpk
        from urmap_tpu.map.pipeline import tb_pass_device

        nw = -(-L // gpk.BASES_PER_WORD)
        rp, rn = gpk.pack_reads(reads, lens, nw)   # CSE'd w/ candidates
        pos2 = jnp.concatenate([out1["pos"], out2["pos"]])
        strand2 = jnp.concatenate([out1["strand"], out2["strand"]])
        gsel = jnp.concatenate(
            [o["mapped"] & o["gapped"] & ~o["clipped"]
             for o in (out1, out2)])
        res["_tb"] = tb_pass_device(tables, pos2, strand2, lens, gsel,
                                    rp, rn, L=L, mcfg=mcfg, sc=sc)
    return res


def make_map_pairs_fn(icfg: IndexConfig, mcfg: MapConfig,
                      sc: ScoreConfig | None = None, *,
                      packed_input: bool = False,
                      csr_aligned: bool = False,
                      gather_tier: int | None = None,
                      row128: bool = False,
                      off_bits: tuple[int, int] | None = None,
                      tb: bool = False):
    """Jitted paired step → ONE packed int32[B, 2*PACKED_COLS+1]
    (mate1 cols, mate2 cols — pipeline.pack_out layout — then proper):
    a single D2H fetch per batch (see pipeline.PACKED_COLS note).
    ``packed_input``: mate blocks arrive packed 4 bases/byte + N plane
    (see pipeline.make_map_batch_fn) and unpack on device. ``tb``:
    the return becomes (packed, tb_matrix) — pipeline.tb_pass_device."""
    from urmap_tpu.map.pipeline import pack_out

    sc = sc or ScoreConfig()
    fn = functools.partial(map_pairs_device, icfg=icfg, mcfg=mcfg, sc=sc,
                          csr_aligned=csr_aligned, gather_tier=gather_tier,
                          row128=row128, off_bits=off_bits, tb=tb)

    def combine(tables, r1, l1, r2, l2):
        out = fn(tables, r1, l1, r2, l2)
        packed = jnp.concatenate(
            [pack_out(out["m1"]), pack_out(out["m2"]),
             out["proper"].astype(jnp.int32)[:, None]], axis=1)
        if tb:
            # one D2H array (pipeline make_map_batch_fn _emit note)
            return jnp.concatenate([packed.reshape(-1),
                                    out["_tb"].reshape(-1)])
        return packed

    if packed_input:
        from urmap_tpu import genome_pack as gpk

        def packed_in_fn(tables, pk1, nm1, l1, pk2, nm2, l2):
            L = mcfg.max_read_len
            return combine(tables,
                           gpk.unpack_read_codes_device(pk1, nm1, L), l1,
                           gpk.unpack_read_codes_device(pk2, nm2, L), l2)

        return jax.jit(packed_in_fn)

    return jax.jit(combine)


@dataclass
class PairResult:
    m1: MapResult
    m2: MapResult
    proper: np.ndarray  # bool[B]


class PairedMapper:
    """Host wrapper over the single-end Mapper for paired batches.

    Device pair-batches are HALF the configured read batch: the paired
    step internally stacks both mates and both strands ([4·Bp] rows vs
    the SE step's [2·B]), and device cost is superlinear in row count
    (tools/bench_batches.py), so equalizing rows per call keeps PE
    per-read throughput at SE levels."""

    def __init__(self, mapper):
        self.mapper = mapper
        self.index = mapper.index
        self.mcfg = mapper.mcfg
        self.sc = mapper.sc
        self.pair_batch = max(1, self.mcfg.batch_size // 2)
        self.packed_upload = getattr(mapper, "packed_upload", False)
        # MUST mirror the wrapped mapper's predicate (one source of
        # truth: pipeline.tb_enabled) — a drifted copy desynchronizes
        # finish_batch's split of the flattened device output
        self.tb = bool(getattr(mapper, "tb", False))
        self._fn = make_map_pairs_fn(
            mapper.icfg, mapper.mcfg, mapper.sc,
            packed_input=self.packed_upload,
            csr_aligned=getattr(mapper, "csr_aligned", False),
            gather_tier=getattr(mapper, "gather_tier", None),
            row128=getattr(mapper, "row128", False),
            off_bits=getattr(mapper, "off_bits", None),
            tb=self.tb)

    def prepack(self, codes1, lengths1, codes2, lengths2):
        """Host-side upload prep for start_batch's ``prepacked`` — run
        OFF the dispatch thread (PrefetchIterator transform), mirroring
        Mapper.prepack."""
        B = codes1.shape[0]
        bs = self.pair_batch
        assert B <= bs, f"pair batch {B} > {bs} (= batch_size // 2)"
        c1, l1 = _pad_block(codes1, lengths1, bs, self.mcfg.max_read_len)
        c2, l2 = _pad_block(codes2, lengths2, bs, self.mcfg.max_read_len)
        if not self.packed_upload:
            return (c1, None, l1, c2, None, l2, B)
        from urmap_tpu import genome_pack as gpk

        pk1, nm1 = gpk.pack_read_codes_host(c1)
        pk2, nm2 = gpk.pack_read_codes_host(c2)
        return (pk1, nm1, l1, pk2, nm2, l2, B)

    def start_batch(self, codes1, lengths1, codes2, lengths2, *,
                    prepacked=None):
        """Async dispatch of one (≤pair_batch) pair batch."""
        pk1, nm1, l1, pk2, nm2, l2, B = (
            prepacked if prepacked is not None
            else self.prepack(codes1, lengths1, codes2, lengths2))
        if self.packed_upload:
            out = self._fn(self.mapper.tables,
                           jnp.asarray(pk1), jnp.asarray(nm1),
                           jnp.asarray(l1),
                           jnp.asarray(pk2), jnp.asarray(nm2),
                           jnp.asarray(l2))
        else:
            out = self._fn(self.mapper.tables,
                           jnp.asarray(pk1), jnp.asarray(l1),
                           jnp.asarray(pk2), jnp.asarray(l2))
        return out, B

    def finish_batch(self, handle, lengths1, lengths2) -> PairResult:
        from urmap_tpu.map.pipeline import (PACKED_COLS, tb_cols, tb_rows,
                                            unpack_out, unpack_tb)

        out, B = handle
        arr = np.asarray(out)
        tbmat = None
        Bp = self.pair_batch
        if self.tb:
            split = Bp * (2 * PACKED_COLS + 1)
            tbmat = arr[split:].reshape(tb_rows(self.mcfg),
                                        tb_cols(2 * Bp, self.mcfg))
            arr = arr[:split].reshape(Bp, 2 * PACKED_COLS + 1)
        arr = arr[:B]
        C = PACKED_COLS
        m1 = unpack_out(arr[:, 0:C])
        m2 = unpack_out(arr[:, C : 2 * C])
        res = PairResult(
            m1=MapResult.from_device(m1, np.asarray(lengths1)[:B]),
            m2=MapResult.from_device(m2, np.asarray(lengths2)[:B]),
            proper=arr[:, 2 * C].astype(bool),
        )
        if tbmat is not None:
            # rows [0, Bp) = mate1, [Bp, 2Bp) = mate2 (Bp = the PADDED
            # pair batch the device program ran at); both mates' dicts
            # share one dops matrix, filtered by their own rows/cols
            tb = unpack_tb(tbmat, self.mcfg.band_halfwidth,
                           self.mcfg.max_read_len)
            s1 = tb["rows"] < Bp

            def side(sel, base):
                return {"rows": tb["rows"][sel] - base,
                        "score": tb["score"][sel],
                        "pos": tb["pos"][sel],
                        "strand": tb["strand"][sel],
                        "cols": tb["cols"][sel],
                        "dops": tb["dops"], "hw": tb["hw"],
                        "L": tb["L"]}

            res.m1.tb = side(s1, 0)
            res.m2.tb = side(~s1, Bp)
        return res

    def second_pass(self, codes1, lengths1, codes2, lengths2,
                    res: "PairResult") -> "PairResult":
        """Per-mate wide-gather recovery (pipeline.Mapper.second_pass):
        mates still unmapped after pairing + rescue are re-mapped on the
        host CPU pass, then pairs a recovery touched are re-checked for
        concordance (_recheck_pairs) so a recovered mate that lands in
        FR orientation within the fragment window gets proper-pair
        flags/TLEN like any device-paired read (round-3 verdict item 3:
        recoveries used to stay discordant forever — ~3% of pairs at
        bits28+secondpass GRCh38 configs)."""
        if getattr(self.mapper, "second", None) is None:
            return res
        sp = self.mapper.second_pass

        def snap(m):
            return (m.mapped.copy(), m.pos.copy(), m.strand.copy())

        s1, s2 = snap(res.m1), snap(res.m2)
        res = PairResult(m1=sp(codes1, lengths1, res.m1),
                         m2=sp(codes2, lengths2, res.m2),
                         proper=res.proper)

        def moved(m, s):
            return (m.mapped != s[0]) | (m.pos != s[1]) | (m.strand != s[2])

        # any pair a recovery or a suspect re-map touched gets its
        # concordance re-derived — promotion for newly-concordant
        # pairs AND demotion for proper pairs a moved mate broke
        # (suspect re-maps can relocate both mates of a both-suspect
        # proper pair; the corroborated-mate exclusion in
        # pair_batch_device means a proper pair is only ever re-mapped
        # on BOTH mates or neither)
        touched = moved(res.m1, s1) | moved(res.m2, s2)
        if touched.any():
            self._recheck_pairs(codes1, codes2, res, touched)
        return res

    def _recheck_pairs(self, codes1, codes2, res: "PairResult",
                       touched: np.ndarray) -> None:
        """Host-side concordance re-derivation for pairs the second
        pass patched: mirrors the device rule (_pair_cross) — opposite
        strands, fwd mate leftmost, TLEN = (pr − pf) + ref_span of the
        rightmost mate inside [min_fragment_len, max_fragment_len].
        Spans use the same machinery as the emitted SAM (cigars_nm_fast
        ref spans; read-length proxy under end_clip, matching the
        device's proxy). Sets proper for every touched pair — promoting
        newly-concordant recoveries AND demoting proper pairs a moved
        mate broke. Promoted pairs keep their per-mate MAPQs (the
        device's pair-gap MAPQ needs the candidate cross-product, gone
        by now) — conservative, never inflating confidence."""
        # touched pairs that can no longer be concordant at all
        res.proper[touched & ~(res.m1.mapped & res.m2.mapped
                               & (res.m1.strand != res.m2.strand))] = False
        rows = np.nonzero(touched
                          & res.m1.mapped & res.m2.mapped
                          & (res.m1.strand != res.m2.strand))[0]
        if rows.size == 0:
            return
        mc = self.mcfg
        p1 = res.m1.pos[rows].astype(np.int64)
        p2 = res.m2.pos[rows].astype(np.int64)
        fwd1 = res.m1.strand[rows] == 0
        pf = np.where(fwd1, p1, p2)
        pr = np.where(fwd1, p2, p1)
        if mc.end_clip:
            lr = np.where(fwd1, res.m2.lengths[rows],
                          res.m1.lengths[rows]).astype(np.int64)
        else:
            s1 = _ref_spans(self.index.seqdb.codes, codes1, res.m1,
                            rows, self.sc)
            s2 = _ref_spans(self.index.seqdb.codes, codes2, res.m2,
                            rows, self.sc)
            lr = np.where(fwd1, s2, s1).astype(np.int64)
        tlen = (pr - pf) + lr
        ok = ((pf <= pr) & (tlen >= mc.min_fragment_len)
              & (tlen <= mc.max_fragment_len))
        res.proper[rows] = ok

    def map_pair_codes(self, codes1, lengths1, codes2, lengths2) -> PairResult:
        B = codes1.shape[0]
        bs = self.pair_batch
        outs = []
        for s in range(0, B, bs):
            h = self.start_batch(codes1[s:s + bs], lengths1[s:s + bs],
                                 codes2[s:s + bs], lengths2[s:s + bs])
            outs.append(self.second_pass(
                codes1[s:s + bs], lengths1[s:s + bs],
                codes2[s:s + bs], lengths2[s:s + bs],
                self.finish_batch(h, lengths1[s:s + bs],
                                  lengths2[s:s + bs])))
        if len(outs) == 1:
            return outs[0]

        def cat_result(results, lengths):
            from urmap_tpu.map.pipeline import merge_tb_batches

            fields = {f: np.concatenate([getattr(r, f) for r in results])
                      for f in ("mapped", "pos", "strand", "score", "second",
                                "mapq", "gapped", "ungapped", "clipped", "suspect")}
            res = MapResult(lengths=np.asarray(lengths)[:B], **fields)
            res.tb = merge_tb_batches([r.tb for r in results],
                                      range(0, B, bs))
            return res

        return PairResult(
            m1=cat_result([o.m1 for o in outs], lengths1),
            m2=cat_result([o.m2 for o in outs], lengths2),
            proper=np.concatenate([o.proper for o in outs])[:B],
        )

    def format_py(self, fwd_batch, rev_batch, res: "PairResult") -> list[str]:
        """Pure-Python SAM records for an already-mapped pair batch."""
        from urmap_tpu.io import sam as samio
        from urmap_tpu.map.cigar import cigars_for_result
        from urmap_tpu.map.pipeline import revcomp_strand_codes

        genome = self.index.seqdb.codes
        sc1 = revcomp_strand_codes(fwd_batch.codes, res.m1)
        sc2 = revcomp_strand_codes(rev_batch.codes, res.m2)
        cig1, nm1 = cigars_for_result(
            genome, sc1, res.m1, self.sc,
            raw_lengths=[len(sq) for sq in fwd_batch.seqs],
            clip_rows=res.m1.clipped)
        cig2, nm2 = cigars_for_result(
            genome, sc2, res.m2, self.sc,
            raw_lengths=[len(sq) for sq in rev_batch.seqs],
            clip_rows=res.m2.clipped)
        return samio.records_paired(fwd_batch, rev_batch, res,
                                    cig1, nm1, cig2, nm2, self.index.seqdb)

    def map_pairs_to_sam(self, fwd_batch, rev_batch):
        """ReadBatch pair → (SAM record lines, stats dict)."""
        res = self.map_pair_codes(fwd_batch.codes, fwd_batch.lengths,
                                  rev_batch.codes, rev_batch.lengths)
        recs = self.format_py(fwd_batch, rev_batch, res)
        stats = {
            "reads": 2 * len(fwd_batch),
            "mapped": int(res.m1.mapped.sum()) + int(res.m2.mapped.sum()),
            "proper_pairs": int(res.proper.sum()),
        }
        return recs, stats


def _ref_spans(genome, codes, res: MapResult, rows: np.ndarray,
               sc: ScoreConfig) -> np.ndarray:
    """Reference spans of ``rows`` of a MapResult, matching the emitted
    SAM: read length for M-only winners, CIGAR ref span (traceback) for
    gapped/clip-rescued ones. Used by the post-second-pass proper-pair
    promotion; volumes are tiny (a few % of pairs), so the per-row
    traceback cost is negligible."""
    from urmap_tpu.map.cigar import cigars_nm_fast, strand_codes_subset

    lengths = np.asarray(res.lengths)[rows].astype(np.int32)
    span = lengths.copy()
    need = np.asarray(res.gapped)[rows].astype(bool)
    if res.clipped is not None:
        need |= np.asarray(res.clipped)[rows].astype(bool)
    g = rows[need]
    if g.size == 0:
        return span
    sub = MapResult(
        lengths=np.asarray(res.lengths)[g],
        mapped=np.asarray(res.mapped)[g], pos=np.asarray(res.pos)[g],
        strand=np.asarray(res.strand)[g], score=np.asarray(res.score)[g],
        second=np.asarray(res.second)[g], mapq=np.asarray(res.mapq)[g],
        gapped=np.asarray(res.gapped)[g],
        ungapped=np.asarray(res.ungapped)[g],
        clipped=(np.asarray(res.clipped)[g]
                 if res.clipped is not None else None))
    sc_codes = strand_codes_subset(codes[g], sub.strand, sub.lengths)
    _, _, sp = cigars_nm_fast(genome, sc_codes, sub, sc,
                              clip_rows=sub.clipped)
    span[need] = sp
    return span


def _pad_block(codes, lengths, bs, max_len=None):
    """Pad rows to ``bs`` and (when max_len is given) columns to
    ``max_len`` with READ_N — semantics-free, lengths mask everything."""
    Lm = codes.shape[1] if max_len is None else max_len
    assert codes.shape[1] <= Lm, \
        f"read block width {codes.shape[1]} > max_read_len {Lm}"
    if codes.shape[0] == bs and codes.shape[1] == Lm:
        return codes, lengths.astype(np.int32)
    pad = bs - codes.shape[0]
    block = np.full((bs, Lm), alphabet.READ_N, np.uint8)
    block[: codes.shape[0], : codes.shape[1]] = codes
    lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
    return block, lengths.astype(np.int32)
