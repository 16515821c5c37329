"""Typed configuration for index build and mapping.

Every numeric whose exact value in the reference mapper could not be
verified (reference mount empty — SURVEY.md §0) is marked ``PARITY-TODO``
with the extraction recipe from SURVEY.md §0.1. Keeping them all here means
re-tuning for parity is mechanical: change one file, rerun the parity suite.

Reference anchors:
  - word length k ≈ 24: BASELINE.json north_star ("UFI-style hashed k-mer
    index (k≈24 pinned seeds)").
  - repeat handling ("pinned" seed scheme): URMAP paper (Edgar 2020,
    PeerJ 8:e9338), Methods.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class ScoreConfig:
    """Alignment scoring. PARITY-TODO: extract exact constants via
    SURVEY.md §0.1 item 4 (grep XDrop/Band in reference src) when the
    reference mount is populated."""

    match: int = 1
    mismatch: int = -2
    gap_open: int = -4      # charged on the first base of a gap (open+extend)
    gap_extend: int = -1    # charged on every subsequent gap base
    # One-time penalty per soft-clipped read END (X-drop-analog clipping,
    # map/dp.py banded_from_windows). Only active with MapConfig.end_clip.
    # PARITY-TODO: reference's X-drop threshold / clip semantics.
    clip_open: int = -5

    def gap_cost(self, length: int) -> int:
        """Total (negative) score of a gap of ``length`` bases."""
        if length <= 0:
            return 0
        return self.gap_open + self.gap_extend * (length - 1)

    def mismatch_equiv(self, n: int) -> int:
        """Score deficit of ``n`` mismatches vs a perfect alignment —
        the unit the suspect gate's thresholds are DERIVED in
        (MapConfig.suspect_deficit = mismatch_equiv(6),
        suspect_remap_deficit = mismatch_equiv(3)): honest clean-read
        deficits are ~mismatch_equiv(Binomial(L, snp_rate)) with
        P(>6 mm) ≈ 1e-4 at L=150/1%, and a full 8 bp indel costs
        |gap_cost(8)| = 11 < mismatch_equiv(6) — so the gate only
        fires on repeat-divergence-sized deficits regardless of the
        score scale (tests/unit/test_config.py pins the relationship;
        tools/suspect_sweep.py measures the flatness around it)."""
        return n * (self.match - self.mismatch)


@dataclass(frozen=True)
class IndexConfig:
    """UFI-style index build parameters."""

    # Word (seed) length. [NS] k≈24. PARITY-TODO exact default.
    k: int = 24
    # log2 of hash-slot count. The index is a lossy hash: k-mers map to
    # 2**slot_bits CSR slots; collisions are filtered downstream by
    # alignment verification, so slot_bits trades memory for verify work.
    slot_bits: int = 24
    # Repeat cap: slots holding more than this many genome positions keep
    # only the first ``max_positions_per_slot`` (analog of the reference's
    # high-frequency word capping / pinned-seed scheme [PAPER]).
    # PARITY-TODO: reference's exact cap & pinning rule.
    max_positions_per_slot: int = 256
    # Genome positions are uint32 global coordinates over the concatenated
    # genome (GRCh38 ≈ 3.1 Gbp fits). Kept for documentation/validation.
    max_genome_len: int = (1 << 32) - 1
    # -veryfast: the index was built with +2 slot_bits (4x the slot
    # space, ~quarter the collision chains). The flag rides in the
    # header so cmd_map can narrow the gather (veryfast_map_overrides):
    # with near-collision-free slots, fewer/narrower lookups reach the
    # same loci. [RECALL: the reference's -veryfast likewise trades
    # index RAM for mapping speed; exact scheme PARITY-TODO.]
    veryfast: bool = False

    @property
    def num_slots(self) -> int:
        return 1 << self.slot_bits

    @staticmethod
    def auto_slot_bits(genome_len: int, lo: int = 16, hi: int = 30) -> int:
        """Pick slot_bits ≈ log2(genome_len) + 1, clamped: ~0.5 expected
        positions per slot keeps collision chains short."""
        bits = max(lo, min(hi, (genome_len - 1).bit_length() + 1))
        return bits


def resolve_suspect_deficits(mc: "MapConfig",
                             sc: ScoreConfig) -> tuple[int, int]:
    """(suspect_deficit, suspect_remap_deficit) with the None defaults
    DERIVED from the score model (mismatch_equiv(6)/(3)) — the single
    resolution point both the SE and PE gates use."""
    sd = (mc.suspect_deficit if mc.suspect_deficit is not None
          else sc.mismatch_equiv(6))
    rd = (mc.suspect_remap_deficit if mc.suspect_remap_deficit is not None
          else sc.mismatch_equiv(3))
    return sd, rd


VERYFAST_MAP_OVERRIDES = {
    # Mapping-side widths for a -veryfast index (IndexConfig.veryfast):
    # 4x slot space keeps runs short, so half the gather width and one
    # fewer verify lane round reach the same candidates. Measured
    # ROC-equal on clean + 30%-repetitive synthetic genomes
    # (tools/accuracy.py --veryfast).
    "positions_per_seed": 8,
    "verify_capacity_frac": 8,
}


@dataclass(frozen=True)
class MapConfig:
    """Per-read mapping pipeline parameters (fixed shapes for XLA)."""

    # Reads are padded to this length on device (static shape). Reads
    # longer than this are soft-clipped at map time; raise for long reads.
    max_read_len: int = 160
    # Number of seed words extracted per read strand, at evenly spaced
    # offsets covering [0, read_len - k]. PARITY-TODO: reference's seed
    # placement rule.
    seeds_per_read: int = 8
    # Cap on genome positions fetched per seed slot (gather width) —
    # the index is recapped to this at map time with an even, position-
    # unbiased subsample (store.recapped). Width 16 measured identical
    # accuracy to 32 on clean and 30%-repetitive genomes (round 2;
    # tools/accuracy.py) at half the gather volume and half the a2a
    # routing response size; true loci in slots with >16 surviving
    # entries can still win via any of the other Q-1 seeds.
    positions_per_seed: int = 16
    # Second-pass recovery (0 = off): reads still unmapped after the
    # device pass are re-mapped on the HOST CPU backend against a table
    # recapped at THIS wider gather width, living in host RAM instead of
    # HBM. This recovers the recall an HBM-constrained device config
    # sacrifices (GRCh38 at slot_bits 28 / P=8 fits 11 GB but drops ~3%
    # of reads whose true locus was subsampled out; a P=32 host table
    # catches nearly all of them at <5% of batch volume). CLI
    # -secondpass P.
    second_pass_p: int = 0
    # Top-V candidate diagonals (by vote count) verified per read strand.
    top_candidates: int = 8
    # Vote floor: candidates with fewer seed votes than this are dropped
    # UNLESS neither strand of the read has any candidate reaching the
    # floor (then all its lanes survive, so heavily-mutated reads keep
    # their single-vote candidates). Two seeds voting the same random
    # start is ~impossible off-locus, so this empties the noise lanes
    # the vote otherwise fills — which verify_capacity_frac converts
    # into skipped gather work. 1 disables (round-2 behavior).
    # PARITY-TODO: reference's multi-hit candidate rule.
    min_votes: int = 2
    # Ungapped-verify lane budget: 2*batch_size*top_candidates //
    # verify_capacity_frac candidate lanes verified per while_loop
    # round (rounds repeat until every non-SENTINEL lane is served —
    # full coverage, like the DP bucket). 1 = single full-width pass.
    # 8 measured 111.0 vs 119.4 ms/batch at 4 on-chip (round-3 sweep,
    # /tmp/vfrac_sweep.log; output bit-identical by construction).
    verify_capacity_frac: int = 8
    # Banded DP half-width: band covers diagonal offsets in
    # [-band_halfwidth, +band_halfwidth] (max indel size handled).
    band_halfwidth: int = 16
    # Minimum accepted alignment score as a fraction of read length
    # (match=+1 ⇒ perfect read of length L scores L).
    # PARITY-TODO: reference's min identity / score threshold.
    min_score_frac: float = 0.4
    # End-clipped alignment (the reference's X-drop can stop extension
    # early and clip a bad tail): when True, the banded DP may enter or
    # exit at any read row for ScoreConfig.clip_open per clipped side,
    # so adapter/chimeric-tail reads map soft-clipped instead of dying
    # at min_score_frac. Off by default (exact round-1 semantics);
    # CLI -endclip. PARITY-TODO: reference's default behavior.
    end_clip: bool = False
    # Clip RESCUE lane (default on): reads that would otherwise be
    # UNMAPPED (best candidate score below min_score_frac — e.g.
    # adapter/chimeric tails) get one extra bucketed DP round in
    # end-clip mode, so they map soft-clipped instead of dying. Unlike
    # -endclip this cannot change any read that maps normally (the lane
    # only runs for sub-threshold reads), so default semantics stay
    # bit-identical for them. while_loop ⇒ zero cost on clean batches.
    clip_rescue: bool = True
    # Clip-rescue lane budget per bucket round (batch_size // frac).
    clip_rescue_capacity_frac: int = 32
    # Gapped-DP trigger: a read enters the banded DP only when its best
    # ungapped candidate has more than this many mismatches (the
    # reference verifies ungapped first and extends gapped only when
    # needed, SURVEY.md §3.2). PARITY-TODO: reference's trigger rule.
    dp_trigger_mismatches: int = 3
    # DP lane budget: batch_size // dp_capacity_frac reads per bucket
    # round (while_loop rounds until every flagged read is served, so
    # this is a latency/occupancy knob, not a coverage limit). 1/8 of
    # the batch covers the ~6.5% trigger rate of 1%-error reads in one
    # round at half the cost of 1/4.
    dp_capacity_frac: int = 8
    # Device traceback-bits pass (kernels/tb_dp.py, SURVEY.md §7 Phase
    # 2): gapped WINNERS are re-DP'd on device with per-cell direction
    # bits so host CIGARs decode from an O(L) bit-walk instead of a
    # banded DP re-run (~36 us/read of host time at round-4 defaults —
    # THE bottleneck at 8% gapped reads). Output-identical to the host
    # DP path; rows whose optimal path leaves the re-anchored band (or
    # that overflow the lane budget) silently fall back to it.
    tb_bits: bool = True
    # Traceback lane budget: rows // tb_capacity_frac gapped winners
    # per batch get device bits; 1/8 covers the 8%-indel bench corpus
    # with ~55% headroom. Overflow rows fall back to the host DP.
    tb_capacity_frac: int = 8
    # MAPQ ceiling. PARITY-TODO: reference's exact MAPQ formula & cap
    # (SURVEY.md §0.1 item 3).
    max_mapq: int = 42
    # MAPQ ceiling for weak-fallback reads: no candidate on either
    # strand reached min_votes, so the winner rests on ONE
    # uncorroborated seed from a saturated (recap-subsampled) slot —
    # tandem/satellite reads whose equal-scoring siblings the top-V
    # vote subset cannot see (the MAPQ gap formula then reports false
    # confidence: 1.5% of calls on a 25%-repeat genome were
    # confidently wrong before the cap, all from tandem runs). 0 is
    # the calibrated value: measured ~94% of capped calls sit at a
    # wrong within-run offset, i.e. the BWA "multimapping = MAPQ 0"
    # convention. PARITY-TODO: the reference's repeat-confidence rule.
    weak_mapq_cap: int = 0
    # Suspect gate — DISPERSED-repeat containment (the weak cap above
    # covers tandems; this covers Alu-style high-copy families): a
    # mapped read is SUSPECT when (a) >=1 of its seeds hit a SATURATED
    # (recap-subsampled) slot AND (b) its best score trails the perfect
    # score (length * match) by MORE than ``suspect_deficit``. Both
    # conditions together say "the winner aligns poorly AND the
    # candidate set was a subsample" — exactly the signature of a read
    # whose true repeat copy was subsampled out of every slot while a
    # DIVERGED sibling copy survived and won unopposed (measured at
    # 1 Gbp / 25% repeats with high-copy families: 1.7% of MAPQ>=10
    # calls confidently wrong, winner ~10 mismatches, true locus ~2,
    # no second candidate seen). Suspect reads: MAPQ capped at
    # ``suspect_mapq_cap`` on device, and re-mapped by the host
    # second pass (second_pass_p) where the wider gather usually
    # surfaces the true copy and restores an honest, HIGH MAPQ.
    # None = DERIVED as ScoreConfig.mismatch_equiv(6) (18 at the
    # default match=1/mismatch=-2): clean-read deficits are
    # ~3*Binomial(150, 1%) (P(>6 mm) ~ 1e-3) and a full 8 bp indel
    # costs 11, both safely under the gate; saturated slots essentially
    # never occur on non-repetitive sequence at auto slot_bits, so the
    # cap costs no clean-genome recall. A custom score scale moves the
    # gate with it (resolve_suspect_deficits — a raw constant here
    # silently miscalibrated under rescaled scoring). Explicit int
    # overrides win (tools/suspect_sweep.py measures flatness ±6).
    # PARITY-TODO: the reference's repeat-confidence rule.
    suspect_deficit: int | None = None
    suspect_mapq_cap: int = 0
    # Second (lower) deficit tier that only ROUTES to the second pass,
    # WITHOUT capping: winners trailing perfect by more than this with
    # saturated evidence are exported as suspect so the host wide
    # gather re-adjudicates them, but keep their device MAPQ (no
    # second pass configured ⇒ nothing changes). Rationale: the
    # residual confident-wrong calls after the hard cap are CLOSE
    # siblings (measured at 1 Gbp / 25% repeats: deficit p50 = 15,
    # winner ~5 mismatches vs true ~1) — capping at that deficit would
    # also cap honest 5-SNP reads inside repeats (~0.3% recall@>=1),
    # while re-mapping them is free: the true copy either surfaces and
    # wins (call flips to correct) or the device call is confirmed
    # with its honest competitors now visible. None = DERIVED as
    # mismatch_equiv(3) (= 9 at default scoring).
    suspect_remap_deficit: int | None = None
    # A seed slot counts as repeat-territory ("saturated") when it
    # contributes >= min(positions_per_seed, suspect_slot_load)
    # positions. At gather widths <= this it reduces to the plain
    # all-lanes-full test; at WIDER gathers (the host second pass,
    # p=32/64) a slot holding e.g. 50 sibling copies is *not* width-
    # saturated yet still floods the top_candidates vote lanes (8) —
    # the candidate set is a vote-stage subsample and the gap formula
    # can again report false confidence (measured: the p=64 second
    # pass REINTRODUCED confident-wrong calls on a 80-copy/2%-diverged
    # family until load-based saturation capped them). 2*top_candidates:
    # a slot outnumbering the vote lanes 2:1 can hide equal-scoring
    # siblings however the votes fall.
    suspect_slot_load: int = 16
    # MAPQ slope: mapq = min(max_mapq, mapq_scale * (best - second)).
    # PARITY-TODO.
    mapq_scale: float = 6.0
    # Paired-end: accepted fragment length (TLEN) window for a "proper
    # pair" (flag 0x2), FR orientation. PARITY-TODO: reference defaults /
    # whether estimated from data.
    min_fragment_len: int = 50
    max_fragment_len: int = 1000
    # Mate rescue: when one mate maps well and the other doesn't, run
    # banded DP over a window of this many bases around the expected mate
    # position. PARITY-TODO.
    rescue_window: int = 1200
    # Rescue lane budget per bucket round (batch_size // frac), same
    # while_loop pattern as the DP bucket: pairs needing rescue are a
    # small minority, and the window-scan convolution is the single most
    # expensive op in the paired pipeline — never run it on whole
    # batches. Zero rounds when nothing needs rescue. 32 measured on
    # v5e (round 2): one round at frac=8 cost ~115 ms/batch; frac=32
    # brings the PE device step to SE parity at identical proper-pair
    # and correctness rates.
    rescue_capacity_frac: int = 32
    # Device batch size (reads per pipeline step, per device).
    batch_size: int = 2048

    def __post_init__(self):
        # the rescue window must cover every expected mate start for the
        # configured fragment range (map/pair._rescue_scan geometry);
        # raising max_fragment_len without widening rescue_window would
        # silently break rescue (round-1 verdict, weak item 7)
        need = ((self.max_fragment_len - self.min_fragment_len)
                + self.max_read_len + 2 * (self.band_halfwidth + 8))
        if self.rescue_window < need:
            raise ValueError(
                f"rescue_window={self.rescue_window} cannot cover the "
                f"fragment window: need ≥ (max_fragment_len - "
                f"min_fragment_len) + max_read_len + 2*(band_halfwidth+8) "
                f"= {need}")

    def seed_offsets(self, read_len: int, k: int) -> list[int]:
        """Evenly spaced seed start offsets covering [0, read_len-k]."""
        span = max(read_len - k, 0)
        n = self.seeds_per_read
        if n == 1 or span == 0:
            return [0] * n
        return [round(i * span / (n - 1)) for i in range(n)]


def _to_jsonable(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def dump_configs(path: str, **cfgs: Any) -> None:
    with open(path, "w") as f:
        json.dump({k: _to_jsonable(v) for k, v in cfgs.items()}, f, indent=2)


def load_config(cls, d: dict):
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in fields})
