"""Dispersed-repeat (high-copy family) MAPQ containment + recovery.

The weak-fallback cap (test_repeat_mapq.py) covers tandem runs; this
covers the OTHER repeat failure mode, measured on a 1 Gbp / 25%-repeat
genome with high-copy families: a read planted in one copy of an
Alu-like family whose TRUE copy was recap-subsampled out of every seed
slot, while a DIVERGED sibling copy survived and won UNOPPOSED — the
MAPQ gap formula saw no second candidate and reported max confidence
(1.7% of MAPQ>=10 calls confidently wrong, winner ~10-20 mismatches,
true locus ~2). The suspect gate (MapConfig.suspect_deficit) pins:

  - confident-wrong calls from family copies are eliminated (suspect
    winners are capped to suspect_mapq_cap),
  - clean unique reads keep full confidence (the saturation condition
    means the cap costs no clean-genome precision/recall),
  - with the host second pass (second_pass_p), suspect rows are
    RE-MAPPED at the wide gather: the true copy surfaces and the read
    flips to a CORRECT call — containment upgraded to recovery.
"""

import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.io.fasta import SeqDB
from urmap_tpu.map.pipeline import Mapper


def _family_genome(rng, glen=2_000_000, copies=200, unit=300, div=0.08):
    """Random genome with a SINE-like family: ``copies`` copies of one
    consensus, each independently diverged ``div`` — conserved k-mers
    land in ~copies * 0.92^24 copies each, far past positions_per_seed,
    so family slots SATURATE the recap subsample."""
    seq = rng.integers(0, 4, size=glen).astype(np.uint8)
    cons = rng.integers(0, 4, size=unit).astype(np.uint8)
    # copies confined to the left half; right half stays unique
    starts = rng.choice(glen // 2 - unit, size=copies, replace=False)
    for d in starts:
        c = cons.copy()
        m = rng.random(unit) < div
        c[m] = (c[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        seq[d : d + unit] = c
    db = SeqDB.from_seqs(["chr1"], [alphabet.decode(seq)])
    return db, np.sort(starts)


def _reads_from(db, rng, starts, n, L, snp=0.01):
    g0 = int(db.starts[0])
    codes = np.empty((n, L), np.uint8)
    tpos = np.empty(n, np.int64)
    for i in range(n):
        p = int(starts[rng.integers(0, len(starts))])
        codes[i] = db.codes[g0 + p : g0 + p + L]
        m = rng.random(L) < snp
        codes[i, m] = (codes[i, m] + rng.integers(1, 4, int(m.sum()))) % 4
        tpos[i] = g0 + p      # res.pos is GLOBAL (SeqDB header offset)
    return codes, tpos


def test_family_reads_never_confidently_wrong(rng):
    db, starts = _family_genome(rng)
    index = build_index(db, IndexConfig(slot_bits=20), backend="host")
    L, n = 150, 256
    mcfg = MapConfig(max_read_len=L, batch_size=n, positions_per_seed=8)
    # reads planted at family copy starts (the 300 bp unit covers
    # [start, start+150] fully) + clean unique-region reads as control
    fam, tpos = _reads_from(db, rng, starts, n // 2, L)
    g0 = int(db.starts[0])
    glen = db.codes.shape[0] - g0
    upos = g0 + rng.integers(glen // 2, glen - L - 1, size=n // 2)
    uniq = np.stack([db.codes[p : p + L] for p in upos])
    codes = np.concatenate([fam, uniq])
    lengths = np.full(n, L, np.int32)

    res = Mapper(index, mcfg).map_codes(codes, lengths)
    h = n // 2
    wrong = res.mapped[:h] & (np.abs(res.pos[:h] - tpos) > 20)
    # the gate's whole point: wrong placements are never confident
    assert not (wrong & (res.mapq[:h] >= 10)).any(), (
        f"{int((wrong & (res.mapq[:h] >= 10)).sum())} confident-wrong "
        "family reads slipped past the suspect gate")
    # clean unique reads: unaffected (no saturation ⇒ never suspect)
    assert res.mapped[h:].all()
    ok_u = np.abs(res.pos[h:] - upos) <= 20
    assert ok_u.all()
    assert (res.mapq[h:] >= 20).mean() >= 0.95
    # and the gate actually fired on this genome (the scenario is real)
    assert res.suspect is not None and res.suspect[:h].any()


def test_second_pass_recovers_suspects(rng):
    # harder family (60 copies, 4% divergence, 2% read SNPs): enough
    # narrow-pass misses to demonstrate recovery, still zero
    # confident-wrongs under the gate (measured: 487/512 → 505/512)
    db, starts = _family_genome(rng, copies=60, div=0.04)
    index = build_index(db, IndexConfig(slot_bits=20), backend="host")
    L, n = 150, 512
    fam, tpos = _reads_from(db, rng, starts, n, L, snp=0.02)
    lengths = np.full(n, L, np.int32)

    narrow = MapConfig(max_read_len=L, batch_size=n, positions_per_seed=8)
    res0 = Mapper(index, narrow).map_codes(fam, lengths)
    wide = MapConfig(max_read_len=L, batch_size=n, positions_per_seed=8,
                     second_pass_p=64)
    res = Mapper(index, wide).map_codes(fam, lengths)

    correct0 = res0.mapped & (np.abs(res0.pos - tpos) <= 20)
    correct = res.mapped & (np.abs(res.pos - tpos) <= 20)
    # narrow pass: contained (suspects capped, no confident wrongs)
    assert not (res0.mapped & ~correct0 & (res0.mapq >= 10)).any()
    assert res0.suspect.any()
    # the wide re-map turns capped-wrong placements into correct calls
    assert correct.sum() > correct0.sum()
    assert correct.mean() >= 0.95
    # recovered rows come back CONFIDENT (honest MAPQ, not the cap) —
    # and still never confidently wrong
    wrong_conf = res.mapped & ~correct & (res.mapq >= 10)
    assert not wrong_conf.any()
    assert (res.mapq[correct] >= 10).mean() >= 0.9


def test_clip_rescued_reads_excluded_from_gate(rng):
    """An honest adapter-clipped read legitimately trails the perfect
    full-length score by ~clip_len + clip_open, so the suspect deficit
    gate must never fire on clip-rescued winners — even when their
    seeds touch a saturated family slot (round-4 advisor finding: the
    unexcluded gate capped such reads to MAPQ 0 and exported them for a
    re-map that re-applied the same gate)."""
    db, starts = _family_genome(rng)
    index = build_index(db, IndexConfig(slot_bits=20), backend="host")
    L, n = 150, 128
    g0 = int(db.starts[0])
    # read = 50 bp tail of a family copy (saturated slots) + 40 bp of
    # the unique sequence after it (unique anchor) + 60 bp random
    # adapter — placement is unique, evidence touches saturation, and
    # the adapter drags the full-length score below min_score_frac so
    # the clip-rescue lane fires
    codes = np.empty((n, L), np.uint8)
    tpos = np.empty(n, np.int64)
    for i in range(n):
        p = int(starts[rng.integers(0, len(starts))]) + 300 - 50
        tpos[i] = g0 + p
        codes[i, :90] = db.codes[g0 + p : g0 + p + 90]
        codes[i, 90:] = rng.integers(0, 4, size=L - 90)
    lengths = np.full(n, L, np.int32)
    res = Mapper(index, MapConfig(max_read_len=L, batch_size=n,
                                  positions_per_seed=8)).map_codes(
        codes, lengths)
    clip = res.clipped & res.mapped
    assert clip.any(), "no read took the clip-rescue lane"
    # the exclusion itself: clip-rescued winners are never suspect
    assert not (clip & res.suspect).any()
    # and the honest unique-anchor placements keep their confidence
    correct = clip & (np.abs(res.pos - tpos) <= 20)
    assert correct.any()
    assert (res.mapq[correct] >= 10).mean() >= 0.8


def test_pe_suspect_corroboration(rng):
    from urmap_tpu.map.pair import RESCUE_MAPQ_CAP, PairedMapper

    # genome with family copies in the left half, unique right half
    db, starts = _family_genome(rng, copies=120, div=0.02)
    index = build_index(db, IndexConfig(slot_bits=20), backend="host")
    L, n, frag = 150, 64, 400
    g0 = int(db.starts[0])
    glen = db.codes.shape[0] - g0
    r1 = np.empty((n, L), np.uint8)
    r2 = np.empty((n, L), np.uint8)
    tpos = np.empty(n, np.int64)
    for i in range(n):
        if i % 2:
            # mate1 FULLY inside a 300 bp family copy (saturated
            # evidence); mate2 mostly in the unique sequence after the
            # copy (clean anchor) — the corroborated-suspect case
            p = int(starts[rng.integers(0, len(starts))])
        else:
            # fully unique fragment (control)
            p = int(rng.integers(glen // 2, glen - frag - 1))
        tpos[i] = g0 + p
        r1[i] = db.codes[g0 + p : g0 + p + L]
        r2[i] = alphabet.revcomp(db.codes[g0 + p + frag - L : g0 + p + frag])
        # heavy SNPs on mate1 only → its deficit crosses the cap gate
        m = rng.random(L) < 0.05
        r1[i, m] = (r1[i, m] + rng.integers(1, 4, int(m.sum()))) % 4
    ln = np.full(n, L, np.int32)
    res = PairedMapper(Mapper(index, MapConfig(
        max_read_len=L, batch_size=n, positions_per_seed=8))) \
        .map_pair_codes(r1, ln, r2, ln)
    fam = np.arange(n) % 2 == 1
    uniq = ~fam
    # control: heavy-SNP mate1 in UNIQUE sequence never trips the gate
    # (no saturated evidence) — full confidence preserved
    assert (res.m1.mapq[uniq & res.proper] >= 20).mean() >= 0.8
    # family mate1 with gate-crossing deficit riding a proper pair with
    # the clean mate2: when its evidence was saturated it is capped at
    # rescue grade (fragment-corroborated, not zeroed); when its SNPs
    # wiped every family-conserved seed there is no saturation evidence
    # and no cap — but then the anchored placement is correct anyway.
    # Either way it is NEVER exported for the second-pass re-map.
    gated = fam & res.proper & (L - res.m1.score > 18)
    assert gated.any()      # the scenario actually occurs
    capped = res.m1.mapq[gated] <= RESCUE_MAPQ_CAP
    correct = np.abs(res.m1.pos[gated] - tpos[gated]) <= 20
    assert (capped | correct).all()
    assert capped.any()     # the corroborated cap path fired too
    assert not res.m1.suspect[fam & res.proper].any()
    # the clean anchor mate keeps its own confidence
    assert (res.m2.mapq[gated] >= 20).mean() >= 0.8
