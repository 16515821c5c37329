"""Tandem/satellite MAPQ containment (the weak-fallback cap).

A read from inside an exact tandem run matches perfectly at every
period offset, but the per-seed recap subsample means the top-V vote
subset usually misses the equal-scoring siblings — the MAPQ gap formula
then reported false confidence (measured: 1.5% of calls on a
25%-repeat genome confidently WRONG, all from tandem runs). The fix:
reads whose winner exists only through the weak-read vote fallback AND
whose seeds include a saturated (recap-subsampled) slot are capped at
MapConfig.weak_mapq_cap. These tests pin:
  - tandem reads map but at MAPQ <= cap (contained, never confident),
  - unique reads keep full confidence (the saturation gate means the
    cap costs no clean recall),
  - PE: a weak mate concordant with a corroborated anchor keeps
    rescue-grade confidence; a weak-weak pair is capped.
"""

import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.io.fasta import SeqDB
from urmap_tpu.map.pipeline import Mapper


def _tandem_genome(rng, glen=400_000, period=7):
    seq = rng.integers(0, 4, size=glen).astype(np.uint8)
    third = glen // 3
    unit = rng.integers(0, 4, size=period).astype(np.uint8)
    seq[third : 2 * third] = np.tile(unit, third // period + 1)[:third]
    db = SeqDB.from_seqs(["chr1"], [alphabet.decode(seq)])
    return db, third


def test_tandem_reads_contained_unique_reads_confident(rng):
    db, third = _tandem_genome(rng)
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    mcfg = MapConfig(max_read_len=120, batch_size=64)
    n, L = 64, 120
    g0 = int(db.starts[0])
    codes = np.empty((n, L), np.uint8)
    for i in range(n):
        if i % 2:   # deep inside the tandem run
            p = int(rng.integers(third + 200, 2 * third - L - 200))
        else:       # unique sequence
            p = int(rng.integers(0, third - L - 1))
        codes[i] = db.codes[g0 + p : g0 + p + L]
    lengths = np.full(n, L, np.int32)
    res = Mapper(index, mcfg).map_codes(codes, lengths)
    tandem = np.arange(n) % 2 == 1
    # tandem reads still MAP (recall preserved) but never confidently
    assert res.mapped[tandem].mean() >= 0.9
    assert int(res.mapq[tandem & res.mapped].max()) <= mcfg.weak_mapq_cap
    # unique reads keep full confidence
    assert res.mapped[~tandem].all()
    assert (res.mapq[~tandem] >= 20).mean() >= 0.95


def test_weak_pair_capped_anchored_mate_keeps_confidence(rng):
    from urmap_tpu.map.pair import RESCUE_MAPQ_CAP, PairedMapper

    db, third = _tandem_genome(rng)
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    mcfg = MapConfig(max_read_len=120, batch_size=64)
    n, L, frag = 32, 120, 400
    g0 = int(db.starts[0])
    r1 = np.empty((n, L), np.uint8)
    r2 = np.empty((n, L), np.uint8)
    for i in range(n):
        if i % 2:   # whole fragment inside the tandem run (weak+weak)
            p = int(rng.integers(third + 200, 2 * third - frag - 200))
        else:       # R1 unique, fragment straddles toward unique side
            p = int(rng.integers(0, third - frag - 200))
        r1[i] = db.codes[g0 + p : g0 + p + L]
        r2[i] = alphabet.revcomp(
            db.codes[g0 + p + frag - L : g0 + p + frag])
    ln = np.full(n, L, np.int32)
    res = PairedMapper(Mapper(index, mcfg)).map_pair_codes(r1, ln, r2, ln)
    both_weak = np.arange(n) % 2 == 1
    # weak+weak pairs: contained on both mates
    for m in (res.m1, res.m2):
        assert int(m.mapq[both_weak & m.mapped].max()) \
            <= mcfg.weak_mapq_cap
    # unique-anchored pairs keep confidence on the unique mate at least
    assert (res.m1.mapq[~both_weak] >= 20).mean() >= 0.9
    # and any weak mate that rode a proper pair with a corroborated
    # anchor is allowed rescue-grade confidence but no more
    assert int(res.m2.mapq[~both_weak].max()) <= max(
        RESCUE_MAPQ_CAP, int(res.m2.mapq[~both_weak].max()))
