"""Wide-gather second-pass recovery (MapConfig.second_pass_p).

GRCh38-scale HBM-fit configs shrink the per-seed gather (positions_per
_seed 8 at slot load ~12), and the even recap subsample then drops the
true locus for a few % of reads (VERDICT r2 item 6). The second pass
re-maps exactly those reads on the host CPU backend against a WIDE-cap
table in host RAM. Reproduced here at small scale: slot load ~11
(1.5 Mbp at slot_bits 17) with a first-pass cap of 2 loses a large
fraction of reads; the P=16 second pass recovers them bit-identically
to a direct P=16 map.
"""

import numpy as np

from tests.utils import make_seqdb, plant_pair, plant_read
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.map.pipeline import Mapper


def _reads(rng, db, n=200, L=120):
    reads = [plant_read(rng, db, length=L, n_snps=1) for _ in range(n)]
    codes = np.stack([r.codes for r in reads])
    lengths = np.full(n, L, np.int32)
    truth = np.asarray([r.gpos for r in reads])
    return codes, lengths, truth


def test_second_pass_recovers_recap_loss(rng):
    db = make_seqdb(rng, [1_500_000])
    index = build_index(db, IndexConfig(slot_bits=17), backend="host")
    codes, lengths, truth = _reads(rng, db)

    narrow = MapConfig(max_read_len=120, batch_size=64,
                       positions_per_seed=2)
    r1 = Mapper(index, narrow).map_codes(codes, lengths)
    recall1 = float(((r1.pos == truth) & r1.mapped).mean())

    import dataclasses

    both = dataclasses.replace(narrow, second_pass_p=16)
    r2 = Mapper(index, both).map_codes(codes, lengths)
    recall2 = float(((r2.pos == truth) & r2.mapped).mean())

    # the failure mode must actually exist at cap 2...
    assert recall1 < 0.9, recall1
    # ...and the second pass must recover it
    assert recall2 >= 0.99, (recall1, recall2)

    # rows the second pass recovered are BIT-IDENTICAL to a direct wide
    # map (same program, same prepared-at-16 tables)
    wide = Mapper(index, dataclasses.replace(narrow,
                                             positions_per_seed=16))
    rw = wide.map_codes(codes, lengths)
    rec = ~r1.mapped & r2.mapped
    assert rec.any()
    for f in ("mapped", "pos", "strand", "score", "second", "mapq",
              "gapped", "ungapped"):
        np.testing.assert_array_equal(getattr(r2, f)[rec],
                                      getattr(rw, f)[rec], err_msg=f)
    # rows the device pass already mapped keep the device result
    kept = r1.mapped
    np.testing.assert_array_equal(r2.pos[kept], r1.pos[kept])


def test_second_pass_composes_with_sharded(rng):
    """-mesh + -secondpass: the sharded device pass recovers through the
    same host wide pass, equal to the single-device combination."""
    import dataclasses

    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    from urmap_tpu.dist.sharded import ShardedMapper, make_mesh

    db = make_seqdb(rng, [1_500_000])
    index = build_index(db, IndexConfig(slot_bits=17), backend="host")
    codes, lengths, truth = _reads(rng, db, n=96)
    cfg = MapConfig(max_read_len=120, batch_size=32,
                    positions_per_seed=2, second_pass_p=16)
    single = Mapper(index, cfg).map_codes(codes, lengths)
    mesh = make_mesh(4, data=1, index=4)
    shard = ShardedMapper(index, mesh, cfg).map_codes(codes, lengths)
    for f in ("mapped", "pos", "strand", "score", "mapq"):
        np.testing.assert_array_equal(getattr(single, f),
                                      getattr(shard, f), err_msg=f)
    assert float(((shard.pos == truth) & shard.mapped).mean()) >= 0.99


def test_second_pass_paired_mates(rng):
    """PE: unmapped mates recover AND pairs a recovery made concordant
    are PROMOTED to proper (round-3 verdict item 3); pass-1 proper
    pairs are never demoted and promotions are genuinely FR-concordant
    within the fragment window."""
    import dataclasses

    from urmap_tpu.map.pair import PairedMapper

    db = make_seqdb(rng, [1_500_000])
    index = build_index(db, IndexConfig(slot_bits=17), backend="host")
    pairs = [plant_pair(rng, db, length=120, frag=400) for _ in range(120)]
    r1 = np.stack([p[0].codes for p in pairs])
    r2 = np.stack([p[1].codes for p in pairs])
    ln = np.full(120, 120, np.int32)
    t1 = np.asarray([p[0].gpos for p in pairs])
    t2 = np.asarray([p[1].gpos for p in pairs])

    narrow = MapConfig(max_read_len=120, batch_size=64,
                       positions_per_seed=2)
    p1 = PairedMapper(Mapper(index, narrow)).map_pair_codes(r1, ln, r2, ln)
    both = dataclasses.replace(narrow, second_pass_p=16)
    p2 = PairedMapper(Mapper(index, both)).map_pair_codes(r1, ln, r2, ln)

    rec1 = float(((p2.m1.pos == t1) & p2.m1.mapped).mean())
    rec2 = float(((p2.m2.pos == t2) & p2.m2.mapped).mean())
    base = float(((p1.m1.pos == t1) & p1.m1.mapped).mean())
    assert rec1 >= 0.99 and rec2 >= 0.99, (base, rec1, rec2)
    assert rec1 > base  # the pass actually did something
    # no demotion: every pass-1 proper pair stays proper
    assert not np.any(p1.proper & ~p2.proper)
    # promotion: pairs the recovery made concordant become proper
    promoted = p2.proper & ~p1.proper
    assert promoted.any()
    # ...and only where a mate actually changed
    changed = (p2.m1.mapped & ~p1.m1.mapped) | (p2.m2.mapped
                                                & ~p1.m2.mapped)
    assert not np.any(promoted & ~changed)
    # promoted pairs really are FR-concordant inside the window
    mc = both
    for i in np.nonzero(promoted)[0]:
        assert p2.m1.mapped[i] and p2.m2.mapped[i]
        assert p2.m1.strand[i] != p2.m2.strand[i]
        pf, pr = ((p2.m1.pos[i], p2.m2.pos[i])
                  if p2.m1.strand[i] == 0
                  else (p2.m2.pos[i], p2.m1.pos[i]))
        assert pf <= pr
        tlen = (pr - pf) + 120    # all-M 120 bp mates: span = length
        assert mc.min_fragment_len <= tlen <= mc.max_fragment_len
    # planted truth: promoted pairs sit at their planted loci
    ok = ((p2.m1.pos == t1) & (p2.m2.pos == t2))[promoted]
    assert ok.mean() >= 0.9


def test_second_pass_propagates_clip_flag(rng):
    """A read recovered by the CPU second pass VIA ITS clip-rescue lane
    must come back with clipped=True, or the host traceback runs in
    plain mode and aborts on the score-consistency check (round-3
    review finding)."""
    import dataclasses

    from urmap_tpu.config import ScoreConfig
    from urmap_tpu.map.cigar import cigars_nm_fast
    from urmap_tpu.map.pipeline import revcomp_strand_codes

    db = make_seqdb(rng, [1_500_000])
    index = build_index(db, IndexConfig(slot_bits=17), backend="host")
    L, tail, n = 150, 60, 64
    codes = np.empty((n, L), np.uint8)
    for i in range(n):
        r = plant_read(rng, db, length=L - tail, strand=0)
        codes[i, : L - tail] = r.codes
        codes[i, L - tail:] = rng.integers(0, 4, size=tail)
    lengths = np.full(n, L, np.int32)
    cfg = MapConfig(max_read_len=L, batch_size=64, positions_per_seed=2,
                    second_pass_p=16)
    res = Mapper(index, cfg).map_codes(codes, lengths)
    rec = res.mapped & res.clipped
    assert rec.sum() >= n // 3, int(rec.sum())
    # CIGAR generation must complete (clip-mode traceback for the
    # recovered rows) and emit soft clips for them
    cigs, _, _ = cigars_nm_fast(
        db.codes, revcomp_strand_codes(codes, res), res, ScoreConfig(),
        clip_rows=np.asarray(res.clipped))
    assert all("S" in cigs[i] for i in np.nonzero(rec & res.gapped)[0])


def test_second_pass_never_lowers_pallas(rng, monkeypatch):
    """The CPU-backend second pass must pin the jnp paths even when the
    process's DEFAULT backend is a TPU (on_tpu() True) — caught on the
    round-3 GRCh38 capstone run: its program tried to lower the Mosaic
    kernels on the CPU device ('Only interpret mode is supported')."""
    from urmap_tpu.map import dp as dpmod
    from urmap_tpu.map.pipeline import WideSecondPass
    from urmap_tpu.config import ScoreConfig

    db = make_seqdb(rng, [400_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    cfg = MapConfig(max_read_len=120, batch_size=64,
                    positions_per_seed=2, second_pass_p=16)
    sp = WideSecondPass(index, cfg, ScoreConfig())

    codes, lengths, truth = _reads(rng, db, n=64)
    from urmap_tpu.map.pipeline import MapResult

    res = MapResult(
        mapped=np.zeros(64, bool), pos=np.zeros(64, np.int64),
        strand=np.zeros(64, np.int32), score=np.zeros(64, np.int32),
        second=np.zeros(64, np.int32), mapq=np.zeros(64, np.int32),
        gapped=np.zeros(64, bool), lengths=lengths,
        ungapped=np.zeros(64, np.int32), clipped=np.zeros(64, bool))
    # pretend the default backend is a TPU: the dispatches must still
    # take jnp inside the second-pass program
    monkeypatch.setattr(dpmod, "on_tpu", lambda: True)
    monkeypatch.setattr(dpmod, "_ON_TPU", True)
    out = sp(codes, lengths, res)
    good = ((out.pos == truth) & out.mapped).mean()
    assert good >= 0.99, good
