"""Device traceback-bits path (MapConfig.tb_bits) vs the host DP path.

The tb pass must be OUTPUT-INVISIBLE: CIGAR/NM/span byte-identical to
the host banded-DP traceback for every consumer (blob + fast paths, SE
and PE), while actually decoding the bulk of gapped winners from bits
(not silently falling back)."""

import dataclasses

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_pair, plant_read
from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.index import build_index
from urmap_tpu.map import Mapper
from urmap_tpu.map.cigar import (_tb_select, cigars_nm_blob,
                                 cigars_nm_fast)
from urmap_tpu.map.pipeline import revcomp_strand_codes

ICFG = IndexConfig(k=16, slot_bits=18, max_positions_per_slot=64)
MCFG = MapConfig(max_read_len=128, batch_size=64, seeds_per_read=6,
                 positions_per_seed=32, top_candidates=8,
                 band_halfwidth=12)


def _pad_batch(reads, L=128):
    codes = np.full((len(reads), L), alphabet.READ_N, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        c = r.codes if hasattr(r, "codes") else r
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return codes, lens


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    db = make_seqdb(rng, [80_000])
    idx = build_index(db, ICFG)
    return rng, db, idx


def _indel_reads(rng, db, n):
    reads = []
    for _ in range(n):
        if rng.random() < 0.5:
            reads.append(plant_read(rng, db, length=100,
                                    n_snps=int(rng.integers(0, 3)),
                                    ins=int(rng.integers(1, 6))))
        else:
            reads.append(plant_read(rng, db, length=100,
                                    n_snps=int(rng.integers(0, 3)),
                                    dels=int(rng.integers(1, 6))))
    return reads


def test_se_blob_identical_and_tb_used(world):
    rng, db, idx = world
    mapper = Mapper(idx, MCFG)
    assert mapper.tb
    reads = _indel_reads(rng, db, 48)
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    assert res.tb is not None and res.tb["rows"].size > 0
    genome = db.codes
    sc = mapper.sc
    with_tb = cigars_nm_blob(genome, codes, res, sc,
                             clip_rows=res.clipped)
    rows = np.nonzero(res.mapped & res.gapped)[0]
    use, _ti = _tb_select(res, rows, res.clipped)
    # the pass must actually cover (and agree on) the planted winners
    assert use.size >= int(0.9 * rows.size), (use.size, rows.size)
    res_no = dataclasses.replace(res, tb=None)
    without = cigars_nm_blob(genome, codes, res_no, sc,
                             clip_rows=res.clipped)
    for a, b in zip(with_tb, without):
        if isinstance(a, bytes):
            assert a == b
        else:
            np.testing.assert_array_equal(a, b)


def test_se_fast_path_identical(world):
    rng, db, idx = world
    mapper = Mapper(idx, MCFG)
    reads = _indel_reads(rng, db, 32)
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    strand_codes = revcomp_strand_codes(codes, res)
    sc = mapper.sc
    c1, n1, s1 = cigars_nm_fast(db.codes, strand_codes, res, sc,
                                clip_rows=res.clipped)
    res_no = dataclasses.replace(res, tb=None)
    c0, n0, s0 = cigars_nm_fast(db.codes, strand_codes, res_no, sc,
                                clip_rows=res.clipped)
    assert list(c1) == list(c0)
    np.testing.assert_array_equal(n1, n0)
    np.testing.assert_array_equal(s1, s0)


def test_pe_blob_identical_and_tb_used(world):
    rng, db, idx = world
    from tests.utils import plant_pair
    from urmap_tpu.map.pair import PairedMapper

    pm = PairedMapper(Mapper(idx, MCFG))
    assert pm.tb
    r1s, r2s = [], []
    for _ in range(24):
        p1, p2, _ = plant_pair(rng, db, length=90, frag=300, n_snps=1)
        # inject an insertion into mate1 so its winner is gapped
        c = p1.codes.copy()
        at = int(rng.integers(20, 60))
        sz = int(rng.integers(1, 5))
        c = np.concatenate([c[:at],
                            rng.integers(0, 4, sz).astype(np.uint8),
                            c[at:]])[:90]
        r1s.append(c)
        r2s.append(p2.codes)
    c1, l1 = _pad_batch(r1s)
    c2, l2 = _pad_batch(r2s)
    res = pm.map_pair_codes(c1, l1, c2, l2)
    assert res.m1.tb is not None
    assert (res.m1.tb["rows"].size + res.m2.tb["rows"].size) > 0
    sc = pm.sc
    for mate, codes in ((res.m1, c1), (res.m2, c2)):
        with_tb = cigars_nm_blob(db.codes, codes, mate, sc,
                                 clip_rows=mate.clipped)
        m_no = dataclasses.replace(mate, tb=None)
        without = cigars_nm_blob(db.codes, codes, m_no, sc,
                                 clip_rows=mate.clipped)
        for a, b in zip(with_tb, without):
            if isinstance(a, bytes):
                assert a == b
            else:
                np.testing.assert_array_equal(a, b)


def test_sharded_tb_blob_identical(world):
    """ShardedMapper's per-shard dops (shard-local rows re-based by
    _merge_tb) must be output-identical to the host DP path, SE and PE,
    on the 8-virtual-device CPU mesh."""
    rng, db, idx = world
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual CPU mesh")
    from urmap_tpu.dist.sharded import (ShardedMapper, ShardedPairedMapper,
                                        make_mesh)

    mesh = make_mesh(4)
    sm = ShardedMapper(idx, mesh, MCFG)
    assert sm.tb
    reads = _indel_reads(rng, db, 48)
    codes, lens = _pad_batch(reads)
    res = sm.map_codes(codes, lens)
    assert res.tb is not None and res.tb["rows"].size > 0
    rows = np.nonzero(res.mapped & res.gapped)[0]
    use, _ = _tb_select(res, rows, res.clipped)
    assert use.size >= int(0.8 * rows.size), (use.size, rows.size)
    with_tb = cigars_nm_blob(db.codes, codes, res, sm.sc,
                             clip_rows=res.clipped)
    res_no = dataclasses.replace(res, tb=None)
    without = cigars_nm_blob(db.codes, codes, res_no, sm.sc,
                             clip_rows=res.clipped)
    for a, b in zip(with_tb, without):
        if isinstance(a, bytes):
            assert a == b
        else:
            np.testing.assert_array_equal(a, b)
    # PE: both mates through the sharded pair step
    spm = ShardedPairedMapper(sm)
    assert spm.tb
    r1s, r2s = [], []
    for _ in range(16):
        p1, p2, _ = plant_pair(rng, db, length=90, frag=300, n_snps=1)
        c = p1.codes.copy()
        at = int(rng.integers(20, 60))
        c = np.concatenate([c[:at],
                            rng.integers(0, 4, 3).astype(np.uint8),
                            c[at:]])[:90]
        r1s.append(c)
        r2s.append(p2.codes)
    c1, l1 = _pad_batch(r1s)
    c2, l2 = _pad_batch(r2s)
    pres = spm.map_pair_codes(c1, l1, c2, l2)
    assert (pres.m1.tb["rows"].size + pres.m2.tb["rows"].size) > 0
    for mate, codes_m in ((pres.m1, c1), (pres.m2, c2)):
        wt = cigars_nm_blob(db.codes, codes_m, mate, sm.sc,
                            clip_rows=mate.clipped)
        wo = cigars_nm_blob(db.codes, codes_m,
                            dataclasses.replace(mate, tb=None), sm.sc,
                            clip_rows=mate.clipped)
        for a, b in zip(wt, wo):
            if isinstance(a, bytes):
                assert a == b
            else:
                np.testing.assert_array_equal(a, b)


def test_second_pass_patch_invalidates_tb(world):
    """A row the second pass moves must NOT decode from stale records —
    the pos/score/STRAND compares in _tb_select reject it."""
    rng, db, idx = world
    mapper = Mapper(idx, MCFG)
    reads = _indel_reads(rng, db, 16)
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    rows = np.nonzero(res.mapped & res.gapped)[0]
    use, _ = _tb_select(res, rows, res.clipped)
    assert use.size > 0
    # simulate a second-pass patch: move one tb-covered row
    r = int(use[0])
    res.pos[r] += 3
    use2, _ = _tb_select(res, rows, res.clipped)
    assert r not in use2
    res.pos[r] -= 3
    # a strand FLIP at the same pos/score (inverted-repeat re-map) must
    # also invalidate — stale records would replay the wrong
    # orientation with no structural violation (round-5 review finding)
    r2 = int(use[1]) if use.size > 1 else r
    res.strand[r2] = 1 - res.strand[r2]
    use3, _ = _tb_select(res, rows, res.clipped)
    assert r2 not in use3


def test_multi_batch_merge_keeps_tb(world):
    """map_codes over >1 batch must keep the device records usable
    (merge_tb_batches re-bases rows and dops columns) — the merged
    blob must equal the host-DP blob AND actually decode from tb."""
    rng, db, idx = world
    mapper = Mapper(idx, MCFG)      # batch_size 64
    reads = _indel_reads(rng, db, 150)   # 3 batches (64+64+22)
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    assert res.tb is not None
    rows = np.nonzero(res.mapped & res.gapped)[0]
    # winners from EVERY batch must be tb-covered, incl. rows >= 128
    use, _ = _tb_select(res, rows, res.clipped)
    assert use.size >= int(0.9 * rows.size)
    assert (use >= 128).any() and (use < 64).any()
    with_tb = cigars_nm_blob(db.codes, codes, res, mapper.sc,
                             clip_rows=res.clipped)
    res_no = dataclasses.replace(res, tb=None)
    without = cigars_nm_blob(db.codes, codes, res_no, mapper.sc,
                             clip_rows=res.clipped)
    for a, b in zip(with_tb, without):
        if isinstance(a, bytes):
            assert a == b
        else:
            np.testing.assert_array_equal(a, b)
