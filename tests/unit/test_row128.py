"""row128 huge-table layout (store.align_runs_fixed / seed._row128_fetch).

GRCh38-scale CSR positions tables cannot use the classic/aligned device
layouts: XLA materializes their rw-wide row views with (128/rw)-fold
tile padding (~95 GB for an 11.8 GB table — the round-3 single-chip
blocker). The row128 layout places runs in fixed 128-word rows (pad a
few %), uploads the table pre-shaped [R, 128] (pad-free native tiling),
and fetches one dense row per seed. Forced here at small scale via the
URMAP_ROW128_BYTES budget; results must be bit-identical to the default
layouts.
"""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_read
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.map.pipeline import Mapper


@pytest.fixture()
def problem(rng):
    db = make_seqdb(rng, [300_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    reads = [plant_read(rng, db, length=120,
                        n_snps=int(rng.integers(0, 4)),
                        ins=(2 if i % 9 == 0 else 0))
             for i in range(128)]
    codes = np.stack([np.pad(r.codes, (0, 120 - len(r.codes)),
                             constant_values=5) for r in reads])
    lengths = np.full(128, 120, np.int32)
    return index, codes, lengths, reads


def test_align_runs_fixed_invariants(rng):
    from urmap_tpu.index.store import align_runs_fixed

    counts = rng.integers(0, 17, size=5000).astype(np.int64)
    starts, total = align_runs_fixed(counts, 128)
    # no run crosses a 128 boundary; starts are monotone and gap-bounded
    assert int(total) >= int(counts.sum())
    ends = starts + counts
    assert np.all(starts // 128 == np.maximum(ends - 1, starts) // 128)
    assert np.all(np.diff(starts) >= counts[:-1])
    # the C path must equal the Python fallback
    from urmap_tpu.io import native as _nat

    orig = _nat.lib
    _nat.lib = lambda: None
    try:
        s2, t2 = align_runs_fixed(counts, 128)
    finally:
        _nat.lib = orig
    np.testing.assert_array_equal(starts, s2)
    assert total == t2


def test_row128_matches_default(problem, monkeypatch):
    index, codes, lengths, reads = problem
    mcfg = MapConfig(max_read_len=120, batch_size=64)
    base = Mapper(index, mcfg).map_codes(codes, lengths)

    monkeypatch.setenv("URMAP_ROW128_BYTES", "1")
    m128 = Mapper(index, mcfg)
    assert m128.row128, "tiny budget must force the row128 layout"
    got = m128.map_codes(codes, lengths)
    for f in ("mapped", "pos", "strand", "score", "second", "mapq",
              "gapped", "ungapped"):
        np.testing.assert_array_equal(getattr(base, f), getattr(got, f),
                                      err_msg=f)
    ok = sum(1 for i, r in enumerate(reads)
             if got.mapped[i] and int(got.pos[i]) == r.gpos)
    assert ok >= len(reads) - 3


def test_row128_paired_with_rescue(problem, monkeypatch):
    """PE under row128: pairing + the 1200-base mate-rescue window scan
    (the widest genome fetch) must be bit-identical to the default
    layout."""
    from tests.utils import plant_pair
    from urmap_tpu.map.pair import PairedMapper

    index, _, _, _ = problem
    rng = np.random.default_rng(5)
    pairs = [plant_pair(rng, index.seqdb, length=120, frag=400,
                        snp_every=(15 if i % 4 == 0 else None))
             for i in range(48)]
    r1 = np.stack([p[0].codes for p in pairs])
    r2 = np.stack([p[1].codes for p in pairs])
    ln = np.full(48, 120, np.int32)
    mcfg = MapConfig(max_read_len=120, batch_size=64)
    base = PairedMapper(Mapper(index, mcfg)).map_pair_codes(r1, ln, r2, ln)
    monkeypatch.setenv("URMAP_ROW128_BYTES", "1")
    m = Mapper(index, mcfg)
    assert m.row128
    got = PairedMapper(m).map_pair_codes(r1, ln, r2, ln)
    np.testing.assert_array_equal(base.proper, got.proper)
    for mate in ("m1", "m2"):
        for f in ("mapped", "pos", "strand", "score", "mapq"):
            np.testing.assert_array_equal(
                getattr(getattr(base, mate), f),
                getattr(getattr(got, mate), f), err_msg=f"{mate}.{f}")
    assert int(got.proper.sum()) >= 44


def test_row128_sharded_matches(problem, monkeypatch):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from urmap_tpu.dist.sharded import ShardedMapper, make_mesh

    index, codes, lengths, _ = problem
    mcfg = MapConfig(max_read_len=120, batch_size=64)
    base = Mapper(index, mcfg).map_codes(codes, lengths)
    monkeypatch.setenv("URMAP_ROW128_BYTES", "1")
    for route in ("a2a", "psum"):
        sh = ShardedMapper(index, make_mesh(8, data=2, index=4), mcfg,
                           route=route)
        assert sh.row128
        got = sh.map_codes(codes, lengths)
        for f in ("mapped", "pos", "strand", "score", "mapq"):
            np.testing.assert_array_equal(getattr(base, f),
                                          getattr(got, f),
                                          err_msg=f"{route}:{f}")
