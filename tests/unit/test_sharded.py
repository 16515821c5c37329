"""Sharded (mesh) mapping path vs the single-device pipeline.

Runs on the 8-virtual-device CPU backend (conftest.py) — proves the
psum-combined CSR lookup and all_gather'd DP sharding are equivalent to
the replicated pipeline, per SURVEY.md §4.2's mesh-shape-agnostic rule.
"""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_read
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.map.pipeline import Mapper


def _problem(rng, n_reads=48):
    db = make_seqdb(rng, [120_000])
    index = build_index(db, IndexConfig(slot_bits=16))
    reads = [plant_read(rng, db, length=100,
                        n_snps=int(rng.integers(0, 4)))
             for _ in range(n_reads)]
    codes = np.stack([np.pad(r.codes, (0, 120 - len(r.codes)),
                             constant_values=5) for r in reads])
    lengths = np.full(n_reads, 100, np.int32)
    return db, index, reads, codes, lengths


@pytest.mark.parametrize("route,data,index_ax", [
    ("psum", 1, 8), ("psum", 2, 4), ("psum", 8, 1),
    ("a2a", 1, 8), ("a2a", 2, 4), ("a2a", 8, 1), ("a2a", 2, 2),
])
def test_sharded_matches_single(rng, route, data, index_ax):
    import jax

    from urmap_tpu.dist.sharded import ShardedMapper, make_mesh

    if len(jax.devices()) < data * index_ax:
        pytest.skip("need 8 devices")
    db, index, reads, codes, lengths = _problem(rng)
    mcfg = MapConfig(max_read_len=120, batch_size=16)

    single = Mapper(index, mcfg).map_codes(codes, lengths)
    mesh = make_mesh(data * index_ax, data=data, index=index_ax)
    sharded = ShardedMapper(index, mesh, mcfg,
                            route=route).map_codes(codes, lengths)

    np.testing.assert_array_equal(single.mapped, sharded.mapped)
    np.testing.assert_array_equal(single.pos, sharded.pos)
    np.testing.assert_array_equal(single.strand, sharded.strand)
    np.testing.assert_array_equal(single.score, sharded.score)
    np.testing.assert_array_equal(single.mapq, sharded.mapq)
    # and both agree with the planted truth for nearly all reads
    ok = sum(1 for i, r in enumerate(reads)
             if sharded.mapped[i] and int(sharded.pos[i]) == r.gpos
             and int(sharded.strand[i]) == r.strand)
    assert ok >= len(reads) - 2


def test_a2a_overflow_retry(rng):
    """Force routing-capacity overflow (slack < 1 would be cheating —
    instead use a tiny K via a huge seed count vs capacity: map many
    reads whose seeds all hash into ONE shard's range is impractical;
    instead shrink slack by monkeypatching) — retry rounds must still
    serve every query and match the single-device result."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    from urmap_tpu.dist import sharded as sh

    db, index, reads, codes, lengths = _problem(rng, n_reads=16)
    mcfg = MapConfig(max_read_len=120, batch_size=16)
    single = Mapper(index, mcfg).map_codes(codes, lengths)
    mesh = sh.make_mesh(4, data=1, index=4)

    orig = sh._a2a_gather_runner

    def tight(offsets, positions, **kw):
        kw["slack"] = 0.3            # guarantees overflow → retry rounds
        return orig(offsets, positions, **kw)

    sh._a2a_gather_runner = tight
    try:
        sharded = sh.ShardedMapper(index, mesh, mcfg,
                                   route="a2a").map_codes(codes, lengths)
    finally:
        sh._a2a_gather_runner = orig
    np.testing.assert_array_equal(single.mapped, sharded.mapped)
    np.testing.assert_array_equal(single.pos, sharded.pos)
    np.testing.assert_array_equal(single.score, sharded.score)


def test_dryrun_multichip():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_tables_roundtrip(rng, tmp_path):
    from urmap_tpu.dist.sharded import (load_sharded_tables,
                                        save_sharded_tables,
                                        shard_index_tables)
    from urmap_tpu.config import IndexConfig
    from urmap_tpu.index.build import build_index

    db = make_seqdb(rng, [50_000])
    index = build_index(db, IndexConfig(slot_bits=14), backend="host")
    want = shard_index_tables(index, 4)
    save_sharded_tables(index, str(tmp_path / "sh"), 4)
    got = load_sharded_tables(str(tmp_path / "sh"))
    assert got.num_shards == want.num_shards
    assert got.slots_per_shard == want.slots_per_shard
    np.testing.assert_array_equal(got.offsets, want.offsets)
    np.testing.assert_array_equal(got.positions, want.positions)
    # subset load for a single host's shards
    sub = load_sharded_tables(str(tmp_path / "sh"), shards=[1, 3])
    np.testing.assert_array_equal(sub.offsets[0], want.offsets[1])
    np.testing.assert_array_equal(sub.offsets[1], want.offsets[3])
