"""Packed row128 offsets (store.pack_offsets_row128).

At GRCh38 scale the uint32 CSR offsets table is 2.15 GB of the 15.3 GB
HBM budget (slot_bits 29). In the row128 layout every slot's padded run
length is ≤ 2p−1, so a uint16 per slot — (start − block_base) <<
cnt_bits | padded_count — carries the same information in half the HBM
and half the gather bytes. These tests pin the encoding invariants and
the bit-identical end-to-end behavior (packed is the row128 default;
URMAP_NO_PACKED_OFFSETS=1 is the fallback hatch).
"""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_read
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.index.store import (align_runs_fixed, pack_offsets_row128,
                                   packed_offsets_bits)
from urmap_tpu.map.pipeline import Mapper


@pytest.mark.parametrize("p", [4, 8, 16, 32, 64])
def test_packed_offsets_bits_invariants(p):
    cnt_bits, block_bits = packed_offsets_bits(p)
    # padded run length ≤ 2p−1 must fit the count field
    assert (2 * p - 1) < (1 << cnt_bits)
    # worst-case within-block span must fit the delta field
    assert (1 << block_bits) * (2 * p - 1) <= (1 << (16 - cnt_bits))
    # blocks should not be degenerate for the practical widths
    assert block_bits >= 1


@pytest.mark.parametrize("p", [8, 16])
def test_pack_offsets_roundtrip(rng, p):
    # synthesize a row128-shaped CSR: counts ≤ p, placed by
    # align_runs_fixed (so diffs are count + boundary pad ≤ 2p−1)
    counts = rng.integers(0, p + 1, size=20_000).astype(np.int64)
    starts, total = align_runs_fixed(counts, 128)
    offsets = np.empty(counts.shape[0] + 1, np.uint32)
    offsets[:-1] = starts
    offsets[-1] = total
    pk = pack_offsets_row128(offsets, p)
    assert pk is not None
    cnt_bits, block_bits = pk["cnt_bits"], pk["block_bits"]
    assert (cnt_bits, block_bits) == packed_offsets_bits(p)
    u16 = pk["opacked"].view(np.uint16)[: counts.shape[0]]
    s = np.arange(counts.shape[0])
    start = pk["obase"][s >> block_bits].astype(np.int64) \
        + (u16 >> cnt_bits)
    cnt = u16 & ((1 << cnt_bits) - 1)
    np.testing.assert_array_equal(start, starts)
    np.testing.assert_array_equal(cnt, np.diff(offsets.astype(np.int64)))


def test_pack_offsets_rejects_wide_runs():
    # a diff wider than the count field (not a row128-shaped table)
    offsets = np.array([0, 40, 40], np.uint32)   # diff 40 > 2*8-1
    assert pack_offsets_row128(offsets, 8) is None


def test_packed_vs_plain_row128_end_to_end(rng, monkeypatch):
    db = make_seqdb(rng, [200_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    reads = [plant_read(rng, db, length=100,
                        n_snps=int(rng.integers(0, 3)),
                        ins=(2 if i % 7 == 0 else 0))
             for i in range(96)]
    codes = np.stack([np.pad(r.codes, (0, 100 - len(r.codes)),
                             constant_values=5) for r in reads])
    lengths = np.full(96, 100, np.int32)
    mcfg = MapConfig(max_read_len=100, batch_size=96)
    monkeypatch.setenv("URMAP_ROW128_BYTES", "1")   # force row128

    packed = Mapper(index, mcfg)
    assert packed.row128 and packed.off_bits is not None
    assert "obase" in packed.tables
    got = packed.map_codes(codes, lengths)

    monkeypatch.setenv("URMAP_NO_PACKED_OFFSETS", "1")
    plain = Mapper(index, mcfg)
    assert plain.row128 and plain.off_bits is None
    base = plain.map_codes(codes, lengths)

    for f in ("mapped", "pos", "strand", "score", "second", "mapq",
              "gapped", "ungapped", "clipped"):
        np.testing.assert_array_equal(getattr(base, f), getattr(got, f),
                                      err_msg=f)
    ok = sum(1 for i, r in enumerate(reads)
             if got.mapped[i] and int(got.pos[i]) == r.gpos)
    assert ok >= len(reads) - 3
