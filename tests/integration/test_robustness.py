"""Robustness/accuracy semantics: repeats → MAPQ 0, N bases, boundary
reads, multi-chromosome coordinates."""

import numpy as np

from tests.utils import make_seqdb, plant_read, random_seq
from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.io.fasta import SeqDB
from urmap_tpu.map.pipeline import Mapper


def _map_reads(index, reads, max_len=120):
    mapper = Mapper(index, MapConfig(max_read_len=max_len, batch_size=32))
    codes = np.stack([np.pad(r.codes, (0, max_len - len(r.codes)),
                             constant_values=alphabet.READ_N)
                      for r in reads])
    lengths = np.array([len(r.codes) for r in reads], np.int32)
    return mapper.map_codes(codes, lengths)


def test_exact_repeat_gets_mapq_zero(rng):
    """A segment duplicated at two loci: reads inside it are ambiguous —
    they must map (to either copy) with MAPQ 0; unique-region reads keep
    high MAPQ."""
    unique = random_seq(rng, 40_000)
    repeat = random_seq(rng, 5_000)
    seq = unique[:20_000] + repeat + unique[20_000:] + repeat
    db = SeqDB.from_seqs(["chr1"], [seq])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")

    start = int(db.starts[0])
    rep1 = start + 20_000
    rep2 = start + 45_000
    reads = []
    for i in range(10):  # reads fully inside the repeat copy 1
        off = int(rng.integers(0, 5_000 - 100))
        reads.append(plant_read(rng, db, length=100, gpos=rep1 + off,
                                strand=0))
    for i in range(10):  # unique-region reads
        off = int(rng.integers(0, 19_000 - 100))
        reads.append(plant_read(rng, db, length=100, gpos=start + off,
                                strand=0))
    res = _map_reads(index, reads)

    for i in range(10):
        assert res.mapped[i]
        p = int(res.pos[i])
        assert p == reads[i].gpos or p == reads[i].gpos + (rep2 - rep1), \
            (i, p, reads[i].gpos)
        assert int(res.mapq[i]) == 0, f"repeat read {i} mapq {res.mapq[i]}"
    for i in range(10, 20):
        assert res.mapped[i] and int(res.pos[i]) == reads[i].gpos
        assert int(res.mapq[i]) >= 20, f"unique read {i} mapq {res.mapq[i]}"


def test_reads_with_n_bases(rng):
    db = make_seqdb(rng, [60_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    reads = []
    for i in range(12):
        r = plant_read(rng, db, length=100, strand=i % 2)
        # sprinkle read-N bases (sequencer no-calls)
        for o in rng.choice(100, size=3, replace=False):
            r.codes[o] = alphabet.READ_N
        reads.append(r)
    res = _map_reads(index, reads)
    ok = sum(1 for i, r in enumerate(reads)
             if res.mapped[i] and int(res.pos[i]) == r.gpos)
    assert ok >= 10, f"{ok}/12 N-containing reads mapped correctly"


def test_chromosome_boundary_reads(rng):
    """Reads at position 0 and at the very end of a chromosome."""
    db = make_seqdb(rng, [30_000, 20_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    reads = []
    for ref in (0, 1):
        start = int(db.starts[ref])
        end = start + int(db.lengths[ref])
        reads.append(plant_read(rng, db, length=100, gpos=start, strand=0))
        reads.append(plant_read(rng, db, length=100, gpos=end - 100,
                                strand=1))
    res = _map_reads(index, reads)
    for i, r in enumerate(reads):
        assert res.mapped[i] and int(res.pos[i]) == r.gpos, \
            (i, int(res.pos[i]), r.gpos)
    # coordinates resolve to the right chromosome
    ref_ids, locals_ = db.global_to_local(res.pos)
    assert list(ref_ids) == [0, 0, 1, 1]
    assert int(locals_[0]) == 0 and int(locals_[2]) == 0
