"""Scale checks on CPU: E. coli-sized genome (BASELINE.json config 1)
and chunked device index build equivalence."""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_read
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.map.pipeline import Mapper


def test_ecoli_scale_single_end(rng):
    """~4.6 Mbp genome (E. coli K-12 size), 1000 planted reads with the
    paper-ish error profile → ≥99% correctly placed."""
    db = make_seqdb(rng, [4_600_000])
    index = build_index(db, backend="host")
    mapper = Mapper(index, MapConfig(max_read_len=160, batch_size=512))

    reads = []
    for i in range(1000):
        reads.append(plant_read(
            rng, db, length=150,
            n_snps=int(rng.integers(0, 4)),
            ins=(2 if i % 10 == 0 else 0),
            dels=(3 if i % 10 == 5 else 0)))
    codes = np.stack([np.pad(r.codes, (0, 160 - len(r.codes)),
                             constant_values=5) for r in reads])
    lengths = np.array([len(r.codes) for r in reads], np.int32)
    res = mapper.map_codes(codes, lengths)
    ok = sum(1 for i, r in enumerate(reads)
             if res.mapped[i] and int(res.pos[i]) == r.gpos
             and int(res.strand[i]) == r.strand)
    assert ok >= 990, f"{ok}/1000 correct"


def test_chunked_device_build_equals_host(rng):
    """Multi-chunk device build path == host build (chunk merge logic)."""
    db = make_seqdb(rng, [300_000])
    cfg = IndexConfig(slot_bits=16, max_positions_per_slot=16)
    a = build_index(db, cfg, backend="host")
    b = build_index(db, cfg, backend="device", chunk=70_000)  # ~5 chunks
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.positions, b.positions)


def test_veryfast_index_maps_planted(rng, tmp_path):
    """-veryfast build → header flag → cmd_map picks the narrowed map
    widths (config.VERYFAST_MAP_OVERRIDES) and still maps planted reads."""
    from tests.utils import make_seqdb, plant_read, write_fastq
    from urmap_tpu import cli
    from urmap_tpu.index import UfiIndex

    db = make_seqdb(rng, [400_000])
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        from urmap_tpu import alphabet
        f.write(alphabet.decode(db.codes[db.starts[0]:
                                         db.starts[0] + db.lengths[0]]))
        f.write("\n")
    ufi = tmp_path / "g.ufi"
    assert cli.main(["-make_ufi", str(fa), "-output", str(ufi),
                     "-veryfast", "-quiet"]) == 0
    idx = UfiIndex.load(str(ufi))
    assert idx.config.veryfast
    from urmap_tpu.config import IndexConfig
    assert idx.config.slot_bits == min(
        IndexConfig.auto_slot_bits(db.total_len) + 2, 30)

    reads = [plant_read(rng, db, length=100,
                        n_snps=int(rng.integers(0, 3))) for _ in range(64)]
    fq = tmp_path / "r.fq"
    write_fastq(fq, reads)
    sam = tmp_path / "out.sam"
    assert cli.main(["-map", str(fq), "-ufi", str(ufi), "-samout",
                     str(sam), "-quiet", "-batch", "64"]) == 0
    n_ok = 0
    for line in open(sam):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        i = int(f[0][1:]) if f[0][0] == "r" else int(f[0])
        r = reads[i]
        if not int(f[1]) & 4 and int(f[3]) - 1 == r.gpos - db.starts[0]:
            n_ok += 1
    assert n_ok >= 62, n_ok
