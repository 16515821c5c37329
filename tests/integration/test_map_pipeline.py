"""End-to-end device pipeline vs planted truth and the oracle."""

import numpy as np
import pytest

from tests.oracle import OracleMapper
from tests.utils import make_seqdb, plant_read, random_seq
from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.index import build_index
from urmap_tpu.io.fasta import SeqDB
from urmap_tpu.map import Mapper

ICFG = IndexConfig(k=16, slot_bits=18, max_positions_per_slot=64)
MCFG = MapConfig(max_read_len=128, batch_size=64, seeds_per_read=6,
                 positions_per_seed=32, top_candidates=8, band_halfwidth=12)


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
    rng = np.random.default_rng(42)
    db = make_seqdb(rng, [60_000, 30_000])
    idx = build_index(db, ICFG)
    mapper = Mapper(idx, MCFG)
    return rng, db, idx, mapper


def test_planted_reads_all_variants(world):
    rng, db, idx, mapper = world
    reads = []
    for _ in range(50):
        reads.append(plant_read(rng, db, length=100,
                                n_snps=int(rng.integers(0, 4)),
                                ins=int(rng.integers(0, 2)) * int(rng.integers(1, 5)),
                                dels=0))
    for _ in range(20):
        reads.append(plant_read(rng, db, length=100, dels=int(rng.integers(1, 6))))
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    n_ok = 0
    for i, r in enumerate(reads):
        assert res.mapped[i], f"read {i} unmapped ({r})"
        assert res.strand[i] == r.strand, i
        if res.pos[i] == r.gpos:
            n_ok += 1
    # position must be exact for every planted read here (unique random loci)
    assert n_ok == len(reads), f"{len(reads) - n_ok} wrong positions"


def test_matches_oracle(world):
    rng, db, idx, mapper = world
    oracle = OracleMapper(db, map_cfg=MCFG)
    reads = [plant_read(rng, db, length=90,
                        n_snps=int(rng.integers(0, 5)),
                        ins=int(rng.integers(0, 3)),
                        dels=int(rng.integers(0, 3))) for _ in range(25)]
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    for i, r in enumerate(reads):
        m = oracle.map_read(r.codes)
        assert res.mapped[i] == m.mapped, i
        if m.mapped:
            assert res.pos[i] == m.pos, i
            assert res.score[i] == m.score, i
            assert res.strand[i] == m.strand, i
            assert res.mapq[i] == m.mapq, (i, res.second[i], m.second_score)


def test_unmappable_and_short_reads(world):
    rng, db, idx, mapper = world
    garbage = alphabet.encode(random_seq(rng, 100), is_genome=False)
    short = alphabet.encode("ACGTACGT", is_genome=False)  # < k
    withn = plant_read(rng, db, length=100).codes.copy()
    withn[::3] = alphabet.READ_N  # N every 3rd base: no valid seed words
    codes, lens = _pad_batch([garbage, short, withn])
    res = mapper.map_codes(codes, lens)
    assert not res.mapped[0]
    assert not res.mapped[1]
    assert not res.mapped[2]
    assert res.mapq[0] == 0


def test_duplicate_locus_mapq0(world):
    rng = np.random.default_rng(7)
    seg = random_seq(rng, 400)
    db = SeqDB.from_seqs(["c"], [seg + random_seq(rng, 5000) + seg])
    idx = build_index(db, ICFG)
    mapper = Mapper(idx, MCFG)
    read = db.codes[int(db.starts[0]) + 50 : int(db.starts[0]) + 150]
    codes, lens = _pad_batch([read])
    res = mapper.map_codes(codes, lens)
    assert res.mapped[0]
    assert res.second[0] == res.score[0]
    assert res.mapq[0] == 0


def test_batch_padding_roundtrip(world):
    """Batches not divisible by batch_size get padded and unpadded."""
    rng, db, idx, mapper = world
    reads = [plant_read(rng, db, length=80) for _ in range(5)]
    codes, lens = _pad_batch(reads)
    res = mapper.map_codes(codes, lens)
    assert len(res.mapped) == 5
    assert res.mapped.all()


def test_long_read_truncation_soft_clip(rng, tmp_path):
    """Reads longer than -maxreadlen map on their first max_read_len
    bases; the unmapped tail must be soft-clipped so CIGAR length ==
    SEQ length (fwd: trailing S; rc: leading S)."""
    from tests.utils import make_seqdb, plant_read, write_fastq
    from urmap_tpu.cli import main
    from urmap_tpu.config import IndexConfig
    from urmap_tpu.index.build import build_index
    import re

    db = make_seqdb(rng, [80_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    reads = [plant_read(rng, db, length=130, strand=s % 2)
             for s in range(8)]
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    sam = str(tmp_path / "out.sam")
    main(["-map", fq, "-ufi", ufi, "-samout", sam, "-batch", "8",
          "-maxreadlen", "100", "-quiet"])

    n_checked = 0
    for line in open(sam):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag, cigar, seq = int(f[1]), f[5], f[9]
        if flag & 4:
            continue
        assert len(seq) == 130
        ops = re.findall(r"(\d+)([MIDS])", cigar)
        assert sum(int(n) for n, op in ops if op in "MIS") == 130, cigar
        if flag & 16:
            assert ops[0] == ("30", "S"), cigar
        else:
            assert ops[-1] == ("30", "S"), cigar
        n_checked += 1
    assert n_checked >= 7


def test_gzip_samout_equals_plain(rng, tmp_path):
    """-samout out.sam.gz writes gzip-compressed SAM, byte-equal to the
    plain output after decompression (dist.multihost.merge_shards)."""
    import gzip

    from tests.utils import make_seqdb, plant_read, write_fastq
    from urmap_tpu.cli import main
    from urmap_tpu.config import IndexConfig
    from urmap_tpu.index.build import build_index

    db = make_seqdb(rng, [60_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    reads = [plant_read(rng, db, length=100) for _ in range(16)]
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    plain = str(tmp_path / "out.sam")
    gz = str(tmp_path / "out.sam.gz")
    assert main(["-map", fq, "-ufi", ufi, "-samout", plain, "-batch",
                 "16", "-quiet"]) == 0
    assert main(["-map", fq, "-ufi", ufi, "-samout", gz, "-batch",
                 "16", "-quiet"]) == 0
    with open(plain, "rb") as f:
        want = f.read()
    with gzip.open(gz, "rb") as f:
        got = f.read()
    # @PG lines carry the command line (differs by -samout arg) — drop
    strip = lambda b: b"\n".join(
        ln for ln in b.split(b"\n") if not ln.startswith(b"@PG"))
    assert strip(got) == strip(want)


def test_selfcheck_flag_passes_and_audits(rng, tmp_path, capsys):
    """-selfcheck (SURVEY §5.2 sanitizer mode) re-derives a sample of
    device calls on the host per batch; on healthy planted reads (SE and
    PE) it must stay silent and the output must equal a run without it."""
    from tests.utils import make_seqdb, plant_pair, plant_read, write_fastq
    from urmap_tpu.cli import main
    from urmap_tpu.config import IndexConfig
    from urmap_tpu.index.build import build_index

    db = make_seqdb(rng, [60_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    reads = [plant_read(rng, db, length=100,
                        n_snps=int(rng.integers(0, 3))) for _ in range(24)]
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    plain = str(tmp_path / "out.sam")
    audited = str(tmp_path / "out_sc.sam")
    assert main(["-map", fq, "-ufi", ufi, "-samout", plain, "-batch",
                 "16", "-quiet"]) == 0
    assert main(["-map", fq, "-ufi", ufi, "-samout", audited, "-batch",
                 "16", "-quiet", "-selfcheck"]) == 0
    assert open(audited).read() == open(plain).read()

    pairs = [plant_pair(rng, db, length=90) for _ in range(12)]
    fq1, fq2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    write_fastq(fq1, [p[0] for p in pairs])
    write_fastq(fq2, [p[1] for p in pairs])
    pe = str(tmp_path / "pe_sc.sam")
    assert main(["-map", fq1, "-reverse", fq2, "-ufi", ufi, "-samout",
                 pe, "-batch", "8", "-quiet", "-selfcheck"]) == 0
    n = sum(1 for ln in open(pe) if not ln.startswith("@"))
    assert n == 24
