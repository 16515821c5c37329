"""Sanity tests for the golden-model oracle itself (tests/oracle/)."""

import numpy as np

from tests.oracle import OracleMapper
from tests.utils import make_seqdb, plant_read, random_seq
from urmap_tpu import alphabet
from urmap_tpu.config import MapConfig, ScoreConfig
from urmap_tpu.io.fasta import SeqDB
from tests.oracle.oracle import semiglobal_scan, traceback_cigar


def test_scan_finds_exact_substring(rng):
    db = make_seqdb(rng, [5000])
    r = plant_read(rng, db, length=100, strand=0)
    scores, starts = semiglobal_scan(db.codes, r.codes, ScoreConfig())
    j = int(np.argmax(scores))
    assert scores[j] == 100  # perfect match, match=+1
    assert starts[j] == r.gpos


def test_oracle_exact_reads(rng):
    db = make_seqdb(rng, [3000, 2000])
    oracle = OracleMapper(db)
    for strand in (0, 1):
        r = plant_read(rng, db, length=80, strand=strand)
        m = oracle.map_read(r.codes)
        assert m.mapped and m.pos == r.gpos and m.strand == strand
        assert m.cigar == "80M"
        assert m.score == 80
        assert m.mapq == MapConfig().max_mapq  # unique locus


def test_oracle_snps(rng):
    db = make_seqdb(rng, [4000])
    oracle = OracleMapper(db)
    r = plant_read(rng, db, length=100, strand=0, n_snps=3)
    m = oracle.map_read(r.codes)
    assert m.mapped and m.pos == r.gpos
    assert m.cigar == "100M"
    assert m.score == 97 * 1 + 3 * -2  # 3 mismatches


def test_oracle_indels(rng):
    db = make_seqdb(rng, [4000])
    oracle = OracleMapper(db)
    r = plant_read(rng, db, length=100, strand=0, dels=3)
    m = oracle.map_read(r.codes)
    assert m.mapped and m.pos == r.gpos
    assert "D" in m.cigar and "3D" in m.cigar

    r = plant_read(rng, db, length=100, strand=0, ins=2)
    m = oracle.map_read(r.codes)
    assert m.mapped and m.pos == r.gpos
    assert "2I" in m.cigar


def test_oracle_duplicate_locus_gets_mapq0(rng):
    seg = random_seq(rng, 500)
    db = SeqDB.from_seqs(["c"], [seg + random_seq(rng, 1000) + seg])
    oracle = OracleMapper(db)
    read = db.codes[int(db.starts[0]) + 100 : int(db.starts[0]) + 200]
    m = oracle.map_read(read)
    assert m.mapped
    assert m.second_score == m.score
    assert m.mapq == 0


def test_oracle_unmappable_read(rng):
    db = make_seqdb(rng, [3000])
    oracle = OracleMapper(db)
    read = alphabet.encode(random_seq(rng, 120), is_genome=False)
    m = oracle.map_read(read)
    assert not m.mapped


def test_traceback_matches_scan_score(rng):
    db = make_seqdb(rng, [3000])
    sc = ScoreConfig()
    for _ in range(10):
        r = plant_read(rng, db, length=90, strand=0,
                       n_snps=int(rng.integers(0, 4)),
                       ins=int(rng.integers(0, 3)), dels=int(rng.integers(0, 3)))
        scores, starts = semiglobal_scan(db.codes, r.codes, sc)
        j = int(np.argmax(scores))
        cigar, tb = traceback_cigar(db.codes, r.codes, int(starts[j]), sc)
        assert tb == scores[j], cigar


def test_cigar_lengths_consistent(rng):
    import re
    db = make_seqdb(rng, [3000])
    oracle = OracleMapper(db)
    for _ in range(5):
        r = plant_read(rng, db, length=80, ins=2, dels=1, n_snps=2)
        m = oracle.map_read(r.codes)
        ops = re.findall(r"(\d+)([MIDS])", m.cigar)
        read_len = sum(int(n) for n, op in ops if op in "MIS")
        assert read_len == 80
