"""Native C++ IO codecs vs the pure-Python reference paths.

The native FASTQ parser and SAM formatter (io/native/codecs.cpp) must be
byte-for-byte interchangeable with io/fastq.py + io/sam.py — these tests
run both on identical inputs and diff the results.
"""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_pair, plant_read, write_fastq
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.io import sam as samio
from urmap_tpu.io import sam_native
from urmap_tpu.io.fastq import FastqReader
from urmap_tpu.map.cigar import cigars_for_result, cigars_nm_fast
from urmap_tpu.map.pair import PairedMapper
from urmap_tpu.map.pipeline import Mapper, revcomp_strand_codes

pytestmark = pytest.mark.skipif(not sam_native.available(),
                                reason="native codecs unavailable")


def _write_weird_fastq(path):
    """Exercise parser edges: comments in headers, /1 suffixes, CRLF,
    lowercase and N bases, no trailing newline."""
    recs = [
        ("plain", "ACGTACGTACGTACGTACGTACGT"),
        ("with/1", "acgtacgtACGTNNacgt"),
        ("spaced desc here", "ACGTNACGTA"),
        ("crlf", "TTTTCCCCGGGGAAAA"),
    ]
    with open(path, "wb") as f:
        for i, (name, seq) in enumerate(recs):
            q = chr(33 + (i % 40)) * len(seq)
            if name == "crlf":
                f.write(f"@{name}\r\n{seq}\r\n+\r\n{q}".encode())  # no \n
            else:
                f.write(f"@{name}\n{seq}\n+x comment\n{q}\n".encode())
    return recs


def test_native_fastq_parse_matches_python(tmp_path):
    path = str(tmp_path / "r.fq")
    _write_weird_fastq(path)
    nat = list(FastqReader(path, batch_size=16, max_read_len=20,
                           native=True))
    py = list(FastqReader(path, batch_size=16, max_read_len=20,
                          native=False))
    assert len(nat) == len(py) == 1
    nb, pb = nat[0], py[0]
    assert nb.names == pb.names
    assert nb.seqs == pb.seqs
    assert nb.quals == pb.quals
    np.testing.assert_array_equal(nb.codes, pb.codes)
    np.testing.assert_array_equal(nb.lengths, pb.lengths)


def test_native_fastq_malformed(tmp_path):
    path = str(tmp_path / "bad.fq")
    with open(path, "w") as f:
        f.write("@ok\nACGT\n+\nIIII\nnot_a_header\nACGT\n+\nIIII\n")
    reader = FastqReader(path, batch_size=16, max_read_len=20, native=True)
    with pytest.raises(ValueError, match="malformed|truncated"):
        list(reader)


def _se_problem(rng, tmp_path):
    db = make_seqdb(rng, [80_000])
    index = build_index(db, IndexConfig(slot_bits=16))
    reads = [plant_read(rng, db, length=100, n_snps=i % 3,
                        dels=(2 if i % 5 == 0 else 0))
             for i in range(32)]
    path = str(tmp_path / "se.fq")
    write_fastq(path, reads)
    return db, index, path


def _canon(text: str) -> list[str]:
    return sorted(line for line in text.strip().splitlines() if line)


def test_native_sam_single_end_matches_python(rng, tmp_path):
    db, index, path = _se_problem(rng, tmp_path)
    mcfg = MapConfig(max_read_len=120, batch_size=32)
    mapper = Mapper(index, mcfg)

    (batch,) = list(FastqReader(path, batch_size=32, max_read_len=120,
                                native=True))
    res = mapper.map_codes(batch.codes, batch.lengths)
    strand_codes = revcomp_strand_codes(batch.codes, res)

    cigars, nms = cigars_for_result(db.codes, strand_codes, res, mapper.sc)
    py_recs = samio.records_single_end(batch, res, cigars, nms, db)

    cig, nm, _span = cigars_nm_fast(db.codes, strand_codes, res, mapper.sc)
    # fast-path CIGAR/NM must agree with the per-read reference path
    for i in range(len(batch)):
        if res.mapped[i]:
            assert cig[i] == cigars[i], i
            assert int(nm[i]) == nms[i], i
    nat = sam_native.format_single_end(batch, res, cig, nm, db)
    assert _canon(nat.decode()) == _canon("\n".join(py_recs))


def test_native_sam_paired_matches_python(rng, tmp_path):
    db = make_seqdb(rng, [120_000])
    index = build_index(db, IndexConfig(slot_bits=16))
    mcfg = MapConfig(max_read_len=120, batch_size=16)
    pm = PairedMapper(Mapper(index, mcfg))
    pairs = [plant_pair(rng, db, length=100,
                        frag=int(rng.integers(150, 900)),
                        n_snps=int(rng.integers(0, 3)))
             for _ in range(14)]
    # one rescue pair + one unmappable mate
    pairs.append(plant_pair(rng, db, length=100, frag=400, snp_every=15))
    p1 = str(tmp_path / "r1.fq")
    p2 = str(tmp_path / "r2.fq")
    write_fastq(p1, [p[0] for p in pairs], prefix="p")
    write_fastq(p2, [p[1] for p in pairs], prefix="p")

    (pair_batches,) = list(FastqReader(p1, p2, batch_size=16,
                                       max_read_len=120, native=True))
    b1, b2 = pair_batches
    res = pm.map_pair_codes(b1.codes, b1.lengths, b2.codes, b2.lengths)
    py_recs, _stats = pm.map_pairs_to_sam(b1, b2)

    sc1 = revcomp_strand_codes(b1.codes, res.m1)
    sc2 = revcomp_strand_codes(b2.codes, res.m2)
    c1, e1, sp1 = cigars_nm_fast(db.codes, sc1, res.m1, pm.sc)
    c2, e2, sp2 = cigars_nm_fast(db.codes, sc2, res.m2, pm.sc)
    nat = sam_native.format_paired(b1, b2, res, c1, e1, sp1, c2, e2, sp2, db)
    assert _canon(nat.decode()) == _canon("\n".join(py_recs))


def test_empty_sequence_record(rng, tmp_path):
    """A FASTQ record with an empty sequence maps to an unmapped SAM
    record with SEQ/QUAL '*' (both writers)."""
    from tests.utils import make_seqdb
    db = make_seqdb(rng, [30_000])
    from urmap_tpu.index.build import build_index
    index = build_index(db, IndexConfig(slot_bits=14), backend="host")
    path = str(tmp_path / "e.fq")
    with open(path, "w") as f:
        f.write("@empty\n\n+\n\n@ok\nACGTACGTACGTACGTACGTACGTACGT\n+\n"
                + "I" * 28 + "\n")
    (batch,) = list(FastqReader(path, batch_size=8, max_read_len=40,
                                native=True))
    assert batch.lengths.tolist() == [0, 28]
    mapper = Mapper(index, MapConfig(max_read_len=40, batch_size=8))
    res = mapper.map_codes(batch.codes, batch.lengths)
    assert not res.mapped[0]

    from urmap_tpu.map.cigar import cigars_nm_fast as _cnf
    strand_codes = revcomp_strand_codes(batch.codes, res)
    cig, nm, _sp = _cnf(db.codes, strand_codes, res, ScoreConfig())
    nat = sam_native.format_single_end(batch, res, cig, nm, db)
    line = nat.decode().splitlines()[0].split("\t")
    assert line[0] == "empty" and int(line[1]) & 0x4
    assert line[9] == "*" and line[10] == "*"

    cigars, nms = cigars_for_result(db.codes, strand_codes, res,
                                    ScoreConfig())
    py_line = samio.records_single_end(batch, res, cigars, nms,
                                       db)[0].split("\t")
    assert py_line[9] == "*" and py_line[10] == "*"


def test_native_traceback_matches_python(rng):
    """C++ batch traceback vs the Python reference on gapped reads."""
    from tests.utils import make_seqdb, plant_read
    from urmap_tpu.map.cigar import traceback, traceback_batch_native
    from urmap_tpu.io.sam import ref_consumed

    db = make_seqdb(rng, [40_000])
    sc = ScoreConfig()
    n = 40
    starts = np.zeros(n, np.int64)
    reads = np.full((n, 120), 5, np.uint8)
    lens = np.zeros(n, np.int32)
    for i in range(n):
        r = plant_read(rng, db, length=100 if i % 2 else 77,
                       n_snps=int(rng.integers(0, 4)),
                       ins=(int(rng.integers(1, 5)) if i % 3 == 0 else 0),
                       dels=(int(rng.integers(1, 6)) if i % 3 == 1 else 0),
                       strand=0)
        starts[i] = r.gpos
        lens[i] = len(r.codes)
        reads[i, :lens[i]] = r.codes
    nat = traceback_batch_native(db.codes, starts, reads, lens, sc)
    assert nat is not None
    cigs, nms, scores, spans = nat
    for i in range(n):
        c, s, e = traceback(db.codes, reads[i][:lens[i]], int(starts[i]), sc)
        assert cigs[i] == c, (i, cigs[i], c)
        assert int(scores[i]) == s, i
        assert int(nms[i]) == e, i
        assert int(spans[i]) == ref_consumed(c), i


def test_long_reference_labels_no_overflow(rng, tmp_path):
    """RNAME/RNEXT label bytes must be counted in the formatter's per-
    record capacity bound (round-1 advisor: draft/NCBI assemblies carry
    100+-char labels; the old bound omitted them → heap overflow)."""
    from tests.utils import random_seq
    from urmap_tpu.io.fasta import SeqDB

    label = "scaffold_" + "x" * 400  # ≫ the old 96+64-byte slack
    db = SeqDB.from_seqs([label], [random_seq(rng, 60_000)])
    index = build_index(db, IndexConfig(slot_bits=15))
    mapper = Mapper(index, MapConfig(max_read_len=120, batch_size=64))
    reads = [plant_read(rng, db, length=100, n_snps=i % 3)
             for i in range(64)]
    path = str(tmp_path / "ll.fq")
    write_fastq(path, reads)
    (batch,) = list(FastqReader(path, batch_size=64, max_read_len=120,
                                native=True))
    res = mapper.map_codes(batch.codes, batch.lengths)
    strand_codes = revcomp_strand_codes(batch.codes, res)
    cig, nm, _sp = cigars_nm_fast(db.codes, strand_codes, res, mapper.sc)
    nat = sam_native.format_single_end(batch, res, cig, nm, db)
    cigars, nms = cigars_for_result(db.codes, strand_codes, res, mapper.sc)
    py_recs = samio.records_single_end(batch, res, cigars, nms, db)
    assert _canon(nat.decode()) == _canon("\n".join(py_recs))


def test_paired_trim_and_carry(rng, tmp_path):
    """When one file's chunk parse yields fewer records (oversized records
    blowing the buffer budget), the reader trims and carries instead of
    erroring, and record pairing stays name-synchronized."""
    n = 40
    names = [f"q{i}" for i in range(n)]
    p1 = str(tmp_path / "c1.fq")
    p2 = str(tmp_path / "c2.fq")
    # R2 records are much larger than R1 (long reads truncated at map
    # time), so R2 batches parse fewer records per buffer fill
    with open(p1, "w") as f:
        for nm_ in names:
            f.write(f"@{nm_}\nACGTACGTACGT\n+\n{'I' * 12}\n")
    big = "ACGT" * 300
    with open(p2, "w") as f:
        for nm_ in names:
            f.write(f"@{nm_}\n{big}\n+\n{'I' * len(big)}\n")
    got = []
    reader = FastqReader(p1, p2, batch_size=8, max_read_len=16, native=True)
    if not reader.native:
        pytest.skip("native parser unavailable")
    # shrink the rev stream's refill so counts genuinely diverge
    reader._rev.CHUNK = 1  # forces need-based fills only
    for b1, b2 in reader:
        assert len(b1) == len(b2)
        got.extend(zip(b1.names, b2.names))
    assert [a for a, _ in got] == names
    assert all(a == b for a, b in got)


def test_cigars_nm_blob_matches_fast_path(rng, tmp_path):
    """cigars_nm_blob (all-native CIGAR composition from as-sequenced
    codes) must byte-match the cigars_nm_fast strings, including
    truncation soft-clips and gapped tracebacks."""
    from urmap_tpu.map.cigar import cigars_nm_blob, cigars_nm_fast

    db = make_seqdb(rng, [60_000])
    index = build_index(db, IndexConfig(slot_bits=15))
    mapper = Mapper(index, MapConfig(max_read_len=90, batch_size=64))
    reads = []
    for i in range(60):
        reads.append(plant_read(rng, db, length=80, n_snps=i % 4,
                                dels=(2 if i % 5 == 0 else 0),
                                ins=(1 if i % 7 == 0 else 0)))
    # some reads longer than max_read_len → truncation clips
    reads += [plant_read(rng, db, length=120, n_snps=1) for _ in range(4)]
    path = str(tmp_path / "blob.fq")
    write_fastq(path, reads)
    (batch,) = list(FastqReader(path, batch_size=128, max_read_len=90,
                                native=True))
    res = mapper.map_codes(batch.codes, batch.lengths)

    strand_codes = revcomp_strand_codes(batch.codes, res)
    cig, nm_f, span_f = cigars_nm_fast(db.codes, strand_codes, res,
                                       mapper.sc, raw_lengths=batch.seq_len)
    blob, off, nm_b, span_b = cigars_nm_blob(db.codes, batch.codes, res,
                                             mapper.sc,
                                             raw_lengths=batch.seq_len)
    np.testing.assert_array_equal(nm_b, nm_f)
    np.testing.assert_array_equal(span_b, span_f)
    for i in range(len(batch)):
        got = blob[off[i]:off[i + 1]].decode()
        assert got == cig[i], (i, got, cig[i])
