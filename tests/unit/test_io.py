import gzip

import numpy as np
import pytest

from urmap_tpu import alphabet
from urmap_tpu.io import FastqReader, SeqDB
from urmap_tpu.io.fasta import SEPARATOR_LEN


def test_fasta_roundtrip(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1 description here\nACGTACGT\nGGGG\n>chr2\nTTTT\n")
    db = SeqDB.from_fasta(str(fa))
    assert db.labels == ["chr1", "chr2"]
    assert list(db.lengths) == [12, 4]
    assert alphabet.decode(db.get_seq_codes(0)) == "ACGTACGTGGGG"
    assert alphabet.decode(db.get_seq_codes(1)) == "TTTT"
    # separators isolate sequences
    assert db.codes[0] == alphabet.GENOME_N
    assert db.starts[0] == SEPARATOR_LEN
    ref, off = db.global_to_local([db.starts[1] + 2])
    assert ref[0] == 1 and off[0] == 2


def test_fasta_gzip(tmp_path):
    fa = tmp_path / "g.fa.gz"
    with gzip.open(fa, "wb") as f:
        f.write(b">s\nACGT\n")
    db = SeqDB.from_fasta(str(fa))
    assert alphabet.decode(db.get_seq_codes(0)) == "ACGT"


def test_seqdb_save_load(tmp_path):
    db = SeqDB.from_seqs(["a", "b"], ["ACGT", "GGCC"])
    db.save(str(tmp_path / "db.npz"))
    db2 = SeqDB.load(str(tmp_path / "db.npz"))
    assert db2.labels == db.labels
    assert np.array_equal(db2.codes, db.codes)


def _write_fastq(path, records):
    with open(path, "w") as f:
        for name, seq, qual in records:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def test_fastq_single(tmp_path):
    fq = tmp_path / "r.fq"
    _write_fastq(fq, [("r1", "ACGT", "IIII"), ("r2", "GGTTAA", "!!!!!!")])
    batches = list(FastqReader(str(fq), batch_size=10, max_read_len=5))
    assert len(batches) == 1
    b = batches[0]
    assert b.names == ["r1", "r2"]
    assert list(b.lengths) == [4, 5]  # second truncated to max_read_len
    assert alphabet.decode(b.codes[0, :4]) == "ACGT"
    assert b.codes[0, 4] == alphabet.READ_N  # padding
    assert b.seqs[1] == b"GGTTAA"  # raw passthrough untouched


def test_fastq_paired_and_sync_error(tmp_path):
    f1, f2 = tmp_path / "1.fq", tmp_path / "2.fq"
    _write_fastq(f1, [("p/1", "ACGT", "IIII")])
    _write_fastq(f2, [("p/2", "TTTT", "IIII")])
    (fwd, rev), = list(FastqReader(str(f1), str(f2), max_read_len=10))
    assert fwd.names == rev.names == ["p"]

    _write_fastq(f2, [("q/2", "TTTT", "IIII")])
    with pytest.raises(ValueError, match="name mismatch"):
        list(FastqReader(str(f1), str(f2), max_read_len=10))


def test_fastq_batching(tmp_path):
    fq = tmp_path / "r.fq"
    _write_fastq(fq, [(f"r{i}", "ACGT", "IIII") for i in range(7)])
    sizes = [len(b) for b in FastqReader(str(fq), batch_size=3, max_read_len=8)]
    assert sizes == [3, 3, 1]


def test_gzip_fasta_and_fastq(rng, tmp_path):
    """Gzip inputs flow through both the FASTA loader and the native
    FASTQ stream (the chunked reader reads through the gzip object)."""
    import gzip

    from tests.utils import make_seqdb, plant_read
    from urmap_tpu.io.fastq import FastqReader

    db = make_seqdb(rng, [5_000])
    fa = str(tmp_path / "g.fa.gz")
    with gzip.open(fa, "wt") as f:
        f.write(">chr1\n")
        from urmap_tpu import alphabet
        f.write(alphabet.decode(db.get_seq_codes(0)) + "\n")
    db2 = SeqDB.from_fasta(fa)
    np.testing.assert_array_equal(db2.codes, db.codes)

    reads = [plant_read(rng, db, length=80) for _ in range(10)]
    fq = str(tmp_path / "r.fq.gz")
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@g{i}\n{r.seq}\n+\n{'I' * 80}\n")
    batches = list(FastqReader(fq, batch_size=16, max_read_len=100))
    assert len(batches) == 1
    assert len(batches[0]) == 10
    assert batches[0].names[0] == "g0"
    assert batches[0].lengths.tolist() == [80] * 10


def test_fasta_native_parse_matches_python(tmp_path, monkeypatch):
    """from_fasta's C parser (urmap_parse_fasta) must be bit-identical to
    the Python path: labels, starts, lengths, codes — including soft-
    masked lowercase, ambiguity codes, CRLF, ragged wrap widths, a
    mid-line '>' (sequence data, not a record start), and no trailing
    newline."""
    from urmap_tpu.io import native
    from urmap_tpu.io.fasta import SeqDB

    if native.lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    text = (b">chr1 first sequence\r\n"
            b"ACGTacgtNNRYKM\r\n"
            b"TTTT>GGGG\n"
            b"acg\n"
            b">chr2\n"
            b"A\nC\nG\nT\n"
            b"\n"
            b">  chr3xx  desc \n"
            b"UUUUuuACGT")
    p = tmp_path / "g.fa"
    p.write_bytes(text)
    nat = SeqDB.from_fasta(str(p))
    monkeypatch.setenv("URMAP_NO_NATIVE_BUILD", "1")
    ref = SeqDB.from_fasta(str(p))
    monkeypatch.delenv("URMAP_NO_NATIVE_BUILD")
    assert nat.labels == ref.labels == ["chr1", "chr2", "chr3xx"]
    np.testing.assert_array_equal(nat.starts, ref.starts)
    np.testing.assert_array_equal(nat.lengths, ref.lengths)
    np.testing.assert_array_equal(nat.codes, ref.codes)
