"""Multi-host plumbing: record-aligned byte ranges, shard watermarks,
rank-ordered merge, and CLI -resume (single-process paths)."""

import json
import os

import numpy as np

from urmap_tpu.dist import multihost as mh


def _write_fastq(path, n, seq="ACGTACGTAA"):
    # quality deliberately starts with '@' to stress record alignment
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"@read{i} extra\n{seq}\n+\n{'@' * len(seq)}\n")


def _records_in_range(path, start, end, prefix=b"@read"):
    out = []
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
    for line_no, line in enumerate(data.splitlines()):
        if line_no % 4 == 0:
            assert line.startswith(prefix), line
            out.append(line.split()[0][1:].decode())
    return out


def test_fastq_byte_ranges_partition(tmp_path):
    path = str(tmp_path / "r.fq")
    _write_fastq(path, 103)
    for n in (1, 2, 3, 8):
        ranges = mh.fastq_byte_ranges(path, n)
        assert ranges[0][0] == 0
        assert ranges[-1][1] == os.path.getsize(path)
        all_names = []
        for s, e in ranges:
            assert s <= e
            all_names += _records_in_range(path, s, e)
        assert all_names == [f"read{i}" for i in range(103)]


def test_paired_fastq_byte_ranges_cut_same_records(tmp_path, rng):
    # mate files with DIFFERENT record byte sizes (r2 longer reads +
    # '/2' suffixes) so proportional offsets are inexact and the
    # name search must do the aligning
    p1 = str(tmp_path / "r1.fq")
    p2 = str(tmp_path / "r2.fq")
    n_rec = 211
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(n_rec):
            s1 = "ACGT" * int(rng.integers(3, 10))
            s2 = "TTGCA" * int(rng.integers(6, 14))
            f1.write(f"@pair{i}/1 x\n{s1}\n+\n{'@' * len(s1)}\n")
            f2.write(f"@pair{i}/2 x\n{s2}\n+\n{'#' * len(s2)}\n")
    for n in (2, 3, 8):
        got = mh.paired_fastq_byte_ranges(p1, p2, n)
        assert got is not None
        r1, r2 = got
        assert r1[0][0] == 0 and r2[0][0] == 0
        assert r1[-1][1] == os.path.getsize(p1)
        assert r2[-1][1] == os.path.getsize(p2)
        all1 = all2 = ()
        for (s1, e1), (s2, e2) in zip(r1, r2):
            part1 = _records_in_range(p1, s1, e1, b"@pair")
            part2 = _records_in_range(p2, s2, e2, b"@pair")
            # same records in the same order on both sides of every cut
            assert [x.split("/")[0] for x in part1] \
                == [x.split("/")[0] for x in part2]
            all1 += tuple(part1)
            all2 += tuple(part2)
        assert len(all1) == n_rec and len(all2) == n_rec


def test_paired_byte_ranges_feed_reader(tmp_path, rng):
    """Each range pair must stream through FastqReader's paired desync
    guard cleanly and reproduce the full pairing."""
    from urmap_tpu.io.fastq import FastqReader

    p1 = str(tmp_path / "a1.fq")
    p2 = str(tmp_path / "a2.fq")
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(97):
            s = "ACGTAACC" * int(rng.integers(2, 6))
            f1.write(f"@m{i}/1\n{s}\n+\n{'@' * len(s)}\n")
            f2.write(f"@m{i}/2\n{s[::-1]}\n+\n{'!' * len(s)}\n")
    r1, r2 = mh.paired_fastq_byte_ranges(p1, p2, 3)
    names = []
    for br1, br2 in zip(r1, r2):
        reader = FastqReader(p1, p2, batch_size=16, byte_range=br1,
                             reverse_byte_range=br2)
        for fwd, rev in reader:
            names += fwd.names
    assert names == [f"m{i}" for i in range(97)]


def test_shard_writer_resume_and_merge(tmp_path):
    out = str(tmp_path / "out.sam")
    w = mh.ShardWriter(out, 0)
    w.append_batch(b"batch0\n", 10)
    w.append_batch(b"batch1\n", 10)
    # simulate a crash mid-append: bytes written but watermark not updated
    with open(w.path, "ab") as f:
        f.write(b"partial garbage")
    w.close()

    w2 = mh.ShardWriter(out, 0, resume=True)
    assert w2.skip_batches == 2
    assert w2.wm.reads == 20
    w2.append_batch(b"batch2\n", 10)
    w2.close()
    # second (empty) shard for rank 1
    mh.ShardWriter(out, 1).close()

    mh.merge_shards(out, 2, b"@HD\tVN:1.6\n")
    content = open(out, "rb").read()
    assert content == b"@HD\tVN:1.6\nbatch0\nbatch1\nbatch2\n"
    assert not os.path.exists(out + ".shard0")


def test_cli_resume_single_end(rng, tmp_path):
    from tests.utils import make_seqdb, plant_read, write_fastq
    from urmap_tpu.cli import main
    from urmap_tpu.index.build import build_index
    from urmap_tpu.config import IndexConfig

    db = make_seqdb(rng, [60_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    reads = [plant_read(rng, db, length=90) for _ in range(40)]
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    sam = str(tmp_path / "out.sam")

    main(["-map", fq, "-ufi", ufi, "-samout", sam, "-batch", "16",
          "-maxreadlen", "96", "-quiet"])
    full = sorted(l for l in open(sam) if not l.startswith("@"))
    assert len(full) == 40

    # simulate an interrupted run: shard exists with 1 committed batch
    w = mh.ShardWriter(sam, 0)
    lines = full  # reuse mapped records? no — write a fake first batch
    w.append_batch(b"FAKE\n", 16)
    w.close()
    main(["-map", fq, "-ufi", ufi, "-samout", sam, "-batch", "16",
          "-maxreadlen", "96", "-quiet", "-resume"])
    out_lines = [l for l in open(sam) if not l.startswith("@")]
    # first batch (16 reads) replaced by the FAKE marker, rest mapped
    assert out_lines[0] == "FAKE\n"
    assert len(out_lines) == 1 + 24
