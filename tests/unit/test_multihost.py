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


def _records_in_range(path, start, end):
    out = []
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
    for line_no, line in enumerate(data.splitlines()):
        if line_no % 4 == 0:
            assert line.startswith(b"@read"), line
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
