"""Real 2-process multi-host mapping through the CLI (CPU backend).

Spawns two coordinated processes (jax.distributed over localhost) that
run the SAME -map command; batches round-robin by rank, each rank writes
a watermarked shard, rank 0 merges. The merged SAM must equal the
single-process output record-for-record (order within the file may
differ — batches interleave by rank — so compare canonically).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_read, write_fastq
from urmap_tpu.config import IndexConfig
from urmap_tpu.index.build import build_index

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from urmap_tpu.cli import main
sys.exit(main({argv!r}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("URMAP_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_process_map_equals_single(rng, tmp_path):
    db = make_seqdb(rng, [100_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    reads = [plant_read(rng, db, length=100,
                        n_snps=int(rng.integers(0, 3)))
             for _ in range(100)]
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    def run_map(out, extra_env=None):
        argv = ["-map", fq, "-ufi", ufi, "-samout", out,
                "-batch", "16", "-maxreadlen", "120", "-quiet"]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_urmap_tpu"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
        env.pop("XLA_FLAGS", None)
        # the axon sitecustomize registers a TPU plugin (and touches the
        # backend) at interpreter start; disable it in workers
        env.pop("PALLAS_AXON_POOL_IPS", None)
        if extra_env:
            env.update(extra_env)
        return subprocess.Popen(
            [sys.executable, "-c",
             _WORKER.format(repo=repo, argv=argv)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    # single-process reference
    single = str(tmp_path / "single.sam")
    p = run_map(single)
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()[-2000:]

    # two coordinated processes
    multi = str(tmp_path / "multi.sam")
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(run_map(multi, {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }))
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    def canon(path):
        return sorted(l for l in open(path) if not l.startswith("@"))

    a, b = canon(single), canon(multi)
    assert len(a) == len(b) == 100
    assert a == b


@pytest.mark.skipif(os.environ.get("URMAP_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_process_paired_map_equals_single(rng, tmp_path):
    """Paired-end 2-process run over byte-range-split mate files: merged
    SAM must equal the single-process output canonically."""
    from tests.utils import plant_pair

    db = make_seqdb(rng, [100_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    p1 = str(tmp_path / "r1.fq")
    p2 = str(tmp_path / "r2.fq")
    pairs = [plant_pair(rng, db, length=100) for _ in range(80)]
    write_fastq(p1, [a for a, _, _ in pairs])
    write_fastq(p2, [b for _, b, _ in pairs])

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    def run_map(out, extra_env=None):
        argv = ["-map", p1, "-reverse", p2, "-ufi", ufi, "-samout", out,
                "-batch", "32", "-maxreadlen", "120", "-quiet"]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_urmap_tpu"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
        env.pop("XLA_FLAGS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        if extra_env:
            env.update(extra_env)
        return subprocess.Popen(
            [sys.executable, "-c",
             _WORKER.format(repo=repo, argv=argv)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    single = str(tmp_path / "single.sam")
    p = run_map(single)
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()[-2000:]

    multi = str(tmp_path / "multi.sam")
    port = _free_port()
    procs = [run_map(multi, {
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(pid),
    }) for pid in range(2)]
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    def canon(path):
        return sorted(l for l in open(path) if not l.startswith("@"))

    a, b = canon(single), canon(multi)
    assert len(a) == len(b) == 160
    assert a == b


def test_byte_range_reader_partitions_input(rng, tmp_path):
    """Per-host byte-range feeding: each range parses a disjoint,
    contiguous slice whose concatenation equals the full file, for both
    the native and the pure-Python reader."""
    from urmap_tpu.dist.multihost import fastq_byte_ranges
    from urmap_tpu.io.fastq import FastqReader

    reads = [plant_read(rng, make_seqdb(rng, [5_000]), length=60)
             for _ in range(157)]
    fq = str(tmp_path / "br.fq")
    write_fastq(fq, reads)

    full = [n for b in FastqReader(fq, batch_size=32, max_read_len=80)
            for n in b.names]
    for nproc in (2, 3, 5):
        ranges = fastq_byte_ranges(fq, nproc)
        assert ranges[0][0] == 0 and ranges[-1][1] == os.path.getsize(fq)
        for native in (True, False):
            got = []
            sizes = []
            for r in ranges:
                names = [n for b in FastqReader(
                    fq, batch_size=32, max_read_len=80, native=native,
                    byte_range=r) for n in b.names]
                got.extend(names)
                sizes.append(len(names))
            assert got == full, (nproc, native)
            # balanced: every worker parses ~1/nproc of the records
            assert max(sizes) - min(sizes) <= 2, (nproc, native, sizes)
