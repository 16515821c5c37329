"""Multi-host SPMD × index mesh: 2 coordinated processes × 4 virtual CPU
devices each = a GLOBAL 2×4 ("data", "index") mesh. Every process feeds
the same replicated batches; each formats and writes only the rows its
devices own (ShardedMapper.finish_batch_local); the rank-ordered shard
merge must reassemble a SAM canonical-equal to the single-process
single-device output. This is BASELINE.json config 4 ("index sharded
across hosts") as a real CLI flow.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_pair, plant_read, write_fastq
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


def _canon(path):
    return sorted(l for l in open(path) if not l.startswith("@"))


@pytest.mark.skipif(os.environ.get("URMAP_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_host_mesh_se_and_pe(rng, tmp_path):
    db = make_seqdb(rng, [150_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    ufi = str(tmp_path / "g.ufi")
    index.save(ufi)
    reads = [plant_read(rng, db, length=100,
                        n_snps=int(rng.integers(0, 3)))
             for _ in range(96)]
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    pairs = [plant_pair(rng, db, length=100) for _ in range(64)]
    fq1, fq2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    write_fastq(fq1, [a for a, _, _ in pairs], prefix="p")
    write_fastq(fq2, [b for _, b, _ in pairs], prefix="p")

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    def run_map(argv, extra_env=None):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_urmap_tpu"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        if extra_env:
            env.update(extra_env)
        return subprocess.Popen(
            [sys.executable, "-c",
             _WORKER.format(repo=repo, argv=argv)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    def coordinated(argv_base, out):
        port = _free_port()
        procs = [run_map(argv_base + ["-samout", out], {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }) for pid in range(2)]
        for p in procs:
            _, err = p.communicate(timeout=900)
            assert p.returncode == 0, err.decode()[-3000:]

    # ---- SE ----
    base = ["-map", fq, "-ufi", ufi, "-batch", "32",
            "-maxreadlen", "120", "-quiet"]
    single = str(tmp_path / "single.sam")
    p = run_map(base + ["-samout", single])
    _, err = p.communicate(timeout=900)
    assert p.returncode == 0, err.decode()[-3000:]

    mesh_out = str(tmp_path / "mesh2x4.sam")
    coordinated(base + ["-mesh", "2x4"], mesh_out)
    a, b = _canon(single), _canon(mesh_out)
    assert len(a) == len(b) == 96
    assert a == b

    # ---- SE, psum route: outputs are REPLICATED over the "index"
    # axis, so every host holds every row — _addressable_rows must
    # dedup globally (round-3 advisor: per-process dedup made both
    # ranks emit the full batch → every QNAME appeared twice) ----
    psum_out = str(tmp_path / "mesh2x4_psum.sam")
    coordinated(base + ["-mesh", "2x4", "-route", "psum"], psum_out)
    bp = _canon(psum_out)
    assert len(bp) == 96
    assert a == bp

    # ---- PE ----
    base_pe = ["-map", fq1, "-reverse", fq2, "-ufi", ufi, "-batch", "32",
               "-maxreadlen", "120", "-quiet"]
    single_pe = str(tmp_path / "single_pe.sam")
    p = run_map(base_pe + ["-samout", single_pe])
    _, err = p.communicate(timeout=900)
    assert p.returncode == 0, err.decode()[-3000:]

    mesh_pe = str(tmp_path / "mesh2x4_pe.sam")
    coordinated(base_pe + ["-mesh", "2x4"], mesh_pe)
    a, b = _canon(single_pe), _canon(mesh_pe)
    assert len(a) == len(b) == 128
    assert a == b
    # proper pairs survived the multi-host path
    flags = [int(l.split("\t")[1]) for l in b]
    assert sum(1 for f in flags if f & 0x2) >= 120
