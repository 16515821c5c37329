"""Sharded mapping as a PRODUCT feature: the -mesh CLI flag must produce
canonical-equal SAM to the single-device path, SE and PE, on the
8-virtual-device CPU mesh (conftest.py) — SURVEY.md §2.13's rightmost
column / BASELINE.json config 4 ("index sharded across hosts").
"""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_pair, plant_read, write_fastq
from urmap_tpu.cli import main
from urmap_tpu.config import IndexConfig
from urmap_tpu.index.build import build_index


def _canon(path):
    with open(path) as f:
        return sorted(ln for ln in f if not ln.startswith("@"))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("shcli")
    db = make_seqdb(rng, [200_000, 80_000])
    idx = build_index(db, IndexConfig(slot_bits=17), backend="host")
    idx.save(str(d / "g.ufi"))
    se = [plant_read(rng, db, length=120,
                     n_snps=int(rng.integers(0, 3)),
                     ins=(2 if i % 7 == 0 else 0),
                     dels=(2 if i % 11 == 0 else 0))
          for i in range(300)]
    write_fastq(str(d / "se.fq"), se)
    pairs = [plant_pair(rng, db, length=120, frag=int(rng.integers(260, 700)),
                        n_snps=int(rng.integers(0, 3)),
                        snp_every=(15 if i % 9 == 0 else None))
             for i in range(200)]
    write_fastq(str(d / "r1.fq"), [p[0] for p in pairs], prefix="p")
    write_fastq(str(d / "r2.fq"), [p[1] for p in pairs], prefix="p")
    return d


def test_mesh_cli_se_matches_single(corpus):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    base = ["-ufi", str(corpus / "g.ufi"), "-quiet",
            "-batch", "128", "-map", str(corpus / "se.fq")]
    assert main(base + ["-samout", str(corpus / "se_single.sam")]) == 0
    assert main(base + ["-samout", str(corpus / "se_mesh.sam"),
                        "-mesh", "2x4"]) == 0
    assert _canon(corpus / "se_mesh.sam") == _canon(corpus / "se_single.sam")
    # the psum route too (both collectives stay product-supported)
    assert main(base + ["-samout", str(corpus / "se_psum.sam"),
                        "-mesh", "1x8", "-route", "psum"]) == 0
    assert _canon(corpus / "se_psum.sam") == _canon(corpus / "se_single.sam")


def test_mesh_cli_pe_matches_single(corpus):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    base = ["-ufi", str(corpus / "g.ufi"), "-quiet", "-batch", "128",
            "-map", str(corpus / "r1.fq"), "-reverse", str(corpus / "r2.fq")]
    assert main(base + ["-samout", str(corpus / "pe_single.sam")]) == 0
    assert main(base + ["-samout", str(corpus / "pe_mesh.sam"),
                        "-mesh", "2x4"]) == 0
    assert _canon(corpus / "pe_mesh.sam") == _canon(corpus / "pe_single.sam")
    # proper pairs actually present (not a trivially-unmapped file)
    flags = [int(ln.split("\t")[1]) for ln in _canon(corpus / "pe_mesh.sam")]
    assert sum(1 for f in flags if f & 0x2) >= 360  # ≥90% of 400 reads


def test_mesh_auto_small_index_stays_single(corpus, capsys):
    """-mesh auto on a small index: tables fit one device → single path
    (and the run still completes end-to-end)."""
    base = ["-ufi", str(corpus / "g.ufi"), "-batch", "128",
            "-map", str(corpus / "se.fq")]
    assert main(base + ["-samout", str(corpus / "se_auto.sam"),
                        "-mesh", "auto"]) == 0
    assert _canon(corpus / "se_auto.sam") == _canon(corpus / "se_single.sam")


def test_mesh_auto_engages_on_big_tables(corpus, monkeypatch):
    """-mesh auto with a tiny memory budget must engage the sharded path
    (the >HBM case can't be built in CI; the decision logic can)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    monkeypatch.setenv("URMAP_DEVICE_MEM_GB", "0.0001")
    base = ["-ufi", str(corpus / "g.ufi"), "-batch", "128",
            "-map", str(corpus / "se.fq")]
    assert main(base + ["-samout", str(corpus / "se_auto2.sam"),
                        "-mesh", "auto", "-quiet"]) == 0
    assert _canon(corpus / "se_auto2.sam") == _canon(corpus / "se_single.sam")


def test_sharded_paired_rescue_matches_single(corpus):
    """Mate rescue through the sharded step (rescue scans the replicated
    genome, only the seed gather crosses shards) — the snp_every=15 R2s
    are unseedable and only map via rescue."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    rec_single = _canon(corpus / "pe_single.sam")
    rec_mesh = _canon(corpus / "pe_mesh.sam")
    assert rec_single == rec_mesh
    # rescued mates exist in the corpus (flag 0x2 proper + high-SNP row)
    assert any("p9\t" in ln or ln.startswith("p9\t") for ln in rec_mesh)


def test_auto_batch_shrink_feeds_reader(corpus, monkeypatch, tmp_path):
    """The HBM auto-batch shrink must propagate to the FASTQ reader —
    with a tiny memory budget and >8192 reads, the run must complete
    (the round-3 review found the reader kept the unshrunk batch and
    tripped Mapper._pad_full's assert on the first full batch)."""
    rng = np.random.default_rng(9)
    db = make_seqdb(rng, [120_000])
    idx = build_index(db, IndexConfig(slot_bits=16), backend="host")
    idx.save(str(tmp_path / "g.ufi"))
    reads = [plant_read(rng, db, length=100) for _ in range(9000)]
    write_fastq(str(tmp_path / "many.fq"), reads)
    monkeypatch.setenv("URMAP_DEVICE_MEM_GB", "0.0001")
    # default batch 32768 shrinks to 8192 < 9000 reads → two batches
    assert main(["-map", str(tmp_path / "many.fq"),
                 "-ufi", str(tmp_path / "g.ufi"),
                 "-samout", str(tmp_path / "many.sam"),
                 "-maxreadlen", "120", "-quiet"]) == 0
    recs = _canon(tmp_path / "many.sam")
    assert len(recs) == 9000
