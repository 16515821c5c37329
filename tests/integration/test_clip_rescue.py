"""Clip rescue lane (MapConfig.clip_rescue, default on).

Adapter/chimeric-tail reads score below min_score_frac under the full-
read semi-global DP and used to die UNMAPPED unless -endclip was set
(round-2 verdict missing item 5). The rescue lane re-runs ONLY the
would-be-unmapped reads through the end-clip DP, so they map soft-
clipped while every normally-mapping read stays bit-identical to the
no-clip semantics.
"""

import numpy as np

from tests.utils import make_seqdb, plant_read
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.map.cigar import cigars_nm_fast
from urmap_tpu.map.pipeline import Mapper, revcomp_strand_codes


def _adapter_reads(rng, db, n, L=150, tail=60):
    """Genome prefix + random adapter tail: unmappable full-length at
    min_score_frac 0.4 (score ≈ (L−tail) − 2·tail·0.75 < 0.4L), mappable
    clipped."""
    reads, truth = [], []
    for _ in range(n):
        r = plant_read(rng, db, length=L - tail, strand=0)
        ad = rng.integers(0, 4, size=tail).astype(np.uint8)
        reads.append(np.concatenate([r.codes, ad]))
        truth.append(r.gpos)
    return np.stack(reads), np.asarray(truth)


def test_clip_rescue_maps_adapter_tails(rng):
    db = make_seqdb(rng, [400_000])
    index = build_index(db, IndexConfig(slot_bits=17), backend="host")
    L = 150
    mcfg = MapConfig(max_read_len=L, batch_size=64)

    n_ad, n_ok, n_junk = 40, 40, 16
    ad, ad_truth = _adapter_reads(rng, db, n_ad, L)
    normal = [plant_read(rng, db, length=L, n_snps=2) for _ in range(n_ok)]
    junk = rng.integers(0, 4, size=(n_junk, L)).astype(np.uint8)
    codes = np.concatenate([ad, np.stack([r.codes for r in normal]), junk])
    lengths = np.full(len(codes), L, np.int32)

    off = Mapper(index, MapConfig(max_read_len=L, batch_size=64,
                                  clip_rescue=False))
    on = Mapper(index, mcfg)
    r_off = off.map_codes(codes, lengths)
    r_on = on.map_codes(codes, lengths)

    # adapter reads: mostly dead without the lane (an occasional random
    # tail scores by luck), all mapped at the planted locus with it
    dead = ~r_off.mapped[:n_ad]
    assert int(dead.sum()) >= n_ad - 8, int(dead.sum())
    got = (r_on.pos[:n_ad] == ad_truth) & r_on.mapped[:n_ad]
    assert int(got.sum()) >= n_ad - 2, int(got.sum())
    assert int((r_on.clipped[:n_ad] & dead).sum()) >= int(dead.sum()) - 2

    # normally-mapping reads: bit-identical to the lane being off
    sl = slice(n_ad, n_ad + n_ok)
    for f in ("mapped", "pos", "strand", "score", "second", "mapq",
              "gapped", "ungapped"):
        np.testing.assert_array_equal(getattr(r_on, f)[sl],
                                      getattr(r_off, f)[sl], err_msg=f)
    assert not r_on.clipped[sl].any()

    # junk stays unmapped (a random clipped segment can't reach
    # min_score_frac)
    assert int(r_on.mapped[n_ad + n_ok:].sum()) == 0

    # CIGARs: clip-rescued rows traceback in clip mode, carry S ops,
    # and consume exactly the read length
    strand_codes = revcomp_strand_codes(codes, r_on)
    cigs, nms, _spans = cigars_nm_fast(
        db.codes, strand_codes, r_on, ScoreConfig(),
        clip_rows=np.asarray(r_on.clipped))
    import re

    n_checked = 0
    for i in range(n_ad):
        if not (r_on.mapped[i] and r_on.clipped[i]):
            continue  # the lucky few map unclipped (gappy full-read)
        n_checked += 1
        assert "S" in cigs[i], cigs[i]
        consumed = sum(int(m[0]) for m in
                       re.findall(r"(\d+)([MIS])", cigs[i]))
        assert consumed == L, (cigs[i], consumed)
    assert n_checked >= n_ad - 8


def test_clip_rescue_zero_rounds_on_clean_batches(rng):
    """A clean batch must produce identical output with the lane on/off
    (the while_loop runs zero rounds — no read is below threshold)."""
    db = make_seqdb(rng, [200_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    reads = [plant_read(rng, db, length=120, n_snps=1) for _ in range(64)]
    codes = np.stack([r.codes for r in reads])
    lengths = np.full(64, 120, np.int32)
    a = Mapper(index, MapConfig(max_read_len=120, batch_size=64,
                                clip_rescue=False)).map_codes(codes, lengths)
    b = Mapper(index, MapConfig(max_read_len=120,
                                batch_size=64)).map_codes(codes, lengths)
    for f in ("mapped", "pos", "score", "mapq", "gapped"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
    assert not b.clipped.any()


def test_endclip_disables_rescue_lane(rng):
    """-endclip (clip-everything) and the rescue lane must not stack:
    with end_clip=True the lane is off (every DP is already clip-mode)
    and clipped stays False — the global clip_open drives the host
    traceback instead."""
    db = make_seqdb(rng, [300_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    L = 150
    ad, ad_truth = _adapter_reads(rng, db, 24, L)
    lengths = np.full(24, L, np.int32)
    res = Mapper(index, MapConfig(max_read_len=L, batch_size=32,
                                  end_clip=True)).map_codes(ad, lengths)
    got = (res.pos == ad_truth) & res.mapped
    assert int(got.sum()) >= 22
    assert not res.clipped.any()


def test_resume_with_mesh(rng, tmp_path):
    """-resume composes with -mesh: rerunning after completion must
    skip all committed batches and leave the output intact."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from tests.utils import write_fastq
    from urmap_tpu.cli import main

    db = make_seqdb(rng, [200_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    index.save(str(tmp_path / "g.ufi"))
    reads = [plant_read(rng, db, length=120) for _ in range(200)]
    write_fastq(str(tmp_path / "r.fq"), reads)
    args = ["-map", str(tmp_path / "r.fq"), "-ufi", str(tmp_path / "g.ufi"),
            "-samout", str(tmp_path / "out.sam"), "-batch", "64",
            "-maxreadlen", "120", "-quiet", "-mesh", "2x4"]
    assert main(args) == 0
    first = sorted(l for l in open(tmp_path / "out.sam")
                   if not l.startswith("@"))
    assert len(first) == 200
    # rerun with -resume: watermark says everything is committed
    assert main(args + ["-resume"]) == 0
    again = sorted(l for l in open(tmp_path / "out.sam")
                   if not l.startswith("@"))
    assert again == first
