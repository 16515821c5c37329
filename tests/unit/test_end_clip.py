"""End-clipped (X-drop-analog) alignment: device DP, Pallas twin, host
tracebacks, and the mapping pipeline (VERDICT round-1 item 4)."""

import numpy as np
import pytest

from tests.oracle.oracle import clipped_scan
from tests.utils import make_seqdb, plant_read, random_seq
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.io.fasta import SeqDB
from urmap_tpu.map.cigar import traceback, traceback_batch_native
from urmap_tpu.map.dp import banded_semiglobal
from urmap_tpu.map.pipeline import Mapper

CLIP = -5


def _window_problem(rng, n=64, L=80, hw=12):
    """Random genome + reads with corrupted prefixes/suffixes, candidate
    starts at the truth."""
    db = make_seqdb(rng, [20_000])
    genome = db.codes
    starts = rng.integers(100, 19_000, size=n)
    reads = np.empty((n, L), np.uint8)
    for i, s in enumerate(starts):
        r = genome[s : s + L].copy()
        mode = i % 4
        if mode == 1:       # garbage tail
            t = int(rng.integers(8, 30))
            r[L - t:] = rng.integers(0, 4, size=t)
        elif mode == 2:     # garbage head
            t = int(rng.integers(8, 30))
            r[:t] = rng.integers(0, 4, size=t)
        elif mode == 3:     # few SNPs
            for j in rng.choice(L, size=3, replace=False):
                r[j] = (r[j] + 1) % 4
        reads[i] = r
    lengths = np.full(n, L, np.int32)
    return genome, starts.astype(np.int32), reads, lengths, hw


def test_clip_dp_matches_oracle_scan(rng):
    """Device clipped DP score == exhaustive oracle clipped scan
    (restricted to the window) on corrupted-end reads."""
    import jax.numpy as jnp

    sc = ScoreConfig()
    genome, starts, reads, lengths, hw = _window_problem(rng)
    scores, d0, _, _ = banded_semiglobal(
        jnp.asarray(genome), jnp.asarray(starts), jnp.asarray(reads),
        jnp.asarray(lengths), hw=hw, sc=sc, clip_open=CLIP)
    scores = np.asarray(scores)
    d0 = np.asarray(d0)
    for i in range(len(starts)):
        lo = int(starts[i]) - hw
        hi = int(starts[i]) + reads.shape[1] + hw
        osc, ost = clipped_scan(genome[lo:hi], reads[i], sc, CLIP)
        want = int(osc.max())
        assert scores[i] == want, (i, scores[i], want)
        # POS consistency: host traceback at POS reproduces the score
        pos = int(starts[i]) + int(d0[i])
        cig, tb_score, nm = traceback(genome, reads[i], pos, sc,
                                      clip_open=CLIP)
        assert tb_score >= scores[i], (i, tb_score, scores[i])


def test_clip_pallas_matches_jnp(rng):
    """Pallas kernel (interpret mode) == jnp clipped DP, bit-identical
    packed results."""
    import jax.numpy as jnp

    from urmap_tpu.kernels.banded_dp import pallas_from_windows
    from urmap_tpu.map.dp import banded_from_windows

    sc = ScoreConfig()
    genome, starts, reads, lengths, hw = _window_problem(rng, n=32)
    wlen = reads.shape[1] + 2 * hw
    widx = starts[:, None] - hw + np.arange(wlen)[None, :]
    windows = genome[np.clip(widx, 0, len(genome) - 1)]
    s_j, d_j, e_j = banded_from_windows(
        jnp.asarray(windows), jnp.asarray(reads), jnp.asarray(lengths),
        hw=hw, sc=sc, clip_open=CLIP)
    s_p, d_p, e_p, _u = pallas_from_windows(
        jnp.asarray(windows), jnp.asarray(reads), jnp.asarray(lengths),
        hw=hw, sc=sc, clip_open=CLIP, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_j), np.asarray(s_p))
    np.testing.assert_array_equal(np.asarray(d_j), np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(e_j), np.asarray(e_p))


def test_clip_native_traceback_matches_python(rng):
    """C++ clipped traceback == python traceback, byte-identical."""
    from urmap_tpu.io import native

    if native.lib() is None:
        pytest.skip("native codecs unavailable")
    sc = ScoreConfig()
    genome, starts, reads, lengths, hw = _window_problem(rng)
    nat = traceback_batch_native(genome, starts.astype(np.int64), reads,
                                 lengths, sc, clip_open=CLIP)
    assert nat is not None
    cigs, nms, scores, spans = nat
    for i in range(len(starts)):
        c, s, e = traceback(genome, reads[i], int(starts[i]), sc,
                            clip_open=CLIP)
        assert cigs[i] == c, (i, cigs[i], c)
        assert scores[i] == s and nms[i] == e, i


def test_pipeline_end_clip_maps_adapter_tails(rng):
    """Planted reads with 40-base garbage tails: (mostly) unmapped
    without -endclip, all mapped soft-clipped at the truth with it."""
    db = make_seqdb(rng, [100_000])
    index = build_index(db, IndexConfig(slot_bits=16))
    L, tail = 100, 40
    n = 24
    codes = np.empty((n, L), np.uint8)
    truth = np.empty(n, np.int64)
    for i in range(n):
        r = plant_read(rng, db, length=L, strand=0, n_snps=0)
        c = r.codes.copy()
        c[L - tail:] = (c[L - tail:] + 1 + rng.integers(0, 3, size=tail)) % 4
        codes[i] = c
        truth[i] = r.gpos
    lengths = np.full(n, L, np.int32)

    # clip_rescue=False isolates the -endclip semantics this test is
    # about (the default clip-rescue lane ALSO maps adapter tails —
    # tests/integration/test_clip_rescue.py covers that)
    plain = Mapper(index, MapConfig(max_read_len=L, batch_size=n,
                                    min_score_frac=0.4,
                                    clip_rescue=False))
    res0 = plain.map_codes(codes, lengths)
    clip = Mapper(index, MapConfig(max_read_len=L, batch_size=n,
                                   min_score_frac=0.4, end_clip=True))
    res1 = clip.map_codes(codes, lengths)

    # a 40-base corrupt tail scores below min_score_frac without
    # clipping (the DP can still mine a few points from the garbage via
    # gap placement, so allow a small mapped remainder)
    assert int(res0.mapped.sum()) <= n // 3
    assert int(res1.mapped.sum()) >= n - 2
    ok = (res1.pos == truth) & res1.mapped
    assert int(ok.sum()) >= n - 2
    # CIGARs of clipped winners end in S
    from urmap_tpu.map.cigar import cigars_nm_blob

    blob, off, nm, span = cigars_nm_blob(db.codes, codes, res1, clip.sc,
                                         clip_open=clip.sc.clip_open)
    n_clipped = 0
    for i in range(n):
        cg = blob[off[i]:off[i + 1]].decode()
        if res1.mapped[i] and cg.endswith("S"):
            n_clipped += 1
            assert nm[i] <= 6, (i, cg, nm[i])
    assert n_clipped >= n - 4
