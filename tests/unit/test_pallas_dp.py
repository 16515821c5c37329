"""Pallas banded-DP kernel vs the jnp reference (interpret mode on CPU).

The kernel must be bit-identical to map.dp.banded_semiglobal — same
packed (score, d0) tie-breaks — since both are validated against the
exhaustive oracle.
"""

import numpy as np
import pytest

from tests.utils import make_seqdb, plant_read
from urmap_tpu.config import ScoreConfig
from urmap_tpu.kernels.banded_dp import banded_semiglobal_pallas
from urmap_tpu.map.dp import banded_semiglobal


@pytest.mark.parametrize("hw", [4, 16])
def test_pallas_matches_jnp(rng, hw):
    import jax.numpy as jnp

    db = make_seqdb(rng, [20_000])
    sc = ScoreConfig()
    L = 80
    N = 64
    cands = []
    reads = np.full((N, L), 5, np.uint8)
    lengths = np.zeros(N, np.int32)
    for i in range(N):
        kind = i % 4
        r = plant_read(rng, db, length=L,
                       n_snps=int(rng.integers(0, 5)) if kind else 0,
                       ins=(2 if kind == 2 else 0),
                       dels=(3 if kind == 3 else 0),
                       strand=0)
        # candidate start offset jittered within the band
        cands.append(r.gpos + int(rng.integers(-hw // 2, hw // 2 + 1)))
        reads[i] = r.codes
        lengths[i] = L
    genome = jnp.asarray(db.codes)
    cand = jnp.asarray(np.array(cands, np.int32))
    reads_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lengths)

    s_ref, d0_ref, ung_ref, sp_ref = banded_semiglobal(
        genome, cand, reads_j, lens_j, hw=hw, sc=sc)
    s_k, d0_k, ung_k, sp_k = banded_semiglobal_pallas(
        genome, cand, reads_j, lens_j, hw=hw, sc=sc, block_r=128,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_k))
    np.testing.assert_array_equal(np.asarray(d0_ref), np.asarray(d0_k))
    np.testing.assert_array_equal(np.asarray(ung_ref), np.asarray(ung_k))
    np.testing.assert_array_equal(np.asarray(sp_ref), np.asarray(sp_k))


def test_pallas_zero_length_rows(rng):
    import jax.numpy as jnp

    db = make_seqdb(rng, [5_000])
    sc = ScoreConfig()
    genome = jnp.asarray(db.codes)
    reads = jnp.asarray(np.full((8, 40), 5, np.uint8))
    lens = jnp.asarray(np.zeros(8, np.int32))
    cand = jnp.asarray(np.full(8, 100, np.int32))
    s_ref, d0_ref, _, _ = banded_semiglobal(genome, cand, reads, lens,
                                            hw=8, sc=sc)
    s_k, d0_k, _, _ = banded_semiglobal_pallas(genome, cand, reads, lens,
                                               hw=8, sc=sc, block_r=128,
                                               interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_k))
    np.testing.assert_array_equal(np.asarray(d0_ref), np.asarray(d0_k))


def test_in_kernel_ungapped_matches_mismatch_counts(rng):
    """The kernel's 4th output (in-kernel straight-diagonal rescore,
    round-4 shave) must equal banded_packed's mismatch_counts-derived
    ungapped at POS = cand + d0 — the exact value the jnp fallback path
    computes — for in-genome candidates (the only ones the pipeline
    consumes: top_cand is clipped before DP)."""
    import jax.numpy as jnp

    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.kernels.banded_dp import pallas_from_windows
    from urmap_tpu.map.dp import banded_from_windows

    db = make_seqdb(rng, [20_000])
    sc = ScoreConfig()
    hw, L, N = 16, 96, 96
    ginter, base_off = gpk.pack_genome(np.asarray(db.codes))
    ginter = jnp.asarray(ginter)
    reads = np.full((N, L), 5, np.uint8)
    lengths = np.zeros(N, np.int32)
    cands = []
    for i in range(N):
        kind = i % 4
        r = plant_read(rng, db, length=L,
                       n_snps=int(rng.integers(0, 6)) if kind else 0,
                       ins=(2 if kind == 2 else 0),
                       dels=(3 if kind == 3 else 0), strand=0)
        cands.append(r.gpos + int(rng.integers(-hw // 2, hw // 2 + 1)))
        reads[i] = r.codes
        lengths[i] = int(rng.integers(L - 20, L + 1))
    cand = jnp.asarray(np.array(cands, np.int32))
    reads_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lengths)
    rp, rn = gpk.pack_reads(reads_j, lens_j, -(-L // 16))

    wlen = L + 2 * hw
    windows = gpk.gather_codes(ginter, base_off, cand - hw, wlen)
    s_k, d0_k, d1_k, ung_k = pallas_from_windows(
        windows, reads_j, lens_j, hw=hw, sc=sc, block_r=128,
        interpret=True)
    s_j, d0_j, _ = banded_from_windows(windows, reads_j, lens_j,
                                       hw=hw, sc=sc)
    np.testing.assert_array_equal(np.asarray(s_k), np.asarray(s_j))
    np.testing.assert_array_equal(np.asarray(d0_k), np.asarray(d0_j))
    mm = gpk.mismatch_counts(ginter, base_off, cand + d0_j, rp, rn, lens_j)
    want = ((lens_j - mm) * sc.match + mm * sc.mismatch).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(ung_k), np.asarray(want))
