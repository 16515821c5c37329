"""Pallas vote kernel vs the jnp reference (interpret mode on CPU).

kernels/vote.py must be bit-identical to map.seed.vote_top_candidates:
same ascending sort, same run-length votes, same top-V tie-breaks
(equal vote counts -> lowest sorted position first).
"""

import numpy as np
import pytest

from urmap_tpu.kernels.vote import supports, vote_pallas
from urmap_tpu.map.seed import SENTINEL, vote_top_candidates


def _compare(cand, v):
    import jax.numpy as jnp

    c = jnp.asarray(cand)
    tc_ref, tv_ref = vote_top_candidates(c, v=v)
    tc_k, tv_k = vote_pallas(c, v=v, block_n=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(tv_ref), np.asarray(tv_k))
    np.testing.assert_array_equal(np.asarray(tc_ref), np.asarray(tc_k))


@pytest.mark.parametrize("m", [128, 64])
def test_pallas_vote_matches_jnp(rng, m):
    N, v = 160, 8            # > block_n: multiple grid blocks
    # clustered candidates: heavy vote runs plus SENTINEL-heavy rows
    base = rng.integers(0, 5000, size=(N, 8))
    cand = base[:, rng.integers(0, 8, size=m)] + rng.integers(
        0, 2, size=(N, m))
    cand = cand.astype(np.int32)
    sent = rng.random((N, m)) < 0.5
    cand[sent] = SENTINEL
    cand[:4] = SENTINEL      # all-invalid rows
    cand[4:6] = 77           # single run covering every lane
    _compare(cand, v)


def test_pallas_vote_tie_order(rng):
    # two distinct runs with EQUAL vote counts: top_k order must match
    N, m, v = 64, 128, 4
    cand = np.full((N, m), SENTINEL, np.int32)
    for i in range(N):
        a, b = sorted(rng.integers(0, 10000, size=2))
        cand[i, :5] = a
        cand[i, 5:10] = b + 1
    _compare(cand, v)


def test_pallas_vote_negative_candidates(rng):
    # biased device coordinates are routinely negative (seed.POS_BIAS)
    N, m, v = 64, 128, 8
    cand = rng.integers(-(1 << 31) + (1 << 16), 1 << 28,
                        size=(N, m)).astype(np.int32)
    cand[rng.random((N, m)) < 0.3] = SENTINEL
    _compare(cand, v)


def test_supports_gates():
    assert supports(128) and supports(64) and supports(16)
    assert not supports(96)      # not a power of two
    assert not supports(256)     # wider than the lane axis
