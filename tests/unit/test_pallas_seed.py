"""Pallas seed-slots kernel vs the jnp reference (interpret mode on CPU).

kernels/seed_slots.py must be bit-identical to map.seed.
extract_seed_slots: same grouped word extraction, same hash
(hashing.hash_words via int32 two's-complement), same offset clipping
and validity rule.
"""

import numpy as np
import pytest

from urmap_tpu.kernels.seed_slots import seed_slots_pallas, supports
from urmap_tpu.map.seed import extract_seed_slots


def _compare(reads, lengths, k, q, slot_bits):
    import jax.numpy as jnp

    reads_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lengths)
    s_ref, o_ref, v_ref = extract_seed_slots(
        reads_j, lens_j, k=k, q=q, slot_bits=slot_bits)
    s_k, o_k, v_k = seed_slots_pallas(
        reads_j, lens_j, k=k, q=q, slot_bits=slot_bits, block_r=128,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_k))
    # slots compare only where valid — the jnp twin leaves garbage words
    # at invalid offsets too, but identical garbage is not part of the
    # contract (downstream masks on valid)
    v_ref = np.asarray(v_ref)
    np.testing.assert_array_equal(v_ref, np.asarray(v_k))
    np.testing.assert_array_equal(np.asarray(s_ref)[v_ref],
                                  np.asarray(s_k)[v_ref])


@pytest.mark.parametrize("L,k,q,slot_bits", [
    (150, 24, 8, 25),       # production shape (bench / GRCh38 28-30)
    (160, 24, 8, 30),       # max slot_bits the flag bit allows
    (80, 16, 8, 20),        # k = lo_bases boundary
    (150, 24, 5, 24),       # q not a multiple of the sublane tile
])
def test_pallas_seed_matches_jnp(rng, L, k, q, slot_bits):
    assert supports(k, slot_bits)
    N = 192                  # > block_r to exercise multiple grid blocks
    reads = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    # sprinkle read-N (code 5): invalidates any window covering it
    nmask = rng.random((N, L)) < 0.02
    reads[nmask] = 5
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
    lengths[:8] = L          # full-length rows
    lengths[8:12] = 0        # padded rows (mapper pad convention)
    lengths[12:16] = k - 1   # shorter than a word -> all-invalid
    _compare(reads, lengths, k, q, slot_bits)


def test_pallas_seed_all_n_reads(rng):
    N, L = 64, 150
    reads = np.full((N, L), 5, np.uint8)
    lengths = np.full(N, L, np.int32)
    _compare(reads, lengths, 24, 8, 25)


def test_supports_gates():
    assert supports(24, 30)
    assert not supports(24, 31)   # flag bit needs bit 31 free
    assert not supports(22, 25)   # k % 4 != 0
    assert supports(32, 25)
    assert not supports(26, 25)   # (k - 16) % 4 != 0
