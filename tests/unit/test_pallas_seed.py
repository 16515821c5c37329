"""Pallas word-plane seed kernel vs the jnp reference (interpret mode).

kernels/seed_slots.py must be bit-identical to map.seed.
extract_seed_slots_words (which itself is parity-tested against the
byte extractor in test_seed_words.py): same MXU word expansion, same
funnels and lane reversal, same hash and validity rule.
"""

import numpy as np
import pytest

from urmap_tpu import genome_pack as gpk
from urmap_tpu.kernels.seed_slots import seed_slots_words_pallas, supports
from urmap_tpu.map.seed import extract_seed_slots_words


def _compare(codes, lengths, L, k, q, slot_bits):
    import jax.numpy as jnp

    NW = -(-L // 16)
    cj, lj = jnp.asarray(codes), jnp.asarray(lengths)
    rp, rn = gpk.pack_reads(cj, lj, NW)
    s_ref, o_ref, v_ref = extract_seed_slots_words(
        rp, rn, lj, L, k=k, q=q, slot_bits=slot_bits)
    s_k, o_k, v_k = seed_slots_words_pallas(
        rp, rn, lj, L, k=k, q=q, slot_bits=slot_bits, block_r=128,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_k))
    v_ref = np.asarray(v_ref)
    np.testing.assert_array_equal(v_ref, np.asarray(v_k))
    np.testing.assert_array_equal(np.asarray(s_ref)[v_ref],
                                  np.asarray(s_k)[v_ref])


@pytest.mark.parametrize("L,k,q,slot_bits", [
    (150, 24, 8, 25),       # production shape (bench / GRCh38 28-30)
    (160, 24, 8, 30),       # max slot_bits the flag bit allows
    (80, 16, 8, 20),        # k == 16 boundary
    (150, 32, 5, 24),       # k == 32 (two full words), odd q
    (100, 20, 6, 22),       # k % 4 != 0 (byte kernel couldn't)
])
def test_pallas_seed_matches_jnp(rng, L, k, q, slot_bits):
    assert supports(k, slot_bits)
    N = 192                  # > block_r: exercises multiple grid blocks
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    codes[rng.random((N, L)) < 0.02] = 5
    lengths = rng.integers(0, L + 1, size=N).astype(np.int32)
    lengths[:8] = L
    lengths[8:12] = 0        # padded rows (mapper pad convention)
    lengths[12:16] = k - 1   # shorter than a word -> all-invalid
    codes[np.arange(L)[None, :] >= lengths[:, None]] = 5
    _compare(codes, lengths, L, k, q, slot_bits)


def test_pallas_seed_all_n_reads(rng):
    N, L = 64, 150
    codes = np.full((N, L), 5, np.uint8)
    lengths = np.full(N, L, np.int32)
    _compare(codes, lengths, L, 24, 8, 25)


def test_supports_gates():
    assert supports(24, 30) and supports(20, 25) and supports(32, 25)
    assert not supports(24, 31)   # flag bit needs bit 31 free
    assert not supports(33, 25)   # k > two words
