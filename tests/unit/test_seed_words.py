"""Word-plane seed extraction vs the byte-code reference.

map.seed.extract_seed_slots_words must be bit-identical to
extract_seed_slots given the pack_reads planes of the same codes —
slots AND validity, across k regimes and length edges.
"""

import numpy as np
import pytest

from urmap_tpu import genome_pack as gpk
from urmap_tpu.map.seed import extract_seed_slots, extract_seed_slots_words


@pytest.mark.parametrize("L,k,q,slot_bits", [
    (150, 24, 8, 25),       # production shape
    (160, 24, 8, 30),
    (80, 16, 8, 20),        # k == 16 boundary
    (150, 32, 6, 24),       # k == 32 (full two words)
    (100, 20, 5, 22),       # k in (16, 32), k % 4 != 0
])
def test_words_twin_matches_bytes(rng, L, k, q, slot_bits):
    import jax.numpy as jnp

    N = 96
    NW = -(-L // 16)
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    codes[rng.random((N, L)) < 0.03] = 5
    lengths = rng.integers(0, L + 1, size=N).astype(np.int32)
    lengths[:4] = [L, 0, k - 1, k]
    codes[np.arange(L)[None, :] >= lengths[:, None]] = 5

    cj, lj = jnp.asarray(codes), jnp.asarray(lengths)
    s_ref, o_ref, v_ref = extract_seed_slots(cj, lj, k=k, q=q,
                                             slot_bits=slot_bits)
    rp, rn = gpk.pack_reads(cj, lj, NW)
    s_w, o_w, v_w = extract_seed_slots_words(rp, rn, lj, L, k=k, q=q,
                                             slot_bits=slot_bits)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_w))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_w))
    vm = np.asarray(v_ref)
    np.testing.assert_array_equal(np.asarray(s_ref)[vm],
                                  np.asarray(s_w)[vm])


def test_words_twin_from_upload_view(rng):
    """End-to-end word front door: upload-packed bytes -> upload-view
    words -> seeds, equal to the byte path on the unpacked codes."""
    import jax.numpy as jnp

    N, L, k, q, sb = 64, 150, 24, 8, 25
    NW = -(-L // 16)
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
    codes[np.arange(L)[None, :] >= lengths[:, None]] = 5
    pk, nm = gpk.pack_read_codes_host(codes)
    rp, rn = gpk.read_words_from_upload(
        jnp.asarray(pk), jnp.asarray(nm), jnp.asarray(lengths), NW)
    s_w, o_w, v_w = extract_seed_slots_words(rp, rn, jnp.asarray(lengths),
                                             L, k=k, q=q, slot_bits=sb)
    s_ref, o_ref, v_ref = extract_seed_slots(
        jnp.asarray(codes), jnp.asarray(lengths), k=k, q=q, slot_bits=sb)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_w))
    vm = np.asarray(v_ref)
    np.testing.assert_array_equal(np.asarray(s_ref)[vm],
                                  np.asarray(s_w)[vm])
