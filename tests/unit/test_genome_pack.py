"""Bit-parallel packed-genome helpers vs the byte-path reference."""

import numpy as np

from tests.utils import make_seqdb
from urmap_tpu import genome_pack as gp
from urmap_tpu.config import ScoreConfig


def _byte_mismatches(genome, starts, reads, lengths):
    """Reference: per-element byte comparison (same clip semantics as
    map.pipeline._ungapped_scores)."""
    G = genome.shape[0]
    L = reads.shape[1]
    idx = np.clip(starts[:, None] + np.arange(L)[None, :], 0, G - 1)
    g = genome[idx]
    in_read = np.arange(L)[None, :] < lengths[:, None]
    return np.sum(in_read & (g != reads), axis=1).astype(np.int32)


def test_mismatch_counts_match_byte_path(rng):
    import jax.numpy as jnp

    db = make_seqdb(rng, [5_000, 3_000])
    genome = db.codes
    G = genome.shape[0]
    N, L = 128, 100
    NW = -(-L // 16)
    starts = np.concatenate([
        rng.integers(0, G - L, size=N - 8),
        np.array([0, 1, 15, 16, 17, G - L, G - 20, G - 1]),
    ]).astype(np.int32)
    n = starts.shape[0]
    reads = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    # some real windows with few mismatches, some with N bases.
    # genome-N (code 4) must be re-coded as read-N (code 5): reads can
    # never contain code 4 (alphabet.py invariant).
    for i in range(0, n, 3):
        w = np.clip(starts[i], 0, G - L)
        frag = genome[w : w + L].copy()
        frag[frag >= 4] = 5
        frag[rng.integers(0, L)] = 5  # read N
        reads[i] = frag
    lengths = rng.integers(20, L + 1, size=n).astype(np.int32)

    ginter, off = gp.pack_genome(genome)
    rp, rn = gp.pack_reads(jnp.asarray(reads), jnp.asarray(lengths), NW)
    got = np.asarray(gp.mismatch_counts(
        jnp.asarray(ginter), off,
        jnp.asarray(starts), rp, rn, jnp.asarray(lengths)))
    want = _byte_mismatches(genome, starts, reads, lengths)
    np.testing.assert_array_equal(got, want)


def test_gather_codes_matches_bytes(rng):
    import jax.numpy as jnp

    db = make_seqdb(rng, [4_000])
    genome = db.codes
    G = genome.shape[0]
    L = 182
    starts = np.array([0, 1, 5, 16, 33, 100, G - L, G - 50, G - 1, 777],
                      np.int32)
    ginter, off = gp.pack_genome(genome)
    got = np.asarray(gp.gather_codes(
        jnp.asarray(ginter), off, jnp.asarray(starts), L))
    idx = np.clip(starts[:, None] + np.arange(L)[None, :], 0, G - 1)
    want = genome[idx]
    # beyond-end reads differ in *which* N code they see (guard vs
    # clipped separator), but both are N for comparison purposes;
    # normalize codes >= 4 to 4
    np.testing.assert_array_equal(np.minimum(got, 4), np.minimum(want, 4))


def test_ungapped_scores_packed_equals_byte(rng):
    """End-to-end: packed score path == _ungapped_scores on candidates."""
    import jax.numpy as jnp

    from urmap_tpu.map.pipeline import _ungapped_scores

    db = make_seqdb(rng, [8_000])
    genome = db.codes
    G = genome.shape[0]
    sc = ScoreConfig()
    N, L = 64, 120
    NW = -(-L // 16)
    starts = rng.integers(0, G - L, size=N).astype(np.int32)
    reads = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    for i in range(0, N, 2):
        reads[i] = genome[starts[i] : starts[i] + L]
    lengths = np.full(N, L, np.int32)
    lengths[::5] = 77

    byte_scores = np.asarray(_ungapped_scores(
        jnp.asarray(genome), jnp.asarray(starts), jnp.asarray(reads),
        jnp.asarray(lengths), sc))

    ginter, off = gp.pack_genome(genome)
    rp, rn = gp.pack_reads(jnp.asarray(reads), jnp.asarray(lengths), NW)
    mm = np.asarray(gp.mismatch_counts(
        jnp.asarray(ginter), off,
        jnp.asarray(starts), rp, rn, jnp.asarray(lengths)))
    packed_scores = (lengths - mm) * sc.match + mm * sc.mismatch
    np.testing.assert_array_equal(byte_scores, packed_scores)


def test_row_gather_window_row_words(rng):
    """row_gather_window must return table[s:s+w] for every power-of-two
    row granularity (the pipeline picks small rows to cut gathered
    elements; all must agree bit-for-bit)."""
    import jax.numpy as jnp

    M = 4096
    table = rng.integers(0, 1 << 30, size=M).astype(np.uint32)
    starts = np.concatenate([
        rng.integers(0, M - 64, size=200),
        np.array([0, 1, 7, 8, 15, 16, 31, 32, 33, M - 64]),
    ]).astype(np.int32)
    tj = jnp.asarray(table)
    for width in (16, 22, 31):
        want = np.stack([table[s : s + width] for s in starts])
        for rw in (8, 16, 32):
            got = np.asarray(gp.row_gather_window(
                tj, jnp.asarray(starts), width, row_words=rw))
            np.testing.assert_array_equal(got, want, err_msg=f"{width=} {rw=}")


def test_read_code_pack_roundtrip(rng):
    """Host pack → device unpack is exact for every legal read code
    ({0..3, 5}; reads never carry genome-N 4), at non-multiple-of-4/8
    widths."""
    for L in (150, 152, 7, 33):
        codes = rng.integers(0, 4, size=(64, L)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.05] = 5
        packed, nmask = gp.pack_read_codes_host(codes)
        assert packed.shape == (64, -(-L // 4))
        assert nmask.shape == (64, -(-L // 8))
        got = np.asarray(gp.unpack_read_codes_device(packed, nmask, L))
        np.testing.assert_array_equal(got, codes)


def test_native_read_pack_matches_numpy(rng):
    """The C++ packer (urmap_pack_reads) is bit-identical to the numpy
    twin at every alignment (word-loop + scalar tail, both planes)."""
    from urmap_tpu.io import native

    if native.lib() is None:
        import pytest

        pytest.skip("no native codec build")
    for L in (160, 150, 152, 7, 13, 33, 1, 4, 8):
        codes = rng.integers(0, 4, size=(37, L)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.1] = 5
        want_p, want_n = gp._pack_read_codes_numpy(codes)
        got_p, got_n = gp.pack_read_codes_host(codes)
        np.testing.assert_array_equal(got_p, want_p)
        np.testing.assert_array_equal(got_n, want_n)
    # non-contiguous input (sliced batch) must still pack correctly
    codes = rng.integers(0, 4, size=(64, 150)).astype(np.uint8)[::2]
    np.testing.assert_array_equal(
        gp.pack_read_codes_host(codes)[0], gp._pack_read_codes_numpy(codes)[0])


def test_gather_row_words_invariance(rng, monkeypatch):
    """The GATHER_ROW_WORDS tuning knob must not change any result:
    mismatch counts and CSR candidate gathers are bit-identical at every
    granularity."""
    import jax.numpy as jnp

    from urmap_tpu.map.seed import gather_candidates

    db = make_seqdb(rng, [6_000])
    genome = db.codes
    G = genome.shape[0]
    N, L = 96, 100
    NW = -(-L // 16)
    starts = rng.integers(0, G - L, size=N).astype(np.int32)
    reads = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = rng.integers(30, L + 1, size=N).astype(np.int32)
    ginter, off = gp.pack_genome(genome)
    rp, rn = gp.pack_reads(jnp.asarray(reads), jnp.asarray(lengths), NW)

    nslots, p = 512, 16
    offsets = np.sort(rng.integers(0, 4000, size=nslots + 1)) \
        .astype(np.uint32)
    positions = np.concatenate(
        [rng.integers(0, G, size=4096).astype(np.int32),
         np.zeros(2 * gp.ROW_WORDS, np.int32)])
    slots = rng.integers(0, nslots, size=(8, 4)).astype(np.uint32)
    soffs = rng.integers(0, 40, size=(8, 4)).astype(np.int32)
    valid = rng.integers(0, 2, size=(8, 4)).astype(bool)

    outs = []
    # every (mode, row-granularity) combination must be bit-identical:
    # GATHER_MODE/GATHER_ROW_WORDS are pure perf knobs
    for mode, rw in (("slice", 16), ("row", 32), ("row", 16), ("row", 8)):
        monkeypatch.setattr(gp, "GATHER_MODE", mode)
        monkeypatch.setattr(gp, "GATHER_ROW_WORDS", rw)
        mm = np.asarray(gp.mismatch_counts(
            jnp.asarray(ginter), off, jnp.asarray(starts), rp, rn,
            jnp.asarray(lengths)))
        cand = np.asarray(gather_candidates(
            jnp.asarray(offsets), jnp.asarray(positions),
            jnp.asarray(slots), jnp.asarray(soffs), jnp.asarray(valid),
            p=p))
        outs.append((mm, cand))
    for mm, cand in outs[1:]:
        np.testing.assert_array_equal(mm, outs[0][0])
        np.testing.assert_array_equal(cand, outs[0][1])


def test_biased_coordinates_past_2_31(rng):
    """GRCh38-scale plumbing: device coordinates are biased int32
    (seed.POS_BIAS); verify the packed-genome gather arithmetic at
    global positions > 2^31 by relocating a small genome to a virtual
    base of 4.2e9 via the static word offset (exactly how
    device_tables folds the bias into base_off)."""
    import numpy as np

    import jax.numpy as jnp

    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.map.seed import POS_BIAS

    codes = rng.integers(0, 4, size=2048).astype(np.uint8)
    ginter, base_off = gpk.pack_genome(codes)

    virt = 4_200_000_000            # > 2^31, multiple of 16
    assert virt % gpk.BASES_PER_WORD == 0
    # word index must satisfy: (p - POS_BIAS)//16 + base_total
    #                        = (p - virt)//16 + base_off
    base_total = base_off + (POS_BIAS - virt) // gpk.BASES_PER_WORD

    n, L = 64, 96
    local = rng.integers(0, 2048 - L, size=n)
    reads = np.stack([codes[s : s + L] for s in local])
    # flip a couple of bases → known mismatch counts
    want = np.zeros(n, np.int64)
    for i in range(n):
        k = int(rng.integers(0, 4))
        want[i] = k
        for j in rng.choice(L, size=k, replace=False):
            reads[i, j] = (reads[i, j] + 1 + int(rng.integers(0, 3))) % 4

    lengths = np.full(n, L, np.int32)
    biased = (local + virt - POS_BIAS).astype(np.int32)
    assert biased.min() > 0  # indeed near INT32_MAX territory
    rp, rn = gpk.pack_reads(jnp.asarray(reads), jnp.asarray(lengths),
                            -(-L // gpk.BASES_PER_WORD))
    mm = np.asarray(gpk.mismatch_counts(
        jnp.asarray(ginter), base_total, jnp.asarray(biased), rp, rn,
        jnp.asarray(lengths)))
    np.testing.assert_array_equal(mm, want)

    # gather_codes round-trips the same windows
    got = np.asarray(gpk.gather_codes(jnp.asarray(ginter), base_total,
                                      jnp.asarray(biased), L))
    for i in range(n):
        np.testing.assert_array_equal(got[i], codes[local[i]:local[i] + L])


def test_read_words_from_upload_matches_pack_reads(rng):
    """Upload-view words == pack_reads(unpack_read_codes_device(...))
    bit-for-bit (both planes, all lanes incl. pad)."""
    import jax.numpy as jnp

    B, L = 64, 150
    NW = -(-L // 16)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes[rng.random((B, L)) < 0.05] = 5
    lengths = rng.integers(0, L + 1, size=B).astype(np.int32)
    # mapper pad convention: lanes past length are READ_N
    codes[np.arange(L)[None, :] >= lengths[:, None]] = 5
    pk, nm = gp.pack_read_codes_host(codes)
    ref_rp, ref_rn = gp.pack_reads(
        gp.unpack_read_codes_device(jnp.asarray(pk), jnp.asarray(nm), L),
        jnp.asarray(lengths), NW)
    rp, rn = gp.read_words_from_upload(
        jnp.asarray(pk), jnp.asarray(nm), jnp.asarray(lengths), NW)
    np.testing.assert_array_equal(np.asarray(ref_rp), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(ref_rn), np.asarray(rn))


def test_revcomp_words_matches_byte_path(rng):
    """Word-space revcomp == pack_reads(revcomp_batch(codes)) exactly,
    across length edge cases (0, <k, %16 == 0, full)."""
    import jax.numpy as jnp

    from urmap_tpu.map.pipeline import revcomp_batch

    B, L = 64, 150
    NW = -(-L // 16)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes[rng.random((B, L)) < 0.05] = 5
    lengths = rng.integers(0, L + 1, size=B).astype(np.int32)
    lengths[:4] = [0, 16, 32, 144]        # %16 == 0 edges
    lengths[4:8] = [1, 15, 17, L]
    codes[np.arange(L)[None, :] >= lengths[:, None]] = 5
    cj, lj = jnp.asarray(codes), jnp.asarray(lengths)
    rp, rn = gp.pack_reads(cj, lj, NW)
    ref_rp, ref_rn = gp.pack_reads(revcomp_batch(cj, lj), lj, NW)
    rc_rp, rc_rn = gp.revcomp_words(rp, rn, lj, L)
    np.testing.assert_array_equal(np.asarray(ref_rn), np.asarray(rc_rn))
    np.testing.assert_array_equal(np.asarray(ref_rp), np.asarray(rc_rp))


def test_unpack_words_roundtrip(rng):
    import jax.numpy as jnp

    B, L = 32, 150
    NW = -(-L // 16)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes[rng.random((B, L)) < 0.1] = 5
    lengths = np.full(B, L, np.int32)
    rp, rn = gp.pack_reads(jnp.asarray(codes), jnp.asarray(lengths), NW)
    back = np.asarray(gp.unpack_words_to_codes(rp, rn, L))
    np.testing.assert_array_equal(codes, back)


def test_native_pack_genome_matches_numpy(rng, monkeypatch):
    """pack_genome's C++ kernel (urmap_pack_genome) must be bit-identical
    to the numpy chunked path, including N lanes and a ragged tail."""
    from urmap_tpu.io import native

    if native.lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    for n in (16 * 1000, 16 * 1000 + 7, 333):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        codes[rng.random(n) < 0.03] = 4
        nat_g, nat_off = gp.pack_genome(codes)
        monkeypatch.setenv("URMAP_NO_NATIVE_BUILD", "1")
        ref_g, ref_off = gp.pack_genome(codes)
        monkeypatch.delenv("URMAP_NO_NATIVE_BUILD")
        assert nat_off == ref_off
        np.testing.assert_array_equal(nat_g, ref_g)
