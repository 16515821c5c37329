"""Lane-rotate-narrow kernel vs the jnp funnel twins (interpret mode).

The kernel's contract (kernels/lane_rotate.py): out[i, j] =
rows[i, (off[i]+j) mod W], and callers only consume lanes with
off+j < W (row128 runs never straddle a row; window fetches satisfy
off + width <= 256). These tests pin bit-equality with both jnp
funnels on every USED lane, at both table widths, plus the padding
path (N not a multiple of the block size).
"""

import numpy as np

from urmap_tpu.kernels.lane_rotate import rotate_narrow_pallas
from urmap_tpu.map.seed import SENTINEL


def _jnp_funnel_sentinel(rows, off, width):
    """seed._row128_fetch's funnel (SENTINEL fill)."""
    import jax.numpy as jnp

    cur = jnp.asarray(rows)
    bit = 6
    while bit >= 0:
        sh = 1 << bit
        shifted = jnp.concatenate(
            [cur[:, sh:], jnp.full_like(cur[:, :sh], SENTINEL)], axis=1)
        cur = jnp.where((((off >> bit) & 1) == 1)[:, None], shifted, cur)
        bit -= 1
    return np.asarray(cur[:, :width])


def test_rotate_matches_sentinel_funnel_on_used_lanes(rng):
    N, W, width = 512, 128, 8
    rows = rng.integers(0, 1 << 30, size=(N, W)).astype(np.int32)
    off = rng.integers(0, W, size=N).astype(np.int32)
    got = np.asarray(rotate_narrow_pallas(rows, off, width, interpret=True))
    want = _jnp_funnel_sentinel(rows, off, width)
    used = off[:, None] + np.arange(width)[None, :] < W
    np.testing.assert_array_equal(got[used], want[used])


def test_rotate_w256_exact_everywhere(rng):
    # window-fetch shape: off < 128, width <= 129 → no used-lane wrap,
    # so the kernel must equal direct slicing on EVERY output lane
    N, W, width = 300, 256, 22      # N % block != 0 → padding path
    rows = rng.integers(0, 1 << 30, size=(N, W)).astype(np.uint32)
    off = rng.integers(0, 128, size=N).astype(np.int32)
    got = np.asarray(rotate_narrow_pallas(rows, off, width, interpret=True))
    want = np.stack([rows[i, off[i] : off[i] + width] for i in range(N)])
    np.testing.assert_array_equal(got, want)


def test_row128_fetch_path_unchanged_on_cpu(rng):
    # the dispatch predicate keeps CPU on the jnp twin — mapping results
    # in the CPU suite already pin that path; here just pin enabled()
    from urmap_tpu.kernels import lane_rotate

    assert not lane_rotate.enabled()


def test_aligned_table_128_view_equivalence(rng):
    # the aligned-layout fast path (seed.gather_candidates) views the
    # 1D pow2-nested table as [M/128, 128] and row128-fetches: pin that
    # _row128_fetch on the view == _aligned_rows_fetch on the table for
    # run-contained starts (both jnp paths; the kernel itself is pinned
    # by the tests above)
    from urmap_tpu.map.seed import _aligned_rows_fetch, _row128_fetch

    rw, p, M = 16, 16, 128 * 64
    tbl = rng.integers(0, 1 << 30, size=M).astype(np.int32)
    # run starts: pow2-nested placement ⇒ any start with start%rw + p
    # fitting inside its rw block; emulate with rw-aligned starts
    starts = (rng.integers(0, M // rw, size=500) * rw).astype(np.uint32)
    import jax.numpy as jnp

    a = np.asarray(_aligned_rows_fetch(jnp.asarray(tbl), jnp.asarray(starts),
                                       p, rw))
    b = np.asarray(_row128_fetch(jnp.asarray(tbl).reshape(-1, 128),
                                 jnp.asarray(starts), p))
    np.testing.assert_array_equal(a, b)


def test_window_fetch_128_view_matches_row_gather(rng):
    # gather_window's TPU dispatch now routes through
    # row128_window_fetch on a [M/128,128] view — pin that it equals
    # row_gather_window (the prior TPU path) for interior starts, at
    # the verify width (22 words) and the rescue width (152 words)
    import jax.numpy as jnp

    from urmap_tpu.genome_pack import (row128_window_fetch,
                                       row_gather_window)

    M = 128 * 512
    tbl = rng.integers(0, 1 << 32, size=M, dtype=np.int64).astype(np.uint32)
    for width in (22, 152):
        starts = rng.integers(0, M - width - 256, size=400).astype(np.int32)
        a = np.asarray(row_gather_window(jnp.asarray(tbl),
                                         jnp.asarray(starts), width,
                                         row_words=16))
        b = np.asarray(row128_window_fetch(
            jnp.asarray(tbl).reshape(-1, 128), jnp.asarray(starts), width))
        np.testing.assert_array_equal(a, b)
