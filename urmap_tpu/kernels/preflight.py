"""One-shot on-device kernel preflight.

The seed/vote Pallas kernels are bit-identical to their jnp twins and
interpret-tested, but a Mosaic lowering regression (or an unsupported
op on a new TPU generation) would otherwise surface as a crashed map
run. ``ensure_kernels()`` compiles and runs BOTH kernels once on tiny
shapes inside one jitted program; on any failure it flips the
URMAP_NO_SEED_KERNEL / URMAP_NO_VOTE_KERNEL escape hatches so the
dispatches (map/seed.py) take the jnp paths, and the mapper degrades to
slower-but-correct instead of dead.

Cost: one extra ~tiny compile per process on TPU backends (skipped on
CPU, where kernels never dispatch; skip explicitly with
URMAP_NO_KERNEL_PREFLIGHT=1 once a platform is known-good).
"""

from __future__ import annotations

import os
import sys

_DONE = False


def ensure_kernels() -> None:
    global _DONE
    if _DONE or os.environ.get("URMAP_NO_KERNEL_PREFLIGHT") == "1":
        return
    from urmap_tpu.map.dp import on_tpu

    if not on_tpu():
        _DONE = True
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.kernels.seed_slots import seed_slots_words_pallas
    from urmap_tpu.kernels.vote import vote_pallas
    from urmap_tpu.map.seed import (SENTINEL, extract_seed_slots_words,
                                    vote_top_candidates)

    L, k, q, sb = 64, 24, 8, 20
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(128, L)).astype(np.uint8)
    lens = np.full(128, L, np.int32)
    cand = rng.integers(0, 1000, size=(128, 128)).astype(np.int32)
    cand[rng.random(cand.shape) < 0.5] = SENTINEL

    @jax.jit
    def probe(cj, lj, cd):
        rp, rn = gpk.pack_reads(cj, lj, -(-L // 16))
        s, o, v = seed_slots_words_pallas(rp, rn, lj, L, k=k, q=q,
                                          slot_bits=sb, block_r=128)
        # default block_n: production shape (a block_n=64 probe was
        # ILLEGAL — output block (8, 64) over (8, 128) trips the Mosaic
        # lane-divisibility rule and disabled perfectly good kernels)
        tc, tv = vote_pallas(cd, v=4)
        # jnp twins: the probe verifies NUMERICS, not just lowering —
        # a silently-wrong Mosaic lowering (e.g. default MXU precision
        # rounding f32 operands through bf16) must also trip the hatch
        sj, oj, vj = extract_seed_slots_words(rp, rn, lj, L, k=k, q=q,
                                              slot_bits=sb)
        tcj, tvj = vote_top_candidates(cd, v=4)
        seed_ok = (jnp.all(v == vj) & jnp.all(o == oj)
                   & jnp.all(jnp.where(vj, s == sj, True)))
        vote_ok = jnp.all(tc == tcj) & jnp.all(tv == tvj)
        return seed_ok, vote_ok

    try:
        seed_ok, vote_ok = (bool(np.asarray(x)) for x in probe(
            jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(cand)))
        if not seed_ok or not vote_ok:
            raise AssertionError(
                f"kernel/jnp twin mismatch (seed_ok={seed_ok}, "
                f"vote_ok={vote_ok})")
    except Exception as e:  # noqa: BLE001 — any lowering/runtime failure
        os.environ["URMAP_NO_SEED_KERNEL"] = "1"
        os.environ["URMAP_NO_VOTE_KERNEL"] = "1"
        print(f"urmap-tpu: seed/vote Pallas kernels unavailable on this "
              f"backend ({type(e).__name__}: {e}); using jnp fallbacks",
              file=sys.stderr)
    _DONE = True
