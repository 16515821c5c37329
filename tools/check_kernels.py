"""On-device Pallas kernel parity: compile + run each kernel against its
jnp twin on the CURRENT backend (the unit tests necessarily run
interpret mode on CPU; this exercises the real Mosaic lowering).

Covers banded DP (clip + noclip), seed-slots, and vote. Small shapes —
three cheap programs (plus twins) so the remote-compile bill stays low.

Usage: python tools/check_kernels.py            # axon/TPU backend
       python tools/check_kernels.py --cpu      # sanity (non-interpret CPU)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interp = args.cpu          # CPU backend only supports interpret mode
    import jax.numpy as jnp

    from urmap_tpu import genome_pack as gpk
    from urmap_tpu.config import ScoreConfig
    from urmap_tpu.kernels.banded_dp import pallas_from_windows
    from urmap_tpu.kernels.seed_slots import seed_slots_words_pallas
    from urmap_tpu.kernels.vote import vote_pallas
    from urmap_tpu.map.dp import banded_from_windows
    from urmap_tpu.map.seed import (SENTINEL, extract_seed_slots_words,
                                    vote_top_candidates)

    print(f"backend: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(3)
    ok = True

    # ---- banded DP (mirrors bench.py --check-kernel) ----
    sc = ScoreConfig()
    hw, L = 16, 150
    wlen = L + 2 * hw
    kw = rng.integers(0, 5, size=(2048, wlen)).astype(np.uint8)
    kr = rng.integers(0, 4, size=(2048, L)).astype(np.uint8)
    kr[:512] = kw[:512, hw : hw + L]
    kl = rng.integers(30, L + 1, size=2048).astype(np.int32)
    for clip in (None, sc.clip_open):
        outs_p = pallas_from_windows(jnp.asarray(kw), jnp.asarray(kr),
                                     jnp.asarray(kl), hw=hw, sc=sc,
                                     clip_open=clip, interpret=interp)
        outs_j = banded_from_windows(jnp.asarray(kw), jnp.asarray(kr),
                                     jnp.asarray(kl), hw=hw, sc=sc,
                                     clip_open=clip)
        same = all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(outs_p[:3], outs_j))
        print(f"banded_dp clip={clip is not None}: "
              f"{'ok' if same else 'MISMATCH'}", flush=True)
        ok &= same

    # ---- seed slots (word planes) ----
    reads = rng.integers(0, 4, size=(4096, L)).astype(np.uint8)
    reads[rng.random(reads.shape) < 0.02] = 5
    lens = rng.integers(24, L + 1, size=4096).astype(np.int32)
    lens[:32] = 0
    reads[np.arange(L)[None, :] >= lens[:, None]] = 5
    NW = -(-L // 16)
    rp, rn = gpk.pack_reads(jnp.asarray(reads), jnp.asarray(lens), NW)
    s_k, o_k, v_k = seed_slots_words_pallas(rp, rn, jnp.asarray(lens), L,
                                            k=24, q=8, slot_bits=25,
                                            interpret=interp)
    s_j, o_j, v_j = extract_seed_slots_words(rp, rn, jnp.asarray(lens), L,
                                             k=24, q=8, slot_bits=25)
    vm = np.asarray(v_j)
    same = (np.array_equal(vm, np.asarray(v_k))
            and np.array_equal(np.asarray(o_j), np.asarray(o_k))
            and np.array_equal(np.asarray(s_j)[vm], np.asarray(s_k)[vm]))
    print(f"seed_slots: {'ok' if same else 'MISMATCH'}", flush=True)
    ok &= same

    # ---- vote ----
    base = rng.integers(-(1 << 30), 1 << 28, size=(4096, 8))
    cand = base[:, rng.integers(0, 8, size=128)].astype(np.int32)
    cand[rng.random(cand.shape) < 0.5] = SENTINEL
    tc_k, tv_k = vote_pallas(jnp.asarray(cand), v=8, interpret=interp)
    tc_j, tv_j = vote_top_candidates(jnp.asarray(cand), v=8)
    same = (np.array_equal(np.asarray(tc_j), np.asarray(tc_k))
            and np.array_equal(np.asarray(tv_j), np.asarray(tv_k)))
    print(f"vote: {'ok' if same else 'MISMATCH'}", flush=True)
    ok &= same

    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
