"""One-shot on-device kernel preflight.

The seed/vote/banded-DP Pallas kernels are bit-identical to their jnp
twins and interpret-tested, but a Mosaic lowering regression (or an
unsupported op / silently-wrong lowering on a new TPU generation) would
otherwise surface as a crashed run — or worse, wrong SAM.
``ensure_kernels()`` compiles and runs ALL THREE kernels once on tiny
shapes inside one jitted program and compares each against its jnp twin
(NUMERICS, not just lowering — the class of bug where the MXU default
precision rounds f32 operands through bf16 is invisible to compile-only
probes and to CPU interpret-mode tests).

Failure handling:
  - clean probe run, one kernel's twin mismatches → flip ONLY that
    kernel's URMAP_NO_*_KERNEL escape hatch (the healthy kernels keep
    their ~10x speedups);
  - compile/runtime exception → attribution is unknown, flip ALL
    hatches (degrade to slower-but-correct jnp everywhere).

``last_result()`` reports the outcome (for bench.py's JSON record).

Cost: one extra ~tiny compile per process on TPU backends (skipped on
CPU, where kernels never dispatch; skip explicitly with
URMAP_NO_KERNEL_PREFLIGHT=1 once a platform is known-good).
"""

from __future__ import annotations

import os
import sys

_DONE = False
_RESULT: dict | None = None


def last_result() -> dict | None:
    """Outcome of the preflight: None if it never ran (CPU backend or
    skipped), else {"seed_ok","vote_ok","dp_ok","dp_clip_ok","rotate_ok","error"}."""
    return _RESULT


def ensure_kernels() -> None:
    global _DONE, _RESULT
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
    from urmap_tpu.config import ScoreConfig
    from urmap_tpu.kernels.banded_dp import pallas_from_windows
    from urmap_tpu.kernels.seed_slots import seed_slots_words_pallas
    from urmap_tpu.kernels.tb_dp import (tb_dops_from_windows,
                                         tb_dops_from_windows_pallas)
    from urmap_tpu.kernels.vote import vote_pallas
    from urmap_tpu.map.dp import banded_from_windows
    from urmap_tpu.map.seed import (SENTINEL, extract_seed_slots_words,
                                    vote_top_candidates)

    L, k, q, sb, hw = 64, 24, 8, 20, 8
    sc = ScoreConfig()
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(128, L)).astype(np.uint8)
    lens = np.full(128, L, np.int32)
    cand = rng.integers(0, 1000, size=(128, 128)).astype(np.int32)
    cand[rng.random(cand.shape) < 0.5] = SENTINEL
    # DP probe: genome windows = mutated copies of the reads (SNPs +
    # shifts) so every score path (match/mismatch/gaps/clip) is hit
    win = np.roll(codes, 3, axis=1)
    mut = rng.random(win.shape) < 0.1
    win[mut] ^= rng.integers(1, 4, size=int(mut.sum())).astype(np.uint8)
    win &= 3
    win = np.pad(win, ((0, 0), (hw, hw)), constant_values=4)  # [128, L+2hw]

    from urmap_tpu.kernels.lane_rotate import rotate_narrow_pallas

    # rotate probe inputs: random rows + offsets; the jnp twin below
    # compares only the non-wrapped lanes (j + off < W), matching the
    # callers' masking contract (lane_rotate.py docstring)
    rot_rows = rng.integers(0, 1 << 30, size=(64, 128)).astype(np.int32)
    rot_off = rng.integers(0, 128, size=64).astype(np.int32)
    # second probe at W=256 with a width that SPANS a 128-lane row
    # boundary — production also dispatches at W=256/384 (genome window
    # fetches, rescue width 152 via row128_window_fetch), and a shape-
    # specific mis-lowering there would otherwise pass preflight
    # (round-4 advisor finding). Offsets stay < 128 per the kernel
    # contract (they locate a start inside the FIRST row; the funnel is
    # 7-bit — lane_rotate.supports docstring).
    rot_rows2 = rng.integers(0, 1 << 30, size=(64, 256)).astype(np.int32)
    rot_off2 = rng.integers(0, 128, size=64).astype(np.int32)

    @jax.jit
    def probe(cj, lj, cd, wj, rr, ro, rr2, ro2):
        rp, rn = gpk.pack_reads(cj, lj, -(-L // 16))
        s, o, v = seed_slots_words_pallas(rp, rn, lj, L, k=k, q=q,
                                          slot_bits=sb, block_r=128)
        # default block_n: production shape (a block_n=64 probe was
        # ILLEGAL — output block (8, 64) over (8, 128) trips the Mosaic
        # lane-divisibility rule and disabled perfectly good kernels)
        tc, tv = vote_pallas(cd, v=4)
        sj, oj, vj = extract_seed_slots_words(rp, rn, lj, L, k=k, q=q,
                                              slot_bits=sb)
        tcj, tvj = vote_top_candidates(cd, v=4)
        seed_ok = (jnp.all(v == vj) & jnp.all(o == oj)
                   & jnp.all(jnp.where(vj, s == sj, True)))
        vote_ok = jnp.all(tc == tcj) & jnp.all(tv == tvj)
        # banded DP, both modes, vs the jnp twin — including the
        # in-kernel ungapped rescore vs the window-derived straight-
        # diagonal score at d0 (what banded_packed's mismatch_counts
        # would compute; the windows here ARE the genome for the probe)
        ds, dd0, dd1, dung = pallas_from_windows(wj, cj, lj, hw=hw, sc=sc)
        js, jd0, jd1 = banded_from_windows(wj, cj, lj, hw=hw, sc=sc)
        gsl = jnp.take_along_axis(
            wj, (jd0 + hw)[:, None] + jnp.arange(L)[None, :], axis=1)
        in_rd = jnp.arange(L)[None, :] < lj[:, None]
        jung = jnp.sum(jnp.where(
            in_rd, jnp.where(gsl == cj, sc.match, sc.mismatch),
            0).astype(jnp.int32), axis=-1)
        dp_ok = (jnp.all(ds == js) & jnp.all(dd0 == jd0)
                 & jnp.all(dd1 == jd1) & jnp.all(dung == jung))
        cs, cd0, _, _ = pallas_from_windows(wj, cj, lj, hw=hw, sc=sc,
                                            clip_open=sc.clip_open)
        zs, zd0, _ = banded_from_windows(wj, cj, lj, hw=hw, sc=sc,
                                         clip_open=sc.clip_open)
        dp_clip_ok = jnp.all(cs == zs) & jnp.all(cd0 == zd0)
        # lane-rotate-narrow vs direct indexing, non-wrapped lanes only
        width = 8
        rot = rotate_narrow_pallas(rr, ro, width)
        j = jnp.arange(width, dtype=jnp.int32)[None, :]
        ref = jnp.take_along_axis(
            rr, jnp.minimum(ro[:, None] + j, 127), axis=1)
        used = ro[:, None] + j < 128
        rotate_ok = jnp.all(jnp.where(used, rot == ref, True))
        width2 = 130
        rot2 = rotate_narrow_pallas(rr2, ro2, width2)
        j2 = jnp.arange(width2, dtype=jnp.int32)[None, :]
        ref2 = jnp.take_along_axis(
            rr2, jnp.minimum(ro2[:, None] + j2, 255), axis=1)
        used2 = ro2[:, None] + j2 < 256
        rotate_ok &= jnp.all(jnp.where(used2, rot2 == ref2, True))
        # traceback dops DP (kernels/tb_dp.py): score, walk_ok AND
        # every packed (d, op) record word vs the jnp twin
        ts, tw, tk = tb_dops_from_windows(wj, cj, lj, hw=hw, sc=sc)
        ks, kw, kk = tb_dops_from_windows_pallas(wj, cj, lj, hw=hw,
                                                 sc=sc)
        tb_ok = (jnp.all(ts == ks) & jnp.all(tw == kw)
                 & jnp.all(tk == kk))
        return seed_ok, vote_ok, dp_ok, dp_clip_ok, rotate_ok, tb_ok

    hatches = {"seed": "URMAP_NO_SEED_KERNEL",
               "vote": "URMAP_NO_VOTE_KERNEL",
               "dp": "URMAP_NO_DP_KERNEL",
               "rotate": "URMAP_NO_ROTATE_KERNEL",
               "tb": "URMAP_NO_TB_KERNEL"}
    try:
        seed_ok, vote_ok, dp_ok, dp_clip_ok, rotate_ok, tb_ok = (
            bool(np.asarray(x)) for x in probe(
                jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(cand),
                jnp.asarray(win), jnp.asarray(rot_rows),
                jnp.asarray(rot_off), jnp.asarray(rot_rows2),
                jnp.asarray(rot_off2)))
        # fault injection (tests / on-chip validation): pretend kernel X
        # produced wrong numerics — the hatch flip below must fire
        # exactly like a real silent-wrong-lowering would
        fake = os.environ.get("URMAP_PREFLIGHT_FAKE_BREAK", "")
        seed_ok &= "seed" not in fake
        vote_ok &= "vote" not in fake
        dp_ok &= "dp" not in fake
        rotate_ok &= "rotate" not in fake
        tb_ok &= "tb" not in fake
        _RESULT = {"seed_ok": seed_ok, "vote_ok": vote_ok, "dp_ok": dp_ok,
                   "dp_clip_ok": dp_clip_ok, "rotate_ok": rotate_ok,
                   "tb_ok": tb_ok, "error": None}
        bad = {"seed": not seed_ok, "vote": not vote_ok,
               "dp": not (dp_ok and dp_clip_ok),
               "rotate": not rotate_ok, "tb": not tb_ok}
        if any(bad.values()):
            # clean run, attributable mismatch → disable ONLY the
            # failing kernel(s); the healthy ones keep their speedups
            for name, is_bad in bad.items():
                if is_bad:
                    os.environ[hatches[name]] = "1"
            print(f"urmap-tpu: kernel/jnp twin mismatch "
                  f"({_RESULT}); disabled: "
                  f"{[n for n, b in bad.items() if b]}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — lowering/runtime failure:
        # attribution unknown, disable everything
        for var in hatches.values():
            os.environ[var] = "1"
        _RESULT = {"seed_ok": False, "vote_ok": False, "dp_ok": False,
                   "dp_clip_ok": False, "rotate_ok": False,
                   "tb_ok": False,
                   "error": f"{type(e).__name__}: {e}"}
        print(f"urmap-tpu: Pallas kernels unavailable on this backend "
              f"({type(e).__name__}: {e}); using jnp fallbacks",
              file=sys.stderr)
    _DONE = True
