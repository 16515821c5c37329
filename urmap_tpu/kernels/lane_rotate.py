"""Lane-rotate-narrow Pallas kernel: rows[i, off[i] : off[i]+width].

The row128 table layouts (index positions AND interleaved genome at
GRCh38 scale — store.align_runs_fixed / tables_to_device) fetch one or
two dense 128-lane rows per seed/window and then align the run to lane
0 with a 7-step conditional-shift funnel. In jnp each funnel step
materializes a full [N, W] temporary, so the funnel — not the row
gather — dominates the stage: measured on v5e with the GRCh38-size
positions table (22M x 128 int32, N = 524288), the row take costs
1.5 ms while take+funnel costs 45 ms (take_along_axis: 112 ms). Here
the funnel runs in VMEM on each block: HBM traffic is one read of the
gathered rows + one write of the narrow output, and the seven
roll+select steps are VPU register work.

Circular-roll correctness: out[j] = rows[(j + off) mod W]. Callers
guarantee the USED lanes never wrap — row128 runs satisfy
off + count <= 128 (runs never straddle a row) and window fetches
satisfy off + width <= W — so wrapped lanes only ever land in
positions the caller masks (j >= count).

Bit-identical to the jnp funnel twin (seed._row128_fetch /
genome_pack.row128_window_fetch keep it as the escape hatch:
URMAP_NO_ROTATE_KERNEL=1, auto-flipped by kernels/preflight.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid block: [BN, 256] int32 = 1 MB in VMEM + funnel
# registers — comfortable against the ~16 MB budget. Swept on v5e at
# GRCh38 shape (N = 524288): 256 → 0.09 ms, 1024/4096 → 0.06 ms
# (vs 43 ms for the jnp funnel); 1024 sits on the plateau with the
# smallest VMEM footprint.
_BN = 1024


def supports(w: int) -> bool:
    """W must be a whole number of 128-lane tiles (the row128 layouts
    produce W=128/256; the rescue-window fetch reaches 384). Offsets
    are always < 128 regardless of W (they locate a start inside its
    first row), so the 7-bit funnel covers every width."""
    return w % 128 == 0 and 128 <= w <= 1024


_ON_TPU: bool | None = None


def enabled() -> bool:
    """Trace-time dispatch predicate: TPU backend and the escape hatch
    not flipped (URMAP_NO_ROTATE_KERNEL=1 — set manually or by
    kernels/preflight.py on a failed numeric probe)."""
    import os

    global _ON_TPU
    if os.environ.get("URMAP_NO_ROTATE_KERNEL") == "1":
        return False
    if _ON_TPU is None:
        dev = jax.devices()[0]
        _ON_TPU = ("tpu" in dev.platform.lower()
                   or "TPU" in getattr(dev, "device_kind", ""))
    return _ON_TPU


def rotate_dispatch(cur, off, width: int, jnp_fallback):
    """rotate_narrow_pallas on TPU LOWERINGS, ``jnp_fallback(cur, off)``
    everywhere else — including non-TPU lowerings of a program traced
    inside a TPU process (the WideSecondPass CPU program: a trace-time
    backend check like enabled() cannot see the lowering platform, and
    Pallas refuses to lower for CPU — round-5 on-chip `-secondpass`
    crash). jax.lax.platform_dependent defers the choice to lowering;
    the escape hatch / unsupported widths skip the kernel entirely."""
    if not (enabled() and supports(cur.shape[1])):
        return jnp_fallback(cur, off)
    from jax.lax import platform_dependent

    return platform_dependent(
        cur, off, cpu=jnp_fallback,
        default=lambda c, o: rotate_narrow_pallas(c, o, width))


def _kernel(off_ref, rows_ref, out_ref, *, w: int):
    cur = rows_ref[...]                       # [BN, W]
    off = off_ref[...].astype(jnp.int32)      # [BN, 1] int8 in, 0..127
    for bit in range(6, -1, -1):
        sh = 1 << bit
        # pltpu.roll moves element i to i+shift (circular); we want
        # out[j] = cur[j + sh], i.e. shift by -sh == W - sh
        rolled = pltpu.roll(cur, shift=w - sh, axis=1)
        cur = jnp.where(((off >> bit) & 1) == 1, rolled, cur)
    out_ref[...] = cur


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def rotate_narrow_pallas(rows, off, width: int, interpret: bool = False):
    """rows [N, W] (W in {128, 256}), off int32[N] in [0, 128) →
    [N, width] = rows[i, off[i] : off[i]+width] (used lanes; wrapped
    lanes carry in-row garbage the caller masks). N padded internally
    to a multiple of the block size.

    HBM economics (round-5 GRCh38 OOM dump): the kernel writes the
    FULL rotated row ALIASED over the input buffer — a narrow
    out_shape was tile-padded 8-16x (512 MB at the GRCh38 seed fetch)
    and the full-width copy would cost the same again; aliasing costs
    ZERO new HBM and XLA fuses the [:, :width] slice into consumers.
    The per-row offset rides as int8 (a [N, 1] int32 operand is lane-
    padded 128x — another 512 MB)."""
    n, w = rows.shape
    assert supports(w), w
    pad = (-n) % _BN
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        off = jnp.pad(off, (0, pad))
    np_ = n + pad
    out = pl.pallas_call(
        functools.partial(_kernel, w=w),
        grid=(np_ // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BN, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, w), rows.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(off.astype(jnp.int8).reshape(-1, 1), rows)
    return out[:n, :width]
