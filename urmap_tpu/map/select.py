"""Hit selection: best/second-best alignment, MAPQ, mapped flag.

Canonical ordering (shared with tests/oracle): score desc, then POS asc,
then forward strand first. Second-best is the best score at a *distinct
locus* — |POS − best_POS| > exclusion radius — so shifted/compensating-gap
echoes of the best alignment don't masquerade as competing loci.
MAPQ formula lives here (PARITY-TODO, config.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from urmap_tpu.config import MapConfig
from urmap_tpu.map.dp import NEG
from urmap_tpu.map.seed import SENTINEL


def select_hits(pos, scores, strands, valid, lengths, ungapped, *, mc: MapConfig, k: int):
    """Combine per-read candidates into final mapping calls.

    Args:
      pos: int32[B, C] candidate alignment POS (global, DP start-tracked).
      scores: int32[B, C] DP scores.
      strands: int32[B, C] 0 fwd / 1 rc.
      valid: bool[B, C].
      lengths: int32[B] read lengths.
      ungapped: int32[B, C] ungapped rescore at pos.
      mc, k: config (static).

    Returns dict of per-read arrays: mapped, pos, strand, score, second,
    mapq, gapped (CIGAR needs traceback).
    """
    B, C = pos.shape
    neg = jnp.int32(NEG)
    scores = jnp.where(valid, scores, neg)
    pos = jnp.where(valid, pos, SENTINEL)

    # canonical best: score desc, then pos asc, then strand asc — as
    # cascaded lane reductions instead of a 4-operand lax.sort (the sort
    # lowered ~10× slower than everything select computes; only row 0 of
    # it was ever read). Tie order matches the sort exactly.
    best_score = jnp.max(scores, axis=-1)
    at_best = scores == best_score[:, None]
    best_pos = jnp.min(jnp.where(at_best, pos, SENTINEL), axis=-1)
    at_best &= pos == best_pos[:, None]
    best_strand = jnp.min(jnp.where(at_best, strands, 2), axis=-1)
    at_best &= strands == best_strand[:, None]
    # stable residual tie (same score/pos/strand, different ungapped):
    # the sort kept the FIRST such candidate — argmax picks it too
    first = jnp.argmax(at_best, axis=-1)
    best_ung = jnp.take_along_axis(ungapped, first[:, None], axis=-1)[:, 0]

    radius = jnp.int32(mc.max_read_len)
    distinct = (jnp.abs(pos - best_pos[:, None]) > radius) & (scores > neg)
    second = jnp.max(jnp.where(distinct, scores, neg), axis=-1)

    min_score = jnp.ceil(mc.min_score_frac * lengths.astype(jnp.float32)).astype(jnp.int32)
    mapped = (best_score > neg) & (best_score >= min_score) & (lengths >= k)

    # MAPQ = clip(round(scale * (best - second)), 0, max); no competing
    # locus → max. PARITY-TODO (config.py).
    gap = (best_score - second).astype(jnp.float32)
    mapq = jnp.clip(jnp.round(mc.mapq_scale * gap), 0, mc.max_mapq).astype(jnp.int32)
    mapq = jnp.where(second <= neg // 2, mc.max_mapq, mapq)
    mapq = jnp.where(mapped, mapq, 0)

    return {
        "mapped": mapped,
        "pos": best_pos,
        "strand": best_strand.astype(jnp.int32),
        "score": best_score,
        "second": second,
        "mapq": mapq,
        "gapped": mapped & (best_ung < best_score),
        "ungapped": best_ung,
    }
