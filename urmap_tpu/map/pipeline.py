"""The jitted per-batch mapping pipeline (single-end core).

One fixed-shape XLA program per batch (SURVEY.md §3.3):

    reads uint8[B, L] ──┬─ fwd ─┐
                        └─ rc ──┴→ seeds → CSR gather → vote → top-V cands
                                  → banded DP (scores + start offsets)
                                  → select (best/second, MAPQ)

Both strands ride one [2B] batch. The index tables and genome stay
HBM-resident across batches (donated nothing; pure function of inputs).
Paired-end pairing/rescue composes on top in map/pair.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.map.dp import banded_semiglobal
from urmap_tpu.map.seed import (SENTINEL, extract_seed_slots,
                                gather_candidates, vote_top_candidates)
from urmap_tpu.map.select import select_hits

_COMP = np.asarray(alphabet.COMP_CODE)


def revcomp_batch(reads, lengths):
    """Per-row reverse complement of the first len codes (pad stays put)."""
    B, L = reads.shape
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    lens = lengths[:, None]
    idx = jnp.where(i < lens, lens - 1 - i, i)
    flipped = jnp.take_along_axis(reads, idx, axis=1)
    return jnp.take(jnp.asarray(_COMP), flipped.astype(jnp.int32), axis=0)


@dataclass
class MapResult:
    """Host-side mapping results for one batch (numpy arrays, length B)."""

    mapped: np.ndarray   # bool
    pos: np.ndarray      # int64 global alignment start
    strand: np.ndarray   # int32, 0 fwd / 1 rc
    score: np.ndarray    # int32
    second: np.ndarray   # int32 (NEG-ish if none)
    mapq: np.ndarray     # int32
    gapped: np.ndarray   # bool: CIGAR needs traceback (else all-M)
    lengths: np.ndarray  # int32
    ungapped: np.ndarray | None = None  # int32 M-only rescore at pos

    @classmethod
    def from_device(cls, out: dict, lengths) -> "MapResult":
        return cls(
            mapped=np.asarray(out["mapped"]),
            pos=np.asarray(out["pos"], dtype=np.int64),
            strand=np.asarray(out["strand"]),
            score=np.asarray(out["score"]),
            second=np.asarray(out["second"]),
            mapq=np.asarray(out["mapq"]),
            gapped=np.asarray(out["gapped"]),
            lengths=np.asarray(lengths),
            ungapped=(np.asarray(out["ungapped"])
                      if "ungapped" in out else None),
        )


def candidates_batch_device(tables, reads, lengths, *, icfg: IndexConfig,
                            mcfg: MapConfig, sc: ScoreConfig):
    """Seed → vote → banded DP for one batch; both strands.

    Returns a dict of per-read candidate arrays [B, 2V] (fwd candidates in
    columns [:V], rc in [V:]): pos (DP start-tracked), score, strand,
    valid, ungapped. Shared by single-end select and paired-end pairing.
    """
    B, L = reads.shape
    q, p, v = mcfg.seeds_per_read, mcfg.positions_per_seed, mcfg.top_candidates

    rc = revcomp_batch(reads, lengths)
    reads2 = jnp.concatenate([reads, rc], axis=0)          # [2B, L]
    lengths2 = jnp.concatenate([lengths, lengths], axis=0)  # [2B]

    slots, offs, valid = extract_seed_slots(
        reads2, lengths2, k=icfg.k, q=q, slot_bits=icfg.slot_bits)
    cand = gather_candidates(
        tables["offsets"], tables["positions"], slots, offs, valid, p=p)
    top_cand, votes = vote_top_candidates(cand, v=v)        # [2B, V]

    flat_cand = top_cand.reshape(-1)                         # [2B*V]
    flat_reads = jnp.repeat(reads2, v, axis=0)
    flat_lens = jnp.repeat(lengths2, v, axis=0)
    scores, d0, ungapped = banded_semiglobal(
        tables["genome"], jnp.where(flat_cand == SENTINEL, 0, flat_cand),
        flat_reads, flat_lens, hw=mcfg.band_halfwidth, sc=sc)

    # fold strands back: candidates for read b are rows b (fwd) and B+b (rc)
    def fold(x):
        x = x.reshape(2, B, v)
        return jnp.concatenate([x[0], x[1]], axis=1)        # [B, 2V]

    cand_f = fold(top_cand)
    scores_f = fold(scores.reshape(2 * B, v))
    d0_f = fold(d0.reshape(2 * B, v))
    ung_f = fold(ungapped.reshape(2 * B, v))
    strands = jnp.concatenate([
        jnp.zeros((B, v), jnp.int32), jnp.ones((B, v), jnp.int32)], axis=1)

    return {
        "pos": cand_f + d0_f,
        "score": scores_f,
        "strand": strands,
        "valid": cand_f != SENTINEL,
        "ungapped": ung_f,
    }


def map_batch_device(tables, reads, lengths, *, icfg: IndexConfig,
                     mcfg: MapConfig, sc: ScoreConfig):
    """Pure jnp mapping step. tables: dict(offsets, positions, genome)."""
    c = candidates_batch_device(tables, reads, lengths, icfg=icfg,
                                mcfg=mcfg, sc=sc)
    return select_hits(c["pos"], c["score"], c["strand"], c["valid"],
                       lengths, c["ungapped"], mc=mcfg, k=icfg.k)


def make_map_batch_fn(icfg: IndexConfig, mcfg: MapConfig,
                      sc: ScoreConfig | None = None):
    """Returns jitted fn(tables, reads, lengths) → device output dict."""
    sc = sc or ScoreConfig()
    fn = functools.partial(map_batch_device, icfg=icfg, mcfg=mcfg, sc=sc)
    return jax.jit(fn)


def revcomp_strand_codes(codes: np.ndarray, result: MapResult) -> np.ndarray:
    """Host helper: strand-applied read codes (rc rows reversed-complemented
    in place of the original) for CIGAR recomputation / verification."""
    sel = np.asarray(result.mapped & (result.strand == 1))
    if not sel.any():
        return codes
    out = codes.copy()
    sub = codes[sel]
    lens = np.asarray(result.lengths)[sel][:, None]
    i = np.arange(codes.shape[1])[None, :]
    idx = np.where(i < lens, lens - 1 - i, i)
    out[sel] = _COMP[np.take_along_axis(sub, idx, axis=1)]
    return out


class Mapper:
    """Convenience host wrapper: holds device tables + jitted step, maps
    host batches. (The CLI and tests drive this; dist/ wraps the sharded
    version.)"""

    def __init__(self, index, mcfg: MapConfig | None = None,
                 sc: ScoreConfig | None = None):
        self.index = index
        self.icfg = index.config
        self.mcfg = mcfg or MapConfig()
        self.sc = sc or ScoreConfig()
        self.tables = index.device_tables()
        self._fn = make_map_batch_fn(self.icfg, self.mcfg, self.sc)

    def map_codes(self, codes: np.ndarray, lengths: np.ndarray) -> MapResult:
        B = codes.shape[0]
        pad = 0
        bs = self.mcfg.batch_size
        if B % bs and B > bs:
            pad = bs - B % bs
        elif B < bs:
            pad = bs - B
        if pad:
            codes = np.concatenate(
                [codes, np.full((pad, codes.shape[1]), alphabet.READ_N, np.uint8)])
            lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
        outs = []
        for s in range(0, codes.shape[0], bs):
            out = self._fn(self.tables, jnp.asarray(codes[s : s + bs]),
                           jnp.asarray(lengths[s : s + bs]))
            outs.append(out)
        merged = {k: np.concatenate([np.asarray(o[k]) for o in outs])[:B]
                  for k in outs[0]}
        return MapResult.from_device(merged, lengths[:B])
