"""On-device UFI index build: k-mer extract → sort → CSR.

The reference's builder is a two-pass counting sort over the genome on the
host CPU (SURVEY.md §3.1). The TPU-native redesign runs the hot part as
one jitted XLA pipeline: vectorized word extraction (hashing.extract_words
— k fused shift/or passes over the code array), ``jax.lax.sort`` of
(slot, position) pairs, then CSR offsets via vectorized binary search.
Repeat capping (the reference's high-frequency-word cap / pinned seeds,
Edgar 2020 Methods) keeps the first ``max_positions_per_slot`` positions
of each slot.

Large genomes are processed in overlapping chunks whose sorted runs are
merged host-side, so device memory bounds chunk size, not genome size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from urmap_tpu.config import IndexConfig
from urmap_tpu.hashing import extract_words, words_to_slots
from urmap_tpu.index.store import UfiIndex
from urmap_tpu.io.fasta import SeqDB

# Max genome positions sorted in one device call (chunking unit). 64M
# (slot,pos) pairs = 512 MB of sort traffic — comfortable in 16 GB HBM.
DEFAULT_CHUNK = 64 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("k", "slot_bits"))
def _chunk_sorted_slots(codes, base_pos, k: int, slot_bits: int):
    """One chunk: codes uint8[n] → (sorted slots uint32, positions uint32).

    Invalid words (containing N) get sentinel slot 2**slot_bits and sort
    to the tail, where the host trims them.
    """
    lo, hi, valid = extract_words(codes, k)
    slots = words_to_slots(lo, hi, slot_bits)
    sentinel = jnp.uint32(1 << slot_bits)
    slots = jnp.where(valid, slots, sentinel)
    n = slots.shape[0]
    pos = (jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(base_pos))
    slots_s, pos_s = jax.lax.sort((slots, pos), num_keys=2)
    return slots_s, pos_s


def _merge_sorted_runs(runs: list[tuple[np.ndarray, np.ndarray]]):
    """Merge per-chunk (slot, pos) runs, each sorted by (slot, pos).

    Chunks are produced in ascending-position order, so one STABLE sort
    on slots alone re-establishes (slot, pos) order — equal slots keep
    (chunk, within-chunk) order, which is ascending pos. Half the cost
    of a two-key lexsort on multi-G-position genomes."""
    if len(runs) == 1:
        return runs[0]
    slots = np.concatenate([r[0] for r in runs])
    pos = np.concatenate([r[1] for r in runs])
    order = np.argsort(slots, kind="stable")
    return slots[order], pos[order]


def _cap_slots(slots: np.ndarray, pos: np.ndarray, num_slots: int, cap: int):
    """Cap each slot to ≤ `cap` positions, subsampled EVENLY across the
    slot's run (store.evenly_cap_runs — unbiased in genome position).
    Returns capped (slots, pos, offsets[int32 num_slots+1])."""
    from urmap_tpu.index.store import evenly_cap_runs

    offsets64 = np.searchsorted(slots, np.arange(num_slots + 1, dtype=np.int64))
    counts = offsets64[1:] - offsets64[:-1]
    if cap > 0 and int(counts.max(initial=0)) > cap:
        keep = evenly_cap_runs(counts, cap)
        slots, pos = slots[keep], pos[keep]
        offsets64 = np.zeros(num_slots + 1, np.int64)
        np.cumsum(np.minimum(counts, cap), out=offsets64[1:])
    if slots.shape[0] >= (1 << 31):
        raise ValueError(
            f"{slots.shape[0]} positions exceed int32 CSR range; raise "
            "max_positions_per_slot capping or shard the index (dist/)"
        )
    return slots, pos, offsets64.astype(np.int32)


def _host_sorted_slots(codes: np.ndarray, k: int, slot_bits: int):
    """Host (numpy) build path: same (slot, pos) pairs as the device
    path, sorted by (slot, pos). Used when the device compile cost isn't
    worth it (small genomes, benchmarks, environments where XLA compiles
    are remote/uncached)."""
    from urmap_tpu.hashing import extract_words_np, words_to_slots_np

    lo, hi, valid = extract_words_np(codes, k)
    slots = words_to_slots_np(lo, hi, slot_bits)
    pos = np.nonzero(valid)[0].astype(np.uint32)
    slots = slots[valid]
    order = np.argsort(slots, kind="stable")  # stable ⇒ pos ascending
    return slots[order], pos[order]


def build_index(seqdb: SeqDB, cfg: IndexConfig | None = None, *,
                chunk: int = DEFAULT_CHUNK,
                backend: str = "device") -> UfiIndex:
    """Build the UFI index for a SeqDB. ``cfg=None`` auto-sizes slot_bits
    from the genome length. ``backend``: "device" (XLA sort pipeline) or
    "host" (numpy twin — bit-identical output)."""
    if cfg is None:
        cfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(seqdb.total_len))
    codes = seqdb.codes
    n_words = codes.shape[0] - cfg.k + 1
    if n_words <= 0:
        raise ValueError("genome shorter than k")

    if backend == "host":
        slots, pos = _host_sorted_slots(codes, cfg.k, cfg.slot_bits)
        slots, pos, offsets = _cap_slots(slots, pos, cfg.num_slots,
                                         cfg.max_positions_per_slot)
        return UfiIndex(config=cfg, offsets=offsets,
                        positions=pos.astype(np.uint32), seqdb=seqdb)

    runs: list[tuple[np.ndarray, np.ndarray]] = []
    start = 0
    while start < n_words:
        stop = min(start + chunk, n_words)
        # chunk covers word starts [start, stop) → needs codes[start : stop+k-1]
        sl, po = _chunk_sorted_slots(
            jnp.asarray(codes[start : stop + cfg.k - 1]),
            start, cfg.k, cfg.slot_bits,
        )
        sl = np.asarray(sl)
        po = np.asarray(po)
        nvalid = np.searchsorted(sl, np.uint32(1 << cfg.slot_bits))
        runs.append((sl[:nvalid], po[:nvalid]))
        start = stop

    slots, pos = _merge_sorted_runs(runs)
    slots, pos, offsets = _cap_slots(slots, pos, cfg.num_slots, cfg.max_positions_per_slot)
    return UfiIndex(config=cfg, offsets=offsets, positions=pos.astype(np.uint32), seqdb=seqdb)
