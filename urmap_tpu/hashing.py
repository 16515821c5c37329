"""K-mer word extraction and hashing (shared by index build and query).

The reference builds a hashed word→positions table over the genome
(SURVEY.md §2.6); word hashing must be identical at build and lookup time.
Design choice (TPU-first, differs from the reference's implementation):
the hash is *lossy* — a k-mer (≤32 bases, 2 bits each, held as a
(hi, lo) uint32 pair) is avalanched to a ``slot_bits``-bit slot with no
stored key. Hash collisions only add candidate positions, which the
ungapped/gapped verification stage rejects, so correctness never depends
on the hash — only the candidate load does.

All ops are uint32 with wraparound semantics and run identically under
jax.numpy on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_K = 32


def extract_words(codes, k: int):
    """Slide a k-window over a code array.

    Args:
      codes: uint8[N] nucleotide codes (alphabet.py).
      k: word length (static Python int, ≤ 32).

    Returns:
      (lo, hi, valid): lo=uint32[N-k+1] last min(k,16) bases (2 bits each,
      first base most significant), hi=uint32[N-k+1] earlier bases, valid=
      bool[N-k+1] true iff all k bases are ACGT.
    """
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")
    n = codes.shape[0] - k + 1
    if n <= 0:
        raise ValueError(f"sequence shorter than k={k}")
    lo = jnp.zeros((n,), jnp.uint32)
    hi = jnp.zeros((n,), jnp.uint32)
    valid = jnp.ones((n,), jnp.bool_)
    lo_bases = min(k, 16)
    for i in range(k):  # static unroll; XLA fuses the passes
        c = codes[i : i + n]
        valid = valid & (c < 4)
        c32 = (c & 3).astype(jnp.uint32)
        if i < k - lo_bases:
            hi = (hi << 2) | c32
        else:
            lo = (lo << 2) | c32
    return lo, hi, valid


def hash_words(lo, hi):
    """Avalanche a (hi, lo) word pair to a well-mixed uint32 (murmur3
    fmix32-style). Identical build/query hashing is the only requirement;
    the constants are ours, not the reference's (lossy-hash design)."""
    lo = lo.astype(jnp.uint32)
    hi = hi.astype(jnp.uint32)
    h = lo * jnp.uint32(0x9E3779B1)
    h = h ^ (hi * jnp.uint32(0x85EBCA6B))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def words_to_slots(lo, hi, slot_bits: int):
    """Hash words and reduce to [0, 2**slot_bits) slot ids (uint32)."""
    return hash_words(lo, hi) & jnp.uint32((1 << slot_bits) - 1)


def extract_words_np(codes: np.ndarray, k: int):
    """Host (numpy) twin of extract_words — identical outputs, uint32
    wraparound semantics. Used by the host index-build backend.

    Fast path for k % 4 == 0: pre-pack 4-base bytes (3 passes), then
    combine k/4 byte groups (8-bit shifts) — ~2.5× fewer passes over the
    genome than the per-base loop. Bit-identical to the generic loop
    (tested in tests/unit/test_hashing.py)."""
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")
    n = codes.shape[0] - k + 1
    if n <= 0:
        raise ValueError(f"sequence shorter than k={k}")
    lo_bases = min(k, 16)
    if k % 4 == 0 and (k - lo_bases) % 4 == 0 and k >= 4:
        m = codes.shape[0] - 3            # 4-base groups start count
        c3 = (codes & np.uint8(3)).astype(np.uint32)  # N codes → 2-bit lane
        b4 = c3[0:m] << np.uint32(6)
        b4 |= c3[1 : m + 1] << np.uint32(4)
        b4 |= c3[2 : m + 2] << np.uint32(2)
        b4 |= c3[3 : m + 3]
        v4 = ((codes[0:m] | codes[1 : m + 1]
               | codes[2 : m + 2] | codes[3 : m + 3]) < 4)
        hi = np.zeros(n, np.uint32)
        lo = np.zeros(n, np.uint32)
        valid = np.ones(n, np.bool_)
        ng_hi = (k - lo_bases) // 4
        ng = k // 4
        for g in range(ng):
            grp = b4[4 * g : 4 * g + n]
            valid &= v4[4 * g : 4 * g + n]
            if g < ng_hi:
                hi = (hi << np.uint32(8)) | grp
            else:
                lo = (lo << np.uint32(8)) | grp
        return lo, hi, valid
    lo = np.zeros(n, np.uint32)
    hi = np.zeros(n, np.uint32)
    valid = np.ones(n, np.bool_)
    for i in range(k):
        c = codes[i : i + n]
        valid &= c < 4
        c32 = (c & 3).astype(np.uint32)
        if i < k - lo_bases:
            hi = (hi << np.uint32(2)) | c32
        else:
            lo = (lo << np.uint32(2)) | c32
    return lo, hi, valid


def hash_words_np(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Host twin of hash_words (bit-identical)."""
    lo = lo.astype(np.uint32)
    hi = hi.astype(np.uint32)
    with np.errstate(over="ignore"):
        h = lo * np.uint32(0x9E3779B1)
        h ^= hi * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x7FEB352D)
        h ^= h >> np.uint32(15)
        h *= np.uint32(0x846CA68B)
        h ^= h >> np.uint32(16)
    return h


def words_to_slots_np(lo, hi, slot_bits: int) -> np.ndarray:
    return hash_words_np(lo, hi) & np.uint32((1 << slot_bits) - 1)


def kmer_to_word(codes: np.ndarray) -> tuple[int, int]:
    """Host helper: one k-mer code array → (lo, hi) ints (tests/tools)."""
    k = len(codes)
    lo_bases = min(k, 16)
    lo = 0
    hi = 0
    for i, c in enumerate(np.asarray(codes, dtype=np.uint64)):
        if i < k - lo_bases:
            hi = ((hi << 2) | int(c & 3)) & 0xFFFFFFFF
        else:
            lo = ((lo << 2) | int(c & 3)) & 0xFFFFFFFF
    return lo, hi
