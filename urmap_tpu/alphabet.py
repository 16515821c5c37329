"""Nucleotide alphabet: char ↔ 2-bit code tables, reverse complement.

Analog of the reference's alphabet layer (SURVEY.md §2.3: char↔letter maps,
N handling, complement tables). Codes:

    A=0, C=1, G=2, T/U=3                 (2-bit payload)
    genome N / ambiguity codes → 4       (never matches anything)
    read   N / ambiguity codes → 5       (never matches anything, incl. 4)

Distinct sentinel codes for genome-N vs read-N guarantee N≠N mismatches on
both sides without a separate validity mask in the verify kernels.
Case-insensitive (soft-masked lowercase accepted).
"""

from __future__ import annotations

import numpy as np

A, C, G, T = 0, 1, 2, 3
GENOME_N = 4
READ_N = 5
NUM_CODES = 6

_CODE_TO_CHAR = np.frombuffer(b"ACGTNN", dtype=np.uint8)


def _build_char_table(n_code: int) -> np.ndarray:
    tbl = np.full(256, n_code, dtype=np.uint8)
    for chars, code in (("Aa", A), ("Cc", C), ("Gg", G), ("TtUu", T)):
        for ch in chars:
            tbl[ord(ch)] = code
    return tbl


CHAR_TO_CODE_GENOME = _build_char_table(GENOME_N)
CHAR_TO_CODE_READ = _build_char_table(READ_N)

# Complement in code space: A↔T, C↔G; N sentinels map to themselves.
COMP_CODE = np.array([T, G, C, A, GENOME_N, READ_N], dtype=np.uint8)


def encode(seq: bytes | str | np.ndarray, *, is_genome: bool) -> np.ndarray:
    """ASCII sequence → uint8 code array."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    if isinstance(seq, (bytes, bytearray, memoryview)):
        seq = np.frombuffer(bytes(seq), dtype=np.uint8)
    tbl = CHAR_TO_CODE_GENOME if is_genome else CHAR_TO_CODE_READ
    return tbl[seq]


def decode(codes: np.ndarray) -> str:
    """uint8 code array → ASCII string (both N sentinels print as 'N')."""
    return _CODE_TO_CHAR[np.asarray(codes, dtype=np.uint8)].tobytes().decode("ascii")


def revcomp(codes: np.ndarray) -> np.ndarray:
    """Reverse complement in code space (host/numpy)."""
    return COMP_CODE[np.asarray(codes, dtype=np.uint8)][::-1]


def revcomp_str(seq: str) -> str:
    return decode(revcomp(encode(seq, is_genome=False)))
