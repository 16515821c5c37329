"""Buffered FASTQ batch reader (single- and paired-end).

Analog of the reference's streaming FASTQ source (SURVEY.md §2.5), but
batch-oriented: the mapping pipeline consumes fixed-shape device batches,
so the reader parses B records at a time into padded code arrays. Quality
strings are kept as raw bytes for SAM passthrough. Reads longer than
``max_read_len`` are truncated (tail soft-clipped by the caller).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.io.fasta import _open_maybe_gzip


@dataclass
class ReadBatch:
    """A host-side batch of reads, ready for device upload.

    codes: uint8[B, L] padded nucleotide codes (pad value READ_N).
    lengths: int32[B] true (possibly truncated) read lengths.
    names: list[B] of str (QNAME, '@' and trailing /1 /2 stripped).
    seqs / quals: raw ASCII bytes per read (SAM passthrough).
    """

    codes: np.ndarray
    lengths: np.ndarray
    names: list[str]
    seqs: list[bytes]
    quals: list[bytes]

    def __len__(self) -> int:
        return len(self.names)


def _strip_pair_suffix(name: str) -> str:
    if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
        return name[:-2]
    return name


class _FastqStream:
    def __init__(self, path: str):
        self.path = path
        self._f = _open_maybe_gzip(path)
        self._lineno = 0

    def close(self) -> None:
        self._f.close()

    def next_record(self) -> tuple[str, bytes, bytes] | None:
        """Returns (name, seq, qual) or None at EOF."""
        hdr = self._f.readline()
        if not hdr:
            return None
        seq = self._f.readline()
        plus = self._f.readline()
        qual = self._f.readline()
        self._lineno += 4
        if not qual:
            raise ValueError(f"{self.path}: truncated FASTQ record at line {self._lineno}")
        hdr = hdr.strip()
        if not hdr.startswith(b"@"):
            raise ValueError(f"{self.path}: bad FASTQ header at line {self._lineno - 3}")
        if not plus.startswith(b"+"):
            raise ValueError(f"{self.path}: missing '+' line at line {self._lineno - 1}")
        name = _strip_pair_suffix(hdr[1:].split()[0].decode("ascii"))
        return name, seq.strip(), qual.strip()


class FastqReader:
    """Yields ReadBatch (single-end) or (ReadBatch, ReadBatch) pairs.

    Paired mode interleaves two synchronized files (the reference's
    ``-reverse`` second-file convention). The final batch is short, never
    padded with fake reads — device-side padding to a fixed batch size is
    the pipeline's job (it masks by count).
    """

    def __init__(self, path: str, reverse_path: str | None = None, *,
                 batch_size: int = 2048, max_read_len: int = 160):
        self.batch_size = batch_size
        self.max_read_len = max_read_len
        self._fwd = _FastqStream(path)
        self._rev = _FastqStream(reverse_path) if reverse_path else None

    @property
    def paired(self) -> bool:
        return self._rev is not None

    def _collect(self, stream: _FastqStream, n: int) -> ReadBatch | None:
        names: list[str] = []
        seqs: list[bytes] = []
        quals: list[bytes] = []
        for _ in range(n):
            rec = stream.next_record()
            if rec is None:
                break
            names.append(rec[0])
            seqs.append(rec[1])
            quals.append(rec[2])
        if not names:
            return None
        return self._pack(names, seqs, quals)

    def _pack(self, names, seqs, quals) -> ReadBatch:
        b = len(names)
        L = self.max_read_len
        codes = np.full((b, L), alphabet.READ_N, np.uint8)
        lengths = np.zeros(b, np.int32)
        for i, s in enumerate(seqs):
            m = min(len(s), L)
            codes[i, :m] = alphabet.encode(s[:m], is_genome=False)
            lengths[i] = m
        return ReadBatch(codes=codes, lengths=lengths, names=names, seqs=seqs, quals=quals)

    def __iter__(self) -> Iterator:
        try:
            while True:
                fwd = self._collect(self._fwd, self.batch_size)
                if self._rev is None:
                    if fwd is None:
                        return
                    yield fwd
                    continue
                rev = self._collect(self._rev, self.batch_size)
                if fwd is None and rev is None:
                    return
                if fwd is None or rev is None or len(fwd) != len(rev):
                    raise ValueError("paired FASTQ files out of sync (unequal record counts)")
                for i, (a, b) in enumerate(zip(fwd.names, rev.names)):
                    if a != b:
                        raise ValueError(f"paired FASTQ name mismatch: {a!r} vs {b!r} (record {i})")
                yield fwd, rev
        finally:
            self.close()

    def close(self) -> None:
        self._fwd.close()
        if self._rev is not None:
            self._rev.close()
