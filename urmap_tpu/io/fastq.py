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

    def take(self, rows: np.ndarray) -> "ReadBatch":
        """Row-subset view (multi-host global-mesh mapping: each host
        formats only the rows its devices own)."""
        return ReadBatch(
            codes=self.codes[rows],
            lengths=self.lengths[rows],
            names=[self.names[i] for i in rows],
            seqs=[self.seqs[i] for i in rows],
            quals=[self.quals[i] for i in rows],
        )


def _strip_pair_suffix(name: str) -> str:
    if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
        return name[:-2]
    return name


class _FastqStream:
    def __init__(self, path: str, byte_range: tuple[int, int] | None = None):
        self.path = path
        self._f = _open_maybe_gzip(path)
        self._lineno = 0
        self._limit = None
        if byte_range is not None:
            lo, hi = byte_range
            self._f.seek(lo)
            self._limit = hi

    def close(self) -> None:
        self._f.close()

    def next_record(self) -> tuple[str, bytes, bytes] | None:
        """Returns (name, seq, qual) or None at EOF."""
        if self._limit is not None and self._f.tell() >= self._limit:
            return None
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


class NativeReadBatch:
    """Zero-copy batch over a raw FASTQ chunk parsed by the C++ codec.

    Device-facing arrays (codes, lengths) are materialized; names/seqs/
    quals stay as (offset, len) spans into ``buf`` so the native SAM
    formatter never touches Python objects. The list properties exist
    only for compatibility with the Python formatting paths and tests.
    """

    __slots__ = ("buf", "codes", "lengths", "name_off", "name_len",
                 "seq_off", "seq_len", "qual_off", "_names", "_seqs",
                 "_quals")

    def __init__(self, buf, codes, lengths, name_off, name_len, seq_off,
                 seq_len, qual_off):
        self.buf = buf
        self.codes = codes
        self.lengths = lengths
        self.name_off = name_off
        self.name_len = name_len
        self.seq_off = seq_off
        self.seq_len = seq_len
        self.qual_off = qual_off
        self._names = self._seqs = self._quals = None

    def __len__(self) -> int:
        return self.codes.shape[0]

    def trim(self, r: int) -> "NativeReadBatch":
        """First ``r`` records as a new batch over the same buffer."""
        return NativeReadBatch(self.buf, self.codes[:r], self.lengths[:r],
                               self.name_off[:r], self.name_len[:r],
                               self.seq_off[:r], self.seq_len[:r],
                               self.qual_off[:r])

    def take(self, rows: np.ndarray) -> "NativeReadBatch":
        """Row subset over the same buffer (see ReadBatch.take)."""
        return NativeReadBatch(self.buf, self.codes[rows],
                               self.lengths[rows], self.name_off[rows],
                               self.name_len[rows], self.seq_off[rows],
                               self.seq_len[rows], self.qual_off[rows])

    def name_matrix(self) -> np.ndarray:
        """uint8[n, max_name_len] QNAME bytes (0-padded) — vectorized
        whole-batch name comparison for the paired desync guard."""
        n = len(self)
        if n == 0:
            return np.zeros((0, 0), np.uint8)
        arr = np.frombuffer(self.buf, np.uint8)
        w = int(self.name_len.max(initial=1))
        idx = self.name_off[:, None] + np.arange(w, dtype=np.int64)[None, :]
        m = arr[np.minimum(idx, arr.shape[0] - 1)]
        return np.where(np.arange(w)[None, :] < self.name_len[:, None], m, 0)

    @property
    def names(self) -> list[str]:
        if self._names is None:
            b = self.buf
            self._names = [
                bytes(b[o : o + l]).decode("ascii")
                for o, l in zip(self.name_off, self.name_len)]
        return self._names

    @property
    def seqs(self) -> list[bytes]:
        if self._seqs is None:
            b = self.buf
            self._seqs = [bytes(b[o : o + l])
                          for o, l in zip(self.seq_off, self.seq_len)]
        return self._seqs

    @property
    def quals(self) -> list[bytes]:
        if self._quals is None:
            b = self.buf
            self._quals = [bytes(b[o : o + l])
                           for o, l in zip(self.qual_off, self.seq_len)]
        return self._quals


class _NativeFastqStream:
    """Chunked reader: refills a byte buffer from the (possibly gzip)
    file and batch-parses it with urmap_parse_fastq."""

    CHUNK = 8 << 20

    def __init__(self, path: str, codec,
                 byte_range: tuple[int, int] | None = None):
        self.path = path
        self._codec = codec
        self._f = _open_maybe_gzip(path)
        self._buf = b""
        self._eof = False
        self._remaining = None
        if byte_range is not None:
            lo, hi = byte_range
            self._f.seek(lo)
            self._remaining = hi - lo

    def close(self) -> None:
        self._f.close()

    def next_batch(self, n: int, max_len: int) -> NativeReadBatch | None:
        import ctypes

        from urmap_tpu.io.native import p_i32, p_i64, p_u8

        codes = np.empty((n, max_len), np.uint8)
        lengths = np.empty(n, np.int32)
        name_off = np.empty(n, np.int64)
        name_len = np.empty(n, np.int32)
        seq_off = np.empty(n, np.int64)
        seq_len = np.empty(n, np.int32)
        qual_off = np.empty(n, np.int64)
        consumed = ctypes.c_int64(0)

        def ptr(a, t):
            return a.ctypes.data_as(t)

        # budget for n typical records; doubled below when the data
        # carries records larger than the estimate (long reads are
        # truncated to max_len at map time but must still parse + carry
        # their full text spans for SAM passthrough)
        need = n * (2 * max_len + 256)
        while True:
            while not self._eof and len(self._buf) < need:
                want = max(self.CHUNK, need)
                if self._remaining is not None:
                    want = min(want, self._remaining)
                chunk = self._f.read(want) if want > 0 else b""
                if not chunk:
                    self._eof = True
                    break
                if self._remaining is not None:
                    self._remaining -= len(chunk)
                self._buf = self._buf + chunk if self._buf else chunk
            if not self._buf:
                return None
            buf = self._buf
            rec = self._codec.urmap_parse_fastq(
                buf, len(buf), max_len, n, ptr(codes, p_u8),
                ptr(lengths, p_i32), ptr(name_off, p_i64),
                ptr(name_len, p_i32), ptr(seq_off, p_i64),
                ptr(seq_len, p_i32), ptr(qual_off, p_i64),
                ctypes.byref(consumed))
            if rec < 0:
                raise ValueError(
                    f"{self.path}: malformed FASTQ at byte {consumed.value}")
            if rec > 0:
                break
            # no complete record in the buffer yet
            if self._eof:
                if self._buf.strip():
                    raise ValueError(f"{self.path}: truncated FASTQ record")
                return None
            need = max(need * 2, len(self._buf) + self.CHUNK)
        self._buf = buf[consumed.value:]
        r = int(rec)
        return NativeReadBatch(buf, codes[:r], lengths[:r], name_off[:r],
                               name_len[:r], seq_off[:r], seq_len[:r],
                               qual_off[:r])

    def pushback(self, batch: NativeReadBatch, keep: int) -> None:
        """Return records [keep:] of the just-parsed batch to the stream
        (paired trim-and-carry when the two files' batch record counts
        differ — e.g. very long reads blowing one file's buffer budget)."""
        rec_start = int(batch.name_off[keep]) - 1  # '@' precedes the name
        self._buf = batch.buf[rec_start:]


class PrefetchIterator:
    """Wraps a batch iterator with a reader thread + bounded queue so
    file IO / parsing overlaps mapping (the C parser releases the GIL).

    The reference overlaps IO with its per-thread read loop (SURVEY.md
    §2.13); this is the batch-pipeline equivalent of that.

    ``transform`` (optional) is applied to each item ON THE PREFETCH
    THREAD before queueing — the map drive loops use it to pre-pack the
    H2D read upload (Mapper.prepack) off the dispatch thread, which is
    the e2e critical path (tools/bench_e2e_phases.py)."""

    _DONE = object()

    def __init__(self, it, depth: int = 2, transform=None):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._err = None

        def run():
            try:
                for item in it:
                    if transform is not None:
                        item = transform(item)
                    self._q.put(item)
            except BaseException as e:  # propagated to the consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


class FastqReader:
    """Yields ReadBatch (single-end) or (ReadBatch, ReadBatch) pairs.

    Paired mode interleaves two synchronized files (the reference's
    ``-reverse`` second-file convention). The final batch is short, never
    padded with fake reads — device-side padding to a fixed batch size is
    the pipeline's job (it masks by count).
    """

    def __init__(self, path: str, reverse_path: str | None = None, *,
                 batch_size: int = 2048, max_read_len: int = 160,
                 native: bool = True,
                 byte_range: tuple[int, int] | None = None,
                 reverse_byte_range: tuple[int, int] | None = None):
        """``byte_range``: parse only bytes [lo, hi) of ``path`` (must be
        record-aligned — dist.multihost.fastq_byte_ranges). Paired inputs
        additionally need ``reverse_byte_range`` cutting the second file
        at the SAME records (dist.multihost.paired_fastq_byte_ranges);
        the per-batch name guard aborts on any mismatch. Uncompressed
        inputs only."""
        self.batch_size = batch_size
        self.max_read_len = max_read_len
        if byte_range is not None and reverse_path is not None:
            assert reverse_byte_range is not None, \
                "paired byte ranges need both files' ranges"
        codec = None
        if native:
            from urmap_tpu.io import native as native_mod
            codec = native_mod.lib()
        self.native = codec is not None
        if self.native:
            self._fwd = _NativeFastqStream(path, codec, byte_range)
            self._rev = (_NativeFastqStream(reverse_path, codec,
                                            reverse_byte_range)
                         if reverse_path else None)
        else:
            self._fwd = _FastqStream(path, byte_range)
            self._rev = (_FastqStream(reverse_path, reverse_byte_range)
                         if reverse_path else None)

    @property
    def paired(self) -> bool:
        return self._rev is not None

    def _collect(self, stream, n: int):
        if self.native:
            return stream.next_batch(n, self.max_read_len)
        return self._collect_py(stream, n)

    def _collect_py(self, stream: _FastqStream, n: int) -> ReadBatch | None:
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
                if fwd is None or rev is None:
                    raise ValueError("paired FASTQ files out of sync (unequal record counts)")
                if self.native and len(fwd) != len(rev):
                    # differing counts are legitimate when oversized records
                    # blow one file's buffer budget: trim the longer batch
                    # and carry the remainder into the next iteration
                    r = min(len(fwd), len(rev))
                    if len(fwd) > r:
                        self._fwd.pushback(fwd, r)
                        fwd = fwd.trim(r)
                    else:
                        self._rev.pushback(rev, r)
                        rev = rev.trim(r)
                if len(fwd) != len(rev):
                    raise ValueError("paired FASTQ files out of sync (unequal record counts)")
                if self.native:
                    # full-batch vectorized name comparison (desync guard)
                    a, b = fwd.name_matrix(), rev.name_matrix()
                    if a.shape != b.shape or not np.array_equal(a, b):
                        if a.shape == b.shape:
                            bad = int(np.nonzero((a != b).any(axis=1))[0][0])
                        else:
                            bad = int(np.nonzero(
                                fwd.name_len != rev.name_len)[0][0])
                        raise ValueError(
                            "paired FASTQ name mismatch: "
                            f"{fwd.names[bad]!r} vs {rev.names[bad]!r} "
                            f"(record {bad})")
                else:
                    for i, (a, b) in enumerate(zip(fwd.names, rev.names)):
                        if a != b:
                            raise ValueError(
                                f"paired FASTQ name mismatch: {a!r} vs {b!r}"
                                f" (record {i})")
                yield fwd, rev
        finally:
            self.close()

    def close(self) -> None:
        self._fwd.close()
        if self._rev is not None:
            self._rev.close()
