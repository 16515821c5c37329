"""FASTA reader and SeqDB: the in-memory reference genome.

Analog of the reference's SeqDB layer (SURVEY.md §2.4): labels, lengths,
and the concatenated genome as one code array, plus global↔(ref, local)
coordinate mapping. Sequences are concatenated with a run of genome-N
codes between them so that no indexable k-mer or high-scoring alignment
spans a sequence boundary (N never matches; see alphabet.py).
"""

from __future__ import annotations

import gzip
import io as _io
import os
from dataclasses import dataclass, field

import numpy as np

from urmap_tpu import alphabet

# Separator of N codes between concatenated sequences. Must be ≥ the
# largest word length (32) so no valid k-mer spans two sequences; larger
# also pads verify windows so near-boundary gathers stay in-bounds cheaply.
SEPARATOR_LEN = 64


def _open_maybe_gzip(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")
    return f


@dataclass
class SeqDB:
    """Concatenated genome + per-sequence metadata.

    Attributes:
      labels: sequence names (first whitespace-delimited token of header).
      starts: int64[num_seqs] global start of each sequence in ``codes``.
      lengths: int64[num_seqs] sequence lengths.
      codes: uint8[total] concatenated nucleotide codes with N separators
        (and SEPARATOR_LEN of leading/trailing N padding).
    """

    labels: list[str] = field(default_factory=list)
    starts: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    lengths: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    codes: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))

    @property
    def num_seqs(self) -> int:
        return len(self.labels)

    @property
    def total_len(self) -> int:
        return int(self.codes.shape[0])

    @classmethod
    def from_fasta(cls, path: str) -> "SeqDB":
        """Whole-file parse. Hot path: one C pass (codecs.cpp
        urmap_parse_fasta) strips whitespace, encodes, and writes the
        codes straight into the final concatenated layout (~30× the
        translate-then-encode Python path at GRCh38 scale, mostly by
        skipping the per-record temporaries). Python fallback: record
        split + bytes.translate whitespace strip."""
        with _open_maybe_gzip(path) as f:
            if isinstance(f, gzip.GzipFile):
                data = np.frombuffer(f.read(), np.uint8)
            else:
                # read into bigmem storage: a fresh multi-GB bytes
                # object costs ~10 s/GB of page faults on this VM class
                from urmap_tpu.utils.bigmem import big_empty

                size = os.fstat(f.fileno()).st_size
                data = big_empty(size, np.uint8)
                if f.readinto(data) != size:
                    raise IOError(f"{path}: short read")
        db = cls._from_fasta_native(data, path)
        if db is not None:
            return db
        data = data.tobytes()                     # rare fallback path
        head = data.lstrip()
        if not head.startswith(b">"):
            snippet = head[:20]
            raise ValueError(
                f"{path}: sequence data before first header "
                f"(starts {snippet!r})")
        labels: list[str] = []
        seqs: list[bytes] = []
        start = data.index(b">")
        parts = data[start + 1:].split(b"\n>")
        del data
        ws = b"\r\n\t "
        for part in parts:
            nl = part.find(b"\n")
            if nl < 0:
                header, body = part, b""
            else:
                header, body = part[:nl], part[nl + 1:]
            header = header.strip()
            if not header:
                raise ValueError(f"{path}: empty FASTA header")
            labels.append(header.split()[0].decode("ascii"))
            seqs.append(body.translate(None, delete=ws))
        if not labels:
            raise ValueError(f"{path}: no FASTA records")
        return cls.from_seqs(labels, seqs)

    @classmethod
    def _from_fasta_native(cls, data: np.ndarray,
                           path: str) -> "SeqDB | None":
        """C parser fast path (data = uint8 view of the file bytes);
        None → caller uses the Python path (which also produces the
        precise error messages on malformed input)."""
        import ctypes
        import os as _os

        if _os.environ.get("URMAP_NO_NATIVE_BUILD"):
            return None
        from urmap_tpu.io import native

        nlib = native.lib()
        if nlib is None:
            return None
        from urmap_tpu.utils.bigmem import big_empty

        n = int(data.shape[0])
        # count '>' in bounded windows — a whole-file `data == ord('>')`
        # temp would be a fresh multi-GB bool array (page-fault tax)
        gt = np.uint8(ord(">"))
        max_rec = max(
            sum(int(np.count_nonzero(data[s : s + (1 << 26)] == gt))
                for s in range(0, n, 1 << 26)), 1)
        codes = big_empty(n + (max_rec + 1) * SEPARATOR_LEN, np.uint8)
        seq_start = np.empty(max_rec, np.int64)
        seq_len = np.empty(max_rec, np.int64)
        head_off = np.empty(max_rec, np.int64)
        head_len = np.empty(max_rec, np.int64)
        clen = np.zeros(1, np.int64)
        nrec = nlib.urmap_parse_fasta(
            ctypes.cast(data.ctypes.data, native.p_char), n,
            SEPARATOR_LEN, max_rec,
            codes.ctypes.data_as(native.p_u8),
            seq_start.ctypes.data_as(native.p_i64),
            seq_len.ctypes.data_as(native.p_i64),
            head_off.ctypes.data_as(native.p_i64),
            head_len.ctypes.data_as(native.p_i64),
            clen.ctypes.data_as(native.p_i64))
        if nrec <= 0:
            return None                          # Python path raises
        labels = [
            data[head_off[i] : head_off[i] + head_len[i]]
            .tobytes().split()[0].decode("ascii")
            for i in range(nrec)
        ]
        return cls(labels=labels,
                   starts=seq_start[:nrec].copy(),
                   lengths=seq_len[:nrec].copy(),
                   codes=codes[: int(clen[0])])

    @classmethod
    def from_seqs(cls, labels: list[str], seqs: list[bytes | str]) -> "SeqDB":
        """Build from in-memory sequences (tests, synthetic genomes)."""
        sep = np.full(SEPARATOR_LEN, alphabet.GENOME_N, np.uint8)
        parts = [sep]
        starts = np.zeros(len(seqs), np.int64)
        lengths = np.zeros(len(seqs), np.int64)
        pos = SEPARATOR_LEN
        for i, s in enumerate(seqs):
            codes = (
                np.asarray(s, dtype=np.uint8)
                if isinstance(s, np.ndarray)
                else alphabet.encode(s, is_genome=True)
            )
            starts[i] = pos
            lengths[i] = codes.shape[0]
            parts.append(codes)
            parts.append(sep)
            pos += codes.shape[0] + SEPARATOR_LEN
        return cls(
            labels=list(labels),
            starts=starts,
            lengths=lengths,
            codes=np.concatenate(parts),
        )

    # -- coordinate mapping -------------------------------------------------

    def global_to_local(self, gpos) -> tuple[np.ndarray, np.ndarray]:
        """Global position(s) → (ref_id, 0-based local offset). Positions in
        separator runs map to the preceding sequence (offset may be out of
        [0, length) — callers clamp/flag)."""
        gpos = np.asarray(gpos, dtype=np.int64)
        ref_id = np.searchsorted(self.starts, gpos, side="right") - 1
        ref_id = np.clip(ref_id, 0, max(self.num_seqs - 1, 0))
        return ref_id, gpos - self.starts[ref_id]

    def local_to_global(self, ref_id: int, local: int) -> int:
        return int(self.starts[ref_id]) + int(local)

    def get_seq_codes(self, ref_id: int) -> np.ndarray:
        s = int(self.starts[ref_id])
        return self.codes[s : s + int(self.lengths[ref_id])]

    # -- (de)serialization (stored inside the index directory) ---------------

    def save(self, path: str) -> None:
        """Raw .npy members beside a small json — the multi-GB codes
        array mmaps straight back in at load (npz members can't mmap,
        and the zip CRC pass costs minutes at GRCh38 scale). ``path``
        keeps its historical '<x>.npz' name but is a directory."""
        import json

        if os.path.isfile(path):
            os.remove(path)                       # format-v1 file
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"labels": self.labels,
                       "starts": [int(x) for x in self.starts],
                       "lengths": [int(x) for x in self.lengths]}, f)
        # temp + replace: self.codes may be an mmap of this very file
        # (re-save of a loaded SeqDB); see UfiIndex.save
        tmp = os.path.join(path, f".codes.{os.getpid()}.tmp.npy")
        np.save(tmp, self.codes)
        os.replace(tmp, os.path.join(path, "codes.npy"))

    @classmethod
    def load(cls, path: str) -> "SeqDB":
        import json

        if os.path.isdir(path):
            with open(os.path.join(path, "meta.json")) as f:
                meta = json.load(f)
            return cls(
                labels=list(meta["labels"]),
                starts=np.asarray(meta["starts"], np.int64),
                lengths=np.asarray(meta["lengths"], np.int64),
                codes=np.load(os.path.join(path, "codes.npy"),
                              mmap_mode="r"),
            )
        # format v1: single npz file
        with np.load(path, allow_pickle=True) as z:
            return cls(
                labels=[str(x) for x in z["labels"]],
                starts=z["starts"],
                lengths=z["lengths"],
                codes=z["codes"],
            )
