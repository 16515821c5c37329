"""Shared test helpers: synthetic genomes and planted reads.

No genome data exists in this environment (SURVEY.md §4.2) — every test
synthesizes its inputs and plants reads at known loci.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.io.fasta import SeqDB


def random_seq(rng, n: int) -> str:
    return alphabet.decode(rng.integers(0, 4, size=n).astype(np.uint8))


def make_seqdb(rng, lengths: list[int]) -> SeqDB:
    labels = [f"chr{i + 1}" for i in range(len(lengths))]
    return SeqDB.from_seqs(labels, [random_seq(rng, n) for n in lengths])


@dataclass
class PlantedRead:
    codes: np.ndarray          # read codes as sequenced (strand applied)
    gpos: int                  # global genome pos of alignment start (truth)
    strand: int                # 0 fwd, 1 rc
    n_snps: int = 0
    indels: list[tuple[int, int]] = field(default_factory=list)  # (read_off, +ins/-del)

    @property
    def seq(self) -> str:
        return alphabet.decode(self.codes)


def plant_read(rng, db: SeqDB, *, length: int = 150, strand: int | None = None,
               n_snps: int = 0, ins: int = 0, dels: int = 0,
               gpos: int | None = None) -> PlantedRead:
    """Sample a read from the genome with optional SNPs and one indel each
    way, then optionally reverse-complement it (strand=1)."""
    if strand is None:
        strand = int(rng.integers(0, 2))
    # choose a position fully inside one sequence, leaving indel slack
    slack = length + dels + 8
    if gpos is None:
        ref = int(rng.integers(0, db.num_seqs))
        local = int(rng.integers(0, int(db.lengths[ref]) - slack))
        gpos = int(db.starts[ref]) + local
    frag = db.codes[gpos : gpos + length + dels].copy()

    indels: list[tuple[int, int]] = []
    if dels:
        off = int(rng.integers(8, length - 8))
        frag = np.concatenate([frag[:off], frag[off + dels:]])
        indels.append((off, -dels))
    frag = frag[:length - ins] if ins else frag[:length]
    if ins:
        off = int(rng.integers(8, len(frag) - 8))
        insert = rng.integers(0, 4, size=ins).astype(np.uint8)
        frag = np.concatenate([frag[:off], insert, frag[off:]])
        indels.append((off, ins))
    frag = frag[:length]

    n_planted = 0
    if n_snps:
        offs = rng.choice(len(frag), size=n_snps, replace=False)
        for o in offs:
            frag[o] = (frag[o] + int(rng.integers(1, 4))) % 4
            n_planted += 1
    if strand == 1:
        frag = alphabet.revcomp(frag)
    return PlantedRead(codes=frag.astype(np.uint8), gpos=gpos, strand=strand,
                       n_snps=n_planted, indels=indels)


def write_fastq(path, reads: list[PlantedRead], prefix="r"):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@{prefix}{i}\n{r.seq}\n+\n{'I' * len(r.codes)}\n")
