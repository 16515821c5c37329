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


def plant_pair(rng, db: SeqDB, *, length: int = 100, frag: int = 300,
               n_snps: int = 0, r1_fwd: bool | None = None,
               snp_every: int | None = None):
    """Plant an FR pair: fragment of ``frag`` bases; R1/R2 from its two
    ends. Returns (r1, r2, frag_start) with reads as sequenced (R1 fwd +
    R2 rc of the fragment ends when r1_fwd, else swapped).
    ``snp_every``: mutate every Nth base of R2 (to defeat seeding and
    exercise mate rescue)."""
    ref = int(rng.integers(0, db.num_seqs))
    local = int(rng.integers(0, int(db.lengths[ref]) - frag - 8))
    gpos = int(db.starts[ref]) + local
    left = db.codes[gpos : gpos + length].copy()
    right = db.codes[gpos + frag - length : gpos + frag].copy()

    def snp(codes, n):
        for o in rng.choice(len(codes), size=n, replace=False):
            codes[o] = (codes[o] + int(rng.integers(1, 4))) % 4
        return codes

    left = snp(left, n_snps) if n_snps else left
    right = snp(right, n_snps) if n_snps else right
    if r1_fwd is None:
        r1_fwd = bool(rng.integers(0, 2))
    if r1_fwd:
        r1c, r1p, r1s = left, gpos, 0
        r2c, r2p, r2s = alphabet.revcomp(right), gpos + frag - length, 1
    else:
        r1c, r1p, r1s = alphabet.revcomp(right), gpos + frag - length, 1
        r2c, r2p, r2s = left, gpos, 0
    if snp_every:
        # mutate the as-sequenced R2 at a regular grid
        for o in range(snp_every // 2, len(r2c), snp_every):
            r2c[o] = (r2c[o] + int(rng.integers(1, 4))) % 4
    r1 = PlantedRead(codes=r1c.astype(np.uint8), gpos=r1p, strand=r1s)
    r2 = PlantedRead(codes=r2c.astype(np.uint8), gpos=r2p, strand=r2s)
    return r1, r2, gpos


def write_fastq(path, reads: list[PlantedRead], prefix="r"):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@{prefix}{i}\n{r.seq}\n+\n{'I' * len(r.codes)}\n")
