"""Regenerate the /tmp/verify_e2e corpus used by the verify skill.

Synthesizes a 2 Mbp 3-chromosome genome, plants SE reads (exact / SNP /
indel / revcomp / junk) and proper pairs + rescue pairs, writes
FASTA/FASTQ plus a truth TSV, and builds the index directory.

Usage: python tools/make_verify_corpus.py [outdir=/tmp/verify_e2e]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.utils import make_seqdb, plant_pair, plant_read  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_e2e"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(11)
    db = make_seqdb(rng, [1_000_000, 600_000, 400_000])

    from urmap_tpu import alphabet

    fa = os.path.join(out, "g.fa")
    with open(fa, "w") as f:
        for i in range(db.num_seqs):
            st, ln = int(db.starts[i]), int(db.lengths[i])
            s = alphabet.decode(db.codes[st : st + ln])
            f.write(f">{db.labels[i]}\n")
            for j in range(0, len(s), 70):
                f.write(s[j : j + 70] + "\n")

    # ---- SE reads ----
    n = 3000
    reads, truth = [], []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            r = plant_read(rng, db, n_snps=0)
        elif kind == 1:
            r = plant_read(rng, db, n_snps=3)
        elif kind == 2:
            r = plant_read(rng, db, ins=2)
        elif kind == 3:
            r = plant_read(rng, db, dels=2)
        elif kind == 4:
            r = plant_read(rng, db, strand=1, n_snps=1)
        else:
            r = None  # junk
        if r is None:
            seq = alphabet.decode(
                rng.integers(0, 4, size=150).astype(np.uint8))
            reads.append(seq)
            truth.append((-1, -1))
        else:
            reads.append(r.seq)
            truth.append((r.gpos, r.strand))
    with open(os.path.join(out, "se.fq"), "w") as f, \
            open(os.path.join(out, "se_truth.tsv"), "w") as t:
        for i, (seq, (gpos, strand)) in enumerate(zip(reads, truth)):
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
            t.write(f"r{i}\t{gpos}\t{strand}\n")

    # ---- PE reads ----
    npair = 1500
    with open(os.path.join(out, "r1.fq"), "w") as f1, \
            open(os.path.join(out, "r2.fq"), "w") as f2, \
            open(os.path.join(out, "pe_truth.tsv"), "w") as t:
        for i in range(npair):
            rescue = (i % 5 == 4)
            r1, r2, _ = plant_pair(rng, db,
                                   snp_every=15 if rescue else None)
            f1.write(f"@p{i}\n{r1.seq}\n+\n{'I' * len(r1.seq)}\n")
            f2.write(f"@p{i}\n{r2.seq}\n+\n{'I' * len(r2.seq)}\n")
            t.write(f"p{i}\t{r1.gpos}\t{r2.gpos}\t{int(rescue)}\n")

    # ---- index ----
    from urmap_tpu.cli import main as cli_main

    ufi = os.path.join(out, "g.ufi")
    cli_main(["-make_ufi", fa, "-output", ufi])
    print(f"corpus written to {out}", flush=True)


if __name__ == "__main__":
    main()
