"""SAM output (header + record formatting), SAM spec v1.6.

Analog of the reference's SAM writer (SURVEY.md §2.12). Host-side Python
first; the record formatter is the designated C++ codec candidate once
profiled (Phase 5). Fields emitted: the 11 mandatory columns plus AS
(alignment score) and NM (edit distance) tags.
"""

from __future__ import annotations

import re
from typing import Iterable

from urmap_tpu import __version__, alphabet

FLAG_PAIRED = 0x1
FLAG_PROPER = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_FIRST = 0x40
FLAG_SECOND = 0x80

_CIGAR_REF_RE = re.compile(r"(\d+)([MDN=X])")


def ref_consumed(cigar: str) -> int:
    """Reference bases consumed by a CIGAR (for TLEN / bounds checks)."""
    return sum(int(n) for n, _ in _CIGAR_REF_RE.findall(cigar))


def sam_header(seqdb, cmdline: str = "") -> str:
    lines = ["@HD\tVN:1.6\tSO:unknown"]
    for label, length in zip(seqdb.labels, seqdb.lengths):
        lines.append(f"@SQ\tSN:{label}\tLN:{int(length)}")
    pg = f"@PG\tID:urmap-tpu\tPN:urmap-tpu\tVN:{__version__}"
    if cmdline:
        pg += f"\tCL:{cmdline}"
    lines.append(pg)
    return "\n".join(lines) + "\n"


def _revcomp_seq(seq: bytes) -> bytes:
    return alphabet.decode(
        alphabet.revcomp(alphabet.encode(seq, is_genome=False))).encode()


def format_record(name: str, flag: int, rname: str, pos1: int, mapq: int,
                  cigar: str, rnext: str, pnext1: int, tlen: int,
                  seq: bytes, qual: bytes, tags: Iterable[str] = ()) -> str:
    fields = [name, str(flag), rname, str(pos1), str(mapq), cigar,
              rnext, str(pnext1), str(tlen),
              seq.decode("ascii"), qual.decode("ascii") if qual else "*"]
    fields.extend(tags)
    return "\t".join(fields)


def records_single_end(batch, result, cigars, nms, seqdb) -> list[str]:
    """SAM records for a single-end ReadBatch + MapResult (+ cigars)."""
    out: list[str] = []
    for i, name in enumerate(batch.names):
        seq, qual = batch.seqs[i], batch.quals[i]
        if not result.mapped[i]:
            out.append(format_record(name, FLAG_UNMAPPED, "*", 0, 0, "*",
                                     "*", 0, 0, seq, qual))
            continue
        ref_id, local = seqdb.global_to_local(int(result.pos[i]))
        ref_id, local = int(ref_id), int(local)
        flag = FLAG_REVERSE if result.strand[i] else 0
        if result.strand[i]:
            seq, qual = _revcomp_seq(seq), qual[::-1]
        tags = [f"AS:i:{int(result.score[i])}", f"NM:i:{int(nms[i])}"]
        out.append(format_record(
            name, flag, seqdb.labels[ref_id], local + 1,
            int(result.mapq[i]), cigars[i], "*", 0, 0, seq, qual, tags))
    return out
