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
              seq.decode("ascii") if seq else "*",
              qual.decode("ascii") if qual else "*"]
    fields.extend(tags)
    return "\t".join(fields)


def records_paired(batch1, batch2, pres, cig1, nm1, cig2, nm2,
                   seqdb) -> list[str]:
    """SAM records for a paired batch (two records per pair, R1 then R2).

    Flags per SAM v1.6 §1.4; TLEN from leftmost-start to rightmost-end
    using CIGAR reference spans, positive for the leftmost mate. An
    unmapped mate with a mapped partner is placed at the partner's
    coordinates (spec-recommended convention)."""
    out: list[str] = []
    r1, r2 = pres.m1, pres.m2
    for i, name in enumerate(batch1.names):
        m1, m2 = bool(r1.mapped[i]), bool(r2.mapped[i])
        proper = bool(pres.proper[i]) and m1 and m2
        info = []
        for (res, cigars, batch) in ((r1, cig1, batch1), (r2, cig2, batch2)):
            if res.mapped[i]:
                ref_id, local = seqdb.global_to_local(int(res.pos[i]))
                info.append((int(ref_id), int(local),
                             int(res.strand[i]), cigars[i]))
            else:
                info.append(None)
        tlen1 = 0
        if info[0] and info[1] and info[0][0] == info[1][0]:
            s1, s2 = info[0][1], info[1][1]
            e1 = s1 + ref_consumed(info[0][3])
            e2 = s2 + ref_consumed(info[1][3])
            span = max(e1, e2) - min(s1, s2)
            if (s1, e1) == (s2, e2):
                tlen1 = span  # identical span: R1 takes +
            else:
                tlen1 = span if (s1, e1) < (s2, e2) else -span

        for first, (res, cigars, nms, batch, mate_res) in enumerate((
                (r1, cig1, nm1, batch1, r2), (r2, cig2, nm2, batch2, r1))):
            self_info = info[first]
            mate_info = info[1 - first]
            flag = FLAG_PAIRED | (FLAG_SECOND if first else FLAG_FIRST)
            if proper:
                flag |= FLAG_PROPER
            seq, qual = batch.seqs[i], batch.quals[i]
            if self_info is None:
                flag |= FLAG_UNMAPPED
                if mate_info is None:
                    out.append(format_record(name, flag | FLAG_MATE_UNMAPPED,
                                             "*", 0, 0, "*", "*", 0, 0,
                                             seq, qual))
                    continue
                if mate_info[2]:
                    flag |= FLAG_MATE_REVERSE
                # placed at the mate's coordinates, unmapped
                out.append(format_record(
                    name, flag, seqdb.labels[mate_info[0]],
                    mate_info[1] + 1, 0, "*", "=", mate_info[1] + 1, 0,
                    seq, qual))
                continue
            ref_id, local, strand, cigar = self_info
            if strand:
                flag |= FLAG_REVERSE
                seq, qual = _revcomp_seq(seq), qual[::-1]
            tags = [f"AS:i:{int(res.score[i])}", f"NM:i:{int(nms[i])}"]
            if mate_info is None:
                flag |= FLAG_MATE_UNMAPPED
                rnext, pnext1, tlen = "=", local + 1, 0
            else:
                if mate_info[2]:
                    flag |= FLAG_MATE_REVERSE
                same = mate_info[0] == ref_id
                rnext = "=" if same else seqdb.labels[mate_info[0]]
                pnext1 = mate_info[1] + 1
                tlen = (tlen1 if first == 0 else -tlen1) if same else 0
            out.append(format_record(
                name, flag, seqdb.labels[ref_id], local + 1,
                int(res.mapq[i]), cigar, rnext, pnext1, tlen,
                seq, qual, tags))
    return out


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
