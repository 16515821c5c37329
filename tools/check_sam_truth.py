"""Score a SAM file against planted-truth .npy coordinates.

The GRCh38-scale corpora (/tmp/g38_se.fq + g38_se_truth.npy, r1/r2 +
g38_pe_truth.npy) name reads r<idx> / p<idx> and record the 0-based
planted genome coordinate per index. This parses the SAM (no pysam in
the env — SURVEY.md §4 test strategy) and reports mapped fraction,
correct-of-mapped (POS-1 == truth, with a +/-slop for indel plants),
the past-2^31 split, and PE proper-pair rate.

Usage:
  python tools/check_sam_truth.py out.sam truth.npy [--pe] [--slop N]
"""

from __future__ import annotations

import argparse

import numpy as np


def score(sam_path: str, truth_path: str, pe: bool = False,
          slop: int = 0, ref_start: int = 0) -> dict:
    """``ref_start``: global coordinate of the SAM reference's first
    base — the synthetic-corpus truth arrays hold GLOBAL SeqDB
    coordinates (which include the 64-base guard pad before chr1),
    while SAM POS is 1-based within the reference."""
    truth = np.load(truth_path)
    if pe:
        t1, t2 = truth[0], truth[1]
        n = t1.shape[0]
        pos = np.full((2, n), -1, np.int64)
        proper = np.zeros(n, bool)
    else:
        t1, n = truth, truth.shape[0]
        pos = np.full((1, n), -1, np.int64)
    n_records = 0
    with open(sam_path) as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            f = line.rstrip("\n").split("\t", 6)
            n_records += 1
            idx = int(f[0][1:])
            flag = int(f[1])
            if flag & 0x4:
                continue
            mate = 1 if (pe and (flag & 0x80)) else 0
            pos[mate, idx] = int(f[3]) - 1 + ref_start
            if pe and (flag & 0x2):
                proper[idx] = True
    out = {"records": n_records, "reads": n * (2 if pe else 1)}
    tt = np.stack([t1, t2]) if pe else t1[None]
    mapped = pos >= 0
    ok = mapped & (np.abs(pos - tt) <= slop)
    out["mapped_frac"] = round(float(mapped.mean()), 5)
    out["correct_of_mapped"] = round(
        float(ok[mapped].mean()) if mapped.any() else 0.0, 5)
    hi = (tt > (1 << 31)) & mapped
    if hi.any():
        out["correct_of_mapped_past_2_31"] = round(float(ok[hi].mean()), 5)
    if pe:
        out["proper_frac"] = round(float(proper.mean()), 5)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sam")
    ap.add_argument("truth")
    ap.add_argument("--pe", action="store_true")
    ap.add_argument("--slop", type=int, default=0)
    ap.add_argument("--ref-start", type=int, default=64,
                    help="global coord of the reference's first base "
                         "(the synthetic SeqDB guard pad; default 64)")
    args = ap.parse_args()
    import json

    print(json.dumps(score(args.sam, args.truth, pe=args.pe,
                           slop=args.slop, ref_start=args.ref_start)))


if __name__ == "__main__":
    main()
