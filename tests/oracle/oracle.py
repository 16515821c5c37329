"""Golden-model oracle mapper (SURVEY.md §4.2).

A slow, obviously-correct CPU mapper with EXACTLY the same alignment
semantics as the device pipeline, implemented independently in numpy:

- exhaustive semi-global DP of the read against the ENTIRE genome
  (free alignment start anywhere, full read consumed, affine gaps) —
  no seeding, no banding, no hashing, so none of the device pipeline's
  heuristics or its hash function are shared;
- start-position tracking via packed (score, start) integers, so the
  reported POS is the exact argmax alignment start;
- best/second-best with a locus-exclusion radius → MAPQ via the shared
  formula from MapConfig;
- scalar traceback for CIGAR.

The device pipeline must agree wherever its heuristics suffice (enough
seeds survive, indels within band, candidate within top-V).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.config import MapConfig, ScoreConfig
from urmap_tpu.io.fasta import SeqDB

NEG = -(1 << 28)


def semiglobal_scan(genome: np.ndarray, read: np.ndarray, sc: ScoreConfig):
    """Exhaustive affine semi-global DP: read (global) vs genome (local,
    free start, free end). Returns (scores[int64, G+1], starts[int64, G+1])
    indexed by alignment END position (exclusive, in genome coords):
    scores[j] = best score of any alignment consuming the whole read and
    ending at genome offset j; starts[j] = its start offset (ties → larger
    start)."""
    g = genome.astype(np.int64)
    r = read.astype(np.int64)
    G, L = len(g), len(r)
    S = np.int64(G + 1)  # packing stride: packed = score * S + start

    j_idx = np.arange(G + 1, dtype=np.int64)
    H = j_idx.copy()  # score 0, start j → packed = 0*S + j
    E = np.full(G + 1, NEG * S, dtype=np.int64)
    open_, ext = np.int64(sc.gap_open), np.int64(sc.gap_extend)

    for i in range(L):
        sub = np.where(g == r[i], sc.match, sc.mismatch).astype(np.int64) * S
        # diagonal: consume read[i] + genome[j-1] → from H[j-1]
        diag = np.concatenate(([NEG * S], H[:-1] + sub))
        # insertion (read char, no genome): from row i same j
        E = np.maximum(H + open_ * S, E + ext * S)
        T = np.maximum(diag, E)
        # deletion (genome char, no read char): within-row left-to-right
        # F[j] = max_{k<j}(T[k] + open + (j-k-1)*ext)
        #      = runmax(T[k] - (k+1)*ext)[<j] + open + j*ext
        shifted = T - (j_idx + 1) * ext * S
        runmax = np.maximum.accumulate(shifted)
        F = np.concatenate(([NEG * S], runmax[:-1])) + (open_ + j_idx * ext) * S
        H = np.maximum(T, F)

    scores = H // S  # floor division: packed = score*S + start, 0<=start<S
    starts = H - scores * S
    return scores, starts


def clipped_scan(genome: np.ndarray, read: np.ndarray, sc: ScoreConfig,
                 clip_open: int):
    """Exhaustive end-clipped scan (X-drop-analog semantics of
    map/dp.banded_from_windows(clip_open=...)): the alignment may skip a
    read prefix and/or suffix, each skipped side charged ``clip_open``
    once; at least one read base aligns. Same return convention as
    semiglobal_scan (packed per-end-offset scores/starts)."""
    g = genome.astype(np.int64)
    r = read.astype(np.int64)
    G, L = len(g), len(r)
    S = np.int64(G + 1)
    j_idx = np.arange(G + 1, dtype=np.int64)
    H = j_idx.copy()
    E = np.full(G + 1, NEG * S, dtype=np.int64)
    early = np.full(G + 1, NEG * S, dtype=np.int64)
    open_, ext = np.int64(sc.gap_open), np.int64(sc.gap_extend)
    clip = np.int64(clip_open)

    for i in range(L):
        if i > 0:
            H = np.maximum(H, clip * S + j_idx)   # start-clip entry
        sub = np.where(g == r[i], sc.match, sc.mismatch).astype(np.int64) * S
        diag = np.concatenate(([NEG * S], H[:-1] + sub))
        E = np.maximum(H + open_ * S, E + ext * S)
        T = np.maximum(diag, E)
        shifted = T - (j_idx + 1) * ext * S
        runmax = np.maximum.accumulate(shifted)
        F = np.concatenate(([NEG * S], runmax[:-1])) + (open_ + j_idx * ext) * S
        H = np.maximum(T, F)
        if i + 1 < L:
            early = np.maximum(early, H + clip * S)  # end-clip exit

    best = np.maximum(H, early)
    scores = best // S
    starts = best - scores * S
    return scores, starts


def traceback_cigar(genome: np.ndarray, read: np.ndarray, start: int,
                    sc: ScoreConfig, pad: int = 48) -> tuple[str, int]:
    """Scalar affine DP with pointers: full read vs genome window starting
    exactly at ``start`` (no leading deletions — ``start`` is the first
    genome base consumed), free end within ``len(read)+pad``.

    Returns (cigar, score). Leading/trailing I become S (soft clip)."""
    g = genome[start : start + len(read) + pad].astype(np.int64)
    r = read.astype(np.int64)
    G, L = len(g), len(r)
    H = np.full((L + 1, G + 1), NEG, dtype=np.int64)
    E = np.full((L + 1, G + 1), NEG, dtype=np.int64)
    F = np.full((L + 1, G + 1), NEG, dtype=np.int64)
    H[0, 0] = 0
    for i in range(1, L + 1):
        E[i, 0] = max(H[i - 1, 0] + sc.gap_open, E[i - 1, 0] + sc.gap_extend)
        H[i, 0] = E[i, 0]
        for j in range(1, G + 1):
            sub = sc.match if g[j - 1] == r[i - 1] else sc.mismatch
            E[i, j] = max(H[i - 1, j] + sc.gap_open, E[i - 1, j] + sc.gap_extend)
            F[i, j] = max(H[i, j - 1] + sc.gap_open, F[i, j - 1] + sc.gap_extend)
            H[i, j] = max(H[i - 1, j - 1] + sub, E[i, j], F[i, j])
    # free end: best column of the last row (tie → smallest end)
    jend = int(np.argmax(H[L]))
    score = int(H[L, jend])
    ops: list[str] = []
    i, j = L, jend
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            if i > 0 and j > 0 and H[i, j] == H[i - 1, j - 1] + (
                sc.match if g[j - 1] == r[i - 1] else sc.mismatch
            ):
                ops.append("M"); i -= 1; j -= 1
            elif i > 0 and H[i, j] == E[i, j]:
                state = "E"
            elif j > 0 and H[i, j] == F[i, j]:
                state = "F"
            else:  # pragma: no cover
                raise AssertionError("traceback failed")
        elif state == "E":
            ops.append("I")
            if H[i - 1, j] + sc.gap_open == E[i, j]:
                state = "H"
            i -= 1
        else:  # F
            ops.append("D")
            if H[i, j - 1] + sc.gap_open == F[i, j]:
                state = "H"
            j -= 1
    ops.reverse()
    # leading/trailing insertions are soft clips in SAM terms
    s, e = 0, len(ops)
    while s < e and ops[s] == "I":
        ops[s] = "S"; s += 1
    while e > s and ops[e - 1] == "I":
        ops[e - 1] = "S"; e -= 1
    # run-length encode
    out = []
    for op in ops:
        if out and out[-1][1] == op:
            out[-1][0] += 1
        else:
            out.append([1, op])
    return "".join(f"{n}{op}" for n, op in out), score


@dataclass
class OracleMapping:
    mapped: bool
    pos: int = 0            # global genome coordinate of alignment start
    end: int = 0            # global coordinate of alignment end (exclusive)
    score: int = 0
    second_score: int = NEG  # best score at a distinct locus (NEG if none)
    strand: int = 0         # 0 = forward, 1 = reverse complement
    mapq: int = 0
    cigar: str = "*"


class OracleMapper:
    def __init__(self, seqdb: SeqDB, score_cfg: ScoreConfig | None = None,
                 map_cfg: MapConfig | None = None):
        self.db = seqdb
        self.sc = score_cfg or ScoreConfig()
        self.mc = map_cfg or MapConfig()

    def _scan_strand(self, read: np.ndarray):
        scores, starts = semiglobal_scan(self.db.codes, read, self.sc)
        return scores, starts

    def map_read(self, read_codes: np.ndarray) -> OracleMapping:
        read = np.asarray(read_codes, dtype=np.uint8)
        cands = []  # (score, start, end, strand)
        for strand, r in ((0, read), (1, alphabet.revcomp(read))):
            scores, starts = self._scan_strand(r)
            for j in np.nonzero(scores > NEG // 2)[0]:
                cands.append((int(scores[j]), int(starts[j]), int(j), strand))
        if not cands:
            return OracleMapping(mapped=False)
        # canonical order: score desc, pos asc, fwd first
        cands.sort(key=lambda c: (-c[0], c[1], c[3]))
        best = cands[0]
        radius = self.mc.max_read_len
        second = NEG
        for c in cands[1:]:
            if abs(c[1] - best[1]) > radius:
                second = c[0]
                break
        min_score = int(np.ceil(self.mc.min_score_frac * len(read)))
        if best[0] < min_score or len(read) == 0:
            return OracleMapping(mapped=False, score=best[0])
        mapq = self.mapq(best[0], second, len(read))
        r = read if best[3] == 0 else alphabet.revcomp(read)
        cigar, tb_score = traceback_cigar(self.db.codes, r, best[1], self.sc)
        assert tb_score == best[0], (tb_score, best)  # oracle self-check
        return OracleMapping(
            mapped=True, pos=best[1], end=best[2], score=best[0],
            second_score=second, strand=best[3], mapq=mapq, cigar=cigar,
        )

    def mapq(self, best: int, second: int, read_len: int) -> int:
        """Shared MAPQ formula (PARITY-TODO: config.py). second=NEG means
        no competing locus → full confidence."""
        if second <= NEG // 2:
            return self.mc.max_mapq
        gap = best - second
        return int(np.clip(round(self.mc.mapq_scale * gap), 0, self.mc.max_mapq))

    # -- paired-end (mirrors map/pair.py semantics exhaustively) ----------

    def _all_candidates(self, read: np.ndarray):
        """(score, start, strand, span) alignment loci for both strands,
        with scores near or above the acceptance floor (hopeless loci
        cannot influence the best pair on any test genome and would make
        the cross-product quadratic in genome length). span = aligned
        reference span (scan index j is the exclusive end)."""
        floor = int(np.ceil(self.mc.min_score_frac * len(read))) - 12
        best = {}  # (start, strand) → (score, span)
        for strand, r in ((0, read), (1, alphabet.revcomp(read))):
            scores, starts = self._scan_strand(r)
            for j in np.nonzero(scores >= floor)[0]:
                key = (int(starts[j]), strand)
                val = (int(scores[j]), int(j) - int(starts[j]))
                # one candidate per locus, like the device's per-diagonal
                # DP winner: max score, ties → smallest span (the
                # device's argmax picks the lowest end band cell)
                cur = best.get(key)
                if cur is None or (val[0], -val[1]) > (cur[0], -cur[1]):
                    best[key] = val
        return [(s, p, st, sp) for (p, st), (s, sp) in best.items()]

    def map_pair(self, r1: np.ndarray, r2: np.ndarray):
        """Returns (m1: OracleMapping, m2: OracleMapping, proper: bool).

        Pairing semantics mirror map/pair.py: FR orientation, fragment
        length from the rightmost mate's aligned ref span (read-length
        proxy under end_clip), pair score = s1 + s2,
        proper requires both mates above min_score; proper-mate MAPQ =
        max(single-end MAPQ, pair-score-gap MAPQ over distinct loci).
        """
        l1, l2 = len(r1), len(r2)
        c1 = self._all_candidates(np.asarray(r1, np.uint8))
        c2 = self._all_candidates(np.asarray(r2, np.uint8))
        mc = self.mc

        pairs = []  # (pscore, pf, s1, p1, st1, s2, p2, st2)
        for s1, p1, st1, sp1 in c1:
            for s2, p2, st2, sp2 in c2:
                if st1 == st2:
                    continue
                # exact aligned ref span of the rightmost mate (matches
                # map/pair.py._pair_cross; under end_clip the device
                # falls back to read length — mirror that)
                if st1 == 0:
                    pf, pr = p1, p2
                    lr = l2 if mc.end_clip else sp2
                else:
                    pf, pr = p2, p1
                    lr = l1 if mc.end_clip else sp1
                tlen = pr + lr - pf
                if pf <= pr and mc.min_fragment_len <= tlen <= mc.max_fragment_len:
                    pairs.append((s1 + s2, pf, s1, p1, st1, s2, p2, st2))
        se1 = self.map_read(r1)
        se2 = self.map_read(r2)
        if not pairs:
            return se1, se2, False
        pairs.sort(key=lambda t: (-t[0], t[1]))
        best = pairs[0]
        min1 = int(np.ceil(mc.min_score_frac * l1))
        min2 = int(np.ceil(mc.min_score_frac * l2))
        proper = best[2] >= min1 and best[5] >= min2
        if not proper:
            return se1, se2, False
        second = NEG
        for t in pairs[1:]:
            if abs(t[1] - best[1]) > mc.max_read_len:
                second = t[0]
                break
        if second <= NEG // 2:
            pair_mapq = mc.max_mapq
        else:
            pair_mapq = int(np.clip(round(mc.mapq_scale * (best[0] - second)),
                                    0, mc.max_mapq))

        def mate(se, s, p, st, length):
            r = OracleMapping(mapped=True, pos=p, score=s, strand=st,
                              mapq=max(se.mapq if se.mapped else 0,
                                       pair_mapq))
            return r

        return (mate(se1, best[2], best[3], best[4], l1),
                mate(se2, best[5], best[6], best[7], l2), True)
