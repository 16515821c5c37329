"""Host-side CIGAR generation (numpy).

The device pipeline returns scores and start positions only; CIGAR strings
are produced on the host (SURVEY.md §2.9 note: traceback on host):

  - ungapped winners (the vast majority of short reads): "{len}M" directly;
  - gapped winners: recompute the banded affine DP at the single winning
    locus with full traceback. Row-vectorized numpy; the per-read matrix is
    tiny (L × (L+pad)).

Semantics identical to map/dp.py and the oracle: alignment starts exactly
at POS (no leading deletion), full read, affine gaps, free end; traceback
prefers M, then I, then D on ties; leading/trailing I → soft clip S.
"""

from __future__ import annotations

import numpy as np

from urmap_tpu.config import ScoreConfig

NEG = -(1 << 28)


def traceback(genome: np.ndarray, read: np.ndarray, start: int,
              sc: ScoreConfig, pad: int = 48,
              clip_open: int | None = None) -> tuple[str, int, int]:
    """Returns (cigar, score, nm) for the alignment of the read starting
    at genome position ``start``. nm = edit distance (SAM NM).

    ``clip_open``: end-clipped mode (map/dp.py banded_from_windows) —
    the alignment may begin at any read row (prefix soft-clipped, one
    clip_open charge, genome start stays exactly ``start``) and end at
    any read row (suffix clipped, one charge)."""
    g = genome[start : start + len(read) + pad].astype(np.int16)
    r = read.astype(np.int16)
    G, L = len(g), len(r)
    H = np.full((L + 1, G + 1), NEG, np.int32)
    E = np.full((L + 1, G + 1), NEG, np.int32)
    F = np.full((L + 1, G + 1), NEG, np.int32)
    open_, ext = sc.gap_open, sc.gap_extend
    H[0, 0] = 0
    j1 = np.arange(1, G + 1)
    for i in range(1, L + 1):
        if clip_open is not None and i >= 2:
            # start-clip state: read bases [0, i-1) clipped, genome at POS
            H[i - 1, 0] = max(int(H[i - 1, 0]), clip_open)
        E[i] = np.maximum(H[i - 1] + open_, E[i - 1] + ext)
        sub = np.where(g == r[i - 1], sc.match, sc.mismatch).astype(np.int32)
        diag = np.full(G + 1, NEG, np.int32)
        diag[1:] = H[i - 1, :-1] + sub
        T = np.maximum(diag, E[i])
        # F[i, j] = max_{k<j}(T[k] - (k+1)*ext) + open + j*ext
        runmax = np.maximum.accumulate(T - np.arange(1, G + 2) * ext)
        F[i, 1:] = runmax[:-1] + open_ + j1 * ext
        H[i] = np.maximum(T, F[i])
    iend, jend = L, int(np.argmax(H[L]))
    score = int(H[L, jend])
    if clip_open is not None:
        for i in range(1, L):
            # j ≥ 1: an end-clip must leave a non-empty aligned segment
            # (H[i, 0] holds the injected bare start-clip state)
            j = int(np.argmax(H[i, 1:])) + 1
            s = int(H[i, j]) + clip_open
            if s > score:
                score, iend, jend = s, i, j

    ops: list[str] = []
    i, j = iend, jend
    state = "H"
    while i > 0 or j > 0:
        if (clip_open is not None and state == "H" and j == 0
                and 0 < i < L and H[i, 0] == clip_open):
            # start-clip entry: bases [0, i) are soft-clipped
            ops.extend("S" * i)
            i = 0
            break
        if state == "H":
            if i > 0 and j > 0 and H[i, j] == H[i - 1, j - 1] + (
                sc.match if g[j - 1] == r[i - 1] else sc.mismatch
            ):
                ops.append("M" if g[j - 1] == r[i - 1] else "X")
                i -= 1; j -= 1
            elif i > 0 and H[i, j] == E[i, j]:
                state = "E"
            elif j > 0 and H[i, j] == F[i, j]:
                state = "F"
            else:  # pragma: no cover
                raise AssertionError(f"traceback failed at ({i},{j})")
        elif state == "E":
            ops.append("I")
            if H[i - 1, j] + open_ == E[i, j]:
                state = "H"
            i -= 1
        else:  # F
            ops.append("D")
            if H[i, j - 1] + open_ == F[i, j]:
                state = "H"
            j -= 1
    ops.reverse()
    if clip_open is not None and iend < L:
        ops.extend("S" * (L - iend))       # end-clip: bases [iend, L)
    s, e = 0, len(ops)
    while s < e and ops[s] == "I":
        ops[s] = "S"; s += 1
    while e > s and ops[e - 1] == "I":
        ops[e - 1] = "S"; e -= 1
    nm = sum(1 for op in ops if op in "XID")
    cigar_ops = ["M" if op == "X" else op for op in ops]
    out: list[str] = []
    prev, run = None, 0
    for op in cigar_ops:
        if op == prev:
            run += 1
        else:
            if prev is not None:
                out.append(f"{run}{prev}")
            prev, run = op, 1
    out.append(f"{run}{prev}")
    return "".join(out), score, nm


def _clip_groups(result, sc: ScoreConfig, clip_open: int | None,
                 clip_rows) -> list[tuple[np.ndarray, int | None]]:
    """Gapped rows split into (rows, per-group clip_open) traceback
    groups. ``clip_open`` set = every row clips (-endclip mode);
    ``clip_rows`` = per-row clip-rescue flags (MapResult.clipped) —
    those rows traceback in clip mode with sc.clip_open."""
    rows = np.nonzero(result.mapped.astype(bool)
                      & result.gapped.astype(bool))[0]
    if clip_open is not None:
        return [(rows, clip_open)]
    if clip_rows is None:
        return [(rows, None)]
    cm = np.asarray(clip_rows, bool)[rows]
    out = []
    if (~cm).any():
        out.append((rows[~cm], None))
    if cm.any():
        out.append((rows[cm], sc.clip_open))
    return out


def cigars_nm_fast(genome: np.ndarray, strand_codes: np.ndarray, result,
                   sc: ScoreConfig, raw_lengths=None,
                   clip_open: int | None = None, clip_rows=None):
    """Vectorized CIGAR/NM for a MapResult (native-writer fast path).

    M-only winners (the vast majority) get "{L}M" and an NM derived from
    the device ungapped score — mm = (L·match − ung)/(match − mismatch) —
    with no genome gather; only gapped winners run the Python traceback.
    ``clip_rows``: per-row clip-rescue flags (those rows traceback in
    end-clip mode; see _clip_groups).

    Returns (cigars object-array[n], nm int32[n], ref_span int32[n]);
    unmapped entries hold ("", -1, 0).
    """
    n = len(result.mapped)
    L = result.lengths.astype(np.int64)
    mapped = result.mapped.astype(bool)
    gapped = result.gapped.astype(bool)
    denom = sc.match - sc.mismatch
    assert result.ungapped is not None, "device output lacks 'ungapped'"
    ung = result.ungapped.astype(np.int64)
    m_only = mapped & ~gapped
    nm = np.where(m_only, (L * sc.match - ung) // denom, -1).astype(np.int32)
    span = np.where(m_only, L, 0).astype(np.int32)
    cig = np.where(m_only, np.char.add(L.astype("U6"), "M"), "").astype(object)
    for rows, co in _clip_groups(result, sc, clip_open, clip_rows):
        if rows.size == 0:
            continue
        nat = traceback_batch_native(
            genome, result.pos[rows], strand_codes[rows],
            result.lengths[rows], sc, clip_open=co)
        if nat is not None:
            cigs, nms_, scores_, spans_ = nat
            dev_s = np.asarray(result.score)[rows]
            bad = np.nonzero((scores_ < dev_s) if co is not None
                             else (scores_ != dev_s))[0]
            if bad.size:  # pragma: no cover - consistency
                raise AssertionError(
                    f"native traceback score mismatch at rows {rows[bad[:5]]}")
            for idx, i in enumerate(rows):
                cig[i] = cigs[idx]
            nm[rows] = nms_
            span[rows] = spans_
        else:
            from urmap_tpu.io.sam import ref_consumed
            for i in rows:
                li = int(L[i])
                c, score, e = traceback(genome, strand_codes[i][:li],
                                        int(result.pos[i]), sc,
                                        clip_open=co)
                dev_i = int(result.score[i])
                if (score < dev_i if co is not None
                        else score != dev_i):  # pragma: no cover
                    raise AssertionError(
                        f"traceback score {score} != device "
                        f"{result.score[i]}")
                cig[i] = c
                nm[i] = e
                span[i] = ref_consumed(c)
    if raw_lengths is not None:
        add_truncation_clips(cig, result, raw_lengths)
    return cig, nm, span


def traceback_batch_native(genome: np.ndarray, starts: np.ndarray,
                           reads: np.ndarray, lengths: np.ndarray,
                           sc: ScoreConfig, pad: int = 48, raw: bool = False,
                           clip_open: int | None = None):
    """C++ batch traceback (codecs.cpp) — byte-identical CIGARs to
    traceback(), ~50x faster per read. Returns (cigars list[str],
    nm int32[n], score int32[n], span int32[n]) or None if the native
    library is unavailable. ``raw=True`` skips the per-read str decode
    and returns (blob bytes, offsets int64[n+1], nm, score, span)."""
    from urmap_tpu.io import native

    lib = native.lib()
    if lib is None:
        return None
    import ctypes

    n = starts.shape[0]
    genome = np.ascontiguousarray(genome, np.uint8)
    reads = np.ascontiguousarray(reads, np.uint8)
    starts64 = np.ascontiguousarray(starts, np.int64)
    lens32 = np.ascontiguousarray(lengths, np.int32)
    maxL = int(lens32.max()) if n else 0
    cap = n * (2 * (3 * maxL + pad) + 16) + 64
    cig = np.empty(cap, np.uint8)
    cig_off = np.empty(n + 1, np.int64)
    nm = np.empty(n, np.int32)
    score = np.empty(n, np.int32)
    span = np.empty(n, np.int32)
    rcode = lib.urmap_traceback_batch(
        genome.ctypes.data_as(native.p_u8), genome.shape[0],
        starts64.ctypes.data_as(native.p_i64),
        reads.ctypes.data_as(native.p_u8), reads.shape[1] if n else 0,
        lens32.ctypes.data_as(native.p_i32), n, pad,
        sc.match, sc.mismatch, sc.gap_open, sc.gap_extend,
        int(clip_open is not None), int(clip_open or 0),
        cig.ctypes.data_as(ctypes.c_void_p), cap,
        cig_off.ctypes.data_as(native.p_i64),
        nm.ctypes.data_as(native.p_i32),
        score.ctypes.data_as(native.p_i32),
        span.ctypes.data_as(native.p_i32))
    if rcode != 0:
        return None
    if raw:
        return cig[:cig_off[n]].tobytes(), cig_off, nm, score, span
    blob = cig.tobytes()
    cigars = [blob[cig_off[i]:cig_off[i + 1]].decode("ascii")
              for i in range(n)]
    return cigars, nm, score, span


def strand_codes_subset(raw_codes: np.ndarray, strand, lengths) -> np.ndarray:
    """Strand-applied codes for a row subset (reverse-complement the
    strand==1 rows in place of the originals)."""
    import types

    from urmap_tpu.map.pipeline import revcomp_strand_codes

    shim = types.SimpleNamespace(
        mapped=np.ones(raw_codes.shape[0], bool),
        strand=np.asarray(strand), lengths=np.asarray(lengths))
    return revcomp_strand_codes(raw_codes, shim)


def cigars_nm_blob(genome: np.ndarray, raw_codes: np.ndarray, result,
                   sc: ScoreConfig, raw_lengths=None,
                   clip_open: int | None = None, clip_rows=None):
    """Fully native CIGAR/NM for a MapResult: no per-read Python objects.

    Returns (cig_blob bytes, cig_off int64[n+1], nm int32[n],
    span int32[n]) consumable directly by the native SAM formatter, or
    None when the native library is unavailable (callers fall back to
    cigars_nm_fast). Unlike cigars_nm_fast this takes the AS-SEQUENCED
    codes and reverse-complements only the gapped minority (the SAM
    SEQ/QUAL reversal happens inside the C++ formatter from raw text).
    """
    from urmap_tpu.io import native

    lib = native.lib()
    if lib is None:
        return None
    import ctypes

    n = len(result.mapped)
    L = result.lengths.astype(np.int64)
    mapped = result.mapped.astype(bool)
    gapped = mapped & result.gapped.astype(bool)
    denom = sc.match - sc.mismatch
    assert result.ungapped is not None, "device output lacks 'ungapped'"
    ung = result.ungapped.astype(np.int64)
    m_only = mapped & ~gapped
    nm = np.where(m_only, (L * sc.match - ung) // denom, -1).astype(np.int32)
    span = np.where(m_only, L, 0).astype(np.int32)

    tcig_blob = b""
    tcig_off = np.zeros(1, np.int64)
    rows = np.nonzero(gapped)[0]
    if rows.size:
        groups = _clip_groups(result, sc, clip_open, clip_rows)
        parts = []           # (sel-within-rows, blob, offs) per group
        for grows, co in groups:
            if grows.size == 0:
                continue
            lens = np.asarray(result.lengths)[grows]
            sub = strand_codes_subset(raw_codes[grows],
                                      np.asarray(result.strand)[grows],
                                      lens)
            nat = traceback_batch_native(
                genome, np.asarray(result.pos)[grows], sub, lens, sc,
                raw=True, clip_open=co)
            if nat is None:
                return None
            gblob, goff, nms_, scores_, spans_ = nat
            dev = np.asarray(result.score)[grows]
            # clipped mode: the host DP at POS is a superset of the
            # banded device paths (start rows outside the band), so >=
            bad = np.nonzero((scores_ < dev) if co is not None
                             else (scores_ != dev))[0]
            if bad.size:  # pragma: no cover - consistency
                raise AssertionError(
                    f"native traceback score mismatch at rows "
                    f"{grows[bad[:5]]}")
            nm[grows] = nms_
            span[grows] = spans_
            sel = np.searchsorted(rows, grows)
            parts.append((sel, gblob, goff))
        if len(parts) == 1 and parts[0][0].size == rows.size:
            _, tcig_blob, tcig_off = parts[0]
        else:
            # interleave the groups' blobs back into gapped-row order
            # (clip-rescued rows are rare; tiny per-row byte copies)
            rowlen = np.zeros(rows.size, np.int64)
            for sel, gblob, goff in parts:
                rowlen[sel] = np.diff(goff)
            tcig_off = np.zeros(rows.size + 1, np.int64)
            np.cumsum(rowlen, out=tcig_off[1:])
            buf = bytearray(int(tcig_off[-1]))
            for sel, gblob, goff in parts:
                for j, r_ in enumerate(sel):
                    buf[tcig_off[r_] : tcig_off[r_ + 1]] = \
                        gblob[goff[j] : goff[j + 1]]
            tcig_blob = bytes(buf)

    mg = np.zeros(n, np.uint8)
    mg[m_only] = 1
    mg[gapped] = 2
    lens32 = np.ascontiguousarray(result.lengths, dtype=np.int32)
    strand32 = np.ascontiguousarray(result.strand, dtype=np.int32)
    raw32 = (None if raw_lengths is None
             else np.ascontiguousarray(raw_lengths, dtype=np.int32))
    cap = 48 * n + len(tcig_blob) + 64
    while True:
        out = np.empty(cap, np.uint8)
        off = np.empty(n + 1, np.int64)
        wrote = lib.urmap_compose_cigars(
            n, lens32.ctypes.data_as(native.p_i32),
            raw32.ctypes.data_as(native.p_i32) if raw32 is not None
            else None,
            mg.ctypes.data_as(native.p_u8),
            strand32.ctypes.data_as(native.p_i32),
            tcig_blob, tcig_off.ctypes.data_as(native.p_i64),
            out.ctypes.data_as(ctypes.c_void_p), cap,
            off.ctypes.data_as(native.p_i64))
        if wrote >= 0:
            return out[:wrote].tobytes(), off, nm, span
        cap *= 2


def add_truncation_clips(cig, result, raw_lengths) -> None:
    """Reads longer than max_read_len were truncated for mapping; the
    unmapped tail must appear as a soft clip so CIGAR length == SEQ
    length (SAM v1.6 §1.4.6). Trailing S for forward alignments; the
    truncated tail of a reverse-complemented record is emitted FIRST,
    so leading S. Mutates ``cig`` in place."""
    raw = np.asarray(raw_lengths)
    extra = raw - np.asarray(result.lengths)
    for i in np.nonzero(result.mapped & (extra > 0))[0]:
        if result.strand[i]:
            cig[i] = f"{extra[i]}S" + cig[i]
        else:
            cig[i] = cig[i] + f"{extra[i]}S"


def cigars_for_result(genome: np.ndarray, reads_codes: np.ndarray,
                      result, sc: ScoreConfig, raw_lengths=None,
                      clip_open: int | None = None,
                      clip_rows=None) -> tuple[list[str], list[int]]:
    """CIGAR + NM per read for a MapResult. ``reads_codes`` must be
    strand-applied (rc already taken for strand==1 reads)."""
    cigars: list[str] = []
    nms: list[int] = []
    match, mis = sc.match, sc.mismatch
    for i in range(len(result.mapped)):
        L = int(result.lengths[i])
        if not result.mapped[i]:
            cigars.append("*"); nms.append(0)
            continue
        if not result.gapped[i]:
            cigars.append(f"{L}M")
            seg = genome[int(result.pos[i]) : int(result.pos[i]) + L]
            nms.append(int(np.sum(seg != reads_codes[i][:L])))
            continue
        co = clip_open
        if co is None and clip_rows is not None and clip_rows[i]:
            co = sc.clip_open   # clip-rescued row (MapResult.clipped)
        cigar, score, nm = traceback(
            genome, reads_codes[i][:L], int(result.pos[i]), sc,
            clip_open=co)
        dev_i = int(result.score[i])
        if (score < dev_i if co is not None
                else score != dev_i):  # pragma: no cover - consistency
            raise AssertionError(
                f"traceback score {score} != device score {result.score[i]}")
        cigars.append(cigar); nms.append(nm)
    if raw_lengths is not None:
        add_truncation_clips(cigars, result, raw_lengths)
    return cigars, nms
