"""Traceback-bits DP (kernels/tb_dp.py) vs the host traceback.

The tb pass re-DPs a winner at its selected POS with per-cell direction
bits; decode_tb_row must reproduce map/cigar.py traceback() BYTE-FOR-
BYTE (same tie-breaks: diag > E > F, gap-open over extend) whenever the
optimal path stays inside the re-anchored band — which planted reads
with indels <= hw always do.
"""

import numpy as np
import pytest

from urmap_tpu.config import ScoreConfig
from urmap_tpu.kernels.tb_dp import (tb_from_windows, tb_from_windows_pallas,
                                     tb_words)
from urmap_tpu.map.cigar import decode_tb_row, traceback

HW = 16
L = 96


def _planted_cases(rng, n, glen=8000, max_indels=2, max_indel_len=6,
                   snp=0.03):
    """Random genome + n (read, pos) pairs with planted SNPs/indels whose
    net drift stays well inside the band."""
    genome = rng.integers(0, 4, size=glen).astype(np.uint8)
    reads = np.zeros((n, L), np.uint8)
    lens = np.zeros(n, np.int32)
    poss = np.zeros(n, np.int64)
    for i in range(n):
        ln = int(rng.integers(L - 24, L + 1))
        pos = int(rng.integers(HW + 8, glen - L - 64))
        seq = list(genome[pos : pos + ln + 16])
        for _ in range(int(rng.integers(0, max_indels + 1))):
            at = int(rng.integers(8, ln - 8))
            sz = int(rng.integers(1, max_indel_len + 1))
            if rng.random() < 0.5:
                ins = list(rng.integers(0, 4, size=sz))
                seq = seq[:at] + ins + seq[at:]
            else:
                seq = seq[:at] + seq[at + sz :]
        r = np.asarray(seq[:ln], np.uint8)
        m = rng.random(ln) < snp
        r[m] = (r[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        reads[i, :ln] = r
        reads[i, ln:] = 5
        lens[i] = ln
        poss[i] = pos
    return genome, reads, lens, poss


def _windows(genome, poss):
    w = np.zeros((len(poss), L + 2 * HW), np.uint8)
    for i, p in enumerate(poss):
        w[i] = genome[p - HW : p + L + HW]
    return w


def test_twin_decode_matches_host_traceback(rng):
    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 200)
    win = _windows(genome, poss)
    score, bend, bits = (np.asarray(x) for x in
                         tb_from_windows(win, reads, lens, hw=HW, sc=sc))
    n_gapped = 0
    for i in range(len(poss)):
        ln = int(lens[i])
        # the host DP's free start picks the best anchor; re-anchor the
        # tb comparison there, exactly like the pipeline (POS = winner)
        hcig, hscore, hnm = traceback(genome, reads[i][:ln],
                                      int(poss[i]), sc)
        assert score[i] == hscore, (i, score[i], hscore)
        dec = decode_tb_row(bits, i, int(bend[i]), ln, genome,
                            int(poss[i]), reads[i], HW, L)
        assert dec is not None, i
        cig, nm, span = dec
        assert cig == hcig, (i, cig, hcig)
        assert nm == hnm
        from urmap_tpu.io.sam import ref_consumed

        assert span == ref_consumed(hcig)
        if "I" in hcig or "D" in hcig:
            n_gapped += 1
    assert n_gapped >= 40   # the corpus actually exercises gaps


def test_drifted_anchor_walks_or_falls_back(rng):
    """Anchors offset from the true start: the DP still finds the
    optimal in-band path (score may differ from the pos-anchored one);
    whatever it reports, the decode must reproduce exactly that score's
    path or return None — never a wrong CIGAR."""
    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 64)
    drift = rng.integers(-HW, HW + 1, size=len(poss))
    anchors = poss + drift
    win = _windows(genome, anchors)
    score, bend, bits = (np.asarray(x) for x in
                         tb_from_windows(win, reads, lens, hw=HW, sc=sc))
    for i in range(len(poss)):
        ln = int(lens[i])
        dec = decode_tb_row(bits, i, int(bend[i]), ln, genome,
                            int(anchors[i]), reads[i], HW, L)
        if dec is None:
            continue
        cig, nm, span = dec
        # re-derive the score from the decoded ops: must equal the DP's
        hcig, hscore, hnm = traceback(genome, reads[i][:ln],
                                      int(anchors[i]), sc)
        if hscore == score[i]:
            assert cig == hcig and nm == hnm


def test_pallas_interpret_bit_identical(rng):
    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 96)
    win = _windows(genome, poss)
    js, jb, jw = tb_from_windows(win, reads, lens, hw=HW, sc=sc)
    ps, pb, pw = tb_from_windows_pallas(win, reads, lens, hw=HW, sc=sc,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(js), np.asarray(ps))
    np.testing.assert_array_equal(np.asarray(jb), np.asarray(pb))
    np.testing.assert_array_equal(np.asarray(jw), np.asarray(pw))
    assert np.asarray(jw).shape == (tb_words(L, HW), 96)


def test_dops_replay_matches_bit_walk(rng):
    """The device-walk records (dops) replayed on host must reproduce
    the full bit-walk decode (decode_tb_row, itself byte-identical to
    the host DP traceback) on every planted case."""
    from urmap_tpu.kernels.tb_dp import dops_from_bits
    from urmap_tpu.map.cigar import decode_dops_row

    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 160)
    win = _windows(genome, poss)
    score, bend, bits = tb_from_windows(win, reads, lens, hw=HW, sc=sc)
    dops, walk_ok = (np.asarray(x) for x in
                     dops_from_bits(bits, bend, lens, hw=HW, L=L))
    bits = np.asarray(bits)
    bend = np.asarray(bend)
    n_gapped = 0
    for i in range(len(poss)):
        ref = decode_tb_row(bits, i, int(bend[i]), int(lens[i]), genome,
                            int(poss[i]), reads[i], HW, L)
        assert ref is not None and walk_ok[i]
        got = decode_dops_row(dops, i, int(lens[i]), genome,
                              int(poss[i]), reads[i])
        assert got == ref, (i, got, ref)
        if "I" in ref[0] or "D" in ref[0]:
            n_gapped += 1
    assert n_gapped >= 30


def test_native_dops_decoder_matches_python(rng):
    """urmap_dops_decode_batch (C++) vs decode_dops_row — byte-identical
    CIGARs, same nm/span/ok on random planted cases."""
    from urmap_tpu.io import native
    from urmap_tpu.kernels.tb_dp import tb_dops_from_windows
    from urmap_tpu.map.cigar import decode_dops_row, dops_decode_batch

    if native.lib() is None:
        pytest.skip("native lib unavailable")
    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 128)
    win = _windows(genome, poss)
    score, dops, walk_ok = (np.asarray(x) for x in tb_dops_from_windows(
        win, reads, lens, hw=HW, sc=sc))
    cols = np.arange(128, dtype=np.int32)
    cigs_c, nm_c, sp_c, ok_c = dops_decode_batch(
        dops, cols, lens, genome, poss, reads)
    for i in range(128):
        dec = decode_dops_row(dops, i, int(lens[i]), genome,
                              int(poss[i]), reads[i])
        if dec is None:
            assert not ok_c[i]
            continue
        assert ok_c[i]
        assert cigs_c[i] == dec[0]
        assert nm_c[i] == dec[1] and sp_c[i] == dec[2]


def test_dops_pallas_interpret_bit_identical(rng):
    from urmap_tpu.kernels.tb_dp import (tb_dops_from_windows,
                                         tb_dops_from_windows_pallas)

    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 96)
    win = _windows(genome, poss)
    js, jd, jk = tb_dops_from_windows(win, reads, lens, hw=HW, sc=sc)
    ps, pd, pk = tb_dops_from_windows_pallas(win, reads, lens, hw=HW,
                                             sc=sc, interpret=True)
    np.testing.assert_array_equal(np.asarray(js), np.asarray(ps))
    np.testing.assert_array_equal(np.asarray(jd), np.asarray(pd))
    np.testing.assert_array_equal(np.asarray(jk), np.asarray(pk))


def test_dops_odd_shapes(rng):
    """Layout math at awkward static shapes: L not a multiple of 8 or
    4 (partial nibble group AND partial dops word), odd band widths —
    replay must still match the host traceback byte-for-byte."""
    from urmap_tpu.kernels.tb_dp import (tb_dops_from_windows,
                                         tb_dops_from_windows_pallas)
    from urmap_tpu.map.cigar import decode_dops_row

    sc = ScoreConfig()
    # two shapes cover the layout hazards (partial nibble group +
    # partial dops word; band at the 6-bit d-field limit) — each
    # variant costs two fresh XLA compiles, so keep the list tight
    for Lx, hwx in ((101, 9), (96, 31)):
        genome = rng.integers(0, 4, size=4000).astype(np.uint8)
        n = 24
        reads = np.full((n, Lx), 5, np.uint8)
        lens = np.zeros(n, np.int32)
        poss = np.zeros(n, np.int64)
        for i in range(n):
            ln = int(rng.integers(max(Lx - 9, 8), Lx + 1))
            pos = int(rng.integers(hwx + 4, 4000 - Lx - 32))
            seq = list(genome[pos : pos + ln + 8])
            at = int(rng.integers(4, ln - 4))
            sz = int(rng.integers(1, min(hwx, 4) + 1))
            if rng.random() < 0.5:
                seq = seq[:at] + list(rng.integers(0, 4, sz)) + seq[at:]
            else:
                seq = seq[:at] + seq[at + sz :]
            reads[i, :ln] = np.asarray(seq[:ln], np.uint8)
            lens[i] = ln
            poss[i] = pos
        win = np.zeros((n, Lx + 2 * hwx), np.uint8)
        for i in range(n):
            win[i] = genome[poss[i] - hwx : poss[i] + Lx + hwx]
        js, jd, jk = (np.asarray(x) for x in tb_dops_from_windows(
            win, reads, lens, hw=hwx, sc=sc))
        if hwx == 9:
            # kernel/twin identity once (interpret-mode compiles of the
            # wide-band unrolled backward pass cost minutes on CPU; the
            # other shapes pin the twin + replay math)
            ps, pd, pk = (np.asarray(x) for x in
                          tb_dops_from_windows_pallas(
                              win, reads, lens, hw=hwx, sc=sc,
                              interpret=True))
            np.testing.assert_array_equal(js, ps)
            np.testing.assert_array_equal(jd, pd)
            np.testing.assert_array_equal(jk, pk)
        for i in range(n):
            hcig, hscore, hnm = traceback(genome, reads[i][: lens[i]],
                                          int(poss[i]), sc)
            if hscore != js[i] or not jk[i]:
                continue   # host path left the band — fallback case
            dec = decode_dops_row(jd, i, int(lens[i]), genome,
                                  int(poss[i]), reads[i])
            assert dec is not None and dec[0] == hcig and dec[1] == hnm, \
                (Lx, hwx, i)


def test_zero_length_and_padding_rows(rng):
    sc = ScoreConfig()
    genome, reads, lens, poss = _planted_cases(rng, 8)
    lens[3] = 0
    win = _windows(genome, poss)
    score, bend, bits = (np.asarray(x) for x in
                         tb_from_windows(win, reads, lens, hw=HW, sc=sc))
    assert score[3] == 0 and bend[3] == HW
    dec = decode_tb_row(bits, 3, int(bend[3]), 0, genome, int(poss[3]),
                        reads[3], HW, L)
    # zero-length: empty walk — callers never decode such rows, but the
    # walk must not crash
    assert dec is None or dec[0] in ("", "0None")
