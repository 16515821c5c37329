"""Device banded DP vs the oracle's exhaustive unbanded DP."""

import jax.numpy as jnp
import numpy as np

from tests.oracle import OracleMapper
from tests.oracle.oracle import semiglobal_scan
from tests.utils import make_seqdb, plant_read
from urmap_tpu import alphabet
from urmap_tpu.config import ScoreConfig
from urmap_tpu.map.dp import banded_semiglobal

SC = ScoreConfig()
HW = 16
L = 128


def _pad(reads):
    out = np.full((len(reads), L), alphabet.READ_N, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        out[i, : len(r)] = r
        lens[i] = len(r)
    return out, lens


def _device(db, cands, reads, lens):
    s, d0, ung, sp = banded_semiglobal(
        jnp.asarray(db.codes), jnp.asarray(np.asarray(cands, np.int32)),
        jnp.asarray(reads), jnp.asarray(lens), hw=HW, sc=SC)
    return np.asarray(s), np.asarray(d0), np.asarray(ung), np.asarray(sp)


def test_dp_matches_oracle_planted(rng):
    db = make_seqdb(rng, [4000])
    oracle = OracleMapper(db)
    reads, cands, want = [], [], []
    for _ in range(40):
        kind = rng.integers(0, 4)
        r = plant_read(rng, db, length=int(rng.integers(60, 120)), strand=0,
                       n_snps=int(rng.integers(0, 4)) if kind != 0 else 0,
                       ins=int(rng.integers(1, 6)) if kind == 2 else 0,
                       dels=int(rng.integers(1, 6)) if kind == 3 else 0)
        m = oracle.map_read(r.codes)
        assert m.mapped and m.strand == 0
        jitter = int(rng.integers(-HW // 2, HW // 2 + 1))
        reads.append(r.codes)
        cands.append(m.pos + jitter)
        want.append(m)
    codes, lens = _pad(reads)
    scores, d0, ung, spans = _device(db, cands, codes, lens)
    for i, m in enumerate(want):
        assert scores[i] == m.score, i
        assert cands[i] + d0[i] == m.pos, i
        assert ung[i] <= scores[i]
        if "I" not in m.cigar and "D" not in m.cigar:
            assert ung[i] == scores[i], i
        # exact aligned ref span: ends where the oracle's winner ends
        # (oracle .end is the exclusive end offset)
        assert cands[i] + d0[i] + spans[i] == m.end, i


def test_dp_free_start_tracks_offset(rng):
    db = make_seqdb(rng, [2000])
    r = plant_read(rng, db, length=100, strand=0)
    codes, lens = _pad([r.codes] * (2 * HW + 1))
    cands = [r.gpos + d for d in range(-HW, HW + 1)]
    scores, d0, _, spans = _device(db, cands, codes, lens)
    assert (scores == 100).all()
    assert (np.asarray(cands) + d0 == r.gpos).all()
    assert (spans == 100).all()  # pure-match alignment: span == length


def test_dp_zero_length_read(rng):
    db = make_seqdb(rng, [1000])
    codes, lens = _pad([np.zeros(0, np.uint8)])
    scores, d0, ung, _ = _device(db, [500], codes, lens)
    assert scores[0] == 0 and ung[0] == 0


def test_dp_score_never_below_oracle_in_band(rng):
    """Device is a band-restricted search: score ≤ oracle everywhere, and
    equal whenever the oracle's optimum fits in the band."""
    db = make_seqdb(rng, [3000])
    sc = SC
    for _ in range(10):
        r = plant_read(rng, db, length=80, n_snps=5, strand=0)
        scores_o, starts_o = semiglobal_scan(db.codes, r.codes, sc)
        best_j = int(np.argmax(scores_o))
        codes, lens = _pad([r.codes])
        s, d0, _, sp = _device(db, [int(starts_o[best_j])], codes, lens)
        assert s[0] == scores_o[best_j]
        assert d0[0] == 0
