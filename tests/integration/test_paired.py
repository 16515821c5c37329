"""Paired-end pipeline: pairing, flags/TLEN, mate rescue (SURVEY.md §2.11).

BASELINE.json config 2: "Paired-end mapping with insert-size pairing and
mate-rescue extension, SAM flags/TLEN parity" — verified here against
planted truth (reference binary unavailable, SURVEY.md §0).
"""

import numpy as np

from tests.utils import make_seqdb, plant_pair
from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig, MapConfig
from urmap_tpu.index.build import build_index
from urmap_tpu.io import sam as samio
from urmap_tpu.io.fastq import ReadBatch
from urmap_tpu.map.pair import PairedMapper
from urmap_tpu.map.pipeline import Mapper

L = 100
MAXL = 120


def _setup(rng, glen=150_000):
    db = make_seqdb(rng, [glen])
    index = build_index(db, IndexConfig(slot_bits=16))
    mcfg = MapConfig(max_read_len=MAXL, batch_size=16)
    return db, index, PairedMapper(Mapper(index, mcfg))


def _codes(reads):
    c = np.stack([np.pad(r.codes, (0, MAXL - len(r.codes)),
                         constant_values=alphabet.READ_N) for r in reads])
    return c, np.array([len(r.codes) for r in reads], np.int32)


def _batch(reads, prefix):
    c, ln = _codes(reads)
    return ReadBatch(codes=c, lengths=ln,
                     names=[f"{prefix}{i}" for i in range(len(reads))],
                     seqs=[r.seq.encode() for r in reads],
                     quals=[b"I" * len(r.codes) for r in reads])


def test_proper_pairs_planted(rng):
    db, index, pm = _setup(rng)
    pairs = [plant_pair(rng, db, length=L,
                        frag=int(rng.integers(150, 900)),
                        n_snps=int(rng.integers(0, 3)))
             for _ in range(24)]
    c1, l1 = _codes([p[0] for p in pairs])
    c2, l2 = _codes([p[1] for p in pairs])
    res = pm.map_pair_codes(c1, l1, c2, l2)

    n_ok = 0
    for i, (r1, r2, _) in enumerate(pairs):
        if (res.proper[i] and res.m1.mapped[i] and res.m2.mapped[i]
                and int(res.m1.pos[i]) == r1.gpos
                and int(res.m2.pos[i]) == r2.gpos
                and int(res.m1.strand[i]) == r1.strand
                and int(res.m2.strand[i]) == r2.strand):
            n_ok += 1
    assert n_ok >= len(pairs) - 1, f"only {n_ok}/{len(pairs)} proper+correct"


def test_mate_rescue(rng):
    db, index, pm = _setup(rng)
    # R2 mutated every 15 bases: every 24-mer seed contains a mismatch, so
    # seeding can't find it — only the anchored rescue scan can.
    pairs = [plant_pair(rng, db, length=L, frag=400, snp_every=15)
             for _ in range(12)]
    c1, l1 = _codes([p[0] for p in pairs])
    c2, l2 = _codes([p[1] for p in pairs])

    # sanity: R2 alone must be unmappable by the single-end pipeline
    se = pm.mapper.map_codes(c2, l2)
    assert int(se.mapped.sum()) <= 2

    res = pm.map_pair_codes(c1, l1, c2, l2)
    n_rescued = sum(
        1 for i, (r1, r2, _) in enumerate(pairs)
        if res.m2.mapped[i] and int(res.m2.pos[i]) == r2.gpos
        and int(res.m2.strand[i]) == r2.strand and res.proper[i])
    assert n_rescued >= len(pairs) - 2, f"rescued {n_rescued}/{len(pairs)}"
    # rescued MAPQ is capped
    from urmap_tpu.map.pair import RESCUE_MAPQ_CAP
    for i in range(len(pairs)):
        if res.m2.mapped[i]:
            assert int(res.m2.mapq[i]) <= max(RESCUE_MAPQ_CAP,
                                              int(res.m1.mapq[i]))


def test_paired_sam_records(rng):
    db, index, pm = _setup(rng)
    pairs = [plant_pair(rng, db, length=L, frag=300, r1_fwd=True)
             for _ in range(8)]
    b1 = _batch([p[0] for p in pairs], "p")
    b2 = _batch([p[1] for p in pairs], "p")
    recs, stats = pm.map_pairs_to_sam(b1, b2)
    assert stats["reads"] == 16
    assert len(recs) == 16

    by_name: dict[str, list[list[str]]] = {}
    for r in recs:
        f = r.split("\t")
        assert len(f) >= 11
        by_name.setdefault(f[0], []).append(f)
    for name, (f1, f2) in by_name.items():
        flag1, flag2 = int(f1[1]), int(f2[1])
        # paired + first/second partition
        assert flag1 & samio.FLAG_PAIRED and flag2 & samio.FLAG_PAIRED
        assert flag1 & samio.FLAG_FIRST and flag2 & samio.FLAG_SECOND
        if flag1 & samio.FLAG_PROPER:
            assert flag2 & samio.FLAG_PROPER
            # FR: exactly one reverse; mate-reverse mirrors it
            assert bool(flag1 & samio.FLAG_REVERSE) != bool(
                flag2 & samio.FLAG_REVERSE)
            assert bool(flag1 & samio.FLAG_MATE_REVERSE) == bool(
                flag2 & samio.FLAG_REVERSE)
            # TLEN symmetry and insert size
            t1, t2 = int(f1[8]), int(f2[8])
            assert t1 == -t2 and abs(t1) == 300
            # RNEXT/PNEXT cross-reference
            assert f1[6] == "=" and f2[6] == "="
            assert int(f1[7]) == int(f2[3]) and int(f2[7]) == int(f1[3])
    # all planted pairs proper here (clean reads, in-window insert)
    n_proper = sum(1 for r in recs if int(r.split("\t")[1]) & 0x2)
    assert n_proper >= 14


def test_unmapped_mate_placed_at_anchor(rng):
    db, index, pm = _setup(rng)
    r1, _, _ = plant_pair(rng, db, length=L, frag=300, r1_fwd=True)
    # replace R2 with random junk that cannot map or be rescued
    junk = np.asarray(
        alphabet.encode("".join("ACGT"[int(x)] for x in
                                rng.integers(0, 4, size=L)),
                        is_genome=False))
    # scramble beyond rescue: shuffle in blocks of 3
    junk = junk[np.argsort(rng.random(L))]

    b1 = _batch([r1], "q")
    from tests.utils import PlantedRead
    r2 = PlantedRead(codes=junk.astype(np.uint8), gpos=-1, strand=0)
    b2 = _batch([r2], "q")
    recs, stats = pm.map_pairs_to_sam(b1, b2)
    f1 = recs[0].split("\t")
    f2 = recs[1].split("\t")
    if not int(f2[1]) & samio.FLAG_UNMAPPED:
        return  # random junk occasionally maps on a small genome — fine
    assert int(f1[1]) & samio.FLAG_MATE_UNMAPPED
    # unmapped mate placed at the mapped mate's coordinates
    assert f2[2] == f1[2] and f2[3] == f1[3]
    assert int(f2[4]) == 0 and f2[5] == "*"


def test_pair_decisions_match_oracle(rng):
    """Device pairing (proper flag, positions, strands, MAPQ) vs the
    exhaustive paired oracle on a small genome. Clean seedable pairs so
    the device's rescue path (a device-only concept) never fires."""
    from tests.oracle.oracle import OracleMapper

    db = make_seqdb(rng, [6_000])
    index = build_index(db, IndexConfig(slot_bits=14), backend="host")
    mcfg = MapConfig(max_read_len=MAXL, batch_size=8)
    pm = PairedMapper(Mapper(index, mcfg))
    oracle = OracleMapper(db, map_cfg=mcfg)

    pairs = [plant_pair(rng, db, length=L,
                        frag=int(rng.integers(160, 700)),
                        n_snps=int(rng.integers(0, 3)))
             for _ in range(8)]
    c1, l1 = _codes([p[0] for p in pairs])
    c2, l2 = _codes([p[1] for p in pairs])
    res = pm.map_pair_codes(c1, l1, c2, l2)

    for i, (a, b, _) in enumerate(pairs):
        om1, om2, oproper = oracle.map_pair(a.codes, b.codes)
        assert bool(res.proper[i]) == oproper, i
        if oproper:
            assert int(res.m1.pos[i]) == om1.pos, i
            assert int(res.m2.pos[i]) == om2.pos, i
            assert int(res.m1.strand[i]) == om1.strand, i
            assert int(res.m1.score[i]) == om1.score, i
            assert int(res.m2.score[i]) == om2.score, i
            assert int(res.m1.mapq[i]) == om1.mapq, i
            assert int(res.m2.mapq[i]) == om2.mapq, i


def test_tlen_window_uses_exact_ref_span(rng):
    """Concordance TLEN uses the aligned ref span, not the read length
    (round-1 verdict weak item 4): an indel in the rightmost mate moves
    the exact fragment length across the window edge, and the device
    must agree with both the oracle and the emitted SAM TLEN."""
    from tests.oracle.oracle import OracleMapper
    from tests.utils import PlantedRead

    db = make_seqdb(rng, [30_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    mcfg = MapConfig(max_read_len=MAXL, batch_size=4)
    pm = PairedMapper(Mapper(index, mcfg))
    oracle = OracleMapper(db, map_cfg=mcfg)
    maxF = mcfg.max_fragment_len
    d = 5

    def make_pair(F, indel):
        """R1 fwd at p; R2 = rc of the fragment's last bases, carrying a
        5-base deletion ('del': ref span L+5) or insertion ('ins': ref
        span L-5). Exact TLEN = F either way."""
        p = int(db.starts[0]) + int(rng.integers(1000, 20_000))
        left = db.codes[p : p + L].copy()
        if indel == "del":
            gr = db.codes[p + F - (L + d) : p + F].copy()
            right_fwd = np.concatenate([gr[:40], gr[40 + d :]])
        else:
            gr = db.codes[p + F - (L - d) : p + F].copy()
            ins = rng.integers(0, 4, size=d).astype(np.uint8)
            right_fwd = np.concatenate([gr[:40], ins, gr[40:]])
        assert right_fwd.shape[0] == L
        r1 = PlantedRead(codes=left.astype(np.uint8), gpos=p, strand=0)
        r2 = PlantedRead(codes=alphabet.revcomp(right_fwd).astype(np.uint8),
                         gpos=p + F - right_fwd.shape[0], strand=1)
        return r1, r2, p

    # del case: proxy TLEN = F - 5 (in window), exact = F (outside)
    # ins case: proxy TLEN = F + 5 (outside), exact = F (in window)
    cases = [(maxF + 2, "del", False), (maxF - 2, "ins", True),
             (maxF - 20, "del", True), (mcfg.min_fragment_len + L + 20,
                                        "ins", True)]
    reads = [make_pair(F, kind) for F, kind, _ in cases]
    b1 = _batch([r[0] for r in reads], "t")
    b2 = _batch([r[1] for r in reads], "t")
    res = pm.map_pair_codes(b1.codes, b1.lengths, b2.codes, b2.lengths)

    for i, ((F, kind, want_proper), (r1, r2, p)) in enumerate(
            zip(cases, reads)):
        om1, om2, oprop = oracle.map_pair(
            r1.codes[: L], r2.codes[: L])
        assert bool(res.proper[i]) == want_proper, (i, kind, F)
        assert oprop == want_proper, (i, kind, F, "oracle")
        assert bool(res.m1.mapped[i]) and bool(res.m2.mapped[i]), i

    # emitted SAM TLEN for accepted pairs must equal the exact fragment
    # length (CIGAR ref span) and sit inside the window
    recs, _stats = pm.map_pairs_to_sam(b1, b2)
    for i, (F, kind, want_proper) in enumerate(cases):
        f1 = recs[2 * i].split("\t")
        if want_proper:
            assert int(f1[1]) & samio.FLAG_PROPER, (i, kind)
            assert abs(int(f1[8])) == F, (i, kind, f1[8])
            assert (mcfg.min_fragment_len <= abs(int(f1[8]))
                    <= mcfg.max_fragment_len)
