import os

import numpy as np

from urmap_tpu import alphabet
from urmap_tpu.config import IndexConfig
from urmap_tpu.hashing import kmer_to_word
from urmap_tpu.index import UfiIndex, build_index
from urmap_tpu.io.fasta import SeqDB


def _random_genome(rng, n):
    return alphabet.decode(rng.integers(0, 4, size=n).astype(np.uint8))


def _np_slot(lo: int, hi: int, slot_bits: int) -> int:
    """Independent numpy/python reimplementation of hashing.hash_words."""
    M = 0xFFFFFFFF
    h = (lo * 0x9E3779B1) & M
    h ^= (hi * 0x85EBCA6B) & M
    h ^= h >> 16
    h = (h * 0x7FEB352D) & M
    h ^= h >> 15
    h = (h * 0x846CA68B) & M
    h ^= h >> 16
    return h & ((1 << slot_bits) - 1)


def _brute_index(db: SeqDB, cfg: IndexConfig):
    """Obviously-correct dict-based build: slot → sorted positions."""
    table: dict[int, list[int]] = {}
    codes = db.codes
    for p in range(len(codes) - cfg.k + 1):
        w = codes[p : p + cfg.k]
        if (w >= 4).any():
            continue
        lo, hi = kmer_to_word(w)
        table.setdefault(_np_slot(lo, hi, cfg.slot_bits), []).append(p)
    cap = cfg.max_positions_per_slot
    for s in table:
        ps = table[s]
        if len(ps) > cap:
            # even subsample: first rank of each mark m (store.evenly_cap_runs)
            table[s] = [ps[(m * len(ps) + cap - 1) // cap] for m in range(cap)]
    return table


def test_build_matches_bruteforce(rng):
    seq = _random_genome(rng, 3000)
    db = SeqDB.from_seqs(["chr1"], [seq])
    cfg = IndexConfig(k=12, slot_bits=14, max_positions_per_slot=4)
    idx = build_index(db, cfg)
    brute = _brute_index(db, cfg)
    for slot in range(cfg.num_slots):
        got = list(idx.slot_positions(slot))
        want = brute.get(slot, [])
        assert got == want, f"slot {slot}"


def test_build_chunked_equals_single(rng):
    seq = _random_genome(rng, 5000)
    db = SeqDB.from_seqs(["c"], [seq])
    cfg = IndexConfig(k=10, slot_bits=12, max_positions_per_slot=8)
    a = build_index(db, cfg)
    b = build_index(db, cfg, chunk=700)
    assert np.array_equal(a.offsets, b.offsets)
    assert np.array_equal(a.positions, b.positions)


def test_cap_subsamples_evenly():
    db = SeqDB.from_seqs(["c"], ["ACGT" * 100])  # extreme repeat
    cfg = IndexConfig(k=8, slot_bits=10, max_positions_per_slot=3)
    idx = build_index(db, cfg)
    counts = np.diff(idx.offsets)
    assert counts.max() == 3
    # kept positions are evenly spread across the run, NOT the first N
    # occurrences (each 8-mer phase recurs every 4 bases over ~390 bp)
    for slot in np.nonzero(counts == 3)[0]:
        ps = idx.slot_positions(int(slot))
        assert list(ps) == sorted(ps)
        assert ps[0] < 100          # early occurrence retained
        assert ps[-1] > 200         # ...and a late one (unbiased spread)


def test_recapped_matches_build_time_cap(rng):
    seq = _random_genome(rng, 2000) + "ACGT" * 50
    db = SeqDB.from_seqs(["c"], [seq])
    loose = build_index(db, IndexConfig(k=8, slot_bits=10,
                                        max_positions_per_slot=64))
    tight = build_index(db, IndexConfig(k=8, slot_bits=10,
                                        max_positions_per_slot=4))
    recap = loose.recapped(4)
    assert np.array_equal(recap.offsets, tight.offsets)
    assert np.array_equal(recap.positions, tight.positions)


def test_index_save_load(tmp_path, rng):
    db = SeqDB.from_seqs(["c"], [_random_genome(rng, 1000)])
    idx = build_index(db, IndexConfig(k=10, slot_bits=12))
    idx.save(str(tmp_path / "g.ufi"))
    idx2 = UfiIndex.load(str(tmp_path / "g.ufi"))
    assert idx2.config == idx.config
    assert np.array_equal(idx2.offsets, idx.offsets)
    assert np.array_equal(idx2.positions, idx.positions)
    assert np.array_equal(idx2.seqdb.codes, idx.seqdb.codes)


def test_separator_blocks_cross_sequence_words(rng):
    db = SeqDB.from_seqs(["a", "b"], ["ACGTACGTACGT", "TGCATGCATGCA"])
    cfg = IndexConfig(k=10, slot_bits=12, max_positions_per_slot=16)
    idx = build_index(db, cfg)
    ref_id, _ = db.global_to_local(idx.positions.astype(np.int64))
    # every indexed word lies fully inside one sequence
    for p, r in zip(idx.positions, ref_id):
        local = int(p) - int(db.starts[r])
        assert 0 <= local <= int(db.lengths[r]) - cfg.k


def test_host_build_matches_device(rng):
    from tests.utils import make_seqdb
    from urmap_tpu.config import IndexConfig
    from urmap_tpu.index.build import build_index

    db = make_seqdb(rng, [30_000, 10_000])
    cfg = IndexConfig(slot_bits=14, max_positions_per_slot=8)
    a = build_index(db, cfg, backend="device")
    b = build_index(db, cfg, backend="host")
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.positions, b.positions)


def test_streaming_spill_build_matches_inram(rng, tmp_path):
    """The disk radix-spill path (GRCh38-scale builds) must be
    bit-identical to the in-RAM merge, for both backends."""
    seq = _random_genome(rng, 40_000) + "ACGT" * 200  # with repeats
    db = SeqDB.from_seqs(["c"], [seq])
    cfg = IndexConfig(k=12, slot_bits=14, max_positions_per_slot=8)
    ref = build_index(db, cfg, backend="host")
    for backend in ("host", "device"):
        st = build_index(db, cfg, backend=backend, spill_threshold=5_000,
                         chunk=7_000, spill_dir=str(tmp_path))
        assert np.array_equal(st.offsets, ref.offsets), backend
        assert np.array_equal(st.positions, ref.positions), backend
        assert st.offsets.dtype == np.uint32


def test_native_build_matches_numpy_twin(rng, tmp_path, monkeypatch):
    """The C++ build kernels (urmap_extract_partition + urmap_sort_u64,
    codecs.cpp) must yield bit-identical indexes to the numpy twins on
    both host paths (in-RAM and disk spill)."""
    from urmap_tpu.index import build as bmod

    if bmod._native_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    seq = _random_genome(rng, 50_000) + "ACGT" * 300 + "N" * 37 \
        + _random_genome(rng, 10_000)
    db = SeqDB.from_seqs(["c"], [seq])
    for k, sb in ((24, 14), (17, 11)):
        cfg = IndexConfig(k=k, slot_bits=sb, max_positions_per_slot=8)
        native_inram = build_index(db, cfg, backend="host")
        native_spill = build_index(db, cfg, backend="host",
                                   spill_threshold=9_000,
                                   spill_dir=str(tmp_path))
        monkeypatch.setenv("URMAP_NO_NATIVE_BUILD", "1")
        ref = build_index(db, cfg, backend="host")
        ref_spill = build_index(db, cfg, backend="host",
                                spill_threshold=9_000,
                                spill_dir=str(tmp_path))
        monkeypatch.delenv("URMAP_NO_NATIVE_BUILD")
        np.testing.assert_array_equal(ref.offsets, ref_spill.offsets)
        for got in (native_inram, native_spill):
            np.testing.assert_array_equal(got.offsets, ref.offsets)
            np.testing.assert_array_equal(got.positions, ref.positions)


def test_native_extract_partition_primitive(rng):
    """urmap_extract_partition: key set == numpy extraction, partitioned
    by slot high bits, counts consistent; urmap_sort_u64 == np.sort."""
    from urmap_tpu.hashing import extract_words_np, words_to_slots_np
    from urmap_tpu.index import build as bmod

    L = bmod._native_lib()
    if L is None:
        import pytest

        pytest.skip("no native toolchain")
    codes = rng.integers(0, 4, 120_000).astype(np.uint8)
    codes[rng.random(codes.shape[0]) < 0.01] = 4  # N bases
    for k, slot_bits, radix_bits in ((24, 18, 8), (16, 12, 4), (31, 20, 0)):
        keys, counts = bmod._native_extract_partition(
            L, codes, 1000, k, slot_bits, radix_bits)
        lo, hi, valid = extract_words_np(codes, k)
        slots = words_to_slots_np(lo, hi, slot_bits)
        pos = (np.nonzero(valid)[0] + 1000).astype(np.uint32)
        ref = (slots[valid].astype(np.uint64) << np.uint64(32)) | pos
        assert keys.shape[0] == ref.shape[0]
        buck = (keys >> np.uint64(32 + slot_bits - radix_bits))
        assert (np.diff(buck.astype(np.int64)) >= 0).all()
        assert (np.bincount(buck.astype(np.int64),
                            minlength=1 << radix_bits) == counts).all()
        ks = keys.copy()
        bmod._sort_u64(L, ks)
        assert (ks == np.sort(ref)).all()


def test_native_recap_and_place_match_numpy(rng, monkeypatch):
    """UfiIndex.recapped and the aligned-layout placement must be
    bit-identical between the C++ kernels (urmap_recap/urmap_place_runs)
    and the numpy fallbacks, including heavy-repeat slots."""
    from urmap_tpu.index import build as bmod

    if bmod._native_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    seq = _random_genome(rng, 30_000) + "ACGTACGT" * 500 \
        + _random_genome(rng, 5_000)
    db = SeqDB.from_seqs(["c"], [seq])
    cfg = IndexConfig(k=12, slot_bits=12, max_positions_per_slot=64)
    idx = build_index(db, cfg, backend="host")
    for cap in (4, 8, 16):
        nat = idx.recapped(cap)
        nat_ht = idx.host_tables(cap=cap, row_align=16)
        monkeypatch.setenv("URMAP_NO_NATIVE_BUILD", "1")
        ref = idx.recapped(cap)
        ref_ht = idx.host_tables(cap=cap, row_align=16)
        monkeypatch.delenv("URMAP_NO_NATIVE_BUILD")
        np.testing.assert_array_equal(nat.offsets, ref.offsets)
        np.testing.assert_array_equal(nat.positions, ref.positions)
        for key in ("offsets", "positions", "ginter"):
            np.testing.assert_array_equal(nat_ht[key], ref_ht[key], key)


def test_row_aligned_tables_equal_classic(rng):
    """row_align device tables + aligned gather == classic CSR tables +
    classic gather, candidate-for-candidate (store.align_runs layout)."""
    import jax.numpy as jnp

    from tests.utils import make_seqdb, plant_read
    from urmap_tpu.config import MapConfig
    from urmap_tpu.index.store import align_runs
    from urmap_tpu.map.seed import (align_row_words, extract_seed_slots,
                                    gather_candidates)

    db = make_seqdb(rng, [300_000])
    icfg = IndexConfig(slot_bits=16)
    index = build_index(db, icfg, backend="host")
    mcfg = MapConfig(max_read_len=80, batch_size=32)
    p = mcfg.positions_per_seed
    rw = align_row_words(p)

    # layout invariants: no run straddles a row, pads are SENTINEL
    capped = index.recapped(p)
    counts = np.diff(capped.offsets.astype(np.int64))
    starts, total = align_runs(counts, rw)
    assert ((starts % rw) + counts <= rw).all()
    assert total >= int(counts.sum())

    t_classic = index.device_tables(cap=p)
    t_aligned = index.device_tables(cap=p, row_align=rw)

    reads = np.stack([plant_read(rng, db, length=80, strand=0,
                                 n_snps=1).codes for _ in range(32)])
    lens = np.full(32, 80, np.int32)
    slots, offs, valid = extract_seed_slots(
        jnp.asarray(reads), jnp.asarray(lens), k=icfg.k,
        q=mcfg.seeds_per_read, slot_bits=icfg.slot_bits)
    c0 = gather_candidates(t_classic["offsets"], t_classic["positions"],
                           slots, offs, valid, p=p)
    c1 = gather_candidates(t_aligned["offsets"], t_aligned["positions"],
                           slots, offs, valid, p=p, csr_aligned=True)
    # same candidate MULTISET per (read, seed): order within a run is
    # preserved, but pads shift nothing — sort for robustness
    np.testing.assert_array_equal(
        np.sort(np.asarray(c0), axis=-1), np.sort(np.asarray(c1), axis=-1))
    # the aligned table must be 128-divisible INCLUDING the guard words,
    # or seed.gather_candidates' dense-row + lane-rotate branch is dead
    # code forever (round-4 advisor finding: the old pad formula left
    # the length at 64 mod 128 with ROW_WORDS=32)
    assert t_aligned["positions"].shape[0] % 128 == 0


def test_align_runs_python_fallback_matches_native():
    from urmap_tpu.io import native
    from urmap_tpu.index import store

    rng = np.random.default_rng(7)
    counts = rng.integers(0, 17, size=5000).astype(np.int64)
    s_any, t_any = store.align_runs(counts, 16)
    if native.lib() is not None:
        # force the Python path and compare
        orig = native.lib
        try:
            native.lib = lambda: None
            s_py, t_py = store.align_runs(counts, 16)
        finally:
            native.lib = orig
        np.testing.assert_array_equal(s_any, s_py)
        assert t_any == t_py
    # no-straddle property + density
    assert ((s_any % 16) + counts <= 16).all()
    assert t_any >= int(counts.sum())


def test_align_runs_pow2_block_invariant():
    from urmap_tpu.index import store

    rng = np.random.default_rng(11)
    counts = rng.integers(0, 17, size=8000).astype(np.int64)
    starts, total = store.align_runs(counts, 16)
    g = np.maximum(1, 2 ** np.ceil(np.log2(np.maximum(counts, 1)))
                   .astype(np.int64))
    # every run stays inside ONE next_pow2(count)-word block — the
    # property the tiered gather (seed.gather_candidates tier) needs
    assert ((starts % g) + counts <= g).all()
    assert ((starts % 16) + counts <= 16).all()
    assert total >= int(counts.sum())


def test_tiered_gather_matches_full(rng):
    """gather_candidates tier=4 (narrow pass + overflow rounds) must be
    BIT-identical to the full-width aligned gather, including slots that
    overflow the tier (planted repeats)."""
    import jax.numpy as jnp

    from tests.utils import make_seqdb, plant_read
    from urmap_tpu.config import MapConfig
    from urmap_tpu.map.seed import (align_row_words, extract_seed_slots,
                                    gather_candidates)

    # heavy repeat: one 600 bp unit pasted 40x -> its k-mers' slots hold
    # tens of positions (over the tier, under the cap)
    unit = rng.integers(0, 4, size=600).astype(np.uint8)
    parts = [rng.integers(0, 4, size=200_000).astype(np.uint8)]
    for _ in range(40):
        parts.append(unit)
        parts.append(rng.integers(0, 4, size=1_000).astype(np.uint8))
    db = make_seqdb_from_codes(np.concatenate(parts))
    icfg = IndexConfig(slot_bits=16)
    index = build_index(db, icfg, backend="host")
    mcfg = MapConfig(max_read_len=80, batch_size=64)
    p = mcfg.positions_per_seed
    rw = align_row_words(p)
    t = index.device_tables(cap=p, row_align=rw)

    reads = np.stack([plant_read(rng, db, length=80, strand=0,
                                 n_snps=1).codes for _ in range(48)]
                     + [np.tile(unit[:80], 1).astype(np.uint8)
                        for _ in range(16)])   # repeat-unit reads
    lens = np.full(64, 80, np.int32)
    slots, offs, valid = extract_seed_slots(
        jnp.asarray(reads), jnp.asarray(lens), k=icfg.k,
        q=mcfg.seeds_per_read, slot_bits=icfg.slot_bits)
    full = gather_candidates(t["offsets"], t["positions"], slots, offs,
                             valid, p=p, csr_aligned=True)
    for tier in (4, 8):
        tiered = gather_candidates(t["offsets"], t["positions"], slots,
                                   offs, valid, p=p, csr_aligned=True,
                                   tier=tier, tier_overflow_frac=64)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(tiered))


def make_seqdb_from_codes(codes):
    from urmap_tpu.io.fasta import SeqDB

    return SeqDB.from_seqs(["chr1"], [codes])


def test_prepared_tables_roundtrip(rng, tmp_path):
    """save_prepared/load_prepared: Mapper built from the on-disk cache
    must produce identical tables, flags, and mapping results to a fresh
    prep."""
    import jax.numpy as jnp

    from tests.utils import make_seqdb, plant_read
    from urmap_tpu.config import MapConfig
    from urmap_tpu.index.store import (UfiIndex, load_prepared,
                                       prepare_tables, save_prepared)
    from urmap_tpu.map.pipeline import Mapper

    db = make_seqdb(rng, [200_000])
    icfg = IndexConfig(slot_bits=16)
    index = build_index(db, icfg, backend="host")
    d = str(tmp_path / "idx.ufi")
    index.save(d)
    mcfg = MapConfig(max_read_len=80, batch_size=32)
    p = mcfg.positions_per_seed

    ht_fresh, meta_fresh = prepare_tables(index, p)
    save_prepared(index, d, p)
    loaded = UfiIndex.load(d)
    got = load_prepared(loaded, p)
    assert got is not None
    ht, meta = got
    assert meta["csr_aligned"] == meta_fresh["csr_aligned"]
    assert meta["gather_tier"] == meta_fresh["gather_tier"]
    for key in ("offsets", "positions", "ginter"):
        np.testing.assert_array_equal(ht_fresh[key], np.asarray(ht[key]))
    assert ht["base_off"] == ht_fresh["base_off"]

    # stale-cache guard: a different gather width misses
    assert load_prepared(loaded, p * 2) is None

    m_fresh = Mapper(index, mcfg)
    m_cached = Mapper(loaded, mcfg)
    assert m_cached.csr_aligned == m_fresh.csr_aligned
    assert m_cached.gather_tier == m_fresh.gather_tier
    reads = np.stack([plant_read(rng, db, length=80, strand=s % 2,
                                 n_snps=1).codes for s in range(16)])
    lens = np.full(16, 80, np.int32)
    r1 = m_fresh.map_codes(reads, lens)
    r2 = m_cached.map_codes(reads, lens)
    np.testing.assert_array_equal(r1.pos, r2.pos)
    np.testing.assert_array_equal(r1.mapped, r2.mapped)
    np.testing.assert_array_equal(r1.score, r2.score)


def test_resave_over_old_format_and_in_place(rng, tmp_path):
    """(a) Re-saving into a pre-round-3 index dir must remove the stale
    tables.npz (load() prefers it, silently pairing old tables with the
    new seqdb). (b) load → save to the SAME path must round-trip even
    though load() hands back mmaps of the very files save() rewrites."""
    from tests.utils import make_seqdb

    db1 = make_seqdb(rng, [20_000])
    db2 = make_seqdb(rng, [30_000])
    cfg = IndexConfig(k=16, slot_bits=12, max_positions_per_slot=16)
    path = str(tmp_path / "g.ufi")
    old = build_index(db1, cfg, backend="host")
    old.save(path)
    # simulate the pre-round-3 layout: tables.npz + npz seqdb
    np.savez(os.path.join(path, "tables.npz"),
             offsets=old.offsets, positions=old.positions)
    os.remove(os.path.join(path, "offsets.npy"))
    os.remove(os.path.join(path, "positions.npy"))
    new = build_index(db2, cfg, backend="host")
    new.save(path)                      # must clear the stale npz
    got = UfiIndex.load(path)
    np.testing.assert_array_equal(got.offsets, new.offsets)
    np.testing.assert_array_equal(got.positions, new.positions)
    assert got.seqdb.total_len == db2.total_len
    # in-place re-save of a loaded (mmap-backed) index
    got.save(path)
    again = UfiIndex.load(path)
    np.testing.assert_array_equal(again.offsets, new.offsets)
    np.testing.assert_array_equal(again.positions, new.positions)
    np.testing.assert_array_equal(np.asarray(again.seqdb.codes),
                                  np.asarray(db2.codes))


def test_device_chunk_base_pos_past_2_31():
    """The jitted device-build chunk must accept word starts beyond
    2^31 (GRCh38-scale chunk bases): a bare Python int overflows the
    int32 jit argument parse — callers pass uint32."""
    import jax.numpy as jnp

    from urmap_tpu.index.build import _chunk_sorted_slots

    rng2 = np.random.default_rng(5)
    codes = rng2.integers(0, 4, 2_000).astype(np.uint8)
    base = 3_000_000_000
    sl, po = _chunk_sorted_slots(jnp.asarray(codes), np.uint32(base),
                                 12, 10)
    po = np.asarray(po).astype(np.int64)
    sl = np.asarray(sl)
    valid = sl < (1 << 10)
    assert po[valid].min() >= base
    assert po[valid].max() < base + codes.shape[0]
