"""Focused unit tests for round-3 pure helpers (the code review verified
these by reading; this pins them).

- shard_prepared_tables: every shard's local base is rounded to the row
  width, so run starts keep their residue mod g for all pow2 g ≤ rw (the
  invariant the aligned/tiered/row128 fetches rely on), and the local
  slices reproduce the global entries.
- store.ginter_rows: stale (pre-%128) caches pad with interleaved all-N
  guard pairs.
- dist.sharded._addressable_rows: deduplicates index-replicated shards
  (the psum route) and returns rows in order.
- store.effective_gather_tier: tier is opt-in via URMAP_TIER_GATHER.
"""

import numpy as np

from urmap_tpu.index.store import (ROW128, effective_gather_tier,
                                   ginter_rows)


def test_shard_prepared_base_alignment(rng):
    from tests.utils import make_seqdb
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.index.store import prepare_tables
    from urmap_tpu.dist.sharded import shard_prepared_tables
    from urmap_tpu.map.seed import align_row_words

    db = make_seqdb(rng, [250_000])
    index = build_index(db, IndexConfig(slot_bits=15), backend="host")
    p = MapConfig.positions_per_seed
    ht, meta = prepare_tables(index, p)
    rw = align_row_words(p)
    S = 4
    st = shard_prepared_tables(ht, meta, S)
    goff = np.asarray(ht["offsets"]).astype(np.int64)
    gpos = np.asarray(ht["positions"])
    sps = st.slots_per_shard
    num_slots = goff.shape[0] - 1
    for s in range(S):
        lo = min(s * sps, num_slots)
        hi = min((s + 1) * sps, num_slots)
        base = int(goff[lo]) & ~(rw - 1)
        # base must be a multiple of the row width (residue preservation)
        assert base % rw == 0
        loc = st.offsets[s].astype(np.int64)
        np.testing.assert_array_equal(loc[: hi - lo + 1],
                                      goff[lo : hi + 1] - base)
        if meta["csr_aligned"] or meta.get("layout") == "row128":
            # every local run start keeps its residue mod rw
            np.testing.assert_array_equal(
                loc[: hi - lo] % rw, goff[lo:hi] % rw)
        # local entries == global entries for every slot in the range
        for slot in range(lo, min(lo + 50, hi)):
            g = gpos[goff[slot] : goff[slot + 1]]
            l_ = st.positions[s][loc[slot - lo] : loc[slot - lo + 1]]
            np.testing.assert_array_equal(g, l_)


def test_ginter_rows_pads_stale_caches():
    # simulate a pre-%128 cache: interleaved (code, nplane) pairs whose
    # length is a multiple of 64 but not of 128
    g = np.zeros(192, np.uint32)
    g[1::2] = 0x1234_5678            # fake nplane values
    out = ginter_rows(g)
    assert out.shape == (2, 128)
    flat = out.reshape(-1)
    np.testing.assert_array_equal(flat[:192], g)
    # the pad is all-N guard pairs
    np.testing.assert_array_equal(flat[192::2], 0)
    np.testing.assert_array_equal(flat[193::2], 0x5555_5555)
    # already-aligned input is returned unpadded
    g2 = np.zeros(256, np.uint32)
    assert ginter_rows(g2).shape == (2, 128)


def test_addressable_rows_dedup(rng):
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from urmap_tpu.dist.sharded import _addressable_rows, make_mesh

    mesh = make_mesh(8, data=2, index=4)
    x = np.arange(16 * 3, dtype=np.int32).reshape(16, 3)
    # psum-route layout: rows sharded over "data" only → each row block
    # is REPLICATED over the 4 "index" devices
    arr = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    rows, data = _addressable_rows(arr)
    np.testing.assert_array_equal(rows, np.arange(16))
    np.testing.assert_array_equal(data, x)
    # a2a-route layout: rows sharded over both axes → distinct shards
    arr2 = jax.device_put(x, NamedSharding(mesh, P(("data", "index"),
                                                   None)))
    rows2, data2 = _addressable_rows(arr2)
    np.testing.assert_array_equal(rows2, np.arange(16))
    np.testing.assert_array_equal(data2, x)


def test_effective_gather_tier_env_gate(monkeypatch):
    meta = {"gather_tier": 4}
    monkeypatch.delenv("URMAP_TIER_GATHER", raising=False)
    assert effective_gather_tier(meta) is None
    monkeypatch.setenv("URMAP_TIER_GATHER", "1")
    assert effective_gather_tier(meta) == 4
    assert ROW128 == 128
