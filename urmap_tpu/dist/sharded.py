"""Sharded mapping: UFI tables split over a device mesh (shard_map).

The reference is a single-node pthreads program (SURVEY.md §2.13); its only
parallelism is data parallelism over reads. This module adds the TPU-native
distributed dimension designed in SURVEY.md §5.7/§3.3:

  mesh axes ("data", "index"):
    * data  — batch parallelism over reads (the reference's thread fan-out,
      re-expressed as sharding of the [B, L] read block).
    * index — the model-parallel analog: the UFI CSR tables are sharded by
      hash-slot range, so a genome index larger than one chip's HBM spans
      the mesh. Every index shard answers lookups for the slots it owns and
      the partial candidate sets are combined with one int32 ``psum``
      (each (read, seed) slot is owned by exactly one shard, so masked
      partials sum to the full candidate set — no all_to_all capacity
      bounds, no overflow lane).

  The banded-DP verification stage is *compute*-sharded over the same
  "index" axis (each shard verifies 1/S of the candidate DPs,
  ``all_gather`` rejoins the scores), so adding index shards scales the
  dominant FLOP stage, not just memory.

Collectives are XLA-lowered (`psum`, `all_gather`) and mesh-shape-agnostic:
the same program runs on an 8-virtual-device CPU mesh (tests), one real
chip, or a multi-host slice (dist/multihost.py wires the global mesh).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig
from urmap_tpu.index.store import UfiIndex
from urmap_tpu.map.dp import banded_packed
from urmap_tpu.map.pipeline import MapResult, map_batch_device
from urmap_tpu.map.seed import POS_BIAS, SENTINEL, gather_candidates


def make_mesh(n_devices: int | None = None, *, data: int | None = None,
              index: int | None = None) -> Mesh:
    """("data", "index") mesh over the first n devices. Defaults put most
    devices on the index axis (HBM capacity + DP-stage scaling); data
    parallelism across hosts is the cheaper axis to widen later."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None and index is None:
        index = _largest_pow2_divisor(n)
        data = n // index
    elif data is None:
        data = n // index  # type: ignore[operator]
    elif index is None:
        index = n // data
    assert data * index == n, f"mesh {data}x{index} != {n} devices"
    arr = np.asarray(devs[:n]).reshape(data, index)
    return Mesh(arr, ("data", "index"))


def _largest_pow2_divisor(n: int) -> int:
    p = 1
    while n % (p * 2) == 0:
        p *= 2
    return p


@dataclass
class ShardedTables:
    """Host-side stacked per-shard tables, ready for device_put.

    offsets: int32[S, sps + 1] local CSR offsets per shard (slot range
      [s*sps, (s+1)*sps), global slot space padded up to S*sps).
    positions: int32[S, pmax] local position arrays, padded with 0 past
      each shard's count (dead lanes are masked by the offsets).
    """

    num_shards: int
    slots_per_shard: int
    offsets: np.ndarray
    positions: np.ndarray


def shard_index_tables(index: UfiIndex, num_shards: int) -> ShardedTables:
    """Split the global CSR by hash-slot range into ``num_shards`` shards."""
    cfg = index.config
    S = num_shards
    sps = -(-cfg.num_slots // S)
    goff = index.offsets.astype(np.int64)
    # biased device coordinates (seed.POS_BIAS) — same as device_tables
    pos = (index.positions.astype(np.int64) - POS_BIAS).astype(np.int32)

    off_l = []
    pos_l = []
    pmax = 0
    for s in range(S):
        lo = min(s * sps, cfg.num_slots)
        hi = min((s + 1) * sps, cfg.num_slots)
        o = goff[lo : hi + 1] - goff[lo]
        if hi - lo < sps:  # pad tail shard's slot range with empty slots
            o = np.concatenate([o, np.full(sps - (hi - lo), o[-1], np.int64)])
        off_l.append(o.astype(np.uint32))
        p = pos[goff[lo] : goff[hi]]
        pmax = max(pmax, p.shape[0])
        pos_l.append(p)
    from urmap_tpu.genome_pack import ROW_WORDS

    pmax = max(pmax, 1)
    pmax += 2 * ROW_WORDS + ((-pmax) % ROW_WORDS)  # row-gather guard pad
    positions = np.zeros((S, pmax), np.int32)
    for s, p in enumerate(pos_l):
        positions[s, : p.shape[0]] = p
    return ShardedTables(num_shards=S, slots_per_shard=sps,
                         offsets=np.stack(off_l), positions=positions)


def save_sharded_tables(index: UfiIndex, path: str, num_shards: int) -> None:
    """Persist per-shard CSR files (one npz per hash-range shard) so a
    multi-host run can load only its own shards (SURVEY.md §2.7). The
    genome/seqdb rides in the base index directory (index.save)."""
    import json
    import os

    st = shard_index_tables(index, num_shards)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "shards.json"), "w") as f:
        json.dump({"num_shards": st.num_shards,
                   "slots_per_shard": st.slots_per_shard}, f)
    for s in range(st.num_shards):
        np.savez(os.path.join(path, f"shard{s}.npz"),
                 offsets=st.offsets[s], positions=st.positions[s])


def load_sharded_tables(path: str,
                        shards: list[int] | None = None) -> ShardedTables:
    """Load all (or a subset of) shard files back into stacked arrays."""
    import json
    import os

    with open(os.path.join(path, "shards.json")) as f:
        meta = json.load(f)
    n = meta["num_shards"]
    idxs = list(range(n)) if shards is None else shards
    offs = []
    poss = []
    pmax = 1
    for s in idxs:
        with np.load(os.path.join(path, f"shard{s}.npz")) as z:
            offs.append(z["offsets"])
            poss.append(z["positions"])
            pmax = max(pmax, poss[-1].shape[0])
    positions = np.zeros((len(idxs), pmax), np.int32)
    for i, p in enumerate(poss):
        positions[i, : p.shape[0]] = p
    return ShardedTables(num_shards=n,
                         slots_per_shard=meta["slots_per_shard"],
                         offsets=np.stack(offs), positions=positions)


def _sharded_step(offsets, positions, ginter, reads, lengths, *,
                  icfg: IndexConfig, mcfg: MapConfig, sc: ScoreConfig,
                  sps: int, n_index: int, base_off: int, genome_len: int):
    """Per-device body under shard_map. Shapes are the local blocks:
    offsets [1, sps+1], positions [1, pmax], reads [b, L], lengths [b].

    Reuses the single-device pipeline (map/pipeline.py) with two mesh-
    aware runners plugged in: the CSR gather answers only locally-owned
    hash slots and psum-combines partials, and the gapped-DP bucket is
    chunked across the "index" axis and rejoined with all_gather."""
    offsets = offsets[0]
    positions = positions[0]
    p = mcfg.positions_per_seed
    my = jax.lax.axis_index("index")
    my_base = my.astype(jnp.int32) * jnp.int32(sps)

    def gather_runner(slots, offs, valid):
        rel = slots.astype(jnp.int32) - my_base
        owned = valid & (rel >= 0) & (rel < sps)
        rel = jnp.clip(rel, 0, sps - 1)
        cand = gather_candidates(offsets, positions, rel.astype(jnp.uint32),
                                 offs, owned, p=p)
        # exactly one shard owns each (read, seed): psum masked partials
        hit = cand != SENTINEL
        summed = jax.lax.psum(jnp.where(hit, cand, 0), "index")
        n_hit = jax.lax.psum(hit.astype(jnp.int32), "index")
        return jnp.where(n_hit > 0, summed, SENTINEL)

    def dp_runner(flat_cand, flat_reads, flat_lens, flat_rp, flat_rn):
        n = flat_cand.shape[0]
        chunk = -(-n // n_index)
        npad = chunk * n_index
        if npad != n:
            flat_cand = jnp.pad(flat_cand, (0, npad - n))
            flat_reads = jnp.pad(flat_reads, ((0, npad - n), (0, 0)))
            flat_lens = jnp.pad(flat_lens, (0, npad - n))
            flat_rp = jnp.pad(flat_rp, ((0, npad - n), (0, 0)))
            flat_rn = jnp.pad(flat_rn, ((0, npad - n), (0, 0)))
        start = my.astype(jnp.int32) * jnp.int32(chunk)

        def sl(x, nd=1):
            return jax.lax.dynamic_slice_in_dim(x, start, chunk, axis=0)

        s_, d0_, ung_, sp_ = banded_packed(
            ginter, base_off, sl(flat_cand), sl(flat_reads),
            sl(flat_lens), sl(flat_rp), sl(flat_rn),
            hw=mcfg.band_halfwidth, sc=sc,
            clip_open=sc.clip_open if mcfg.end_clip else None)
        s = jax.lax.all_gather(s_, "index", tiled=True)[:n]
        d0 = jax.lax.all_gather(d0_, "index", tiled=True)[:n]
        ung = jax.lax.all_gather(ung_, "index", tiled=True)[:n]
        sp = jax.lax.all_gather(sp_, "index", tiled=True)[:n]
        return s, d0, ung, sp

    tables = {"ginter": ginter,
              "base_off": base_off,
              "genome_max_biased": np.int32(genome_len - 1 - POS_BIAS)}
    return map_batch_device(tables, reads, lengths,
                            icfg=icfg, mcfg=mcfg, sc=sc,
                            dp_runner=dp_runner, gather_runner=gather_runner)


def _a2a_gather_runner(offsets, positions, *, sps: int, n_index: int,
                       p: int, slack: float = 2.0):
    """Fixed-capacity all_to_all seed routing (SURVEY.md §2.8 [NS]).

    Each device owns a hash-slot range AND a distinct read block (reads
    are sharded over BOTH mesh axes — unlike the psum path, nothing is
    replicated). Per round: every device packs its unserved (read, seed)
    slot queries into per-destination lanes [S, K], all_to_all routes
    them to the owning shard, the owner answers with its CSR positions
    [S, K, P], and a second all_to_all routes answers home. Queries that
    overflow the K-lane capacity wait for the next round (while_loop —
    zero extra rounds at the default 2× slack, full coverage always).

    Collective bytes per device ≈ 2·M·(P+1)·4·(S−1)/S with M local
    queries, vs the psum path's 2·M_global·P·4·(S−1)/S — an ~S·P/(P+1)
    reduction (reads not replicated), ≥4× on an 8-wide index axis.
    """

    def gather_runner(slots, offs, valid):
        m, q = slots.shape
        M = m * q
        S = n_index
        K = max(1, int(slack * M / S))
        fslot = slots.reshape(-1).astype(jnp.int32)
        fvalid = valid.reshape(-1)
        owner = jnp.clip(fslot // jnp.int32(sps), 0, S - 1)
        my = jax.lax.axis_index("index").astype(jnp.int32)
        SENT_Q = jnp.int32(-1)

        def cond(state):
            _, served = state
            rem = jnp.any(~served).astype(jnp.int32)
            return jax.lax.psum(rem, ("data", "index")) > 0

        def body(state):
            cand_pos, served = state
            ow = jnp.where(served, S, owner)          # served → dummy dest
            order = jnp.argsort(ow, stable=True)
            so = ow[order]                             # [M] ascending dests
            counts = jnp.bincount(so, length=S + 1)
            start = jnp.concatenate(
                [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])[:-1]
            rank = jnp.arange(M, dtype=jnp.int32) - start[so].astype(jnp.int32)
            okK = (rank < K) & (so < S)
            send = jnp.full((S, K), SENT_Q)
            send = send.at[so, rank].set(
                jnp.where(okK, fslot[order], SENT_Q), mode="drop")

            recv = jax.lax.all_to_all(send, "index", split_axis=0,
                                      concat_axis=0)  # [S, K] per-src rows
            rel = recv - my * jnp.int32(sps)
            owned = (rel >= 0) & (rel < sps) & (recv != SENT_Q)
            relc = jnp.clip(rel, 0, sps - 1).reshape(-1)
            st = jnp.take(offsets, relc, axis=0)
            cnt = (jnp.take(offsets, relc + 1, axis=0) - st) \
                .astype(jnp.int32)
            from urmap_tpu import genome_pack as gpk

            posr = gpk.gather_window(
                positions, st, p,
                row_words=gpk.GATHER_ROW_WORDS)                 # [S*K, P]
            lane_ok = (jnp.arange(p, dtype=jnp.int32)[None, :]
                       < cnt[:, None]) & owned.reshape(-1)[:, None]
            resp = jnp.where(lane_ok, posr.astype(jnp.int32), SENTINEL)
            back = jax.lax.all_to_all(resp.reshape(S, K, p), "index",
                                      split_axis=0, concat_axis=0)
            got = back[so, jnp.minimum(rank, K - 1)]            # [M, P]
            upd = okK[:, None]
            cand_pos = cand_pos.at[order].set(
                jnp.where(upd, got, cand_pos[order]))
            served = served.at[order].set(served[order] | okK)
            return cand_pos, served

        init_pos = jnp.full((M, p), SENTINEL, jnp.int32)
        # invalid seeds never route; they stay SENTINEL
        cand_pos, _ = jax.lax.while_loop(
            cond, body, (init_pos, ~fvalid))
        cand = jnp.where(cand_pos == SENTINEL, SENTINEL,
                         cand_pos - offs.reshape(-1).astype(jnp.int32)[:, None])
        return cand.reshape(m, q * p)

    return gather_runner


def _sharded_step_a2a(offsets, positions, ginter, reads, lengths, *,
                      icfg: IndexConfig, mcfg: MapConfig, sc: ScoreConfig,
                      sps: int, n_index: int, base_off: int,
                      genome_len: int):
    """Per-device body, all_to_all routing: local blocks are
    offsets [1, sps+1], positions [1, pmax], reads [b_local, L] — reads
    sharded over ("data", "index"), so vote/verify/DP all run locally
    with no replicated compute and no cross-device combine beyond the
    two routing all_to_alls."""
    offsets = offsets[0]
    positions = positions[0]
    tables = {"ginter": ginter, "base_off": base_off,
              "genome_max_biased": np.int32(genome_len - 1 - POS_BIAS)}
    runner = _a2a_gather_runner(offsets, positions, sps=sps,
                                n_index=n_index,
                                p=mcfg.positions_per_seed)
    return map_batch_device(tables, reads, lengths, icfg=icfg, mcfg=mcfg,
                            sc=sc, gather_runner=runner)


def make_sharded_map_fn(mesh: Mesh, icfg: IndexConfig, mcfg: MapConfig,
                        sc: ScoreConfig, sps: int, base_off: int,
                        genome_len: int, route: str = "psum"):
    """Jitted fn(offsets, positions, genome, reads, lengths) → out dict,
    sharded per the mesh. Genome is replicated; CSR tables live on the
    "index" axis; reads/outputs on "data"."""
    from urmap_tpu.map.pipeline import pack_out

    n_index = mesh.shape["index"]
    step = _sharded_step_a2a if route == "a2a" else _sharded_step
    body = functools.partial(step, icfg=icfg, mcfg=mcfg, sc=sc,
                             sps=sps, n_index=n_index, base_off=base_off,
                             genome_len=genome_len)

    def packed_body(*args):
        # one packed int32[b, PACKED_COLS] output → one D2H fetch
        return pack_out(body(*args))

    batch_axes = ("data", "index") if route == "a2a" else "data"
    fn = jax.shard_map(
        packed_body, mesh=mesh,
        in_specs=(P("index", None), P("index", None), P(),
                  P(batch_axes, None), P(batch_axes)),
        out_specs=P(batch_axes, None),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedMapper:
    """Host wrapper mirroring map.pipeline.Mapper for a sharded mesh.

    ``route``: how sharded seed lookups combine across the "index" axis.
      - "a2a" (default): all_to_all query routing; reads sharded over
        BOTH axes, compute fully data-parallel (SURVEY.md §2.8 [NS]).
      - "psum": reads replicated over "index"; each shard answers its
        slot range and masked partials psum-combine (round-1 design,
        kept as the reference/ comparison path)."""

    def __init__(self, index: UfiIndex, mesh: Mesh,
                 mcfg: MapConfig | None = None, sc: ScoreConfig | None = None,
                 route: str = "a2a"):
        assert route in ("a2a", "psum"), route
        from urmap_tpu.kernels.preflight import ensure_kernels

        ensure_kernels()   # see pipeline.Mapper — jnp fallback on failure
        self.index = index
        self.mesh = mesh
        self.route = route
        self.icfg = index.config
        self.mcfg = mcfg or MapConfig()
        self.sc = sc or ScoreConfig()
        n_index = mesh.shape["index"]
        # same explicit unbiased gather-width cap as the unsharded Mapper
        st = shard_index_tables(index.recapped(self.mcfg.positions_per_seed),
                                n_index)
        self._sps = st.slots_per_shard

        def put(x, spec):
            return jax.device_put(
                x, jax.sharding.NamedSharding(mesh, spec))

        from urmap_tpu import genome_pack as gpk
        from urmap_tpu.map.seed import POS_BIAS

        ginter, base_off = gpk.pack_genome(index.seqdb.codes)
        self.offsets = put(st.offsets, P("index", None))
        self.positions = put(st.positions, P("index", None))
        self.ginter = put(ginter, P())
        # static word offset carries the coordinate bias (device_tables)
        self._fn = make_sharded_map_fn(mesh, self.icfg, self.mcfg, self.sc,
                                       self._sps,
                                       base_off + POS_BIAS // gpk.BASES_PER_WORD,
                                       index.seqdb.total_len, route=route)

    def map_codes(self, codes: np.ndarray, lengths: np.ndarray) -> MapResult:
        from urmap_tpu import alphabet

        B = codes.shape[0]
        n_data = self.mesh.shape["data"]
        if self.route == "a2a":
            n_data *= self.mesh.shape["index"]   # batch sharded over both
        bs = max(self.mcfg.batch_size, n_data)
        bs = -(-bs // n_data) * n_data
        outs = []
        for s in range(0, B, bs):
            c = codes[s : s + bs]
            ln = lengths[s : s + bs]
            if c.shape[0] < bs:
                pad = bs - c.shape[0]
                c = np.concatenate(
                    [c, np.full((pad, c.shape[1]), alphabet.READ_N, np.uint8)])
                ln = np.concatenate([ln, np.zeros(pad, np.int32)])
            out = self._fn(self.offsets, self.positions, self.ginter,
                           jnp.asarray(c),
                           jnp.asarray(ln.astype(np.int32)))
            outs.append(np.asarray(out))
        from urmap_tpu.map.pipeline import unpack_out

        merged = unpack_out(np.concatenate(outs)[:B])
        return MapResult.from_device(merged, np.asarray(lengths)[:B])
