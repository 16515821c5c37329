"""On-device UFI index build: k-mer extract → sort → CSR.

The reference's builder is a two-pass counting sort over the genome on the
host CPU (SURVEY.md §3.1). The TPU-native redesign runs the hot part as
one jitted XLA pipeline: vectorized word extraction (hashing.extract_words
— k fused shift/or passes over the code array), ``jax.lax.sort`` of
(slot, position) pairs, then CSR offsets via vectorized binary search.
Repeat capping (the reference's high-frequency-word cap / pinned seeds,
Edgar 2020 Methods) keeps ``max_positions_per_slot`` positions of each
slot, subsampled evenly (store.evenly_cap_runs).

Large genomes are processed in chunks. Small builds merge the per-chunk
runs in RAM; GRCh38-scale builds stream (slot, pos) pairs through a
disk-backed radix spill partitioned by slot high bits, so peak RAM is
bounded by one radix bucket + the final tables, never by a whole-genome
sort (the in-RAM merge of 3.1e9 pairs would need ~50 GB of argsort
workspace). Both paths produce bit-identical indexes.
"""

from __future__ import annotations

import ctypes
import functools
import os
import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from urmap_tpu.config import IndexConfig
from urmap_tpu.hashing import extract_words, words_to_slots
from urmap_tpu.index.store import UfiIndex, evenly_cap_runs
from urmap_tpu.io.fasta import SeqDB

# Max genome positions sorted in one device call (chunking unit). 64M
# (slot,pos) pairs = 512 MB of sort traffic — comfortable in 16 GB HBM.
DEFAULT_CHUNK = 64 * 1024 * 1024
# Above this many words the build streams through the disk radix spill.
SPILL_THRESHOLD = 256 * 1024 * 1024

_P_U64 = ctypes.POINTER(ctypes.c_uint64)


def _native_lib():
    """The C++ build kernels (codecs.cpp urmap_extract_partition /
    urmap_sort_u64), or None → bit-identical numpy twins. Env hatch
    URMAP_NO_NATIVE_BUILD=1 forces the numpy path (tests compare both)."""
    if os.environ.get("URMAP_NO_NATIVE_BUILD"):
        return None
    from urmap_tpu.io import native

    return native.lib()


_keys_buf = np.empty(0, np.uint64)  # grow-only chunk buffer (builds are
#                                     serial per process; callers copy or
#                                     persist before the next chunk)


def _native_extract_partition(L, codes: np.ndarray, base_pos: int, k: int,
                              slot_bits: int, radix_bits: int):
    """Multithreaded C++ extract+hash+partition: codes uint8[n] →
    (keys uint64[(slot<<32)|pos] partitioned by slot>>shift ascending,
    per-bucket counts int64[2**radix_bits]). Bit-identical key set to
    extract_words_np → words_to_slots_np (tests/unit/test_index.py).
    The returned keys are a VIEW of a reused module buffer."""
    global _keys_buf
    from urmap_tpu.io import native

    codes = np.ascontiguousarray(codes)
    n_words = codes.shape[0] - k + 1
    if _keys_buf.shape[0] < n_words:
        from urmap_tpu.utils.bigmem import big_empty

        _keys_buf = big_empty(n_words, np.uint64)
    keys = _keys_buf[:n_words]
    counts = np.zeros(1 << radix_bits, np.int64)
    tot = L.urmap_extract_partition(
        codes.ctypes.data_as(native.p_u8), codes.shape[0], base_pos, k,
        slot_bits, slot_bits - radix_bits, os.cpu_count() or 4,
        keys.ctypes.data_as(_P_U64), counts.ctypes.data_as(native.p_i64))
    if tot < 0:
        raise MemoryError("urmap_extract_partition failed")
    return keys[:tot], counts


def _sort_u64(L, keys: np.ndarray) -> None:
    """In-place full sort of unique uint64 keys (native radix when
    available — ctypes releases the GIL, so callers parallelize across
    independent buckets with Python threads)."""
    if L is not None and keys.shape[0] > 1:
        if L.urmap_sort_u64(keys.ctypes.data_as(_P_U64),
                            keys.shape[0]) == 0:
            return
    keys.sort(kind="stable")


@functools.partial(jax.jit, static_argnames=("k", "slot_bits"))
def _chunk_sorted_slots(codes, base_pos, k: int, slot_bits: int):
    """One chunk: codes uint8[n] → (sorted slots uint32, positions uint32).

    Invalid words (containing N) get sentinel slot 2**slot_bits and sort
    to the tail, where the host trims them.
    """
    lo, hi, valid = extract_words(codes, k)
    slots = words_to_slots(lo, hi, slot_bits)
    sentinel = jnp.uint32(1 << slot_bits)
    slots = jnp.where(valid, slots, sentinel)
    n = slots.shape[0]
    # base_pos must arrive as uint32 (callers cast): a bare Python int
    # > 2^31 overflows the default int32 jit argument parse at GRCh38
    # scale (chunk starts run to ~3.1e9)
    pos = (jnp.arange(n, dtype=jnp.uint32) + base_pos)
    slots_s, pos_s = jax.lax.sort((slots, pos), num_keys=2)
    return slots_s, pos_s


def _merge_sorted_runs(runs: list[tuple[np.ndarray, np.ndarray]]):
    """Merge per-chunk (slot, pos) runs, each sorted by (slot, pos).

    Chunks are produced in ascending-position order, so one STABLE sort
    on slots alone re-establishes (slot, pos) order — equal slots keep
    (chunk, within-chunk) order, which is ascending pos. Half the cost
    of a two-key lexsort on multi-G-position genomes."""
    if len(runs) == 1:
        return runs[0]
    slots = np.concatenate([r[0] for r in runs])
    pos = np.concatenate([r[1] for r in runs])
    order = np.argsort(slots, kind="stable")
    return slots[order], pos[order]


def _cap_slots(slots: np.ndarray, pos: np.ndarray, num_slots: int, cap: int):
    """Cap each slot to ≤ `cap` positions, subsampled EVENLY across the
    slot's run (store.evenly_cap_runs — unbiased in genome position).
    Returns capped (slots, pos, offsets[uint32 num_slots+1]).

    Offsets come from one bincount pass + cumsum — ~20× the speed of a
    per-slot searchsorted on multi-M-position builds."""
    counts = np.bincount(slots, minlength=num_slots).astype(np.int64)
    offsets64 = np.zeros(num_slots + 1, np.int64)
    np.cumsum(counts, out=offsets64[1:])
    if cap > 0 and int(counts.max(initial=0)) > cap:
        keep = evenly_cap_runs(counts, cap)
        slots, pos = slots[keep], pos[keep]
        offsets64 = np.zeros(num_slots + 1, np.int64)
        np.cumsum(np.minimum(counts, cap), out=offsets64[1:])
    if slots.shape[0] >= (1 << 32):
        raise ValueError(
            f"{slots.shape[0]} positions exceed uint32 CSR range; raise "
            "max_positions_per_slot capping or shard the index (dist/)"
        )
    return slots, pos, offsets64.astype(np.uint32)


def _host_sorted_slots(codes: np.ndarray, k: int, slot_bits: int):
    """Host (numpy) build path: same (slot, pos) pairs as the device
    path, sorted by (slot, pos). Used when the device compile cost isn't
    worth it (small genomes, benchmarks, environments where XLA compiles
    are remote/uncached).

    One radix sort of the combined (slot << 32 | pos) uint64 key replaces
    stable-argsort + two payload gathers — positions are unique, so the
    combined order IS (slot asc, pos asc). With the native kernels the
    extraction partitions by slot high bits and the buckets sort in
    parallel (a bucket is a key-prefix range, so bucket-ascending +
    sorted-within == fully sorted)."""
    L = _native_lib()
    if L is not None:
        radix_bits = min(8, slot_bits)
        keys, counts = _native_extract_partition(L, codes, 0, k,
                                                 slot_bits, radix_bits)
        off = np.zeros(counts.shape[0] + 1, np.int64)
        np.cumsum(counts, out=off[1:])
        segs = [keys[off[i] : off[i + 1]] for i in range(counts.shape[0])]
        with ThreadPoolExecutor(min(4, os.cpu_count() or 4)) as ex:
            list(ex.map(lambda s: _sort_u64(L, s), segs))
        return (keys >> np.uint64(32)).astype(np.uint32), \
            keys.astype(np.uint32)
    from urmap_tpu.hashing import extract_words_np, words_to_slots_np

    lo, hi, valid = extract_words_np(codes, k)
    slots = words_to_slots_np(lo, hi, slot_bits)
    pos = np.nonzero(valid)[0].astype(np.uint32)
    key = (slots[valid].astype(np.uint64) << np.uint64(32)) | pos
    key.sort(kind="stable")               # radix for integer dtypes
    return (key >> np.uint64(32)).astype(np.uint32), \
        key.astype(np.uint32)


class _RadixSpill:
    """Disk-backed (slot, pos) partition by slot high bits.

    Pairs ride as one uint64 key (slot << 32 | pos); positions are
    unique, so the per-bucket radix sort in finalize() directly yields
    (slot asc, pos asc) — identical to the in-RAM merge, with no stable-
    argsort or payload gathers and no ordering requirements on add()."""

    def __init__(self, slot_bits: int, spill_dir: str | None):
        self.radix_bits = min(8, slot_bits)
        self.shift = slot_bits - self.radix_bits
        self.nbuck = 1 << self.radix_bits
        self.dir = tempfile.mkdtemp(prefix="ufi_spill_", dir=spill_dir)
        self.paths = [os.path.join(self.dir, f"b{i:04d}.bin")
                      for i in range(self.nbuck)]
        self.files = [open(p, "wb", buffering=1 << 20) for p in self.paths]

    def add(self, slots: np.ndarray, pos: np.ndarray,
            sorted_by_slot: bool = False) -> None:
        key = (slots.astype(np.uint64) << np.uint64(32)) | pos
        if sorted_by_slot:
            # device-build chunks arrive slot-sorted: bucket boundaries
            # are nbuck binary searches, no argsort partition pass.
            # uint32 needles — uint64 ones would promote (copy) the
            # whole slots chunk
            cuts = np.searchsorted(
                slots, (np.arange(1, self.nbuck, dtype=np.uint32)
                        << np.uint32(self.shift)).astype(slots.dtype))
            counts = np.diff(np.concatenate(
                [[0], cuts, [slots.shape[0]]]))
        else:
            b = (slots >> np.uint32(self.shift)).astype(np.uint8)
            order = np.argsort(b, kind="stable")  # radix partition
            key = key[order]
            counts = np.bincount(b, minlength=self.nbuck)
        off = 0
        for i in range(self.nbuck):
            c = int(counts[i])
            if c:
                self.files[i].write(key[off : off + c].tobytes())
                off += c

    def add_partitioned(self, keys: np.ndarray,
                        counts: np.ndarray) -> None:
        """Append keys already partitioned by bucket (ascending, counts
        per bucket) — the native extract_partition output lands here
        with zero host post-processing."""
        off = 0
        for i in range(self.nbuck):
            c = int(counts[i])
            if c:
                self.files[i].write(keys[off : off + c].tobytes())
                off += c

    def finalize(self, num_slots: int, cap: int):
        """Per-bucket sort + cap → (offsets uint32[num_slots+1],
        positions uint32). Deletes the spill directory.

        Buckets are independent, so a small thread pool loads + sorts a
        few buckets ahead (the native kernels release the GIL); the
        consumer assembles offsets/positions in bucket order. Buffers
        come from a fixed free-list and the capped positions land
        directly in the final array (bigmem shared-hugepage storage) —
        fresh multi-GB allocations cost ~5-20 s/GB of page faults on
        this VM class, so the loop reuses every large buffer."""
        for f in self.files:
            f.close()
        L = _native_lib()
        running = 0
        sps = 1 << self.shift                     # slots per bucket
        sizes = [os.path.getsize(p) // 8 for p in self.paths]
        grand = sum(sizes)          # uncapped upper bound on positions;
        #                             the capped total is range-checked
        #                             per bucket below
        window = min(4, (os.cpu_count() or 4))

        if L is not None:
            import ctypes
            import queue

            from urmap_tpu.utils.bigmem import big_empty

            # every entry is assigned below (each slot belongs to
            # exactly one bucket), so no zero-fill is needed — and a
            # zeroed anon array would fault ~10 s/GB on this VM class
            offsets = big_empty(num_slots + 1, np.uint32)
            final_pos = big_empty(max(grand, 1), np.uint32)
            maxb = max(sizes, default=1)
            free: queue.Queue = queue.Queue()
            for _ in range(window + 1):
                free.put((big_empty(maxb, np.uint64),
                          big_empty(maxb, np.uint32),
                          np.empty(sps, np.int64)))

            def load_sort(i: int):
                bufs = free.get()
                kbuf, pbuf, cbuf = bufs
                n = sizes[i]
                key = kbuf[:n]
                with open(self.paths[i], "rb") as f:
                    if f.readinto(key) != n * 8:
                        raise IOError(f"short read on {self.paths[i]}")
                _sort_u64(L, key)
                m = L.urmap_bucket_csr(
                    key.ctypes.data_as(_P_U64), n, i * sps, sps, cap,
                    pbuf.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_uint32)),
                    cbuf.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int64)))
                if m < 0:
                    raise RuntimeError("urmap_bucket_csr failed")
                return bufs, int(m)

            cum_buf = np.empty(sps + 1, np.int64)
            with ThreadPoolExecutor(window) as ex:
                pending = {i: ex.submit(load_sort, i)
                           for i in range(min(window, self.nbuck))}
                for i in range(self.nbuck):
                    bufs, m = pending.pop(i).result()
                    nxt = i + window
                    if nxt < self.nbuck:
                        pending[nxt] = ex.submit(load_sort, nxt)
                    _, pbuf, cbuf = bufs
                    lo = i * sps
                    cum_buf[0] = running
                    np.cumsum(cbuf, out=cum_buf[1:])
                    cum_buf[1:] += running
                    if cum_buf[-1] >= (1 << 32):
                        raise ValueError(
                            "positions exceed uint32 CSR range")
                    offsets[lo : lo + sps + 1] = cum_buf
                    final_pos[running : running + m] = pbuf[:m]
                    running = int(cum_buf[-1])
                    free.put(bufs)
            shutil.rmtree(self.dir, ignore_errors=True)
            return offsets, final_pos[:running]

        offsets = np.zeros(num_slots + 1, np.uint32)
        pos_parts = []

        def load_sort_np(i: int) -> np.ndarray:
            key = np.fromfile(self.paths[i], "<u8")
            _sort_u64(L, key)
            return key

        with ThreadPoolExecutor(window) as ex:
            pending = {i: ex.submit(load_sort_np, i)
                       for i in range(min(window, self.nbuck))}
            for i in range(self.nbuck):
                key = pending.pop(i).result()
                nxt = i + window
                if nxt < self.nbuck:
                    pending[nxt] = ex.submit(load_sort_np, nxt)
                sl_rel = (key >> np.uint64(32)).astype(np.int64) - i * sps
                po = key.astype(np.uint32)
                del key
                counts_b = np.bincount(sl_rel,
                                       minlength=sps).astype(np.int64)
                if cap > 0 and int(counts_b.max(initial=0)) > cap:
                    po = po[evenly_cap_runs(counts_b, cap)]
                    counts_b = np.minimum(counts_b, cap)
                pos_parts.append(po)
                lo = i * sps
                cum = running + np.concatenate([[0], np.cumsum(counts_b)])
                if cum[-1] >= (1 << 32):
                    raise ValueError("positions exceed uint32 CSR range")
                offsets[lo : lo + sps + 1] = cum
                running = int(cum[-1])
        shutil.rmtree(self.dir, ignore_errors=True)
        return offsets, np.concatenate(pos_parts) if pos_parts \
            else np.zeros(0, np.uint32)


def _host_chunk_slots(codes: np.ndarray, start: int, stop: int, k: int,
                      slot_bits: int):
    """Host word extraction for word starts [start, stop): returns
    (slots, pos) in ascending-position order (invalid words dropped)."""
    from urmap_tpu.hashing import extract_words_np, words_to_slots_np

    sub = codes[start : stop + k - 1]
    lo, hi, valid = extract_words_np(sub, k)
    slots = words_to_slots_np(lo, hi, slot_bits)
    pos = (np.nonzero(valid)[0] + start).astype(np.uint32)
    return slots[valid], pos


def build_index(seqdb: SeqDB, cfg: IndexConfig | None = None, *,
                chunk: int = DEFAULT_CHUNK,
                backend: str = "device",
                spill_threshold: int = SPILL_THRESHOLD,
                spill_dir: str | None = None) -> UfiIndex:
    """Build the UFI index for a SeqDB. ``cfg=None`` auto-sizes slot_bits
    from the genome length. ``backend``: "device" (XLA sort pipeline) or
    "host" (numpy twin — bit-identical output). Genomes with more than
    ``spill_threshold`` words stream through a disk radix spill
    (bounded RAM, same output bit-for-bit)."""
    if cfg is None:
        cfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(seqdb.total_len))
    codes = seqdb.codes
    n_words = codes.shape[0] - cfg.k + 1
    if n_words <= 0:
        raise ValueError("genome shorter than k")

    if n_words > spill_threshold:
        spill = _RadixSpill(cfg.slot_bits, spill_dir)
        L = None if backend == "device" else _native_lib()
        try:
            start = 0
            host_chunk = chunk if backend == "device" else max(chunk, 1 << 27)
            while start < n_words:
                stop = min(start + host_chunk, n_words)
                if backend == "device":
                    sl, po = _chunk_sorted_slots(
                        jnp.asarray(codes[start : stop + cfg.k - 1]),
                        np.uint32(start), cfg.k, cfg.slot_bits)
                    sl = np.asarray(sl)
                    po = np.asarray(po)
                    nvalid = np.searchsorted(sl,
                                             np.uint32(1 << cfg.slot_bits))
                    sl, po = sl[:nvalid], po[:nvalid]
                    spill.add(sl, po, sorted_by_slot=True)
                elif L is not None:
                    keys, counts = _native_extract_partition(
                        L, codes[start : stop + cfg.k - 1], start,
                        cfg.k, cfg.slot_bits, spill.radix_bits)
                    spill.add_partitioned(keys, counts)
                else:
                    sl, po = _host_chunk_slots(codes, start, stop, cfg.k,
                                               cfg.slot_bits)
                    spill.add(sl, po)
                start = stop
            offsets, positions = spill.finalize(cfg.num_slots,
                                                cfg.max_positions_per_slot)
        except BaseException:
            # a multi-Gbp spill is ~25 GB of /tmp — don't leak it when
            # the build dies mid-way (finalize removes it on success)
            import shutil

            shutil.rmtree(spill.dir, ignore_errors=True)
            raise
        return UfiIndex(config=cfg, offsets=offsets, positions=positions,
                        seqdb=seqdb)

    if backend == "host":
        slots, pos = _host_sorted_slots(codes, cfg.k, cfg.slot_bits)
        slots, pos, offsets = _cap_slots(slots, pos, cfg.num_slots,
                                         cfg.max_positions_per_slot)
        return UfiIndex(config=cfg, offsets=offsets,
                        positions=pos.astype(np.uint32), seqdb=seqdb)

    runs: list[tuple[np.ndarray, np.ndarray]] = []
    start = 0
    while start < n_words:
        stop = min(start + chunk, n_words)
        # chunk covers word starts [start, stop) → needs codes[start : stop+k-1]
        sl, po = _chunk_sorted_slots(
            jnp.asarray(codes[start : stop + cfg.k - 1]),
            np.uint32(start), cfg.k, cfg.slot_bits,
        )
        sl = np.asarray(sl)
        po = np.asarray(po)
        nvalid = np.searchsorted(sl, np.uint32(1 << cfg.slot_bits))
        runs.append((sl[:nvalid], po[:nvalid]))
        start = stop

    slots, pos = _merge_sorted_runs(runs)
    slots, pos, offsets = _cap_slots(slots, pos, cfg.num_slots, cfg.max_positions_per_slot)
    return UfiIndex(config=cfg, offsets=offsets, positions=pos.astype(np.uint32), seqdb=seqdb)
