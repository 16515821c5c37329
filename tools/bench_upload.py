"""Host→device upload experiments on the axon relay (fetch-forced).

tools/bench_step.py showed the e2e map loop is UPLOAD-BOUND: the 4.9 MB
read batch upload costs ~50 ms serialized in-loop (411k → 251k reads/s)
and gets WORSE at inflight 2. This isolates:

  1. per-call floor: trivial jitted sum over a pre-uploaded batch
  2. upload [32k, 152] uint8 in-loop (+sum fetch)
  3. upload [32k, 38] uint8 in-loop (4 bases/byte packed — 4x smaller)
  4. FULL map step E-loop with uploads done by a PRODUCER THREAD
     (does the relay overlap uploads with execute/fetch at all?)
  5. FULL map step E-loop, packed upload + on-device unpack

Usage: python tools/bench_upload.py [--n 12]
"""

from __future__ import annotations

import argparse
import collections
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=16.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--n", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synth_reads
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.index.build import build_index
    from urmap_tpu.io.fasta import SeqDB
    from urmap_tpu.map.pipeline import make_map_batch_fn

    rng = np.random.default_rng(0)
    glen = int(args.genome_mbp * 1e6)
    db = SeqDB.from_seqs(["chr1"],
                         [rng.integers(0, 4, size=glen).astype(np.uint8)])
    icfg = IndexConfig(slot_bits=IndexConfig.auto_slot_bits(db.total_len))
    index = build_index(db, icfg, backend="host")
    B, L, n = args.batch, args.read_len, args.n
    mcfg = MapConfig(max_read_len=L, batch_size=B)
    tables = index.device_tables(cap=mcfg.positions_per_seed)
    full = make_map_batch_fn(icfg, mcfg)
    lens = jnp.asarray(np.full(B, L, np.int32))

    codes, _, _ = synth_reads(rng, db, B * n, L)
    host = [np.ascontiguousarray(codes[i * B:(i + 1) * B])
            for i in range(n)]
    # 4-bases/byte packing (pad L to /4); N (code>=4) marked in a bitmask
    Lp = -(-L // 4) * 4
    packed_host = []
    for h in host:
        hp = np.pad(h, ((0, 0), (0, Lp - L)), constant_values=0)
        two = (hp & 3).astype(np.uint8).reshape(B, Lp // 4, 4)
        sh = np.array([0, 2, 4, 6], np.uint8)
        packed_host.append(
            np.bitwise_or.reduce(two << sh[None, None, :], axis=2))
    dev = [jnp.asarray(h) for h in host]

    @jax.jit
    def tiny(x):
        return jnp.sum(x.astype(jnp.int32))

    def unpack(pk):
        sh = jnp.asarray([0, 2, 4, 6], jnp.uint8)[None, None, :]
        u = ((pk[:, :, None] >> sh) & jnp.uint8(3))
        return u.reshape(B, Lp)[:, :L]

    @jax.jit
    def full_packed(tables, pk, lens):
        return full(tables, unpack(pk), lens)

    def timed_loop(name, fn_iter):
        walls = []
        t0 = time.perf_counter()
        for final in fn_iter:
            np.asarray(final)
            walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
        med = sorted(walls)[len(walls) // 2] * 1e3
        tot = sum(walls)
        print(f"  {name:40s} med {med:7.1f} ms/call  "
              f"({len(walls) * B / tot:,.0f} reads/s)", flush=True)

    # warm every program with real fetches
    np.asarray(tiny(dev[0]))
    np.asarray(full(tables, dev[0], lens))
    np.asarray(full_packed(tables, jnp.asarray(packed_host[0]), lens))
    np.asarray(full(tables, dev[1], lens))

    timed_loop("1 tiny sum, pre-uploaded",
               (tiny(dev[i]) for i in range(n)))
    timed_loop("2 upload 4.9MB + tiny sum",
               (tiny(jnp.asarray(host[i])) for i in range(n)))
    timed_loop("3 upload 1.2MB packed + tiny sum",
               (tiny(jnp.asarray(packed_host[i])) for i in range(n)))

    def threaded_pipeline(srcs, to_dev, step):
        """Producer thread uploads; main thread runs inflight-1 E-loop."""
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            for s in srcs:
                q.put(to_dev(s))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        pend = collections.deque()
        while True:
            item = q.get()
            if item is None:
                break
            pend.append(step(item))
            if len(pend) > 1:
                yield pend.popleft()
        while pend:
            yield pend.popleft()
        t.join()

    timed_loop("4 FULL, threaded uploads, inflight-1",
               threaded_pipeline(host, jnp.asarray,
                                 lambda d: full(tables, d, lens)))
    timed_loop("5 FULL, threaded PACKED uploads",
               threaded_pipeline(packed_host, jnp.asarray,
                                 lambda d: full_packed(tables, d, lens)))
    timed_loop("6 FULL, main-thread uploads (ref)",
               (full(tables, jnp.asarray(host[i]), lens)
                for i in range(n)))


if __name__ == "__main__":
    main()
