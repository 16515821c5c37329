"""Collective traffic: psum-broadcast vs all_to_all seed routing.

Compiles both sharded map programs on the 8-virtual-device CPU mesh and
sums the byte sizes of every collective instruction in the optimized
HLO (all-reduce for the psum path, all-to-all for the routing path).
Evidence for the ≥4× reduction claim (VERDICT round-1 item 5).
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

DT_BYTES = {"f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
            "s64": 8, "u64": 8, "bf16": 2, "f16": 2, "s16": 2, "u16": 2}


def collective_bytes(hlo: str):
    """Sum result-shape bytes of every collective instruction (handles
    tuple-shaped all-to-alls)."""
    out = {}
    ops = ("all-reduce", "all-to-all", "all-gather", "collective-permute",
           "reduce-scatter")
    for line in hlo.splitlines():
        for op in ops:
            k = line.find(f" {op}(")
            if k < 0 or "=" not in line[:k]:
                continue
            lhs = line[line.index("=") + 1 : k]
            total = 0
            for m in re.finditer(r"(\w+)\[([\d,]*)\]", lhs):
                n = 1
                for d in m.group(2).split(","):
                    if d:
                        n *= int(d)
                total += n * DT_BYTES.get(m.group(1), 4)
            out[op] = out.get(op, 0) + total
            break
    return out


def main():
    from tests.utils import make_seqdb
    from urmap_tpu.config import IndexConfig, MapConfig
    from urmap_tpu.dist.sharded import ShardedMapper, make_mesh
    from urmap_tpu.index.build import build_index

    rng = np.random.default_rng(0)
    db = make_seqdb(rng, [200_000])
    index = build_index(db, IndexConfig(slot_bits=16), backend="host")
    mcfg = MapConfig(max_read_len=152, batch_size=1024)
    mesh = make_mesh(8, data=1, index=8)

    results = {}
    for route in ("psum", "a2a"):
        sm = ShardedMapper(index, mesh, mcfg, route=route)
        import jax.numpy as jnp

        codes = np.full((mcfg.batch_size, mcfg.max_read_len), 5, np.uint8)
        lengths = np.full(mcfg.batch_size, 150, np.int32)
        lowered = sm._fn.lower(sm.offsets, sm.positions, sm.ginter,
                               jnp.asarray(codes), jnp.asarray(lengths))
        hlo = lowered.compile().as_text()
        cb = collective_bytes(hlo)
        results[route] = cb
        print(json.dumps({"route": route, "collective_bytes": cb,
                          "total": sum(cb.values())}), flush=True)
    tot_psum = sum(results["psum"].values())
    tot_a2a = sum(results["a2a"].values())
    print(json.dumps({"reduction_x": round(tot_psum / max(tot_a2a, 1), 2)}))


if __name__ == "__main__":
    main()
