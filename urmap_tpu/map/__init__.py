"""The per-read mapping pipeline: seed → vote → align → select → MAPQ.

All stages are fixed-shape jnp ops (jit/shard_map friendly); the banded DP
has a Pallas TPU kernel (kernels/banded_dp.py) with the jnp reference
implementation in map/dp.py as fallback and test baseline.
"""

from urmap_tpu.map.pipeline import Mapper, MapResult, make_map_batch_fn  # noqa: F401
