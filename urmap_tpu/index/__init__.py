"""UFI-style hashed k-mer index: on-device CSR build, store, shard."""

from urmap_tpu.index.store import UfiIndex  # noqa: F401
from urmap_tpu.index.build import build_index  # noqa: F401
