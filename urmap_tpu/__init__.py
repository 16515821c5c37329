"""urmap_tpu — a TPU-native short-read DNA mapping engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference mapper ``rcedgar/urmap`` (see SURVEY.md): a hashed k-mer index
("UFI"-style) of the reference genome held HBM-resident as CSR tables,
FASTQ read batches streamed through a data-parallel pipeline of vectorized
seed gathers, diagonal voting, batched banded gapped extension, paired-end
pairing/rescue and MAPQ scoring, emitting SAM.

The compute path is pure JAX (jit / shard_map / Pallas); host-side IO and
record formatting live in :mod:`urmap_tpu.io`.

Reference provenance: /root/reference was empty at survey and build time
(SURVEY.md §0) — reference citations are therefore to the URMAP paper
(Edgar 2020, PeerJ 8:e9338) and every guessed constant is flagged
``PARITY-TODO`` in :mod:`urmap_tpu.config`.
"""

__version__ = "0.1.0"

from urmap_tpu.config import IndexConfig, MapConfig, ScoreConfig  # noqa: F401
