"""Host-side IO: FASTA→SeqDB, FASTQ batch streaming, SAM formatting.

Python implementations first (SURVEY.md §7 Phase 1); profiled hot paths
move to the C++ codecs in urmap_tpu/io/native (Phase 5) behind the same
interfaces.
"""

from urmap_tpu.io.fasta import SeqDB  # noqa: F401
from urmap_tpu.io.fastq import FastqReader, ReadBatch  # noqa: F401
