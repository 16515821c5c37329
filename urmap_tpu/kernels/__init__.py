from urmap_tpu.kernels.banded_dp import banded_semiglobal_pallas  # noqa: F401
