from urmap_tpu.utils.progress import Progress, MetricsLogger  # noqa: F401
