from gslora_tpu.metrics.logging import MetricLogger  # noqa: F401
