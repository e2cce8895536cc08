from ganet_tpu.utils.logging import MetricLogger
from ganet_tpu.utils.profiling import Timer, benchmark_fn

__all__ = ["MetricLogger", "Timer", "benchmark_fn"]
