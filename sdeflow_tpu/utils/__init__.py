from sdeflow_tpu.utils.cache import enable_compilation_cache
from sdeflow_tpu.utils.profiling import (
    trace,
    Timer,
    benchmark,
    device_seconds,
    compiled_flops,
    peak_flops,
    attention_flops,
    param_count,
    memory_report,
    host_rss_bytes,
    device_memory_stats,
)

__all__ = ["enable_compilation_cache", "trace", "Timer", "benchmark",
           "device_seconds", "compiled_flops", "peak_flops",
           "attention_flops", "param_count", "memory_report",
           "host_rss_bytes", "device_memory_stats"]
