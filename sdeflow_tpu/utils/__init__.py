from sdeflow_tpu.utils.profiling import (
    trace,
    Timer,
    benchmark,
    attention_flops,
    param_count,
)

__all__ = ["trace", "Timer", "benchmark", "attention_flops", "param_count"]
