from hessian_llm_vision_tpu.obs.timing import Timer, HVPMeter, profile_trace
from hessian_llm_vision_tpu.obs.trace_summary import summarize_trace, print_trace_summary
from hessian_llm_vision_tpu.obs.loggers import (
    TensorBoardLogger,
    PickleStatsLogger,
    MultiLogger,
)

__all__ = [
    "Timer",
    "HVPMeter",
    "profile_trace",
    "summarize_trace",
    "print_trace_summary",
    "TensorBoardLogger",
    "PickleStatsLogger",
    "MultiLogger",
]
