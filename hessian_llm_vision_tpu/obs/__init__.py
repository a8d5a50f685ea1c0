from hessian_llm_vision_tpu.obs.timing import Timer, HVPMeter
from hessian_llm_vision_tpu.obs.loggers import (
    TensorBoardLogger,
    PickleStatsLogger,
    MultiLogger,
)

__all__ = [
    "Timer",
    "HVPMeter",
    "TensorBoardLogger",
    "PickleStatsLogger",
    "MultiLogger",
]
