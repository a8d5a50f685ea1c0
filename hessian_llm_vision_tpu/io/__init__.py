from hessian_llm_vision_tpu.io.checkpoints import (
    save_checkpoint,
    load_checkpoint,
)
from hessian_llm_vision_tpu.io.spectra import (
    save_spectrum,
    load_spectrum,
    save_reference_spectrum,
    load_reference_spectrum,
    save_tridiag,
    load_tridiag,
)
from hessian_llm_vision_tpu.io.runs import run_dir_name, parse_run_dir

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_spectrum",
    "load_spectrum",
    "save_reference_spectrum",
    "load_reference_spectrum",
    "save_tridiag",
    "load_tridiag",
    "run_dir_name",
    "parse_run_dir",
]
