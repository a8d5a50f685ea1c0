from hessian_llm_vision_tpu.ops.spectral import (
    spectral_adjust,
    spectral_adjust_reference,
    project_out,
    project_out_reference,
    rank_k_apply,
    rank_k_apply_reference,
)

__all__ = [
    "spectral_adjust",
    "spectral_adjust_reference",
    "project_out",
    "project_out_reference",
    "rank_k_apply",
    "rank_k_apply_reference",
]
