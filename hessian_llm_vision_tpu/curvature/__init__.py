from hessian_llm_vision_tpu.curvature.hvp import (
    hvp,
    hvp_fn,
    Normalization,
)
from hessian_llm_vision_tpu.curvature.operators import (
    LinearOperator,
    HessianOperator,
    DatasetHessianOperator,
    BlockDiagonalOperator,
    LayerHessianOperator,
    MatrixOperator,
)
from hessian_llm_vision_tpu.curvature.ggn import GGNOperator, FisherOperator
from hessian_llm_vision_tpu.curvature.linearized import (
    linearized_hvp_programs,
    linearized_matvec,
    residual_bytes,
)

__all__ = [
    "hvp",
    "hvp_fn",
    "Normalization",
    "LinearOperator",
    "HessianOperator",
    "DatasetHessianOperator",
    "BlockDiagonalOperator",
    "LayerHessianOperator",
    "MatrixOperator",
    "GGNOperator",
    "FisherOperator",
    "linearized_hvp_programs",
    "linearized_matvec",
    "residual_bytes",
]
