from hessian_llm_vision_tpu.optim.manual import (
    sgd_momentum,
    manual_adam,
    raw_sgd,
)
from hessian_llm_vision_tpu.optim.schedules import linear_decay, constant
from hessian_llm_vision_tpu.optim.lanczos_sgd import (
    LanczosSGDConfig,
    LanczosSGDState,
    make_lanczos_sgd_step,
    make_layerwise_lanczos_sgd_step,
)
from hessian_llm_vision_tpu.optim.projection import (
    project_gradients,
    frozen_spectral_adjust,
)
from hessian_llm_vision_tpu.optim.second_order import (
    make_gauss_newton_step,
    make_natural_gradient_step,
)
from hessian_llm_vision_tpu.optim.precision_guard import (
    GuardEvent,
    GuardTier,
    RefreshPrecisionGuard,
    default_tiers,
    tier_index_for,
)

__all__ = [
    "sgd_momentum",
    "manual_adam",
    "raw_sgd",
    "linear_decay",
    "constant",
    "LanczosSGDConfig",
    "LanczosSGDState",
    "make_lanczos_sgd_step",
    "make_layerwise_lanczos_sgd_step",
    "project_gradients",
    "frozen_spectral_adjust",
    "make_gauss_newton_step",
    "make_natural_gradient_step",
    "GuardEvent",
    "GuardTier",
    "RefreshPrecisionGuard",
    "default_tiers",
    "tier_index_for",
]
