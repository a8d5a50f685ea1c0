from hessian_llm_vision_tpu.krylov.lanczos import (
    lanczos,
    LanczosResult,
    lanczos_checkpointed,
)
from hessian_llm_vision_tpu.krylov.host_lanczos import lanczos_host_basis
from hessian_llm_vision_tpu.krylov.driver import (
    dataset_spectrum_host,
    dataset_thick_restart_host,
    layerwise_spectrum_host,
    matvec_precision_probe,
)
from hessian_llm_vision_tpu.krylov.compare import (
    ritz_relative_error,
    density_overlap,
    wasserstein_distance,
    subspace_overlap,
    summarize,
)
from hessian_llm_vision_tpu.krylov.slq import (
    ritz_decomposition,
    ritz_vectors,
    trace_estimate,
    quadrature,
    spectral_density,
    Spectrum,
)
from hessian_llm_vision_tpu.krylov.thick_restart import (
    lanczos_thick_restart,
    ThickRestartResult,
)
from hessian_llm_vision_tpu.krylov.autoprec import (
    AutoPrecisionPlan,
    PrecisionArm,
    auto_precision_plan,
    default_candidates,
    escalation_prefixes,
    op_split_candidates,
    prefix_block_spec,
    spec_to_overrides,
)
from hessian_llm_vision_tpu.krylov.driver import linearized_spectrum_host
from hessian_llm_vision_tpu.krylov.precplan import (
    checkpoint_fingerprint,
    default_plan_path,
    load_plan,
    params_fingerprint,
    plan_context,
    save_plan,
)
from hessian_llm_vision_tpu.krylov.power import power_iteration
from hessian_llm_vision_tpu.krylov.cg import cg_solve
from hessian_llm_vision_tpu.krylov.trace import hutchinson_trace, hutchpp_trace
from hessian_llm_vision_tpu.krylov.kpm import (
    KPMDensity,
    estimate_spectral_range,
    kpm_density,
)
from hessian_llm_vision_tpu.krylov.deflate import (
    DeflatedDensity,
    deflated_density,
    deflated_matvec,
)

__all__ = [
    "lanczos",
    "LanczosResult",
    "lanczos_checkpointed",
    "lanczos_thick_restart",
    "ThickRestartResult",
    "lanczos_host_basis",
    "dataset_spectrum_host",
    "dataset_thick_restart_host",
    "linearized_spectrum_host",
    "layerwise_spectrum_host",
    "AutoPrecisionPlan",
    "PrecisionArm",
    "auto_precision_plan",
    "checkpoint_fingerprint",
    "default_plan_path",
    "load_plan",
    "params_fingerprint",
    "plan_context",
    "save_plan",
    "default_candidates",
    "escalation_prefixes",
    "op_split_candidates",
    "prefix_block_spec",
    "spec_to_overrides",
    "matvec_precision_probe",
    "ritz_decomposition",
    "ritz_vectors",
    "trace_estimate",
    "quadrature",
    "spectral_density",
    "Spectrum",
    "power_iteration",
    "cg_solve",
    "hutchinson_trace",
    "hutchpp_trace",
    "KPMDensity",
    "estimate_spectral_range",
    "kpm_density",
    "DeflatedDensity",
    "deflated_density",
    "deflated_matvec",
    "ritz_relative_error",
    "density_overlap",
    "wasserstein_distance",
    "subspace_overlap",
    "summarize",
]
