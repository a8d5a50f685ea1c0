"""TPU-native loss-landscape toolkit.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``diegogranziol/Hessian-LLM-Vision`` codebase: matrix-free curvature analysis
(Hessian / Gauss-Newton / Fisher vector products), Lanczos tridiagonalization
with stochastic Lanczos quadrature (SLQ) spectral densities, and
spectrum-aware optimizers (Lanczos-adjusted SGD/Adam, eigenvector-projection
for continual learning, Gauss-Newton / natural-gradient steps) — across GPT-2,
Pythia/NeoX, VGG/ResNet and synthetic workloads, data-parallel over a TPU mesh.

Design: SURVEY.md (repo root) maps every component here to the reference's
definition sites (file:line under /root/reference).
"""

__version__ = "0.1.0"

from hessian_llm_vision_tpu.utils.flatten import Flattener  # noqa: F401
