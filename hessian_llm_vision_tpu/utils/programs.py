"""Program-backed matvec marking (tunnel-safety contract).

Every ``curvature/`` operator matvec is a thin host closure over ONE
internally jitted program whose params/batch are EXPLICIT jit arguments.
Re-wrapping such a closure in ``jax.jit`` traces through it and lowers the
captured parameter pytree as inline HLO constants — which this backend's
remote compiler cannot digest at 124M+ params (CLAUDE.md; observed as a
>25 min compile hang on a 124M thick-restart run).  Host-driven solvers
must therefore jit RAW closures (dense test fixtures) but pass
program-backed matvecs through untouched.
"""

from __future__ import annotations

from typing import Callable

import jax


def mark_program_backed(fn: Callable) -> Callable:
    """Tag ``fn`` as backed by a cached compiled program (do not re-jit)."""
    fn.is_program_backed = True
    return fn


def ensure_program(matvec: Callable) -> Callable:
    """jit a raw matvec; pass program-backed / already-jitted ones through.

    ``jax.jit(jitted_fn)`` is harmless (args stay args), so already-jitted
    functions need no special case — only closure-style operator matvecs
    carry the marker.
    """
    if getattr(matvec, "is_program_backed", False):
        return matvec
    return jax.jit(matvec)
