"""Environment-variable feature toggles.

Reference parity: ``util/scaffold.cc:56-82`` — ``DEEPFUSION_PROFILE`` enables
per-submit wall-clock reporting, ``DEEPFUSION_DUMP_CODE`` dumps generated JIT
machine code. The TPU analogue of a code dump is the lowered Mosaic/HLO text
(``DEEPFUSION_DUMP_CODE=1`` writes ``df_dump_<name>.<n>.txt``).
"""
from __future__ import annotations

import os

_TRUTHY = ("1", "true", "yes", "on")


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "").lower() in _TRUTHY


def is_profiling() -> bool:
    """Reference: ``utils::is_profiling`` (util/scaffold.cc:56-66)."""
    return _env_flag("DEEPFUSION_PROFILE")


def dump_code() -> bool:
    """Reference: ``utils::jit_dump_code`` (util/scaffold.cc:71-82)."""
    return _env_flag("DEEPFUSION_DUMP_CODE")


def interpret_kernels() -> bool:
    """Force Pallas interpreter mode (no reference analogue; debugging aid).

    Auto-enabled when the default backend is not a TPU so the whole test
    suite runs on CPU hosts.
    """
    if _env_flag("DEEPFUSION_INTERPRET"):
        return True
    try:
        import jax
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def tpu_compiler_params(dimension_semantics=None):
    """Mosaic compiler params for the big conv-family kernels.

    Two measured, load-bearing knobs:

    * ``vmem_limit_bytes`` — Mosaic's default scoped-VMEM stack limit is
      16 MiB, well under the 128 MiB physically present on v5e-class
      cores; a kernel whose working set crosses it fails with an opaque
      RESOURCE_EXHAUSTED at compile time. Raise it to the framework's
      VMEM budget (config._default_vmem_budget / DF_VMEM_BUDGET) plus
      headroom for Mosaic's own temporaries, so the tile picker's budget
      is the single source of truth.

    * ``dimension_semantics`` — independent grid dims are declared
      "parallel" (semantically required; the early "63.5% -> 94.6%"
      speedup attributed to it was N=24/min-of-reps protocol noise —
      re-measured perf-neutral on the single-core v5e under the honest
      protocol, docs/PERF.md). Dims that accumulate across steps (the
      ic-chunk dim) must stay "arbitrary".
    """
    from jax.experimental.pallas import tpu as pltpu

    from ..config import _default_vmem_budget

    limit = min(int(_default_vmem_budget() * 2), 100 * 1024 * 1024)
    return pltpu.CompilerParams(vmem_limit_bytes=limit,
                                dimension_semantics=dimension_semantics)
