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
