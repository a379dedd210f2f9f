"""Shared test utilities (reference: test/test_utils.h).

fill_data mirrors the reference's generators (test/test_utils.h:49-63):
f32 = 1 + 0.01*sin(i % 37); s8/s32 in [-10, 10]; u8 in [0, 16].
compare mirrors compare_array (test/test_utils.h:73-85): exact for ints,
1e-4 relative for f32.
"""
import numpy as np

from deepfusion_tpu.types import dtype


def fill_data(shape, dt, rng):
    dt = dtype.from_any(dt)
    if dt == dtype.f32:
        i = np.arange(int(np.prod(shape)), dtype=np.float32).reshape(shape)
        return (1.0 + 0.01 * np.sin(i % 37)).astype(np.float32)
    if dt == dtype.u8:
        return rng.integers(0, 17, shape, dtype=np.uint8)
    return rng.integers(-10, 11, shape).astype(dt.np)


def compare(out, ref, what=""):
    out = np.asarray(out)
    ref = np.asarray(ref)
    assert out.shape == ref.shape, f"{what}: shape {out.shape} vs {ref.shape}"
    assert out.dtype == ref.dtype, f"{what}: dtype {out.dtype} vs {ref.dtype}"
    if out.dtype == np.float32:
        denom = np.maximum(np.abs(ref), 1e-6)
        rel = np.abs(out - ref) / denom
        bad = rel > 1e-4
        assert not bad.any(), (
            f"{what}: f32 mismatch at {np.argwhere(bad)[:5]} "
            f"out={out[bad][:5]} ref={ref[bad][:5]}")
    else:
        eq = out == ref
        assert eq.all(), (
            f"{what}: int mismatch at {np.argwhere(~eq)[:5]} "
            f"out={out[~eq][:5]} ref={ref[~eq][:5]}")
