"""Decompose the ResNet-stem (50x3x224x224 7x7/s2) wall time on the real
chip: s2d prep (ops/layout.prep_src_s2d) vs conv kernel vs maxpool.

Motivation: refscale_tpu.py measured the stem at 2.18 ms/iter with the
6-D-transpose s2d regroup — ~23 GB/s effective, far below both the MXU
and HBM floors, pointing at the ic=3-innermost transpose lowering. The
regroup was rewritten as row-parity slices (ops/layout._s2d_regroup);
this probe quantifies each stage before/after.

Run: timeout 580 python scratch/stem_probe.py [--iters 24]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    import bench
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from deepfusion_tpu.config import ConvConfig
    from deepfusion_tpu.ops import layout as L
    from deepfusion_tpu.ops.conv import ConvOp
    from deepfusion_tpu.ops.pool import pool
    from deepfusion_tpu.utils.mathutil import conv_output_size

    rng = np.random.default_rng(42)
    n, ic, ih, oc = 50, 3, 224, 64
    oh = conv_output_size(ih, 7, 2, 3)
    src = rng.integers(0, 256, (n, ih, ih, ic), dtype=np.uint8)
    wei = rng.integers(-127, 128, (oc, ic, 7, 7)).astype(np.int8)
    bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
    cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 7, 7), bia.dtype,
                          (2, 2), (3, 3), (n, oh, oh, oc), "u8",
                          conv0_relu=True, conv0_scales=(0.002,))
    cfg2 = L.s2d_cfg(cfg)
    op = ConvOp(cfg, wei, bia)
    x = jax.device_put(src)

    def bump(step):
        def f(z):
            out = step(z)
            b = (out.reshape(-1)[0].astype(jnp.int32) & 1).astype(jnp.uint8)
            return z + b
        return f

    def report(tag, step, xin, iters):
        sec = bench.timeit_chain(step, xin, iters, reps=5, spread_s=5)
        print(f"{tag:12s} {sec*1e3:.3f} ms/iter", flush=True)
        return sec

    # full op (prep + conv kernel + epilogue)
    report("conv_full", bump(op), x, args.iters)
    # prep alone
    prep = jax.jit(lambda s: L.prep_src_s2d(cfg, cfg2, s, xp=jnp))
    report("prep_s2d", bump(prep), x, args.iters)
    # pool alone on a conv-shaped output
    y = jax.device_put(
        rng.integers(0, 256, (n, oh, oh, oc), dtype=np.uint8))
    pl = jax.jit(lambda z: pool(z, "max", (2, 2), (2, 2), (0, 0)))
    report("maxpool2", bump(pl), y, args.iters * 4)

    # candidate: pure-XLA 2x2/s2 max as three elementwise maxes over
    # strided slices (no s2d relayout, no Pallas lane-group slicing)
    def xla_max2(z):
        r = jnp.maximum(z[:, 0::2], z[:, 1::2])
        return jnp.maximum(r[:, :, 0::2], r[:, :, 1::2])
    report("maxpool2_xla", bump(jax.jit(xla_max2)), y, args.iters * 4)
    # stem composite (what refscale times)
    stem = jax.jit(lambda s: pool(op(s), "max", (2, 2), (2, 2), (0, 0)))
    report("stem_total", bump(stem), x, args.iters)


if __name__ == "__main__":
    main()
