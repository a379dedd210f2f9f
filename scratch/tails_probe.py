"""Refscale tail decomposition (VERDICT r4 #8): the ResNet head and stem.

HEAD (50x2048x7x7 conv1x1+relu -> global avg pool): the r4 number
(0.344 ms, 15.2%) ran the 1x1 as a per-image conv — M = 49 pixels per
grid step against a 2048x2048 weight panel, so the MXU sees M=49/128
rows and the 4 MB panel has only 49 rows of work to amortize against
per step. The fix is BATCH FLATTENING: all 50 images' pixels ride one M
dimension (a single (2800, 2048) @ (2048, 2048) int8 matmul through the
packed kernel with halo=0/col_off=0), weights resident across the whole
product. The avg pool runs on the packed output directly (u8 sums,
f32 * 1/49, round, saturate — ops/pool.py avg_exc semantics).

STEM (50x3x224x224 conv7x7/s2+relu -> maxpool2): the r4 number (1.424
ms, 2.1%) is PREP-BOUND — the s2d regroup + pad of the 7.5 MB u8 image
re-runs inside every chain step. The strided PackedConvOp folds the
regroup into pack_input (a model-boundary cost, paid once), so the
chain times the stride-1 s2d kernel + fused pool2 epilogue alone.

Both formulations are exact-matched against the numpy oracle before
timing. Run IN BACKGROUND with NO timeout (tunnel rules):
    python scratch/tails_probe.py [--case head|stem] [--iters 64]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import numpy as np

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp

from deepfusion_tpu.config import ConvConfig, PoolConfig
from deepfusion_tpu.ops import layout
from deepfusion_tpu.ops.packed import PackedConvOp, PackedSpec
from deepfusion_tpu.ops.ref import conv_ref, pool_ref
from deepfusion_tpu.ops.requant import round_f32, saturate_to
from deepfusion_tpu.types import dtype, round_mode
from deepfusion_tpu.utils.mathutil import conv_output_size, round_up


def expect(out, ref, tag):
    out = np.asarray(out)
    if not np.array_equal(out, ref):
        bad = np.argwhere(out != ref)
        raise SystemExit(f"FAIL {tag}: {bad.shape[0]} mismatches, "
                         f"first {bad[:4]}")
    print(f"OK   {tag}", flush=True)


def op_aux(op):
    out = []
    for a in op._operands:
        a = np.asarray(a)
        out.append(jax.device_put(a))
    return tuple(out)


def bench_line(step, x, macs, imgs, tag, iters, results, aux=None):
    sec = bench.timeit_chain(step, x, iters, reps=5, spread_s=5, aux=aux)
    peak, kind = bench.peak_ops()
    pct = 100.0 * 2 * macs / sec / peak
    line = {"case": tag, "ms_per_iter": round(sec * 1e3, 3),
            "imgs_per_sec": round(imgs / sec, 1),
            "conv_roofline_pct": round(pct, 2), "device": kind}
    print(f"BENCH {tag}: {sec*1e3:.3f} ms/iter  {imgs/sec:.1f} imgs/s  "
          f"{pct:.1f}% of int8 peak", flush=True)
    results.append(line)
    return line


def head_flat(rng, iters, results):
    n, ic, ih, oc = 50, 2048, 7, 2048
    src = rng.integers(0, 256, (n, ih, ih, ic), dtype=np.uint8)
    wei = rng.integers(-127, 128, (oc, ic, 1, 1)).astype(np.int8)
    bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
    # the per-image oracle config (refscale_tpu.py resnet_head)
    cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 1, 1), bia.dtype,
                          (1, 1), (0, 0), (n, ih, ih, oc), "u8",
                          conv0_relu=True, conv0_scales=(0.002,))
    pc = PoolConfig.make("avg_exc", (ih, ih), (7, 7), (7, 7), (0, 0))
    want = pool_ref(conv_ref(cfg, src, wei, bia), pc)

    # batch-flattened formulation: one tall image, kh=kw=1 so no
    # cross-image bleeding; halo=0/col_off=0 packs with zero waste rows
    hf = n * ih
    cfg_f = ConvConfig.make((1, hf, ih, ic), (oc, ic, 1, 1), bia.dtype,
                            (1, 1), (0, 0), (1, hf, ih, oc), "u8",
                            conv0_relu=True, conv0_scales=(0.002,))
    sin = PackedSpec.make(hf, ih, ic, halo=0, col_off=0)
    pop = PackedConvOp(cfg_f, wei, bia, sin=sin, halo_out=0,
                       col_off_out=0)
    x = jax.device_put(pop.pack_input(src.reshape(1, hf, ih, ic)))
    aux = op_aux(pop)
    iwp, ocp = pop.sout.iwp, pop.sout.cp

    def head(s, a):
        y = pop(s, operands=a)                  # (1, hf*iwp, ocp) s8
        img = y.reshape(n, ih, iwp, ocp)[:, :, :ih, :]
        sums = (jnp.sum(img.astype(jnp.int32), (1, 2))
                + jnp.int32(128 * ih * ih))     # u8 sums per image
        val = sums.astype(jnp.float32) * np.float32(1.0 / (ih * ih))
        out = saturate_to(round_f32(val, round_mode.nearest), dtype.u8)
        return out[:, :oc].reshape(n, 1, 1, oc)

    got = np.asarray(jax.jit(head)(x, aux))
    expect(got, want, "resnet_head_flat 1x1(flat-M)+avgpool7")

    def step(s, a):
        out = head(s, a)
        b = (out.reshape(-1)[0].astype(jnp.int32) & 1).astype(jnp.int8)
        return s.at[0, 0, 0].add(b)

    macs = n * ih * ih * ic * oc
    bench_line(step, x, macs, n, "resnet_head_flat", iters, results,
               aux=aux)


def stem_packed(rng, iters, results):
    n, ic, ih, oc = 50, 3, 224, 64
    oh = conv_output_size(ih, 7, 2, 3)          # 112
    src = rng.integers(0, 256, (n, ih, ih, ic), dtype=np.uint8)
    wei = rng.integers(-127, 128, (oc, ic, 7, 7)).astype(np.int8)
    bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
    cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 7, 7), bia.dtype,
                          (2, 2), (3, 3), (n, oh, oh, oc), "u8",
                          conv0_relu=True, conv0_scales=(0.002,))
    pc = PoolConfig.make("max", (oh, oh), (2, 2), (2, 2), (0, 0))
    want = pool_ref(conv_ref(cfg, src, wei, bia), pc)

    # strided packed op: the s2d regroup folds into pack_input (paid at
    # the model boundary, not per step); the pool2 epilogue rides the
    # requant, so the chain times ONE stride-1 kernel per step
    cfg_l = layout.s2d_cfg(cfg)
    sin = PackedSpec.make(cfg_l.ih, cfg_l.iw, cfg_l.ic,
                          halo=2, col_off=2,
                          iwp=round_up(cfg_l.iw + 4, 16))
    pop = PackedConvOp(cfg, wei, bia, sin=sin, halo_out=2,
                       col_off_out=2, pool2=True)
    x = jax.device_put(pop.pack_input(src))
    aux = op_aux(pop)

    from deepfusion_tpu.ops.packed import unpack_image
    sp = pop.sout_pooled

    def stem(s, a):
        return pop(s, operands=a)

    got = unpack_image(np.asarray(jax.jit(stem)(x, aux)), sp)
    expect(got, want, "resnet_stem_packed 7x7/s2+pool2 (pack-time s2d)")

    def step(s, a):
        out = stem(s, a)
        b = out[0, 0, 0].astype(jnp.int8) & 1
        return s.at[0, 0, 0].add(b)

    macs = n * oh * oh * 49 * ic * oc
    bench_line(step, x, macs, n, "resnet_stem_packed", iters, results,
               aux=aux)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None, choices=[None, "head", "stem"])
    ap.add_argument("--iters", type=int, default=64)
    a = ap.parse_args()
    rng = np.random.default_rng(42)
    results = []
    if a.case in (None, "head"):
        head_flat(rng, a.iters, results)
    if a.case in (None, "stem"):
        stem_packed(np.random.default_rng(42), a.iters, results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
