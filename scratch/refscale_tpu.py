"""Reference-scale shapes on the real chip (VERDICT r2 #7).

Runs the EXACT workloads of the reference's conv+relu+pool spec
(/root/reference/test/test_conv_relu_pooling.cc:316-338) — the VGG
chain including 512ch@28x28 and 512ch@14x14, the ResNet 50x3x224x224
7x7/s2 stem, and the 50x2048x7x7 1x1 + global-avg-pool head — through
the production ops with the REAL device VMEM budget (no monkeypatched
ic-chunk limits), exact-match vs the numpy oracle, plus one bench line
per case (paired-chain protocol, bench.timeit_chain).

Run: timeout 580 python scratch/refscale_tpu.py [--iters 24] [--fast]
(one jax client at a time on the tunneled chip). --fast skips benches.
Artifact: artifacts/REFSCALE_r03.json (one JSON line per case).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import numpy as np


def expect(out, ref, tag):
    out = np.asarray(out)
    if not np.array_equal(out, ref):
        bad = np.argwhere(out != ref)
        raise SystemExit(f"FAIL {tag}: {bad.shape[0]} mismatches, "
                         f"first {bad[:4]}")
    print(f"OK   {tag}", flush=True)


def bench_line(step, x, macs, imgs, tag, iters, results, aux=None):
    import bench
    sec = bench.timeit_chain(step, x, iters, reps=5, spread_s=10, aux=aux)
    peak, kind = bench.peak_ops()
    pct = 100.0 * 2 * macs / sec / peak
    line = {"case": tag, "ms_per_iter": round(sec * 1e3, 3),
            "imgs_per_sec": round(imgs / sec, 1),
            "conv_roofline_pct": round(pct, 2), "device": kind}
    print(f"BENCH {tag}: {sec*1e3:.3f} ms/iter  {imgs/sec:.1f} imgs/s  "
          f"{pct:.1f}% of int8 peak", flush=True)
    results.append(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--fast", action="store_true", help="skip benches")
    ap.add_argument("--case", default=None, help="run one case by name")
    ap.add_argument("--composed", action="store_true",
                    help="resnet_stem: measure the ConvOp + separate pool "
                         "composition instead of the fused ConvPoolOp")
    ap.add_argument("--packed", action="store_true",
                    help="vgg blocks: run the packed-domain formulation "
                         "(PackedConvOp + packed_maxpool2) instead of the "
                         "dense ConvPoolOp")
    args = ap.parse_args()

    import bench
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from deepfusion_tpu.config import ConvConfig, PoolConfig
    from deepfusion_tpu.ops.conv import ConvOp
    from deepfusion_tpu.ops.convpool import ConvPoolOp, pool2_fusable
    from deepfusion_tpu.ops.pool import pool
    from deepfusion_tpu.ops.ref import conv_ref, pool_ref
    from deepfusion_tpu.utils.mathutil import conv_output_size

    rng = np.random.default_rng(42)
    results = []

    def bump_step(fn):
        # data dependency through one output element (shape-changing ops
        # can't feed their output back); see bench.bench_conv's chain
        # note. fn takes (x, aux) — the op's packed weights ride as jit
        # arguments so compiles stay shape-keyed and fast (bench.make_chain).
        # The fold is an IN-PLACE one-element update: the former full-array
        # `x + b` billed an extra read+write of x to every op (r5 protocol
        # honesty pass, scratch/nochain_probe.py)
        def step(x, aux):
            out = fn(x, aux)
            b = (out.reshape(-1)[0].astype(jnp.int32) & 1).astype(x.dtype)
            return x.at[(0,) * x.ndim].add(b)
        return step

    def op_aux(op):
        return tuple(jax.device_put(np.asarray(a)) for a in op._operands)

    # ---- VGG conv+relu+maxpool2 blocks (test_conv_relu_pooling.cc:317-327)
    # (n, ic, ih, oc, iters): conv3x3 p1 s1 + relu -> maxpool 2x2/s2, dst u8.
    # Exactness runs the reference's batch-1 shape; the batch-8 rows time
    # the same kernel at a TPU-sensible batch (batch 1 at 14x14 is launch-
    # overhead-bound on any accelerator). Chain length scales inversely
    # with per-iter cost so the paired-chain difference dominates the
    # ~10ms tunnel jitter (docs/PERF.md protocol).
    vgg = {
        "vgg_64x224": (1, 64, 224, 128, 8),
        "vgg_512x28": (1, 512, 28, 512, 32),
        "vgg_512x14": (1, 512, 14, 512, 32),
        "vgg_512x28_b8": (8, 512, 28, 512, 8),
        "vgg_512x14_b8": (8, 512, 14, 512, 16),
    }
    for tag, (n, ic, ih, oc, iscale) in vgg.items():
        if args.case and args.case != tag:
            continue
        src = rng.integers(0, 256, (n, ih, ih, ic), dtype=np.uint8)
        wei = rng.integers(-127, 128, (oc, ic, 3, 3)).astype(np.int8)
        bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
        cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 3, 3), bia.dtype,
                              (1, 1), (1, 1), (n, ih, ih, oc), "u8",
                              conv0_relu=True, conv0_scales=(0.004,))
        pc = PoolConfig.make("max", (ih, ih), (2, 2), (2, 2), (0, 0))
        want = pool_ref(conv_ref(cfg, src, wei, bia), pc)
        if args.packed:
            # packed-domain formulation (VERDICT r3 #3a): byte-shift
            # single-dot conv kernel with the 2x2/s2 max pool fused into
            # its epilogue (pool2=True) — ONE kernel, no per-op prep
            # pass, and halo_out=0 keeps the M row count identical to
            # the dense ConvPoolOp's (the halved output keeps halo 0)
            from deepfusion_tpu.ops.packed import (PackedConvOp,
                                                   pack_image,
                                                   unpack_image)
            pop = PackedConvOp(cfg, wei, bia, col_off_out=2, halo_out=0,
                               pool2=True)
            x = jax.device_put(pack_image(src, pop.sin))
            aux = op_aux(pop)

            def fn(z, a):
                return pop(z, operands=a)

            out_spec = pop.sout_pooled
            tag = tag + "_packed"
            got = unpack_image(np.asarray(jax.jit(fn)(x, aux)), out_spec)
        else:
            cop = ConvPoolOp(cfg, pc, wei, bia)
            x = jax.device_put(src)
            aux = op_aux(cop)

            def fn(z, a):
                return cop(z, operands=a)

            got = np.asarray(jax.jit(fn)(x, aux))
        expect(got, want, tag)
        if not args.fast:
            macs = n * ih * ih * 9 * ic * oc
            bench_line(bump_step(fn), x, macs, n, tag,
                       args.iters * iscale, results, aux=aux)

    # ---- ResNet stem: 50x3x224x224, conv7x7/s2 p3 + relu -> maxpool2x2/s2
    # (test_conv_relu_pooling.cc:332-333). Since dafe056, strided convs
    # are pool2-fusable via the s2d lowering: the default path is the
    # single-kernel ConvPoolOp (the conv output never exists in HBM);
    # --composed measures the old ConvOp + pool composition for the
    # decomposition row.
    if args.case in (None, "resnet_stem"):
        n, ic, ih, oc = 50, 3, 224, 64
        oh = conv_output_size(ih, 7, 2, 3)  # 112
        src = rng.integers(0, 256, (n, ih, ih, ic), dtype=np.uint8)
        wei = rng.integers(-127, 128, (oc, ic, 7, 7)).astype(np.int8)
        bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
        cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 7, 7), bia.dtype,
                              (2, 2), (3, 3), (n, oh, oh, oc), "u8",
                              conv0_relu=True, conv0_scales=(0.002,))
        pc = PoolConfig.make("max", (oh, oh), (2, 2), (2, 2), (0, 0))
        if getattr(args, "composed", False):
            op = ConvOp(cfg, wei, bia)
            aux = op_aux(op)

            def stem(s, a):
                return pool(op(s, operands=a), "max", (2, 2), (2, 2),
                            (0, 0))

            tag = "resnet_stem_composed"
        else:
            assert pool2_fusable(cfg, pc)
            cop = ConvPoolOp(cfg, pc, wei, bia)
            aux = op_aux(cop)

            def stem(s, a):
                return cop(s, operands=a)

            tag = "resnet_stem"
        x = jax.device_put(src)
        got = np.asarray(jax.jit(stem)(x, aux))
        expect(got, pool_ref(conv_ref(cfg, src, wei, bia), pc),
               f"{tag} 7x7/s2+pool")
        if not args.fast:
            macs = n * oh * oh * 49 * ic * oc
            bench_line(bump_step(stem), x, macs, n, tag,
                       args.iters, results, aux=aux)

    # ---- ResNet head: 50x2048x7x7 conv1x1 + relu -> global avg-pool 7x7
    # (test_conv_relu_pooling.cc:334-335; avg excludes padding, p=0 so
    # inc==exc).
    if args.case in (None, "resnet_head"):
        n, ic, ih, oc = 50, 2048, 7, 2048
        src = rng.integers(0, 256, (n, ih, ih, ic), dtype=np.uint8)
        wei = rng.integers(-127, 128, (oc, ic, 1, 1)).astype(np.int8)
        bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
        cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 1, 1), bia.dtype,
                              (1, 1), (0, 0), (n, ih, ih, oc), "u8",
                              conv0_relu=True, conv0_scales=(0.002,))
        pc = PoolConfig.make("avg_exc", (ih, ih), (7, 7), (7, 7), (0, 0))
        op = ConvOp(cfg, wei, bia)
        aux = op_aux(op)

        def head(s, a):
            return pool(op(s, operands=a), "avg_exc", (7, 7), (7, 7),
                        (0, 0))

        x = jax.device_put(src)
        got = np.asarray(jax.jit(head)(x, aux))
        expect(got, pool_ref(conv_ref(cfg, src, wei, bia), pc),
               "resnet_head 1x1+avgpool7")
        if not args.fast:
            macs = n * ih * ih * ic * oc
            bench_line(bump_step(head), x, macs, n, "resnet_head",
                       args.iters * 4, results, aux=aux)

    if results:
        suffix = "_packed" if args.packed else \
            ("_composed" if args.composed else "")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            f"REFSCALE_r05{suffix}.json")
        with open(path, "a") as f:
            for line in results:
                f.write(json.dumps(line) + "\n")
        print(f"wrote {path}")
    print("ALL OK")


if __name__ == "__main__":
    main()
