"""deepfusion_tpu benchmark harness.

Reference-parity protocol (``benchmark/bench_concat.cc:86-121``): warm-up
iterations then timed iterations, averaged. Timing uses
``jax.block_until_ready`` around the whole timed batch of submits.

Headline metric (BASELINE.md target): the fused INT8
conv3x3+relu+conv1x1+relu chain as % of the per-chip MXU INT8 roofline,
counting LOGICAL MACs (2 * oh*ow*(kh*kw*ic*oc + oc*oc1x1) per image) — no
credit for padding.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 90.0 (the >=90%-of-roofline target; the reference
itself publishes no numbers, BASELINE.md).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# per-chip INT8 peak ops/s by device kind (v5e: 394.7 TOPS int8)
INT8_PEAK = {
    "TPU v5 lite": 394.7e12,
    "TPU v5e": 394.7e12,
    "TPU v4": 275e12,          # v4 has no int8 MXU mode; bf16 peak x2 proxy
    "TPU v6 lite": 918.9e12,
    "cpu": 1e12,               # nominal, for smoke runs off-TPU
}


def peak_ops():
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "cpu")
    for k, v in INT8_PEAK.items():
        if kind.startswith(k):
            return v, kind
    return INT8_PEAK["cpu"], kind


def timeit(fn, warmup, iters):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_fused(args):
    """Flagship: fused conv3x3+relu+conv1x1+relu, MXU-filling channels."""
    from deepfusion_tpu.config import ConvConfig
    from deepfusion_tpu.ops.conv import ConvOp

    n, hw, ic, oc, oc1 = args.batch, args.hw, args.ic, args.oc, args.oc1x1
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (n, hw, hw, ic), dtype=np.uint8)
    wei = rng.integers(-127, 128, (oc, ic, 3, 3)).astype(np.int8)
    bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
    wei1 = rng.integers(-127, 128, (oc1, oc, 1, 1)).astype(np.int8)
    bia1 = rng.integers(-100, 101, (oc1,)).astype(np.int32)
    cfg = ConvConfig.make(
        (n, hw, hw, ic), (oc, ic, 3, 3), bia.dtype, (1, 1), (1, 1),
        (n, hw, hw, oc1), "u8", conv0_scales=(0.001,),
        wei1x1_shape=(oc1, oc, 1, 1), bia1x1_dt=bia1.dtype,
        conv1_relu=True, conv1_scales=(0.05,))
    op = ConvOp(cfg, wei, bia, wei1, bia1)
    import jax

    x = jax.device_put(src)
    sec = timeit(lambda: op(x), args.warmup, args.iters)
    macs = n * hw * hw * (9 * ic * oc + oc * oc1)
    ops = 2 * macs / sec
    peak, kind = peak_ops()
    pct = 100.0 * ops / peak
    imgs = n / sec
    print(f"# fused {n}x{hw}x{hw}x{ic}->3x3:{oc}->1x1:{oc1} "
          f"{sec*1e3:.3f} ms/iter  {imgs:.1f} imgs/s  "
          f"{ops/1e12:.1f} TOPS on {kind}", file=sys.stderr)
    if args.compare_xla:
        # same numerics through plain XLA ops (no Pallas) — the "what the
        # compiler does unaided" baseline
        import functools
        from deepfusion_tpu.ops.conv import _conv_xla
        from deepfusion_tpu.ops import layout as L
        import jax.numpy as jnp

        @jax.jit
        def xla_fn(s):
            srcp = L.prep_src(cfg, s, xp=jnp)
            return _conv_xla(cfg, srcp, *op._operands)

        sec_x = timeit(lambda: xla_fn(x), args.warmup, args.iters)
        print(f"# xla-baseline {sec_x*1e3:.3f} ms/iter "
              f"(pallas speedup {sec_x/sec:.2f}x)", file=sys.stderr)
    return {"metric": "fused_conv3x3_1x1_int8_roofline_pct",
            "value": round(pct, 2), "unit": "%",
            "vs_baseline": round(pct / 90.0, 4)}


def bench_conv(args):
    from deepfusion_tpu.config import ConvConfig
    from deepfusion_tpu.ops.conv import ConvOp

    n, hw, ic, oc = args.batch, args.hw, args.ic, args.oc
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (n, hw, hw, ic), dtype=np.uint8)
    wei = rng.integers(-127, 128, (oc, ic, 3, 3)).astype(np.int8)
    bia = rng.integers(-100, 101, (oc,)).astype(np.int32)
    cfg = ConvConfig.make((n, hw, hw, ic), (oc, ic, 3, 3), bia.dtype,
                          (1, 1), (1, 1), (n, hw, hw, oc), "u8",
                          conv0_scales=(0.001,))
    op = ConvOp(cfg, wei, bia)
    import jax

    x = jax.device_put(src)
    sec = timeit(lambda: op(x), args.warmup, args.iters)
    ops = 2 * n * hw * hw * 9 * ic * oc / sec
    peak, kind = peak_ops()
    pct = 100.0 * ops / peak
    print(f"# conv3x3 {sec*1e3:.3f} ms/iter {ops/1e12:.1f} TOPS on {kind}",
          file=sys.stderr)
    return {"metric": "conv3x3_int8_roofline_pct", "value": round(pct, 2),
            "unit": "%", "vs_baseline": round(pct / 90.0, 4)}


def bench_concat(args):
    """Reference default workload (benchmark/bench_concat.cc:226-242):
    4 inputs of {128,256}ch @244x244 s8, relu on. Bandwidth-bound; metric =
    % of HBM peak (v5e: 819 GB/s)."""
    from deepfusion_tpu.ops.concat import concat
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    srcs = [jnp.asarray(rng.integers(-10, 11, (4, 244, 244, c)).astype(np.int8))
            for c in (128, 256, 128, 256)]
    fn = lambda: concat(srcs, post_relu=True)
    sec = timeit(fn, args.warmup, args.iters)
    nbytes = 2 * sum(int(np.prod(s.shape)) for s in srcs)  # read + write
    gbps = nbytes / sec / 1e9
    peak_bw = 819.0  # v5e HBM GB/s
    pct = 100.0 * gbps / peak_bw
    print(f"# concat {sec*1e3:.3f} ms/iter {gbps:.0f} GB/s", file=sys.stderr)
    return {"metric": "concat_relu_hbm_pct", "value": round(pct, 2),
            "unit": "%", "vs_baseline": round(pct / 90.0, 4)}


def bench_model(args):
    from deepfusion_tpu.models import FusionNet, FusionNetConfig
    import jax

    net = FusionNet(FusionNetConfig(batch=args.batch, hw=56, in_ch=32,
                                    width=128, num_classes=128))
    x = jax.device_put(net.example_input())
    fwd = jax.jit(net.__call__)
    sec = timeit(lambda: fwd(x), args.warmup, args.iters)
    imgs = args.batch / sec
    print(f"# fusionnet {sec*1e3:.3f} ms/iter {imgs:.0f} imgs/s",
          file=sys.stderr)
    return {"metric": "fusionnet_imgs_per_sec", "value": round(imgs, 1),
            "unit": "imgs/s", "vs_baseline": 1.0}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--op", default="fused",
                   choices=["fused", "conv", "concat", "model"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, default=56)
    p.add_argument("--ic", type=int, default=256)
    p.add_argument("--oc", type=int, default=256)
    p.add_argument("--oc1x1", type=int, default=256)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--compare-xla", action="store_true",
                   help="also time a plain-XLA composition of the same op")
    args = p.parse_args()
    _enable_compile_cache()
    result = {"fused": bench_fused, "conv": bench_conv,
              "concat": bench_concat, "model": bench_model}[args.op](args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
