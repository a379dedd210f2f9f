"""Round-5 megakernel ladder: the two untried levers from VERDICT r4 #1.

(a) ROLL-FREE deep-halo geometry: sin.halo = halo_out + ph_a + ph_b makes
    every layer-a input window in-bounds (off_top == off_bot == 0, proven
    by tests/test_mega.py::test_pair_deep_halo_roll_free), so the T=64
    cliff can be attributed: boundary roll+select (gone here) vs nt=2
    pipeline depth (still present).
(b) GRID ORDER: grid_order="tb" iterates batch fastest, so the output
    stream sees n*nt uniformly-spaced steps instead of nt-deep bursts
    per input image — the pipeline-depth lever.
(c) EPILOGUE INTERLEAVE: msplit=k chunks layer b's dot+requant so chunk
    i+1's MXU dot is independent of chunk i's VPU epilogue (the
    "re-exposed VPU epilogue" ~2pp term).

Chain-style control: roll-free pairs map sin(halo 3) -> sout(halo 1), so
they cannot feed their output back as the next input; those variants use
a BUMP chain (out[0,0,0]&1 folded into x via an in-place one-element
update, the strided-bench trick) and `bump32` measures the production
pair through the same chain style to calibrate any bias vs `carry32`.

Run IN BACKGROUND with NO timeout wrapper (tunnel-wedge rule):
    python scratch/pair_probe.py [--variants carry32,rf64,...] [--exact]

Results land in docs/PERF.md's round-5 section and artifacts/MEGA_r05.json.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import peak_ops, timeit_chain
from deepfusion_tpu.config import ConvConfig
from deepfusion_tpu.ops.mega import PackedConvPairOp, _pair_offs
from deepfusion_tpu.ops.packed import PackedConvOp, PackedSpec, pack_image

N, HW, C = 8, 126, 256
BIG = 64 * 2 ** 20          # budget override to unlock T=64 wide patches


def mk_weights(rng):
    w = rng.integers(-127, 128, (C, C, 3, 3)).astype(np.int8)
    b = rng.integers(-100, 101, (C,)).astype(np.int32)
    w1 = rng.integers(-127, 128, (C, C, 1, 1)).astype(np.int8)
    b1 = rng.integers(-100, 101, (C,)).astype(np.int32)
    return w, b, w1, b1


def mk_cfg():
    return ConvConfig.make(
        (N, HW, HW, C), (C, C, 3, 3), np.int32, (1, 1), (1, 1),
        (N, HW, HW, C), "u8", conv0_scales=(0.001,),
        wei1x1_shape=(C, C, 1, 1), bia1x1_dt=np.int32,
        conv1_relu=True, conv1_scales=(0.05,))


def deep_sin():
    # halo 3 = halo_out(1) + ph_a(1) + ph_b(1): every window in-bounds
    return PackedSpec.make(HW, HW, C, halo=3, col_off=1)


def build(variant, cfg_a, cfg_b, wts_a, wts_b):
    """-> (pair, chain_style)"""
    if variant.startswith("carry") or variant.startswith("eq"):
        T = int(variant.replace("carry", "").replace("eq", "") or 32)
        return PackedConvPairOp(cfg_a, wts_a, cfg_b, wts_b, row_tile=T,
                                vmem_budget=BIG), "carry"
    if variant == "bump32":
        return PackedConvPairOp(cfg_a, wts_a, cfg_b, wts_b,
                                row_tile=32), "bump"
    kw = dict(sin=deep_sin(), halo_out=1, col_off_out=1, vmem_budget=BIG)
    if variant.startswith("tb"):
        kw["grid_order"] = "tb"
        variant = variant[2:]
    if variant.endswith("ru"):
        kw["reuse_mid"] = True
        variant = variant[:-2]
    if "ms" in variant:
        variant, _, k = variant.partition("ms")
        kw["msplit"] = int(k or 2)
    T = int(variant.replace("rf", "").rstrip("ms") or 32)
    pair = PackedConvPairOp(cfg_a, wts_a, cfg_b, wts_b, row_tile=T, **kw)
    off_top, off_bot, *_ = _pair_offs(pair.cfg_a, pair.cfg_b, pair.sin,
                                      pair.smid, pair.sout,
                                      pair.cfg_b.row_tile)
    assert off_top == 0 and off_bot == 0, "rf variant is not roll-free!"
    return pair, "bump"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="carry32,bump32,rf32,rf64,tbrf64,rf64ms2,"
                            "tbrf64ms2,rf32ms2")
    ap.add_argument("--exact", action="store_true",
                    help="on-chip exactness of the roll-free pair vs the "
                         "sequential erosion composition (once)")
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (N, HW, HW, C), dtype=np.uint8)
    wts_a, wts_b = mk_weights(rng), mk_weights(rng)
    cfg_a, cfg_b = mk_cfg(), mk_cfg()
    macs1 = N * HW * HW * (9 * C * C + C * C)
    peak, kind = peak_ops()

    if args.exact:
        pair, _ = build("rf32", cfg_a, cfg_b, wts_a, wts_b)
        op_a = PackedConvOp(cfg_a, *wts_a, sin=pair.sin,
                            halo_out=pair.smid.halo,
                            col_off_out=pair.smid.col_off)
        op_b = PackedConvOp(cfg_b, *wts_b, sin=pair.smid,
                            halo_out=pair.sout.halo,
                            col_off_out=pair.sout.col_off)
        x = jax.device_put(pack_image(src, pair.sin))

        @jax.jit
        def diffcount(x):
            return (pair(x) != op_b(op_a(x))).sum()

        nd = int(diffcount(x))
        print(f"# on-chip exactness (rf): {nd} mismatched bytes",
              file=sys.stderr)
        assert nd == 0

    results = {}
    for variant in args.variants.split(","):
        variant = variant.strip()
        pair, style = build(variant, cfg_a, cfg_b, wts_a, wts_b)
        x = jax.device_put(pack_image(src, pair.sin))
        aux = tuple(jax.device_put(np.asarray(a)) for a in pair._operands)
        if style == "carry":
            def step(c, a):
                return pair(c, operands=a)
        else:
            def step(c, a):
                out = pair(c, operands=a)
                b = out[0, 0, 0].astype(jnp.int8) & 1
                return c.at[0, 0, 0].add(b)
        sec = timeit_chain(step, x, args.iters, reps=5, spread_s=5,
                           aux=aux)
        pct = 100.0 * (2 * 2 * macs1 / sec) / peak
        results[variant] = round(pct, 2)
        print(f"# {variant:>10s} T={pair.cfg_b.row_tile:3d} "
              f"grid={pair.grid_order} ms={pair.msplit} "
              f"{sec*1e3:.3f} ms/step (2 convs) -> {pct:.2f}% on {kind}",
              file=sys.stderr)
    print(results)


if __name__ == "__main__":
    main()
