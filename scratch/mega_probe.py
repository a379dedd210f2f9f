"""Megakernel probe: PackedConvPairOp vs single-op chain at the flagship
bench shape (8x126x126x256 -> [3x3:256 -> 1x1:256] x2).

Per VERDICT r3 #2: the stream-tax decomposition says the single-op
kernel body is at ~95% of the compute floor and the residual ~13pp is
the cost of consuming the HBM streams; the pair op halves bytes/MAC.
Measured (artifacts/MEGA_r04.json): 81.3-83.0% at T=32 single-dot vs
79.7% single-op — the naive >=85% estimate was optimistic because in
the single op much of the tap/epilogue VPU time hides under stream
stalls and halving the streams re-exposes it (docs/PERF.md).
Run IN BACKGROUND with NO timeout wrapper (tunnel-wedge rule):
python scratch/mega_probe.py [--tiles 32] [--split] [--skip-exact]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import peak_ops, timeit_chain
from deepfusion_tpu.config import ConvConfig
from deepfusion_tpu.ops.mega import PackedConvPairOp
from deepfusion_tpu.ops.packed import PackedConvOp, pack_image


def main():
    n, hw, c = 8, 126, 256
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (n, hw, hw, c), dtype=np.uint8)

    def mk_weights():
        w = rng.integers(-127, 128, (c, c, 3, 3)).astype(np.int8)
        b = rng.integers(-100, 101, (c,)).astype(np.int32)
        w1 = rng.integers(-127, 128, (c, c, 1, 1)).astype(np.int8)
        b1 = rng.integers(-100, 101, (c,)).astype(np.int32)
        return w, b, w1, b1

    def mk_cfg():
        return ConvConfig.make(
            (n, hw, hw, c), (c, c, 3, 3), np.int32, (1, 1), (1, 1),
            (n, hw, hw, c), "u8", conv0_scales=(0.001,),
            wei1x1_shape=(c, c, 1, 1), bia1x1_dt=np.int32,
            conv1_relu=True, conv1_scales=(0.05,))

    wts_a, wts_b = mk_weights(), mk_weights()
    cfg_a, cfg_b = mk_cfg(), mk_cfg()
    macs1 = n * hw * hw * (9 * c * c + c * c)       # per single fused conv
    peak, kind = peak_ops()

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="64,32,16")
    ap.add_argument("--skip-single", action="store_true")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--split", action="store_true",
                    help="kh-split dots (smaller live tap buffers)")
    args = ap.parse_args()

    first = True
    results = {}
    for T in [int(t) for t in args.tiles.split(",")]:
        pair = PackedConvPairOp(cfg_a, wts_a, cfg_b, wts_b, row_tile=T,
                                split_kh=args.split)
        x = jax.device_put(pack_image(src, pair.sin))
        aux = tuple(jax.device_put(np.asarray(a))
                    for a in pair._operands)
        if first and not args.skip_exact:
            op_a = PackedConvOp(cfg_a, *wts_a, sin=pair.sin,
                                halo_out=pair.smid.halo,
                                col_off_out=pair.smid.col_off)
            op_b = PackedConvOp(cfg_b, *wts_b, sin=pair.smid,
                                halo_out=pair.sout.halo,
                                col_off_out=pair.sout.col_off)
            import jax.numpy as jnp

            @jax.jit
            def diffcount(x):
                return (pair(x) != op_b(op_a(x))).sum()

            nd = int(diffcount(x))
            print(f"# on-chip exactness: {nd} mismatched bytes",
                  file=sys.stderr)
            assert nd == 0, "megakernel mismatch on chip"
            first = False
        sec2 = timeit_chain(lambda c, a: pair(c, operands=a), x, 48,
                            reps=5, spread_s=5, aux=aux)
        pct2 = 100.0 * (2 * 2 * macs1 / sec2) / peak
        results[T] = pct2
        print(f"# pair T={T:3d} {sec2*1e3:.3f} ms/step (2 convs) -> "
              f"{pct2:.2f}% of roofline on {kind}", file=sys.stderr)

    if not args.skip_single:
        solo = PackedConvOp(mk_cfg(), *wts_a)
        xs = jax.device_put(pack_image(src, solo.sin))
        aux1 = tuple(jax.device_put(np.asarray(a)) for a in solo._operands)
        sec1 = timeit_chain(lambda c, a: solo(c, operands=a), xs, 96,
                            reps=5, spread_s=5, aux=aux1)
        pct1 = 100.0 * (2 * macs1 / sec1) / peak
        print(f"# single {sec1*1e3:.3f} ms/conv -> {pct1:.2f}%",
              file=sys.stderr)
    print({f"T{t}": round(p, 2) for t, p in results.items()})


if __name__ == "__main__":
    main()
