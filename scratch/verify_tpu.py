"""Real-TPU exact-match sweep of every Pallas code path vs the numpy
oracle (ops/ref.py). Run: timeout 580 python scratch/verify_tpu.py
(one jax client at a time on the tunneled chip)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import numpy as np


def fill(shape, dt, rng):
    if dt == "u8":
        return rng.integers(0, 17, shape, dtype=np.uint8)
    if dt == "s8":
        return rng.integers(-10, 11, shape).astype(np.int8)
    if dt == "s32":
        return rng.integers(-10, 11, shape).astype(np.int32)
    return (1 + 0.01 * np.sin(np.arange(np.prod(shape)) % 37)).reshape(
        shape).astype(np.float32)


def expect(out, ref, tag):
    out = np.asarray(out)
    if out.dtype == np.float32:
        ok = np.allclose(out, ref, rtol=1e-4, atol=1e-6)
    else:
        ok = np.array_equal(out, ref)
    if not ok:
        bad = np.argwhere(out != ref) if out.dtype != np.float32 else None
        raise SystemExit(f"FAIL {tag}: mismatch "
                         f"{bad[:4] if bad is not None else ''}")
    print("OK ", tag)


def main():
    import bench
    bench._enable_compile_cache()
    from deepfusion_tpu.config import ConvConfig, PoolConfig
    from deepfusion_tpu.ops.conv import ConvOp
    from deepfusion_tpu.ops.ref import conv_ref, pool_ref
    from deepfusion_tpu.utils.mathutil import conv_output_size

    rng = np.random.default_rng(7)

    # 1. plain + fused conv (the flagship)
    n, ic, ih, oc, oc1 = 2, 32, 12, 48, 32
    src = fill((n, ih, ih, ic), "u8", rng)
    wei = fill((oc, ic, 3, 3), "s8", rng)
    bia = fill((oc,), "s32", rng)
    oh = conv_output_size(ih, 3, 1, 1)
    cfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 3, 3), bia.dtype,
                          (1, 1), (1, 1), (n, oh, oh, oc), "u8",
                          conv0_relu=True, conv0_scales=(0.05,))
    expect(ConvOp(cfg, wei, bia)(src), conv_ref(cfg, src, wei, bia),
           "conv3x3+relu u8")

    wei1 = fill((oc1, oc, 1, 1), "s8", rng)
    bia1 = fill((oc1,), "s32", rng)
    fcfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 3, 3), bia.dtype,
                           (1, 1), (1, 1), (n, oh, oh, oc1), "u8",
                           conv0_scales=(0.05,),
                           wei1x1_shape=(oc1, oc, 1, 1), bia1x1_dt=bia1.dtype,
                           conv1_relu=True, conv1_scales=(0.2,))
    expect(ConvOp(fcfg, wei, bia, wei1, bia1)(src),
           conv_ref(fcfg, src, wei, bia, wei1, bia1), "fused 3x3+1x1")

    # 2. single-kernel conv+pool (ops/convpool.py)
    from deepfusion_tpu.ops.convpool import ConvPoolOp, pool2_fusable
    for kind, dst in (("max", "u8"), ("max", "s32"), ("avg_inc", "s8"),
                      ("avg_inc", "f32")):
        pc = PoolConfig.make(kind, (oh, oh), (2, 2), (2, 2), (0, 0))
        ccfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 3, 3), bia.dtype,
                               (1, 1), (1, 1), (n, oh, oh, oc), dst,
                               conv0_relu=True, conv0_scales=(0.05,))
        assert pool2_fusable(ccfg, pc)
        expect(ConvPoolOp(ccfg, pc, wei, bia)(src),
               pool_ref(conv_ref(ccfg, src, wei, bia), pc),
               f"convpool {kind}->{dst}")

    # 3. TP emit_acc1 kernel variant (single-shard degenerate: acc1 + corr
    #    requantized outside must equal the fused op)
    import jax.numpy as jnp
    from deepfusion_tpu.ops.conv import conv_fused_acc1
    from deepfusion_tpu.ops.requant import requant
    from deepfusion_tpu.ops import layout
    op = ConvOp(fcfg, wei, bia, wei1, bia1)
    acc1 = conv_fused_acc1(fcfg, jnp.asarray(src), *op._operands[:6])
    bias1w = layout.widen_bias(bia1, fcfg.bia1x1_dt, fcfg.oc1x1p)
    scale1w = layout.widen_scales(fcfg.conv1_scales, fcfg.oc1x1, fcfg.oc1x1p)
    res = requant(jnp.asarray(acc1), jnp.asarray(bias1w),
                  jnp.asarray(scale1w), fcfg.conv1_relu, fcfg.conv1_round,
                  fcfg.dst_dt)[..., :fcfg.oc1x1]
    expect(res, conv_ref(fcfg, src, wei, bia, wei1, bia1), "tp emit_acc1")

    # 3b. packed-domain sum post-op + strided (s2d) packed conv
    import dataclasses

    from deepfusion_tpu.ops.packed import (PackedConvOp, PackedSpec,
                                           pack_image, unpack_image)
    from deepfusion_tpu.types import dtype as dt_enum
    scfg = dataclasses.replace(fcfg, with_sum=True, sum_dt=dt_enum.u8,
                               sum_scale=0.7)
    sum_u8 = rng.integers(0, 256, (n, oh, oh, oc1), dtype=np.uint8)
    dense_sum = ConvOp(scfg, wei, bia, wei1, bia1)(src, sum_src=sum_u8)
    sin = PackedSpec.make(ih, ih, ic, halo=3, col_off=1)
    pop = PackedConvOp(scfg, wei, bia, wei1, bia1, sin=sin,
                       col_off_out=1, halo_out=2,
                       sum_spec=PackedSpec.make(oh, oh, oc1, halo=3,
                                                col_off=1, iwp=sin.iwp))
    got = unpack_image(np.asarray(pop(pack_image(src, pop.sin),
                                      sum_arr=pack_image(sum_u8, pop.ssum))),
                       pop.sout)
    expect(got, np.asarray(dense_sum), "packed sum post-op")

    # asymmetric col_offs: tap shifts beyond the flagship's {-1,0,+1} —
    # col_off 3 drives the bitcast-i32 byte shifts at d in {1,2,3};
    # col_off 4 (d up to 4) falls back to the output-side roll path
    dense_f = np.asarray(ConvOp(fcfg, wei, bia, wei1, bia1)(src))
    for coff, tag in ((3, "byte-shift d<=3"), (4, "roll fallback d=4")):
        popc = PackedConvOp(
            fcfg, wei, bia, wei1, bia1,
            sin=PackedSpec.make(ih, ih, ic, halo=3, col_off=coff, iwp=24),
            col_off_out=1, halo_out=2)
        got = unpack_image(np.asarray(popc(pack_image(src, popc.sin))),
                           popc.sout)
        expect(got, dense_f, f"packed conv tap shifts ({tag})")

    st_oh = conv_output_size(ih, 3, 2, 1)
    stcfg = ConvConfig.make((n, ih, ih, ic), (oc, ic, 3, 3), bia.dtype,
                            (2, 2), (1, 1), (n, st_oh, st_oh, oc), "u8",
                            conv0_relu=True, conv0_scales=(0.05,))
    spop = PackedConvOp(stcfg, wei, bia)
    got = unpack_image(np.asarray(spop(spop.pack_input(src))), spop.sout)
    expect(got, np.asarray(ConvOp(stcfg, wei, bia)(src)),
           "packed s2d strided conv")

    # 4. concat + pool + eltwise (bandwidth ops)
    from deepfusion_tpu.ops.concat import concat
    from deepfusion_tpu.ops.pool import eltwise_sum_relu, pool
    from deepfusion_tpu.ops.ref import concat_relu_ref, eltwise_sum_relu_ref
    a = fill((2, 6, 6, 32), "s8", rng)
    b = fill((2, 6, 6, 64), "s8", rng)
    expect(concat([a, b], post_relu=True), concat_relu_ref([a, b], True),
           "concat+relu s8")
    x = fill((2, 8, 8, 32), "s32", rng)
    y = fill((2, 8, 8, 32), "s32", rng)
    expect(eltwise_sum_relu(x, y), eltwise_sum_relu_ref(x, y),
           "eltwise_sum_relu s32")
    pc = PoolConfig.make("avg_exc", (8, 8), (3, 3), (2, 2), (1, 1))
    expect(pool(x, "avg_exc", (3, 3), (2, 2), (1, 1)), pool_ref(x, pc),
           "pool avg_exc s32")

    print("ALL OK")


if __name__ == "__main__":
    main()
