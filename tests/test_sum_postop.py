"""Conv eltwise-sum post-op differential tests (MKL-DNN sum semantics —
the ResNet case documented in test/test_conv_relu_pooling.cc:336-338:
conv1x1 + eltwise-sum + relu + pool).
"""
import numpy as np
import pytest

from deepfusion_tpu.config import ConvConfig
from deepfusion_tpu.ops.conv import conv
from deepfusion_tpu.ops.ref import conv_ref

from helpers import compare, fill_data


def make(rng, fused=False, sum_dt="u8", sum_scale=1.0, dst_dt="u8"):
    mb, ic, hw, oc, oc1 = 2, 16, 9, 32, 16
    src = fill_data((mb, hw, hw, ic), "u8", rng)
    wei = fill_data((oc, ic, 3, 3), "s8", rng)
    bia = fill_data((oc,), "s32", rng)
    out_oc = oc1 if fused else oc
    wei1 = fill_data((oc1, oc, 1, 1), "s8", rng) if fused else None
    sum_src = fill_data((mb, hw, hw, out_oc), sum_dt, rng)
    cfg = ConvConfig.make(
        (mb, hw, hw, ic), (oc, ic, 3, 3), bia.dtype, (1, 1), (1, 1),
        (mb, hw, hw, out_oc), dst_dt, conv0_scales=(0.05,),
        wei1x1_shape=None if not fused else (oc1, oc, 1, 1),
        conv1_relu=True, conv1_scales=(0.3,),
        sum_dt=sum_dt, sum_scale=sum_scale)
    return cfg, src, wei, bia, wei1, sum_src


@pytest.mark.parametrize("sum_dt", ["u8", "s8", "s32", "f32"])
def test_conv_sum_postop(sum_dt, rng):
    cfg, src, wei, bia, wei1, sum_src = make(rng, sum_dt=sum_dt)
    out = conv(src, wei, bia, (1, 1), (1, 1), dst_dtype="u8",
               conv0_scales=(0.05,), sum_src=sum_src)
    compare(out, conv_ref(cfg, src, wei, bia, sum_src=sum_src),
            f"conv+sum {sum_dt}")


def test_fused_conv_sum_postop(rng):
    cfg, src, wei, bia, wei1, sum_src = make(rng, fused=True)
    out = conv(src, wei, bia, (1, 1), (1, 1), dst_dtype="u8",
               conv0_scales=(0.05,), wei1x1=wei1, conv1_relu=True,
               conv1_scales=(0.3,), sum_src=sum_src)
    compare(out, conv_ref(cfg, src, wei, bia, wei1, None, sum_src=sum_src),
            "fused conv+sum")


def test_conv_sum_scale(rng):
    cfg, src, wei, bia, _, sum_src = make(rng, sum_dt="s32", sum_scale=0.5,
                                          dst_dt="s8")
    out = conv(src, wei, bia, (1, 1), (1, 1), dst_dtype="s8",
               conv0_scales=(0.05,), sum_src=sum_src, sum_scale=0.5)
    compare(out, conv_ref(cfg, src, wei, bia, sum_src=sum_src),
            "conv+sum scaled")


def test_resnet_block_composition(rng):
    """conv1x1 + sum + relu + pool — the full documented ResNet case."""
    from deepfusion_tpu.config import PoolConfig
    from deepfusion_tpu.ops.pool import pool
    from deepfusion_tpu.ops.ref import pool_ref

    mb, c, hw = 1, 32, 7
    src = fill_data((mb, hw, hw, c), "u8", rng)
    wei = fill_data((c, c, 1, 1), "s8", rng)
    residual = fill_data((mb, hw, hw, c), "u8", rng)
    cfg = ConvConfig.make((mb, hw, hw, c), (c, c, 1, 1), None, (1, 1),
                          (0, 0), (mb, hw, hw, c), "u8",
                          conv0_relu=True, conv0_scales=(0.02,),
                          sum_dt="u8")
    conv_out = conv(src, wei, None, (1, 1), (0, 0), dst_dtype="u8",
                    conv0_relu=True, conv0_scales=(0.02,), sum_src=residual)
    out = pool(conv_out, "max", (7, 7), (7, 7), (0, 0))
    ref_conv = conv_ref(cfg, src, wei, sum_src=residual)
    pc = PoolConfig.make("max", (hw, hw), (7, 7), (7, 7), (0, 0))
    compare(out, pool_ref(ref_conv, pc), "resnet block")
