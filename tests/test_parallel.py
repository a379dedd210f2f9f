"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Checks the scale-out layer produces bit-identical results to single-device
execution: DP (batch), TP (oc + psum before requant), SP (H halo exchange
via ppermute). The reference has no distributed layer; these validate the
TPU-native extension (SURVEY.md §7 step 6).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from deepfusion_tpu.config import ConvConfig
from deepfusion_tpu.ops.conv import ConvOp
from deepfusion_tpu.ops.ref import conv_ref
from deepfusion_tpu.parallel import (dp_shard, factorize_mesh, make_mesh,
                                     sp_conv, tp_fused_conv)

from helpers import compare, fill_data


def need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def make_fused_cfg(rng, mb=4, ic=16, hw=12, oc=32, oc1=16, ph=1):
    src = fill_data((mb, hw, hw, ic), "u8", rng)
    wei = fill_data((oc, ic, 3, 3), "s8", rng)
    bia = fill_data((oc,), "s32", rng)
    wei1 = fill_data((oc1, oc, 1, 1), "s8", rng)
    bia1 = fill_data((oc1,), "s32", rng)
    oh = hw + 2 * ph - 2
    cfg = ConvConfig.make(
        (mb, hw, hw, ic), (oc, ic, 3, 3), bia.dtype, (1, 1), (ph, ph),
        (mb, oh, oh, oc1), "u8", conv0_scales=(0.02,),
        wei1x1_shape=(oc1, oc, 1, 1), bia1x1_dt=bia1.dtype,
        conv1_relu=True, conv1_scales=(0.4,))
    return cfg, src, wei, bia, wei1, bia1


def test_dp_shard_bit_exact(rng):
    need_devices(2)
    cfg, src, wei, bia, wei1, bia1 = make_fused_cfg(rng)
    mesh = make_mesh(dp=2)
    op = ConvOp(cfg, wei, bia, wei1, bia1)
    out = dp_shard(op, mesh)(src)
    compare(np.asarray(out), conv_ref(cfg, src, wei, bia, wei1, bia1), "dp")


def test_tp_fused_bit_exact(rng):
    need_devices(2)
    cfg, src, wei, bia, wei1, bia1 = make_fused_cfg(rng)
    mesh = make_mesh(tp=2)
    fn = tp_fused_conv(cfg, wei, bia, wei1, bia1, mesh)
    out = fn(src)
    compare(np.asarray(out), conv_ref(cfg, src, wei, bia, wei1, bia1), "tp")


def test_tp_4way(rng):
    need_devices(4)
    cfg, src, wei, bia, wei1, bia1 = make_fused_cfg(rng, oc=64)
    mesh = make_mesh(tp=4)
    out = tp_fused_conv(cfg, wei, bia, wei1, bia1, mesh)(src)
    compare(np.asarray(out), conv_ref(cfg, src, wei, bia, wei1, bia1),
            "tp4")


def test_sp_halo_bit_exact(rng):
    need_devices(2)
    # SAME conv so rows shard evenly; halo rows must replace zero-padding
    # at the interior boundary exactly
    cfg, src, wei, bia, wei1, bia1 = make_fused_cfg(rng, hw=12, ph=1)
    mesh = make_mesh(sp=2)
    op = ConvOp(cfg, wei, bia, wei1, bia1)
    out = sp_conv(op, mesh)(src)
    compare(np.asarray(out), conv_ref(cfg, src, wei, bia, wei1, bia1), "sp")


def test_sp_4way(rng):
    need_devices(4)
    cfg, src, wei, bia, wei1, bia1 = make_fused_cfg(rng, hw=16, ph=1)
    mesh = make_mesh(sp=4)
    op = ConvOp(cfg, wei, bia, wei1, bia1)
    out = sp_conv(op, mesh)(src)
    compare(np.asarray(out), conv_ref(cfg, src, wei, bia, wei1, bia1), "sp4")


def test_dp_sp_combined(rng):
    need_devices(4)
    cfg, src, wei, bia, wei1, bia1 = make_fused_cfg(rng, mb=4, hw=12)
    mesh = make_mesh(dp=2, sp=2)
    op = ConvOp(cfg, wei, bia, wei1, bia1)
    # compose: dp over batch, sp inside — via sp_conv on a mesh with both
    # axes: batch spec uses dp, rows use sp
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from deepfusion_tpu.parallel.shard import _conv_call

    oh_l = cfg.oh // 2
    local_cfg = dataclasses.replace(cfg, bs=cfg.bs // 2)

    def local_fn(s, *ops_):
        idx = jax.lax.axis_index("sp")
        halo = cfg.ph
        top = jax.lax.ppermute(s[:, -halo:], "sp", [(0, 1), (1, 0)])
        bot = jax.lax.ppermute(s[:, :halo], "sp", [(0, 1), (1, 0)])
        top = jnp.where(idx == 0, jnp.zeros_like(top), top)
        bot = jnp.where(idx == 1, jnp.zeros_like(bot), bot)
        s = jnp.concatenate([top, s, bot], axis=1)
        from deepfusion_tpu.config import replace_geometry
        pcfg = replace_geometry(local_cfg, ph=0, ih=s.shape[1], oh=oh_l)
        return _conv_call(pcfg, s, *ops_)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("dp", "sp", None, None),) + (P(None),) * len(op._operands),
        out_specs=P("dp", "sp", None, None), check_vma=False)
    out = jax.jit(lambda s: fn(s, *op._operands))(jnp.asarray(src))
    compare(np.asarray(out), conv_ref(cfg, src, wei, bia, wei1, bia1),
            "dp x sp")


def test_factorize_mesh():
    for n in (1, 2, 4, 8, 6, 12):
        dp, sp, tp = factorize_mesh(n)
        assert dp * sp * tp == n
