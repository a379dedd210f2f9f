"""Sharded execution wrappers: DP / TP / SP over a jax Mesh.

TPU-native scale-out layer (SURVEY.md §2 parallelism checklist — all ABSENT
in the single-node reference; §7 maps each to its TPU equivalent):

* ``dp_shard``     — batch sharding (pure data parallelism, no collectives).
* ``tp_fused_conv``— conv0 output channels (and their scales/bias) sharded
  across ``tp``; each device computes its slice of the u8 intermediate and a
  *partial* 1x1 s32 accumulator; a ``psum`` over ``tp`` completes the 1x1
  reduction BEFORE the (nonlinear) requantization — int32 adds commute, so
  the result is bit-identical to single-device execution.
* ``sp_conv``      — spatial H sharding with a 1-row halo exchange via
  ``jax.lax.ppermute`` (ICI neighbor exchange), the image analogue of
  ring-attention's neighbor passing. Bit-exact: halo rows replace the
  zero-padding only at interior shard boundaries.

All wrappers use ``shard_map`` so collectives are explicit and XLA can
overlap them with compute.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ConvConfig, replace_geometry
from ..ops import layout
from ..ops.conv import _conv_call
from ..ops.requant import requant
from ..utils.logger import check, check_eq

shard_map = jax.shard_map


# ------------------------------------------------------------------ DP

def dp_shard(conv_op, mesh: Mesh, axis: str = "dp"):
    """Wrap a ConvOp so the batch dim is sharded over `axis`.

    Weights are replicated; no collectives — the TPU analogue of the
    reference's OpenMP split over the batch dim (src/op_conv.cc:39-47).
    """
    cfg = conv_op.cfg
    n_shard = mesh.shape[axis]
    check(cfg.bs % n_shard == 0, f"batch {cfg.bs} not divisible by {axis}")
    local_cfg = _rebatch(cfg, cfg.bs // n_shard)

    def local_fn(src, *operands):
        return _conv_call(local_cfg, src, *operands)

    spec_in = (P(axis, None, None, None),) + tuple(
        P(None) for _ in conv_op._operands)
    fn = shard_map(local_fn, mesh=mesh, in_specs=spec_in,
                   out_specs=P(axis, None, None, None), check_vma=False)

    def run(src):
        return fn(jnp.asarray(src), *conv_op._operands)

    return jax.jit(run)


def _rebatch(cfg: ConvConfig, bs: int) -> ConvConfig:
    import dataclasses
    return dataclasses.replace(cfg, bs=bs)


# ------------------------------------------------------------------ TP

def tp_fused_conv(cfg: ConvConfig, wei, bia, wei1x1, bia1x1,
                  mesh: Mesh, axis: str = "tp"):
    """Tensor-parallel fused conv3x3+1x1: conv0 oc sharded over `axis`.

    Sharding plan (scaling-book style):
      wei   (oc,ic,kh,kw)  -> oc sharded     | scales0/bias0 shard with oc
      wei1  (oc1,oc,1,1)   -> ic(=oc) sharded| psum completes the contraction
      out   replicated after psum + requant (requant must follow the
            collective: it is nonlinear, so partial-sum requant would be
            wrong — this is the TP-correctness subtlety).

    Each shard adds its own u8-shift correction (128 * colsum of its w1
    rows); the corrections sum to the global correction, keeping the
    result bit-exact vs single-device.
    """
    check(cfg.fuse_conv1x1, "tp_fused_conv needs the fused config")
    n_shard = mesh.shape[axis]
    check(cfg.oc % n_shard == 0, f"oc {cfg.oc} not divisible by {axis}")
    oc_l = cfg.oc // n_shard

    import dataclasses
    from ..config import LANES
    from ..utils.mathutil import div_up
    # local config: conv0 with oc_l channels, emitting the s32 partial acc1
    local_cfg = dataclasses.replace(
        cfg, oc=oc_l,
        ocp=max(div_up(oc_l, LANES) * LANES, LANES))

    wei = np.asarray(wei)
    w1 = np.asarray(wei1x1)
    # pre-shard the packed operands on host (device_put with shardings in
    # the jitted caller)
    shards = []
    for d in range(n_shard):
        sl = slice(d * oc_l, (d + 1) * oc_l)
        w3_l = layout.pack_conv_weights(wei[sl], local_cfg.icp, local_cfg.ocp)
        w1_l = layout.pack_1x1_weights(w1[:, sl], local_cfg.ocp, cfg.oc1x1p)
        sc0 = np.asarray(cfg.conv0_scales, np.float32)
        sc0_l = sc0[sl] if sc0.size > 1 else sc0
        shards.append({
            "w3": w3_l,
            "corr0": layout.u8_shift_correction(w3_l),
            "bias0": layout.widen_bias(
                None if bia is None else np.asarray(bia)[sl],
                cfg.bia_dt, local_cfg.ocp),
            "scale0": layout.widen_scales(sc0_l, oc_l, local_cfg.ocp),
            "w1": w1_l,
            "corr1": layout.u8_shift_correction(w1_l),
        })
    stacked = {k: jnp.asarray(np.stack([s[k] for s in shards]))
               for k in shards[0]}
    bias1 = jnp.asarray(layout.widen_bias(bia1x1, cfg.bia1x1_dt, cfg.oc1x1p))
    scale1 = jnp.asarray(layout.widen_scales(
        cfg.conv1_scales, cfg.oc1x1, cfg.oc1x1p))

    def local_fn(src, w3, corr0, bias0, scale0, w1_l, corr1):
        # squeeze the leading shard dim added by stacking
        acc1 = _conv_call_acc1(
            local_cfg, src, w3[0], corr0[0], bias0[0], scale0[0],
            w1_l[0], corr1[0])
        acc1 = jax.lax.psum(acc1, axis)
        res = requant(acc1, bias1, scale1, cfg.conv1_relu, cfg.conv1_round,
                      cfg.dst_dt)
        return res[..., :cfg.oc1x1]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(), check_vma=False)

    def run(src):
        return fn(jnp.asarray(src), stacked["w3"], stacked["corr0"],
                  stacked["bias0"], stacked["scale0"], stacked["w1"],
                  stacked["corr1"])

    return jax.jit(run)


def _conv_call_acc1(cfg: ConvConfig, src_u8, w3, corr0, bias0, scale0,
                    w1, corr1):
    """Fused conv emitting the raw s32 1x1 accumulator (pre-requant), for
    TP partial sums. Composed from the same jnp building blocks as the
    Pallas kernel; runs as one XLA fusion per shard."""
    from ..ops.requant import requant_to_u8_centered
    srcp = layout.prep_src(cfg, src_u8, xp=jnp)
    n = srcp.shape[0]
    taps = []
    for kj in range(cfg.kw):        # kj-major: matches the packed row order
        for ki in range(cfg.kh):
            h_hi = ki + (cfg.oh - 1) * cfg.sh + 1
            w_hi = kj + (cfg.ow - 1) * cfg.sw + 1
            taps.append(srcp[:, ki:h_hi:cfg.sh, kj:w_hi:cfg.sw, :])
    patch = jnp.concatenate(taps, axis=-1)  # (n, oh, ow, kw*kh*icp)
    acc = jax.lax.dot_general(
        patch, w3, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + corr0.reshape(1, 1, 1, -1)
    x1 = requant_to_u8_centered(acc, bias0.reshape(1, 1, 1, -1),
                                scale0.reshape(1, 1, 1, -1), cfg.conv0_round)
    acc1 = jax.lax.dot_general(
        x1, w1, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc1 + corr1.reshape(1, 1, 1, -1)


# ------------------------------------------------------------------ SP

def sp_conv(conv_op, mesh: Mesh, axis: str = "sp"):
    """Spatially-sharded conv: H split over `axis`, 1-row-per-pad halo
    exchange with ``ppermute`` (the ICI neighbor pattern; SURVEY.md §5
    long-context row). Requires stride_h == 1 (like spatially-blocked
    inference tiling; general strides fall back to DP)."""
    cfg = conv_op.cfg
    n_shard = mesh.shape[axis]
    check_eq(cfg.sh, 1, "sp_conv requires stride_h == 1")
    check_eq(2 * cfg.ph, cfg.kh - 1,
             "sp_conv requires SAME padding (2*ph == kh-1) so output rows "
             "shard evenly; other geometries use dp_shard")
    check(cfg.oh % n_shard == 0, f"oh {cfg.oh} not divisible by {axis}")
    halo = cfg.ph  # rows needed from each neighbor
    import dataclasses
    oh_l = cfg.oh // n_shard

    def local_fn(src, *operands):
        # src: (n, ih/n_shard, iw, ic) local rows
        idx = jax.lax.axis_index(axis)
        if halo > 0:
            top = jax.lax.ppermute(  # receive last rows of upper neighbor
                src[:, -halo:], axis,
                [(i, (i + 1) % n_shard) for i in range(n_shard)])
            bot = jax.lax.ppermute(  # receive first rows of lower neighbor
                src[:, :halo], axis,
                [(i, (i - 1) % n_shard) for i in range(n_shard)])
            # global zero-padding at the outer edges
            top = jnp.where(idx == 0, jnp.zeros_like(top), top)
            bot = jnp.where(idx == n_shard - 1, jnp.zeros_like(bot), bot)
            src = jnp.concatenate([top, src, bot], axis=1)
        # local conv: padding only in w (h pad materialized via halos)
        pcfg = replace_geometry(cfg, ph=0, ih=src.shape[1], oh=oh_l)
        return _conv_call(pcfg, src, *operands)

    spec_in = (P(None, axis, None, None),) + tuple(
        P(None) for _ in conv_op._operands)
    fn = shard_map(local_fn, mesh=mesh, in_specs=spec_in,
                   out_specs=P(None, axis, None, None), check_vma=False)

    def run(src):
        return fn(jnp.asarray(src), *conv_op._operands)

    return jax.jit(run)
