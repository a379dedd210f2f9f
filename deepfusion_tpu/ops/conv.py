"""Fused INT8 conv3x3(+ReLU)(+conv1x1+ReLU) Pallas kernel — the flagship op.

TPU-native re-design of the reference's JIT conv
(``src/jit_conv_kernel.cc`` + ``src/op_conv.cc``). Design mapping:

* x86 register-resident 3x3->1x1 dataflow (the 3x3 result is requantized to
  u8 *in zmm registers* and consumed by the 1x1 without touching memory,
  ``src/jit_conv_kernel.cc:275-277``, ``:143-191``) -> **VMEM residency**:
  one Pallas program computes the 3x3 s32 tile, requantizes, and feeds the
  1x1 MXU matmul, all on-chip; only the final dst hits HBM.
* ``vpdpbusd`` u8*s8 dot -> MXU int8 matmul via ``jnp.dot(..,
  preferred_element_type=int32)``. The MXU path is s8 x s8, so u8 operands
  are shifted by -128 with an exact per-channel int32 correction
  (see ops/layout.py) — bit-identical to the u8 x s8 accumulation.
* kh/kw/ic loops with ``OIhw4i16o4i`` packing -> **flattened-HW im2col with
  output-side kw rolls**: the padded image lives in VMEM as a
  (IHP*IWP8, ICP) matrix (width padded to a multiple of 8 so row offsets
  are sublane-aligned). The KH row blocks for a row tile are contiguous
  2-D slices at offsets (r0+ki)*IWP8; lane-concatenating them yields a
  (rows*IWP8, KH*ICP) patch that hits the MXU as KW matmuls (one per kw
  tap), and each tap's s32 result is rotated by -kj with ``pltpu.roll``
  before accumulation (conv identity: y[p] = sum_kj z_kj[p+kj]). This
  avoids both sublane reshapes and misaligned dynamic slices, which
  Mosaic cannot lower. Rolled wrap-around rows and out-of-row pixels
  (columns >= ow) only feed outputs discarded by the caller's slice; the
  waste factor is IWP8/OW (~5% at ow=360, ~23% at ow=13).
* runtime kh clipping at image borders (``src/op_conv.cc:102-104``) ->
  zero-padded input (numerically identical; padding folds into the constant
  -128 shift correction).
* per-thread s32 workspaces ``ws_``/``acc1x1`` (``src/op_conv.h:73-79``) ->
  none needed: each grid program's accumulators are MXU/VMEM values.

Strided convs (sh or sw > 1) break the contiguous-slice property *of the
original image*, so they run the same Pallas kernel over the space-to-depth
grid: a stride-(sh,sw) conv is exactly a stride-1 conv with (sh*sw*ic)
channels and remapped weights (``layout.s2d_cfg``/``s2d_weights``), which is
bit-identical because s2d slots with no original tap get zero weights. The
reference handles stride in-kernel via its blocking parameters
(``src/jit_conv_kernel.cc:512-673``); s2d is the MXU-native equivalent — it
turns strided spatial reads into dense lane reads. ``_conv_xla`` remains
only as the "what the compiler does unaided" comparison baseline for
``bench.py --compare-xla``.

Grid: (batch, oh/row_tile); the input image block index is constant across
row tiles so Pallas DMAs it only once per batch element.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ConvConfig
from ..types import dtype, round_mode
from ..utils import env
from ..utils.opcache import OperandCache
from . import layout
from .requant import requant, requant_to_u8_centered


def _flat_iwp(cfg: ConvConfig) -> int:
    from ..utils.mathutil import round_up
    return round_up(cfg.iw + 2 * cfg.pw, 8)


def _row_patch(src_ref, cfg: ConvConfig, t_idx):
    """Build the (row_tile*iwp8, kh*icp) patch from the flat image.

    src_ref block: (1, ihp*iwp8, icp). The KH row blocks for output rows
    [r0, r0+T) are contiguous aligned slices [ (r0+ki)*iwp8, +T*iwp8 );
    kw shifts are applied to the matmul *results* (see _acc_kw_rolled).
    Requires sh == sw == 1.
    """
    T = cfg.row_tile
    iwp = _flat_iwp(cfg)
    r0 = t_idx * T
    blocks = []
    for ki in range(cfg.kh):
        base = pl.multiple_of((r0 + ki) * iwp, 8)
        blocks.append(src_ref[0, pl.ds(base, T * iwp), :])
    return jnp.concatenate(blocks, axis=-1)  # (T*iwp8, kh*icp)


def _acc_kw_rolled(patch, w3_ref, cfg: ConvConfig):
    """KW taps off one patch: y[p] = sum_kj z_kj[p + kj] (conv identity;
    z_kj = patch @ tap-kj weights). Wrap-around rows land on discarded
    out-of-row outputs in both formulations:

    * kw <= 4 (every tap shift < 4): exact INPUT-side byte shifts of the
      int8 patch on its bitcast-i32 view, lane-concatenated into ONE
      K = kw*kh*icp matmul — no s32 rolls, no inter-tap VPU adds
      (scratch/roll_probe.py bshift1; same formulation as the packed
      kernel).
    * otherwise: per-tap matmuls + output-side pltpu.roll of the s32
      partials (pltpu.roll only handles 32-bit data).

    w3_ref may be 2-D (whole K panel) or 3-D with a leading singleton
    (one ic-chunk's panel selected by the grid).
    """
    m = patch.shape[0]
    ksub = cfg.kh * cfg.icp
    interp = env.interpret_kernels()
    w3 = w3_ref[0] if len(w3_ref.shape) == 3 else w3_ref[...]
    if cfg.kw <= 4:
        from .packed import _shifted_patch
        taps = [_shifted_patch(patch, kj, interp) for kj in range(cfg.kw)]
        wide = taps[0] if cfg.kw == 1 else jnp.concatenate(taps, axis=-1)
        return jnp.dot(wide, w3, preferred_element_type=jnp.int32)
    acc = None
    for kj in range(cfg.kw):
        part = jnp.dot(patch, w3[kj * ksub:(kj + 1) * ksub, :],
                       preferred_element_type=jnp.int32)
        if kj:
            part = (jnp.roll(part, -kj, 0) if interp
                    else pltpu.roll(part, m - kj, 0))
        acc = part if acc is None else acc + part
    return acc


def _sum_term(sum_ref, cfg: ConvConfig):
    """f32 eltwise-sum operand (8-bit types widen through i32: Mosaic has
    no direct 8-bit <-> f32 casts)."""
    x = sum_ref[0]
    if cfg.sum_dt in (dtype.u8, dtype.s8):
        x = x.astype(jnp.int32)
    x = x.astype(jnp.float32)
    return x * np.float32(cfg.sum_scale)


def _acc_or_chunk(src_ref, w3_ref, cfg, ccfg, scratch_ref, epilogue):
    """Shared 3x3-accumulation driver for the conv kernels.

    Single-shot (ccfg is None): compute the full s32 acc and run the
    epilogue. Chunked (the reference's multi-call acc_s32 accumulation,
    src/op_conv.cc:96-122): each ic-chunk grid step accumulates its
    partial into VMEM scratch; the last chunk runs the epilogue.
    """
    pcfg = ccfg if ccfg is not None else cfg
    patch = _row_patch(src_ref, pcfg, pl.program_id(1))
    part = _acc_kw_rolled(patch, w3_ref, pcfg)
    if ccfg is None:
        epilogue(part)
        return
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _init():
        scratch_ref[...] = part

    @pl.when(c != 0)
    def _accum():
        scratch_ref[...] = scratch_ref[...] + part

    @pl.when(c == pl.num_programs(2) - 1)
    def _finish():
        epilogue(scratch_ref[...])


def _conv_kernel(*refs, cfg: ConvConfig, ccfg: ConvConfig = None):
    scratch_ref = None
    if ccfg is not None:
        *refs, scratch_ref = refs
    if cfg.with_sum:
        (src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref, sum_ref,
         out_ref) = refs
    else:
        src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref, out_ref = refs
        sum_ref = None

    def epilogue(acc):
        acc = acc + corr0_ref[...]                 # exact u8-shift correction
        res = requant(acc,
                      bias0_ref[...] if cfg.conv0_with_bias else None,
                      scale0_ref[...], cfg.conv0_relu, cfg.conv0_round,
                      cfg.dst_dt,
                      sum_term=None if sum_ref is None
                      else _sum_term(sum_ref, cfg))
        out_ref[0] = res[:, :cfg.oc]

    _acc_or_chunk(src_ref, w3_ref, cfg, ccfg, scratch_ref, epilogue)


def _conv_fused_kernel(*refs, cfg: ConvConfig, emit_acc1: bool = False,
                       ccfg: ConvConfig = None):
    scratch_ref = None
    if ccfg is not None:
        *refs, scratch_ref = refs
    if emit_acc1:
        (src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref,
         w1_ref, corr1_ref, out_ref) = refs
        sum_ref = bias1_ref = scale1_ref = None
    elif cfg.with_sum:
        (src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref,
         w1_ref, corr1_ref, bias1_ref, scale1_ref, sum_ref, out_ref) = refs
    else:
        (src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref,
         w1_ref, corr1_ref, bias1_ref, scale1_ref, out_ref) = refs
        sum_ref = None

    def epilogue(acc):
        acc = acc + corr0_ref[...]
        # 3x3 epilogue -> u8 intermediate, pre-shifted to s8 for the MXU.
        # Stays in VMEM: the x86 register-residency property
        # (jit_conv_kernel.cc:275-277) maps to "never leaves the chip".
        x1 = requant_to_u8_centered(
            acc, bias0_ref[...] if cfg.conv0_with_bias else None,
            scale0_ref[...], cfg.conv0_round)          # (T*iwp, ocp) s8
        acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
        acc1 = acc1 + corr1_ref[...]
        if emit_acc1:
            # TP partial-sum mode: the raw s32 1x1 accumulator leaves the
            # kernel; psum over the tp axis then requant happen outside
            # (parallel/shard.py — requant is nonlinear so it must follow
            # the collective). int32 adds commute => bit-exact vs
            # single-device.
            out_ref[0] = acc1
            return
        res = requant(acc1,
                      bias1_ref[...] if cfg.conv1_with_bias else None,
                      scale1_ref[...], cfg.conv1_relu, cfg.conv1_round,
                      cfg.dst_dt,
                      sum_term=None if sum_ref is None
                      else _sum_term(sum_ref, cfg))
        out_ref[0] = res[:, :cfg.oc1x1]

    _acc_or_chunk(src_ref, w3_ref, cfg, ccfg, scratch_ref, epilogue)


def _vec_spec(n, rank3: bool = False):
    ix = (lambda b, t, c: (0, 0)) if rank3 else (lambda b, t: (0, 0))
    return pl.BlockSpec((1, n), ix, memory_space=pltpu.VMEM)


def _conv_pallas(cfg: ConvConfig, srcp, w3, corr0, bias0, scale0,
                 w1, corr1, bias1, scale1, sum_src=None,
                 emit_acc1: bool = False):
    """Stride-1 Pallas path over the flat (ihp*iwp8, icp) image.

    emit_acc1: fused path only — emit the raw s32 1x1 accumulator (all
    oc1x1p lanes) instead of the requantized dst, for TP partial sums.

    cfg.ic_chunks > 1 adds an input-channel grid dimension (innermost):
    each step loads only its icp/ic_chunks lanes of the image and its K
    panel, accumulating partials in VMEM scratch — the reference's
    bounded-working-set ic chunking (src/op_conv.cc:96-122,
    nb_ic_blocking src/jit_conv_kernel.cc:643-646)."""
    import dataclasses

    n = srcp.shape[0]
    ihp = cfg.ih + 2 * cfg.ph
    iwp = _flat_iwp(cfg)
    flat = srcp.reshape(n, ihp * iwp, cfg.icp)
    chunks = cfg.ic_chunks
    rank3 = chunks > 1
    out_oc = cfg.oc1x1 if cfg.fuse_conv1x1 else cfg.oc
    if emit_acc1:
        out_oc = cfg.oc1x1p
    m_tile = cfg.row_tile * iwp
    ccfg = None
    scratch_shapes = []
    if rank3:
        icp_c = cfg.icp // chunks
        ccfg = dataclasses.replace(cfg, icp=icp_c)
        k_dim = cfg.kh * cfg.kw * icp_c
        # regroup the K panel rows (kw, kh, ic)-major -> per-chunk panels
        w3 = w3.reshape(cfg.kw * cfg.kh, chunks, icp_c, cfg.ocp)
        w3 = jnp.transpose(w3, (1, 0, 2, 3)).reshape(chunks, k_dim, cfg.ocp)
        grid = (cfg.bs, cfg.oh // cfg.row_tile, chunks)
        src_spec = pl.BlockSpec((1, ihp * iwp, icp_c),
                                lambda b, t, c: (b, 0, c),
                                memory_space=pltpu.VMEM)
        w3_spec = pl.BlockSpec((1, k_dim, cfg.ocp),
                               lambda b, t, c: (c, 0, 0),
                               memory_space=pltpu.VMEM)
        ix_tile = lambda b, t, c: (b, t, 0)  # noqa: E731
        ix_const = lambda b, t, c: (0, 0)  # noqa: E731
        scratch_shapes = [pltpu.VMEM((m_tile, cfg.ocp), jnp.int32)]
    else:
        k_dim = cfg.kh * cfg.kw * cfg.icp
        grid = (cfg.bs, cfg.oh // cfg.row_tile)
        src_spec = pl.BlockSpec((1, ihp * iwp, cfg.icp),
                                lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        w3_spec = pl.BlockSpec((k_dim, cfg.ocp), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
        ix_tile = lambda b, t: (b, t, 0)  # noqa: E731
        ix_const = lambda b, t: (0, 0)  # noqa: E731
    out_spec = pl.BlockSpec((1, m_tile, out_oc), ix_tile,
                            memory_space=pltpu.VMEM)
    in_specs = [src_spec, w3_spec, _vec_spec(cfg.ocp, rank3),
                _vec_spec(cfg.ocp, rank3), _vec_spec(cfg.ocp, rank3)]
    args = [flat, w3, corr0.reshape(1, -1), bias0.reshape(1, -1),
            scale0.reshape(1, -1)]
    if cfg.fuse_conv1x1:
        kernel = functools.partial(_conv_fused_kernel, cfg=cfg,
                                   emit_acc1=emit_acc1, ccfg=ccfg)
        in_specs += [
            pl.BlockSpec((cfg.ocp, cfg.oc1x1p), ix_const,
                         memory_space=pltpu.VMEM),
            _vec_spec(cfg.oc1x1p, rank3)]
        args += [w1, corr1.reshape(1, -1)]
        if not emit_acc1:
            in_specs += [_vec_spec(cfg.oc1x1p, rank3),
                         _vec_spec(cfg.oc1x1p, rank3)]
            args += [bias1.reshape(1, -1), scale1.reshape(1, -1)]
    else:
        kernel = functools.partial(_conv_kernel, cfg=cfg, ccfg=ccfg)
    if cfg.with_sum:
        # expand the sum operand to the flat (oh*iwp8, ocp) layout; padded
        # columns/lanes feed only discarded outputs
        ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
        sflat = jnp.pad(sum_src, ((0, 0), (0, 0), (0, iwp - cfg.ow),
                                  (0, ocp_out - out_oc)))
        sflat = sflat.reshape(n, cfg.oh * iwp, ocp_out)
        in_specs.append(pl.BlockSpec((1, m_tile, ocp_out), ix_tile,
                                     memory_space=pltpu.VMEM))
        args.append(sflat)

    flops = 2 * m_tile * cfg.kh * cfg.kw * cfg.icp * cfg.ocp
    bytes_accessed = (ihp * iwp * cfg.icp + cfg.kh * cfg.kw * cfg.icp
                      * cfg.ocp + m_tile * out_oc * cfg.dst_dt.size)
    if cfg.fuse_conv1x1:
        flops += 2 * m_tile * cfg.ocp * cfg.oc1x1p
        bytes_accessed += cfg.ocp * cfg.oc1x1p
    ntiles = grid[0] * grid[1]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.bs, cfg.oh * iwp, out_oc),
            np.int32 if emit_acc1 else cfg.dst_dt.np),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
        # batch and row-tile dims are independent (unique out block per
        # step); the ic-chunk dim accumulates into scratch -> arbitrary
        compiler_params=env.tpu_compiler_params(
            ("parallel", "parallel") + (("arbitrary",) if rank3 else ())),
        cost_estimate=pl.CostEstimate(
            flops=flops * ntiles,
            bytes_accessed=bytes_accessed * ntiles,
            transcendentals=0),
        interpret=env.interpret_kernels(),
    )(*args)
    # columns >= ow are the wrap-around pixels; slice them away (fused by XLA)
    return out.reshape(cfg.bs, cfg.oh, iwp, out_oc)[:, :, :cfg.ow, :]


def _conv_xla(cfg: ConvConfig, srcp, w3, corr0, bias0, scale0,
              w1, corr1, bias1, scale1, sum_src=None):
    """Strided fallback: same numerics, XLA ops (int8 dot_general)."""
    taps = []
    for kj in range(cfg.kw):        # kj-major: matches the packed row order
        for ki in range(cfg.kh):
            h_hi = ki + (cfg.oh - 1) * cfg.sh + 1
            w_hi = kj + (cfg.ow - 1) * cfg.sw + 1
            taps.append(srcp[:, ki:h_hi:cfg.sh, kj:w_hi:cfg.sw, :])
    patch = jnp.concatenate(taps, axis=-1)  # (n, oh, ow, kw*kh*icp)
    acc = jax.lax.dot_general(patch, w3, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc = acc + corr0.reshape(1, 1, 1, -1)
    sum_term = None
    if cfg.with_sum:
        st = sum_src
        if cfg.sum_dt in (dtype.u8, dtype.s8):
            st = st.astype(jnp.int32)
        sum_term = st.astype(jnp.float32) * np.float32(cfg.sum_scale)
    if not cfg.fuse_conv1x1:
        res = requant(acc, bias0.reshape(1, 1, 1, -1) if cfg.conv0_with_bias
                      else None, scale0.reshape(1, 1, 1, -1),
                      cfg.conv0_relu, cfg.conv0_round, cfg.dst_dt,
                      sum_term=sum_term)
        return res[..., :cfg.oc]
    x1 = requant_to_u8_centered(
        acc, bias0.reshape(1, 1, 1, -1) if cfg.conv0_with_bias else None,
        scale0.reshape(1, 1, 1, -1), cfg.conv0_round)
    acc1 = jax.lax.dot_general(x1, w1, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    acc1 = acc1 + corr1.reshape(1, 1, 1, -1)
    res = requant(acc1, bias1.reshape(1, 1, 1, -1) if cfg.conv1_with_bias
                  else None, scale1.reshape(1, 1, 1, -1),
                  cfg.conv1_relu, cfg.conv1_round, cfg.dst_dt,
                  sum_term=sum_term)
    return res[..., :cfg.oc1x1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _conv_call(cfg: ConvConfig, src_u8, w3, corr0, bias0, scale0,
               w1=None, corr1=None, bias1=None, scale1=None, sum_src=None):
    srcp = layout.prep_src(cfg, src_u8, xp=jnp)    # (n, ihp, iwp8, icp) s8
    return _conv_pallas(cfg, srcp, w3, corr0, bias0, scale0,
                        w1, corr1, bias1, scale1, sum_src=sum_src)


@functools.partial(jax.jit, static_argnames=("cfg",))
def conv_fused_acc1(cfg: ConvConfig, src_u8, w3, corr0, bias0, scale0,
                    w1, corr1):
    """Fused conv emitting the raw s32 1x1 accumulator (pre-requant) via
    the flagship Pallas kernel — the TP local step (parallel/shard.py).
    Returns (n, oh, ow, oc1x1p) int32 (padded lanes kept: bias/scale
    vectors downstream are ocp-padded too)."""
    srcp = layout.prep_src(cfg, src_u8, xp=jnp)
    return _conv_pallas(cfg, srcp, w3, corr0, bias0, scale0,
                        w1, corr1, None, None, emit_acc1=True)


@functools.partial(jax.jit, static_argnames=("cfg", "cfg2"))
def _conv_call_s2d(cfg: ConvConfig, cfg2: ConvConfig, src_u8,
                   w3, corr0, bias0, scale0,
                   w1=None, corr1=None, bias1=None, scale1=None,
                   sum_src=None):
    """Strided conv via the stride-1 Pallas kernel on the s2d grid.

    w3 must be packed from ``layout.s2d_weights`` with cfg2's channel
    padding; all other operands are stride-agnostic (output geometry,
    scales and the fused 1x1 carry over unchanged)."""
    srcp = layout.prep_src_s2d(cfg, cfg2, src_u8, xp=jnp)
    return _conv_pallas(cfg2, srcp, w3, corr0, bias0, scale0,
                        w1, corr1, bias1, scale1, sum_src=sum_src)


class ConvOp:
    """Pre-packed, pre-configured conv op for repeated submission.

    The analogue of constructing ``op_conv`` once and calling ``submit()``
    per batch (``src/op_conv.h:34-96``): weights are packed and the kernel
    is traced exactly once per configuration.
    """

    def __init__(self, cfg: ConvConfig, wei, bia=None, wei1x1=None,
                 bia1x1=None):
        self.cfg = cfg
        # strided configs run the stride-1 Pallas kernel on the s2d grid
        # (see module docstring); weights are remapped once at pack time
        self.cfg2 = layout.s2d_cfg(cfg) if (cfg.sh > 1 or cfg.sw > 1) \
            else None
        if self.cfg2 is not None:
            wei = layout.s2d_weights(cfg, np.asarray(wei))
        packed = layout.pack_all(self.cfg2 or cfg, wei, bia, wei1x1, bia1x1)
        keys = self._OPERAND_KEYS[:8 if cfg.fuse_conv1x1 else 4]
        self._cache = OperandCache([packed[k] for k in keys])

    # host-side packed operands (numpy): safe to close over in traced
    # callers (shard wrappers, model forwards) — see utils/opcache.py
    @property
    def _operands(self):
        return self._cache.host

    def __call__(self, src_u8, sum_src=None, operands=None):
        """operands: optional override of the cached packed weights —
        pass them as jit ARGUMENTS from a traced caller to keep the
        compile keyed on shapes instead of weight values."""
        src = jnp.asarray(src_u8)
        if self.cfg.with_sum and sum_src is None:
            raise ValueError("config has a sum post-op; pass sum_src")
        if self.cfg2 is not None:
            call, cfgs = _conv_call_s2d, (self.cfg, self.cfg2)
        else:
            call, cfgs = _conv_call, (self.cfg,)
        if env.dump_code() and not getattr(self, "_dumped", False):
            # analogue of DEEPFUSION_DUMP_CODE (src/jit_generator.h:261-296)
            from ..utils.profiler import maybe_dump_lowered
            name = "conv_fused" if self.cfg.fuse_conv1x1 else "conv"
            maybe_dump_lowered(name, call, *cfgs, src, *self._operands)
            self._dumped = True
        kw = {}
        if operands is None:
            operands = self._cache.for_call(src)
        if self.cfg.fuse_conv1x1:
            args = operands
        else:
            args = operands[:4]
            kw = dict(w1=None, corr1=None, bias1=None, scale1=None)
        if sum_src is not None:
            kw["sum_src"] = jnp.asarray(sum_src)
        return call(*cfgs, src, *args, **kw)

    # --- packed-weight persistence (stateless-inference checkpoint
    # analogue; the reference keeps weights caller-owned, SURVEY.md §5) ---
    _OPERAND_KEYS = ("w3", "corr0", "bias0", "scale0",
                     "w1", "corr1", "bias1", "scale1")

    def save(self, path: str):
        """Save the packed operands + config to an .npz archive."""
        from ..utils.persist import dump_configs
        arrs = {k: np.asarray(v) for k, v in
                zip(self._OPERAND_KEYS, self._operands)}
        np.savez(path, __cfg__=dump_configs(cfg=self.cfg), **arrs)

    @classmethod
    def load(cls, path: str) -> "ConvOp":
        from ..utils.persist import load_configs
        data = np.load(path, allow_pickle=False)
        cfg = load_configs(data["__cfg__"], cfg=ConvConfig)["cfg"]
        op = cls.__new__(cls)
        op.cfg = cfg
        op.cfg2 = layout.s2d_cfg(cfg) if (cfg.sh > 1 or cfg.sw > 1) else None
        keys = cls._OPERAND_KEYS[:8 if cfg.fuse_conv1x1 else 4]
        op._cache = OperandCache([data[k] for k in keys])
        return op


def conv(src, wei, bia=None, stride=(1, 1), padding=(0, 0), *,
         dst_dtype, conv0_relu=False, conv0_scales=(1.0,),
         conv0_round_mode=round_mode.nearest,
         wei1x1=None, bia1x1=None, conv1_relu=False, conv1_scales=(1.0,),
         conv1_round_mode=round_mode.nearest, groups=1,
         sum_src=None, sum_scale=1.0):
    """Functional conv3x3(+relu)(+conv1x1+relu).

    API parity with ``deepfusion::conv`` (``include/deepfusion.h:120-145``):
    src is NHWC u8, wei is OIHW s8, bias may be u8/s8/s32/f32, scales are
    scalar or per-output-channel, round modes per stage.
    """
    src = np.asarray(src) if not isinstance(src, jnp.ndarray) else src
    wei = np.asarray(wei)
    n, ih, iw, ic = src.shape
    oc, _, kh, kw = wei.shape
    from ..utils.mathutil import conv_output_size
    oh = conv_output_size(ih, kh, stride[0], padding[0])
    ow = conv_output_size(iw, kw, stride[1], padding[1])
    out_oc = wei1x1.shape[0] if wei1x1 is not None else oc
    cfg = ConvConfig.make(
        (n, ih, iw, ic), tuple(wei.shape),
        None if bia is None else np.asarray(bia).dtype,
        stride, padding, (n, oh, ow, out_oc), dst_dtype,
        conv0_relu=conv0_relu, conv0_scales=conv0_scales,
        conv0_round=conv0_round_mode,
        wei1x1_shape=None if wei1x1 is None else tuple(np.asarray(wei1x1).shape),
        bia1x1_dt=None if bia1x1 is None else np.asarray(bia1x1).dtype,
        conv1_relu=conv1_relu, conv1_scales=conv1_scales,
        conv1_round=conv1_round_mode, groups=groups,
        sum_dt=None if sum_src is None else np.asarray(sum_src).dtype,
        sum_scale=sum_scale)
    op = ConvOp(cfg, wei, bia, wei1x1, bia1x1)
    return op(src, sum_src=sum_src)
