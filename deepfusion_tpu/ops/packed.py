"""Layout-persistent ("packed domain") fused conv path.

The reference library's hot loop never re-materialises activations between
the 3x3 and the fused 1x1 (register residency, ``src/jit_conv_kernel.cc:
275-277``) — but *between ops* it still hands the caller a plain dense u8
tensor. On TPU the equivalent inter-op handoff (pad + u8->s8 shift +
channel-pad + width-align) is a full HBM round-trip that costs ~20% of the
fused kernel's roofline time. This module removes it: activations stay in a
**packed domain** across ops, and the conv kernel itself emits its output
already packed for the next consumer.

Packed domain (``PackedSpec``): an image of logical shape (N, H, W, C) u8
is stored as an int8 array of shape ``(N, (H + 2*halo) * iwp, cp)`` where

* values are centered: ``stored = u8_value - 128`` (the MXU int8 path is
  s8 x s8; the -128 shift is corrected exactly via the per-oc column-sum
  term, see ops/layout.py),
* the image occupies rows ``[halo, halo+H)`` and, within each row of
  ``iwp`` flat positions, columns ``[col_off, col_off+W)`` and lanes
  ``[0, C)``,
* every non-image slot holds -128 (i.e. u8 zero = the conv padding value),
* ``iwp`` is a multiple of 8 so flat row offsets are sublane-aligned.

The packed conv kernel (stride 1, u8 destination) then:

* slices its KH row blocks straight out of the incoming packed array
  (``halo >= ph`` guarantees in-bounds),
* applies the kw taps as output-side ``pltpu.roll`` shifts exactly like
  ops/conv.py,
* writes **its own halo**: the grid has two extra row-tile programs that
  emit -128 pad blocks, and the epilogue masks non-image columns/lanes to
  -128 — so the output is a valid packed image with ``halo = row_tile``,
  ready to be consumed by the next conv with no XLA glue at all.

Steady-state cost per fused conv = one HBM read of the packed input + one
HBM write of the packed output + the MXU work. ``pack_image`` /
``unpack_image`` convert at the model boundary only.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ConvConfig
from ..types import dtype
from ..utils import env
from ..utils.logger import check
from ..utils.mathutil import round_up
from .requant import requant_to_u8_centered


@dataclasses.dataclass(frozen=True)
class PackedSpec:
    """Static description of a packed-domain image (see module docstring)."""

    h: int        # logical image height
    w: int        # logical image width
    c: int        # logical channels
    cp: int       # stored channels (lane-padded); lanes >= c hold -128
    halo: int     # pad rows above AND below the image
    col_off: int  # first image column within a flat row
    iwp: int      # flat positions per row (multiple of 8)

    def __post_init__(self):
        check(self.iwp % 8 == 0, "packed iwp must be sublane-aligned")
        check(self.col_off + self.w <= self.iwp, "image exceeds packed row")

    @property
    def rows(self) -> int:
        return self.h + 2 * self.halo

    def array_shape(self, n: int):
        return (n, self.rows * self.iwp, self.cp)

    @staticmethod
    def make(h: int, w: int, c: int, *, cp=None, halo: int = 1,
             col_off: int = 1, iwp=None) -> "PackedSpec":
        if cp is None:
            cp = max(round_up(c, 32), 32)
        if iwp is None:
            iwp = round_up(w + 2 * col_off, 8)
        return PackedSpec(h=h, w=w, c=c, cp=cp, halo=halo,
                          col_off=col_off, iwp=iwp)


def pack_image(src_u8, spec: PackedSpec, xp=np):
    """NHWC u8 -> packed centered-s8 flat array (model-boundary cost only)."""
    src = xp.asarray(src_u8)
    n, h, w, c = src.shape
    check((h, w) == (spec.h, spec.w) and c == spec.c,
          "pack_image: shape does not match spec")
    shifted = (src.astype(xp.int16) - 128).astype(xp.int8)
    padded = xp.pad(
        shifted,
        ((0, 0), (spec.halo, spec.halo),
         (spec.col_off, spec.iwp - spec.col_off - w), (0, spec.cp - c)),
        constant_values=np.int8(-128))
    return padded.reshape(n, spec.rows * spec.iwp, spec.cp)


def unpack_image(arr, spec: PackedSpec, xp=np):
    """Packed centered-s8 -> NHWC u8."""
    arr = xp.asarray(arr)
    n = arr.shape[0]
    img = arr.reshape(n, spec.rows, spec.iwp, spec.cp)[
        :, spec.halo:spec.halo + spec.h,
        spec.col_off:spec.col_off + spec.w, :spec.c]
    return (img.astype(xp.int16) + 128).astype(xp.uint8)


def validate_packed_conv(cfg: ConvConfig, sin: PackedSpec, sout: PackedSpec):
    """Legality of running cfg from sin to sout (init_conf-style checks)."""
    check(cfg.sh == 1 and cfg.sw == 1, "packed path requires stride 1")
    check(cfg.dst_dt == dtype.u8, "packed path requires a u8 destination")
    check(not cfg.with_sum, "packed path does not take a sum post-op yet")
    check((sin.h, sin.w, sin.c) == (cfg.ih, cfg.iw, cfg.ic),
          "input spec does not match conv geometry")
    out_c = cfg.oc1x1 if cfg.fuse_conv1x1 else cfg.oc
    check((sout.h, sout.w, sout.c) == (cfg.oh, cfg.ow, out_c),
          "output spec does not match conv geometry")
    check(sin.cp == cfg.icp, "input lane padding must match cfg.icp")
    ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
    check(sout.cp == ocp_out, "output lane padding must match cfg")
    check(sin.halo >= max(cfg.ph, cfg.kh - 1 - cfg.ph),
          "input halo too small for kernel height")
    check(sin.col_off >= cfg.pw, "input col_off too small for kernel width")
    check(sin.iwp - sin.col_off - sin.w >= cfg.kw - 1 - cfg.pw,
          "input right margin too small for kernel width")
    # the kw-as-roll identity requires equal row strides in and out
    check(sin.iwp == sout.iwp, "packed conv needs iwp_in == iwp_out")
    check(cfg.oh % cfg.row_tile == 0, "row_tile must divide oh")
    check(sout.halo == cfg.row_tile,
          "packed conv emits halo == row_tile (pad tiles are whole tiles)")


def _packed_kernel(*refs, cfg: ConvConfig, sin: PackedSpec,
                   sout: PackedSpec):
    if cfg.fuse_conv1x1:
        (src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref,
         w1_ref, corr1_ref, bias1_ref, scale1_ref, out_ref) = refs
    else:
        src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref, out_ref = refs
        w1_ref = None
    T = cfg.row_tile
    iwp = sin.iwp
    m = T * iwp
    ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    interp = env.interpret_kernels()
    is_pad_tile = jnp.logical_or(t == 0, t == nt - 1)

    @pl.when(is_pad_tile)
    def _():
        out_ref[0] = jnp.full((m, ocp_out), -128, jnp.int8)

    @pl.when(jnp.logical_not(is_pad_tile))
    def _():
        j0 = (jnp.maximum(t, 1) - 1) * T          # output image row base
        base0 = j0 + (sin.halo - cfg.ph)
        blocks = []
        for ki in range(cfg.kh):
            base = pl.multiple_of((base0 + ki) * iwp, 8)
            blocks.append(src_ref[0, pl.ds(base, m), :])
        patch = jnp.concatenate(blocks, axis=-1)   # (m, kh*icp)
        ksub = cfg.kh * cfg.icp
        acc = None
        for kj in range(cfg.kw):
            part = jnp.dot(patch, w3_ref[kj * ksub:(kj + 1) * ksub, :],
                           preferred_element_type=jnp.int32)
            # out flat col c holds image col (c - col_off_out); it reads the
            # kj tap of input flat col c + d:
            d = sin.col_off - sout.col_off + kj - cfg.pw
            if d % m:
                part = (jnp.roll(part, -d, 0) if interp
                        else pltpu.roll(part, (m - d) % m, 0))
            acc = part if acc is None else acc + part
        acc = acc + corr0_ref[...]
        # Non-image slots must come out as exactly -128 (u8 zero) so the
        # output is a valid packed image. An int8 select at store time is
        # pathologically slow on the VPU (~35% of kernel runtime measured),
        # so instead: (a) pad lanes — the packed scale vectors hold 0.0 in
        # lanes >= oc, so the epilogue lands on round(0)-128 for free;
        # (b) margin columns — a tiny (m, 1) f32 0/1 mask multiplied into
        # the final f32 chain before rounding.
        colid = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % iwp
        colmask = jnp.logical_and(colid >= sout.col_off,
                                  colid < sout.col_off + cfg.ow
                                  ).astype(jnp.float32)
        if cfg.fuse_conv1x1:
            x1 = requant_to_u8_centered(
                acc, bias0_ref[...] if cfg.conv0_with_bias else None,
                scale0_ref[...], cfg.conv0_round)
            acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
            acc1 = acc1 + corr1_ref[...]
            q = requant_to_u8_centered(
                acc1, bias1_ref[...] if cfg.conv1_with_bias else None,
                scale1_ref[...], cfg.conv1_round, zero_mask=colmask)
        else:
            q = requant_to_u8_centered(
                acc, bias0_ref[...] if cfg.conv0_with_bias else None,
                scale0_ref[...], cfg.conv0_round, zero_mask=colmask)
        out_ref[0] = q


@functools.partial(jax.jit, static_argnames=("cfg", "sin", "sout"))
def _packed_call(cfg: ConvConfig, sin: PackedSpec, sout: PackedSpec,
                 arr, *operands):
    n = arr.shape[0]
    T = cfg.row_tile
    iwp = sin.iwp
    m = T * iwp
    ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
    k_dim = cfg.kh * cfg.kw * cfg.icp
    grid = (n, cfg.oh // T + 2)

    src_spec = pl.BlockSpec((1, sin.rows * iwp, cfg.icp),
                            lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)
    w3_spec = pl.BlockSpec((k_dim, cfg.ocp), lambda b, t: (0, 0),
                           memory_space=pltpu.VMEM)

    def vec(nlanes):
        return pl.BlockSpec((1, nlanes), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [src_spec, w3_spec, vec(cfg.ocp), vec(cfg.ocp), vec(cfg.ocp)]
    if cfg.fuse_conv1x1:
        in_specs += [pl.BlockSpec((cfg.ocp, cfg.oc1x1p), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM),
                     vec(cfg.oc1x1p), vec(cfg.oc1x1p), vec(cfg.oc1x1p)]
    out_spec = pl.BlockSpec((1, m, ocp_out), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    flops = 2 * m * k_dim * cfg.ocp
    if cfg.fuse_conv1x1:
        flops += 2 * m * cfg.ocp * cfg.oc1x1p
    nbytes = (sin.rows * iwp * cfg.icp // max(grid[1], 1)
              + m * ocp_out)

    operands = [op.reshape(1, -1) if op.ndim == 1 else op for op in operands]
    return pl.pallas_call(
        functools.partial(_packed_kernel, cfg=cfg, sin=sin, sout=sout),
        out_shape=jax.ShapeDtypeStruct(sout.array_shape(n), jnp.int8),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops * grid[0] * (grid[1] - 2),
            bytes_accessed=nbytes * grid[0] * grid[1],
            transcendentals=0),
        interpret=env.interpret_kernels(),
    )(arr, *operands)


def _narrow_cfg(cfg: ConvConfig) -> ConvConfig:
    """Clone cfg with chain-friendly lane padding.

    The dense path pads output lanes to the full 128-lane width; for the
    packed domain the output lane count must equal the *next* conv's icp
    (a 32-multiple). The MXU is 128 lanes wide either way — narrow padding
    changes HBM bytes, not MXU time — so the packed path always uses
    round_up(c, 32) lanes, which is exactly what PackedSpec.make picks for
    the consumer.
    """
    ocp = max(round_up(cfg.oc, 32), 32)
    oc1x1p = max(round_up(cfg.oc1x1, 32), 32) if cfg.fuse_conv1x1 else 0
    return dataclasses.replace(cfg, ocp=ocp, oc1x1p=oc1x1p)


def _same_image_geometry(specs):
    s0 = specs[0]
    for s in specs[1:]:
        check((s.h, s.w, s.halo, s.col_off, s.iwp)
              == (s0.h, s0.w, s0.halo, s0.col_off, s0.iwp),
              "packed operands must share image geometry")


def packed_concat(arrs, specs, post_relu: bool = True):
    """Channel concat in the packed domain = lane concatenation.

    The packed domain holds u8 images (centered to s8), and true ReLU on u8
    is the identity, so the reference's concat+relu
    (``src/jit_concat_kernel.cc:30-91``) costs nothing beyond the lane copy
    here; ``post_relu`` is kept for API parity. All inputs must share image
    geometry, and every input but the last needs ``cp == c`` so the output's
    image lanes stay contiguous in ``[0, sum(c))``.

    Returns ``(packed_array, PackedSpec)``.
    """
    del post_relu  # identity on u8 images (see docstring)
    check(len(arrs) == len(specs) and len(arrs) >= 1,
          "packed_concat needs one array per spec")
    _same_image_geometry(specs)
    for s in specs[:-1]:
        check(s.cp == s.c, "packed_concat: non-final input has pad lanes "
                           "(cp > c) which would split the output image")
    s0, sl = specs[0], specs[-1]
    ctot = sum(s.c for s in specs)
    spec = PackedSpec(h=s0.h, w=s0.w, c=ctot,
                      cp=ctot - sl.c + sl.cp, halo=s0.halo,
                      col_off=s0.col_off, iwp=s0.iwp)
    out = jnp.concatenate([jnp.asarray(a) for a in arrs], axis=-1)
    return out, spec


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


def _packed_sum_kernel(a_ref, b_ref, out_ref):
    s = a_ref[...].astype(jnp.int32) + b_ref[...].astype(jnp.int32) + 128
    out_ref[...] = jnp.clip(s, -128, 127).astype(jnp.int8)


@jax.jit
def _packed_sum_call(a, b):
    n, m, cp = a.shape
    tile = _largest_divisor(m, 4096)
    spec = pl.BlockSpec((1, tile, cp), lambda bi, t: (bi, t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _packed_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m, cp), jnp.int8),
        grid=(n, m // tile),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=env.interpret_kernels(),
    )(a, b)


def packed_sum_relu(a, b, spec: PackedSpec, with_relu: bool = True):
    """Eltwise-sum+ReLU in the packed domain (ops/pool.py semantics).

    For u8 operands the dense op is ``sat_u8(relu(xa + xb))``; since
    xa, xb >= 0 the ReLU is the identity and the saturating sum maps to the
    centered domain as ``clip(sa + sb + 128, -128, 127)``. Non-image slots
    hold sa = sb = -128, which lands back on exactly -128 — so halo and
    margins stay valid and the result needs no re-packing.
    """
    del with_relu  # identity for u8 operands (see docstring)
    a, b = jnp.asarray(a), jnp.asarray(b)
    check(a.shape == b.shape, "packed_sum_relu operand shapes differ")
    check(a.shape == spec.array_shape(a.shape[0]),
          "packed_sum_relu: arrays do not match spec")
    return _packed_sum_call(a, b)


def validate_packed_maxpool2(spec: PackedSpec):
    check(spec.h % 2 == 0 and spec.w % 2 == 0,
          "packed maxpool2 needs even image h and w")
    check(spec.halo % 2 == 0 and spec.col_off % 2 == 0,
          "packed maxpool2 needs even halo and col_off "
          "(pass col_off_out=2 to the producing PackedConvOp)")
    check(spec.iwp % 16 == 0, "packed maxpool2 needs iwp % 16 == 0")


def _maxpool2_kernel(x_ref, out_ref, *, to: int, iwp: int, cp: int):
    x = x_ref[0].astype(jnp.int32).reshape(to, 2, iwp // 2, 2, cp)
    m = jnp.max(jnp.max(x, axis=3), axis=1)
    out_ref[0] = m.reshape(to * (iwp // 2), cp).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("spec",))
def _maxpool2_call(spec: PackedSpec, arr):
    n = arr.shape[0]
    iwp, cp = spec.iwp, spec.cp
    rows_out = spec.rows // 2
    to = _largest_divisor(rows_out, max(2048 // iwp, 1))
    grid = (n, rows_out // to)
    return pl.pallas_call(
        functools.partial(_maxpool2_kernel, to=to, iwp=iwp, cp=cp),
        out_shape=jax.ShapeDtypeStruct((n, rows_out * (iwp // 2), cp),
                                       jnp.int8),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2 * to * iwp, cp),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, to * (iwp // 2), cp),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=env.interpret_kernels(),
    )(arr)


def packed_maxpool2(arr, spec: PackedSpec):
    """2x2/stride-2 max pooling in the packed domain.

    Max pooling commutes with the -128 centering shift (it is monotone), so
    the pool runs directly on the stored s8 values: pair rows, pair flat
    columns, take the max — a single reshape-max Pallas kernel with no
    relayout. Legality: h, w, halo, col_off all even (so 2x2 windows align
    with the image region and halo/margins map to halo/margins) and
    iwp % 16 == 0 (so the halved row stays sublane-aligned). Non-image
    slots pool to max(-128, ...) = -128, keeping the output a valid packed
    image with ``halo/2``, ``col_off/2``, ``iwp/2``.

    Returns ``(packed_array, PackedSpec)``.
    """
    validate_packed_maxpool2(spec)
    arr = jnp.asarray(arr)
    check(arr.shape == spec.array_shape(arr.shape[0]),
          "packed_maxpool2: array does not match spec")
    out_spec = PackedSpec(h=spec.h // 2, w=spec.w // 2, c=spec.c, cp=spec.cp,
                          halo=spec.halo // 2, col_off=spec.col_off // 2,
                          iwp=spec.iwp // 2)
    return _maxpool2_call(spec, arr), out_spec


@functools.partial(jax.jit, static_argnames=("sin", "sout"))
def repack(arr, sin: PackedSpec, sout: PackedSpec):
    """Convert between packed specs of the same logical image (XLA glue;
    use only at geometry seams the fused ops above cannot bridge)."""
    check((sin.h, sin.w, sin.c) == (sout.h, sout.w, sout.c),
          "repack cannot change the logical image")
    return pack_image(unpack_image(arr, sin, xp=jnp), sout, xp=jnp)


class PackedConvOp:
    """A conv op whose activations stay in the packed domain.

    Usage::

        pop = PackedConvOp(cfg, wei, bia, wei1, bia1)
        x   = pack_image(src_u8, pop.sin)
        y   = pop(x)                        # packed, feeds the next conv
        out = unpack_image(y, pop.sout)
    """

    def __init__(self, cfg: ConvConfig, wei, bia=None, wei1x1=None,
                 bia1x1=None, sin: PackedSpec = None,
                 col_off_out: int = None):
        from . import layout
        cfg = _narrow_cfg(cfg)
        self.cfg = cfg
        packed = layout.pack_all(cfg, wei, bia, wei1x1, bia1x1)
        # pad lanes must produce exactly -128: zero their scales so the
        # epilogue's f32 chain lands on round(0)-128 without any select
        packed["scale0"][cfg.oc:] = 0.0
        if cfg.fuse_conv1x1:
            packed["scale1"][cfg.oc1x1:] = 0.0
        keys = (("w3", "corr0", "bias0", "scale0")
                + (("w1", "corr1", "bias1", "scale1")
                   if cfg.fuse_conv1x1 else ()))
        self._operands = [jnp.asarray(packed[k]) for k in keys]
        out_c = cfg.oc1x1 if cfg.fuse_conv1x1 else cfg.oc
        ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
        if sin is None:
            sin = PackedSpec.make(cfg.ih, cfg.iw, cfg.ic, cp=cfg.icp,
                                  halo=cfg.row_tile, col_off=max(cfg.pw, 1))
        if col_off_out is None:
            col_off_out = max(cfg.pw, 1)
        sout = PackedSpec(h=cfg.oh, w=cfg.ow, c=out_c, cp=ocp_out,
                          halo=cfg.row_tile, col_off=col_off_out,
                          iwp=sin.iwp)
        validate_packed_conv(cfg, sin, sout)
        self.sin = sin
        self.sout = sout

    def __call__(self, packed_arr):
        return _packed_call(self.cfg, self.sin, self.sout,
                            jnp.asarray(packed_arr), *self._operands)
