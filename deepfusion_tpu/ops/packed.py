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

* slices its KH row blocks straight out of the incoming packed array,
* applies the kw taps as input-side byte shifts on the bitcast-i32 view,
  lane-concatenated into ONE dot (output-side ``pltpu.roll`` partial
  sums as the fallback for taps outside the byte-shift range),
* writes **its own halo**: the grid covers the output's padded row space
  uniformly and the epilogue masks pad rows / margin columns / pad lanes
  to -128 — so the output is a valid packed image with a caller-chosen
  ``halo_out``, ready for the next conv with no XLA glue at all. Boundary
  tiles whose read window would poke past the input clamp it and un-shift
  the result with a static roll (wrapped rows land in masked pad rows);
  choosing ``halo_in = halo_out + ph`` ("halo erosion") makes every
  window in-bounds and removes the roll branches entirely.

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
from ..utils.opcache import OperandCache
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


def pack_image_sharded(src_u8, spec_local: PackedSpec, n_shards: int,
                       xp=np):
    """NHWC u8 -> the SHARDED packed format: H split into n_shards equal
    slabs, each packed with ``spec_local`` (whose ``h`` is the per-shard
    height), concatenated on the flat-row dim. Sharding this dim over the
    mesh's sp axis gives every device a valid local packed image whose
    halo rows the sp_packed wrapper fills by ppermute exchange
    (parallel/shard.py)."""
    src = xp.asarray(src_u8)
    n, h, w, c = src.shape
    check(h == spec_local.h * n_shards,
          "pack_image_sharded: H does not split into n_shards local specs")
    slabs = [pack_image(src[:, i * spec_local.h:(i + 1) * spec_local.h],
                        spec_local, xp=xp) for i in range(n_shards)]
    return xp.concatenate(slabs, axis=1)


def unpack_image_sharded(arr, spec_local: PackedSpec, n_shards: int,
                         xp=np):
    """Inverse of pack_image_sharded (image rows only; interior halo
    bands are dropped)."""
    arr = xp.asarray(arr)
    rl = spec_local.rows * spec_local.iwp
    slabs = [unpack_image(arr[:, i * rl:(i + 1) * rl], spec_local, xp=xp)
             for i in range(n_shards)]
    return xp.concatenate(slabs, axis=1)


def _boundary_offs(cfg: ConvConfig, sin: PackedSpec, sout: PackedSpec):
    """Static row offsets by which the first/last row-tile's input window
    runs out of bounds. The kernel clamps the window and un-shifts the
    result with a static roll; the wrapped rows land in masked pad rows.

    With output flat row j reading input flat rows j + delta - ph + ki
    (ki < kh) and oh = ih + 2*ph - kh + 1, the top underflow and the bottom
    overflow are both exactly max(0, ph - delta)."""
    delta = sin.halo - sout.halo
    off = max(0, cfg.ph - delta)
    return off, off


def validate_packed_conv(cfg: ConvConfig, sins, sout: PackedSpec,
                         ssum: PackedSpec = None):
    """Legality of running cfg from sins to sout (init_conf-style checks).

    sins is a tuple of input specs: a single entry for a plain conv, or
    several whose lane-concatenation forms the conv input (concat-free
    branch merge — the kernel reads each source separately and joins them
    in VMEM, so the channel concat never exists in HBM).

    ssum (required iff cfg.with_sum): spec of the packed eltwise-sum
    operand. It must be the same logical image as the output with the same
    column geometry; its halo may be LARGER than the output's (halo
    erosion leaves producers with deeper halos than consumers emit — the
    kernel re-bases rows by the static difference)."""
    sins = sins if isinstance(sins, (tuple, list)) else (sins,)
    sin = sins[0]
    for s in sins[1:]:
        check((s.h, s.w, s.halo, s.col_off, s.iwp)
              == (sin.h, sin.w, sin.halo, sin.col_off, sin.iwp),
              "multi-input packed conv needs uniform image geometry")
    for s in sins[:-1]:
        check(s.cp == s.c, "non-final input has pad lanes (cp > c) which "
                           "would split the conv input's image lanes")
    check(cfg.sh == 1 and cfg.sw == 1,
          "packed path requires stride 1 (strided configs are s2d-lowered "
          "by PackedConvOp before reaching here)")
    check(cfg.dst_dt == dtype.u8, "packed path requires a u8 destination")
    check(cfg.with_sum == (ssum is not None),
          "pass ssum exactly when cfg has a sum post-op")
    if ssum is not None:
        check(cfg.sum_dt == dtype.u8,
              "packed sum post-op requires a u8 sum operand")
        ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
        out_c = cfg.oc1x1 if cfg.fuse_conv1x1 else cfg.oc
        check((ssum.h, ssum.w, ssum.c) == (cfg.oh, cfg.ow, out_c),
              "sum operand spec does not match the output image")
        check((ssum.col_off, ssum.iwp) == (sout.col_off, sout.iwp),
              "sum operand must share the output's column geometry")
        check(ssum.cp == ocp_out,
              "sum operand lane padding must match the output's")
        check(ssum.halo >= sout.halo,
              "sum operand halo must cover the output halo")
    check((sin.h, sin.w) == (cfg.ih, cfg.iw),
          "input spec does not match conv geometry")
    check(sum(s.c for s in sins) == cfg.ic,
          "input channels must sum to cfg.ic")
    check(sum(s.cp for s in sins) == cfg.icp,
          "input lane padding must sum to cfg.icp")
    out_c = cfg.oc1x1 if cfg.fuse_conv1x1 else cfg.oc
    check((sout.h, sout.w, sout.c) == (cfg.oh, cfg.ow, out_c),
          "output spec does not match conv geometry")
    ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
    check(sout.cp == ocp_out, "output lane padding must match cfg")
    check(sin.halo >= cfg.ph, "input halo too small for kernel height")
    check(sin.col_off >= cfg.pw, "input col_off too small for kernel width")
    check(sin.iwp - sin.col_off - sin.w >= cfg.kw - 1 - cfg.pw,
          "input right margin too small for kernel width")
    # the kw-as-roll identity requires equal row strides in and out
    check(sin.iwp == sout.iwp, "packed conv needs iwp_in == iwp_out")
    t = cfg.row_tile
    check(sout.rows % t == 0, "row_tile must divide oh + 2*out halo")
    check(sin.rows >= t + cfg.kh - 1,
          "input too short for one row-tile window")
    off_top, off_bot = _boundary_offs(cfg, sin, sout)
    # rolled wrap rows must land in output pad rows, clamping must engage
    # only at the extreme tiles, and the two boundary branches must not
    # share a tile
    check(off_top <= sout.halo and off_bot <= sout.halo,
          "output halo too small to absorb boundary roll")
    check(off_top <= t and off_bot <= t,
          "row_tile smaller than boundary overlap")
    if off_top or off_bot:
        check(sout.rows // t >= 2,
              "boundary rolls need at least two row tiles "
              "(raise input halo or lower row_tile)")


def _shifted_patch(patch, d, interp):
    """patch[p + d] along the flat-position dim, exact for |d| < 4.

    The int8 patch has no native roll; its bitcast-i32 view packs 4
    consecutive flat positions per word (little-endian within the group),
    so a +-d byte shift is two logical shifts + an OR with the
    neighbouring word (one 4-granular pltpu.roll). Wrapped rows land on
    outputs the caller discards/masks — the same wrap contract as the
    output-side roll formulation, so the two are bit-identical."""
    if d == 0:
        return patch
    if interp:
        return jnp.roll(patch, -d, 0)
    p32 = pltpu.bitcast(patch, jnp.int32)
    mq = p32.shape[0]
    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left
    if d > 0:
        nxt = pltpu.roll(p32, mq - 1, 0)             # p32[g + 1]
        out = shr(p32, 8 * d) | shl(nxt, 32 - 8 * d)
    else:
        prv = pltpu.roll(p32, 1, 0)                  # p32[g - 1]
        out = shl(p32, -8 * d) | shr(prv, 32 + 8 * d)
    return pltpu.bitcast(out, jnp.int8)


def _roll_boundary(x, t, nt, off_top, off_bot, iwp, interp):
    """Un-shift a clamped window with a static roll at the extreme tiles
    (module docstring): wrapped rows land in rows the output/intermediate
    mask forces to -128 (validate_packed_conv / validate_packed_pair).
    Shared by the packed single-op kernel and the megakernel."""
    if not (off_top or off_bot):
        return x
    if interp:
        if off_top:
            x = jnp.where(t == 0, jnp.roll(x, off_top * iwp, 0), x)
        if off_bot:
            x = jnp.where(t == nt - 1, jnp.roll(x, -off_bot * iwp, 0), x)
        return x
    p32 = pltpu.bitcast(x, jnp.int32)
    mq = x.shape[0] // 4
    if off_top:
        p32 = jnp.where(t == 0, pltpu.roll(p32, off_top * iwp // 4, 0),
                        p32)
    if off_bot:
        p32 = jnp.where(t == nt - 1,
                        pltpu.roll(p32, mq - off_bot * iwp // 4, 0), p32)
    return pltpu.bitcast(p32, jnp.int8)


def _packed_kernel(*refs, cfg: ConvConfig, sins, sout: PackedSpec,
                   ssum: PackedSpec = None, pool2: bool = False,
                   t_off: int = 0, nt_tot: int = None, row0_off: int = 0,
                   sparse_taps: tuple = None, emit_acc1: bool = False):
    n_src = len(sins)
    sin = sins[0]
    src_refs, refs = refs[:n_src], refs[n_src:]
    sum_ref = None
    if ssum is not None:
        sum_ref, *refs = refs
    if cfg.fuse_conv1x1:
        (w3_ref, corr0_ref, bias0_ref, scale0_ref,
         w1_ref, corr1_ref, bias1_ref, scale1_ref, out_ref) = refs
    else:
        w3_ref, corr0_ref, bias0_ref, scale0_ref, out_ref = refs
        w1_ref = None
    T = cfg.row_tile
    iwp = sin.iwp
    m = T * iwp
    # t_off/nt_tot: this call covers output tiles [t_off, t_off + grid1)
    # of a larger nt_tot-tile space (the sp_packed interior/boundary
    # split, parallel/shard.py); tile indices, masks and boundary rolls
    # all use the ABSOLUTE tile index
    t = t_off + pl.program_id(1)
    nt = nt_tot if nt_tot is not None else pl.num_programs(1)
    interp = env.interpret_kernels()
    # The grid covers the output's padded row space uniformly — pad rows
    # are computed like image rows and masked to -128 at store. Tile t
    # writes output flat rows [t*T, t*T + T); tap ki of output flat row j
    # reads input flat row j + delta - ph + ki (delta re-bases between the
    # two halo sizes). At the extreme tiles that window can poke out of the
    # input by the static off_top/off_bot rows; the window is clamped
    # in-bounds and the int8 patch is un-shifted branch-free with a STATIC
    # roll + scalar-predicated select on its bitcast-i32 view (4x less
    # data than rolling the i32 accumulator; measured ~8x cheaper than
    # pl.when branches, whose control flow stalls the store pipeline).
    # The roll's wrapped rows land in masked pad rows
    # (validate_packed_conv guarantees off <= halo_out and >= 2 tiles).
    delta = sin.halo - sout.halo
    off_top, off_bot = _boundary_offs(cfg, sin, sout)
    # row0_off: the input ref holds rows [row0_off, row0_off + sin.rows)
    # of the full array (sliced boundary calls); window starts re-base
    s0 = t * T + delta - cfg.ph - row0_off
    if off_top or off_bot:
        s0 = jnp.clip(s0, 0, sin.rows - (T + cfg.kh - 1))
    def boundary_roll(x):
        return _roll_boundary(x, t, nt, off_top, off_bot, iwp, interp)

    blocks = []
    for ki in range(cfg.kh):
        base = pl.multiple_of((s0 + ki) * iwp, 8)
        if n_src == 1:
            blocks.append(src_refs[0][0, pl.ds(base, m), :])
        else:
            # lane-concat the sources in VMEM: weight K rows are ordered
            # (ki, src0 lanes..., src1 lanes...), matching cfg.ic layout
            blocks.append(jnp.concatenate(
                [r[0, pl.ds(base, m), :] for r in src_refs], axis=-1))
    if sparse_taps is None:
        patch = boundary_roll(jnp.concatenate(blocks, axis=-1))
    # out flat col c holds image col (c - col_off_out); tap kj reads the
    # input at flat position p + d with d = col_off_in - col_off_out + kj
    # - pw. Two exact formulations (identical incl. wrap rows, which land
    # only on discarded/masked outputs):
    #   * |d| < 4 for every tap (the common case): INPUT-side byte shifts
    #     of the int8 patch on its bitcast-i32 view, lane-concatenated
    #     into ONE K = kw*kh*icp dot — no s32 accumulator rolls and no
    #     VPU adds between taps (roll_probe.py bshift1: bit-exact, fastest
    #     variant measured).
    #   * otherwise: per-tap dots with OUTPUT-side pltpu.roll of the s32
    #     partials (the roll conv identity y[p] = sum_kj z_kj[p + d_kj]).
    ksub = cfg.kh * cfg.icp
    ds_taps = [sin.col_off - sout.col_off + kj - cfg.pw
               for kj in range(cfg.kw)]
    if sparse_taps is not None:
        # sparse-phase s2d: one lane-sliced, byte-shifted tap per
        # ORIGINAL strided-conv tap — kh*kw*ic K rows instead of the
        # dense lowering's ceil(k/s)^2 * s^2 * ic (16/9 MAC inflation
        # for 3x3/s2; layout.pack_sparse_s2d_weights)
        rolled = [boundary_roll(b) for b in blocks]
        parts = [_shifted_patch(
            rolled[qi][:, lo:hi],
            sin.col_off - sout.col_off + qj - cfg.pw, interp)
            for (qi, lo, hi, qj) in sparse_taps]
        wide = jnp.concatenate(parts, axis=-1)
        acc = jnp.dot(wide, w3_ref[...], preferred_element_type=jnp.int32)
    elif all(abs(d) < 4 for d in ds_taps):
        taps = [_shifted_patch(patch, d, interp) for d in ds_taps]
        wide = taps[0] if cfg.kw == 1 else jnp.concatenate(taps, axis=-1)
        acc = jnp.dot(wide, w3_ref[...], preferred_element_type=jnp.int32)
    else:
        acc = None
        for kj, d in enumerate(ds_taps):
            part = jnp.dot(patch, w3_ref[kj * ksub:(kj + 1) * ksub, :],
                           preferred_element_type=jnp.int32)
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
    # (b) margin columns and pad rows — a tiny (m, 1) f32 0/1 mask
    # multiplied into the final f32 chain before rounding.
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col = pos % iwp
    row = t * T + pos // iwp
    maskf = (jnp.logical_and(
        jnp.logical_and(col >= sout.col_off, col < sout.col_off + cfg.ow),
        jnp.logical_and(row >= sout.halo, row < sout.halo + cfg.oh))
        ).astype(jnp.float32)

    sum_rounded = None
    if sum_ref is not None:
        # the packed sum operand is a valid packed image of the OUTPUT's
        # geometry; its halo may be deeper (halo erosion), so re-base rows
        # by the static difference. u8 value = stored + 128; pre-round the
        # scaled term for the exact integer-domain join (requant()'s sum
        # order). Non-image slots hold -128 -> u8 0 -> round(0) == 0, so
        # the operand masks itself.
        from .requant import round_f32
        ds = ssum.halo - sout.halo
        sbase = pl.multiple_of((t * T + ds) * iwp, 8)
        sv = sum_ref[0, pl.ds(sbase, m), :].astype(jnp.int32) + 128
        fin_round = cfg.conv1_round if cfg.fuse_conv1x1 else cfg.conv0_round
        sum_rounded = round_f32(
            sv.astype(jnp.float32) * np.float32(cfg.sum_scale), fin_round)

    # fused 2x2/s2 max pool (pool2): pool the final clamped f32 u8-domain
    # values INSIDE the requant epilogue, before the byte pack — bit-
    # identical to packed_maxpool2 on the conv output (the pack is
    # monotone; pad slots hold u8 zero; 2x2 windows never straddle
    # image/pad boundaries because halo and col_off are even) and the
    # only formulation Mosaic takes (no int8 max exists). Also shrinks
    # the pack work 4x.
    pool_fn = None
    if pool2:
        T2, iw2 = T // 2, iwp // 2

        def pool_fn(xf):
            x4 = xf.reshape(T2, 2, iw2, 2, xf.shape[-1])
            p = jnp.maximum(jnp.maximum(x4[:, 0, :, 0], x4[:, 0, :, 1]),
                            jnp.maximum(x4[:, 1, :, 0], x4[:, 1, :, 1]))
            return p.reshape(T2 * iw2, xf.shape[-1])

    def epilogue(acc_t):
        if cfg.fuse_conv1x1:
            x1 = requant_to_u8_centered(
                acc_t, bias0_ref[...] if cfg.conv0_with_bias else None,
                scale0_ref[...], cfg.conv0_round)
            acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
            acc1 = acc1 + corr1_ref[...]
            if emit_acc1:
                # TP mode: emit the PARTIAL s32 1x1 accumulator — the
                # collective completes the contraction BEFORE the
                # (nonlinear) final requant (parallel/shard.py
                # tp_packed_fused, same contract as conv_fused_acc1)
                out_ref[0] = acc1
                return
            out_ref[0] = requant_to_u8_centered(
                acc1, bias1_ref[...] if cfg.conv1_with_bias else None,
                scale1_ref[...], cfg.conv1_round, zero_mask=maskf,
                sum_rounded=sum_rounded, pool_fn=pool_fn)
        else:
            out_ref[0] = requant_to_u8_centered(
                acc_t, bias0_ref[...] if cfg.conv0_with_bias else None,
                scale0_ref[...], cfg.conv0_round, zero_mask=maskf,
                sum_rounded=sum_rounded, pool_fn=pool_fn)

    epilogue(acc)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "sins", "sout", "ssum",
                                    "pool2", "t_range", "nt_tot",
                                    "row0_off", "sparse_taps",
                                    "emit_acc1", "pipeline"))
def _packed_call(cfg: ConvConfig, sins, sout: PackedSpec,
                 arrs, *operands, ssum: PackedSpec = None, sum_arr=None,
                 pool2: bool = False, t_range: tuple = None,
                 nt_tot: int = None, row0_off: int = 0,
                 sparse_taps: tuple = None, emit_acc1: bool = False,
                 pipeline: tuple = None):
    # pipeline: optional (in_bufs, in_lookahead, out_bufs) Buffered
    # override for the src/out block specs (0 entries keep the default
    # double buffering) — a probe knob (scratch/buffer_probe.py)
    """t_range=(t0, t1): emit only output tiles [t0, t1) of the nt_tot
    tile space (output shape covers just the range; caller concatenates).
    row0_off: the input arrays are row slices starting at that flat row
    of the full packed array. Both serve sp_packed's interior/boundary
    overlap split (parallel/shard.py)."""
    sin = sins[0]
    n = arrs[0].shape[0]
    T = cfg.row_tile
    iwp = sin.iwp
    m = T * iwp
    ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
    if sparse_taps is not None:
        k_dim = sum(hi - lo for (_, lo, hi, _) in sparse_taps)
    else:
        k_dim = cfg.kh * cfg.kw * cfg.icp
    t0, t1 = t_range if t_range is not None else (0, sout.rows // T)
    grid = (n, t1 - t0)

    in_mode = out_mode = None
    if pipeline is not None:
        ib, ila, ob = pipeline
        in_mode = pl.Buffered(ib, use_lookahead=bool(ila)) if ib else None
        out_mode = pl.Buffered(ob) if ob else None
    src_specs = [pl.BlockSpec((1, s.rows * iwp, s.cp),
                              lambda b, t: (b, 0, 0),
                              pipeline_mode=in_mode,
                              memory_space=pltpu.VMEM) for s in sins]
    w3_spec = pl.BlockSpec((k_dim, cfg.ocp), lambda b, t: (0, 0),
                           memory_space=pltpu.VMEM)

    def vec(nlanes):
        return pl.BlockSpec((1, nlanes), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = src_specs
    args = list(arrs)
    if ssum is not None:
        # whole-array block (like src): the kernel row-slices it with the
        # static halo re-base, so differing producer/consumer halos need
        # no repack
        in_specs = in_specs + [
            pl.BlockSpec((1, ssum.rows * iwp, ssum.cp),
                         lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)]
        args.append(sum_arr)
    in_specs = in_specs + [w3_spec, vec(cfg.ocp), vec(cfg.ocp),
                           vec(cfg.ocp)]
    if cfg.fuse_conv1x1:
        in_specs += [pl.BlockSpec((cfg.ocp, cfg.oc1x1p), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM),
                     vec(cfg.oc1x1p), vec(cfg.oc1x1p), vec(cfg.oc1x1p)]
    if pool2:
        m_out = (T // 2) * (iwp // 2)
    else:
        m_out = m
    out_dt = jnp.int32 if emit_acc1 else jnp.int8
    out_shape = (n, (t1 - t0) * m_out, ocp_out)
    out_spec = pl.BlockSpec((1, m_out, ocp_out), lambda b, t: (b, t, 0),
                            pipeline_mode=out_mode,
                            memory_space=pltpu.VMEM)

    flops = 2 * m * k_dim * cfg.ocp
    if cfg.fuse_conv1x1:
        flops += 2 * m * cfg.ocp * cfg.oc1x1p
    nbytes = (sin.rows * iwp * cfg.icp // max(grid[1], 1)
              + m_out * ocp_out)

    operands = [op.reshape(1, -1) if op.ndim == 1 else op for op in operands]
    return pl.pallas_call(
        functools.partial(_packed_kernel, cfg=cfg, sins=sins, sout=sout,
                          ssum=ssum, pool2=pool2, t_off=t0,
                          nt_tot=nt_tot, row0_off=row0_off,
                          sparse_taps=sparse_taps, emit_acc1=emit_acc1),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=flops * grid[0] * grid[1],
            bytes_accessed=nbytes * grid[0] * grid[1],
            transcendentals=0),
        interpret=env.interpret_kernels(),
    )(*args, *operands)


def _pick_row_tile(cfg: ConvConfig, sin: PackedSpec, sout: PackedSpec,
                   pool2: bool) -> int:
    """Largest legal row tile: divides the padded output rows, M <= 8192,
    and the lane-concatenated wide patch (the dominant in-kernel buffer
    of the single-dot tap formulation) <= 24 MB (tile_probe.py: T=64
    beats T=16 by ~1pp on the flagship; past ~24 MB Mosaic loses
    double-buffering headroom). Leaves >= 2 tiles when boundary rolls
    engage; even tiles when the pool2 epilogue is fused."""
    off_top, off_bot = _boundary_offs(cfg, sin, sout)
    need_two = bool(off_top or off_bot)
    k_dim = cfg.kh * cfg.kw * cfg.icp
    tmax = max(min(8192, 24 * 2 ** 20 // k_dim) // sin.iwp, 1)
    cands = [d for d in range(1, sout.rows + 1)
             if sout.rows % d == 0 and d <= tmax
             and d >= max(off_top, off_bot)
             and (not pool2 or d % 2 == 0)
             and (not need_two or sout.rows // d >= 2)]
    check(bool(cands), "no legal row_tile for packed geometry")
    return cands[-1]


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
    # the packed kernel reads the whole K panel per step (no ic chunking)
    return dataclasses.replace(cfg, ocp=ocp, oc1x1p=oc1x1p, ic_chunks=1)


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
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
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
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
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


def _sum_pool_kernel(*refs, to: int, iwp: int):
    src_refs, r_ref, out_ref = refs[:-2], refs[-2], refs[-1]
    parts = [r[0] for r in src_refs]
    y = (parts[0] if len(parts) == 1
         else jnp.concatenate(parts, axis=-1)).astype(jnp.int32)
    s = y + r_ref[0].astype(jnp.int32) + 128
    s = jnp.clip(s, -128, 127)          # saturating u8 sum, centered
    cp = s.shape[-1]
    x = s.reshape(to, 2, iwp // 2, 2, cp)
    m = jnp.max(jnp.max(x, axis=3), axis=1)
    out_ref[0] = m.reshape(to * (iwp // 2), cp).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("yspecs", "rspec"))
def _sum_pool_call(yspecs, rspec: PackedSpec, ys, r):
    n = r.shape[0]
    iwp = rspec.iwp
    rows_out = rspec.rows // 2
    to = _largest_divisor(rows_out, max(2048 // iwp, 1))
    grid = (n, rows_out // to)

    def blk(cp):
        return pl.BlockSpec((1, 2 * to * iwp, cp), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_sum_pool_kernel, to=to, iwp=iwp),
        out_shape=jax.ShapeDtypeStruct(
            (n, rows_out * (iwp // 2), rspec.cp), jnp.int8),
        grid=grid,
        in_specs=[blk(s.cp) for s in yspecs] + [blk(rspec.cp)],
        out_specs=pl.BlockSpec((1, to * (iwp // 2), rspec.cp),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
        interpret=env.interpret_kernels(),
    )(*ys, r)


def packed_sum_relu_maxpool2(ys, r, yspecs, rspec: PackedSpec,
                             with_relu: bool = True):
    """Fused (concat ∘ sum+ReLU ∘ 2x2/s2 maxpool) in the packed domain.

    ``ys`` is a list of packed arrays whose lane-concatenation forms the
    left sum operand (the branch-merge concat never exists in HBM) and
    ``r`` the right operand. Semantics = ``packed_maxpool2(packed_sum_relu(
    packed_concat(ys), r))``: the saturating clip commutes with the
    monotone max, and pooling in the already-widened int32 domain removes
    both the pool's HBM round-trip and its separate widening pass — the
    same fusion philosophy as the reference's planned conv+sum+relu+pool
    post-op chain (test/test_conv_relu_pooling.cc:313-391).
    """
    del with_relu  # identity for u8 operands (see packed_sum_relu)
    yspecs = tuple(yspecs) if isinstance(yspecs, (tuple, list)) \
        else (yspecs,)
    ys = [jnp.asarray(a) for a in (ys if isinstance(ys, (tuple, list))
                                   else (ys,))]
    r = jnp.asarray(r)
    check(len(ys) == len(yspecs), "one array per spec")
    _same_image_geometry(list(yspecs) + [rspec])
    for s in yspecs[:-1]:
        check(s.cp == s.c, "non-final input has pad lanes (cp > c)")
    check(sum(s.cp for s in yspecs) == rspec.cp,
          "summed lane widths must match the right operand")
    check(sum(s.c for s in yspecs) == rspec.c,
          "summed channels must match the right operand")
    validate_packed_maxpool2(rspec)
    out_spec = PackedSpec(h=rspec.h // 2, w=rspec.w // 2, c=rspec.c,
                          cp=rspec.cp, halo=rspec.halo // 2,
                          col_off=rspec.col_off // 2, iwp=rspec.iwp // 2)
    return _sum_pool_call(yspecs, rspec, tuple(ys), r), out_spec


@functools.partial(jax.jit, static_argnames=("spec", "round"))
def packed_global_avgpool(arr, spec: PackedSpec, round=None):
    """Global average pool (avg-exclude-padding) straight off a packed array.

    Bit-identical to ``pool(unpack_image(arr, spec), "avg_exc", (h, w),
    (h, w), (0, 0))`` but with no unpack relayout: every non-image slot of
    a packed array holds exactly -128 (u8 zero), so in the u8 domain it
    contributes 0 to the sum — the kernel just reduces the WHOLE array
    (stored + 128 == u8 value summed implicitly via a constant term):

        sum_u8(image) = sum_s8(all slots) + 128 * n_slots

    The divide/round/saturate epilogue matches ops/pool.py's avg_exc chain
    exactly (int32 sums -> f32 * (1/(h*w)) -> round -> saturate), so the
    result is bitwise the dense op's. Returns (n, 1, 1, c) u8 for the
    classification head. Reference pooling semantics:
    test/test_conv_relu_pooling.cc:238-259 (avg excludes padding)."""
    from ..types import round_mode
    from .requant import round_f32, saturate_to
    if round is None:
        round = round_mode.nearest
    arr = jnp.asarray(arr)
    n = arr.shape[0]
    check(arr.shape == spec.array_shape(n),
          "packed_global_avgpool: array does not match spec")
    n_slots = spec.rows * spec.iwp
    sums = (jnp.sum(arr.astype(jnp.int32), axis=1)
            + jnp.int32(128 * n_slots))                    # (n, cp) u8 sums
    val = sums.astype(jnp.float32) * np.float32(1.0 / (spec.h * spec.w))
    out = saturate_to(round_f32(val, round), dtype.u8)
    return out[:, :spec.c].reshape(n, 1, 1, spec.c)


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
                 col_off_out: int = None, halo_out: int = None,
                 sum_spec: PackedSpec = None, pool2: bool = False):
        from . import layout
        # strided configs run the stride-1 packed kernel on the s2d grid
        # (the same lowering ConvOp uses, ops/layout.py); the op's sin then
        # describes the packed s2d image and pack_input() applies the
        # regroup at the model boundary
        self.cfg_orig = None
        self.sparse_taps = None
        wei_orig = wei
        if cfg.sh > 1 or cfg.sw > 1:
            self.cfg_orig = cfg
            wei = layout.s2d_weights(cfg, np.asarray(wei))
            cfg = layout.s2d_cfg(cfg)
        cfg = _narrow_cfg(cfg)
        packed = layout.pack_all(cfg, wei, bia, wei1x1, bia1x1)
        out_c = cfg.oc1x1 if cfg.fuse_conv1x1 else cfg.oc
        ocp_out = cfg.oc1x1p if cfg.fuse_conv1x1 else cfg.ocp
        min_halo = max(cfg.ph, 1)
        if sin is None:
            sin = PackedSpec.make(cfg.ih, cfg.iw, cfg.ic, cp=cfg.icp,
                                  halo=min_halo, col_off=max(cfg.pw, 1))
        sins = tuple(sin) if isinstance(sin, (tuple, list)) else (sin,)
        sin = sins[0]
        if col_off_out is None:
            col_off_out = max(cfg.pw, 1)
        if halo_out is None:
            # self-chain-friendly default: mirror the input halo
            halo_out = sin.halo
        sout = PackedSpec(h=cfg.oh, w=cfg.ow, c=out_c, cp=ocp_out,
                          halo=halo_out, col_off=col_off_out,
                          iwp=sin.iwp)
        if self.cfg_orig is not None and self.cfg_orig.ic % 128 == 0:
            # sparse-phase s2d taps: enumerate only the original taps,
            # lane-slicing the phase groups — removes the dense
            # lowering's zero-phase MAC inflation (16/9 for 3x3/s2;
            # layout.pack_sparse_s2d_weights). Needs lane-aligned ic AND
            # every column tap within the byte-shift range (|d| < 4 —
            # the dense branch has an output-roll fallback, the sparse
            # branch does not; r5 review finding), else stay dense.
            taps = layout.sparse_s2d_taps(self.cfg_orig)
            ds = [sin.col_off - sout.col_off + qj - cfg.pw
                  for (_, _, _, qj) in taps]
            if all(abs(d) < 4 for d in ds):
                w3s = layout.pack_sparse_s2d_weights(
                    np.asarray(wei_orig), cfg.ocp)
                packed["w3"] = w3s
                packed["corr0"] = layout.u8_shift_correction(w3s)
                self.sparse_taps = taps
        # pad lanes must produce exactly -128: zero their scales so the
        # epilogue's f32 chain lands on round(0)-128 without any select
        packed["scale0"][cfg.oc:] = 0.0
        if cfg.fuse_conv1x1:
            packed["scale1"][cfg.oc1x1:] = 0.0
        keys = (("w3", "corr0", "bias0", "scale0")
                + (("w1", "corr1", "bias1", "scale1")
                   if cfg.fuse_conv1x1 else ()))
        # host numpy cache: safe to construct inside a traced model
        # forward (numpy cannot leak as a tracer) and safe to close over
        # in traced callers — see utils/opcache.py
        self._cache = OperandCache([packed[k] for k in keys])
        cfg = dataclasses.replace(
            cfg, row_tile=_pick_row_tile(cfg, sin, sout, pool2))
        self.cfg = cfg
        validate_packed_conv(cfg, sins, sout, ssum=sum_spec)
        if pool2:
            # fused 2x2/s2 max pool in the epilogue: the conv output
            # spec must satisfy the packed-pool legality so the halved
            # result is itself a valid packed image
            validate_packed_maxpool2(sout)
        self.pool2 = pool2
        self.sins = sins
        self.sin = sins[0]
        self.sout = sout
        self.ssum = sum_spec

    @property
    def _operands(self):
        return self._cache.host

    @property
    def sout_pooled(self) -> PackedSpec:
        """Output spec of the fused pool2 epilogue (valid when pool2)."""
        s = self.sout
        return PackedSpec(h=s.h // 2, w=s.w // 2, c=s.c, cp=s.cp,
                          halo=s.halo // 2, col_off=s.col_off // 2,
                          iwp=s.iwp // 2)

    def reheight(self, h: int) -> "PackedConvOp":
        """Shallow clone computing an h-row horizontal slab of the image
        (same W/C geometry, same packed operands) — the per-shard local
        op of the spatial-sharding wrapper (parallel/shard.sp_packed).
        Requires the self-chain geometry oh == ih / ow == iw (stride 1,
        SAME padding) so shard boundaries align, like sp_conv's sum rule."""
        import copy
        check(self.cfg_orig is None,
              "reheight does not support s2d-lowered strided ops")
        cfg = self.cfg
        check(cfg.oh == cfg.ih and cfg.ow == cfg.iw,
              "reheight requires oh == ih (stride-1 SAME geometry)")
        clone = copy.copy(self)
        sins = tuple(dataclasses.replace(s, h=h) for s in self.sins)
        sin = sins[0]
        sout = dataclasses.replace(self.sout, h=h)
        cfg = dataclasses.replace(cfg, ih=h, oh=h)
        cfg = dataclasses.replace(
            cfg, row_tile=_pick_row_tile(cfg, sin, sout, self.pool2))
        clone.cfg = cfg
        clone.sins, clone.sin, clone.sout = sins, sin, sout
        if self.ssum is not None:
            clone.ssum = dataclasses.replace(self.ssum, h=h)
        validate_packed_conv(cfg, clone.sins, sout, ssum=clone.ssum)
        if self.pool2:
            validate_packed_maxpool2(sout)
        return clone

    def pack_input(self, src_u8, xp=np):
        """Model-boundary pack: dense NHWC u8 -> this op's packed input
        (applies the s2d regroup first for strided configs). The host
        (numpy) path routes through the native C++ runtime when built
        (native/dfruntime.cc df_pack_image / df_s2d_regroup — the
        data-loader role of the reference's host runtime); the traced
        (jnp) path stays pure XLA."""
        from . import layout
        check(len(self.sins) == 1,
              "pack_input only supports single-input ops")
        if self.cfg_orig is not None:
            src_u8 = layout.s2d_image_u8(self.cfg_orig, src_u8, xp=xp)
        if xp is np:
            from ..native import runtime
            return runtime.pack_image(np.asarray(src_u8), self.sin)
        return pack_image(src_u8, self.sin, xp=xp)

    def __call__(self, packed_arr, sum_arr=None, operands=None):
        """operands: optional override of the cached packed weights (same
        order as _OPERAND_KEYS) — pass the op's weights as jit ARGUMENTS
        from a traced caller to keep the compile keyed on shapes instead
        of weight values (see bench.make_chain)."""
        arrs = (tuple(jnp.asarray(a) for a in packed_arr)
                if isinstance(packed_arr, (tuple, list))
                else (jnp.asarray(packed_arr),))
        check(len(arrs) == len(self.sins),
              "op expects one array per input spec")
        check((sum_arr is not None) == (self.ssum is not None),
              "pass sum_arr exactly when the op has a sum post-op")
        kw = {}
        if sum_arr is not None:
            sum_arr = jnp.asarray(sum_arr)
            check(sum_arr.shape == self.ssum.array_shape(arrs[0].shape[0]),
                  "sum_arr does not match the sum spec")
            kw = dict(ssum=self.ssum, sum_arr=sum_arr)
        if operands is None:
            operands = self._cache.for_call(arrs[0])
        if self.pool2:
            kw["pool2"] = True
        if self.sparse_taps is not None:
            kw["sparse_taps"] = self.sparse_taps
        return _packed_call(self.cfg, self.sins, self.sout,
                            arrs, *operands, **kw)

    # --- packed-weight persistence (mirrors ConvOp.save/load; the input/
    # output PackedSpecs are part of the op's contract, so they persist
    # alongside the config) ---
    _OPERAND_KEYS = ("w3", "corr0", "bias0", "scale0",
                     "w1", "corr1", "bias1", "scale1")

    def save(self, path: str):
        """Save the packed operands + config + specs to .npz."""
        from ..utils.persist import dump_configs
        specs = {"cfg": self.cfg, "sout": self.sout}
        for i, s in enumerate(self.sins):
            specs[f"sin{i}"] = s
        if self.cfg_orig is not None:
            specs["cfg_orig"] = self.cfg_orig
        if self.ssum is not None:
            specs["ssum"] = self.ssum
        arrs = {k: np.asarray(v) for k, v in
                zip(self._OPERAND_KEYS, self._operands)}
        np.savez(path, __cfg__=dump_configs(**specs),
                 __n_sins__=np.int64(len(self.sins)),
                 __pool2__=np.bool_(self.pool2),
                 __sparse__=np.bool_(self.sparse_taps is not None),
                 **arrs)

    @classmethod
    def load(cls, path: str) -> "PackedConvOp":
        import json

        from ..utils.persist import load_configs
        from . import layout
        data = np.load(path, allow_pickle=False)
        n_sins = int(data["__n_sins__"])
        present = set(json.loads(str(data["__cfg__"])))
        classes = {"cfg": ConvConfig, "sout": PackedSpec}
        classes.update({f"sin{i}": PackedSpec for i in range(n_sins)})
        if "cfg_orig" in present:
            classes["cfg_orig"] = ConvConfig
        if "ssum" in present:
            classes["ssum"] = PackedSpec
        cfgs = load_configs(data["__cfg__"], **classes)
        op = cls.__new__(cls)
        op.cfg = cfgs["cfg"]
        op.cfg_orig = cfgs.get("cfg_orig")
        op.ssum = cfgs.get("ssum")
        op.pool2 = bool(data["__pool2__"]) if "__pool2__" in data else False
        # the tap descriptor is a pure function of cfg_orig; the flag
        # records whether the saved w3/corr0 are the sparse pack
        op.sparse_taps = (layout.sparse_s2d_taps(op.cfg_orig)
                          if "__sparse__" in data and bool(data["__sparse__"])
                          else None)
        op.sins = tuple(cfgs[f"sin{i}"] for i in range(n_sins))
        op.sin = op.sins[0]
        op.sout = cfgs["sout"]
        keys = cls._OPERAND_KEYS[:8 if op.cfg.fuse_conv1x1 else 4]
        op._cache = OperandCache([data[k] for k in keys])
        return op
