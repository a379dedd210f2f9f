"""Shared implementation of the perf-evidence probes (docs/PERF.md).

Every number in PERF.md's decomposition tables reproduces from a thin
CLI in scratch/ (roll_probe, tile_probe, dma_probe, ghost_probe,
evidence_probe, manual_probe, mstatic_probe, bigblk_probe,
nochain_probe) — all of which call into this module, so the variants
share one geometry, one operand set, and one timing protocol
(bench.timeit_chain: paired chains, scalar readback, median of reps).

Flagship single-op shape: 8x126x126x256 -> fused conv3x3:256 (+relu)
-> conv1x1:256 (+relu) in the packed domain (sin halo=1, col_off=1,
iwp=128, rows=128). 83.24 GMAC/conv, int8 peak 394.7 TOPS on v5e.

Variant families:

* ABLATION (`ablate_variants`): what each term of the kernel costs.
    prod      production PackedConvOp kernel (bshift1 taps, bit-exact)
    noroll    taps without the byte shifts (wrong results, same MACs) —
              the cost of the tap shifts alone
    clip      full streams, clip-only epilogue — the bit-exact requant
              chain's cost over a saturating clip
    in1       input stream removed (constant small input block)
    outsmall  output stream reduced to 8 rows/tile
    slim      in1 + outsmall, bit-exact epilogue — ~no HBM streams
    floor     in1 + outsmall + clip epilogue — the compute floor
    matmul    plain int8 matmul chain of the same MAC count — protocol
              sanity vs the analytic MXU roofline

* CONSUMER STRUCTURES (`consumer_variants`): who issues the DMA and how
  deep the prefetch is — the "stream tax is contention, not scheduling"
  ladder.
    prod      automatic Pallas pipeline, whole-image input block
    fresh     same kernel, no chain carry (bump chain on stable input)
    bigblk    per-batch grid, in-kernel fori_loop over row tiles
    mdma      manual double-buffered window DMA, dynamic slot consumer
    mdma1     manual single-buffered window DMA (exposes raw latency)
    ms        manual DMA, static-slot consumers via parity branches
    mso       ms + manual double-buffered output copies
    ghost0/ghostc  floor kernel without/with a CONSUMED ghost DMA of the
              full window bytes from a side buffer (dma_probe/ghost_probe)
    copy      pure copy kernel (DMA bandwidth with no compute)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import peak_ops, timeit_chain
from deepfusion_tpu.config import ConvConfig
from deepfusion_tpu.ops.packed import (PackedConvOp, _shifted_patch,
                                       pack_image)
from deepfusion_tpu.ops.requant import requant_to_u8_centered
from deepfusion_tpu.utils import env

N, HW, C = 8, 126, 256
KH = KW = 3


def flagship_op(rng=None, row_tile=None, erode=False, terminal=False):
    """The production single fused op at the flagship shape.

    erode=True uses the roll-free erosion geometry (sin halo = halo_out
    + ph, so no input window ever clamps and no boundary roll exists).
    """
    from deepfusion_tpu.ops.packed import PackedSpec

    rng = rng or np.random.default_rng(0)
    src = rng.integers(0, 256, (N, HW, HW, C), dtype=np.uint8)
    wei = rng.integers(-127, 128, (C, C, 3, 3)).astype(np.int8)
    bia = rng.integers(-100, 101, (C,)).astype(np.int32)
    wei1 = rng.integers(-127, 128, (C, C, 1, 1)).astype(np.int8)
    bia1 = rng.integers(-100, 101, (C,)).astype(np.int32)
    cfg = ConvConfig.make(
        (N, HW, HW, C), (C, C, 3, 3), np.int32, (1, 1), (1, 1),
        (N, HW, HW, C), "u8", conv0_scales=(0.001,),
        wei1x1_shape=(C, C, 1, 1), bia1x1_dt=np.int32,
        conv1_relu=True, conv1_scales=(0.05,))
    kw = {}
    if erode:
        kw = dict(sin=PackedSpec.make(HW, HW, C, halo=2, col_off=1),
                  halo_out=1, col_off_out=1)
    if terminal:
        # halo_out=0/col_off_out=0: a terminal-layer output (feeds a
        # pool/head, not another 3x3) — 126 output rows instead of 128
        kw = dict(halo_out=0, col_off_out=0)
    op = PackedConvOp(cfg, wei, bia, wei1, bia1, **kw)
    if row_tile is not None:
        import dataclasses
        op.cfg = dataclasses.replace(op.cfg, row_tile=row_tile)
    return op, src


MACS1 = N * HW * HW * (9 * C * C + C * C)     # logical MACs per conv


def op_aux(op, device=True):
    """The op's packed operands, 1-D vectors padded to (1, n) rows (the
    same normalization _packed_call applies internally)."""
    out = []
    for a in op._operands:
        a = np.asarray(a)
        if a.ndim == 1:
            a = a.reshape(1, -1)
        out.append(jax.device_put(a) if device else a)
    return tuple(out)


def report(name, sec, extra=""):
    peak, kind = peak_ops()
    pct = 100.0 * (2 * MACS1 / sec) / peak
    print(f"# {name:>9s} {sec*1e3:.3f} ms/iter -> {pct:6.2f}% of "
          f"roofline {extra}", file=sys.stderr)
    return round(pct, 2)


# --------------------------------------------------------------- ablation

def _variant_kernel(src_ref, w3_ref, corr0_ref, bias0_ref, scale0_ref,
                    w1_ref, corr1_ref, bias1_ref, scale1_ref, out_ref, *,
                    op, variant):
    """Parameterized copy of the packed single-op kernel body."""
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    m = T * iwp
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    interp = env.interpret_kernels()
    small_in = variant in ("in1", "slim", "floor")
    small_out = variant in ("outsmall", "slim", "floor")
    clip_ep = variant in ("clip", "floor")
    delta = sin.halo - sout.halo
    s0 = jnp.clip(t * T + delta - cfg.ph, 0, sin.rows - (T + cfg.kh - 1))
    if small_in:
        s0 = 0 * s0                       # constant block: no new bytes
    blocks = []
    for ki in range(cfg.kh):
        base = pl.multiple_of((s0 + ki) * iwp, 8)
        blocks.append(src_ref[0, pl.ds(base, m), :])
    patch = jnp.concatenate(blocks, axis=-1)
    if variant != "prod":
        p32 = pltpu.bitcast(patch, jnp.int32)
        p32 = jnp.where(t == 0, pltpu.roll(p32, iwp // 4, 0), p32)
        p32 = jnp.where(t == nt - 1,
                        pltpu.roll(p32, m // 4 - iwp // 4, 0), p32)
        patch = pltpu.bitcast(p32, jnp.int8)
    ds_taps = [sin.col_off - sout.col_off + kj - cfg.pw
               for kj in range(cfg.kw)]
    if variant == "noroll":
        taps = [patch for _ in ds_taps]   # same MACs, shifts removed
    else:
        taps = [_shifted_patch(patch, d, interp) for d in ds_taps]
    wide = jnp.concatenate(taps, axis=-1)
    acc = jnp.dot(wide, w3_ref[...], preferred_element_type=jnp.int32)
    acc = acc + corr0_ref[...]
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col = pos % iwp
    row = t * T + pos // iwp
    maskf = (jnp.logical_and(
        jnp.logical_and(col >= sout.col_off,
                        col < sout.col_off + cfg.ow),
        jnp.logical_and(row >= sout.halo, row < sout.halo + cfg.oh))
        ).astype(jnp.float32)
    if clip_ep:
        x1 = (jnp.clip(acc, 0, 255) - 128).astype(jnp.int8)
        acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
        res = jnp.clip(acc1 + corr1_ref[...], -128, 127).astype(jnp.int8)
    else:
        x1 = requant_to_u8_centered(acc, bias0_ref[...], scale0_ref[...],
                                    cfg.conv0_round)
        acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
        acc1 = acc1 + corr1_ref[...]
        res = requant_to_u8_centered(acc1, bias1_ref[...],
                                     scale1_ref[...], cfg.conv1_round,
                                     zero_mask=maskf)
    if small_out:
        out_ref[0, 0] = res[:8 * iwp]
    else:
        out_ref[0] = res


def ablate_call(op, variant):
    """pallas_call for one ablation variant; returns step(x, aux)."""
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    m = T * iwp
    n = N
    nt = sout.rows // T
    small_in = variant in ("in1", "slim", "floor")
    small_out = variant in ("outsmall", "slim", "floor")
    k_dim = cfg.kh * cfg.kw * cfg.icp

    if small_in:
        in_spec = pl.BlockSpec((1, (T + cfg.kh - 1) * iwp, cfg.icp),
                               lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((1, sin.rows * iwp, cfg.icp),
                               lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM)

    def vec(nl):
        return pl.BlockSpec((1, nl), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [in_spec,
                pl.BlockSpec((k_dim, cfg.ocp), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.ocp), vec(cfg.ocp), vec(cfg.ocp),
                pl.BlockSpec((cfg.ocp, cfg.oc1x1p), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.oc1x1p), vec(cfg.oc1x1p), vec(cfg.oc1x1p)]
    if small_out:
        m_out = 8 * iwp
        out_shape = (n, nt, m_out, cfg.oc1x1p)
        out_spec = pl.BlockSpec((1, 1, m_out, cfg.oc1x1p),
                                lambda b, t: (b, t, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        m_out = m
        out_shape = (n, nt * m, cfg.oc1x1p)
        out_spec = pl.BlockSpec((1, m, cfg.oc1x1p),
                                lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM)
    import functools

    call = pl.pallas_call(
        functools.partial(_variant_kernel, op=op, variant=variant),
        out_shape=jax.ShapeDtypeStruct(
            out_shape, jnp.int8 if not small_out else jnp.int8),
        grid=(n, nt),
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
        interpret=env.interpret_kernels(),
    )

    def step(x, aux):
        out = call(x, *aux)
        b = out.reshape(-1)[0].astype(jnp.int8) & 1
        return x.at[0, 0, 0].add(b)

    return step


def run_ablate(variants, iters=96, row_tile=64):
    op, src = flagship_op(row_tile=row_tile)
    x = jax.device_put(pack_image(src, op.sin))
    aux = op_aux(op)
    results = {}
    for v in variants:
        if v == "prod":
            def step(c, a):
                return op(c, operands=a)
        elif v == "matmul":
            # same MAC count as the op (to within row rounding), as two
            # chained plain int8 matmuls — protocol sanity vs the
            # analytic MXU roofline. The matmul INPUT is the chain
            # carry (a loop-invariant matmul gets hoisted out of the
            # fori_loop and reads 0.000 ms)
            KD = KH * KW * C
            rows = (MACS1 // (2 * KD * C)) & ~7
            w = jax.device_put(
                np.random.default_rng(1).integers(
                    -127, 128, (KD, C), dtype=np.int8))
            xmm = jax.device_put(
                np.random.default_rng(2).integers(
                    -127, 128, (rows, KD), dtype=np.int8))

            def mm_step(c, a, w=w):
                # the bump must consume a full REDUCTION of y: slicing
                # one element lets XLA rewrite the matmul into a single
                # row-column dot (pallas calls are opaque, plain XLA
                # dots are not)
                y1 = jax.lax.dot_general(
                    c, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                c = c.at[0, 0].add((y1.sum() & 1).astype(jnp.int8))
                y2 = jax.lax.dot_general(
                    c, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return c.at[0, 1].add((y2.sum() & 1).astype(jnp.int8))

            sec = timeit_chain(mm_step, xmm, iters, reps=5, spread_s=5,
                               aux=aux)
            results[v] = report(v, sec)
            continue
        else:
            step = ablate_call(op, v)
        sec = timeit_chain(step, x, iters, reps=5, spread_s=5, aux=aux)
        results[v] = report(v, sec)
    print(results)
    return results


# ------------------------------------------------- consumer structures

def _compute_tile(op, src_block, s0, t, m):
    """The per-tile compute of the production kernel, reading KH row
    blocks starting at flat row s0 of src_block (a ref or array)."""
    cfg, sin, sout = op.cfg, op.sin, op.sout
    iwp = sin.iwp
    interp = env.interpret_kernels()
    blocks = []
    for ki in range(cfg.kh):
        base = pl.multiple_of((s0 + ki) * iwp, 8)
        blocks.append(src_block[pl.ds(base, m), :])
    patch = jnp.concatenate(blocks, axis=-1)
    ds_taps = [sin.col_off - sout.col_off + kj - cfg.pw
               for kj in range(cfg.kw)]
    taps = [_shifted_patch(patch, d, interp) for d in ds_taps]
    return jnp.concatenate(taps, axis=-1)


def _tile_epilogue(op, wide, aux_refs, t, m):
    cfg, sin, sout = op.cfg, op.sin, op.sout
    iwp = sin.iwp
    (w3_ref, corr0_ref, bias0_ref, scale0_ref,
     w1_ref, corr1_ref, bias1_ref, scale1_ref) = aux_refs
    acc = jnp.dot(wide, w3_ref[...], preferred_element_type=jnp.int32)
    acc = acc + corr0_ref[...]
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col = pos % iwp
    row = t * cfg.row_tile + pos // iwp
    maskf = (jnp.logical_and(
        jnp.logical_and(col >= sout.col_off,
                        col < sout.col_off + cfg.ow),
        jnp.logical_and(row >= sout.halo, row < sout.halo + cfg.oh))
        ).astype(jnp.float32)
    x1 = requant_to_u8_centered(acc, bias0_ref[...], scale0_ref[...],
                                cfg.conv0_round)
    acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
    acc1 = acc1 + corr1_ref[...]
    return requant_to_u8_centered(acc1, bias1_ref[...], scale1_ref[...],
                                  cfg.conv1_round, zero_mask=maskf)


def _manual_kernel(src_hbm, *refs, op, mode):
    """Manual window-DMA consumers: the src stays in HBM/ANY space and
    the kernel double-buffers (T + kh - 1)-row windows into VMEM scratch
    itself. mode: mdma (dynamic slot), mdma1 (single-buffered), ms
    (static-slot parity branches), mso (ms + manual output copies)."""
    aux_refs, out_ref, scratch, sem = refs[:8], refs[8], refs[9], refs[10]
    out_stage = out_sem = None
    if mode == "mso":
        out_stage, out_sem = refs[11], refs[12]
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    m = T * iwp
    nt = sout.rows // T
    mw = (T + cfg.kh - 1) * iwp
    delta = sin.halo - sout.halo

    def s0(t):
        return jnp.clip(t * T + delta - cfg.ph, 0,
                        sin.rows - (T + cfg.kh - 1))

    def dma(slot, t):
        return pltpu.make_async_copy(
            src_hbm.at[0, pl.ds(pl.multiple_of(s0(t) * iwp, 8), mw), :],
            scratch.at[slot], sem.at[slot])

    nbuf = 1 if mode == "mdma1" else 2
    dma(0, 0).start()

    def body(t, _):
        slot = jax.lax.rem(t, nbuf)
        if nbuf > 1:
            @pl.when(t + 1 < nt)
            def _():
                # prefetch the next window while this one is consumed:
                # start under STATIC parity branches so the DMA target
                # slot is a fixed buffer
                nxt = jax.lax.rem(t + 1, nbuf)
                for sl in range(nbuf):
                    @pl.when(nxt == sl)
                    def _(sl=sl):
                        dma(sl, t + 1).start()
        for sl in range(nbuf):
            @pl.when(slot == sl)
            def _(sl=sl):
                dma(sl, t).wait()
        if mode in ("ms", "mso"):
            # static-slot consumers: the compute reads a STATIC scratch
            # index under a parity branch, so Mosaic sees fixed buffers
            for sl in range(nbuf):
                @pl.when(slot == sl)
                def _(sl=sl):
                    wide = _compute_tile(op, scratch.at[sl], 0, t, m)
                    res = _tile_epilogue(op, wide, aux_refs, t, m)
                    if mode == "mso":
                        out_stage[pl.ds(0, m), :] = res
                    else:
                        out_ref[0, pl.ds(t * m, m), :] = res
            if mode == "mso":
                cp = pltpu.make_async_copy(
                    out_stage.at[pl.ds(0, m), :],
                    out_ref.at[0, pl.ds(t * m, m), :], out_sem)
                cp.start()
                cp.wait()
        else:
            # DYNAMIC slot consumer (the mdma structure): the compute
            # reads scratch at a traced slot index
            wide = _compute_tile(op, scratch.at[slot], 0, t, m)
            res = _tile_epilogue(op, wide, aux_refs, t, m)
            out_ref[0, pl.ds(t * m, m), :] = res
        if nbuf == 1:
            @pl.when(t + 1 < nt)
            def _():
                dma(0, t + 1).start()

        return 0

    jax.lax.fori_loop(0, nt, body, 0)


def manual_call(op, mode):
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    m = T * iwp
    mw = (T + cfg.kh - 1) * iwp
    nbuf = 1 if mode == "mdma1" else 2
    k_dim = cfg.kh * cfg.kw * cfg.icp

    def vec(nl):
        return pl.BlockSpec((1, nl), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((k_dim, cfg.ocp), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.ocp), vec(cfg.ocp), vec(cfg.ocp),
                pl.BlockSpec((cfg.ocp, cfg.oc1x1p), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.oc1x1p), vec(cfg.oc1x1p), vec(cfg.oc1x1p)]
    scratch_shapes = [pltpu.VMEM((nbuf, mw, cfg.icp), jnp.int8),
                      pltpu.SemaphoreType.DMA((nbuf,))]
    if mode == "mso":
        scratch_shapes += [pltpu.VMEM((m, cfg.oc1x1p), jnp.int8),
                           pltpu.SemaphoreType.DMA(())]
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        out_spec = pl.BlockSpec((1, sout.rows * iwp, cfg.oc1x1p),
                                lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    import functools

    call = pl.pallas_call(
        functools.partial(_manual_kernel, op=op, mode=mode),
        out_shape=jax.ShapeDtypeStruct((N, sout.rows * iwp, cfg.oc1x1p),
                                       jnp.int8),
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
        compiler_params=env.tpu_compiler_params(("parallel",)),
        interpret=env.interpret_kernels(),
    )

    def step(x, aux):
        out = call(x, *aux)
        b = out[0, 0, 0].astype(jnp.int8) & 1
        return x.at[0, 0, 0].add(b)

    return step


def _bigblk_kernel(src_ref, *refs, op):
    """Per-batch grid, in-kernel fori_loop over row tiles: the automatic
    pipeline still fetches the whole image block; the consumer differs
    (one big program instead of nt small ones)."""
    aux_refs, out_ref = refs[:8], refs[8]
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    m = T * iwp
    nt = sout.rows // T
    delta = sin.halo - sout.halo

    def body(t, _):
        s0 = jnp.clip(t * T + delta - cfg.ph, 0,
                      sin.rows - (T + cfg.kh - 1))
        wide = _compute_tile(op, src_ref.at[0], s0, t, m)
        res = _tile_epilogue(op, wide, aux_refs, t, m)
        out_ref[0, pl.ds(t * m, m), :] = res
        return 0

    jax.lax.fori_loop(0, nt, body, 0)


def bigblk_call(op):
    cfg, sin, sout = op.cfg, op.sin, op.sout
    iwp = sin.iwp
    k_dim = cfg.kh * cfg.kw * cfg.icp

    def vec(nl):
        return pl.BlockSpec((1, nl), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, sin.rows * iwp, cfg.icp),
                             lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_dim, cfg.ocp), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.ocp), vec(cfg.ocp), vec(cfg.ocp),
                pl.BlockSpec((cfg.ocp, cfg.oc1x1p), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.oc1x1p), vec(cfg.oc1x1p), vec(cfg.oc1x1p)]
    import functools

    call = pl.pallas_call(
        functools.partial(_bigblk_kernel, op=op),
        out_shape=jax.ShapeDtypeStruct((N, sout.rows * iwp, cfg.oc1x1p),
                                       jnp.int8),
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, sout.rows * iwp, cfg.oc1x1p),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=env.tpu_compiler_params(("parallel",)),
        interpret=env.interpret_kernels(),
    )

    def step(x, aux):
        out = call(x, *aux)
        b = out[0, 0, 0].astype(jnp.int8) & 1
        return x.at[0, 0, 0].add(b)

    return step


# ------------------------------------------------------- copy and ghost

def _copy_kernel(src_ref, out_ref):
    out_ref[...] = src_ref[...]


def copy_call(shape_bytes_rows=None):
    """Pure copy of the flagship op's stream bytes (read + write) —
    the DMA bandwidth with no compute to fight."""
    op, src = flagship_op()
    sin = op.sin
    x = jax.device_put(pack_image(src, sin))
    tile = 2048
    n, mm, cp = x.shape
    spec = pl.BlockSpec((1, tile, cp), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        grid=(n, mm // tile),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
        interpret=env.interpret_kernels(),
    )

    def step(xx):
        out = call(xx)
        b = out[0, 0, 0].astype(jnp.int8) & 1
        return xx.at[0, 0, 0].add(b)

    nbytes = 2 * x.size      # read + write
    return step, x, nbytes


def _ghost_kernel(src_ref, ghost_hbm, *refs, op, consume):
    """The floor kernel plus a manual double-buffered DMA of the full
    per-tile window bytes from a SIDE HBM buffer. consume=True folds one
    landed vector into the output (nothing can be DCE'd); the marginal
    cost of the consumed ghost bytes is ghostc - ghost0."""
    aux_refs, out_ref, scratch, sem = refs[:8], refs[8], refs[9], refs[10]
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    m = T * iwp
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    mw = (T + cfg.kh - 1) * iwp

    def dma(slot, tt):
        return pltpu.make_async_copy(
            ghost_hbm.at[0, pl.ds(tt * m, mw), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        nxt = jax.lax.rem(t + 1, 2)
        for sl in range(2):
            @pl.when(nxt == sl)
            def _(sl=sl):
                dma(sl, t + 1).start()

    slot = jax.lax.rem(t, 2)
    for sl in range(2):
        @pl.when(slot == sl)
        def _(sl=sl):
            dma(sl, t).wait()

    # floor compute: constant input block, clip epilogue, small store
    wide = _compute_tile(op, src_ref.at[0], 0, t, m)
    (w3_ref, corr0_ref, _b0, _s0, w1_ref, corr1_ref, _b1, _s1) = aux_refs
    acc = jnp.dot(wide, w3_ref[...], preferred_element_type=jnp.int32)
    acc = acc + corr0_ref[...]
    x1 = (jnp.clip(acc, 0, 255) - 128).astype(jnp.int8)
    acc1 = jnp.dot(x1, w1_ref[...], preferred_element_type=jnp.int32)
    res = jnp.clip(acc1 + corr1_ref[...], -128, 127).astype(jnp.int8)
    if consume:
        for sl in range(2):
            @pl.when(slot == sl)
            def _(sl=sl):
                out_ref[0, 0] = (
                    res[:8 * iwp].astype(jnp.int32)
                    + scratch[sl, :8 * iwp, :].astype(jnp.int32)
                ).astype(jnp.int8)
        return
    out_ref[0, 0] = res[:8 * iwp]


def ghost_call(op, consume):
    cfg, sin, sout = op.cfg, op.sin, op.sout
    T, iwp = cfg.row_tile, sin.iwp
    nt = sout.rows // T
    mw = (T + cfg.kh - 1) * iwp
    k_dim = cfg.kh * cfg.kw * cfg.icp

    def vec(nl):
        return pl.BlockSpec((1, nl), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, (T + cfg.kh - 1) * iwp, cfg.icp),
                             lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # ghost source
                pl.BlockSpec((k_dim, cfg.ocp), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.ocp), vec(cfg.ocp), vec(cfg.ocp),
                pl.BlockSpec((cfg.ocp, cfg.oc1x1p), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(cfg.oc1x1p), vec(cfg.oc1x1p), vec(cfg.oc1x1p)]
    import functools

    call = pl.pallas_call(
        functools.partial(_ghost_kernel, op=op, consume=consume),
        out_shape=jax.ShapeDtypeStruct((N, nt, 8 * iwp, cfg.oc1x1p),
                                       jnp.int8),
        grid=(N, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 8 * iwp, cfg.oc1x1p),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, mw, cfg.icp), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=env.tpu_compiler_params(("parallel", "arbitrary")),
        interpret=env.interpret_kernels(),
    )

    def step(x, aux, ghost):
        out = call(x, ghost, *aux)
        b = out.reshape(-1)[0].astype(jnp.int8) & 1
        return x.at[0, 0, 0].add(b)

    return step


def run_consumers(variants, iters=96, row_tile=64):
    """The consumer-structure ladder (evidence/manual/mstatic/bigblk/
    nochain probes)."""
    op, src = flagship_op(row_tile=row_tile)
    x = jax.device_put(pack_image(src, op.sin))
    aux = op_aux(op)
    results = {}
    x_alt = jax.device_put(np.array(pack_image(src, op.sin)))
    for v in variants:
        extra_args = None
        if v == "prod":
            def step(c, a):
                return op(c, operands=a)
        elif v == "fresh":
            def step(c, a):
                out = op(c, operands=a)
                b = out[0, 0, 0].astype(jnp.int8) & 1
                return c.at[0, 0, 0].add(b)
        elif v == "ab2":
            # TWO buffers, both in-place-bumped (no tuple swap, so no
            # rotation copies): each iteration runs the op on A then B.
            # Per-conv time vs `fresh` isolates pure input-address
            # alternation; vs `carry` isolates the write->read-back.
            def step(c, a):
                xa, xb = c
                o1 = op(xa, operands=a)
                b1 = o1[0, 0, 0].astype(jnp.int8) & 1
                xa = xa.at[0, 0, 0].add(b1)
                o2 = op(xb, operands=a)
                b2 = o2[0, 0, 0].astype(jnp.int8) & 1
                return (xa, xb.at[0, 0, 0].add(b2))
        elif v == "alt":
            # ALTERNATING input buffers, neither written by the op: the
            # kernel reads buffer A then B then A... while its own
            # output stays dead. Distinguishes address-alternation cost
            # from true write->read-back: if alt ~= fresh the carry
            # penalty is the read-back of just-written bytes; if
            # alt ~= carry it is mere buffer cycling/locality.
            def step(c, a):
                xa, xb = c
                out = op(xa, operands=a)
                b = out[0, 0, 0].astype(jnp.int8) & 1
                return (xb.at[0, 0, 0].add(b), xa)
        elif v == "carry":
            def step(c, a):
                return op(c, operands=a)
        elif v == "bigblk":
            step = bigblk_call(op)
        elif v in ("mdma", "mdma1", "ms", "mso"):
            step = manual_call(op, v)
        elif v == "copy":
            cstep, cx, nbytes = copy_call()
            sec = timeit_chain(cstep, cx, iters, reps=5, spread_s=5)
            gbps = nbytes / sec / 1e9
            print(f"# {'copy':>9s} {sec*1e3:.3f} ms/iter -> "
                  f"{gbps:.0f} GB/s aggregate", file=sys.stderr)
            results[v] = round(gbps, 1)
            continue
        elif v in ("ghost0", "ghostc"):
            gop, _ = flagship_op(row_tile=row_tile)
            gstep = ghost_call(gop, consume=(v == "ghostc"))
            nt = gop.sout.rows // gop.cfg.row_tile
            mw = (gop.cfg.row_tile + gop.cfg.kh - 1) * gop.sin.iwp
            ghost = jax.device_put(np.random.default_rng(9).integers(
                -128, 128, (1, gop.sout.rows * gop.sin.iwp + mw,
                            gop.cfg.icp), dtype=np.int8))

            def step(c, a, gstep=gstep, ghost=ghost):
                return gstep(c, a, ghost)
        else:
            raise SystemExit(f"unknown consumer variant {v}")
        x0 = (x, x_alt) if v in ("alt", "ab2") else x
        sec = timeit_chain(step, x0, iters, reps=5, spread_s=5, aux=aux)
        if v == "ab2":
            sec /= 2                      # two convs per step
        results[v] = report(v, sec)
    print(results)
    return results
