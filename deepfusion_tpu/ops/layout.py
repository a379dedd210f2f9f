"""Layout transforms: TPU weight packing and activation prep.

Reference parity: the ``OIhw4i16o4i`` weight pre-pack that lets x86 load
4 input channels x 16 output channels as one zmm for ``vpdpbusd``
(``src/jit_conv_kernel.cc:512-564``). The TPU MXU wants a plain 2-D int8
matmul operand, so the pack here is: OIHW -> (KH*KW*ICP, OCP) with channels
zero-padded to hardware-friendly multiples.

u8 activation handling: the MXU int8 path is s8 x s8, so u8 activations are
shifted to s8 (x - 128) and the exact correction term
``128 * sum_{taps,ic} w`` is folded in as a per-oc int32 vector:

    conv_u8s8(x, w) = conv_s8s8(pad(x) - 128, w) + 128 * colsum(w)

This identity is exact in int32 *because the shifted padding value (-128)
participates in every tap*: the per-pixel difference is always
``128 * sum over ALL taps`` regardless of how many taps fall inside the
image. The same trick feeds the fused 1x1 stage its u8 intermediate.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import ConvConfig
from ..types import dtype


def pack_conv_weights(wei_oihw: np.ndarray, icp: int, ocp: int) -> np.ndarray:
    """OIHW s8 -> (KW*KH*ICP, OCP) s8, zero-padded channels.

    The row order is (kw, kh, ic): the Pallas kernel builds its im2col
    patch by lane-concatenating the KH row-aligned blocks (rows ordered
    (kh, ic)) and runs one K=KH*ICP matmul per kw tap, so each kw tap's
    weight sub-matrix w3[kj*KH*ICP:(kj+1)*KH*ICP] must hold (kh, ic) rows.
    """
    w = np.asarray(wei_oihw)
    oc, ic, kh, kw = w.shape
    out = np.zeros((kw, kh, icp, ocp), dtype=np.int8)
    # (oc,ic,kh,kw) -> (kw,kh,ic,oc)
    out[:, :, :ic, :oc] = np.transpose(w, (3, 2, 1, 0))
    return out.reshape(kw * kh * icp, ocp)


def pack_1x1_weights(wei_oihw: np.ndarray, icp: int, ocp: int) -> np.ndarray:
    """(OC1,IC,1,1) s8 -> (ICP, OCP) s8 for the fused 1x1 matmul."""
    w = np.asarray(wei_oihw)
    oc1, ic = w.shape[0], w.shape[1]
    out = np.zeros((icp, ocp), dtype=np.int8)
    out[:ic, :oc1] = w.reshape(oc1, ic).T
    return out


def u8_shift_correction(packed_wei: np.ndarray) -> np.ndarray:
    """Per-output-channel exact correction: 128 * column-sum of the packed
    weight matrix, int32. Add to the s8-matmul accumulator to recover the
    u8-activation accumulator."""
    return 128 * packed_wei.astype(np.int32).sum(axis=0)


def widen_bias(bias, bia_dt, ocp: int) -> np.ndarray:
    """Bias widened to f32 and zero-padded to ocp.

    Reference widens u8/s8/s32 bias to f32 in-kernel
    (``src/jit_conv_kernel.cc:238-254``); doing it at pack time is
    numerically identical (all int bias values are exactly representable).
    """
    out = np.zeros((ocp,), dtype=np.float32)
    if bias is not None:
        b = np.asarray(bias).reshape(-1).astype(np.float32)
        out[:b.size] = b
    return out


def widen_scales(scales, oc: int, ocp: int) -> np.ndarray:
    """Scales broadcast to per-channel f32, padded to ocp (pad value 1.0).

    In-kernel the x86 code indexes the scale vector per 16-channel block
    (``src/jit_conv_kernel.cc:232-233``); a dense per-lane vector is the TPU
    equivalent and is bit-identical under f32 multiply.
    """
    sc = np.asarray(scales, dtype=np.float32).reshape(-1)
    out = np.ones((ocp,), dtype=np.float32)
    out[:oc] = sc if sc.size > 1 else np.full((oc,), sc[0], np.float32)
    return out


def prep_src(cfg: ConvConfig, src_u8, xp=np):
    """Activation prep: NHWC u8 -> spatially padded, channel-padded,
    shifted-to-s8 tensor of shape (N, IHP, IWP8, ICP), where IWP8 rounds
    the padded width up to a multiple of 8 so the Pallas kernel's flat
    row offsets are provably sublane-aligned.

    Works with numpy (host) or jax.numpy (traced, fuses into the kernel's
    producer). Channel-pad and width-pad slots hold -128 after the shift,
    matching the spatial padding, so the single constant correction term
    stays exact (their weights are zero) and the extra columns only feed
    discarded out-of-row outputs.
    """
    from ..utils.mathutil import round_up

    src = xp.asarray(src_u8)
    n, ih, iw, ic = src.shape
    iwp8 = round_up(iw + 2 * cfg.pw, 8)
    pad = ((0, 0), (cfg.ph, cfg.ph),
           (cfg.pw, iwp8 - iw - cfg.pw), (0, cfg.icp - ic))
    padded = xp.pad(src, pad)  # zero-pad in u8 domain
    return (padded.astype(xp.int16) - 128).astype(xp.int8)


def pack_all(cfg: ConvConfig, wei, bias=None, wei1x1=None, bias1x1=None
             ) -> dict:
    """One-stop host-side pack for a ConvConfig. Returns the kernel operand
    dict: packed weights, int32 corrections (bias-folded), f32 bias/scales."""
    w3 = pack_conv_weights(np.asarray(wei, dtype=np.int8), cfg.icp, cfg.ocp)
    out = {
        "w3": w3,
        "corr0": u8_shift_correction(w3),
        "bias0": widen_bias(bias, cfg.bia_dt, cfg.ocp),
        "scale0": widen_scales(cfg.conv0_scales, cfg.oc, cfg.ocp),
    }
    if cfg.fuse_conv1x1:
        w1 = pack_1x1_weights(np.asarray(wei1x1, dtype=np.int8),
                              cfg.ocp, cfg.oc1x1p)
        out.update({
            "w1": w1,
            "corr1": u8_shift_correction(w1),
            "bias1": widen_bias(bias1x1, cfg.bia1x1_dt, cfg.oc1x1p),
            "scale1": widen_scales(cfg.conv1_scales, cfg.oc1x1, cfg.oc1x1p),
        })
    return out
