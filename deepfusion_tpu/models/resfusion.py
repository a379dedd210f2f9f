"""ResFusionNet — ResNet-style INT8 model exercising the remaining hot
paths FusionNet does not touch: the strided-conv Pallas kernel (s2d
lowering), the conv eltwise-sum post-op (residual fused into the requant
epilogue), and the single-kernel fused conv+relu+maxpool downsampler.

The reference ships no models; its VGG/ResNet layer shapes
(test/test_conv_relu_pooling.cc:313-391) and roadmap fusions
(README.md:64-65) are the spec for this composition. Together with
FusionNet, every public op family runs inside a model forward.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from ..config import PoolConfig
from ..ops.convpool import ConvPoolOp, pool2_fusable
from ..ops.pool import pool
from .fusionnet import _mkconv


@dataclasses.dataclass
class ResFusionNetConfig:
    batch: int = 8
    hw: int = 64          # input resolution (even; stem halves it)
    in_ch: int = 32
    width: int = 128
    num_classes: int = 128
    seed: int = 1


class ResFusionNet:
    """INT8 CNN: strided stem -> residual fused block (sum post-op) ->
    fused conv+relu+maxpool downsample -> fused block -> global avg pool
    -> f32 head."""

    def __init__(self, cfg: ResFusionNetConfig = ResFusionNetConfig()):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        n, hw, c, w = cfg.batch, cfg.hw, cfg.in_ch, cfg.width

        # stem: conv3x3 stride 2 (s2d-lowered Pallas kernel), u8 out
        p_stem, s = _mkconv(rng, n, hw, hw, c, w, 3, 1, 2, "u8",
                            in_std=74.0)
        self.stem = p_stem.dense()

        # residual block: fused conv3x3+relu+conv1x1 whose epilogue adds
        # the block input via the sum post-op (the reference's roadmap
        # conv+sum+relu chain, fused into one kernel)
        hw1 = s[1]
        p_blk, _ = _mkconv(rng, n, hw1, hw1, w, w, 3, 1, 1, "u8", oc1x1=w)
        p_blk = dataclasses.replace(
            p_blk, cfg=dataclasses.replace(p_blk.cfg, with_sum=True,
                                           sum_scale=1.0,
                                           sum_dt=p_blk.cfg.dst_dt))
        self.block1 = p_blk.dense()

        # downsample: single-kernel fused conv3x3+relu+maxpool2x2/s2
        p_dn, _ = _mkconv(rng, n, hw1, hw1, w, w, 3, 1, 1, "u8")
        pc = PoolConfig.make("max", (hw1, hw1), (2, 2), (2, 2), (0, 0))
        assert pool2_fusable(p_dn.cfg, pc)
        self.down = ConvPoolOp(p_dn.cfg, pc, p_dn.wei, p_dn.bia)

        # stage 2: fused block (w -> w -> w)
        hw2 = hw1 // 2
        p_blk2, _ = _mkconv(rng, n, hw2, hw2, w, w, 3, 1, 1, "u8", oc1x1=w)
        self.block2 = p_blk2.dense()

        # head: global avg pool (exclude pad) then 1x1 conv to f32 logits
        p_head, _ = _mkconv(rng, n, 1, 1, w, cfg.num_classes, 1, 0, 1,
                            "f32", relu=False)
        self.head = p_head.dense()
        # raw weights kept for differential testing (oracle composition)
        self.params = dict(stem=p_stem, block1=p_blk, down=p_dn,
                           block2=p_blk2, head=p_head)
        self._in_shape = (n, hw, hw, c)

    @property
    def input_shape(self):
        return self._in_shape

    def example_input(self, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng(7)
        return rng.integers(0, 256, self._in_shape, dtype=np.uint8)

    def __call__(self, x_u8):
        x = self.stem(x_u8)                       # strided Pallas conv
        y = self.block1(x, sum_src=x)             # residual via sum post-op
        y = self.down(y)                          # one-kernel conv+pool
        y = self.block2(y)
        y = pool(y, "avg_exc", (y.shape[1], y.shape[2]),
                 (y.shape[1], y.shape[2]), (0, 0))
        logits = self.head(y)
        return logits.reshape(logits.shape[0], -1)

    def jit(self):
        return jax.jit(self.__call__)
