"""Concat(+ReLU) differential tests vs the numpy oracle.

Mirrors the reference's parameterized case table
(test/test_concat.cc:122-153): 7 basic shape sets x 4 dtypes x relu on/off,
plus the 4x/8x-channel cases allowed only for f32/s32. Comparison is
bit-exact for int dtypes, 1e-4 relative for f32 (test/test_utils.h:73-85).
"""
import numpy as np
import pytest

from deepfusion_tpu.config import ConcatConfig
from deepfusion_tpu.ops.concat import concat
from deepfusion_tpu.ops.ref import concat_relu_ref
from deepfusion_tpu.utils.logger import CheckError

from helpers import compare, fill_data

# reference case table, dims given as NCHW (converted to NHWC here)
BASIC_CASES = [
    ([(2, 64, 1, 1), (2, 96, 1, 1)], (2, 160, 1, 1)),
    ([(2, 64, 4, 4), (2, 32, 4, 4)], (2, 96, 4, 4)),
    ([(2, 16, 8, 8), (2, 32, 8, 8)], (2, 48, 8, 8)),
    ([(2, 32, 9, 9), (2, 96, 9, 9)], (2, 128, 9, 9)),
    ([(2, 16, 3, 3), (2, 32, 3, 3), (2, 64, 3, 3)], (2, 112, 3, 3)),
    ([(2, 256, 16, 16), (2, 256, 16, 16)], (2, 512, 16, 16)),
    ([(4, 128, 14, 14), (4, 256, 14, 14)], (4, 384, 14, 14)),
]
SMALL_BLOCK_CASES = [  # f32/s32 only (4x/8x channels)
    ([(2, 4, 4, 4), (2, 8, 4, 4)], (2, 12, 4, 4)),
    ([(2, 16, 4, 4), (2, 8, 4, 4)], (2, 24, 4, 4)),
]


def nchw_to_nhwc_shape(s):
    n, c, h, w = s
    return (n, h, w, c)


@pytest.mark.parametrize("dt", ["f32", "s32", "s8", "u8"])
@pytest.mark.parametrize("case", BASIC_CASES)
@pytest.mark.parametrize("relu", [False, True])
def test_concat_basic(case, dt, relu, rng):
    src_shapes, dst_shape = case
    srcs = [fill_data(nchw_to_nhwc_shape(s), dt, rng) for s in src_shapes]
    out = concat(srcs, post_relu=relu)
    ref = concat_relu_ref(srcs, relu)
    assert out.shape == nchw_to_nhwc_shape(dst_shape)
    compare(out, ref, f"concat {dt} relu={relu}")


@pytest.mark.parametrize("dt", ["f32", "s32"])
@pytest.mark.parametrize("case", SMALL_BLOCK_CASES)
@pytest.mark.parametrize("relu", [False, True])
def test_concat_small_blocks(case, dt, relu, rng):
    src_shapes, _ = case
    srcs = [fill_data(nchw_to_nhwc_shape(s), dt, rng) for s in src_shapes]
    compare(concat(srcs, post_relu=relu),
            concat_relu_ref(srcs, relu), f"concat {dt}")


def test_concat_rejects_illegal_channels():
    # s8/u8 need 16-divisible channels (src/jit_concat_kernel.cc:155-196)
    with pytest.raises(CheckError):
        ConcatConfig.make([(2, 4, 4, 4), (2, 4, 4, 8)], "s8", False)


def test_concat_rejects_mismatched_spatial():
    with pytest.raises(CheckError):
        ConcatConfig.make([(2, 4, 4, 16), (2, 5, 4, 16)], "s8", False)


def test_concat_rejects_mixed_dtype(rng):
    a = fill_data((2, 4, 4, 16), "s8", rng)
    b = fill_data((2, 4, 4, 16), "u8", rng)
    with pytest.raises(ValueError):
        concat([a, b])


def test_concat_relu_negative_values(rng):
    # values beyond the reference's tested range: our true-ReLU contract
    a = (rng.integers(-120, 120, (2, 3, 3, 16))).astype(np.int8)
    b = (rng.integers(-(2 ** 20), 2 ** 20, (2, 3, 3, 16))).astype(np.int32)
    compare(concat([a], post_relu=True), np.maximum(a, 0), "s8 wide relu")
    compare(concat([b], post_relu=True), np.maximum(b, 0), "s32 wide relu")
