"""Utils unit tests (reference: test/test_misc.cc, test/test_log.cc)."""
import numpy as np
import pytest

from deepfusion_tpu.utils import logger, mathutil
from deepfusion_tpu.types import dtype, format, memory, nchw2format, round_mode


def test_dividable_of():
    # reference: test/test_misc.cc:24-34
    assert mathutil.dividable_of(16, 16, 8, 4) == 16
    assert mathutil.dividable_of(8, 16, 8, 4) == 8
    assert mathutil.dividable_of(12, 16, 8, 4) == 4
    assert mathutil.dividable_of(7, 16, 8, 4) == 1


def test_find_dividable():
    assert mathutil.find_dividable(32, 16) == 16
    assert mathutil.find_dividable(33, 16) == 11
    assert mathutil.find_dividable(7, 16) == 7
    assert mathutil.find_dividable(13, 7) == 1


def test_conv_output_size():
    # reference formula util/math_func.cc:22-24
    assert mathutil.conv_output_size(13, 3, 1, 0) == 11
    assert mathutil.conv_output_size(13, 3, 1, 1) == 13
    assert mathutil.conv_output_size(224, 7, 2, 3) == 112
    assert mathutil.pool_output_size(224, 2, 2, 0) == 112
    assert mathutil.pool_output_size(7, 7, 7, 0) == 1


def test_balance211_covers_all():
    # reference: util/deepfusion_utils.h:190-208
    for amount in (1, 7, 28, 100, 101):
        for team in (1, 3, 7, 28):
            spans = [mathutil.balance211(amount, team, m) for m in range(team)]
            total = sum(e - s for s, e in spans)
            assert total == amount
            # contiguous, ordered, sizes differ by at most 1
            sizes = [e - s for s, e in spans if e > s]
            if sizes:
                assert max(sizes) - min(sizes) <= 1
            flat = []
            for s, e in spans:
                flat.extend(range(s, e))
            assert flat == list(range(amount))


def test_nd_iterator():
    # reference: util/deepfusion_utils.h:210-255
    dims = (2, 3, 4)
    seen = list(mathutil.nd_range(0, 24, dims))
    expect = [(i, j, k) for i in range(2) for j in range(3) for k in range(4)]
    assert seen == expect
    # partial range
    assert list(mathutil.nd_range(5, 8, dims)) == expect[5:8]


def test_check_macros_raise():
    # reference fail-fast contract util/log.h:50-65
    with pytest.raises(logger.CheckError):
        logger.check(False)
    with pytest.raises(logger.CheckError):
        logger.check_eq(1, 2)
    logger.check_eq(3, 3)
    logger.check_lt(1, 2)
    with pytest.raises(logger.CheckError):
        logger.error_and_exit("boom %d", 3)


def test_memory_container():
    # nchw dims permute to physical nhwc (src/deepfusion.cc:25-57)
    m = memory([2, 64, 4, 5], format.nhwc, dtype.u8)
    assert m.actual_dims() == [2, 4, 5, 64]
    assert m.std_dims() == [2, 64, 4, 5]
    assert m.size() == 2 * 64 * 4 * 5
    assert m.buffer_size() == m.size()
    m32 = memory([2, 64, 4, 5], format.nhwc, dtype.s32)
    assert m32.buffer_size() == m32.size() * 4
    # raw dims path
    x = memory([16], format.x, dtype.f32)
    assert x.actual_dims() == [16]
    m.fill_random(np.random.default_rng(0))
    assert m.numpy().shape == (2, 4, 5, 64)


def test_dtype_roundtrip():
    assert dtype.from_any("u8") == dtype.u8
    assert dtype.from_any(np.int8) == dtype.s8
    assert dtype.from_any(np.dtype(np.float32)) == dtype.f32
    assert dtype.u8.size == 1 and dtype.s32.size == 4
    assert round_mode.from_any("nearest") == round_mode.nearest
    with pytest.raises(ValueError):
        dtype.from_any("f16")


def test_nchw2format():
    assert nchw2format([1, 2, 3, 4], format.nchw) == [1, 2, 3, 4]
    assert nchw2format([1, 2, 3, 4], format.nhwc) == [1, 3, 4, 2]
