"""Native C++ runtime vs numpy-fallback equivalence tests."""
import numpy as np
import pytest

from deepfusion_tpu.native import runtime as rt
from deepfusion_tpu.ops import layout
from deepfusion_tpu.utils.mathutil import balance211 as py_balance211


@pytest.fixture(scope="module")
def native():
    if not rt.native_available():
        pytest.skip("native runtime not built")
    return rt


def test_pack_conv_weights_matches(native, rng):
    wei = rng.integers(-128, 128, (32, 16, 3, 3)).astype(np.int8)
    a = native.pack_conv_weights(wei, 32, 128)
    b = layout.pack_conv_weights(wei, 32, 128)
    assert np.array_equal(a, b)


def test_pack_1x1_matches(native, rng):
    wei = rng.integers(-128, 128, (48, 32, 1, 1)).astype(np.int8)
    a = native.pack_1x1_weights(wei, 64, 128)
    b = layout.pack_1x1_weights(wei, 64, 128)
    assert np.array_equal(a, b)


def test_correction_matches(native, rng):
    packed = rng.integers(-128, 128, (288, 128)).astype(np.int8)
    a = native.u8_shift_correction(packed)
    b = layout.u8_shift_correction(packed)
    assert np.array_equal(a, b)


def test_prep_src_matches(native, rng):
    from deepfusion_tpu.config import ConvConfig
    src = rng.integers(0, 256, (2, 9, 11, 16), dtype=np.uint8)
    cfg = ConvConfig.make((2, 9, 11, 16), (32, 16, 3, 3), None, (1, 1),
                          (1, 1), (2, 9, 11, 32), "u8")
    a = native.prep_src(src, cfg.ph, cfg.pw, cfg.icp)
    b = np.asarray(layout.prep_src(cfg, src, xp=np))
    assert np.array_equal(a, b)


def test_balance211_matches(native):
    for amount in (0, 1, 7, 100, 101):
        for team in (1, 3, 8):
            for m in range(team):
                assert native.balance211(amount, team, m) == \
                    py_balance211(amount, team, m)


def test_pack_image_matches(native, rng):
    from deepfusion_tpu.native import runtime
    from deepfusion_tpu.ops.packed import PackedSpec, pack_image
    src = rng.integers(0, 256, (2, 9, 11, 5), dtype=np.uint8)
    spec = PackedSpec.make(9, 11, 5, halo=2, col_off=3)
    got = runtime.pack_image(src, spec)
    np.testing.assert_array_equal(got, pack_image(src, spec))


def test_s2d_regroup_matches(native, rng):
    from deepfusion_tpu.native import runtime
    from deepfusion_tpu.ops.layout import _s2d_regroup
    sh, sw, ic, ih2, iw2 = 2, 3, 5, 4, 6
    x = rng.integers(0, 256, (2, ih2 * sh, iw2 * sw, ic), dtype=np.uint8)
    got = runtime.s2d_regroup(x, ih2, iw2, sh, sw, ic)
    np.testing.assert_array_equal(got, _s2d_regroup(x, ih2, iw2, sh, sw,
                                                    ic, np))
