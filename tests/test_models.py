"""FusionNet model smoke + determinism tests (CPU interpret mode)."""
import numpy as np
import pytest

from deepfusion_tpu.models import FusionNet, FusionNetConfig


@pytest.fixture(scope="module")
def small_net():
    return FusionNet(FusionNetConfig(batch=1, hw=8, in_ch=16, width=32,
                                     num_classes=16))


def test_forward_shape(small_net):
    x = small_net.example_input()
    out = np.asarray(small_net(x))
    assert out.shape == (1, 16)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_deterministic(small_net):
    x = small_net.example_input()
    a = np.asarray(small_net(x))
    b = np.asarray(small_net(x))
    assert np.array_equal(a, b)


def test_input_sensitivity(small_net):
    rng = np.random.default_rng(0)
    a = np.asarray(small_net(small_net.example_input(rng)))
    b = np.asarray(small_net(small_net.example_input(rng)))
    assert not np.array_equal(a, b)


def test_packed_path_bit_identical():
    """The layout-persistent forward (packed_call) must produce bitwise the
    same logits as the dense op-by-op path."""
    from deepfusion_tpu.models import FusionNet, FusionNetConfig
    net = FusionNet(FusionNetConfig(batch=2, hw=24, in_ch=32, width=64,
                                    num_classes=32))
    x = net.example_input()
    dense = np.asarray(net(x))
    packed = np.asarray(net.jit_packed()(x))
    np.testing.assert_array_equal(dense, packed)
