"""Continuous-batching server tests (host-side, model on CPU interpret)."""
import numpy as np
import pytest

from deepfusion_tpu.serving import BatchServer
from deepfusion_tpu.utils.logger import CheckError


def double_model(x):
    return x.astype(np.int32) * 2


def test_batches_and_preserves_order():
    srv = BatchServer(double_model, batch=4, input_shape=(3, 3, 8),
                      max_delay_ms=5.0)
    with srv:
        xs = [np.full((3, 3, 8), i, np.uint8) for i in range(10)]
        futs = srv.submit_many(xs)
        outs = [f.result(timeout=10) for f in futs]
    for i, o in enumerate(outs):
        assert (o == 2 * i).all()
    assert srv.stats["requests"] == 10
    assert srv.stats["flushes"] >= 3  # 10 reqs / batch 4


def test_partial_flush_pads():
    srv = BatchServer(double_model, batch=8, input_shape=(2, 2, 4),
                      max_delay_ms=1.0)
    with srv:
        f = srv.submit(np.ones((2, 2, 4), np.uint8))
        out = f.result(timeout=10)
    assert (out == 2).all()
    assert srv.stats["padded_rows"] >= 7


def test_error_propagates():
    def boom(x):
        raise RuntimeError("kaput")

    srv = BatchServer(boom, batch=2, input_shape=(1,), max_delay_ms=1.0)
    with srv:
        f = srv.submit(np.zeros((1,), np.uint8))
        with pytest.raises(RuntimeError):
            f.result(timeout=10)


def test_rejects_bad_shape():
    srv = BatchServer(double_model, batch=2, input_shape=(2, 2, 4))
    with pytest.raises(CheckError):
        srv.submit(np.zeros((3, 3, 4), np.uint8))


def test_with_fusionnet():
    from deepfusion_tpu.models import FusionNet, FusionNetConfig
    net = FusionNet(FusionNetConfig(batch=4, hw=8, in_ch=16, width=32,
                                    num_classes=16))
    fwd = net.jit()
    srv = BatchServer(lambda xs: fwd(xs), batch=4, input_shape=(8, 8, 16))
    with srv:
        xs = [net.example_input()[0] for _ in range(6)]
        outs = [f.result(timeout=60)
                for f in srv.submit_many(xs)]
    assert all(o.shape == (16,) for o in outs)
    # identical inputs -> identical logits regardless of batch slot
    assert np.array_equal(outs[0], outs[5])


def test_multi_replica_balance211_split():
    """A burst splits near-equally across replicas via balance211, every
    result lands on the right future, and both replicas do real work."""
    calls = {0: 0, 1: 0}

    def replica(r):
        def fn(xs):
            calls[r] += 1
            return xs.astype(np.int32) * 2
        return fn

    srv = BatchServer([replica(0), replica(1)], batch=2, input_shape=(3,),
                      max_delay_ms=1.0)
    assert srv.n_replicas == 2
    with srv:
        xs = [np.full((3,), i, np.uint8) for i in range(10)]
        outs = [f.result(timeout=30) for f in srv.submit_many(xs)]
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, np.full((3,), 2 * i, np.int32))
    # balance211 over 10 requests / 2 replicas -> 5 + 5
    assert srv.stats["per_replica"] == [5, 5]
    assert calls[0] > 0 and calls[1] > 0


def test_single_submit_picks_least_loaded():
    srv = BatchServer([lambda x: x, lambda x: x], batch=4,
                      input_shape=(2,), max_delay_ms=1.0)
    # before start, submits spread across the two idle queues round-robin
    # by queue depth
    f1 = srv.submit(np.zeros((2,), np.uint8))
    f2 = srv.submit(np.zeros((2,), np.uint8))
    assert srv.stats["per_replica"] == [1, 1]
    with srv:
        assert f1.result(timeout=30).shape == (2,)
        assert f2.result(timeout=30).shape == (2,)


def test_server_over_sharded_model():
    """The batcher composes with the parallel layer: replicas are
    dp-sharded model callables over the device mesh — the serving story
    for a multi-chip host (continuous batching on host 0, shard_map
    under each flush)."""
    import jax

    from deepfusion_tpu.models import FusionNet, FusionNetConfig
    from deepfusion_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs 2 devices")
    # the model is built at the PER-SHARD batch (the bench_scaling
    # composition); the server flushes global batches of 2
    net = FusionNet(FusionNetConfig(batch=1, hw=28, in_ch=32, width=64,
                                    num_classes=16))
    mesh = make_mesh(dp=2)
    fwd = jax.jit(jax.shard_map(net.__call__, mesh=mesh,
                                in_specs=P("dp", None, None, None),
                                out_specs=P("dp", None),
                                check_vma=False))
    x0, x1 = (net.example_input(np.random.default_rng(i))[0]
              for i in range(2))
    want = np.stack([np.asarray(net(x[None]))[0] for x in (x0, x1)])
    from deepfusion_tpu.serving import BatchServer
    with BatchServer(fwd, batch=2,
                     input_shape=net.input_shape[1:]) as server:
        futs = [server.submit(x) for x in (x0, x1)]
        outs = [np.asarray(f.result()) for f in futs]
    np.testing.assert_array_equal(np.stack(outs), want)
