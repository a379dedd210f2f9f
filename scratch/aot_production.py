"""Chipless Mosaic compile check of the PRODUCTION kernels.

Compiles the packed single op, the two-layer megakernel (incl. the
round-5 schedule knobs), the dense conv, and the pool2 epilogue against
a v5e topology from a CPU-only process (see scratch/aot_check.py).

  python scratch/aot_production.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def main():
    import jax.experimental.topologies as topo_mod

    topo = topo_mod.get_topology_desc(platform="tpu",
                                      topology_name="v5e:2x2x1")
    dev = np.array(topo.devices[:1])
    shard = jax.NamedSharding(Mesh(dev, ("x",)), P())

    from deepfusion_tpu.config import ConvConfig
    from deepfusion_tpu.ops.mega import PackedConvPairOp
    from deepfusion_tpu.ops.packed import PackedConvOp, PackedSpec

    n, hw, c = 8, 126, 256
    rng = np.random.default_rng(0)

    def mk_w():
        return (rng.integers(-127, 128, (c, c, 3, 3)).astype(np.int8),
                rng.integers(-100, 101, (c,)).astype(np.int32),
                rng.integers(-127, 128, (c, c, 1, 1)).astype(np.int8),
                rng.integers(-100, 101, (c,)).astype(np.int32))

    cfg = ConvConfig.make(
        (n, hw, hw, c), (c, c, 3, 3), np.int32, (1, 1), (1, 1),
        (n, hw, hw, c), "u8", conv0_scales=(0.001,),
        wei1x1_shape=(c, c, 1, 1), bia1x1_dt=np.int32,
        conv1_relu=True, conv1_scales=(0.05,))

    def compile_op(name, op, sin):
        x = jax.ShapeDtypeStruct(sin.array_shape(n), np.int8)
        aux = tuple(jax.ShapeDtypeStruct(
            np.asarray(a).shape, np.asarray(a).dtype)
            for a in op._operands)

        def fn(xx, a):
            return op(xx, operands=a)

        jax.jit(fn, in_shardings=(shard, tuple(shard for _ in aux)),
                ).lower(x, aux).compile()
        print(f"aot OK: {name}")

    w = mk_w()
    single = PackedConvOp(cfg, *w)
    compile_op("packed single fused op", single, single.sin)

    pair = PackedConvPairOp(cfg, w, cfg, mk_w())
    compile_op("megakernel pair (equal halo)", pair, pair.sin)

    sin = PackedSpec.make(hw, hw, c, halo=3, col_off=1)
    for kw, name in ((dict(), "erosion pair"),
                     (dict(msplit=2), "erosion pair msplit=2"),
                     (dict(grid_order="tb"), "erosion pair tb"),
                     (dict(reuse_mid=True), "erosion pair reuse_mid")):
        p = PackedConvPairOp(cfg, w, cfg, mk_w(), sin=sin, halo_out=1,
                             col_off_out=1, **kw)
        compile_op(name, p, p.sin)

    print("ALL PRODUCTION KERNELS COMPILE")





def sharded():
    """AOT-compile the SHARDED programs against a real v5e multi-chip
    topology (the CPU-mesh tests lower collectives through a different
    backend; this proves the Mosaic + ICI-collective programs compile
    for actual TPU targets). python scratch/aot_production.py --sharded
    """
    import jax.experimental.topologies as topo_mod
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topo_mod.get_topology_desc(platform="tpu",
                                      topology_name="v5e:2x2x1")
    import numpy as np

    from deepfusion_tpu.config import ConvConfig
    from deepfusion_tpu.ops.packed import PackedConvOp, PackedSpec
    from deepfusion_tpu.parallel.shard import (sp_packed, tp_fused_conv,
                                               tp_packed_fused)

    rng = np.random.default_rng(0)
    n, hw, c = 4, 32, 256
    wei = rng.integers(-10, 11, (c, c, 3, 3)).astype(np.int8)
    bia = rng.integers(-10, 11, (c,)).astype(np.int32)
    wei1 = rng.integers(-10, 11, (c, c, 1, 1)).astype(np.int8)
    bia1 = rng.integers(-10, 11, (c,)).astype(np.int32)
    cfg = ConvConfig.make(
        (n, hw, hw, c), (c, c, 3, 3), bia.dtype, (1, 1), (1, 1),
        (n, hw, hw, c), "u8", conv0_scales=(0.001,),
        wei1x1_shape=(c, c, 1, 1), bia1x1_dt=bia1.dtype,
        conv1_relu=True, conv1_scales=(0.05,))

    mesh_tp = Mesh(np.array(topo.devices).reshape(-1)[:4].reshape(4),
                   ("tp",))
    pop = PackedConvOp(cfg, wei, bia, wei1, bia1)
    fn = tp_packed_fused(pop, mesh_tp)
    x = jax.ShapeDtypeStruct(pop.sin.array_shape(n), np.int8)
    jax.jit(fn).lower(x).compile()
    print("aot OK: tp_packed_fused over v5e 4-chip mesh")

    fn2 = tp_fused_conv(cfg, wei, bia, wei1, bia1, mesh_tp)
    xs = jax.ShapeDtypeStruct((n, hw, hw, c), np.uint8)
    jax.jit(fn2).lower(xs).compile()
    print("aot OK: tp_fused_conv over v5e 4-chip mesh")

    mesh_sp = Mesh(np.array(topo.devices).reshape(-1)[:4].reshape(4),
                   ("sp",))
    fn3 = sp_packed(pop, mesh_sp)
    xsp = jax.ShapeDtypeStruct(
        (n, 4 * fn3.local_spec.rows * fn3.local_spec.iwp,
         fn3.local_spec.cp), np.int8)
    jax.jit(lambda a: fn3(a)).lower(xsp).compile()
    print("aot OK: sp_packed over v5e 4-chip mesh")

    print("ALL SHARDED PROGRAMS COMPILE FOR v5e TOPOLOGY")


if __name__ == "__main__":
    import sys as _sys
    if "--sharded" in _sys.argv:
        sharded()
    else:
        main()
