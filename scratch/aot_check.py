"""Chipless Mosaic compile check of the PROBE kernel variants.

Compiles every probe kernel against a v5e TPU topology from a CPU-only
process — Mosaic errors (scoped-VMEM OOM, alignment) surface with full
text in seconds, where the tunneled remote-compile helper hides them
behind an HTTP 500 (verify skill, "chipless Mosaic compile checks").

Runs entirely WITHOUT the tunnel: safe to run while a bench holds the
chip.  python scratch/aot_check.py
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

    from probe_common import ablate_call, bigblk_call, flagship_op, \
        manual_call, op_aux

    op, src = flagship_op(row_tile=64)
    x = jax.ShapeDtypeStruct(op.sin.array_shape(8), np.int8)
    aux_rt = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                   for a in op_aux(op, device=False))

    for variant in ("prod", "noroll", "clip", "in1", "outsmall", "slim",
                    "floor"):
        if variant == "prod":
            def fn(c, a):
                return op(c, operands=a)
        else:
            fn = ablate_call(op, variant)
        jax.jit(fn, in_shardings=(shard, tuple(shard for _ in aux_rt)),
                ).lower(x, aux_rt).compile()
        print(f"aot OK: ablate/{variant}")

    for mode in ("mdma", "mdma1", "ms", "mso"):
        fn = manual_call(op, mode)
        jax.jit(fn, in_shardings=(shard, tuple(shard for _ in aux_rt)),
                ).lower(x, aux_rt).compile()
        print(f"aot OK: manual/{mode}")

    fn = bigblk_call(op)
    jax.jit(fn, in_shardings=(shard, tuple(shard for _ in aux_rt)),
            ).lower(x, aux_rt).compile()
    print("aot OK: bigblk")

    from probe_common import ghost_call

    mw = (op.cfg.row_tile + op.cfg.kh - 1) * op.sin.iwp
    ghost = jax.ShapeDtypeStruct(
        (1, op.sout.rows * op.sin.iwp + mw, op.cfg.icp), np.int8)
    for consume in (False, True):
        fn = ghost_call(op, consume)
        jax.jit(fn, in_shardings=(shard, tuple(shard for _ in aux_rt),
                                  shard)).lower(x, aux_rt,
                                                ghost).compile()
        print(f"aot OK: ghost consume={consume}")

    print("ALL PROBE KERNELS COMPILE")


if __name__ == "__main__":
    main()
