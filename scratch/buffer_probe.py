"""Pallas pipeline-buffering ladder on the single fused op (round 5).

pl.Buffered lets a block spec use more than the default two buffers
and/or lookahead prefetch. The input block is the whole packed image
(constant across a batch element's tiles — lookahead could prefetch the
NEXT image during the current one); the output blocks advance every
tile (more buffers could decouple the store from the next tile's
compute). Untried before this probe.

Run IN BACKGROUND with NO timeout:  python scratch/buffer_probe.py

OUTCOME (round 5): the lever is DEAD on this toolchain — Mosaic's
pipeline emitter supports only single/double buffering ("Only single
(1) and double (2) buffering are supported") and rejects lookahead
("Lookahead is not supported for XLA pipeline emitter lowering"), so
the default double-buffered pipeline is the only configuration.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import numpy as np

import jax
import jax.numpy as jnp

from probe_common import flagship_op, op_aux, pack_image, report, \
    timeit_chain
from deepfusion_tpu.ops.packed import _packed_call


def main():
    op, src = flagship_op(row_tile=64)
    x = jax.device_put(pack_image(src, op.sin))
    aux = op_aux(op)
    results = {}
    # Mosaic supports only single/double buffering ("Got 3." lowering
    # error), so the ladder reduces to the lookahead bit on the default
    # two input buffers
    for name, pipe in (("default", None),
                       ("inLA", (2, 1, 0))):
        def step(c, a, pipe=pipe):
            out = _packed_call(op.cfg, op.sins, op.sout, (c,), *a,
                               pipeline=pipe)
            b = out[0, 0, 0].astype(jnp.int8) & 1
            return c.at[0, 0, 0].add(b)

        sec = timeit_chain(step, x, 96, reps=5, spread_s=5, aux=aux)
        results[name] = report(name, sec)
    print(results)


if __name__ == "__main__":
    main()
