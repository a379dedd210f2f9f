"""Row-tile ladder of the production single fused op (fresh-protocol
chain). The tile picker's 24 MB wide-patch budget encodes this ladder's
cliff (ops/packed.py _pick_row_tile).

Run IN BACKGROUND with NO timeout:
    python scratch/tile_probe.py [--tiles 16,32,64,128]
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from probe_common import flagship_op, pack_image, report, timeit_chain

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="16,32,64,128")
    ap.add_argument("--iters", type=int, default=96)
    ap.add_argument("--erode", action="store_true",
                    help="roll-free erosion geometry (halo 2 -> 1)")
    ap.add_argument("--terminal", action="store_true",
                    help="halo_out=0 / col_off_out=0 terminal-layer "
                         "output (1.6% fewer rows+bytes; NOT chainable "
                         "into another 3x3 — informational)")
    ap.add_argument("--carry", action="store_true",
                    help="producer->consumer chain (the deployment "
                         "protocol) instead of the fresh-inputs loop")
    a = ap.parse_args()
    results = {}
    for T in [int(t) for t in a.tiles.split(",")]:
        op, src = flagship_op(row_tile=T, erode=a.erode,
                              terminal=a.terminal)
        x = jax.device_put(pack_image(src, op.sin))
        aux = tuple(jax.device_put(np.asarray(v)) for v in op._operands)

        if a.carry:
            def step(c, a_):
                return op(c, operands=a_)
        else:
            def step(c, a_):
                out = op(c, operands=a_)
                b = out[0, 0, 0].astype(jnp.int8) & 1
                return c.at[0, 0, 0].add(b)

        sec = timeit_chain(step, x, a.iters, reps=5, spread_s=5, aux=aux)
        results[T] = report(f"T={T}", sec)
    print(results)
