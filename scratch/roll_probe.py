"""Tap-formulation ablation: what the kw-tap byte shifts cost.

`prod` is the production bshift1 formulation (input-side byte shifts on
the bitcast-i32 view, lane-concatenated into ONE dot — ops/packed.py);
`noroll` feeds the same MACs with the shifts removed (results wrong, MXU
work identical), so prod - noroll is the whole tap-shift term.

Run IN BACKGROUND with NO timeout (tunnel-wedge rule):
    python scratch/roll_probe.py [--variants prod,noroll] [--tile 64]
"""
import argparse

from probe_common import run_ablate

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="prod,noroll")
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--iters", type=int, default=96)
    a = ap.parse_args()
    run_ablate(a.variants.split(","), iters=a.iters, row_tile=a.tile)
