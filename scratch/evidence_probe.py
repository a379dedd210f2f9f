"""The consumer-structure ladder: every structure that FEEDS the kernel
from streamed bytes, from the automatic Pallas pipeline to fully manual
double-buffered window DMA. If the stream tax were a scheduling defect,
one of these would beat the others; measured, the cost follows
consuming streamed bytes regardless of who issues the DMA
(docs/PERF.md "stream tax" section).

Run IN BACKGROUND with NO timeout:
    python scratch/evidence_probe.py [--variants carry,fresh,bigblk,mdma,ms,mso,mdma1]
"""
import argparse

from probe_common import run_consumers

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="carry,fresh,bigblk,mdma,ms,mso,mdma1",
                    help="also: ab2 (two in-place-bumped buffers — the "
                         "carry-penalty decomposition) and alt (tuple-"
                         "swap alternation; confounded by rotation "
                         "copies, kept as the recorded artifact)")
    ap.add_argument("--iters", type=int, default=96)
    a = ap.parse_args()
    run_consumers(a.variants.split(","), iters=a.iters)
