"""The consumed-ghost experiment: the floor kernel (no HBM streams)
plus a manual double-buffered async copy of the full per-tile window
bytes from a SIDE buffer. ghost0 = floor alone; ghostc folds one landed
vector into the output so the DMA cannot be DCE'd. ghostc - ghost0 is
the marginal cost of moving (but barely consuming) the op's whole input
traffic — the "unconsumed bytes are nearly free" half of the stream-tax
contention argument (docs/PERF.md).

Run IN BACKGROUND with NO timeout:
    python scratch/ghost_probe.py
"""
from probe_common import run_consumers

if __name__ == "__main__":
    run_consumers(["ghost0", "ghostc"])
