"""Chain-protocol honesty: the producer->consumer carry chain (output
buffer feeds the next step) vs the fresh-inputs bump chain (stable
input, one-element in-place fold). The difference is the HBM
write->read-back turnaround, not kernel time — measured ~1% on the
single op and ~3pp on the two-layer megakernel (scratch/pair_probe.py
carry32/bump32; docs/PERF.md protocol note).

Run IN BACKGROUND with NO timeout:
    python scratch/nochain_probe.py
"""
from probe_common import run_consumers

if __name__ == "__main__":
    run_consumers(["carry", "fresh"])
