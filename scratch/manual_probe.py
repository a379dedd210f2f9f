"""Manual window-DMA consumers: double-buffered dynamic-slot (mdma) and
single-buffered (mdma1, exposes the raw window latency). Part of the
evidence_probe ladder.

Run IN BACKGROUND with NO timeout:
    python scratch/manual_probe.py
"""
from probe_common import run_consumers

if __name__ == "__main__":
    run_consumers(["mdma", "mdma1"])
