"""Manual window-DMA with STATIC-slot consumers via parity branches
(ms), plus manual double-buffered output copies (mso). Part of the
evidence_probe ladder.

Run IN BACKGROUND with NO timeout:
    python scratch/mstatic_probe.py
"""
from probe_common import run_consumers

if __name__ == "__main__":
    run_consumers(["ms", "mso"])
