"""Per-batch grid with an in-kernel fori_loop over row tiles: the same
bytes and MACs as the production kernel through one big program per
image instead of nt small ones. Part of the evidence_probe ladder.

Run IN BACKGROUND with NO timeout:
    python scratch/bigblk_probe.py
"""
from probe_common import run_consumers

if __name__ == "__main__":
    run_consumers(["bigblk"])
