"""DMA-engine capability: a pure copy kernel over the op's stream bytes
(aggregate GB/s with no compute to fight) plus the consumed-ghost pair
(see ghost_probe.py).

Run IN BACKGROUND with NO timeout:
    python scratch/dma_probe.py
"""
from probe_common import run_consumers

if __name__ == "__main__":
    run_consumers(["copy", "ghost0", "ghostc"])
