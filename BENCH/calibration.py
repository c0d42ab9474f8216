"""Host-scaling calibration used by BENCH/BASELINE.md: how does this box
scale embarrassingly parallel numpy work 8 -> 32 processes, for L2-resident
vs DRAM-resident working sets?  (No Spark; isolates the hardware ceiling.)

Usage: python BENCH/calibration.py
"""
import time
from multiprocessing import Pool

import numpy as np


def l2_resident(seed):
    x = np.arange(40_000, dtype=np.int64) + seed  # ~320 KB
    t0 = time.monotonic()
    for _ in range(3000):
        (x * 1664525 + 1013904223) % 54366
    return time.monotonic() - t0


def dram_resident(seed):
    x = np.arange(2_000_000, dtype=np.int64) + seed  # ~16 MB
    t0 = time.monotonic()
    for _ in range(60):
        (x * 1664525 + 1013904223) % 54366
    return time.monotonic() - t0


def run(fn, label):
    rates = {}
    for nproc in (8, 32):
        with Pool(nproc) as p:
            t0 = time.monotonic()
            p.map(fn, range(nproc))
            rates[nproc] = nproc / (time.monotonic() - t0)
    eff = (rates[32] / rates[8]) / 4.0
    print(f"{label}: 8->32 scaling efficiency = {eff:.2f}")


if __name__ == "__main__":
    run(l2_resident, "L2-resident ALU")
    run(dram_resident, "DRAM-resident streams")
