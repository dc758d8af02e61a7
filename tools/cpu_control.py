#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Quiet-machine control for benchmark batches on the shared VM:
a pure-CPU multiprocessing busy loop (no Spark, no IO) whose ops/s
measures how much of the machine external load is currently eating.

Protocol (BENCH.md): bracket every measurement batch with this
control; quiet readings on this VM are ~380-420M ops/s at 32 workers.
Samples taken while the control reads materially lower are excluded
as degraded-machine runs.

Usage: python tools/cpu_control.py [--workers 32] [--seconds 3]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(stop_at: float, out) -> None:
    n = 0
    x = 1
    while time.time() < stop_at:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100_000
    out.put(n)


def measure(workers: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    stop_at = time.time() + seconds
    procs = [
        mp.Process(target=_burn, args=(stop_at, q)) for _ in range(workers)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    wall = time.time() - t0
    return total / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=3.0)
    a = ap.parse_args()
    ops = measure(a.workers, a.seconds)
    print(
        json.dumps(
            dict(
                metric="cpu_control_ops_per_sec",
                workers=a.workers,
                ops_per_sec=round(ops),
                ops_per_sec_m=round(ops / 1e6, 1),
            )
        )
    )


if __name__ == "__main__":
    main()
