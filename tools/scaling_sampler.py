#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Long-running scaling-leg sampler for the volatile shared VM:
cycles through parallelism levels, bracketing EVERY leg with the
pure-CPU control, and appends one JSON line per leg to the log.
End-of-round analysis (tools/scaling_report.py) takes, per level,
the max warm throughput among legs whose controls cleared a floor —
the round-2 "pair the quiet legs" protocol, automated.

Usage: python tools/scaling_sampler.py out.jsonl [--corpus DIR]
       [--cores 8,32,8,32,2] [--rounds 8]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def control(workers: int = 32, seconds: float = 3.0) -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "cpu_control.py"),
         "--workers", str(workers), "--seconds", str(seconds)],
        capture_output=True, text=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)["ops_per_sec_m"]
    return -1.0


def leg(cores: int, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_bench.py"),
         "--single-run", "--cores", str(cores), "--corpus", corpus],
        capture_output=True, text=True,
    )
    runs = [
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{")
    ]
    rec = dict(runs=runs, rc=out.returncode)
    if out.returncode != 0 or not runs:
        # surface the failure in the log instead of silently
        # recording an empty leg for the whole session
        rec["stderr_tail"] = out.stderr[-2000:]
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--corpus", default="data/transcripts/bench320000")
    ap.add_argument("--cores", default="8,32,8,32,2")
    ap.add_argument("--rounds", type=int, default=8)
    a = ap.parse_args()
    levels = [int(c) for c in a.cores.split(",")]
    with open(a.log, "a") as f:
        for r in range(a.rounds):
            for cores in levels:
                pre = control()
                lr = leg(cores, a.corpus)
                post = control()
                rec = dict(
                    ts=round(time.time(), 1), rnd=r, cores=cores,
                    control_pre_m=pre, control_post_m=post,
                    **lr,
                )
                f.write(json.dumps(rec) + "\n")
                f.flush()


if __name__ == "__main__":
    main()
