#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Summarize a scaling_sampler JSONL log: per parallelism level, all
warm samples with their control brackets, then the best-control
(quietest) pairing and its N→4N efficiencies.

Usage: python tools/scaling_report.py /tmp/scaling_samples.jsonl
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    rows = [json.loads(line) for line in open(path)]
    by_cores: dict = {}
    print("cores  ctl_pre  ctl_post  cold_tps   warm_tps")
    for r in rows:
        warm = next(
            (x for x in r.get("runs", []) if x.get("run") == "warm"), None
        )
        cold = next(
            (x for x in r.get("runs", []) if x.get("run") == "cold"), None
        )
        if warm is None:
            print("%5d  leg failed rc=%s" % (r["cores"], r.get("rc")))
            continue
        ctl = min(r["control_pre_m"], r["control_post_m"])
        print(
            "%5d  %7.1f  %8.1f  %9.1f  %9.1f"
            % (
                r["cores"], r["control_pre_m"], r["control_post_m"],
                cold["turns_per_sec"] if cold else -1,
                warm["turns_per_sec"],
            )
        )
        by_cores.setdefault(r["cores"], []).append(
            (ctl, warm["turns_per_sec"])
        )
    print()
    best = {
        c: max(samples) for c, samples in by_cores.items()
    }  # (control, tps) — max by control, i.e. quietest sample
    for c in sorted(best):
        ctl, tps = best[c]
        print(
            "best-quiet %2d cores: %9.1f turns/s (control %.0fM)"
            % (c, tps, ctl)
        )
    for n, n4 in ((2, 8), (8, 32)):
        if n in best and n4 in best:
            eff = best[n4][1] / best[n][1] / 4.0
            print(
                "efficiency %d->%d (best-quiet pairing): %.2f"
                % (n, n4, eff)
            )


if __name__ == "__main__":
    main()
