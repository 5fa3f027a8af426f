"""Unattended scaling-measurement campaign.

The N -> 4N efficiency measurement (scripts/bench_scaling.py) is only
meaningful in a quiet window: this shared VM's deliverable parallelism
oscillates up to 6x on a minutes timescale, and a throttle window that
lands mid-attempt corrupts the ratio no matter how carefully the levels
are interleaved. This script waits for quiet (1-min load average below
a threshold), runs one attempt, and repeats — alternating scales so the
history accumulates evidence at several input sizes. Every attempt is
appended to BENCH/history.jsonl by bench_scaling; nothing is discarded.

Usage: python scripts/scaling_campaign.py [max_minutes] [scales...]
  defaults: 150 minutes, scales bench2x bench4x
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOAD_QUIET = 2.0  # 1-min load average below this counts as a quiet window
POLL_SEC = 60


def load1() -> float:
    return os.getloadavg()[0]


def main():
    max_min = float(sys.argv[1]) if len(sys.argv) > 1 else 150.0
    scales = sys.argv[2:] or ["bench2x", "bench4x"]
    deadline = time.time() + max_min * 60
    i = 0
    while time.time() < deadline:
        while load1() >= LOAD_QUIET and time.time() < deadline:
            print(f"[campaign] load {load1():.2f} >= {LOAD_QUIET}, waiting", flush=True)
            time.sleep(POLL_SEC)
        if time.time() >= deadline:
            break
        scale = scales[i % len(scales)]
        i += 1
        print(f"[campaign] attempt {i} scale={scale} load={load1():.2f}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "bench_scaling.py"), scale],
            cwd=REPO,
        )
        time.sleep(30)  # let the box settle before sampling load again
    print("[campaign] done", flush=True)


if __name__ == "__main__":
    main()
