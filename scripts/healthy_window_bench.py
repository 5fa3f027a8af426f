"""Wait for a healthy hardware window, then run the full bench and one
scaling attempt inside it.

This VM's deliverable parallelism oscillates up to 6x on a minutes
timescale; BASELINE.md's stats block headlines whatever bench.py last
recorded, so regenerating it inside a throttled window buries the
engine's real number under hypervisor noise. This waits until the
same 40k-unit hardware control bench.py brackets every measurement
with reports at least `threshold` work-units/sec, then runs
`python bench.py` (which refreshes BENCH/last_run.json + history) and,
if still healthy afterwards, one `scripts/bench_scaling.py` attempt.

Usage: python scripts/healthy_window_bench.py [max_minutes] [threshold]
  defaults: 90 minutes, 2.65e6
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

POLL_SEC = 90


def control() -> float:
    return bench.hardware_control((32,), n=40000)[32]


def main() -> None:
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.65e6
    deadline = time.time() + max_minutes * 60
    ran_bench = False
    while time.time() < deadline:
        c = control()
        print(f"[{time.strftime('%H:%M:%S')}] control={c:,.0f}", flush=True)
        if c < threshold:
            time.sleep(POLL_SEC)
            continue
        if not ran_bench:
            print("healthy window -> bench.py", flush=True)
            rc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO
            ).returncode
            print(f"bench.py rc={rc}", flush=True)
            ran_bench = rc == 0
            continue
        print("healthy window -> scaling attempt (bench4x)", flush=True)
        rc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "bench_scaling.py"),
                "bench4x",
            ],
            cwd=REPO,
        ).returncode
        print(f"bench_scaling rc={rc}", flush=True)
        if rc == 0:
            break
    print("done; ran_bench=", ran_bench, flush=True)


if __name__ == "__main__":
    main()
