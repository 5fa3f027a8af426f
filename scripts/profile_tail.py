"""Measure and decompose the session-fixed per-job tail.

The N -> 4N scaling ratio is capped by whatever part of one pipeline
job does not shrink with cores (SCALE.md 'session-fixed ~7 s tail').
This script isolates that constant directly: it runs the IDENTICAL
time_pipeline job on inputs of very different sizes (small ~20k turns,
bench ~2M) in one warmed session and fits

    wall(input) = tail + rows / rate

from the two points — the small-input wall is almost pure tail, and the
difference gives the data-proportional rate. Run at two parallelism
levels to show which part of the tail is parallelism-independent.

Ablation (--ablate): re-measure at local[8] with
spark.sql.adaptive.enabled=false, attributing the AQE-stage-planning
share of the tail.

Usage: python scripts/profile_tail.py [cores ...]  (default: 8 32)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pii_redaction_data_pipeline_spark import get_spark  # noqa: E402


def measure(cores: int, aqe: bool = True) -> dict:
    import pyarrow.parquet as pq

    spark = get_spark(master=f"local[{cores}]", app_name="tail-prof")
    if not aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    small = bench.ensure_transcripts("small")
    big = bench.ensure_transcripts("bench")
    outd = os.path.join(REPO, ".bench_cache", "tailprof")
    # warm: identical plan, both input sizes once
    bench.time_pipeline(spark, small, outd + "_w1")
    bench.time_pipeline(spark, big, outd + "_w2")
    res = {}
    for name, tp in (("small", small), ("bench", big)):
        walls = [
            bench.time_pipeline(spark, tp, outd)["wall_sec"] for _ in range(3)
        ]
        res[name] = {
            "rows": pq.read_metadata(tp).num_rows,
            "median_wall": sorted(walls)[1],
            "walls": walls,
        }
    n_s, n_b = res["small"]["rows"], res["bench"]["rows"]
    w_s, w_b = res["small"]["median_wall"], res["bench"]["median_wall"]
    rate = (n_b - n_s) / (w_b - w_s) if w_b > w_s else float("inf")
    tail = w_s - n_s / rate
    res["fit"] = {"rate_rows_per_sec": round(rate, 1), "tail_sec": round(tail, 3)}
    spark.stop()
    return res


def main():
    import json

    cores_list = [int(c) for c in sys.argv[1:] if c.isdigit()] or [8, 32]
    out = {}
    for c in cores_list:
        out[f"local[{c}]"] = measure(c)
        print(json.dumps({f"local[{c}]": out[f"local[{c}]"]}), flush=True)
    if "--ablate" in sys.argv:
        out["local[8]_aqe_off"] = measure(8, aqe=False)
        print(json.dumps({"local[8]_aqe_off": out["local[8]_aqe_off"]}), flush=True)
    print("TAILS " + json.dumps({k: v["fit"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
