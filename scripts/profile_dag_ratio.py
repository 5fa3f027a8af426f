"""Same-window DAG/pipeline ratio: interleave bench's time_pipeline and
time_curation so box drift cancels, print per-round ratios.

Usage: python scripts/profile_dag_ratio.py [cores] [rounds]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pii_redaction_data_pipeline_spark import get_spark

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
path = bench.ensure_transcripts("bench")
spark = get_spark(master=f"local[{cores}]", app_name="dag-ratio")
work = os.path.join(REPO, ".bench_cache", "bench")

bench.time_pipeline(spark, path, f"{work}/ratio_warm", limit_rows=50000)
print("warmed", flush=True)
ratios = []
for r in range(rounds):
    p = bench.time_pipeline(spark, path, f"{work}/ratio_pipe")
    c = bench.time_curation(spark, path, f"{work}/ratio_dag")
    ratio = round(c["wall_sec"] / p["wall_sec"], 2)
    ratios.append(ratio)
    print(f"round {r}: pipeline {p['wall_sec']:.2f}s  dag {c['wall_sec']:.2f}s "
          f"ratio {ratio}  stages {c['stage_walls_sec']}", flush=True)
print("ratios:", ratios, "median:", sorted(ratios)[len(ratios) // 2])
