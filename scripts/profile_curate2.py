"""Interleaved A/B decomposition of run_pipeline overhead vs bare annotate.

Variants (all retain_original_text=False, the DAG's config), interleaved
over N rounds so box drift cancels:

  A  bare annotate+write, session shuffle.partitions (32)
  B  bare annotate+write, shuffle.partitions=64 (what tune picks at bench)
  C  run_pipeline full (fresh lineage per run)
  D  run_pipeline phases pre+annotate+write only (metrics skipped)

Usage: python scripts/profile_curate2.py [cores] [rounds]
"""

import dataclasses
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pyspark.sql import Observation
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark import get_spark
from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.plans import pipeline as P
from pii_redaction_data_pipeline_spark.sources.lineage import LineageStore
from pii_redaction_data_pipeline_spark.sources.tables import (
    BUCKET_COL,
    TableIO,
    with_bucket,
)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
path = bench.ensure_transcripts("bench")
spark = get_spark(master=f"local[{cores}]", app_name="profile-curate2")
work = os.path.join(REPO, ".bench_cache", "bench", "prof_curate2")

cfg = dataclasses.replace(PipelineConfig(), retain_original_text=False)
io = TableIO(spark, n_buckets=cfg.n_buckets)
src = spark.read.parquet(path)
base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
print("rows:", src.count(), "base shuffle:", base_shuffle)

shutil.rmtree(f"{work}/warm", ignore_errors=True)
io.write_bucketed(P.annotate(src.limit(50000), cfg, spark), f"{work}/warm")
print("warmed")


def bare(shuffle):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    shutil.rmtree(f"{work}/bare", ignore_errors=True)
    io.write_bucketed(P.annotate(src, cfg, spark), f"{work}/bare")
    spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)


def rp_full():
    shutil.rmtree(f"{work}/rp", ignore_errors=True)
    shutil.rmtree(f"{work}/rp-lineage", ignore_errors=True)
    P.run_pipeline(spark, path, f"{work}/rp", f"{work}/rp-lineage",
                   run_id="prof", cfg=cfg)
    spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)


def rp_nometrics():
    shutil.rmtree(f"{work}/rpn", ignore_errors=True)
    shutil.rmtree(f"{work}/rpn-lineage", ignore_errors=True)
    lineage = LineageStore(spark, f"{work}/rpn-lineage")
    s = io.read(path)
    P.tune_shuffle_partitions(spark, s, cfg.target_partition_bytes)
    s = with_bucket(s, cfg.n_buckets)
    done = set(lineage.completed_buckets("prof"))
    todo = [b for b in range(cfg.n_buckets) if b not in done]
    part = s.filter(F.col(BUCKET_COL).isin(todo))
    ann = P.annotate(part, cfg, spark).withColumn("run_id", F.lit("prof"))
    obs = Observation()
    ann = ann.observe(obs, F.count(F.lit(1)).alias("rows_in"))
    io.write_bucketed(ann, f"{work}/rpn")
    _ = dict(obs.get)
    spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)


variants = {"A bare@32": lambda: bare(32), "B bare@64": lambda: bare(64),
            "C rp_full": rp_full, "D rp_nometrics": rp_nometrics}
walls = {k: [] for k in variants}
for r in range(rounds):
    for k, fn in variants.items():
        t0 = time.time()
        fn()
        w = round(time.time() - t0, 2)
        walls[k].append(w)
        print(f"round {r} {k:16s} {w:7.2f}s", flush=True)
print("\nmedians:")
for k, ws in walls.items():
    ws = sorted(ws)
    print(f"{k:16s} {ws[len(ws)//2]:7.2f}s  all={ws}")
