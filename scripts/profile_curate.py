"""Decompose curate-DAG annotate-stage overhead vs the bare pipeline.

The bench measures the bare flagship (annotate + bucketed write) and the
curation DAG on the same input; round-4 showed the DAG's annotate stage
(run_pipeline: resume machinery + lineage) costing noticeably more than
the bare measurement. This script times, in ONE warmed session at
local[<cores>]:

  bare        annotate(src) -> write_bucketed            (= bench time_pipeline)
  bare-noraw  same with retain_original_text=False       (= DAG's cfg)
  rp          run_pipeline(...) fresh lineage            (= DAG annotate stage)
  rp phases   tune/with_bucket/lineage-read | annotate+write | metrics re-read

Usage: python scripts/profile_curate.py [cores] [scale]
"""

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pii_redaction_data_pipeline_spark import get_spark
from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.plans import pipeline as P
from pii_redaction_data_pipeline_spark.sources.tables import TableIO

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
scale = sys.argv[2] if len(sys.argv) > 2 else "bench"
path = bench.ensure_transcripts(scale)
spark = get_spark(master=f"local[{cores}]", app_name="profile-curate")
work = os.path.join(REPO, ".bench_cache", scale, "prof_curate")

cfg = PipelineConfig()
io = TableIO(spark, n_buckets=cfg.n_buckets)
src = spark.read.parquet(path)
n = src.count()
print(f"rows={n} cores={cores} scale={scale}")

# warm-up: identical plan, small slice
shutil.rmtree(f"{work}/warm", ignore_errors=True)
io.write_bucketed(P.annotate(src.limit(50000), cfg, spark), f"{work}/warm")
print("warmed")


def t(label, fn):
    t0 = time.time()
    fn()
    w = time.time() - t0
    print(f"{label:34s} {w:7.2f}s")
    return w


import dataclasses

cfg_noraw = dataclasses.replace(cfg, retain_original_text=False)

for tag, c in (("bare(raw)", cfg), ("bare(noraw)", cfg_noraw)):
    shutil.rmtree(f"{work}/{tag}", ignore_errors=True)
    t(tag + " annotate+write", lambda c=c, tag=tag: io.write_bucketed(
        P.annotate(src, c, spark), f"{work}/{tag}"))

# run_pipeline as the DAG invokes it (fresh lineage each time)
pre = spark.conf.get("spark.sql.shuffle.partitions")
for tag, c in (("rp(raw)", cfg), ("rp(noraw)", cfg_noraw)):
    shutil.rmtree(f"{work}/{tag}", ignore_errors=True)
    shutil.rmtree(f"{work}/{tag}-lineage", ignore_errors=True)
    t(tag + " run_pipeline", lambda c=c, tag=tag: P.run_pipeline(
        spark, path, f"{work}/{tag}", f"{work}/{tag}-lineage",
        run_id="prof", cfg=c))
    spark.conf.set("spark.sql.shuffle.partitions", pre)

# phase split of run_pipeline(noraw): redo with manual phases
from pyspark.sql import Observation
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.sources.lineage import LineageStore
from pii_redaction_data_pipeline_spark.sources.tables import BUCKET_COL, with_bucket

tag = "rp-phased"
shutil.rmtree(f"{work}/{tag}", ignore_errors=True)
shutil.rmtree(f"{work}/{tag}-lineage", ignore_errors=True)
lineage = LineageStore(spark, f"{work}/{tag}-lineage")

def phase_pre():
    global part, todo
    s = io.read(path)
    P.tune_shuffle_partitions(spark, s, cfg_noraw.target_partition_bytes)
    s = with_bucket(s, cfg_noraw.n_buckets)
    done = set(lineage.completed_buckets("prof"))
    todo = [b for b in range(cfg_noraw.n_buckets) if b not in done]
    part = s.filter(F.col(BUCKET_COL).isin(todo))

def phase_annotate_write():
    global run_totals
    ann = P.annotate(part, cfg_noraw, spark, ppl_train_df=None)
    ann = ann.withColumn("run_id", F.lit("prof"))
    obs = Observation("prof-obs")
    ann = ann.observe(obs, F.count(F.lit(1)).alias("rows_in"))
    io.write_bucketed(ann, f"{work}/{tag}")
    run_totals = dict(obs.get)

def phase_metrics():
    out = spark.read.parquet(f"{work}/{tag}")
    out = out.filter(F.col(BUCKET_COL).isin(todo) & (F.col("run_id") == "prof"))
    metrics = P.lineage_metrics(out, "prof", buckets=todo)
    lineage.append(metrics)

t("phase pre(tune+lineage-read)", phase_pre)
t("phase annotate+write", phase_annotate_write)
t("phase metrics re-read+append", phase_metrics)
print("shuffle.partitions after tune:", spark.conf.get("spark.sql.shuffle.partitions"))
spark.conf.set("spark.sql.shuffle.partitions", pre)
