"""Skew handling: a hot conversation must spread across partitions in
the salted phase-1 layout (per-row stages), while the unsalted window
phase keeps it whole — the two-phase contract from SURVEY.md §4."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.operators.skew import salted_repartition


def _skewed_df(spark, hot_rows=4000, small_convs=50):
    rows = [("hot", i) for i in range(hot_rows)]
    rows += [(f"c{j}", i) for j in range(small_convs) for i in range(5)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx"])
    return spark.createDataFrame(pdf)


def test_salted_repartition_spreads_hot_conversation(spark):
    df = _skewed_df(spark)
    out = salted_repartition(df, salt_buckets=8, num_partitions=16)
    per = (
        out.filter(F.col("conv_id") == "hot")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    pids = {r["pid"] for r in per}
    # one hot key must NOT collapse onto one partition
    assert len(pids) >= 4, pids
    # and no partition should hold the majority of the hot rows
    assert max(r["count"] for r in per) < 4000 * 0.5
    # no rows lost or duplicated by the salting round-trip
    assert out.count() == df.count()


def test_unsalted_repartition_keeps_conversation_whole(spark):
    df = _skewed_df(spark, hot_rows=500)
    out = df.repartition(16, "conv_id")
    per = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("conv_id")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .filter(F.col("n_pids") > 1)
        .count()
    )
    assert per == 0  # every conversation lives in exactly one partition


def test_skew_torture_pipeline(spark, tmp_path):
    """VERDICT round-2 item 6: one pathological ~100k-turn conversation
    (datagen scale 'skewtort') through the full pipeline. Pins that
    (a) phase 1 takes the SALTED repartition (the scan's few natural
    splits are below the parallelism target, so the plan must contain
    the (conv_id, _salt) exchange and spread the hot conversation),
    (b) the unsalted phase-2 window survives the skew, and (c) per-turn
    verdicts and scrubbed text still exactly match the planted labels —
    correctness is partitioning-independent."""
    from pii_redaction_data_pipeline_spark.config import PipelineConfig
    from pii_redaction_data_pipeline_spark.datagen import write_parquet
    from pii_redaction_data_pipeline_spark.plans.pipeline import (
        annotate,
        tune_shuffle_partitions,
    )

    tp, lp = write_parquet("skewtort", str(tmp_path))
    tr = spark.read.parquet(tp)
    n_rows = tr.count()
    assert n_rows > 100_000  # the planted hot conversation dominates
    hot = tr.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    assert hot["count"] >= 100_000

    tune_shuffle_partitions(spark, tr)
    ann = annotate(tr, PipelineConfig(), spark)

    # (a) plan pin: the salted phase-1 exchange is present (few natural
    # splits -> annotate must not run the UDF on the skewed scan layout)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, plan[:2000]

    # (b)+(c): the whole skewed conversation flows through the window
    # phase and every verdict matches the generator's planted label
    exp = spark.read.parquet(lp)
    j = ann.alias("a").join(exp.alias("e"), ["conv_id", "turn_idx"], "full")
    assert j.count() == n_rows
    assert j.filter(F.col("a.keep") != F.col("e.keep")).count() == 0
    assert (
        j.filter(
            ~F.col("a.scrubbed_text").eqNullSafe(F.col("e.scrubbed_text"))
        ).count()
        == 0
    )


def test_salt_is_deterministic_and_map_safe(spark):
    """The salt must be a deterministic function of row content (a
    nondeterministic salt can lose/duplicate rows under partial stage
    recompute — SPARK-23207 class), and the default salt_cols must skip
    MapType columns (xxhash64 rejects maps at plan time)."""
    df = _skewed_df(spark).withColumn(
        "m", F.create_map(F.lit("k"), F.col("turn_idx"))
    )
    # map column present: default salt_cols must not crash
    out = salted_repartition(df, salt_buckets=4, num_partitions=8)
    assert out.count() == df.count()
    # determinism: same row -> same partition across independent runs
    def layout(frame):
        return {
            (r.conv_id, r.turn_idx): r.pid
            for r in frame.withColumn("pid", F.spark_partition_id()).collect()
        }

    a = layout(salted_repartition(df, salt_buckets=4, num_partitions=8,
                                  salt_cols=["conv_id", "turn_idx"]))
    b = layout(salted_repartition(df.repartition(13), salt_buckets=4,
                                  num_partitions=8,
                                  salt_cols=["conv_id", "turn_idx"]))
    assert a == b
