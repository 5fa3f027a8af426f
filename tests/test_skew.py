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
