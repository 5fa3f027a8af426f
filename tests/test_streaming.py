"""Structured Streaming ingestion: micro-batch annotate parity with the
batch pipeline, incremental file pickup, and checkpoint exactly-once."""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.datagen import generate
from pii_redaction_data_pipeline_spark.plans.pipeline import annotate
from pii_redaction_data_pipeline_spark.streaming import (
    run_streaming_pipeline,
    streaming_dedup_turns,
)

COLS = ["conv_id", "turn_idx", "keep", "drop_reasons", "scrubbed_text"]


def _land(spark, tdf, conv_prefixes, in_dir, name):
    part = tdf[tdf["conv_id"].str.startswith(tuple(conv_prefixes))]
    sdf = spark.createDataFrame(part)
    sdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))


def test_streaming_matches_batch(tmp_path, spark):
    tdf, _ = generate("tiny")
    convs = sorted(tdf["conv_id"].unique())
    half_a = {c[:18] for c in convs[: len(convs) // 2]}
    half_b = {c[:18] for c in convs[len(convs) // 2 :]} - half_a

    in_dir = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # first file lands -> drain
    _land(spark, tdf, half_a, in_dir, "batch_a")
    q = run_streaming_pipeline(spark, in_dir + "/*", out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # second file lands -> only the new file is processed
    _land(spark, tdf, half_b, in_dir, "batch_b")
    q = run_streaming_pipeline(spark, in_dir + "/*", out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == len(tdf)

    # exactly-once: re-running with the same checkpoint adds nothing
    q = run_streaming_pipeline(spark, in_dir + "/*", out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(tdf)

    # verdict parity with the batch plan over the same rows
    batch = annotate(spark.createDataFrame(tdf), PipelineConfig(), spark)
    b = batch.select(*COLS).orderBy("conv_id", "turn_idx").collect()
    s = got.select(*COLS).orderBy("conv_id", "turn_idx").collect()
    assert b == s
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_dedup_across_batches(tmp_path, spark):
    """applyInPandasWithState keeps per-conversation seen-hash state
    across micro-batches AND across stream restarts (state store
    checkpoint): a turn text first seen in batch A is flagged when it
    reappears in batch B; within-batch repeats are flagged too."""
    import pandas as pd

    in_dir = str(tmp_path / "landing")
    out = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(in_dir)

    schema_ddl = "conv_id string, turn_idx int, text string"

    def land(rows, name):
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
        spark.createDataFrame(pdf, schema=schema_ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(in_dir, name))

    def drain():
        stream = spark.readStream.schema(schema_ddl).parquet(in_dir + "/*")
        q = streaming_dedup_turns(stream, out, ckpt)
        q.awaitTermination(120)

    land([("c1", 0, "alpha"), ("c1", 1, "beta"), ("c2", 0, "alpha")], "batch_a")
    drain()
    # restart the stream for batch B: state must survive the restart
    land(
        [
            ("c1", 2, "alpha"),   # cross-batch dup (seen in batch_a)
            ("c1", 3, "gamma"),   # fresh
            ("c1", 4, "gamma"),   # within-batch dup
            ("c2", 1, "beta"),    # fresh for c2 (state is per-conv)
        ],
        "batch_b",
    )
    drain()

    got = {
        (r["conv_id"], r["turn_idx"]): r["is_dup"]
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        ("c1", 0): False, ("c1", 1): False, ("c2", 0): False,
        ("c1", 2): True, ("c1", 3): False, ("c1", 4): True,
        ("c2", 1): False,
    }
    assert got == expect, got
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_dedup_across_arrow_chunks(tmp_path, spark):
    """A conversation larger than one Arrow batch arrives as SEVERAL
    chunks of the same micro-batch: a hash first seen in an earlier
    chunk must flag repeats in later chunks (round-1 advice: `seen` was
    computed once before the chunk loop, so cross-chunk within-batch
    dups were missed)."""
    import pandas as pd

    in_dir = str(tmp_path / "landing")
    out = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(in_dir)
    schema_ddl = "conv_id string, turn_idx int, text string"

    # one conversation, 9 turns; with maxRecordsPerBatch=3 the group
    # spans 3 Arrow chunks; turn 7 repeats turn 1's text across chunks
    rows = [("c1", i, f"text-{i}") for i in range(9)]
    rows[7] = ("c1", 7, "text-1")
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    spark.createDataFrame(pdf, schema=schema_ddl).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(in_dir, "batch_a"))

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(schema_ddl).parquet(in_dir + "/*")
        q = streaming_dedup_turns(stream, out, ckpt)
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    got = {
        r["turn_idx"]: r["is_dup"] for r in spark.read.parquet(out).collect()
    }
    assert got == {i: (i == 7) for i in range(9)}, got
    shutil.rmtree(ckpt, ignore_errors=True)
