"""Structured Streaming ingestion for the quality-filter pipeline.

The reference is event-triggered batch: an S3 object-created event starts
one bounded workflow run (reference backend/src/lambda/machine-state.py:
29-99, architecture.md:98-100). The Spark-native generalization of
"process each batch of files as it lands" is a file-source stream with
`foreachBatch`: new parquet files under the input directory become
micro-batches, each micro-batch runs the SAME `annotate` plan as the
batch pipeline (no forked logic). Spark's streaming checkpoint gives
at-least-once micro-batch delivery through foreachBatch; the sink makes
the pipeline exactly-once END-TO-END by being idempotent — partitioned
by the deterministic _batch_id with dynamic overwrite, so a replayed
batch overwrites its own partition. The streaming analog of the lineage
table's bucket-level resume.

Watermarks/session windows are NOT used: per the north rule the engine
is a batch quality filter; conversation windows need the whole
conversation, so conv-window flags are computed within each micro-batch
(correct when a conversation's turns land together, i.e. the reference's
"workflow batch" granularity — one uploaded batch, one event). For
cross-batch conversations, run the batch pipeline over the landed table.

`trigger(availableNow=True)` drains everything present and stops, which
is also how the offline tests drive it deterministically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.plans.pipeline import annotate
from pii_redaction_data_pipeline_spark.sources.tables import with_bucket

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def run_streaming_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    ppl_model=None,
):
    """Start the file-source stream; returns the StreamingQuery.

    With available_now=True the query drains all currently-visible files
    and finishes (bounded run); otherwise it keeps watching input_dir.
    max_files_per_trigger mirrors the reference's 10-docs-per-poll pacing
    (reference backend/src/lambda/extract.py:54-56).

    cfg.train_ppl_on_corpus requires a pre-fitted `ppl_model`
    (functions/perplexity.train_char_trigram_lm over the landed corpus,
    or load_or_train_char_trigram_lm's durable artifact): letting
    annotate() fit per micro-batch would score the same turn differently
    depending on which files happened to land together — the exact
    batching-dependence annotate's own contract forbids for resumes.
    """
    cfg = cfg or PipelineConfig()
    if cfg.train_ppl_on_corpus and ppl_model is None:
        raise ValueError(
            "streaming with cfg.train_ppl_on_corpus needs a pre-fitted "
            "ppl_model — fitting on each micro-batch alone would make "
            "ppl (and keep/drop) depend on file-landing batching"
        )

    reader = spark.readStream.schema(TRANSCRIPT_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        ann = annotate(batch_df, cfg, spark, ppl_model=ppl_model)
        ann = with_bucket(ann, cfg.n_buckets)
        ann = ann.withColumn("_batch_id", F.lit(batch_id))
        # IDEMPOTENT write, not a plain append: foreachBatch is only
        # at-least-once (a crash between the sink write and the
        # streaming commit replays the micro-batch), so the sink
        # partitions by _batch_id with dynamic overwrite — a replayed
        # batch overwrites its OWN partition instead of appending its
        # rows a second time. This is the standard foreachBatch
        # exactly-once recipe: deterministic batch_id + idempotent sink.
        (
            ann.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(output_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Watermarked event-time metrics
# ---------------------------------------------------------------------------


def streaming_turn_metrics(
    stream_df,
    output_path: str,
    checkpoint_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """Event-time ingestion-rate metrics: per (time-window, role) turn and
    character counts, with a WATERMARK bounding state and late data.

    This is the streaming analog of the batch lineage totals: each
    tumbling event-time window emits exactly once (append mode), when the
    watermark — max event time seen minus `watermark_delay` — passes the
    window's end. Turns arriving later than the watermark are DROPPED
    from the aggregation (the documented late-data contract), and window
    state older than the watermark is evicted, so state stays bounded at
    10^12-turn scale no matter how long the stream runs. Returns the
    StreamingQuery.
    """
    agg = (
        stream_df.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_chars"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "role",
            "n_turns",
            "n_chars",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Stateful cross-batch duplicate-turn detection
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_DDL = "conv_id string, turn_idx int, text_hash long, is_dup boolean"
DEDUP_STATE_DDL = "hashes array<long>"


def streaming_dedup_turns(
    stream_df,
    output_path: str,
    checkpoint_dir: str,
    max_state_hashes: int = 100_000,
    available_now: bool = True,
):
    """Cross-batch duplicate-turn flags via applyInPandasWithState.

    The batch pipeline's dup-turn window sees one conversation at once;
    when a conversation's turns arrive across micro-batches, detection
    needs per-conv state that outlives the batch. State per conv_id is
    the set of turn-text hashes seen so far (bounded by
    max_state_hashes; at ~8 B/hash the worst-case state row is ~800 KB),
    checkpointed by the state store, so a restarted stream resumes with
    its memory intact — the streaming generalization of the lineage
    table's resume semantics.

    Inside each group the work is vectorized (hash isin + duplicated on
    the Arrow batch), no per-row Python. Returns the StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream_df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.xxhash64(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash"),
    )

    def flag_dups(key, pdfs, state):
        import numpy as np
        import pandas as pd

        seen = np.asarray(state.get[0], dtype=np.int64) if state.exists else np.empty(0, np.int64)
        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx", kind="stable")
            h = pdf["text_hash"].to_numpy(np.int64)
            in_state = np.isin(h, seen)
            within = pd.Series(h).duplicated().to_numpy()
            out = pdf[["conv_id", "turn_idx", "text_hash"]].copy()
            out["is_dup"] = in_state | within
            # accumulate BEFORE the next chunk: a group larger than one
            # Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch)
            # arrives as several chunks, and a hash first seen in an
            # earlier chunk must flag repeats in later chunks of the
            # same micro-batch
            seen = np.concatenate([seen, h[~(in_state | within)]])
            yield out
        # SATURATION: retention is oldest-first — once a conversation has
        # max_state_hashes distinct turn texts, NEWER texts are no longer
        # recorded, so their later repeats go unflagged (permanent false
        # negatives past the cap). Oldest-first is the deliberate choice:
        # dup turns in real transcripts overwhelmingly repeat early
        # boilerplate, and a bounded state row (~8 B/hash) is what keeps
        # the state store safe at 10^12-turn scale.
        state.update((seen[:max_state_hashes].tolist(),))

    flagged = hashed.groupBy("conv_id").applyInPandasWithState(
        flag_dups,
        DEDUP_OUTPUT_DDL,
        DEDUP_STATE_DDL,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        flagged.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
