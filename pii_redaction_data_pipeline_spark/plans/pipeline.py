"""The quality-filter pipeline: one declarative Spark plan.

This is the Spark translation of the reference's whole Step Functions
state machine (SURVEY.md §3.1): what was eight Lambda hops over S3/SQS/
SNS/DynamoDB becomes a single DataFrame chain —

  scan → [langid | scrub | ppl | heuristics]  (narrow, Arrow-batched)
       → conversation windows                 (one shuffle on conv_id)
       → verdict assembly                     (JVM-side expressions)
       → bucketed write + lineage             (per-partition checkpoint)

Scale notes (the plan you'd want at 100 TB):
  * All Python stages run BEFORE the conv_id shuffle, on the scan's
    byte-balanced input splits — a skewed conversation costs nothing in
    the UDF stages (rows are independent) and the only stage that needs
    conv_id locality is cheap window algebra.
  * Exactly ONE shuffle in the whole plan (repartition by conv_id for
    the windows); verdicts and writes reuse that partitioning.
  * Filters on the final `keep` column and column pruning push into the
    parquet/Iceberg scan of downstream consumers — the annotated table
    is written with plain Spark SQL types only.
"""

from __future__ import annotations

import posixpath
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.functions.fused import make_annotate_udf
from pii_redaction_data_pipeline_spark.operators.windows import with_conversation_flags
from pii_redaction_data_pipeline_spark.sources.lineage import LineageStore
from pii_redaction_data_pipeline_spark.sources.tables import (
    BUCKET_COL,
    TableIO,
    with_bucket,
)

# expression budget for riding per-bucket lineage aggregates on the write
# job's Observation (CollectMetrics evaluates them per row OUTSIDE
# whole-stage codegen); above this, run_pipeline falls back to the
# column-pruned re-read of the written table. Measured A/B at bench
# scale (2M turns, 32 cores, scripts/profile_pack_lineage.py, warm
# medians): the default 16-bucket config emits 256 expressions and the
# observe path costs 18.4-20.4 s vs 15.3-16.2 s for the re-read — the
# interpreted per-row aggregate eval loses to one text-free pruned scan
# well before the codegen cliff the original 1024 budget guarded. Set
# so only genuinely small runs (<=10 buckets at the default taxonomy,
# where the per-row cost is a wash and skipping the second job's
# scheduling latency wins) ride the observation; everything larger
# re-reads.
LINEAGE_OBS_MAX_EXPRS = 160


def tune_shuffle_partitions(
    spark: SparkSession,
    df: DataFrame,
    target_partition_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Size spark.sql.shuffle.partitions to the actual input volume.

    Spark's static default (or a cores-derived value) is wrong at both
    extremes: 100 TB over a few hundred partitions spills and stragglers
    dominate; 1 GB over 10k partitions drowns in task overhead. Uses the
    optimizer's size estimate for the plan (file-scan statistics — a
    driver-side metadata read, no job), clamped below by 2x cores so a
    small input still uses the whole cluster. AQE may still coalesce
    downward at runtime; this sets the ceiling it works under.
    """
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    cores = spark.sparkContext.defaultParallelism
    n = max((size + target_partition_bytes - 1) // target_partition_bytes, 2 * cores)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return int(n)


def annotate(
    df: DataFrame,
    cfg: PipelineConfig,
    spark: SparkSession | None = None,
    conv_partitioned: bool = False,
    ppl_train_df: DataFrame | None = None,
    ppl_model=None,
) -> DataFrame:
    """transcripts -> annotated (adds lang, lang_conf, ppl, heuristic cols,
    keep, drop_reasons, scrubbed_text, scrub_counts).

    conv_partitioned=True declares that the input is the engine's OWN
    bucketed output (a Spark bucketed table written by
    TableIO.write_conv_bucketed_table, or an Iceberg bucket(conv_id)
    layout): the window stage runs FIRST, directly on the scan — its
    required distribution is satisfied by the bucket metadata, so the
    plan contains ZERO exchange — and the fused UDF runs after it
    (ArrowEvalPython resets partitioning metadata in Spark's planner, so
    UDF-before-window would re-introduce the exchange; after the window
    nothing downstream needs a distribution). The dup-detection hash is
    computed JVM-side on the input text, which by the input contract is
    already D1-normalized — so it equals the standard path's
    normalized-text hash. For resumed/incremental re-processing this
    removes the plan's only corpus-wide shuffle (pinned by
    tests/test_plans.py::test_bucketed_table_windows_need_no_exchange)."""
    if cfg.train_ppl_on_corpus and spark is not None and ppl_model is None:
        # Fit the fluency model on THIS corpus (one extra column-pruned
        # counting pass, bounded sparse aggregation — see config flag
        # docstring). Trained on the raw text column: normalization only
        # strips zero-width/control chars, which the closed alphabet
        # already folds to OOV, so the register the model learns is the
        # register the scorer sees.
        from pii_redaction_data_pipeline_spark.functions.perplexity import (
            train_char_trigram_lm,
        )

        # Fit on ppl_train_df when given — the training frame must be
        # the FULL input (never a resume remainder) so every bucket of a
        # run_id scores against the same model no matter where a prior
        # attempt died; fitting on the filtered remainder would make ppl,
        # the high_ppl gate, and keep/drop depend on resume state,
        # breaking the deterministic checkpoint/resume contract.
        # run_pipeline goes one step further and passes a pre-fitted
        # `ppl_model` (load_or_train_char_trigram_lm): the fitted counts
        # persist as a per-run artifact so resumes skip this scan.
        ppl_model = train_char_trigram_lm(
            df if ppl_train_df is None else ppl_train_df, "text"
        )
    fused_udf = make_annotate_udf(
        spark, normalize=cfg.normalize_unicode, ppl_model=ppl_model
    )

    # normalize NULL text to '' up front: every downstream rule treats ''
    # as droppable (too_short), whereas raw NULLs would propagate through
    # the JVM comparisons as NULL and silently fall out of the verdict
    # (a NULL-text turn must never be kept)
    df = df.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    text = F.col("text")

    # raw-bytes turn identity, persisted into the annotated output so
    # downstream conversation-level near-dup dedup (plans/curate.py
    # stage 3) can shingle 8-byte fingerprints off a column-pruned scan
    # of the annotated table instead of RE-READING the full raw text of
    # the corpus — at 100 TB that deletes an entire second text scan.
    # Hashed BEFORE normalization (the same bytes a re-uploaded batch
    # would carry, modulo the NULL->'' coalesce above), so it equals
    # what dedup previously computed from the source table.
    df = df.withColumn("turn_fp", F.xxhash64(text))

    # --- two-phase partitioning (SURVEY.md §4 skew handling) ---
    # Phase 1 is ADAPTIVE: the per-row UDF stages need no conv_id
    # locality at all — they only need enough balanced input splits to
    # keep every core busy. When the scan already provides that (byte-
    # range parquet splits are balanced by construction; at corpus scale
    # natural splits >> cores), the UDFs run DIRECTLY on the scan
    # partitions, pipelined in the same stage — shuffling 100 TB just to
    # rearrange rows that are processed independently would be the
    # single biggest waste in the plan. Only a degenerate layout (few
    # fat splits < target, e.g. one local file) pays a salted conv_id
    # repartition with an EXPLICIT partition count — explicit so AQE's
    # advisory coalescing can't shrink the exchange below the core
    # count, salted so a skewed 30k-turn conversation spreads across
    # workers (safe: these stages are strictly per-row).
    n_parts = None
    if spark is not None and not conv_partitioned:
        # volume-tuned shuffle partitions (run_pipeline sets the conf via
        # tune_shuffle_partitions), floored at 2x cores so AQE coalescing
        # and tiny inputs can't under-parallelize the exchange
        n_parts = max(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            spark.sparkContext.defaultParallelism * 2,
        )
        n_src = df.rdd.getNumPartitions()
        if n_src < n_parts:
            from pii_redaction_data_pipeline_spark.operators.skew import (
                salted_repartition,
            )

            # (conv_id, turn_idx) is the per-row discriminator: hashing
            # it salts deterministically without touching the text bytes
            df = salted_repartition(
                df, salt_buckets=cfg.salt_buckets, num_partitions=n_parts,
                salt_cols=["conv_id", "turn_idx"],
            )

    if conv_partitioned:
        # fast path: conversation windows BEFORE the UDF, on the scan's
        # bucket distribution (zero exchange; see docstring)
        from pii_redaction_data_pipeline_spark.operators.windows import (
            _norm_text,
            with_conversation_flags as _flags,
        )

        df = df.withColumn("_th", F.xxhash64(_norm_text(text)))
        df = _flags(df, tool_loop_min_run=cfg.tool_loop_min_run, hash_col="_th")
        df = df.drop("_th")

    # --- narrow, Arrow-batched stages (no shuffle) ---
    # ONE fused pandas UDF (langid + scrub + ppl-on-stripped-scrubbed +
    # repetition + n_chars/n_words/symbol_ratio): the text column crosses
    # the JVM<->Python Arrow pipe once (functions/fused.py), and ALL
    # per-turn stats come out of that single pass.
    df = df.withColumn("_ann", fused_udf(text))
    df = (
        # text becomes the D1-NORMALIZED text from here on (delta-encoded:
        # _ann.text_norm is NULL when unchanged), so the dup-detection
        # hash, the scrubbed-vs-text delta encoding, and a retained text
        # column all see the same normalized form the scrubber saw
        df.withColumn("text", F.coalesce(F.col("_ann.text_norm"), text))
        .withColumn("lang", F.col("_ann.lang"))
        .withColumn("lang_conf", F.col("_ann.lang_conf"))
        .withColumn("_scrubbed", F.col("_ann.scrubbed_text"))
        .withColumn("_counts", F.col("_ann.scrub_counts"))
        .withColumn("ppl", F.col("_ann.ppl"))
        .withColumn("rep_frac", F.col("_ann.rep_frac"))
        # n_chars/n_words/symbol_ratio ride the same Arrow exchange:
        # the numpy single-pass (quality.text_stats_frame) beats the
        # "cheap" JVM regexp_count + 63-char translate by ~10x at 2M
        # rows (microbench in BENCH/BASELINE.md); semantics identical
        # (pinned by tests/test_functions.py::test_text_stats_matches_jvm)
        .withColumn("n_chars", F.col("_ann.n_chars"))
        .withColumn("n_words", F.col("_ann.n_words"))
        .withColumn("symbol_ratio", F.col("_ann.symbol_ratio"))
        .drop("_ann")
    )

    if cfg.emit_entities:
        # optional second Python stage (still phase 1 / pre-shuffle, on
        # the normalized text so offsets match what the scrubber saw);
        # Catalyst collapses adjacent pandas UDFs into one ArrowEvalPython
        # evaluation, so the text column still crosses the pipe once
        from pii_redaction_data_pipeline_spark.functions.entities import (
            make_entities_udf,
        )

        df = df.withColumn("entities", make_entities_udf()(F.col("text")))

    # --- conversation windows: phase 2, the unsalted conv_id shuffle ---
    # (explicit count again so AQE can't coalesce the five window sorts
    # onto a handful of cores). The dup-detection text hash is computed
    # HERE, on the salted partitioning, so the raw text column need not
    # survive into the shuffle when retain_original_text=False (the
    # reference's retain_orig_docs=false: originals deleted after
    # redaction, redact.py:240-243) — that halves phase-2 shuffle and
    # output bytes at corpus scale.
    if not conv_partitioned:
        from pii_redaction_data_pipeline_spark.operators.windows import _norm_text

        df = df.withColumn("_th", F.xxhash64(_norm_text(text)))
        if not cfg.retain_original_text:
            df = df.drop("text")
        else:
            # delta-encode the scrubbed text across the shuffle: for the
            # (typical) PII-free row it equals the raw text, so shipping
            # it twice wastes ~45% of the exchange's text bytes — NULL it
            # when identical and reconstruct from `text` after the windows
            df = df.withColumn(
                "_scrubbed", F.when(F.col("_scrubbed") != text, F.col("_scrubbed"))
            )
        df = df.repartition(n_parts, "conv_id") if n_parts else df.repartition("conv_id")
        df = with_conversation_flags(
            df, tool_loop_min_run=cfg.tool_loop_min_run, hash_col="_th"
        )
        df = df.drop("_th")
    else:
        # windows already computed pre-UDF; no shuffle anywhere, so the
        # scrubbed delta-encoding would only save output bytes — still
        # worth it when the raw text is retained
        if not cfg.retain_original_text:
            df = df.drop("text")
        else:
            df = df.withColumn(
                "_scrubbed", F.when(F.col("_scrubbed") != text, F.col("_scrubbed"))
            )

    # --- verdict assembly (pure JVM expressions) ---
    lang_fail = (~F.col("lang").isin(*cfg.allowed_langs)) & (
        F.col("lang_conf") >= cfg.lang_min_conf
    )
    too_short = (F.col("n_chars") < cfg.min_chars) | (F.col("n_words") < cfg.min_words)
    too_long = F.col("n_chars") > cfg.max_chars
    symbol = F.col("symbol_ratio") > cfg.max_symbol_ratio
    repetition = F.col("rep_frac") > cfg.max_top3gram_frac
    content_fired = too_short | too_long | symbol | repetition
    high_ppl = (
        (~lang_fail)
        & (~content_fired)
        & (F.col("role") != "tool")
        & (F.col("ppl") > cfg.max_ppl)
    )

    def gated(flag, name):
        return F.when(flag, F.lit(name))

    reasons = F.array_compact(
        F.array(
            gated(lang_fail, "lang"),
            gated(~lang_fail & too_short, "too_short"),
            gated(~lang_fail & too_long, "too_long"),
            gated(~lang_fail & symbol, "symbol_ratio"),
            gated(~lang_fail & repetition, "repetition"),
            gated(high_ppl, "high_ppl"),
            gated(F.col("is_duplicate_turn"), "duplicate_turn"),
            gated(F.col("is_tool_loop"), "tool_loop"),
        )
    )
    df = df.withColumn("drop_reasons", reasons).withColumn(
        "keep", F.size("drop_reasons") == 0
    )
    scrubbed_full = (
        F.coalesce(F.col("_scrubbed"), F.col("text"))
        if cfg.retain_original_text
        else F.col("_scrubbed")
    )
    df = (
        df.withColumn("scrubbed_text", F.when(F.col("keep"), scrubbed_full))
        .withColumn("scrub_counts", F.when(F.col("keep"), F.col("_counts")))
        .drop("_scrubbed", "_counts", "is_duplicate_turn", "is_tool_loop")
    )
    if cfg.emit_entities:
        # same kept-rows-only policy as scrubbed_text/scrub_counts
        df = df.withColumn("entities", F.when(F.col("keep"), F.col("entities")))
    return df


def lineage_metrics(
    annotated_out: DataFrame, run_id: str, buckets: list[int] | None = None
) -> DataFrame:
    """Aggregate per-bucket lineage rows from the written annotated table.

    `buckets` is the full set of buckets this run covered — buckets that
    happen to contain zero rows still get a (rows_in=0, complete) row,
    otherwise a rerun would re-process them forever (found by the
    kill-and-resume probe).

    Plan shape: ONE scan of the written table and ONE groupBy(bucket)
    whose aggregate list is built from the FIXED taxonomies — one
    conditional sum per drop reason (config.DROP_REASONS) and per PII
    type (scrub.PII_TYPES) — then the maps are reassembled from the
    nonzero columns. No explode, no per-key shuffle, no collect_list
    pivot: the previous explode shape re-materialized ~3 rows per output
    row before its (bucket, kind, key) exchange, which at 100 TB tripled
    the pass this table exists to keep cheap. The taxonomy-column trick
    is only legal because both key sets are closed at config time (the
    reference's Manifest counts are likewise a fixed column set,
    pii-output.py:91-93)."""
    from pii_redaction_data_pipeline_spark.config import DROP_REASONS
    from pii_redaction_data_pipeline_spark.functions.scrub import PII_TYPES

    reasons = F.coalesce("drop_reasons", F.array().cast("array<string>"))
    scrubs = F.coalesce("scrub_counts", F.create_map().cast("map<string,int>"))
    aggs = [
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("keep").cast("long")).alias("rows_out"),
    ]
    for r in DROP_REASONS:
        aggs.append(F.sum(F.array_contains(reasons, r).cast("long")).alias(f"_r_{r}"))
    for t in PII_TYPES:
        aggs.append(
            F.sum(F.coalesce(F.element_at(scrubs, F.lit(t)), F.lit(0)).cast("long"))
            .alias(f"_s_{t}")
        )
    agg = annotated_out.groupBy(BUCKET_COL).agg(*aggs)

    def tax_map(prefix: str, keys) -> F.Column:
        # entries in sorted key order (the pivot shape array_sorted too);
        # zero counts drop out, all-zero -> NULL like the old left join
        entries = F.filter(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("key"), F.col(f"{prefix}{k}").alias("value")
                    )
                    for k in sorted(keys)
                ]
            ),
            lambda s: s["value"] > 0,
        )
        return F.when(F.size(entries) > 0, F.map_from_entries(entries))

    totals = agg.select(
        BUCKET_COL,
        "rows_in",
        "rows_out",
        tax_map("_r_", DROP_REASONS).alias("drop_reason_counts"),
        tax_map("_s_", PII_TYPES).alias("scrub_counts"),
    )
    if buckets is not None:
        spark = annotated_out.sparkSession
        all_buckets = spark.createDataFrame(
            [(int(b),) for b in buckets], f"{BUCKET_COL} int"
        )
        totals = (
            all_buckets.join(totals, BUCKET_COL, "left")
            .na.fill({"rows_in": 0, "rows_out": 0})
        )
    out = (
        totals.select(
            F.lit(run_id).alias("run_id"),
            F.col(BUCKET_COL).cast("string").alias("partition_id"),
            "rows_in",
            "rows_out",
            "drop_reason_counts",
            "scrub_counts",
            F.lit("complete").alias("status"),
            F.lit(int(time.time() * 1000)).alias("finished_seq"),
        )
    )
    return out


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    lineage_path: str,
    run_id: str = "run-0",
    cfg: PipelineConfig | None = None,
    fail_after_buckets: int | None = None,
) -> dict:
    """Full job with checkpoint/resume.

    Returns a summary dict. `fail_after_buckets` injects a crash after N
    buckets for the kill-and-resume test.
    """
    cfg = cfg or PipelineConfig()
    io = TableIO(spark, n_buckets=cfg.n_buckets)
    lineage = LineageStore(spark, lineage_path)

    src = io.read(input_path)
    tune_shuffle_partitions(spark, src, cfg.target_partition_bytes)
    src = with_bucket(src, cfg.n_buckets)

    done = set(lineage.completed_buckets(run_id))
    todo = [b for b in range(cfg.n_buckets) if b not in done]
    if not todo:
        return {"run_id": run_id, "processed_buckets": [], "resumed": True}

    if fail_after_buckets is not None:
        todo = todo[:fail_after_buckets]

    # one Spark job over all remaining buckets (bucket pruning via filter
    # — with Iceberg this is partition pruning on the metadata scan)
    part = src.filter(F.col(BUCKET_COL).isin(todo))
    # The fluency model (when cfg.train_ppl_on_corpus) is fit on the
    # FULL input, not the resume remainder — resume must score against
    # the same model the first attempt did — and the fitted sparse count
    # table persists under the output dir keyed by run_id, so a RESUME
    # reloads ~2 MB of metadata instead of re-scanning the corpus to
    # refit the identical model (determinism at artifact altitude, not
    # recompute altitude). The leading '_' keeps the artifact dir
    # invisible to parquet reads of the annotated table.
    ppl_model = None
    if cfg.train_ppl_on_corpus:
        from pii_redaction_data_pipeline_spark.functions.perplexity import (
            load_or_train_char_trigram_lm,
        )

        ppl_model = load_or_train_char_trigram_lm(
            spark, src, posixpath.join(output_path, "_ppl_model", run_id)
        )
    ann = annotate(part, cfg, spark, ppl_model=ppl_model)
    # stamp provenance into the rows: a reused output path can hold other
    # runs' rows in buckets this run never overwrites (dynamic overwrite
    # only replaces buckets it writes to), so lineage and reports must
    # scope by run_id, not by directory
    ann = ann.withColumn("run_id", F.lit(run_id))

    # run-level totals AND per-bucket lineage metrics ride ALONG the
    # write job via the Observation API — no second pass over the data.
    # The per-bucket aggregates are conditional sums over the fixed
    # taxonomies (one expression per bucket x {rows, reason, pii type});
    # the write job that commits the rows is the same job that counts
    # them, so the observed values equal what was durably persisted
    # (dynamic overwrite replaces every touched bucket with exactly this
    # run's rows). Guarded by an expression budget: at production bucket
    # counts (e.g. 4096 buckets at 100 TB) the expression list would
    # leave whole-stage codegen, so large runs fall back to the original
    # column-pruned re-read of the written table — one cheap scan that
    # never decodes text.
    from pyspark.sql import Observation

    from pii_redaction_data_pipeline_spark.config import DROP_REASONS
    from pii_redaction_data_pipeline_spark.functions.scrub import PII_TYPES
    from pii_redaction_data_pipeline_spark.sources.lineage import LINEAGE_SCHEMA

    obs_aggs = [
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("keep").cast("long")).alias("rows_out"),
        F.sum(F.size(F.map_values(F.coalesce(
            F.col("scrub_counts"), F.create_map())))).alias("pii_types_hit"),
    ]
    obs_metrics = (
        len(todo) * (2 + len(DROP_REASONS) + len(PII_TYPES))
        <= LINEAGE_OBS_MAX_EXPRS
    )
    helper_cols: list[str] = []
    if obs_metrics:
        # per-row primitives computed ONCE as helper columns (projected
        # away again right after the observe node) — the naive
        # formulation re-evaluated array_contains/element_at inside
        # every bucket's conditional, i.e. n_buckets x per row
        reasons = F.coalesce("drop_reasons", F.array().cast("array<string>"))
        scrubs = F.coalesce(
            "scrub_counts", F.create_map().cast("map<string,int>")
        )
        helpers: dict[str, F.Column] = {"_lm_keep": F.col("keep").cast("long")}
        for r in DROP_REASONS:
            helpers[f"_lm_r_{r}"] = F.array_contains(reasons, r).cast("long")
        for t in PII_TYPES:
            helpers[f"_lm_s_{t}"] = F.coalesce(
                F.element_at(scrubs, F.lit(t)), F.lit(0)
            ).cast("long")
        ann = ann.withColumns(helpers)
        helper_cols = list(helpers)
        zero = F.lit(0).cast("long")
        for b in todo:
            cond = F.col(BUCKET_COL) == b
            obs_aggs.append(F.sum(
                F.when(cond, F.lit(1).cast("long")).otherwise(zero)
            ).alias(f"_b{b}_in"))
            obs_aggs.append(F.sum(
                F.when(cond, F.col("_lm_keep")).otherwise(zero)
            ).alias(f"_b{b}_out"))
            for r in DROP_REASONS:
                obs_aggs.append(F.sum(
                    F.when(cond, F.col(f"_lm_r_{r}")).otherwise(zero)
                ).alias(f"_b{b}_r_{r}"))
            for t in PII_TYPES:
                obs_aggs.append(F.sum(
                    F.when(cond, F.col(f"_lm_s_{t}")).otherwise(zero)
                ).alias(f"_b{b}_s_{t}"))

    obs = Observation(f"pipeline-{run_id}")
    ann = ann.observe(obs, *obs_aggs)
    if helper_cols:
        ann = ann.drop(*helper_cols)
    io.write_bucketed(ann, output_path)
    vals = dict(obs.get)
    run_totals = {k: vals[k] for k in ("rows_in", "rows_out", "pii_types_hit")}

    if obs_metrics:
        # assemble the LINEAGE_SCHEMA rows driver-side from the observed
        # longs — same shape as lineage_metrics: maps in sorted key
        # order, zero counts dropped, all-zero maps NULL
        seq = int(time.time() * 1000)
        rows = []
        for b in todo:
            rmap = {
                r: int(vals[f"_b{b}_r_{r}"] or 0)
                for r in sorted(DROP_REASONS)
                if (vals[f"_b{b}_r_{r}"] or 0) > 0
            } or None
            smap = {
                t: int(vals[f"_b{b}_s_{t}"] or 0)
                for t in sorted(PII_TYPES)
                if (vals[f"_b{b}_s_{t}"] or 0) > 0
            } or None
            rows.append((
                run_id, str(b), int(vals[f"_b{b}_in"] or 0),
                int(vals[f"_b{b}_out"] or 0), rmap, smap, "complete", seq,
            ))
        metrics = spark.createDataFrame(rows, LINEAGE_SCHEMA)
    else:
        out = spark.read.parquet(output_path)
        if "run_id" not in out.columns:  # pre-run_id-column files (migration)
            out = out.withColumn("run_id", F.lit(run_id))
        out = out.filter(
            F.col(BUCKET_COL).isin(todo) & (F.col("run_id") == run_id)
        )
        metrics = lineage_metrics(out, run_id, buckets=todo)
    lineage.append(metrics)

    if fail_after_buckets is not None:
        raise RuntimeError("injected failure after %d buckets" % fail_after_buckets)

    return {
        "run_id": run_id,
        "processed_buckets": todo,
        "resumed": bool(done),
        "totals": run_totals,
    }
