"""Train/test decontamination: flag corpus documents that overlap an
evaluation benchmark.

A training-data pipeline must remove (or at least mark) documents that
contain text from the benchmarks the resulting model will be scored on
— the standard mechanism is word-n-gram overlap (GPT-3 appendix C uses
13-grams; The Pile and most open pipelines use 8-13). No reference
analog (the reference redacts PII, it does not curate training data);
this is a builder-brief training-data operator alongside dedup/
sampling/packing.

Scale design: the benchmark side is SMALL by construction (benchmarks
are MBs; the corpus is the 100 TB side), so the benchmark's distinct
n-gram hash set builds once and BROADCASTS — the corpus-side plan is
scan -> per-row gram hashing (JVM, whole-stage codegen, reusing the
ngram machinery of operators/dedup.py) -> broadcast-hash semi/inner
join -> groupBy(doc_id) partial-agg count. One narrow pass over the
corpus; the text never shuffles — a document's grams all originate in
its own input row, so the map-side partial agg collapses them before
the one doc_id exchange, which therefore carries ~24 bytes per
DOCUMENT (verified in the executed plan: BroadcastHashJoin + partial
HashAggregate below the exchange). Nothing driver-side. A >GB
benchmark set would instead flip to
a sort-merge join on gram hash — same plan minus the broadcast hint,
which is why the hint is AQE-decided, not forced.

Determinism: grams hash with xxhash64 over the same normalized word
stream the dedup family uses (lower + whitespace-collapse), so the
flag is partitioning- and resume-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.functions.grams import (
    explode_grams,
    normalized_words,
)


def _exploded_gram_frame(
    df: DataFrame, text_col: str, k: int, keep=(), outer: bool = False
) -> DataFrame:
    """-> (*keep, g: long), one row per DISTINCT word-k-gram xxhash64
    hash (JVM-only); rows with fewer than k words contribute no grams —
    a 3-word snippet cannot witness an 8-gram contamination. With
    outer=True those rows still emit one (g=NULL) row so per-document
    aggregations keep them. Plan shape (split-under-Generate) is owned
    by functions/grams.explode_grams."""

    def grams(w):
        n = F.size(w)
        return F.when(
            n >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - k + 1),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, k))),
                )
            ),
        ).otherwise(F.array().cast("array<long>"))

    return explode_grams(
        df,
        normalized_words(text_col),
        grams,
        keep=keep,
        explode=F.explode_outer if outer else F.explode,
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
    max_hits: int = 0,
) -> DataFrame:
    """-> (id_col, n_grams, n_hits, contaminated) per corpus document.

    n_grams   distinct word-k-grams in the document
    n_hits    how many of them appear anywhere in the benchmark
    contaminated = n_hits > max_hits (default: a single shared k-gram
    taints — the conservative setting the GPT-3/Pile protocol uses)

    Documents with < k words have n_grams = 0 and are never flagged.
    """
    bench_grams = _exploded_gram_frame(benchmark, bench_text_col, k).distinct()
    doc_grams = _exploded_gram_frame(
        corpus, text_col, k, keep=(F.col(id_col),), outer=True
    )
    hits = (
        doc_grams.join(bench_grams.withColumn("_hit", F.lit(1)), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("g").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    return hits.withColumn("contaminated", F.col("n_hits") > max_hits)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
    max_hits: int = 0,
    materialize_keep: bool = False,
) -> DataFrame:
    """Corpus minus contaminated documents (all original columns).

    materialize_keep: lineage-truncate the keep-list (ids only, 8 B/doc)
    before the semi-join. Essential when the RESULT feeds an operator
    that scans its input several times (DSIR's stats + per-doc-gram +
    target reads, dedup's multi-branch plans): without it each consumer
    re-derives the whole contamination groupBy chain — measured 10 hash
    exchanges / 9 corpus scans instead of 4 / 3 under DSIR
    (tests/test_plans.py::test_llm_curation_composition_plan). Same
    localCheckpoint executor-loss caveat as dsir_select's scored frame;
    single-consumer callers keep the default lazy plan."""
    flags = contamination_flags(
        corpus, benchmark, id_col, text_col, bench_text_col, k, max_hits
    )
    keep = flags.filter(~F.col("contaminated")).select(id_col)
    if materialize_keep:
        keep = keep.localCheckpoint(eager=False)
    return corpus.join(keep, id_col, "semi")
